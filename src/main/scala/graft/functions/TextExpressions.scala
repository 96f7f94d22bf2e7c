package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst text kernels (SURVEY §2.10 preference order (b)):
  * the gram-stream builders feed every hashed-feature operator (DSIR
  * importance models, n-gram fingerprints), and the higher-order-
  * function formulation (`transform(sequence(...), i =>
  * concat(element_at(w, i), " ", element_at(w, i+1)))`) has no codegen
  * path in Spark — HigherOrderFunction evaluates interpreted, boxing a
  * lambda variable per element (measured: the x42 gram explode at
  * sf0.1 spent ~1.7 s in the interpreted transform; this kernel makes
  * it map-speed). Output order and content are bit-identical to the
  * transform form (FunctionsSpec pins it), so the DuckDB oracle twin
  * (`list_concat(w, list_transform(...))`) is unchanged.
  */
object TextExpressions {

  /** unigrams ++ adjacent-pair bigrams ("a b") of a token array, in
    * token order — the DSIR feature stream. One pass, zero boxing. */
  final case class UnigramBigramConcat(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "graft_uni_bigrams"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val m = if (n >= 2) 2 * n - 1 else n
      val out = new Array[AnyRef](m)
      val sp = UTF8String.fromString(" ")
      var i = 0
      while (i < n) { out(i) = arr.getUTF8String(i); i += 1 }
      i = 0
      while (i < n - 1) {
        out(n + i) = UTF8String.concat(arr.getUTF8String(i), sp,
          arr.getUTF8String(i + 1))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        val out = ctx.freshName("out")
        val sp = ctx.addReferenceObj("space", UTF8String.fromString(" "),
          classOf[UTF8String].getName)
        s"""
           |final int $n = $a.numElements();
           |final int $m = ($n >= 2) ? (2 * $n - 1) : $n;
           |final Object[] $out = new Object[$m];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $a.getUTF8String($i);
           |}
           |for (int $i = 0; $i < $n - 1; $i++) {
           |  $out[$n + $i] = org.apache.spark.unsafe.types.UTF8String.concat(
           |    $a.getUTF8String($i), $sp, $a.getUTF8String($i + 1));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry: unigrams ++ bigrams of a token-array column. */
  def uniBigrams(tokens: Column): Column =
    ColumnBridge.column(UnigramBigramConcat(ColumnBridge.expr(tokens)))

  /** Adjacent word n-grams of a token array, space-joined, in token
    * order — the shingling kernel behind the dedup/repetition
    * operators. Bit-identical to the zip_with-chain formulation
    * (FunctionsSpec pins it) but codegen'd: the higher-order chain
    * evaluated interpreted, n−1 lambda passes per row. Documents with
    * fewer than n tokens yield an empty array. A gram containing a
    * null token is DROPPED from the output — the pinned reference's
    * `filter(_.isNotNull)` over the null-propagating `concat` chain;
    * concatWs-style null-skipping would instead silently join the
    * null's neighbors into a gram that never existed. */
  final case class WordNgramConcat(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "graft_word_ngrams"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      val m = math.max(len - n + 1, 0)
      val out = new Array[AnyRef](m)
      val sp = UTF8String.fromString(" ")
      val parts = new Array[UTF8String](n)
      var i = 0
      var cnt = 0
      while (i < m) {
        var j = 0
        var anyNull = false
        while (j < n) {
          parts(j) = arr.getUTF8String(i + j)
          anyNull ||= parts(j) == null
          j += 1
        }
        if (!anyNull) { out(cnt) = UTF8String.concatWs(sp, parts: _*); cnt += 1 }
        i += 1
      }
      new GenericArrayData(
        if (cnt == m) out else java.util.Arrays.copyOf(out, cnt))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val m = ctx.freshName("m")
        val out = ctx.freshName("out")
        val parts = ctx.freshName("parts")
        val sp = ctx.addReferenceObj("space", UTF8String.fromString(" "),
          classOf[UTF8String].getName)
        val utf8 = classOf[UTF8String].getName
        s"""
           |final int $m = java.lang.Math.max($a.numElements() - $n + 1, 0);
           |final Object[] $out = new Object[$m];
           |final $utf8[] $parts = new $utf8[$n];
           |int ${i}_cnt = 0;
           |for (int $i = 0; $i < $m; $i++) {
           |  boolean ${i}_null = false;
           |  for (int $j = 0; $j < $n; $j++) {
           |    $parts[$j] = $a.getUTF8String($i + $j);
           |    ${i}_null |= ($parts[$j] == null);
           |  }
           |  if (!${i}_null) { $out[${i}_cnt++] = $utf8.concatWs($sp, $parts); }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  ${i}_cnt == $m ? $out : java.util.Arrays.copyOf($out, ${i}_cnt));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry: space-joined adjacent n-grams of a token array. */
  def wordNgramsOf(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNgramConcat(ColumnBridge.expr(tokens), n))

  /** Gopher repetition statistics of a gram array, as one kernel call:
    * (top, topg, dup) = (longest equal-gram run count, the
    * lexicographically greatest gram among runs of that count, Σ over
    * repeated grams of count·numChars). These are exactly the outputs
    * of the interpreted array_sort + aggregate state machine this
    * replaces — all three are order-independent (the fold's documented
    * tie rule is "global max string among max-count runs"), so sorting
    * and run-walking inside one JVM call per row is bit-identical while
    * skipping per-element lambda interpretation. String order is
    * UTF8String binary order — the same ordering Spark's array_sort,
    * `greatest`, and string comparisons use. */
  final case class NgramRepetitionFold(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("top",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("topg", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("dup",
        org.apache.spark.sql.types.LongType, nullable = false)))
    override def prettyName: String = "graft_ngram_repetition"

    def repStats(input: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
      // null grams (a null token's n-grams) are ignored — they carry no
      // repeated content; copying them through would NPE the sort
      val m0 = input.numElements()
      val tmp = new Array[AnyRef](m0)
      var m = 0
      var i = 0
      while (i < m0) {
        val u = input.getUTF8String(i)
        if (u != null) { tmp(m) = u; m += 1 }
        i += 1
      }
      val arr = if (m == m0) tmp else java.util.Arrays.copyOf(tmp, m)
      java.util.Arrays.sort(arr, null) // UTF8String natural (binary) order
      var top = 0L
      var topg = UTF8String.EMPTY_UTF8
      var dup = 0L
      i = 0
      while (i < m) {
        val g = arr(i).asInstanceOf[UTF8String]
        var j = i + 1
        while (j < m && arr(j).asInstanceOf[UTF8String].equals(g)) j += 1
        val cnt = (j - i).toLong
        if (cnt > top) { top = cnt; topg = g }
        else if (cnt == top && top > 0L && g.compareTo(topg) > 0) topg = g
        if (cnt > 1L) dup += cnt * g.numChars()
        i = j
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](top, topg, dup))
    }

    override def nullSafeEval(input: Any): Any =
      repStats(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("fold", this, classOf[NgramRepetitionFold].getName)
        s"${ev.value} = $ref.repStats($a);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry: (top, topg, dup) repetition stats of a gram array. */
  def ngramRepetitionOf(grams: Column): Column =
    ColumnBridge.column(NgramRepetitionFold(ColumnBridge.expr(grams)))

  /** DEFLATE-compressed size (bytes) of the text's UTF-8 bytes — the
    * kernel under [[graft.ext.TextOps.compressionRatio]]. Raw deflate
    * stream (nowrap — no zlib header/checksum bytes distorting short
    * texts), fixed DEFAULT_COMPRESSION level, so the value is
    * deterministic for a given JDK zlib (the [[graft.ext.Multimodal
    * .Codec]] versioning caveat applies: pin the JDK build next to
    * persisted scores; specs compute expectations with the same
    * Deflater rather than hardcoding). One Deflater per call — cheap
    * (~µs init) and thread-safe by construction. */
  final case class DeflateSizeExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "graft_deflate_size"

    def sizeOf(t: UTF8String): Int = {
      val bytes = t.getBytes
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0
        while (!d.finished()) total += d.deflate(buf)
        total
      } finally d.end()
    }

    override def nullSafeEval(input: Any): Any =
      sizeOf(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val ref = ctx.addReferenceObj("deflate", this, classOf[DeflateSizeExpr].getName)
        s"${ev.value} = $ref.sizeOf($t);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry: deflate-compressed byte count of a string. */
  def deflateSize(text: Column): Column =
    ColumnBridge.column(DeflateSizeExpr(ColumnBridge.expr(text)))

  // -- Unicode normalization + mojibake repair ------------------------------

  /** Unicode normalization (java.text.Normalizer — the JDK implements
    * UAX #15; NFC/NFKC are STABLE for assigned code points across
    * Unicode versions, which is what makes the NFC form oracle-able
    * cross-engine). Every serious curation pipeline normalizes before
    * dedup and tokenization: "café" composed and decomposed must hash,
    * shingle, and count as the SAME text, and compatibility forms
    * (ﬁ ligature, fullwidth Ａ, ² superscript) fold under NFKC. The
    * fast path short-circuits: `isNormalized` is a cheap scan and the
    * overwhelming majority of real text already IS normalized, so the
    * allocating normalize call runs only on the rows that need it. */
  final case class UnicodeNormalizeExpr(child: Expression, form: String)
      extends UnaryExpression with ExpectsInputTypes {
    require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"unknown normalization form: $form")
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_unicode_normalize"

    @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

    def normRow(s: UTF8String): UTF8String = {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, f)) s
      else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
    }

    override def nullSafeEval(input: Any): Any =
      normRow(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val ref = ctx.addReferenceObj("unorm", this, classOf[UnicodeNormalizeExpr].getName)
        s"${ev.value} = $ref.normRow($t);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalizeExpr(ColumnBridge.expr(text), form))

  /** Mojibake repair (the ftfy core case, first-principles): text that
    * was UTF-8 on the wire but DECODED as Latin-1/Windows-1252 — the
    * single most common crawl corruption ("cafÃ©", "â€™") — re-encodes
    * per Windows-1252 and strictly re-decodes as UTF-8. Repair applies
    * ONLY when (a) every char maps back to a byte (true by construction
    * for a mis-decode), (b) the strict UTF-8 decode succeeds, and (c)
    * the result is SHORTER (a genuine multi-byte mis-decode always
    * shrinks; innocent Latin-1 text fails (b) and passes through
    * untouched). One repair pass — double-mojibake (rare) would need a
    * second application; deterministic either way. */
  final case class FixMojibakeExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_fix_mojibake"

    def fixRow(s: UTF8String): UTF8String = {
      val str = s.toString
      val n = str.length
      // cheap gate: mojibake requires a char in [0x80, 0xFF] (the
      // UTF-8 lead/continuation range mis-decoded); pure-ASCII skips
      var hasHigh = false
      var i = 0
      while (i < n && !hasHigh) {
        if (str.charAt(i) >= 0x80) hasHigh = true
        i += 1
      }
      if (!hasHigh) return s
      val bytes = new Array[Byte](n)
      i = 0
      while (i < n) {
        val c = str.charAt(i)
        val b =
          if (c < 0x100) c.toInt
          else Windows1252Inverse.getOrElse(c, -1)
        if (b < 0) return s // not a mis-decode: some char maps to no byte
        bytes(i) = b.toByte
        i += 1
      }
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try {
        val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
        if (out.length < n) UTF8String.fromString(out) else s
      } catch { case _: java.nio.charset.CharacterCodingException => s }
    }

    override def nullSafeEval(input: Any): Any =
      fixRow(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val ref = ctx.addReferenceObj("moji", this, classOf[FixMojibakeExpr].getName)
        s"${ev.value} = $ref.fixRow($t);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Windows-1252's 0x80–0x9F block (where it diverges from Latin-1):
    * char → byte, for re-encoding a mis-decode. A browser "Latin-1"
    * decode is Windows-1252 per the WHATWG Encoding standard, so the
    * smart quotes/dashes of a mis-decoded UTF-8 page land on these. */
  private val Windows1252Inverse: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  def fixMojibake(text: Column): Column =
    ColumnBridge.column(FixMojibakeExpr(ColumnBridge.expr(text)))
}
