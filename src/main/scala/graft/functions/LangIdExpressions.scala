package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused scoring kernel for [[graft.ext.LangId]] — the language-ID
  * analog of [[VectorExpressions.LshSignatureFloat]].
  *
  * The column-algebra fold ([[graft.ext.LangId.langIdColFold]]) is the
  * reference semantics, but higher-order lambdas get no
  * common-subexpression elimination: the gram-array expression is
  * re-evaluated by `size(grams)` inside the normalizing lambda (once
  * per CLASS per row) and again by the final guard — measured 8.8 s for
  * the x57 corpus scan at sf0.1. This kernel runs the identical math as
  * ONE JIT-able loop per row: normalize (trim → lower → `\s+`→' ', the
  * exact Spark primitives), walk char n-grams in the same n-ascending /
  * position-ascending order, hash each gram's UTF-8 bytes with the same
  * seed-42 xxhash64, accumulate the per-class margin vector in the same
  * index order (bit-identical doubles), then argmax with the same
  * tie-to-larger-code rule (`Double.compare` ≥, matching Spark's struct
  * max ordering incl. NaN-greatest and -0.0 < 0.0). Null when the
  * document has no grams — callers coalesce in their fallback.
  */
object LangIdExpressions {

  /** The model payload carried into codegen as one reference object:
    * `weights` is flat idx-major `double[dim * k]` (zeros for buckets
    * the model never saw), `langs` pre-encoded UTF8. */
  final class LangIdModelRef(val dim: Int, val minN: Int, val maxN: Int,
      val k: Int, val weights: Array[Double], val intercepts: Array[Double],
      val langs: Array[UTF8String]) extends Serializable {

    @transient private lazy val spaceRe = java.util.regex.Pattern.compile("\\s+")

    def score(input: UTF8String): UTF8String = {
      // the exact normText chain: Spark trim (UTF8String.trim), Spark
      // lower (UTF8String.toLowerCase), Java-regex \s+ replacement —
      // regexp_replace also runs java.util.regex over the string form
      val norm = spaceRe.matcher(input.trim().toLowerCase().toString).replaceAll(" ")
      val cps = norm.codePoints().toArray // substr counts code points
      val len = cps.length
      val margins = new Array[Double](k)
      var total = 0
      var n = minN
      while (n <= maxN) {
        val last = len - n
        var i = 0
        while (i <= last) {
          val bytes = new String(cps, i, n).getBytes(StandardCharsets.UTF_8)
          val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
          val idx = (((h % dim) + dim) % dim).toInt
          val off = idx * k
          var j = 0
          while (j < k) { margins(j) += weights(off + j); j += 1 }
          total += 1
          i += 1
        }
        n += 1
      }
      if (total == 0) null
      else {
        var best = 0
        var bm = margins(0) / total + intercepts(0)
        var j = 1
        while (j < k) {
          val m = margins(j) / total + intercepts(j)
          // ties take the lexicographically LARGER lang — the struct-max
          // rule — by comparing the strings themselves (UTF8String binary
          // order = Spark string order), so the rule holds for ANY lang
          // order, not just the sorted arrays train/readModel produce
          val c = java.lang.Double.compare(m, bm)
          if (c > 0 || (c == 0 && langs(j).compareTo(langs(best)) > 0)) {
            best = j; bm = m
          }
          j += 1
        }
        langs(best)
      }
    }
  }

  final case class LangIdScore(child: Expression, model: LangIdModelRef)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true // null on a gram-less document
    override def prettyName: String = "graft_langid_score"

    override def nullSafeEval(v: Any): Any =
      model.score(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val m = ctx.addReferenceObj("langIdModel", model,
          classOf[LangIdModelRef].getName)
        s"""
           |${ev.value} = $m.score($v);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** PORTABLE-bucket stored-model scoring kernel — the fused form of
    * [[graft.ext.LangId.predictStored]]'s DataFrame pipeline (explode →
    * md5 bucket → per-(doc,bucket) counts → weight join → decimal
    * margin sums → argmax), which planned 4 Exchanges + 2
    * SortAggregates for what is per-document arithmetic. One loop per
    * row, zero shuffles, REPLICATING THE ORACLE-PINNED NUMERICS
    * BIT-EXACTLY (gate x57b hash-compares margins):
    *
    *   - normalization/grams: the [[LangIdModelRef.score]] chain
    *     (Spark trim/lower, java-regex `\s+`, code-point substrings);
    *   - bucket: `(ascii(md5hex[0])·53 + ascii(md5hex[1])·17 +
    *     ascii(md5hex[2])·7 + ascii(md5hex[3])) % dim` — md5 of the
    *     gram's UTF-8 bytes, lowercase hex, exactly Spark's `md5`;
    *   - margin term: `round(w · c/n, 9)` = `BigDecimal.valueOf(x)
    *     .setScale(9, HALF_UP).toDouble` (Spark's Round on DOUBLE),
    *     cast to DECIMAL(28,10) = `valueOf(t).setScale(10, HALF_UP)`
    *     (Spark's Cast via the shortest-repr BigDecimal), summed as
    *     exact decimals, `.doubleValue` (Spark's Decimal→double), +
    *     intercept in plain IEEE;
    *   - argmax: ascending-lang scan with `>=` — equal margins take the
    *     lexicographically larger code (Spark's struct-max tie rule);
    *   - result margin: `round(m, 6)`, same HALF_UP contract.
    *
    * Buckets ABSENT from the stored weight table contribute no term
    * (the inner join's semantics); a document whose every bucket is
    * absent — or that has no grams — scores null, which callers filter
    * (the join path simply never produced its rows). Spec-pinned
    * equal, margin-exact, to the DataFrame path (LangIdSpec). */
  final class PortableLangIdModelRef(val dim: Int, val minN: Int,
      val maxN: Int, val k: Int, val present: Array[Boolean],
      val weights: Array[Double], val intercepts: Array[Double],
      val langs: Array[UTF8String]) extends Serializable {

    @transient private lazy val spaceRe = java.util.regex.Pattern.compile("\\s+")
    // MessageDigest is stateful and not thread-safe; one per task thread
    @transient private lazy val md5 =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    private val HexAscii: Array[Int] = "0123456789abcdef".map(_.toInt).toArray

    def score(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
      val norm = spaceRe.matcher(input.trim().toLowerCase().toString).replaceAll(" ")
      val cps = norm.codePoints().toArray
      val len = cps.length
      val counts = new Array[Int](dim)
      val digest = md5.get()
      var total = 0
      var n = minN
      while (n <= maxN) {
        val last = len - n
        var i = 0
        while (i <= last) {
          val bytes = new String(cps, i, n).getBytes(StandardCharsets.UTF_8)
          val d = digest.digest(bytes) // digest() resets for the next gram
          val h0 = HexAscii((d(0) >> 4) & 0xF)
          val h1 = HexAscii(d(0) & 0xF)
          val h2 = HexAscii((d(1) >> 4) & 0xF)
          val h3 = HexAscii(d(1) & 0xF)
          counts((h0 * 53 + h1 * 17 + h2 * 7 + h3) % dim) += 1
          total += 1
          i += 1
        }
        n += 1
      }
      if (total == 0) return null
      var any = false
      var best = -1
      var bm = 0.0
      var j = 0
      while (j < k) {
        var acc: java.math.BigDecimal = null
        var idx = 0
        while (idx < dim) {
          if (counts(idx) > 0 && present(idx)) {
            val t9 = java.math.BigDecimal
              .valueOf(weights(idx * k + j) * (counts(idx).toDouble / total.toDouble))
              .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
            val dec = java.math.BigDecimal.valueOf(t9)
              .setScale(10, java.math.RoundingMode.HALF_UP)
            acc = if (acc == null) dec else acc.add(dec)
          }
          idx += 1
        }
        if (acc != null) {
          any = true
          val m = acc.doubleValue() + intercepts(j)
          // string-compared tie (see LangIdModelRef.score): the
          // struct-max rule independent of the caller's lang order
          val c = if (best < 0) 1 else java.lang.Double.compare(m, bm)
          if (c > 0 || (c == 0 && langs(j).compareTo(langs(best)) > 0)) {
            best = j; bm = m
          }
        }
        j += 1
      }
      if (!any) return null
      val margin = java.math.BigDecimal.valueOf(bm)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](langs(best), margin))
    }
  }

  /** Closed-form coefficients for one rank-1 bucket weight:
    * `((h0·c0 + h1·c1 + h2·c2) % mod − off) / div` over the ASCII codes
    * of the bucket's first three md5 hex chars (the x56 portable
    * convention). */
  final case class HexCoef(c0: Int, c1: Int, c2: Int, mod: Int, off: Int,
      div: Double) extends Serializable {
    def of(h0: Int, h1: Int, h2: Int): Double =
      ((h0 * c0 + h1 * c1 + h2 * c2) % mod - off) / div
  }

  /** RANK-1 portable scoring kernel — the fused form of
    * [[graft.ext.LangId.predictPortable]]: buckets are the md5 hex
    * 4-prefix, each bucket carries closed-form (base, delta) weights,
    * and class margins are `a + k·d + intercept(k)` over the two
    * decimal-summed per-doc totals. Replays the oracle-pinned numerics
    * of gate x56 bit-exactly (same BigDecimal contracts as
    * [[PortableLangIdModelRef]], with predictPortable's own operand
    * order `(w · c) / n`); argmax = array_max's struct ordering (ties
    * to the larger code). Null when the document has no grams. */
  final class Rank1PortableLangIdRef(val minN: Int, val maxN: Int,
      val base: HexCoef, val delta: HexCoef, val intercepts: Array[Double],
      val langs: Array[UTF8String]) extends Serializable {

    @transient private lazy val spaceRe = java.util.regex.Pattern.compile("\\s+")
    @transient private lazy val md5 =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    private val HexAscii: Array[Int] = "0123456789abcdef".map(_.toInt).toArray

    def score(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
      val norm = spaceRe.matcher(input.trim().toLowerCase().toString).replaceAll(" ")
      val cps = norm.codePoints().toArray
      val len = cps.length
      val digest = md5.get()
      var total = 0
      // collect 16-bit bucket keys (4 hex nibbles), then run-length on
      // the sorted array — gram counts are prefix-bounded (≤ ~3·len)
      var keys = new Array[Int](math.max(3 * len, 8))
      var kn = 0
      var n = minN
      while (n <= maxN) {
        val last = len - n
        var i = 0
        while (i <= last) {
          val bytes = new String(cps, i, n).getBytes(StandardCharsets.UTF_8)
          val d = digest.digest(bytes)
          if (kn == keys.length) keys = java.util.Arrays.copyOf(keys, kn * 2)
          keys(kn) = ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
          kn += 1
          total += 1
          i += 1
        }
        n += 1
      }
      if (total == 0) return null
      java.util.Arrays.sort(keys, 0, kn)
      val nn = total.toDouble
      var accA: java.math.BigDecimal = null
      var accB: java.math.BigDecimal = null
      var i = 0
      while (i < kn) {
        val key = keys(i)
        var j = i
        while (j < kn && keys(j) == key) j += 1
        val c = (j - i).toDouble
        val h0 = HexAscii((key >> 12) & 0xF)
        val h1 = HexAscii((key >> 8) & 0xF)
        val h2 = HexAscii((key >> 4) & 0xF)
        // predictPortable's operand order: (weight · c) / n
        val tA = java.math.BigDecimal.valueOf(base.of(h0, h1, h2) * c / nn)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        val tB = java.math.BigDecimal.valueOf(delta.of(h0, h1, h2) * c / nn)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        val dA = java.math.BigDecimal.valueOf(tA)
          .setScale(10, java.math.RoundingMode.HALF_UP)
        val dB = java.math.BigDecimal.valueOf(tB)
          .setScale(10, java.math.RoundingMode.HALF_UP)
        accA = if (accA == null) dA else accA.add(dA)
        accB = if (accB == null) dB else accB.add(dB)
        i = j
      }
      val a = accA.doubleValue()
      val d = accB.doubleValue()
      var best = 0
      var bm = a + 0.0 * d + intercepts(0)
      var k = 1
      while (k < langs.length) {
        val m = a + k.toDouble * d + intercepts(k)
        // string-compared tie (see LangIdModelRef.score): the
        // struct-max rule independent of the caller's lang order
        val c = java.lang.Double.compare(m, bm)
        if (c > 0 || (c == 0 && langs(k).compareTo(langs(best)) > 0)) {
          best = k; bm = m
        }
        k += 1
      }
      val margin = java.math.BigDecimal.valueOf(bm)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](langs(best), margin))
    }
  }

  final case class Rank1PortableLangIdScore(child: Expression,
      model: Rank1PortableLangIdRef)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("lang", StringType, nullable = false),
      StructField("margin", DoubleType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_rank1_portable_langid_score"
    // optimizer fence — see [[PortableLangIdScore.deterministic]]
    override lazy val deterministic: Boolean = false

    override def nullSafeEval(v: Any): Any =
      model.score(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val m = ctx.addReferenceObj("rank1LangIdModel", model,
          classOf[Rank1PortableLangIdRef].getName)
        s"""
           |${ev.value} = $m.score($v);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form of [[Rank1PortableLangIdScore]]. */
  def rank1PortableLangIdScore(text: Column, minN: Int, maxN: Int,
      langs: Seq[String], base: HexCoef, delta: HexCoef,
      interceptOf: Int => Double): Column = {
    val ref = new Rank1PortableLangIdRef(minN, maxN, base, delta,
      langs.indices.map(interceptOf).toArray,
      langs.map(UTF8String.fromString).toArray)
    ColumnBridge.column(Rank1PortableLangIdScore(ColumnBridge.expr(text), ref))
  }

  final case class PortableLangIdScore(child: Expression,
      model: PortableLangIdModelRef)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("lang", StringType, nullable = false),
      StructField("margin", DoubleType, nullable = false)))
    override def nullable: Boolean = true // null: gram-less / all-OOV doc
    override def prettyName: String = "graft_portable_langid_score"
    // The function is pure, but advertising that lets the optimizer
    // push the caller's isNotNull filter BELOW the pre-spread exchange,
    // duplicating this (expensive: per-gram md5 + per-class decimal
    // sums) kernel — once in the pushed filter on the unspread scan,
    // once in the projection. Declaring it non-deterministic is the
    // standard fence: may not be reordered, duplicated, or
    // constant-folded; one evaluation per row, after the spread.
    override lazy val deterministic: Boolean = false

    override def nullSafeEval(v: Any): Any =
      model.score(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val m = ctx.addReferenceObj("portableLangIdModel", model,
          classOf[PortableLangIdModelRef].getName)
        s"""
           |${ev.value} = $m.score($v);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form of [[PortableLangIdScore]]: struct(lang, margin), null
    * when the document yields no in-model grams. */
  def portableLangIdScore(text: Column, dim: Int, minN: Int, maxN: Int,
      langs: Seq[String], intercepts: Seq[Double],
      weights: Map[Int, Seq[Double]]): Column = {
    val k = langs.size
    val present = new Array[Boolean](dim)
    val flat = new Array[Double](dim * k)
    weights.foreach { case (i, vs) =>
      present(i) = true
      var j = 0
      vs.foreach { w => flat(i * k + j) = w; j += 1 }
    }
    val ref = new PortableLangIdModelRef(dim, minN, maxN, k, present, flat,
      intercepts.toArray, langs.map(UTF8String.fromString).toArray)
    ColumnBridge.column(PortableLangIdScore(ColumnBridge.expr(text), ref))
  }

  /** Column form; null when the document yields no grams. */
  def langIdScore(text: Column, dim: Int, minN: Int, maxN: Int,
      langs: Seq[String], intercepts: Seq[Double],
      weights: Map[Int, Seq[Double]]): Column = {
    val k = langs.size
    val flat = new Array[Double](dim * k)
    weights.foreach { case (i, vs) =>
      var j = 0
      vs.foreach { w => flat(i * k + j) = w; j += 1 }
    }
    val ref = new LangIdModelRef(dim, minN, maxN, k, flat,
      intercepts.toArray, langs.map(UTF8String.fromString).toArray)
    ColumnBridge.column(LangIdScore(ColumnBridge.expr(text), ref))
  }
}
