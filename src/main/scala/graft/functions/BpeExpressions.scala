package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused byte-level BPE tokenization kernels — the per-row form of
  * [[graft.ext.Bpe.tokenizeBytesToIds]]'s explode → segment-table
  * broadcast join → explode → vocab broadcast join pipeline (and of
  * [[graft.ext.Bpe.tokenCountsBytes]]'s word-sized twin).
  *
  * Why: the DataFrame form BROADCASTS the corpus-derived word→subwords
  * segment table — vocabulary-sized, i.e. it grows with the corpus —
  * while the actual model is just (merges, vocab ids), constant-sized.
  * These kernels carry ONLY the model and re-derive each word's
  * segmentation with the exact [[graft.ext.Bpe.segmentTableBytes]]
  * semantics: merges applied in rank order, each as one greedy
  * left-to-right non-overlapping pass (`out.last == left && cur ==
  * right` — the applyMerge fold rule). Unknown subwords map to −1
  * (the join path's loud error value; unreachable under
  * [[graft.ext.Bpe.byteVocab]]'s total id assignment). Word →
  * token-ids is a pure function, memoized per executor thread with a
  * bounded cache (Zipf makes the hit rate high; the cache never
  * affects results).
  *
  * Pinned equal to the join pipeline by BpeSpec (same rows) for every
  * word PRESENT in the segment-table vocabulary — which is all words
  * when the tokenized corpus is the vocab corpus, the x31c/x93-family
  * posture (hash-exact gates downstream).
  *
  * DOCUMENTED DIVERGENCE (out-of-vocabulary words): the join path
  * falls back to raw byte symbols (no merges) for a word absent from
  * its materialized segment table — an artifact of materializing
  * segmentation only for the vocab — while these kernels apply the
  * merges to ANY word (the behavior a real BPE tokenizer has, and the
  * only one expressible without corpus-sized state). The two paths
  * then emit different token ids for OOV words, but BOTH streams
  * detokenize to byte-identical text (merging never loses bytes) and
  * produce the same per-special counts (ordinary ids never collide
  * with special ids). BpeSpec pins both facts on an OOV corpus. Do
  * NOT mix join-path counts with kernel tokens (or vice versa) in one
  * [[graft.ext.Export.writeTokenBin]] call when the corpus may
  * contain OOV words — writeTokenBin's manifest/index invariant fails
  * loudly on such a mismatch. */
object BpeExpressions {

  /** The model payload: merges in rank order + subword → id. */
  final class BpeModelRef(val merges: Array[(String, String)],
      vocab: Map[String, Int]) extends Serializable {

    private val vocabMap: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.size * 2)
      vocab.foreach { case (k, v) => m.put(k, Integer.valueOf(v)) }
      m
    }

    // per-thread word → ids memo (pure function; bounded; results
    // independent of cache state)
    @transient private lazy val cache =
      ThreadLocal.withInitial[java.util.HashMap[String, Array[Int]]](() =>
        new java.util.HashMap[String, Array[Int]](1 << 12))

    /** Exact [[graft.ext.Bpe.segmentTableBytes]] semantics: initial
      * symbols = one char per CODE POINT, then each merge in rank
      * order as a single greedy left-to-right non-overlapping pass. */
    private def segmentToIds(word: String): Array[Int] = {
      var syms = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      var mi = 0
      while (mi < merges.length) {
        val (l, r) = merges(mi)
        // fold rule: out.last == l && cur == r → out.last = l + r
        var changed = false
        var i = 0
        while (i < syms.length - 1 && !changed) {
          changed = syms(i) == l && syms(i + 1) == r
          i += 1
        }
        if (changed) {
          val out = new Array[String](syms.length)
          var n = 0
          var j = 0
          while (j < syms.length) {
            if (n > 0 && out(n - 1) == l && syms(j) == r) {
              out(n - 1) = l + r
            } else {
              out(n) = syms(j); n += 1
            }
            j += 1
          }
          syms = java.util.Arrays.copyOf(out, n)
        }
        mi += 1
      }
      val ids = new Array[Int](syms.length)
      var k = 0
      while (k < ids.length) {
        val v = vocabMap.get(syms(k))
        ids(k) = if (v == null) -1 else v.intValue()
        k += 1
      }
      ids
    }

    def idsOf(word: String): Array[Int] = {
      val c = cache.get()
      var ids = c.get(word)
      if (ids == null) {
        ids = segmentToIds(word)
        if (c.size() >= (1 << 16)) c.clear() // bound the pure-fn memo
        c.put(word, ids)
      }
      ids
    }

    /** Whole-row tokenize: the (pos, subpos, token_id) entry array. */
    def tokenizeRow(v: UTF8String): ArrayData = {
      val words = graft.ext.Bpe.ByteLevel.byteWords(v.toString)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var pos = 0
      words.foreach { w =>
        val ids = idsOf(w)
        var sp = 0
        while (sp < ids.length) {
          out += new GenericInternalRow(Array[Any](pos, sp, ids(sp)))
          sp += 1
        }
        pos += 1
      }
      new GenericArrayData(out.toArray)
    }

    /** Whole-row token count. */
    def countRow(v: UTF8String): Long = {
      val words = graft.ext.Bpe.ByteLevel.byteWords(v.toString)
      var n = 0L
      words.foreach { w => n += idsOf(w).length }
      n
    }
  }

  /** text → array<struct<pos,subpos,token_id>> — one entry per token,
    * `pos` the byte-word index, `subpos` the in-word subword index
    * (the exact row shape [[graft.ext.Bpe.tokenizeBytesToIds]] emits
    * after its two explodes). Empty/word-less text → empty array. */
  final case class BpeTokenizeToIds(child: Expression, model: BpeModelRef)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("subpos", IntegerType, nullable = false),
      StructField("token_id", IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_bpe_tokenize_ids"

    override def nullSafeEval(v: Any): Any =
      model.tokenizeRow(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v => {
        val m = ctx.addReferenceObj("bpeModel", model,
          classOf[BpeModelRef].getName)
        s"$m.tokenizeRow($v)"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** text → total token count (long) — the fused twin of
    * [[graft.ext.Bpe.tokenCountsBytes]]'s per-doc sum; 0 for word-less
    * text (callers filter to reproduce the join path's absent-row
    * semantics). Non-deterministic fence: a caller's `> 0` filter
    * would otherwise be pushed below the projection and evaluate the
    * kernel twice (the §4.4 duplication). */
  final case class BpeTokenCount(child: Expression, model: BpeModelRef)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bpe_token_count"
    override lazy val deterministic: Boolean = false

    override def nullSafeEval(v: Any): Any =
      model.countRow(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v => {
        val m = ctx.addReferenceObj("bpeModel", model,
          classOf[BpeModelRef].getName)
        s"$m.countRow($v)"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** [[BpeModelRef]] plus the HF `added_tokens` atomic-id contract —
    * the fused twin of [[graft.ext.Bpe.tokenizeBytesToIdsWithSpecials]]'
    * split/extract/interleave pipeline. Matching replicates the
    * DataFrame path's regex semantics exactly: literal specials,
    * leftmost non-overlapping scan, longest special wins at any
    * position (the path sorts the alternation longest-first and Java
    * regex takes the first alternative that matches). `pos` numbers
    * words-and-specials in document order (the dense_rank twin: an
    * empty text piece between adjacent specials emits nothing and
    * advances nothing). */
  final class BpeSpecialsRef(val model: BpeModelRef,
      specialsIn: Array[(String, Int)]) extends Serializable {
    private val specials: Array[(String, Int)] = specialsIn.sortBy(-_._1.length)

    def tokenizeRow(v: UTF8String): ArrayData = {
      val text = v.toString
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var pos = 0
      def emitWords(piece: String): Unit =
        graft.ext.Bpe.ByteLevel.byteWords(piece).foreach { w =>
          val ids = model.idsOf(w)
          var sp = 0
          while (sp < ids.length) {
            out += new GenericInternalRow(Array[Any](pos, sp, ids(sp)))
            sp += 1
          }
          pos += 1
        }
      var segStart = 0
      var i = 0
      while (i < text.length) {
        var k = 0
        var matched = -1
        while (k < specials.length && matched < 0) {
          if (text.startsWith(specials(k)._1, i)) matched = k
          k += 1
        }
        if (matched >= 0) {
          if (i > segStart) emitWords(text.substring(segStart, i))
          out += new GenericInternalRow(
            Array[Any](pos, 0, specials(matched)._2))
          pos += 1
          i += specials(matched)._1.length
          segStart = i
        } else i += 1
      }
      if (segStart < text.length) emitWords(text.substring(segStart))
      new GenericArrayData(out.toArray)
    }
  }

  /** text → array<struct<pos,subpos,token_id>> with specials atomic —
    * the exact row shape [[graft.ext.Bpe
    * .tokenizeBytesToIdsWithSpecials]] emits (same `pos` numbering,
    * same atomic ids), carried by the model-sized (merges, vocab,
    * specials) payload instead of the corpus-sized segment-table
    * broadcast. */
  final case class BpeTokenizeWithSpecials(child: Expression,
      ref: BpeSpecialsRef)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("subpos", IntegerType, nullable = false),
      StructField("token_id", IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_bpe_tokenize_specials"

    override def nullSafeEval(v: Any): Any =
      ref.tokenizeRow(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v => {
        val m = ctx.addReferenceObj("bpeSpecials", ref,
          classOf[BpeSpecialsRef].getName)
        s"$m.tokenizeRow($v)"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bpeTokenizeToIds(text: Column, merges: Seq[(String, String)],
      vocabIds: Map[String, Int]): Column =
    ColumnBridge.column(BpeTokenizeToIds(ColumnBridge.expr(text),
      new BpeModelRef(merges.toArray, vocabIds)))

  def bpeTokenizeWithSpecials(text: Column, merges: Seq[(String, String)],
      vocabIds: Map[String, Int], specials: Seq[(String, Int)]): Column =
    ColumnBridge.column(BpeTokenizeWithSpecials(ColumnBridge.expr(text),
      new BpeSpecialsRef(new BpeModelRef(merges.toArray, vocabIds),
        specials.toArray)))

  def bpeTokenCount(text: Column, merges: Seq[(String, String)],
      vocabIds: Map[String, Int]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expr(text),
      new BpeModelRef(merges.toArray, vocabIds)))
}
