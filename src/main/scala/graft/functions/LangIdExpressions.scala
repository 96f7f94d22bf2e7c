package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
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
          // >= : equal margins take the later (lexicographically larger)
          // lang, langs being sorted ascending — the struct-max tie rule
          if (java.lang.Double.compare(m, bm) >= 0) { best = j; bm = m }
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
