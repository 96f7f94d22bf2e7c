package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Custom Catalyst expressions (SURVEY §2.10 preference order (b):
  * native `Expression` with `doGenCode` beats UDFs) for the two hot
  * kernels of the similarity/dedup operators:
  *
  *  - [[DotProductFloat]]: Σ aᵢ·bᵢ over two float arrays. The
  *    higher-order-function form (`aggregate(zip_with(...))`) allocates
  *    an intermediate products array per row and walks generic
  *    SpecializedGetters twice; the generated loop here reads both
  *    arrays once with zero allocation. Accumulation order is identical
  *    (index order, double precision), so results are bit-for-bit the
  *    same — the oracle gate stays exact.
  *  - [[SortedIntersectCount]]: |A ∩ B| for two SORTED long arrays via
  *    linear merge — `size(array_intersect(...))` builds the
  *    intersection array only to take its length.
  *
  * Both assume non-null array elements (enforced upstream: embeddings
  * and hashed token sets never contain nulls).
  */
object VectorExpressions {

  private[functions] def toExpr(c: Column): Expression = ColumnBridge.expr(c)
  private[functions] def toColumn(e: Expression): Column = ColumnBridge.column(e)

  /** Σ aᵢ·bᵢ in index order, double precision, over min(len) elements. */
  final case class DotProductFloat(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** |A ∩ B| by linear merge; both inputs MUST be sorted ascending and
    * duplicate-free (callers sort_array(array_distinct(...)) once per
    * row, amortized over every pair the row participates in). */
  final case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_intersect_count"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val (nx, ny) = (x.numElements(), y.numElements())
      var i = 0; var j = 0; var c = 0L
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $i = 0; int $j = 0; long $c = 0L;
           |final int ${i}N = $a.numElements();
           |final int ${j}N = $b.numElements();
           |while ($i < ${i}N && $j < ${j}N) {
           |  final long $xv = $a.getLong($i);
           |  final long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** The IEEE-754 total-order key of a double: a long whose SIGNED
    * ordering equals the double ordering (−Inf < … < −0.0 < +0.0 < … <
    * +Inf < NaN, matching Spark's sort order). `b ^ ((b >> 63) &
    * Long.MaxValue)` flips every bit except the sign for negatives and
    * is the identity for positives. Equal doubles (same bits) map to
    * equal keys, so any fixed-width PREFIX of the key is a monotone
    * bucketing — the grid [[graft.series.SeriesOps.exactPercentilesBucketed]]
    * refines 16 bits per level with guaranteed convergence. */
  final case class DoubleOrderBits(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(DoubleType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_double_order_bits"

    override def nullSafeEval(v: Any): Any = {
      val b = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      b ^ ((b >> 63) & Long.MaxValue)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val b = ctx.freshName("b")
        s"""
           |final long $b = java.lang.Double.doubleToLongBits($v);
           |${ev.value} = $b ^ (($b >> 63) & Long.MAX_VALUE);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // -- Column-level API ---------------------------------------------------

  def dotF(a: Column, b: Column): Column = toColumn(DotProductFloat(toExpr(a), toExpr(b)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    toColumn(SortedIntersectCount(toExpr(a), toExpr(b)))
  def doubleOrderBits(c: Column): Column = toColumn(DoubleOrderBits(toExpr(c)))
}
