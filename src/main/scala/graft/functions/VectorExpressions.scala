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

  /** Sign-bit LSH signature as ONE fused kernel: for each of `nPlanes`
    * hyperplanes, bit p = (v · plane_p >= 0), packed little-endian into
    * `nPlanes / bitsPerBand` longs. Semantically identical to the
    * 64-dot expression-tree form (same index-order double-precision
    * dots, same `>= 0` bit rule, same packing), but the tree form
    * generates ~14 KB of straight-line code inside one
    * `generate_doConsume` method — past HotSpot's 8 KB JIT limit, so
    * the whole signature scan ran INTERPRETED. This kernel is a tight
    * nested loop the JIT compiles and unrolls.
    *
    * The dimension guard rides in the kernel prologue (one branch per
    * row): a vector whose length differs from the planes' dimension
    * raises — the dot would otherwise silently fold over a prefix.
    * `planes` is flat row-major (plane-major) `float[nPlanes * dim]`,
    * matching the float-literal planes of the tree form bit-for-bit.
    */
  final case class LshSignatureFloat(child: Expression, planes: Array[Float],
      nPlanes: Int, dim: Int, bitsPerBand: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(nPlanes > 0 && nPlanes % bitsPerBand == 0,
      s"nPlanes ($nPlanes) must be a positive multiple of bitsPerBand ($bitsPerBand)")
    require(planes.length == nPlanes * dim,
      s"planes length ${planes.length} != nPlanes*dim (${nPlanes * dim})")
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_lsh_signature"

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val bands = LshSignatureFloat.compute(v, planes, nPlanes, dim, bitsPerBand)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(bands)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val p = ctx.addReferenceObj("lshPlanes", planes, "float[]")
        val bands = ctx.freshName("bands")
        s"""
           |final long[] $bands = graft.functions.VectorExpressions.lshCompute(
           |  $v, $p, $nPlanes, $dim, $bitsPerBand);
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object LshSignatureFloat {
    def compute(v: ArrayData, planes: Array[Float], nPlanes: Int, dim: Int,
        bitsPerBand: Int): Array[Long] = {
      val n = v.numElements()
      if (n != dim) throw new RuntimeException(
        s"lshSignature: embedding dimension $n != configured dim $dim")
      val nBands = nPlanes / bitsPerBand
      val bands = new Array[Long](nBands)
      var p = 0
      while (p < nPlanes) {
        var s = 0.0
        val off = p * dim
        var i = 0
        while (i < dim) { s += v.getFloat(i).toDouble * planes(off + i).toDouble; i += 1 }
        // Spark's `>=` orders NaN above every value (tree form set the
        // bit for a NaN dot); java's `>=` is false on NaN — match Spark.
        if (s >= 0 || java.lang.Double.isNaN(s)) bands(p / bitsPerBand) |= 1L << (p % bitsPerBand)
        p += 1
      }
      bands
    }
  }

  /** Codegen entry point for [[LshSignatureFloat]] (Java-callable). */
  def lshCompute(v: ArrayData, planes: Array[Float], nPlanes: Int, dim: Int,
      bitsPerBand: Int): Array[Long] =
    LshSignatureFloat.compute(v, planes, nPlanes, dim, bitsPerBand)

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
  /** `planes(p)(i)` = component i of hyperplane p; flattened plane-major
    * and truncated to float (matching the tree form's float literals). */
  def lshSignatureF(vec: Column, planes: Array[Array[Double]], bitsPerBand: Int): Column = {
    val nPlanes = planes.length
    val dim = planes.head.length
    val flat = new Array[Float](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      var i = 0
      while (i < dim) { flat(p * dim + i) = planes(p)(i).toFloat; i += 1 }
      p += 1
    }
    toColumn(LshSignatureFloat(toExpr(vec), flat, nPlanes, dim, bitsPerBand))
  }
}
