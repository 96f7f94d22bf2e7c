package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic mergeable quantile sketch (the compactor-stack design:
  * Manku/Rajagopalan/Lindsay SIGMOD'98, modernized by Karnin/Lambert/
  * Liberty FOCS'16 "KLL") as a native `TypedImperativeAggregate` — the
  * quantile twin of [[SketchAggregates.SpaceSavingTopK]]. At 100 TB,
  * "p99 document length per source" via an exact percentile serializes
  * every group value through the exchange as reducer-side buffer state;
  * the sketch keeps a bounded stack of `k`-item compactors per partial,
  * partials merge associatively (partial aggregation works exactly like
  * `sum`'s), and only O(k·log(n/k)) doubles cross the exchange.
  *
  * Structure: level i holds items of weight 2^i. Updates append to
  * level 0; a level exceeding `k` items sorts, halves (one survivor per
  * adjacent pair, pair parity alternating per level — deterministic, no
  * RNG, so a given dataset+plan always yields the same summary) and
  * pushes the survivors to level i+1 at doubled weight. Each compaction
  * of level i perturbs any rank by ≤ 2^i/2, and level i compacts about
  * n/(k·2^i) times, so the total rank error is ≤ H·n/(2k) with
  * H = #levels ≈ log2(n/k) — the spec verifies this bound empirically
  * across merges and partitionings.
  *
  * The exactness contract is sharp, exactly like Space-Saving's
  * eviction flag: a summary that never compacted anywhere (total items
  * ≤ k per partial path — `exact = true` in the output) IS the sorted
  * multiset of its inputs, so extracted quantiles equal the exact
  * order-statistic interpolation and are partition-order invariant —
  * the regime the oracle gate pins hash-exact against DuckDB's
  * `quantile_cont`.
  *
  * [[QuantileSketchMergeAgg]] re-aggregates PERSISTED summaries — the
  * sketch-rollup store shape: a daily job writes one summary row per
  * (day, group); the governance report merges a year of partials at
  * summary cost without re-touching the corpus. Merging is the same
  * level-wise concatenation + compaction the map side uses, so a merge
  * of exact partials over disjoint data is bit-identical to the direct
  * sketch of the union.
  *
  * Summary type: `struct<items array<struct<value double, weight
  * long>>, exact boolean>`, items sorted (value asc, weight asc).
  * [[SketchQuantiles]] extracts interpolated quantiles from a summary
  * with the (n−1)·p rule over the weight-expanded virtual rows — on an
  * exact summary this is precisely `quantile_cont`'s formula. */
object QuantileSketches {

  val itemType: StructType = StructType(Seq(
    StructField("value", DoubleType), StructField("weight", LongType)))
  val summaryType: StructType = StructType(Seq(
    StructField("items", ArrayType(itemType)), StructField("exact", BooleanType)))

  /** Sketch buffer: one growable compactor per level + per-level pair
    * parity + whether any compaction ever happened (anywhere in this
    * buffer's history, merges included). */
  final class QSBuffer {
    val levels = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Double]]()
    val parity = scala.collection.mutable.ArrayBuffer[Int]()
    var compacted: Boolean = false

    def ensureLevel(i: Int): Unit =
      while (levels.size <= i) {
        levels += scala.collection.mutable.ArrayBuffer[Double]()
        parity += 0
      }
  }

  private def compactLevel(b: QSBuffer, i: Int, k: Int): Unit = {
    val arr = b.levels(i).toArray
    java.util.Arrays.sort(arr)
    val m = arr.length
    val even = m - (m % 2)
    val offset = b.parity(i) % 2
    b.parity(i) += 1
    b.ensureLevel(i + 1)
    val next = b.levels(i + 1)
    var j = 0
    while (j < even) { next += arr(j + offset); j += 2 }
    val cur = b.levels(i)
    cur.clear()
    if (m % 2 == 1) cur += arr(m - 1) // odd leftover keeps its weight
    b.compacted = true
  }

  /** Cascade: compact every level OVER capacity, bottom-up (a
    * compaction can overflow the level above). Strictly over — a level
    * holding exactly `k` items stays uncompacted, which is what makes
    * the exactness contract sharp at the boundary: a source with
    * exactly `k` rows per partial path stays `exact = true` (the
    * scaladoc's "total items ≤ k" regime, boundary included). */
  private def restore(b: QSBuffer, k: Int): Unit = {
    var i = 0
    while (i < b.levels.size) {
      while (b.levels(i).size > k) compactLevel(b, i, k)
      i += 1
    }
  }

  private def mergeInto(b: QSBuffer, other: QSBuffer, k: Int): Unit = {
    var i = 0
    while (i < other.levels.size) {
      if (other.levels(i).nonEmpty) {
        b.ensureLevel(i)
        b.levels(i) ++= other.levels(i)
      }
      i += 1
    }
    b.compacted ||= other.compacted
    restore(b, k)
  }

  private def evalBuffer(b: QSBuffer): Any = {
    var n = 0
    var i = 0
    while (i < b.levels.size) { n += b.levels(i).size; i += 1 }
    val vals = new Array[(Double, Long)](n)
    var p = 0
    i = 0
    while (i < b.levels.size) {
      val w = 1L << i
      val lv = b.levels(i)
      var j = 0
      while (j < lv.size) { vals(p) = (lv(j), w); p += 1; j += 1 }
      i += 1
    }
    val sorted = vals.sortBy(identity) // (value asc, weight asc) — total, deterministic
    InternalRow(
      new GenericArrayData(sorted.map { case (v, w) => InternalRow(v, w) }),
      !b.compacted)
  }

  private def serializeBuffer(b: QSBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(b.compacted)
    out.writeInt(b.levels.size)
    var i = 0
    while (i < b.levels.size) {
      out.writeInt(b.parity(i))
      val lv = b.levels(i)
      out.writeInt(lv.size)
      var j = 0
      while (j < lv.size) { out.writeDouble(lv(j)); j += 1 }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  private def deserializeBuffer(bytes: Array[Byte]): QSBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new QSBuffer()
    b.compacted = in.readBoolean()
    val nl = in.readInt()
    var i = 0
    while (i < nl) {
      b.ensureLevel(i)
      b.parity(i) = in.readInt()
      val m = in.readInt()
      val lv = b.levels(i)
      var j = 0
      while (j < m) { lv += in.readDouble(); j += 1 }
      i += 1
    }
    b
  }

  /** Fold one persisted summary row into a buffer: each item lands on
    * the level its (power-of-two) weight encodes; a non-exact input
    * taints the buffer's exactness, same as a local compaction. */
  private def absorbSummary(b: QSBuffer, row: InternalRow, k: Int): Unit = {
    val items = row.getArray(0)
    val exact = row.getBoolean(1)
    var i = 0
    while (i < items.numElements()) {
      val it = items.getStruct(i, 2)
      val w = it.getLong(1)
      val lvl = java.lang.Long.numberOfTrailingZeros(w)
      require(w > 0 && (1L << lvl) == w, s"summary weight $w is not a power of two")
      b.ensureLevel(lvl)
      b.levels(lvl) += it.getDouble(0)
      i += 1
    }
    if (!exact) b.compacted = true
    restore(b, k)
  }

  /** Interpolated quantiles from a summary struct: rank h = (W−1)·p
    * over the weight-expanded virtual rows, linear interpolation
    * between the two bracketing rows — `quantile_cont`'s rule (and
    * Spark `percentile`'s weighted form). Returns null for an empty
    * summary. Static + JVM-typed so both eval paths share one body. */
  def quantilesOf(summary: InternalRow, probs: Array[Double]): GenericArrayData = {
    if (summary == null) return null
    val items = summary.getArray(0)
    val n = items.numElements()
    if (n == 0) return null
    val values = new Array[Double](n)
    val cumW = new Array[Long](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val it = items.getStruct(i, 2)
      values(i) = it.getDouble(0)
      total += it.getLong(1)
      cumW(i) = total
      i += 1
    }
    def valueAtRank(r: Long): Double = {
      // first item whose cumulative weight exceeds r (0-based virtual row)
      var lo = 0
      var hi = n - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cumW(mid) > r) hi = mid else lo = mid + 1
      }
      values(lo)
    }
    val out = new Array[Any](probs.length)
    var pi = 0
    while (pi < probs.length) {
      val h = (total - 1) * probs(pi)
      val lo = math.floor(h).toLong
      val hi = math.ceil(h).toLong
      val vLo = valueAtRank(lo)
      out(pi) = if (hi == lo) vLo else vLo + (h - lo) * (valueAtRank(hi) - vLo)
      pi += 1
    }
    new GenericArrayData(out)
  }

  final case class QuantileSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QSBuffer] with ImplicitCastInputTypes {

    require(k >= 2 && k % 2 == 0, "k must be an even capacity >= 2")

    override def inputTypes = Seq(DoubleType)
    override def nullable: Boolean = false
    override def dataType: DataType = summaryType
    override def prettyName: String = "graft_quantile_sketch"
    override def children: Seq[Expression] = Seq(child)

    override def createAggregationBuffer(): QSBuffer = new QSBuffer()

    override def update(b: QSBuffer, input: InternalRow): QSBuffer = {
      val v = child.eval(input)
      if (v != null) {
        b.ensureLevel(0)
        b.levels(0) += v.asInstanceOf[Double]
        restore(b, k)
      }
      b
    }

    override def merge(b: QSBuffer, other: QSBuffer): QSBuffer = {
      mergeInto(b, other, k); b
    }

    override def eval(b: QSBuffer): Any = evalBuffer(b)
    override def serialize(b: QSBuffer): Array[Byte] = serializeBuffer(b)
    override def deserialize(bytes: Array[Byte]): QSBuffer = deserializeBuffer(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** Re-aggregate persisted summaries (the sketch-rollup store read
    * path). A merge of exact partials over disjoint data is
    * bit-identical to the direct sketch of the union. */
  final case class QuantileSketchMergeAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QSBuffer] with ExpectsInputTypes {

    require(k >= 2 && k % 2 == 0, "k must be an even capacity >= 2")

    override def inputTypes = Seq(summaryType)
    override def nullable: Boolean = false
    override def dataType: DataType = summaryType
    override def prettyName: String = "graft_quantile_merge"
    override def children: Seq[Expression] = Seq(child)

    override def createAggregationBuffer(): QSBuffer = new QSBuffer()

    override def update(b: QSBuffer, input: InternalRow): QSBuffer = {
      val v = child.eval(input)
      if (v != null) absorbSummary(b, v.asInstanceOf[InternalRow], k)
      b
    }

    override def merge(b: QSBuffer, other: QSBuffer): QSBuffer = {
      mergeInto(b, other, k); b
    }

    override def eval(b: QSBuffer): Any = evalBuffer(b)
    override def serialize(b: QSBuffer): Array[Byte] = serializeBuffer(b)
    override def deserialize(bytes: Array[Byte]): QSBuffer = deserializeBuffer(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** `array<double>` of interpolated quantiles at `probs` from a
    * summary struct; null on an empty summary. Scalar, codegen'd (the
    * generated code calls the same static body the interpreted path
    * uses — one implementation, both eval paths). */
  final case class SketchQuantiles(child: Expression, probs: Seq[Double])
      extends UnaryExpression with ExpectsInputTypes {

    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "probs must be within [0, 1]")

    override def inputTypes = Seq(summaryType)
    override def dataType: DataType = ArrayType(DoubleType)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sketch_quantiles"

    private lazy val probsArr: Array[Double] = probs.toArray

    override def nullSafeEval(s: Any): Any =
      quantilesOf(s.asInstanceOf[InternalRow], probsArr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val probsRef = ctx.addReferenceObj("probs", probsArr, "double[]")
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
           |  graft.functions.QuantileSketches.quantilesOf(
           |    (org.apache.spark.sql.catalyst.InternalRow) $s, $probsRef);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SketchQuantiles =
      copy(child = newChild)
  }

  // -- Column-level API ---------------------------------------------------

  /** Quantile-sketch summary of `c` (doubles) with compactor capacity
    * `k`: `struct<items array<struct<value, weight>>, exact bool>`.
    * Exact when no path saw more than `k` items. */
  def quantileSketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expr(c), k).toAggregateExpression())

  /** Merge persisted summaries back into one summary. */
  def quantileSketchMerge(c: Column, k: Int): Column =
    ColumnBridge.column(
      QuantileSketchMergeAgg(ColumnBridge.expr(c), k).toAggregateExpression())

  /** Interpolated quantiles at `probs` from a summary column. */
  def sketchQuantiles(c: Column, probs: Seq[Double]): Column =
    ColumnBridge.column(SketchQuantiles(ColumnBridge.expr(c), probs))
}
