package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch (Metwally, Agrawal, El Abbadi,
  * ICDT 2005) as a native `TypedImperativeAggregate` — the map-side-
  * mergeable top-k primitive Spark's built-ins lack. At 100 TB, "top
  * domains / tokens / sources" via `groupBy(key).count().orderBy(...)`
  * shuffles every distinct key; the sketch keeps a bounded `capacity`-
  * entry summary per partition, partials merge associatively (partial
  * aggregation works exactly like `sum`'s), and only `capacity`-sized
  * buffers cross the exchange.
  *
  * Guarantees (the standard Space-Saving contract, spec-verified):
  *  - every estimate OVERcounts: `est − err ≤ true ≤ est`;
  *  - any key with true count > N/capacity is present in the summary;
  *  - when `capacity ≥` the number of distinct keys seen (no eviction
  *    anywhere), counts are EXACT and partition-order invariant — the
  *    regime the oracle gate pins hash-exact against DuckDB.
  *
  * Merging full sketches uses the mergeable-summaries rule (Agarwal et
  * al., PODS 2012): a key absent from one side is credited that side's
  * minimum count (its maximum possible true count there) into both the
  * estimate and the error, keeping both bounds valid; the merged map
  * then trims back to `capacity` by estimate.
  *
  * Eviction scans for the minimum entry — O(capacity), amortized only
  * over evicting updates; for the capacities this library targets
  * (≤ 2^16, a broadcastable governance summary) the scan beats heap
  * maintenance on every update. Result: `array<struct<term, count,
  * err>>` sorted (count desc, term asc), full summary — callers rank
  * or slice. */
object SketchAggregates {

  /** Sketch buffer: tracked entries + whether any entry was ever
    * evicted. The flag makes the exactness contract sharp: a side that
    * never evicted genuinely has count 0 for absent keys, so merges
    * credit no floor and capacity ≥ distinct ⇒ exact (not capacity >
    * distinct). */
  final class SSBuffer {
    // term -> [count, err]. Keyed on UTF8String, NOT java.lang.String:
    // (a) toString is lossy — distinct invalid-UTF-8 byte sequences all
    // decode to U+FFFD and would silently merge; (b) every ordering
    // decision (eviction tie-breaks, eval sort) must be BINARY
    // (UTF8String.compareTo) to agree with Spark's own string order and
    // the DuckDB oracle — Java String comparison is UTF-16 code-unit
    // order, which disagrees beyond the BMP. Keys are cloned on insert
    // (eval hands out buffer-backed instances).
    val map = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]()
    var evicted: Boolean = false
  }

  final case class SpaceSavingTopK(
      child: Expression,
      capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[SSBuffer] with ExpectsInputTypes {

    require(capacity > 0, "capacity must be positive")

    override def inputTypes = Seq(StringType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType), StructField("count", LongType),
      StructField("err", LongType))))
    override def prettyName: String = "graft_space_saving_topk"
    override def children: Seq[Expression] = Seq(child)

    override def createAggregationBuffer(): SSBuffer = new SSBuffer()

    private def minEntry(b: SSBuffer): java.util.Map.Entry[UTF8String, Array[Long]] = {
      var best: java.util.Map.Entry[UTF8String, Array[Long]] = null
      val it = b.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (best == null || e.getValue()(0) < best.getValue()(0)) best = e
      }
      best
    }

    /** The largest possible true count of a key ABSENT from `b`: 0 if
      * `b` never evicted, else its minimum tracked count. */
    private def floorOf(b: SSBuffer): Long =
      if (!b.evicted) 0L else minEntry(b).getValue()(0)

    override def update(b: SSBuffer, input: InternalRow): SSBuffer = {
      val v = child.eval(input)
      if (v != null) {
        val k = v.asInstanceOf[UTF8String]
        val cur = b.map.get(k)
        if (cur != null) cur(0) += 1
        else if (b.map.size() < capacity) b.map.put(k.clone(), Array(1L, 0L))
        else {
          val m = minEntry(b)
          val mc = m.getValue()(0)
          b.map.remove(m.getKey())
          b.map.put(k.clone(), Array(mc + 1, mc))
          b.evicted = true
        }
      }
      b
    }

    override def merge(b: SSBuffer, other: SSBuffer): SSBuffer = {
      if (other.map.isEmpty) return b
      if (b.map.isEmpty) {
        // deep-copy the entry arrays — sharing them would alias later
        // in-place merges into `other`
        val it0 = other.map.entrySet().iterator()
        while (it0.hasNext) {
          val e = it0.next()
          b.map.put(e.getKey, e.getValue.clone())
        }
        b.evicted ||= other.evicted
        return b
      }
      val floorB = floorOf(b)
      val floorO = floorOf(other)
      // keys in b: add other's count (or its floor if absent there)
      val itB = b.map.entrySet().iterator()
      while (itB.hasNext) {
        val e = itB.next()
        val o = other.map.get(e.getKey)
        if (o != null) { e.getValue()(0) += o(0); e.getValue()(1) += o(1) }
        else { e.getValue()(0) += floorO; e.getValue()(1) += floorO }
      }
      // keys only in other: credited b's floor
      val itO = other.map.entrySet().iterator()
      while (itO.hasNext) {
        val e = itO.next()
        if (!b.map.containsKey(e.getKey))
          b.map.put(e.getKey, Array(e.getValue()(0) + floorB, e.getValue()(1) + floorB))
      }
      b.evicted ||= other.evicted
      // trim back to capacity by estimate (ties evict the binary-
      // lexicographically larger term — deterministic). ONE sort of the
      // oversized entry set, not a min-scan per removal: two merged
      // full sketches hold up to 2·capacity entries, and the scan-per-
      // removal form is O(capacity²) per merge where this is
      // O(c·log c).
      if (b.map.size() > capacity) {
        val entries = new Array[java.util.Map.Entry[UTF8String, Array[Long]]](b.map.size())
        var i = 0
        val it = b.map.entrySet().iterator()
        while (it.hasNext) { entries(i) = it.next(); i += 1 }
        // worst first: estimate asc, then term DESC (larger term worse)
        java.util.Arrays.sort(entries,
          new java.util.Comparator[java.util.Map.Entry[UTF8String, Array[Long]]] {
            override def compare(
                a: java.util.Map.Entry[UTF8String, Array[Long]],
                c: java.util.Map.Entry[UTF8String, Array[Long]]): Int = {
              val byEst = java.lang.Long.compare(a.getValue()(0), c.getValue()(0))
              if (byEst != 0) byEst else c.getKey.compareTo(a.getKey)
            }
          })
        var j = 0
        val drop = entries.length - capacity
        while (j < drop) { b.map.remove(entries(j).getKey); j += 1 }
        b.evicted = true
      }
      b
    }

    override def eval(b: SSBuffer): Any = {
      val entries = new Array[(UTF8String, Long, Long)](b.map.size())
      var i = 0
      val it = b.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
        i += 1
      }
      // count desc, term BINARY asc — the order Spark/DuckDB agree on
      val sorted = entries.sortWith((a, c) =>
        a._2 > c._2 || (a._2 == c._2 && a._1.compareTo(c._1) < 0))
      new GenericArrayData(sorted.map { case (t, c, err) =>
        InternalRow(t, c, err)
      })
    }

    override def serialize(b: SSBuffer): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeBoolean(b.evicted)
      out.writeInt(b.map.size())
      val it = b.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val kb = e.getKey.getBytes // raw UTF8String bytes — lossless
        out.writeInt(kb.length); out.write(kb)
        out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): SSBuffer = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val b = new SSBuffer()
      b.evicted = in.readBoolean()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val kb = new Array[Byte](in.readInt()); in.readFully(kb)
        b.map.put(UTF8String.fromBytes(kb), Array(in.readLong(), in.readLong()))
        i += 1
      }
      b
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  // -- Column-level API ---------------------------------------------------

  /** Space-Saving summary of `c` (string keys) with `capacity` tracked
    * entries: `array<struct<term, count, err>>` sorted (count desc,
    * term asc). Exact when capacity ≥ distinct keys. */
  def spaceSavingTopK(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expr(c), capacity).toAggregateExpression())
}
