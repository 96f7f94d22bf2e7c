package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.graft.ColumnBridge

/** DataFrame surface for Spark's native Bloom-filter expressions.
  *
  * Spark ships codegen'd `bloom_filter_agg` / `might_contain`
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) for its own
  * runtime-filter injection, but does not register them in the public
  * function registry — this is the same two-hop Column bridge the graft
  * vector kernels use, no internals copied or modified.
  *
  * Contract: `bloomFilterAgg` consumes LONG hashes (pre-hash with
  * `xxhash64(...)` — the house 8-byte shuffle-key discipline) and
  * returns the filter as one BINARY value; `mightContain(bloom, h)`
  * tests a long hash against it. False positives at the configured
  * rate, NO false negatives — callers prefilter with it and make the
  * final decision exactly.
  */
object BloomFunctions {

  /** Aggregate a LONG column into a serialized Bloom filter sized for
    * `expectedItems` distinct values in `numBits` bits. */
  def bloomFilterAgg(hashCol: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expr(hashCol),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** True when `hashCol` (LONG) may be in `bloomCol` (BINARY from
    * [[bloomFilterAgg]]); false ⇒ definitely absent. */
  def mightContain(bloomCol: Column, hashCol: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(ColumnBridge.expr(bloomCol), ColumnBridge.expr(hashCol)))
}
