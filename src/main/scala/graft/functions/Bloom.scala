package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.bridge

/** User-facing handles on Spark's internal bloom-filter expressions —
  * the same pair (`BloomFilterAggregate` → binary sketch,
  * `BloomFilterMightContain` → probe) the optimizer's injected runtime
  * row-level filters use, but available explicitly so a pipeline can
  * build the filter once, persist/broadcast it, and prune a huge fact
  * scan before any shuffle. Spark registers neither as a SQL function,
  * so these go through the Column↔Expression bridge.
  *
  * The probe value must be the SAME hash expression family the filter
  * was built over (xxhash64 of the key) — the aggregate stores longs.
  */
object Bloom {

  /** Aggregate a bloom filter (binary) over `keyHash` (use
    * `xxhash64(key)`). Sizing per standard bloom math: `numBits ≈
    * -n·ln(p)/(ln2)²` for target false-positive rate p.
    */
  def bloomFilterAgg(keyHash: Column, expectedItems: Long,
                     numBits: Long): Column =
    bridge.column(new BloomFilterAggregate(bridge.expression(keyHash),
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Probe: may return false positives, never false negatives — follow
    * with an exact join when exactness matters.
    */
  def mightContain(bloom: Column, keyHash: Column): Column =
    bridge.column(BloomFilterMightContain(bridge.expression(bloom),
      bridge.expression(keyHash)))
}
