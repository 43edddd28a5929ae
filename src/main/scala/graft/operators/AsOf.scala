package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row of the same key with `right.ts <= left.ts` — the lookup behind
  * "state as of this event" in feature pipelines.
  *
  * Spark has no native ASOF join; the naive formulation (inequality join
  * + per-row max) is O(|L|·|R|) per key and dies at scale. This is the
  * scalable composition (SURVEY.md §2c preference (a) — compose
  * built-ins): tag both sides, union, ONE shuffle on the key, ONE
  * partition-local sort on (ts, side), and a running `last(_, ignoreNulls)`
  * window carries the latest right payload forward into each left row.
  * Cost: shuffle |L|+|R| rows once — same shape as a sort-merge join.
  *
  * Ties: right rows sort before left rows at equal ts (inclusive `<=`).
  * Callers needing deterministic results must ensure one right row per
  * (key, ts) — pre-aggregate duplicates (as the asof01 query does).
  */
object AsOf {

  /** Left as-of join. Right payload columns come back as
    * `right_<name>` (NULL when no right row precedes the left row).
    */
  def joinAsOf(left: DataFrame, right: DataFrame,
               key: String, ts: String): DataFrame = {
    val rPayloadCols = right.columns.filter(c => c != key && c != ts).toSeq
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_rpay", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.schema.fields.filter(f => rPayloadCols.contains(f.name)))))
    val r = right
      .select(col(key), col(ts),
        struct(rPayloadCols.map(col): _*).as("_rpay"))
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("_asof", last(col("_rpay"), ignoreNulls = true).over(w))
    val leftCols = left.columns.toSeq.map(col)
    val rightCols = rPayloadCols.map(c =>
      col("_asof").getField(c).as(s"right_$c"))
    carried.filter(col("_side") === 1)
      .select(leftCols ++ rightCols: _*)
  }
}
