package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization (SURVEY.md §2c): a keyed rollup with
  * missing buckets becomes a dense, regular series — the step between
  * "aggregate what happened" and anything that consumes fixed-interval
  * input (monitoring charts, anomaly scoring, training windows).
  *
  * Scale posture: the GRID is rollup-sized, not event-sized — |buckets|
  * × |keys| rows built from two tiny aggregates (global bounds, distinct
  * keys), both broadcast; the left join back to the rollup is the only
  * keyed shuffle and carries rollup rows. The forward fill is one
  * ordered window per key — state is a single value, and at cluster
  * scale each key's partition streams independently.
  */
object TimeSeries {

  /** Densify `rollup` onto the full [min, max] bucket grid per key.
    *
    * @param rollup    one row per (bucket timestamp, key) — the output
    *                  of a windowed aggregation
    * @param tsCol     bucket timestamp column (regular spacing)
    * @param keyCol    series key column
    * @param step      bucket width, e.g. `expr("INTERVAL 1 HOUR")`
    * @param zeroCols  count-like columns: missing buckets become 0
    * @param ffillCols gauge-like columns: missing buckets carry the last
    *                  observed value forward (null before the first
    *                  observation — there is nothing to carry)
    */
  def gapFill(rollup: DataFrame, tsCol: String, keyCol: String, step: Column,
              zeroCols: Seq[String], ffillCols: Seq[String]): DataFrame = {
    val bounds = rollup.agg(min(col(tsCol)).as("_lo"), max(col(tsCol)).as("_hi"))
    val buckets = bounds
      .select(explode(sequence(col("_lo"), col("_hi"), step)).as(tsCol))
    val keys = rollup.select(col(keyCol)).distinct()
    // grid = buckets × keys: both sides are rollup-derived aggregates
    // (bounded by bucket count and key cardinality), so the cross join
    // broadcasts — never proportional to the event volume
    val grid = broadcast(buckets).crossJoin(broadcast(keys))
    val joined = grid.join(rollup, Seq(tsCol, keyCol), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zeroed = zeroCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0L)))
    }
    ffillCols.foldLeft(zeroed) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
