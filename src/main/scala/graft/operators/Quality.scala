package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality validation operators (the Deequ / dbt-test shape):
  * one-pass column profiling, declarative rule checks, and
  * referential-integrity reports. Violations are emitted as REPORT
  * ROWS, never exceptions — a 100 TB validation run is a plain query
  * whose output lands next to the data it describes.
  *
  * Scale posture: profile and rule checks are ONE aggregation pass
  * each — every metric is a column expression over the same scan, and
  * the per-column/per-rule output rows come from a single `stack`
  * Expand of the one-row aggregate, not per-column scans. The exact
  * multi-column DISTINCT in [[profile]] plans as Spark's Expand-based
  * multi-distinct (rows × profiled columns before partial aggregation);
  * at extreme widths swap `countDistinct` for `approx_count_distinct`
  * — the report schema is unchanged. Referential checks are anti joins
  * on the key, broadcast when the parent is dimension-sized.
  */
object Quality {

  /** One-pass column profile: per column — row count, null count,
    * exact distinct count, min/max (rendered as strings so one report
    * schema covers every column type).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast(StringType).as(s"_min_$c"),
        max(col(c)).cast(StringType).as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val stackArgs = cols
      .map(c => s"'$c', _cnt_$c, _nd_$c, _min_$c, _max_$c").mkString(", ")
    one.selectExpr("_n",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, _non_null, n_distinct, min_value, max_value)")
      .select(col("column_name"), col("_n").as("n_rows"),
        (col("_n") - col("_non_null")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Declarative rule check: each rule is (name, boolean column); a row
    * violates a rule when the predicate is false OR null (an
    * unevaluable constraint is a violation, not a pass). One
    * aggregation pass for all rules.
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules needs at least one rule")
    val aggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"_v_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map(r => s"'${r._1}', _v_${r._1}").mkString(", ")
    one.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)")
  }

  /** Referential-integrity report: child rows whose key has no match in
    * the parent (NULL child keys are orphans — a null FK fails the
    * constraint). Anti join on the key; broadcast-sized parents never
    * shuffle the child side.
    */
  def orphanReport(relation: String,
                   child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit(relation).as("relation"), col("n_orphans"))
}
