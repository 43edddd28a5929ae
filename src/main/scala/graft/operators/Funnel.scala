package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis over an event stream: how many
  * users reached step 1, then step 2 AFTER step 1, then step 3 AFTER
  * step 2 — the conversion query every event pipeline runs.
  *
  * Formulation: stage k's earliest-valid time is a filtered `min`
  * constrained to follow stage k-1's, so the computation folds left
  * over the step list — one user-keyed aggregation per stage, each with
  * map-side partial aggregation. The events table itself is re-read per
  * stage but always pre-filtered to the single step's event type before
  * the shuffle (filter + column pruning reach the scan), so each pass
  * moves only that step's rows, not the whole stream. For funnels over
  * many steps a single-shuffle collect-and-walk (sorted per-user list +
  * HOF fold) wins; for the typical 3-5 step funnel the per-stage
  * filtered shuffles are smaller in total.
  */
object Funnel {

  /** Per-user step-completion times: (user, t_1, ..., t_n) where t_k =
    * earliest `tsCol` of an event of type steps(k) at or after t_{k-1}
    * (null if the user never completed step k in order).
    */
  def stepTimes(events: DataFrame, steps: Seq[String],
                userCol: String = "user_id", typeCol: String = "event_type",
                tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def stepRows(step: String) =
      events.filter(col(typeCol) === step).select(col(userCol), col(tsCol))
    val first = stepRows(steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t_1"))
    steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val groupCols = col(userCol) +: (1 to i).map(j => col(s"t_$j"))
      acc.join(stepRows(step), Seq(userCol), "left")
        .groupBy(groupCols: _*)
        .agg(min(when(col(tsCol) >= col(s"t_$i"), col(tsCol)))
          .as(s"t_${i + 1}"))
    }
  }

  /** Funnel counts: one row per step with the number of users whose
    * ordered path reached it. All step counts come from ONE global
    * aggregation over the step-times frame (count(t_k) ignores nulls),
    * then fan out to rows with an explode generator — a union of
    * per-step aggregates would re-plan the whole chain per branch.
    * Built from typed Columns, never interpolated SQL text, so step
    * names with quotes/backslashes pass through verbatim.
    */
  def counts(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    val times = stepTimes(events, steps, userCol, typeCol, tsCol)
    val agg = times.agg(
      count(col("t_1")).as("n_1"),
      (2 to steps.length).map(i => count(col(s"t_$i")).as(s"n_$i")): _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit((i + 1).toLong).as("step"), lit(step).as("event_type"),
        col(s"n_${i + 1}").as("n_users"))
    }
    agg.select(explode(array(rows: _*)).as("s"))
      .select(col("s.step"), col("s.event_type"), col("s.n_users"))
  }
}
