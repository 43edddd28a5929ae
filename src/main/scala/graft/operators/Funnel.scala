package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Marketing-style touch attribution: every conversion event joined
    * to the user's touch events inside a lookback window, summarized to
    * (n_touches, first-touch id, last-touch id) per conversion — the
    * first/last-touch models an attribution report runs.
    *
    * First/last selection rides ONE min/max over an encoded key —
    * `(touch µs − conversion µs)·10⁶ + touch_id` — instead of a
    * per-conversion rank window: the delta is bounded by the lookback
    * (≤ 72 h ≈ 2.6·10¹¹ µs, ×10⁶ well inside a long) and the id term
    * breaks ties toward the SMALLER id for first touch and the LARGER
    * for last. Both extremes decode back with a sign-safe mod. Touch
    * ids must stay below 10⁶ for the encoding — enforced per-row with
    * `raise_error`, the dd15 guard discipline (a plan-time `require`
    * cannot see data).
    *
    * Scale shape: both sides hash-partition on the user key (neither
    * side of a conversions×touches join is broadcastable at corpus
    * scale), the lookback predicate prunes pairs inside the join, and
    * the per-conversion summary is a map-side-combined min/max/count —
    * exchange volume is one row per surviving pair, never a
    * per-conversion candidate list in one task. A pathological
    * single-user hot key would salt by (user, day) — the q39 pattern.
    */
  def attribution(events: DataFrame, touchTypes: Seq[String],
                  convType: String, lookbackHours: Int,
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    val p = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol),
        col(tsCol).as("conv_ts"))
    val guardedTid = when(col(idCol) < 1000000L, col(idCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("attribution key encoding needs touch ids < 1000000; got "),
        col(idCol).cast("string"))).cast("long"))
    val t = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("_tu"), col(tsCol).as("_tts"),
        guardedTid.as("_tid"))
    // NTZ carries no zone; the UTC session makes the LTZ reading of the
    // same wall clock carry identical micros, which is what the oracle's
    // epoch_us computes on the naive timestamp
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    val key = (micros(col("_tts")) - micros(col("conv_ts"))) * 1000000L +
      col("_tid")
    def decodeId(k: Column) = ((k % 1000000L) + 1000000L) % 1000000L
    p.join(t,
        col("_tu") === col(userCol) &&
          col("_tts") <= col("conv_ts") &&
          col("_tts") > col("conv_ts") - expr(s"INTERVAL $lookbackHours HOURS"),
        "left")
      .select(col("conv_id"), col(userCol), col("conv_ts"), col("_tid"),
        key.as("_k"))
      .groupBy("conv_id", userCol, "conv_ts")
      .agg(count(col("_tid")).as("n_touches"),
        min(col("_k")).as("_fk"), max(col("_k")).as("_lk"))
      .select(col("conv_id"), col(userCol), col("conv_ts"),
        col("n_touches"),
        decodeId(col("_fk")).as("first_touch_id"),
        decodeId(col("_lk")).as("last_touch_id"))
      .orderBy("conv_id")
  }
}
