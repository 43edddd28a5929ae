package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming counterparts of the batch operators: the same
  * event-stream semantics (hourly rollups, gap sessionization) expressed
  * over an unbounded source with watermarks for late data.
  *
  * The reference has no streaming path — its "stream" is a daily cron
  * re-invocation with backfill replay (deploy/template.yaml:114-130,
  * s3_server_access_logs.py:361-368). This module is the §2c/§7
  * extension: `readStream` → transform → `writeStream`, with event-time
  * state instead of re-runs.
  *
  * Scale posture: both jobs are keyed-state streaming aggregations whose
  * state is hash-partitioned by group key across executors; watermarks
  * bound state size (windows expire, sessions time out). No driver-side
  * state.
  */
case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
case class SessionAgg(user_id: Long, session_start: Timestamp,
                      session_end: Timestamp, n_events: Long, sum_value: Double)
case class SState(start: Long, end: Long, n: Long, total: Double)

object StreamingJobs {

  /** Tumbling-window rollup with watermark: counts + value sums per
    * (1-hour window, event_type); windows finalize (append-mode emit)
    * once the watermark passes their end.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("v"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("v"))

  /** [[hourlyRollup]]'s sliding twin: 1-hour windows every 15 minutes —
    * each event feeds four overlapping windows, the freshness/latency
    * trade monitoring rollups actually run. Same watermark-bounded
    * keyed state; window count (not event count) bounds state size.
    */
  def slidingRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("total_value"))

  /** The reference's compact pipeline as a CONTINUOUS job: tail raw log
    * text landing under `inputRoot`, parse with the fused parser, write
    * date-partitioned snappy parquet exactly-once (checkpointed file
    * sink). Replaces the daily-cron + backfill-replay model
    * (deploy/template.yaml:114-130) with arrival-time processing.
    * The batch job's partition-local time sort is omitted — a streaming
    * sink appends per micro-batch; compact row groups come from the
    * micro-batch granularity instead.
    */
  def streamCompact(spark: org.apache.spark.sql.SparkSession,
                    inputRoot: String, dest: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val parsed = graft.sources.S3AccessLog.parse(
      spark.readStream.text(inputRoot))
    parsed
      .withColumn("log_date", to_date(col("request_time")))
      .writeStream
      .format("parquet")
      .option("path", dest)
      .option("checkpointLocation", checkpoint)
      .option("compression", "snappy")
      .partitionBy("log_date")
      .start()
  }

  /** CDC-style streaming upsert through `foreachBatch` — the sink API
    * for maintaining a keyed TABLE from a stream, which no row-append
    * sink can express. Each micro-batch folds into the target with a
    * versioned latest-wins merge (last event per key by (ts, event_id))
    * plus an additive update count; both combines are commutative and
    * associative, so the maintained table is independent of micro-batch
    * boundaries and arrival order — exactly the property a CDC merge
    * needs under retried/reordered batches.
    *
    * Every merge writes a NEW target generation and the previous one
    * stays intact (write-new, swap-pointer — never overwrite-in-place
    * a directory the merge is reading): the reference's idempotent
    * overwrite discipline (s3.py:459) applied to a continuously
    * maintained table. Returns the final generation's path.
    */
  private[graft] def cdcFold(prev: Option[DataFrame],
                             batch: DataFrame): DataFrame = {
    val bs = batch.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"))).as("_m"),
        count(lit(1)).as("n_updates"))
    prev.fold(bs)(t => t.unionByName(bs)
      .groupBy(col("user_id"))
      .agg(max(col("_m")).as("_m"),
        sum(col("n_updates")).as("n_updates")))
  }

  /** [[cdcUpsertStream]] with the query lifecycle in the caller's hands
    * (tests drive batch boundaries by hand): returns the running query
    * and a thunk yielding the current final-generation path.
    */
  def cdcUpsertQuery(updates: DataFrame, workDir: String)
      : (org.apache.spark.sql.streaming.StreamingQuery, () => String) = {
    var gen = 0
    val q = updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val prev =
          if (gen == 0) None else Some(s.read.parquet(s"$workDir/gen$gen"))
        val merged = cdcFold(prev, batch)
        gen += 1
        merged.write.mode("overwrite").parquet(s"$workDir/gen$gen")
        ()
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    (q, () => s"$workDir/gen$gen")
  }

  def cdcUpsertStream(updates: DataFrame, workDir: String): String = {
    val (q, finalGen) = cdcUpsertQuery(updates, workDir)
    try q.processAllAvailable() finally q.stop()
    finalGen()
  }

  /** Streaming exact dedup over a content hash: each distinct payload is
    * emitted once; duplicate arrivals within the watermark horizon are
    * dropped, and the hash leaves the state store once the watermark
    * passes it (bounded state — a plain `dropDuplicates` would pin every
    * hash ever seen). The 32-byte hash, not the document, is what sits
    * in state and what the equality check shuffles on — same shape as
    * the batch [[graft.operators.Dedup.byContentHash]].
    */
  def dedupStream(docs: DataFrame, tsCol: String, contentCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("_h", sha2(col(contentCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")

  /** Stream-stream interval join: each click matched to the same user's
    * purchases landing within `maxLagMinutes` AFTER it. Both sides carry
    * watermarks and the join condition bounds event-time distance in
    * both directions, so each side's buffered state is evictable —
    * the only stream-stream join shape that runs with finite state.
    */
  def clickToPurchase(events: DataFrame, maxLagMinutes: Int = 30,
                      watermark: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") +
          expr(s"INTERVAL $maxLagMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** Stateful gap sessionization: per-user session state in the state
    * store, closed sessions emitted when a gap arrives in-stream or the
    * event-time timeout fires (watermark passed last event + gap).
    * Mirrors the batch `Sessionize.summarize` semantics.
    *
    * State tracks MICROSECONDS (the event-time precision Spark encodes),
    * not `Timestamp.getTime` milliseconds — ms truncation would silently
    * shift session bounds on µs-precision data and break agreement with
    * the batch formulation. Only the state-store timeout (a ms API)
    * rounds, and it rounds UP so a timeout can never fire before
    * `end + gap`.
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int,
                 watermark: String = "10 minutes"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    def micros(t: Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def fromMicros(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }

    def close(userId: Long, s: SState): SessionAgg =
      SessionAgg(userId, fromMicros(s.start), fromMicros(s.end), s.n, s.total)

    def fn(userId: Long, it: Iterator[SessionEvent],
           state: GroupState[SState]): Iterator[SessionAgg] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(userId, _)).iterator
        state.remove()
        out
      } else {
        val evs = it.toSeq.sortBy(e => micros(e.ts))
        var cur = state.getOption
        val closed = Seq.newBuilder[SessionAgg]
        evs.foreach { e =>
          val t = micros(e.ts)
          cur match {
            case Some(s) if t - s.end > gapUs =>
              closed += close(userId, s)
              cur = Some(SState(t, t, 1, e.value))
            case Some(s) =>
              cur = Some(SState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
            case None =>
              cur = Some(SState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // ceil to ms: firing 1 ms late is harmless, 1 ms early would
          // close a session the batch semantics keep open
          state.setTimeoutTimestamp((s.end + gapUs + 999) / 1000)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
