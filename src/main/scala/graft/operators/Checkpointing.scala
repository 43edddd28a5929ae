package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE lineage-truncation policy shared by every iterative
  * operator in the engine (PageRank / personalized PR / k-core /
  * label-prop, Lloyd and k-center seeding, BPE training, connected
  * components). Iterative BSP loops grow their plan by one join + agg
  * per round; truncating lineage each round keeps round N planning
  * O(1) work instead of O(N).
  *
  * Two truncation modes, picked by `checkpointDir`:
  *   - `None` (the local default): `localCheckpoint` — no distributed
  *     write, but blocks are executor-local and NOT fault-tolerant; on
  *     a real cluster one lost executor mid-iteration kills the job.
  *   - `Some(dir)` (the cluster posture): `setCheckpointDir(dir)` +
  *     reliable `checkpoint()` — every round is recoverable from
  *     HDFS/S3 at the cost of one distributed write per round. For the
  *     engine's longest-running jobs (multi-hour PageRank over a
  *     100 TB-derived graph) this is the only safe setting.
  *
  * `enabled = false` (exposed by the operators as
  * `checkpoint = false`) disables truncation entirely and exists for
  * plan inspection only (PlanSpec pins per-round shapes that a
  * checkpoint would truncate away); a reliable dir overrides it — a
  * caller naming a durable location wants durability.
  */
private[graft] object Checkpointing {

  /** Per-round truncation function for one iterative loop. Call once
    * per operator invocation (it installs `checkpointDir` on the
    * SparkContext), then apply to each round's frame.
    */
  def truncator(spark: SparkSession, enabled: Boolean,
                checkpointDir: Option[String]): DataFrame => DataFrame = {
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    df =>
      if (checkpointDir.isDefined) df.checkpoint()
      else if (enabled) df.localCheckpoint()
      else df
  }
}
