package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

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
  *   - `Some(dir)` (the cluster posture): reliable `checkpoint()` —
  *     every round is recoverable from HDFS/S3 at the cost of one
  *     distributed write per round. For the engine's longest-running
  *     jobs (multi-hour PageRank over a 100 TB-derived graph) this is
  *     the only safe setting. The frame is persisted around the eager
  *     checkpoint so the plan computes ONCE (Dataset.checkpoint's
  *     count() action and the subsequent ReliableCheckpointRDD write
  *     job would otherwise each run it), and [[Truncator.rolling]]
  *     deletes round N−1's checkpoint files once round N has
  *     materialized, so a multi-hour loop holds O(1) checkpoint
  *     copies on disk instead of O(rounds).
  *
  * `checkpointDir` is installed via `SparkContext.setCheckpointDir`,
  * which is PER-SPARKCONTEXT state, not per-call: constructing a
  * truncator re-points the context's checkpoint location (last writer
  * wins) and it stays installed after the operator returns. Two
  * operators running CONCURRENTLY on one session with different dirs
  * would interleave writes across the two locations — both still
  * durable, but placement follows whichever dir was installed at
  * write time. Rolling cleanup is safe either way: each
  * [[Truncator.rolling]] chain attributes a round's files from the
  * checkpointed RDD itself (`RDD.getCheckpointFile`), so concurrent
  * chains — even three on one dir, as [[Graph.hits]] runs — can never
  * capture or delete another chain's live round.
  *
  * `enabled = false` (exposed by the operators as
  * `checkpoint = false`) disables truncation entirely and exists for
  * plan inspection only (PlanSpec pins per-round shapes that a
  * checkpoint would truncate away); a reliable dir overrides it — a
  * caller naming a durable location wants durability.
  */
private[graft] object Checkpointing {

  /** Per-invocation truncation handle for one iterative loop. Call
    * once per operator invocation (reliable mode installs
    * `checkpointDir` on the SparkContext at construction — see the
    * per-SparkContext note above), then apply to each frame:
    * `cp(df)` for frames that live for the WHOLE loop (edge tables,
    * node tables), `cp.rolling(df)` for per-round frames that
    * supersede the previous round's.
    */
  def truncator(spark: SparkSession, enabled: Boolean,
                checkpointDir: Option[String]): Truncator =
    new Truncator(spark, enabled, checkpointDir)

  private[graft] final class Truncator(spark: SparkSession, enabled: Boolean,
                                       checkpointDir: Option[String])
      extends (DataFrame => DataFrame) {
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    // checkpoint files (reliable mode) / persisted block RDDs (local
    // mode) written by the previous rolling() call — the round the
    // latest rolling frame superseded
    private var prevRound: Set[Path] = Set.empty
    private var prevLocal: Seq[RDD[InternalRow]] = Nil

    /** Truncate lineage; in reliable mode the files persist until the
      * caller (or a later [[rolling]] round) removes them.
      */
    def apply(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) {
        // persist so the eager count() and the checkpoint WRITE job
        // share one computation of the plan instead of two
        df.persist(StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint()
        finally df.unpersist()
      } else if (enabled) df.localCheckpoint()
      else df

    /** Truncate a PER-ROUND frame: after this round's checkpoint has
      * fully materialized, the previous rolling round's storage is
      * released — reliable mode deletes its checkpoint files (the
      * GraphFrames-CC discipline — Spark only cleans reliable
      * checkpoints itself under
      * `spark.cleaner.referenceTracking.cleanCheckpoints`, and then
      * only on driver GC, which a tight loop cannot wait for), local
      * mode unpersists its blocks (symmetric: a long loop otherwise
      * holds O(rounds) block sets on the executors). The LAST round is
      * never released here — the returned frame reads it; it is the
      * caller's output to keep or clean.
      *
      * A round's storage is attributed EXACTLY, from the checkpointed
      * RDD inside the returned frame's plan (`RDD.getCheckpointFile` /
      * the block RDD itself) — never by diffing the shared checkpoint
      * directory, which would capture files a concurrently-rolling
      * chain wrote in the same window and later delete that chain's
      * live round.
      */
    def rolling(df: DataFrame): DataFrame = {
      val out = apply(df) // eager: fully materialized when this returns
      if (checkpointDir.isEmpty) {
        if (enabled) {
          val rdds = blockRdds(out)
          prevLocal.foreach(_.unpersist(blocking = false))
          prevLocal = rdds
        }
      } else {
        val added = checkpointFiles(out)
        val fs = fileSystem()
        prevRound.foreach(p => fs.delete(p, true))
        prevRound = added
      }
      out
    }

    /** Release a frame previously truncated by THIS handle, once the
      * caller is done with it — the explicit-double-buffer variant of
      * [[rolling]] for loops whose convergence check must read round
      * N−1 AFTER round N has materialized (rolling would release N−1
      * the moment N lands, and a locally-checkpointed frame cannot be
      * recomputed once its blocks are gone). Same exact storage
      * attribution as rolling; never call it on the frame you are
      * about to return.
      */
    def release(df: DataFrame): Unit =
      if (checkpointDir.isEmpty) {
        if (enabled) blockRdds(df).foreach(_.unpersist(blocking = false))
      } else {
        val fs = fileSystem()
        checkpointFiles(df).foreach(p => fs.delete(p, true))
      }

    private def fileSystem() = {
      val p = new Path(spark.sparkContext.getCheckpointDir.get)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    }

    /** The checkpointed RDDs a just-truncated frame actually reads:
      * `Dataset.checkpoint`/`localCheckpoint` wrap the materialized
      * internal RDD in a leaf [[LogicalRDD]], so the frame's analyzed
      * plan names its storage exactly.
      */
    private def blockRdds(df: DataFrame): Seq[RDD[InternalRow]] =
      df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

    /** The rdd-N checkpoint directories backing a just-checkpointed
      * frame (reliable mode) — exact attribution, see [[rolling]].
      */
    private def checkpointFiles(df: DataFrame): Set[Path] =
      blockRdds(df).flatMap(_.getCheckpointFile).map(new Path(_)).toSet
  }
}
