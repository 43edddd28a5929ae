package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Throwaway driver-overhead probe: run one named query N times and
  * attribute WALL time to (a) executor task time, (b) in-job scheduling
  * slack, (c) between-job driver gaps (planning, checkpoint bookkeeping,
  * AQE re-optimization). Accepts `--conf k=v` session overrides so
  * config hypotheses can be A/B-ed without touching Bench.
  * Usage: runMain graft.tools.JobProfile <query> <sfDir> [n] [--conf k=v ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val (confs, pos) = args.partition(_.startsWith("--conf="))
    val name = pos(0)
    val sfDir = if (pos.length > 1) pos(1) else "/root/testdata/sf0.1"
    val n = if (pos.length > 2) pos(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    confs.foreach { c =>
      val kv = c.stripPrefix("--conf=").split("=", 2)
      b = b.config(kv(0), kv(1))
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (jobId, submitted, completed), plus task-time + stage count sums
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]()
    val starts = mutable.Map[Int, Long]()
    @volatile var taskMs = 0L
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.synchronized { starts(j.jobId) = j.time }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach(t0 => jobs.append((j.jobId, t0, j.time)))
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskMs += s.stageInfo.taskMetrics.executorRunTime
      }
    })

    val fn = SparkEntry.queries(name)
    for (warmDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
      fn(spark, warmDir).count()
    for (i <- 1 to n) {
      jobs.synchronized(jobs.clear()); taskMs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      // merge overlapping job intervals → busy wall; rest = driver gaps
      val iv = jobs.sortBy(_._2)
      var busy = 0L; var cursor = 0L
      iv.foreach { case (_, s, e) =>
        val s2 = math.max(s, cursor)
        if (e > s2) { busy += e - s2; cursor = e }
        else cursor = math.max(cursor, e)
      }
      println(f"[jobprofile] $name run$i: wall=${wallMs / 1e3}%.2fs " +
        f"jobs=${iv.length}%d stages=$stages%d tasks=$tasks%d " +
        f"inJobWall=${busy / 1e3}%.2fs driverGaps=${(wallMs - busy) / 1e3}%.2fs " +
        f"taskTimeSum=${taskMs / 1e3}%.2fs")
    }
    spark.stop()
  }
}
