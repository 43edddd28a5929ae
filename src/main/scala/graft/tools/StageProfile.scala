package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Throwaway per-STAGE attribution probe (r21): run one named query
  * once (after warm-up) and print every completed stage's task-time
  * sum, task count and name — the "which operator actually burns the
  * executor seconds" view JobProfile's per-run totals can't give.
  * Usage: runMain graft.tools.StageProfile <query> <sfDir> [topN]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val topN = if (args.length > 2) args(2).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Long, Int, String)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (record) stages.synchronized {
          // the graft frames in the submission stack identify the
          // operator; the callsite name alone is "start at ..." for
          // everything inside a foreachBatch
          val where = s.stageInfo.details.linesIterator
            .filter(l => l.contains("graft.") && !l.contains("tools."))
            .take(3).mkString(" <- ")
          stages.append((s.stageInfo.taskMetrics.executorRunTime,
            s.stageInfo.numTasks, s.stageInfo.name + " | " + where))
        }
    })
    val fn = SparkEntry.queries(name)
    for (warmDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
      fn(spark, warmDir).count()
    record = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    record = false
    Thread.sleep(1000) // drain the async listener bus
    val rows = stages.synchronized(stages.toSeq)
    println(f"[stageprofile] $name wall=$wall%.2f s stages=${rows.size} " +
      f"taskMsSum=${rows.map(_._1).sum}")
    rows.sortBy(-_._1).take(topN).foreach { case (ms, nt, nm) =>
      println(f"[stageprofile]   $ms%7d ms  $nt%4d tasks  ${nm.take(140)}")
    }
    spark.stop()
  }
}
