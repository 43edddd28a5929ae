package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Throwaway timing probe: run one named query N times at one SF and
  * print each elapsed plus per-stage task-time stats — separates
  * JIT/caching effects from steady state and localizes slow stages.
  * Usage: runMain graft.tools.TimeOne <query> <sfDir> [n]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskMs = mutable.Map[Int, mutable.ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = taskMs.synchronized {
        taskMs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer())
          .append(t.taskInfo.duration)
        if (t.taskInfo.duration > 1500 && t.taskMetrics != null) {
          val m = t.taskMetrics
          println(f"[slowtask] stage=${t.stageId} dur=${t.taskInfo.duration / 1e3}%.2fs " +
            f"run=${m.executorRunTime / 1e3}%.2fs cpu=${m.executorCpuTime / 1e9}%.2fs " +
            f"gc=${m.jvmGCTime / 1e3}%.2fs " +
            f"shufWrite=${m.shuffleWriteMetrics.writeTime / 1e9}%.2fs " +
            f"deser=${m.executorDeserializeTime / 1e3}%.2fs " +
            f"sched=${(t.taskInfo.launchTime - 0) % 1}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = taskMs.synchronized {
        val ts = taskMs.remove(s.stageInfo.stageId).getOrElse(mutable.ArrayBuffer())
        if (ts.nonEmpty && ts.sum > 500) {
          val sorted = ts.sorted
          println(f"[stage] id=${s.stageInfo.stageId}%4d tasks=${ts.length}%3d " +
            f"sum=${ts.sum / 1e3}%7.2fs max=${sorted.last / 1e3}%6.2fs " +
            f"med=${sorted(ts.length / 2) / 1e3}%6.2fs  ${s.stageInfo.name.take(60)}")
          if (sorted.last > 3000)
            // call-site stack of a straggler stage — the name field is
            // an opaque AQE thunk, the details carry the real site
            println("[stagesite] " + s.stageInfo.details.linesIterator
              .filter(_.contains("graft")).take(4).mkString(" <- "))
        }
      }
    })

    val fn = SparkEntry.queries(name)
    for (warmDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
      fn(spark, warmDir).count()
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
