package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named SparkEntry query, print timing and
  * (optionally) the final adaptive plan.
  *
  * Usage: runMain graft.tools.QueryRun <name> [sfDir] [--explain] [--times N]
  */
object QueryRun {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val times = args.sliding(2).collectFirst {
      case Array("--times", n) => n.toInt }.getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to times).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[queryrun] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (explain) {
      val df = fn(spark, sfDir)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
