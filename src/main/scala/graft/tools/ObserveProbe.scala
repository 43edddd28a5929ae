package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway mechanism probe (r21): verify that `Dataset.observe`
  * metrics are collected when the observed frame's action is an EAGER
  * `localCheckpoint()` — the pattern that would make the per-round
  * convergence counts of the connected-components loops free (read
  * from the checkpoint job's own metrics instead of a separate count
  * job per round). Prints the observed vs recount values and exits
  * non-zero on mismatch or timeout.
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 1000).toDF("x").filter(col("x") % 3 === 0)
    val obs = Observation("probe")
    val cp = df.observe(obs, count(lit(1)).as("n"),
      count(when(col("x") > 900, lit(1))).as("big")).localCheckpoint()
    // get blocks until the observed action completes; localCheckpoint
    // already ran eagerly above, so this must return immediately
    val got = obs.get
    val n = got("n").asInstanceOf[Long]
    val big = got("big").asInstanceOf[Long]
    val realN = cp.count()
    println(s"[observeprobe] observed n=$n big=$big recount=$realN")
    if (n != realN || big != 33) sys.error("observe/localCheckpoint mismatch")
    spark.stop()
  }
}
