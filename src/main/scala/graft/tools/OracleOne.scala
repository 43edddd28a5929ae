package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev utility: dump ONE gate query's result parquet plus a one-entry
  * oracle_sql.json, so `local_oracle_check.py <sf> <out> --no-run`
  * compares a single query in seconds while iterating on it (the full
  * Verify run re-dumps all gate rows).
  *
  * Usage: runMain graft.tools.OracleOne <name>[,<name>...] [sfDir] [outDir]
  */
object OracleOne {
  def main(args: Array[String]): Unit = {
    val names = args.head.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(2).getOrElse("/tmp/graft-oracle-one")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[oracle-one] wrote $outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sql = names.flatMap(n => graft.SparkEntry.oracleSql.get(n)
      .map(s => s"${q(n)}: ${q(s)}")).mkString("{", ", ", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), sql)
    spark.stop()
  }
}
