package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All reads go through the native parquet file source so Catalyst gets
  * column pruning + predicate pushdown + split planning for free — the
  * opposite of the reference's driver-side listing + opaque flatMap scan
  * (s3_server_access_logs.py:86-141,395-400), which defeats all three.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is nanosecond-precision in the parquet file; normalize to
    * micros (Spark's native precision) so results compare with DuckDB.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = load(spark, sfDir, "events")
    df.withColumn("ts", df.col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }
}
