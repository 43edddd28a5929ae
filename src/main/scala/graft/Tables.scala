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

  /** `events.ts` is nanosecond-precision parquet, which Spark 4 refuses
    * outright (PARQUET_TYPE_ILLEGAL). Read it as a raw long via the
    * legacy conf, truncate ns → µs with integer division (DuckDB's reader
    * truncates identically), and surface TIMESTAMP_NTZ so downstream
    * results hash-match the DuckDB oracle.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000"))
        .cast(org.apache.spark.sql.types.TimestampNTZType))
  }
}
