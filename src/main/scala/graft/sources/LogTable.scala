package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.LogEtl

/** Reader for the compacted log table — the engine-side replacement for
  * the reference's Athena external table with date partition projection
  * (example_sql/athena_create_table.sql:30-47, SURVEY.md §3 E3).
  *
  * The output layout is directory-per-date (`<root>/<bucket>/yyyy/MM/dd`
  * or Hive `year=/month=/day=`). Partition "projection" here means the
  * date range is expanded to concrete paths driver-side and only those
  * directories are ever listed/scanned — no full-table listing, which at
  * 100 TB (thousands of date dirs × buckets) is the difference between
  * a metadata lookup and an hour of S3 LIST calls.
  */
object LogTable {

  /** Expand the date range to existing per-day directories (missing days
    * are skipped — sparse history is normal for backfilled tables).
    */
  def dayPaths(spark: SparkSession, destRoot: String, bucketName: String,
               from: LocalDate, to: LocalDate,
               hiveLayout: Boolean = false): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    Iterator.iterate(from)(_.plusDays(1))
      .takeWhile(!_.isAfter(to))
      .map(d => LogEtl.destPath(destRoot, bucketName, d, hiveLayout))
      .filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).exists(hp)
      }
      .toSeq
  }

  /** Read a date range of the compacted table: scans exactly the pruned
    * day directories, nothing else.
    */
  def read(spark: SparkSession, destRoot: String, bucketName: String,
           from: LocalDate, to: LocalDate,
           hiveLayout: Boolean = false): DataFrame = {
    val paths = dayPaths(spark, destRoot, bucketName, from, to, hiveLayout)
    require(paths.nonEmpty,
      s"no compacted data for $bucketName in [$from, $to] under $destRoot")
    spark.read.parquet(paths: _*)
  }
}
