package graft.operators

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.S3AccessLog

/** The reference's whole pipeline surface, Spark-first
  * (s3_server_access_logs.py:378-466):
  *
  *   text scan → parse → project(27 cols, request_time at position 3) →
  *   repartition(numOutputFiles) → sortWithinPartitions(request_time) →
  *   snappy parquet, overwrite.
  *
  * Differences by design (SURVEY.md §3/§4): the scan is Spark's native
  * text file source — distributed listing, split planning by
  * `maxPartitionBytes`, locality and retry for free — instead of the
  * reference's driver-side boto3 listing + `parallelize(paths).flatMap`
  * (s3_server_access_logs.py:86-141,395-400), which hides I/O from
  * Catalyst and caps scan parallelism at a hand-set slice count. At 100 TB
  * the driver-side listing alone would OOM the driver; a file-source scan
  * shards it across executors.
  *
  * Scale notes:
  *  - `repartition(n)` (RoundRobinPartitioning) bounds output file count,
  *    the reference's core value prop (>100k tiny files/day → n files,
  *    converters/s3-server-access-log/README.md:3-7). At cluster scale
  *    pick n from target file size (total bytes / ~512 MB), not a constant.
  *  - `sortWithinPartitions(request_time)` is deliberately partition-LOCAL
  *    (no global range exchange) — it exists to give Parquet row-group
  *    min/max stats selectivity on time (s3_server_access_logs.py:442,
  *    457-458), not to order output.
  *  - `mode(overwrite)` per (bucket, date) destination keeps daily re-runs
  *    and backfills idempotent (s3_server_access_logs.py:361-368,459).
  */
object LogEtl {

  /** A convertible log family: its line parser and the timestamp column
    * the output is partition-locally sorted on (the reference sorts the
    * S3 family on request_time, s3_server_access_logs.py:442; the same
    * row-group-stats rationale picks each family's primary time).
    *
    * The reference README claims "VPC, S3, ALB" converters but ships
    * only S3 (README.md:11, converters/ has one subdir) — this registry
    * is the actual family abstraction: everything downstream of parse
    * (repartition → sort → snappy parquet → overwrite) is shared.
    */
  final case class Format(parse: (DataFrame, Boolean) => DataFrame,
                          sortColumn: String)

  val Formats: Map[String, Format] = Map(
    "s3" -> Format((df, fused) => S3AccessLog.parse(df, fused = fused),
      "request_time"),
    "vpc" -> Format((df, _) => graft.sources.VpcFlowLog.parse(df),
      "start_ts"),
    "alb" -> Format((df, fused) =>
      graft.sources.AlbAccessLog.parse(df, fused = fused), "time"),
    "cloudfront" -> Format((df, _) =>
      graft.sources.CloudFrontLog.parse(df), "ts"))

  /** Destination path for one (bucket, runDate): raw `%Y/%m/%d` or Hive
    * `year=%Y/month=%m/day=%d` layout (s3_server_access_logs.py:445-454).
    */
  def destPath(destRoot: String, bucketName: String, runDate: LocalDate,
               hiveLayout: Boolean): String = {
    val datePart =
      if (hiveLayout)
        f"year=${runDate.getYear}%04d/month=${runDate.getMonthValue}%02d/day=${runDate.getDayOfMonth}%02d"
      else
        f"${runDate.getYear}%04d/${runDate.getMonthValue}%02d/${runDate.getDayOfMonth}%02d"
    s"$destRoot/$bucketName/$datePart"
  }

  /** Parse raw log lines into the reference's 27-column output shape. */
  def parse(lines: DataFrame, fused: Boolean = true): DataFrame =
    S3AccessLog.parse(lines, fused = fused)

  /** Full compact job for one input directory of raw log text files.
    * A date with no input directory is skipped, matching the reference's
    * graceful empty-listing path (s3_server_access_logs.py:146-156 →
    * `[]` on error → nothing to write) instead of failing the backfill.
    * Each compact is bracketed with its wall-clock seconds on stderr —
    * the reference's per-bucket timing log (s3_server_access_logs
    * .py:386,464-466); engine-level metrics beyond this come from
    * Spark's own instrumentation.
    */
  def compact(spark: SparkSession, inputPath: String, dest: String,
              numOutputFiles: Int = 10, fused: Boolean = true,
              format: String = "s3"): Unit = {
    val hadoopPath = new org.apache.hadoop.fs.Path(inputPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hadoopPath)) {
      System.err.println(s"[log-etl] no input at $inputPath — skipping")
    } else {
      val fmt = Formats.getOrElse(format,
        sys.error(s"unknown log format '$format' (know: ${Formats.keys.mkString(", ")})"))
      val t0 = System.nanoTime()
      write(fmt.parse(spark.read.text(inputPath), fused), dest,
        numOutputFiles, fmt.sortColumn)
      System.err.println(
        f"[log-etl] compacted $inputPath -> $dest in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }

  /** O12–O14: bounded file count, partition-local time sort, snappy
    * parquet, idempotent overwrite (s3_server_access_logs.py:457-463).
    */
  def write(parsed: DataFrame, dest: String, numOutputFiles: Int = 10,
            sortColumn: String = "request_time"): Unit =
    parsed
      .repartition(numOutputFiles)
      .sortWithinPartitions(sortColumn)
      .write.mode("overwrite")
      .option("compression", "snappy")
      .parquet(dest)

  /** Spark-native evolution of the reference's Hive layout option
    * (s3_server_access_logs.py:445-454 only TEMPLATES `year=/month=/day=`
    * into the destination path; `partitionBy()` is called with an empty
    * list, s3_server_access_logs.py:443,459-461): here the date parts are
    * real partition COLUMNS, so any engine reading the table gets
    * partition pruning from predicates instead of path construction —
    * one table root, no per-day path fan-out, dynamic overwrite keeps
    * re-runs idempotent per partition.
    */
  def writeHivePartitioned(parsed: DataFrame, destRoot: String,
                           filesPerDay: Int = 10): Unit =
    parsed
      .withColumn("year", org.apache.spark.sql.functions.year(col("request_time")))
      .withColumn("month", org.apache.spark.sql.functions.month(col("request_time")))
      .withColumn("day", org.apache.spark.sql.functions.dayofmonth(col("request_time")))
      // salt within each day so a day spreads over up to filesPerDay
      // files/tasks (hashing the date columns alone would funnel each
      // day into a single writer)
      .repartition(filesPerDay, col("year"), col("month"), col("day"),
        pmod(xxhash64(col("request_id")), lit(filesPerDay)))
      .sortWithinPartitions("request_time")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy("year", "month", "day")
      .parquet(destRoot)

  /** O15: run-date loop / backfill driver (s3_server_access_logs.py:353-376):
    * iterates FORWARD one compact per date from `startDate` up to and
    * including `endDate` (the reference's `today - lookback_days`
    * terminus), per bucket subdirectory — matching
    * `while current_date <= self.lookback_days: ... += 1 day`.
    */
  def runBackfill(spark: SparkSession, inputRoot: String, destRoot: String,
                  buckets: Seq[String], startDate: LocalDate,
                  endDate: LocalDate, numOutputFiles: Int = 10,
                  hiveLayout: Boolean = false, format: String = "s3"): Unit = {
    var d = startDate
    while (!d.isAfter(endDate)) {
      val raw = DateTimeFormatter.ofPattern("yyyy/MM/dd").format(d)
      buckets.foreach { b =>
        compact(spark, s"$inputRoot/$b/$raw", destPath(destRoot, b, d, hiveLayout),
          numOutputFiles, format = format)
      }
      d = d.plusDays(1)
    }
  }
}
