package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev: stage-by-stage cost breakdown of the log-ETL parse path. */
object ParseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def render = li.select(format_string(
      "owner%d bkt%d [%s +0000] 10.0.0.1 arn:aws:iam::1:r REQ%d " +
        "REST.GET.OBJECT key/%d \"GET /k HTTP/1.1\" %d - %d 1024 5 4 " +
        "\"-\" \"agent/1.0\" - host= SigV4 TLS_AES_128_GCM_SHA256 " +
        "AuthHeader h.example.com TLSv1.3 - -",
      col("l_orderkey"), col("l_suppkey") % 10,
      date_format(col("l_shipdate"), "dd/MMM/yyyy:HH:mm:ss"),
      col("l_orderkey") * 10 + col("l_linenumber"), col("l_partkey"),
      lit(200) + (col("l_linenumber") % 5), col("l_orderkey") % 100000).as("value"))
    def time(label: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[profile] $label run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    time("baseline-scan")(li.agg(sum("l_orderkey")).collect())
    time("render-only")(render.agg(count(length(col("value")))).collect())
    time("render+regexparse")(
      render.select(graft.functions.ParseS3AccessLog.parse_s3_access_log(col("value")).as("g"))
        .agg(count(col("g.bucket"))).collect())
    time("render+trim+parse-1col")(
      render.select(graft.functions.ParseS3AccessLog.parse_s3_access_log(
          regexp_replace(col("value"), "^\\s+|\\s+$", "")).as("g"))
        .agg(count(col("g.bucket"))).collect())
    time("render+filter+parse-1col")(
      render.select(regexp_replace(col("value"), "^\\s+|\\s+$", "").as("value"))
        .filter(col("value") =!= "")
        .select(graft.functions.ParseS3AccessLog.parse_s3_access_log(col("value")).as("g"))
        .agg(count(col("g.bucket"))).collect())
    time("full-parse-no-ts")(
      graft.sources.S3AccessLog.parse(render)
        .agg(count(col("s3_bucket")), sum(col("bytes_sent")),
          max(col("http_status"))).collect())
    time("full-parse-4cols")(
      graft.sources.S3AccessLog.parse(render)
        .agg(count(col("s3_bucket")), sum(col("bytes_sent")),
          max(col("request_time")), max(col("http_status"))).collect())
    spark.stop()
  }
}
