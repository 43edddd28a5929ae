package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.S3AccessLog

/** The log-ETL path as an oracle-checked, benchmarked query: render one
  * synthetic S3 access-log line per lineitem row (deterministic field
  * mapping), parse it back through the REAL fused parser, and aggregate
  * parsed fields. The DuckDB oracle computes the identical aggregate
  * straight from lineitem — any parser field swap, sentinel slip, cast
  * or timestamp bug breaks the hash match over ~600k lines at sf0.1.
  * This is the scale test the reference never had (its compact() was
  * untested, test_s3_server_access_logs.py:553-588).
  */
object EtlQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("etl01_log_roundtrip",
      """SELECT concat('bkt', CAST(l_suppkey % 10 AS VARCHAR)) AS s3_bucket,
        |  count(*) AS n_requests,
        |  CAST(sum(l_orderkey % 100000) AS BIGINT) AS total_bytes,
        |  min(l_shipdate) AS first_request,
        |  CAST(max(200 + (l_linenumber % 5)) AS INTEGER) AS max_status
        |FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // spread BEFORE the render: the testdata parquet is one row group
      // → one scan task, which would serialize the render+parse of every
      // line onto a single core. Shuffling 5 narrow lineitem columns is
      // ~100× cheaper than single-threading the parse.
      val li = Tables.spread(Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_linenumber", "l_partkey"),
        "l_orderkey", "l_linenumber")
      val lines = li.select(format_string(
        "owner%d bkt%d [%s +0000] 10.0.0.1 arn:aws:iam::1:r REQ%d " +
          "REST.GET.OBJECT key/%d \"GET /k HTTP/1.1\" %d - %d 1024 5 4 " +
          "\"-\" \"agent/1.0\" - host= SigV4 TLS_AES_128_GCM_SHA256 " +
          "AuthHeader h.example.com TLSv1.3 - -",
        col("l_orderkey"),
        col("l_suppkey") % 10,
        date_format(col("l_shipdate"), "dd/MMM/yyyy:HH:mm:ss"),
        col("l_orderkey") * 10 + col("l_linenumber"),
        col("l_partkey"),
        lit(200) + (col("l_linenumber") % 5),
        col("l_orderkey") % 100000).as("value"))
      // rendered lines are never blank — dropBlanks=false keeps the
      // render out of a pushed-down scan filter (it would otherwise run
      // twice per row, single-task, upstream of the spread)
      S3AccessLog.parse(lines, dropBlanks = false)
        .groupBy(col("s3_bucket"))
        .agg(
          count(lit(1)).as("n_requests"),
          sum(col("bytes_sent")).as("total_bytes"),
          min(col("request_time")).cast(TimestampNTZType).as("first_request"),
          max(col("http_status")).as("max_status"))
        .orderBy("s3_bucket")
    })
}
