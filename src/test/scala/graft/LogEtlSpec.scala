package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogEtl
import graft.sources.S3AccessLog

class LogEtlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-etl").toString

  val lines: Seq[String] = {
    val fieldSets = (0 until 200).map { i =>
      RenderFixtures.baseFields
        .updated("reqid", f"REQ$i%05d")
        .updated("time", f"[${1 + i % 28}%02d/Jul/2024:${i % 24}%02d:08:44 +0000]")
        .updated("bytes", (i * 37L).toString)
    }
    fieldSets.map(S3AccessLog.renderLine) ++ Seq("garbage", "", "  ")
  }

  test("compact: text in → snappy parquet out, n files, 27-col schema") {
    val in = tmpDir(); val out = tmpDir()
    Files.write(java.nio.file.Paths.get(s"$in/part0.txt"),
      lines.mkString("\n").getBytes)
    LogEtl.compact(spark, in, out, numOutputFiles = 3)
    val parquets = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(parquets.length == 3)
    assert(parquets.forall(_.getName.contains("snappy")))
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == S3AccessLog.OutputColumns)
    assert(back.count() == 201)  // 200 parsed + 1 dead-letter; blanks skipped
    assert(back.filter($"error_line".isNotNull).count() == 1)
  }

  test("output is sorted by request_time within each partition (s3.py:457-458)") {
    val in = tmpDir(); val out = tmpDir()
    Files.write(java.nio.file.Paths.get(s"$in/part0.txt"),
      scala.util.Random.shuffle(lines).mkString("\n").getBytes)
    LogEtl.compact(spark, in, out, numOutputFiles = 2)
    // each output file is one former partition — check per-file monotonicity
    val violations = spark.read.parquet(out)
      .select(input_file_name().as("f"), $"request_time")
      .filter($"request_time".isNotNull)
      .withColumn("prev", lag($"request_time", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"f")
          .orderBy(monotonically_increasing_id())))
      .filter($"prev" > $"request_time")
      .count()
    assert(violations == 0)
  }

  test("overwrite keeps re-runs idempotent (s3_server_access_logs.py:459)") {
    val in = tmpDir(); val out = tmpDir()
    Files.write(java.nio.file.Paths.get(s"$in/part0.txt"),
      lines.mkString("\n").getBytes)
    LogEtl.compact(spark, in, out)
    LogEtl.compact(spark, in, out)
    assert(spark.read.parquet(out).count() == 201)
  }

  test("destPath: raw vs hive layout (s3_server_access_logs.py:445-454)") {
    val d = java.time.LocalDate.of(2024, 7, 3)
    assert(LogEtl.destPath("/x", "b", d, hiveLayout = false) == "/x/b/2024/07/03")
    assert(LogEtl.destPath("/x", "b", d, hiveLayout = true) ==
      "/x/b/year=2024/month=07/day=03")
  }
}
