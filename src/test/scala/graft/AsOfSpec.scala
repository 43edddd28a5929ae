package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest prior row, inclusive ties, null when none precedes") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),   // before any right row -> null
      (1L, ts("2024-01-01 12:00:00"), "l2"),   // exactly at r1 -> inclusive
      (1L, ts("2024-01-01 15:00:00"), "l3"),   // after r2 -> r2
      (2L, ts("2024-01-01 12:30:00"), "l4"))   // other key -> its own r
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), "r1"),
      (1L, ts("2024-01-01 14:00:00"), "r2"),
      (2L, ts("2024-01-01 12:15:00"), "r3"))
      .toDF("k", "ts", "rv")
    val got = AsOf.joinAsOf(left, right, "k", "ts")
      .collect().map(r => r.getAs[String]("lv") -> r.getAs[String]("right_rv")).toMap
    assert(got == Map("l1" -> null, "l2" -> "r1", "l3" -> "r2", "l4" -> "r3"))
  }
}
