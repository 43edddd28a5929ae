package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AWS CloudFront standard (access) log parser — the fourth AWS log
  * family, rounding out the converter registry beyond the reference's
  * claimed "VPC, S3, ALB" (README.md:11). Format per the public AWS
  * docs: W3C extended log — TAB-separated fields, `#Version:` /
  * `#Fields:` comment headers at the top of every file, `-` as the
  * no-data sentinel, and the date/time split across the first two
  * fields as UTC.
  *
  * Parse shape: ONE split on tab, then typed projections by position —
  * narrow, codegen'd, no shuffle. `#`-prefixed lines are STRUCTURE, not
  * data — they drop (every file carries them), they do not dead-letter.
  * Data lines with fewer than the 26 classic fields dead-letter into
  * `error_line`; the fields CloudFront appended later (c_port through
  * sc_range_end) are tolerant reads — null when a line predates them,
  * like [[AlbAccessLog]]'s trailing fields.
  */
object CloudFrontLog {

  /** Classic field count (through fle_encrypted_fields, the 2019-era
    * format); everything beyond is a tolerant trailing read.
    */
  private val MinTokens = 26

  def parse(lines: DataFrame, column: String = "value"): DataFrame = {
    val raw = col(column)
    val isComment = raw.startsWith("#")
    val toks = split(raw, "\t")
    val ok = !isComment && size(toks) >= MinTokens

    def str(i: Int): Column = nullif(element_at(toks, i + 1), lit("-"))
    def num(i: Int, dt: DataType): Column = str(i).try_cast(dt)
    def whenOk(c: Column): Column = when(ok, c)
    def trail(i: Int): Column = when(ok && size(toks) > i, str(i))
    def trailNum(i: Int, dt: DataType): Column =
      when(ok && size(toks) > i, num(i, dt))

    lines
      .filter(!isComment)
      .select(
        // date + time are one UTC instant split across two fields
        whenOk(to_timestamp(concat_ws(" ", str(0), str(1)),
          "yyyy-MM-dd HH:mm:ss").cast(TimestampNTZType)).as("ts"),
        whenOk(str(2)).as("x_edge_location"),
        whenOk(num(3, LongType)).as("sc_bytes"),
        whenOk(str(4)).as("c_ip"),
        whenOk(str(5)).as("cs_method"),
        whenOk(str(6)).as("cs_host"),
        whenOk(str(7)).as("cs_uri_stem"),
        whenOk(num(8, IntegerType)).as("sc_status"),
        whenOk(str(9)).as("cs_referer"),
        whenOk(str(10)).as("cs_user_agent"),
        whenOk(str(11)).as("cs_uri_query"),
        whenOk(str(12)).as("cs_cookie"),
        whenOk(str(13)).as("x_edge_result_type"),
        whenOk(str(14)).as("x_edge_request_id"),
        whenOk(str(15)).as("x_host_header"),
        whenOk(str(16)).as("cs_protocol"),
        whenOk(num(17, LongType)).as("cs_bytes"),
        whenOk(num(18, DoubleType)).as("time_taken"),
        whenOk(str(19)).as("x_forwarded_for"),
        whenOk(str(20)).as("ssl_protocol"),
        whenOk(str(21)).as("ssl_cipher"),
        whenOk(str(22)).as("x_edge_response_result_type"),
        whenOk(str(23)).as("cs_protocol_version"),
        whenOk(str(24)).as("fle_status"),
        whenOk(num(25, IntegerType)).as("fle_encrypted_fields"),
        trailNum(26, IntegerType).as("c_port"),
        trailNum(27, DoubleType).as("time_to_first_byte"),
        trail(28).as("x_edge_detailed_result_type"),
        trail(29).as("sc_content_type"),
        trailNum(30, LongType).as("sc_content_len"),
        trailNum(31, LongType).as("sc_range_start"),
        trailNum(32, LongType).as("sc_range_end"),
        when(!ok, raw).as("error_line"))
  }
}
