package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AWS VPC Flow Log (version-2 default format) parser — one of the two
  * converter families the reference's README claims ("VPC, S3, ALB",
  * README.md:11) but never implements (converters/ contains only
  * s3-server-access-log). Format per the public AWS docs: 14
  * space-separated fields, `-` as the no-data sentinel, and
  * `NODATA`/`SKIPDATA` records that carry only metadata fields.
  *
  * Parse shape: ONE split into a token array, then typed projections —
  * a pure narrow transformation (no shuffle, whole-stage codegen'd,
  * filter/column pruning push through to the text scan). Unparseable
  * lines (wrong token count) dead-letter with the raw line in
  * `error_line`, mirroring the S3 converter's all-NULL-plus-error-line
  * contract (s3.py:164-193).
  */
object VpcFlowLog {

  /** v2 field order per AWS docs. */
  val FieldNames: Seq[String] = Seq(
    "version", "account_id", "interface_id", "srcaddr", "dstaddr",
    "srcport", "dstport", "protocol", "packets", "bytes",
    "start_ts", "end_ts", "action", "log_status")

  private def nullIfDash(c: Column): Column = nullif(c, lit("-"))

  /** Parse a `value` text column into the typed 14-column flow schema +
    * `error_line`. Ports/protocol → int, packets/bytes → long,
    * start/end epoch-seconds → TIMESTAMP_NTZ (flow logs are UTC).
    */
  def parse(lines: DataFrame, column: String = "value"): DataFrame = {
    val toks = split(trim(col(column)), " +")
    val ok = size(toks) === FieldNames.length
    def tok(i: Int): Column = nullIfDash(element_at(toks, i + 1))
    def whenOk(c: Column): Column = when(ok, c)
    lines.select(
      whenOk(tok(0).try_cast(IntegerType)).as("version"),
      whenOk(tok(1)).as("account_id"),
      whenOk(tok(2)).as("interface_id"),
      whenOk(tok(3)).as("srcaddr"),
      whenOk(tok(4)).as("dstaddr"),
      whenOk(tok(5).try_cast(IntegerType)).as("srcport"),
      whenOk(tok(6).try_cast(IntegerType)).as("dstport"),
      whenOk(tok(7).try_cast(IntegerType)).as("protocol"),
      whenOk(tok(8).try_cast(LongType)).as("packets"),
      whenOk(tok(9).try_cast(LongType)).as("bytes"),
      whenOk(timestamp_seconds(tok(10).try_cast(LongType))
        .cast(TimestampNTZType)).as("start_ts"),
      whenOk(timestamp_seconds(tok(11).try_cast(LongType))
        .cast(TimestampNTZType)).as("end_ts"),
      whenOk(tok(12)).as("action"),
      whenOk(tok(13)).as("log_status"),
      when(!ok, col(column)).as("error_line"))
  }
}
