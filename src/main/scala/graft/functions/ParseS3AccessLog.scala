package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.S3AccessLog

/** Fused single-pass S3-access-log line splitter.
  *
  * The composable built-in formulation runs one `RegExpExtract` per output
  * column — 26 full regex evaluations of the same pattern per input row
  * (plus one `RLike`). This expression evaluates the 26-group pattern
  * (s3_server_access_logs.py:25-34) exactly ONCE per row and returns all
  * groups as a struct; NULL when the line doesn't match (`re.search`
  * semantics — unanchored, like the reference at
  * s3_server_access_logs.py:163). Sentinel decoding and casts stay in
  * codegen'd built-in expressions downstream (see
  * [[graft.sources.S3AccessLog.typedColumns]]).
  */
case class ParseS3AccessLogExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    StructType(S3AccessLog.GroupNames.map(StructField(_, StringType, nullable = true)))

  override def nullable: Boolean = true

  @transient private lazy val pattern: Pattern = Pattern.compile(S3AccessLog.Pattern)

  override def nullSafeEval(input: Any): Any = {
    val line = input.asInstanceOf[UTF8String].toString
    val m: Matcher = pattern.matcher(line)
    if (!m.find()) {
      null
    } else {
      val n = S3AccessLog.GroupNames.length
      val values = new Array[Any](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        values(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(values)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ParseS3AccessLogExpr =
    copy(child = newChild)

  override def prettyName: String = "parse_s3_access_log"
}

object ParseS3AccessLog {
  /** Column API: one regex pass → struct of 26 raw string groups. */
  def parse_s3_access_log(c: Column): Column =
    bridge.column(ParseS3AccessLogExpr(bridge.expression(c)))
}
