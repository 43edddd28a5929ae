package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused quote-aware whitespace tokenizer: one linear scan per line with
  * the EXACT token stream of `regexp_extract_all(line, '"[^"]*"|\S+', 0)`
  * — the tokenizer class shared by the ALB access-log format and every
  * other quoted-field space-separated log family.
  *
  * java.util.regex evaluates the alternation with backtracking per
  * token; this scanner decides each token in O(1) per char with zero
  * allocation beyond the output strings. Equivalence with the real
  * regex is pinned by a property sweep in LogSourcesSpec.
  */
case class QuoteTokenizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    QuoteTokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = QuoteTokenize.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $helper.tokenize($c);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuoteTokenizeExpr =
    copy(child = newChild)

  override def prettyName: String = "quote_tokenize"
}

object QuoteTokenize {
  /** Column API: line → array<string> of tokens. */
  def quote_tokenize(c: Column): Column =
    bridge.column(QuoteTokenizeExpr(bridge.expression(c)))

  /** Regex `\s` class (ASCII): space, \t, \n, \x0B, \f, \r. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** One pass, replicating the regex alternation order exactly:
    * at a `"` with a closing `"` the quoted alternative wins (token
    * includes both quotes, spaces inside allowed); an unclosed `"` and
    * every other start falls through to greedy `\S+` (embedded quotes
    * are then plain chars, as in the regex). Called from generated code.
    */
  def tokenize(line: UTF8String): ArrayData = {
    val s = line.toString
    val n = s.length
    val out = new java.util.ArrayList[AnyRef](32)
    var i = 0
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        var tokEnd = -1
        if (s.charAt(i) == '"') {
          var j = i + 1
          while (j < n && s.charAt(j) != '"') j += 1
          if (j < n) tokEnd = j + 1
        }
        if (tokEnd < 0) {
          var j = i
          while (j < n && !isWs(s.charAt(j))) j += 1
          tokEnd = j
        }
        out.add(UTF8String.fromString(s.substring(i, tokEnd)))
        i = tokEnd
      }
    }
    new GenericArrayData(out.toArray)
  }
}
