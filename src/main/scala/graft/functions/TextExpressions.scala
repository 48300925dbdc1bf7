package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics kernel: tokens, stopword hits and summed
  * token length in a single scan of the string — the composed HOF form
  * re-evaluates the interpreted `filter(split(...))` tokenizer for every
  * reference (size, filter, aggregate), i.e. 3–4 passes plus array
  * allocation per pass.
  *
  * Tokenization semantics mirror `split(text, "\\s+")` + drop-empties:
  * separators are exactly the Java regex `\s` class
  * (space, \t, \n, \x0B, \f, \r); stopword matching lowercases the
  * token (as `tokens(lower(text))` does in the HOF form).
  */
object TextKernels {
  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** @return (nTokens, nStop, sumTokenLen) over the string's tokens. */
  def tokenStats(s: UTF8String, stopwords: Array[String]): InternalRow = {
    val str = s.toString
    var n = 0L; var stop = 0L; var sumLen = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      while (i < len && isSpace(str.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(str.charAt(i))) i += 1
        n += 1
        sumLen += (i - start)
        if (stopwords.length > 0) {
          val tok = str.substring(start, i).toLowerCase
          var j = 0
          var hit = false
          while (j < stopwords.length && !hit) {
            if (stopwords(j) == tok) hit = true
            j += 1
          }
          if (hit) stop += 1
        }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, stop, sumLen))
  }
}

case class TokenStatsExpr(child: Expression, stopwords: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  @transient private lazy val sw: Array[String] = stopwords.map(_.toLowerCase).toArray

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenStats(input.asInstanceOf[UTF8String], sw)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val swRef = ctx.addReferenceObj("stopwords", sw, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenStats($c, $swRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpr {
  def tokenStats(text: Column, stopwords: Seq[String] = Nil): Column =
    ColumnBridge.column(TokenStatsExpr(ColumnBridge.expression(text), stopwords))
}
