package graft.geonames

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ECMAScript Number→String (radix 10) rendering of a double, exactly as
  * node's `JSON.stringify` emits it — the NDJSON-sink fidelity kernel
  * (the reference serializes parseFloat results straight through
  * JSON.stringify, geonames.js:141–147).
  *
  * The digit sequence is computed here as the SHORTEST round-tripping
  * decimal (nearest-to-value among candidates, ties to the even digit —
  * the ECMA-262 `Number::toString` selection), NOT taken from Java's
  * `Double.toString`: pre-JDK-19 `Double.toString` is round-trippable
  * but not always shortest-form (`Double.MIN_VALUE` renders "4.9E-324"
  * where JS says "5e-324"), so on this JDK 17 build reusing its digits
  * would silently diverge on values that aren't sourced from short
  * decimal literals. Selection per significand length p (1..17):
  * round the EXACT binary expansion of |d| down and up to p significant
  * digits; if both round-trip, HALF_EVEN on the exact value picks
  * nearest-with-even-ties; if only one round-trips, it is the unique
  * shortest choice; p=17 always round-trips, so the loop terminates.
  * Differentially fuzzed against node across the double regimes
  * (tools/jsnum_fuzz.py) and pinned on the edge classes in
  * GeoNamesSpec.
  */
object JsNum {
  private val Pow10Exact = 9.007199254740992e15 // 2^53: integral doubles below are exact

  def render(d: Double): String = {
    if (d.isNaN || d.isInfinite) return "null" // JSON.stringify(NaN) === "null"
    if (d == 0.0) return "0" // covers -0.0: JSON.stringify(-0) === "0"
    val neg = d < 0
    val abs = math.abs(d)
    // integral fast path: for |d| < 2^53 the integer's own digit string
    // IS the ECMAScript rendering (any shorter round-tripping decimal
    // only strips trailing zeros, which the positional form re-appends)
    if (abs < Pow10Exact && abs == math.floor(abs)) {
      val l = abs.toLong
      return if (neg) "-" + l.toString else l.toString
    }
    val exact = new JBigDecimal(abs) // exact binary expansion
    var chosen: JBigDecimal = null
    var p = 1
    while (chosen == null && p <= 17) {
      val down = exact.round(new MathContext(p, RoundingMode.FLOOR))
      val up = exact.round(new MathContext(p, RoundingMode.CEILING))
      val dOk = down.doubleValue == abs
      val uOk = up.doubleValue == abs
      chosen =
        if (dOk && uOk) exact.round(new MathContext(p, RoundingMode.HALF_EVEN))
        else if (dOk) down
        else if (uOk) up
        else null
      p += 1
    }
    // p=17 always round-trips; reaching here means chosen != null
    val bd = chosen.stripTrailingZeros
    val digits = bd.unscaledValue.toString
    val k = digits.length
    val n = k - bd.scale // value = 0.<digits> × 10^n
    val body =
      if (n >= k && n <= 21) digits + "0" * (n - k)
      else if (n > 0 && n <= 21)
        digits.substring(0, n) + "." + digits.substring(n)
      else if (n > -6 && n <= 0) "0." + ("0" * -n) + digits
      else {
        val mant =
          if (k == 1) digits
          else digits.substring(0, 1) + "." + digits.substring(1)
        mant + "e" + (if (n - 1 >= 0) "+" else "-") + math.abs(n - 1)
      }
    if (neg) "-" + body else body
  }

  /** Codegen entry point: render as UTF8String (null never reaches here —
    * the expression is null-intolerant).
    */
  def renderUtf8(d: Double): UTF8String = UTF8String.fromString(render(d))
}

/** `js_number_string(double) -> string`: the [[JsNum.render]] kernel as a
  * native codegen expression, so the NDJSON sink's per-coordinate
  * rendering stays inside whole-stage codegen instead of paying the
  * Scala-UDF encode/decode boundary (the repo's SURVEY §2.10 kernel
  * policy; this was the one per-row UDF left in a production path).
  */
case class JsNumberStringExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = StringType
  override def prettyName: String = "js_number_string"

  override protected def nullSafeEval(input: Any): Any =
    JsNum.renderUtf8(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geonames.JsNum.renderUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
