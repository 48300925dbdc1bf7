package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) kernels — the third code-compression
  * family beside PQ codebooks ([[PqKernels]]) and sign-LSH bit planes:
  * each dimension of the L2-normalized vector maps linearly to one
  * unsigned byte against per-dimension (min, Δ) bounds trained from the
  * corpus (the FAISS `SQ8` / vector-database default). 4× smaller than
  * float32 with near-exact recall at moderate dimensionality, and the
  * score path is a fused byte-weighted dot product inside
  * WholeStageCodegen: score(q, codes) = const_q + Σ_i w_q(i)·code(i)
  * with w_q(i) = q̂_i·Δ_i/255 and const_q = Σ_i q̂_i·min_i — i.e. the
  * exact dot of q̂ with the decoded grid point, computed without ever
  * materializing the decode.
  */
object SqKernels {

  /** L2-normalized copy as array<double> — the generic normalize kernel
    * (shares [[PqKernels.normalized]]'s zero-vector contract).
    */
  def l2normalize(v: ArrayData, isF: Boolean): ArrayData =
    new GenericArrayData(PqKernels.normalized(v, isF))

  /** Per-dimension byte code of the normalized vector: c_i =
    * clamp(rint((x_i − min_i)/Δ_i · 255), 0, 255); a degenerate
    * dimension (Δ ≤ 0) encodes 0. Out-of-bounds values clamp (queries
    * and late corpus rows may exceed the trained range slightly).
    */
  def encode(v: ArrayData, isF: Boolean, mins: Array[Double],
             deltas: Array[Double]): Array[Byte] = {
    val x = PqKernels.normalized(v, isF)
    if (x.length != mins.length) throw new IllegalArgumentException(
      s"sq8_encode requires vectors of length ${mins.length}, got ${x.length}")
    val out = new Array[Byte](x.length)
    var i = 0
    while (i < x.length) {
      val d = deltas(i)
      val c =
        if (d <= 0.0) 0
        else {
          val r = math.rint((x(i) - mins(i)) / d * 255.0).toInt
          if (r < 0) 0 else if (r > 255) 255 else r
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /** Asymmetric scores of one code row against Q query weight tables:
    * out(q) = consts(q) + Σ_i weights(q)(i)·(codes(i) & 0xFF). A code
    * row whose byte count differs from the trained dimension fails
    * loudly — a shorter ragged row would otherwise sum a silently
    * truncated score; a longer one would read past the weight table.
    */
  def scores(codes: Array[Byte], weights: Array[Array[Double]],
             consts: Array[Double]): ArrayData = {
    if (weights.length > 0 && codes.length != weights(0).length)
      throw new IllegalArgumentException(
        s"sq8_scores requires code rows of ${weights(0).length} bytes " +
          s"(trained dimension), got ${codes.length}")
    val out = new Array[Double](weights.length)
    var q = 0
    while (q < weights.length) {
      val w = weights(q)
      var s = consts(q)
      var i = 0
      while (i < codes.length) { s += w(i) * (codes(i) & 0xFF); i += 1 }
      out(q) = s
      q += 1
    }
    new GenericArrayData(out)
  }
}

/** l2_normalize(vec): array<double> — the normalized vector. */
case class L2NormalizeExpr(child: Expression) extends PqVecInput {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"
  override protected def nullSafeEval(input: Any): Any =
    SqKernels.l2normalize(input.asInstanceOf[ArrayData], isF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SqKernels.l2normalize($c, $isF)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** codes = sq8_encode(vec): BinaryType of d bytes. */
case class SqEncodeExpr(child: Expression, mins: Array[Double],
                        deltas: Array[Double])
  extends PqVecInput {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"
  override protected def nullSafeEval(input: Any): Any =
    SqKernels.encode(input.asInstanceOf[ArrayData], isF, mins, deltas)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val deltasRef = ctx.addReferenceObj("sqDeltas", deltas, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SqKernels.encode($c, $isF, $minsRef, $deltasRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** scores = sq8_scores(codes): array<double>, one asymmetric score per query. */
case class SqScoresExpr(child: Expression, weights: Array[Array[Double]],
                        consts: Array[Double])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_scores"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq8_scores requires binary codes, got ${t.simpleString}")
    }
  override protected def nullSafeEval(input: Any): Any =
    SqKernels.scores(input.asInstanceOf[Array[Byte]], weights, consts)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("sqWeights", weights, "double[][]")
    val cRef = ctx.addReferenceObj("sqConsts", consts, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SqKernels.scores($c, $wRef, $cRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqExpr {
  def l2normalize(v: Column): Column =
    ColumnBridge.column(L2NormalizeExpr(ColumnBridge.expression(v)))
  def encode(v: Column, mins: Array[Double], deltas: Array[Double]): Column =
    ColumnBridge.column(SqEncodeExpr(ColumnBridge.expression(v), mins, deltas))
  def scores(codes: Column, weights: Array[Array[Double]],
             consts: Array[Double]): Column =
    ColumnBridge.column(SqScoresExpr(ColumnBridge.expression(codes), weights, consts))
}
