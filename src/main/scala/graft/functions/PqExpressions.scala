package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels: encode a vector to m bytes (one
  * codebook index per subspace) and score codes against per-query
  * lookup tables (asymmetric distance computation). Both are single
  * fused loops inside WholeStageCodegen; the codebooks/LUTs ride into
  * the generated code as reference objects, so scoring a corpus row
  * against Q queries costs m·Q array lookups — no vector arithmetic,
  * no shuffle, and the corpus is read as m-byte codes instead of
  * 4·dim-byte floats (16× less I/O at dim=64, m=16).
  */
object PqKernels {

  /** L2-normalize into a fresh double array (zero vectors stay zero, so
    * their dot with anything is 0 — same contract as
    * [[VectorKernels.cosine]]'s zero-norm guard).
    */
  def normalized(v: ArrayData, isF: Boolean): Array[Double] = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = x; ss += x * x; i += 1
    }
    if (ss > 0.0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < n) { out(i) *= inv; i += 1 }
    }
    out
  }

  /** Encode: for each subspace s, the index of the L2-nearest codebook
    * centroid of the NORMALIZED vector's slice. `cents(s)` is that
    * subspace's centroids flattened as k rows of subDim doubles.
    * Vector length must be m·subDim (validated — these are public ops).
    */
  def encode(v: ArrayData, isF: Boolean, subDim: Int, k: Int,
             cents: Array[Array[Double]]): Array[Byte] = {
    val m = cents.length
    val x = normalized(v, isF)
    if (x.length != m * subDim) throw new IllegalArgumentException(
      s"pq_encode requires vectors of length ${m * subDim}, got ${x.length}")
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cs = cents(s)
      val base = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        val cb = c * subDim
        while (j < subDim) {
          val diff = x(base + j) - cs(cb + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    codes
  }

  /** Residual encode: normalize the vector, subtract its IVF cluster's
    * (normalized) centroid, and PQ-encode the residual. Residuals are
    * much smaller in magnitude than raw vectors on clustered data, so
    * the same m·k codebook budget quantizes them with far less error —
    * the standard FAISS IVF-PQ composition. `ids` must be sorted
    * (binary-searched per row); centroids are pre-normalized like the
    * `nearest_centroid` kernel's.
    */
  def encodeResidual(v: ArrayData, isF: Boolean, cid: Long, ids: Array[Long],
                     cnorm: Array[Array[Double]], subDim: Int, k: Int,
                     cents: Array[Array[Double]]): Array[Byte] = {
    val m = cents.length
    val x = normalized(v, isF)
    if (x.length != m * subDim) throw new IllegalArgumentException(
      s"pq_encode_residual requires vectors of length ${m * subDim}, got ${x.length}")
    val ci = java.util.Arrays.binarySearch(ids, cid)
    if (ci < 0) throw new IllegalArgumentException(
      s"pq_encode_residual: unknown cluster_id $cid")
    val c = cnorm(ci)
    var i = 0
    while (i < x.length) { x(i) -= c(i); i += 1 }
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cs = cents(s)
      val base = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var cc = 0
      while (cc < k) {
        var d = 0.0
        var j = 0
        val cb = cc * subDim
        while (j < subDim) {
          val diff = x(base + j) - cs(cb + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = cc }
        cc += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    codes
  }

  /** ADC score of one code row against ONE of the Q query LUTs (chosen
    * per row — the IVF-PQ probe join tags each row with its query).
    * A code row whose subspace count disagrees with the LUT's m·k shape
    * fails loudly (the ragged-input contract shared by
    * [[SqKernels.scores]] / [[BqKernels.hammingScores]]).
    */
  def adcScoreAt(codes: Array[Byte], qidx: Int, k: Int,
                 luts: Array[Array[Double]]): Double = {
    val lut = luts(qidx)
    if (codes.length * k != lut.length) throw new IllegalArgumentException(
      s"pq_adc_score_at requires code rows of ${lut.length / k} subspaces " +
        s"(LUT shape), got ${codes.length}")
    var s = 0.0
    var i = 0
    while (i < codes.length) {
      s += lut(i * k + (codes(i) & 0xFF))
      i += 1
    }
    s
  }

  /** ADC scores of one code row against Q query LUTs: out(q) =
    * Σ_s luts(q)(s·k + code(s)) — the inner-product approximation of
    * (normalized corpus vector) · (normalized query q).
    */
  def adcScores(codes: Array[Byte], k: Int, luts: Array[Array[Double]]): ArrayData = {
    val m = codes.length
    if (luts.length > 0 && m * k != luts(0).length)
      throw new IllegalArgumentException(
        s"pq_adc_scores requires code rows of ${luts(0).length / k} " +
          s"subspaces (LUT shape), got $m")
    val out = new Array[Double](luts.length)
    var q = 0
    while (q < luts.length) {
      val lut = luts(q)
      var s = 0.0
      var i = 0
      while (i < m) {
        s += lut(i * k + (codes(i) & 0xFF))
        i += 1
      }
      out(q) = s
      q += 1
    }
    new GenericArrayData(out)
  }
}

private[graft] trait PqVecInput extends UnaryExpression {
  protected def isF: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${t.simpleString}")
    }
}

/** codes = pq_encode(vec): BinaryType of m bytes. */
case class PqEncodeExpr(child: Expression, subDim: Int, k: Int,
                        cents: Array[Array[Double]])
  extends PqVecInput {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], isF, subDim, k, cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.encode($c, $isF, $subDim, $k, $centsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** codes = pq_encode_residual(vec, cluster_id): BinaryType of m bytes —
  * the vector's PQ codes relative to its IVF cluster centroid.
  */
case class PqEncodeResidualExpr(left: Expression, right: Expression,
                                ids: Array[Long], cnorm: Array[Array[Double]],
                                subDim: Int, k: Int, cents: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode_residual"
  private def isF: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode_residual requires (array<float|double>, bigint), got (${l.simpleString}, ${r.simpleString})")
    }
  override protected def nullSafeEval(vec: Any, cid: Any): Any =
    PqKernels.encodeResidual(vec.asInstanceOf[ArrayData], isF,
      cid.asInstanceOf[Long], ids, cnorm, subDim, k, cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ivfIds", ids, "long[]")
    val cnormRef = ctx.addReferenceObj("ivfCnorm", cnorm, "double[][]")
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqKernels.encodeResidual($v, $isF, $c, $idsRef, $cnormRef, $subDim, $k, $centsRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** scores = pq_adc_scores(codes): array<double>, one ADC score per query LUT. */
case class PqAdcScoresExpr(child: Expression, k: Int, luts: Array[Array[Double]])
  extends UnaryExpression {
  PqExpr.requireUniformLuts("pq_adc_scores", luts)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_scores"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_scores requires binary codes, got ${t.simpleString}")
    }
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.adcScores(input.asInstanceOf[Array[Byte]], k, luts)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutsRef = ctx.addReferenceObj("pqLuts", luts, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.adcScores($c, $k, $lutsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** score = pq_adc_score_at(codes, qidx): the row-selected query's ADC score. */
case class PqAdcScoreAtExpr(left: Expression, right: Expression, k: Int,
                            luts: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  PqExpr.requireUniformLuts("pq_adc_score_at", luts)
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score_at"
  override protected def nullSafeEval(codes: Any, qidx: Any): Any =
    PqKernels.adcScoreAt(codes.asInstanceOf[Array[Byte]],
      qidx.asInstanceOf[Int], k, luts)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutsRef = ctx.addReferenceObj("pqLuts", luts, "double[][]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.PqKernels.adcScoreAt($c, $q, $k, $lutsRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqExpr {
  /** Constructor-time (once per expression, not per row) LUT-shape
    * validation: the per-row kernel checks only the code width against
    * luts(0)/the selected LUT, so a ragged LUT among the rest would read
    * out of bounds or mis-score silently. Uniformity asserted here keeps
    * the O(Q) sweep off the hot scoring path.
    */
  private[functions] def requireUniformLuts(name: String,
                                            luts: Array[Array[Double]]): Unit = {
    var q = 1
    while (q < luts.length) {
      require(luts(q).length == luts(0).length,
        s"$name requires uniform LUTs: lut(0) has ${luts(0).length} " +
          s"entries but lut($q) has ${luts(q).length}")
      q += 1
    }
  }

  def encode(v: Column, subDim: Int, k: Int, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(v), subDim, k, cents))
  def encodeResidual(v: Column, clusterId: Column, ids: Array[Long],
                     cnorm: Array[Array[Double]], subDim: Int, k: Int,
                     cents: Array[Array[Double]]): Column =
    ColumnBridge.column(PqEncodeResidualExpr(ColumnBridge.expression(v),
      ColumnBridge.expression(clusterId), ids, cnorm, subDim, k, cents))
  def adcScores(codes: Column, k: Int, luts: Array[Array[Double]]): Column =
    ColumnBridge.column(PqAdcScoresExpr(ColumnBridge.expression(codes), k, luts))
  def adcScoreAt(codes: Column, qidx: Column, k: Int, luts: Array[Array[Double]]): Column =
    ColumnBridge.column(PqAdcScoreAtExpr(ColumnBridge.expression(codes),
      ColumnBridge.expression(qidx), k, luts))
}
