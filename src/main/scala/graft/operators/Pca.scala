package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over embedding columns — the whitening / dimension-
  * reduction step an embedding pipeline runs before PQ codebooks or
  * ANN indexing (decorrelated, variance-balanced dimensions quantize
  * measurably better). The heavy part — the covariance matrix — is
  * fully distributed; the d×d eigenproblem is driver-side plain Scala
  * on a require()-capped matrix, the [[Pq]] codebook precedent.
  *
  * Scale shape: every row expands map-side to its d(d+1)/2 upper-
  * triangle products (a native codegen kernel, no join), and partial
  * aggregation collapses them to the d² key dimension before the ONLY
  * shuffle — at any corpus size the exchange carries ≤ d(d+1)/2 + d
  * keys of partial sums. Nothing else scales with rows.
  */
object Pca {

  /** Upper-triangle population covariance of a d-dim vector column:
    * one row per (i ≤ j) with cov = Σxᵢxⱼ/n − μᵢμⱼ. Elements are
    * widened float→double BEFORE multiplying (exact, engine-portable);
    * the cross-row sums are double (error ~1e-13 relative at test
    * scales, rounded away at 6 dp).
    *
    * The map-side d(d+1)/2 product expansion is a native codegen kernel
    * ([[graft.functions.VectorExpr.upperTriProducts]]) emitting the
    * flat row-major triangle — the previous nested transform/slice HOF
    * pyramid ran interpreted on every row (the docs/THROUGHPUT.md
    * "HOFs don't codegen" trap, 2.57 s at sf0.1/d=64). The flat index
    * decodes to (i, j) through a broadcast d(d+1)/2-row lookup joined
    * AFTER partial aggregation, so the decode touches d² keys, never
    * corpus rows. Requires a FIXED-dimension vector column (a ragged
    * row's flat indices would decode against the wrong d — and PCA is
    * undefined over mixed dimensions anyway); the fixed-d contract is
    * ENFORCED by one cheap min/max-size aggregate over the column — a
    * ragged corpus fails loudly here instead of silently misattributing
    * products to wrong (i, j) cells.
    */
  def covarianceUpper(emb: DataFrame, vecCol: Column): DataFrame = {
    val v = emb.select(vecCol.as("_v")).where(col("_v").isNotNull)
    val sizes = v.agg(min(size(col("_v"))).as("mn"),
      max(size(col("_v"))).as("mx")).head(1)
    require(sizes.nonEmpty && !sizes(0).isNullAt(0),
      "covarianceUpper: the vector column has no non-null rows")
    val (dMin, dMax) = (sizes(0).getInt(0), sizes(0).getInt(1))
    require(dMin == dMax,
      s"covarianceUpper: ragged vector column (sizes span [$dMin, $dMax]) " +
        "— PCA requires one fixed dimension; filter or pad the corpus first")
    val d = dMin
    require(d >= 1, s"covarianceUpper: zero-length vectors")
    val spark = emb.sparkSession
    import spark.implicits._
    val lookup = (0 until d).flatMap(i => (i until d).map(j => (i, j)))
      .zipWithIndex
      .map { case ((i, j), idx) => (idx, i.toLong, j.toLong) }
      .toDF("idx", "i", "j")
    val prods = v.select(
      posexplode(graft.functions.VectorExpr.upperTriProducts(col("_v")))
        .as(Seq("idx", "p")))
    val sums = prods.groupBy(col("idx")).agg(sum(col("p")).as("sp"))
      .join(broadcast(lookup), Seq("idx")) // d² keys — never corpus rows
    val means = v
      .select(posexplode(col("_v")).as(Seq("i", "x")))
      .groupBy(col("i").cast("long").as("i"))
      .agg(sum(col("x").cast("double")).as("sx"),
        count(lit(1)).cast("double").as("n"))
    sums
      .join(broadcast(means.select(col("i"), col("sx").as("sxi"), col("n"))),
        Seq("i")) // d-row dimension
      .join(broadcast(means.select(col("i").as("j"), col("sx").as("sxj"))),
        Seq("j"))
      .select(col("i"), col("j"),
        // + 0.0 canonicalizes IEEE negative zero (engines disagree on
        // whether round(-1e-9, 6) prints -0 or 0)
        (round(col("sp") / col("n") -
          (col("sxi") / col("n")) * (col("sxj") / col("n")), 6) + lit(0.0))
          .as("cov"))
  }

  /** The full symmetric covariance matrix, collected driver-side —
    * bounded at d ≤ 256 (65k doubles), the codebook-sized model the
    * eigensolver consumes.
    */
  def covarianceMatrix(emb: DataFrame, vecCol: Column): Array[Array[Double]] = {
    val rows = covarianceUpper(emb, vecCol).collect()
    val d = rows.iterator.map(_.getLong(1)).max.toInt + 1
    require(d <= 256, s"dimension $d exceeds the driver-side eigen cap")
    val m = Array.fill(d, d)(0.0)
    rows.foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: fixed sweep order (row-major upper triangle), fixed sweep
    * count with an off-diagonal early-exit — no RNG, no data-dependent
    * pivoting, so repeated runs (and the EntrySpec pin hashes) agree
    * exactly. Returns (eigenvalues, eigenvectors as columns), sorted
    * by eigenvalue descending with the vector's first nonzero
    * component made positive (sign canonicalization).
    */
  def jacobiEigen(a0: Array[Array[Double]],
                  sweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    var off = Double.MaxValue
    while (s < sweeps && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case tt if theta == 0.0 => 1.0
                case tt => tt
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = Array.tabulate(d, order.size)((r, c) => v(r)(order(c)))
    // canonical sign: first component with |x| > 1e-9 positive
    var c = 0
    while (c < d) {
      var r = 0
      while (r < d && math.abs(evecs(r)(c)) <= 1e-9) r += 1
      if (r < d && evecs(r)(c) < 0) {
        var k = 0
        while (k < d) { evecs(k)(c) = -evecs(k)(c); k += 1 }
      }
      c += 1
    }
    (evals, evecs)
  }

  /** Per-dimension mean vector, collected driver-side (d doubles) —
    * the centering half of the trained PCA model.
    */
  def meansVector(emb: DataFrame, vecCol: Column): Array[Double] = {
    val rows = emb.select(vecCol.as("_v")).where(col("_v").isNotNull)
      .select(posexplode(col("_v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg((sum(col("x").cast("double")) / count(lit(1))).as("m"))
      .collect()
    require(rows.length <= 256, s"dimension ${rows.length} exceeds the cap")
    val m = new Array[Double](rows.length)
    rows.foreach(r => m(r.getInt(0)) = r.getDouble(1))
    m
  }

  /** Map-only projection onto the top-k principal components — the
    * trained (μ, V) model rides the closure as literal arrays (d + d·k
    * doubles, codebook-sized), every vector centers and dot-products
    * against it in one codegen'd expression, nothing shuffles. The
    * deployment shape of PCA: train once ([[covarianceMatrix]] +
    * [[jacobiEigen]]), project the corpus (or a stream) map-side.
    */
  def project(emb: DataFrame, idCol: String, vecCol: Column,
              mean: Array[Double], basis: Array[Array[Double]],
              k: Int): DataFrame = {
    val d = mean.length
    require(k >= 1 && k <= d, s"k $k of $d")
    val vecD = transform(vecCol, x => x.cast("double"))
    val mu = typedLit(mean.toSeq)
    val centered = zip_with(vecD, mu, (x, m) => x - m)
    val comps = (0 until k).map { c =>
      val vc = typedLit((0 until d).map(r => basis(r)(c)).toSeq)
      (round(aggregate(zip_with(centered, vc, (x, w) => x * w),
        lit(0.0), (a, x) => a + x), 6) + lit(0.0)).as(s"pc$c")
    }
    emb.select(col(idCol) +: comps: _*)
  }

  /** Top-k principal components of an embedding column: eigenvalue,
    * explained-variance ratio and its running total, one row per
    * component. The covariance is distributed; the d×d eigensolve is
    * the driver-side bounded step.
    */
  def explainedVariance(emb: DataFrame, vecCol: Column, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (evals, _) = jacobiEigen(covarianceMatrix(emb, vecCol))
    val total = evals.sum
    val top = evals.take(k).zipWithIndex.scanLeft((0, 0.0, 0.0, 0.0)) {
      case ((_, _, _, cum), (ev, i)) =>
        (i, ev, ev / total, cum + ev / total)
    }.drop(1)
    top.map { case (i, ev, ratio, cum) =>
      (i.toLong, math.rint(ev * 1e6) / 1e6, math.rint(ratio * 1e6) / 1e6,
        math.rint(cum * 1e6) / 1e6)
    }.toSeq.toDF("component", "eigenvalue", "var_ratio", "cum_ratio")
  }
}
