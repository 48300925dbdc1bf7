package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covarianceUpper matches the plain-Scala population covariance") {
    val vecs = Seq(
      Array(1.0f, 2.0f, 3.0f), Array(2.0f, 4.0f, 5.0f),
      Array(3.0f, 6.0f, 9.0f), Array(0.0f, 1.0f, 2.0f),
      Array(5.0f, 9.0f, 13.0f))
    val got = Pca.covarianceUpper(vecs.map(Tuple1(_)).toDF("embedding"),
        col("embedding"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val n = vecs.size.toDouble
    val d = 3
    for (i <- 0 until d; j <- i until d) {
      val mi = vecs.map(_(i).toDouble).sum / n
      val mj = vecs.map(_(j).toDouble).sum / n
      val cov = vecs.map(v => v(i).toDouble * v(j).toDouble).sum / n - mi * mj
      got((i.toLong, j.toLong)) shouldBe cov +- 1e-6
    }
    got.size shouldBe 6 // upper triangle of 3×3
  }

  test("jacobiEigen recovers the known spectrum of a 2×2 and reconstructs a 5×5") {
    val (ev2, v2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    ev2(0) shouldBe 3.0 +- 1e-10
    ev2(1) shouldBe 1.0 +- 1e-10
    val s = 1.0 / math.sqrt(2.0)
    v2(0)(0) shouldBe s +- 1e-10 // sign-canonicalized [1,1]/√2
    v2(1)(0) shouldBe s +- 1e-10
    v2(0)(1) shouldBe s +- 1e-10 // [1,-1]/√2 with first component positive
    v2(1)(1) shouldBe -s +- 1e-10

    // reconstruction A = V Λ Vᵀ on a deterministic symmetric 5×5
    val d = 5
    val a = Array.tabulate(d, d)((i, j) =>
      1.0 / (1 + i + j) + (if (i == j) 2.0 else 0.0))
    val (ev, v) = Pca.jacobiEigen(a)
    for (i <- 0 until d; j <- 0 until d) {
      val rec = (0 until d).map(k => v(i)(k) * ev(k) * v(j)(k)).sum
      rec shouldBe a(i)(j) +- 1e-9
    }
    // eigenvalues sorted descending
    ev.sliding(2).foreach { case Array(x, y) => x should be >= y; case _ => }
  }

  test("whitening with the eigen basis makes the sample covariance the identity") {
    // strongly correlated FULL-RANK 3-d data (a rank-deficient mix
    // would put a zero eigenvalue under the 1/√λ and whiten to NaN)
    val rows = (1 to 400).map { i =>
      val a = (i * 37 % 101).toDouble / 10.0
      val b = (i * 53 % 97).toDouble / 10.0
      val c = (i * 71 % 89).toDouble / 10.0
      Array((a + b).toFloat, (2 * a + 0.1 * b + c).toFloat,
        (a - b + 0.5 * c).toFloat)
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val cov = Pca.covarianceMatrix(df, col("embedding"))
    val (ev, v) = Pca.jacobiEigen(cov)
    val d = 3
    val n = rows.size.toDouble
    val mean = (0 until d).map(i => rows.map(_(i).toDouble).sum / n)
    // whiten: y = Λ^(-1/2) Vᵀ (x − μ); sample covariance of y ≈ I
    val ys = rows.map { x =>
      (0 until d).map { c =>
        (0 until d).map(r => (x(r) - mean(r)) * v(r)(c)).sum /
          math.sqrt(ev(c))
      }
    }
    for (i <- 0 until d; j <- 0 until d) {
      val cij = ys.map(y => y(i) * y(j)).sum / n
      cij shouldBe (if (i == j) 1.0 else 0.0) +- 1e-3
    }
  }

  test("project applies the trained (μ, V) model map-only and matches plain Scala") {
    val rows = (1 to 50).map { i =>
      val a = (i * 37 % 101).toDouble / 10.0
      val b = (i * 53 % 97).toDouble / 10.0
      (i.toLong, Array((a + b).toFloat, (2 * a).toFloat, (a - b).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val cov = Pca.covarianceMatrix(df, col("embedding"))
    val (evals, basis) = Pca.jacobiEigen(cov)
    val mean = Pca.meansVector(df, col("embedding"))
    val got = Pca.project(df, "vec_id", col("embedding"), mean, basis, k = 2)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (id, x) =>
      val pc = (0 until 2).map(c =>
        (0 until 3).map(r => (x(r).toDouble - mean(r)) * basis(r)(c)).sum)
      got(id)._1 shouldBe pc(0) +- 1e-5
      got(id)._2 shouldBe pc(1) +- 1e-5
    }
    // the sample variance of pc0 is the top eigenvalue (covariance is
    // population-normalized, so compare against Σpc0²/n)
    val p0 = got.values.map(_._1).toSeq
    val m0 = p0.sum / p0.size
    p0.map(x => (x - m0) * (x - m0)).sum / p0.size shouldBe evals(0) +- 1e-4
  }

  test("explainedVariance is deterministic and sums ratios coherently") {
    val df = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Pca.explainedVariance(df, col("embedding"), 8)
      .as[(Long, Double, Double, Double)].collect().toSeq
    val b = Pca.explainedVariance(df, col("embedding"), 8)
      .as[(Long, Double, Double, Double)].collect().toSeq
    a shouldBe b
    a.size shouldBe 8
    // ratios are positive, descending, and cum is their running sum
    a.map(_._3).sliding(2).foreach {
      case Seq(x, y) => x should be >= y; case _ => }
    // cum is rounded once from the UNROUNDED running sum, so summing
    // the already-rounded ratios drifts by up to k·5e-7
    val cums = a.map(_._3).scanLeft(0.0)(_ + _).drop(1)
    a.map(_._4).zip(cums).foreach { case (got, ref) =>
      got shouldBe ref +- 1e-5 }
  }
}
