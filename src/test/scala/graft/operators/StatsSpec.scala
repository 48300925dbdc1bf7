package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram bins span [min,max] with a closed top edge") {
    val df = Seq(0.0, 1.0, 2.5, 4.9, 5.0, 5.0, 10.0).toDF("v")
    val got = Stats.histogram(df, col("v"), 4) // width 2.5 over [0,10]
      .orderBy("bucket").as[(Long, Long)].collect()
    got shouldBe Array(
      (0L, 2L), // 0.0, 1.0
      (1L, 2L), // 2.5 (edge goes UP), 4.9
      (2L, 2L), // 5.0, 5.0
      (3L, 1L)) // 10.0: max is pulled into the closed top bin
  }

  test("histogram puts every row in bin 0 when the column is constant") {
    val df = Seq(7.0, 7.0, 7.0).toDF("v")
    Stats.histogram(df, col("v"), 5)
      .as[(Long, Long)].collect() shouldBe Array((0L, 3L))
  }

  test("iqrOutliers flags exactly the rows outside the Tukey fences") {
    // group a: q1=2, q3=4 over (1,2,3,4,5) -> IQR=2, fences [-1, 7]:
    // 100 is the only outlier. group b: symmetric, no outliers.
    val df = (Seq((("a"), 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 5.0), ("a", 100.0)) ++ Seq("b").flatMap(g =>
      Seq(1.0, 2.0, 3.0).map((g, _)))).toDF("g", "v")
    val got = Stats.iqrOutliers(df, "g", col("v"))
      .as[(String, Long, Double, Double)].collect()
    got shouldBe Array(("a", 1L, 100.0, 100.0))
  }

  test("mad is the median absolute deviation, per group") {
    // group a: values 1..5, median 3, |dev| = 2,1,0,1,2 -> mad 1
    // group b: constant -> mad 0
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("a", _)) ++
      Seq.fill(4)(("b", 9.0))).toDF("g", "v")
    val got = Stats.mad(df, "g", col("v")).orderBy("group")
      .as[(String, Double, Double, Long)].collect()
    got shouldBe Array(("a", 3.0, 1.0, 5L), ("b", 9.0, 0.0, 4L))
  }

  test("chiSquare is 0 for independent margins and matches a hand-computed 2x2") {
    // perfectly independent 2x2: counts o(a,b) = ra*cb/n exactly
    val ind = (Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(4)(("y", "p")) ++ Seq.fill(4)(("y", "q"))).toDF("a", "b")
    val gi = Stats.chiSquare(ind, col("a"), col("b"))
      .as[(Double, Long, Long)].collect()(0)
    gi._1 shouldBe 0.0 +- 1e-9
    gi._2 shouldBe 1L
    gi._3 shouldBe 16L
    // dependent 2x2 with an EMPTY cell: (x,p)=4, (y,q)=4, (x,q)=0 absent,
    // (y,p)=0 absent -> chi2 = n = 8 (perfect association)
    val dep = (Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("y", "q"))).toDF("a", "b")
    val gd = Stats.chiSquare(dep, col("a"), col("b"))
      .as[(Double, Long, Long)].collect()(0)
    gd._1 shouldBe 8.0 +- 1e-9 // empty cells counted via the o²/e − n identity
    gd._2 shouldBe 1L
  }

  test("mutualInfo is 0 for independence and ln(2) for a perfect 2x2 pairing") {
    val ind = (Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(4)(("y", "p")) ++ Seq.fill(4)(("y", "q"))).toDF("a", "b")
    val gi = Stats.mutualInfo(ind, col("a"), col("b"))
      .as[(Double, Long)].collect()(0)
    gi._1 shouldBe 0.0 +- 1e-12
    // deterministic pairing x<->p, y<->q: I = H(A) = ln 2
    val dep = (Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("y", "q"))).toDF("a", "b")
    val gd = Stats.mutualInfo(dep, col("a"), col("b"))
      .as[(Double, Long)].collect()(0)
    gd._1 shouldBe math.log(2.0) +- 1e-12
    gd._2 shouldBe 8L
  }

  test("giniOfCounts is 0 for even keys and hand-computed for skew") {
    // 4 keys x 3 rows each: perfectly even -> 0
    val even = (1 to 4).flatMap(k => Seq.fill(3)(s"k$k")).toDF("k")
    val ge = Stats.giniOfCounts(even, col("k"))
      .as[(Double, Long, Long)].collect()(0)
    ge._1 shouldBe 0.0 +- 1e-12
    ge._2 shouldBe 4L
    ge._3 shouldBe 12L
    // two keys, counts 1 and 99: G = 2(1·1 + 2·99)/(2·100) − 3/2 = 0.49
    val skew = (Seq.fill(1)("a") ++ Seq.fill(99)("b")).toDF("k")
    val gs = Stats.giniOfCounts(skew, col("k"))
      .as[(Double, Long, Long)].collect()(0)
    gs._1 shouldBe 0.49 +- 1e-12
  }

  test("auc: hand-computed Mann-Whitney with ties, and degenerate groups dropped") {
    // group g: scores/labels  pos={0.8, 0.5}, neg={0.5, 0.2}
    //   pairwise: 0.8 beats both negs (2) + 0.5 beats 0.2 (1) + 0.5
    //   ties 0.5 (0.5) → U = 3.5, AUC = 3.5 / (2·2) = 0.875
    // group perfect: pos=0.9, neg=0.1 → AUC 1.0
    // group onlypos: positives only → dropped (AUC undefined)
    val df = Seq(
      ("g", 0.8, true), ("g", 0.5, true), ("g", 0.5, false), ("g", 0.2, false),
      ("perfect", 0.9, true), ("perfect", 0.1, false),
      ("onlypos", 0.7, true), ("onlypos", 0.6, true))
      .toDF("grp", "score", "lbl")
    val got = Stats.auc(df, col("grp"), col("score"), col("lbl"))
      .orderBy("group")
      .as[(String, Long, Long, Double)].collect()
    got shouldBe Array(("g", 2L, 2L, 0.875), ("perfect", 1L, 1L, 1.0))
  }

  test("auc is 0.5 for a score independent of the label") {
    // every positive ties every negative on a constant score
    val df = Seq.tabulate(10)(i => ("c", 1.0, i % 2 == 0)).toDF("g", "s", "l")
    Stats.auc(df, col("g"), col("s"), col("l"))
      .as[(String, Long, Long, Double)].collect() shouldBe
      Array(("c", 5L, 5L, 0.5))
  }

  test("entropy is ln(k) for uniform and 0 for constant distributions") {
    val df = (Seq.tabulate(8)(i => ("uni", s"t${i % 4}")) ++
      Seq.fill(5)(("const", "x"))).toDF("g", "v")
    val got = Stats.entropy(df, "g", col("v"))
      .orderBy("group")
      .as[(String, Long, Long, Double)].collect()
    got.map(_._1) shouldBe Array("const", "uni")
    got(0)._2 shouldBe 1L
    got(0)._3 shouldBe 5L
    got(0)._4 shouldBe 0.0 +- 1e-12
    got(1)._2 shouldBe 4L
    got(1)._3 shouldBe 8L
    got(1)._4 shouldBe math.log(4.0) +- 1e-12
  }

  test("welchTTest matches the textbook statistic on a known pair") {
    // group a: cents 100,200,300 (mean 200, var 10000)
    // group b: cents 400,600 (mean 500, var 20000)
    val df = Seq(("a", 100L), ("a", 200L), ("a", 300L),
      ("b", 400L), ("b", 600L)).toDF("g", "cents")
    val r = Stats.welchTTest(df, col("g"), col("cents")).head()
    r.getString(0) shouldBe "a"
    r.getString(1) shouldBe "b"
    r.getLong(2) shouldBe 3L
    r.getLong(3) shouldBe 2L
    r.getDouble(4) shouldBe 2.0 // mean in currency units
    r.getDouble(5) shouldBe 5.0
    // se2 = 10000/3 + 20000/2 = 13333.33..; t = -300/sqrt(se2)
    val se2 = 10000.0 / 3 + 20000.0 / 2
    r.getDouble(6) shouldBe BigDecimal(-300.0 / math.sqrt(se2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // df = se2^2 / ((v1/n1)^2/(n1-1) + (v2/n2)^2/(n2-1))
    val dfW = se2 * se2 /
      (math.pow(10000.0 / 3, 2) / 2 + math.pow(20000.0 / 2, 2) / 1)
    r.getDouble(7) shouldBe BigDecimal(dfW)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("welchTTest drops singleton groups and emits each pair once (a < b)") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L), ("solo", 9L))
      .toDF("g", "cents")
    val got = Stats.welchTTest(df, col("g"), col("cents"))
      .select("g_a", "g_b").as[(String, String)].collect()
    got shouldBe Array(("a", "b"))
  }

  test("ksTest: D equals the hand-computed max CDF gap; identical samples give 0") {
    // a: 1,2,3,4 ; b: 3,4,5,6 → F gaps at v=1..6: .25,.5,.5,.5,.25,0 → D=0.5
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("b", _))).toDF("g", "v")
    val r = Stats.ksTest(df, col("g"), col("v"), "a", "b").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) shouldBe
      ((4L, 4L, 6L, 0.5))
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    Stats.ksTest(same, col("g"), col("v"), "a", "b")
      .head().getDouble(3) shouldBe 0.0
  }

  test("mode: highest count wins, ties break to the smallest value") {
    val df = Seq(("g1", 7L), ("g1", 7L), ("g1", 3L),
      ("g2", 5L), ("g2", 9L)).toDF("g", "v") // g2 tie 5 vs 9 → 5
    Stats.mode(df, col("g"), col("v"))
      .orderBy("g").as[(String, Long, Long)].collect() shouldBe
      Array(("g1", 7L, 2L), ("g2", 5L, 1L))
  }

  test("weightedMedian: cumulative weight crossing, ties collapsed, zero weights dropped") {
    val df = Seq(
      // group a: v=1 w=1, v=2 w=1, v=3 w=10 → total 12, median v=3
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 10L),
      // group b: v=5 w=2+2 (tie rows), v=9 w=3 → total 7, cum(5)=4 ≥ 3.5
      ("b", 5L, 2L), ("b", 5L, 2L), ("b", 9L, 3L),
      // zero-weight row must not shift anything
      ("b", 1L, 0L)).toDF("g", "v", "w")
    val got = Stats.weightedMedian(df, col("g"), col("v"), col("w"))
      .orderBy("g").as[(String, Long, Long)].collect()
    got shouldBe Array(("a", 3L, 12L), ("b", 5L, 7L))
  }

  test("weightedMedian with unit weights equals the exact lower median") {
    val df = Seq.tabulate(10)(i => ("g", i.toLong, 1L)).toDF("g", "v", "w")
    // 10 values 0..9: cum(4)=5, 2*5 >= 10 → lower median 4
    Stats.weightedMedian(df, col("g"), col("v"), col("w"))
      .as[(String, Long, Long)].collect() shouldBe Array(("g", 4L, 10L))
  }

  test("anovaF matches the textbook F on three known groups") {
    // a: 1,2,3 (mean 2); b: 2,3,4 (mean 3); c: 3,4,5 (mean 4); grand 3
    // SSb = 3*(1+0+1) = 6, SSw = 3 groups * 2 = 6; F = (6/2)/(6/6) = 3
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 3L),
      ("b", 4L), ("c", 3L), ("c", 4L), ("c", 5L)).toDF("g", "cents")
    val r = Stats.anovaF(df, col("g"), col("cents")).head()
    r.getLong(0) shouldBe 3L  // k
    r.getLong(1) shouldBe 9L  // n
    r.getLong(2) shouldBe 2L  // df1
    r.getLong(3) shouldBe 6L  // df2
    r.getDouble(4) shouldBe 3.0
  }

  test("benford: leading digit from decimal string, shares sum to 1") {
    // cents 1,19,25,999,1000 → digits 1,1,2,9,1
    val df = Seq(1L, 19L, 25L, 999L, 1000L, -5L, 0L).toDF("c")
    val got = Stats.benford(df, col("c"))
      .orderBy("digit")
      .select("digit", "n", "share").as[(Int, Long, Double)].collect()
    got.map(r => (r._1, r._2)) shouldBe Array((1, 3L), (2, 1L), (9, 1L))
    got.map(_._3).sum shouldBe 1.0 +- 1e-9
    // the digit-1 Benford expectation is log10(2)
    val b1 = Stats.benford(df, col("c")).where(col("digit") === 1)
      .select("benford_share").as[Double].head()
    b1 shouldBe BigDecimal(math.log10(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("spearman: monotone relation gives ±1 regardless of shape") {
    // y = x³ is nonlinear but monotone → rho exactly 1; negate → −1
    val df = (1L to 8L).map(x => ("g", x, x * x * x)).toDF("g", "x", "y")
    Stats.spearman(df, col("g"), col("x"), col("y"))
      .select("rho").as[Double].head() shouldBe 1.0
    val neg = (1L to 8L).map(x => ("g", x, -x * x * x)).toDF("g", "x", "y")
    Stats.spearman(neg, col("g"), col("x"), col("y"))
      .select("rho").as[Double].head() shouldBe -1.0
  }

  test("spearman: tied x gets average ranks (hand-computed zero case)") {
    // x=(1,1,2), y=(3,5,4): avg x-ranks (1.5,1.5,3), y-ranks (1,3,2)
    // → covariance of ranks is exactly 0 → rho = 0
    val df = Seq(("g", 1L, 3L), ("g", 1L, 5L), ("g", 2L, 4L))
      .toDF("g", "x", "y")
    val got = Stats.spearman(df, col("g"), col("x"), col("y"))
      .select("n", "rho").as[(Long, Double)].head()
    got shouldBe ((3L, 0.0))
  }

  test("cuped matches the per-row adjusted metric computed in plain Scala") {
    // y strongly driven by the pre-period covariate (y = 3x + id-noise)
    // → large variance reduction; the operator's sum-identities must
    // equal the naive per-row Y' = y − θ(x − x̄) mean/variance exactly
    val units = (1 to 40).map { i =>
      val arm = i % 2L
      val x = (i * 37 % 100 + 10).toLong * 100
      val y = 3 * x + (i * 13 % 7) * 100
      (arm, x, y)
    }
    val got = Stats.cuped(units.toDF("arm", "x", "y"),
        col("arm"), col("x"), col("y"))
      .orderBy("g")
      .select("g", "n_units", "mean_adj", "var_post", "var_adj", "var_reduction")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq

    // plain-Scala reference
    val xs = units.map(_._2.toDouble); val ys = units.map(_._3.toDouble)
    val n = xs.size.toDouble
    val xbar = xs.sum / n
    val theta = (xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum / n) /
      (xs.map(a => a * a).sum - xs.sum * xs.sum / n)
    def stats(arm: Long) = {
      val g = units.filter(_._1 == arm)
      val adj = g.map { case (_, x, y) => y - theta * (x - xbar) }
      val m = adj.sum / g.size
      val v = adj.map(a => (a - m) * (a - m)).sum / (g.size - 1)
      val ysG = g.map(_._3.toDouble)
      val my = ysG.sum / g.size
      val vy = ysG.map(a => (a - my) * (a - my)).sum / (g.size - 1)
      (g.size.toLong, m / 100.0, vy, v)
    }
    got.foreach { case (arm, nu, meanAdj, varPost, varAdj, vr) =>
      val (rn, rMean, rVarPost, rVarAdj) = stats(arm)
      nu shouldBe rn
      meanAdj shouldBe rMean +- 1e-3
      varPost shouldBe rVarPost +- math.abs(rVarPost) * 1e-9
      varAdj shouldBe rVarAdj +- math.abs(rVarPost) * 1e-9
      vr should be > 0.9 // the covariate explains almost everything
    }
  }

  test("cuped sums stay exact past 2^53 (adversarial magnitudes)") {
    // x ≈ 1.1e9 cents per unit over 20 units → Σx² ≈ 2.4e19 >> 2^53:
    // a double accumulator here is summation-order-dependent (losing
    // ~thousands of ulps per add), so the operator must agree with a
    // BigInt-exact reference that only converts to double at the end —
    // exactly the decimal(38,0) contract.
    val units = (1 to 20).map { i =>
      val arm = i % 2L
      val x = 1100000000L + i * 7919L // ~1.1e9 cents, low bits exercised
      val y = 2L * x + (i * 104729L % 9973L)
      (arm, x, y)
    }
    val got = Stats.cuped(units.toDF("arm", "x", "y"),
        col("arm"), col("x"), col("y"))
      .orderBy("g")
      .select("g", "mean_adj", "var_post", "var_adj")
      .as[(Long, Double, Double, Double)].collect().toSeq

    // BigInt-exact reference: integer sums, ONE double conversion, same
    // expression tree as the operator
    val all = units
    def bi(l: Long) = BigInt(l)
    val pn = all.size.toDouble
    val psx = all.map(u => bi(u._2)).sum.toDouble
    val psy = all.map(u => bi(u._3)).sum.toDouble
    val psxx = all.map(u => bi(u._2) * bi(u._2)).sum.toDouble
    val psxy = all.map(u => bi(u._2) * bi(u._3)).sum.toDouble
    val theta = (psxy - psx * psy / pn) / (psxx - psx * psx / pn)
    val xbar = psx / pn
    all.map(_._1).distinct.sorted.foreach { arm =>
      val g = all.filter(_._1 == arm)
      val n = g.size.toDouble
      val sx = g.map(u => bi(u._2)).sum.toDouble
      val sy = g.map(u => bi(u._3)).sum.toDouble
      val sxx = g.map(u => bi(u._2) * bi(u._2)).sum.toDouble
      val syy = g.map(u => bi(u._3) * bi(u._3)).sum.toDouble
      val sxy = g.map(u => bi(u._2) * bi(u._3)).sum.toDouble
      val varY = (syy - sy * sy / n) / (n - 1)
      val varX = (sxx - sx * sx / n) / (n - 1)
      val covXY = (sxy - sx * sy / n) / (n - 1)
      val varAdj = varY + theta * theta * varX - 2.0 * theta * covXY
      val meanAdj = (sy / n - theta * (sx / n - xbar)) / 100.0
      val (_, gMeanAdj, gVarPost, gVarAdj) = got.find(_._1 == arm).get
      // operator output is rounded (4 dp / 2 dp); the reference rounds
      // identically — bitwise equality, not tolerance
      gMeanAdj shouldBe BigDecimal(meanAdj)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      gVarPost shouldBe BigDecimal(varY)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      gVarAdj shouldBe BigDecimal(varAdj)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  test("cuped degenerate inputs: var(X)=0 → θ=0 (no adjustment); constant-y arm → var_reduction 0") {
    // every unit shares x=500 → pooled var(X)=0 → theta must fall back
    // to 0 instead of NaN, making mean_adj = mean_post and
    // var_adj = var_post; arm 1's y is constant → var_post = 0 must
    // report var_reduction 0.0, not NaN
    val units = Seq(
      (0L, 500L, 100L), (0L, 500L, 200L), (0L, 500L, 300L),
      (1L, 500L, 42L), (1L, 500L, 42L), (1L, 500L, 42L))
    val got = Stats.cuped(units.toDF("arm", "x", "y"),
        col("arm"), col("x"), col("y"))
      .orderBy("g")
      .select("g", "mean_post", "mean_adj", "var_post", "var_adj",
        "var_reduction")
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    got.foreach { case (_, meanPost, meanAdj, varPost, varAdj, vr) =>
      meanAdj shouldBe meanPost
      varAdj shouldBe varPost
      assert(!vr.isNaN, "var_reduction must never be NaN")
    }
    val arm1 = got.find(_._1 == 1L).get
    arm1._4 shouldBe 0.0 // var_post
    arm1._6 shouldBe 0.0 // var_reduction — guarded, not NaN
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("poissonBootstrap replicate means match the plain-Scala md5 draw") {
    // tiny corpus, 5 replicates: recompute every (row, replicate)
    // Poisson weight from the same md5 contract in plain Scala and
    // compare each group's point mean + bootstrap bounds exactly
    val rows = (1 to 30).map(i => (s"g${i % 2}", i.toLong, (100 + i * 7).toLong))
    val got = Stats.poissonBootstrap(rows.toDF("g", "id", "c"),
        col("g"), col("id"), col("c"), replicates = 5)
      .orderBy("g")
      .as[(String, Long, Double, Double, Double, Double)].collect()

    def weight(id: Long, r: Int): Long = {
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(12), 16)
      val m = 2L * ((r * 1597334677L) % 16384L) + 1L
      val u = ((h * m) % 281474976710656L + 1)
        .toDouble / 281474976710656.0
      val k = Stats.PoissonCdf.indexWhere(u <= _)
      if (k < 0) 7L else k.toLong
    }
    def pct(sorted: Seq[Double], p: Double): Double = {
      val pos = p * (sorted.size - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
    }
    got.foreach { case (g, n, mean, lo, hi, _) =>
      val grp = rows.filter(_._1 == g)
      n shouldBe grp.size.toLong
      mean shouldBe grp.map(_._3).sum.toDouble / grp.size / 100.0 +- 1e-4
      val ms = (0 until 5).flatMap { r =>
        val ws = grp.map { case (_, id, c) => (weight(id, r), c) }
        val sw = ws.map(_._1).sum
        if (sw == 0) None
        else Some(ws.map { case (w, c) => w * c }.sum.toDouble / sw / 100.0)
      }.sorted
      lo shouldBe pct(ms, 0.025) +- 1e-4
      hi shouldBe pct(ms, 0.975) +- 1e-4
    }
  }

  test("poissonBootstrap CI brackets the point mean on iid data") {
    val rows = (1 to 500).map(i => ("a", i.toLong, (1000 + i % 97).toLong))
    val Array((_, n, mean, lo, hi, se)) =
      Stats.poissonBootstrap(rows.toDF("g", "id", "c"),
        col("g"), col("id"), col("c"), replicates = 100)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    n shouldBe 500L
    lo should be < mean
    hi should be > mean
    se should be > 0.0
    // Poisson(1) weights ~ an n-out-of-n resample: the bootstrap SE of a
    // mean over ~uniform values must be near sd/sqrt(n) (loose band)
    val vals = rows.map(_._3.toDouble)
    val m = vals.sum / vals.size
    val sd = math.sqrt(vals.map(v => (v - m) * (v - m)).sum / (vals.size - 1))
    val sem = sd / math.sqrt(vals.size) / 100.0
    se should be > sem * 0.5
    se should be < sem * 2.0
  }

  test("ratioMetric with unit denominators reduces to the classic mean ± SEM") {
    val units = (1 to 25).map(i => (0L, (200 + i * 11 % 50).toLong, 1L))
    val Array((_, n, ratio, se, lo, hi)) =
      Stats.ratioMetric(units.toDF("arm", "y", "d"),
        col("arm"), col("y"), col("d"))
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    n shouldBe 25L
    val ys = units.map(_._2.toDouble)
    val m = ys.sum / ys.size
    val v = ys.map(a => (a - m) * (a - m)).sum / (ys.size - 1)
    ratio shouldBe m +- 1e-6
    se shouldBe math.sqrt(v / ys.size) +- 1e-6
    lo shouldBe ratio - 1.959963984540054 * se +- 1e-5
    hi shouldBe ratio + 1.959963984540054 * se +- 1e-5
  }

  test("ratioMetric matches the plain-Scala delta method on correlated units") {
    val units = (1 to 40).map { i =>
      val y = (i * 31 % 200 + 50).toLong; val d = (i % 9 + 1).toLong
      (i % 2L, y, d)
    }
    val got = Stats.ratioMetric(units.toDF("arm", "y", "d"),
        col("arm"), col("y"), col("d"))
      .orderBy("g").as[(Long, Long, Double, Double, Double, Double)].collect()
    got.foreach { case (arm, k, ratio, se, _, _) =>
      val g = units.filter(_._1 == arm)
      val ys = g.map(_._2.toDouble); val ds = g.map(_._3.toDouble)
      val kk = g.size.toDouble
      val r = ys.sum / ds.sum; val dbar = ds.sum / kk
      def sv(a: Seq[Double]) = {
        val m = a.sum / kk; a.map(x => (x - m) * (x - m)).sum / (kk - 1)
      }
      val cyd = {
        val my = ys.sum / kk; val md = ds.sum / kk
        ys.zip(ds).map { case (a, b) => (a - my) * (b - md) }.sum / (kk - 1)
      }
      val varR = (sv(ys) - 2 * r * cyd + r * r * sv(ds)) / (kk * dbar * dbar)
      k shouldBe g.size.toLong
      ratio shouldBe r +- 1e-6
      se shouldBe math.sqrt(varR) +- 1e-5
    }
  }

  test("msprt: p is monotone non-increasing and a real effect drives it down") {
    // arm 0 centered at 1000 cents, arm 1 at 1300 — a 3-dollar lift the
    // mixture test must eventually flag; 20 days × 30 obs per arm per day
    val rows = for {
      day <- 0 until 20; i <- 0 until 30; a <- Seq(0L, 1L)
    } yield {
      val noise = (day * 31 + i * 7 + a * 13) % 201 - 100
      (a, day.toLong, (if (a == 0) 1000L else 1300L) + noise)
    }
    val got = Stats.msprt(rows.toDF("a", "day", "c"),
        col("a"), col("day"), col("c"), tauSq = 10000.0)
      .orderBy("day")
      .as[(Long, Long, Long, Double, Double)].collect()
    got.length shouldBe 20
    val ps = got.map(_._5)
    ps.sliding(2).foreach { case Array(a, b) => b should be <= a; case _ => }
    ps.last should be < 0.01 // the lift is ~5 noise-SDs: decisive
    got.map(_._4).last shouldBe -3.0 +- 0.2 // delta in currency units
  }

  test("msprt matches the plain-Scala mixture formula day by day") {
    val rows = for {
      day <- 0 until 6; i <- 0 until 10; a <- Seq(0L, 1L)
    } yield (a, day.toLong, 500L + ((day * 17 + i * 3 + a * 29) % 41))
    val got = Stats.msprt(rows.toDF("a", "day", "c"),
        col("a"), col("day"), col("c"), tauSq = 2500.0)
      .orderBy("day")
      .as[(Long, Long, Long, Double, Double)].collect()

    var runMin = 1.0
    (0 until 6).foreach { day =>
      val cum = rows.filter(_._2 <= day)
      val A = cum.filter(_._1 == 0L).map(_._3.toDouble)
      val B = cum.filter(_._1 == 1L).map(_._3.toDouble)
      val delta = A.sum / A.size - B.sum / B.size
      def ss(a: Seq[Double]) = {
        val m = a.sum / a.size; a.map(x => (x - m) * (x - m)).sum
      }
      val s2 = (ss(A) + ss(B)) / (A.size + B.size - 2)
      val v = s2 * (1.0 / A.size + 1.0 / B.size)
      val tau2 = 2500.0
      val lam = math.sqrt(v / (v + tau2)) *
        math.exp(delta * delta * tau2 / (2 * v * (v + tau2)))
      runMin = math.min(runMin, math.min(1.0, 1.0 / lam))
      val row = got(day)
      row._2 shouldBe A.size.toLong
      row._3 shouldBe B.size.toLong
      row._4 shouldBe delta / 100.0 +- 1e-4
      row._5 shouldBe runMin +- 1e-5
    }
  }

  test("srmCheck: a balanced split passes, a broken one flags decisively") {
    val balanced = (1 to 200).map(i => Tuple1(i % 2L)).toDF("arm")
    val Array((na, nb, share, chi2, p)) =
      Stats.srmCheck(balanced, col("arm"))
      .as[(Long, Long, Double, Double, Double)].collect()
    na shouldBe 100L; nb shouldBe 100L; share shouldBe 0.5
    chi2 shouldBe 0.0; p shouldBe 1.0 +- 1e-9
    // 30% lost from one arm: χ² = 70²/370 ≈ 13.2 → p < 1e-3
    val broken = ((1 to 150).map(_ => 0L) ++ (1 to 220).map(_ => 1L))
      .map(Tuple1(_)).toDF("arm")
    val Array((_, _, _, chi2b, pb)) =
      Stats.srmCheck(broken, col("arm"))
      .as[(Long, Long, Double, Double, Double)].collect()
    chi2b shouldBe 70.0 * 70 / 370 +- 1e-3
    pb should be < 1e-3
  }

  test("diffInDiff recovers a known lift and matches the plain-Scala reference") {
    // control units change ~0 (± noise), treated units change ~+300
    val units = (1 to 60).map { i =>
      val arm = i % 2L
      val x = (1000 + i * 13 % 97).toLong
      val y = x + (if (arm == 1L) 300L else 0L) + (i * 7 % 21) - 10
      (arm, x, y)
    }
    val Array(r) = Stats.diffInDiff(units.toDF("arm", "x", "y"),
        col("arm"), col("x"), col("y"))
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect()
    val (nc, nt, mdc, mdt, did, se, _, p) = r
    def dstats(arm: Long) = {
      val ds = units.filter(_._1 == arm).map(u => (u._3 - u._2).toDouble)
      val m = ds.sum / ds.size
      (ds.size, m, ds.map(d => (d - m) * (d - m)).sum / (ds.size - 1))
    }
    val (ncr, mc, vc) = dstats(0L)
    val (ntr, mt, vt) = dstats(1L)
    nc shouldBe ncr.toLong
    nt shouldBe ntr.toLong
    mdc shouldBe mc / 100.0 +- 1e-4
    mdt shouldBe mt / 100.0 +- 1e-4
    did shouldBe (mt - mc) / 100.0 +- 1e-4
    se shouldBe math.sqrt(vt / ntr + vc / ncr) / 100.0 +- 1e-4
    did shouldBe 3.0 +- 0.1 // the planted $3 lift
    p should be < 1e-6      // decisive at this noise level
  }

  test("diffInDiff: degenerate families (tiny arm, zero change variance) are absent") {
    val tiny = Seq((0L, 1L, 2L), (1L, 1L, 2L), (1L, 3L, 4L)).toDF("arm", "x", "y")
    Stats.diffInDiff(tiny, col("arm"), col("x"), col("y")).count() shouldBe 0L
    val flat = (1 to 10).map(i => (i % 2L, 100L, 100L)).toDF("arm", "x", "y")
    Stats.diffInDiff(flat, col("arm"), col("x"), col("y")).count() shouldBe 0L
  }

  test("mannWhitney: U equals the pairwise win count (ties = half-wins)") {
    // heavy-tailed fixture with ties across and within groups
    val rows = Seq(
      ("a", 10L), ("a", 12L), ("a", 12L), ("a", 100L), ("a", 5L),
      ("b", 11L), ("b", 12L), ("b", 3L), ("b", 12L), ("b", 7L), ("b", 9L))
    val Array((na, nb, u, z, p)) =
      Stats.mannWhitney(rows.toDF("g", "v"), col("g"), col("v"), "a", "b")
      .as[(Long, Long, Double, Double, Double)].collect()
    val as = rows.filter(_._1 == "a").map(_._2)
    val bs = rows.filter(_._1 == "b").map(_._2)
    val uRef = (for { x <- as; y <- bs } yield
      if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
    na shouldBe as.size.toLong
    nb shouldBe bs.size.toLong
    u shouldBe uRef
    p should (be >= 0.0 and be <= 1.0)
    // identical samples → U = n²/2, z = 0, p = 1
    val same = (1 to 8).flatMap(i => Seq(("a", i.toLong), ("b", i.toLong)))
    val Array((_, _, u2, z2, p2)) =
      Stats.mannWhitney(same.toDF("g", "v"), col("g"), col("v"), "a", "b")
      .as[(Long, Long, Double, Double, Double)].collect()
    u2 shouldBe 32.0 // 8·8/2
    z2 shouldBe 0.0
    p2 shouldBe 1.0 +- 1e-6
  }

  test("mannWhitney matches the tie-corrected normal approximation") {
    val rows = (1 to 60).map(i =>
      (if (i % 2 == 0) "a" else "b", (i * 7 % 23 + (i % 2) * 5).toLong))
    val Array((na, nb, u, z, _)) =
      Stats.mannWhitney(rows.toDF("g", "v"), col("g"), col("v"), "a", "b")
      .as[(Long, Long, Double, Double, Double)].collect()
    val n = (na + nb).toDouble
    val ties = rows.map(_._2).groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val mu = na * nb / 2.0
    val s2 = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z shouldBe (u - mu) / math.sqrt(s2) +- 1e-4
  }

  test("proportionTest: rates, Wilson bounds, and z match the textbook formulas") {
    val units = (1 to 200).map { i =>
      val arm = i % 2L
      // arm 0 converts 30%, arm 1 converts 50% (index within the arm,
      // not i itself — parity makes i's own last digit always even/odd)
      val j = i / 2
      (arm, if (arm == 0L) j % 10 < 3 else j % 10 < 5)
    }
    val Array(r) = Stats.proportionTest(units.toDF("arm", "conv"),
        col("arm"), col("conv"))
      .as[(Long, Long, Double, Double, Double, Long, Long, Double, Double,
        Double, Double, Double)].collect()
    val (nA, xA, rateA, loA, hiA, nB, xB, rateB, _, _, z, p) = r
    nA shouldBe 100L; xA shouldBe 30L; rateA shouldBe 0.3
    nB shouldBe 100L; xB shouldBe 50L; rateB shouldBe 0.5
    def wilson(x: Double, n: Double): (Double, Double) = {
      val z0 = 1.959963984540054
      val ph = x / n
      val c = ph + z0 * z0 / (2 * n)
      val rad = z0 * math.sqrt(ph * (1 - ph) / n + z0 * z0 / (4 * n * n))
      val d = 1 + z0 * z0 / n
      ((c - rad) / d, (c + rad) / d)
    }
    val (wl, wh) = wilson(30, 100)
    loA shouldBe wl +- 1e-5
    hiA shouldBe wh +- 1e-5
    val pp = (30.0 + 50) / 200
    val zRef = (0.3 - 0.5) / math.sqrt(pp * (1 - pp) * (1 / 100.0 + 1 / 100.0))
    z shouldBe zRef +- 1e-3
    p should be < 0.05 // 30% vs 50% at n=100/arm is decisive
  }

  test("twoSidedNormP matches known normal-tail values") {
    val got = Seq(0.0, 1.959963984540054, 2.5758293035489004, 5.0)
      .toDF("z")
      .select(col("z"), Stats.twoSidedNormP(col("z")).as("p"))
      .as[(Double, Double)].collect().toMap
    got(0.0) shouldBe 1.0 +- 1e-6
    got(1.959963984540054) shouldBe 0.05 +- 1e-6   // 95% two-sided
    got(2.5758293035489004) shouldBe 0.01 +- 1e-6  // 99% two-sided
    got(5.0) shouldBe 5.7e-7 +- 1e-7
  }

  test("bhAdjust implements the step-up running minimum") {
    val tests = Seq(("a", 0.005), ("b", 0.011), ("c", 0.02),
      ("d", 0.04), ("e", 0.05)).toDF("id", "p")
    val got = Stats.bhAdjust(tests, col("p"), Seq(col("id")))
      .select(col("id"), col("rank"), col("p_adj"))
      .as[(String, Int, Double)].collect().sortBy(_._2).toSeq
    // candidates m·p/i = .025, .0275, .0333…, .05, .05 → reverse min
    got.map(_._1) shouldBe Seq("a", "b", "c", "d", "e")
    got.map(_._3) shouldBe Seq(0.025, 0.0275, 0.033333, 0.05, 0.05)
  }

  test("bhAdjust: tied p-values share the tail minimum under either order") {
    val tests = Seq(("a", 0.01), ("b", 0.01), ("c", 0.5)).toDF("id", "p")
    val got = Stats.bhAdjust(tests, col("p"), Seq(col("id")))
      .select(col("id"), col("p_adj")).as[(String, Double)].collect().toMap
    got("a") shouldBe got("b") // m·p/2 = .015 flows back to rank 1
    got("a") shouldBe 0.015 +- 1e-9
  }

  test("kaplanMeier matches the hand-computed curve with censoring") {
    // users: churn at 10 (1), churn at 12 (2), censored at 28/30/30;
    // horizon 30, margin 5 → churned iff last ≤ 25
    val spans = Seq((1L, 0L, 10L), (2L, 0L, 12L), (3L, 0L, 12L),
      (4L, 2L, 30L), (5L, 0L, 30L), (6L, 1L, 29L))
    val ev = spans.flatMap { case (u, f, l) => Seq((u, f), (u, l)) }
      .toDF("u", "d")
    val got = Stats.kaplanMeier(ev, col("u"), col("d"), 5)
      .orderBy("lifetime")
      .as[(Long, Long, Long, Double)].collect().toSeq
    got shouldBe Seq(
      (10L, 6L, 1L, 0.833333),            // 5/6
      (12L, 5L, 2L, 0.5),                 // 5/6 · 3/5
      (28L, 3L, 0L, 0.5),                 // two censored users: no drop
      (30L, 1L, 0L, 0.5))
  }

  test("kaplanMeier: a level where everyone at risk churns zeroes survival without ln(0)") {
    // horizon 40 via a censored single-event straggler (lifetime 0);
    // at lifetime 20 the whole remaining risk set churns → survival
    // exactly 0 there, with no ln(0) evaluated on the way
    val spans = Seq((1L, 0L, 10L), (2L, 0L, 10L), (3L, 0L, 20L),
      (4L, 40L, 40L))
    val ev = spans.flatMap { case (u, f, l) => Seq((u, f), (u, l)) }
      .toDF("u", "d")
    val got = Stats.kaplanMeier(ev, col("u"), col("d"), 5)
      .orderBy("lifetime")
      .as[(Long, Long, Long, Double)].collect().toSeq
    got shouldBe Seq(
      (0L, 4L, 0L, 1.0),
      (10L, 3L, 2L, 0.333333),
      (20L, 1L, 1L, 0.0))
  }

  test("pairwisePrefs counts per-unit value comparisons, ties carry no signal") {
    // u1: a=30 > b=10 > c=5; u2: b=20 > a=10, c=10 ties a → (a,c) dropped
    val rows = Seq(
      (1L, "a", 30L), (1L, "b", 10L), (1L, "c", 5L),
      (2L, "a", 10L), (2L, "b", 20L), (2L, "c", 10L))
      .toDF("u", "i", "v")
    val got = Stats.pairwisePrefs(rows, col("u"), col("i"), col("v"))
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("a", "b", 1L, 1L, 2L),   // u1 a wins, u2 b wins
      ("a", "c", 1L, 0L, 1L),   // u2 tie dropped
      ("b", "c", 2L, 0L, 2L))
  }

  test("bradleyTerry: 2-item closed form, transitive ordering, Ford guard") {
    // two items: MLE is s_a/s_b = w_a/w_b exactly (any fixed point of
    // the MM update satisfies it) → with wins 30:10 and Σs=1, s=(3/4,1/4)
    val two = Seq(("a", "b", 30L, 10L)).toDF("ia", "ib", "wa", "wb")
    val s2 = Stats.bradleyTerry(two, col("ia"), col("ib"), col("wa"), col("wb"))
      .orderBy("item").as[(String, Double, Long, Long)].collect()
    s2.map(_._1).toSeq shouldBe Seq("a", "b")
    s2(0)._2 shouldBe 0.75 +- 1e-6
    s2(1)._2 shouldBe 0.25 +- 1e-6
    s2(0)._3 shouldBe 30L // wins
    s2(0)._4 shouldBe 40L // games
    // three items with a clear strength gradient: fitted order follows
    // the win-rate order and P(a>c) implied by scores exceeds the
    // directly-observed pair ratio ordering
    val three = Seq(
      ("a", "b", 70L, 30L), ("b", "c", 70L, 30L), ("a", "c", 85L, 15L))
      .toDF("ia", "ib", "wa", "wb")
    val s3 = Stats.bradleyTerry(three, col("ia"), col("ib"), col("wa"), col("wb"))
      .orderBy(col("bt_score").desc).as[(String, Double, Long, Long)].collect()
    s3.map(_._1).toSeq shouldBe Seq("a", "b", "c")
    (s3.map(_._2).sum) shouldBe 1.0 +- 1e-5
    // MM fixed point: s_i·Σ n_ij/(s_i+s_j) = W_i for every item
    val s = s3.map(t => t._1 -> t._2).toMap
    val n = Map(("a","b") -> 100.0, ("b","c") -> 100.0, ("a","c") -> 100.0)
    val w = Map("a" -> 155.0, "b" -> 100.0, "c" -> 45.0)
    for (i <- Seq("a", "b", "c")) {
      val denom = n.collect {
        case ((x, y), g) if x == i => g / (s(x) + s(y))
        case ((x, y), g) if y == i => g / (s(x) + s(y))
      }.sum
      (s(i) * denom) shouldBe w(i) +- 0.01
    }
    // Ford 1957: an undefeated item has no MLE — refuse loudly
    val broken = Seq(("a", "b", 10L, 0L)).toDF("ia", "ib", "wa", "wb")
    val e = intercept[IllegalArgumentException] {
      Stats.bradleyTerry(broken, col("ia"), col("ib"), col("wa"), col("wb"))
    }
    e.getMessage should include("Ford")
  }

  test("chiSquare/mutualInfo: NULL categories carry no evidence — nulled rows equal the clean subset") {
    // pre-fix, a NULL cell dropped at the marginal equi-joins but still
    // counted in n, so Σ o²/e − n could go NEGATIVE (an impossible χ²)
    val clean = (Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(4)(("y", "p")) ++ Seq.fill(4)(("y", "q"))).toDF("a", "b")
    val nulled = (Seq.fill(4)((Option("x"), Option("p"))) ++
      Seq.fill(4)((Option("x"), Option("q"))) ++
      Seq.fill(4)((Option("y"), Option("p"))) ++
      Seq.fill(4)((Option("y"), Option("q"))) ++
      Seq((None: Option[String], Option("p")), (Option("x"), None),
        (None, None))).toDF("a", "b")
    val c0 = Stats.chiSquare(clean, col("a"), col("b"))
      .as[(Double, Long, Long)].collect()(0)
    val c1 = Stats.chiSquare(nulled, col("a"), col("b"))
      .as[(Double, Long, Long)].collect()(0)
    c1 shouldBe c0
    c1._1 should be >= 0.0
    val m0 = Stats.mutualInfo(clean, col("a"), col("b"))
      .as[(Double, Long)].collect()(0)
    val m1 = Stats.mutualInfo(nulled, col("a"), col("b"))
      .as[(Double, Long)].collect()(0)
    m1 shouldBe m0
  }

  test("calibration bins by exact integer units — a boundary score lands in its own bin") {
    // double floor(0.3 * 10) = floor(2.9999999999999996) = 2; the
    // integer path (u·bins div 10^dp = 3000·10 div 10000) must give 3
    val df = Seq((0.3, true), (0.2999, false), (0.3001, true)).toDF("s", "l")
    val got = Stats.calibration(df, col("s"), col("l"), bins = 10)
      .orderBy("bin").as[(Long, Long, Long, Double, Double)].collect()
    got.map(_._1) shouldBe Array(2L, 3L)
    got(0)._2 shouldBe 1L // 0.2999 alone below the boundary
    got(1)._2 shouldBe 2L // 0.3 (the boundary) and 0.3001
  }

  test("auc excludes NULL-label/NULL-score rows instead of counting them as negatives") {
    val clean = Seq(("g", Option(0.9), Option(true)),
      ("g", Option(0.1), Option(false))).toDF("g", "s", "l")
    val nulled = clean.union(Seq(
      ("g", Option(0.5), None: Option[Boolean]),
      ("g", None: Option[Double], Option(true))).toDF("g", "s", "l"))
    val a0 = Stats.auc(clean, col("g"), col("s"), col("l"))
      .as[(String, Long, Long, Double)].collect()(0)
    val a1 = Stats.auc(nulled, col("g"), col("s"), col("l"))
      .as[(String, Long, Long, Double)].collect()(0)
    a1 shouldBe a0
    a0 shouldBe (("g", 1L, 1L, 1.0))
  }

  test("psi ignores NULL buckets instead of smoothing a phantom bin into the drift sum") {
    val clean = Seq((Option(0L), true), (Option(1L), true),
      (Option(0L), false), (Option(1L), false)).toDF("b", "base")
    val nulled = clean.union(Seq((None: Option[Long], true),
      (None: Option[Long], false)).toDF("b", "base"))
    val p0 = Stats.psi(clean, col("b"), col("base"), bins = 10)
      .as[(Long, Double)].collect()(0)
    val p1 = Stats.psi(nulled, col("b"), col("base"), bins = 10)
      .as[(Long, Double)].collect()(0)
    p1 shouldBe p0
    p0._1 shouldBe 2L // two real bins, no phantom
  }

  test("iqrOutliers/mad/entropy: NULL group keys are excluded, not silently vanished at the join") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(v => (Option("a"), Option(v))) ++
      Seq((None: Option[String], Option(50.0)),
        (Option("a"), None: Option[Double]))).toDF("g", "v")
    val iqr = Stats.iqrOutliers(df, "g", col("v"))
      .as[(String, Long, Double, Double)].collect()
    iqr shouldBe Array(("a", 1L, 100.0, 100.0))
    val madGot = Stats.mad(df, "g", col("v"))
      .as[(String, Double, Double, Long)].collect()
    madGot.length shouldBe 1
    madGot(0)._1 shouldBe "a"
    madGot(0)._4 shouldBe 6L // n counts evidence rows only (no null value)
    val ent = Stats.entropy(df.select(col("g"), col("v").cast("string").as("v")),
        "g", col("v"))
      .as[(String, Long, Long, Double)].collect()
    ent.length shouldBe 1
    ent(0)._3 shouldBe 6L // null value is not a dictionary symbol
  }
}
