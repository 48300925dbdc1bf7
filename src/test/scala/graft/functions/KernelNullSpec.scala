package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null propagation through the native kernels: null inputs must yield
  * null outputs (UnaryExpression/BinaryExpression null-safe eval), never
  * a crash — ANSI mode (Spark 4 default) turns kernel exceptions into
  * query failures.
  */
class KernelNullSpec extends SparkSpec {
  import spark.implicits._

  test("array kernels are null-safe") {
    val df = Seq((1L, Option(Seq("a", "b", "c"))), (2L, None))
      .toDF("id", "toks")
    val got = df.select(col("id"),
        DedupExpr.minhashSig(col("toks"), 2, 8).as("sig"),
        DedupExpr.simhash(col("toks")).as("sh"),
        DedupExpr.shingleHashes(col("toks"), 2).as("shs"))
      .orderBy("id").collect()
    got(0).isNullAt(1) shouldBe false
    got(1).isNullAt(1) shouldBe true
    got(1).isNullAt(2) shouldBe true
    got(1).isNullAt(3) shouldBe true
  }

  test("vector kernels are null-safe and empty-array-safe") {
    val df = Seq(
      (1L, Option(Seq(1.0f, 2.0f)), Option(Seq(3.0f, 4.0f))),
      (2L, None, Option(Seq(3.0f, 4.0f))),
      (3L, Option(Seq.empty[Float]), Option(Seq.empty[Float])))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorExpr.cosineSim(col("a"), col("b")).as("c"),
        VectorExpr.dotProduct(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    got(0).getDouble(1) shouldBe (11.0 / (math.sqrt(5) * 5.0)) +- 1e-12
    got(1).isNullAt(1) shouldBe true
    got(2).getDouble(1) shouldBe 0.0 // zero-norm guard: 0.0, never NaN
    got(2).getDouble(2) shouldBe 0.0
  }

  test("vector kernels reject mismatched lengths instead of reading garbage") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("id", "a", "b")
    val ex = intercept[Exception] {
      df.select(VectorExpr.cosineSim(col("a"), col("b"))).collect()
    }
    ex.getMessage should include("equal-length")
    val ex2 = intercept[Exception] {
      df.select(VectorExpr.dotProduct(col("a"), col("b"))).collect()
    }
    ex2.getMessage should include("equal-length")
  }

  test("cosine of a zero-norm vector is 0.0, not NaN") {
    val df = Seq((1L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("id", "a", "b")
    df.select(VectorExpr.cosineSim(col("a"), col("b"))).head.getDouble(0) shouldBe 0.0
  }

  test("sig_agreement rejects mismatched signature lengths") {
    val df = Seq((1L, Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("id", "a", "b")
    val ex = intercept[Exception] {
      df.select(DedupExpr.sigAgreement(col("a"), col("b"))).collect()
    }
    ex.getMessage should include("equal-length")
  }

  test("token_stats kernel is null-safe and empty-string-safe") {
    val df = Seq((1L, Option("a b")), (2L, None), (3L, Option("")))
      .toDF("id", "t")
    val got = df.select(col("id"), TextExpr.tokenStats(col("t")).as("st"))
      .orderBy("id").collect()
    got(0).getStruct(1).getLong(0) shouldBe 2L
    got(1).isNullAt(1) shouldBe true
    got(2).getStruct(1).getLong(0) shouldBe 0L
  }

  test("repetition_stats and best_lang kernels are null- and empty-safe") {
    val df = Seq((1L, Option("a a b")), (2L, None), (3L, Option("")))
      .toDF("id", "t")
    val got = df.select(col("id"),
        CurationExpr.repetitionStats(col("t")).as("rs"),
        CurationExpr.bestLang(col("t"), graft.SparkEntry.langProfiles).as("lg"))
      .orderBy("id").collect()
    got(0).getStruct(1).getLong(0) shouldBe 3L // n_tokens
    got(0).getString(2) should not be null
    got(1).isNullAt(1) shouldBe true
    got(1).isNullAt(2) shouldBe true
    got(2).getStruct(1).getLong(0) shouldBe 0L // empty doc: zero everywhere
    got(2).getString(2) shouldBe "de"          // all-zero tie -> first sorted lang
  }

  test("pq kernels: null vectors stay null; wrong dimension throws; zero vector encodes") {
    val cb = graft.operators.Pq.train(
      Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)), (2L, Seq(4.0f, 3.0f, 2.0f, 1.0f)))
        .toDF("id", "v"), "v", m = 2, k = 2, sampleN = 2, iters = 2)
    val df = Seq(
      (1L, Option(Seq(1.0f, 2.0f, 3.0f, 4.0f))),
      (2L, None),
      (3L, Option(Seq(0.0f, 0.0f, 0.0f, 0.0f))))
      .toDF("id", "v")
    val got = df.select(col("id"),
        PqExpr.encode(col("v"), cb.subDim, cb.k, cb.cents).as("codes"))
      .orderBy("id").collect()
    got(0).getAs[Array[Byte]](1).length shouldBe 2
    got(1).isNullAt(1) shouldBe true
    got(2).getAs[Array[Byte]](1).length shouldBe 2 // zero vector: valid codes
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val ex = intercept[Exception] {
      bad.select(PqExpr.encode(col("v"), cb.subDim, cb.k, cb.cents)).collect()
    }
    ex.getMessage should include("length")
  }
}
