package graft

class GraftExtensionsSpec extends SparkSpec {

  test("SQL functions registered on a live session") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(array('the','quick','fox')) AS sh,
        |       minhash_sig(array('a','b','c','d'), 2, 8) AS sig,
        |       shingle_hashes(array('a','b','c'), 2) AS shs,
        |       lsh_band_keys(minhash_sig(array('a','b','c','d'), 2, 8), 4, 2) AS bk""".stripMargin)
      .collect().head
    row.getAs[Long]("sh") should not be 0L
    row.getSeq[Long](1).length shouldBe 8
    row.getSeq[Long](2).length shouldBe 2
    row.getSeq[Long](3).length shouldBe 4
  }

  test("vector and text kernels callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d,
        |       sign_lsh(array(cast(1.0 AS FLOAT), cast(0.5 AS FLOAT)), 8) AS s,
        |       sign_lsh_bands(array(1.0D, 0.5D), 4, 6) AS sb,
        |       token_stats('the quick fox').n_tokens AS n,
        |       repetition_stats('a a b').n_distinct AS nd""".stripMargin)
      .collect().head
    row.getAs[Double]("c") shouldBe 1.0 +- 1e-12
    row.getAs[Double]("d") shouldBe 23.0 +- 1e-12
    row.getSeq[Long](3).length shouldBe 6
    row.getAs[Long]("n") shouldBe 3L
    row.getAs[Long]("nd") shouldBe 2L
  }

  test("SQL simhash matches the Column-API kernel") {
    GraftExtensions.register(spark)
    import graft.functions.DedupExpr
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql("SELECT simhash64(array('x','y','z')) AS sh")
      .collect().head.getAs[Long]("sh")
    val viaCol = spark.range(1)
      .select(DedupExpr.simhash(typedLit(Seq("x", "y", "z"))).as("sh"))
      .collect().head.getAs[Long]("sh")
    viaSql shouldBe viaCol
  }

  test("normalize_text kernel: accent fold, case, whitespace collapse, null safety") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT normalize_text('  CaFé\tÑANDÚ  àëï Ök  ') AS n""").head().getString(0)
    got shouldBe "cafe nandu aei ok"
    // idempotent on already-normal text; empty and null behave
    spark.sql("SELECT normalize_text('cafe nandu')").head().getString(0) shouldBe "cafe nandu"
    spark.sql("SELECT normalize_text('   ')").head().getString(0) shouldBe ""
    spark.sql("SELECT normalize_text(CAST(NULL AS STRING))").head().isNullAt(0) shouldBe true
    // kernel ≡ Column API
    import spark.implicits._
    val df = Seq("École Über  straße").toDF("t")
    df.select(graft.functions.CurationExpr.normalizeText($"t")).head().getString(0) shouldBe
      "ecole uber straße" // ß has no decomposition: preserved, not mangled
  }

  test("js_number_string callable from SQL, matching the kernel and node semantics") {
    // the r14 ADVICE find: SURVEY §2.10 claimed SQL registration for
    // every kernel, but js_number_string was GeoNames-sink-internal.
    // Pins the registration AND the ECMAScript shortest-digit cases
    // that distinguish JsNum from a plain Double.toString.
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT js_number_string(40.8D) AS a,
        |       js_number_string(-74.0D) AS b,
        |       js_number_string(1e21D) AS c,
        |       js_number_string(cast(null AS DOUBLE)) AS n""".stripMargin)
      .collect().head
    row.getAs[String]("a") shouldBe "40.8"
    row.getAs[String]("b") shouldBe "-74" // integral double: no trailing .0
    row.getAs[String]("c") shouldBe "1e+21" // ECMAScript exponent form
    row.isNullAt(3) shouldBe true
  }

  test("builder-time extensions path constructs (class is instantiable as fn)") {
    val ext = new GraftExtensions
    val se = new org.apache.spark.sql.SparkSessionExtensions
    noException should be thrownBy ext(se)
  }
}
