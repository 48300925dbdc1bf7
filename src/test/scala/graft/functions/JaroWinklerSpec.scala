package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** The kernel's contract is bit-parity with DuckDB's native
  * jaro_winkler_similarity (the oracle of q_jaro): classic Winkler
  * parameters, integer-halved transpositions, empty strings score 0.
  * Expected values below were cross-checked against DuckDB 1.0.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(TextExpr.jaroWinkler(col("a"), col("b")).as("j"))
      .as[Double].collect()(0)

  test("matches DuckDB on the classic reference pairs") {
    jw("martha", "marhta") shouldBe 0.9611111111111111 +- 1e-15
    jw("dixon", "dicksonx") shouldBe 0.8133333333333332 +- 1e-15
    jw("jellyfish", "smellyfish") shouldBe 0.8962962962962964 +- 1e-15
    jw("dwayne", "duane") shouldBe 0.8400000000000001 +- 1e-15
    jw("crate", "trace") shouldBe 0.7333333333333334 +- 1e-15 // no boost: j > 0.7 but prefix 0
  }

  test("prefix boost caps at 4 and only fires above jaro 0.7") {
    jw("aaaa", "aaaaaa") shouldBe 0.9333333333333333 +- 1e-15
    jw("prefix_common_long", "prefix_common_lxng") shouldBe 0.9777777777777777 +- 1e-15
    jw("ax", "ab") shouldBe 0.6666666666666666 +- 1e-15 // prefix 1 but j ≤ 0.7: no boost
  }

  test("degenerate inputs follow the DuckDB conventions") {
    jw("abc", "abc") shouldBe 1.0
    jw("x", "x") shouldBe 1.0
    jw("abc", "xyz") shouldBe 0.0
    jw("ab", "ba") shouldBe 0.0 // window 0: no cross-position matches
    jw("a", "") shouldBe 0.0
    jw("", "") shouldBe 0.0 // DuckDB scores both-empty 0, not 1
  }

  test("odd transposition counts halve by integer division") {
    // matched sequences abcdef/bcadef disagree at 3 positions -> t = 3/2 = 1
    jw("abcdef", "bcadef") shouldBe 0.9444444444444445 +- 1e-15
  }

  test("callable from SQL via the extension registry") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS j")
      .as[Double].collect()(0)
    got shouldBe 0.9611111111111111 +- 1e-15
  }

  test("null propagates") {
    val got = Seq(("a", Option.empty[String])).toDF("a", "b")
      .select(TextExpr.jaroWinkler(col("a"), col("b")).as("j"))
      .collect()(0)
    got.isNullAt(0) shouldBe true
  }
}
