package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manual-salting correctness. WHEN to salt vs lean on AQE: Spark's
  * adaptive skew-join (spark.sql.adaptive.skewJoin.*) splits a skewed
  * SORT-MERGE/SHUFFLED-HASH join partition automatically once it
  * crosses the 256 MB / 5× thresholds — at that regime the built-in
  * suffices with zero code (measured against saltedJoin on the same
  * skewed fixture in StressBench section 12; numbers in
  * docs/THROUGHPUT.md). Salting remains the tool for the cases AQE
  * cannot touch: aggregation hot keys (no join to split), skew below
  * the thresholds that still pins a reducer, and broadcast-ineligible
  * joins the planner keeps unsplit.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 1000).map(i =>
    (if (i <= 900) "HOT" else s"k${i % 7}", i.toDouble)).toDF("k", "v")

  test("saltedSumCount equals plain groupBy aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", salts = 8)
      .as[(String, Double, Long)].collect().toSet
    salted shouldBe plain
  }

  test("saltedJoin returns exactly the rows of the unsalted join") {
    val dim = Seq(("HOT", "hot-name"), ("k1", "one"), ("k2", "two")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
      .as[(String, Double, String)].collect().sorted
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "v", "name").as[(String, Double, String)].collect().sorted
    salted shouldBe plain
  }

  test("saltedJoin spreads the hot key across salt values") {
    val dim = Seq(("HOT", "x")).toDF("k", "name")
    val b = skewed.withColumn("_salt", pmod(monotonically_increasing_id(), lit(8L)))
    b.where(col("k") === "HOT").select("_salt").distinct().count() should be > 1L
  }
}
