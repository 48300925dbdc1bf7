package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 1.5), (2L, Some("b"), 2.5), (3L, None, 1.5), (4L, Some("a"), 0.5)
  ).toDF("id", "s", "v")

  test("profile: exact per-column stats, one row per column, min/max as strings") {
    val got = Profiling.profile(df, Seq("id", "s", "v")).orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    got shouldBe Array(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b"), // nulls excluded from distinct and min/max
      ("v", 4L, 0L, 3L, "0.5", "2.5"))
  }

  test("profile exact=false swaps HLL++ distinct; other stats unchanged") {
    val big = spark.range(10000L).select(col("id"), (col("id") % 97).as("m"))
    val approx = Profiling.profile(big, Seq("m"), exact = false)
      .as[(String, Long, Long, Long, String, String)].head()
    approx._2 shouldBe 10000L
    // HLL++ default rsd 5%: 97 distinct must land well inside
    approx._4.toDouble shouldBe 97.0 +- 10.0
    approx._5 shouldBe "0"
    approx._6 shouldBe "96"
  }
}
