package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("rank-based exact percentiles match builtin percentile (quantile_cont semantics)") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0)).toDF("g", "v")
    val got = Percentiles.exact(df, "g", "v", Seq(("p50", 0.5), ("p25", 0.25)))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got("a")._1 shouldBe 2.5 +- 1e-12  // interpolated median of 1..4
    got("a")._2 shouldBe 1.75 +- 1e-12 // (4-1)*0.25 = 0.75 → 1 + 0.75*(2-1)
    got("b")._1 shouldBe 15.0 +- 1e-12

    val builtin = df.groupBy("g")
      .agg(expr("percentile(v, 0.5)").as("p50"), expr("percentile(v, 0.25)").as("p25"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got("a")._1 shouldBe builtin("a")._1 +- 1e-9
    got("a")._2 shouldBe builtin("a")._2 +- 1e-9
  }
}
