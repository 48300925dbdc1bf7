package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val df = (0L until 4000L).map(i => (i, s"s${i % 4}")).toDF("id", "grp")

  test("hashSample keeps ~fraction deterministically") {
    val a = Sampling.hashSample(df, col("id"), 0.25).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df, col("id"), 0.25).select("id").as[Long].collect().toSet
    a shouldBe b // pure function of the key
    a.size.toDouble / 4000 shouldBe 0.25 +- 0.03
    // monotone: a smaller fraction is a subset of a larger one
    val small = Sampling.hashSample(df, col("id"), 0.1).select("id").as[Long].collect().toSet
    small.subsetOf(a) shouldBe true
  }

  test("weightedSample takes k per stratum, biased toward weight, deterministically") {
    // two strata; in "h" one row carries 10^6x the weight of the rest —
    // u^(1/w) -> ~1 for huge w, so it must always be selected
    val wdf = ((0L until 100L).map(i => (i, "u", 1.0)) ++
      (100L until 200L).map(i => (i, "h", if (i == 150L) 1e6 else 1e-3)))
      .toDF("id", "grp", "w")
    val got = Sampling.weightedSample(wdf, col("grp"), col("id"), col("w"), k = 5)
    got.count() shouldBe 10L
    got.where(col("grp") === "h").select("id").as[Long].collect() should contain(150L)
    // deterministic across runs
    val again = Sampling.weightedSample(wdf, col("grp"), col("id"), col("w"), k = 5)
    got.select("id").as[Long].collect().toSet shouldBe
      again.select("id").as[Long].collect().toSet
  }

  test("weightedSample with k larger than the stratum returns the whole stratum") {
    val wdf = (0L until 3L).map(i => (i, "s", 2.0)).toDF("id", "grp", "w")
    Sampling.weightedSample(wdf, col("grp"), col("id"), col("w"), k = 10)
      .count() shouldBe 3L
  }

  test("stratifiedExact returns exactly the quota per stratum, deterministically") {
    val got = Sampling.stratifiedExact(df, col("grp"), col("id"), 7)
    got.groupBy("grp").count().as[(String, Long)].collect().toMap.values.toSet shouldBe Set(7L)
    val again = Sampling.stratifiedExact(df, col("grp"), col("id"), 7)
      .select("id").as[Long].collect().sorted
    got.select("id").as[Long].collect().sorted shouldBe again
    // a stratum smaller than the quota returns all its rows
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "grp")
    Sampling.stratifiedExact(tiny, col("grp"), col("id"), 5).count() shouldBe 3L
  }

  test("stratifiedExact never clobbers a user column sharing the scratch name") {
    val poison = df.withColumn("__graft_rk_0", lit(7L))
    val got = Sampling.stratifiedExact(poison, col("grp"), col("id"), 3)
    got.columns should contain("__graft_rk_0")
    got.select("__graft_rk_0").distinct().as[Long].collect().toSeq shouldBe Seq(7L)
    got.groupBy("grp").count().as[(String, Long)].collect().toMap.values.toSet shouldBe Set(3L)
  }

  test("stratifiedExact plan prunes to the quota before the shuffle") {
    val plan = Sampling.stratifiedExact(df, col("grp"), col("id"), 7)
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }
}
