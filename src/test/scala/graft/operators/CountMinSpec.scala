package graft.operators

import graft.SparkSpec
import graft.functions.TextAnalytics
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(toks: Seq[String], d: Int, w: Int,
                       partitions: Int): Array[Long] =
    toks.toDF("tok").repartition(partitions)
      .agg(CountMin.countMin(col("tok"), d, w)).head().getSeq[Long](0).toArray

  test("estimates never undercount and are exact without full-row collisions") {
    val toks = Seq.fill(40)("a") ++ Seq.fill(7)("b") ++ Seq("c")
    val sk = sketchOf(toks, d = 4, w = 64, partitions = 3)
    CountMin.estimate(sk, 64, "a") shouldBe 40L
    CountMin.estimate(sk, 64, "b") shouldBe 7L
    CountMin.estimate(sk, 64, "c") shouldBe 1L
    CountMin.estimate(sk, 64, "never-seen") should be >= 0L // ≥, collisions only add
  }

  test("sketch is a pure function of the multiset: any partitioning, same counts") {
    val toks = (0 until 5000).map(i => s"t${i % 97}")
    val a = sketchOf(toks, d = 4, w = 128, partitions = 1)
    val b = sketchOf(scala.util.Random.shuffle(toks), d = 4, w = 128, partitions = 13)
    a.toSeq shouldBe b.toSeq
  }

  test("lossy regime: overestimates bounded by n/w per row, never underestimates") {
    val truth = (0 until 200).map(i => s"k$i" -> (i % 9 + 1L)).toMap
    val toks = truth.toSeq.flatMap { case (t, c) => Seq.fill(c.toInt)(t) }
    val n = toks.size.toLong
    val d = 3; val w = 16 // far fewer buckets than keys: collisions certain
    val sk = sketchOf(toks, d, w, partitions = 4)
    truth.foreach { case (t, c) =>
      val est = CountMin.estimate(sk, w, t)
      est should be >= c
      est should be <= c + n // trivial sanity ceiling
    }
    // the standard bound holds on average: E[excess] ≤ n/w per probe row
    val excess = truth.toSeq.map { case (t, c) => CountMin.estimate(sk, w, t) - c }
    (excess.sum.toDouble / excess.size) should be <= (n.toDouble / w) * 2
  }

  test("estimateCol matches the Scala estimator; declared regime is collision-free") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select(explode(TextAnalytics.tokens(col("text"))).as("tok"))
    val sk = toks.agg(CountMin.countMin(col("tok"), 4, 512)).head().getSeq[Long](0).toArray
    val exact = toks.groupBy("tok").count().as[(String, Long)].collect().toMap
    val viaCol = toks.distinct()
      .crossJoin(toks.agg(CountMin.countMin(col("tok"), 4, 512).as("sk")))
      .select(col("tok"), CountMin.estimateCol(col("sk"), col("tok"), 4, 512))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) =>
      CountMin.estimate(sk, 512, t) shouldBe c // exact regime: no 4-row collision
      viaCol(t) shouldBe c                     // codegen probe ≡ Scala probe
    }
  }
}
