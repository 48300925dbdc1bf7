package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish deterministic stream: token t<i> appears ~n/(i+1) times
  private def stream(n: Int, vocab: Int): Seq[String] =
    (0 until n).map { j =>
      var i = 0
      var acc = 0.0
      val norm = (1 to vocab).map(1.0 / _).sum
      val u = ((j * 2654435761L) & 0x7fffffff).toDouble / 0x7fffffff
      var target = u * norm
      while (i < vocab - 1 && { target -= 1.0 / (i + 1); target > 0 }) i += 1
      s"t$i"
    }

  test("MG guarantees in the lossy regime: heavy items present, estimates within n/(k+1)") {
    val k = 8
    val toks = stream(20000, 50)
    val n = toks.size
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // exercise reduce AND merge exactly as Spark would: partition, fold,
    // then merge the partial summaries
    val agg = new HeavyHitters.MisraGriesAgg(k)
    val partials = toks.grouped(1500).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val summary = agg.finish(partials.reduce(agg.merge)).toMap
    val bound = n.toDouble / (k + 1)
    // every item above the frequency threshold must be present
    truth.filter(_._2 > bound).keys.foreach { t => summary.keySet should contain(t) }
    // estimates never exceed truth and are within the additive bound
    summary.foreach { case (t, e) =>
      e should be <= truth(t)
      (truth(t) - e).toDouble should be <= bound
    }
    summary.size should be <= k
  }

  test("MG is exact when capacity covers the vocabulary (k >= distinct)") {
    val toks = stream(5000, 20)
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = new HeavyHitters.MisraGriesAgg(64)
    val partials = toks.grouped(700).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    agg.finish(partials.reduce(agg.merge)).toMap shouldBe truth
  }

  test("Spark end-to-end at exact capacity equals an exact groupBy") {
    val df = stream(8000, 25).toDF("tok")
    val got = df.agg(HeavyHitters.misraGries(col("tok"), 64).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e._1").as("token"), col("e._2").as("n"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("tok").count().as[(String, Long)].collect().toMap
    got shouldBe exact
  }
}
