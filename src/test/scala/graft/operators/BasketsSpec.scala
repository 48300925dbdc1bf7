package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrence counts pairs per basket once and computes lift exactly") {
    // baskets: b1{x,y,z}, b2{x,y}, b3{x,z}, b4{y} (+ duplicate x row in b1)
    val df = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")).toDF("bk", "item")
    val got = Baskets.cooccurrence(df, col("bk"), col("item"), minCount = 2)
      .select("item_a", "item_b", "n_ab", "lift")
      .as[(String, String, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    // n(x)=3, n(y)=3, n(z)=2, N=4; xy in b1,b2 (2), xz in b1,b3 (2), yz in b1 (1 -> pruned)
    got.keySet shouldBe Set(("x", "y"), ("x", "z"))
    got(("x", "y"))._1 shouldBe 2L
    got(("x", "y"))._2 shouldBe (2.0 * 4 / (3.0 * 3)) +- 1e-12
    got(("x", "z"))._1 shouldBe 2L
    got(("x", "z"))._2 shouldBe (2.0 * 4 / (3.0 * 2)) +- 1e-12
  }

  test("cooccurrence orders pairs canonically (item_a < item_b), no self-pairs") {
    val df = Seq((1L, "b"), (1L, "a"), (2L, "a"), (2L, "b")).toDF("bk", "item")
    val got = Baskets.cooccurrence(df, col("bk"), col("item"), minCount = 1)
      .select("item_a", "item_b", "n_ab").as[(String, String, Long)].collect()
    got shouldBe Array(("a", "b", 2L))
  }
}
