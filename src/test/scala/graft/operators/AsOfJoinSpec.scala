package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades (left) as-of quotes (right) — the canonical shape
  private def trades = Seq(
    ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 5L, 99.0),
    ("B", 15L, 50.0))
    .toDF("sym", "t", "px")
  private def quotes = Seq(
    ("A", 5L, 98.0), ("A", 10L, 98.5), ("A", 15L, 99.5),
    ("B", 20L, 49.0))
    .toDF("sym", "t", "bid")

  test("asOfBackward: latest strictly-earlier right row per key") {
    val got = AsOfJoin.asOfBackward(trades, quotes, Seq("sym"), "t", "t",
        Map("bid" -> "last_bid", "t" -> "bid_t"))
      .select("sym", "t", "last_bid", "bid_t")
      .as[(String, Long, Option[Double], Option[Long])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    got(("A", 10L)) shouldBe (Some(98.0), Some(5L))   // quote@10 is a tie → excluded (strict)
    got(("A", 20L)) shouldBe (Some(99.5), Some(15L))
    got(("A", 5L)) shouldBe (None, None)              // quote@5 tied → excluded, nothing earlier
    got(("B", 15L)) shouldBe (None, None)             // only quote is later
  }

  test("asOfForward: earliest strictly-later right row per key") {
    val got = AsOfJoin.asOfForward(trades, quotes, Seq("sym"), "t", "t",
        Map("bid" -> "next_bid", "t" -> "bid_t"))
      .select("sym", "t", "next_bid", "bid_t")
      .as[(String, Long, Option[Double], Option[Long])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    got(("A", 10L)) shouldBe (Some(99.5), Some(15L)) // quote@10 tied → excluded
    got(("A", 20L)) shouldBe (None, None)            // nothing after 20
    got(("A", 5L)) shouldBe (Some(98.5), Some(10L))
    got(("B", 15L)) shouldBe (Some(49.0), Some(20L))
  }

  test("asOfBackward keeps every left row and all left columns") {
    val got = AsOfJoin.asOfBackward(trades, quotes, Seq("sym"), "t", "t",
      Map("bid" -> "last_bid"))
    got.count() shouldBe 4
    got.columns.toSeq shouldBe Seq("sym", "t", "px", "last_bid")
  }
}
