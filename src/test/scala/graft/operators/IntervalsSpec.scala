package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def ivs(name: String, rows: (Long, Long, Long)*) =
    rows.toDF(s"id_$name", s"s_$name", s"e_$name")

  private def pairs(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)],
                    width: Long): Set[(Long, Long, Long)] =
    Intervals.overlapJoin(ivs("a", a: _*), col("s_a"), col("e_a"),
        ivs("b", b: _*), col("s_b"), col("e_b"), width)
      .select(col("id_a"), col("id_b"), col("overlap"))
      .as[(Long, Long, Long)].collect().toSet

  test("overlapJoin matches the naive theta join on random intervals, any width") {
    // every 8th interval is zero-length (an instantaneous event): the
    // strict predicate pairs a point with every interval that strictly
    // contains its instant (overlap 0), and the naive join is the oracle
    val rnd = new scala.util.Random(7)
    val a = Seq.tabulate(120) { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, s, if (i % 8 == 0) s else s + 1 + rnd.nextInt(400))
    }
    val b = Seq.tabulate(150) { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, s, if (i % 8 == 0) s else s + 1 + rnd.nextInt(400))
    }
    val naive = (for {
      (ia, sa, ea) <- a; (ib, sb, eb) <- b
      if sa < eb && sb < ea
    } yield (ia, ib, math.min(ea, eb) - math.max(sa, sb))).toSet
    // widths straddling the interval-length scale: pairs spanning many
    // buckets must still come out exactly once (the greatest-start
    // bucket dedup), tiny widths must not drop boundary pairs
    for (w <- Seq(7L, 100L, 1000L, 100000L))
      pairs(a, b, w) shouldBe naive
  }

  test("touching intervals never pair; points pair only strictly inside; containment counts once") {
    // [0,10) and [10,20) touch but half-open ⇒ no overlap; the point
    // [10,10] sits ON b9's start and a1's end (strict ⇒ no pair on
    // either side) but strictly inside a3 ⇒ pairs with overlap 0 when
    // it appears on the b side; two coincident points never pair
    val a = Seq((1L, 0L, 10L), (2L, 10L, 10L), (3L, 0L, 100L))
    val b = Seq((9L, 10L, 20L), (8L, 40L, 60L), (7L, 10L, 10L), (6L, 50L, 50L))
    pairs(a, b, 16L) shouldBe Set(
      (3L, 9L, 10L), (3L, 8L, 20L),
      (3L, 7L, 0L), // point strictly inside [0,100), same bucket as its start
      (3L, 6L, 0L)) // point strictly inside, a different bucket
  }

  test("bucketWidth must be positive") {
    an[IllegalArgumentException] should be thrownBy
      Intervals.overlapJoin(ivs("a", (1L, 0L, 1L)), col("s_a"), col("e_a"),
        ivs("b", (2L, 0L, 1L)), col("s_b"), col("e_b"), 0L)
  }
}
