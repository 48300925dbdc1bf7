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

  test("inverted intervals (end < start) are dropped, never emitted with negative overlap") {
    // the malformed row [5,2) would pass the strict predicate against a
    // containing interval ([0,10): 5 < 10 ∧ 0 < 2) if it reached the
    // join; the contract drops it on both sides before stamping
    val good = Seq((1L, 0L, 10L))
    val bad = Seq((9L, 5L, 2L), (8L, 3L, 7L))
    pairs(good, bad, 4L) shouldBe Set((1L, 8L, 4L))
    pairs(bad, good, 4L) shouldBe Set((8L, 1L, 4L))
    for ((_, _, ov) <- pairs(bad, bad, 4L) ++ pairs(good, bad, 16L))
      ov should be >= 0L
  }

  // Seeded interval generator shared by the merge/concurrency property
  // sweeps: mixes zero-length rows, touching chains (next start == prev
  // end — the boundary that separates "merge" from "overlap" semantics),
  // and random spans, across a handful of keys.
  private def seededIntervals(seed: Int, n: Int): Seq[(String, Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val free = Seq.tabulate(n) { i =>
      val s = rnd.nextInt(2000).toLong
      val len = rnd.nextInt(8) match {
        case 0 | 1 => 0L // zero-length (instantaneous)
        case _ => 1L + rnd.nextInt(150)
      }
      (s"k${rnd.nextInt(4)}", i.toLong, s, s + len)
    }
    // touching chains: s_{j+1} == e_j islands, with a zero-length row
    // sitting exactly ON a boundary instant
    val chains = (0 until 6).flatMap { c =>
      val k = s"k${c % 4}"
      var t = rnd.nextInt(2000).toLong
      val links = (0 until 4).map { j =>
        val len = if (j == 2) 0L else 1L + rnd.nextInt(40)
        val row = (k, 10000L + c * 100 + j, t, t + len)
        t += len
        row
      }
      links :+ ((k, 10000L + c * 100 + 99, links(1)._4, links(1)._4))
    }
    free ++ chains
  }

  test("mergeIntervals matches the naive per-key merge on seeded zero-length + touching islands") {
    for (seed <- Seq(3, 17, 101)) {
      val rows = seededIntervals(seed, 250)
      val got = Timeseries.mergeIntervals(
          rows.toDF("k", "tie", "s", "e"), "k", col("s"), col("e"), col("tie"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      // naive oracle: per key, sort by (s, tie); extend the island while
      // s <= running max end (touching merges), else open a new one
      val naive = rows.groupBy(_._1).flatMap { case (k, rs) =>
        var island = 0L
        var end = Long.MinValue
        val acc = scala.collection.mutable.Map
          .empty[Long, (Long, Long, Long)] // island -> (start, end, n)
        for ((_, _, s, e) <- rs.sortBy(r => (r._3, r._2))) {
          if (acc.isEmpty || s > end) { island += 1; acc(island) = (s, e, 1L) }
          else {
            val (s0, e0, n0) = acc(island)
            acc(island) = (s0, math.max(e0, e), n0 + 1)
          }
          end = math.max(end, e)
        }
        acc.map { case (i, (s0, e0, n0)) => (k, i, s0, e0, n0) }
      }.toSet
      withClue(s"seed $seed: ") { got shouldBe naive }
    }
  }

  test("maxConcurrency matches the naive sweep on seeded zero-length + touching islands, tiny blocks") {
    for (seed <- Seq(5, 23, 77)) {
      val rows = seededIntervals(seed, 250)
      // blockMicros far below the time span so the two-level block
      // rollup (offsets + within-block running sum) is exercised, not
      // just the single-block degenerate case
      val got = Timeseries.maxConcurrency(
          rows.toDF("k", "tie", "s", "e"), "k", col("s"), col("e"),
          blockMicros = 97L)
        .as[(String, Long)].collect().toMap
      // naive sweep: ±1 boundary points under the (t, delta) order
      // (−1 before +1, so touching intervals and zero-length rows never
      // raise concurrency); answer = max prefix sum, floored at 0 for
      // the all-empty key (the dip of a lone zero-length interval)
      val naive = rows.groupBy(_._1).map { case (k, rs) =>
        val pts = rs.flatMap { case (_, _, s, e) => Seq((s, 1L), (e, -1L)) }
          .sortBy(identity)
        val sums = pts.scanLeft(0L)(_ + _._2).drop(1)
        k -> sums.max
      }
      withClue(s"seed $seed: ") { got shouldBe naive }
    }
  }
}
