package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000000L // micros

  private def ev(rows: (Long, String, Double)*) =
    rows.toDF("key", "ts_s", "v")
      .select(col("key"), col("ts_s").cast("timestamp").as("ts"), col("v"))

  test("resample fills gap buckets with n_events=0 and carries the last sum forward") {
    val events = ev(
      // key 1: days 0, 1, 4 observed — days 2 and 3 are gaps
      (1L, "1970-01-01 10:00:00", 1.0),
      (1L, "1970-01-02 09:00:00", 2.0),
      (1L, "1970-01-02 10:00:00", 3.0),
      (1L, "1970-01-05 23:59:59", 7.0),
      // key 2: a single day — spine is one bucket, no gaps
      (2L, "1970-01-03 00:00:00", 9.0))
    val got = Timeseries.resample(events, "key", "ts", col("v").cast("long"), DAY)
      .orderBy("key", "bucket")
      .select("key", "bucket", "n_events", "filled_sum")
      .as[(Long, Long, Long, Long)].collect()
    got shouldBe Array(
      (1L, 0L, 1L, 1L),
      (1L, 1L, 2L, 5L), // two events summed
      (1L, 2L, 0L, 5L), // gap: carried forward
      (1L, 3L, 0L, 5L), // gap: carried forward
      (1L, 4L, 1L, 7L),
      (2L, 2L, 1L, 9L))
  }

  test("resample spine is each key's own span, not a global calendar") {
    val events = ev(
      (1L, "1970-01-01 00:00:00", 1.0), // key 1 spans day 0 only
      (2L, "1970-01-09 00:00:00", 1.0), // key 2 spans days 8..10
      (2L, "1970-01-11 00:00:00", 1.0))
    val got = Timeseries.resample(events, "key", "ts", col("v").cast("long"), DAY)
    got.count() shouldBe 4L // 1 + 3, NOT 2 keys x 11 days
    got.where(col("key") === 1L).count() shouldBe 1L
  }

  test("maxConcurrency: sweep counts overlaps; touching half-open intervals do not overlap") {
    val iv = Seq(
      // key a: [0,10) [5,15) [12,20) -> peak 2 (at t=5..10 and 12..15)
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 12L, 20L),
      // key b: [0,5) [5,9) touch at 5: end sorts before start -> peak 1
      ("b", 0L, 5L), ("b", 5L, 9L),
      // key c: three nested -> peak 3
      ("c", 0L, 100L), ("c", 10L, 90L), ("c", 20L, 80L))
      .toDF("k", "t0", "t1")
    val got = Timeseries.maxConcurrency(iv, "k", col("t0"), col("t1"), blockMicros = 1000L)
      .as[(String, Long)].collect().toMap
    got shouldBe Map("a" -> 2L, "b" -> 1L, "c" -> 3L)
  }

  test("maxConcurrency: intervals crossing block boundaries carry the offset") {
    // block size 10: [0,35) spans blocks 0..3; [12,14) and [13,22) in
    // later blocks stack on top of the long-running interval
    val iv = Seq(("k", 0L, 35L), ("k", 12L, 14L), ("k", 13L, 22L))
      .toDF("k", "t0", "t1")
    val got = Timeseries.maxConcurrency(iv, "k", col("t0"), col("t1"), blockMicros = 10L)
      .as[(String, Long)].collect().toMap
    got shouldBe Map("k" -> 3L) // all three overlap at t=13
  }

  test("rollingRange sums exactly the trailing window, inclusive, with ties as peers") {
    val base = 100L * DAY
    val events = Seq(
      (1L, base, 10L),
      (1L, base + 3 * DAY, 20L),
      (1L, base + 7 * DAY, 30L),  // 7 days after first: inclusive frame keeps it
      (1L, base + 11 * DAY, 40L), // first event now outside the window
      (2L, base, 5L),
      (2L, base, 6L))             // same microsecond: peers see each other
      .toDF("key", "t_us_in", "v")
      .select(col("key"), timestamp_micros(col("t_us_in")).as("ts"), col("v"))
    val got = Timeseries.rollingRange(events, "key", "ts", col("v"), 7 * DAY)
      .orderBy("key", "t_us", "v")
      .select("key", "roll_sum", "roll_n")
      .as[(Long, Long, Long)].collect()
    got shouldBe Array(
      (1L, 10L, 1L),
      (1L, 30L, 2L),
      (1L, 60L, 3L), // 10+20+30: the 7-day-old event is inside the inclusive frame
      (1L, 70L, 2L), // 30+40: the day-3 event is 8 days back, outside
      (2L, 11L, 2L), // tie rows are peers: both see both
      (2L, 11L, 2L))
  }

  test("twap weights each value by its holding interval; last obs and single-obs keys drop") {
    // key 1: 10.0 held for 3 us, 20.0 held for 1 us, 40.0 has no
    //   successor → twap = (10·3 + 20·1) / 4 = 12.5 over 2 intervals
    // key 2: one observation → no interval → key absent
    val df = Seq(
      (1L, 100L, 1L, 10.0), (1L, 103L, 2L, 20.0), (1L, 104L, 3L, 40.0),
      (2L, 100L, 4L, 99.0))
      .toDF("key", "us", "eid", "v")
    val got = Timeseries.twap(df, "key", col("us"), col("v"), col("eid"))
      .as[(Long, Long, Double)].collect()
    got shouldBe Array((1L, 2L, 12.5))
  }

  test("twap breaks same-microsecond ties by the tie column, zero-gap rows contributing nothing") {
    // two observations in the same microsecond: the (us, tie) order
    // makes the earlier-id row's gap 0, so only the later one carries
    // weight into the next interval — twap = value held across the gap
    val df = Seq(
      (1L, 100L, 1L, 10.0), (1L, 100L, 2L, 30.0), (1L, 110L, 3L, 50.0))
      .toDF("key", "us", "eid", "v")
    val got = Timeseries.twap(df, "key", col("us"), col("v"), col("eid"))
      .as[(Long, Long, Double)].collect()
    // intervals: (10.0, gap 0) and (30.0, gap 10) → 300/10 = 30.0
    got shouldBe Array((1L, 2L, 30.0))
  }

  test("ewma: hand-computed α=0.5 weights, head rows renormalized") {
    // one key, cents 100, 200, 400 at t=1,2,3
    val df = Seq((1L, 1L, 1L, 100L), (1L, 2L, 2L, 200L), (1L, 3L, 3L, 400L))
      .toDF("k", "us", "tie", "cents")
    val got = Timeseries.ewma(df, "k", col("us"), col("tie"), col("cents"),
        alpha = 0.5, depth = 8)
      .orderBy("micros").select("ewma").as[Double].collect()
    // t1: 100/1.0; t2: (200 + 0.5*100)/1.5; t3: (400 + 0.5*200 + 0.25*100)/1.75
    got(0) shouldBe 1.0
    got(1) shouldBe BigDecimal(250.0 / 1.5 / 100.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(2) shouldBe 3.0 // 525/1.75 = 300 cents
  }

  test("ewma: depth truncation ignores lags beyond the window") {
    // depth=2: only current + one lag contribute
    val df = Seq((1L, 1L, 1L, 100L), (1L, 2L, 2L, 100L), (1L, 3L, 3L, 400L))
      .toDF("k", "us", "tie", "cents")
    val got = Timeseries.ewma(df, "k", col("us"), col("tie"), col("cents"),
        alpha = 0.5, depth = 2)
      .orderBy("micros").select("ewma").as[Double].collect()
    // t3: (400 + 0.5*100)/1.5 — the t1 value must NOT appear
    got(2) shouldBe 3.0
  }

  test("cusum: hand-computed N-scaled peak with earliest-step tie-break") {
    // key a: units 1, 1, 10 → N=3, tot=12, cum=(1,2,12),
    // S_i = 3·cum − 12·i = (−9, −18, 0) → peak |S|=18 at i=2, stat 6.0
    val df = Seq(("a", 1L, 1L, 1L), ("a", 2L, 2L, 1L), ("a", 3L, 3L, 10L))
      .toDF("g", "us", "tie", "c")
    val got = Timeseries.cusum(df, col("g"), col("us"), col("tie"), col("c"))
      .select("g", "n", "peak_stat", "peak_i", "peak_t")
      .as[(String, Long, Double, Long, Long)].collect()
    got shouldBe Array(("a", 3L, 6.0, 2L, 2L))
  }

  test("cusum: all-zero deviations tie-break to the earliest step") {
    val df = Seq(("a", 1L, 1L, 5L), ("a", 2L, 2L, 5L), ("a", 3L, 3L, 5L))
      .toDF("g", "us", "tie", "c")
    val got = Timeseries.cusum(df, col("g"), col("us"), col("tie"), col("c"))
      .select("peak_stat", "peak_i").as[(Double, Long)].collect()
    got shouldBe Array((0.0, 1L))
  }

  test("acf: alternating daily series has acf −1 at lag 1, +1 at lag 2") {
    val day = 86400000000L
    val rows = (0 until 6).map(d =>
      ("a", d * day, if (d % 2 == 0) 10L else 20L))
    val got = Timeseries.acf(rows.toDF("g", "us", "c"),
        col("g"), col("us"), col("c"), maxLag = 2)
      .select("lag", "n_pairs", "acf").as[(Int, Long, Double)]
      .collect().sortBy(_._1)
    got shouldBe Array((1, 5L, -1.0), (2, 4L, 1.0))
  }

  test("acf: gaps pair only days that exist at the lag distance") {
    val day = 86400000000L
    // days 0, 1, 3 → lag 1 pairs: (0,1); lag 2 pairs: (1,3); lag 3: (0,3)
    val rows = Seq(("a", 0L * day, 1L), ("a", 1L * day, 2L), ("a", 3L * day, 4L))
    val got = Timeseries.acf(rows.toDF("g", "us", "c"),
        col("g"), col("us"), col("c"), maxLag = 3)
      .select("lag", "n_pairs").as[(Int, Long)].collect().sortBy(_._1)
    got shouldBe Array((1, 1L), (2, 1L), (3, 1L))
  }
}
