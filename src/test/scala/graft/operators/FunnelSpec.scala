package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("event_type"))

  private val steps = Seq(
    Funnel.Step("view"),
    Funnel.Step("click", Some(3600L)),
    Funnel.Step("purchase", Some(3600L)))

  test("funnel counts first-touch conversions per step") {
    val events = ev(
      // u1 converts fully: view 10:00, click 10:30, purchase 11:00
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"),
      (1L, "2024-01-01 11:00:00", "purchase"),
      // u2 views and clicks, never purchases
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:10:00", "click"),
      // u3 clicks WITHOUT a prior view — must not count past step 1
      (3L, "2024-01-01 08:00:00", "click"),
      (3L, "2024-01-01 08:30:00", "purchase"))
    val got = Funnel.funnel(events, "user_id", "ts", "event_type", steps)
      .orderBy("step").as[(Int, String, Long)].collect()
    got shouldBe Array((1, "view", 2L), (2, "click", 2L), (3, "purchase", 1L))
  }

  test("transitions counts per-user consecutive pairs under the (ts, tie) order") {
    val events = Seq(
      // u1: view -> click -> view  (ties broken by the id column)
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 10:05:00", "click", 2L),
      (1L, "2024-01-01 10:05:00", "view", 3L), // same ts as id=2: id orders it after
      // u2: a single event — no transition
      (2L, "2024-01-01 09:00:00", "view", 4L))
      .toDF("user_id", "ts_s", "event_type", "event_id")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), col("event_id"))
    val got = Funnel.transitions(events, "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long)].collect().toSet
    got shouldBe Set(("view", "click", 1L), ("click", "view", 1L))
  }

  test("funnel enforces strict order and the max-gap bound") {
    val events = ev(
      // u1: click BEFORE view — not a conversion
      (1L, "2024-01-01 10:00:00", "click"),
      (1L, "2024-01-01 11:00:00", "view"),
      // u2: click 2h after view — outside the 1h gap
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 12:00:00", "click"),
      // u3: click exactly at the 1h bound (inclusive)
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 11:00:00", "click"))
    val got = Funnel.funnel(events, "user_id", "ts", "event_type", steps)
      .orderBy("step").as[(Int, String, Long)].collect()
    got shouldBe Array((1, "view", 3L), (2, "click", 1L), (3, "purchase", 0L))
  }

  test("funnel ignores null timestamps and unknown event types") {
    val events = Seq(
      (1L, Some("2024-01-01 10:00:00"), "view"),
      (1L, None, "click"),                        // null ts: not a conversion
      (1L, Some("2024-01-01 10:30:00"), "hover"), // unknown type: ignored
      (1L, Some("2024-01-01 10:40:00"), "click"))
      .toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("event_type"))
    val got = Funnel.funnel(events, "user_id", "ts", "event_type", steps)
      .orderBy("step").as[(Int, String, Long)].collect()
    got shouldBe Array((1, "view", 1L), (2, "click", 1L), (3, "purchase", 0L))
  }

  test("funnel measures gaps from the FIRST qualifying touch, not any touch") {
    // u1's first view is 10:00; the 11:30 click is within 1h of the
    // SECOND view (11:00) but outside 1h of the first → first-touch
    // semantics must not count it
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "view"),
      (1L, "2024-01-01 11:30:00", "click"))
    val got = Funnel.funnel(events, "user_id", "ts", "event_type", steps)
      .orderBy("step").as[(Int, String, Long)].collect()
    got shouldBe Array((1, "view", 1L), (2, "click", 0L), (3, "purchase", 0L))
  }

  test("retention: weekly cohorts re-counted in later active weeks; repeats dedup") {
    // weeks (bucket 604800 s from epoch): 2024-01-01..03 is one week,
    // 2024-01-08 the next, 2024-01-15 the one after
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"), // u1 cohort W, active W, W+1, W+2
      (1L, "2024-01-08 10:00:00", "view"),
      (1L, "2024-01-15 10:00:00", "view"),
      (2L, "2024-01-02 10:00:00", "view"), // u2 cohort W, returns W+2 only
      (2L, "2024-01-02 11:00:00", "view"), // same-week repeat: dedup'd
      (2L, "2024-01-16 10:00:00", "view"),
      (3L, "2024-01-09 10:00:00", "view")) // u3 cohort W+1, never returns
    val got = Funnel.retention(events, "user_id", "ts")
      .orderBy("cohort", "week_offset")
      .as[(Long, Long, Long)].collect()
    val w = got.head._1
    got shouldBe Array(
      (w, 0L, 2L), (w, 1L, 1L), (w, 2L, 2L),
      (w + 1, 0L, 1L))
  }

  test("landmarkSteps: greedy first-match positions, strict after-ordering") {
    val events = Seq(
      // u1: signup(1) view(2) click(3) purchase(4) → completes at 4
      (1L, "2024-01-01 10:00:00", 1L, "signup"),
      (1L, "2024-01-01 10:01:00", 2L, "view"),
      (1L, "2024-01-01 10:02:00", 3L, "click"),
      (1L, "2024-01-01 10:03:00", 4L, "purchase"),
      // u2: click BEFORE signup, none after → no completion
      (2L, "2024-01-01 10:00:00", 5L, "click"),
      (2L, "2024-01-01 10:01:00", 6L, "signup"),
      (2L, "2024-01-01 10:02:00", 7L, "purchase"),
      // u3: signup click purchase all same-type reuse NOT allowed:
      // signup(1) signup(2) click(3) purchase(4) → completes at 4
      (3L, "2024-01-01 10:00:00", 8L, "signup"),
      (3L, "2024-01-01 10:01:00", 9L, "signup"),
      (3L, "2024-01-01 10:02:00", 10L, "click"),
      (3L, "2024-01-01 10:03:00", 11L, "purchase"))
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Funnel.landmarkSteps(events, "user_id", "ts", "event_type",
        "event_id", Seq("signup", "click", "purchase"))
      .orderBy("user_id").as[(Long, Long)].collect()
    got shouldBe Array((1L, 4L), (3L, 4L))
  }

  test("sequenceMatch: regex over the time-ordered journey, order matters") {
    val events = Seq(
      // u1: signup → view → purchase (matches signup.*purchase)
      (1L, "2024-01-01 10:00:00", 1L, "signup"),
      (1L, "2024-01-01 11:00:00", 2L, "view"),
      (1L, "2024-01-01 12:00:00", 3L, "purchase"),
      // u2: purchase BEFORE signup — must not match
      (2L, "2024-01-01 10:00:00", 4L, "purchase"),
      (2L, "2024-01-01 11:00:00", 5L, "signup"),
      // u3: signup only
      (3L, "2024-01-01 10:00:00", 6L, "signup"))
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Funnel.sequenceMatch(events, "user_id", "ts", "event_type",
        "event_id", "signup.*purchase")
      .as[(Long, Long)].collect()
    got shouldBe Array((1L, 3L))
  }

  test("sequenceMatch: same-timestamp events ordered by the tie column") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 2L, "purchase"), // tie: id 2 AFTER id 1
      (1L, "2024-01-01 10:00:00", 1L, "signup"))
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    Funnel.sequenceMatch(events, "user_id", "ts", "event_type",
        "event_id", "^signup purchase$")
      .as[(Long, Long)].collect() shouldBe Array((1L, 2L))
  }
}
