package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e"))
    .toDF("k", "v")

  test("applyChanges: update, delete, insert, last-wins, passthrough") {
    val changes = Seq(
      (1L, "a2", 1L, "U"),                     // update
      (2L, "ignored", 1L, "D"),                // delete
      (4L, "d", 1L, "U"),                      // insert (key not in base)
      (3L, "c2", 1L, "U"), (3L, "c3", 2L, "U") // two changes: highest seq wins
    ).toDF("k", "v", "_seq", "_op")
    val got = Cdc.applyChanges(base, changes, "k", "_seq", "_op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    // key 5 passes through untouched; key 2 deleted; key 3 last-wins
    got shouldBe Seq((1L, "a2"), (3L, "c3"), (4L, "d"), (5L, "e"))
  }

  test("applyChanges: delete then higher-seq upsert resurrects the key") {
    val changes = Seq((1L, "gone", 1L, "D"), (1L, "back", 2L, "U"))
      .toDF("k", "v", "_seq", "_op")
    val got = Cdc.applyChanges(base, changes, "k", "_seq", "_op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    got shouldBe Seq((1L, "back"), (2L, "b"), (3L, "c"), (5L, "e"))
  }

  test("applyChanges rejects a base that already carries the seq/op columns") {
    val bad = base.withColumn("_seq", lit(0L))
    an[IllegalArgumentException] should be thrownBy
      Cdc.applyChanges(bad, base.withColumn("_seq", lit(1L)).withColumn("_op", lit("U")),
        "k", "_seq", "_op")
  }

  test("applyChanges output schema equals the base schema") {
    val changes = Seq((1L, "a2", 1L, "U")).toDF("k", "v", "_seq", "_op")
    Cdc.applyChanges(base, changes, "k", "_seq", "_op")
      .columns.toSeq shouldBe Seq("k", "v")
  }

  test("scdHistory: versions close at the next seq; trailing delete leaves no current") {
    val log = Seq(
      (1L, "a1", 0L, "U"), (1L, "a2", 3L, "U"),            // k1: two versions
      (2L, "b1", 0L, "U"), (2L, "b-gone", 5L, "D"),        // k2: deleted
      (3L, "c1", 7L, "U"))                                 // k3: single open version
      .toDF("k", "v", "_seq", "_op")
    val got = Cdc.scdHistory(log, "k", "_seq", "_op")
      .select("k", "v", "_seq", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    got shouldBe Set(
      (1L, "a1", 0L, Some(3L), 0L),
      (1L, "a2", 3L, None, 1L),
      (2L, "b1", 0L, Some(5L), 0L),
      (2L, "b-gone", 5L, None, 0L), // tombstone: open but NOT current
      (3L, "c1", 7L, None, 1L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "Y"), (4L, "w")).toDF("k", "v")
    val got = Cdc.snapshotDiff(a, b, "k", Seq("v"))
      .as[(Long, String)].collect().toMap
    got shouldBe Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added")
  }
}
