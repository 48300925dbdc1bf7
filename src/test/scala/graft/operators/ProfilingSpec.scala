package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 1.5), (2L, Some("b"), 2.5), (3L, None, 1.5), (4L, Some("a"), 0.5)
  ).toDF("id", "s", "v")

  test("profile: exact per-column stats, one row per column, min/max as strings") {
    val got = Profiling.profile(df, Seq("id", "s", "v")).orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    got shouldBe Array(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b"), // nulls excluded from distinct and min/max
      ("v", 4L, 0L, 3L, "0.5", "2.5"))
  }

  test("profile exact=false swaps HLL++ distinct; other stats unchanged") {
    val big = spark.range(10000L).select(col("id"), (col("id") % 97).as("m"))
    val approx = Profiling.profile(big, Seq("m"), exact = false)
      .as[(String, Long, Long, Long, String, String)].head()
    approx._2 shouldBe 10000L
    // HLL++ default rsd 5%: 97 distinct must land well inside
    approx._4.toDouble shouldBe 97.0 +- 10.0
    approx._5 shouldBe "0"
    approx._6 shouldBe "96"
  }

  test("joinCardinality: exact output rows, key overlap classes, hottest fan-out") {
    import spark.implicits._
    // left keys: 1×3 rows, 2×1, 3×2; right keys: 1×2, 3×1, 9×4 —
    // so 1 and 3 match, 2 is left-only, 9 is right-only
    val left = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    val right = Seq(1, 1, 3, 9, 9, 9, 9).toDF("k")
    val r = Profiling.joinCardinality(left, col("k"), right, col("k")).head()
    r.getLong(0) shouldBe 2L            // keys 1 and 3 on both sides
    r.getLong(1) shouldBe 1L            // key 2
    r.getLong(2) shouldBe 1L            // key 9
    r.getLong(3) shouldBe (3L * 2 + 2L * 1) // 1:6 + 3:2
    r.getLong(4) shouldBe 6L            // key 1: 3×2
    // ground truth: the actual join
    left.join(right, "k").count() shouldBe 8L
  }

  test("schemaDiff reports added, removed, and type-changed columns") {
    import spark.implicits._
    val old = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val curr = Seq((1L, 1, true)).toDF("id", "score", "flag")
    val got = Profiling.schemaDiff(old, curr)
      .as[(String, String, String, String)].collect().toSet
    got shouldBe Set(
      ("added", "flag", "", "boolean"),
      ("removed", "name", "string", ""),
      ("type_changed", "score", "double", "int"))
    Profiling.schemaDiff(old, old).count() shouldBe 0L
  }

  test("checkConstraints: every check class counts its violations exactly") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), 5.0, "A"),
      (Some(1L), 99.0, "A"),   // dup id, range violation
      (None, 10.0, "A"),       // null id
      (Some(3L), 20.0, "zz"))  // pattern violation, id 3 not in dim
      .toDF("id", "v", "flag")
    val dim = Seq(1L, 2L).toDF("k")
    val got = Profiling.checkConstraints(df,
        notNull = Seq("id"),
        range = Seq(("v", 0.0, 50.0)),
        pattern = Seq(("flag", "^[A-Z]$")),
        unique = Seq("id"),
        foreignKey = Seq(("id", dim, "k")))
      .orderBy("check", "col_name")
      .as[(String, String, Long, Boolean)].collect()
    got shouldBe Array(
      ("foreign_key", "id->k", 1L, false), // id 3 orphan (null excluded)
      ("not_null", "id", 1L, false),
      ("pattern", "flag", 1L, false),
      ("range", "v", 1L, false),
      ("unique", "id", 2L, false))         // both rows of the dup key
  }

  test("checkConstraints: a clean table passes every check") {
    import spark.implicits._
    val df = Seq((1L, 5.0, "A"), (2L, 6.0, "R")).toDF("id", "v", "flag")
    val dim = Seq(1L, 2L).toDF("k")
    val got = Profiling.checkConstraints(df,
        notNull = Seq("id"), range = Seq(("v", 0.0, 50.0)),
        pattern = Seq(("flag", "^[A-Z]$")), unique = Seq("id"),
        foreignKey = Seq(("id", dim, "k")))
      .as[(String, String, Long, Boolean)].collect()
    got.length shouldBe 5
    all(got.map(_._3).toSeq) shouldBe 0L
    all(got.map(_._4).toSeq) shouldBe true
  }
}
