package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Reference semantics under test: geonames.js:180–182, 243–245 (R.whereEq
  * templates under R.any, with the extra-URI disjunct inside the closure).
  */
class TemplateFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    ("R", "F", 1L), ("R", "O", 2L), ("A", "F", 3L), ("N", "O", 4L))
    .toDF("flag", "status", "id")

  test("whereEq is a conjunction over all template keys") {
    val got = rows.where(TemplateFilters.whereEq(Map("flag" -> "R", "status" -> "F")))
      .select("id").as[Long].collect().sorted
    got shouldBe Array(1L)
  }

  test("empty whereEq template passes everything (Ramda whereEq({}))") {
    rows.where(TemplateFilters.whereEq(Map.empty)).count() shouldBe 4
  }

  test("anyTemplate is a disjunction of templates") {
    val got = rows.where(TemplateFilters.anyTemplate(Seq(
        Map("flag" -> "R", "status" -> "F"), Map("flag" -> "A"))))
      .select("id").as[Long].collect().sorted
    got shouldBe Array(1L, 3L)
  }

  test("empty filter list passes NOTHING — reference edge (SURVEY §1.4.3)") {
    rows.where(TemplateFilters.anyTemplate(Seq.empty)).count() shouldBe 0
  }

  test("anyTemplateOrIds: whitelist only rescues rows when filters exist") {
    // with a template: whitelist id 4 passes even though no template matches
    rows.where(TemplateFilters.anyTemplateOrIds(
        Seq(Map("flag" -> "R", "status" -> "F")), col("id"), Seq(4L)))
      .select("id").as[Long].collect().sorted shouldBe Array(1L, 4L)
    // empty filters: nothing passes, not even whitelisted ids
    rows.where(TemplateFilters.anyTemplateOrIds(Seq.empty, col("id"), Seq(4L)))
      .count() shouldBe 0
  }
}
