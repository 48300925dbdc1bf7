package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("US", 1L, 10.0), ("US", 2L, 20.0), ("DE", 3L, 30.0), ("FR", 4L, 40.0))
    .toDF("country", "id", "v")

  test("writePartitioned: directory-per-value; reads prune by partition filter") {
    val path = Files.createTempDirectory("layout").toFile.getAbsolutePath + "/t"
    Layout.writePartitioned(df, path, Seq("country"))
    new java.io.File(path).list().count(_.startsWith("country=")) shouldBe 3

    val q = Layout.readPartitioned(spark, path).where(col("country") === "US")
    q.count() shouldBe 2
    // pruning visible in the plan: partition filter present, one dir scanned
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(country")
  }

  test("writeBucketed + bucketed self-join plans with zero shuffle") {
    Layout.writeBucketed(df, "t_bucketed", "id", 4, sortCol = Some("id"))
    val t = spark.table("t_bucketed")
    // hint forces SMJ (a 4-row table would broadcast); the property under
    // test is that the SMJ needs no Exchange on either bucketed side
    val joined = t.as("a").hint("merge").join(t.as("b"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("SortMergeJoin")
    (plan should not).include("Exchange") // co-located: no shuffle on either side
    joined.count() shouldBe 4
    spark.sql("DROP TABLE t_bucketed")
  }
}
