package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // Two clearly separated clusters around e1 and e2.
  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.95f, 0.05f)),
    (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.1f, 0.9f)), (5L, Seq(0.05f, 0.95f))
  ).toDF("vec_id", "embedding")

  test("CentroidAgg: elementwise mean via typed Aggregator UDAF") {
    val got = vecs.where(col("vec_id") >= 3L)
      .agg(Ivf.centroid(col("embedding")).as("c"))
      .as[Seq[Float]].head()
    got(0) shouldBe 0.05f +- 1e-6f
    got(1) shouldBe 0.95f +- 1e-6f
  }

  test("build: Lloyd iteration assigns the two clusters correctly") {
    val (assignments, centroids) = Ivf.build(vecs, "vec_id", "embedding", numCentroids = 2)
    val byCluster = assignments.select("vec_id", "cluster_id")
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    byCluster.values.toSet shouldBe Set(Set(0L, 1L, 2L), Set(3L, 4L, 5L))
    centroids.count() shouldBe 2
  }

  test("topK: finds in-cluster neighbours") {
    val queries = vecs.where(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val got = Ivf.topK(vecs, "vec_id", "embedding", queries, "query_id", "qv",
        k = 2, numCentroids = 2, nprobe = 1)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    got.map(_._1).toSet shouldBe Set(1L, 2L) // same-cluster vectors only
  }

  test("build/topK accept array<double> vector columns") {
    // the kernel expressions advertise float|double; the driver-side
    // centroid collect must not assume Seq[Float]
    val dvecs = vecs.withColumn("embedding", col("embedding").cast("array<double>"))
    val queries = dvecs.where(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val got = Ivf.topK(dvecs, "vec_id", "embedding", queries, "query_id", "qv",
        k = 2, numCentroids = 2, nprobe = 1)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    got.map(_._1).toSet shouldBe Set(1L, 2L)
  }
}
