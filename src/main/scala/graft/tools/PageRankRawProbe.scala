package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the sf1 q_pagerank round-half finding
  * (CORRECTNESS_sf1_sample_r12.json): dumps the UNROUNDED PageRank
  * doubles over the same exact-k-NN edge fixture the declared query
  * uses, so the sample harness can compare engine vs DuckDB oracle at
  * full bit precision. If every raw double is bit-identical, the
  * declared query's hash mismatch is PURELY the two engines' round-half
  * implementations disagreeing on values that sit exactly on a 6dp
  * half-way decimal boundary (at sf1 the dangling-node base
  * (1-0.85)/20000 = 7.4999999999999993e-6: Spark's round() rounds the
  * shortest-decimal string "7.5e-6" up, DuckDB rounds the exact binary
  * down) — not an iteration/summation divergence.
  *
  *   PageRankRawProbe <sfDir> <outParquet>
  */
object PageRankRawProbe {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.read.parquet(
      graft.EntryContext.knnEdgesFixture(spark, a(0)))
    graft.operators.Graphs.pageRank(edges, "src", "dst", iters = 3)
      .select(col("id"), col("pr"))
      .write.mode("overwrite").parquet(a(1))
    spark.stop()
  }
}
