package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the power-iteration
  * complement to [[Dedup.clusters]]'s label propagation. Used on the
  * similarity graphs this engine builds (k-NN, near-dup): PageRank
  * centrality picks representative documents per duplicate neighborhood
  * and surfaces hub documents in retrieval graphs.
  */
object Graphs {

  /** PageRank by power iteration (simplified model: dangling mass is not
    * redistributed — nodes without out-edges keep contributing nothing,
    * the same convention the oracle SQL uses).
    *
    * Scale shape: each iteration is ONE shuffle — contributions =
    * edges ⋈ ranks on the source key (both sides hash-partitioned by
    * vertex id; AQE coalesces), then a sum aggregate keyed by
    * destination. Ranks are re-materialized per iteration
    * (`localCheckpoint`, or reliable `checkpoint()` when `reliable`)
    * to truncate lineage — the [[Dedup.clusters]] discipline; plain
    * cache would double the analyzed plan every iteration. Node count
    * is collected once (a single long — the only driver action).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5, damping: Double = 0.85,
               reliable: Boolean = false): DataFrame = {
    require(iters >= 0, s"iters $iters")
    def mat(df: DataFrame): DataFrame =
      if (reliable) {
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
        df.checkpoint(true)
      } else df.localCheckpoint(true)
    val e = mat(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val nodes = mat(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val n = nodes.count()
    val base = (1.0 - damping) / n
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("_d"))
    val withDeg = mat(e.join(deg, Seq("src")))
    var pr = mat(nodes.select(col("id"), lit(1.0 / n).as("pr")))
    for (_ <- 0 until iters) {
      val contribs = withDeg
        .join(pr, col("src") === col("id"))
        .select(col("dst").as("id"), (col("pr") / col("_d")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("_in"))
      pr = mat(nodes.select(col("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("_in"), lit(0.0)) * damping).as("pr")))
    }
    pr
  }
}
