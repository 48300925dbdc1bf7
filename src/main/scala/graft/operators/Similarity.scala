package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an `array<float>` embedding column.
  *
  * Two execution paths, both shuffle-lean:
  *   - [[bruteForceTopK]]: broadcast the (small) query set, compute cosine
  *     per (row × query) inside codegen, keep top-k per query with a
  *     TakeOrdered-style window. Exact; the 100 TB baseline when the query
  *     set is bounded (the corpus is never shuffled, only scanned).
  *   - [[lshTopK]]: random-hyperplane (sign) LSH — bucket rows by an
  *     h-bit signature, join queries to their own bucket only, rank
  *     within bucket. Approximate; turns the row×query product into a
  *     per-bucket product, the scale path when queries are many.
  *
  * All arithmetic is double-precision over `transform`-cast arrays using
  * built-in higher-order functions (`zip_with` + `aggregate`) — no UDFs.
  */
object Similarity {

  /** Elementwise cast to double (floats upcast exactly). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Native kernel (graft.functions.VectorKernels): one JIT loop per row,
    * bit-identical to the HOF composition dot/(‖a‖·‖b‖).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpr.cosineSim(a, b)

  /** The composed HOF form, kept as executable documentation/reference. */
  def cosineComposed(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Exact top-k neighbours per query vector.
    * `queries` must be small (it is broadcast); `corpus` can be arbitrarily
    * large. Ranking key is (rounded cosine desc, corpus id asc) so results
    * are deterministic under float reassociation.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int, roundTo: Int = 6): DataFrame = {
    val joined = corpus.join(broadcast(queries), col(idCol) =!= col(qidCol))
      .select(col(qidCol).as("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col(vecCol), col(qvecCol)), roundTo).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Per-label centroid and per-dimension variance of an embedding
    * column — the class-prototype table behind prototype classification,
    * per-class drift monitoring, and centroid seeding for bucketed
    * semantic dedup ([[Dedup.semanticNearDupPairs]]).
    *
    * Scale shape: posexplode fans each vector to d rows, but partial
    * aggregation (map-side combine) collapses every task to ≤
    * |labels|·d partial sums before the one exchange — shuffle volume
    * is dimension-table-sized regardless of corpus size. Variance is
    * the one-pass E[v²] − E[v]² form spelled identically in the DuckDB
    * oracle (values are unit-scale, so no cancellation risk).
    *
    * Returns (label, dim, mean_v, var_v), dim 1-based to match SQL
    * `generate_subscripts`.
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String,
                     roundTo: Int = 6): DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(asDouble(col(vecCol))).as(Seq("_pos", "v")))
      .select(col("label"), (col("_pos") + 1).cast("long").as("dim"), col("v"))
      .groupBy(col("label"), col("dim"))
      .agg(
        round(avg(col("v")), roundTo).as("mean_v"),
        round(avg(col("v") * col("v")) - avg(col("v")) * avg(col("v")),
          roundTo).as("var_v"))

  /** Deterministic pseudo-random unit-ish hyperplane component: a value in
    * [-1, 1) derived from (plane index, dimension index) via xxhash64 —
    * reproducible on every executor with zero state shipped.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** h-bit sign-LSH signature of a vector: bit p = sign(v · plane_p).
    * Native kernel (graft.functions.VectorKernels.signLsh).
    */
  def signLshSignature(vec: Column, numPlanes: Int): Column =
    graft.functions.VectorExpr.signLsh(vec, numPlanes)

  /** The composed HOF form, kept as executable documentation/reference. */
  def signLshSignatureComposed(vec: Column, numPlanes: Int): Column = {
    val vd = asDouble(vec)
    (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1), (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact re-rank of an ANN shortlist — the production two-stage shape
    * (FAISS-style): a cheap approximate stage (ADC / LSH / IVF) keeps
    * c·k candidates per query, then the exact cosine runs ONLY on the
    * survivors. `shortlist` is (query_id, neighbor_id) from any
    * candidate source; corpus vectors rejoin BY ID (one hash join whose
    * probe side is the shortlist — orders of magnitude smaller than the
    * corpus), the query set broadcasts. With a full-coverage shortlist
    * this equals [[bruteForceTopK]] EXACTLY (same rounded-cosine
    * tie-break ranking key) — asserted in PqSpec; at production nprobe
    * the re-rank repairs ADC quantization error at shortlist cost.
    */
  def rerankExact(shortlist: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, queries: DataFrame, qidCol: String,
                  qvecCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    shortlist.select(col("query_id"), col("neighbor_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col(qidCol).as("query_id"),
        col(qvecCol).as("_qv"))), Seq("query_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_cv"), col("_qv")), roundTo).as("cos_sim"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Approximate top-k: candidates = same-signature bucket, ranked by
    * exact cosine within the bucket. Shuffles only (signature, id, vec) —
    * and the join key is a long, so AQE can handle bucket skew.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, numPlanes: Int = 12, roundTo: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      signLshSignature(col(vecCol), numPlanes).as("_sig"))
    val q = queries.select(col(qidCol).as("query_id"), col(qvecCol).as("_qv"),
      signLshSignature(col(qvecCol), numPlanes).as("_sig"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    c.join(q, Seq("_sig")).where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_cv"), col("_qv")), roundTo).as("cos_sim"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
