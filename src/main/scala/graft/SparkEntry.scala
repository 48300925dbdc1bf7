package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — declared query surface (SURVEY.md §2) with DuckDB
  * oracles. Every query: deterministic ORDER BY on a key, derived integer
  * columns cast to BIGINT on both sides, float aggregates rounded, no
  * structs/maps/arrays in the output (SURVEY.md §5 rule 1).
  *
  * Declarations live in per-family objects under src/main/scala/graft/
  * entry (FamilyQueries.scala per family: relational/text/curation/
  * dedup/retrieval/graph/stats/events/multimodal) sharing fixtures via
  * [[EntryContext]]; this object merges
  * them into the single registry the driver, Verify, Bench and the spec
  * suites consume. Merging asserts name uniqueness and that every oracle
  * has a declared query, so a family edit cannot silently shadow or
  * orphan a declaration.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EntryContext.qFlagship(spark, "/root/testdata/sf0.001")

  private[graft] def langProfiles: Map[String, Seq[String]] =
    EntryContext.langProfiles

  /** See [[EntryContext.releaseDeadCheckpoints]]. */
  def releaseDeadCheckpoints(s: SparkSession): Unit =
    EntryContext.releaseDeadCheckpoints(s)

  private val families: Seq[(Seq[(String, (SparkSession, String) => DataFrame)], Seq[(String, String)])] = Seq(
    (RelationalQueries.queries, RelationalQueries.oracles),
    (TextQueries.queries, TextQueries.oracles),
    (CurationQueries.queries, CurationQueries.oracles),
    (DedupQueries.queries, DedupQueries.oracles),
    (RetrievalQueries.queries, RetrievalQueries.oracles),
    (GraphQueries.queries, GraphQueries.oracles),
    (StatsQueries.queries, StatsQueries.oracles),
    (EventsQueries.queries, EventsQueries.oracles),
    (MultimodalQueries.queries, MultimodalQueries.oracles)
  )

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = families.flatMap(_._1)
    val m = all.toMap
    require(m.size == all.size,
      s"duplicate query name across families: ${
        all.groupBy(_._1).collect { case (n, g) if g.size > 1 => n }.mkString(", ")}")
    m
  }

  lazy val oracleSql: Map[String, String] = {
    val all = families.flatMap(_._2)
    val m = all.toMap
    require(m.size == all.size,
      s"duplicate oracle name across families: ${
        all.groupBy(_._1).collect { case (n, g) if g.size > 1 => n }.mkString(", ")}")
    val orphans = m.keySet -- queries.keySet
    require(orphans.isEmpty, s"oracle without declared query: $orphans")
    m
  }
}
