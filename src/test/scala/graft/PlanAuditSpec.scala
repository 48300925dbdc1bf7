package graft

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Whole-surface plan audit — the 100 TB no-melt gate, enumerated over
  * EVERY declared query (so a new query is audited the day it lands,
  * the WindowAuditSpec discipline): walk each query's optimized logical
  * plan at sf0.001 and flag every join that would execute as a nested
  * loop or cartesian product — a cross join, or a join whose condition
  * carries no equality conjunct (Catalyst only plans hash/sort-merge
  * joins off equi-keys).
  *
  * A flagged join is SAFE when one side is provably bounded — its
  * `maxRows` is known and tiny (a grouping-free aggregate is exactly 1
  * row; a literal band/quantile table is its literal size). Broadcasting
  * a scalar total or a 4-row band dimension against the corpus is
  * map-only at any scale. Everything else must be on the pinned
  * allowlist below with the reason it cannot explode; a new unbounded
  * nested loop anywhere else fails this spec before it can melt a
  * cluster.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Sides up to this many rows are broadcastable dimension constants —
    * far below any size where a nested loop could hurt, far above any
    * legitimate scalar/band/quantile table in the library.
    */
  private val BoundedSideRows = 10000L

  test("every nested-loop/cartesian join is scalar-bounded or pinned") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        val bad = plan.collect {
          case j: Join if isNestedLoopShaped(j) && !isBounded(j) => j
        }
        if (bad.nonEmpty) Some(name) else None
    }
    offenders.toSet shouldBe allowedUnboundedNestedLoop
  }

  /** No equality conjunct between the sides → Catalyst cannot hash- or
    * sort-merge-partition it; it plans BNLJ or a cartesian product.
    */
  private def isNestedLoopShaped(j: Join): Boolean =
    j.joinType == Cross || !j.condition.exists(c =>
      c.collect {
        case e: EqualTo => e
        case e: EqualNullSafe => e
      }.exists(eq =>
        (eq.children(0).references.subsetOf(j.left.outputSet) &&
          eq.children(1).references.subsetOf(j.right.outputSet)) ||
        (eq.children(0).references.subsetOf(j.right.outputSet) &&
          eq.children(1).references.subsetOf(j.left.outputSet))))

  private def isBounded(j: Join): Boolean =
    j.left.maxRows.exists(_ <= BoundedSideRows) ||
      j.right.maxRows.exists(_ <= BoundedSideRows)

  /** Queries sanctioned to keep a nested-loop join whose sides are
    * bounded by CONSTRUCTION but not statically visible to `maxRows`,
    * each with the reason it cannot explode at scale.
    */
  private lazy val allowedUnboundedNestedLoop: Set[String] = Set(
    // group-aggregate × group-aggregate pairs: both sides are one row
    // per event_type (a handful of groups), maxRows unknown only
    // because the aggregate HAS grouping keys. PlanSpec pins the same.
    "q_welch_ttest",
    // per-source minhash sketches paired src_a < src_b: one row per
    // corpus source — a catalog-sized dimension, never documents
    "q_source_similarity",
    // single query vector (vec_id = 0 filter, 1 row) broadcast against
    // the embedding corpus for the dense arm of the fusion
    "q_rrf_fusion",
    // query batch (5 probe vectors) × centroid table (numCentroids = 16
    // rows from the IVF build): both dimensions of the probe assignment,
    // corpus never enters the nested loop (it joins on cluster_id)
    "q_ivf_topk",
    // the FDR family IS the welch pair table: the same group-aggregate ×
    // group-aggregate g_a < g_b join, one row per event_type per side
    "q_fdr_adjust")
}
