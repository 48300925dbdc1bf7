package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the data-quality sweep every ingest
  * pipeline runs before training: row/null/exact-distinct counts and
  * min/max per column, one output row per profiled column.
  *
  * Scale shape: one aggregation PER COLUMN rather than one wide pass —
  * each pass's parquet scan then prunes to that single column
  * (`ReadSchema` carries one field), and its exact `count(DISTINCT)`
  * shuffles only that column's values; a single multi-distinct pass
  * would Expand every row ×|cols| and read all columns in one scan.
  * The result union is |cols| one-row plans — driver-cheap. For the
  * approximate variant at extreme cardinalities swap
  * `approx_count_distinct` (HLL++) in via `exact = false`.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          (if (exact) count_distinct(col(c))
           else approx_count_distinct(col(c))).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_.unionAll(_))
  }

  /** Pre-flight join-explosion advisor: reduce both sides to per-key
    * COUNT dimensions (the shuffle carries (key, long), never rows),
    * full-outer-join the dimensions, and report exactly what the real
    * join would do — matched/only-left/only-right key counts, the
    * EXACT output cardinality Σ c_l·c_r, and the hottest key's fan-out
    * (the salting decision input). Two count-aggregates instead of one
    * melted cluster; the sum accumulates in decimal(38,0) so it cannot
    * overflow mid-reduction, then lands as bigint (the report's output
    * type contract — counts are long everywhere else in the engine).
    */
  def joinCardinality(left: DataFrame, leftKey: org.apache.spark.sql.Column,
                      right: DataFrame, rightKey: org.apache.spark.sql.Column): DataFrame = {
    val a = left.select(leftKey.as("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("cl"))
    val b = right.select(rightKey.as("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("cr"))
    a.join(b, Seq("k"), "full_outer")
      .agg(
        sum(when(col("cl").isNotNull && col("cr").isNotNull, 1L)
          .otherwise(0L)).as("n_keys_both"),
        sum(when(col("cr").isNull, 1L).otherwise(0L)).as("n_keys_left_only"),
        sum(when(col("cl").isNull, 1L).otherwise(0L)).as("n_keys_right_only"),
        coalesce(sum((col("cl") * col("cr")).cast("decimal(38,0)")), lit(0))
          .cast("long").as("est_output_rows"),
        coalesce(max(col("cl") * col("cr")), lit(0L)).as("max_key_fanout"))
  }

  /** Schema-drift report between two snapshots of "the same" table:
    * one row per column that was added, removed, or changed type —
    * the metadata complement of [[graft.operators.Cdc.snapshotDiff]]'s
    * row-level diff. Pure driver-side schema comparison (no data
    * touched); emitted as a DataFrame so drift gates compose with the
    * rest of the reporting pipeline.
    */
  def schemaDiff(old: DataFrame, curr: DataFrame): DataFrame = {
    val spark = old.sparkSession
    import spark.implicits._
    val a = old.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val b = curr.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      (b.keySet -- a.keySet).toSeq.sorted.map(c => ("added", c, "", b(c))) ++
      (a.keySet -- b.keySet).toSeq.sorted.map(c => ("removed", c, a(c), "")) ++
      (a.keySet & b.keySet).toSeq.sorted.collect {
        case c if a(c) != b(c) => ("type_changed", c, a(c), b(c))
      }
    rows.toDF("change", "col_name", "old_type", "new_type")
  }

  /** Declarative data-quality constraint suite (the Deequ/great-
    * expectations shape): one report row per check with its exact
    * violation count. Row-local checks (not-null, range, regex) fold
    * into a SINGLE conditional-count aggregate — one scan however many
    * checks; each uniqueness check is its own key-shuffled count (rows
    * whose key occurs more than once); each referential check is a
    * broadcast/hash anti-join count of orphans. Output is the bounded
    * per-check dimension — the gate a pipeline asserts on before
    * shipping a snapshot downstream.
    *
    * `range` bounds are inclusive; `pattern` counts rows NOT fully
    * matching the anchored regex (nulls excluded — not-null is its own
    * check).
    */
  def checkConstraints(df: DataFrame,
                       notNull: Seq[String] = Nil,
                       range: Seq[(String, Double, Double)] = Nil,
                       pattern: Seq[(String, String)] = Nil,
                       unique: Seq[String] = Nil,
                       foreignKey: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    require(notNull.nonEmpty || range.nonEmpty || pattern.nonEmpty ||
      unique.nonEmpty || foreignKey.nonEmpty, "no constraints given")
    // one pass for every row-local check
    val rowLocal: Seq[(String, String, org.apache.spark.sql.Column)] =
      notNull.map(c => ("not_null", c,
        sum(when(col(c).isNull, 1L).otherwise(0L)))) ++
      range.map { case (c, lo, hi) => ("range", c,
        sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L))) } ++
      pattern.map { case (c, re) => ("pattern", c,
        sum(when(col(c).isNotNull && !regexp_like(col(c), lit(re)), 1L)
          .otherwise(0L))) }
    val rowLocalReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val agg = df.agg(rowLocal.head._3.as("_c0"),
          rowLocal.tail.zipWithIndex.map { case ((_, _, e), i) =>
            e.as(s"_c${i + 1}") }: _*)
        Some(rowLocal.zipWithIndex.map { case ((check, c, _), i) =>
          agg.select(lit(check).as("check"), lit(c).as("col_name"),
            coalesce(col(s"_c$i"), lit(0L)).cast("long").as("n_violations"))
        }.reduce(_.unionAll(_)))
      }
    val uniqueReports = unique.map { c =>
      df.select(col(c).as("_k")).groupBy(col("_k"))
        .agg(count(lit(1)).as("_n")).where(col("_n") > 1)
        .agg(coalesce(sum(col("_n")), lit(0L)).as("_v"))
        .select(lit("unique").as("check"), lit(c).as("col_name"),
          col("_v").cast("long").as("n_violations"))
    }
    val fkReports = foreignKey.map { case (c, dim, dimCol) =>
      df.select(col(c).as("_k")).where(col("_k").isNotNull)
        .join(dim.select(col(dimCol).as("_k")).distinct(), Seq("_k"),
          "left_anti")
        .agg(count(lit(1)).as("_v"))
        .select(lit("foreign_key").as("check"),
          lit(s"$c->$dimCol").as("col_name"),
          col("_v").cast("long").as("n_violations"))
    }
    (rowLocalReport.toSeq ++ uniqueReports ++ fkReports)
      .reduce(_.unionAll(_))
      .select(col("check"), col("col_name"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }
}
