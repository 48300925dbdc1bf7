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
}
