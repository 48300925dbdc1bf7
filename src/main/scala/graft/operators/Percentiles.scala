package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (quantile_cont semantics) via a
  * rank-based single sort pass: each row contributes
  * (1−frac)·v at rank ⌊(n−1)p⌋ and frac·v at rank ⌈(n−1)p⌉, summed per
  * group. One shuffle (the window sort); all percentiles share the pass.
  *
  * Spark's builtin exact `percentile` aggregates a value→count map per
  * group and sorts it in the final step — a memory hotspot when values
  * are near-distinct (prices). The rank-based form rides the ordinary
  * sort machinery (spillable, AQE-sized) instead.
  *
  * Measured at sf0.1/local[4]: builtin 1.96 s vs rank-based 2.83 s for
  * two percentiles over DIFFERENT columns (each column needs its own
  * sort pass + a join). The builtin stays in the declared query; this
  * operator is the right tool when group cardinality is huge relative
  * to executor memory (the map-per-group form OOMs, sorts spill) or when
  * several percentiles share one value column.
  */
object Percentiles {

  /** @param ps (output column name, percentile in [0,1]) pairs */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
            ps: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("_rn", row_number().over(w).cast("long") - 1)
      .withColumn("_n", count(lit(1)).over(wAll))
    val aggs = ps.map { case (name, p) =>
      val target = (col("_n") - 1) * p
      val lo = floor(target)
      val hi = ceil(target)
      val frac = target - lo
      sum(
        when(col("_rn") === lo && col("_rn") === hi, col(valueCol))
          .when(col("_rn") === lo, col(valueCol) * (lit(1.0) - frac))
          .when(col("_rn") === hi, col(valueCol) * frac)
          .otherwise(lit(0.0))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
