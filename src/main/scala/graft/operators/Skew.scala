package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback for when AQE's
  * skew-join splitting can't help (aggregation hot keys, joins below
  * AQE's skew thresholds, or deliberate two-phase aggregation).
  *
  * At 100 TB a single hot key (one country, one null-ish default, one
  * viral document) can pin an entire reducer; salting fans the hot key
  * out over `salts` reducers at the cost of a second (tiny) combine.
  */
object Skew {

  /** Deterministic row salt in [0, salts): derived from a stable row id,
    * NOT from the group key (same-key rows must spread).
    */
  private def rowSalt(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Two-phase salted aggregation: sum/count-shaped aggregates over a
    * skewed key. Phase 1 shuffles on (key, salt) — the hot key spreads
    * over `salts` reducers; phase 2 combines the `salts` partials per key
    * (tiny shuffle).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    df.withColumn("_salt", rowSalt(salts))
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n"))

  /** Salted equi-join of a skewed big side against a small side: the big
    * side gets a row salt, the small side is replicated `salts` times, and
    * the join key becomes (key, salt) — the hot key's rows land on
    * `salts` different reducers. Exact same rows as the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    val b = big.withColumn("_salt", rowSalt(salts))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    b.join(s, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
