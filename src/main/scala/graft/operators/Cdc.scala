package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: merge a change stream (upserts + deletes)
  * into a base snapshot — the incremental-refresh primitive a training
  * corpus needs when sources re-crawl or re-license (replace a document,
  * retract a document, add new ones) without rebuilding the corpus.
  *
  * Semantics (MERGE-shaped): per key, the highest-sequence change wins;
  * a winning 'D' removes the key; keys with no change keep their base
  * row; change keys absent from the base are inserts.
  *
  * Scale shape: ONE shuffle, on the key, of base ∪ changes; the per-key
  * winner is a rank-1 window that WindowGroupLimit prunes map-side, so
  * the exchange carries at most one base row + the change rows per key —
  * there is no join at all, and the changes side (typically ≪ base) is
  * never collected or broadcast. At 100 TB with a bucketed base table,
  * the base side's exchange disappears entirely (see Layout bucketing).
  */
object Cdc {

  /** `changes` must carry the base schema plus `seqCol` (bigint, unique
    * per key — ties would make the winner nondeterministic, so they
    * throw at the caller's peril) and `opCol` ('U' upsert / 'D' delete).
    * Returns the base schema: applied snapshot.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns
    require(!payload.contains(seqCol) && !payload.contains(opCol),
      s"base must not already contain $seqCol/$opCol")
    // base rows ride as sequence -infinity upserts: any real change wins
    val b = base
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("U"))
    val rk = Iterator.from(0).map(i => s"__graft_cdc_rk_$i")
      .find(n => !payload.contains(n)).get
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    b.unionByName(changes.select(b.columns.toIndexedSeq.map(col): _*))
      .withColumn(rk, row_number().over(w))
      .where(col(rk) === 1 && col(opCol) =!= "D")
      .select(payload.toIndexedSeq.map(col): _*)
  }
}
