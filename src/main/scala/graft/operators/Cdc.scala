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

  /** SCD Type-2 version history from a changelog: every change row
    * becomes a version record with `valid_to` = the key's next change
    * sequence (null ⇒ open) and `is_current` = open AND an upsert
    * (a trailing 'D' leaves the key with no current version — the
    * tombstone row remains visible with its own sequence). One
    * key-partitioned lead window bounded by versions-per-key; no join.
    * Sequences must be unique per key — ties make `valid_to`
    * nondeterministic, the same contract as [[applyChanges]].
    */
  def scdHistory(changes: DataFrame, keyCol: String, seqCol: String,
                 opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current",
        (col("valid_to").isNull && col(opCol) === "U").cast("long"))
  }

  /** Classify every key across two snapshots of the same schema:
    * `added` (only in `b`), `removed` (only in `a`), `changed` (both,
    * payload differs), `unchanged`. One full-outer join on the key;
    * payloads compare as structs so the operator is schema-generic.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    val l = a.select(col(keyCol).as("_k"),
      struct(compareCols.map(col): _*).as("_pa"))
    val r = b.select(col(keyCol).as("_k"),
      struct(compareCols.map(col): _*).as("_pb"))
    l.join(r, Seq("_k"), "full_outer")
      .select(col("_k").as("key"),
        when(col("_pa").isNull, "added")
          .when(col("_pb").isNull, "removed")
          .when(col("_pa") === col("_pb"), "unchanged")
          .otherwise("changed").as("change"))
  }

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
