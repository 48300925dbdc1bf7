package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-funnel analysis: how many users completed step 1, then
  * step 2 *after* step 1 (optionally within a time bound), and so on —
  * the standard product-analytics conversion query, and the shape used
  * to mine ordered interaction traces from event logs.
  *
  * Semantics (first-touch): a user's step-i time is the EARLIEST event
  * of step i's type that is strictly after their step-(i-1) time and
  * within `maxGap` of it. First-touch (min) rather than any-touch keeps
  * the result a pure aggregate — no per-user sequence reassembly.
  *
  * Scale shape: one aggregation per step over events pre-filtered to
  * that step's type (filter pushed to the scan), each joined to the
  * previous step's (user, ts) table on the user key. Every shuffle is
  * keyed by user id — co-partitioned end to end under AQE — and carries
  * (user, timestamp) pairs only, never event payloads. No windows, no
  * per-user sequence materialization.
  */
object Funnel {

  /** One funnel stage: match events of `eventType`; `maxGapSeconds`
    * bounds the gap from the previous stage (None = unbounded).
    */
  final case class Step(eventType: String, maxGapSeconds: Option[Long] = None)

  /** Per-step (user, step time) tables, step-1 first.
    *
    * The events side is projected to `_`-prefixed internal names up
    * front, so the operator stays safe for inputs that already carry a
    * `user`/`t`/`_tprev` column (or where `userCol` itself is "user") —
    * the bare-name join would otherwise be ambiguous or silently
    * self-referential.
    */
  def stepTimes(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, steps: Seq[Step]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("_f_user"), col(tsCol).as("_f_ts"),
      col(typeCol).as("_f_type"))
    val first = ev.where(col("_f_type") === steps.head.eventType)
      .groupBy(col("_f_user").as("user")).agg(min(col("_f_ts")).as("t"))
    steps.tail.foldLeft(Vector(first)) { (acc, step) =>
      val prev = acc.last.select(col("user"), col("t").as("_tprev"))
      val gapOk = step.maxGapSeconds match {
        case Some(g) => col("_f_ts") <= col("_tprev") + expr(s"INTERVAL '$g' SECOND")
        case None    => lit(true)
      }
      acc :+ ev.where(col("_f_type") === step.eventType)
        .join(prev, col("_f_user") === col("user"))
        .where(col("_f_ts") > col("_tprev") && gapOk)
        .groupBy(col("user")).agg(min(col("_f_ts")).as("t"))
    }
  }

  /** Cohort retention matrix — the other standard product-analytics
    * aggregate: users cohorted by their first-activity time bucket
    * (default: week), counted again in every later bucket they remain
    * active. Returns (cohort, week_offset, n_users); offset 0 is the
    * cohort's size.
    *
    * Scale shape: bucket assignment rides the scan; the per-user
    * cohort min and the (user, bucket) dedup are both user-keyed
    * shuffles (co-partitioned under AQE, carrying (user, long)
    * pairs only); the final matrix aggregate is keyed by
    * (cohort, offset) — a bounded output (#buckets²/2 cells).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                bucketSeconds: Long = 604800L): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds $bucketSeconds")
    val ev = events.select(col(userCol).as("_r_user"),
      floor(unix_timestamp(col(tsCol)) / bucketSeconds).cast("long").as("_r_bkt"))
    val cohort = ev.groupBy(col("_r_user")).agg(min(col("_r_bkt")).as("cohort"))
    ev.distinct()
      .join(cohort, Seq("_r_user"))
      .groupBy(col("cohort"), (col("_r_bkt") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users")) // (user, bkt) already distinct
  }

  /** First-order transition counts between consecutive events of the
    * same user — the empirical Markov matrix over event types, the
    * complement of [[funnel]] (which tests ONE prescribed order; this
    * measures every observed order). The successor is taken under the
    * total order (timestamp, tieCol), so microsecond ties are
    * deterministic.
    *
    * Scale shape: one user-keyed sort window (`lead`) whose rows carry
    * (user, micros, tie, type) only, then a count aggregate on the
    * bounded (type, next_type) dimension. No self-join of the event
    * table.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCol: String): DataFrame = {
    val ev = events.select(col(userCol).as("_f_user"),
      unix_micros(col(tsCol)).as("_f_us"), col(tieCol).as("_f_tie"),
      col(typeCol).as("_f_type"))
    val w = Window.partitionBy(col("_f_user"))
      .orderBy(col("_f_us"), col("_f_tie"))
    ev.select(col("_f_type").as("from_type"),
        lead(col("_f_type"), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** The funnel summary: (step, name, n_users) per stage. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[Step]): DataFrame =
    stepTimes(events, userCol, tsCol, typeCol, steps).zipWithIndex
      .map { case (df, i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"),
            lit(steps(i).eventType).as("name"), col("n_users"))
      }
      .reduce(_.unionAll(_))

  /** MATCH_RECOGNIZE-lite: per-entity event-type sequence matching by
    * regex. Each entity's events collapse — under the (micros, tie)
    * total order — to one space-joined type string; `pattern` (a Java
    * regex over that string) then classifies whole journeys, e.g.
    * "click (?:view )*purchase" for conversions-with-browsing. Returns
    * matching entities with their sequence length.
    *
    * Scale shape: one entity-keyed window sort (same shuffle as
    * [[transitions]]) feeding a map-side aggregate to the per-entity
    * string, then a map-only regex filter. Journey strings are bounded
    * by per-entity event counts — skewed entities cost one long string,
    * never a fan-out.
    */
  /** Greedy ordered-landmark matching: the earliest event index at
    * which a user completes `steps` in order (anything may intervene) —
    * landmark k must occur strictly after the event that satisfied
    * landmark k−1. Returns (user_id, complete_at) for completing users,
    * where complete_at is the 1-based index (under the (micros, tie)
    * total order) of the completing event. The greedy first-match scan
    * is exactly what the CONSTANT-state streaming twin
    * [[graft.streaming.Streams.landmarkStream]] folds event by event —
    * the stream ≡ batch pair for journey matching, bounded state where
    * [[sequenceMatch]]'s full-journey regex cannot be.
    *
    * Scale shape: one user-keyed window ranks events; then one bounded
    * (user, pos) aggregate PER STEP, each reusing the user-key
    * partitioning — k small joins, never a per-user sequence collect.
    */
  def landmarkSteps(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, tieCol: String,
                    steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one landmark step")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_us"), col("_tie"))
    val ev = events.select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("_us"), col(tieCol).as("_tie"),
        col(typeCol).as("_type"))
      .withColumn("rn", row_number().over(w))
      .select(col("user_id"), col("rn"), col("_type"))
    var cur = ev.select(col("user_id")).distinct()
      .withColumn("pos", lit(0))
    for (st <- steps)
      cur = ev.where(col("_type") === st)
        .join(cur, Seq("user_id"))
        .where(col("rn") > col("pos"))
        .groupBy(col("user_id"))
        .agg(min(col("rn")).as("pos"))
    cur.select(col("user_id"), col("pos").cast("long").as("complete_at"))
  }

  def sequenceMatch(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, tieCol: String,
                    pattern: String): DataFrame = {
    val ev = events.select(col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("_us"), col(tieCol).as("_tie"),
      col(typeCol).as("_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_us"), col("_tie"))
    ev.select(col("user_id"), col("_type"),
        row_number().over(w).as("_rn"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(array_sort(
            collect_list(struct(col("_rn"), col("_type")))),
          e => e.getField("_type")), " ").as("_seq"))
      .where(regexp_like(col("_seq"), lit(pattern)))
      .select(col("user_id"), col("n_events"))
  }
}
