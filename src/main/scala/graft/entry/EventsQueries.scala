package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Baskets, Bpe, Cdc, Classifier, CorpusStats, CountMin, Curation, Dedup, Funnel, Geo, Graphs, HeavyHitters, Intervals, Ivf, Packing, Pq, PrefixMatch, Profiling, Retrieval, Sampling, Similarity, Skew, Stats, TemplateFilters, Timeseries}
import graft.functions.{DedupExpr, TextAnalytics}
import graft.EntryContext._

/** Event-time analytics over `events`: windowed aggregation batch twins, journeys/funnels/attribution, CDC, time-series regularization and change detection.
  *
  * Declarations (query lambda + DuckDB oracle SQL) are
  * merged into [[SparkEntry]]'s registry; see SURVEY.md
  * §2/§8 and docs/QUERIES.md for the full index.
  */
private[graft] object EventsQueries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // CDC apply / MERGE: highest-sequence change per key wins, deletes
    // drop the key, unchanged base rows pass through, unseen keys insert.
    // The change stream is derived deterministically from orders so both
    // engines construct the identical input (see Cdc scale notes: one
    // key shuffle, no join, changes never broadcast)
    "q_cdc_upsert" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val base = orders.select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
      val changes = orders.where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 2, 2).as("price"),
            lit(1L).as("_seq"),
            when(col("o_orderkey") % 3 === 0, "D").otherwise("U").as("_op"))
        .unionByName(orders.where(col("o_orderkey") % 14 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 3, 2).as("price"),
            lit(2L).as("_seq"), lit("U").as("_op")))
        .unionByName(orders.where(col("o_orderkey") % 11 === 0)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice"), 2).as("price"),
            lit(1L).as("_seq"), lit("U").as("_op")))
      Cdc.applyChanges(base, changes, "o_orderkey", "_seq", "_op")
        .orderBy(col("o_orderkey"))
    }),

    // SCD Type-2 history over the same changelog shape as q_cdc_upsert:
    // each change becomes a version with valid_to = next seq per key
    // (one bounded lead window, no join); tombstones stay visible
    "q_scd2" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val changes = orders.select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          lit(0L).as("_seq"), lit("U").as("_op"))
        .unionByName(orders.where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), round(col("o_totalprice") * 2, 2).as("price"),
            lit(1L).as("_seq"),
            when(col("o_orderkey") % 3 === 0, "D").otherwise("U").as("_op")))
        .unionByName(orders.where(col("o_orderkey") % 14 === 0)
          .select(col("o_orderkey"), round(col("o_totalprice") * 3, 2).as("price"),
            lit(2L).as("_seq"), lit("U").as("_op")))
      Cdc.scdHistory(changes, "o_orderkey", "_seq", "_op")
        .select(col("o_orderkey"), col("price"), col("_seq").as("seq_from"),
          col("valid_to"), col("_op").as("op"), col("is_current"))
        .orderBy(col("o_orderkey"), col("seq_from"))
    }),

    // Snapshot diff: classify every key across base vs CDC-applied
    // snapshot (full-outer on the key, struct payload compare) — the
    // end-to-end audit of the merge: counts per change class
    "q_snapshot_diff" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val base = orders.select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
      val changes = orders.where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 2, 2).as("price"),
            lit(1L).as("_seq"),
            when(col("o_orderkey") % 3 === 0, "D").otherwise("U").as("_op"))
        .unionByName(orders.where(col("o_orderkey") % 14 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 3, 2).as("price"),
            lit(2L).as("_seq"), lit("U").as("_op")))
        .unionByName(orders.where(col("o_orderkey") % 11 === 0)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice"), 2).as("price"),
            lit(1L).as("_seq"), lit("U").as("_op")))
      val applied = Cdc.applyChanges(base, changes, "o_orderkey", "_seq", "_op")
      Cdc.snapshotDiff(base, applied, "o_orderkey", Seq("o_custkey", "price"))
        .groupBy(col("change")).agg(count(lit(1)).as("n"))
        .orderBy(col("change"))
    }),

    // Greedy ordered-landmark completion (signup → click → purchase):
    // earliest completing event index per user — the CONSTANT-state
    // streamable journey query (streaming twin: Streams.landmarkStream)
    "q_landmark" -> ((s, dir) =>
      Funnel.landmarkSteps(Tables.events(s, dir), "user_id", "ts",
          "event_type", "event_id", Seq("signup", "click", "purchase"))
        .orderBy(col("user_id"))),

    // MATCH_RECOGNIZE-lite: users whose full journey (micros, event_id
    // order) matches signup-then-eventually-purchase — one window sort,
    // then a map-only regex over the collapsed type sequence
    "q_seq_match" -> ((s, dir) =>
      Funnel.sequenceMatch(Tables.events(s, dir), "user_id", "ts",
          "event_type", "event_id", pattern = "signup.*purchase")
        .orderBy(col("user_id"))),

    // Bounded-depth EWMA over per-user cents series: 8 α=0.5 lag terms
    // inside ONE window — exact binary weights, engine-exact arithmetic
    "q_ewma" -> ((s, dir) =>
      Timeseries.ewma(Tables.events(s, dir).where(col("value").isNotNull),
          "user_id", unix_micros(col("ts")), col("event_id"),
          expr("cast(round(value * 100) as bigint)"), alpha = 0.5, depth = 8)
        .select(col("key").as("user_id"), col("micros"),
          col("tie").as("event_id"), col("ewma"))
        .orderBy(col("user_id"), col("micros"), col("event_id"))),

    // Batch run of the STREAMING incremental-dedup plan (the
    // q_tumbling_batch pattern): new docs (id % 10 == 0) probe the
    // shared corpus shingle index through the windowed-aggregation
    // plan; one synthetic event-time per doc, day window. Oracle = the
    // self-join restricted to exactly-one-side-new pairs.
    "q_incdedup_stream_batch" -> ((s, dir) => {
      val newDocs = Tables.documents(s, dir)
        .where(col("doc_id") % 10 === 0)
        .select(timestamp_seconds(col("doc_id")).as("ts"),
          col("doc_id"), col("text"))
      val corpus = docShingles(s, dir).where(col("id") % 10 =!= 0)
        .select(col("id"), col("sh"))
      graft.streaming.Streams.incrementalDedupStream(newDocs, "ts",
          "doc_id", "text", corpus, threshold = 0.8,
          watermark = "1 minute", windowDur = "1 day")
        .orderBy(col("doc_id"), col("corpus_id"))
    }),

    // Time-weighted average metric value per event type under the
    // (micros, event_id) total order — exact decimal sums, the
    // irregular-sampling summary a plain mean over-counts bursts on.
    "q_twap" -> ((s, dir) =>
      Timeseries.twap(Tables.events(s, dir), "event_type",
          unix_micros(col("ts")), col("value"), col("event_id"))
        .select(col("key").as("event_type"), col("n_intervals"), col("twap"))
        .orderBy(col("event_type"))),

    // -- events: batch windowing (streaming-equivalent plan, SURVEY.md §2.9).
    // Runs the SAME Streams.tumblingAgg plan the streaming path uses
    // (unified batch/stream model) — the DuckDB oracle is therefore the
    // batch-equivalence check for the streaming operator. The batch run
    // has no watermark node (watermarks are no-ops in batch mode anyway).
    "q_tumbling_batch" -> ((s, dir) =>
      graft.streaming.Streams.tumblingAggBatch(Tables.events(s, dir))
        .select(col("win_start").cast("long").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("win_start"), col("event_type"))),

    "q_sliding_batch" -> ((s, dir) =>
      graft.streaming.Streams.slidingAggBatch(Tables.events(s, dir))
        .select(col("win_start").cast("long").as("win_start"), col("event_type"), col("n"))
        .orderBy(col("win_start"), col("event_type"))),

    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts").cast("long"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_ts").isNull || (col("ts").cast("long") - col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Ordered conversion funnel (first-touch, time-bounded steps): one
    // min-aggregate per step, user-keyed joins only — no per-user
    // sequence reassembly, no windows
    "q_funnel" -> ((s, dir) =>
      Funnel.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq(Funnel.Step("view"),
            Funnel.Step("click", Some(2L * 3600)),
            Funnel.Step("purchase", Some(24L * 3600))))
        .orderBy(col("step"))),

    // Weekly cohort retention matrix: first-activity cohorts re-counted
    // in every later active week — user-keyed shuffles only
    "q_retention" -> ((s, dir) =>
      Funnel.retention(Tables.events(s, dir), "user_id", "ts")
        .orderBy(col("cohort"), col("week_offset"))),

    // Time-series gap-fill + forward-fill: per-user daily resample on
    // the integer microsecond axis. The spine is each key's own
    // [min,max] bucket span (sequence+explode from a bounded per-key
    // aggregate — never a calendar cross-join), gaps get n_events=0,
    // and the fill carries integer cents so it is engine-exact
    "q_resample" -> ((s, dir) =>
      Timeseries.resample(Tables.events(s, dir), "user_id", "ts",
          round(col("value") * 100).cast("long"), bucketMicros = 86400000000L)
        .select(col("key").as("user_id"), col("bucket").as("day_num"),
          col("n_events"), col("filled_sum").as("filled_cents"))
        .orderBy(col("user_id"), col("day_num"))),

    // Trailing 7-day rolling sum/count per user via a true RANGE frame
    // on epoch microseconds (ties are peers → order-independent);
    // integer cents keep the windowed sum exact on both engines
    "q_rolling_range" -> ((s, dir) =>
      Timeseries.rollingRange(Tables.events(s, dir), "user_id", "ts",
          round(col("value") * 100).cast("long"),
          windowMicros = 7L * 86400000000L, carryCols = Seq("event_id"))
        .select(col("event_id"), col("key").as("user_id"), col("t_us"),
          col("roll_sum").as("roll_cents"), col("roll_n"))
        .orderBy(col("user_id"), col("t_us"), col("event_id"))),

    // Empirical Markov transition matrix over per-user event sequences:
    // one user-keyed lead window under the (micros, event_id) total
    // order, then a bounded (from, to) count
    "q_transitions" -> ((s, dir) =>
      Funnel.transitions(Tables.events(s, dir), "user_id", "ts",
          "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))),

    // Day-over-day change on the gap-filled forward-filled series:
    // lag over the resample grid; exact integer cents until the ratio
    "q_pct_change" -> ((s, dir) => {
      val rs = Timeseries.resample(Tables.events(s, dir), "user_id", "ts",
        round(col("value") * 100).cast("long"), bucketMicros = 86400000000L)
      val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      rs.select(col("key").as("user_id"), col("bucket").as("day_num"),
          col("filled_sum"),
          lag(col("filled_sum"), 1).over(w).as("_prev"))
        .where(col("_prev").isNotNull && col("_prev") =!= 0)
        .select(col("user_id"), col("day_num"),
          round((col("filled_sum") - col("_prev")) / col("_prev"), 6)
            .as("pct_change"))
        .orderBy(col("user_id"), col("day_num"))
    }),

    // Rolling z-score anomaly flags: per-user 7-day trailing mean/std
    // from exact-integer (n, Σc, Σc²) window sums — the double
    // arithmetic starts only at the final μ/σ/z expressions, spelled
    // identically in both engines; the threshold compares the ROUNDED z
    "q_rolling_zscore" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
        .rangeBetween(-7L * 86400000000L, 0)
      val agg = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t_us"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), col("user_id"), col("t_us"), col("cents"),
          count(lit(1)).over(w).as("n_win"),
          sum(col("cents")).over(w).as("s1"),
          sum(col("cents") * col("cents")).over(w).as("s2"))
        .where(col("n_win") >= 8 &&
          col("n_win") * col("s2") - col("s1") * col("s1") > 0)
      val mu = col("s1").cast("double") / col("n_win")
      val sd = sqrt((col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / col("n_win")) /
        (col("n_win") - 1))
      agg.select(col("event_id"), col("user_id"), col("n_win"),
          round((col("cents") - mu) / sd, 4).as("z"))
        .where(abs(col("z")) >= lit(1.6))
        .orderBy(col("event_id"))
    }),

    // Sweep-line peak concurrency per event type: intervals [t, t+value
    // seconds) explode to ±1 boundary points; the running sum is
    // TWO-LEVEL (day blocks + per-key block offsets) so a hot key never
    // serializes its whole history through one window task
    "q_max_concurrency" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        unix_micros(col("ts")).as("t0"),
        (unix_micros(col("ts")) +
          round(col("value")).cast("long") * 1000000L).as("t1"))
      Timeseries.maxConcurrency(ev, "event_type", col("t0"), col("t1"))
        .select(col("key").as("event_type"), col("max_concurrent"))
        .orderBy(col("event_type"))
    }),

    // Per-type CUSUM change-point scan on integer cents under the
    // (micros, event_id) total order: the prefix walk runs on the
    // N-scaled integer numerator N·cum_i − i·tot (decimal(38,0) /
    // HUGEINT), exact until the single peak division
    "q_cusum" -> ((s, dir) =>
      Timeseries.cusum(Tables.events(s, dir).where(col("value").isNotNull),
          col("event_type"), unix_micros(col("ts")), col("event_id"),
          expr("cast(round(value * 100) as bigint)"))
        .select(col("g").as("event_type"), col("n"), col("peak_stat"),
          col("peak_i"), col("peak_t"))
        .orderBy(col("event_type"))),

    // Day-of-week seasonal profile per event type: mean cents per
    // (type, dow) and its delta vs the type's overall mean — exact
    // integer sums until two final divisions; dow from pure epoch-day
    // arithmetic (the q_chisq discipline)
    "q_seasonal_dow" -> ((s, dir) => {
      val d = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"),
          expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("dow"),
          expr("cast(round(value * 100) as bigint)").as("_c"))
      val per = d.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("_c")).as("_sc"))
      val tot = d.groupBy(col("event_type"))
        .agg(count(lit(1)).as("_nt"), sum(col("_c")).as("_st"))
      per.join(tot, Seq("event_type"))
        .select(col("event_type"), col("dow"), col("n"),
          round(col("_sc") / col("n") / 100.0, 4).as("mean_val"),
          round(col("_sc") / col("n") / 100.0
            - col("_st") / col("_nt") / 100.0, 4).as("dow_delta"))
        .orderBy(col("event_type"), col("dow"))
    }),

    // Autocorrelation of per-type daily totals at lags 1..7 (weekly
    // seasonality diagnostic): bounded (type, day) dimension, lagged
    // pairs via one equi-join after a 7-way explode — never a theta
    // join over raw events
    "q_acf" -> ((s, dir) =>
      Timeseries.acf(Tables.events(s, dir).where(col("value").isNotNull),
          col("event_type"), unix_micros(col("ts")),
          expr("cast(round(value * 100) as bigint)"), maxLag = 7)
        .select(col("g").as("event_type"), col("lag").cast("long").as("lag"),
          col("n_pairs"), col("acf"))
        .orderBy(col("event_type"), col("lag"))),

    // Daily p50/p95 bands per event type — exact interpolated
    // percentiles over the bounded (type, day) grouping; the SLO-band
    // monitoring query
    "q_daily_percentiles" -> ((s, dir) =>
      Tables.events(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_num"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .orderBy(col("event_type"), col("day_num"))),

    // Freshness/staleness: per-type last event time and its lag behind
    // the newest event anywhere — the pipeline-liveness gate; two
    // bounded aggregates, integer micros
    "q_freshness" -> ((s, dir) => {
      val per = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("n"))
      val glob = per.agg(max(col("last_us")).as("_g"))
      per.crossJoin(broadcast(glob))
        .withColumn("staleness_s", expr("(_g - last_us) div 1000000"))
        .select(col("event_type"), col("n"), col("last_us"),
          col("staleness_s"))
        .orderBy(col("event_type"))
    }),

    // Feature-store lag features over the gap-filled per-user daily
    // grid (q_resample's operator): lag-1/lag-7 cents and trailing
    // 7-day mean — two key-partitioned windows sharing one sort, exact
    // integers until the mean's single division
    "q_lag_features" -> ((s, dir) => {
      val grid = Timeseries.resample(Tables.events(s, dir), "user_id", "ts",
          round(col("value") * 100).cast("long"), bucketMicros = 86400000000L)
        .select(col("key").as("user_id"), col("bucket").as("day_num"),
          coalesce(col("filled_sum"), lit(0L)).as("c"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      val w7 = w.rowsBetween(-6, 0)
      grid.select(col("user_id"), col("day_num"), col("c"),
          lag(col("c"), 1).over(w).as("lag1"),
          lag(col("c"), 7).over(w).as("lag7"),
          sum(col("c")).over(w7).as("_s7"),
          count(lit(1)).over(w7).as("_n7"))
        .select(col("user_id"), col("day_num"), col("c"), col("lag1"),
          col("lag7"), round(col("_s7") / col("_n7"), 4).as("mean7"))
        .orderBy(col("user_id"), col("day_num"))
    }),

    // Gaps-and-islands interval merge: per user, overlapping event
    // intervals [t, t + cents·10ms) coalesce into maximal covered
    // spans — ONE key-partitioned window pass (preceding-max → new-
    // island flag → running island id) + one island aggregate, exact
    // integer micros throughout
    "q_merge_intervals" -> ((s, dir) => {
      val iv = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) +
            expr("cast(round(coalesce(value, 0) * 100) as bigint)") * 10000L)
            .as("e"))
      Timeseries.mergeIntervals(iv, "user_id", col("s"), col("e"),
          col("event_id"))
        .select(col("key").as("user_id"), col("island"),
          col("merged_start"), col("merged_end"), col("n_merged"))
        .orderBy(col("user_id"), col("island"))
    }),

    // Burstiness of inter-arrival gaps per event type — Goh–Barabási
    // B = (σ−μ)/(σ+μ) from exact integer (n, Σg, Σg²) gap sums; gaps
    // from one key-partitioned lead window under the (micros, id)
    // total order
    "q_burstiness" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("_us"), col("event_id"))
      val gaps = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("_us"))
        .withColumn("_g", (lead(col("_us"), 1).over(w) - col("_us"))
          .cast("decimal(38,0)"))
        .where(col("_g").isNotNull)
      val sums = gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("_g")).as("_s1"),
          sum(col("_g") * col("_g")).as("_s2"))
      val mu = sums("_s1").cast("double") / sums("n_gaps")
      val sig = sqrt(sums("_s2").cast("double") / sums("n_gaps") - mu * mu)
      sums.select(col("event_type"), col("n_gaps"),
          round(mu / 1000000.0, 4).as("mean_gap_s"),
          round((sig - mu) / (sig + mu), 6).as("burstiness"))
        .orderBy(col("event_type"))
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent PRECEDING non-purchase event — one user-keyed window with
    // an IGNORE NULLS last_value over the strict-past frame, then a
    // channel rollup; no self-join, no sequence reassembly
    "q_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("_src",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase" && col("_src").isNotNull)
        .groupBy(col("_src").as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(expr("cast(round(value * 100) as bigint)")).as("revenue_cents"))
        .orderBy(col("channel"))
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_cdc_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
        |         CAST(-9223372036854775807 AS BIGINT) - 1 AS _seq, 'U' AS _op
        |  FROM orders),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, round(o_totalprice*2, 2) AS price,
        |         CAST(1 AS BIGINT) AS _seq,
        |         CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS _op
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, round(o_totalprice*3, 2),
        |         CAST(2 AS BIGINT), 'U'
        |  FROM orders WHERE o_orderkey % 14 = 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_custkey, round(o_totalprice, 2),
        |         CAST(1 AS BIGINT), 'U'
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |                                   ORDER BY _seq DESC) AS rn FROM u)
        |SELECT o_orderkey, o_custkey, price
        |FROM r WHERE rn = 1 AND _op != 'D' ORDER BY o_orderkey""".stripMargin,

    "q_scd2" ->
      """WITH chg AS (
        |  SELECT o_orderkey, round(o_totalprice, 2) AS price,
        |         CAST(0 AS BIGINT) AS _seq, 'U' AS _op FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, round(o_totalprice*2, 2),
        |         CAST(1 AS BIGINT),
        |         CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, round(o_totalprice*3, 2),
        |         CAST(2 AS BIGINT), 'U'
        |  FROM orders WHERE o_orderkey % 14 = 0)
        |SELECT o_orderkey, price, _seq AS seq_from,
        |  lead(_seq, 1) OVER (PARTITION BY o_orderkey ORDER BY _seq) AS valid_to,
        |  _op AS op,
        |  CAST(CASE WHEN lead(_seq, 1) OVER (PARTITION BY o_orderkey
        |                                     ORDER BY _seq) IS NULL
        |            AND _op = 'U' THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM chg ORDER BY o_orderkey, seq_from""".stripMargin,

    "q_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |  FROM orders),
        |baseseq AS (
        |  SELECT o_orderkey, o_custkey, price,
        |         CAST(-9223372036854775807 AS BIGINT) - 1 AS _seq, 'U' AS _op
        |  FROM base),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, round(o_totalprice*2, 2) AS price,
        |         CAST(1 AS BIGINT) AS _seq,
        |         CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS _op
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, round(o_totalprice*3, 2),
        |         CAST(2 AS BIGINT), 'U'
        |  FROM orders WHERE o_orderkey % 14 = 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_custkey, round(o_totalprice, 2),
        |         CAST(1 AS BIGINT), 'U'
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |u AS (SELECT * FROM baseseq UNION ALL SELECT * FROM chg),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |                                   ORDER BY _seq DESC) AS rn FROM u),
        |applied AS (SELECT o_orderkey, o_custkey, price
        |            FROM r WHERE rn = 1 AND _op != 'D'),
        |d AS (SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
        |        CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |             WHEN b.o_orderkey IS NULL THEN 'removed'
        |             WHEN a.o_custkey = b.o_custkey AND a.price = b.price
        |               THEN 'unchanged'
        |             ELSE 'changed' END AS change
        |      FROM base a FULL OUTER JOIN applied b
        |        ON a.o_orderkey = b.o_orderkey)
        |SELECT change, count(*) AS n FROM d
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // chained min-after-pos greedy — the same first-match scan
    "q_landmark" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS tu, event_id,
        |             event_type FROM events),
        |r AS (SELECT user_id, event_type,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY tu, event_id) AS rn FROM e),
        |s1 AS (SELECT user_id, min(rn) AS pos FROM r
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT r.user_id, min(rn) AS pos FROM r JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND rn > s1.pos GROUP BY 1),
        |s3 AS (SELECT r.user_id, min(rn) AS pos FROM r JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND rn > s2.pos GROUP BY 1)
        |SELECT user_id, CAST(pos AS BIGINT) AS complete_at FROM s3
        |ORDER BY user_id""".stripMargin,

    "q_seq_match" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS tu, event_id,
        |             event_type FROM events),
        |s AS (SELECT user_id, count(*) AS n_events,
        |        string_agg(event_type, ' ' ORDER BY tu, event_id) AS seq
        |      FROM e GROUP BY 1)
        |SELECT user_id, n_events FROM s
        |WHERE regexp_matches(seq, 'signup.*purchase')
        |ORDER BY user_id""".stripMargin,

    // exact binary α=0.5 weights; CASE chain mirrors the Spark fold order
    "q_ewma" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS micros, event_id,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS c
        |  FROM events WHERE value IS NOT NULL),
        |l AS (SELECT user_id, micros, event_id, c,
        |    lag(c, 1) OVER w AS c1, lag(c, 2) OVER w AS c2,
        |    lag(c, 3) OVER w AS c3, lag(c, 4) OVER w AS c4,
        |    lag(c, 5) OVER w AS c5, lag(c, 6) OVER w AS c6,
        |    lag(c, 7) OVER w AS c7
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY micros, event_id))
        |SELECT user_id, micros, event_id,
        |  round((CASE WHEN c  IS NOT NULL THEN c  * 1.0       ELSE 0.0 END
        |       + CASE WHEN c1 IS NOT NULL THEN c1 * 0.5       ELSE 0.0 END
        |       + CASE WHEN c2 IS NOT NULL THEN c2 * 0.25      ELSE 0.0 END
        |       + CASE WHEN c3 IS NOT NULL THEN c3 * 0.125     ELSE 0.0 END
        |       + CASE WHEN c4 IS NOT NULL THEN c4 * 0.0625    ELSE 0.0 END
        |       + CASE WHEN c5 IS NOT NULL THEN c5 * 0.03125   ELSE 0.0 END
        |       + CASE WHEN c6 IS NOT NULL THEN c6 * 0.015625  ELSE 0.0 END
        |       + CASE WHEN c7 IS NOT NULL THEN c7 * 0.0078125 ELSE 0.0 END) /
        |      (CASE WHEN c  IS NOT NULL THEN 1.0       ELSE 0.0 END
        |       + CASE WHEN c1 IS NOT NULL THEN 0.5       ELSE 0.0 END
        |       + CASE WHEN c2 IS NOT NULL THEN 0.25      ELSE 0.0 END
        |       + CASE WHEN c3 IS NOT NULL THEN 0.125     ELSE 0.0 END
        |       + CASE WHEN c4 IS NOT NULL THEN 0.0625    ELSE 0.0 END
        |       + CASE WHEN c5 IS NOT NULL THEN 0.03125   ELSE 0.0 END
        |       + CASE WHEN c6 IS NOT NULL THEN 0.015625  ELSE 0.0 END
        |       + CASE WHEN c7 IS NOT NULL THEN 0.0078125 ELSE 0.0 END)
        |      / 100.0, 4) AS ewma
        |FROM l ORDER BY user_id, micros, event_id""".stripMargin,

    // the self-join restricted to exactly-one-side-new pairs, reshaped
    // to the stream's (new doc, corpus doc) orientation
    "q_incdedup_stream_batch" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t)
        |SELECT CASE WHEN a.doc_id % 10 = 0 THEN a.doc_id ELSE b.doc_id END AS doc_id,
        |       CASE WHEN a.doc_id % 10 = 0 THEN b.doc_id ELSE a.doc_id END AS corpus_id,
        |       round(len(list_intersect(a.s, b.s)) * 1.0 /
        |             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE ((a.doc_id % 10 = 0) <> (b.doc_id % 10 = 0))
        |  AND len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
        |ORDER BY doc_id, corpus_id""".stripMargin,

    // integer cents × integer micro-gaps, HUGEINT sums (the Spark side
    // sums decimal(38,0)); the last observation carries no interval
    "q_twap" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts)//1000 AS tu, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |g AS (SELECT event_type, cents,
        |        lead(tu) OVER (PARTITION BY event_type
        |          ORDER BY tu, event_id) - tu AS gap
        |      FROM e)
        |SELECT event_type, count(*) AS n_intervals,
        |  round(CAST(sum(cents::HUGEINT * gap) AS DOUBLE) /
        |        CAST(sum(gap::HUGEINT) AS DOUBLE) / 100.0, 6) AS twap
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_tumbling_batch" ->
      """SELECT win_start, event_type, count(*) AS n, round(sum(value),2) AS total FROM
        |(SELECT (epoch_ns(ts)//1000000000) - ((epoch_ns(ts)//1000000000) % 600) AS win_start,
        |        event_type, value FROM events) t
        |GROUP BY win_start, event_type ORDER BY win_start, event_type""".stripMargin,

    "q_sliding_batch" ->
      """SELECT win_start, event_type, count(*) AS n FROM
        |(SELECT ((epoch_ns(ts)//1000000000)//300 - i)*300 AS win_start, event_type
        | FROM events CROSS JOIN (SELECT unnest(range(2)) AS i)) t
        |GROUP BY win_start, event_type ORDER BY win_start, event_type""".stripMargin,

    "q_sessionize" ->
      """SELECT user_id, cast(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events FROM
        |(SELECT user_id,
        |   CASE WHEN lag(epoch_ns(ts)//1000000000) OVER w IS NULL
        |          OR (epoch_ns(ts)//1000000000) - (lag(epoch_ns(ts)//1000000000) OVER w) > 1800
        |        THEN 1 ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // compares step gaps at MICROSECOND precision (epoch_ns//1000) — the
    // Spark side reads ts through Tables.events' nanos/1000 truncation,
    // so a native-ns oracle would classify two events in the same
    // microsecond but different nanoseconds differently (q_sessionize
    // discipline)
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS tu
        |           FROM events),
        |v AS (SELECT user_id, min(tu) AS t0 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(tu) AS t1 FROM e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE event_type = 'click' AND tu > t0
        |        AND tu <= t0 + 7200000000 GROUP BY 1),
        |p AS (SELECT e.user_id, min(tu) AS t2 FROM e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND tu > t1
        |        AND tu <= t1 + 86400000000 GROUP BY 1)
        |SELECT 1 AS step, 'view' AS name, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, 'click', count(*) FROM c
        |UNION ALL SELECT 3, 'purchase', count(*) FROM p
        |ORDER BY step""".stripMargin,

    "q_retention" ->
      """WITH ev AS (SELECT user_id,
        |              (epoch_ns(ts)//1000000000) // 604800 AS bkt FROM events),
        |co AS (SELECT user_id, min(bkt) AS cohort FROM ev GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, bkt FROM ev)
        |SELECT cohort, bkt - cohort AS week_offset, count(*) AS n_users
        |FROM act JOIN co USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin,

    // integer-epoch discipline (see q_sessionize/q_funnel): day buckets
    // and the forward fill both ride epoch-microsecond floor division,
    // so no calendar/timezone rule can split the engines
    "q_resample" ->
      """WITH b AS (
        |  SELECT user_id, (epoch_ns(ts)//1000) // 86400000000 AS day_num,
        |         count(*) AS n_events,
        |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day_num) AS b0, max(day_num) AS b1
        |         FROM b GROUP BY 1),
        |spine AS (SELECT user_id, unnest(generate_series(b0, b1)) AS day_num
        |          FROM span)
        |SELECT s.user_id, s.day_num,
        |  coalesce(b.n_events, 0) AS n_events,
        |  last_value(b.cents IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.day_num
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
        |FROM spine s LEFT JOIN b
        |  ON b.user_id = s.user_id AND b.day_num = s.day_num
        |ORDER BY s.user_id, s.day_num""".stripMargin,

    "q_rolling_range" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS t_us,
        |         CAST(round(value*100) AS BIGINT) AS cents FROM events)
        |SELECT event_id, user_id, t_us,
        |  CAST(sum(cents) OVER w AS BIGINT) AS roll_cents,
        |  count(*) OVER w AS roll_n
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us
        |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, t_us, event_id""".stripMargin,

    "q_transitions" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS tu, event_id,
        |                  event_type FROM events),
        |s AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY tu, event_id) AS to_type FROM e)
        |SELECT from_type, to_type, count(*) AS n FROM s
        |WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_pct_change" ->
      """WITH b AS (
        |  SELECT user_id, (epoch_ns(ts)//1000) // 86400000000 AS day_num,
        |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day_num) AS b0, max(day_num) AS b1
        |         FROM b GROUP BY 1),
        |spine AS (SELECT user_id, unnest(generate_series(b0, b1)) AS day_num
        |          FROM span),
        |f AS (SELECT s.user_id, s.day_num,
        |        last_value(b.cents IGNORE NULLS) OVER (
        |          PARTITION BY s.user_id ORDER BY s.day_num
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |      FROM spine s LEFT JOIN b
        |        ON b.user_id = s.user_id AND b.day_num = s.day_num),
        |l AS (SELECT user_id, day_num, filled,
        |        lag(filled, 1) OVER (PARTITION BY user_id
        |          ORDER BY day_num) AS prev FROM f)
        |SELECT user_id, day_num,
        |       round((filled - prev) / prev, 6) AS pct_change
        |FROM l WHERE prev IS NOT NULL AND prev <> 0
        |ORDER BY user_id, day_num""".stripMargin,

    // exact-integer window sums; μ/σ/z double trees spelled identically
    "q_rolling_zscore" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS t_us,
        |         CAST(round(value*100) AS BIGINT) AS cents FROM events),
        |agg AS (SELECT event_id, user_id, cents,
        |    count(*) OVER w AS n_win,
        |    CAST(sum(cents) OVER w AS BIGINT) AS s1,
        |    CAST(sum(cents * cents) OVER w AS BIGINT) AS s2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us
        |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT event_id, user_id, n_win,
        |    round((cents - CAST(s1 AS DOUBLE) / n_win) /
        |      sqrt((CAST(s2 AS DOUBLE)
        |            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_win)
        |           / (n_win - 1)), 4) AS z
        |  FROM agg
        |  WHERE n_win >= 8 AND n_win * s2 - s1 * s1 > 0)
        |SELECT event_id, user_id, n_win, z FROM z
        |WHERE abs(z) >= 1.6 ORDER BY event_id""".stripMargin,

    // the max of a prefix sum is invariant to order among equal (t, d)
    // ties, so one flat window mirrors the engine's two-level sweep
    "q_max_concurrency" ->
      """WITH pts AS (
        |  SELECT event_type, epoch_ns(ts)//1000 AS t, 1 AS d FROM events
        |  UNION ALL
        |  SELECT event_type,
        |         epoch_ns(ts)//1000 + CAST(round(value) AS BIGINT) * 1000000,
        |         -1 FROM events),
        |r AS (SELECT event_type,
        |        sum(d) OVER (PARTITION BY event_type ORDER BY t, d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        |      FROM pts)
        |SELECT event_type, CAST(max(conc) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical N-scaled integer prefix walk; peak via (|S| desc, i asc)
    "q_cusum" ->
      """WITH b AS (SELECT event_type AS g, epoch_ns(ts)//1000 AS t,
        |    event_id AS tie,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT g, t,
        |    sum(c) OVER (PARTITION BY g ORDER BY t, tie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY t, tie)
        |      AS BIGINT) AS i,
        |    count(*) OVER (PARTITION BY g) AS n,
        |    sum(c) OVER (PARTITION BY g) AS tot
        |  FROM b),
        |s AS (SELECT g, t, i, n, abs(cum * n - tot * i) AS a FROM st),
        |r AS (SELECT g, n, a, i, t,
        |    row_number() OVER (PARTITION BY g ORDER BY a DESC, i ASC) AS rk
        |  FROM s)
        |SELECT g AS event_type, n, round(CAST(a AS DOUBLE) / n, 4) AS peak_stat,
        |       i AS peak_i, t AS peak_t
        |FROM r WHERE rk = 1 ORDER BY 1""".stripMargin,

    "q_seasonal_dow" ->
      """WITH d AS (SELECT event_type,
        |    ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS dow,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |per AS (SELECT event_type, dow, count(*) AS n, sum(c) AS sc
        |        FROM d GROUP BY 1, 2),
        |tot AS (SELECT event_type, count(*) AS nt, sum(c) AS st
        |        FROM d GROUP BY 1)
        |SELECT p.event_type, p.dow, p.n,
        |  round(p.sc / p.n / 100.0, 4) AS mean_val,
        |  round(p.sc / p.n / 100.0 - t.st / t.nt / 100.0, 4) AS dow_delta
        |FROM per p JOIN tot t USING (event_type)
        |ORDER BY 1, 2""".stripMargin,

    "q_acf" ->
      """WITH daily AS (SELECT event_type AS g,
        |    (epoch_ns(ts)//1000) // 86400000000 AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |sh AS (SELECT g, unnest(range(1, 8)) AS lag, day, c FROM daily),
        |pairs AS (SELECT d.g, sh.lag, sh.c AS c_prev, d.c AS c
        |  FROM daily d JOIN sh ON sh.g = d.g AND sh.day + sh.lag = d.day)
        |SELECT g AS event_type, CAST(lag AS BIGINT) AS lag,
        |       count(*) AS n_pairs, round(corr(c_prev, c), 4) AS acf
        |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_daily_percentiles" ->
      """SELECT event_type,
        |  (epoch_ns(ts)//1000) // 86400000000 AS day_num,
        |  count(*) AS n,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_freshness" ->
      """WITH per AS (SELECT event_type,
        |    max(epoch_ns(ts)//1000) AS last_us, count(*) AS n
        |  FROM events GROUP BY 1),
        |g AS (SELECT max(last_us) AS g FROM per)
        |SELECT event_type, n, last_us,
        |       (g.g - last_us) // 1000000 AS staleness_s
        |FROM per CROSS JOIN g ORDER BY 1""".stripMargin,

    // same spine/ffill construction as q_resample, then the lag windows
    "q_lag_features" ->
      """WITH b AS (
        |  SELECT user_id, (epoch_ns(ts)//1000) // 86400000000 AS day_num,
        |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day_num) AS b0, max(day_num) AS b1
        |         FROM b GROUP BY 1),
        |spine AS (SELECT user_id, unnest(generate_series(b0, b1)) AS day_num
        |          FROM span),
        |g AS (SELECT s.user_id, s.day_num,
        |    last_value(b.cents IGNORE NULLS) OVER (
        |      PARTITION BY s.user_id ORDER BY s.day_num
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf
        |  FROM spine s LEFT JOIN b
        |    ON b.user_id = s.user_id AND b.day_num = s.day_num),
        |f AS (SELECT user_id, day_num,
        |    CAST(coalesce(cf, 0) AS BIGINT) AS c FROM g),
        |w AS (SELECT user_id, day_num, c,
        |    lag(c, 1) OVER (PARTITION BY user_id ORDER BY day_num) AS lag1,
        |    lag(c, 7) OVER (PARTITION BY user_id ORDER BY day_num) AS lag7,
        |    sum(c) OVER (PARTITION BY user_id ORDER BY day_num
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
        |    count(*) OVER (PARTITION BY user_id ORDER BY day_num
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7
        |  FROM f)
        |SELECT user_id, day_num, c, lag1, lag7, round(s7 / n7, 4) AS mean7
        |FROM w ORDER BY 1, 2""".stripMargin,

    "q_merge_intervals" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS s,
        |    epoch_ns(ts)//1000 +
        |      CAST(round(coalesce(value, 0) * 100) AS BIGINT) * 10000 AS e
        |  FROM events),
        |m AS (SELECT user_id, event_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |m2 AS (SELECT user_id, event_id, s, e,
        |    CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nw
        |  FROM m),
        |m3 AS (SELECT user_id, s, e,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m2)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |  min(s) AS merged_start, max(e) AS merged_end, count(*) AS n_merged
        |FROM m3 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_burstiness" ->
      """WITH b AS (SELECT event_type, event_id, epoch_ns(ts)//1000 AS t
        |           FROM events),
        |g AS (SELECT event_type,
        |    CAST(lead(t) OVER (PARTITION BY event_type ORDER BY t, event_id)
        |      - t AS HUGEINT) AS g
        |  FROM b),
        |s AS (SELECT event_type, count(*) AS n_gaps, sum(g) AS s1,
        |        sum(g*g) AS s2
        |      FROM g WHERE g IS NOT NULL GROUP BY 1),
        |d AS (SELECT event_type, n_gaps,
        |        CAST(s1 AS DOUBLE)/n_gaps AS mu,
        |        sqrt(CAST(s2 AS DOUBLE)/n_gaps -
        |          (CAST(s1 AS DOUBLE)/n_gaps)*(CAST(s1 AS DOUBLE)/n_gaps))
        |          AS sig
        |      FROM s)
        |SELECT event_type, n_gaps, round(mu / 1000000.0, 4) AS mean_gap_s,
        |  round((sig - mu) / (sig + mu), 6) AS burstiness
        |FROM d ORDER BY 1""".stripMargin,

    "q_attribution" ->
      """WITH a AS (SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
        |  FROM events)
        |SELECT channel, count(*) AS n_purchases,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM a WHERE event_type = 'purchase' AND channel IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
