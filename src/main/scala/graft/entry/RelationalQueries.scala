package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Baskets, Bpe, Cdc, Classifier, CorpusStats, CountMin, Curation, Dedup, Funnel, Geo, Graphs, HeavyHitters, Intervals, Ivf, Packing, Par, Pq, PrefixMatch, Profiling, Retrieval, Sampling, Similarity, Skew, Stats, TemplateFilters, Timeseries}
import graft.functions.{DedupExpr, TextAnalytics}
import graft.EntryContext._

/** Relational core: scans/sources, projections, filters, joins (broadcast/SMJ/SHJ/as-of/range), aggregates, windows, set ops, scalar functions, layout and profiling — the reference's own operator surface (SURVEY.md §2.1–2.8) plus its scale hardening.
  *
  * Declarations (query lambda + DuckDB oracle SQL) are
  * merged into [[SparkEntry]]'s registry; see SURVEY.md
  * §2/§8 and docs/QUERIES.md for the full index.
  */
private[graft] object RelationalQueries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_flagship" -> ((s, dir) => qFlagship(s, dir)),

    // -- scans / projection / filters -------------------------------
    "q_scan_project" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_quantity") > 45.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // TSV line scan (SURVEY S3): deterministic round-trip through the
    // text-source path — parquet table → unquoted TSV → explicit-schema
    // csv scan; the oracle is the original table. The TSV is materialized
    // ONCE per (process, sfDir) as a fixture so the declared/timed query
    // is only the schema'd csv scan, not the write.
    "q_scan_tsv" -> ((s, dir) =>
      s.read.option("sep", "\t").schema(Tables.nationSchema).csv(nationTsvFixture(s, dir))
        .orderBy(col("n_nationkey"))),

    // NDJSON line scan (SURVEY S6's envelope format read back as a
    // SOURCE): parquet table → json lines → explicit-schema json scan
    // (schema inference is never the scale path — one pass, no sampling
    // job); same once-per-(process, sfDir) fixture discipline as
    // q_scan_tsv.
    "q_scan_json" -> ((s, dir) =>
      s.read.schema(Tables.nationSchema).json(nationJsonFixture(s, dir))
        .orderBy(col("n_nationkey"))),

    // Nested-struct construction + field access (SURVEY P7); output is
    // flattened back to scalars for the oracle (no structs in compared
    // output, SURVEY §5 rule 1).
    "q_project_struct" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), struct(
            col("p_brand").as("brand"),
            upper(col("p_type")).as("type_uc"),
            struct(col("p_size").cast("long").as("size"),
              col("p_retailprice").as("price")).as("meta")).as("s"))
        .select(col("p_partkey"),
          col("s.brand").as("brand"),
          col("s.type_uc").as("type_uc"),
          col("s.meta.size").as("size"),
          col("s.meta.price").as("price"))
        .orderBy(col("p_partkey"))),

    "q_filter_whereeq" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(TemplateFilters.whereEq(Map("l_returnflag" -> "R", "l_linestatus" -> "F")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_filter_any" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(TemplateFilters.anyTemplate(Seq(
          Map("l_returnflag" -> "R", "l_linestatus" -> "F"),
          Map("l_returnflag" -> "A"))))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_prefix_match" -> ((s, dir) =>
      Tables.part(s, dir)
        .withColumn("type_class", PrefixMatch.classify(col("p_type"), typeMap))
        .where(col("type_class").isNotNull)
        .select(col("p_partkey"), col("p_type"), col("type_class"))
        .orderBy(col("p_partkey"))),

    // -- joins --------------------------------------------------------
    "q_semi_join" -> ((s, dir) => {
      val bld = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      Tables.orders(s, dir)
        .join(broadcast(bld), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }),

    // customers with no URGENT order (the unfiltered variant is empty in
    // the referentially-complete test data — a zero-row oracle match is
    // weak evidence, so the right side is restricted)
    "q_anti_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q_broadcast_join" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))),

    // Two-level fallback enrichment (geonames.js:103–109 shape): probe the
    // fine dimension; where the probe "fails" (negative balance stands in
    // for parent==self), fall back to the coarse dimension.
    "q_join_fallback" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      Tables.orders(s, dir)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("o_orderkey"),
          when(col("c_acctbal") < 0, col("n_name")).otherwise(col("c_name")).as("parent_name"))
        .orderBy(col("o_orderkey"))
    }),

    "q_smj" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).hint("merge")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_items"))
        .orderBy(col("o_orderstatus"))
    }),

    "q_outer_join" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))),

    "q_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        ("p0_1k", 0.0, 1000.0), ("p1k_5k", 1000.0, 5000.0),
        ("p5k_10k", 5000.0, 10000.0), ("p10k_up", 10000.0, 1000000000.0))
        .toDF("band_name", "lo", "hi")
      Tables.lineitem(s, dir)
        .join(broadcast(bands),
          col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
        .groupBy(col("band_name"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("total"))
        .orderBy(col("band_name"))
    }),

    // As-of join (union + single shuffle + window; no nested-loop join)
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      AsOfJoin.asOfBackward(clicks, purchases, Seq("user_id"), "ts", "ts",
          Map("value" -> "last_purchase_value"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("last_purchase_value"), lit(-1.0)).as("last_purchase_value"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of: value of the NEXT purchase after each click
    "q_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      AsOfJoin.asOfForward(clicks, purchases, Seq("user_id"), "ts", "ts",
          Map("value" -> "next_purchase_value"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("next_purchase_value"), lit(-1.0)).as("next_purchase_value"))
        .orderBy(col("event_id"))
    }),

    // -- aggregations --------------------------------------------------
    "q_agg_group_count" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n")).orderBy(col("l_returnflag"))),

    "q_agg_multi" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= to_timestamp(lit("1999-12-31")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q_count_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"))
        .orderBy(col("l_returnflag"))),

    // HLL++ sketch — algorithm-specific estimates, no cross-engine oracle
    // (rows-only check); the exact variant is q_count_distinct above
    "q_approx_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_nd_parts"))
        .orderBy(col("l_returnflag"))),

    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))),

    "q_groupby_having" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n")).where(col("n") > 30)
        .orderBy(col("l_partkey"))),

    "q_grouping_sets" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("rflag"), col("lstatus"))),

    "q_pivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0.0)).as("qty_f"),
          coalesce(col("O"), lit(0.0)).as("qty_o"))
        .orderBy(col("l_returnflag"))),

    "q_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_price"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))),

    // the exact-percentile partial buffers are the CPU — a one-split
    // scan builds them in a single task; spread first (identity at real
    // scale, see Par; buffer merge is multiset union, order-free)
    "q_percentile" -> ((s, dir) =>
      Par.spreadSmallScan(Tables.lineitem(s, dir), col("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy(col("l_returnflag"))),

    // SQL surface + correlated scalar subquery (Catalyst decorrelates to
    // an aggregate + join — SURVEY §4 "built-in if expressed via SQL")
    "q_scalar_subquery" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("v_part")
      s.sql(
        """SELECT p.p_brand, round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
          |       count(*) AS n
          |FROM v_lineitem l JOIN v_part p ON l.l_partkey = p.p_partkey
          |WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
          |                      FROM v_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
          |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin)
    }),

    // -- sort / top-k ---------------------------------------------------
    "q_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // -- windows --------------------------------------------------------
    // the map-side WindowGroupLimit top-k prune is the CPU — a
    // one-split scan sorts in a single task; spread first so the prune
    // runs per-partition (identity at real scale, see Par)
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      Par.spreadSmallScan(Tables.lineitem(s, dir), col("l_orderkey"))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, dir).select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"),
          round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2).as("prev_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, dir).select(
          col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).cast("long").as("drank"),
          coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("o_orderkey")).over(w).as("first_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // -- set operations ---------------------------------------------------
    "q_union_all" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(lit("customer").as("rec_type"),
        col("c_custkey").as("id"), col("c_name").as("name"))
      val sup = Tables.supplier(s, dir).select(lit("supplier").as("rec_type"),
        col("s_suppkey").as("id"), col("s_name").as("name"))
      c.unionByName(sup).orderBy(col("rec_type"), col("id"))
    }),

    // parts never shipped in quantity > 45 (restricted right side for a
    // nonzero result — see q_anti_join note)
    "q_except" -> ((s, dir) =>
      Tables.part(s, dir).select(col("p_partkey"))
        .except(Tables.lineitem(s, dir).where(col("l_quantity") > 45.0)
          .select(col("l_partkey").as("p_partkey")))
        .orderBy(col("p_partkey"))),

    "q_intersect" -> ((s, dir) =>
      Tables.customer(s, dir).select(col("c_nationkey"))
        .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("c_nationkey")))
        .orderBy(col("c_nationkey"))),

    // -- scalar function library ------------------------------------------
    "q_string_funcs" -> ((s, dir) =>
      Tables.part(s, dir).select(
          col("p_partkey"),
          concat(lit("urn:part:"), col("p_partkey").cast("string")).as("uri"),
          upper(col("p_brand")).as("brand_uc"),
          regexp_replace(col("p_type"), "O", "0").as("type_sub"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy(col("p_partkey"))),

    "q_cast" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("long").as("qty_int"),
          col("l_linenumber").cast("string").as("line_str"),
          (col("l_discount") > 0.05).as("is_disc"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // NOT spread (r16 measured non-lever, same verdict as the r15
    // pre-sort-persist probe): a kernel spread bought ~0.2 s wall for
    // 3x the shuffle (14 → 42 MB) and 7x the task time — plain
    // arithmetic is cheaper to recompute serially than to exchange
    "q_math_funcs" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"),
          // floor(x*100+0.5)/100 instead of round(x, 2): identical double
          // arithmetic on both engines, immune to HALF_UP-vs-representation
          // divergence at exact .xx5 ties
          (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 100.0 + 0.5) / 100.0).as("charge"),
          round(abs(col("l_discount") - 0.05), 4).as("dev"),
          ceil(col("l_quantity")).cast("long").as("qty_ceil"),
          pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_date" -> ((s, dir) =>
      Tables.orders(s, dir).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od_str"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long").as("days_since"))
        .orderBy(col("o_orderkey"))),

    // get_json_object (JsonPath streaming skip) measured ~2.3x faster
    // than from_json+schema for single-field extraction at sf0.1
    "q_json" -> ((s, dir) =>
      Tables.events(s, dir).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))),

    "q_array_ops" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir).select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          element_at(toks, 1).as("first_token"),
          array_contains(toks, "spark").as("has_spark"))
        .orderBy(col("doc_id"))
    }),

    // Wide→long melt: each lineitem measure column becomes a
    // (measure, value) row — pure map-side row generation, no shuffle
    // before the output sort (Spark's native unpivot operator)
    "q_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_linenumber") === 1)
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy(col("l_orderkey"), col("measure"))),

    // Point-in-time SCD2 enrichment: attach to each fact probe the
    // dimension version valid AT its time — textbook form is a range
    // join on [seq_from, valid_to), which Spark would plan as a
    // nested loop; here it is the single-shuffle as-of union plan
    // (AsOfJoin), with validity-END semantics preserved because a
    // tombstone IS the latest version after a delete (probe lands on
    // the 'D' row → null payload, exactly the SCD2 gap). Time is
    // doubled (probe 2t+1 vs version 2t) so the as-of's strict
    // inequality implements the PIT's inclusive seq_from <= t.
    "q_pit_join" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val versions = orders.select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          lit(0L).as("_seq"), lit("U").as("_op"))
        .unionByName(orders.where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), round(col("o_totalprice") * 2, 2).as("price"),
            lit(1L).as("_seq"),
            when(col("o_orderkey") % 3 === 0, "D").otherwise("U").as("_op")))
        .unionByName(orders.where(col("o_orderkey") % 14 === 0)
          .select(col("o_orderkey"), round(col("o_totalprice") * 3, 2).as("price"),
            lit(2L).as("_seq"), lit("U").as("_op")))
        .select(col("o_orderkey"), col("price"), col("_op"), col("_seq"),
          (col("_seq") * 2).as("_vt"))
      val probes = orders.select(col("o_orderkey"),
        pmod(col("o_orderkey"), lit(4)).cast("long").as("probe_seq"),
        (pmod(col("o_orderkey"), lit(4)) * 2 + 1).cast("long").as("_pt"))
      AsOfJoin.asOfBackward(probes, versions, Seq("o_orderkey"), "_pt", "_vt",
          Map("price" -> "_price", "_op" -> "_vop", "_seq" -> "_vseq"))
        .select(col("o_orderkey"), col("probe_seq"),
          coalesce(when(col("_vop") === "U", col("_price")), lit(-1.0))
            .as("price_pit"),
          coalesce(when(col("_vop") === "U", col("_vseq")), lit(-1L))
            .as("ver_seq"))
        .orderBy(col("o_orderkey"))
    }),

    // Co-located bucketed join: both sides pre-bucketed on the join key
    // (process-lifetime fixture), merge-hinted so the plan exercises the
    // bucket layout — join AND key-clustered aggregate run with zero
    // exchanges (plan-locked in PlanSpec)
    "q_bucket_join" -> ((s, dir) => {
      val (ot, ct) = bucketedTablesFixture(s, dir)
      val o = s.table(ot)
      val c = s.table(ct)
      o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_custkey"))
    }),

    // Column profiling sweep: per-column one-row aggregates (each pass
    // scans ONE column — ReadSchema prunes — and shuffles only its
    // exact-distinct values)
    "q_profile" -> ((s, dir) =>
      Profiling.profile(Tables.lineitem(s, dir),
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
        .orderBy(col("col_name"))),

    // Pre-flight join-explosion advisor: exact output cardinality and
    // hottest-key fan-out of lineitem ⋈ orders from per-key COUNT
    // dimensions — the salting/broadcast decision input, computed
    // without running the join. Integer-exact throughout.
    "q_join_cardinality" -> ((s, dir) =>
      Profiling.joinCardinality(
        Tables.lineitem(s, dir), col("l_orderkey"),
        Tables.orders(s, dir), col("o_orderkey"))),

    // Multiset difference / intersection (EXCEPT ALL / INTERSECT ALL):
    // duplicate-preserving set algebra between two event partitions —
    // Spark rewrites both to a single count-compare aggregate, no join
    "q_except_all" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.where(col("event_id") % 2 === 0).select(col("user_id"), col("event_type"))
        .exceptAll(ev.where(col("event_id") % 2 === 1)
          .select(col("user_id"), col("event_type")))
        .orderBy(col("user_id"), col("event_type"))
    }),

    "q_intersect_all" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.where(col("event_id") % 2 === 0).select(col("user_id"), col("event_type"))
        .intersectAll(ev.where(col("event_id") % 2 === 1)
          .select(col("user_id"), col("event_type")))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Declarative data-quality gate (Deequ shape): row-local checks fold
    // into ONE conditional-count scan; uniqueness is a key-shuffled
    // count; referential integrity an anti-join count
    "q_constraints" -> ((s, dir) =>
      Profiling.checkConstraints(Tables.lineitem(s, dir),
          notNull = Seq("l_orderkey", "l_shipdate"),
          range = Seq(("l_quantity", 1.0, 50.0), ("l_discount", 0.0, 0.05)),
          pattern = Seq(("l_returnflag", "^[ARN]$")),
          unique = Seq("l_linenumber"),
          foreignKey = Seq(("l_orderkey", Tables.orders(s, dir), "o_orderkey")))
        .orderBy(col("check"), col("col_name"))),

    // 2-d box query over the Z-ordered layout: logically a plain filtered
    // aggregate (oracle = same SQL on raw parquet); physically the Morton
    // layout lets row-group stats prune both range predicates at once
    "q_zorder_scan" -> ((s, dir) =>
      s.read.parquet(zorderFixture(s, dir))
        .where(col("l_partkey").between(50, 99) &&
          col("l_suppkey").between(2, 5))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))),

    // Dynamic partition pruning: the fact scan's only priority
    // predicate arrives through the broadcast dimension join, so the
    // hive-partitioned fixture can only prune at RUNTIME — Catalyst
    // inserts a dynamicpruning subquery into the partition filter
    // (plan-asserted in PlanSpec). Logically a plain filtered join, so
    // the raw-orders oracle hash-matches.
    "q_dpp_prune" -> ((s, dir) => {
      val fact = s.read.parquet(partitionedOrdersFixture(s, dir))
      val dim = Tables.orders(s, dir).select(col("o_orderpriority")).distinct()
        .select(col("o_orderpriority").as("p_priority"),
          length(col("o_orderpriority")).as("p_len"))
        .where(col("p_len") >= 8) // selective only through the join
      fact.join(broadcast(dim), col("o_orderpriority") === col("p_priority"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderpriority"))
    }),

    // Distribution-position windows: percent_rank + cume_dist under a
    // tie-free total order (both are exact rationals of rank and n)
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Geo radius query over deterministic synthetic coordinates: the
    // haversine predicate is pure builtin trig (codegen'd, no UDF);
    // both engines filter on the ROUNDED distance
    "q_geo_radius" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey"),
        (pmod(col("c_custkey") * 37, lit(17000)) / 100.0 - 85.0).as("lat"),
        (pmod(col("c_custkey") * 73, lit(36000)) / 100.0 - 180.0).as("lon"))
      c.select(col("c_custkey"),
          round(Geo.haversineKm(col("lat"), col("lon"),
            lit(40.7), lit(-74.0)), 4).as("dist_km"))
        .where(col("dist_km") <= 6000.0)
        .orderBy(col("c_custkey"))
    }),

    // argmin/argmax as ONE aggregate pass via lexicographic struct
    // min/max (no window, no second shuffle) — ties broken by the key
    // inside the struct, so the pick is deterministic on both engines
    "q_minmax_by" -> ((s, dir) =>
      Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("_mx"),
          min(struct(col("o_totalprice"), col("o_orderkey"))).as("_mn"),
          count(lit(1)).as("n_orders"))
        .select(col("o_custkey"),
          col("_mx.o_orderkey").as("best_order"),
          round(col("_mx.o_totalprice"), 2).as("best_price"),
          col("_mn.o_orderkey").as("worst_order"),
          round(col("_mn.o_totalprice"), 2).as("worst_price"),
          col("n_orders"))
        .orderBy(col("o_custkey"))),

    // Nearest-city enrichment (the GeoNames "which admin center is
    // closest" query): 8-row city dim broadcast, haversine scored,
    // argmin via the same struct-min aggregate — one map-side join +
    // one customer-keyed aggregate, no window
    "q_geo_nearest" -> ((s, dir) => {
      import s.implicits._
      val cities = Seq(
        ("newyork", 40.7, -74.0), ("london", 51.5, -0.13),
        ("tokyo", 35.7, 139.7), ("sydney", -33.9, 151.2),
        ("saopaulo", -23.55, -46.63), ("cairo", 30.04, 31.24),
        ("mumbai", 19.08, 72.88), ("anchorage", 61.2, -149.9))
        .toDF("city", "clat", "clon")
      Tables.customer(s, dir).select(col("c_custkey"),
          (pmod(col("c_custkey") * 37, lit(17000)) / 100.0 - 85.0).as("lat"),
          (pmod(col("c_custkey") * 73, lit(36000)) / 100.0 - 180.0).as("lon"))
        .crossJoin(broadcast(cities))
        .select(col("c_custkey"), col("city"),
          round(Geo.haversineKm(col("lat"), col("lon"),
            col("clat"), col("clon")), 4).as("d"))
        .groupBy(col("c_custkey"))
        .agg(min(struct(col("d"), col("city"))).as("_m"))
        .select(col("c_custkey"), col("_m.city").as("nearest"),
          col("_m.d").as("dist_km"))
        .orderBy(col("c_custkey"))
    }),

    // All point pairs within 200 km via the grid-cell equi-join
    // (Geo.neighborPairs: 3×3 stamped cells with lon wraparound, exact
    // haversine verify on candidates only — never a cartesian). The
    // oracle IS the brute-force all-pairs join, so the hash-match proves
    // the grid's completeness empirically, antimeridian pairs included.
    "q_geo_pairs" -> ((s, dir) => {
      val pts = Tables.customer(s, dir).select(col("c_custkey").as("id"),
          (pmod(col("c_custkey") * 37, lit(17000)) / 100.0 - 85.0).as("lat"),
          (pmod(col("c_custkey") * 73, lit(36000)) / 100.0 - 180.0).as("lon"))
        .where(abs(col("lat")) <= 60.0) // polar caps need cap cells
      Geo.neighborPairs(pts, col("id"), col("lat"), col("lon"),
          radiusKm = 200.0, cellDeg = 4.0, maxAbsLat = 60.0)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Per-point k nearest within radius (Geo.knnWithinRadius) — the
    // OUTPUT-BOUNDED geo query a 100 TB deployment runs where
    // q_geo_pairs' full pair set is quadratic in point density: same
    // grid-cell equi-join, per-query row_number keeps k (ties by
    // neighbor id), output O(n·k) at any density. The oracle is the
    // brute-force haversine + row_number window, so the hash-match
    // proves grid completeness AND the top-k pick.
    "q_geo_knn_radius" -> ((s, dir) => {
      val pts = Tables.customer(s, dir).select(col("c_custkey").as("id"),
          (pmod(col("c_custkey") * 37, lit(17000)) / 100.0 - 85.0).as("lat"),
          (pmod(col("c_custkey") * 73, lit(36000)) / 100.0 - 180.0).as("lon"))
        .where(abs(col("lat")) <= 60.0) // polar caps need cap cells
      Geo.knnWithinRadius(pts, col("id"), col("lat"), col("lon"),
          radiusKm = 200.0, cellDeg = 4.0, maxAbsLat = 60.0, k = 3)
        .orderBy(col("id"), col("rn"))
    }),

    // Interval-overlap join via the bucketed equi-join
    // (Intervals.overlapJoin): click sessions × purchase sessions
    // [ts, ts + value seconds), 1-hour buckets. The oracle is the naive
    // overlap theta-join DuckDB can afford at test scale — the plan
    // Spark must NEVER use (no-BNLJ plan-locked in PlanSpec).
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def iv(t: String, suf: String) = ev.where(col("event_type") === t)
        .select(col("event_id").as(s"id_$suf"),
          unix_micros(col("ts")).as(s"s_$suf"),
          (unix_micros(col("ts")) +
            round(col("value") * 100).cast("long") * 10000L).as(s"e_$suf"))
      Intervals.overlapJoin(
          iv("click", "a"), col("s_a"), col("e_a"),
          iv("purchase", "b"), col("s_b"), col("e_b"),
          bucketWidth = 3600000000L)
        .select(col("id_a"), col("id_b"), col("overlap").as("overlap_us"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // The third join strategy: hint-forced shuffled hash join (no sort,
    // build-side hash per partition) — plan-locked in PlanSpec next to
    // the broadcast (J1) and sort-merge (J6) locks
    "q_shj" -> ((s, dir) =>
      Tables.lineitem(s, dir).hint("shuffle_hash")
        .join(Tables.orders(s, dir).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("o_orderpriority"))),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): the null
    // groups on both sides MUST pair up — a plain equi-join drops them
    "q_nullsafe_join" -> ((s, dir) => {
      val a = Tables.lineitem(s, dir)
        .groupBy(expr("nullif(l_returnflag, 'R')").as("k"))
        .agg(count(lit(1)).as("na"))
      val b = Tables.lineitem(s, dir)
        .groupBy(expr("nullif(l_returnflag, 'A')").as("k"))
        .agg(count(lit(1)).as("nb"))
      a.join(b, a("k") <=> b("k"))
        .select(a("k").as("k"), col("na"), col("nb"))
        .orderBy(col("k"))
    }),

    // Skew-mitigated join: the salted plan (row-salted big side ×
    // salt-replicated dimension) must produce EXACTLY the rows of the
    // plain join — the oracle is the unsalted join, so the skew
    // technique itself is hash-verified
    "q_salted_join" -> ((s, dir) =>
      Skew.saltedJoin(
          Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
            col("l_quantity")),
          Tables.supplier(s, dir)
            .select(col("s_suppkey").as("l_suppkey"), col("s_name")),
          key = "l_suppkey", salts = 8)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("s_name"))),

    // Nearest-in-time as-of join (backward AND forward candidates, the
    // closer wins; ties to the earlier side; exact-tie timestamps
    // excluded by both strict as-ofs): each error finds its nearest
    // same-user click via TWO single-shuffle as-of passes — never a
    // per-pair product; the oracle brute-forces min |gap| per error
    "q_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.where(col("event_type") === "error")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t_err"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("t_click"))
      val back = AsOfJoin.asOfBackward(errors, clicks, Seq("user_id"),
        "t_err", "t_click", Map("t_click" -> "t_back"))
      val both = AsOfJoin.asOfForward(back, clicks, Seq("user_id"),
        "t_err", "t_click", Map("t_click" -> "t_fwd"))
      both.select(col("user_id"), col("event_id"), col("t_err"),
          when(col("t_back").isNotNull &&
              (col("t_fwd").isNull ||
                (col("t_err") - col("t_back")) <= (col("t_fwd") - col("t_err"))),
            col("t_back")).otherwise(col("t_fwd")).as("t_nearest"))
        .where(col("t_nearest").isNotNull)
        .withColumn("gap_us", abs(col("t_err") - col("t_nearest")))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // first_value / nth_value / last_value coverage with explicitly
    // pinned ROWS frames (defaults differ across engines) — pure value
    // plumbing, no arithmetic, so the hash compare is byte-exact.
    // last_price deliberately uses the WHOLE-partition frame, not
    // (CURRENT ROW, UNBOUNDED FOLLOWING): Spark evaluates a growing
    // UNBOUNDED PRECEDING frame incrementally but re-scans an UNBOUNDED
    // FOLLOWING frame from every row — O(n²) per partition (300 s at
    // sf0.1 vs 0.7 s for this form; same value row-for-row because the
    // partition's last row is the same either way)
    "q_window_firstlast" -> ((s, dir) => {
      val base = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wUp = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = base.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderstatus"),
          first(col("o_totalprice")).over(wUp).as("first_price"),
          nth_value(col("o_totalprice"), 3).over(wUp).as("third_price"),
          last(col("o_totalprice")).over(wAll).as("last_price"))
        .orderBy(col("o_orderkey"))
    }),

    // Exact DISCRETE percentiles (value actually present in the data,
    // no interpolation) at p ∈ {.25,.5,.75,.9}: one group-partitioned
    // rank window over integer cents, rows kept where
    // rn = ceil(p·n) — both engines evaluate the same double p·n so
    // the pick is engine-identical even at float ceil boundaries
    "q_percentile_disc" -> ((s, dir) => {
      val base = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          expr("cast(round(value * 100) as bigint)").as("_c"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("_c"), col("event_id"))
      base
        .withColumn("_rn", row_number().over(w).cast("long"))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .withColumn("p", explode(typedLit(Seq(0.25, 0.5, 0.75, 0.9))))
        .where(col("_rn") === ceil(col("p") * col("_n")))
        .select(col("event_type"), col("p"),
          round(col("_c") / 100.0, 2).as("value_disc"), col("_n").as("n"))
        .orderBy(col("event_type"), col("p"))
    }),

    // Pivot with MULTIPLE aggregates per pivot value (count + exact
    // cents sum per event type across weekday rows) — Spark names the
    // columns {value}_{alias}; the oracle spells the same table with
    // portable FILTER aggregates
    "q_pivot_multi" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir)
        .select(
          expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("dow"),
          col("event_type"),
          expr("cast(round(coalesce(value, 0) * 100) as bigint)").as("_c"))
        .groupBy(col("dow")).pivot("event_type", types)
        .agg(count(lit(1)).as("n"), sum(col("_c")).as("cents"))
        .orderBy(col("dow"))
    }),

    // Incremental aggregate maintenance (materialized-view pattern):
    // the standing per-type (n, Σcents) state and a delta batch each
    // reduce to PARTIAL states which merge by summing — no rescan of
    // the base. The oracle aggregates the full table directly, so the
    // hash-match PROVES partial-merge ≡ recompute.
    "q_incremental_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("event_id"),
        expr("cast(round(coalesce(value, 0) * 100) as bigint)").as("_c"))
      def partial(df: DataFrame): DataFrame =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("_n"), sum(col("_c")).as("_sc"))
      val base = partial(ev.where(col("event_id") % 10 =!= 0))
      val delta = partial(ev.where(col("event_id") % 10 === 0))
      base.unionAll(delta).groupBy(col("event_type"))
        .agg(sum(col("_n")).as("n"), sum(col("_sc")).as("sum_cents"))
        .orderBy(col("event_type"))
    }),

    // Ordered string aggregation: the LISTAGG/STRING_AGG surface, made
    // engine-deterministic by sorting the collected set before joining
    // (plain string_agg order is evaluation-order-dependent)
    "q_string_agg" -> ((s, dir) =>
      Tables.orders(s, dir).groupBy(col("o_orderpriority"))
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))),

    // Full linear-regression aggregate family (slope/intercept already
    // in q_corr_regr): r², the three co-moment sums, means, count
    "q_regr_full" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(
          expr("round(regr_r2(l_extendedprice, l_quantity), 4)").as("r2"),
          expr("round(regr_sxx(l_extendedprice, l_quantity), 2)").as("sxx"),
          expr("round(regr_syy(l_extendedprice, l_quantity), 2)").as("syy"),
          expr("round(regr_sxy(l_extendedprice, l_quantity), 2)").as("sxy"),
          expr("round(regr_avgx(l_extendedprice, l_quantity), 4)").as("avgx"),
          expr("round(regr_avgy(l_extendedprice, l_quantity), 4)").as("avgy"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n"))
        .orderBy(col("l_returnflag"))),

    // Bitwise and boolean aggregates over exact integers — engine-exact
    // by construction
    "q_bit_bool_agg" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(expr("bit_and(user_id)").as("band"),
          expr("bit_or(user_id)").as("bor"),
          expr("bit_xor(user_id)").as("bxor"),
          expr("bool_and(value IS NOT NULL)").as("all_valued"),
          expr("bool_or(coalesce(value, 0) > 99)").as("any_big"))
        .orderBy(col("event_type"))),

    // Entity extraction (emails/URLs) — map-only regexp_extract_all
    // over deterministic synthetic contact lines; [.]-style classes
    // keep the pattern identical in Java and RE2 dialects
    "q_extract_entities" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
          concat(lit("contact user"), col("doc_id"),
            lit("@example.com or https://docs.example.com/p/"), col("doc_id"),
            lit(" plus "), col("text")).as("_t"))
        .select(col("doc_id"),
          expr("regexp_extract_all(_t, '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]{2,}', 0)")
            .as("_emails"),
          expr("regexp_extract_all(_t, 'https?://[^ ]+', 0)").as("_urls"))
        .select(col("doc_id"),
          size(col("_emails")).cast("long").as("n_emails"),
          element_at(col("_emails"), 1).as("first_email"),
          size(col("_urls")).cast("long").as("n_urls"),
          element_at(col("_urls"), 1).as("first_url"))
        .orderBy(col("doc_id"))),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_flagship" ->
      s"""SELECT type_class, l_returnflag,
         |       round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
         |       count(*) AS n_items
         |FROM (SELECT l.*, $typeCaseSql AS type_class
         |      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |      WHERE ((l_returnflag='R' AND l_linestatus='F') OR (l_returnflag='A'))
         |        AND l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority='1-URGENT')) t
         |WHERE type_class IS NOT NULL
         |GROUP BY type_class, l_returnflag
         |ORDER BY type_class, l_returnflag""".stripMargin,

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45.0 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scan_tsv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "q_scan_json" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "q_project_struct" ->
      """SELECT p_partkey, p_brand AS brand, upper(p_type) AS type_uc,
        |       cast(p_size AS BIGINT) AS size, p_retailprice AS price
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_filter_whereeq" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem
        |WHERE l_returnflag='R' AND l_linestatus='F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_any" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem
        |WHERE (l_returnflag='R' AND l_linestatus='F') OR (l_returnflag='A')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_prefix_match" ->
      s"""SELECT p_partkey, p_type, type_class FROM
         |(SELECT p_partkey, p_type, $typeCaseSql AS type_class FROM part) t
         |WHERE type_class IS NOT NULL ORDER BY p_partkey""".stripMargin,

    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority='1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_broadcast_join" ->
      """SELECT p_brand, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_fallback" ->
      """SELECT o_orderkey,
        |       CASE WHEN c.c_acctbal < 0 THEN n.n_name ELSE c.c_name END AS parent_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |             JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_smj" ->
      """SELECT o_orderstatus, round(sum(l_quantity),2) AS sum_qty, count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_range_join" ->
      """SELECT band_name, count(*) AS n_items, round(sum(l_extendedprice),2) AS total
        |FROM lineitem l JOIN (VALUES ('p0_1k',0.0,1000.0),('p1k_5k',1000.0,5000.0),
        |      ('p5k_10k',5000.0,10000.0),('p10k_up',10000.0,1000000000.0)) b(band_name,lo,hi)
        |  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
        |GROUP BY band_name ORDER BY band_name""".stripMargin,

    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, coalesce(r.value, -1.0) AS last_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type='purchase') r
        |  ON l.user_id = r.user_id AND l.ts > r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q_asof_forward" ->
      """SELECT l.event_id, l.user_id, coalesce(r.value, -1.0) AS next_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type='purchase') r
        |  ON l.user_id = r.user_id AND l.ts < r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q_agg_group_count" ->
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",

    "q_agg_multi" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(avg(l_discount),6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
        |       count(DISTINCT l_suppkey) AS nd_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rflag, coalesce(l_linestatus,'ALL') AS lstatus,
        |       round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,

    "q_groupby_having" ->
      """SELECT l_partkey, count(*) AS n FROM lineitem
        |GROUP BY l_partkey HAVING count(*) > 30 ORDER BY l_partkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rflag, coalesce(l_linestatus,'ALL') AS lstatus,
        |       count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rflag, lstatus""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  coalesce(round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END),2),0.0) AS qty_f,
        |  coalesce(round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END),2),0.0) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rflag, coalesce(l_linestatus,'ALL') AS lstatus,
        |       round(sum(l_extendedprice),2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT p.p_brand, round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
        |       count(*) AS n
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM
        |(SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        | FROM lineitem) t
        |WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total,
        |  round(coalesce(lag(o_totalprice,1) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey), 0.0),2) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  dense_rank() OVER w AS drank,
        |  coalesce(lead(o_totalprice,1) OVER w, -1.0) AS next_price,
        |  ntile(4) OVER w AS quartile,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_union_all" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS rec_type, c_custkey AS id, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT 'supplier' AS rec_type, s_suppkey AS id, s_name AS name FROM supplier) t
        |ORDER BY rec_type, id""".stripMargin,

    "q_except" ->
      """SELECT * FROM (SELECT p_partkey FROM part
        |EXCEPT SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity > 45.0) t
        |ORDER BY p_partkey""".stripMargin,

    "q_intersect" ->
      """SELECT * FROM (SELECT c_nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS c_nationkey FROM supplier) t ORDER BY c_nationkey""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey, concat('urn:part:', cast(p_partkey AS VARCHAR)) AS uri,
        |  upper(p_brand) AS brand_uc, replace(p_type,'O','0') AS type_sub,
        |  substring(p_name,1,8) AS name_prefix, cast(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_cast" ->
      """SELECT l_orderkey, l_linenumber, cast(floor(l_quantity) AS BIGINT) AS qty_int,
        |  cast(l_linenumber AS VARCHAR) AS line_str, (l_discount > 0.05) AS is_disc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor(l_extendedprice*(1-l_discount)*(1+l_tax)*100.0 + 0.5)/100.0 AS charge,
        |  round(abs(l_discount-0.05),4) AS dev,
        |  cast(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  cast(l_orderkey % 7 AS BIGINT) AS key_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_date" ->
      """SELECT o_orderkey, cast(year(o_orderdate) AS BIGINT) AS yr,
        |  cast(month(o_orderdate) AS BIGINT) AS mo,
        |  strftime(o_orderdate, '%Y-%m-%d') AS od_str,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  cast(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_json" ->
      """SELECT event_id, cast(json_extract_string(props,'$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_array_ops" ->
      """SELECT doc_id, cast(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  string_split(text,' ')[1] AS first_token,
        |  list_contains(string_split(text,' '), 'spark') AS has_spark
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_unpivot" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax
        |  FROM lineitem WHERE l_linenumber = 1)
        |SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value
        |FROM src
        |UNION ALL
        |SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM src
        |UNION ALL
        |SELECT l_orderkey, 'l_discount', l_discount FROM src
        |UNION ALL
        |SELECT l_orderkey, 'l_tax', l_tax FROM src
        |ORDER BY l_orderkey, measure""".stripMargin,

    // the textbook PIT form — a validity-range left join against the
    // lead-window SCD2 table — which the as-of union plan must
    // reproduce, tombstone gaps included
    "q_pit_join" ->
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
        |  FROM orders WHERE o_orderkey % 14 = 0),
        |v AS (SELECT o_orderkey, price, _seq, _op,
        |    lead(_seq, 1) OVER (PARTITION BY o_orderkey ORDER BY _seq)
        |      AS valid_to
        |  FROM chg),
        |p AS (SELECT o_orderkey, CAST(o_orderkey % 4 AS BIGINT) AS probe_seq
        |  FROM orders)
        |SELECT p.o_orderkey, p.probe_seq,
        |  coalesce(CASE WHEN v._op = 'U' THEN v.price END, -1.0) AS price_pit,
        |  coalesce(CASE WHEN v._op = 'U' THEN v._seq END,
        |           CAST(-1 AS BIGINT)) AS ver_seq
        |FROM p LEFT JOIN v ON p.o_orderkey = v.o_orderkey
        |  AND v._seq <= p.probe_seq
        |  AND (v.valid_to IS NULL OR p.probe_seq < v.valid_to)
        |ORDER BY p.o_orderkey""".stripMargin,

    // the Z-order layout is physical only; results equal the raw scan
    "q_zorder_scan" ->
      """SELECT l_returnflag, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 50 AND 99 AND l_suppkey BETWEEN 2 AND 5
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // logically a plain filtered join over orders — the partitioned
    // fixture layout changes only HOW the scan prunes, never the rows
    "q_dpp_prune" ->
      """WITH dim AS (SELECT DISTINCT o_orderpriority AS p FROM orders
        |             WHERE length(o_orderpriority) >= 8)
        |SELECT o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN dim ON o_orderpriority = p
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_profile" ->
      """SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT l_orderkey) AS n_distinct,
        |  CAST(min(l_orderkey) AS VARCHAR) AS min_value,
        |  CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(*),
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT l_quantity),
        |  CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR) FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', count(*),
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT l_returnflag),
        |  CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR) FROM lineitem
        |UNION ALL
        |SELECT 'l_shipdate', count(*),
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT l_shipdate),
        |  CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR) FROM lineitem
        |ORDER BY col_name""".stripMargin,

    // per-key count dimensions full-outer-joined; exact Σ cl·cr
    "q_join_cardinality" ->
      """WITH a AS (SELECT l_orderkey AS k, count(*) AS cl FROM lineitem GROUP BY 1),
        |b AS (SELECT o_orderkey AS k, count(*) AS cr FROM orders GROUP BY 1)
        |SELECT
        |  CAST(sum(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_both,
        |  CAST(sum(CASE WHEN cr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_left_only,
        |  CAST(sum(CASE WHEN cl IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_right_only,
        |  CAST(coalesce(sum(cl * cr), 0) AS BIGINT) AS est_output_rows,
        |  CAST(coalesce(max(cl * cr), 0) AS BIGINT) AS max_key_fanout
        |FROM a FULL OUTER JOIN b USING (k)""".stripMargin,

    "q_except_all" ->
      """SELECT * FROM (
        |  SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
        |  EXCEPT ALL
        |  SELECT user_id, event_type FROM events WHERE event_id % 2 = 1)
        |ORDER BY user_id, event_type""".stripMargin,

    "q_intersect_all" ->
      """SELECT * FROM (
        |  SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
        |  INTERSECT ALL
        |  SELECT user_id, event_type FROM events WHERE event_id % 2 = 1)
        |ORDER BY user_id, event_type""".stripMargin,

    "q_constraints" ->
      """WITH rl AS (SELECT
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |  CAST(sum(CASE WHEN l_quantity IS NOT NULL
        |    AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |  CAST(sum(CASE WHEN l_discount IS NOT NULL
        |    AND (l_discount < 0.0 OR l_discount > 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |  CAST(sum(CASE WHEN l_returnflag IS NOT NULL
        |    AND NOT regexp_matches(l_returnflag, '^[ARN]$') THEN 1 ELSE 0 END) AS BIGINT) AS c4
        |  FROM lineitem),
        |u AS (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) AS v FROM
        |  (SELECT count(*) AS n FROM lineitem GROUP BY l_linenumber
        |   HAVING count(*) > 1)),
        |fk AS (SELECT CAST(count(*) AS BIGINT) AS v FROM lineitem l
        |  WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |SELECT * FROM (
        |  SELECT 'not_null' AS "check", 'l_orderkey' AS col_name,
        |         c0 AS n_violations, c0 = 0 AS passed FROM rl
        |  UNION ALL SELECT 'not_null', 'l_shipdate', c1, c1 = 0 FROM rl
        |  UNION ALL SELECT 'range', 'l_quantity', c2, c2 = 0 FROM rl
        |  UNION ALL SELECT 'range', 'l_discount', c3, c3 = 0 FROM rl
        |  UNION ALL SELECT 'pattern', 'l_returnflag', c4, c4 = 0 FROM rl
        |  UNION ALL SELECT 'unique', 'l_linenumber', v, v = 0 FROM u
        |  UNION ALL SELECT 'foreign_key', 'l_orderkey->o_orderkey', v, v = 0 FROM fk)
        |ORDER BY "check", col_name""".stripMargin,

    // the bucketed layout is a physical property; logically it's a plain
    // equi-join + aggregate
    "q_bucket_join" ->
      """SELECT c_custkey, c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin,

    "q_salted_join" ->
      """SELECT s_name, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "q_window_dist" ->
      """SELECT o_custkey, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_geo_radius" ->
      """WITH c AS (SELECT c_custkey,
        |    (c_custkey * 37) % 17000 / 100.0 - 85.0 AS lat,
        |    (c_custkey * 73) % 36000 / 100.0 - 180.0 AS lon
        |  FROM customer),
        |d AS (SELECT c_custkey,
        |    round(12742.0 * asin(sqrt(
        |      sin(radians(40.7 - lat) / 2) * sin(radians(40.7 - lat) / 2)
        |      + cos(radians(lat)) * cos(radians(40.7))
        |        * sin(radians(-74.0 - lon) / 2) * sin(radians(-74.0 - lon) / 2))),
        |      4) AS dist_km
        |  FROM c)
        |SELECT c_custkey, dist_km FROM d
        |WHERE dist_km <= 6000.0 ORDER BY c_custkey""".stripMargin,

    // the struct-min/max argpicks are mirrored as deterministic
    // row_number window picks under the identical (value, key) order
    "q_minmax_by" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin,
        |  count(*) OVER (PARTITION BY o_custkey) AS n
        | FROM orders)
        |SELECT o_custkey,
        |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS best_order,
        |  round(max(CASE WHEN rmax = 1 THEN o_totalprice END), 2) AS best_price,
        |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS worst_order,
        |  round(max(CASE WHEN rmin = 1 THEN o_totalprice END), 2) AS worst_price,
        |  max(n) AS n_orders
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_geo_nearest" ->
      """WITH cities(city, clat, clon) AS (VALUES
        |  ('newyork', 40.7, -74.0), ('london', 51.5, -0.13),
        |  ('tokyo', 35.7, 139.7), ('sydney', -33.9, 151.2),
        |  ('saopaulo', -23.55, -46.63), ('cairo', 30.04, 31.24),
        |  ('mumbai', 19.08, 72.88), ('anchorage', 61.2, -149.9)),
        |c AS (SELECT c_custkey,
        |    (c_custkey * 37) % 17000 / 100.0 - 85.0 AS lat,
        |    (c_custkey * 73) % 36000 / 100.0 - 180.0 AS lon
        |  FROM customer),
        |d AS (SELECT c_custkey, city,
        |    round(12742.0 * asin(sqrt(
        |      sin(radians(clat - lat) / 2) * sin(radians(clat - lat) / 2)
        |      + cos(radians(lat)) * cos(radians(clat))
        |        * sin(radians(clon - lon) / 2) * sin(radians(clon - lon) / 2))),
        |      4) AS d
        |  FROM c CROSS JOIN cities)
        |SELECT c_custkey, city AS nearest, d AS dist_km FROM (
        |  SELECT c_custkey, city, d, row_number() OVER (
        |    PARTITION BY c_custkey ORDER BY d, city) AS rk FROM d) t
        |WHERE rk = 1 ORDER BY c_custkey""".stripMargin,

    // brute-force all-pairs with the identical rounded haversine: the
    // grid-cell join must reproduce this bit-for-bit (completeness,
    // incl. antimeridian wraparound pairs)
    "q_geo_pairs" ->
      """WITH c AS (SELECT c_custkey AS id,
        |    (c_custkey * 37) % 17000 / 100.0 - 85.0 AS lat,
        |    (c_custkey * 73) % 36000 / 100.0 - 180.0 AS lon
        |  FROM customer WHERE abs((c_custkey * 37) % 17000 / 100.0 - 85.0) <= 60.0)
        |SELECT id_a, id_b, dist_km FROM (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    round(12742.0 * asin(sqrt(
        |      sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
        |      + cos(radians(a.lat)) * cos(radians(b.lat))
        |        * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2))),
        |      4) AS dist_km
        |  FROM c a JOIN c b ON a.id < b.id) t
        |WHERE dist_km <= 200.0 ORDER BY id_a, id_b""".stripMargin,

    // brute-force per-point top-k with the identical rounded haversine
    // and the identical (dist, neighbor-id) tie-break — the grid +
    // WindowGroupLimit plan must reproduce this bit-for-bit
    "q_geo_knn_radius" ->
      """WITH c AS (SELECT c_custkey AS id,
        |    (c_custkey * 37) % 17000 / 100.0 - 85.0 AS lat,
        |    (c_custkey * 73) % 36000 / 100.0 - 180.0 AS lon
        |  FROM customer WHERE abs((c_custkey * 37) % 17000 / 100.0 - 85.0) <= 60.0),
        |d AS (SELECT q.id AS id, n.id AS nbr,
        |    round(12742.0 * asin(sqrt(
        |      sin(radians(n.lat - q.lat) / 2) * sin(radians(n.lat - q.lat) / 2)
        |      + cos(radians(q.lat)) * cos(radians(n.lat))
        |        * sin(radians(n.lon - q.lon) / 2) * sin(radians(n.lon - q.lon) / 2))),
        |      4) AS dist_km
        |  FROM c q JOIN c n ON q.id <> n.id),
        |r AS (SELECT id, nbr, dist_km, row_number() OVER (
        |    PARTITION BY id ORDER BY dist_km, nbr) AS rn
        |  FROM d WHERE dist_km <= 200.0)
        |SELECT id, nbr, dist_km, rn FROM r WHERE rn <= 3
        |ORDER BY id, rn""".stripMargin,

    // the naive overlap theta-join the bucketed plan must reproduce
    "q_interval_join" ->
      """WITH a AS (SELECT event_id AS id_a, epoch_ns(ts)//1000 AS s,
        |    epoch_ns(ts)//1000 + CAST(round(value*100) AS BIGINT)*10000 AS e
        |  FROM events WHERE event_type = 'click'),
        |b AS (SELECT event_id AS id_b, epoch_ns(ts)//1000 AS s,
        |    epoch_ns(ts)//1000 + CAST(round(value*100) AS BIGINT)*10000 AS e
        |  FROM events WHERE event_type = 'purchase')
        |SELECT id_a, id_b,
        |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
        |FROM a JOIN b ON a.s < b.e AND b.s < a.e
        |ORDER BY id_a, id_b""".stripMargin,

    "q_shj" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_nullsafe_join" ->
      """WITH a AS (SELECT nullif(l_returnflag, 'R') AS k, count(*) AS na
        |           FROM lineitem GROUP BY 1),
        |b AS (SELECT nullif(l_returnflag, 'A') AS k, count(*) AS nb
        |      FROM lineitem GROUP BY 1)
        |SELECT a.k AS k, na, nb FROM a JOIN b
        |  ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY k""".stripMargin,

    "q_asof_nearest" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS t
        |           FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, epoch_ns(ts)//1000 AS t
        |      FROM events WHERE event_type = 'click'),
        |p AS (SELECT e.user_id, e.event_id, e.t AS t_err, c.t AS t_click
        |      FROM e JOIN c ON c.user_id = e.user_id AND c.t <> e.t),
        |r AS (SELECT user_id, event_id, t_err, t_click,
        |    row_number() OVER (PARTITION BY user_id, event_id
        |      ORDER BY abs(t_err - t_click),
        |               CASE WHEN t_click < t_err THEN 0 ELSE 1 END) AS rk
        |  FROM p)
        |SELECT user_id, event_id, t_err, t_click AS t_nearest,
        |       abs(t_err - t_click) AS gap_us
        |FROM r WHERE rk = 1 ORDER BY user_id, event_id""".stripMargin,

    "q_window_firstlast" ->
      """SELECT o_orderkey, o_orderstatus,
        |  first_value(o_totalprice) OVER w_up AS first_price,
        |  nth_value(o_totalprice, 3) OVER w_up AS third_price,
        |  last_value(o_totalprice) OVER w_down AS last_price
        |FROM orders
        |WINDOW w_up AS (PARTITION BY o_orderstatus
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_down AS (PARTITION BY o_orderstatus
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "q_percentile_disc" ->
      """WITH b AS (SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, c,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY c, event_id) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM b),
        |p AS (SELECT unnest(CAST([0.25, 0.5, 0.75, 0.9] AS DOUBLE[])) AS p)
        |SELECT r.event_type, p.p, round(r.c / 100.0, 2) AS value_disc, r.n
        |FROM r CROSS JOIN p
        |WHERE r.rn = ceil(p.p * r.n)
        |ORDER BY 1, 2""".stripMargin,

    // portable FILTER aggregates spell the same pivoted table
    "q_pivot_multi" ->
      """SELECT ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS dow,
        |  count(*) FILTER (WHERE event_type = 'click') AS click_n,
        |  CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
        |    FILTER (WHERE event_type = 'click') AS BIGINT) AS click_cents,
        |  count(*) FILTER (WHERE event_type = 'error') AS error_n,
        |  CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
        |    FILTER (WHERE event_type = 'error') AS BIGINT) AS error_cents,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
        |  CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
        |    FILTER (WHERE event_type = 'purchase') AS BIGINT)
        |    AS purchase_cents,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup_n,
        |  CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
        |    FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup_cents,
        |  count(*) FILTER (WHERE event_type = 'view') AS view_n,
        |  CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
        |    FILTER (WHERE event_type = 'view') AS BIGINT) AS view_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // full recompute — the hash-match proves partial-merge ≡ recompute
    "q_incremental_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_string_agg" ->
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
        |    AS statuses,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_regr_full" ->
      """SELECT l_returnflag,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |  round(regr_sxx(l_extendedprice, l_quantity), 2) AS sxx,
        |  round(regr_syy(l_extendedprice, l_quantity), 2) AS syy,
        |  round(regr_sxy(l_extendedprice, l_quantity), 2) AS sxy,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
        |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_bit_bool_agg" ->
      """SELECT event_type,
        |  bit_and(user_id) AS band, bit_or(user_id) AS bor,
        |  bit_xor(user_id) AS bxor,
        |  bool_and(value IS NOT NULL) AS all_valued,
        |  bool_or(coalesce(value, 0) > 99) AS any_big
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_extract_entities" ->
      """WITH t AS (SELECT doc_id,
        |    'contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or https://docs.example.com/p/' ||
        |    CAST(doc_id AS VARCHAR) || ' plus ' || text AS _t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(_t,
        |    '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]{2,}')) AS BIGINT) AS n_emails,
        |  regexp_extract_all(_t,
        |    '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]{2,}')[1] AS first_email,
        |  CAST(len(regexp_extract_all(_t, 'https?://[^ ]+')) AS BIGINT)
        |    AS n_urls,
        |  regexp_extract_all(_t, 'https?://[^ ]+')[1] AS first_url
        |FROM t ORDER BY doc_id""".stripMargin,
  )
}
