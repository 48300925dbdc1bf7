package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver test tables (TESTDATA.md) plus the canonical
  * explicit schemas of every table this engine reads.
  *
  * Design notes (100 TB discipline, SURVEY.md §1.3):
  *   - Parquet is self-describing, so the parquet readers take the footer
  *     schema (no inference pass, no schema merge: `mergeSchema=false` is
  *     Spark's default and we rely on it — merging footers across millions
  *     of files is a driver-side bottleneck at scale).
  *   - Text sources (TSV, NDJSON) always get an explicit [[StructType]];
  *     `inferSchema` double-reads the data and is banned here.
  *   - Column pruning + predicate pushdown reach the scan because every
  *     downstream operator stays in Catalyst expressions.
  */
object Tables {

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** `events.ts` is parquet TIMESTAMP(NANOS); see [[events]]. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** SESSION-WIDE SIDE EFFECT (deliberate, same contract as the
    * nanosAsLong conf in [[events]]): parquet `timestamp[us]` columns
    * written WITHOUT the isAdjustedToUTC flag (arrow writes naive
    * timestamps that way) would otherwise surface as TIMESTAMP_NTZ,
    * which `unix_micros` / watermarks / window ranges all reject.
    * Disabling NTZ inference reads them as plain TimestampType in the
    * session timezone (pinned UTC by every entrypoint) — the exact
    * micros DuckDB's naive reading sees, with filter pushdown intact
    * (a per-column cast would block row-group pruning on timestamps).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The events table carries nanosecond-precision timestamps. Spark's
    * vectorized reader cannot represent NANOS as TimestampType; the
    * supported path is `spark.sql.legacy.parquet.nanosAsLong=true`, which
    * surfaces the column as raw nanos-since-epoch LongType. We normalize
    * back to a microsecond TimestampType column so every downstream
    * operator (windows, watermarks) sees a standard timestamp.
    *
    * SESSION-WIDE SIDE EFFECT (deliberate): the conf stays set for the
    * session — any later parquet read with a TIMESTAMP(NANOS) column will
    * also surface it as LongType instead of failing. It cannot be
    * set/restored around this call: DataFrames are lazy and the conf is
    * consulted again at execution-time schema conversion, so restoring it
    * here would make the returned frame fail downstream. `events` is the
    * only NANOS table in this engine's surface; callers introducing other
    * NANOS sources must normalize the same way (cast from nanos Long).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // exact integer floor division: `/` would be DOUBLE division,
        // whose ulp at ~1.7e18 nanos is 256 — ~12% of rows would round
        // UP to the next microsecond and diverge from the oracle's
        // epoch_ns//1000 floor (positive epochs, so DIV == floor)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }
}
