package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Baskets, Bpe, Cdc, Classifier, CorpusStats, CountMin, Curation, Dedup, Funnel, Geo, Graphs, HeavyHitters, Intervals, Ivf, Packing, Pq, PrefixMatch, Profiling, Retrieval, Sampling, Similarity, Skew, Stats, TemplateFilters, Timeseries}
import graft.functions.{DedupExpr, TextAnalytics}

/** Driver contract — declared query surface (SURVEY.md §2) with DuckDB
  * oracles. Every query: deterministic ORDER BY on a key, derived integer
  * columns cast to BIGINT on both sides, float aggregates rounded, no
  * structs/maps/arrays in the output (SURVEY.md §5 rule 1).
  */
object SparkEntry {

  /** Longest-prefix type map used by the flagship + prefix queries —
    * mirrors the reference's config.types lookup (geonames.js:129–132)
    * over `p_type`: PROMO exact, ECONOMY/MEDIUM via 3-char prefix,
    * SMALL/STANDARD via 1-char prefix, LARGE unmatched ⇒ dropped.
    */
  private val typeMap = Map(
    "PROMO" -> "promo", "ECO" -> "economy", "MED" -> "medium", "S" -> "small")

  /** Marker-trigram language profiles for q_lang_id (deterministic n-gram
    * heuristic; accuracy is not the point — the declared op is the scored
    * argmax pipeline, SURVEY.md §2.10).
    */
  private[graft] val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to "),
    "de" -> Seq(" der ", " und ", " die ", " ist "))

  private val typeCaseSql =
    """CASE WHEN p_type LIKE 'PROMO%' THEN 'promo'
      |     WHEN p_type LIKE 'ECO%'   THEN 'economy'
      |     WHEN p_type LIKE 'MED%'   THEN 'medium'
      |     WHEN p_type LIKE 'S%'     THEN 'small' END""".stripMargin

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qFlagship(spark, "/root/testdata/sf0.001")

  /** Fixture temp-dir registry: `File.deleteOnExit` cannot remove a
    * non-empty directory, so fixture roots register here and one
    * shutdown hook removes them recursively (best-effort — the JVM is
    * exiting either way).
    */
  private val fixtureRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(): Unit
    }
    fixtureRoots.forEach(rm(_))
  }))
  private def fixtureDir(prefix: String): java.io.File = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toFile
    fixtureRoots.add(tmp)
    tmp
  }

  /** Process-lifetime TSV fixture for q_scan_tsv: nation written as
    * unquoted TSV once per sfDir; the query itself is scan-only.
    */
  private val tsvFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def nationTsvFixture(s: SparkSession, dir: String): String =
    tsvFixtures.computeIfAbsent(dir, _ => {
      val tmp = fixtureDir("graft-tsv")
      val path = tmp.getAbsolutePath + "/nation"
      Tables.nation(s, dir).write.mode("overwrite").option("sep", "\t").csv(path)
      path
    })

  private val jsonFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def nationJsonFixture(s: SparkSession, dir: String): String =
    jsonFixtures.computeIfAbsent(dir, _ => {
      val tmp = fixtureDir("graft-json")
      val path = tmp.getAbsolutePath + "/nation"
      Tables.nation(s, dir).write.mode("overwrite").json(path)
      path
    })

  /** Process-lifetime Z-ordered parquet fixture for q_zorder_scan:
    * lineitem's (l_partkey, l_suppkey) plane laid out along the Morton
    * curve so 2-d box predicates prune at row-group granularity (the
    * pruning factor is metric-asserted in LayoutSpec; the declared query
    * is logically a plain filtered aggregate, so the raw-parquet oracle
    * hash-matches).
    */
  private val zorderFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def zorderFixture(s: SparkSession, dir: String): String =
    zorderFixtures.computeIfAbsent(dir, _ => {
      val tmp = fixtureDir("graft-zorder")
      val path = tmp.getAbsolutePath + "/lineitem_z"
      graft.sources.Layout.writeZordered(
        Tables.lineitem(s, dir).select("l_partkey", "l_suppkey",
          "l_returnflag", "l_quantity"),
        "l_partkey", "l_suppkey", path, numFiles = 16)
      path
    })

  /** Process-lifetime hive-partitioned parquet fixture for q_dpp_prune:
    * orders laid out as one directory per o_orderpriority. The fact
    * side's only priority predicate arrives THROUGH the dimension join,
    * so static partition pruning is impossible — the scan must prune at
    * runtime via dynamic partition pruning (plan-asserted in PlanSpec).
    */
  private val partFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def partitionedOrdersFixture(s: SparkSession, dir: String): String =
    partFixtures.computeIfAbsent(dir, _ => {
      val tmp = fixtureDir("graft-part")
      val path = tmp.getAbsolutePath + "/orders_p"
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
      path
    })

  /** Process-lifetime trigram posting index for q_substring_search: the
    * (gram, doc_id) table is built once per corpus (the 100 TB pattern —
    * index amortizes across queries), written gram-sorted so per-query
    * needle-gram IN-filters prune parquet row groups.
    */
  private val trigramFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def trigramIndexFixture(s: SparkSession, dir: String): String =
    trigramFixtures.computeIfAbsent(dir, _ => {
      val tmp = fixtureDir("graft-trigram")
      val path = tmp.getAbsolutePath + "/postings"
      Retrieval.trigramPostings(Tables.documents(s, dir), "doc_id", "text")
        .repartition(8, col("g")).sortWithinPartitions("g", "doc_id")
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Process-lifetime exact-k-NN edge fixture for q_pagerank: the graph
    * build is q_knn_graph's own (hash-verified) all-pairs anchor, and a
    * graph is built once then analyzed many times — so the edges
    * materialize once per sfDir and the declared query measures the
    * PageRank iterations, not a repeated O(n²) rebuild (the
    * q_scan_tsv/zorder fixture discipline).
    */
  private val knnEdgeFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def knnEdgesFixture(s: SparkSession, dir: String): String =
    knnEdgeFixtures.computeIfAbsent(dir, _ => {
      val tmp = fixtureDir("graft-knn")
      val path = tmp.getAbsolutePath + "/knn_edges"
      graft.operators.Retrieval.knnGraph(Tables.embeddings(s, dir),
          "vec_id", "embedding", k = 3)
        .select(col("src"), col("dst")).write.mode("overwrite").parquet(path)
      path
    })

  /** Process-lifetime bucketed-table fixture for q_bucket_join: orders
    * and customer saved bucketed by the join key with matching bucket
    * counts, so the join (and the downstream key-clustered aggregate)
    * plans with ZERO exchanges — the co-located layout a 100 TB corpus
    * would maintain for its hottest join key. Returns (orders, customer)
    * catalog table names.
    */
  /** Largest documents table the PNG/WAV asset fixtures will synthesize:
    * per-doc asset generation is driver-side by design (a bench fixture,
    * not an operator), so the collect is require()-capped — an oversized
    * fixture dir fails loudly naming this knob instead of OOMing.
    */
  private val MaxAssetFixtureDocs = 200000L
  private def boundedDocIds(s: SparkSession, dir: String, what: String): Array[Long] = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    val n = ids.count()
    require(n <= MaxAssetFixtureDocs,
      s"$what asset fixture: $n documents exceeds MaxAssetFixtureDocs=" +
        s"$MaxAssetFixtureDocs — point the fixture at a smaller corpus " +
        "or raise the knob")
    ids.collect().map(_.getLong(0))
  }

  private val pngFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Process-lifetime REAL-PNG asset fixture for q_image_decode: one
    * actual PNG per document, encoded with the JRE's ImageIO — width =
    * doc_id%64+1, height = doc_id%48+1, constant gray fill doc_id%256 —
    * so the decoded dimensions and pixel statistics are arithmetically
    * known and the oracle recomputes them without a codec. Generation is
    * driver-side but bounded (one tiny image per document; the fixture
    * discipline of the TSV/zorder/knn fixtures).
    */
  private def pngAssetsFixture(s: SparkSession, dir: String): String =
    pngFixtures.computeIfAbsent(dir, _ => {
      graft.multimodal.Multimodal.ensureImageIoInit() // in-memory stream cache
      val tmp = fixtureDir("graft-png")
      val path = tmp.getAbsolutePath + "/assets"
      val rows = boundedDocIds(s, dir, "PNG").toSeq.map { id =>
          val (w, h, g) = ((id % 64 + 1).toInt, (id % 48 + 1).toInt, (id % 256).toInt)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, "image", bos.toByteArray, "image/png", 0L)
        }
      import s.implicits._
      rows.toDF("asset_id", "media_type", "content", "format", "duration_ms")
        // a LocalRelation writes from ONE task → one file → every decode
        // downstream runs single-threaded; spread the corpus so codec
        // stages parallelize like a real multi-file asset table
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(path)
      path
    })

  private val gradPngFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Gradient-PNG fixture for the perceptual-hash queries: per-pixel
    * PSEUDO-RANDOM gray from an integer hash of (seed, x, y) — unlike
    * the constant-fill [[pngAssetsFixture]] (whose dHash is
    * degenerate), every image carries a distinct texture, so unrelated
    * images sit ~32 Hamming bits apart while PLANTED near-dups (each
    * doc_id ≡ 1 (mod 10) re-renders its predecessor's texture with a
    * small corner patch flipped) land within a few bits. All integer
    * arithmetic — the corpus is bit-reproducible.
    */
  private def gradPngAssetsFixture(s: SparkSession, dir: String): String =
    gradPngFixtures.computeIfAbsent(dir, _ => {
      graft.multimodal.Multimodal.ensureImageIoInit() // in-memory stream cache
      val tmp = fixtureDir("graft-gradpng")
      val path = tmp.getAbsolutePath + "/assets"
      val rows = boundedDocIds(s, dir, "gradient PNG").toSeq.map { id =>
          val seed = if (id % 10 == 1) id - 1 else id
          val (w, h) = ((seed % 32 + 16).toInt, (seed % 24 + 12).toInt)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var g = ((((seed ^ (x * 73856093L) ^ (y * 19349663L)) *
                2654435761L) >>> 24) & 0xFF).toInt
              // the near-dup perturbation: a 3x3 corner patch inverted
              if (id % 10 == 1 && x < 3 && y < 3) g = g ^ 0xFF
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, "image", bos.toByteArray, "image/png", 0L)
        }
      import s.implicits._
      rows.toDF("asset_id", "media_type", "content", "format", "duration_ms")
        // a LocalRelation writes from ONE task → one file → every decode
        // downstream runs single-threaded; spread the corpus so codec
        // stages parallelize like a real multi-file asset table
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Process-lifetime REAL-WAV asset fixture for q_audio_decode: one
    * actual 16-bit PCM mono WAV per document, encoded with the JRE's
    * `javax.sound.sampled` — 8 kHz, doc_id%800+1 frames, every sample
    * the constant doc_id%20000-10000 — so decoded frame counts and RMS
    * amplitudes are arithmetically known (RMS of a constant signal v is
    * exactly |v|/32768: v² is integer-exact and IEEE sqrt of a perfect
    * square is exact) and the oracle recomputes them without a codec.
    */
  private val wavFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def wavAssetsFixture(s: SparkSession, dir: String): String =
    wavFixtures.computeIfAbsent(dir, _ => {
      val tmp = fixtureDir("graft-wav")
      val path = tmp.getAbsolutePath + "/assets"
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val rows = boundedDocIds(s, dir, "WAV").toSeq.map { id =>
          val nFrames = (id % 800 + 1).toInt
          val v = (id % 20000 - 10000).toInt
          val pcm = new Array[Byte](nFrames * 2)
          var i = 0
          while (i < nFrames) { // little-endian 16-bit signed
            pcm(2 * i) = (v & 0xFF).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, "audio", bos.toByteArray, "audio/wav", 0L)
        }
      import s.implicits._
      rows.toDF("asset_id", "media_type", "content", "format", "duration_ms")
        // a LocalRelation writes from ONE task → one file → every decode
        // downstream runs single-threaded; spread the corpus so codec
        // stages parallelize like a real multi-file asset table
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(path)
      path
    })

  private val bucketFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def bucketedTablesFixture(s: SparkSession, dir: String): (String, String) =
    bucketFixtures.computeIfAbsent(dir, _ => {
      val suffix = (dir.hashCode.toLong & 0xffffffffL).toString
      val ot = s"graft_orders_b$suffix"
      val ct = s"graft_customer_b$suffix"
      // external tables under a fresh per-process temp dir: a managed
      // table's warehouse location outlives the in-memory catalog, so a
      // second JVM would hit LOCATION_ALREADY_EXISTS on saveAsTable
      val tmp = fixtureDir("graft-bucketed")
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").format("parquet")
        .option("path", s"${tmp.getAbsolutePath}/orders")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ot)
      Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment")
        .write.mode("overwrite").format("parquet")
        .option("path", s"${tmp.getAbsolutePath}/customer")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(ct)
      (ot, ct)
    })

  /** All-pairs embedding near-dup edges (shared by q_embedding_neardup /
    * q_dedup_clusters / q_dedup_keepers). The pushed-down filter uses the
    * UNROUNDED cosine with the exact HALF_UP boundary (round(x,6) ≥ 0.4
    * ⟺ x ≥ 0.3999995): predicate pushdown below the projection would
    * otherwise duplicate the kernel cosine for every pair; this way the
    * rounded value is only computed for surviving rows.
    */
  /** Hard cap for the exact all-pairs oracle anchor below: the cartesian
    * exists to anchor the LSH/semantic scale twins at test scale, and a
    * 100× input must fail loudly (naming this knob) rather than melt a
    * cluster with an O(n²) join.
    */
  private val MaxExactPairRows = 100000L

  private val embPairFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def embeddingPairs(s: SparkSession, dir: String): DataFrame = {
    val path = embPairFixtures.computeIfAbsent(dir, _ => {
      val emb = Tables.embeddings(s, dir)
      val nEmb = emb.count()
      require(nEmb <= MaxExactPairRows,
        s"embeddingPairs is the exact all-pairs oracle anchor (O(n^2)): " +
          s"$nEmb rows > MaxExactPairRows=$MaxExactPairRows — use the " +
          "q_embedding_neardup_lsh / q_semantic_dedup scale paths")
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      // process-lifetime PARQUET fixture (not a localCheckpoint): four
      // declared queries (neardup / clusters / clusters_star / keepers)
      // consume this pair set and CC re-reads it every iteration — the
      // O(n²) join must run ONCE per fixture dir, not once per consumer
      // scan. A file (vs checkpointed blocks) keeps the 230-query bench
      // process free of accumulating storage memory, and is what a real
      // pipeline would do with a shared intermediate anyway.
      val p = fixtureDir("graft-embpairs").getAbsolutePath + "/pairs"
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("_cos", Similarity.cosine(col("va"), col("vb")))
        .where(col("_cos") >= 0.3999995)
        .select(col("id_a"), col("id_b"), round(col("_cos"), 6).as("cos_sim"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Process-lifetime embeddings-table parquet fixture shared by the PQ
    * family (codebook training samples it, encode and probe each scan
    * it) — one materialization per fixture dir instead of one per query.
    */
  private val embCkFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def embeddingsCk(s: SparkSession, dir: String): DataFrame = {
    val path = embCkFixtures.computeIfAbsent(dir, _ => {
      val p = fixtureDir("graft-embck").getAbsolutePath + "/embeddings"
      Tables.embeddings(s, dir).write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Process-lifetime shared document-shingle table (id, source, sh):
    * the tokenize→shingle→hash kernel runs ONCE per fixture dir and the
    * materialized array column feeds the whole n-gram family (Jaccard,
    * containment, PPJoin, decontamination, cross-source, clusters/keepers)
    * — each consumer explodes/filters it map-side instead of re-scanning
    * the full text corpus through the kernel.
    */
  private val shingleFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def docShingles(s: SparkSession, dir: String): DataFrame = {
    val path = shingleFixtures.computeIfAbsent(dir, _ => {
      val p = fixtureDir("graft-shingles").getAbsolutePath + "/shingles"
      Tables.documents(s, dir).select(col("doc_id").as("id"), col("source"),
          DedupExpr.shingleHashes(TextAnalytics.tokens(col("text")), 3).as("sh"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Scale-safe near-dup pair source shared by the _ngram cluster/keeper
    * queries AND q_ngram_jaccard: exact n-gram Jaccard over the shared
    * shingle table (shuffles only 64-bit shingle hashes; no nested-loop
    * join). Materialized once per dir — three consumers, and the CC
    * iteration re-reads pairs per round.
    */
  private val ngramPairFixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ngramPairs(s: SparkSession, dir: String): DataFrame = {
    val path = ngramPairFixtures.computeIfAbsent(dir, _ => {
      val p = fixtureDir("graft-ngrampairs").getAbsolutePath + "/pairs"
      Dedup.ngramJaccardPairsPre(docShingles(s, dir), threshold = 0.8)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Drop every persisted RDD still registered with the context —
    * Bench calls this between queries. After the parquet-fixture
    * conversion above, NO cross-query state lives in block storage:
    * anything in `getPersistentRDDs` is a dead per-query internal
    * `localCheckpoint` (Dedup/Curation/CC intermediates) whose blocks
    * would otherwise accumulate across 230 queries × 2 reps until late
    * queries pay eviction/GC pressure that the same queries don't pay
    * in isolation (the r6 driver-total artifact). Spark's own
    * ContextCleaner frees these only after a full GC, which an 8 GiB
    * heap may never run in a 4-minute bench.
    */
  def releaseDeadCheckpoints(s: SparkSession): Unit =
    s.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = false))

  // ------------------------------------------------------------ queries

  /** The reference `transform` pipeline re-expressed over the test tables
    * (SURVEY.md §7 M2): scan → OR-of-equality-template filter →
    * left-semi whitelist → broadcast join → longest-prefix classification
    * (unmatched dropped) → aggregate → stable sort. Single shuffle (the
    * final groupBy); both joins broadcast.
    */
  private def qFlagship(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val urgent = Tables.orders(s, dir)
      .where(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val parts = Tables.part(s, dir)
      .withColumn("type_class", PrefixMatch.classify(col("p_type"), typeMap))
      .where(col("type_class").isNotNull)
      .select(col("p_partkey"), col("type_class"))
    li.where(TemplateFilters.anyTemplate(Seq(
        Map("l_returnflag" -> "R", "l_linestatus" -> "F"),
        Map("l_returnflag" -> "A"))))
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("type_class"), col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("type_class"), col("l_returnflag"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    "q_percentile" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
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
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables.lineitem(s, dir)
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

    // -- text analytics (LLM-pipeline extensions) ---------------------------
    "q_token_count" -> ((s, dir) =>
      Tables.documents(s, dir).groupBy(col("lang"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))),

    "q_text_quality" -> ((s, dir) =>
      Tables.documents(s, dir).select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars2"),
          TextAnalytics.tokenCount(col("text")).cast("long").as("n_tokens"),
          round(TextAnalytics.stopwordRatio(col("text"), Seq("the", "a", "of", "and")), 4)
            .as("stopword_ratio"))
        .orderBy(col("doc_id"))),

    "q_explode_freq" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(20)),

    "q_lang_id" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalytics.langId(col("text"), SparkEntry.langProfiles).as("lang_guess"))
        .orderBy(col("doc_id"))),

    "q_quality_score" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalytics.qualityScore(col("text"), Seq("the", "a", "of", "and")).as("quality"))
        .orderBy(col("doc_id"))),

    // Gopher-rule battery: per-rule measured values + boolean verdicts +
    // conjunctive keep — the named-rule filter that diagnoses WHY a doc
    // drops, where q_quality_score only ranks (map-only; integer counts
    // until the final divisions so every threshold compare is engine-exact;
    // \s+ tokenization, the paper's 8 stopwords, and '#'/'…'/'...' symbols)
    "q_gopher_rules" -> ((s, dir) =>
      Curation.gopherRules(Tables.documents(s, dir), "doc_id", "text",
          minWords = 45L, maxWords = 100000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))),

    // Per-language character-class mix — the script/charset profile run
    // before choosing tokenizers and language filters (a CJK corpus
    // labeled 'en' shows up as a nonascii_frac spike). Exact integer
    // char counts per class (pairwise-disjoint: ASCII alpha / digit /
    // ASCII whitespace / non-ASCII / remainder = ASCII punctuation),
    // single final divisions, identical regex trees in the oracle.
    "q_script_mix" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("lang"),
        length(col("text")).as("_n"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("_alpha"),
        length(regexp_replace(col("text"), "[^0-9]", "")).as("_digit"),
        length(regexp_replace(col("text"), "[^ \\t\\n\\r]", "")).as("_ws"),
        length(regexp_replace(col("text"), "[\\x00-\\x7F]", "")).as("_na"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("n_chars"),
          sum(col("_alpha")).as("_sa"), sum(col("_digit")).as("_sd"),
          sum(col("_ws")).as("_sw"), sum(col("_na")).as("_sn"))
        .select(col("lang"), col("n_docs"), col("n_chars"),
          round(col("_sa").cast("double") / col("n_chars"), 6).as("alpha_frac"),
          round(col("_sd").cast("double") / col("n_chars"), 6).as("digit_frac"),
          round(col("_sw").cast("double") / col("n_chars"), 6).as("ws_frac"),
          round(col("_sn").cast("double") / col("n_chars"), 6).as("nonascii_frac"),
          round((col("n_chars") - col("_sa") - col("_sd") - col("_sw") - col("_sn"))
            .cast("double") / col("n_chars"), 6).as("punct_frac"))
        .orderBy(col("lang"))
    }),

    // Deterministic corpus sampling (training-pipeline downsampling).
    // Both use the md5-hex decision variant for engine-exact oracle
    // parity; Sampling.hashSample (xxhash64, map-only) is the production
    // path and is property-tested instead.
    "q_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedExact(Tables.documents(s, dir), col("lang"), col("doc_id"), 10)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    "q_hash_sample" -> ((s, dir) =>
      Sampling.md5Sample(Tables.documents(s, dir), col("doc_id"), "2")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Gopher-style repetition signals via the one-pass kernel (distinct
    // tokens / top-token frequency / distinct adjacent bigrams in a
    // single scan; shuffle-free)
    "q_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Curation.repetitionStats(col("text")).as("st"))
        .select(col("doc_id"),
          col("st.n_tokens").as("n_tokens"),
          round(col("st.dup_token_frac"), 4).as("dup_token_frac"),
          round(col("st.top_token_frac"), 4).as("top_token_frac"),
          round(col("st.dup_bigram_frac"), 4).as("dup_bigram_frac"))
        .orderBy(col("doc_id"))),

    // PII scrubbing: the corpus itself is PII-free, so each doc gets a
    // deterministic doc_id-derived PII suffix appended IN THE QUERY (both
    // engines build the identical string) — the oracle then verifies real
    // extraction counts and the md5 of the actually-redacted text, not
    // vacuous zeros. Pattern behavior on hand-written PII is unit-tested
    // in CurationSpec.
    "q_pii_scrub" -> ((s, dir) => {
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com ip 10.0."), (col("doc_id") % 200).cast("string"),
        lit(".7 call 415-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      Tables.documents(s, dir)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"), Curation.piiCounts(col("aug")).as("pii"),
          md5(Curation.scrubPii(col("aug")).cast("binary")).as("redacted_md5"))
        .select(col("doc_id"),
          col("pii.n_emails").as("n_emails"),
          col("pii.n_ips").as("n_ips"),
          col("pii.n_phones").as("n_phones"),
          col("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // chained-xxhash64 fingerprint + lookaround tokenizer: not expressible
    // in DuckDB SQL → rows-only check
    "q_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalytics.fingerprint(col("text")).as("fp"),
          size(TextAnalytics.bpeishTokens(col("text"))).cast("long").as("n_bpe_tokens"))
        .orderBy(col("doc_id"))),

    // -- dedup (LLM-pipeline extensions) -------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir).groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keeper_id"))),

    "q_dedup_hash" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keeper_id"))),

    // Exact sub-document dedup at passage granularity: every distinct
    // 20-word passage keeps only its corpus-wide first occurrence and
    // documents are reassembled from the survivors (text-level exact
    // suffix-dedup analog; see Dedup.passageDedup scale notes)
    "q_passage_dedup" -> ((s, dir) =>
      Dedup.passageDedup(Tables.documents(s, dir), "doc_id", "text", 20)
        .select(col("id").as("doc_id"), col("dedup_text"), col("n_kept"))
        .orderBy(col("doc_id"))),

    // Corpus-frequency boilerplate removal (CCNet/RefinedWeb line-dedup
    // analog at passage granularity): passages in ≥2 distinct documents
    // are dropped from EVERY document — unlike q_passage_dedup's
    // first-occurrence-wins (see Curation.boilerplatePassages scale notes)
    "q_boilerplate" -> ((s, dir) =>
      Curation.boilerplatePassages(Tables.documents(s, dir), "doc_id", "text",
          passageWords = 10, minDocs = 2)
        .select(col("id").as("doc_id"), col("n_passages"), col("n_kept"),
          col("clean_text"))
        .orderBy(col("doc_id"))),

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

    // K-means corpus clustering (Lloyd over the map-only nearest-centroid
    // kernel; deterministic lowest-id seeds) — cluster occupancy as the
    // declared surface (no oracle: k-means isn't SQL-expressible; rows
    // pinned in EntrySpec, clustering quality implied by IVF recall
    // benches which share this build)
    "q_kmeans_sizes" -> ((s, dir) => {
      val (assignments, _) = Ivf.build(Tables.embeddings(s, dir),
        "vec_id", "embedding", numCentroids = 8, lloydIters = 2)
      assignments.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("cluster_id"))
    }),

    // Sequence packing (GPT-style concat-and-chunk): global token start
    // offsets from a two-level prefix sum (per-block totals broadcast +
    // within-block windows — never a single-partition window over the
    // corpus), sequences = floor(start/budget); per-sequence occupancy
    "q_pack_sequences" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        size(TextAnalytics.tokens(col("text"))).cast("long").as("toks"))
      Packing.packSequences(docs, "doc_id", "toks", budget = 512L, blockSize = 64L)
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .orderBy(col("seq_id"))
    }),

    // RAG token-window chunking: overlapping size-40/stride-30 windows,
    // map-only fan-out (chunk count + slices all ride the scan)
    "q_chunk_tokens" -> ((s, dir) =>
      Packing.chunkByTokens(Tables.documents(s, dir), "doc_id", "text",
          chunkSize = 40, stride = 30)
        .select(col("id").as("doc_id"), col("chunk_idx"), col("chunk_text"),
          col("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Directed n-gram containment (quote/subset detection): pairs where
    // either direction's |A∩B|/|A| clears the threshold — catches
    // wholesale inclusion that symmetric Jaccard dilutes away
    "q_containment" -> ((s, dir) =>
      Dedup.ngramContainmentPairsPre(docShingles(s, dir), threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("cont_ab"), 6).as("cont_ab"),
          round(col("cont_ba"), 6).as("cont_ba"))
        .orderBy(col("id_a"), col("id_b"))),

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

    // Exact duplicate-SPAN report (Lee et al. substring-level dedup):
    // maximal runs of corpus-duplicated positional 3-grams per doc.
    // Spark counts 64-bit positional shingle hashes; DuckDB counts the
    // shingle strings — identical barring a ~2^-64 collision.
    "q_dup_spans" -> ((s, dir) =>
      Curation.duplicateSpans(Tables.documents(s, dir), "doc_id", "text",
          k = 3, minRun = 3)
        .orderBy(col("doc_id"), col("span_start"))),

    // Two-sample KS distribution test (click vs error cents): per-value
    // count dimension → one sanctioned global cumsum window → max CDF gap
    "q_ks_test" -> ((s, dir) =>
      Stats.ksTest(Tables.events(s, dir), col("event_type"),
        expr("cast(round(value * 100) as bigint)"), "click", "error")),

    // Exact modal weekday per event type (count desc, value asc tie-break)
    "q_mode" -> ((s, dir) =>
      Stats.mode(
          Tables.events(s, dir).select(col("event_type"),
            expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("weekday")),
          col("event_type"), col("weekday"))
        .select(col("g").as("event_type"), col("mode_value"), col("n_occ"))
        .orderBy(col("event_type"))),

    // Pairwise Welch t-tests across event types over integer cents:
    // corpus → one exact (n, Σc, Σc²) row per group, then pure double
    // arithmetic on the bounded dim×dim pair table — engine-exact
    "q_welch_ttest" -> ((s, dir) =>
      Stats.welchTTest(Tables.events(s, dir), col("event_type"),
          expr("cast(round(value * 100) as bigint)"))
        .orderBy(col("g_a"), col("g_b"))),

    // CUPED variance reduction: per-user pre/post cents split at the
    // global time midpoint (one-row bounds aggregate, broadcast), arms
    // from user parity, adjusted mean/variance as identities on exact
    // per-arm sums — no per-row adjusted metric ever materializes
    "q_cuped" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"), unix_micros(col("ts")).as("us"),
        expr("cast(round(coalesce(value, 0) * 100) as bigint)").as("cents"))
      val bounds = ev.agg(
        floor((min(col("us")) + max(col("us"))) / 2).cast("long").as("mid"))
      val units = ev.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"))
        .agg(sum(when(col("us") < col("mid"), col("cents")).otherwise(0L)).as("x"),
          sum(when(col("us") >= col("mid"), col("cents")).otherwise(0L)).as("y"))
        .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
      Stats.cuped(units, col("arm"), col("x"), col("y"))
        .withColumnRenamed("g", "arm")
        .orderBy(col("arm"))
    }),

    // Benford leading-digit audit of the value column (fraud/synthetic-
    // data signal): digit from the integer's decimal string, one 9-row
    // aggregate
    "q_benford" -> ((s, dir) =>
      Stats.benford(Tables.events(s, dir),
          expr("cast(round(value * 100) as bigint)"))
        .orderBy(col("digit"))),

    // Boolean AND retrieval via posting-list intersection: the IN-filter
    // runs before the shuffle, so cost is the query terms' posting lists,
    // not the corpus
    "q_bool_retrieval" -> ((s, dir) =>
      Retrieval.booleanRetrieval(Tables.documents(s, dir), "doc_id", "text",
          Seq("spark", "window", "join"), minMatch = 3)
        .orderBy(col("doc_id"))),

    // Flesch-style reading ease with vowel-run syllable estimate —
    // map-only regexp_count arithmetic on exact integer counts
    "q_readability" -> ((s, dir) =>
      Tables.documents(s, dir)
        .where(TextAnalytics.tokenCount(col("text")) > 0)
        .select(col("doc_id"),
          TextAnalytics.tokenCount(col("text")).cast("long").as("n_words"),
          TextAnalytics.vowelGroups(col("text")).cast("long").as("n_vowel_groups"),
          round(TextAnalytics.readingEase(col("text")), 4).as("reading_ease"))
        .orderBy(col("doc_id"))),

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

    // Single-source BFS hop distances over the symmetrized k-NN graph:
    // frontier iteration, one vertex-keyed join + min-aggregate per
    // round — oracled against a DuckDB recursive CTE over the same graph
    "q_bfs" -> ((s, dir) =>
      Graphs.bfsDistances(s.read.parquet(knnEdgesFixture(s, dir)),
          "src", "dst", sourceId = 0L, maxHops = 4)
        .orderBy(col("id"))),

    // One-way ANOVA F across event types on integer cents — the
    // k-sample experiment gate, exact (n, Σc, Σc²) reduction per group
    "q_anova" -> ((s, dir) =>
      Stats.anovaF(Tables.events(s, dir), col("event_type"),
        expr("cast(round(value * 100) as bigint)"))),

    // Hybrid retrieval: reciprocal-rank fusion of lexical BM25 and
    // embedding-cosine rankings (query = the terms + vector 0) — ranks
    // from bounded predecessor-count joins over each top-100, fused by
    // one id-keyed aggregate; no windows, no score calibration
    "q_rrf_fusion" -> ((s, dir) => {
      val bm = Retrieval.bm25(Tables.documents(s, dir), "doc_id", "text",
          Seq("vector", "hash", "stream"))
        .select(col("id"), round(col("score"), 4).as("score"))
      val emb = embeddingsCk(s, dir)
      val qv = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("_qv"))
      val cos = emb.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id").as("id"),
          round(Similarity.cosine(col("embedding"), col("_qv")), 6).as("score"))
      Retrieval.rrfFusion(
        Seq(Retrieval.rankFromScores(bm, 100),
          Retrieval.rankFromScores(cos, 100)), k = 60, topN = 20)
    }),

    // Train/val/test leakage audit: near-dup pairs (the shared 0.8-
    // Jaccard pair source) whose endpoints land in DIFFERENT md5-hash
    // splits — the contamination a random split inflicts on held-out
    // metrics. Bounded (split, split) output; pair source checkpointed.
    "q_split_leakage" -> ((s, dir) => {
      val u16 = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 4), 16, 10).cast("long")
      val splits = Tables.documents(s, dir).select(col("doc_id"),
        when(u16 < 52429L, "train").when(u16 < 58982L, "val")
          .otherwise("test").as("split"))
      ngramPairs(s, dir)
        .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")),
          Seq("id_a"))
        .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")),
          Seq("id_b"))
        .where(col("split_a") =!= col("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_leaked_pairs"))
        .orderBy(col("split_a"), col("split_b"))
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

    // Exact weighted median (doc length weighted by token count) per
    // source: one (group,value) reduce + one group-keyed window over the
    // collapsed dimension — integer-exact end to end
    "q_weighted_median" -> ((s, dir) =>
      Stats.weightedMedian(
          Tables.documents(s, dir).select(col("source"), col("n_chars"),
            TextAnalytics.tokenCount(col("text")).cast("long").as("_w")),
          col("source"), col("n_chars"), col("_w"))
        .select(col("g").as("source"), col("weighted_median"),
          col("total_weight"))
        .orderBy(col("source"))),

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

    // Exact substring search through a PREBUILT trigram inverted index
    // (pg_trgm pattern): the needle-gram IN-filter is pushed into the
    // gram-sorted posting parquet, candidates intersect via one
    // doc-keyed count, contains-verify touches candidates only
    "q_substring_search" -> ((s, dir) =>
      Retrieval.substringSearchIndexed(
          s.read.parquet(trigramIndexFixture(s, dir)),
          Tables.documents(s, dir), "doc_id", "text",
          needle = "batch batch")
        .orderBy(col("doc_id"))),

    // Bounded-depth EWMA over per-user cents series: 8 α=0.5 lag terms
    // inside ONE window — exact binary weights, engine-exact arithmetic
    "q_ewma" -> ((s, dir) =>
      Timeseries.ewma(Tables.events(s, dir).where(col("value").isNotNull),
          "user_id", unix_micros(col("ts")), col("event_id"),
          expr("cast(round(value * 100) as bigint)"), alpha = 0.5, depth = 8)
        .select(col("key").as("user_id"), col("micros"),
          col("tie").as("event_id"), col("ewma"))
        .orderBy(col("user_id"), col("micros"), col("event_id"))),

    // Deterministic weighted data mixture: per-source md5-threshold keep
    // rates (upsample curated, downsample crawl, drop the rest) — pure
    // function of (id, source), map-only, engine-exact
    "q_source_mixture" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.where(Packing.sourceMixture(docs, col("doc_id"), col("source"),
          Map("src0" -> "ff", "src1" -> "c0", "src2" -> "80", "src3" -> "40")))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        .orderBy(col("source"))
    }),

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

    // Heavy hitters via a mergeable Misra-Gries summary (bounded k-entry
    // state per partial aggregate — the frequent-tokens tool when exact
    // groupBy would shuffle billions of distinct keys). k=64 exceeds this
    // corpus's vocabulary, so the summary is provably exact and the
    // DuckDB exact GROUP BY oracle hash-matches; the lossy regime's
    // error bounds are property-tested in HeavyHittersSpec
    "q_heavy_hitters" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextAnalytics.tokens(col("text"))).as("tok"))
        .agg(HeavyHitters.misraGries(col("tok"), 64).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e._1").as("token"), col("e._2").as("est_count"))
        .orderBy(col("est_count").desc, col("token"))),

    // Mergeable-sketch quantiles (GK summaries): the percentile surface
    // for cardinalities where exact sort-based percentile is the wrong
    // plan (no oracle: sketch merge order is engine-specific; the exact
    // variant q_percentile IS hash-verified against DuckDB). Flattened to
    // scalar columns — the driver's rows-only path sorts the dump with
    // pandas, which cannot hash an array<double> cell (r03 err).
    "q_approx_quantile" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
          .as("q"))
        .select(col("l_returnflag"), col("q")(0).as("p25"),
          col("q")(1).as("p50"), col("q")(2).as("p75"))
        .orderBy(col("l_returnflag"))),

    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          numHashes = 32, bands = 8, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))),

    "q_ngram_jaccard" -> ((s, dir) =>
      ngramPairs(s, dir)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // Incremental dedup: the docs with id % 10 == 0 play the "new
    // crawl batch"; only their shingles probe the (shared, persisted-
    // index-shaped) corpus shingle table — candidate cost O(|new|·df),
    // output = the full self-join's pairs restricted to new-touching
    // ones (the oracle states it exactly that way).
    "q_incremental_dedup" -> ((s, dir) =>
      Dedup.incrementalNgramPairs(docShingles(s, dir),
          col("id") % 10 === 0, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

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

    // Temperature-scaled mixture allocation (w ∝ share^0.5): the
    // sampling-rate table a multi-source pretraining mix is built from.
    "q_mixture_weights" -> ((s, dir) =>
      Packing.mixtureWeights(Tables.documents(s, dir), col("source"),
          TextAnalytics.tokenCount(col("text")).cast("long"), alpha = 0.5)
        .orderBy(col("source"))),

    // Duplicate-inflation report over the shared n-gram pair source:
    // cluster-size histogram + tokens a keep-min-id dedup would drop —
    // the decision table read before paying for the full dedup pass.
    // Oracled end-to-end (recursive-CTE components + the same aggregates).
    "q_dup_inflation" -> ((s, dir) =>
      CorpusStats.dupInflation(Tables.documents(s, dir), "doc_id", "text",
          ngramPairs(s, dir))
        .orderBy(col("cluster_size"))),

    // Corpus-driven stopword mining: document-frequency ratio ≥ 0.6.
    "q_stopwords" -> ((s, dir) =>
      CorpusStats.stopwords(Tables.documents(s, dir), "text", 0.6)
        .orderBy(col("token"))),

    // OOV rate per doc against the corpus's own top-30 tokens.
    "q_oov_rate" -> ((s, dir) =>
      CorpusStats.oovRate(Tables.documents(s, dir), "doc_id", "text", 30)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_oov"),
          col("oov_rate"))
        .orderBy(col("doc_id"))),

    // First-occurrence shingle novelty (information-gain curve of the
    // crawl, id order = arrival order). Shares the checkpointed shingle
    // table; hashes engine-side vs shingle strings oracle-side (the
    // q_cross_source 2^-64 collision argument).
    "q_novelty" -> ((s, dir) =>
      CorpusStats.novelty(docShingles(s, dir))
        .select(col("id").as("doc_id"), col("n_sh"), col("n_novel"),
          col("novelty"))
        .orderBy(col("doc_id"))),

    // Per-source document cap by quality rank — the per-domain cap of
    // web-scale curation (no domain dominates the mixture).
    "q_source_cap" -> ((s, dir) =>
      CorpusStats.sourceCap(Tables.documents(s, dir), "doc_id", "text",
          "source", cap = 10, stopwords = Seq("the", "a", "of", "and"))
        .select(col("id").as("doc_id"), col("source"), col("quality"),
          col("rk"))
        .orderBy(col("source"), col("rk"))),

    // k-NN majority-vote classification of a broadcast probe set —
    // leave-one-out accuracy table of the embedding space's labels.
    "q_knn_classify" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      Retrieval.knnClassify(emb, "vec_id", "embedding", "label",
          queries, "query_id", "qv", "qlabel", k = 5, roundTo = 6)
        .orderBy(col("query_id"))
    }),

    // MMR diversified re-rank of each probe's top-20 shortlist (pick 5,
    // λ=0.7). The greedy argmax is iterative → typed mapGroups over the
    // bounded shortlist; not SQL-expressible, so rows-only with count
    // AND content hash pinned in EntrySpec; reference-equivalence and
    // diversity properties in RetrievalSpec.
    "q_mmr_rerank" -> ((s, dir) => {
      val emb = embeddingsCk(s, dir)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Retrieval.mmrRerank(emb, "vec_id", "embedding",
          queries, "query_id", "qv", n = 20, m = 5, lambda = 0.7)
        .select(col("query_id"), col("neighbor_id"),
          round(col("mmr_score"), 6).as("mmr_score"),
          col("pick_rank").cast("long").as("pick_rank"))
        .orderBy(col("query_id"), col("pick_rank"))
    }),

    // Exact sparse TF-IDF cosine pairs via the inverted-index equi-join
    // with a df-cut — the lexical sibling of q_embedding_neardup, and
    // the AllPairs df-cut scale shape (no nested loop anywhere).
    "q_tfidf_cosine" -> ((s, dir) =>
      Retrieval.tfidfCosinePairs(Tables.documents(s, dir), "doc_id", "text",
          dfNum = 1L, dfDen = 10L, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // Per-source ROC-AUC of the quality heuristic predicting lang='en' —
    // the Mann–Whitney gate run before trusting a score as a filter.
    // Integer 2U until the single final division (see Stats.auc).
    "q_auc" -> ((s, dir) =>
      Stats.auc(
          Tables.documents(s, dir).select(col("source"),
            TextAnalytics.qualityScore(col("text"),
              Seq("the", "a", "of", "and")).as("q"),
            (col("lang") === "en").as("l")),
          col("source"), col("q"), col("l"))
        .select(col("group").as("source"), col("n_pos"), col("n_neg"),
          col("auc"))
        .orderBy(col("source"))),

    // Pareto frontier of (quality max, token cost min) — the efficient
    // frontier of budgeted curation. Frontier test via two bounded
    // aggregates over the 4-dp score grid, never a self-join.
    "q_pareto_docs" -> ((s, dir) =>
      CorpusStats.paretoFront(
          Tables.documents(s, dir).select(col("doc_id"),
            TextAnalytics.qualityScore(col("text"),
              Seq("the", "a", "of", "and")).as("q"),
            size(split(col("text"), " ")).cast("long").as("nt")),
          col("doc_id"), col("q"), col("nt"))
        .select(col("id").as("doc_id"), col("score").as("quality"),
          col("cost").as("n_tokens"))
        .orderBy(col("quality").desc, col("n_tokens"), col("doc_id"))),

    // Time-weighted average metric value per event type under the
    // (micros, event_id) total order — exact decimal sums, the
    // irregular-sampling summary a plain mean over-counts bursts on.
    "q_twap" -> ((s, dir) =>
      Timeseries.twap(Tables.events(s, dir), "event_type",
          unix_micros(col("ts")), col("value"), col("event_id"))
        .select(col("key").as("event_type"), col("n_intervals"), col("twap"))
        .orderBy(col("event_type"))),

    // Reliability table of the quality score against lang='en' — the
    // calibration check run before using a score as a sampling
    // probability. Integer score units until the final divisions.
    "q_calibration" -> ((s, dir) =>
      Stats.calibration(
          Tables.documents(s, dir).select(
            TextAnalytics.qualityScore(col("text"),
              Seq("the", "a", "of", "and")).as("q"),
            (col("lang") === "en").as("l")),
          col("q"), col("l"), bins = 10)
        .orderBy(col("bin"))),

    // Population Stability Index between English and non-English docs'
    // quality-score distributions — the drift alarm between a reference
    // and a current window, Laplace-smoothed identically on both sides.
    "q_psi" -> ((s, dir) =>
      Stats.psi(
          Tables.documents(s, dir).select(
            least(floor(TextAnalytics.qualityScore(col("text"),
              Seq("the", "a", "of", "and")) * 10), lit(9)).as("b"),
            (col("lang") === "en").as("base")),
          col("b"), col("base"), bins = 10)),

    // fastText-shaped hashed-BoW logistic regression: driver-trained on
    // the capped id-ordered sample (lang='en' as the label), scored
    // map-only via codegen'd xxhash64 + higher-order aggregate — no
    // UDF, no shuffle. Training isn't SQL → rows-only, count + content
    // hash pinned in EntrySpec; equivalences in ClassifierSpec.
    "q_quality_classifier" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = Classifier.trainLogReg(docs, "doc_id", "text",
        col("lang") === "en")
      docs.select(col("doc_id"),
          Classifier.score(col("text"), model).as("p_en"),
          (Classifier.score(col("text"), model) >= 0.5).as("pred_en"),
          (col("lang") === "en").as("is_en"))
        .orderBy(col("doc_id"))
    }),

    // The same exact n-gram Jaccard, expressed ENTIRELY in SQL against
    // the registered kernel functions (GraftExtensions) — the SQL-surface
    // parity check, hash-matched against the same DuckDB oracle. Reads
    // the parquet path directly (no temp view: Verify dumps queries from
    // concurrent threads sharing one session). The composed operator
    // (q_ngram_jaccard) is the scale path — it materializes shingles
    // once; this plan recomputes them per join branch.
    "q_ngram_jaccard_sql" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      // raw interpolator: the s-interpolator processes \\ escapes even in
      // triple quotes, which would hand Spark '\s+' (unescaped to regex
      // "s+" — splitting on the letter s)
      s.sql(
        raw"""WITH ex AS (
           |  SELECT doc_id, size(sh) AS n_sh, explode(sh) AS h FROM (
           |    SELECT doc_id,
           |      shingle_hashes(filter(split(text, '\\s+'), t -> length(t) > 0), 3) AS sh
           |    FROM parquet.`$dir/documents.parquet`))
           |SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    cast(count(*) AS DOUBLE) /
           |      (min(a.n_sh) + min(b.n_sh) - count(*)) AS jaccard
           |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY a.doc_id, b.doc_id)
           |WHERE jaccard >= 0.8
           |ORDER BY id_a, id_b""".stripMargin)
    }),

    // Exact embedding near-dup: all-pairs kernel cosine (nested-loop
    // broadcast; correct but O(n²) — the oracle anchor at test scale, NOT
    // the scale path)
    "q_embedding_neardup" -> ((s, dir) =>
      embeddingPairs(s, dir).orderBy(col("id_a"), col("id_b"))),

    // The 100 TB path for the same operator: banded sign-LSH candidates +
    // exact cosine verification — always a subset of q_embedding_neardup
    // (recall measured in SimilaritySpec; no BNLJ, plan-asserted). The
    // hash-derived LSH planes are not expressible in DuckDB → rows-only.
    "q_embedding_neardup_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.3999995, planesPerBand = 3, bands = 16)
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("id_a"), col("id_b"))),

    // Connected-components clustering over the (oracle-stable) embedding
    // near-dup pairs: Spark hash-min label propagation vs a DuckDB
    // recursive CTE computing min-reachable-id.
    "q_dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(embeddingPairs(s, dir)).orderBy(col("id"))),

    // The DISTRIBUTED clustering path, forced (driverEdgeLimit = 0):
    // alternating large-star/small-star rounds — O(log n) rounds on any
    // graph shape — hash-verified against the same recursive-CTE
    // component oracle as q_dedup_clusters
    "q_dedup_clusters_star" -> ((s, dir) =>
      Dedup.clusters(embeddingPairs(s, dir), driverEdgeLimit = 0L)
        .orderBy(col("id"))),

    // End-to-end dedup decision: pairs → components → keeper per doc
    "q_dedup_keepers" -> ((s, dir) =>
      Dedup.keepers(Tables.embeddings(s, dir), "vec_id", embeddingPairs(s, dir))
        .select(col("id"), col("keeper_id"), col("keep"))
        .orderBy(col("id"))),

    // Clusters/keepers over a SCALE-SAFE pair source: exact n-gram
    // Jaccard pairs (equi-join on 64-bit shingle hashes — no nested-loop
    // join anywhere in the plan) → connected components. Oracle: DuckDB
    // recursive CTE over the identical string-shingle pair set.
    "q_dedup_clusters_ngram" -> ((s, dir) =>
      Dedup.clusters(ngramPairs(s, dir)).orderBy(col("id"))),

    "q_dedup_keepers_ngram" -> ((s, dir) =>
      Dedup.keepers(Tables.documents(s, dir), "doc_id", ngramPairs(s, dir))
        .select(col("id"), col("keeper_id"), col("keep"))
        .orderBy(col("id"))),

    // Quality-aware keeper policy over the same scale-safe pair source:
    // each cluster keeps its BEST-quality member (ties → min id), the
    // production alternative to min-id keepers. Priority compares in
    // integer score units (the q_calibration discipline) so the pick
    // cannot flip on a last-ulp double difference between engines.
    "q_dedup_keepers_quality" -> ((s, dir) =>
      Dedup.keepersBy(
          Tables.documents(s, dir).select(col("doc_id"),
            round(TextAnalytics.qualityScore(col("text"),
              Seq("the", "a", "of", "and")) * 10000, 0).cast("long").as("_qu")),
          "doc_id", col("_qu"), ngramPairs(s, dir))
        .orderBy(col("id"))),

    // Benchmark decontamination: every 50th doc plays the held-out eval
    // set; remaining docs are flagged by distinct-shingle overlap with
    // the (broadcast) benchmark shingle universe. Spark counts shared
    // 64-bit shingle hashes, DuckDB shared shingle strings — identical
    // barring a ~2^-64 collision (same argument as q_ngram_jaccard).
    "q_decontaminate" -> ((s, dir) => {
      val all = docShingles(s, dir)
      Curation.decontaminatePre(
          all.where(col("id") % 50 =!= 0).select(col("id"), col("sh")),
          all.where(col("id") % 50 === 0)
            .select(explode(col("sh")).as("h")).distinct())
        .select(col("id").as("doc_id"), col("n_sh"), col("n_shared"),
          round(col("overlap_frac"), 4).as("overlap_frac"), col("contaminated"))
        .orderBy(col("doc_id"))
    }),

    // Bloom-prefiltered decontamination — identical results to
    // q_decontaminate (same oracle): the benchmark shingle set rides as
    // a compact Bloom filter probed map-side, candidates exact-verified
    // with a shuffle-hash join (never a benchmark-side broadcast) — the
    // variant for benchmark sets too large to broadcast raw
    "q_decontaminate_bloom" -> ((s, dir) => {
      val all = docShingles(s, dir)
      Curation.decontaminateBloomPre(
          all.where(col("id") % 50 =!= 0).select(col("id"), col("sh")),
          all.where(col("id") % 50 === 0)
            .select(explode(col("sh")).as("h")).distinct()
            .localCheckpoint(true)) // bloom build + exact-verify join
        .select(col("id").as("doc_id"), col("n_sh"), col("n_shared"),
          round(col("overlap_frac"), 4).as("overlap_frac"), col("contaminated"))
        .orderBy(col("doc_id"))
    }),

    // Group-level corpus similarity via MinHash-union sketches: one pass
    // sketches each source (sig(A ∪ B) = min(sig(A), sig(B)) — the
    // custom Aggregator A7), then all source-pair similarities come from
    // the fixed-size sketches alone; the documents are never re-read.
    // The pair join is over the bounded group dimension (20 sources),
    // not the corpus. Hash-based estimate → rows-only.
    "q_source_similarity" -> ((s, dir) => {
      val sigs = Tables.documents(s, dir).select(col("source"),
        graft.functions.DedupExpr.minhashSig(
          TextAnalytics.tokens(col("text")), 3, 64).as("sig"))
      val sk = sigs.groupBy(col("source")).agg(Dedup.minhashUnion(col("sig")).as("sk"))
      val a = sk.select(col("source").as("src_a"), col("sk").as("sk_a"))
      val b = sk.select(col("source").as("src_b"), col("sk").as("sk_b"))
      a.join(b, col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          round(Dedup.estJaccard(col("sk_a"), col("sk_b")), 4).as("est_jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Flagship curation composition: quality + repetition + contamination
    // + exact-dup keeper fused into one keep/drop decision per document
    // (the per-doc signals are kernel projections; contamination is the
    // broadcast-benchmark join; exact dedup groups by the 64-bit content
    // hash so no exchange carries text).
    "q_curation_pipeline" -> ((s, dir) => {
      val all = Tables.documents(s, dir)
      Curation.pipeline(
          all.where(col("doc_id") % 50 =!= 0), "doc_id", "text",
          all.where(col("doc_id") % 50 === 0), "text",
          stopwords = Seq("the", "a", "of", "and"))
        .select(col("id").as("doc_id"), col("quality"), col("dup_token_frac"),
          col("contaminated"), col("is_exact_keeper"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // -- similarity search (LLM-pipeline extensions) --------------------------
    "q_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queries, "query_id", "qv", k = 5, roundTo = 6)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hard-negative mining for contrastive training: per query vector,
    // the 5 most-similar vectors with a DIFFERENT label — the
    // confusable-but-wrong examples an embedding loss learns most from.
    // Queries broadcast; label inequality fused into the join condition;
    // per-query top-k WindowGroupLimit-pruned. Oracled like
    // q_cosine_topk (DuckDB list_cosine_similarity + window).
    "q_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      Retrieval.hardNegatives(emb, "vec_id", "embedding", "label",
          queries, "query_id", "qv", "qlabel", k = 5, roundTo = 6)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Embedding-space retrieval evaluation: label-as-qrels RR /
    // precision@k / recall@k / nDCG@k per query over the brute-force
    // cosine ranking — the eval harness a retrieval pipeline runs after
    // every index build. Oracled end-to-end in DuckDB (window rank +
    // generate_series idcg).
    "q_retrieval_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      Retrieval.retrievalEval(emb, "vec_id", "embedding", "label",
          queries, "query_id", "qv", "qlabel", k = 10, roundTo = 6)
        .orderBy(col("query_id"))
    }),

    // Embedding-space confusion matrix: top-10 neighbor labels per
    // probe query, counted by (query label, neighbor label) — which
    // classes the space confuses. Probe set is a broadcast sample.
    "q_confusion_pairs" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      Retrieval.labelConfusion(emb, "vec_id", "embedding", "label",
          queries, "query_id", "qv", "qlabel", k = 10, roundTo = 6)
        .orderBy(col("query_label"), col("neighbor_label"))
    }),

    // Budget-constrained curation: per source, highest-quality docs
    // admitted until the cumulative token count passes the budget —
    // the greedy knapsack of mixture building. One source-keyed window.
    "q_token_budget" -> ((s, dir) =>
      Curation.tokenBudgetSelect(Tables.documents(s, dir), "doc_id", "text",
          "source", budget = 800L, stopwords = Seq("the", "a", "of", "and"))
        .orderBy(col("source"), col("doc_id"))),

    // SemDeDup-style semantic dedup decision: k-means buckets (Lloyd via
    // Ivf.build), exact cosine only within a bucket, CC + keeper pick
    // over the surviving pairs. Same threshold boundary as
    // q_embedding_neardup, so the pair set is provably a subset of the
    // exact anchor (asserted in SimilaritySpec); Lloyd isn't SQL →
    // rows-only with count AND content hash pinned in EntrySpec.
    "q_semantic_dedup" -> ((s, dir) =>
      Dedup.keepers(Tables.embeddings(s, dir), "vec_id",
          Dedup.semanticNearDupPairs(Tables.embeddings(s, dir), "vec_id",
            "embedding", numCentroids = 8, threshold = 0.3999995))
        .select(col("id"), col("keeper_id"), col("keep"))
        .orderBy(col("id"))),

    // Class-prototype table: per-label centroid + per-dim variance.
    // Shuffle is dimension-sized (partial agg collapses the posexplode
    // fan-out map-side) — the plan shape that survives any corpus size.
    "q_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(Tables.embeddings(s, dir), "label", "embedding")
        .orderBy(col("label"), col("dim"))),

    "q_embedding_norm" -> ((s, dir) =>
      Tables.embeddings(s, dir).select(
          col("vec_id"),
          round(Similarity.l2Norm(Similarity.asDouble(col("embedding"))), 6).as("l2_norm"),
          size(col("embedding")).cast("long").as("dim"))
        .orderBy(col("vec_id"))),

    "q_lsh_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.lshTopK(emb, "vec_id", "embedding",
          queries, "query_id", "qv", k = 5, numPlanes = 8)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // -- multimodal plumbing: opaque binary + deterministic content ids -------
    "q_multimodal_meta" -> ((s, dir) => {
      val bin = col("text").cast("binary")
      Tables.documents(s, dir).select(
          col("doc_id"),
          length(bin).cast("long").as("n_bytes"),
          md5(bin).as("content_md5"),
          substring(md5(bin), 1, 8).as("fp8"))
        .orderBy(col("doc_id"))
    }),

    // Product-quantization ANN: driver-trained codebooks (bounded
    // sample), map-only byte encode, one corpus scan answering all
    // queries via ADC lookup tables (no oracle — quantized scores are
    // approximate by design; recall measured in PqSpec/SimBench)
    "q_pq_topk" -> ((s, dir) => {
      val emb = embeddingsCk(s, dir)
      val cb = Pq.train(emb, "embedding", m = 16, k = 64, sampleN = 2000)
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
      // self-matches kept: PQ ranks by code similarity only, and the
      // query's own row scoring ≈1.0 at rank 1 is itself a useful check
      Pq.topK(Pq.encode(emb, "vec_id", "embedding", cb), cb, queries, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("adc_score"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ: coarse quantizer routes each query to nprobe clusters, PQ
    // codes ADC-scored only inside them (no oracle — doubly approximate;
    // PqSpec proves exhaustive-probe ≡ full-scan PQ, SimBench measures
    // recall at 1M)
    "q_ivfpq_topk" -> ((s, dir) => {
      val emb = embeddingsCk(s, dir)
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
      Pq.ivfPqTopK(emb, "vec_id", "embedding", queries, k = 5,
          numCentroids = 16, nprobe = 4, m = 16, kCodes = 64, sampleN = 2000)
        .select(col("query_id"), col("neighbor_id"), col("adc_score"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ + exact re-rank: the production two-stage retrieval shape —
    // ADC shortlist of 4·k candidates per query, exact kernel cosine
    // only on the survivors (no oracle — shortlist is approximate;
    // PqSpec proves full-coverage re-rank ≡ brute force exactly)
    "q_ivfpq_rerank" -> ((s, dir) => {
      val emb = embeddingsCk(s, dir)
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
      val shortlist = Pq.ivfPqTopK(emb, "vec_id", "embedding", queries, k = 20,
        numCentroids = 16, nprobe = 4, m = 16, kCodes = 64, sampleN = 2000)
      Similarity.rerankExact(shortlist, emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 5)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          "query_id", "qv", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF approximate ANN (no oracle — probe-dependent recall)
    "q_ivf_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Ivf.topK(emb, "vec_id", "embedding", queries, "query_id", "qv",
          k = 5, numCentroids = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // -- multimodal: REAL image decode — ImageIO recovers width/height
    // and band luminance from actual PNG payloads; the oracle recomputes
    // them from the arithmetic the fixture used to construct each image
    // (an end-to-end codec correctness check, hash-verified)
    "q_image_decode" -> ((s, dir) => {
      import s.implicits._
      val assets = s.read.schema(graft.multimodal.Multimodal.assetSchema)
        .parquet(pngAssetsFixture(s, dir))
        .as[graft.multimodal.Multimodal.Asset]
      graft.multimodal.Multimodal.imageFeatures(assets, dim = 4)
        .select(col("asset_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("luma"))
        .orderBy(col("asset_id"))
    }),

    // -- multimodal: perceptual dHash over REAL decoded pixels — the
    // near-dup key for image corpora (robust to re-encode/brightness,
    // integer-exact so bit-reproducible). Hash kernel isn't SQL →
    // rows-only, count + content hash pinned in EntrySpec; kernel
    // properties (copy ⇒ identical hash, perturbation ⇒ few bits,
    // unrelated ⇒ ~32 bits) proven in MultimodalSpec.
    "q_image_dhash" -> ((s, dir) => {
      import s.implicits._
      val assets = s.read.schema(graft.multimodal.Multimodal.assetSchema)
        .parquet(gradPngAssetsFixture(s, dir))
        .as[graft.multimodal.Multimodal.Asset]
      graft.multimodal.Multimodal.dHash64(assets).orderBy(col("asset_id"))
    }),

    // -- multimodal: image near-dup pairs — banded-Hamming equi-join
    // over the dHash keys (pigeonhole candidates, exact verify; the
    // simhash plan applied to pixels, no nested-loop join anywhere).
    // The gradient fixture plants a near-dup for every doc_id ≡ 1
    // (mod 10); unrelated textures sit ~32 bits apart.
    "q_image_neardup" -> ((s, dir) => {
      import s.implicits._
      val assets = s.read.schema(graft.multimodal.Multimodal.assetSchema)
        .parquet(gradPngAssetsFixture(s, dir))
        .as[graft.multimodal.Multimodal.Asset]
      Dedup.hammingPairs(
          graft.multimodal.Multimodal.dHash64(assets), "asset_id", "dhash",
          maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- multimodal: REAL audio decode — javax.sound.sampled recovers
    // sample rate / frame count / RMS amplitude from actual 16-bit PCM
    // WAV payloads; the oracle recomputes them from the arithmetic the
    // fixture used to construct each file (hash-verified)
    "q_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val assets = s.read.schema(graft.multimodal.Multimodal.assetSchema)
        .parquet(wavAssetsFixture(s, dir))
        .as[graft.multimodal.Multimodal.Asset]
      graft.multimodal.Multimodal.audioFeatures(assets, dim = 4)
        .select(col("asset_id"), col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"), col("n_frames"),
          col("duration_ms"),
          round(element_at(col("rms"), 1).cast("double"), 6).as("rms1"))
        .orderBy(col("asset_id"))
    }),

    // -- multimodal: declarative frame fan-out over synthetic video assets --
    "q_frame_sample" -> ((s, dir) =>
      graft.multimodal.Multimodal.sampleFrames(
          graft.multimodal.Multimodal.assetsFromDocuments(Tables.documents(s, dir)), 3)
        .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"), col("ts_ms"))
        .orderBy(col("asset_id"), col("frame_idx"))),

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

    // Equi-width histogram: 2-value min/max aggregate broadcast back,
    // then a map-only bucket expression — the bin formula is the same
    // IEEE arithmetic on both engines, so buckets match exactly
    "q_histogram" -> ((s, dir) =>
      Stats.histogram(Tables.lineitem(s, dir), col("l_extendedprice"), 20)
        .orderBy(col("bucket"))),

    // Bivariate statistics per group: Pearson correlation, sample
    // covariance and OLS slope/intercept (regr_*) in one aggregate pass
    "q_corr_regr" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // Tukey-fence outliers per event type over the heavy-tailed value
    // column: exact per-group quartiles (bounded, broadcast back) fence
    // a map-side filter — the robust-statistics curation primitive
    "q_outlier_iqr" -> ((s, dir) =>
      Stats.iqrOutliers(Tables.events(s, dir), "event_type", col("value"))
        .select(col("group").as("event_type"), col("n_outliers"),
          round(col("out_min"), 4).as("out_min"),
          round(col("out_max"), 4).as("out_max"))
        .orderBy(col("event_type"))),

    // Per-source token Shannon entropy (vocabulary diversity signal):
    // the corpus reduces to a (source, token) count dimension before
    // any floating point happens
    "q_entropy" -> ((s, dir) =>
      Stats.entropy(
          Tables.documents(s, dir).select(col("source"),
            explode(TextAnalytics.tokens(col("text"))).as("tok")),
          "source", col("tok"))
        .select(col("group").as("source"), col("n_distinct"), col("n_total"),
          round(col("entropy"), 6).as("entropy"))
        .orderBy(col("source"))),

    // Median absolute deviation per group: the robust scale estimate —
    // two exact-percentile passes, the median table broadcast back
    "q_mad" -> ((s, dir) =>
      Stats.mad(Tables.events(s, dir), "event_type", col("value"))
        .select(col("group").as("event_type"),
          round(col("median"), 4).as("median"),
          round(col("mad"), 4).as("mad"), col("n"))
        .orderBy(col("event_type"))),

    // Chi-square independence of event type × weekday (weekday from
    // pure epoch-day arithmetic — 1970-01-01 + 4 ≡ Thursday; no
    // calendar). The statistic is computed on the contingency dimension
    // via Σ o²/e − n, so unobserved cells need never be generated
    "q_chisq" -> ((s, dir) =>
      Stats.chiSquare(
          Tables.events(s, dir).select(col("event_type"),
            expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("weekday")),
          col("event_type"), col("weekday"))
        .select(round(col("chi2"), 6).as("chi2"), col("dof"), col("n"))),

    // Empirical Markov transition matrix over per-user event sequences:
    // one user-keyed lead window under the (micros, event_id) total
    // order, then a bounded (from, to) count
    "q_transitions" -> ((s, dir) =>
      Funnel.transitions(Tables.events(s, dir), "user_id", "ts",
          "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))),

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

    // Jaro-Winkler fuzzy matching over sorted-neighborhood candidates:
    // the native codegen kernel (classic p=0.1/cap-4/0.7-boost — the
    // same conventions as DuckDB's jaro_winkler_similarity, which IS
    // the oracle) scores successor-rank pairs; both sides compare the
    // ROUNDED score so a last-ulp difference cannot flip the threshold
    "q_jaro" -> ((s, dir) => {
      val names = Tables.part(s, dir).select(col("p_name")).distinct()
      val ranked = Packing.globalOrderIndex(names,
        substring(col("p_name"), 1, 1), Seq(col("p_name")))
      val cand = ranked
        .select(col("p_name").as("name_a"),
          explode(sequence(col("rank") + 1, col("rank") + 5)).as("rank"))
        .join(ranked.select(col("p_name").as("name_b"), col("rank")), Seq("rank"))
      cand.select(col("name_a"), col("name_b"),
          round(graft.functions.TextExpr.jaroWinkler(
            col("name_a"), col("name_b")), 6).as("jw"))
        .where(col("jw") >= 0.9)
        .orderBy(col("name_a"), col("name_b"))
    }),

    // Key-skew profile: Gini coefficient of the per-supplier lineitem
    // mass — integer rank arithmetic up to the two final divisions
    "q_gini" -> ((s, dir) =>
      Stats.giniOfCounts(Tables.lineitem(s, dir), col("l_suppkey"))
        .select(round(col("gini"), 6).as("gini"), col("n_keys"), col("total"))),

    // Market-basket co-occurrence with lift: DISTINCT (basket, item)
    // reduce → basket-keyed self-join (fan-out bounded by basket size,
    // never item popularity) → integer counts; lift is the only float
    "q_cooccurrence" -> ((s, dir) =>
      Baskets.cooccurrence(Tables.lineitem(s, dir),
          col("l_orderkey"), col("l_partkey"), minCount = 2)
        .select(col("item_a"), col("item_b"), col("n_ab"),
          round(col("lift"), 6).as("lift"))
        .orderBy(col("item_a"), col("item_b"))),

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

    // Weighted sampling without replacement (Efraimidis–Spirakis):
    // md5-uniform u, rank by u^(1/weight) per brand — both engines rank
    // the ROUNDED score so a pow() ulp cannot move the cut
    "q_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(Tables.part(s, dir), col("p_brand"),
          col("p_partkey"), col("p_retailprice"), k = 3)
        .select(col("p_brand"), col("p_partkey"), col("score"))
        .orderBy(col("p_brand"), col("p_partkey"))),

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

    // Exact set-similarity join via PREFIX FILTERING (AllPairs/PPJoin):
    // candidates share a rarest-prefix shingle + pass the length filter;
    // the oracle is the SAME brute-force exact join as q_ngram_jaccard,
    // so the hash-match proves the filter's completeness empirically
    "q_ppjoin" -> ((s, dir) =>
      Dedup.prefixFilterPairsPre(docShingles(s, dir), threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // Mutual information of event type × weekday — chi-square's
    // feature-relevance sibling on the same contingency dimension
    "q_mutual_info" -> ((s, dir) =>
      Stats.mutualInfo(
          Tables.events(s, dir).select(col("event_type"),
            expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("weekday")),
          col("event_type"), col("weekday"))
        .select(round(col("mi"), 6).as("mi"), col("n"))),

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

    // 2-hop neighborhood size over the symmetrized k-NN graph
    "q_khop" -> ((s, dir) =>
      Graphs.twoHopCounts(s.read.parquet(knnEdgesFixture(s, dir)), "src", "dst")
        .orderBy(col("id"))),

    // Cross-source contamination matrix: distinct shared shingles per
    // source pair — Spark intersects 64-bit kernel hashes, the oracle
    // intersects the shingle STRINGS (the q_ngram_jaccard precedent:
    // counts agree because 64-bit collisions are vanishing)
    "q_cross_source" -> ((s, dir) =>
      Curation.crossSourceOverlapPre(
          docShingles(s, dir)
            .select(col("source").as("_src"), explode(col("sh")).as("h"))
            .distinct()
            .localCheckpoint(true)) // both self-join branches consume it
        .orderBy(col("source_a"), col("source_b"))),

    // Deterministic 3-way train/val/test split: the first 16 md5 bits
    // as an integer against 0.8/0.9 thresholds — map-only, and the
    // same row lands in the same split on any engine or rerun
    "q_split" -> ((s, dir) => {
      val u16 = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 4), 16, 10).cast("long")
      Tables.documents(s, dir)
        .select(col("source"),
          when(u16 < 52429L, "train").when(u16 < 58982L, "val")
            .otherwise("test").as("split"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("split"))
    }),

    // Winsorization: clip each group's values at its exact p05/p95
    // fences (broadcast back, map-side least/greatest) and report the
    // mean before/after plus how many rows were clipped
    "q_winsorize" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice").as("v"))
      // ONE exact-percentile buffer per group yielding both fences
      // (two scalar percentile aggs would each hold the group's full
      // value multiset — same answer, twice the aggregation state)
      val fences = li.groupBy(col("l_returnflag"))
        .agg(percentile(col("v"), array(lit(0.05), lit(0.95))).as("_f"))
        .select(col("l_returnflag"), col("_f").getItem(0).as("_lo"),
          col("_f").getItem(1).as("_hi"))
      li.join(broadcast(fences), "l_returnflag")
        .select(col("l_returnflag"), col("v"),
          least(greatest(col("v"), col("_lo")), col("_hi")).as("_w"),
          (col("v") < col("_lo") || col("v") > col("_hi")).cast("long").as("_c"))
        .groupBy(col("l_returnflag"))
        .agg(round(avg(col("v")), 4).as("mean_raw"),
          round(avg(col("_w")), 4).as("mean_winsorized"),
          sum(col("_c")).as("n_clipped"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
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

    // Deterministic epoch shuffle WITH a global rank: order by a salted
    // md5 key, rank via the two-level globalOrderIndex (block = first
    // hex digit — a monotone prefix of the key; never a one-partition
    // window). The rank column makes the shuffle order itself
    // hash-verified — the driver compare sorts rows, so order-only
    // output would not pin the permutation.
    "q_shuffle_rank" -> ((s, dir) => {
      val keyed = Tables.documents(s, dir).select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":ep1")).cast("binary")).as("skey"))
      Packing.globalOrderIndex(keyed, substring(col("skey"), 1, 1),
          Seq(col("skey"), col("doc_id")))
        .select(col("doc_id"), col("skey"), col("rank"))
        .orderBy(col("rank"))
    }),

    // Curriculum binning: exact distributed NTILE(4) over the (hash-
    // verified) quality score — global rank from the two-level scan,
    // bucket from integer arithmetic, so the oracle is DuckDB's own
    // ntile window under the identical total order
    "q_quality_bins" -> ((s, dir) => {
      val scored = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextAnalytics.qualityScore(col("text"), Seq("the", "a", "of", "and")).as("quality"))
      val ranked = Packing.globalOrderIndex(scored,
        floor(col("quality") * 10).cast("int"), Seq(col("quality"), col("doc_id")))
      val n = ranked.agg(count(lit(1)).as("_n"))
      ranked.crossJoin(broadcast(n))
        .select(col("source"),
          Packing.ntileFromRank(col("rank"), col("_n"), 4).as("bin"))
        .groupBy(col("bin"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("bin"), col("source"))
    }),

    // BPE merge candidates: corpus-wide adjacent token-pair counts (the
    // first tokenizer-training step) — zip_with'd shifted slices explode
    // to pairs, one count aggregate
    "q_bpe_pairs" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextAnalytics.tokenPairs(col("text"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 3)
        .orderBy(col("n").desc, col("a"), col("b"))),

    // BPE end-to-end: merges trained driver-side on the CAPPED word-
    // frequency table (bounded state, the PQ-codebook argument), then a
    // map-only codegen encode pass. Iterative merge application is not
    // SQL-expressible -> rows-only; kernel ≡ reference asserted in
    // BpeSpec, training determinism asserted, row count pinned
    "q_bpe_encode" -> ((s, dir) =>
      Bpe.encodeCorpus(Tables.documents(s, dir), "doc_id", "text",
          numMerges = 50, vocabCap = 5000)
        .select(col("id").as("doc_id"),
          size(col("subwords")).cast("long").as("n_subwords"),
          size(array_distinct(col("subwords"))).cast("long").as("n_unique"))
        .orderBy(col("doc_id"))),

    // Okapi BM25 against a fixed term set: term-matched explode (the
    // filter rides the scan), broadcast df/avgdl, one doc-keyed shuffle
    "q_bm25" -> ((s, dir) =>
      Retrieval.bm25(Tables.documents(s, dir), "doc_id", "text",
          Seq("vector", "hash", "stream"))
        .select(col("id").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("doc_id"))),

    // Per-vertex triangle counts in the k-NN similarity graph
    // (degree-oriented wedge counting — O(m^1.5) fan-out bound, hub-safe;
    // the oracle recounts by plain 3-way id-ordered join, same triangles)
    "q_triangles" -> ((s, dir) =>
      Graphs.triangleCounts(s.read.parquet(knnEdgesFixture(s, dir)), "src", "dst")
        .orderBy(col("id"))),

    // PMI collocation mining: bigram pairs scored ln(c_ab·N/(c_a·c_b))
    // with marginals from the bigram dimension itself — one explode+
    // count reduce, minCount prune BEFORE the marginal joins
    "q_collocations" -> ((s, dir) =>
      Retrieval.collocations(Tables.documents(s, dir), "text", minCount = 5)
        .select(col("a"), col("b"), col("cab"), round(col("pmi"), 6).as("pmi"))
        .orderBy(col("a"), col("b"))),

    // Deterministic synchronous label propagation (2 rounds, smallest-
    // label tie-break) over the symmetrized k-NN graph — the oracle
    // unrolls the identical vote/pick/carry rounds as CTEs
    "q_label_prop" -> ((s, dir) =>
      Graphs.labelPropagation(s.read.parquet(knnEdgesFixture(s, dir)),
          "src", "dst", iters = 2)
        .orderBy(col("id"))),

    // TF-IDF keyword extraction: each document's 3 heaviest terms under
    // smoothed idf — (doc,term) counts, term-keyed df broadcast back,
    // WindowGroupLimit-pruned per-doc rank (oracle = the identical
    // formula in DuckDB under the identical (weight, term) tie-break)
    "q_tfidf" -> ((s, dir) =>
      Retrieval.tfidf(Tables.documents(s, dir), "doc_id", "text", topK = 3)
        .select(col("id").as("doc_id"), col("term"), col("tfidf"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("doc_id"), col("rk"))),

    // Exact k-NN graph (all-pairs oracle anchor at test scale — the
    // 100 TB build is q_knn_graph_lsh below). The anchor input is a
    // FIXED 500-vector slice: an O(n²) exactness witness doesn't grow
    // with SF (it covers every vector at the correctness SFs and stops
    // quadrupling the bench at sf0.1) — the scale twin carries scaling.
    "q_knn_graph" -> ((s, dir) =>
      Retrieval.knnGraph(Tables.embeddings(s, dir).where(col("vec_id") < 500),
          "vec_id", "embedding", k = 3)
        .select(col("src"), col("dst"), col("sim"), col("rk").cast("long").as("rk"))
        .orderBy(col("src"), col("rk"))),

    // The scale path: k-NN graph over banded sign-LSH candidate pairs —
    // the corpus is never self-joined; recall vs the exact graph is
    // measured in RetrievalSpec (hash-derived planes → rows-only)
    "q_knn_graph_lsh" -> ((s, dir) =>
      Retrieval.knnGraphFromPairs(
          Dedup.embeddingNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
            threshold = 0.2, planesPerBand = 2, bands = 16), k = 3)
        .select(col("src"), col("dst"), round(col("cos_sim"), 6).as("sim"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("src"), col("rk"))),

    // Fuzzy join (edit-distance ER matching) with DICTIONARY-SCALING
    // blocking: two sorted-neighborhood passes (name + reversed name)
    // give O(n·window) candidates that grow with the dictionary — an
    // equality block on a bounded-cardinality key (e.g. the last token:
    // TPC-H names end in ~92 color words) goes O(n²/92) at scale.
    // Candidates verified with levenshtein ≤ 3; integer distances →
    // engine-exact oracle mirroring the same two rank passes.
    "q_fuzzy_join" -> ((s, dir) =>
      Dedup.fuzzyPairs(Tables.part(s, dir).select(col("p_name")), "p_name",
          window = 10, maxDist = 3)
        .orderBy(col("name_a"), col("name_b"))),

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

    // Count-Min point-frequency estimates for every distinct token: the
    // d×w sketch aggregates with map-side combine (state is d·w longs,
    // never the items) and is probed by the codegen twin of the
    // aggregator's bucketing. CMS only over-counts on collisions; with
    // this corpus's vocabulary no token collides in all d rows (a
    // deterministic property of the fixed xxhash64 seeds, asserted in
    // CountMinSpec), so the exact GROUP BY oracle hash-matches — the
    // same exact-regime argument as q_heavy_hitters; the lossy regime
    // is property-tested
    "q_cms_counts" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(TextAnalytics.tokens(col("text"))).as("tok"))
      val sk = toks.agg(CountMin.countMin(col("tok"), 4, 512).as("sk"))
      toks.distinct().crossJoin(broadcast(sk))
        .select(col("tok"),
          CountMin.estimateCol(col("sk"), col("tok"), 4, 512).as("est_count"))
        .orderBy(col("tok"))
    }),

    // Sorted-neighborhood blocking (the ER-classic complement to LSH
    // banding): two-level global rank on a normalized key, equi-join on
    // successor ranks (O(n·w) candidates), n-gram-Jaccard exact verify
    "q_sorted_neighbors" -> ((s, dir) =>
      Dedup.sortedNeighborPairs(Tables.documents(s, dir), "doc_id", "text",
          window = 5, k = 3, threshold = 0.1)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // Corpus-likelihood quality (perplexity-filter proxy): mean unigram
    // log-prob under the corpus's own empirical distribution — the
    // frequency table is the bounded dimension, broadcast back
    "q_unigram_logprob" -> ((s, dir) =>
      Curation.unigramLogProb(Tables.documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("avg_logp"), 4).as("avg_logp"))
        .orderBy(col("doc_id"))),

    // Canonical text normalization: one codegen kernel pass (NFD accent
    // fold + lowercase + whitespace collapse + trim) over accented
    // strings both engines construct from doc_id — the oracle is
    // DuckDB's independent strip_accents/lower/regexp pipeline
    "q_normalize_text" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
          graft.functions.CurationExpr.normalizeText(
            concat(lit("  CaFé  ÑANDÚ\tàëï  Ök "),
              col("doc_id").cast("string"), lit("  "))).as("norm"))
        .orderBy(col("doc_id"))),

    // Interpolated-bigram corpus likelihood (λ=0.7 conditional +
    // suffix-unigram backoff) — the order-sensitive perplexity proxy
    "q_bigram_logprob" -> ((s, dir) =>
      Curation.bigramLogProb(Tables.documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"),
          round(col("avg_logp"), 4).as("avg_logp"))
        .orderBy(col("doc_id"))),

    // PageRank centrality over the (deterministic, hash-verified) exact
    // k-NN graph: 3 power iterations, each one vertex-keyed shuffle with
    // periodic lineage truncation — the oracle unrolls the same three
    // iterations as chained CTEs with a float-structurally-identical
    // update rule
    "q_pagerank" -> ((s, dir) =>
      Graphs.pageRank(s.read.parquet(knnEdgesFixture(s, dir)), "src", "dst",
          iters = 3)
        .select(col("id"), round(col("pr"), 6).as("pr"))
        .orderBy(col("id"))),

    // Link prediction over the k-NN graph: common-neighbor count +
    // resource-allocation index Σ 1/deg(z) for NON-adjacent pairs —
    // each shared neighbor contributes exact integer pico-units
    // (1e12 div deg), one float division at the end
    "q_link_predict" -> ((s, dir) =>
      Graphs.linkPrediction(s.read.parquet(knnEdgesFixture(s, dir)),
          "src", "dst", minCommon = 2)
        .orderBy(col("id_a"), col("id_b"))),

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

    // Spearman rank correlation per event type between value cents and
    // time-of-day micros: textbook average-rank ties (exact halves, so
    // the ranks are engine-bitwise), Pearson corr over ranks rounded
    "q_spearman" -> ((s, dir) =>
      Stats.spearman(Tables.events(s, dir).where(col("value").isNotNull),
          col("event_type"),
          expr("cast(round(value * 100) as bigint)"),
          expr("pmod(unix_micros(ts), 86400000000)"))
        .select(col("g").as("event_type"), col("n"), col("rho"))
        .orderBy(col("event_type"))),

    // Exact token-phrase search ("batch batch" consecutively): pure
    // map-only HOF scan over the bound token array — no join, no index,
    // whole-stage codegen keeps it inside the scan stage
    "q_phrase_search" -> ((s, dir) =>
      Retrieval.phraseSearch(Tables.documents(s, dir), "doc_id", "text",
          Seq("batch", "batch"))
        .orderBy(col("doc_id"))),

    // BERTopic-style c-TF-IDF: top-10 terms characterizing each source
    // vs the rest of the corpus — exact (class, term) count dimension,
    // one ln(1 + A/f)·tf float step, WindowGroupLimit-pruned top-k
    "q_ctfidf" -> ((s, dir) =>
      CorpusStats.cTfidf(Tables.documents(s, dir), col("source"), col("text"),
          topK = 10, minTf = 2)
        .select(col("class").as("source"), col("term"), col("tf"),
          col("score"), col("rk"))
        .orderBy(col("source"), col("rk"))),

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

    // Cumulative-gains table by quality-score decile (lift-curve
    // companion to q_auc/q_calibration): deciles via the exact
    // two-level ntile (never a corpus-wide single-partition window),
    // label = lang='en', cumulative positives over the 10-row decile
    // dimension — integer-exact until the final gain fraction
    "q_gains" -> ((s, dir) => {
      val scored = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        TextAnalytics.qualityScore(col("text"), Seq("the", "a", "of", "and"))
          .as("quality"))
      val ranked = Packing.globalOrderIndex(scored,
        (-floor(col("quality") * 10)).cast("int"),
        Seq(col("quality").desc, col("doc_id").asc))
      val n = ranked.agg(count(lit(1)).as("_n"))
      val agg = ranked.crossJoin(broadcast(n))
        .select(Packing.ntileFromRank(col("rank"), col("_n"), 10).as("decile"),
          (col("lang") === "en").cast("long").as("_pos"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_pos")).as("n_pos"))
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      agg
        .select(col("decile"), col("n_docs"), col("n_pos"),
          sum(col("n_pos")).over(wCum).as("cum_pos"),
          sum(col("n_pos")).over(wTot).as("_tot"))
        .select(col("decile"), col("n_docs"), col("n_pos"), col("cum_pos"),
          round(col("cum_pos").cast("double") / col("_tot"), 6).as("gain"))
        .orderBy(col("decile"))
    }),

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

    // Zipf rank-frequency fit over the top-200 vocabulary: global rank
    // by (freq desc, term) via the two-level globalOrderIndex (never a
    // corpus-wide single-partition window), then ln-ln regression slope
    // — the "is this natural language" corpus diagnostic (~ -1 for
    // Zipfian text)
    "q_zipf_fit" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(explode(TextAnalytics.tokens(lower(col("text")))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("f"))
      Packing.globalOrderIndex(tf, -col("f"), Seq(col("term").asc))
        .where(col("rank") <= 200)
        .agg(count(lit(1)).as("n_terms"),
          round(expr("regr_slope(ln(f), ln(rank))"), 4).as("zipf_slope"),
          round(expr("regr_r2(ln(f), ln(rank))"), 4).as("r2"))
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

    // k-anonymity audit (k=5) on the quasi-identifier combination
    // (event_type, weekday, $20 value band): combinations observed
    // fewer than k times — the re-identification risk surface a
    // training-data release must review. One bounded-dimension reduce.
    "q_kanon" -> ((s, dir) =>
      Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"),
          expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("dow"),
          expr("cast(round(value * 100) as bigint) div 2000").as("band"))
        .groupBy(col("event_type"), col("dow"), col("band"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") < 5)
        .orderBy(col("event_type"), col("dow"), col("band"))),

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
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("s"), col("event_id"))
      val marked = iv
        .withColumn("_pmax",
          max(col("e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("_new",
          when(col("_pmax").isNull || col("s") > col("_pmax"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("_new"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      marked.groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("merged_start"), max(col("e")).as("merged_end"),
          count(lit(1)).as("n_merged"))
        .orderBy(col("user_id"), col("island"))
    }),

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

    // Degree distribution of the undirected k-NN graph — the first
    // sanity plot of any graph build; one vertex count + one bounded
    // (degree, n) reduce
    "q_degree_dist" -> ((s, dir) => {
      val e0 = s.read.parquet(knnEdgesFixture(s, dir))
        .select(col("src"), col("dst"))
      val sym = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst")).distinct()
      sym.groupBy(col("src")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("degree"))
    }),

    // Degree assortativity (Newman): Pearson corr of endpoint degrees
    // over the symmetric directed edge list — do high-degree vertices
    // attach to high-degree vertices? Exact integer degrees; only the
    // final corr rounds
    "q_assortativity" -> ((s, dir) => {
      val e0 = s.read.parquet(knnEdgesFixture(s, dir))
        .select(col("src"), col("dst"))
      val sym = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst")).distinct()
      val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      sym
        .join(deg.select(col("id").as("src"), col("d").as("_du")), Seq("src"))
        .join(deg.select(col("id").as("dst"), col("d").as("_dv")), Seq("dst"))
        .agg(count(lit(1)).as("n_directed_edges"),
          round(corr(col("_du"), col("_dv")), 4).as("assortativity"))
    }),

    // Per-edge embeddedness: common-neighbor count + neighborhood
    // Jaccard for every k-NN edge — the weak-tie pruning signal; same
    // wedge plan as q_link_predict, integer-exact to one division
    "q_edge_jaccard" -> ((s, dir) =>
      Graphs.edgeEmbeddedness(s.read.parquet(knnEdgesFixture(s, dir)),
          "src", "dst")
        .orderBy(col("lo"), col("hi"))),

    // Source-concentration indices over documents and token mass:
    // Herfindahl–Hirschman index Σm²/t², effective source count t²/Σm²,
    // top share — the "is this corpus one crawl in a trenchcoat" gate.
    // Integer masses squared and summed EXACTLY (decimal(38,0)/HUGEINT
    // — a float Σ shares² would be summation-order-dependent); the only
    // float steps are three final divisions
    "q_concentration" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def conc(dim: DataFrame, basis: String): DataFrame =
        dim.agg(sum(col("m")).as("_t"), sum(col("m") * col("m")).as("_s2"),
            max(col("m")).as("_mx"))
          .select(lit(basis).as("basis"),
            round(col("_s2").cast("double") /
              (col("_t").cast("double") * col("_t").cast("double")), 6)
              .as("hhi"),
            round(col("_t").cast("double") * col("_t").cast("double") /
              col("_s2").cast("double"), 4).as("effective_sources"),
            round(col("_mx").cast("double") / col("_t").cast("double"), 6)
              .as("top_share"))
      val byDocs = docs.groupBy(col("source"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("m"))
      val byTokens = docs.groupBy(col("source"))
        .agg(sum(TextAnalytics.tokenCount(col("text")).cast("long"))
          .cast("decimal(38,0)").as("m"))
      conc(byDocs, "docs").unionAll(conc(byTokens, "tokens"))
        .orderBy(col("basis"))
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

    // Personalized PageRank from vec 0 over the k-NN graph: restart
    // vector 𝟙[v=0], 3 ordered-sum power iterations — the graph-
    // expanded "related to THIS document" retrieval primitive; oracle
    // unrolls the same float-structurally-identical CTEs as q_pagerank
    "q_ppr" -> ((s, dir) =>
      Graphs.personalizedPageRank(s.read.parquet(knnEdgesFixture(s, dir)),
          "src", "dst", sourceId = 0L, iters = 3)
        .select(col("id"), round(col("pr"), 6).as("ppr"))
        .where(col("ppr") > 0)
        .orderBy(col("id"))),

    // Kleinberg HITS over the k-NN graph: 2 unnormalized rounds keep
    // every score an exact integer (bit-reproducible, CTE-unrollable);
    // the one normalization divides by the exact integer max at the end
    "q_hits" -> ((s, dir) =>
      Graphs.hits(s.read.parquet(knnEdgesFixture(s, dir)), "src", "dst",
          iters = 2)
        .orderBy(col("id"))),

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

    // Per-type empirical CDF table over the bounded 10-dollar-bucket
    // dimension: one dimension reduce, one sanctioned group-partitioned
    // cumulative window, exact integers until the final fraction
    "q_cdf" -> ((s, dir) => {
      val dim = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"),
          expr("cast(round(value * 100) as bigint) div 1000").as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dim
        .withColumn("cum_n", sum(col("n")).over(wCum))
        .withColumn("_tot",
          sum(col("n")).over(Window.partitionBy(col("event_type"))))
        .select(col("event_type"), col("bucket"), col("n"), col("cum_n"),
          round(col("cum_n") / col("_tot"), 6).as("cdf"))
        .orderBy(col("event_type"), col("bucket"))
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

    // Skewness / excess kurtosis per group from EXACT integer central-
    // moment sums (Σc..Σc⁴ in decimal(38,0)/HUGEINT): the builtin
    // skewness/kurtosis aggregates differ across engines (population vs
    // sample, one-pass update order); moments from exact sums with one
    // shared double expression tree are engine-bitwise until the final
    // rounding
    "q_moments" -> ((s, dir) => {
      val sums = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"),
          expr("cast(cast(round(value * 100) as bigint) as decimal(38,0))")
            .as("c"))
        .withColumn("c2", col("c") * col("c"))
        .withColumn("c3", col("c2") * col("c"))
        .withColumn("c4", col("c2") * col("c2"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
          sum(col("c2")).as("s2"), sum(col("c3")).as("s3"),
          sum(col("c4")).as("s4"))
      val d1 = col("s1").cast("double") / col("n")
      val d2 = col("s2").cast("double") / col("n")
      val d3 = col("s3").cast("double") / col("n")
      val d4 = col("s4").cast("double") / col("n")
      val m2 = d2 - d1 * d1
      val m3 = d3 - lit(3.0) * d1 * d2 + lit(2.0) * d1 * d1 * d1
      val m4 = d4 - lit(4.0) * d1 * d3 + lit(6.0) * d1 * d1 * d2 -
        lit(3.0) * d1 * d1 * d1 * d1
      sums.select(col("event_type"), col("n"),
          round(d1 / 100.0, 4).as("mean_val"),
          round(m2, 4).as("var_pop"),
          round(m3 / pow(m2, lit(1.5)), 6).as("skewness"),
          round(m4 / (m2 * m2) - lit(3.0), 6).as("kurtosis_ex"))
        .orderBy(col("event_type"))
    }),

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
        .orderBy(col("doc_id")))
  )

  // ------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] = Map(
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

    "q_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

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

    "q_token_count" ->
      """SELECT lang, cast(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id, cast(length(text) AS BIGINT) AS n_chars2,
        |  cast(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  round(len(list_filter(string_split(lower(text),' '),
        |        t -> t IN ('the','a','of','and'))) * 1.0
        |        / len(string_split(text,' ')), 4) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_explode_freq" ->
      """SELECT token, count(*) AS freq FROM
        |(SELECT unnest(string_split(text,' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin,

    "q_lang_id" ->
      """SELECT doc_id,
        |  CASE WHEN en_score > de_score THEN 'en' ELSE 'de' END AS lang_guess
        |FROM (SELECT doc_id,
        |        (CASE WHEN contains(norm,' the ') THEN 1 ELSE 0 END +
        |         CASE WHEN contains(norm,' and ') THEN 1 ELSE 0 END +
        |         CASE WHEN contains(norm,' of ') THEN 1 ELSE 0 END +
        |         CASE WHEN contains(norm,' to ') THEN 1 ELSE 0 END) AS en_score,
        |        (CASE WHEN contains(norm,' der ') THEN 1 ELSE 0 END +
        |         CASE WHEN contains(norm,' und ') THEN 1 ELSE 0 END +
        |         CASE WHEN contains(norm,' die ') THEN 1 ELSE 0 END +
        |         CASE WHEN contains(norm,' ist ') THEN 1 ELSE 0 END) AS de_score
        |      FROM (SELECT doc_id,
        |              ' ' || regexp_replace(lower(text), '\s+', ' ', 'g') || ' ' AS norm
        |            FROM documents) a) b
        |ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """SELECT doc_id,
        |  round((len_score + punct_score + sw_score) / 3.0, 4) AS quality
        |FROM (SELECT doc_id,
        |        least(length(text) / 500.0, 1.0) AS len_score,
        |        1.0 - least(
        |          (CASE WHEN length(text) = 0 THEN 0.0
        |                ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |           END) * 5.0, 1.0) AS punct_score,
        |        1.0 - abs(
        |          (CASE WHEN len(toks) = 0 THEN 0.0
        |                ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |           END) - 0.4) AS sw_score
        |      FROM (SELECT doc_id, text,
        |              list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |            FROM documents) a) b
        |ORDER BY doc_id""".stripMargin,

    // same integer counts and double divisions as the Spark side, so the
    // rule verdicts (threshold compares on those doubles) cannot diverge
    // \s+ tokenization after trim, the paper's 8 stopwords, and the
    // symbol count including ASCII '...' — mirroring Curation.gopherRules
    "q_gopher_rules" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(toks, t -> length(t)))
        |      AS BIGINT) AS sum_wl,
        |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
        |      AS BIGINT) AS n_alpha,
        |    CAST((CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END)
        |       + (CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_stopwords,
        |    CAST((length(text) - length(replace(text, '#', '')))
        |       + (length(text) - length(replace(text, '…', '')))
        |       + len(regexp_extract_all(text, '\.\.\.'))
        |      AS BIGINT) AS n_sym
        |  FROM d)
        |SELECT doc_id, n_words,
        |  round(CAST(sum_wl AS DOUBLE) / n_words, 4) AS mean_word_len,
        |  round(CAST(n_alpha AS DOUBLE) / n_words, 4) AS alpha_frac,
        |  n_stopwords,
        |  round(CAST(n_sym AS DOUBLE) / n_words, 4) AS symbol_ratio,
        |  n_words >= 45 AND n_words <= 100000 AS r_words,
        |  CAST(sum_wl AS DOUBLE) / n_words >= 3.0 AND
        |    CAST(sum_wl AS DOUBLE) / n_words <= 10.0 AS r_mean_wl,
        |  CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AS r_alpha,
        |  n_stopwords >= 2 AS r_stop,
        |  CAST(n_sym AS DOUBLE) / n_words <= 0.1 AS r_symbol,
        |  (n_words >= 45 AND n_words <= 100000) AND
        |    (CAST(sum_wl AS DOUBLE) / n_words >= 3.0 AND
        |     CAST(sum_wl AS DOUBLE) / n_words <= 10.0) AND
        |    CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AND
        |    n_stopwords >= 2 AND
        |    CAST(n_sym AS DOUBLE) / n_words <= 0.1 AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 10 ORDER BY doc_id""".stripMargin,

    "q_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(cast(doc_id AS VARCHAR)), 1, 1) < '2'
        |ORDER BY doc_id""".stripMargin,

    // identical regex trees; integer char counts, single final divisions
    "q_script_mix" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_chars,
        |  round(CAST(sum(a) AS DOUBLE) / CAST(sum(n) AS BIGINT), 6) AS alpha_frac,
        |  round(CAST(sum(d) AS DOUBLE) / CAST(sum(n) AS BIGINT), 6) AS digit_frac,
        |  round(CAST(sum(w) AS DOUBLE) / CAST(sum(n) AS BIGINT), 6) AS ws_frac,
        |  round(CAST(sum(x) AS DOUBLE) / CAST(sum(n) AS BIGINT), 6) AS nonascii_frac,
        |  round(CAST(sum(n) - sum(a) - sum(d) - sum(w) - sum(x) AS DOUBLE)
        |        / CAST(sum(n) AS BIGINT), 6) AS punct_frac
        |FROM (SELECT lang, length(text) AS n,
        |        length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS a,
        |        length(regexp_replace(text, '[^0-9]', '', 'g')) AS d,
        |        length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS w,
        |        length(regexp_replace(text, '[\x00-\x7F]', '', 'g')) AS x
        |      FROM documents) t
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_repetition" ->
      """SELECT doc_id, cast(len(toks) AS BIGINT) AS n_tokens,
        |  round(CASE WHEN len(toks) = 0 THEN 0.0
        |             ELSE 1.0 - len(list_distinct(toks)) * 1.0 / len(toks) END, 4)
        |    AS dup_token_frac,
        |  round(CASE WHEN len(toks) = 0 THEN 0.0
        |             ELSE list_max(list_transform(list_distinct(toks),
        |                    t -> len(list_filter(toks, x -> x = t)))) * 1.0 / len(toks) END, 4)
        |    AS top_token_frac,
        |  round(CASE WHEN len(bgs) = 0 THEN 0.0
        |             ELSE 1.0 - len(list_distinct(bgs)) * 1.0 / len(bgs) END, 4)
        |    AS dup_bigram_frac
        |FROM (SELECT doc_id, toks,
        |        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bgs
        |      FROM (SELECT doc_id,
        |              list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |            FROM documents) a) b
        |ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      """SELECT doc_id,
        |  cast(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  cast(len(regexp_extract_all(aug, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips,
        |  cast(len(regexp_extract_all(aug, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g'),
        |      '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS redacted_md5
        |FROM (SELECT doc_id,
        |        text || ' contact user' || doc_id || '@example.com ip 10.0.' ||
        |        (doc_id % 200) || '.7 call 415-555-' ||
        |        lpad(cast(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT text, min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin,

    "q_dedup_hash" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin,

    "q_passage_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (
        |  SELECT doc_id, i AS pidx,
        |         array_to_string(ws[(i-1)*20+1 : i*20], ' ') AS passage
        |  FROM w, UNNEST(generate_series(1,
        |    greatest(CAST(ceil(len(ws)/20.0) AS BIGINT), 1))) AS t(i)),
        |k AS (
        |  SELECT doc_id, pidx, passage,
        |         row_number() OVER (PARTITION BY passage
        |                            ORDER BY doc_id, pidx) AS rn
        |  FROM p)
        |SELECT doc_id,
        |       array_to_string(list(passage ORDER BY pidx), ' ') AS dedup_text,
        |       count(*) AS n_kept
        |FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // passage construction identical to q_passage_dedup's; the verdict is
    // a doc-frequency threshold instead of first-occurrence rank
    "q_boilerplate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (
        |  SELECT doc_id, i AS pidx,
        |         array_to_string(ws[(i-1)*10+1 : i*10], ' ') AS passage
        |  FROM w, UNNEST(generate_series(1,
        |    greatest(CAST(ceil(len(ws)/10.0) AS BIGINT), 1))) AS t(i)),
        |df AS (SELECT passage, count(DISTINCT doc_id) AS _df
        |       FROM p GROUP BY 1)
        |SELECT p.doc_id, count(*) AS n_passages,
        |       count(CASE WHEN _df < 2 THEN 1 END) AS n_kept,
        |       coalesce(array_to_string(
        |         list(passage ORDER BY pidx) FILTER (WHERE _df < 2), ' '),
        |         '') AS clean_text
        |FROM p JOIN df USING (passage)
        |GROUP BY p.doc_id ORDER BY doc_id""".stripMargin,

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

    // exact oracle is valid because k=64 ≥ the 31-token vocabulary (MG
    // is exact when nothing is ever evicted)
    "q_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> length(x) > 0)) AS token
        |  FROM documents)
        |SELECT token, count(*) AS est_count
        |FROM t GROUP BY token ORDER BY est_count DESC, token""".stripMargin,

    // flat-window oracle for the two-level prefix sum: same offsets
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |         x -> length(x) > 0)) AS BIGINT) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |    coalesce(sum(toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
        |  FROM t)
        |SELECT CAST(floor(strt / 512.0) AS BIGINT) AS seq_id,
        |       count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
        |FROM s GROUP BY 1 ORDER BY seq_id""".stripMargin,

    // list slicing is 1-based inclusive on both sides (DuckDB l[a:b] ≡
    // Spark slice(l, a, b-a+1)); chunk-count rule mirrored exactly
    "q_chunk_tokens" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |           x -> length(x) > 0) AS l FROM documents),
        |c AS (SELECT doc_id, l,
        |        greatest(1, CAST(ceil((len(l) - 40) / 30.0) AS INT) + 1) AS nc
        |      FROM toks)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       array_to_string(l[chunk_idx*30 + 1 : chunk_idx*30 + 40], ' ') AS chunk_text,
        |       CAST(len(l[chunk_idx*30 + 1 : chunk_idx*30 + 40]) AS BIGINT) AS n_tokens
        |FROM (SELECT doc_id, l, unnest(range(nc)) AS chunk_idx FROM c) t
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // shingle construction identical to the q_ngram_jaccard oracle;
    // containment = |A∩B|/|A| per direction
    "q_containment" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6) AS cont_ab,
        |       round(len(list_intersect(a.s, b.s)) * 1.0 / len(b.s), 6) AS cont_ba
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.s, b.s)) * 1.0 / len(a.s) >= 0.5
        |   OR len(list_intersect(a.s, b.s)) * 1.0 / len(b.s) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

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

    // strict positional 3-grams (docs shorter than k emit none — NOT
    // the whole-doc fallback the set-shingle oracles use); duplicated =
    // corpus occurrence count >= 2; islands by pos - row_number
    "q_dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |           x -> length(x) > 0) AS toks FROM documents),
        |g0 AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 2)) AS pos
        |       FROM t WHERE len(toks) >= 3),
        |g AS (SELECT doc_id, pos,
        |        array_to_string(toks[pos+1:pos+3], ' ') AS sh FROM g0),
        |d AS (SELECT sh FROM g GROUP BY sh HAVING count(*) >= 2),
        |p AS (SELECT g.doc_id, g.pos,
        |        row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS rn
        |      FROM g JOIN d ON g.sh = d.sh)
        |SELECT doc_id, min(pos) AS span_start,
        |  count(*) AS n_grams, count(*) + 2 AS span_tokens
        |FROM p GROUP BY doc_id, pos - rn
        |HAVING count(*) >= 3
        |ORDER BY doc_id, span_start""".stripMargin,

    // per-value counts, identical cumulative frame, exact-integer ratios
    "q_ks_test" ->
      """WITH t AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
        |c AS (SELECT v,
        |    CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN g = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1),
        |cum AS (SELECT v,
        |    CAST(sum(ca) OVER w AS BIGINT) AS cuma,
        |    CAST(sum(cb) OVER w AS BIGINT) AS cumb
        |  FROM c WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |               CAST(sum(cb) AS BIGINT) AS nb FROM c)
        |SELECT max(na) AS n_a, max(nb) AS n_b, count(*) AS n_values,
        |  round(max(abs(cuma / na - cumb / nb)), 6) AS ks_d
        |FROM cum CROSS JOIN tot""".stripMargin,

    "q_mode" ->
      """WITH e AS (SELECT event_type,
        |    ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS weekday
        |  FROM events),
        |c AS (SELECT event_type, weekday, count(*) AS n_occ
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT event_type, weekday AS mode_value, n_occ,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY n_occ DESC, weekday ASC) AS rk FROM c)
        |SELECT event_type, mode_value, n_occ FROM r WHERE rk = 1
        |ORDER BY event_type""".stripMargin,

    // exact integer (n, Σc, Σc²) per group, then the identical double
    // expression tree — sums of integers-as-doubles are exact below 2^53
    "q_welch_ttest" ->
      """WITH c0 AS (SELECT event_type AS g,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS c
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, sum(c) AS s,
        |        sum(c * c) AS ss
        |      FROM c0 GROUP BY 1 HAVING count(*) > 1)
        |SELECT a.g AS g_a, b.g AS g_b,
        |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
        |  round(a.s / a.n / 100.0, 4) AS mean_a,
        |  round(b.s / b.n / 100.0, 4) AS mean_b,
        |  round((a.s / a.n - b.s / b.n) /
        |    sqrt((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n +
        |         (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n), 4) AS t_stat,
        |  round(((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n +
        |         (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n) *
        |        ((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n +
        |         (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n) /
        |    ((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n *
        |       ((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n) / (a.n - 1) +
        |     (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n *
        |       ((b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n) / (b.n - 1)), 2)
        |    AS df_welch
        |FROM g a JOIN g b ON a.g < b.g
        |ORDER BY g_a, g_b""".stripMargin,

    // the same exact-integer-sum discipline: unit (x, y) cents are exact,
    // every pooled/arm sum of their products stays below 2^53, and the
    // theta/mean/variance identities are spelled as ONE expression tree
    // exact HUGEINT unit/arm sums (the q_moments convention) cast to
    // double ONCE; theta falls back to 0 when pooled var(X)=0 and a
    // zero-variance arm reports var_reduction 0.0 — both matching the
    // Spark operator's guards exactly
    "q_cuped" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS us,
        |    CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT CAST(floor((min(us) + max(us)) / 2) AS BIGINT) AS mid
        |      FROM e),
        |u AS (
        |  SELECT user_id % 2 AS arm,
        |    CAST(sum(CASE WHEN us < mid THEN cents ELSE 0 END)
        |      AS HUGEINT) AS x,
        |    CAST(sum(CASE WHEN us >= mid THEN cents ELSE 0 END)
        |      AS HUGEINT) AS y
        |  FROM e CROSS JOIN b GROUP BY user_id),
        |g AS (SELECT arm, CAST(count(*) AS DOUBLE) AS n,
        |        CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |        CAST(sum(x * x) AS DOUBLE) AS sxx,
        |        CAST(sum(y * y) AS DOUBLE) AS syy,
        |        CAST(sum(x * y) AS DOUBLE) AS sxy
        |      FROM u GROUP BY 1 HAVING count(*) > 1),
        |p AS (SELECT CAST(count(*) AS DOUBLE) AS pn,
        |        CAST(sum(x) AS DOUBLE) AS psx,
        |        CAST(sum(y) AS DOUBLE) AS psy,
        |        CAST(sum(x * x) AS DOUBLE) AS psxx,
        |        CAST(sum(x * y) AS DOUBLE) AS psxy
        |      FROM u),
        |t AS (SELECT *,
        |        CASE WHEN psxx - psx * psx / pn = 0 THEN 0.0
        |             ELSE (psxy - psx * psy / pn) / (psxx - psx * psx / pn)
        |        END AS theta
        |      FROM g CROSS JOIN p),
        |v AS (SELECT arm, n, sx, sy, pn, psx, theta,
        |        (syy - sy * sy / n) / (n - 1) AS var_y,
        |        (sxx - sx * sx / n) / (n - 1) AS var_x,
        |        (sxy - sx * sy / n) / (n - 1) AS cov_xy
        |      FROM t)
        |SELECT arm, CAST(n AS BIGINT) AS n_units,
        |  round(sy / n / 100.0, 4) AS mean_post,
        |  round((sy / n - theta * (sx / n - psx / pn)) / 100.0, 4) AS mean_adj,
        |  round(var_y, 2) AS var_post,
        |  round(var_y + theta * theta * var_x - 2.0 * theta * cov_xy, 2)
        |    AS var_adj,
        |  CASE WHEN var_y = 0 THEN 0.0
        |       ELSE round(1.0 - (var_y + theta * theta * var_x
        |                         - 2.0 * theta * cov_xy) / var_y, 6)
        |  END AS var_reduction
        |FROM v ORDER BY arm""".stripMargin,

    // leading digit from the integer's decimal string — exact at every
    // power-of-ten boundary; n/tot is double division in both engines
    "q_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events)
        |  WHERE c > 0),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
        |SELECT digit, n, round(n / tot, 6) AS share,
        |  round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_share,
        |  round((n / tot - ln(1.0 + 1.0 / digit) / ln(10.0)) *
        |        (n / tot - ln(1.0 + 1.0 / digit) / ln(10.0)) /
        |        (ln(1.0 + 1.0 / digit) / ln(10.0)) * tot, 6) AS chi2_term
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,

    "q_bool_retrieval" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '\s+'),
        |      x -> length(x) > 0)) AS tok FROM documents),
        |d AS (SELECT DISTINCT doc_id, tok FROM t
        |      WHERE tok IN ('spark', 'window', 'join'))
        |SELECT doc_id, count(*) AS n_terms_hit FROM d
        |GROUP BY 1 HAVING count(*) >= 3 ORDER BY doc_id""".stripMargin,

    "q_readability" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> length(x) > 0)) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)
        |      AS n_vowel_groups,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS DOUBLE)
        |      AS sentences
        |  FROM documents)
        |SELECT doc_id, n_words, n_vowel_groups,
        |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / sentences)
        |    - 84.6 * (CAST(n_vowel_groups AS DOUBLE) / CAST(n_words AS DOUBLE)),
        |    4) AS reading_ease
        |FROM t WHERE n_words > 0 ORDER BY doc_id""".stripMargin,

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

    // same graph prelude as q_khop; min-hop via bounded recursive walk
    "q_bfs" ->
      """WITH RECURSIVE emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT src, dst FROM edges UNION SELECT dst, src FROM edges) u
        |  WHERE src <> dst),
        |walk(id, d) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, 0 AS d
        |  UNION ALL
        |  SELECT e.dst AS id, w.d + 1 AS d
        |  FROM walk w JOIN sym e ON e.src = w.id WHERE w.d < 4)
        |SELECT id, CAST(min(d) AS INT) AS dist FROM walk
        |GROUP BY 1 ORDER BY id""".stripMargin,

    // identical exact-sum reduction and double expression tree
    "q_anova" ->
      """WITH c0 AS (SELECT event_type AS g,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS c
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, sum(c) AS s,
        |        sum(c * c) AS ss FROM c0 GROUP BY 1),
        |t AS (SELECT count(*) AS k, sum(n) AS bigN, sum(s) AS bigS,
        |        sum(s * s / n) AS sbn, sum(ss) AS sss FROM g)
        |SELECT k, CAST(bigN AS BIGINT) AS n,
        |  CAST(k - 1 AS BIGINT) AS df1, CAST(bigN - k AS BIGINT) AS df2,
        |  round(((sbn - bigS * bigS / bigN) / (k - 1)) /
        |        ((sss - sbn) / (bigN - k)), 4) AS f_stat
        |FROM t""".stripMargin,

    // the q_bm25 scoring CTE + list_cosine_similarity, both rounded
    // BEFORE ranking; row_number == the predecessor-count rank
    "q_rrf_fusion" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |           x -> length(x) > 0) AS l FROM documents),
        |dl AS (SELECT doc_id, cast(len(l) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM (
        |         SELECT doc_id, unnest(l) AS term FROM toks) u
        |       WHERE term IN ('vector','hash','stream') GROUP BY 1, 2),
        |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
        |b AS (SELECT tf.doc_id,
        |  round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |    * tf * (1.2 + 1.0)
        |    / (tf + ((dl / avgdl) * 0.75 + (1.0 - 0.75)) * 1.2)), 4) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY tf.doc_id),
        |btop AS (SELECT doc_id, s FROM b ORDER BY s DESC, doc_id LIMIT 100),
        |brank AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY s DESC, doc_id) AS rank FROM btop),
        |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |qv AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
        |c AS (SELECT vec_id AS doc_id,
        |        round(list_cosine_similarity(v, qv), 6) AS s
        |      FROM emb CROSS JOIN qv WHERE vec_id <> 0),
        |ctop AS (SELECT doc_id, s FROM c ORDER BY s DESC, doc_id LIMIT 100),
        |crank AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY s DESC, doc_id) AS rank FROM ctop),
        |u AS (SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM brank
        |      UNION ALL SELECT doc_id, 1.0 / (60.0 + rank) FROM crank)
        |SELECT doc_id AS id, round(sum(c), 6) AS rrf, count(*) AS n_lists
        |FROM u GROUP BY 1 ORDER BY rrf DESC, id LIMIT 20""".stripMargin,

    // the q_ngram_jaccard pair CTE + the q_split hash mapping
    "q_split_leakage" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
        |sp AS (SELECT doc_id,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT < 52429
        |         THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT < 58982
        |         THEN 'val'
        |       ELSE 'test' END AS split FROM documents)
        |SELECT sa.split AS split_a, sb.split AS split_b,
        |       count(*) AS n_leaked_pairs
        |FROM p JOIN sp sa ON p.id_a = sa.doc_id
        |       JOIN sp sb ON p.id_b = sb.doc_id
        |WHERE sa.split <> sb.split
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

    "q_weighted_median" ->
      """WITH t AS (SELECT source AS g, n_chars AS v,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> length(x) > 0)) AS BIGINT) AS w FROM documents),
        |a AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS wv FROM t
        |      WHERE v IS NOT NULL AND w > 0 GROUP BY 1, 2),
        |c AS (SELECT g, v,
        |    CAST(sum(wv) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(wv) OVER (PARTITION BY g) AS BIGINT) AS tot FROM a)
        |SELECT g AS source, min(v) AS weighted_median,
        |  CAST(max(tot) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY g ORDER BY source""".stripMargin,

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

    // trigram index is a lossless prefilter; the oracle is the direct
    // normalized contains + non-overlapping replace-count
    "q_substring_search" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(lower(text), '\s+', ' ', 'g') AS t FROM documents)
        |SELECT doc_id,
        |  CAST((length(t) - length(replace(t, 'batch batch', ''))) / 11
        |    AS BIGINT) AS n_occ
        |FROM t WHERE contains(t, 'batch batch') ORDER BY doc_id""".stripMargin,

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

    "q_source_mixture" ->
      """SELECT source, count(*) AS n_kept
        |FROM documents
        |WHERE CASE source
        |  WHEN 'src0' THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'ff'
        |  WHEN 'src1' THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
        |  WHEN 'src2' THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
        |  WHEN 'src3' THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |  ELSE false END
        |GROUP BY source ORDER BY source""".stripMargin,

    // the bucketed layout is a physical property; logically it's a plain
    // equi-join + aggregate
    "q_bucket_join" ->
      """SELECT c_custkey, c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin,

    // Exact n-gram Jaccard: Spark computes over 64-bit shingle hashes,
    // DuckDB over string shingle sets — identical values barring a
    // ~2^-64-probability hash collision.
    "q_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.s, b.s)) * 1.0 /
        |             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // the full self-join restricted to new-touching pairs — the
    // incremental operator must reproduce this exactly
    "q_incremental_dedup" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.s, b.s)) * 1.0 /
        |             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)
        |  AND len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

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

    // identical share/pow/normalize tree on both sides
    "q_mixture_weights" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
        |                             t -> length(t) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t,
        |               sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS z FROM per)
        |SELECT source, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / t, 6) AS token_share,
        |  round(pow(CAST(n_tokens AS DOUBLE), 0.5) / z, 6) AS weight
        |FROM per, tot ORDER BY source""".stripMargin,

    // components CTE copied verbatim from q_dedup_clusters_ngram, then
    // the inflation aggregates; keeper-token pick via row_number (the
    // deterministic mirror of Spark's min(struct(id, n_tokens)))
    "q_dup_inflation" ->
      """WITH RECURSIVE
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
        |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        |toks AS (SELECT doc_id,
        |           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |         FROM documents),
        |withcl AS (
        |  SELECT t.doc_id AS id, t.n_tokens,
        |    coalesce(cl.cluster_id, t.doc_id) AS cluster_id
        |  FROM toks t LEFT JOIN cl ON cl.id = t.doc_id),
        |per AS (
        |  SELECT cluster_id, count(*) AS cluster_size,
        |    CAST(sum(n_tokens) AS BIGINT) AS tok,
        |    CAST(sum(CASE WHEN rk = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS keeper_tok
        |  FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY id) AS rk
        |        FROM withcl) w
        |  GROUP BY cluster_id)
        |SELECT cluster_size, count(*) AS n_clusters,
        |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(tok - keeper_tok) AS BIGINT) AS dropped_tokens
        |FROM per GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    // threshold compares the ROUNDED ratio on both sides (parity rule)
    "q_stopwords" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents)),
        |d AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
        |tot AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT token, df, round(df * 1.0 / n_docs, 4) AS df_ratio
        |FROM d, tot
        |WHERE round(df * 1.0 / n_docs, 4) >= 0.6
        |ORDER BY token""".stripMargin,

    "q_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |vocab AS (SELECT token FROM (
        |  SELECT token, row_number() OVER (ORDER BY cnt DESC, token) AS rk
        |  FROM (SELECT token, count(*) AS cnt FROM tok GROUP BY token) c) r
        |  WHERE rk <= 30)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1.0
        |        / count(*), 4) AS oov_rate
        |FROM tok t LEFT JOIN vocab v ON t.token = v.token
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // shingle CTE copied from q_dedup_clusters_ngram: hashes engine-side
    // vs shingle strings oracle-side (q_cross_source collision argument)
    "q_novelty" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |ex AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(s) AS g FROM sh)),
        |f AS (SELECT g, min(doc_id) AS first_id FROM ex GROUP BY g)
        |SELECT e.doc_id, count(*) AS n_sh,
        |  CAST(sum(CASE WHEN f.first_id = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(sum(CASE WHEN f.first_id = e.doc_id THEN 1 ELSE 0 END) * 1.0
        |        / count(*), 4) AS novelty
        |FROM ex e JOIN f ON e.g = f.g
        |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,

    // quality subtree copied verbatim from q_quality_score; both engines
    // rank by the ROUNDED quality with doc_id tie-break
    "q_source_cap" ->
      """WITH q AS (
        |  SELECT doc_id, source,
        |    round((len_score + punct_score + sw_score) / 3.0, 4) AS quality
        |  FROM (SELECT doc_id, source,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT doc_id, source, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b)
        |SELECT doc_id, source, quality, rk FROM (
        |  SELECT doc_id, source, quality,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rk
        |  FROM q) t
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,

    // vote ties: (votes desc, best rank asc, label asc) on both sides
    "q_knn_classify" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
        |             label AS qlabel
        |           FROM embeddings WHERE vec_id < 50),
        |top AS (SELECT * FROM (
        |  SELECT q.query_id, q.qlabel AS true_label, c.label AS neighbor_label,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY round(list_cosine_similarity(c.cv, q.qv),6) DESC,
        |               c.neighbor_id) AS rk
        |  FROM q, (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
        |             label FROM embeddings) c
        |  WHERE c.neighbor_id <> q.query_id) t
        |  WHERE rk <= 5),
        |votes AS (
        |  SELECT query_id, true_label, neighbor_label,
        |    count(*) AS votes, min(rk) AS best
        |  FROM top GROUP BY query_id, true_label, neighbor_label)
        |SELECT query_id, true_label, neighbor_label AS pred_label, votes,
        |  (neighbor_label = true_label) AS correct
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY votes DESC, best, neighbor_label) AS vrk
        |      FROM votes) v
        |WHERE vrk = 1 ORDER BY query_id""".stripMargin,

    // integer micro-weights, HUGEINT sums mirroring Spark's
    // decimal(38,0); membership tests the ROUNDED cosine on both sides
    "q_tfidf_cosine" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |           x -> length(x) > 0) AS l FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_l FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM (
        |         SELECT doc_id, unnest(l) AS term FROM toks) u GROUP BY 1, 2),
        |dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |        CROSS JOIN n GROUP BY term, n_l
        |        HAVING CAST(count(*) AS BIGINT) * 10 <= n_l * 1),
        |w AS (SELECT doc_id, tf.term AS term, df,
        |        CAST(round(tf * (ln((1.0 + CAST(n_l AS DOUBLE)) / (1.0 + df)) + 1.0) * 10000, 0) AS BIGINT) AS w
        |      FROM tf JOIN dfx ON tf.term = dfx.term CROSS JOIN n),
        |nm AS (SELECT doc_id, sqrt(CAST(sum(w::HUGEINT * w) AS DOUBLE)) AS nrm
        |       FROM w GROUP BY 1),
        |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |           CAST(sum(a.w::HUGEINT * b.w) AS DOUBLE) AS dot
        |         FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        |         WHERE a.df >= 2
        |         GROUP BY 1, 2)
        |SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        |FROM dots JOIN nm na ON na.doc_id = id_a
        |          JOIN nm nb ON nb.doc_id = id_b
        |WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // quality subtree copied verbatim from q_source_cap; 2U stays
    // integer (HUGEINT) until the one final division, like Spark
    "q_auc" ->
      """WITH d AS (
        |  SELECT source,
        |    round((len_score + punct_score + sw_score) / 3.0, 4) AS score,
        |    (lang = 'en') AS lbl
        |  FROM (SELECT source, lang,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT source, lang, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b),
        |ps AS (SELECT source, score,
        |         CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |         CAST(sum(CASE WHEN lbl THEN 0 ELSE 1 END) AS BIGINT) AS nn
        |       FROM d GROUP BY 1, 2),
        |c AS (SELECT *, coalesce(sum(nn) OVER (PARTITION BY source
        |        ORDER BY score ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumnn
        |      FROM ps)
        |SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
        |  CAST(sum(nn) AS BIGINT) AS n_neg,
        |  round(CAST(sum(np * (2 * cumnn + nn)) AS DOUBLE) /
        |        (2.0 * sum(np) * sum(nn)), 4) AS auc
        |FROM c GROUP BY source
        |HAVING sum(np) > 0 AND sum(nn) > 0
        |ORDER BY source""".stripMargin,

    // dominance by brute-force NOT EXISTS — the O(n²) oracle of the
    // two-bounded-aggregate frontier; equal twins survive on both sides
    "q_pareto_docs" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    round((len_score + punct_score + sw_score) / 3.0, 4) AS quality,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM (SELECT doc_id, text,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT doc_id, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b)
        |SELECT doc_id, quality, n_tokens FROM q p
        |WHERE NOT EXISTS (SELECT 1 FROM q o WHERE
        |  (o.quality > p.quality AND o.n_tokens <= p.n_tokens) OR
        |  (o.quality >= p.quality AND o.n_tokens < p.n_tokens))
        |ORDER BY quality DESC, n_tokens, doc_id""".stripMargin,

    // quality subtree verbatim from q_auc; integer score units until
    // the two final divisions
    "q_calibration" ->
      """WITH d AS (
        |  SELECT round((len_score + punct_score + sw_score) / 3.0, 4) AS score,
        |    (lang = 'en') AS lbl
        |  FROM (SELECT lang,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT lang, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b),
        |bn AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
        |         CAST(round(score * 10000, 0) AS BIGINT) AS u, lbl FROM d)
        |SELECT bin, count(*) AS n,
        |  CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  round(CAST(sum(u) AS DOUBLE) / count(*) / 10000.0, 6) AS mean_score,
        |  round(CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pos_rate
        |FROM bn GROUP BY bin ORDER BY bin""".stripMargin,

    // same quality/bin subtree; (p−q)·ln(p/q) tree written identically,
    // Laplace +1 per observed bin, denominators +10
    "q_psi" ->
      """WITH d AS (
        |  SELECT CAST(least(floor(round((len_score + punct_score + sw_score) / 3.0, 4) * 10), 9) AS BIGINT) AS bin,
        |    (lang = 'en') AS base
        |  FROM (SELECT lang,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT lang, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b),
        |c AS (SELECT bin,
        |        CAST(sum(CASE WHEN base THEN 1 ELSE 0 END) AS BIGINT) AS cb,
        |        CAST(sum(CASE WHEN base THEN 0 ELSE 1 END) AS BIGINT) AS cc
        |      FROM d GROUP BY bin),
        |t AS (SELECT CAST(sum(cb) AS BIGINT) AS tb,
        |        CAST(sum(cc) AS BIGINT) AS tc FROM c)
        |SELECT count(*) AS n_bins,
        |  round(sum(((cb + 1)::DOUBLE / (tb + 10) - (cc + 1)::DOUBLE / (tc + 10)) *
        |        ln(((cb + 1)::DOUBLE / (tb + 10)) / ((cc + 1)::DOUBLE / (tc + 10)))), 6) AS psi
        |FROM c, t""".stripMargin,

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

    // identical oracle shape to q_ngram_jaccard (the SQL-surface variant
    // computes the same pairs)
    "q_ngram_jaccard_sql" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.s, b.s)) * 1.0 /
        |             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_clusters" ->
      """WITH RECURSIVE
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id)
        |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "q_dedup_clusters_star" ->
      """WITH RECURSIVE
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id)
        |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "q_dedup_keepers" ->
      """WITH RECURSIVE
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
        |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT e.vec_id AS id, coalesce(c.cluster_id, e.vec_id) AS keeper_id,
        |       e.vec_id = coalesce(c.cluster_id, e.vec_id) AS keep
        |FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
        |ORDER BY id""".stripMargin,

    // Same recursive-CTE component oracle as q_dedup_clusters, but over
    // the n-gram-Jaccard pair set (string-shingle sets mirror Spark's
    // 64-bit shingle hashes — identical pairs barring a ~2^-64 collision).
    "q_dedup_clusters_ngram" ->
      """WITH RECURSIVE
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id)
        |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "q_dedup_keepers_ngram" ->
      """WITH RECURSIVE
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
        |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT d.doc_id AS id, coalesce(c.cluster_id, d.doc_id) AS keeper_id,
        |       d.doc_id = coalesce(c.cluster_id, d.doc_id) AS keep
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        |ORDER BY id""".stripMargin,

    // same component CTE as q_dedup_keepers_ngram; keeper = max integer
    // quality units (q_calibration subtree), ties broken by min id
    "q_dedup_keepers_quality" ->
      """WITH RECURSIVE
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
        |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        |qual AS (
        |  SELECT doc_id,
        |    CAST(round(round((len_score + punct_score + sw_score) / 3.0, 4) * 10000, 0) AS BIGINT) AS qu
        |  FROM (SELECT doc_id,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT doc_id, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b),
        |m AS (
        |  SELECT d.doc_id AS id, coalesce(c.cluster_id, d.doc_id) AS cid, q.qu
        |  FROM documents d
        |  LEFT JOIN comp c ON d.doc_id = c.id
        |  JOIN qual q ON q.doc_id = d.doc_id),
        |k AS (
        |  SELECT id, cid,
        |    row_number() OVER (PARTITION BY cid ORDER BY qu DESC, id ASC) AS rn
        |  FROM m)
        |SELECT m.id, kk.id AS keeper_id, m.id = kk.id AS keep
        |FROM m JOIN (SELECT cid, id FROM k WHERE rn = 1) kk ON m.cid = kk.cid
        |ORDER BY m.id""".stripMargin,

    // Same string-shingle-vs-64-bit-hash equivalence as q_ngram_jaccard:
    // the benchmark's distinct shingle universe is a flattened list and
    // overlap counts come from list_intersect.
    "q_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |bench AS (SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id % 50 = 0)
        |SELECT doc_id, cast(len(s) AS BIGINT) AS n_sh,
        |  cast(len(list_intersect(s, bs)) AS BIGINT) AS n_shared,
        |  round(CASE WHEN len(s) = 0 THEN 0.0
        |             ELSE len(list_intersect(s, bs)) * 1.0 / len(s) END, 4) AS overlap_frac,
        |  len(list_intersect(s, bs)) > 0 AS contaminated
        |FROM sh CROSS JOIN bench WHERE doc_id % 50 != 0
        |ORDER BY doc_id""".stripMargin,

    // Bloom prefilter has no false negatives and survivors are
    // exact-verified, so the bloom variant matches the exact oracle
    // verbatim
    "q_decontaminate_bloom" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |bench AS (SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id % 50 = 0)
        |SELECT doc_id, cast(len(s) AS BIGINT) AS n_sh,
        |  cast(len(list_intersect(s, bs)) AS BIGINT) AS n_shared,
        |  round(CASE WHEN len(s) = 0 THEN 0.0
        |             ELSE len(list_intersect(s, bs)) * 1.0 / len(s) END, 4) AS overlap_frac,
        |  len(list_intersect(s, bs)) > 0 AS contaminated
        |FROM sh CROSS JOIN bench WHERE doc_id % 50 != 0
        |ORDER BY doc_id""".stripMargin,

    // Composition of the q_quality_score / q_repetition / q_decontaminate
    // fragments plus a min-per-text-partition exact keeper (Spark groups
    // by xxhash64(text) — same equivalence classes as the text itself
    // barring a 2^-64 collision, the q_dedup_hash argument).
    "q_curation_pipeline" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t),
        |bench AS (SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id % 50 = 0),
        |docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 != 0),
        |sig AS (
        |  SELECT doc_id,
        |    round((len_score + punct_score + sw_score) / 3.0, 4) AS quality,
        |    round(CASE WHEN len(toks) = 0 THEN 0.0
        |               ELSE 1.0 - len(list_distinct(toks)) * 1.0 / len(toks) END, 4)
        |      AS dup_token_frac
        |  FROM (SELECT doc_id, toks,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toksl) = 0 THEN 0.0
        |                  ELSE len(list_filter(toksl, t -> t IN ('the','a','of','and'))) * 1.0 / len(toksl)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT doc_id, text,
        |                list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toksl
        |              FROM docs) a) b),
        |con AS (
        |  SELECT doc_id, len(list_intersect(s, bs)) > 0 AS contaminated
        |  FROM sh CROSS JOIN bench WHERE doc_id % 50 != 0),
        |keepers AS (
        |  SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY text) AS is_exact_keeper
        |  FROM docs)
        |SELECT g.doc_id, g.quality, g.dup_token_frac, c.contaminated, k.is_exact_keeper,
        |  (g.quality >= 0.5 AND g.dup_token_frac <= 0.6
        |   AND NOT c.contaminated AND k.is_exact_keeper) AS keep
        |FROM sig g JOIN con c USING (doc_id) JOIN keepers k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_cosine_topk" ->
      """SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT q.query_id, c.neighbor_id,
        |    round(list_cosine_similarity(c.cv, q.qv),6) AS cos_sim,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY round(list_cosine_similarity(c.cv, q.qv),6) DESC, c.neighbor_id) AS rank
        |  FROM (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |        FROM embeddings WHERE vec_id < 5) q,
        |       (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings) c
        |  WHERE c.neighbor_id <> q.query_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // same shape as q_cosine_topk with the different-label restriction
    "q_hard_negatives" ->
      """SELECT query_id, neighbor_id, cos_sim, rank FROM (
        |  SELECT q.query_id, c.neighbor_id,
        |    round(list_cosine_similarity(c.cv, q.qv),6) AS cos_sim,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY round(list_cosine_similarity(c.cv, q.qv),6) DESC, c.neighbor_id) AS rank
        |  FROM (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
        |        FROM embeddings WHERE vec_id < 5) q,
        |       (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label FROM embeddings) c
        |  WHERE c.neighbor_id <> q.query_id AND c.label <> q.qlabel) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // same ranking contract as q_cosine_topk; idcg via generate_series;
    // ln(x)/ln(2) spelled identically to the Spark side
    "q_retrieval_eval" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
        |           FROM embeddings WHERE vec_id < 20),
        |tot AS (SELECT q.query_id, CAST(count(*) - 1 AS BIGINT) AS n_rel
        |        FROM q JOIN embeddings e ON e.label = q.qlabel GROUP BY 1),
        |ranked AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    CASE WHEN c.label = q.qlabel THEN 1 ELSE 0 END AS rel,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY round(list_cosine_similarity(c.cv, q.qv),6) DESC, c.neighbor_id) AS rank
        |  FROM q, (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label
        |           FROM embeddings) c
        |  WHERE c.neighbor_id <> q.query_id),
        |agg AS (SELECT query_id,
        |    CAST(sum(rel) AS BIGINT) AS hits,
        |    min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
        |    sum(CASE WHEN rel = 1 THEN 1.0 / (ln(rank + 1.0) / ln(2.0)) ELSE 0.0 END) AS dcg
        |  FROM ranked WHERE rank <= 10 GROUP BY 1)
        |SELECT a.query_id, a.hits, t.n_rel,
        |  coalesce(round(1.0 / first_rel, 6), 0.0) AS rr,
        |  round(a.hits / 10.0, 6) AS precision_k,
        |  round(CASE WHEN least(10, t.n_rel) > 0
        |        THEN CAST(a.hits AS DOUBLE) / least(10, t.n_rel) ELSE 0.0 END, 6) AS recall_k,
        |  round(CASE WHEN least(10, t.n_rel) > 0
        |        THEN dcg / list_sum(list_transform(generate_series(1, least(10, t.n_rel)),
        |                 i -> 1.0 / (ln(i + 1.0) / ln(2.0)))) ELSE 0.0 END, 6) AS ndcg_k
        |FROM agg a JOIN tot t USING (query_id) ORDER BY query_id""".stripMargin,

    // same ranked CTE as q_retrieval_eval, grouped by the label pair
    "q_confusion_pairs" ->
      """SELECT query_label, neighbor_label, count(*) AS n FROM (
        |  SELECT q.qlabel AS query_label, c.label AS neighbor_label,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY round(list_cosine_similarity(c.cv, q.qv),6) DESC, c.neighbor_id) AS rank
        |  FROM (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
        |        FROM embeddings WHERE vec_id < 50) q,
        |       (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label
        |        FROM embeddings) c
        |  WHERE c.neighbor_id <> q.query_id) t
        |WHERE rank <= 10
        |GROUP BY query_label, neighbor_label
        |ORDER BY query_label, neighbor_label""".stripMargin,

    // quality subtree copied verbatim from q_quality_score; exact-long
    // running sum so the budget cut cannot float-flip
    "q_token_budget" ->
      """SELECT doc_id, source, quality, n_tokens, cum_tokens FROM (
        |  SELECT doc_id, source, quality, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM (SELECT doc_id, source,
        |          round((least(length(text) / 500.0, 1.0)
        |            + (1.0 - least(
        |                (CASE WHEN length(text) = 0 THEN 0.0
        |                      ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |                 END) * 5.0, 1.0))
        |            + (1.0 - abs(
        |                (CASE WHEN len(toks) = 0 THEN 0.0
        |                      ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |                 END) - 0.4))) / 3.0, 4) AS quality,
        |          CAST(len(toks) AS BIGINT) AS n_tokens
        |        FROM (SELECT doc_id, source, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b) c
        |WHERE cum_tokens <= 800 ORDER BY source, doc_id""".stripMargin,

    // identical one-pass variance tree on both sides
    "q_label_centroids" ->
      """SELECT label, dim, round(avg(v), 6) AS mean_v,
        |  round(avg(v*v) - avg(v)*avg(v), 6) AS var_v
        |FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
        |             CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
        |      FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "q_embedding_norm" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))),6) AS l2_norm,
        |  cast(len(embedding) AS BIGINT) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, cast(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5, substring(md5(text),1,8) AS fp8
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the luma math is double-exact on both sides: Spark folds the
    // integer pixel sum to sum/(rows·w·765) — identical reals to
    // (g*3)/765.0, so both correctly-rounded doubles agree — then the
    // float32 feature round-trips through DuckDB's REAL cast
    "q_image_decode" ->
      """SELECT doc_id AS asset_id,
        |       CAST(doc_id % 64 + 1 AS BIGINT) AS width,
        |       CAST(doc_id % 48 + 1 AS BIGINT) AS height,
        |       round(CAST(CAST((doc_id % 256) * 3 / 765.0 AS REAL) AS DOUBLE), 6) AS luma
        |FROM documents ORDER BY asset_id""".stripMargin,

    // RMS of a constant-sample signal is exactly |v|/32768 (see the
    // fixture scaladoc); the float32 feature round-trips through
    // DuckDB's REAL cast like q_image_decode's luma
    "q_audio_decode" ->
      """SELECT doc_id AS asset_id,
        |       CAST(8000 AS BIGINT) AS sample_rate,
        |       CAST(1 AS BIGINT) AS channels,
        |       CAST(doc_id % 800 + 1 AS BIGINT) AS n_frames,
        |       CAST((doc_id % 800 + 1) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |       round(CAST(CAST(abs(doc_id % 20000 - 10000) / 32768.0 AS REAL) AS DOUBLE), 6) AS rms1
        |FROM documents ORDER BY asset_id""".stripMargin,

    "q_frame_sample" ->
      """SELECT doc_id AS asset_id, frame_idx,
        |       cast(floor(frame_idx * duration_ms / 3.0) AS BIGINT) AS ts_ms FROM
        |(SELECT doc_id, unnest(range(3)) AS frame_idx, length(text)*10 AS duration_ms
        | FROM documents) t
        |ORDER BY asset_id, frame_idx""".stripMargin,

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

    "q_shuffle_rank" ->
      """SELECT doc_id, skey, rank FROM (
        |  SELECT doc_id, md5(cast(doc_id AS VARCHAR) || ':ep1') AS skey,
        |    row_number() OVER (
        |      ORDER BY md5(cast(doc_id AS VARCHAR) || ':ep1'), doc_id) AS rank
        |  FROM documents) t
        |ORDER BY rank""".stripMargin,

    // ntile over the identical (quality, doc_id) total order — the
    // quality expression is q_quality_score's hash-verified formula
    "q_quality_bins" ->
      """WITH q AS (SELECT doc_id, source,
        |  round((least(length(text) / 500.0, 1.0)
        |   + 1.0 - least(
        |       (CASE WHEN length(text) = 0 THEN 0.0
        |             ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |        END) * 5.0, 1.0)
        |   + 1.0 - abs(
        |       (CASE WHEN len(toks) = 0 THEN 0.0
        |             ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |        END) - 0.4)) / 3.0, 4) AS quality
        |FROM (SELECT doc_id, source,
        |        list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks,
        |        text
        |      FROM documents) a),
        |b AS (SELECT source,
        |        ntile(4) OVER (ORDER BY quality, doc_id) AS bin FROM q)
        |SELECT bin, source, count(*) AS n_docs FROM b
        |GROUP BY bin, source ORDER BY bin, source""".stripMargin,

    "q_bpe_pairs" ->
      """WITH t AS (SELECT list_filter(string_split_regex(text, '\s+'),
        |                  x -> length(x) > 0) AS l FROM documents),
        |p AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z
        |      FROM t WHERE len(l) >= 2)
        |SELECT z[1] AS a, z[2] AS b, count(*) AS n FROM p
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY n DESC, a, b""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |           x -> length(x) > 0) AS l FROM documents),
        |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM (
        |         SELECT doc_id, unnest(l) AS term FROM toks) u GROUP BY 1, 2),
        |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
        |wt AS (SELECT doc_id, tf.term AS term,
        |         round(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 6) AS tfidf
        |       FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT doc_id, term, tfidf, rk FROM (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, term) AS rk FROM wt) t
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |           x -> length(x) > 0) AS l FROM documents),
        |dl AS (SELECT doc_id, cast(len(l) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM (
        |         SELECT doc_id, unnest(l) AS term FROM toks) u
        |       WHERE term IN ('vector','hash','stream') GROUP BY 1, 2),
        |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1)
        |SELECT tf.doc_id,
        |  round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |    * tf * (1.2 + 1.0)
        |    / (tf + ((dl / avgdl) * 0.75 + (1.0 - 0.75)) * 1.2)), 4) AS score
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin,

    "q_fuzzy_join" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name AS name FROM part),
        |rf AS (SELECT name, row_number() OVER (ORDER BY name) AS rnk FROM names),
        |rr AS (SELECT name,
        |       row_number() OVER (ORDER BY reverse(name), name) AS rnk FROM names),
        |cand AS (
        |  SELECT least(a.name, b.name) AS name_a,
        |         greatest(a.name, b.name) AS name_b
        |  FROM rf a JOIN rf b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 10
        |  UNION
        |  SELECT least(a.name, b.name), greatest(a.name, b.name)
        |  FROM rr a JOIN rr b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 10)
        |SELECT name_a, name_b,
        |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(name_a, name_b) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    "q_salted_join" ->
      """SELECT s_name, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "q_cms_counts" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> length(x) > 0)) AS tok FROM documents)
        |SELECT tok, count(*) AS est_count FROM t
        |GROUP BY tok ORDER BY tok""".stripMargin,

    "q_sorted_neighbors" ->
      """WITH keyed AS (
        |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS sk
        |  FROM documents),
        |r AS (SELECT doc_id, row_number() OVER (ORDER BY sk, doc_id) AS rnk FROM keyed),
        |cand AS (
        |  SELECT least(a.doc_id, b.doc_id) AS id_a,
        |         greatest(a.doc_id, b.doc_id) AS id_b
        |  FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 5),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
        |  SELECT id_a, id_b,
        |    len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
        |  FROM cand JOIN sh a ON a.doc_id = cand.id_a
        |            JOIN sh b ON b.doc_id = cand.id_b) t
        |WHERE j >= 0.1 ORDER BY id_a, id_b""".stripMargin,

    "q_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> length(x) > 0)) AS t FROM documents),
        |freq AS (SELECT t, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        |       round(sum(ln(cnt / tot)) / count(*), 4) AS avg_logp
        |FROM toks JOIN freq USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

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

    // bigram extraction mirrors q_bpe_pairs; marginals and N come from
    // the same bigram table so both engines divide identical integers
    "q_collocations" ->
      """WITH t AS (SELECT list_filter(string_split_regex(text, '\s+'),
        |                  x -> length(x) > 0) AS l FROM documents),
        |pr AS (SELECT z[1] AS a, z[2] AS b FROM (
        |         SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z
        |         FROM t WHERE len(l) >= 2) u),
        |big AS (SELECT a, b, count(*) AS cab FROM pr GROUP BY 1, 2),
        |pre AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM big GROUP BY 1),
        |suf AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb FROM big GROUP BY 1),
        |tot AS (SELECT CAST(sum(cab) AS BIGINT) AS tot FROM big)
        |SELECT a, b, cab, round(ln((cab * tot) / (ca * cb)), 6) AS pmi
        |FROM big JOIN pre USING (a) JOIN suf USING (b) CROSS JOIN tot
        |WHERE cab >= 5 ORDER BY a, b""".stripMargin,

    // the edges CTE mirrors q_pagerank's reconstruction of the k-NN
    // fixture; then two unrolled vote/pick/carry label rounds
    "q_label_prop" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT src, dst FROM edges UNION SELECT dst, src FROM edges) u
        |  WHERE src <> dst),
        |nodes AS (SELECT DISTINCT src AS id FROM sym),
        |l0 AS (SELECT id, id AS label FROM nodes),
        |v1 AS (SELECT s.dst AS id, l.label, count(*) AS c
        |       FROM sym s JOIN l0 l ON l.id = s.src GROUP BY 1, 2),
        |p1 AS (SELECT id, label FROM (
        |         SELECT id, label, row_number() OVER (
        |           PARTITION BY id ORDER BY c DESC, label) AS rn FROM v1) t
        |       WHERE rn = 1),
        |l1 AS (SELECT n.id, coalesce(p1.label, n.id) AS label
        |       FROM nodes n LEFT JOIN p1 USING (id)),
        |v2 AS (SELECT s.dst AS id, l.label, count(*) AS c
        |       FROM sym s JOIN l1 l ON l.id = s.src GROUP BY 1, 2),
        |p2 AS (SELECT id, label FROM (
        |         SELECT id, label, row_number() OVER (
        |           PARTITION BY id ORDER BY c DESC, label) AS rn FROM v2) t
        |       WHERE rn = 1),
        |l2 AS (SELECT n.id, coalesce(p2.label, n.id) AS label
        |       FROM nodes n LEFT JOIN p2 USING (id))
        |SELECT id, label FROM l2 ORDER BY id""".stripMargin,

    "q_histogram" ->
      """WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |           FROM lineitem)
        |SELECT CAST(CASE WHEN hi = lo THEN 0
        |            ELSE least(floor((l_extendedprice - lo) / ((hi - lo) / 20)), 19)
        |       END AS BIGINT) AS bucket, count(*) AS n
        |FROM lineitem CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_corr_regr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |  round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_outlier_iqr" ->
      """WITH q AS (SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |                  quantile_cont(value, 0.75) AS q3
        |           FROM events GROUP BY 1),
        |f AS (SELECT event_type, q1 - (q3 - q1) * 1.5 AS flo,
        |             q3 + (q3 - q1) * 1.5 AS fhi FROM q)
        |SELECT e.event_type, count(*) AS n_outliers,
        |       round(min(value), 4) AS out_min, round(max(value), 4) AS out_max
        |FROM events e JOIN f USING (event_type)
        |WHERE value < flo OR value > fhi
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_entropy" ->
      """WITH t AS (SELECT source,
        |    unnest(list_filter(string_split_regex(text, '\s+'),
        |      x -> length(x) > 0)) AS tok FROM documents),
        |c AS (SELECT source, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT source, count(*) AS n_distinct, max(tot) AS n_total,
        |       round(-sum((cnt / tot) * ln(cnt / tot)), 6) AS entropy
        |FROM c JOIN tot USING (source)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_mad" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |           FROM events GROUP BY 1)
        |SELECT e.event_type, round(max(med), 4) AS median,
        |       round(quantile_cont(abs(value - med), 0.5), 4) AS mad,
        |       count(*) AS n
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_chisq" ->
      """WITH e AS (SELECT event_type AS a,
        |    ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS b FROM events),
        |c AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
        |r AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM c GROUP BY 1),
        |cc AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |             count(DISTINCT a) AS ka, count(DISTINCT b) AS kb FROM c)
        |SELECT round(sum(o * o / (ra * cb / n)) - max(n), 6) AS chi2,
        |       CAST((max(ka) - 1) * (max(kb) - 1) AS BIGINT) AS dof,
        |       max(n) AS n
        |FROM c JOIN r USING (a) JOIN cc USING (b) CROSS JOIN t""".stripMargin,

    "q_transitions" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS tu, event_id,
        |                  event_type FROM events),
        |s AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY tu, event_id) AS to_type FROM e)
        |SELECT from_type, to_type, count(*) AS n FROM s
        |WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_dist" ->
      """SELECT o_custkey, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_jaro" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |r AS (SELECT name, row_number() OVER (ORDER BY name) AS rnk FROM names),
        |cand AS (SELECT a.name AS name_a, b.name AS name_b
        |         FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 5)
        |SELECT name_a, name_b,
        |       round(jaro_winkler_similarity(name_a, name_b), 6) AS jw
        |FROM cand
        |WHERE round(jaro_winkler_similarity(name_a, name_b), 6) >= 0.9
        |ORDER BY name_a, name_b""".stripMargin,

    "q_gini" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c, l_suppkey) AS rnk FROM c)
        |SELECT round((2.0 * sum(rnk * c)) / (count(*) * sum(c))
        |         - (count(*) + 1) / count(*), 6) AS gini,
        |       count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS total
        |FROM r""".stripMargin,

    "q_cooccurrence" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
        |            FROM lineitem),
        |nb AS (SELECT count(DISTINCT bk) AS n FROM it),
        |sup AS (SELECT item, count(*) AS s FROM it GROUP BY 1),
        |p AS (SELECT a.item AS item_a, b.item AS item_b
        |      FROM it a JOIN it b ON a.bk = b.bk AND a.item < b.item),
        |pc AS (SELECT item_a, item_b, count(*) AS n_ab FROM p
        |       GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, n_ab,
        |       round((n_ab * n) / (sa.s * sb.s), 6) AS lift
        |FROM pc JOIN sup sa ON sa.item = pc.item_a
        |        JOIN sup sb ON sb.item = pc.item_b CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,

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

    "q_weighted_sample" ->
      """WITH s AS (SELECT p_brand, p_partkey,
        |  round(pow((('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 12))::BIGINT + 1)
        |              / 281474976710656.0,
        |            1.0 / p_retailprice), 9) AS score FROM part)
        |SELECT p_brand, p_partkey, score FROM (
        |  SELECT p_brand, p_partkey, score, row_number() OVER (
        |    PARTITION BY p_brand ORDER BY score DESC, p_partkey) AS rk
        |  FROM s) t
        |WHERE rk <= 3 ORDER BY p_brand, p_partkey""".stripMargin,

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

    // identical to q_ngram_jaccard's oracle: the prefix-filtered join
    // must reproduce the brute-force exact join bit-for-bit
    "q_ppjoin" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0)) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
        |        FROM documents) t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.s, b.s)) * 1.0 /
        |             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q_mutual_info" ->
      """WITH e AS (SELECT event_type AS a,
        |    ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS b FROM events),
        |c AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
        |r AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM c GROUP BY 1),
        |cc AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c)
        |SELECT round(sum((o / n) * ln((o * n) / (ra * cb))), 6) AS mi,
        |       max(n) AS n
        |FROM c JOIN r USING (a) JOIN cc USING (b) CROSS JOIN t""".stripMargin,

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

    "q_khop" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT src, dst FROM edges UNION SELECT dst, src FROM edges) u
        |  WHERE src <> dst),
        |two AS (SELECT a.src, b.dst FROM sym a JOIN sym b ON a.dst = b.src
        |        WHERE a.src <> b.dst),
        |reach AS (SELECT src, dst FROM sym UNION SELECT src, dst FROM two)
        |SELECT src AS id, count(*) AS n_within_2 FROM reach
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cross_source" ->
      """WITH sh AS (
        |  SELECT DISTINCT source, shingle FROM (
        |    SELECT source, unnest(list_distinct(list_filter(
        |      list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' ')),
        |      s -> length(s) > 0))) AS shingle
        |    FROM (SELECT source,
        |            list_filter(string_split_regex(text, '\s+'),
        |              t -> length(t) > 0) AS toks
        |          FROM documents) t) u)
        |SELECT a.source AS source_a, b.source AS source_b,
        |       count(*) AS n_shared
        |FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_split" ->
      """SELECT source,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT < 52429
        |         THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT < 58982
        |         THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_winsorize" ->
      """WITH f AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  round(avg(l_extendedprice), 4) AS mean_raw,
        |  round(avg(least(greatest(l_extendedprice, lo), hi)), 4) AS mean_winsorized,
        |  CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  count(*) AS n
        |FROM lineitem l JOIN f USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q_normalize_text" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(strip_accents(
        |    '  CaFé  ÑANDÚ' || chr(9) || 'àëï  Ök ' ||
        |    CAST(doc_id AS VARCHAR) || '  ')), '\s+', ' ', 'g')) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // (1 - 0.7) is written as the expression, not the literal 0.3 — the
    // doubles differ in the last ulp and both sides must compute the
    // same interpolation weight
    "q_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |                    x -> length(x) > 0) AS l FROM documents),
        |pr AS (SELECT doc_id, z[1] AS a, z[2] AS b FROM (
        |         SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z
        |         FROM t WHERE len(l) >= 2) u),
        |big AS (SELECT a, b, count(*) AS cab FROM pr GROUP BY 1, 2),
        |pre AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM big GROUP BY 1),
        |suf AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb FROM big GROUP BY 1),
        |tot AS (SELECT CAST(sum(cab) AS BIGINT) AS tot FROM big)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       round(sum(ln(0.7 * cab / ca + (1 - 0.7) * cb / tot)) / count(*), 4) AS avg_logp
        |FROM pr JOIN big USING (a, b) JOIN pre USING (a) JOIN suf USING (b)
        |CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // three unrolled power iterations; every arithmetic step mirrors the
    // Spark update rule's evaluation order so doubles agree bit-for-bit
    // before the final 6dp round
    "q_pagerank" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |nodes AS MATERIALIZED (
        |  SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |cnt AS (SELECT count(*) AS n FROM nodes),
        |deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY 1),
        |p0 AS (SELECT id, 1.0 / n AS pr FROM nodes CROSS JOIN cnt),
        |c1 AS (SELECT e.dst AS id,
        |       list_reduce(list(p.pr / deg.d ORDER BY p.pr / deg.d),
        |                   (a, b) -> a + b) AS cin FROM edges e
        |       JOIN deg ON deg.src = e.src JOIN p0 p ON p.id = e.src GROUP BY e.dst),
        |p1 AS (SELECT nodes.id, (1.0 - 0.85) / n + coalesce(cin, 0.0) * 0.85 AS pr
        |       FROM nodes CROSS JOIN cnt LEFT JOIN c1 ON c1.id = nodes.id),
        |c2 AS (SELECT e.dst AS id,
        |       list_reduce(list(p.pr / deg.d ORDER BY p.pr / deg.d),
        |                   (a, b) -> a + b) AS cin FROM edges e
        |       JOIN deg ON deg.src = e.src JOIN p1 p ON p.id = e.src GROUP BY e.dst),
        |p2 AS (SELECT nodes.id, (1.0 - 0.85) / n + coalesce(cin, 0.0) * 0.85 AS pr
        |       FROM nodes CROSS JOIN cnt LEFT JOIN c2 ON c2.id = nodes.id),
        |c3 AS (SELECT e.dst AS id,
        |       list_reduce(list(p.pr / deg.d ORDER BY p.pr / deg.d),
        |                   (a, b) -> a + b) AS cin FROM edges e
        |       JOIN deg ON deg.src = e.src JOIN p2 p ON p.id = e.src GROUP BY e.dst),
        |p3 AS (SELECT nodes.id, (1.0 - 0.85) / n + coalesce(cin, 0.0) * 0.85 AS pr
        |       FROM nodes CROSS JOIN cnt LEFT JOIN c3 ON c3.id = nodes.id)
        |SELECT id, round(pr, 6) AS pr FROM p3 ORDER BY id""".stripMargin,

    // same k-NN edge rebuild as q_pagerank; triangles by id-ordered
    // 3-way join over the canonical undirected edge set
    "q_triangles" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |ce AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        |  FROM edges WHERE src <> dst),
        |tri AS (
        |  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |  FROM ce e1
        |  JOIN ce e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
        |  JOIN ce e3 ON e3.lo = e1.hi AND e3.hi = e2.hi)
        |SELECT id, count(*) AS n_tri
        |FROM (SELECT unnest([a, b, c]) AS id FROM tri) u
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_knn_graph" ->
      """SELECT src, dst, sim, rk FROM (
        |  SELECT a.vid AS src, b.vid AS dst,
        |    round(list_cosine_similarity(a.v, b.v), 6) AS sim,
        |    row_number() OVER (PARTITION BY a.vid
        |      ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |               b.vid) AS rk
        |  FROM (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
        |        WHERE vec_id < 500) a
        |  JOIN (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
        |        WHERE vec_id < 500) b
        |    ON a.vid <> b.vid) t
        |WHERE rk <= 3 ORDER BY src, rk""".stripMargin,

    // same k-NN prelude; RA index summed as exact integer pico-units
    "q_link_predict" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT src, dst FROM edges UNION SELECT dst, src FROM edges) u
        |  WHERE src <> dst),
        |deg AS (SELECT src AS z, count(*) AS d FROM sym GROUP BY 1),
        |nbr AS (SELECT s.src AS z, s.dst AS n, deg.d
        |        FROM sym s JOIN deg ON deg.z = s.src),
        |wedge AS (
        |  SELECT a.n AS id_a, b.n AS id_b, a.d AS d
        |  FROM nbr a JOIN nbr b ON a.z = b.z AND a.n < b.n),
        |scored AS (
        |  SELECT id_a, id_b, count(*) AS n_common,
        |         sum(1000000000000 // d) AS ra
        |  FROM wedge GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT s.id_a, s.id_b, s.n_common,
        |       round(s.ra / 1e12, 6) AS ra_score
        |FROM scored s
        |LEFT JOIN (SELECT src AS id_a, dst AS id_b FROM sym WHERE src < dst) e
        |  ON e.id_a = s.id_a AND e.id_b = s.id_b
        |WHERE e.id_a IS NULL
        |ORDER BY 1, 2""".stripMargin,

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

    "q_spearman" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS x,
        |    (epoch_ns(ts)//1000) % 86400000000 AS y
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT g,
        |    rank() OVER (PARTITION BY g ORDER BY x)
        |      + (count(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS rx,
        |    rank() OVER (PARTITION BY g ORDER BY y)
        |      + (count(*) OVER (PARTITION BY g, y) - 1) / 2.0 AS ry
        |  FROM b)
        |SELECT g AS event_type, count(*) AS n, round(corr(rx, ry), 4) AS rho
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // 1-based list indexing; same consecutive-token predicate
    "q_phrase_search" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> length(x) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(len(list_filter(
        |    range(1, greatest(len(toks) - 2, 0) + 2),
        |    i -> toks[i] = 'batch' AND toks[i+1] = 'batch')) AS BIGINT)
        |  AS n_occ
        |FROM t
        |WHERE len(toks) >= 2 AND len(list_filter(
        |    range(1, greatest(len(toks) - 2, 0) + 2),
        |    i -> toks[i] = 'batch' AND toks[i+1] = 'batch')) >= 1
        |ORDER BY doc_id""".stripMargin,

    "q_ctfidf" ->
      """WITH tok AS (SELECT source AS class,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> length(x) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT class, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |f AS (SELECT term, sum(tf) AS f FROM tf GROUP BY 1),
        |a AS (SELECT CAST(sum(tf) AS DOUBLE) / count(DISTINCT class) AS a
        |      FROM tf),
        |sc AS (SELECT tf.class, tf.term, tf.tf,
        |         round(tf.tf * ln(1.0 + a.a / f.f), 4) AS score
        |       FROM tf JOIN f USING (term) CROSS JOIN a
        |       WHERE tf.tf >= 2),
        |r AS (SELECT class, term, tf, score,
        |    row_number() OVER (PARTITION BY class
        |      ORDER BY score DESC, term ASC) AS rk FROM sc)
        |SELECT class AS source, term, tf, score, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin,

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

    // same quality expression as q_quality_bins; ntile(10) descending
    "q_gains" ->
      """WITH q AS (SELECT doc_id, lang,
        |  round((least(length(text) / 500.0, 1.0)
        |   + 1.0 - least(
        |       (CASE WHEN length(text) = 0 THEN 0.0
        |             ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |        END) * 5.0, 1.0)
        |   + 1.0 - abs(
        |       (CASE WHEN len(toks) = 0 THEN 0.0
        |             ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |        END) - 0.4)) / 3.0, 4) AS quality
        |FROM (SELECT doc_id, lang,
        |        list_filter(string_split_regex(lower(text), '\s+'),
        |          t -> length(t) > 0) AS toks,
        |        text
        |      FROM documents) a),
        |b AS (SELECT lang,
        |        ntile(10) OVER (ORDER BY quality DESC, doc_id) AS decile
        |      FROM q),
        |a2 AS (SELECT decile, count(*) AS n_docs,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_pos
        |       FROM b GROUP BY 1),
        |c AS (SELECT decile, n_docs, n_pos,
        |        sum(n_pos) OVER (ORDER BY decile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
        |        sum(n_pos) OVER () AS tot_pos
        |      FROM a2)
        |SELECT CAST(decile AS BIGINT) AS decile, n_docs,
        |       CAST(n_pos AS BIGINT) AS n_pos,
        |       CAST(cum_pos AS BIGINT) AS cum_pos,
        |       round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS gain
        |FROM c ORDER BY decile""".stripMargin,

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

    "q_zipf_fit" ->
      """WITH tf AS (SELECT term, count(*) AS f FROM (
        |    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> length(x) > 0)) AS term
        |    FROM documents) t GROUP BY 1),
        |r AS (SELECT term, f,
        |    row_number() OVER (ORDER BY f DESC, term) AS rank FROM tf)
        |SELECT count(*) AS n_terms,
        |  round(regr_slope(ln(f), ln(rank)), 4) AS zipf_slope,
        |  round(regr_r2(ln(f), ln(rank)), 4) AS r2
        |FROM r WHERE rank <= 200""".stripMargin,

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

    "q_kanon" ->
      """SELECT event_type,
        |  ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS dow,
        |  CAST(round(value * 100) AS BIGINT) // 2000 AS band,
        |  count(*) AS n
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2, 3 HAVING count(*) < 5
        |ORDER BY 1, 2, 3""".stripMargin,

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

    "q_degree_dist" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |sym AS (SELECT src, dst FROM (
        |    SELECT src, dst FROM edges UNION SELECT dst, src FROM edges) u
        |  WHERE src <> dst)
        |SELECT degree, count(*) AS n_nodes FROM (
        |  SELECT src, count(*) AS degree FROM sym GROUP BY 1) d
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_assortativity" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |sym AS MATERIALIZED (SELECT src, dst FROM (
        |    SELECT src, dst FROM edges UNION SELECT dst, src FROM edges) u
        |  WHERE src <> dst),
        |deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY 1)
        |SELECT count(*) AS n_directed_edges,
        |       round(corr(a.d, b.d), 4) AS assortativity
        |FROM sym JOIN deg a ON a.id = sym.src
        |         JOIN deg b ON b.id = sym.dst""".stripMargin,

    "q_edge_jaccard" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |sym AS MATERIALIZED (SELECT src, dst FROM (
        |    SELECT src, dst FROM edges UNION SELECT dst, src FROM edges) u
        |  WHERE src <> dst),
        |und AS (SELECT src AS lo, dst AS hi FROM sym WHERE src < dst),
        |deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY 1),
        |cn AS (SELECT a.dst AS lo, b.dst AS hi, count(*) AS cn
        |       FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
        |       GROUP BY 1, 2)
        |SELECT u.lo, u.hi, coalesce(cn.cn, 0) AS cn,
        |  round(coalesce(cn.cn, 0) /
        |    greatest(da.d + db.d - 2 - coalesce(cn.cn, 0), 1), 6) AS jaccard
        |FROM und u
        |LEFT JOIN cn ON cn.lo = u.lo AND cn.hi = u.hi
        |JOIN deg da ON da.id = u.lo
        |JOIN deg db ON db.id = u.hi
        |ORDER BY 1, 2""".stripMargin,

    "q_concentration" ->
      """WITH bd AS (SELECT source, CAST(count(*) AS HUGEINT) AS m
        |            FROM documents GROUP BY 1),
        |bt AS (SELECT source, CAST(sum(CAST(len(list_filter(
        |         string_split_regex(text, '\s+'), x -> length(x) > 0))
        |         AS BIGINT)) AS HUGEINT) AS m
        |       FROM documents GROUP BY 1),
        |c AS (
        |  SELECT 'docs' AS basis,
        |    round(CAST(sum(m*m) AS DOUBLE) /
        |      (CAST(sum(m) AS DOUBLE) * CAST(sum(m) AS DOUBLE)), 6) AS hhi,
        |    round(CAST(sum(m) AS DOUBLE) * CAST(sum(m) AS DOUBLE) /
        |      CAST(sum(m*m) AS DOUBLE), 4) AS effective_sources,
        |    round(CAST(max(m) AS DOUBLE) / CAST(sum(m) AS DOUBLE), 6)
        |      AS top_share
        |  FROM bd
        |  UNION ALL
        |  SELECT 'tokens' AS basis,
        |    round(CAST(sum(m*m) AS DOUBLE) /
        |      (CAST(sum(m) AS DOUBLE) * CAST(sum(m) AS DOUBLE)), 6) AS hhi,
        |    round(CAST(sum(m) AS DOUBLE) * CAST(sum(m) AS DOUBLE) /
        |      CAST(sum(m*m) AS DOUBLE), 4) AS effective_sources,
        |    round(CAST(max(m) AS DOUBLE) / CAST(sum(m) AS DOUBLE), 6)
        |      AS top_share
        |  FROM bt)
        |SELECT * FROM c ORDER BY basis""".stripMargin,

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

    // q_pagerank's unrolled CTEs with the restart base CASE WHEN id=0
    "q_ppr" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |nodes AS MATERIALIZED (
        |  SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY 1),
        |p0 AS (SELECT id, CASE WHEN id = 0 THEN 1.0 ELSE 0.0 END AS pr
        |       FROM nodes),
        |c1 AS (SELECT e.dst AS id,
        |       list_reduce(list(p.pr / deg.d ORDER BY p.pr / deg.d),
        |                   (a, b) -> a + b) AS cin FROM edges e
        |       JOIN deg ON deg.src = e.src JOIN p0 p ON p.id = e.src
        |       GROUP BY e.dst),
        |p1 AS (SELECT nodes.id,
        |         CASE WHEN nodes.id = 0 THEN 1.0 - 0.85 ELSE 0.0 END
        |           + coalesce(cin, 0.0) * 0.85 AS pr
        |       FROM nodes LEFT JOIN c1 ON c1.id = nodes.id),
        |c2 AS (SELECT e.dst AS id,
        |       list_reduce(list(p.pr / deg.d ORDER BY p.pr / deg.d),
        |                   (a, b) -> a + b) AS cin FROM edges e
        |       JOIN deg ON deg.src = e.src JOIN p1 p ON p.id = e.src
        |       GROUP BY e.dst),
        |p2 AS (SELECT nodes.id,
        |         CASE WHEN nodes.id = 0 THEN 1.0 - 0.85 ELSE 0.0 END
        |           + coalesce(cin, 0.0) * 0.85 AS pr
        |       FROM nodes LEFT JOIN c2 ON c2.id = nodes.id),
        |c3 AS (SELECT e.dst AS id,
        |       list_reduce(list(p.pr / deg.d ORDER BY p.pr / deg.d),
        |                   (a, b) -> a + b) AS cin FROM edges e
        |       JOIN deg ON deg.src = e.src JOIN p2 p ON p.id = e.src
        |       GROUP BY e.dst),
        |p3 AS (SELECT nodes.id,
        |         CASE WHEN nodes.id = 0 THEN 1.0 - 0.85 ELSE 0.0 END
        |           + coalesce(cin, 0.0) * 0.85 AS pr
        |       FROM nodes LEFT JOIN c3 ON c3.id = nodes.id)
        |SELECT id, round(pr, 6) AS ppr FROM p3
        |WHERE round(pr, 6) > 0 ORDER BY id""".stripMargin,

    // same k-NN prelude; two unrolled integer HITS rounds (a then h)
    "q_hits" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT a.vid AS src, b.vid AS dst,
        |      row_number() OVER (PARTITION BY a.vid
        |        ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
        |                 b.vid) AS rk
        |    FROM emb a JOIN emb b ON a.vid <> b.vid) t
        |  WHERE rk <= 3),
        |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
        |                   WHERE src <> dst),
        |nodes AS (SELECT DISTINCT id FROM (
        |  SELECT src AS id FROM e UNION SELECT dst FROM e) u),
        |h0 AS (SELECT id, CAST(1 AS HUGEINT) AS h FROM nodes),
        |a1 AS (SELECT n.id, coalesce(sum(h0.h), 0) AS a FROM nodes n
        |       LEFT JOIN e ON e.dst = n.id LEFT JOIN h0 ON h0.id = e.src
        |       GROUP BY 1),
        |h1 AS (SELECT n.id, coalesce(sum(a1.a), 0) AS h FROM nodes n
        |       LEFT JOIN e ON e.src = n.id LEFT JOIN a1 ON a1.id = e.dst
        |       GROUP BY 1),
        |a2 AS (SELECT n.id, coalesce(sum(h1.h), 0) AS a FROM nodes n
        |       LEFT JOIN e ON e.dst = n.id LEFT JOIN h1 ON h1.id = e.src
        |       GROUP BY 1),
        |h2 AS (SELECT n.id, coalesce(sum(a2.a), 0) AS h FROM nodes n
        |       LEFT JOIN e ON e.src = n.id LEFT JOIN a2 ON a2.id = e.dst
        |       GROUP BY 1),
        |m AS (SELECT (SELECT max(a) FROM a2) AS ma,
        |             (SELECT max(h) FROM h2) AS mh)
        |SELECT n.id, CAST(a2.a AS BIGINT) AS auth_raw,
        |       CAST(h2.h AS BIGINT) AS hub_raw,
        |       round(CAST(a2.a AS DOUBLE) /
        |         greatest(CAST(m.ma AS DOUBLE), 1.0), 6) AS auth_norm,
        |       round(CAST(h2.h AS DOUBLE) /
        |         greatest(CAST(m.mh AS DOUBLE), 1.0), 6) AS hub_norm
        |FROM nodes n JOIN a2 ON a2.id = n.id JOIN h2 ON h2.id = n.id
        |CROSS JOIN m
        |ORDER BY n.id""".stripMargin,

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

    "q_cdf" ->
      """WITH dim AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) // 1000 AS bucket,
        |    count(*) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, bucket, n,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_n,
        |  round(sum(n) OVER (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) /
        |    sum(n) OVER (PARTITION BY event_type), 6) AS cdf
        |FROM dim ORDER BY 1, 2""".stripMargin,

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

    // identical exact-moment reduction and double expression tree
    "q_moments" ->
      """WITH b AS (SELECT event_type,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n, sum(c) AS s1,
        |        sum(c*c) AS s2, sum(c*c*c) AS s3, sum(c*c*c*c) AS s4
        |      FROM b GROUP BY 1),
        |d AS (SELECT event_type, n,
        |        CAST(s1 AS DOUBLE)/n AS d1, CAST(s2 AS DOUBLE)/n AS d2,
        |        CAST(s3 AS DOUBLE)/n AS d3, CAST(s4 AS DOUBLE)/n AS d4
        |      FROM s)
        |SELECT event_type, n,
        |  round(d1 / 100.0, 4) AS mean_val,
        |  round(d2 - d1*d1, 4) AS var_pop,
        |  round((d3 - 3.0*d1*d2 + 2.0*d1*d1*d1) /
        |    pow(d2 - d1*d1, 1.5), 6) AS skewness,
        |  round((d4 - 4.0*d1*d3 + 6.0*d1*d1*d2 - 3.0*d1*d1*d1*d1) /
        |    ((d2 - d1*d1) * (d2 - d1*d1)) - 3.0, 6) AS kurtosis_ex
        |FROM d ORDER BY 1""".stripMargin,

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
        |FROM t ORDER BY doc_id""".stripMargin
  )
}
