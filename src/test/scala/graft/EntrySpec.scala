package graft

/** The driver's smoke contract: entry() on sf0.001 must return rows. */
class EntrySpec extends SparkSpec {

  /** Deterministic content hash of a (small) result: every cell
    * canonicalized to a string, rows sorted, md5 over the whole dump —
    * the same discipline the driver's DuckDB compare applies to oracled
    * queries, applied here to the rows-only ones so a
    * wrong-but-same-cardinality regression cannot slip through.
    */
  private def contentHash(df: org.apache.spark.sql.DataFrame): String = {
    def cell(v: Any): String = v match {
      case null => "␀"
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case s: Seq[_] => s.map(cell).mkString("[", ",", "]")
      case m: Map[_, _] =>
        m.toSeq.map { case (k, x) => cell(k) + "->" + cell(x) }
          .sorted.mkString("{", ",", "}")
      case r: org.apache.spark.sql.Row => r.toSeq.map(cell).mkString("(", ",", ")")
      case x => x.toString
    }
    val lines = df.collect().map(_.toSeq.map(cell).mkString("|")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(lines.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }
  test("entry flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
    df.columns should contain allOf("type_class", "l_returnflag", "revenue", "n_items")
  }

  test("every declared query has either an oracle or a documented rows-only status") {
    val qs = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    oracled.diff(qs) shouldBe empty // no orphan oracles
    val rowsOnly = qs.diff(oracled)
    // the full rows-only list — additions here must be justified in SURVEY §8
    rowsOnly shouldBe Set("q_minhash_pairs", "q_simhash_pairs", "q_lsh_topk",
      "q_ivf_topk", "q_pq_topk", "q_ivfpq_topk", "q_ivfpq_rerank",
      "q_fingerprint", "q_approx_distinct",
      "q_embedding_neardup_lsh", "q_source_similarity", "q_kmeans_sizes",
      "q_approx_quantile", "q_knn_graph_lsh", "q_bpe_encode",
      "q_semantic_dedup", "q_mmr_rerank", "q_quality_classifier",
      "q_image_dhash", "q_image_neardup", "q_pca_variance", "q_pca_project",
      "q_bradley_terry", "q_sq8_topk", "q_bq_topk")
  }

  test("rows-only queries return their pinned sf0.001 row counts") {
    // the driver's check for un-oracled queries is rows > 0 only; this
    // pins the exact counts (all are deterministic — hash-derived or
    // fixed-k — so a drifting count means changed semantics, not noise)
    val expected = Map(
      "q_minhash_pairs" -> 28L,
      "q_simhash_pairs" -> 27L,
      "q_lsh_topk" -> 11L,
      "q_ivf_topk" -> 25L,
      "q_pq_topk" -> 25L,
      "q_ivfpq_topk" -> 25L,
      "q_ivfpq_rerank" -> 25L,
      "q_fingerprint" -> 500L,
      "q_approx_distinct" -> 3L,
      "q_embedding_neardup_lsh" -> 66L,
      "q_source_similarity" -> 190L,
      "q_kmeans_sizes" -> 8L,
      "q_approx_quantile" -> 3L,
      "q_knn_graph_lsh" -> 1500L,
      "q_bpe_encode" -> 500L,
      "q_semantic_dedup" -> 500L,
      "q_mmr_rerank" -> 50L,
      "q_quality_classifier" -> 500L,
      "q_image_dhash" -> 500L,
      "q_image_neardup" -> 50L,
      "q_pca_variance" -> 8L,
      "q_pca_project" -> 500L,
      "q_bradley_terry" -> 5L,
      "q_sq8_topk" -> 25L,
      "q_bq_topk" -> 25L)
    val dir = "/root/testdata/sf0.001"
    val got = expected.keys.toSeq.sorted
      .map(q => q -> SparkEntry.queries(q)(spark, dir).count()).toMap
    got shouldBe expected
  }

  test("rows-only queries return their pinned sf0.01 row counts AND content hashes") {
    // a second scale factor makes the pins SCALE-SENSITIVE: an operator
    // whose semantics drift only when the data grows (a cap silently
    // truncating, a sketch width saturating, a sample bound biting)
    // passes a single-SF pin and fails here. Recompute with
    // `graft.tools.HashCalc /root/testdata/sf0.01 <queries>`.
    val expected = Map(
      "q_minhash_pairs" -> (25L, "ea735cf0452abbfbe97e8a092ff88ab7"),
      "q_simhash_pairs" -> (17L, "96810f568606f678ea66991cdc5fa924"),
      "q_lsh_topk" -> (12L, "029051c46009699ccf8d0752b918f460"),
      "q_ivf_topk" -> (25L, "274e6ab8fe6007517885938236f92a7a"),
      "q_pq_topk" -> (25L, "5871dc21f2d09eb4a2ad2ad4af72373b"),
      "q_ivfpq_topk" -> (25L, "a4dc1a299f9857b7d106a7f6d287ae2f"),
      "q_ivfpq_rerank" -> (25L, "dd4e94a5c51289ceb4f3320855f06573"),
      "q_fingerprint" -> (500L, "596f04f342b101a42457a4ffc206a99e"),
      "q_approx_distinct" -> (3L, "e8b4336fa102de6b4a18f3f2f96fa2f9"),
      "q_embedding_neardup_lsh" -> (59L, "7d25878262f3dca05bef8a6f0079fe7f"),
      "q_source_similarity" -> (190L, "63107b752ae18b95bcf83ee7c6096f21"),
      "q_kmeans_sizes" -> (8L, "2ac7f212341c483e07b3e9ae6b9e5ffc"),
      "q_approx_quantile" -> (3L, "50963b35ee982b5272f55cd493f185e1"),
      "q_knn_graph_lsh" -> (1500L, "3a17865950ed49ac2f3da0075ee87bf8"),
      "q_bpe_encode" -> (500L, "ead3c2b2d6f0749f0bae736279175319"),
      "q_semantic_dedup" -> (500L, "81bd77c8729e71631b8df0c66f2d1deb"),
      "q_mmr_rerank" -> (50L, "82bd06d1b8576aff0815bf1cb3015639"),
      "q_quality_classifier" -> (500L, "66998e25d787d0a792de3f5a4f8e7f02"),
      "q_image_dhash" -> (500L, "dd01792d261fdb29559ae3f1c592084b"),
      "q_image_neardup" -> (50L, "0922d00369a357d524819734727c29ec"),
      "q_pca_variance" -> (8L, "fc74b2cefb8d741c934d50a5668ae6da"),
      "q_pca_project" -> (500L, "04870ac074cd97fc0487ab9dd1cbbb6a"),
      "q_bradley_terry" -> (5L, "e150e60a4568d4c7760ed69f121554a9"),
      "q_sq8_topk" -> (25L, "76efe2b9e90ffc5f5c58b2d102898063"),
      // re-pinned r11: Bq.topK shortlists r+1 so the in-corpus
      // self-match no longer consumes a candidate slot — the extra
      // candidate entered one query's exact-rerank top-5 here (recall
      // vs brute force can only improve; asserted in BqSpec)
      "q_bq_topk" -> (25L, "b19d115710dc4752ce9449e5aef1e162"))
    val dir = "/root/testdata/sf0.01"
    val got = expected.keys.toSeq.sorted.map { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      q -> ((df.count(), contentHash(df)))
    }.toMap
    got shouldBe expected
  }

  test("geometry rows-only queries match their sf1 pins when a tiled dir is given") {
    // The six no-oracle queries whose candidate geometry only ENGAGES
    // above nRef, pinned at the BENCHSCALE big side (PINS_sf1_geometry_
    // r11.json — two fresh-JVM HashCalc runs bit-identical). The tiled
    // dir is not committed (170 MB), so this asserts only when
    // SPARK_GRAFT_SF1_DIR points at a ScaleData-tiled sf1 layout:
    //   sbt "runMain graft.tools.ScaleData /root/testdata/sf0.1 /tmp/sf1 10"
    val dirOpt = sys.env.get("SPARK_GRAFT_SF1_DIR")
    assume(dirOpt.isDefined,
      "SPARK_GRAFT_SF1_DIR unset - sf1 pins recorded in PINS_sf1_geometry_r11.json")
    val expected = Map(
      "q_lsh_topk" -> (25L, "a60bf410700def80ead2606140c025e2"),
      "q_minhash_pairs" -> (2560L, "ac11bf7db5a779522fdf32d981881293"),
      "q_simhash_pairs" -> (7952L, "b9354c3f9bf853e95a8b798c1fea5cb2"),
      "q_image_neardup" -> (5130L, "475e3269d7f669d3455935de9006cd0e"),
      "q_knn_graph_lsh" -> (60000L, "2d457027de9d26284d82ba712612ec7a"),
      "q_embedding_neardup_lsh" -> (49980L, "9a7409a4bdb6c7e13adbb508ac64800b"),
      // the ANN compression ladder, pinned with the same discipline:
      // trained models (IVF centroids, PQ codebooks, SQ8 bounds) and
      // candidate geometry shift with corpus size too
      "q_ivf_topk" -> (25L, "6858538d54b20b47a35ea4ede6bd95d8"),
      "q_pq_topk" -> (25L, "bb1db60d144c09d360ec468ef2620451"),
      "q_ivfpq_topk" -> (25L, "80a87a8ec18f3105725df0b9dbbec854"),
      "q_ivfpq_rerank" -> (25L, "67a0db1e2744ebaca51fa08b31d335dc"),
      "q_sq8_topk" -> (25L, "1522a173716caa8458b1d3e41505d0fb"),
      "q_bq_topk" -> (25L, "5b38e62f0d3d33ec3fc14753e4ac4af2"))
    val got = expected.keys.toSeq.sorted.map { q =>
      val df = SparkEntry.queries(q)(spark, dirOpt.get)
      q -> ((df.count(), contentHash(df)))
    }.toMap
    got shouldBe expected
  }

  test("remaining rows-only queries match their sf1 pins when a tiled dir is given") {
    // The other no-oracle queries (PINS_sf1_r12.json) — with the
    // geometry/ANN test above and the q_approx_quantile GK test below
    // this pins ALL 25 rows-only queries at the BENCHSCALE big side.
    // Two fresh-JVM HashCalc runs bit-identical,
    // including every driver-trained model (k-means, PCA, logistic
    // classifier, Bradley-Terry: fixed seed + fixed order by
    // construction). Same tiled-dir recipe as above.
    val dirOpt = sys.env.get("SPARK_GRAFT_SF1_DIR")
    assume(dirOpt.isDefined,
      "SPARK_GRAFT_SF1_DIR unset - sf1 pins recorded in PINS_sf1_r12.json")
    val expected = Map(
      "q_fingerprint" -> (50000L, "4ef12a40445bf43d8e6da015a181ff4d"),
      "q_approx_distinct" -> (3L, "79536c4e693fd27900b6271582fb2062"),
      "q_source_similarity" -> (190L, "a08e820b303f43382523a13f1a0373eb"),
      "q_kmeans_sizes" -> (8L, "f8bf7809c9ef901a1cc011cb22627497"),
      // q_approx_quantile is NOT in this map: its hash is layout-pinned
      // (the sketch-merge tree differs across session layouts at this
      // scale), so its PRIMARY sf1 pin is the layout-insensitive GK
      // rank-error test below; the hash survives only as a determinism
      // witness there. Every hash in THIS map is layout-insensitive
      // (verified at local[8]/8 and local[4]/4).
      "q_bpe_encode" -> (50000L, "fcde20636d90885658b4d24979a5c524"),
      "q_semantic_dedup" -> (20000L, "3bb93ada3880771fb29383fac55a342c"),
      "q_mmr_rerank" -> (50L, "304235562543278a9e7414cfa1404f8c"),
      "q_quality_classifier" -> (50000L, "470b0f5b88cf7463b8a428b30808be68"),
      "q_image_dhash" -> (50000L, "f7526a8c207987cd90c33ece0b5c7b06"),
      "q_pca_variance" -> (8L, "f4bda0de050439cb4ca32109d00f846d"),
      "q_pca_project" -> (20000L, "5f32cd74e74220c836fa0b8a67072ec2"),
      "q_bradley_terry" -> (5L, "fd6cb27beee2e9726676d5e59625b17d"))
    val got = expected.keys.toSeq.sorted.map { q =>
      val df = SparkEntry.queries(q)(spark, dirOpt.get)
      q -> ((df.count(), contentHash(df)))
    }.toMap
    got shouldBe expected
  }

  test("q_approx_quantile sf1: every approx percentile is within the GK rank-error bound of exact") {
    // q_approx_quantile's PRIMARY sf1 pin (layout-INSENSITIVE):
    // percentile_approx(accuracy = 10000) guarantees rank error
    // <= n/accuracy regardless of how the sketch merge tree is shaped
    // (Greenwald-Khanna eps = 1/accuracy), so this assertion binds under
    // ANY session layout — local[4]/4, local[32]/32, or a real cluster.
    // The PINS_sf1_r12.json hash is demoted to a determinism WITNESS:
    // it is checked only under the exact layout it was recorded at
    // (local[4], 4 shuffle partitions) and certifies nothing about
    // correctness, only that the sketch pipeline is run-to-run stable.
    import org.apache.spark.sql.functions._
    val dirOpt = sys.env.get("SPARK_GRAFT_SF1_DIR")
    assume(dirOpt.isDefined,
      "SPARK_GRAFT_SF1_DIR unset - sf1 pins recorded in PINS_sf1_r12.json")
    val li = graft.sources.Tables.lineitem(spark, dirOpt.get)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val df = SparkEntry.queries("q_approx_quantile")(spark, dirOpt.get)
    df.count() shouldBe 3L
    if (spark.sparkContext.master == "local[4]" &&
        spark.conf.get("spark.sql.shuffle.partitions") == "4") {
      contentHash(df) shouldBe "1ee6f0ca2821b82df9dee384edd231a7"
    }
    val approx = df
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val n = li.groupBy(col("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.keySet shouldBe n.keySet
    for ((g, qs) <- approx; (q, p) <- qs.zip(Seq(0.25, 0.5, 0.75))) {
      // GK contract: some element with rank in [⌈(p − eps)n⌉, ⌈(p + eps)n⌉].
      // A duplicated value (the x10 tiling repeats every row) occupies the
      // whole rank interval [count(v < q) + 1, count(v <= q)], so accept
      // when that interval INTERSECTS the bound — testing only the
      // maximal rank can reject a value whose lower ranks are in bounds.
      val maxRank = li.where(col("g") === g && col("v") <= q).count()
      val minRank = li.where(col("g") === g && col("v") < q).count() + 1
      val eps = 1.0 / 10000
      val lo = math.floor((p - eps) * n(g)).toLong
      val hi = math.ceil((p + eps) * n(g)).toLong + 1
      assert(minRank <= hi && maxRank >= lo,
        s"group $g p=$p: rank interval [$minRank, $maxRank] of approx " +
          s"value $q disjoint from [$lo, $hi] (n=${n(g)}, eps=$eps)")
    }
  }

  test("rows-only queries match their pinned sf0.001 content hashes") {
    // counts alone would pass a wrong-but-same-cardinality result; the
    // hash pins the VALUES (all entries are deterministic by construction —
    // hash-derived planes/signatures, fixed seeds, fixed k, fixed-order
    // driver training; recompute with graft.tools.HashCalc)
    // q_ivf_topk == q_ivfpq_rerank is expected: at sf0.001 both recover
    // the exact cosine top-5 (full recall), so the dumps coincide
    val expected = Map(
      "q_minhash_pairs" -> "ba557a66966fcacbef2b004f38ee02cd",
      "q_simhash_pairs" -> "21eb2855fda2570c8a05242ed8c9c837",
      "q_lsh_topk" -> "246efe577094b3cd3b6ca60f0213b01c",
      "q_ivf_topk" -> "31aaf0df5047b945df58269beb7637bc",
      "q_pq_topk" -> "a4f7a89e76248698c03233ec9cf03b3b",
      "q_ivfpq_topk" -> "a9cc9bc4d6a485ce094896b7d9d73646",
      "q_ivfpq_rerank" -> "31aaf0df5047b945df58269beb7637bc",
      "q_fingerprint" -> "ddc509228e64b3d9245a9c8625e9e04e",
      "q_approx_distinct" -> "5202d57e916f7ca51003f58d270434c6",
      "q_embedding_neardup_lsh" -> "af730694dcca0ce045558480d2cf235c",
      "q_source_similarity" -> "b1489a59f6813ece2580f6982239a445",
      "q_kmeans_sizes" -> "317807c5ee1f21b677cf8b8f32f55a05",
      "q_approx_quantile" -> "f2c989c7679b989ad6ffcf5cab20e710",
      "q_knn_graph_lsh" -> "dcf37446c8b2b588b333854717ebd8c4",
      "q_bpe_encode" -> "efff38eebad84cd301624f802fa2eb74",
      "q_semantic_dedup" -> "26afce62140d6cba51bf8c0d5d42ac2f",
      "q_mmr_rerank" -> "0b1e85345f4cfd991efec0707e04bb38",
      "q_quality_classifier" -> "4c91feed1c7855d078044a15a8693d4c",
      "q_image_dhash" -> "dd01792d261fdb29559ae3f1c592084b",
      "q_image_neardup" -> "0922d00369a357d524819734727c29ec",
      "q_pca_variance" -> "3d3e9ed8eebf0bf9768b37351a167e92",
      "q_pca_project" -> "19d1e1d72dad87807c92e5ec1bed9cd4",
      "q_bradley_terry" -> "2a7f40caf4f54a7102c185410487515e",
      "q_sq8_topk" -> "0e7ca3c45e326bacf05eb3d4bbea610d",
      "q_bq_topk" -> "13b2b947fd2bd6cabaa4854fe5f4f384")
    val dir = "/root/testdata/sf0.001"
    val got = expected.keys.toSeq.sorted
      .map(q => q -> contentHash(SparkEntry.queries(q)(spark, dir))).toMap
    got shouldBe expected
  }
}
