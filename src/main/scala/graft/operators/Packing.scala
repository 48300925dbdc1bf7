package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the batch-assembly stage of a pretraining
  * pipeline: documents are laid out in a deterministic order,
  * concatenated, and cut into fixed token-budget sequences (documents
  * may straddle a cut — the usual GPT-style concat-and-chunk layout).
  * Each document's global token start offset decides its sequence:
  * seq_id = floor(start / budget).
  *
  * Scale shape: a global prefix sum is computed as a TWO-LEVEL scan,
  * never a single-partition window. Documents group into deterministic
  * id-range blocks; per-block token totals (a bounded, block-count-sized
  * table) get running offsets on the driver-scale side, broadcast back,
  * and each document's offset is its block offset + a within-block
  * window cumsum (partitioned by block — parallel, WindowExec never sees
  * the whole corpus in one partition). The same construction DuckDB
  * reproduces with a flat window, so the result is oracle-exact.
  */
object Packing {

  /** (id, toks, seq_id) for every document. `idCol` must be numeric
    * (block = floor(id / blockSize)); `tokensCol` is the document's
    * token count.
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, blockSize: Long = 4096L): DataFrame = {
    require(budget > 0 && blockSize > 0, s"budget $budget / blockSize $blockSize")
    val withBlock = docs.select(col(idCol).as("id"),
      col(tokensCol).cast("long").as("toks"),
      floor(col(idCol) / blockSize).cast("long").as("_blk"))
    // level 1: block totals → running block offsets. The window is
    // global but over the BLOCK table (corpus_size / blockSize rows —
    // the bounded dimension), not the corpus.
    val wBlk = Window.orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockOffsets = withBlock.groupBy(col("_blk"))
      .agg(sum(col("toks")).as("_bt"))
      .select(col("_blk"), coalesce(sum(col("_bt")).over(wBlk), lit(0L)).as("_boff"))
    // level 2: within-block cumsum, partitioned by block
    val wIn = Window.partitionBy(col("_blk")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withBlock.join(broadcast(blockOffsets), Seq("_blk"))
      .select(col("id"), col("toks"),
        (col("_boff") + coalesce(sum(col("toks")).over(wIn), lit(0L))).as("_start"))
      .select(col("id"), col("toks"),
        floor(col("_start") / budget.toDouble).cast("long").as("seq_id"))
  }

  /** Global 1-based rank of every row under a total order, computed as a
    * TWO-LEVEL scan (the [[packSequences]] construction generalized): no
    * single-partition window ever sees the corpus. `blockCol` must be
    * monotone non-decreasing along the total order (a coarse prefix of
    * the sort key — e.g. the first hex digit when ordering by an md5
    * key); `orderCols` break ties WITHIN a block to a total order.
    * Level 1 ranks the bounded block table (counts → running offsets),
    * level 2 is a per-block row_number — parallel across blocks.
    *
    * This is the scale-shaped `zipWithIndex`-by-key: epoch shuffles
    * (rank by a salted hash), exact distributed ntile ([[ntileFromRank]]),
    * and stable sample indexing all sit on it.
    */
  /** Overlapping token-window chunking — the RAG/indexing splitter:
    * chunk i of a document covers tokens [i·stride, i·stride + size).
    * Chunk count = max(1, ⌈(n − size)/stride⌉ + 1), i.e. windows advance
    * by `stride` until one covers the document's end — no trailing chunk
    * that is a strict suffix of the previous window (the LangChain-style
    * stop rule). A document with ≤ size tokens yields exactly one chunk.
    *
    * Scale shape: map-only — tokenization, the per-doc window count, and
    * the posexplode fan-out all ride the scan; no shuffle at all. The
    * token array materializes as a column once (HOF arguments re-evaluate
    * their subtree per lambda call — the [[graft.operators.Dedup
    * .shingles]] discipline).
    *
    * Returns (id, chunk_idx, chunk_text, n_tokens).
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize $chunkSize")
    require(stride >= 1 && stride <= chunkSize, s"stride $stride vs size $chunkSize")
    val base = docs.select(col(idCol).as("id"),
      graft.functions.TextAnalytics.tokens(col(textCol)).as("_toks"))
    val n = size(col("_toks"))
    val nChunks = greatest(lit(1),
      (ceil((n - lit(chunkSize)).cast("double") / lit(stride)) + 1).cast("int"))
    base
      .select(col("id"), col("_toks"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("_p", "chunk_idx")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("_toks"), col("chunk_idx") * stride + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        size(slice(col("_toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .cast("long").as("n_tokens"))
  }

  def globalOrderIndex(df: DataFrame, blockCol: Column,
                       orderCols: Seq[Column]): DataFrame = {
    val withBlk = df.withColumn("_blk", blockCol)
    val wBlk = Window.orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBlk.groupBy(col("_blk"))
      .agg(count(lit(1)).as("_bn"))
      .select(col("_blk"), coalesce(sum(col("_bn")).over(wBlk), lit(0L)).as("_boff"))
    val wIn = Window.partitionBy(col("_blk")).orderBy(orderCols: _*)
    // null-SAFE block join: a plain equi-join would silently drop rows
    // whose block key is null (null never equi-matches); null blocks
    // sort first (Spark's NULLS FIRST) and rank like any other block
    withBlk.join(broadcast(offsets.withColumnRenamed("_blk", "_blk2")),
        col("_blk") <=> col("_blk2"))
      .withColumn("rank", col("_boff") + row_number().over(wIn))
      .drop("_blk", "_blk2", "_boff")
  }

  /** SQL-standard NTILE(k) from a global rank and total row count: the
    * first `n % k` buckets hold `n/k + 1` rows, the rest `n/k` — pure
    * integer arithmetic, so it is engine-exact (matches DuckDB/Spark
    * ntile bit-for-bit given the same total order) with no window: bin
    * assignment is a map-only expression over [[globalOrderIndex]].
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    // Column./ is double division — floor+cast keeps this exact integer
    // arithmetic (ranks/counts are well inside 2^53)
    def idiv(a: Column, b: Column) = floor(a / b).cast("long")
    val bucket = idiv(n, lit(k))  // base bucket size
    val rem = n % k               // first `rem` buckets get one extra row
    val threshold = rem * (bucket + 1)
    when(rank <= threshold, idiv(rank - 1, bucket + 1) + 1)
      .otherwise(rem + idiv(rank - threshold - 1, bucket) + 1)
      .cast("int")
  }

  /** Deterministic weighted source mixture: keep a row iff the md5-hex
    * of its id is below the source's threshold — the data-mixture knob
    * (upsample curated sources, downsample crawl) with md5 parity across
    * engines ([[Sampling.md5Sample]]'s contract), no RNG state, and
    * map-only execution (the filter rides the scan).
    */
  def sourceMixture(docs: DataFrame, idCol: Column, sourceCol: Column,
                    hexThresholds: Map[String, String]): Column = {
    require(hexThresholds.nonEmpty &&
      hexThresholds.values.map(_.length).toSet.size == 1,
      "hexThresholds must be non-empty hex prefixes of one common length")
    val h = substring(md5(idCol.cast("string").cast("binary")), 1,
      hexThresholds.values.head.length)
    hexThresholds.foldLeft(lit(false)) { case (acc, (src, thr)) =>
      acc || (sourceCol === src && h < thr)
    }
  }

  /** Temperature-scaled source mixture weights — the multilingual /
    * multi-source sampling-rate recipe (mT5 / XLM-R): per source the
    * raw token share p_s, and the tempered sampling weight
    * w_s = p_s^alpha / Σ p^alpha. alpha < 1 flattens the mixture
    * (upsamples tail sources), alpha = 1 is proportional, alpha = 0
    * uniform. This is the allocation TABLE; [[sourceMixture]] is the
    * map-only per-row admission that realizes a chosen allocation.
    *
    * Scale shape: the corpus collapses to one bounded per-source
    * aggregate (map-side combine), then ONE one-row aggregate
    * broadcasts back — the t^alpha factor cancels in the
    * normalization (p_s^a / Σ p^a = n_s^a / Σ n^a), so the weight
    * needs only the raw token counts and a single normalizer.
    */
  def mixtureWeights(docs: DataFrame, sourceCol: Column, nTokensCol: Column,
                     alpha: Double, roundTo: Int = 6): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha")
    val per = docs.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokensCol).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).cast("double").as("_tot"),
      sum(pow(col("n_tokens").cast("double"), lit(alpha))).as("_z"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("_tot"), roundTo).as("token_share"),
        round(pow(col("n_tokens").cast("double"), lit(alpha)) / col("_z"),
          roundTo).as("weight"))
  }
}
