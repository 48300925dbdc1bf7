package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BpeExpr, BpeKernels, TextAnalytics}

/** End-to-end byte-pair encoding over a corpus: learn the merge table,
  * then tokenize every document with it — the step AFTER
  * `q_bpe_pairs`'s merge-candidate counting, closing the
  * tokenizer-training loop (count pairs → train merges → apply).
  *
  * Scale shape: training runs on the driver over the corpus's word-
  * frequency table CAPPED to the top `vocabCap` words — bounded driver
  * state by construction, the same argument as the PQ codebook
  * training (BPE trainers universally operate on a bounded
  * word-frequency table, not the corpus); the cap keeps the collect a
  * few hundred KB. Encoding is distributed and map-only: one codegen'd
  * kernel pass per document with the merge ranks shipped as a
  * reference object (a plain broadcast of ~numMerges strings).
  */
object Bpe {

  /** (doc id, flat subword array) for every document, under merges
    * trained on the capped word-frequency table.
    */
  /** Largest word-frequency table the driver will hold for merge
    * training; beyond this the collect would risk driver memory, so the
    * knob fails loudly instead.
    */
  val MaxVocabCap: Int = 1 << 20

  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                   numMerges: Int, vocabCap: Int = 10000): DataFrame = {
    require(vocabCap > 0, s"vocabCap $vocabCap")
    require(vocabCap <= MaxVocabCap,
      s"encodeCorpus: vocabCap=$vocabCap exceeds MaxVocabCap=$MaxVocabCap " +
        "(the word-frequency table is collected to the driver for merge " +
        "training); lower the vocabCap knob")
    // tokenize + word count (training) and the merge-encode kernel
    // (scoring) are the CPU; a one-split corpus runs each in a single
    // task — spread once, shared by both consumers via AQE exchange
    // reuse (guide §2.6; identity at real scale, see Par)
    val spread = Par.spreadSmallScan(docs, col(idCol))
    val wordFreq = spread
      .select(explode(TextAnalytics.tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_f"))
      .orderBy(col("_f").desc, col("_w"))
      .limit(vocabCap) // bounded: driver state is ≤ vocabCap (word, long)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = BpeKernels.trainMerges(wordFreq, numMerges)
    spread.select(col(idCol).as("id"),
      BpeExpr.bpeEncode(TextAnalytics.tokens(col(textCol)), merges).as("subwords"))
  }
}
