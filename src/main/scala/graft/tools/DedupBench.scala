package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** MinHash+LSH dedup throughput/recall harness: generates N synthetic
  * docs (80 tokens each) plus N/10 planted near-duplicates (one token
  * changed), runs signature → banding → pair → component → keeper
  * end-to-end and reports wall time and recall of the planted pairs.
  *
  *   sbt "runMain graft.tools.DedupBench [nDocs]"
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic pseudorandom corpus: token(id, i) = t<xxhash64(id, i) mod 50000>
    // (hash-mixed so distinct docs share shingles only by chance)
    def text(idCol: org.apache.spark.sql.Column, mutate: Boolean) = {
      val toks = transform(sequence(lit(0), lit(79)), i => {
        val t = concat(lit("t"), pmod(xxhash64(idCol, i), lit(50000)))
        if (mutate) when(i === pmod(idCol, lit(80)), lit("MUTANT")).otherwise(t) else t
      })
      array_join(toks, " ")
    }
    val base = spark.range(n).select(col("id").as("doc_id"), text(col("id"), mutate = false).as("text"))
    val dups = spark.range(n / 10).select((col("id") + n).as("doc_id"), text(col("id"), mutate = true).as("text"))
    val docs = base.unionByName(dups).localCheckpoint(true)

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.5).localCheckpoint(true)
    val nPairs = pairs.count()
    val t1 = System.nanoTime()
    val keepers = Dedup.keepers(docs, "doc_id", pairs)
    val nKept = keepers.where(col("keep")).count()
    val t2 = System.nanoTime()

    // recall: planted pair (id, id+n) for id < n/10
    val planted = pairs.where(col("id_b") === col("id_a") + n && col("id_a") < n / 10).count()
    println(s"""{"metric":"minhash_dedup","docs":${n + n / 10},"pairs":$nPairs,"planted_found":$planted,"planted_total":${n / 10},"recall":${planted.toDouble / (n / 10)},"kept":$nKept,"pairs_sec":${(t1 - t0) / 1e9},"cluster_sec":${(t2 - t1) / 1e9},"cpus":$cpus}""")

    val t3 = System.nanoTime()
    val shPairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
    val shPlanted = shPairs
      .where(col("id_b") === col("id_a") + n && col("id_a") < n / 10).count()
    val t4 = System.nanoTime()
    println(s"""{"metric":"simhash_dedup","docs":${n + n / 10},"planted_found":$shPlanted,"planted_total":${n / 10},"sec":${(t4 - t3) / 1e9},"cpus":$cpus}""")

    val t5 = System.nanoTime()
    val ngPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
    val ngPlanted = ngPairs
      .where(col("id_b") === col("id_a") + n && col("id_a") < n / 10).count()
    val t6 = System.nanoTime()
    println(s"""{"metric":"ngram_dedup","docs":${n + n / 10},"planted_found":$ngPlanted,"planted_total":${n / 10},"sec":${(t6 - t5) / 1e9},"cpus":$cpus}""")
    spark.stop()
  }
}
