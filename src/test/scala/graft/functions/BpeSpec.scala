package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. reference vocabulary
  private val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainMerges reproduces the classic merge order with lexicographic ties") {
    val merges = BpeKernels.trainMerges(vocab, 4)
    // ("e","s") and ("s","t") both score 9 (newest 6 + widest 3):
    // the lexicographic tie-break picks ("e","s") first, then ("es","t")
    // scores 9 alone, then ("est","</w>") 9, then ("l","o") 7
    merges shouldBe Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"))
  }

  test("encodeWord applies merges greedily by rank") {
    val merges = BpeKernels.trainMerges(vocab, 6) // + ("lo","w"), ("e","w")
    val ranks = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      ranks.put(a + " " + b, Integer.valueOf(i))
    }
    // "lowest" was never a training word but decomposes into learned units
    BpeKernels.encodeWord("lowest", ranks) shouldBe Seq("low", "est</w>")
    // unseen characters stay as singletons (+ end marker)
    BpeKernels.encodeWord("xyz", ranks) shouldBe Seq("x", "y", "z", "</w>")
  }

  test("trainMerges stops early when no pairs remain") {
    BpeKernels.trainMerges(Map("ab" -> 1L), 100).length should be <= 2
  }

  test("the kernel Expression equals the plain-Scala reference over a DataFrame") {
    val merges = BpeKernels.trainMerges(vocab, 6)
    val ranks = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      ranks.put(a + " " + b, Integer.valueOf(i))
    }
    val docs = Seq((1L, "low lower newest"), (2L, "widest low"), (3L, ""))
      .toDF("id", "text")
    val got = docs.select(col("id"),
        BpeExpr.bpeEncode(TextAnalytics.tokens(col("text")), merges).as("sw"))
      .as[(Long, Seq[String])].collect().toMap
    val expect = Map(
      1L -> Seq("low", "lower", "newest").flatMap(w => BpeKernels.encodeWord(w, ranks)),
      2L -> Seq("widest", "low").flatMap(w => BpeKernels.encodeWord(w, ranks)),
      3L -> Seq.empty[String])
    got shouldBe expect
  }

  test("null text propagates; training is deterministic across runs") {
    val a = BpeKernels.trainMerges(vocab, 8)
    val b = BpeKernels.trainMerges(vocab, 8)
    a shouldBe b
    val docs = Seq((1L, Option.empty[String])).toDF("id", "text")
    docs.select(BpeExpr.bpeEncode(TextAnalytics.tokens(col("text")), a).as("sw"))
      .collect()(0).isNullAt(0) shouldBe true
  }
}
