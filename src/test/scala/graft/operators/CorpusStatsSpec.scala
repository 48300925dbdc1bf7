package graft.operators

import graft.SparkSpec
import graft.functions.{DedupExpr, TextAnalytics}
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("dupInflation: cluster-size histogram and dropped-token mass, hand-computed") {
    // docs 1,2,3 form one cluster (pairs 1-2, 2-3); 4 is a singleton.
    // tokens: 1→3, 2→2, 3→1, 4→4. keeper of {1,2,3} is id 1 (3 tokens)
    // → dropped = (3+2+1) - 3 = 3. singleton drops 0.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a"), (4L, "w x y z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = CorpusStats.dupInflation(docs, "doc_id", "text", pairs)
      .orderBy(col("cluster_size"))
      .select("cluster_size", "n_clusters", "n_docs", "total_tokens",
        "dropped_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    got shouldBe Array((1L, 1L, 1L, 4L, 0L), (3L, 1L, 3L, 6L, 3L))
  }

  test("stopwords: df-ratio threshold on the rounded ratio") {
    // 'the' in 3/4 docs (0.75), 'cat' in 2/4 (0.5), rest rarer.
    // threshold 0.75 keeps only 'the'; repeated token in one doc counts
    // once (distinct-per-doc df).
    val docs = Seq(
      (1L, "the the cat"), (2L, "the dog"), (3L, "the cat"), (4L, "bird"))
      .toDF("doc_id", "text")
    val got = CorpusStats.stopwords(docs, "text", 0.75)
      .as[(String, Long, Double)].collect()
    got shouldBe Array(("the", 3L, 0.75))
  }

  test("oovRate: per-doc share of tokens outside the corpus top-k vocab") {
    // freq: a→3, b→2, c→1, d→1; vocab size 2 = {a, b}
    // (c/d tie at 1 broken by token asc but both miss the cut).
    // doc 1 "a b c" → 1/3 oov; doc 2 "a a d" → 1/3; doc 3 "b" → 0.
    val docs = Seq((1L, "a b c"), (2L, "a a d"), (3L, "b"))
      .toDF("doc_id", "text")
    val got = CorpusStats.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .orderBy(col("id"))
      .select("id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect()
    got shouldBe Array(
      (1L, 3L, 1L, 0.3333), (2L, 3L, 1L, 0.3333), (3L, 1L, 0L, 0.0))
  }

  test("oovRate vocab boundary tie breaks by token asc") {
    // freq: a→2, b→2, c→2; vocabSize=2 must keep {a, b} (c loses the
    // lexicographic tie), so every c token is OOV.
    val docs = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val got = CorpusStats.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .orderBy(col("id")).select("n_oov").as[Long].collect()
    got shouldBe Array(1L, 1L)
  }

  test("novelty: first occurrence by id order owns the shingle") {
    // doc 1 introduces both shingles; doc 2 repeats one of them and
    // introduces one; doc 3 is an exact dup of doc 1 → novelty 0.
    val sh = Seq(
      (1L, Seq(10L, 20L)),
      (2L, Seq(20L, 30L)),
      (3L, Seq(10L, 20L))).toDF("id", "sh")
    val got = CorpusStats.novelty(sh)
      .orderBy(col("id"))
      .select("id", "n_sh", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
    got shouldBe Array(
      (1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0))
  }

  test("sourceCap keeps the cap best-quality docs per source, id tie-break") {
    // source A has 3 docs, cap 2: the two highest quality survive;
    // source B keeps its single doc. Equal-quality ties break id asc.
    val good = "the cat and the dog of the house and the yard went off"
    val docs = Seq(
      (1L, good, "A"), (2L, good, "A"), (3L, "zz!!", "A"), (4L, good, "B"))
      .toDF("doc_id", "text", "source")
    val got = CorpusStats.sourceCap(docs, "doc_id", "text", "source",
        cap = 2, stopwords = Seq("the", "a", "of", "and"))
      .orderBy(col("source"), col("rk"))
      .select("id", "source", "rk").as[(Long, String, Long)].collect()
    got shouldBe Array((1L, "A", 1L), (2L, "A", 2L), (4L, "B", 1L))
  }

  test("dupInflation/novelty plans contain no nested-loop join") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("id"),
      DedupExpr.shingleHashes(TextAnalytics.tokens(col("text")), 3).as("sh"))
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    for (df <- Seq(CorpusStats.dupInflation(docs, "doc_id", "text", pairs),
                   CorpusStats.novelty(sh))) {
      val plan = df.queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
    }
  }

  test("paretoFront keeps exactly the non-dominated rows, equal twins included") {
    // points (score, cost): A(0.9, 10) frontier; B(0.9, 12) dominated
    // by A (same score, higher cost); C(0.8, 8) frontier; C2(0.8, 8)
    // equal twin — survives; D(0.8, 9) dominated by C; E(0.5, 5)
    // frontier; F(0.4, 20) dominated by everything cheaper+better.
    val df = Seq(
      (1L, 0.9, 10L), (2L, 0.9, 12L), (3L, 0.8, 8L), (4L, 0.8, 8L),
      (5L, 0.8, 9L), (6L, 0.5, 5L), (7L, 0.4, 20L))
      .toDF("id", "s", "c")
    val got = CorpusStats.paretoFront(df, col("id"), col("s"), col("c"))
      .orderBy(col("id"))
      .as[(Long, Double, Long)].collect()
    got shouldBe Array(
      (1L, 0.9, 10L), (3L, 0.8, 8L), (4L, 0.8, 8L), (6L, 0.5, 5L))
  }

  test("paretoFront matches the brute-force dominance definition on random points") {
    val rng = new scala.util.Random(7)
    val pts = Seq.tabulate(200)(i =>
      (i.toLong, (rng.nextInt(20) / 20.0), (rng.nextInt(30) + 1).toLong))
    val want = pts.filter { case (_, s, c) =>
      !pts.exists { case (_, s2, c2) =>
        (s2 > s && c2 <= c) || (s2 >= s && c2 < c)
      }
    }.map(_._1).sorted
    val got = CorpusStats.paretoFront(pts.toDF("id", "s", "c"),
        col("id"), col("s"), col("c"))
      .orderBy(col("id")).as[(Long, Double, Long)].collect()
    got.map(_._1).toSeq shouldBe want
  }

  test("cTfidf: hand-computed scores pick each class's signature term") {
    // class A tokens {x,x,z}, class B {y,z}: f(x)=2, f(y)=1, f(z)=2,
    // A = 5/2 = 2.5 → score(A,x) = 2·ln(1+2.5/2), score(B,y) = ln(3.5)
    val docs = Seq(("A", "x x z"), ("B", "y z")).toDF("source", "text")
    val got = CorpusStats.cTfidf(docs, col("source"), col("text"),
        topK = 1, minTf = 1)
      .select("class", "term", "tf", "score")
      .as[(String, String, Long, Double)].collect().sortBy(_._1)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got shouldBe Array(
      ("A", "x", 2L, r4(2.0 * math.log(1.0 + 2.5 / 2.0))),
      ("B", "y", 1L, r4(math.log(1.0 + 2.5 / 1.0))))
  }

  test("cTfidf: rank ties on rounded score break by term ascending") {
    // both terms appear once in one class only → identical scores
    val docs = Seq(("A", "beta alpha")).toDF("source", "text")
    val got = CorpusStats.cTfidf(docs, col("source"), col("text"),
        topK = 2, minTf = 1)
      .orderBy("rk").select("term").as[String].collect()
    got shouldBe Array("alpha", "beta")
  }
}
