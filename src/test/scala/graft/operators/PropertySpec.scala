package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized-but-seeded equivalence tests: operators vs naive
  * reference implementations on generated data.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("asOfBackward == naive per-row scan on random data (seeded)") {
    val keys = Gen.oneOf("a", "b", "c")
    val leftGen = Gen.listOfN(120, Gen.zip(keys, Gen.chooseNum(0L, 50L)))
    val rightGen = Gen.listOfN(60, Gen.zip(keys, Gen.chooseNum(0L, 50L)))
    for (seed <- Seq(1L, 2L, 3L)) {
      val left = sample(leftGen, seed).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      // distinct (key, ts) on the right avoids tie-order ambiguity
      val right = sample(rightGen, seed + 100).distinct
        .map { case (k, t) => (k, t, t * 10.0) }

      val got = AsOfJoin.asOfBackward(
          left.toDF("lid", "k", "t"), right.toDF("k", "t", "payload"),
          Seq("k"), "t", "t", Map("payload" -> "p"))
        .select("lid", "p").as[(Long, Option[Double])].collect().toMap

      left.foreach { case (lid, k, lt) =>
        val expected = right.filter(r => r._1 == k && r._2 < lt)
          .sortBy(_._2).lastOption.map(_._3)
        withClue(s"seed=$seed lid=$lid k=$k t=$lt") { got(lid) shouldBe expected }
      }
    }
  }

  test("minhash estJaccard approximates exact shingle jaccard (seeded corpora)") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val doc = Gen.listOfN(30, word).map(_.mkString(" "))
    val docs = (1 to 20).map(i => (i.toLong, sample(doc, i.toLong * 7))).toDF("doc_id", "text")

    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val est = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 128, bands = 128, threshold = 0.0) // 1-row bands ⇒ all pairs collide somewhere
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap

    // every estimated pair within 0.2 of the exact jaccard (128 hashes ⇒ σ≈0.044)
    est.foreach { case (pair, e) =>
      val x = exact.getOrElse(pair, 0.0)
      withClue(s"pair=$pair exact=$x est=$e") { math.abs(e - x) should be < 0.2 }
    }
  }

  test("approx_count_distinct within declared error of exact (2% rsd)") {
    val df = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val (exact, approx) = df
      .agg(countDistinct(col("l_partkey")).as("e"),
        approx_count_distinct(col("l_partkey"), 0.02).as("a"))
      .as[(Long, Long)].head()
    math.abs(approx - exact).toDouble / exact should be < 0.06 // 3σ
  }

  test("repetitionStats kernel == plain-Scala reference on random seeded docs") {
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff", "g")
    val ws = Gen.oneOf(" ", "  ", "\t", "\n")
    val doc = Gen.listOfN(40, Gen.zip(word, ws)).map(_.map(p => p._1 + p._2).mkString)
    val texts = (1 to 30).map(i => (i.toLong, sample(doc, i.toLong * 13)))
    val got = texts.toDF("id", "text")
      .select(col("id"), Curation.repetitionStats(col("text")).as("st"))
      .select(col("id"), col("st.n_tokens"), col("st.dup_token_frac"),
        col("st.top_token_frac"), col("st.dup_bigram_frac"))
      .as[(Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    texts.foreach { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      val bgs = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val (gn, gdup, gtop, gbg) = (got(id)._2, got(id)._3, got(id)._4, got(id)._5)
      withClue(s"id=$id text='$t'") {
        gn shouldBe n.toLong
        gdup shouldBe (if (n == 0) 0.0 else 1.0 - toks.distinct.length.toDouble / n) +- 1e-12
        gtop shouldBe (if (n == 0) 0.0
          else toks.groupBy(identity).values.map(_.length).max.toDouble / n) +- 1e-12
        gbg shouldBe (if (bgs.isEmpty) 0.0
          else 1.0 - bgs.distinct.length.toDouble / bgs.length) +- 1e-12
      }
    }
  }

  test("bestLang kernel == composed fold on random seeded docs (incl. markers)") {
    val word = Gen.oneOf("the", "und", "cat", "der", "and", "ist", "xyz", "of", "die")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val texts = (1 to 40).map(i => (i.toLong, sample(doc, i.toLong * 31)))
    val profiles = graft.SparkEntry.langProfiles
    val rows = texts.toDF("id", "text")
      .select(col("id"),
        graft.functions.TextAnalytics.langId(col("text"), profiles).as("k"),
        graft.functions.TextAnalytics.langIdComposed(col("text"), profiles).as("c"))
      .as[(Long, String, String)].collect()
    rows.foreach { r => withClue(s"id=${r._1}") { r._2 shouldBe r._3 } }
  }

  test("prefixFilterPairs == ngramJaccardPairs on random seeded corpora (completeness)") {
    // small vocab forces shared shingles; duplicated docs force matches
    val docGen = Gen.listOfN(12, Gen.chooseNum(0, 5)).map(_.map(i => s"w$i").mkString(" "))
    for (seed <- Seq(11L, 22L, 33L); t <- Seq(0.5, 0.8)) {
      val base = (0 until 14).map(i => sample(docGen, seed * 100 + i))
      // plant dup and near-dup pairs
      val docs = (base ++ Seq(base.head, base(1) + " extra"))
        .zipWithIndex.map { case (txt, i) => (i.toLong, txt) }
        .toDF("doc_id", "text")
      val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val fast = Dedup.prefixFilterPairs(docs, "doc_id", "text", k = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      withClue(s"seed=$seed t=$t") { fast shouldBe brute }
    }
  }

  test("incrementalNgramPairs == full self-join restricted to new-touching, random corpora") {
    import graft.functions.{DedupExpr, TextAnalytics}
    val docGen = Gen.listOfN(12, Gen.chooseNum(0, 5)).map(_.map(i => s"w$i").mkString(" "))
    for (seed <- Seq(7L, 19L, 31L); t <- Seq(0.4, 0.7)) {
      val base = (0 until 14).map(i => sample(docGen, seed * 100 + i))
      // dup + near-dup plants so both old-old and new-touching pairs occur
      val docs = (base ++ Seq(base.head, base(1) + " extra"))
        .zipWithIndex.map { case (txt, i) => (i.toLong, txt) }
        .toDF("doc_id", "text")
      val shingled = docs.select(col("doc_id").as("id"),
        DedupExpr.shingleHashes(TextAnalytics.tokens(col("text")), 2).as("sh"))
      val full = Dedup.ngramJaccardPairsPre(shingled, t)
        .as[(Long, Long, Double)].collect().toSet
      val inc = Dedup.incrementalNgramPairs(shingled, col("id") % 3 === 0, t)
        .as[(Long, Long, Double)].collect().toSet
      withClue(s"seed=$seed t=$t") {
        inc shouldBe full.filter(p => p._1 % 3 == 0 || p._2 % 3 == 0)
      }
    }
  }

  test("jaroWinkler bounds and identities on random seeded string pairs") {
    val strGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    val pairs = (1 to 60).map(i =>
      (sample(strGen, i.toLong), sample(strGen, i * 7L + 3)))
    val rows = pairs.toDF("a", "b").select(
        graft.functions.TextExpr.jaroWinkler(col("a"), col("b")).as("ab"),
        graft.functions.TextExpr.jaroWinkler(col("b"), col("a")).as("ba"),
        graft.functions.TextExpr.jaroWinkler(col("a"), col("a")).as("aa"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (ab, ba, aa) =>
      ab should (be >= 0.0 and be <= 1.0)
      ab shouldBe ba +- 1e-15 // symmetric
      aa shouldBe 1.0         // reflexive
    }
  }

  test("stats invariants on random seeded groups: gini/entropy/mad bounds") {
    val keyGen = Gen.listOfN(400, Gen.chooseNum(0, 30))
    for (seed <- Seq(5L, 6L)) {
      val ks = sample(keyGen, seed).map(k => s"k$k")
      val df = ks.toDF("k")
      val (g, nk, tot) = Stats.giniOfCounts(df, col("k"))
        .as[(Double, Long, Long)].collect()(0)
      g should (be >= 0.0 and be < 1.0)
      tot shouldBe 400L
      val ent = Stats.entropy(df.withColumn("g", lit("all")), "g", col("k"))
        .select("n_distinct", "entropy").as[(Long, Double)].collect()(0)
      ent._2 should (be >= 0.0 and be <= math.log(ent._1.toDouble) + 1e-9)
      ent._1 shouldBe nk
      val vals = sample(keyGen, seed + 50).map(_.toDouble)
      val mad = Stats.mad(vals.map(("g", _)).toDF("g", "v"), "g", col("v"))
        .select("mad").as[Double].collect()(0)
      mad should be >= 0.0
    }
  }

  test("boilerplatePassages == plain-Scala reference on random seeded corpora") {
    // tiny alphabet + short passages force cross-document passage
    // collisions, so the df threshold actually fires
    val docGen = Gen.listOfN(9, Gen.chooseNum(0, 3)).map(_.map(i => s"w$i").mkString(" "))
    val corpusGen = Gen.listOfN(25, docGen)
    val pw = 3
    for (seed <- Seq(11L, 12L, 13L)) {
      val corpus = sample(corpusGen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      // independent reference: split → fixed-size passages → df over
      // distinct (passage, doc) → filter + reassemble, in plain Scala
      val split = corpus.map { case (id, t) =>
        id -> t.split(" ").grouped(pw).map(_.mkString(" ")).toVector }
      val dfm = split.flatMap { case (id, ps) => ps.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).distinct.size }
      val expected = split.map { case (id, ps) =>
        val kept = ps.filter(p => dfm(p) < 2)
        (id, ps.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.sortBy(_._1)
      val got = Curation.boilerplatePassages(
          corpus.toDF("doc_id", "text"), "doc_id", "text",
          passageWords = pw, minDocs = 2)
        .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
      got shouldBe expected
    }
  }
}
