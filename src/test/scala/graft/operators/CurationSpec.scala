package graft.operators

import graft.SparkSpec
import graft.functions.{CurationExpr, TextAnalytics}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("tokenBudgetSelect: quality-greedy per source, cut at the budget boundary") {
    // src X: doc 1 high quality (clean text), doc 2 punct-heavy (low),
    // doc 3 mid — each 4 tokens. budget 8 -> the two best fit, the
    // third's cumsum (12) exceeds. src Y independent: its single doc fits.
    val docs = Seq(
      (1L, "the cat sat down", "X"),
      (2L, "!!! ??? ;;; :::", "X"),
      (3L, "a dog ran fast", "X"),
      (4L, "of mice and men", "Y")).toDF("doc_id", "text", "source")
    val got = Curation.tokenBudgetSelect(docs, "doc_id", "text", "source",
        budget = 8L, stopwords = Seq("the", "a", "of", "and"))
      .select("doc_id", "source", "cum_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    got.map(_._1).toSeq shouldBe Seq(1L, 3L, 4L)
    got.map(t => t._1 -> t._3).toMap shouldBe Map(1L -> 4L, 3L -> 8L, 4L -> 4L)
  }

  // --------------------------------------------------------- decontaminate

  test("decontaminate flags shingle overlap with the benchmark, keeps zero-overlap docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma" etc.
      (2L, "one two three four five"),        // disjoint
      (3L, ""),                               // empty doc: no tokens, n_sh = 0
      (4L, "alpha beta gamma")                // exactly one benchmark shingle
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")

    val got = Curation.decontaminate(docs, "doc_id", "text", bench, "text")
      .orderBy("id").collect()

    got.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    // doc 1: shingles {abg, bgd, gde} — abg, bgd in bench {abg, bgd}
    got(0).getLong(2) shouldBe 2L
    got(0).getBoolean(4) shouldBe true
    // doc 2: no overlap, still present
    got(1).getLong(2) shouldBe 0L
    got(1).getBoolean(4) shouldBe false
    got(1).getDouble(3) shouldBe 0.0
    // doc 3: no shingles at all -> frac 0.0, not NaN/null
    got(2).getLong(1) shouldBe 0L
    got(2).getDouble(3) shouldBe 0.0
    got(2).getBoolean(4) shouldBe false
    // doc 4: its single shingle is in the benchmark -> overlap_frac 1.0
    got(3).getLong(2) shouldBe 1L
    got(3).getDouble(3) shouldBe 1.0
  }

  test("decontaminate broadcasts the benchmark side (no shuffle of the bench join)") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((2L, "b c d e")).toDF("doc_id", "text")
    val plan = Curation.decontaminate(docs, "doc_id", "text", bench, "text")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  // ------------------------------------------------------- repetitionStats

  /** Plain-Scala reference for the kernel: tokenize on \s+, count. */
  private def refStats(text: String): (Long, Double, Double, Double) = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val n = toks.length.toLong
    val bgs = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    val dupTok = if (n == 0) 0.0 else 1.0 - toks.distinct.length.toDouble / n
    val topTok = if (n == 0) 0.0
      else toks.groupBy(identity).values.map(_.length).max.toDouble / n
    val dupBg = if (bgs.isEmpty) 0.0 else 1.0 - bgs.distinct.length.toDouble / bgs.length
    (n, dupTok, topTok, dupBg)
  }

  test("decontaminateBloom is result-identical to exact decontaminate") {
    // Bloom has no false negatives and survivors are exact-verified, so
    // the outputs must match row-for-row — including zero-overlap and
    // empty docs — at any fpp
    val docs = (0L until 200L).map { i =>
      (i, if (i % 3 == 0) s"alpha beta gamma doc$i words here"
          else s"unique${i} tokens${i} only${i} never${i} shared${i}")
    }.toDF("doc_id", "text")
    val bench = Seq((900L, "alpha beta gamma doc0")).toDF("doc_id", "text")
    val exact = Curation.decontaminate(docs, "doc_id", "text", bench, "text")
      .orderBy("id").collect().map(_.toSeq)
    val bloomed = Curation.decontaminateBloom(docs, "doc_id", "text", bench, "text",
        fpp = 0.1) // deliberately loose: false positives must be verified away
      .orderBy("id").collect().map(_.toSeq)
    bloomed.toSeq shouldBe exact.toSeq
  }

  test("decontaminateBloom with an empty benchmark flags nothing") {
    val docs = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Curation.decontaminateBloom(docs, "doc_id", "text", bench, "text")
      .orderBy("id").collect()
    got.length shouldBe 2
    got.foreach { r =>
      r.getLong(2) shouldBe 0L        // n_shared
      r.getBoolean(4) shouldBe false  // contaminated
    }
  }

  test("decontaminateBloom plan: map-side bloom probe, shuffle-hash verify, no bench broadcast before verify") {
    val docs = (0L until 50L).map(i => (i, s"w$i x$i y$i z$i")).toDF("doc_id", "text")
    val bench = Seq((900L, "w0 x0 y0 z0")).toDF("doc_id", "text")
    val plan = Curation.decontaminateBloom(docs, "doc_id", "text", bench, "text")
      .queryExecution.executedPlan.toString
    plan should include("bloom_might_contain")
    plan should include("ShuffledHashJoin")
  }

  test("repetitionStats matches a plain-Scala reference on varied inputs") {
    val texts = Seq(
      "a a a a",
      "a b a b a b",
      "the quick brown fox jumps over the lazy dog",
      "x",
      "",
      "   ",
      "a  b\t\tc\nd",
      "w w w w w w w w w w")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"), Curation.repetitionStats(col("text")).as("st"))
      .select(col("id"), col("st.n_tokens"), col("st.dup_token_frac"),
        col("st.top_token_frac"), col("st.dup_bigram_frac"))
      .orderBy("id").collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val (n, dupTok, topTok, dupBg) = refStats(t)
      withClue(s"text '$t': ") {
        got(i).getLong(1) shouldBe n
        got(i).getDouble(2) shouldBe dupTok +- 1e-12
        got(i).getDouble(3) shouldBe topTok +- 1e-12
        got(i).getDouble(4) shouldBe dupBg +- 1e-12
      }
    }
  }

  // ------------------------------------------------------------- language id

  test("bestLang kernel is value-identical to the composed expression fold") {
    val profiles = graft.SparkEntry.langProfiles
    val texts = Seq(
      "the cat and the dog went to the well",
      "der hund und die katze ist da",
      "the und",              // 1-1 tie -> first sorted lang wins on both paths
      "nothing matches here", // all-zero tie -> first sorted lang on both paths
      "",
      "  THE   AND  of\tto ") // case + whitespace normalization
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalytics.langId(col("text"), profiles).as("kernel"),
        TextAnalytics.langIdComposed(col("text"), profiles).as("composed"))
      .orderBy("id").collect()
    got.foreach { r =>
      withClue(s"id ${r.getLong(0)}: ") { r.getString(1) shouldBe r.getString(2) }
    }
  }

  // ----------------------------------------------------------------- pipeline

  test("pipeline keeps only high-quality, novel, uncontaminated keepers") {
    val good = "the quick brown fox jumps over a lazy dog and every word here is " +
      "mostly unique because we want low repetition of tokens across this entire " +
      "document with many different nouns verbs adjectives plus the usual glue words"
    val docs = Seq(
      (1L, good),                      // keeper of the 1/5 dup pair
      (2L, "spam spam spam spam spam spam spam spam"), // repetitive -> drop
      (3L, "benchmark overlap text shared with eval set " + good), // contaminated
      (5L, good)                       // exact dup of 1 -> not keeper
    ).toDF("doc_id", "text")
    val bench = Seq((0L, "benchmark overlap text shared with eval set")).toDF("doc_id", "text")
    val got = Curation.pipeline(docs, "doc_id", "text", bench, "text",
        stopwords = Seq("the", "a", "of", "and"))
      .orderBy("id").collect()
    got.map(r => (r.getLong(0), r.getBoolean(5))).toSeq shouldBe
      Seq((1L, true), (2L, false), (3L, false), (5L, false))
    // reasons are individually auditable
    val byId = got.map(r => r.getLong(0) -> r).toMap
    byId(2L).getDouble(2) should be > 0.6    // dup_token_frac
    byId(3L).getBoolean(3) shouldBe true     // contaminated
    byId(5L).getBoolean(4) shouldBe false    // not the exact keeper
  }

  // --------------------------------------------------------------- PII scrub

  test("scrubPii redacts emails, IPs and phone numbers; piiCounts counts them") {
    val df = Seq(
      (1L, "mail me at jane.doe+spam@sub.example.org or call 415-555-0123"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 no phone"),
      (3L, "clean text with no pii at all")
    ).toDF("id", "text")
    val got = df.select(col("id"),
        Curation.scrubPii(col("text")).as("red"),
        Curation.piiCounts(col("text")).as("c"))
      .select(col("id"), col("red"), col("c.n_emails"), col("c.n_ips"), col("c.n_phones"))
      .orderBy("id").collect()

    got(0).getString(1) shouldBe "mail me at <EMAIL> or call <PHONE>"
    got(0).getLong(2) shouldBe 1L
    got(0).getLong(4) shouldBe 1L
    got(1).getString(1) shouldBe "server at <IP> and <IP> no phone"
    got(1).getLong(3) shouldBe 2L
    got(2).getString(1) shouldBe "clean text with no pii at all"
    got(2).getLong(2) shouldBe 0L
    got(2).getLong(3) shouldBe 0L
    got(2).getLong(4) shouldBe 0L
  }

  test("unigramLogProb: hand-computed corpus likelihood; empty docs absent") {
    import spark.implicits._
    // corpus tokens: a×3, b×1 → p(a)=0.75, p(b)=0.25
    val docs = Seq((1L, "a a a"), (2L, "b"), (3L, "")).toDF("doc_id", "text")
    val got = Curation.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got.keySet shouldBe Set(1L, 2L)
    got(1L)._1 shouldBe 3L
    got(1L)._2 shouldBe math.log(0.75) +- 1e-12
    got(2L)._2 shouldBe math.log(0.25) +- 1e-12
    // common-token documents are more corpus-likely
    got(1L)._2 should be > got(2L)._2
  }

  test("unigramLogProb: null text rows are absent, others unaffected") {
    import spark.implicits._
    val docs = Seq((1L, Some("a a")), (2L, None), (3L, Some("a")))
      .toDF("doc_id", "text")
    val got = Curation.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    got.keySet shouldBe Set(1L, 3L)
    // all three tokens are 'a' → p=1.0 → avg_logp exactly 0.0
    got(1L) shouldBe 0.0
    got(3L) shouldBe 0.0
  }

  test("bigramLogProb: hand-computed interpolated conditionals; short docs absent") {
    // d1 = "x y x y" → bigrams (x,y),(y,x),(x,y); d2 = "y z"; d3 = "q"
    // big: (x,y)=2 (y,x)=1 (y,z)=1; pre: x·=2 y·=2; suf: ·y=2 ·x=1 ·z=1; N=4
    val docs = Seq((1L, "x y x y"), (2L, "y z"), (3L, "q")).toDF("doc_id", "text")
    val got = Curation.bigramLogProb(docs, "doc_id", "text", lambda = 0.7)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got.keySet shouldBe Set(1L, 2L) // one-token d3 has no bigram evidence
    val l = 0.7; val u = 1 - 0.7
    val xy = math.log(l * 2 / 2.0 + u * 2 / 4.0)
    val yx = math.log(l * 1 / 2.0 + u * 1 / 4.0)
    val yz = math.log(l * 1 / 2.0 + u * 1 / 4.0)
    got(1L)._1 shouldBe 3L
    got(1L)._2 shouldBe (2 * xy + yx) / 3 +- 1e-12
    got(2L)._1 shouldBe 1L
    got(2L)._2 shouldBe yz +- 1e-12
  }

  test("bigramLogProb is order-sensitive where unigramLogProb is blind") {
    // same token multiset, one natural and one shuffled doc: the corpus
    // bigram table is dominated by the natural order, so the shuffled doc
    // scores strictly lower on bigrams while unigram scores tie exactly
    val natural = (1 to 20).map(_ => "a b c d").mkString(" ")
    val shuffled = "b d a c " * 10 + "c a d b " * 10
    val docs = Seq((1L, natural), (2L, shuffled.trim)).toDF("doc_id", "text")
    val uni = Curation.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    uni(1L) shouldBe uni(2L) +- 1e-12
    val bi = Curation.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    bi(1L) should be > bi(2L)
  }

  test("crossSourceOverlap counts distinct shared shingles per source pair") {
    val docs = Seq(
      ("s1", "alpha beta gamma delta"),        // shingles: abg, bgd
      ("s1", "alpha beta gamma delta"),        // duplicate doc: no double count
      ("s2", "alpha beta gamma epsilon"),      // shares abg with s1
      ("s2", "x y z w"),
      ("s3", "completely different text here") // shares nothing
    ).toDF("source", "text")
    val got = Curation.crossSourceOverlap(docs, "source", "text", k = 3)
      .as[(String, String, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    got shouldBe Map(("s1", "s2") -> 1L) // only "alpha beta gamma"
  }

  test("duplicateSpans finds maximal copied spans, drops short runs and short docs") {
    // docs 1 and 2 share the 6-token run "one two three four five six"
    // (4 consecutive duplicated 3-grams); doc 3 repeats a lone 3-gram of
    // doc 1 (run of 1 < minRun); doc 4 is 2 tokens (no 3-grams at all)
    val docs = Seq(
      (1L, "one two three four five six unique1 tail1"),
      (2L, "head2 one two three four five six unique2"),
      (3L, "zz one two three yy"),
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = Curation.duplicateSpans(docs, "doc_id", "text", k = 3, minRun = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // "one two three" occurs in docs 1,2,3 → duplicated; the island in
    // doc 1 runs positions 0..3 (4 grams) BUT position 0's gram is also
    // in doc 3, extending nothing — spans are per-doc positional runs:
    // doc1 positions 0-3, doc2 positions 1-4; doc3's single gram (run 1)
    // and doc4 (too short) are absent
    got shouldBe Seq((1L, 0L, 4L, 6L), (2L, 1L, 4L, 6L))
  }

  test("duplicateSpans: self-repetition within one document counts as duplication") {
    val docs = Seq(
      (1L, "spam spam spam spam spam unique ending words")).toDF("doc_id", "text")
    // 3-grams at positions 0,1,2 are all "spam spam spam" → occ 3 ≥ 2 →
    // one island of 3 consecutive duplicated grams
    val got = Curation.duplicateSpans(docs, "doc_id", "text", k = 3, minRun = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 0L, 3L, 5L))
  }

  // ------------------------------------------------------- gopherRules

  test("gopherRules: each rule fails on its crafted offender, passes elsewhere") {
    val good = (1 to 50).map(i => s"word$i").mkString(" ") + " the a of"
    val docs = Seq(
      (1L, good),                                       // passes everything
      (2L, "the a of and too short"),                   // r_words (6 < 45)
      (4L, (1 to 50).map(_ => "12345").mkString(" ") + " the a of"),  // r_alpha (digits)
      (5L, (1 to 50).map(i => s"w$i").mkString(" ")),   // r_stop (no stopwords)
      (6L, (1 to 50).map(_ => "####").mkString(" ") + " the a of")    // r_symbol + r_alpha
    ).toDF("doc_id", "text")
    val got = Curation.gopherRules(docs, "doc_id", "text")
      .orderBy("id")
      .select("id", "r_words", "r_mean_wl", "r_alpha", "r_stop", "r_symbol", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    val byId = got.map(t => t._1 -> t).toMap
    byId(1L) shouldBe ((1L, true, true, true, true, true, true))
    byId(2L)._2 shouldBe false; byId(2L)._7 shouldBe false // word count
    byId(4L)._4 shouldBe false; byId(4L)._7 shouldBe false // alpha
    byId(5L)._5 shouldBe false; byId(5L)._7 shouldBe false // stopwords
    byId(6L)._6 shouldBe false; byId(6L)._7 shouldBe false // symbols
  }

  test("gopherRules: mean word length bounds catch gibberish runs") {
    // 50 one-char words → mean 1 < 3; 50 twenty-char words → mean 20 > 10
    val tiny = (1 to 50).map(_ => "x").mkString(" ") + " the a of"
    val huge = (1 to 50).map(_ => "y" * 20).mkString(" ") + " the a of"
    val got = Curation.gopherRules(
        Seq((1L, tiny), (2L, huge)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("id").select("r_mean_wl", "keep")
      .as[(Boolean, Boolean)].collect().toSeq
    got shouldBe Seq((false, false), (false, false))
  }

  test("gopherRules: ASCII '...' counts as a symbol — dot-ellipsis boilerplate flips keep→drop") {
    // 50 words each trailed by "..." → 50 non-overlapping '...' matches
    // over 53 words ≈ 0.94 ≫ 0.1; under the old unicode-only rule the
    // symbol_ratio would be 0 and this boilerplate would survive. The
    // identical doc without the dots keeps.
    val dotty = (1 to 50).map(i => s"item$i...").mkString(" ") + " the of and"
    val clean = (1 to 50).map(i => s"item$i").mkString(" ") + " the of and"
    val got = Curation.gopherRules(
        Seq((1L, dotty), (2L, clean)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("id").select("symbol_ratio", "r_symbol", "keep")
      .as[(Double, Boolean, Boolean)].collect().toSeq
    got(0)._1 should be > 0.1
    got(0)._2 shouldBe false
    got(0)._3 shouldBe false // the '...' fixture flips from keep to drop
    got(1) shouldBe ((0.0, true, true))
  }

  test("gopherRules: whitespace runs are ONE delimiter — no empty-token words") {
    // 47 words separated by mixed space/tab/newline runs + "the of":
    // a single-space split would count the extra runs as empty words
    // (deflating mean_word_len); \s+ after trim must count exactly 49
    val text = " " + (1 to 47).map(i => s"word$i").mkString("  \t") +
      "\n\n the \t of  "
    val got = Curation.gopherRules(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_words", "r_words", "r_stop")
      .as[(Long, Boolean, Boolean)].head()
    got shouldBe ((49L, true, true))
  }

  test("gopherRules: the paper's 8-word stopword set is the default") {
    // "be that have with" hits 4 of the 8 defaults — none of which were
    // in the old 4-word list except none; a doc carrying only these must
    // pass r_stop
    val text = (1 to 50).map(i => s"w$i").mkString(" ") + " be that have with"
    val got = Curation.gopherRules(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_stopwords", "r_stop").as[(Long, Boolean)].head()
    got shouldBe ((4L, true))
  }

  // ------------------------------------------------- boilerplatePassages

  test("boilerplatePassages drops cross-document passages from every doc, keeps unique text") {
    // pw=2 passages. "nav bar" opens docs 1,2,3 (df=3 → boilerplate —
    // removed from ALL, including its first occurrence); each doc's tail
    // is unique (df=1 → kept). Doc 4 is entirely boilerplate ("nav bar"
    // twice → one distinct passage with df 3... no: doc 4 contributes to
    // the same passage) → clean_text "".
    val docs = Seq(
      (1L, "nav bar alpha beta"),
      (2L, "nav bar gamma delta"),
      (3L, "nav bar epsilon zeta"),
      (4L, "nav bar nav bar")).toDF("doc_id", "text")
    val got = Curation.boilerplatePassages(docs, "doc_id", "text",
        passageWords = 2, minDocs = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    got shouldBe Seq(
      (1L, 2L, 1L, "alpha beta"),
      (2L, 2L, 1L, "gamma delta"),
      (3L, 2L, 1L, "epsilon zeta"),
      (4L, 2L, 0L, ""))
  }

  test("boilerplatePassages: within-one-doc repetition alone is not boilerplate") {
    // "tick tock" repeats inside doc 1 only → df counts DISTINCT docs =
    // 1 → kept everywhere; reassembly preserves original passage order.
    val docs = Seq(
      (1L, "tick tock tick tock end cap"),
      (2L, "other words here too")).toDF("doc_id", "text")
    val got = Curation.boilerplatePassages(docs, "doc_id", "text",
        passageWords = 2, minDocs = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    got shouldBe Seq(
      (1L, 3L, 3L, "tick tock tick tock end cap"),
      (2L, 2L, 2L, "other words here too"))
  }

  test("dsirScores: target-like documents score above raw-like ones") {
    // targets speak "aa bb", the raw bulk speaks "zz yy": a fresh doc in
    // the target dialect must out-score one in the bulk dialect, and
    // n_grams must be unigrams + bigrams = 2·tokens − 1
    val docs = (
      (1 to 5).map(i => (i.toLong, "aa bb aa bb aa", true)) ++
      (6 to 20).map(i => (i.toLong, "zz yy zz yy zz", false)) ++
      Seq((21L, "aa bb aa", false), (22L, "zz yy zz", false))
    ).toDF("doc_id", "text", "is_t")
    val got = Curation.dsirScores(docs, "doc_id", "text", col("is_t"), 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got(21L)._1 shouldBe 5L // 3 unigrams + 2 bigrams
    got(21L)._2 should be > got(22L)._2
    got(1L)._2 should be > 0.0
    got(6L)._2 should be < 0.0
  }

  test("dsirScores matches the plain-Scala hashed-bucket reference") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val buckets = 32
    def bucket(g: String): Long =
      java.lang.Long.parseLong(md5hex(g).take(8), 16) % buckets
    val corpus = Seq(
      (1L, "the cat sat", true), (2L, "the dog ran", true),
      (3L, "lorem ipsum dolor sit", false), (4L, "the cat ran fast", false),
      (5L, "ipsum the cat", false))
    def grams(t: String): Seq[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    // reference: per-doc bucket counts, smoothed corpus distributions
    val perDoc = corpus.map { case (id, t, tg) =>
      (id, tg, grams(t).groupBy(bucket).view.mapValues(_.size.toLong).toMap)
    }
    val raw = perDoc.flatMap(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val tgt = perDoc.filter(_._2).flatMap(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val totR = raw.values.sum.toDouble; val totT = tgt.values.sum.toDouble
    def llr(b: Long): Double =
      math.log((tgt.getOrElse(b, 0L) + 1) / (totT + buckets)) -
        math.log((raw(b) + 1) / (totR + buckets))
    val expected = perDoc.map { case (id, _, cs) =>
      id -> cs.map { case (b, c) => c * llr(b) }.sum
    }.toMap

    val got = Curation.dsirScores(corpus.toDF("doc_id", "text", "is_t"),
        "doc_id", "text", col("is_t"), buckets)
      .as[(Long, Long, Double)].collect()
    got.length shouldBe 5
    got.foreach { case (id, n, score) =>
      n shouldBe grams(corpus.find(_._1 == id).get._2).size.toLong
      score shouldBe expected(id) +- 1e-4
    }
  }

  test("dsirScoreExpr (map-only model scoring) agrees with the scoring join and floors unseen buckets") {
    val corpus = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the dog sat on the rug", true),
      (3L, "lorem ipsum dolor sit amet", false),
      (4L, "ipsum lorem sit dolor blob", false))
    val buckets = 64
    val df = corpus.toDF("doc_id", "text", "is_t")
    val dim = Curation.dsirDim(df, "doc_id", "text", col("is_t"), buckets)
      .as[(Long, Double)].collect().toMap
    def gramsOf(t: String): Seq[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val totR = corpus.map(c => gramsOf(c._2).size).sum
    val totT = corpus.filter(_._3).map(c => gramsOf(c._2).size).sum
    val default = math.log(totR + buckets.toDouble) -
      math.log(totT + buckets.toDouble)

    // on the training corpus every bucket is seen: expression ≡ join
    val exprScored = df.select(col("doc_id"),
        Curation.dsirScoreExpr(dim, default, buckets, col("text")).as("s"))
      .select(col("doc_id"), col("s.n_grams"), col("s.score"))
      .as[(Long, Long, Double)].collect()
    val joined = Curation.dsirScores(df, "doc_id", "text", col("is_t"), buckets)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    exprScored.foreach { case (id, n, score) =>
      n shouldBe joined(id)._1
      score shouldBe joined(id)._2 +- 2e-4
    }

    // a fresh doc scores via the model: seen buckets use the trained
    // llr, unseen ones the add-1 floor — checked gram by gram
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(g: String): Long =
      java.lang.Long.parseLong(md5hex(g).take(8), 16) % buckets
    val freshText = "qqq www eee the cat"
    val expected = gramsOf(freshText)
      .map(g => dim.getOrElse(bucket(g), default)).sum
    val Array((n, score)) = Seq((9L, freshText)).toDF("doc_id", "text")
      .select(Curation.dsirScoreExpr(dim, default, buckets, col("text")).as("s"))
      .select(col("s.n_grams"), col("s.score"))
      .as[(Long, Double)].collect()
    n shouldBe gramsOf(freshText).size.toLong
    score shouldBe expected +- 1e-3
  }
}
