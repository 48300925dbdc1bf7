package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ragged-input contracts of the fixed-width code kernels: every kernel
  * that scores a CODE row against a model trained at a fixed width
  * (SQ8 byte codes vs the Q×d weight tables, PQ byte codes vs the m·k
  * LUTs, sign-bit words vs the query's ⌈d/64⌉ words, minhash
  * signatures vs the bands×rowsPerBand geometry) must fail LOUDLY on a
  * row whose width disagrees — never read past an UnsafeArrayData's end
  * (garbage) or silently truncate a partial score. Encode-side kernels
  * validate at encode ([[SqKernels.encode]]/[[PqKernels.encode]],
  * covered in SqSpec/KernelNullSpec); these tests force mismatched
  * codes straight into each SCORING kernel, which is reachable with
  * ragged codes when codes are persisted and re-read.
  *
  * Audited as variable-width BY DESIGN (no contract needed, asserted
  * here where cheap): minhash_sig / shingle_hashes / simhash64 accept
  * any token count (document length is data, not model shape);
  * sign-LSH planes derive per-row from the vector's own dimension;
  * zorder_key takes two scalars. Pairwise kernels (cosine, dot,
  * sig_agreement) already reject mismatched lengths (KernelNullSpec).
  */
class KernelRaggedSpec extends SparkSpec {
  import spark.implicits._

  test("sq8_scores rejects a code row narrower or wider than the trained dim") {
    val weights = Array(Array(0.1, 0.2))
    val consts = Array(0.0)
    val narrow = Seq((1L, Array[Byte](7))).toDF("id", "codes")
    val e = intercept[Exception] {
      narrow.select(SqExpr.scores(col("codes"), weights, consts)).collect()
    }
    e.getMessage should include("2 bytes")
    e.getMessage should include("got 1")
    val wide = Seq((1L, Array[Byte](7, 8, 9))).toDF("id", "codes")
    val e2 = intercept[Exception] {
      wide.select(SqExpr.scores(col("codes"), weights, consts)).collect()
    }
    e2.getMessage should include("got 3")
  }

  test("pq_adc_scores and pq_adc_score_at reject codes off the LUT's m*k shape") {
    // LUT shape m=2 subspaces x k=2 centroids = 4 doubles per query.
    val luts = Array(Array(0.1, 0.2, 0.3, 0.4))
    val bad = Seq((1L, Array[Byte](0))).toDF("id", "codes")
    val e = intercept[Exception] {
      bad.select(PqExpr.adcScores(col("codes"), 2, luts)).collect()
    }
    e.getMessage should include("2 subspaces")
    e.getMessage should include("got 1")
    val e2 = intercept[Exception] {
      bad.select(PqExpr.adcScoreAt(col("codes"), lit(0), 2, luts)).collect()
    }
    e2.getMessage should include("2 subspaces")
    // The matching width scores cleanly through both kernels.
    val ok = Seq((1L, Array[Byte](1, 0))).toDF("id", "codes")
    ok.select(PqExpr.adcScoreAt(col("codes"), lit(0), 2, luts))
      .head.getDouble(0) shouldBe (0.2 + 0.3) +- 1e-12
  }

  test("pq_adc LUTs ragged among THEMSELVES are rejected at construction") {
    // The per-row kernel validates codes only against luts(0) / the
    // selected LUT; uniformity across LUTs is a constructor-time
    // invariant so the O(Q) sweep stays off the hot scoring path.
    val ragged = Array(Array(0.1, 0.2, 0.3, 0.4), Array(0.1, 0.2))
    val e = intercept[IllegalArgumentException] {
      PqExpr.adcScores(col("codes"), 2, ragged)
    }
    e.getMessage should include("uniform LUTs")
    e.getMessage should include("lut(1) has 2")
    val e2 = intercept[IllegalArgumentException] {
      PqExpr.adcScoreAt(col("codes"), lit(1), 2, ragged)
    }
    e2.getMessage should include("uniform LUTs")
  }

  test("lsh_band_keys rejects signature widths ragged in both directions") {
    val df = Seq((1L, Seq(11L, 22L, 33L))).toDF("id", "sig")
    val e = intercept[Exception] {
      df.select(DedupExpr.bandKeys(col("sig"), 2, 2)).collect()
    }
    e.getMessage should include("exactly 4")
    e.getMessage should include("got 3")
    // Longer signatures are ragged too: a silent prefix would drop
    // trailing hashes (the contract the sibling kernels enforce).
    val wide = Seq((1L, Seq(11L, 22L, 33L, 44L, 55L))).toDF("id", "sig")
    val e2 = intercept[Exception] {
      wide.select(DedupExpr.bandKeys(col("sig"), 2, 2)).collect()
    }
    e2.getMessage should include("got 5")
    // Exactly bands*rowsPerBand works; the deterministic keys are distinct.
    val keys = Seq((1L, Seq(11L, 22L, 33L, 44L))).toDF("id", "sig")
      .select(DedupExpr.bandKeys(col("sig"), 2, 2)).head.getSeq[Long](0)
    keys.length shouldBe 2
    keys.distinct.length shouldBe 2
  }

  test("bq_hamming rejects ragged code widths in both directions") {
    val q = Array(Array(0L, 0L)) // a 2-word (65..128-dim) query
    val narrow = Seq((1L, Seq(1L))).toDF("id", "codes")
    val e = intercept[Exception] {
      narrow.select(BqExpr.hamming(col("codes"), q)).collect()
    }
    e.getMessage should include("2 words")
    e.getMessage should include("got 1")
    val wide = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "codes")
    val e2 = intercept[Exception] {
      wide.select(BqExpr.hamming(col("codes"), q)).collect()
    }
    e2.getMessage should include("got 3")
  }

  test("document-shaped kernels accept any token count by design") {
    val df = Seq(
      (1L, Seq("a")),
      (2L, Seq("a", "b", "c", "d", "e"))).toDF("id", "toks")
    val got = df.select(col("id"),
        DedupExpr.minhashSig(col("toks"), 2, 8).as("sig"),
        DedupExpr.simhash(col("toks")).as("sh"))
      .orderBy("id").collect()
    got.foreach { r => r.getSeq[Long](1).length shouldBe 8 }
  }
}
