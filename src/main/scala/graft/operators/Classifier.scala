package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics

/** Hashed bag-of-words logistic-regression document classifier — the
  * fastText-shaped quality/language filter of public LLM data pipelines
  * (a small linear model trained on a bounded labeled sample, then
  * applied map-only to the whole corpus; cf. the GPT-3 and LLaMA data
  * papers' quality-classifier stage).
  *
  * Division of labor, the [[Pq]]/[[Bpe]] pattern:
  *   - TRAIN runs on the driver over a deterministic, `require()`-capped
  *     sample (id-ordered) — a dim-256 linear model is microscopic next
  *     to shipping the corpus, and full-batch gradient descent over a
  *     fixed-order sample is bit-deterministic.
  *   - SCORE is one map-only Catalyst expression per document — the
  *     trained weights ride along as an array literal, features hash
  *     through the builtin `xxhash64`, and the dot product folds with
  *     the builtin higher-order `aggregate` — a single native Project
  *     (HOFs sit outside whole-stage codegen but stay on the codegen'd
  *     scan pipeline), no UDF, nothing shuffles.
  *
  * Features: mean of per-token weight lookups, bucket =
  * pmod(xxhash64(token), dim) — the hashing trick, so the model size is
  * fixed regardless of vocabulary and train/score cannot disagree on a
  * dictionary.
  */
object Classifier {

  /** Hard cap on the driver-side training sample (rows). */
  val MaxTrainSample = 100000

  /** The trained model: per-bucket weights plus intercept. */
  final case class LinearModel(weights: Array[Double], bias: Double, dim: Int)

  /** Token→bucket expression shared by train and score: every row of
    * both paths hashes with the SAME builtin, so a drifting tokenizer
    * or seed cannot split them.
    */
  private[operators] def buckets(textCol: Column, dim: Int): Column =
    transform(TextAnalytics.tokens(lower(textCol)),
      t => pmod(xxhash64(t), lit(dim.toLong)).cast("int"))

  /** Full-batch logistic-regression training on the first `maxSample`
    * docs by id. Deterministic: the sample is id-ordered, the gradient
    * accumulates in that fixed order, and iterations/learning rate are
    * caller-fixed. Throws (naming the knob) rather than collecting an
    * oversized sample.
    */
  def trainLogReg(docs: DataFrame, idCol: String, textCol: String,
                  labelCol: Column, dim: Int = 256, maxSample: Int = 10000,
                  iters: Int = 50, lr: Double = 0.5): LinearModel = {
    require(dim > 0, s"dim $dim")
    require(maxSample > 0 && maxSample <= MaxTrainSample,
      s"maxSample $maxSample exceeds Classifier.MaxTrainSample " +
        s"$MaxTrainSample: raise the cap knowingly or sample upstream")
    val rows = docs
      .select(col(idCol).cast("long").as("_id"),
        buckets(col(textCol), dim).as("_b"),
        labelCol.cast("boolean").as("_l"))
      .orderBy(col("_id"))
      .limit(maxSample)
      .collect()
    require(rows.nonEmpty, "trainLogReg: empty training sample")
    // dense mean-of-one-hot feature vectors, fixed order
    val xs = rows.map { r =>
      val bs = r.getSeq[Int](1)
      val x = new Array[Double](dim)
      if (bs.nonEmpty) {
        val inv = 1.0 / bs.length
        bs.foreach(b => x(b) += inv)
      }
      x
    }
    val ys = rows.map(r => if (r.getBoolean(2)) 1.0 else 0.0)
    val w = new Array[Double](dim)
    var b = 0.0
    val n = xs.length
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](dim)
      var gb = 0.0
      var i = 0
      while (i < n) {
        val x = xs(i)
        var z = b
        var j = 0
        while (j < dim) { z += w(j) * x(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val d = p - ys(i)
        j = 0
        while (j < dim) { gw(j) += d * x(j); j += 1 }
        gb += d
        i += 1
      }
      var j = 0
      while (j < dim) { w(j) -= lr * gw(j) / n; j += 1 }
      b -= lr * gb / n
      it += 1
    }
    LinearModel(w, b, dim)
  }

  /** Map-only scoring: p = sigmoid(bias + mean_t w[bucket(t)]).
    * Token-less docs score sigmoid(bias). The weight table is an array
    * literal, the fold is the builtin `aggregate` — codegen end to end,
    * no UDF, no shuffle, no driver round-trip.
    */
  def score(textCol: Column, model: LinearModel,
            roundTo: Int = 6): Column = {
    val w = typedlit(model.weights.toSeq)
    val bs = buckets(textCol, model.dim)
    val dot = aggregate(bs, lit(0.0),
      (acc, bkt) => acc + element_at(w, bkt + 1))
    val z = lit(model.bias) +
      when(size(bs) > 0, dot / size(bs)).otherwise(lit(0.0))
    round(lit(1.0) / (lit(1.0) + exp(-z)), roundTo)
  }
}
