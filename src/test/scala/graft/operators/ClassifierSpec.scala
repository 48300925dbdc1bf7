package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def toyDocs = Seq(
    (1L, "aaa aaa ccc", true), (2L, "aaa ddd", true),
    (3L, "aaa eee fff", true), (4L, "bbb ggg", false),
    (5L, "bbb bbb hhh", false), (6L, "bbb iii", false))
    .toDF("doc_id", "text", "lbl")

  test("training is deterministic: identical models from identical inputs") {
    val m1 = Classifier.trainLogReg(toyDocs, "doc_id", "text", col("lbl"),
      dim = 64, maxSample = 100, iters = 30, lr = 0.5)
    val m2 = Classifier.trainLogReg(toyDocs, "doc_id", "text", col("lbl"),
      dim = 64, maxSample = 100, iters = 30, lr = 0.5)
    m1.weights.toSeq shouldBe m2.weights.toSeq
    m1.bias shouldBe m2.bias
  }

  test("a separable corpus classifies perfectly at the 0.5 cut") {
    val model = Classifier.trainLogReg(toyDocs, "doc_id", "text", col("lbl"),
      dim = 64, maxSample = 100, iters = 200, lr = 1.0)
    val got = toyDocs
      .select(col("doc_id"), col("lbl"),
        (Classifier.score(col("text"), model) >= 0.5).as("pred"))
      .as[(Long, Boolean, Boolean)].collect()
    got.foreach { case (_, lbl, pred) => pred shouldBe lbl }
  }

  test("distributed scoring equals the driver-side sigmoid over the same hashed features") {
    val model = Classifier.trainLogReg(toyDocs, "doc_id", "text", col("lbl"),
      dim = 64, maxSample = 100, iters = 30, lr = 0.5)
    val feats = toyDocs
      .select(col("doc_id"),
        Classifier.buckets(col("text"), model.dim).as("b"))
      .as[(Long, Seq[Int])].collect().toMap
    val got = toyDocs
      .select(col("doc_id"), Classifier.score(col("text"), model).as("p"))
      .as[(Long, Double)].collect()
    got.foreach { case (id, p) =>
      val bs = feats(id)
      val z = model.bias +
        (if (bs.isEmpty) 0.0 else bs.map(model.weights(_)).sum / bs.length)
      val want = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      p shouldBe want +- 1e-9
    }
  }

  test("token-less documents score sigmoid(bias) and oversized samples throw naming the cap") {
    val model = Classifier.trainLogReg(toyDocs, "doc_id", "text", col("lbl"),
      dim = 16, maxSample = 100, iters = 10, lr = 0.5)
    val blank = Seq((9L, "")).toDF("doc_id", "text")
    val p = blank.select(Classifier.score(col("text"), model))
      .as[Double].collect()(0)
    val want = BigDecimal(1.0 / (1.0 + math.exp(-model.bias)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    p shouldBe want +- 1e-9
    val e = intercept[IllegalArgumentException] {
      Classifier.trainLogReg(toyDocs, "doc_id", "text", col("lbl"),
        maxSample = Classifier.MaxTrainSample + 1)
    }
    e.getMessage should include("MaxTrainSample")
  }

  test("scoring plan is map-only: no shuffle, no UDF, and codegen covers it") {
    val model = Classifier.trainLogReg(toyDocs, "doc_id", "text", col("lbl"),
      dim = 16, maxSample = 100, iters = 5, lr = 0.5)
    // score over a range child, not a LocalRelation — the optimizer folds
    // projections over local data into LocalTableScan, leaving no plan
    val docs = spark.range(6)
      .select(col("id").as("doc_id"),
        concat(lit("tok"), (col("id") % 3).cast("string")).as("text"))
    val plan = docs
      .select(col("doc_id"), Classifier.score(col("text"), model))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "BatchEvalPython"
    // higher-order functions don't join whole-stage codegen: the score is
    // a single native Project over the (codegen'd) child, not a UDF stage
    plan should include("Project")
  }
}
