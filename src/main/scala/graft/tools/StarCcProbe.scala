package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Star-CC round/job probe (r16): runs the forced-distributed
  * connected-components path over the sf embedding near-dup pairs (the
  * q_dedup_clusters_star input) and over the adversarial 512-chain,
  * printing roundsRun, driver job count and wall seconds — the
  * round-latency evidence for the stride/no-distinct restructure.
  *
  *   sbt "runMain graft.tools.StarCcProbe [reps]"
  */
object StarCcProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    })
    import spark.implicits._

    def run(name: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 1 to reps) {
        jobs.set(0)
        val t0 = System.nanoTime()
        val (labels, rounds) = Dedup.clustersStarWithRounds(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
            .localCheckpoint(false),
          maxIters = 20, reliable = false)
        val loopJobs = jobs.get
        val n = labels.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[starcc] $name%-12s rep $r rounds=$rounds jobs=${jobs.get}" +
          f" (loop=$loopJobs tail=${jobs.get - loopJobs}) labels=$n wall=$dt%.3f")
        graft.SparkEntry.releaseDeadCheckpoints(spark)
      }
    }

    val emb = graft.EntryContext.embeddingPairs(spark, sfDir)
      .select(col("id_a"), col("id_b"))
    run("sf-pairs", emb)
    val chain = (0 until 511).map(i => (i.toLong, i.toLong + 1))
      .toDF("id_a", "id_b")
    run("chain512", chain)
    spark.stop()
  }
}
