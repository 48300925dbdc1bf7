package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Post-execution plan dump (r16): runs declared queries and writes the
  * AQE FINAL executed plan — the one with ReusedExchange / AQEShuffleRead
  * decisions — which `.explain` cannot show before execution. The
  * evidence tool for runtime exchange-reuse questions (does a duplicated
  * plan-text subtree actually execute once?).
  *
  *   sbt "runMain graft.tools.FinalPlan <q1,q2> [outDir]"
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val outDir = if (args.length > 1) args(1) else "/tmp/finalplans"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.toRdd.count(): Unit
      val p = df.queryExecution.executedPlan.toString
      Files.write(Paths.get(outDir, s"$n.txt"), p.getBytes("UTF-8"))
      val reused = "ReusedExchange".r.findAllIn(p).size
      val stages = "ShuffleQueryStage".r.findAllIn(p).size
      println(s"[finalplan] $n reusedExchange=$reused shuffleStages=$stages -> $outDir/$n.txt")
      SparkEntry.releaseDeadCheckpoints(spark)
    }
    spark.stop()
  }
}
