package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Per-query execution profile: wall seconds plus Spark-side counters
  * (jobs, stages, tasks, shuffle bytes, task time) from a listener —
  * the "where do the seconds go" companion to QBench (guide §1: decide
  * whether a floor is shuffle, scheduling, or compute before touching
  * the code). Optionally dumps the formatted plan next to the numbers.
  *
  *   sbt "runMain graft.tools.ProfileQ <names|top:N> [reps] [plansDir]"
  *
  * `<names>` = comma list of declared queries; `top:N` profiles the N
  * alphabetically-first queries (mostly for smoke runs). Plans go to
  * `<plansDir>/<query>.txt` when the third arg is present.
  */
object ProfileQ {
  private class Counters extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val taskTimeMs = new AtomicLong
    val gcMs = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(): Unit }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        taskTimeMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      shuffleRead.set(0); shuffleWrite.set(0); taskTimeMs.set(0); gcMs.set(0)
    }
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 1) args(1).toInt else 2
    val plansDir = if (args.length > 2) Some(args(2)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names: Seq[String] =
      if (args(0).startsWith("top:"))
        graft.SparkEntry.queries.keys.toSeq.sorted.take(args(0).stripPrefix("top:").toInt)
      else args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    // optional runtime SQL-conf overrides for same-JVM A/B experiments,
    // e.g. SPARK_GRAFT_PROFILE_CONF="spark.sql.adaptive.coalescePartitions.minPartitionSize=64k"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[profileq] conf $k=$v")
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val c = new Counters
    spark.sparkContext.addSparkListener(c)
    println(f"[profileq] ${"query"}%-28s rep   sec   jobs stages  tasks  shufMB taskSec  gcSec")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      plansDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        val p = java.nio.file.Paths.get(d, s"$name.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, plan)
      }
      (1 to reps).foreach { r =>
        c.reset()
        val t0 = System.nanoTime()
        val qe = fn(spark, sfDir).queryExecution
        qe.executedPlan // force analysis+optimization+physical planning
        val tPlan = System.nanoTime()
        qe.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val planSec = (tPlan - t0) / 1e9
        // listener events drain asynchronously; give the bus a beat so
        // the counters cover this query's tasks
        Thread.sleep(150)
        println(f"[profileq] $name%-28s  $r  $dt%6.3f  ${c.jobs.get}%4d  ${c.stages.get}%4d  ${c.tasks.get}%6d  ${c.shuffleRead.get / 1e6}%6.1f  ${c.taskTimeMs.get / 1e3}%6.1f  ${c.gcMs.get / 1e3}%5.1f  plan=$planSec%5.3f")
        graft.SparkEntry.releaseDeadCheckpoints(spark)
      }
    }
    spark.stop()
  }
}
