package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Percentiles}
import graft.sources.Tables

/** Scratch profiling harness (not part of the declared surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    docs.count()

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }

    time("simhashed only")(Dedup.simhashed(docs, "doc_id", "text").count())
    time("simhash chunks exploded") {
      Dedup.simhashed(docs, "doc_id", "text")
        .withColumn("chunk", explode(array((0 until 4).map(i =>
          struct(lit(i).as("ci"), shiftright(col("sh"), i * 16)
            .bitwiseAND(0xFFFFL).as("ckey"))): _*)))
        .count()
    }
    time("simhash full pairs")(Dedup.simhashPairs(docs, "doc_id", "text").count())
    time("simhash full pairs again")(Dedup.simhashPairs(docs, "doc_id", "text").count())
    time("ngram full pairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("minhash full pairs")(Dedup.minhashPairs(docs, "doc_id", "text").count())

    val li = Tables.lineitem(spark, sfDir)
    time("percentile builtin") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)"), expr("percentile(l_extendedprice, 0.9)"))
        .queryExecution.toRdd.count()
    }
    time("percentile rank-based") {
      val p1 = Percentiles.exact(li, "l_returnflag", "l_quantity", Seq(("p50", 0.5)))
      val p2 = Percentiles.exact(li, "l_returnflag", "l_extendedprice", Seq(("p90", 0.9)))
      p1.join(p2, "l_returnflag").queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
