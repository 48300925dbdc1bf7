package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway attribution probe for StressBench section 25: how many of
  * the first N synthetic vectors share a band key with the planted hot
  * vector (StressBench.vecOf64(-1)) under the exact section-25 geometry
  * (16 planes, 4 bands — the private-plane kernel). Explains the gap
  * between the planted-only crossing bound maxBucket·hotEvery and the
  * observed earlier firing: random same-signature colliders accrete
  * into the hot bucket too. The vector kernel is shared with the
  * stream (StressBench.vecOf64), so "same kernel, same ids" holds by
  * construction.
  */
object HotBucketProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5300000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecOf = StressBench.vecOf64 _
    val keysOf = (c: org.apache.spark.sql.Column) =>
      graft.functions.VectorExpr.signLshBands(c, 16, 4)
    val hot = spark.range(1).select(keysOf(vecOf(lit(-1L))).as("hk"))
      .head().getSeq[Long](0)
    println(s"hot keys: ${hot.mkString(",")}")
    val counts = spark.range(n)
      .where(col("id") % 1400 =!= 0) // non-planted rows only
      .select(posexplode(keysOf(vecOf(col("id")))).as(Seq("band", "k")))
      .where(col("k").isin(hot: _*))
      .groupBy(col("band")).agg(count(lit(1)).as("colliders"))
      .orderBy(col("band"))
    counts.show()
    spark.stop()
  }
}
