package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Count-Min sketch — the point-frequency complement to
  * [[HeavyHitters]]: Misra–Gries answers "which items are frequent",
  * CMS answers "how often did THIS item occur" for any item, in
  * d×w longs of state regardless of cardinality. The classic
  * training-data use: per-shard token/shingle frequency tables cheap
  * enough to ship to the driver and merge (counting duplicates per
  * shard, boilerplate frequencies, n-gram LM smoothing stats).
  *
  * Guarantees (stream length n): est(t) ≥ true(t) always (counts only
  * ever add), and est(t) ≤ true(t) + ⌈e/w⌉·n with probability
  * ≥ 1 − (1/2)^d per query. Merging is elementwise addition — integer,
  * order-independent, exactly mergeable (the map-side-combine property
  * that makes the shuffle carry d·w longs, never the items). Row
  * hashes are xxhash64(token, seed=row), so a sketch's counts are a
  * pure function of the multiset — deterministic across partitionings,
  * retries and cluster sizes.
  */
object CountMin {

  /** est(token) = min over rows of that row's bucket count. */
  def estimate(sketch: Array[Long], w: Int, token: String): Long = {
    val d = sketch.length / w
    (0 until d).map(r => sketch(r * w + bucket(token, r, w))).min
  }

  private[operators] def bucket(token: String, row: Int, w: Int): Int = {
    val u = UTF8String.fromString(token)
    val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, row)
    (((h % w) + w) % w).toInt
  }

  class CountMinAgg(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
    require(d > 0 && w > 0, s"depth $d / width $w")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(s: Array[Long], tok: String): Array[Long] = {
      var r = 0
      while (r < d) { s(r * w + bucket(tok, r, w)) += 1; r += 1 }
      s
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(s: Array[Long]): Array[Long] = s

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column-API aggregate: the d×w count matrix as array<bigint>
    * (row-major). Probe it with [[estimate]] or [[estimateCol]].
    */
  def countMin(tok: Column, d: Int, w: Int): Column =
    udaf(new CountMinAgg(d, w), Encoders.STRING).apply(tok)

  /** Expression form of [[estimate]] — probes a sketch column inside
    * codegen with exactly the Aggregator's bucketing (XxHash64 with the
    * row index as seed), so estimates stay engine-deterministic.
    */
  def estimateCol(sketch: Column, token: Column, d: Int, w: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, least, lit, pmod}
    import org.apache.spark.sql.graft.ColumnBridge
    val probes = (0 until d).map { r =>
      val h = ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(ColumnBridge.expression(token)), r))
      element_at(sketch,
        (pmod(h, lit(w.toLong)) + lit(r.toLong * w) + 1).cast("int"))
    }
    probes.reduce(least(_, _))
  }
}
