package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Frequent-items (heavy hitters) via a Misra–Gries summary — the
  * mergeable-sketch answer to "top tokens over a 100 TB corpus" when an
  * exact token groupBy would shuffle billions of distinct keys. State is
  * a bounded k-entry map per partial aggregate; the only exchange is the
  * k-entry summaries themselves.
  *
  * Guarantees (stream length n, capacity k): every item with true count
  * > n/(k+1) is present in the summary, and every estimate e(t)
  * satisfies true(t) − n/(k+1) ≤ e(t) ≤ true(t). Merging two summaries
  * (Agarwal et al., "Mergeable Summaries", PODS'12) adds counts and
  * subtracts the (k+1)-th largest combined count; errors add, bounded by
  * n_total/(k+1). With k ≥ distinct items the summary is EXACT — the
  * declared query runs in that regime, which is what lets DuckDB's exact
  * GROUP BY oracle hash-match it; the lossy regime is property-tested.
  */
object HeavyHitters {

  class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k > 0, s"capacity $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], tok: String): Map[String, Long] =
      m.get(tok) match {
        case Some(c) => m.updated(tok, c + 1)
        case None if m.size < k => m.updated(tok, 1L)
        case None => // classic MG step: decrement every counter, drop zeros
          m.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val comb = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (comb.size <= k) comb
      else {
        // subtract the (k+1)-th largest count; ≤ k entries survive
        val thresh = comb.values.toSeq.sortBy(-_).apply(k)
        comb.flatMap { case (t, c) => if (c > thresh) Some(t -> (c - thresh)) else None }
      }
    }

    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (t, c) => (-c, t) }

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Column-API aggregate: array<struct<_1 token, _2 est_count>> sorted
    * by descending estimate (token tiebreak).
    */
  def misraGries(tok: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k), Encoders.STRING).apply(tok)
}
