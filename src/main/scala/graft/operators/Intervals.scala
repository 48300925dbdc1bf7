package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap joins at scale.
  *
  * A naive overlap join — `a.start < b.end AND b.start < a.end` — has no
  * equality conjunct, so Spark can only plan it as a broadcast
  * nested-loop / cartesian product: O(|A|·|B|) comparisons regardless of
  * how few pairs actually overlap. At 100 TB that plan never finishes.
  *
  * The standard fix (genomics binning, Sedona/GeoSpark grids, the
  * DBPlus "bucket join" literature) is to quantize time into fixed-width
  * buckets, stamp every interval onto each bucket it covers (explode
  * factor = len/width + 1, bounded when the width is chosen near the
  * typical interval length), equi-join on the bucket id, and re-verify
  * the exact overlap predicate on the candidates. Each overlapping pair
  * is emitted exactly once WITHOUT a distinct: the pair is kept only in
  * the bucket containing `greatest(a.start, b.start)` — that instant
  * lies inside both intervals, so exactly one bucket row qualifies.
  *
  * Shuffle shape: one equi-join keyed by bucket id; a hot bucket is
  * bounded by interval density per width, not by |A|·|B|.
  */
object Intervals {

  /** All (a, b) pairs satisfying the canonical overlap predicate
    * `a.start < b.end AND b.start < a.end` over half-open integer
    * intervals `[startCol, endCol)`, via the bucketed equi-join above.
    * `startCol`/`endCol` are integer instants (e.g. epoch micros);
    * `bucketWidth` is in the same unit. Output: all `a` columns, all
    * `b` columns (caller must make the names disjoint), plus `overlap`
    * = `least(ends) − greatest(starts)`.
    *
    * Zero-length intervals (`start == end` — instantaneous events) are
    * NOT dropped: under the strict predicate a point pairs with every
    * interval that strictly contains its instant, with `overlap` = 0 —
    * the point-in-interval join — exactly as the predicate reads
    * (touching endpoints still never pair). Each such row is stamped
    * onto its single bucket via `greatest(s, e − 1)` in the stamp
    * upper bound. Exactly-once still holds on the dedup bucket
    * g = `greatest(starts)`: g ≥ each side's start, and when g is the
    * OTHER side's start the predicate `g < thisEnd` puts g ≤ thisEnd−1
    * inside this side's stamp range, so both sides carry the g bucket
    * and no other bucket qualifies.
    *
    * Inverted intervals (`end < start`) are malformed and are DROPPED
    * before stamping: the exactly-once argument above needs
    * `greatest(s, e − 1) = s` only in the zero-length case, and an
    * inverted row like [5, 2) would otherwise pass the strict
    * predicate against a containing interval and emit a pair with
    * negative overlap.
    */
  def overlapJoin(a: DataFrame, aStart: Column, aEnd: Column,
                  b: DataFrame, bStart: Column, bEnd: Column,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth")
    // `div`, not `/`: Column./ is DOUBLE division, whose ulp at
    // epoch-micros magnitude can flip a floor at bucket boundaries
    def stamped(df: DataFrame, s: Column, e: Column, p: String): DataFrame =
      df.select(col("*"), s.cast("long").as(s"__${p}s"),
          e.cast("long").as(s"__${p}e"))
        .where(col(s"__${p}e") >= col(s"__${p}s"))
        .select(col("*"),
          explode(sequence(expr(s"__${p}s div $bucketWidth"),
            expr(s"greatest(__${p}s, __${p}e - 1) div $bucketWidth")))
            .as(s"__${p}bkt"))
    val sa = stamped(a, aStart, aEnd, "a")
    val sb = stamped(b, bStart, bEnd, "b")
    sa.join(sb,
        col("__abkt") === col("__bbkt") &&
          col("__as") < col("__be") && col("__bs") < col("__ae") &&
          // dedup: keep the pair only in the bucket of the later start
          col("__abkt") === expr(s"greatest(__as, __bs) div $bucketWidth"))
      .withColumn("overlap",
        least(col("__ae"), col("__be")) - greatest(col("__as"), col("__bs")))
      .drop("__as", "__ae", "__abkt", "__bs", "__be", "__bbkt")
  }
}
