package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with `rightTime < leftTime` (strict backward), matched within
  * equi-keys — the operator Spark lacks natively (SURVEY.md §2.3 J9).
  *
  * Spark-first implementation: a tagged UNION + single hash-shuffle on
  * the keys + one window pass (`last(_, ignoreNulls)` over a
  * time-ordered frame). This is the scale path: cost is one shuffle of
  * (left ∪ right) and a sort within key-partitions — no row-by-row
  * probing, no broadcast requirement on either side, skew handled by
  * AQE like any other shuffle. The alternative (range-condition join)
  * degenerates to BroadcastNestedLoopJoin and is quadratic per key.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its latest-before row is attached)
    * @param keys       equi-join key column names (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to carry (renamed as given)
    * @return left rows + payload columns of the latest strictly-earlier
    *         right match (null when none)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   payload: Map[String, String]): DataFrame =
    asOf(left, right, keys, leftTime, rightTime, payload, forward = false)

  /** Forward variant: the EARLIEST right row with `rightTime > leftTime`
    * (next-event join). Same single-shuffle plan, scanned in reverse
    * time order.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  payload: Map[String, String]): DataFrame =
    asOf(left, right, keys, leftTime, rightTime, payload, forward = true)

  private def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   payload: Map[String, String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // Tag and align the two sides on a common shape.
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_is_left"),
          struct(leftCols.map(col): _*).as("_lrow"),
          lit(null).cast(rightStructType(right, payload)).as("_rrow")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_is_left"),
          lit(null).cast(leftStructType(left)).as("_lrow"),
          struct(payload.keys.toSeq.sorted.map(col): _*).as("_rrow")): _*)
    // One shuffle: partition by keys; order by time (reversed for the
    // forward variant) with left rows first at equal timestamps so the
    // strict inequality excludes ties.
    val timeOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("_is_left").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("_match", last(col("_rrow"), ignoreNulls = true).over(w))
      .where(col("_is_left") === 1)
    val out = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      payload.toSeq.sortBy(_._1).map { case (src, dst) => col(s"_match.$src").as(dst) }
    joined.select(out: _*)
  }

  private def leftStructType(left: DataFrame, dummy: Int = 0) = {
    import org.apache.spark.sql.types._
    StructType(left.schema.fields)
  }

  private def rightStructType(right: DataFrame, payload: Map[String, String]) = {
    import org.apache.spark.sql.types._
    StructType(payload.keys.toSeq.sorted.map(k => right.schema(k)))
  }
}
