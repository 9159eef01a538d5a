package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join family: for each left row, the nearest right row within
  * the same key — backward (rightTs <= leftTs, the most recent),
  * forward (rightTs >= leftTs, the next), or backward with a staleness
  * tolerance (pandas merge_asof's direction/tolerance semantics).
  *
  * Built by composition, not a custom SparkPlan (SURVEY §7.3 preference
  * order): tag and union both sides, then `last(_, ignoreNulls)` over a
  * (key, ts) window forward-fills the right side's columns onto left
  * rows. One shuffle on the key + one per-partition sort — the same cost
  * profile a dedicated sort-merge as-of operator would have, but it
  * inherits AQE, codegen, and spill handling for free. Right rows sort
  * before left rows at equal ts, so `rightTs == leftTs` matches in both
  * directions (DuckDB/pandas `>=`/`<=` as-of semantics). */
object AsOfJoin {

  /** Union-tag-fill core: returns left rows with `rightCols` filled from
    * the nearest right row in the given direction, plus the matched
    * right timestamp as `__mts` (for tolerance gating). */
  /** Tag-and-union both sides: left rows carry their columns, right rows
    * carry ONE struct per row (its ts + every carried column), so the
    * nearest right row is filled WHOLESALE — pandas-merge_asof
    * semantics. Per-column last(ignoreNulls) fills would skip a
    * genuinely-null value in the nearest row and serve an OLDER row's
    * value for just that column, mixing rows and disagreeing with the
    * __mts the tolerance gate reads. */
  private def taggedUnion(left: DataFrame, right: DataFrame, key: String,
                          leftTs: String, rightTs: String,
                          rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "__rts", right.schema(rightTs).dataType) +:
        rightCols.map(c => org.apache.spark.sql.types.StructField(
          c, right.schema(c).dataType)))
    val l = left.select(
      (col(key).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__is_left") +:
        leftCols.map(col)) :+ lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      (col(key).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__is_left") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) :+
        struct(col(rightTs).as("__rts") +: rightCols.map(col): _*).as("__r"): _*)
    l.unionByName(r)
  }

  /** Window over the tagged union in one direction; ties keep right
    * before left so equal timestamps match (>=/<= semantics). */
  private def dirWindow(forward: Boolean) = {
    val ts = if (forward) col("__ts").desc else col("__ts").asc
    Window.partitionBy("__key")
      .orderBy(ts, col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  private def fill(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   rightCols: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    taggedUnion(left, right, key, leftTs, rightTs, rightCols)
      .withColumn("__row", last(col("__r"), ignoreNulls = true).over(dirWindow(forward)))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__row").getField(c).as(c)) :+
        col("__row").getField("__rts").as("__mts"): _*)
  }

  /** Backward as-of: the most recent right row with rightTs <= leftTs.
    *
    * @param rightCols right-side value columns to carry (must be unique
    *                  per (key, ts) on the right — pre-aggregate if not,
    *                  otherwise the tie winner is unspecified). */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightCols: Seq[String]): DataFrame =
    fill(left, right, key, leftTs, rightTs, rightCols, forward = false)
      .drop("__mts")

  /** Forward as-of: the NEXT right row with rightTs >= leftTs — the
    * "first event after" join (next price tick, next retry, next
    * deploy). Same cost profile as backward. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightCols: Seq[String]): DataFrame =
    fill(left, right, key, leftTs, rightTs, rightCols, forward = true)
      .drop("__mts")

  /** Nearest as-of: the closest right row in EITHER direction (pandas
    * merge_asof direction='nearest'), ties broken BACKWARD (the earlier
    * right row — so an exactly-simultaneous row, distance 0 both ways,
    * resolves deterministically). Timestamp-typed ts columns; distances
    * compare as exact integer epoch-micros.
    *
    * Cost: ONE shuffle on the key feeding two window passes (ascending
    * and descending sorts over the same partitioning) — not two
    * separate joins. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val both = taggedUnion(left, right, key, leftTs, rightTs, rightCols)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(dirWindow(forward = false)))
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(dirWindow(forward = true)))
      .filter(col("__is_left") === 1)
    val db = unix_micros(col("__ts")) - unix_micros(col("__b").getField("__rts"))
    val df = unix_micros(col("__f").getField("__rts")) - unix_micros(col("__ts"))
    val pick = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(db <= df, col("__b"))
      .otherwise(col("__f"))
    both.withColumn("__row", pick)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__row").getField(c).as(c)): _*)
  }

  /** Backward as-of with a staleness bound: a match older than
    * `toleranceSeconds` is discarded (right columns become null), the
    * pandas merge_asof `tolerance` contract. Timestamp-typed ts columns
    * only; the gate compares exact integer epoch-micros. */
  def asofTolerance(left: DataFrame, right: DataFrame, key: String,
                    leftTs: String, rightTs: String,
                    rightCols: Seq[String], toleranceSeconds: Long): DataFrame = {
    val filled = fill(left, right, key, leftTs, rightTs, rightCols, forward = false)
    val fresh = col("__mts").isNotNull &&
      (unix_micros(col(leftTs)) - unix_micros(col("__mts"))
        <= lit(toleranceSeconds * 1000000L))
    filled.select(
      (left.columns.toSeq.map(col) ++
        rightCols.map(c => when(fresh, col(c)).otherwise(lit(null)).as(c))): _*)
  }
}
