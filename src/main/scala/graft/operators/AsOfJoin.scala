package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTs <= leftTs within the same key (the time-series join Spark has
  * no native operator for).
  *
  * Built by composition, not a custom SparkPlan (SURVEY §7.3 preference
  * order): tag and union both sides, then `last(_, ignoreNulls)` over a
  * (key, ts) window forward-fills the right side's columns onto left
  * rows. One shuffle on the key + one per-partition sort — the same cost
  * profile a dedicated sort-merge as-of operator would have, but it
  * inherits AQE, codegen, and spill handling for free. Right rows sort
  * before left rows at equal ts, so `rightTs == leftTs` matches
  * (DuckDB/pandas `>=` as-of semantics). */
object AsOfJoin {

  /** @param rightCols right-side value columns to carry (must be unique
    *                  per (key, ts) on the right — pre-aggregate if not,
    *                  otherwise the tie winner is unspecified). */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val nullRight = rightCols.map(c => lit(null).cast(
      right.schema(c).dataType).as(s"__r_$c"))
    val l = left.select(
      (col(key).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__is_left") +:
        leftCols.map(col)) ++ nullRight: _*)
    val r = right.select(
      (col(key).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__is_left") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r).select(
      (col("__is_left") +: leftCols.map(col)) ++
        rightCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w)
          .as(c)): _*)
    filled.filter(col("__is_left") === 1).drop("__is_left")
  }
}
