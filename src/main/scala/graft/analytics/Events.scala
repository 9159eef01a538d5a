package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / event-stream operators (SURVEY §7.4, extension surface —
  * the reference's closest analog is its daily append micro-batch,
  * README.md:21-23).
  *
  * All operators shuffle once on their natural key (window bucket or
  * user), aggregate partially map-side, and never collect to the driver —
  * the shapes survive a 1000-executor scale-up unchanged.
  */
object Events {

  /** Tumbling-window aggregation: one hash aggregate keyed on
    * (window, extra keys). `window()` is a plain projection (bucket
    * arithmetic) — the only shuffle is the aggregate's. */
  def tumbling(df: DataFrame, tsCol: String, width: String, keys: Seq[String],
               aggs: Seq[Column]): DataFrame =
    df.groupBy((window(col(tsCol), width) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Sliding-window aggregation (each row lands in width/slide buckets —
    * a generate + aggregate; row amplification is the price of sliding
    * windows on any engine). */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(col(tsCol), width, slide) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Sessionization by inactivity gap: classic lag-gap + running-sum.
    * One shuffle on the user key; both window functions share the same
    * (key, order) so Catalyst plans a single sort+window stage. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gapSeconds: Long, tieBreak: String): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreak))
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val isNew = when(prevTs.isNull
      || col(tsCol).cast("double") - prevTs.cast("double") > gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("session_seq",
      sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Sessions per user — the aggregate form of sessionize. */
  def sessionCounts(df: DataFrame, userCol: String, tsCol: String,
                    gapSeconds: Long, tieBreak: String): DataFrame =
    sessionize(df, userCol, tsCol, gapSeconds, tieBreak)
      .groupBy(userCol)
      .agg(max(col("session_seq")).as("n_sessions"),
        count(lit(1)).as("n_events"))

  /** HLL distinct-count per group: `approx_count_distinct` is Spark's
    * native HyperLogLog++ — mergeable sketches, so partial aggregation
    * happens map-side and only sketch bytes cross the shuffle. */
  def approxDistinct(df: DataFrame, keys: Seq[String], target: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(target), rsd).as(s"approx_${target}"))

  /** Weekly retention cohort matrix — the classic product-analytics
    * rollup: users grouped by first-seen week, distinct-active counts at
    * each week offset since. Week 0's count is the cohort's size; the
    * curve per cohort row is its retention.
    *
    * Scale shape: the raw event stream reduces FIRST to distinct
    * (user, week) — one shuffle keyed on the pair, partial map-side
    * distinct, after which volume is users × weeks-active, not events.
    * First-seen week is one hash aggregate over that relation; the join
    * back is user-keyed (co-partitioned with the distinct's output),
    * and the final matrix aggregate is tiny. No windows, nothing
    * event-count-sized crosses more than the first exchange. */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = df.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).cast("date").as("w")).distinct()
    val first = weeks.groupBy("user").agg(min(col("w")).as("cohort_week"))
    weeks.join(first, Seq("user"))
      // weeks are Monday-aligned, so the day delta is an exact multiple
      // of 7; DIV keeps it an integer on any engine
      .withColumn("week_offset", expr("datediff(w, cohort_week) DIV 7"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user")).as("n_users"))
  }
}
