package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Top-k session paths: sessionize, join each session's event types
    * in time order into one `a>b>c` path string, count sessions per
    * path. The navigation-analysis staple ("what do users actually do")
    * on top of the same session definition as sessionize/sessionCounts.
    *
    * Determinism: events order by (ts, tieBreak) — a total order — via
    * a min-sorted struct array, and the top-k order (n_sessions DESC,
    * path ASC) is total, so the cut line is stable on any engine.
    *
    * Scale shape: the sessionize window and the per-session collect
    * share the same user-key exchange (one shuffle); per-session arrays
    * are gap-bounded, never per-user-history-sized. The path count is
    * one hash aggregate with map-side partials (paths follow a
    * power-law — partials absorb the hot heads) and the top-k plans as
    * TakeOrderedAndProject, never a full sort. */
  def topPaths(df: DataFrame, userCol: String, tsCol: String,
               typeCol: String, gapSeconds: Long, tieBreak: String,
               k: Int): DataFrame =
    sessionize(df, userCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieBreak), col(typeCol).as("__t")))).as("__evs"))
      .select(expr("array_join(transform(__evs, e -> e.__t), '>')").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)

  /** Regex pattern matching over each user's full event-type SEQUENCE
    * — the MATCH_RECOGNIZE-style primitive: encode the history as a
    * string of one-letter type codes in (ts, tieBreak) order, then
    * count non-overlapping regex matches (e.g. 'v[^p]*p' = a view
    * converting to a purchase with no purchase in between). Both the
    * encoding (deterministic total order) and regexp_count are
    * engine-portable; patterns must avoid engine-specific regex
    * extensions (backrefs, lookahead).
    *
    * Scale shape: ONE user-key aggregate; the per-user string is
    * history-bounded (one byte per event) and the regex scan is
    * linear — no self-join, no window over the raw relation. */
  def sequencePatternCounts(df: DataFrame, userCol: String, tsCol: String,
                            typeCol: String, tieBreak: String,
                            pattern: String): DataFrame =
    df.groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol), col(tieBreak),
        substring(col(typeCol), 1, 1).as("__t")))).as("__evs"))
      .select(col(userCol),
        expr("array_join(transform(__evs, e -> e.__t), '')").as("seq"))
      .select(col(userCol),
        length(col("seq")).cast("long").as("n_events"),
        regexp_count(col("seq"), lit(pattern)).cast("long").as("n_matches"))

  /** Inter-arrival burstiness per stream (Goh & Barabási 2008):
    * B = (σ−μ)/(σ+μ) of the microsecond gaps between consecutive
    * events — +1 = extreme bursts, 0 = Poisson, −1 = metronome. With
    * exact integer gap moments the n's cancel:
    * B = (√(n·Σg²−(Σg)²) − Σg) / (√(n·Σg²−(Σg)²) + Σg), so the only
    * float steps are one IEEE sqrt and one division on exact
    * DECIMAL(38,0) operands. Streams with a zero gap sum yield NULL.
    *
    * Scale shape: one stream-key exchange + per-stream sort for the
    * lag, then ONE hash aggregate — the standard sessionize shape. */
  def burstiness(df: DataFrame, streamCol: String, tsCol: String,
                 tieBreak: String): DataFrame = {
    val byStream = Window.partitionBy("__s").orderBy(col("__ts"), col("__tb"))
    df.select(col(streamCol).as("__s"), col(tsCol).as("__ts"),
        col(tieBreak).as("__tb"))
      .withColumn("__gap",
        unix_micros(col("__ts")) - unix_micros(lag(col("__ts"), 1).over(byStream)))
      .filter(col("__gap").isNotNull)
      .select(col("__s"), col("__gap").cast(DecimalType(38, 0)).as("__g"))
      .groupBy(col("__s").as(streamCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum("__g").as("__sg"), sum(expr("__g * __g")).as("__sq"))
      .select(col(streamCol), col("n_gaps"),
        expr("""CASE WHEN __sg = 0 THEN NULL
                     ELSE CAST(floor(1000000 * (
                       (sqrt(CAST(n_gaps * __sq - __sg * __sg AS DOUBLE))
                        - CAST(__sg AS DOUBLE))
                       / (sqrt(CAST(n_gaps * __sq - __sg * __sg AS DOUBLE))
                          + CAST(__sg AS DOUBLE))) + 0.5) AS BIGINT)
                END""").as("burstiness_e6"))
  }

  /** Day-of-week seasonality profile per group: how each weekday's
    * event volume compares to the group's flat-week expectation
    * (index_e6 = n*7e6/total; 1e6 = no seasonality). The
    * capacity-planning / anomaly-baseline companion to dailyAnomalies:
    * that flags days against a trailing mean, this extracts the
    * recurring weekly shape the trailing mean silently absorbs.
    *
    * The weekday is epoch-day mod 7 (0 = Thursday, 1970-01-01) — an
    * integer formula every engine computes identically, unlike
    * DAYOFWEEK's Sunday=0/1/7 dialect lottery. One (group, dow) hash
    * aggregate, then a group-sized totals join that AQE broadcasts. */
  def dowSeasonality(df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val byDow = df
      .select(col(groupCol),
        expr(s"datediff(to_date($tsCol), DATE '1970-01-01') % 7").as("dow"))
      .groupBy(groupCol, "dow")
      .agg(count(lit(1)).as("n_events"))
    val totals = byDow.groupBy(groupCol).agg(sum("n_events").as("__total"))
    byDow.join(totals, Seq(groupCol))
      .select(col(groupCol), col("dow"), col("n_events"),
        expr("n_events * 7000000L DIV __total").as("index_e6"))
  }

  /** Peak concurrent sessions — the telecom "max simultaneous calls"
    * metric as a distributed sweep-line. Sessions (same definition as
    * sessionize) become ±1 deltas keyed by 2·µs: starts at 2t, ends at
    * 2t+1, so a session is live THROUGH its closing instant and an
    * equal-instant handoff counts as concurrent; equal keys pre-sum to
    * make the order total. The running sum is the two-pass distributed
    * prefix sum (Curation.exclusivePrefixSum — no single-partition
    * window, holds at any scale), and a 1-row broadcast argmax picks
    * the FIRST instant the peak is reached.
    * Output: one row (peak_concurrency, peak_at). */
  def peakConcurrency(df: DataFrame, userCol: String, tsCol: String,
                      gapSeconds: Long, tieBreak: String): DataFrame = {
    val sess = sessionize(df, userCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(min(col(tsCol)).as("__start"), max(col(tsCol)).as("__end"))
    val deltas = sess.select(explode(array(
        struct((unix_micros(col("__start")) * 2).as("ord"), lit(1L).as("delta")),
        struct((unix_micros(col("__end")) * 2 + 1).as("ord"), lit(-1L).as("delta"))))
        .as("d"))
      .select(col("d.ord").as("ord"), col("d.delta").as("delta"))
      .groupBy("ord").agg(sum("delta").as("delta"))
    val conc = Curation.exclusivePrefixSum(deltas, "ord", "delta", "__pre")
      .select(col("ord"), (col("__pre") + col("delta")).as("conc"))
    val peak = conc.agg(max(col("conc")).as("peak_concurrency"))
    conc.join(broadcast(peak), col("conc") === col("peak_concurrency"))
      .groupBy("peak_concurrency").agg(min(col("ord")).as("__ord"))
      .select(col("peak_concurrency"),
        expr("timestamp_micros(__ord DIV 2)").as("peak_at"))
  }

  /** Inter-arrival latency histogram in power-of-two buckets: bucket =
    * the BIT LENGTH of the microsecond delta (`length(bin(x))`) — an
    * exact integer log2 every engine computes identically, with no
    * float log to wobble at bucket edges. One user-keyed window (the
    * sessionize exchange shape) + one (type, bucket) aggregate. */
  def latencyBuckets(df: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreak))
    df.select(col(typeCol),
        (unix_micros(col(tsCol))
          - lag(unix_micros(col(tsCol)), 1).over(w)).as("__d"))
      .filter(col("__d").isNotNull)
      .select(col(typeCol), length(bin(col("__d"))).cast("int").as("bucket"))
      .groupBy(col(typeCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Sequence funnel with a per-step conversion window: step i counts
    * only if it happens strictly AFTER the user's step-(i-1) time and
    * within `gapSeconds` of it, taking the EARLIEST valid occurrence
    * (the greedy-earliest semantics product funnels use). Differs from
    * `funnel`, which only orders first occurrences with no window.
    *
    * Every step is one filtered aggregate + one user-keyed join — all
    * keyed on the user, so the chain co-partitions on a single shuffle
    * key. Step boundaries compare exact integer MICROSECONDS (not the
    * double-cast seconds sessionize tolerates): a window boundary is a
    * product-visible contract, so it must not wobble in an ulp. */
  def sequenceFunnel(df: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, steps: Seq[String],
                     gapSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "sequenceFunnel needs at least one step")
    val ev = df.select(col(userCol).as("__u"),
      unix_micros(col(tsCol)).as("__us"), col(typeCol).as("__t"))
    var acc = ev.filter(col("__t") === steps.head)
      .groupBy("__u").agg(min("__us").as("t0"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = s"t${i - 1}"
      val ti = ev.filter(col("__t") === st)
        .join(acc.select(col("__u"), col(prev)), Seq("__u"))
        .filter(col("__us") > col(prev)
          && col("__us") <= col(prev) + gapSeconds * 1000000L)
        .groupBy("__u").agg(min("__us").as(s"t$i"))
      acc = acc.join(ti, Seq("__u"), "left")
    }
    // ascending fold so the DEEPEST completed step is the outermost case
    val depth = steps.indices.foldLeft(lit(0)) { (els, i) =>
      when(col(s"t$i").isNotNull, i + 1).otherwise(els)
    }
    df.select(col(userCol).as("__u")).distinct()
      .join(acc, Seq("__u"), "left")
      .select(depth.cast("long").as("funnel_depth"))
      .groupBy("funnel_depth").agg(count(lit(1)).as("n_users"))
  }

  /** Per-type session entry/exit/bounce profile — which event types
    * OPEN sessions, which CLOSE them, and which are one-and-done (the
    * web-analytics landing/exit/bounce report, generalized). One pass:
    * the two rank windows partition by (user, session) which the
    * sessionize exchange on user already satisfies (hash on a subset of
    * the clustering keys co-locates — only a sort is added, no second
    * shuffle), then one type-keyed aggregate. */
  def entryExitProfile(df: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, gapSeconds: Long,
                       tieBreak: String): DataFrame = {
    val bySess = Window.partitionBy(col(userCol), col("session_seq"))
    val asc = bySess.orderBy(col(tsCol), col(tieBreak))
    val desc = bySess.orderBy(col(tsCol).desc, col(tieBreak).desc)
    sessionize(df, userCol, tsCol, gapSeconds, tieBreak)
      .withColumn("__ra", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .groupBy(col(typeCol))
      .agg(
        sum(when(col("__ra") === 1, 1L).otherwise(0L)).as("n_entries"),
        sum(when(col("__rd") === 1, 1L).otherwise(0L)).as("n_exits"),
        sum(when(col("__ra") === 1 && col("__rd") === 1, 1L).otherwise(0L))
          .as("n_bounces"),
        count(lit(1)).as("n_events"))
  }

  /** HLL distinct-count per group: `approx_count_distinct` is Spark's
    * native HyperLogLog++ — mergeable sketches, so partial aggregation
    * happens map-side and only sketch bytes cross the shuffle. */
  def approxDistinct(df: DataFrame, keys: Seq[String], target: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(target), rsd).as(s"approx_${target}"))

  /** Driver-green verdict for [[approxDistinct]]: runs the HLL sketch
    * for real, but the row emitted is the EXACT distinct count (plain
    * SQL on any engine) plus the within-band boolean — the sketch's
    * accuracy contract converted from a spec-only assertion into an
    * oracle-checkable row. For fixed data the sketch is deterministic
    * (fixed-seed hashing, register-max merge is order-free, and HLL++
    * has no merge-history-dependent estimator — unlike the
    * Datasketches HIP path q133 documents), so the boolean is a stable
    * fact, not a flaky sample.
    *
    * The verdict rsd is 0.02 against the 5% band: an estimator whose
    * nominal error EQUALS the band has no headroom — rsd=0.05 measured
    * 6.7% off at sf0.1's ~1500 distinct (the round-7 sweep caught it)
    * while rsd=0.02 measures ≤0.5% at both SFs, so the band holds with
    * 10× margin at any partitioning.
    *
    * Scale shape: the sketch aggregate AND the exact count_distinct
    * ride the same grouped shuffle; the join is groups-sized. */
  def approxDistinctVerdict(df: DataFrame, keys: Seq[String], target: String,
                            rsd: Double = 0.02, bandPct: Long = 5): DataFrame = {
    val approx = approxDistinct(df, keys, target, rsd)
    val exact = df.groupBy(keys.map(col): _*)
      .agg(count_distinct(col(target)).as("exact_distinct"))
    approx.join(exact, keys)
      .select(keys.map(col) :+ col("exact_distinct") :+
        (abs(col(s"approx_${target}") - col("exact_distinct")) * 100
          <= col("exact_distinct") * bandPct).as(s"within_${bandPct}pct"): _*)
  }

  /** Daily new-user counts with the running total — the growth curve.
    * First-seen day is one hash aggregate over the event stream; the
    * cumulative sum runs over the DAYS relation (one row per calendar
    * day — thousands of rows at any corpus size, so the unpartitioned
    * window is metadata-scale by construction, not a data-volume
    * window). */
  def userGrowth(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstDays = df.groupBy(col(userCol).as("user"))
      .agg(min(to_date(col(tsCol))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    firstDays.withColumn("cumulative_users",
      sum(col("n_new")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Time-weighted average of a sampled value per key: each observation
    * holds until the next one, so its weight is its holding duration
    * (the standard irregular-sampling average — a plain AVG
    * overweights bursts of closely-spaced samples). The final
    * observation has no duration and contributes nothing.
    *
    *   twa(key) = Σ vᵢ·(tᵢ₊₁ − tᵢ) / Σ (tᵢ₊₁ − tᵢ)
    *
    * Exactness: durations are integer microseconds (lead over a total
    * (ts, tiebreak) order), values integer-scaled by the caller; the
    * weighted sum is an exact DECIMAL dot product, one IEEE division
    * at the end rounded to 6 decimals — engine-portable, partition-
    * independent (Stats.scala's contract). Keys with a single
    * observation have no weighted span → NULL.
    *
    * Scale shape: one shuffle on the key (the lead window), one hash
    * aggregate. Per-partition volume is one key's history. */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, valCol: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val withDur = df
      .withColumn("__dur",
        (unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol))).cast(D))
    withDur.groupBy(col(keyCol))
      .agg(
        sum(col(valCol).cast(D) * col("__dur")).as("__wsum"),
        sum(col("__dur")).as("__span"))
      .select(col(keyCol),
        round(when(col("__span") > 0,
          col("__wsum").cast("double") / col("__span").cast("double")), 6)
          .as("twa"))
  }

  /** First-order transition counts between consecutive event types per
    * user — the Markov-chain view of user behavior ("what follows
    * what"). Consecutive means adjacent in the user's total
    * (ts, tiebreak) order; each user's first event has no predecessor
    * and opens no transition.
    *
    * Scale shape: one shuffle on the user (the lag window), then a
    * hash aggregate on the (from, to) pair — a types² relation,
    * metadata-scale regardless of stream size. */
  def eventTransitions(df: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Mergeable distinct-count rollup: per-day HLL sketches unioned to
    * weekly estimates — the distinct-count analog of Rollup.state/merge
    * (sum/min/max states don't extend to COUNT(DISTINCT); sketches
    * do). A daily pipeline keeps the day sketches and re-derives any
    * coarser rollup by union, never re-scanning the raw stream; union
    * with the same lgK is register-wise max, so merge-of-days equals
    * the sketch built directly over the week — bit-identical, not just
    * approximately (HllRollupSpec pins this).
    *
    * Scale shape: one hash aggregate to day sketches (map-side partial
    * sketches — Datasketches HLL states merge associatively), then a
    * union aggregate over the DAYS relation (365 rows/year regardless
    * of stream size). Sketch size is 2^lgK registers ≈ 4 KB at the
    * default lgK=12, with ~1.6% relative standard error. */
  def hllDailyToWeekly(df: DataFrame, userCol: String, tsCol: String,
                       lgK: Int = 12): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(userCol), lit(lgK)).as("__sk"))
    daily.groupBy(date_trunc("week", col("day")).cast("date").as("week"))
      .agg(hll_union_agg(col("__sk"), lit(false)).as("__u"))
      .select(col("week"), hll_sketch_estimate(col("__u")).as("approx_users"))
  }

  /** Driver-green verdict for [[hllDailyToWeekly]]: both the
    * merged-from-days weekly estimate AND the sketch built directly
    * over the week must sit within the lgK accuracy band of the exact
    * weekly distinct count. Emits (week, exact_users,
    * merged_within_5pct, direct_within_5pct) — everything but the
    * booleans plain SQL on any engine.
    *
    * Why the mergeability claim is an ACCURACY band, not equality (or
    * even a tight merged-vs-direct delta): DataSketches HLL estimates
    * with the HIP estimator when a sketch was built by direct
    * insertion, but falls back to the composite estimator after a
    * merge — and under Spark's partial aggregation BOTH paths merge
    * partials, in a partition-split-dependent order. Estimates are
    * therefore run-varying at dense cardinalities (observed at sf0.1's
    * ~1500 users/week: the same week's merged-vs-direct gap measured 6
    * on one run, >15 on another; sf0.01's ~150 users stay in coupon
    * mode where estimates are exact counts — which is why only the
    * round-7 sf0.1 sweep caught the original bit-equality claim). The
    * stable contract is that merging day sketches loses NO accuracy
    * beyond the band — estimates deviate ≲2% from exact (3σ ≈ 5% at
    * lgK=12), so the 5% verdict holds on every run and every engine.
    * Coupon-mode bit-equality stays pinned in EventsTextSpec at small
    * scale.
    *
    * Scale shape: three aggregates over the same weekly grouping (the
    * merged path adds its day-level pre-aggregate), joined at
    * weeks-relation size. */
  def hllWeeklyRollupVerdict(df: DataFrame, userCol: String, tsCol: String,
                             lgK: Int = 12, bandPct: Long = 5): DataFrame = {
    val week = date_trunc("week", to_date(col(tsCol))).cast("date").as("week")
    val merged = hllDailyToWeekly(df, userCol, tsCol, lgK)
    val direct = df.groupBy(week)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(userCol), lit(lgK)))
        .as("direct_users"))
    val exact = df.groupBy(week)
      .agg(count_distinct(col(userCol)).as("exact_users"))
    def inBand(c: Column) =
      abs(c - col("exact_users")) * 100 <= col("exact_users") * bandPct
    merged.join(direct, Seq("week")).join(exact, Seq("week"))
      .select(col("week"), col("exact_users"),
        inBand(col("approx_users")).as(s"merged_within_${bandPct}pct"),
        inBand(col("direct_users")).as(s"direct_within_${bandPct}pct"))
  }

  /** Trailing-window feature at each fact's own time: per key, the sum
    * of an integer measure over the [t−windowDays, t−1] DAY range —
    * strictly before the fact's day, so the feature can never see the
    * label's own day (the leakage rule point-in-time training sets live
    * by; pointInTimeJoin covers dimension attributes, this covers
    * behavioral aggregates). Same-day facts share one value — intra-day
    * order can't make the result nondeterministic.
    *
    * Scale shape: ONE shuffle on the key; the RANGE frame runs on the
    * integer epoch-day, so frame bounds are exact integer arithmetic,
    * and the window state is one key's rows inside the trailing span. */
  def trailingFeature(df: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, windowDays: Int): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date")))
      .rangeBetween(-windowDays.toLong, -1L)
    df.withColumn(s"trailing_${windowDays}d",
      coalesce(sum(col(valCol)).over(w), lit(0L)))
  }

  /** Audience overlap via theta sketches: distinct-user INTERSECTIONS
    * and differences between event types ("how many users both viewed
    * and purchased") — the set algebra HLL cannot do (HLL unions only;
    * inclusion-exclusion on HLL estimates compounds error and goes
    * negative). One sketch per type from one pass over the stream,
    * then pairwise theta_intersection / theta_difference over the
    * TYPES×TYPES relation — metadata-scale however large the stream.
    *
    * Estimates are approximate by construction (no value oracle);
    * EventsTextSpec pins them against exact intersection counts. */
  def audienceOverlap(df: DataFrame, typeCol: String,
                      userCol: String): DataFrame = {
    val sk = df.groupBy(col(typeCol))
      .agg(expr(s"theta_sketch_agg($userCol)").as("__sk"))
    val a = sk.select(col(typeCol).as("type_a"), col("__sk").as("__ska"))
    val b = sk.select(col(typeCol).as("type_b"), col("__sk").as("__skb"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("CAST(theta_sketch_estimate(theta_intersection(__ska, __skb)) AS BIGINT)")
          .as("both_users"),
        expr("CAST(theta_sketch_estimate(theta_difference(__ska, __skb)) AS BIGINT)")
          .as("only_a_users"),
        expr("CAST(theta_sketch_estimate(theta_difference(__skb, __ska)) AS BIGINT)")
          .as("only_b_users"))
  }

  /** Driver-green verdict for [[audienceOverlap]]: the theta-sketch
    * intersection/difference estimates checked against the EXACT set
    * algebra (one distinct (type, user) relation self-joined — the
    * recompute the sketch exists to avoid at scale, affordable here
    * because the verdict is the point). Emits the exact both/only
    * counts (plain SQL) plus one within-band boolean covering all
    * three estimates; the band is pct-or-absolute (greatest) so tiny
    * exact counts don't demand sub-integer precision. Below the
    * sketch's nominal-entries threshold theta is exact and the band
    * holds with margin zero. */
  def audienceOverlapVerdict(df: DataFrame, typeCol: String, userCol: String,
                             bandPct: Long = 5, bandAbs: Long = 5): DataFrame = {
    val est = audienceOverlap(df, typeCol, userCol)
    val tu = df.select(col(typeCol).as("__ty"), col(userCol).as("__u")).distinct()
    val cnt = tu.groupBy(col("__ty")).agg(count(lit(1)).as("__n"))
    val inter = tu.as("x").join(tu.as("y"),
        col("x.__u") === col("y.__u") && col("x.__ty") < col("y.__ty"))
      .groupBy(col("x.__ty").as("type_a"), col("y.__ty").as("type_b"))
      .agg(count(lit(1)).as("exact_both"))
    val grid = cnt.select(col("__ty").as("type_a"), col("__n").as("__na"))
      .join(cnt.select(col("__ty").as("type_b"), col("__n").as("__nb")),
        col("type_a") < col("type_b"))
      .join(inter, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        coalesce(col("exact_both"), lit(0L)).as("exact_both"),
        (col("__na") - coalesce(col("exact_both"), lit(0L))).as("exact_only_a"),
        (col("__nb") - coalesce(col("exact_both"), lit(0L))).as("exact_only_b"))
    def ok(estCol: Column, exCol: Column): Column =
      abs(estCol - exCol) * 100 <= greatest(exCol * bandPct, lit(bandAbs * 100))
    est.join(grid, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"),
        col("exact_both"), col("exact_only_a"), col("exact_only_b"),
        (ok(col("both_users"), col("exact_both"))
          && ok(col("only_a_users"), col("exact_only_a"))
          && ok(col("only_b_users"), col("exact_only_b"))).as("within_band"))
  }

  /** Forward fill (last observation carried forward) over per-key time
    * series: each null in `fillCols` takes the latest preceding non-null
    * value within its key. The canonical sparse-sensor/slowly-updating
    * attribute repair; nulls before a key's first observation stay null.
    *
    * Scale shape: ONE shuffle on the key — all fill columns ride the
    * same window frame, so Catalyst collapses them into a single Window
    * node over a single exchange (n fill columns never means n sorts).
    * Per-partition volume is one key's history, the same bound as
    * sessionize. The order columns must form a total order per key or
    * the filled value is nondeterministic — pass a tiebreaker (e.g. the
    * event id) alongside the timestamp. */
  def forwardFill(df: DataFrame, keyCol: String, ordCols: Seq[String],
                  fillCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Daily gap fill: per-key daily event counts with missing days
    * zero-filled between that key's first and last active day — the
    * regular grid a downstream rolling statistic or chart needs (a
    * trailing mean over raw counts silently skips absent days).
    *
    * Scale shape: the stream reduces to (key, day) counts in one hash
    * aggregate with map-side partials; the date spine is generated
    * KEY-LOCALLY with `sequence(lo, hi)` + explode — no driver-side
    * date loop, no global calendar broadcast — and the fill join is an
    * equi-join on (key, day), AQE-planned. Spine volume is bounded by
    * sum over keys of each key's active span in days, never
    * keys × global-calendar. */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = daily.groupBy(keyCol)
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col(keyCol), explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    spine.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
  }

  /** Gaps-and-islands: merge overlapping/touching intervals per key.
    * The classic SQL-hard shape (resource usage windows, user activity
    * spans, sensor uptime): an interval starts a new island iff its lo
    * exceeds the running max hi of every earlier interval in its key.
    * Bounds are NUMERIC (caller converts timestamps with unix_micros /
    * epoch_us so the arithmetic — and the oracle compare — is exact
    * integers, not float seconds).
    *
    * Scale shape: one window partition per key (running max + island
    * counter in the same pass, one shuffle); volume per partition is
    * that key's interval count — bounded by per-entity activity, the
    * same contract as sessionize. Returns one row per island:
    * (key, island_lo, island_hi, n_intervals). */
  def mergeIntervals(df: DataFrame, keyCol: String, loCol: String,
                     hiCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(loCol, hiCol)
    df.withColumn("__prev_hi",
        max(col(hiCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__prev_hi").isNull || col(loCol) > col("__prev_hi"), 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(loCol)).as("island_lo"), max(col(hiCol)).as("island_hi"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** Daily event-rate anomaly gate: flags (type, day) cells whose count
    * deviates from the trailing `windowDays`-day mean by more than
    * `zThreshold` sample standard deviations — the monitoring check a
    * pipeline runs before trusting a day's ingest (a collapsed source
    * or a bot flood both trip it).
    *
    * The z-test is evaluated in EXACT integer arithmetic: with n window
    * days, sum S and sum-of-squares SS,
    * z² > z₀²  ⇔  (n·x − S)²·(n−1) > z₀²·n·(n·SS − S²),
    * so the verdict is engine-portable bit-for-bit (a float stddev
    * compare can flip on the last ulp across engines). Days with fewer
    * than `windowDays` predecessors report is_anomaly = false (no
    * baseline yet).
    *
    * Scale shape: the event stream reduces to (type, day) counts in one
    * hash aggregate; the trailing window runs over that days×types
    * relation — thousands of rows at ANY corpus size, so the
    * per-type window partition is never a data-volume concern. */
  def dailyAnomalies(df: DataFrame, typeCol: String, tsCol: String,
                     windowDays: Int = 7, zThreshold: Int = 3): DataFrame = {
    require(windowDays >= 2, "windowDays must be >= 2 (variance needs n >= 2)")
    val n = windowDays.toLong
    val daily = df.groupBy(col(typeCol).as("event_type"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-windowDays, -1)
    val stats = daily
      .withColumn("window_n", count(col("n_events")).over(w))
      .withColumn("window_sum", sum(col("n_events")).over(w))
      .withColumn("window_sumsq",
        sum(col("n_events") * col("n_events")).over(w))
    stats.select(col("event_type"), col("day"), col("n_events"),
      coalesce(col("window_sum"), lit(0L)).as("window_sum"),
      coalesce(col("window_sumsq"), lit(0L)).as("window_sumsq"),
      (col("window_n") === n &&
        (lit(n) * col("n_events") - col("window_sum")) *
          (lit(n) * col("n_events") - col("window_sum")) * lit(n - 1) >
        lit(zThreshold.toLong * zThreshold) * lit(n) *
          (lit(n) * col("window_sumsq") - col("window_sum") * col("window_sum")))
        .as("is_anomaly"))
  }

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
  /** First-touch funnel: per user, the earliest timestamp of each step;
    * the user's funnel depth is the number of LEADING steps whose first
    * occurrences are in strictly increasing time order (the standard
    * first-touch funnel semantics — "did the first click come after the
    * first view"). Returns (funnel_depth, n_users): row k counts users
    * whose depth is exactly k (0 = never did step 1).
    *
    * Scale shape: ONE hash aggregate over events keyed by user computes
    * every step's min timestamp simultaneously (conditional mins,
    * partial map-side — the event stream crosses one exchange); the
    * depth fold is a projection and the distribution aggregate is
    * steps-sized. No per-user sequence sort, no window, no self-join
    * per step (the naive k-way formulation shuffles the stream k
    * times). */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val aggs = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s, col(tsCol))).as(s"__t$i") }
    val firsts = df.groupBy(col(userCol).as("user"))
      .agg(aggs.head, aggs.tail: _*)
    // reached(i) = reached(i-1) && t_i exists && strictly after t_{i-1}
    val reached = steps.indices.scanLeft(lit(true): Column) {
      case (prev, i) =>
        val ok = if (i == 0) col(s"__t$i").isNotNull
          else col(s"__t$i").isNotNull && col(s"__t${i - 1}") < col(s"__t$i")
        prev && ok
    }.tail
    val depth = reached.foldLeft(lit(0L)) {
      (acc, r) => acc + when(r, 1L).otherwise(0L) }
    firsts.select(depth.as("funnel_depth"))
      .groupBy("funnel_depth")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Trailing N-day distinct active users per day — the rolling-DAU
    * series. COUNT(DISTINCT) over a sliding window has no direct window
    * form; the scalable construction reduces events to distinct
    * (user, day) FIRST, then fans each activity day out to the N report
    * days it supports — row amplification is N× the user-day relation
    * (users × days), never N× the event stream. One distinct shuffle +
    * one count-distinct aggregate. Report days past the last activity
    * day are emitted (the decaying tail), matching the generate-based
    * relational form exactly. */
  def rollingActiveUsers(df: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    df.select(col(userCol).as("user"), to_date(col(tsCol)).as("d")).distinct()
      .withColumn("report_day",
        explode(sequence(col("d"), date_add(col("d"), windowDays - 1))))
      .groupBy("report_day")
      .agg(countDistinct(col("user")).as("active_users"))
  }

  /** Linear multi-touch attribution: each conversion's value splits
    * equally across the user's touch events in the lookback window
    * (touch.ts in [conv.ts − lookback, conv.ts)); conversions with no
    * touch credit a synthetic "direct" channel in full. Per-credit
    * arithmetic is ONE IEEE divide of exact integer cents, rounded to
    * 6 decimals, then summed as DECIMAL(38,6) — rounded-then-decimal-
    * sum, so the channel totals are exact in any accumulation order.
    *
    * Scale shape: touches join conversions on the USER key (one
    * co-partitioned shuffle); the range predicate prunes within each
    * user's group, so per-key fanout is (touches × convs) of one user —
    * bounded by per-user activity, not corpus size. The credit count
    * per conversion is a window over the joined relation keyed on the
    * same user-rooted key (no second exchange of the fact). */
  def linearAttribution(df: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, valueCol: String,
                        touchTypes: Seq[String], convType: String,
                        lookback: String = "7 days"): DataFrame = {
    val cents = floor(col(valueCol) * 100 + 0.5).cast("long")
    // same-instant conversions by one user merge (summed cents) so
    // (__u, __ct) is a UNIQUE conversion key — without this, identical
    // conversions would be indistinguishable in the credit window
    val convs = df.filter(col(typeCol) === convType)
      .groupBy(col(userCol).as("__u"), col(tsCol).as("__ct"))
      .agg(sum(cents).as("__cents"))
    val touches = df.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__tt"),
        col(typeCol).as("__channel"))
    val joined = convs.join(touches, Seq("__u"), "left")
      .withColumn("__hit", col("__tt").isNotNull
        && col("__tt") < col("__ct")
        && col("__tt") >= col("__ct") - expr(s"interval $lookback"))
    val w = Window.partitionBy(col("__u"), col("__ct"), col("__cents"))
    joined
      .withColumn("__n", sum(when(col("__hit"), 1L).otherwise(0L)).over(w))
      .withColumn("__dedup",
        row_number().over(w.orderBy(col("__hit").desc, col("__tt"))))
      .filter(col("__hit") || col("__dedup") === 1) // no-touch convs keep 1 row
      .select(
        when(col("__n") === 0, lit("direct")).otherwise(col("__channel"))
          .as("channel"),
        when(col("__n") === 0, col("__cents").cast("double"))
          .otherwise(round(col("__cents").cast("double")
            / col("__n").cast("double"), 6)).as("__credit"))
      .groupBy("channel")
      .agg(sum(col("__credit").cast(DecimalType(38, 6)))
        .cast(DecimalType(38, 6)).as("attributed"),
        count(lit(1)).as("n_credits"))
  }

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

  /** RFM segmentation — the classic marketing/CRM customer scoring:
    * per key, Recency (days since last activity, against the corpus
    * max date), Frequency (row count), Monetary (exact integer cents),
    * each quintiled with `ntile(5)` (recency inverted so 5 = most
    * recent) and concatenated into a 3-digit segment label ("555" =
    * best customers). Quintile ties are broken by the key itself, so
    * the assignment is total-ordered and engine-deterministic.
    *
    * Scale shape: one hash aggregate to the KEYS-sized relation; the
    * three quintile assignments run as DISTRIBUTED exact ntiles
    * ([[graft.operators.GlobalRank.ntile]] — range-repartition +
    * per-partition rank + broadcast offsets), bit-identical to the
    * single-partition `ntile(5)` window but with no single-task sort:
    * a customer rollup at 100 TB is 10^8-10^9 rows, past what one
    * WindowExec partition should ever carry. The 1-row max-date rides
    * a broadcast. */
  def rfmSegments(df: DataFrame, keyCol: String, dateCol: String,
                  amountCentsCol: Column): DataFrame = {
    val mx = df.agg(max(col(dateCol).cast("date")).as("__mdate"))
    val base = df
      .groupBy(col(keyCol).as("custkey"))
      .agg(max(col(dateCol).cast("date")).as("__last"),
        count(lit(1)).as("f_orders"),
        sum(amountCentsCol).as("m_cents"))
      .crossJoin(broadcast(mx))
      .select(col("custkey"),
        datediff(col("__mdate"), col("__last")).cast("long").as("r_days"),
        col("f_orders"), col("m_cents"))
    // one dispatch for all three quintiles (GlobalRank.ntiles) — the
    // nested form paid the persist+count dispatch per nesting level
    val sc = graft.operators.GlobalRank.ntiles(base, 5, Seq(
        (Seq(col("r_days"), col("custkey")), "__rq"),
        (Seq(col("f_orders"), col("custkey")), "__fq"),
        (Seq(col("m_cents"), col("custkey")), "__mq")))
      .withColumn("r_score", (lit(6L) - col("__rq")).cast("long"))
      .withColumn("f_score", col("__fq").cast("long"))
      .withColumn("m_score", col("__mq").cast("long"))
      .drop("__rq", "__fq", "__mq")
    sc.select(col("custkey"), col("r_days"), col("f_orders"), col("m_cents"),
      col("r_score"), col("f_score"), col("m_score"),
      concat(col("r_score").cast("string"), col("f_score").cast("string"),
        col("m_score").cast("string")).as("segment"))
  }

  /** Customer lifecycle labeling by inactivity: per key, days since
    * last activity against the corpus max date, bucketed into
    * active / at_risk / churned by two caller thresholds — the churn
    * feed every retention workflow starts from.
    *
    * Scale shape: one hash aggregate to the KEYS-sized relation, one
    * broadcast 1-row max, zero windows. */
  def lifecycleStatus(df: DataFrame, keyCol: String, dateCol: String,
                      atRiskDays: Int, churnedDays: Int): DataFrame = {
    require(churnedDays > atRiskDays, "churnedDays must exceed atRiskDays")
    val mx = df.agg(max(col(dateCol).cast("date")).as("__mdate"))
    df.groupBy(col(keyCol).as("custkey"))
      .agg(max(col(dateCol).cast("date")).as("last_date"))
      .crossJoin(broadcast(mx))
      .select(col("custkey"),
        date_format(col("last_date"), "yyyy-MM-dd").as("last_date"),
        datediff(col("__mdate"), col("last_date")).cast("long").as("days_inactive"))
      .withColumn("status",
        when(col("days_inactive") > churnedDays, "churned")
          .when(col("days_inactive") > atRiskDays, "at_risk")
          .otherwise("active"))
  }

  /** Gaps-and-islands activity streaks: per key, the runs of
    * CONSECUTIVE active calendar days, summarized as total active days,
    * number of distinct streaks, and the longest streak — the
    * engagement shape behind "7-day streak" product metrics.
    *
    * Classic island trick: distinct active days per key, then
    * `day - row_number()` is constant within a consecutive run, so one
    * group-by on that anchor date materializes the islands without a
    * self-join.
    *
    * Scale shape: one hash aggregate to (key, day) — the only relation
    * that is data-sized — then a key-partitioned window and two more
    * key-sized aggregates. No global window, no join. */
  def activityStreaks(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df
      .select(col(keyCol).as("k"), col(tsCol).cast("date").as("d"))
      .distinct()
    val islands = days
      .withColumn("__anchor",
        date_sub(col("d"),
          row_number().over(Window.partitionBy("k").orderBy("d"))))
      .groupBy(col("k"), col("__anchor"))
      .agg(count(lit(1)).as("__len"))
    islands.groupBy(col("k").as(keyCol))
      .agg(sum("__len").cast("long").as("n_active_days"),
        count(lit(1)).cast("long").as("n_streaks"),
        max("__len").cast("long").as("longest_streak"))
  }
}
