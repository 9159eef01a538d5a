package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Grouped statistical aggregates computed from EXACT integer sums
  * (extension surface; the reference's only statistics are dbt-style
  * row-count checks, models/marts/call_center_kpis.sql).
  *
  * Every estimator here reduces to sums of integer-scaled operands
  * (DECIMAL(38,0) — exact in any accumulation order, so the result is
  * identical on any partitioning AND engine-portable bit-for-bit). The
  * only floating-point steps are the final division / sqrt on two
  * exact operands, which IEEE 754 defines uniquely — the same
  * technique q115's anomaly gate uses for its z-test. A float-sum
  * formulation (Spark's built-in corr/regr_slope, Welford online
  * variance) is order-dependent in the last bits and so flaps across
  * retries, partitionings, and engines.
  *
  * Scale shape: ONE hash aggregate with map-side partials per call —
  * n statistics ride one shuffle of one state row per (group × column)
  * pair. Nothing here ever sorts or windows the raw relation.
  */
object Stats {

  private val D = DecimalType(38, 0)

  /** Per-group OLS fit y = slope·x + intercept, from the closed-form
    * normal equations on exact sums:
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
    *   intercept = (Σy·Σxx − Σx·Σxy) / (n·Σxx − Σx²)
    * Operands must already be integer-scaled (cents / basis points —
    * see graft.queries.cents); results are rounded to 6 decimals so
    * the quotient stays far above double ulp at any realistic
    * magnitude. Degenerate groups (constant x → zero denominator)
    * yield NULL slope/intercept rather than ±Inf.
    *
    * DECIMAL(38,0) headroom: Σxy < 1e38 holds through ~1e12 rows of
    * 1e13-magnitude products — beyond 100 TB of cents-scaled money
    * columns; overflow surfaces as NULL (Spark) not silent wrap. */
  def regressionByGroup(df: DataFrame, keys: Seq[String],
                        x: Column, y: Column): DataFrame = {
    val prep = df.select(
      keys.map(col) ++ Seq(x.cast(D).as("__x"), y.cast(D).as("__y")): _*)
    val sums = prep.groupBy(keys.map(col): _*).agg(
      count(lit(1)).cast(D).as("__n"),
      sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
    val denom = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val slopeNum = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val interceptNum = (col("__sy") * col("__sxx") - col("__sx") * col("__sxy"))
      .cast("double")
    sums.select(
      keys.map(col) ++ Seq(
        col("__n").cast("long").as("n"),
        round(when(denom =!= 0.0, slopeNum / denom), 6).as("slope"),
        round(when(denom =!= 0.0, interceptNum / denom), 6).as("intercept")): _*)
  }

  /** Pearson correlation for every unordered pair of `cols`, in ONE
    * scan and ONE aggregate:
    *   corr = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))
    * The single state row carries all k + k·(k+1)/2 sums; the k·(k−1)/2
    * output rows are EXPLODED from it in one projection — a
    * union-of-selects per pair would re-derive (and re-scan) the
    * aggregate once per pair unless exchange reuse happens to fire.
    * Constant columns correlate as NULL. Rounded to 9 decimals
    * (|corr| ≤ 1, so 9 decimals sits ~6 orders above double ulp). */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val prep = df.select(cols.map { case (n, c) => c.cast(D).as(n) }: _*)
    val sumCols =
      cols.map { case (n, _) => sum(col(n)).as(s"__s_$n") } ++
        (for {
          i <- cols.indices; j <- i until cols.size
        } yield sum(col(cols(i)._1) * col(cols(j)._1))
          .as(s"__p_${cols(i)._1}_${cols(j)._1}"))
    val agg = prep.agg(count(lit(1)).cast(D).as("__n"), sumCols: _*)
    def varPart(n: String) =
      (col("__n") * col(s"__p_${n}_$n") - col(s"__s_$n") * col(s"__s_$n"))
        .cast("double")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
      (a, b) = (cols(i)._1, cols(j)._1)
    } yield {
      val cov = (col("__n") * col(s"__p_${a}_$b") - col(s"__s_$a") * col(s"__s_$b"))
        .cast("double")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        round(when(varPart(a) > 0.0 && varPart(b) > 0.0,
          cov / (sqrt(varPart(a)) * sqrt(varPart(b)))), 9).as("corr"))
    }
    agg.select(explode(array(pairs: _*)).as("__pair"))
      .select(col("__pair.col_x").as("col_x"), col("__pair.col_y").as("col_y"),
        col("__pair.corr").as("corr"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, with the per-cell contributions kept deterministic:
    *   contribution(cell) = (O·N − R·C)² / (N·R·C)
    * (the (O−E)²/E term with E = R·C/N cleared of fractions). The
    * numerator/denominator are exact decimals; each cell's quotient is
    * rounded to 6 decimals and FIXED as a decimal before summing, so
    * the statistic is identical in any accumulation order (a float
    * running sum over an unordered cell relation is not). Returns ONE
    * row: (chi2, dof) with dof = (|A|−1)·(|B|−1).
    *
    * Scale shape: one hash aggregate to the |A|×|B| contingency
    * relation; everything after (marginals, totals, the final sum)
    * runs over cells — metadata-scale however large the input.
    * Decimal headroom: (O·N)² must fit DECIMAL(38) — holds while
    * N·max(O) < 1e19, i.e. beyond 1e9 rows in the largest cell of a
    * 1e9-row relation; overflow surfaces as NULL, never silent wrap. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).cast(D).as("__o"))
    val rowTot = obs.groupBy("__a").agg(sum("__o").as("__r"))
    val colTot = obs.groupBy("__b").agg(sum("__o").as("__c"))
    val tot = obs.agg(sum("__o").as("__n"),
      count_distinct(col("__a")).as("__ka"),
      count_distinct(col("__b")).as("__kb"))
    // the FULL |A|×|B| grid, not just observed cells: a zero cell still
    // contributes (0−E)²/E = E — dropping empty cells understates the
    // statistic exactly when the association is strongest
    val grid = rowTot.crossJoin(colTot)
      .join(obs, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0).cast(D)))
    val num = (col("__o") * col("__n") - col("__r") * col("__c"))
    val contrib = round(
      (num * num).cast("double")
        / (col("__n") * col("__r") * col("__c")).cast("double"), 6)
      .cast(DecimalType(18, 6))
    grid.crossJoin(broadcast(tot))
      .agg(sum(contrib).cast(DecimalType(28, 6)).as("chi2"),
        first((col("__ka") - 1) * (col("__kb") - 1)).as("dof"))
  }

  /** Two-proportion z-test between arms `armA` and `armB` of an
    * experiment: are the conversion rates different at the given
    * significance? The verdict is evaluated in EXACT integer
    * arithmetic (q115's technique — a float z-score compare can flip
    * on the last ulp across engines):
    *   z² > z₀²  ⇔  (c₁n₂ − c₂n₁)²·N·10⁴ > ⌈z₀²·10⁴⌉·n₁n₂·c·(N − c)
    * with c = c₁+c₂, N = n₁+n₂ (pooled variance). `zSqE4` defaults to
    * 38416 = 1.96²·10⁴, the two-sided 95% threshold. Rates are
    * reported rounded to 6 decimals; the verdict never depends on
    * them. One row out of ONE conditional-aggregate pass (no pivot,
    * no second scan).
    *
    * DECIMAL(38) headroom: the left side peaks at (c₁n₂)²·N·10⁴ —
    * exact through ~10⁶ users per arm, far past any experiment where
    * a z-test verdict is in doubt; beyond that the product overflows
    * to NULL (never a silently wrong verdict). */
  def twoProportionZTest(df: DataFrame, armCol: String, armA: String,
                         armB: String, convCol: String,
                         zSqE4: Long = 38416L): DataFrame = {
    def n(arm: String) = sum(when(col(armCol) === arm, 1L).otherwise(0L))
    def c(arm: String) =
      sum(when(col(armCol) === arm && col(convCol), 1L).otherwise(0L))
    val s = df.agg(
      n(armA).cast(D).as("__na"), n(armB).cast(D).as("__nb"),
      c(armA).cast(D).as("__ca"), c(armB).cast(D).as("__cb"))
    val bigN = col("__na") + col("__nb")
    val bigC = col("__ca") + col("__cb")
    val diff = col("__ca") * col("__nb") - col("__cb") * col("__na")
    s.select(
      col("__na").cast("long").as("n_a"), col("__nb").cast("long").as("n_b"),
      col("__ca").cast("long").as("conv_a"), col("__cb").cast("long").as("conv_b"),
      round(col("__ca").cast("double") / col("__na").cast("double"), 6).as("rate_a"),
      round(col("__cb").cast("double") / col("__nb").cast("double"), 6).as("rate_b"),
      (diff * diff * bigN * 10000L >
        lit(zSqE4).cast(D) * col("__na") * col("__nb") * bigC * (bigN - bigC))
        .as("significant"))
  }

  /** Winsorization: clamp `valCol` (an integer-scaled measure) to its
    * per-group [pLoPct, pHiPct] exact order-statistic band — the
    * standard robust-mean preprocessing (outliers pulled to the fence,
    * not dropped). Cut ranks are computed in INTEGER arithmetic:
    * rank = max(1, ⌈n·p/100⌉) = (n·p + 99) div 100 — a float
    * ceil(0.05·n) crosses the wrong side of an integer for some n on
    * some engines; integers never do. The fence VALUE at a rank is
    * well-defined under ties (the sorted multiset's k-th element), so
    * row_number's arbitrary tie order cannot leak into the result.
    *
    * Scale shape: one window pass per group for ranks (single shuffle
    * on the group key), the two fences reduce to a GROUPS-sized
    * relation broadcast back — the raw relation is never joined to
    * itself or sorted twice. */
  def winsorizeByGroup(df: DataFrame, keys: Seq[String], valCol: String,
                       pLoPct: Int = 5, pHiPct: Int = 95): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
    val rankLo = greatest(lit(1L), expr(s"(__n * $pLoPct + 99) DIV 100"))
    val rankHi = greatest(lit(1L), expr(s"(__n * $pHiPct + 99) DIV 100"))
    val fences = ranked
      .select(keys.map(col) :+ col(valCol) :+
        when(col("__rn") === rankLo, col(valCol)).as("__atLo") :+
        when(col("__rn") === rankHi, col(valCol)).as("__atHi"): _*)
      .groupBy(keys.map(col): _*)
      .agg(min("__atLo").as("__lo"), min("__atHi").as("__hi"))
    df.join(broadcast(fences), keys)
      .withColumn(s"${valCol}_winsorized",
        least(greatest(col(valCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Benford first-significant-digit audit: observed digit shares of a
    * positive measure against Benford's log10(1 + 1/d) expectation —
    * the classic fabricated-data / broken-generator tell (organic
    * multiplicative quantities follow it; uniform or hand-typed ones
    * don't). All nine digits are materialized (a digit with ZERO
    * observations is the loudest signal). Shares are integer ppm; the
    * expected constants arrive as caller-side literals so no
    * engine-side log is ever evaluated.
    *
    * The measure must be INTEGER-scaled (cents — graft.queries.cents):
    * rows below 1 are excluded outright, because the string head of
    * "0.37" is '0', which would inflate the total while appearing in
    * no digit row — a silently deflated audit. Scale fractions up
    * before calling.
    *
    * Scale shape: first digit is a string head on the integer value —
    * a pure projection — then one 9-row hash aggregate. */
  def benfordReport(df: DataFrame, valCol: String): DataFrame = {
    val expPpm = (1 to 9).map(d =>
      d -> math.round(math.log10(1.0 + 1.0 / d) * 1000000L))
    val obs = df.filter(col(valCol) >= 1)
      .select(substring(col(valCol).cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val spine = obs.sparkSession.range(1, 10).select(col("id").as("digit"))
      .join(obs, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    val total = obs.agg(sum(col("n_obs")).as("__total"))
    val expCol = expPpm.foldLeft(lit(null).cast("long")) {
      case (acc, (d, ppm)) => when(col("digit") === d, lit(ppm)).otherwise(acc)
    }
    spine.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        expr("n_obs * 1000000L DIV __total").as("obs_ppm"),
        expCol.as("exp_ppm"))
  }

  /** Population stability index between a reference and a current
    * sample of one measure — the standard model-monitoring drift
    * score (PSI < 0.1 stable, > 0.25 alarm):
    *   PSI = Σ_bins (pᵢ − qᵢ)·ln(pᵢ/qᵢ)
    * Bins are the REFERENCE's equi-width layout (current values
    * outside the reference range clamp into the edge bins — new mass
    * beyond the old support is exactly what must register as drift);
    * add-one smoothing keeps empty bins finite. Counts are exact
    * longs; each bin's term is one pinned-order float chain rounded to
    * 9 decimals and fixed as a decimal — engine-portable like the rest
    * of this module. Returns one row per bin with both counts and the
    * PSI term; the total is the exact decimal sum of the terms.
    *
    * Scale shape: one min/max aggregate on the reference (broadcast
    * 1-row), one binning projection + hash aggregate per side over the
    * nBins spine — neither side is ever joined to the other's rows. */
  def psiDrift(reference: DataFrame, current: DataFrame, valCol: String,
               nBins: Int = 10): DataFrame = {
    val mm = reference.agg(min(col(valCol)).cast("long").as("__lo"),
      max(col(valCol)).cast("long").as("__hi"))
    def binned(df: DataFrame, out: String) = df.crossJoin(broadcast(mm))
      .select(expr(
        s"least(${nBins - 1}L, greatest(0L, ($valCol - __lo) DIV " +
          s"greatest(1L, (__hi - __lo + $nBins) DIV $nBins)))").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    // row-free spine: deriving it from mm would re-scan the whole
    // reference a third time just to produce 0..nBins-1 (the two
    // broadcast(mm) copies dedup via exchange reuse; a third non-
    // broadcast copy does not)
    val spine = reference.sparkSession.range(0, nBins).select(col("id").as("bin"))
    val both = spine
      .join(binned(reference, "n_ref"), Seq("bin"), "left")
      .join(binned(current, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = both.agg(sum("n_ref").as("__tr"), sum("n_cur").as("__tc"))
    val p = (col("n_ref") + 1).cast("double") / (col("__tr") + nBins).cast("double")
    val q = (col("n_cur") + 1).cast("double") / (col("__tc") + nBins).cast("double")
    both.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((p - q) * log(p / q), 9).cast(DecimalType(18, 9)).as("psi_term"))
  }

  /** Robust outlier detection by median absolute deviation: flag rows
    * where |v − median| > k·MAD per group — the estimator that survives
    * the outliers it hunts (a z-score's mean/stddev are dragged by the
    * very points under test; winsorizeByGroup is the repair, this is
    * the detector). Medians are the LOWER order statistic at rank
    * ⌈n/2⌉ = (n+1) div 2 — pure integers, no midpoint averaging, so
    * the verdict |v − med| > k·mad compares exact longs and is
    * engine-portable bit-for-bit.
    *
    * Scale shape: two window passes on the group key (value rank, then
    * absolute-deviation rank) — same single-shuffle-per-pass contract
    * as winsorizeByGroup; the median/MAD relations reduce to one row
    * per group and broadcast back. */
  def madOutliers(df: DataFrame, keys: Seq[String], valCol: String,
                  k: Int = 3): DataFrame = {
    def medianOf(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col(c))
      in.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
        .filter(col("__rn") === expr("(__n + 1) DIV 2"))
        .select(keys.map(col) :+ col(c).as(out): _*)
    }
    val med = medianOf(df, valCol, "median")
    // persisted: consumed twice inside the one returned plan (the MAD
    // median pass and the final verdict join) — without it the raw
    // relation re-scans and re-joins per consumer. Released by session
    // cache hygiene (clearCache between operators, as Verify/Bench do).
    val withMed = df.join(broadcast(med), keys)
      .withColumn("__absdev", abs(col(valCol) - col("median")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = medianOf(withMed, "__absdev", "mad")
    withMed.join(broadcast(mad), keys)
      .withColumn("is_outlier", col("__absdev") > col("mad") * k)
      .drop("__absdev")
  }

  /** Equal-width histogram over an integer-scaled measure, with EMPTY
    * bins materialized (a chart or drift monitor needs the zero bars;
    * a bare GROUP BY silently omits them). Width is the integer
    * ⌈range/nBins⌉, so bin = (v − min) div width is pure integer
    * arithmetic end to end.
    *
    * Scale shape: one aggregate for min/max (broadcast 1-row), one
    * generator for the nBins spine, one hash aggregate for counts —
    * the measure column is scanned twice (bounds, then binning);
    * callers with a pre-known range can skip the first by filtering.
    * Degenerate all-equal input lands in bin 0 with width 1. */
  def equiWidthHistogram(df: DataFrame, valCol: String, nBins: Int = 10): DataFrame = {
    val mm = df.agg(min(col(valCol)).cast("long").as("__lo"),
      max(col(valCol)).cast("long").as("__hi"))
    val width = expr(s"greatest(1L, (__hi - __lo + $nBins) DIV $nBins)")
    val counts = df.crossJoin(broadcast(mm))
      .select(expr(s"(${valCol} - __lo) DIV greatest(1L, (__hi - __lo + $nBins) DIV $nBins)")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    mm.select(explode(expr(s"sequence(0L, ${nBins - 1}L)")).as("bin"),
        col("__lo"), width.as("__w"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (col("__lo") + col("bin") * col("__w")).as("bin_lo"),
        (col("__lo") + (col("bin") + 1) * col("__w") - 1).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Top-N categories with the tail collapsed to one OTHER bucket —
    * the reporting shape behind every "top products, rest lumped"
    * chart, made deterministic: winners are the N largest counts with
    * ties broken by the smallest value. One hash aggregate over the
    * data; the winner cut plans as TakeOrderedAndProject (map-side
    * partial top-N over the distinct-values relation — a global
    * row_number window would drag every distinct value through ONE
    * task, the single-partition shape rankBuckets exists to avoid) and
    * the tail mass comes from an anti-join aggregate, so totals
    * reconcile (a bare LIMIT N silently drops it). An empty tail emits
    * no OTHER row. Pick `otherLabel` outside the value domain — a real
    * category with the same label would surface as a second,
    * separate row (never silently merged). */
  def topNWithOther(df: DataFrame, valCol: String, n: Int,
                    otherLabel: String = "OTHER"): DataFrame = {
    val counts = df.groupBy(col(valCol).cast("string").as("value"))
      .agg(count(lit(1)).as("n_rows"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val winners = counts.orderBy(col("n_rows").desc, col("value").asc).limit(n)
    val tail = counts
      .join(broadcast(winners.select("value")), Seq("value"), "left_anti")
      .agg(coalesce(sum("n_rows"), lit(0L)).as("n_rows"))
      .select(lit(otherLabel).as("value"), col("n_rows"))
      .filter(col("n_rows") > 0)
    winners.unionByName(tail)
  }

  /** Most frequent value of `valCol` per group, ties broken by the
    * SMALLEST value so the answer is deterministic (Spark's `mode` and
    * DuckDB's pick an arbitrary winner on ties — useless for a
    * hash-compared pipeline). Two aggregates: the raw relation reduces
    * to (group, value) counts with map-side partials first, so the
    * row_number window only ever sorts the distinct-value relation,
    * never the data. */
  def modeByGroup(df: DataFrame, keys: Seq[String], valCol: String): DataFrame = {
    val counts = df.groupBy(keys.map(col) :+ col(valCol): _*)
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("n_rows").desc, col(valCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(keys.map(col) :+ col(valCol).as("mode_value") :+ col("n_rows"): _*)
  }

  /** Exact weighted median per group: the smallest value whose
    * cumulative weight reaches half the group's total (2*cum >= total
    * — pure integer, no halving division). Unlike percentile_cont this
    * weights each row, the natural form for pre-aggregated data
    * (value, count) or quantity-weighted prices.
    *
    * Determinism with ties: the cumulative sum's default frame with an
    * ORDER BY is RANGE UNBOUNDED PRECEDING..CURRENT ROW — on BOTH
    * Spark and ANSI engines — so tied values share one cumulative
    * weight and the answer never depends on tie order.
    *
    * Scale shape: one shuffle + per-group sort carrying both windows
    * (same partition key), then a group-sized min aggregate. Weights
    * and values must be integral (cents) for cross-engine hashes. */
  def weightedMedian(df: DataFrame, keys: Seq[String], valCol: String,
                     weightCol: String): DataFrame = {
    val byVal = Window.partitionBy(keys.map(col): _*).orderBy(col(valCol))
    val whole = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__cum", sum(col(weightCol)).over(byVal))
      .withColumn("__total", sum(col(weightCol)).over(whole))
      .filter(col("__cum") * 2 >= col("__total"))
      .groupBy(keys.map(col): _*)
      .agg(min(col(valCol)).as("weighted_median"))
  }

  /** Exact weighted quantiles, several at once: for each (num, den,
    * label), the smallest value whose cumulative weight reaches
    * num/den of the group total. ONE cumulative window pass + ONE
    * aggregate serves every requested quantile (a conditional min per
    * label) — not a pass per quantile. Small rational thresholds keep
    * every product tiny (cum·den), so there is no fixed-point scale to
    * overflow. Same tie semantics as weightedMedian (RANGE frame). */
  def weightedQuantiles(df: DataFrame, keys: Seq[String], valCol: String,
                        weightCol: String,
                        quantiles: Seq[(Int, Int, String)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    val byVal = Window.partitionBy(keys.map(col): _*).orderBy(col(valCol))
    val whole = Window.partitionBy(keys.map(col): _*)
    val cum = df.withColumn("__cum", sum(col(weightCol)).over(byVal))
      .withColumn("__total", sum(col(weightCol)).over(whole))
    val aggs = quantiles.map { case (num, den, label) =>
      min(when(col("__cum") * den >= col("__total") * num, col(valCol))).as(label)
    }
    cum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Sample autocorrelation function of an already-aggregated series —
    * one row per lag 1..maxLag with the standard biased estimator
    *   acf_k = Σ_{t≤n−k} d_t·d_{t+k} / Σ_t d_t²,  d_t = x_t − mean.
    * The mean never materializes as a rational: with D_t = n·x_t − Σx,
    * d_t = D_t/n and the n² factors cancel, so both sums are EXACT
    * integer (DECIMAL(38,0)) sums of products and acf_e6 is a single
    * truncating division of two exact operands — bit-identical on any
    * engine and partitioning. Negative numerators truncate toward zero
    * explicitly (engines disagree on the sign convention of integral
    * division, so the abs/negate form is spelled out). A constant
    * series has zero denominator: acf_e6 is NULL (guarded — ANSI mode
    * would otherwise raise on the division).
    *
    * Headroom: |D_t| ≤ n·max|x|, so Σ D² ≤ n³·max|x|² and the e6
    * numerator needs n³·max|x|²·1e6 < 1e38 — comfortable for daily
    * series of money-scale integers (n=1e4, x=1e12 → 1e34).
    *
    * Input contract: one row per t (pre-aggregate first). Scale shape:
    * the series is the SMALL relation a 100 TB fact collapses to (one
    * row per day/hour), so the single-partition window over it is a
    * deliberate post-reduction step, not a fact-sized sort; all
    * maxLag leads ride ONE window pass, and the final aggregate is
    * one row. */
  def autocorrelation(series: DataFrame, tCol: String, xCol: String,
                      maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val tot = series.agg(count(lit(1)).cast(D).as("__n"),
      sum(col(xCol).cast(D)).as("__s"))
    val w = Window.orderBy(col(tCol))
    val dev = series.crossJoin(broadcast(tot))
      .withColumn("__d", col("__n") * col(xCol).cast(D) - col("__s"))
    val leads = (1 to maxLag).foldLeft(dev) { (df, k) =>
      df.withColumn(s"__d$k", lead(col("__d"), k).over(w))
    }
    val aggs = sum(col("__d") * col("__d")).as("__den") +:
      (1 to maxLag).flatMap { k => Seq(
        sum(col("__d") * col(s"__d$k")).as(s"__num$k"),
        count(col(s"__d$k")).as(s"__np$k")) }
    val sums = leads.agg(aggs.head, aggs.tail: _*)
    val stackArgs = (1 to maxLag)
      .map(k => s"${k}L, __np$k, __num$k").mkString(", ")
    sums.selectExpr(s"stack($maxLag, $stackArgs) AS (lag, n_pairs, __num)",
        "__den")
      .selectExpr("lag", "n_pairs",
        """CAST(CASE WHEN __den = 0 THEN NULL
                     WHEN __num < 0
                     THEN -((-__num) * 1000000 DIV __den)
                     ELSE (__num * 1000000) DIV __den END AS BIGINT)
           AS acf_e6""")
  }

  /** CUSUM changepoint detection on an already-aggregated series: the
    * first t where the running cumulative deviation from the global
    * mean peaks in absolute value — the classic level-shift locator
    * (a series that jumps from level A to level B peaks exactly at the
    * shift). Multiply-through arithmetic again: the deviation sum
    *   S_t = Σ_{i≤t} x_i − t·mean   is carried as  n·cum_t − t_idx·Σx
    * (n-scaled, exact integers), so peak and argmax are engine-exact.
    * Output: ONE row (changepoint t, rows before the peak, the
    * n-scaled absolute peak, direction 'up' if the series runs below
    * the mean first — i.e. the level steps UP at the changepoint).
    *
    * Caller must keep n·Σ|x| inside i64 (pre-scale x down — dollars,
    * not cents, for long daily series). Same post-reduction contract
    * as autocorrelation: the series is the day-sized relation, the
    * single-partition window is deliberate. */
  def cusumChangepoint(series: DataFrame, tCol: String, xCol: String): DataFrame = {
    val tot = series.agg(count(lit(1)).as("__n"), sum(col(xCol)).as("__s"))
    val w = Window.orderBy(col(tCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = series.crossJoin(broadcast(tot))
      .withColumn("__cum", sum(col(xCol)).over(w))
      .withColumn("__idx", count(lit(1)).over(w))
      .withColumn("__dev", col("__n") * col("__cum") - col("__idx") * col("__s"))
      .withColumn("__adev", abs(col("__dev")))
    val peak = dev.agg(max(col("__adev")).as("__peak"))
    dev.join(broadcast(peak), col("__adev") === col("__peak"))
      .groupBy(col("__peak"))
      .agg(min(struct(col(tCol), col("__idx"), col("__dev"))).as("__first"))
      .select(col("__first").getField(tCol).as("changepoint"),
        col("__first.__idx").as("n_before"),
        col("__peak").as("peak_dev_nscaled"),
        when(col("__first.__dev") < 0, "up").otherwise("down").as("direction"))
  }

  /** Theil–Sen slope on an already-aggregated series: the median of
    * all pairwise slopes (x_j − x_i)/(t_j − t_i), i < j — the robust
    * companion to [[mannKendall]] (MK says WHETHER a monotone trend
    * exists; Theil–Sen says HOW STEEP, immune to outliers where OLS
    * is not). Each slope is ONE IEEE division of two exact integers
    * (correctly rounded → engine-identical); the median is Spark's
    * exact `percentile`, which interpolates at idx = p·(n−1) exactly
    * like DuckDB's `quantile_cont` (verified bit-equal). Output: one
    * row (n_pairs, slope rounded to 6 decimals).
    *
    * Same post-reduction contract as [[mannKendall]]: the O(n²) pair
    * join runs on the day-sized relation a 100 TB fact collapses to,
    * never on the fact itself. */
  def theilSen(series: DataFrame, dayCol: String, xCol: String): DataFrame = {
    val a = series.select(col(dayCol).as("__d1"), col(xCol).as("__x1"))
    val b = series.select(col(dayCol).as("__d2"), col(xCol).as("__x2"))
    a.join(b, col("__d1") < col("__d2"))
      .select(((col("__x2") - col("__x1")).cast("double")
        / datediff(col("__d2"), col("__d1")).cast("double")).as("__slope"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(__slope, 0.5)"), 6).as("slope"))
  }

  /** KMV (k-minimum-values) distinct-count sketch, md5-keyed so the
    * estimate is DETERMINISTIC and cross-engine reproducible — unlike
    * HLL (q26, engine-seeded, rows-only checkable) this sketch is
    * DuckDB-oracle-able bit-for-bit. Per group: hash each value to a
    * 60-bit integer h = md5-prefix, keep the k smallest DISTINCT
    * hashes; if fewer than k exist the group's distinct count is
    * exact (= m); else estimate = (k−1)·2^60 / h_(k) — the classic
    * KMV estimator with θ = h_(k)/2^60. (k−1)·2^60 has ≤ 8+60
    * significant bits but only ~8 after the trailing zeros, so the
    * double product is EXACT; the one division is correctly rounded.
    *
    * Scale shape: one distinct-aggregate shuffle on (group, h), then
    * a rank-k filter that Spark plans as WindowGroupLimit — map-side
    * top-k per partition BEFORE the exchange (the q88 stratifiedHead
    * shape), so only ≤ k·partitions rows shuffle in phase two. This
    * is the mergeable-sketch layout: per-partition k-smallest sets
    * union and re-truncate losslessly. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val h = expr(
      s"CAST(conv(substring(md5(concat('kmv1', CAST($valueCol AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    val hashed = df.select(col(groupCol), h.as("__h")).distinct()
    val rn = row_number().over(
      Window.partitionBy(groupCol).orderBy(col("__h")))
    hashed.withColumn("__rn", rn).filter(col("__rn") <= k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("__m"), max(col("__h")).as("__kth"))
      .select(col(groupCol),
        when(col("__m") < k, col("__m").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(1152921504606846976L).cast("double")
              / col("__kth").cast("double"), 4))
          .as("distinct_est"))
  }

  /** Linear-interpolation gap fill of a daily series onto its full
    * calendar: missing days get prev + (next−prev)·(d−d_prev)/(d_next
    * −d_prev); leading/trailing gaps take the nearest present value.
    * The numerator product is exact integer arithmetic, the division
    * is the single IEEE op, the final add is correctly rounded —
    * engine-identical, rounded to 6 decimals. Present days pass
    * through exactly. Output: (day, x_filled, was_present).
    *
    * Post-rollup contract: the calendar spine is day-sized (one
    * `sequence` explode off a 1-row min/max aggregate — thousands of
    * rows from a 100 TB fact), so the unpartitioned fill windows are
    * deliberate: this is driver-adjacent smoothing AFTER the one real
    * shuffle, not a fact-sized window. */
  def interpolateDaily(series: DataFrame, dayCol: String,
                       xCol: String): DataFrame = {
    val s = series.select(col(dayCol).as("day"), col(xCol).as("__x"))
    val cal = s.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    val w = Window.orderBy(col("day"))
    val prevX = last(col("__x"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    val prevD = last(when(col("__x").isNotNull, col("day")), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    val nextX = first(col("__x"), ignoreNulls = true)
      .over(w.rowsBetween(0, Window.unboundedFollowing))
    val nextD = first(when(col("__x").isNotNull, col("day")), ignoreNulls = true)
      .over(w.rowsBetween(0, Window.unboundedFollowing))
    cal.join(s, Seq("day"), "left")
      .select(col("day"), col("__x"),
        prevX.as("__px"), prevD.as("__pd"),
        nextX.as("__nx"), nextD.as("__nd"))
      .select(col("day"),
        round(
          when(col("__x").isNotNull, col("__x").cast("double"))
            .when(col("__px").isNull, col("__nx").cast("double"))
            .when(col("__nx").isNull, col("__px").cast("double"))
            .otherwise(col("__px").cast("double")
              + ((col("__nx") - col("__px"))
                   * datediff(col("day"), col("__pd"))).cast("double")
                / datediff(col("__nd"), col("__pd")).cast("double")),
          6).as("x_filled"),
        col("__x").isNotNull.as("was_present"))
  }

  /** Floor-clamped running balance — B_t = max(0, B_{t−1} + d_t), the
    * inventory/reservoir recurrence that looks inherently sequential —
    * made windowable by the closed form
    *   B_t = P_t − min(0, min_{j≤t} P_j)
    * (P = plain prefix sum): clamping at zero only ever SUBTRACTS the
    * deepest deficit seen so far, so a running min of the prefix sum
    * replays every clamp at once. Two window passes over ONE exchange
    * (same frame, same sort), exact integer arithmetic throughout.
    *
    * `ordCols` must totally order each partition (pass tie-breaker
    * columns) or prefix sums are nondeterministic.
    *
    * Output: one row per group — final_balance, peak_balance, and
    * floor_hits (rows that land exactly on the clamp floor). */
  def clampedRunningSum(df: DataFrame, partCol: String,
                        ordCols: Seq[String], deltaCol: String): DataFrame = {
    val w = Window.partitionBy(partCol)
      .orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val p = sum(col(deltaCol)).over(w)
    val b = p - least(lit(0L), min(p).over(w))
    df.select(col(partCol), b.as("__b"),
      struct(ordCols.map(col): _*).as("__ord"))
      .groupBy(partCol)
      .agg(expr("max_by(__b, __ord)").as("final_balance"),
        max(col("__b")).as("peak_balance"),
        count(when(col("__b") === 0, lit(1))).as("floor_hits"))
  }

  /** Mann-Kendall trend test on an already-aggregated series:
    *   S = Σ_{i<j} sign(x_j − x_i)      (exact integer)
    *   var·18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)   (exact integer)
    *   z = (S ∓ 1) / sqrt(var18/18)     (3 IEEE ops, each correctly
    *                                     rounded → engine-identical)
    * — the standard nonparametric monotonic-trend detector. All-tied
    * or tiny series have var18 = 0: z is NULL (guarded).
    *
    * Output: ONE row (n, s_stat, var18, z rounded to 6 decimals).
    *
    * Same post-reduction contract as autocorrelation: the series is
    * the day-sized relation a 100 TB fact collapses to, so the O(n²)
    * sign-pair join (a broadcast nested loop over the tiny series) is
    * a deliberate post-rollup step — n=10⁴ days is 5·10⁷ cheap sign
    * comparisons, and nothing fact-sized ever joins itself. */
  def mannKendall(series: DataFrame, tCol: String, xCol: String): DataFrame = {
    val s1 = series.select(col(tCol).as("__t1"), col(xCol).as("__x1"))
    val s2 = series.select(col(tCol).as("__t2"), col(xCol).as("__x2"))
    val sStat = s1.join(s2, col("__t1") < col("__t2"))
      .agg(coalesce(sum(
        when(col("__x2") > col("__x1"), 1L)
          .when(col("__x2") < col("__x1"), -1L).otherwise(0L)), lit(0L))
        .as("s_stat"))
    val nRow = series.agg(count(lit(1)).as("n"))
    val ties = series.groupBy(col(xCol)).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(expr("__c * (__c - 1) * (2 * __c + 5)")), lit(0L))
        .as("__tsum"))
    nRow.crossJoin(sStat).crossJoin(ties)
      .withColumn("var18", expr("n * (n - 1) * (2 * n + 5)") - col("__tsum"))
      .select(col("n"), col("s_stat"), col("var18"),
        when(col("var18") > 0, round(
            when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
              .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
              .otherwise(0.0)
              / sqrt(col("var18").cast("double") / 18.0), 6))
          .as("z"))
  }

  /** Reliability (calibration) diagram in exact integers: rows bucketed
    * by an e6-scaled score into `nBins` equal-width bins, each bin
    * reporting its size, positive count, and empirical positive rate —
    * the model-eval primitive that says whether "0.9 confidence" means
    * 90% correct. bin = min(nBins−1, score·nBins div 10⁶), so the
    * score-=1e6 edge folds into the top bin and every boundary is
    * integer-exact (a float bin edge can flip rows across engines).
    * Bins with no rows are absent (reported rates would be 0/0).
    *
    * Scale shape: one projection + one nBins-sized hash aggregate with
    * map-side partials; nothing sorts, nothing is row-keyed. */
  def calibrationBins(df: DataFrame, scoreE6Col: String, labelCol: String,
                      nBins: Int = 10): DataFrame =
    df.select(
        least(lit(nBins - 1L),
          expr(s"$scoreE6Col * $nBins DIV 1000000")).as("bin"),
        col(labelCol).cast("boolean").as("__pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate_e6", expr("n_pos * 1000000L DIV n"))

  /** Exact ROC AUC by rank statistics (Mann–Whitney U): the
    * probability that a random positive outscores a random negative,
    * ties at half credit. Doubled-U integers keep ties exact:
    *   2U = Σ_scores (2·n_pos(s)·n_neg_below(s) + n_pos(s)·n_neg(s)),
    * auc_e6 = 2U·10⁶ div (2·P·N). Every operand is an exact integer —
    * no rank averaging in floats, no sort of the row relation, and the
    * same number on any engine, partitioning, or retry.
    *
    * Scale shape: one hash aggregate to the DISTINCT-SCORE relation —
    * bounded by score resolution (≤ 10⁶+1 rows for an e6 score, a
    * hard cap independent of corpus size), NOT by rows — then the
    * distributed exclusive prefix sum (Curation.exclusivePrefixSum,
    * never a single-task global window) for n_neg_below, and one
    * 1-row aggregate. The row relation is touched exactly once. */
  def rankAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    // NULL labels are EXCLUDED, not counted as negatives: an unlabeled
    // row is missing data (and a NULL-producing predicate like
    // `lang = 'en'` on NULL lang must match the oracle's FILTER
    // semantics, which drop the row from both counts)
    val byScore = df
      .select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__pos"))
      .filter(col("__pos").isNotNull)
      .groupBy("__s")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__np"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__nn"))
    graft.analytics.Curation
      .exclusivePrefixSum(byScore, "__s", "__nn", "__cnb")
      .agg(sum(expr("2L * __np * __cnb + __np * __nn")).as("two_u"),
        sum(col("__np")).as("n_pos"), sum(col("__nn")).as("n_neg"))
      .withColumn("auc_e6",
        expr("two_u * 1000000L DIV (2L * n_pos * n_neg)"))
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic, each group against
    * the pooled complement ("did this source drift from the rest?").
    * Returns per group: `d_num` = max_v |F_g(v)·n_rest − F_rest(v)·n_g|
    * (the KS distance is d_num / (n_g·n_rest)), plus both sample sizes.
    * Everything stays in cross-multiplied BIGINT counts — no CDF is
    * ever a float, so the max is engine-exact. Valid while
    * n_g·n_rest < 2^63 (~3e9 rows per side).
    *
    * Shape: one aggregate to per-(group, value) counts, a
    * (groups × distinct-values) grid so each group's step CDF is
    * forward-filled at EVERY global jump point (the max can sit where
    * only the complement's CDF jumps), and the distributed two-pass
    * prefix scans of [[graft.analytics.Curation]] for both cumsums —
    * no single-partition window anywhere. Grid cost is
    * |groups|·|distinct values|; quantize the value first if its
    * cardinality is unbounded. */
  def ksPerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val gv = df.select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val pts = gv.groupBy("__v").agg(count(lit(1)).as("__m"))
    val groups = gv.select("__g").distinct()
    val grid = groups.crossJoin(pts.select("__v"))
      .join(gv.groupBy("__g", "__v").agg(count(lit(1)).as("__c")),
        Seq("__g", "__v"), "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val fg = graft.analytics.Curation
      .exclusivePrefixSumBy(grid, "__g", "__v", "__c", "__fb")
      .withColumn("__f", col("__fb") + col("__c"))
    val fAll = graft.analytics.Curation
      .exclusivePrefixSum(pts, "__v", "__m", "__cb")
      .withColumn("__ftot", col("__cb") + col("__m"))
      .select("__v", "__ftot")
    val sizes = gv.groupBy("__g").agg(count(lit(1)).as("n_g"))
    val total = gv.agg(count(lit(1)).as("__N"))
    fg.join(fAll, Seq("__v"))
      .join(broadcast(sizes), Seq("__g"))
      .crossJoin(broadcast(total))
      .groupBy(col("__g").as(groupCol), col("n_g"),
        (col("__N") - col("n_g")).as("n_rest"))
      .agg(max(abs(col("__f") * (col("__N") - col("n_g"))
        - (col("__ftot") - col("__f")) * col("n_g"))).as("d_num"))
      .select(groupCol, "d_num", "n_g", "n_rest")
  }

  /** Exact Mann-Whitney U (rank-sum) statistic, each group against the
    * pooled complement. Ties get the standard average rank, kept exact
    * by doubling: ranks at value v span (C_before, C_before + m], so
    * 2·avgrank = 2·C_before + m + 1 is an integer. Returns per group
    * `u_x2` = 2·U_g = 2·R_g − n_g·(n_g+1), plus both sample sizes
    * (2·U is always integral; U itself may end in .5 under ties).
    * Same overflow bound as [[ksPerGroup]].
    *
    * Cheaper than KS: no grid — each group only needs its OWN value
    * rows joined to the global exclusive-cumsum relation, so the cost
    * is one aggregate + one distributed prefix scan + one equi join. */
  def mannWhitneyPerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val gv = df.select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val pts = gv.groupBy("__v").agg(count(lit(1)).as("__m"))
    val cum = graft.analytics.Curation
      .exclusivePrefixSum(pts, "__v", "__m", "__cb")
    val total = gv.agg(count(lit(1)).as("__N"))
    gv.groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
      .join(cum, Seq("__v"))
      .groupBy(col("__g").as(groupCol))
      .agg(sum(col("__c") * (lit(2L) * col("__cb") + col("__m") + 1L)).as("__r2"),
        sum(col("__c")).as("n_g"))
      .crossJoin(broadcast(total))
      .select(col(groupCol),
        (col("__r2") - col("n_g") * (col("n_g") + 1L)).as("u_x2"),
        col("n_g"), (col("__N") - col("n_g")).as("n_rest"))
  }

  /** Per-group Wilson 95% score interval for a binary success rate —
    * the interval that stays inside [0,1] and degrades gracefully at
    * small n where the Wald interval collapses. Computed from the
    * exact integer (successes, trials) pair per group; the closed form
    *   (p̂ + z²/2n ± z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n),  z = 1.96
    * is evaluated in doubles with the SAME expression tree on any
    * engine — +, −, ×, ÷, √ are each IEEE-exactly rounded, so exact
    * integer inputs and an identical shape give bit-identical doubles
    * (this module's divide/sqrt-last discipline) — then floored to e6
    * units.
    *
    * Scale shape: ONE hash aggregate with map-side partials; the
    * interval math runs on the GROUPS-sized relation only. */
  def wilsonIntervals(df: DataFrame, groupCol: String,
                      successCol: Column): DataFrame = {
    def bound(sign: String) = expr(
      s"""CAST(floor(1000000 * (
            (successes/n + (1.96*1.96)/(2*n)
             $sign 1.96*sqrt(((successes/n)*(1-successes/n) + (1.96*1.96)/(4*n))/n))
            / (1 + (1.96*1.96)/n)) + 0.5) AS BIGINT)""")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(successCol, 1L).otherwise(0L)).as("successes"))
      .select(col(groupCol), col("n"), col("successes"),
        bound("-").as("wilson_lo_e6"), bound("+").as("wilson_hi_e6"))
  }

  /** Leave-one-group-out jackknife standard error of a ratio-of-sums
    * metric θ = Σnum / Σden — the estimator behind "revenue per event"
    * style KPIs, where per-ROW resampling is wrong because rows within
    * a group (user, session) are correlated; the group is the
    * resampling unit. Exact pipeline: per-group integer sums
    * (s_i, n_i) → leave-one-out replicates θ₍ᵢ₎ floored to integer e6
    * units by integer division → integer deviations from the integer
    * mean of replicates → Σd² accumulated in DECIMAL(38,0) (exact in
    * any order) → ONE final double sqrt for SE = √((g−1)/g · Σd²).
    * Every cross-engine comparison point is an integer or a single
    * exactly-rounded double op. Requires ≥ 2 groups.
    *
    * Scale shape: one hash aggregate over the raw relation (the only
    * full pass); everything downstream is GROUPS-sized, with the 1-row
    * totals riding broadcasts. */
  def jackknifeRatio(df: DataFrame, groupCol: String,
                     numCol: Column, denCol: Column): DataFrame = {
    val per = df.groupBy(col(groupCol).as("__g"))
      .agg(sum(numCol).as("__s"), sum(denCol).as("__n"))
    val tot = per.agg(sum("__s").as("__ts"), sum("__n").as("__tn"),
      count(lit(1)).as("g"))
    val reps = per.crossJoin(broadcast(tot))
      .select(col("g"), col("__ts"), col("__tn"),
        expr("(__ts - __s) * 1000000L DIV (__tn - __n)").as("__t"))
    val tbar = reps.agg(expr("sum(__t) DIV count(*)").as("__tbar"))
    reps.crossJoin(broadcast(tbar))
      .select(col("g"), col("__ts"), col("__tn"),
        (col("__t") - col("__tbar")).as("__d"))
      .groupBy("g", "__ts", "__tn")
      .agg(sum(expr("CAST(__d AS DECIMAL(19,0)) * CAST(__d AS DECIMAL(19,0))"))
        .as("__ss"))
      .select(expr("__ts * 1000000L DIV __tn").as("theta_e6"),
        col("g").as("n_groups"),
        expr("CAST(floor(sqrt(CAST(__ss AS DOUBLE) * (g - 1) / g) + 0.5) AS BIGINT)")
          .as("jk_se_e6"))
  }

  /** Cohen's kappa — chance-corrected agreement between two label
    * columns (annotator vs annotator, or model vs gold): with diag =
    * Σ_k n_kk and pe_num = Σ_k row_k·col_k,
    *   κ = (N·diag − pe_num) / (N² − pe_num)
    * — both operands formed EXACTLY in DECIMAL(38,0) (headroom past
    * 10⁹-row corpora where N² overflows Long), one final double
    * division, e6-floored (floor of an identical double is sign-safe
    * where integer DIV truncation is not — κ can be negative). Rows
    * with a NULL on either side are excluded. A degenerate table
    * (N² = pe_num, e.g. constant labels) yields NULL κ.
    *
    * Scale shape: one hash aggregate to the LABELS²-sized confusion
    * relation; margins and sums are labels-sized. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cm = df.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
    val rows = cm.groupBy(col("__a").as("__l")).agg(sum("__c").as("__ra"))
    val colsM = cm.groupBy(col("__b").as("__l")).agg(sum("__c").as("__cb"))
    val pe = rows.join(colsM, Seq("__l"))
      .agg(coalesce(sum(expr(
        "CAST(__ra AS DECIMAL(19,0)) * CAST(__cb AS DECIMAL(19,0))")),
        lit(0L).cast(D)).as("__pe"))
    cm.agg(sum("__c").as("__n"),
        sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
          .as("__agree"))
      .crossJoin(broadcast(pe))
      .select(col("__n").as("n_items"), col("__agree").as("n_agree"),
        expr("__agree * 1000000L DIV __n").as("po_e6"),
        expr("""CASE WHEN CAST(__n AS DECIMAL(19,0)) * CAST(__n AS DECIMAL(19,0)) - __pe = 0
                     THEN NULL
                     ELSE CAST(floor(1000000 * (
                       CAST(CAST(__n AS DECIMAL(19,0)) * CAST(__agree AS DECIMAL(19,0)) - __pe AS DOUBLE)
                       / CAST(CAST(__n AS DECIMAL(19,0)) * CAST(__n AS DECIMAL(19,0)) - __pe AS DOUBLE))
                       + 0.5) AS BIGINT)
                END""").as("kappa_e6"))
  }

  /** Per-class precision/recall/F1 from a (truth, prediction) pair —
    * the eval primitive next to [[rankAuc]]/[[calibrationBins]]. All
    * three ratios are EXACT integer e6 divisions (F1 = 2tp/(2tp+fp+fn)
    * — the algebra that never forms the float intermediate); a class
    * never predicted has NULL precision, one never true has NULL
    * recall (sklearn's zero_division=warn case, made explicit).
    * Classes are the union of both sides' label sets.
    *
    * Scale shape: one hash aggregate to the confusion relation, then
    * labels-sized joins. */
  def classificationReport(df: DataFrame, truthCol: String,
                           predCol: String): DataFrame = {
    val cm = df.select(col(truthCol).as("__t"), col(predCol).as("__p"))
      .filter(col("__t").isNotNull && col("__p").isNotNull)
      .groupBy("__t", "__p").agg(count(lit(1)).as("__c"))
    val tp = cm.filter(col("__t") === col("__p"))
      .select(col("__t").as("label"), col("__c").as("__tp"))
    val truthTot = cm.groupBy(col("__t").as("label")).agg(sum("__c").as("__tt"))
    val predTot = cm.groupBy(col("__p").as("label")).agg(sum("__c").as("__pt"))
    truthTot.join(predTot, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("__tp"), lit(0L)).as("tp"),
        (coalesce(col("__pt"), lit(0L)) - coalesce(col("__tp"), lit(0L))).as("fp"),
        (coalesce(col("__tt"), lit(0L)) - coalesce(col("__tp"), lit(0L))).as("fn"))
      .select(col("label"), col("tp"), col("fp"), col("fn"),
        expr("CASE WHEN tp + fp = 0 THEN NULL ELSE tp * 1000000L DIV (tp + fp) END")
          .as("precision_e6"),
        expr("CASE WHEN tp + fn = 0 THEN NULL ELSE tp * 1000000L DIV (tp + fn) END")
          .as("recall_e6"),
        expr("""CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                     ELSE 2 * tp * 1000000L DIV (2 * tp + fp + fn) END""")
          .as("f1_e6"))
  }

  /** CUPED variance-reduction adjustment (Deng et al., WSDM'13) for an
    * A/B experiment over per-UNIT rows (one row per user, x = the
    * pre-period covariate, y = the experiment metric, integer-scaled):
    *   θ = Cov(x,y)/Var(x)  (pooled),   ŷ_arm = ȳ_arm − θ·(x̄_arm − x̄)
    * θ's numerator g·Σxy − Σx·Σy and denominator g·Σxx − (Σx)² are
    * formed EXACTLY in DECIMAL(38,0) (never a float sum), so the only
    * float steps are the final divisions/multiply on exact operands —
    * identical expression tree ⇒ bit-identical doubles on any engine —
    * floored to e6 units. Constant x (zero denominator) degrades to
    * the unadjusted mean instead of NaN.
    *
    * Scale shape: two hash aggregates over the units relation (pooled
    * moments + per-arm sums) with map-side partials; the ARMS-sized
    * result joins the 1-row moments by broadcast. */
  def cupedAdjust(units: DataFrame, armCol: String,
                  xCol: Column, yCol: Column): DataFrame = {
    val base = units.select(col(armCol).as("__arm"),
      xCol.cast(DecimalType(19, 0)).as("__x"),
      yCol.cast(DecimalType(19, 0)).as("__y"))
    val tot = base.agg(sum("__x").as("__sx"), sum("__y").as("__sy"),
      sum(expr("__x * __y")).as("__sxy"),
      sum(expr("__x * __x")).as("__sxx"),
      count(lit(1)).as("__g"))
    base.groupBy(col("__arm").as("arm"))
      .agg(count(lit(1)).as("n_units"),
        sum("__x").as("__sxa"), sum("__y").as("__sya"))
      .crossJoin(broadcast(tot))
      .select(col("arm"), col("n_units"),
        expr("""CAST(floor(1000000 * (CAST(__sya AS DOUBLE) / CAST(n_units AS DOUBLE))
                + 0.5) AS BIGINT)""").as("y_mean_e6"),
        expr("""CAST(floor(1000000 * (
            CASE WHEN (__g * __sxx - __sx * __sx) = 0
                 THEN CAST(__sya AS DOUBLE) / CAST(n_units AS DOUBLE)
                 ELSE CAST(__sya AS DOUBLE) / CAST(n_units AS DOUBLE)
                      - (CAST(__g * __sxy - __sx * __sy AS DOUBLE)
                         / CAST(__g * __sxx - __sx * __sx AS DOUBLE))
                        * (CAST(__sxa AS DOUBLE) / CAST(n_units AS DOUBLE)
                           - CAST(__sx AS DOUBLE) / CAST(__g AS DOUBLE))
            END) + 0.5) AS BIGINT)""").as("adj_mean_e6"))
  }

  /** Exact dyadic EWMA (α = ½) over a daily integer series:
    * e₁ = x₁, e_t = (x_t + e_{t−1}) / 2. The textbook float recursion
    * accumulates engine-ordered rounding; instead note
    *   e_t = N_t / 2^{t−1}   with   N_t = x₁ + Σ_{s=2..t} x_s·2^{s−2}
    * — a plain prefix sum of integer terms, exact in Long. The one
    * float step is the final N/2^{t−1} on two exact operands (both
    * < 2⁵³, so the casts are exact and the division is the unique
    * IEEE result), floored to e6 units.
    *
    * Long/double headroom: N_t < X·2^{t−1} must stay below 2⁵³ (so
    * the double cast is exact), i.e. series length ≤ 53 − log₂X —
    * 30 days at X = 10⁷ cents/day. Chunk longer series by calendar
    * month, carrying the prior chunk's final e6 value as the seed
    * term: the α=½ weight of a 30-day-old term is 2⁻³⁰, far below e6
    * resolution, so chunking changes nothing observable.
    *
    * Scale shape: callers pre-aggregate to day grain (one shuffle with
    * map-side partials); the single-partition window here runs on the
    * DAYS-sized relation only — the raw relation is never windowed. */
  def ewmaDaily(daily: DataFrame, dayCol: String, centsCol: String): DataFrame = {
    val w = Window.orderBy(dayCol)
    daily.select(col(dayCol).as("day"), col(centsCol).as("day_cents"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__y", expr(
        "CASE WHEN __rn = 1 THEN day_cents " +
          "ELSE day_cents * shiftleft(1L, CAST(__rn - 2 AS INT)) END"))
      .withColumn("__nacc", sum("__y")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("day_cents"),
        expr("""CAST(floor(1000000 * (CAST(__nacc AS DOUBLE)
                / CAST(shiftleft(1L, CAST(__rn - 1 AS INT)) AS DOUBLE))
                + 0.5) AS BIGINT)""").as("ewma_e6"))
  }

  /** Kaplan-Meier product-limit survival curve per group, in EXACT
    * integer arithmetic. Input is one row per subject: a group key, an
    * integer duration (time-to-event or time-to-censoring in whatever
    * unit the caller chose), and observed ∈ {0,1} (1 = the event
    * happened at `duration`, 0 = right-censored there). Output is one
    * row per (group, event time) with the at-risk count, event count,
    * and the survival estimate
    *   S(tᵢ) = Π_{j≤i} (n_j − d_j)/n_j
    * evaluated as an e9 integer recurrence s ← s·(n−d) DIV n — every
    * step is integer floor division, so the curve is bit-identical on
    * any engine/partitioning (a float product is neither), at the cost
    * of ≤1e-9·i downward bias, invisible at e9 scale.
    *
    * Scale shape: one hash aggregate to the (group × distinct
    * duration)-sized relation, one window over that SMALL relation for
    * the at-risk tail sums, then a per-group ordered fold via the
    * `aggregate` higher-order function over a collected point array.
    * The array is bounded by DISTINCT DURATIONS per group (callers
    * bucket durations to days/hours precisely so this is
    * observation-window-sized, e.g. ≤ a few thousand), never by
    * subject count — 10⁹ subjects still fold a few-KB array. */
  def kaplanMeier(subjects: DataFrame, groupCol: String,
                  durationCol: String, observedCol: String): DataFrame = {
    val pt = subjects
      .select(col(groupCol).as("__g"), col(durationCol).cast("long").as("t"),
        col(observedCol).cast("long").as("__obs"))
      .groupBy("__g", "t")
      .agg(sum("__obs").as("d"), count(lit(1)).as("__all"))
    val atRisk = Window.partitionBy("__g").orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ev = pt.withColumn("n_risk", sum("__all").over(atRisk))
      .filter(col("d") > 0)
    ev.groupBy("__g")
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"), col("d"))))
        .as("__pts"))
      .select(col("__g"), explode(expr(
        """aggregate(__pts,
             struct(CAST(1000000000 AS BIGINT) AS s,
                    CAST(array() AS ARRAY<STRUCT<t: BIGINT, n_risk: BIGINT,
                                                 d: BIGINT, surv_e9: BIGINT>>) AS out),
             (acc, x) -> struct(
               (acc.s * (x.n_risk - x.d)) DIV x.n_risk AS s,
               array_append(acc.out, struct(
                 x.t AS t, x.n_risk AS n_risk, x.d AS d,
                 (acc.s * (x.n_risk - x.d)) DIV x.n_risk AS surv_e9)) AS out),
             acc -> acc.out)""")).as("__p"))
      .select(col("__g").as(groupCol), col("__p.t").as(durationCol),
        col("__p.n_risk").as("n_risk"), col("__p.d").as("n_events"),
        col("__p.surv_e9").as("surv_e9"))
  }

  /** Spearman rank correlation per group — Pearson on AVERAGE ranks
    * (the tie-correct definition), kept exact by carrying doubled
    * average ranks as integers: for a value with `rank()` r among c
    * ties, 2·avgrank = 2r + c − 1. All five moment sums accumulate in
    * DECIMAL(38,0); the final ρ is one double expression over exact
    * operands (IEEE-defined), e6-floored sign-safely. Groups where
    * either variable is constant yield NULL.
    *
    * Scale shape: two windows over the raw relation, both partitioned
    * on `group` alone (the tie count is a RANGE current-row frame —
    * peers of the sort key — NOT a partition-by-(g,value) window,
    * which would cost a second exchange): ONE exchange, two local
    * sorts, then one hash aggregate to the GROUPS-sized relation. */
  def spearmanByGroup(df: DataFrame, groupCol: String,
                      xCol: String, yCol: String): DataFrame = {
    val rkX = Window.partitionBy("__g").orderBy("__x")
    val rkY = Window.partitionBy("__g").orderBy("__y")
    val peers = (w: org.apache.spark.sql.expressions.WindowSpec) =>
      w.rangeBetween(Window.currentRow, Window.currentRow)
    val ranked = df
      .select(col(groupCol).as("__g"), col(xCol).as("__x"), col(yCol).as("__y"))
      .withColumn("__ax2", (lit(2L) * rank().over(rkX)
        + count(lit(1)).over(peers(rkX)) - 1L).cast(D))
      .withColumn("__ay2", (lit(2L) * rank().over(rkY)
        + count(lit(1)).over(peers(rkY)) - 1L).cast(D))
    ranked.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum("__ax2").as("__sx"), sum("__ay2").as("__sy"),
        sum(col("__ax2") * col("__ay2")).as("__sxy"),
        sum(col("__ax2") * col("__ax2")).as("__sxx"),
        sum(col("__ay2") * col("__ay2")).as("__syy"))
      .select(col(groupCol), col("n_rows"),
        expr("""CASE WHEN n_rows*__sxx - __sx*__sx = 0
                       OR n_rows*__syy - __sy*__sy = 0 THEN NULL
                     ELSE CAST(floor(1000000 * (
                       CAST(n_rows*__sxy - __sx*__sy AS DOUBLE)
                       / (sqrt(CAST(n_rows*__sxx - __sx*__sx AS DOUBLE))
                          * sqrt(CAST(n_rows*__syy - __sy*__sy AS DOUBLE))))
                       + 0.5) AS BIGINT) END""").as("spearman_e6"))
  }

  /** Per-class one-vs-rest Matthews correlation from a (truth,
    * prediction) pair — the chance-robust single-number companion to
    * [[classificationReport]] (same confusion relation, plus
    * tn = n − tp − fp − fn). The numerator tp·tn − fp·fn is formed
    * EXACTLY in DECIMAL(38,0); the denominator is the product of four
    * sqrt's of exact counts (each IEEE-defined), multiplied left-to-
    * right so both engines build the identical double. A class with
    * any empty margin (tp+fp, tp+fn, tn+fp or tn+fn = 0) yields NULL —
    * sklearn's undefined-MCC case, made explicit.
    *
    * Scale shape: one hash aggregate to the confusion relation (plus
    * its 1-row total), then labels-sized joins — same as
    * classificationReport. */
  def mccPerLabel(df: DataFrame, truthCol: String,
                  predCol: String): DataFrame = {
    val cm = df.select(col(truthCol).as("__t"), col(predCol).as("__p"))
      .filter(col("__t").isNotNull && col("__p").isNotNull)
      .groupBy("__t", "__p").agg(count(lit(1)).as("__c"))
    val tot = cm.agg(sum("__c").as("__n"))
    val tp = cm.filter(col("__t") === col("__p"))
      .select(col("__t").as("label"), col("__c").as("__tp"))
    val truthTot = cm.groupBy(col("__t").as("label")).agg(sum("__c").as("__tt"))
    val predTot = cm.groupBy(col("__p").as("label")).agg(sum("__c").as("__pt"))
    truthTot.join(predTot, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .crossJoin(broadcast(tot))
      .select(col("label"),
        coalesce(col("__tp"), lit(0L)).as("tp"),
        (coalesce(col("__pt"), lit(0L)) - coalesce(col("__tp"), lit(0L))).as("fp"),
        (coalesce(col("__tt"), lit(0L)) - coalesce(col("__tp"), lit(0L))).as("fn"),
        col("__n"))
      .select(col("label"), col("tp"), col("fp"), col("fn"),
        (col("__n") - col("tp") - col("fp") - col("fn")).as("tn"),
        expr("""CASE WHEN tp + fp = 0 OR tp + fn = 0
                       OR (__n - tp - fp - fn) + fp = 0
                       OR (__n - tp - fp - fn) + fn = 0 THEN NULL
                     ELSE CAST(floor(1000000 * (
                       CAST(CAST(tp AS DECIMAL(38,0)) * (__n - tp - fp - fn)
                            - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
                       / (sqrt(CAST(tp + fp AS DOUBLE))
                          * sqrt(CAST(tp + fn AS DOUBLE))
                          * sqrt(CAST((__n - tp - fp - fn) + fp AS DOUBLE))
                          * sqrt(CAST((__n - tp - fp - fn) + fn AS DOUBLE))))
                       + 0.5) AS BIGINT) END""").as("mcc_e6"))
  }

  /** One-way ANOVA F-statistic of an integer-scaled value across
    * groups, ENTIRELY in exact integer arithmetic: the between/within
    * sums of squares are formed with floor divisions (S_g² DIV n_g —
    * exact, with the identical sub-unit truncation bias on any
    * engine), so F itself is one exact integer ratio at e6 scale.
    * Degenerate inputs (k < 2, n ≤ k, or zero within-group variance)
    * yield NULL F rather than ±Inf.
    *
    * Integer headroom: S_g² < 1e38 (DECIMAL) and S_g² DIV n_g ≤
    * n_g·x̄² must fit BIGINT — holds through ~1e10 rows of 1e4-unit
    * values per group.
    *
    * Scale shape: one hash aggregate to the GROUPS relation with
    * map-side partials, then a 1-row reduction — the raw relation is
    * scanned once and never sorted. */
  def anovaF(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    df.select(col(groupCol).as("__g"), col(valCol).cast(D).as("__x"))
      .filter(col("__g").isNotNull && col("__x").isNotNull)
      .groupBy("__g")
      .agg(count(lit(1)).cast(D).as("__ng"), sum("__x").as("__sg"),
        sum(expr("__x * __x")).as("__sqg"))
      .agg(count(lit(1)).as("k_groups"),
        sum("__ng").cast(D).as("__n"), sum("__sg").as("__s"),
        sum("__sqg").as("__sq"),
        sum(expr("(__sg * __sg) DIV __ng")).as("__a"))
      .select(expr("CAST(__n AS BIGINT)").as("n_rows"), col("k_groups"),
        expr("CAST(__a - (__s * __s) DIV __n AS BIGINT)").as("ss_between"),
        expr("CAST(__sq - __a AS BIGINT)").as("ss_within"),
        expr("""CASE WHEN k_groups < 2 OR __n <= k_groups
                       OR __sq - __a <= 0 THEN NULL
                     ELSE CAST((CAST(__a - (__s * __s) DIV __n AS DECIMAL(38,0))
                                * (__n - k_groups) * 1000000)
                               DIV (CAST(__sq - __a AS DECIMAL(38,0))
                                * (k_groups - 1))
                               AS BIGINT) END""").as("f_e6"))
  }

  /** NDCG@k per group for a ranking eval: rank rows by score
    * descending (ties broken by `idCol` so the permutation is
    * engine-deterministic), take the top k, and accumulate
    * (2^rel − 1)/log2(pos+1). Each positional term is floored to an
    * exact e9 integer BEFORE summing — integer sums are
    * order-independent, so the aggregate never depends on float
    * accumulation order (the one non-IEEE-pinned step, log2, feeds a
    * floor with ~1e-9 relative slack — the same envelope q161's BM25
    * ln() rides). The ideal DCG re-ranks by relevance itself. Groups
    * with an all-zero top-k ideal yield NULL ndcg.
    *
    * Scale shape: one window rank over the grouped relation (ONE
    * exchange on the group key; the k-limit prunes via
    * WindowGroupLimit before the sort spills), then one hash
    * aggregate to the GROUPS relation. */
  def ndcgAtK(df: DataFrame, groupCol: String, idCol: String,
              scoreCol: String, relCol: String, k: Int): DataFrame = {
    val byScore = Window.partitionBy("__g")
      .orderBy(col("__score").desc, col("__id").asc)
    val byRel = Window.partitionBy("__g")
      .orderBy(col("__rel").desc, col("__id").asc)
    val base = df.select(col(groupCol).as("__g"), col(idCol).as("__id"),
      col(scoreCol).as("__score"), col(relCol).as("__rel"))
    def gain(posCol: String): Column = expr(
      s"""CAST(floor(1000000000 * (CAST(pow(2, __rel) - 1 AS DOUBLE)
          / log2(CAST($posCol + 1 AS DOUBLE))) + 0.5) AS BIGINT)""")
    val scored = base
      .withColumn("__pos", row_number().over(byScore))
      .withColumn("__ipos", row_number().over(byRel))
      .select(col("__g"), col("__rel"),
        when(col("__pos") <= k, gain("__pos")).otherwise(0L).as("__gain_e9"),
        when(col("__ipos") <= k, gain("__ipos")).otherwise(0L).as("__igain_e9"))
    scored.groupBy(col("__g").as(groupCol))
      .agg(sum("__gain_e9").as("dcg_e9"), sum("__igain_e9").as("idcg_e9"))
      .select(col(groupCol), col("dcg_e9"), col("idcg_e9"),
        expr("""CASE WHEN idcg_e9 = 0 THEN NULL
                     ELSE dcg_e9 * 1000000L DIV idcg_e9 END""").as("ndcg_e6"))
  }

  /** Per-group Brier score of a probabilistic binary classifier whose
    * score arrives as an exact e6 integer (p·1e6): the squared error
    * (score − y·1e6)² is an exact integer per row, summed in
    * DECIMAL(38,0) and floor-divided by n — NO floating point
    * anywhere, so the result is bit-identical on any engine and
    * partitioning. Output is e12-scaled (the square of the e6 input
    * scale); 0 = perfect, 1e12 = maximally wrong.
    *
    * Scale shape: ONE hash aggregate with map-side partials. */
  def brierScore(df: DataFrame, groupCol: String,
                 scoreE6Col: String, labelCol: String): DataFrame = {
    df.select(col(groupCol).as("__g"),
      (col(scoreE6Col).cast("long")
        - when(col(labelCol), 1000000L).otherwise(0L)).cast(D).as("__d"))
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("__d * __d")).as("__se"))
      .select(col(groupCol), col("n_rows"),
        expr("CAST(__se DIV n_rows AS BIGINT)").as("brier_e12"))
  }

  /** Cramér's V — the [0,1]-normalized effect size on top of
    * [[chiSquare]]'s exact contingency machinery:
    * V = sqrt(χ² / (n · min(|A|−1, |B|−1))). Same full-grid χ²
    * (zero cells included), same exact per-cell e6 rounding; the final
    * sqrt/division act on two exact operands. Degenerate tables
    * (either margin constant) yield NULL V.
    *
    * Scale shape: identical to chiSquare — hash aggregate to the
    * contingency grid, |A|×|B| cross of the margins, one reduction. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).cast(D).as("__o"))
    val rowTot = obs.groupBy("__a").agg(sum("__o").as("__r"))
    val colTot = obs.groupBy("__b").agg(sum("__o").as("__c"))
    val tot = obs.agg(sum("__o").as("__n"),
      count_distinct(col("__a")).as("__ka"),
      count_distinct(col("__b")).as("__kb"))
    val grid = rowTot.crossJoin(colTot)
      .join(obs, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0).cast(D)))
    val num = (col("__o") * col("__n") - col("__r") * col("__c"))
    val contrib = round(
      (num * num).cast("double")
        / (col("__n") * col("__r") * col("__c")).cast("double"), 6)
      .cast(DecimalType(18, 6))
    grid.crossJoin(broadcast(tot))
      .agg(sum(contrib).cast(DecimalType(28, 6)).as("__chi2"),
        first(col("__n")).as("__n"),
        first(col("__ka")).as("__ka"), first(col("__kb")).as("__kb"))
      .select(
        expr("CAST(__chi2 * 1000000 AS BIGINT)").as("chi2_e6"),
        expr("CAST((__ka - 1) * (__kb - 1) AS BIGINT)").as("dof"),
        expr("CAST(__n AS BIGINT)").as("n_rows"),
        expr("""CASE WHEN __ka < 2 OR __kb < 2 THEN NULL
                     ELSE CAST(floor(1000000 * sqrt(
                       CAST(__chi2 AS DOUBLE)
                       / (CAST(__n AS DOUBLE) * least(__ka - 1, __kb - 1)))
                       + 0.5) AS BIGINT) END""").as("v_e6"))
  }

  /** Odds ratio of a 2×2 (exposure × outcome) table, entirely exact:
    * OR = (a·d)/(b·c) over the four cells, emitted as an e6 floor
    * division on DECIMAL products. Empty margins making b·c = 0 yield
    * NULL (infinite/undefined OR) rather than an overflow.
    *
    * Scale shape: ONE conditional-aggregate pass — four FILTER counts
    * in a single state row, no pivot, no second scan. */
  def oddsRatio(df: DataFrame, exposureCol: String,
                outcomeCol: String): DataFrame = {
    df.select(col(exposureCol).as("__e"), col(outcomeCol).as("__o"))
      .agg(
        sum(when(col("__e") && col("__o"), 1L).otherwise(0L)).as("n_exp_out"),
        sum(when(col("__e") && !col("__o"), 1L).otherwise(0L)).as("n_exp_noout"),
        sum(when(!col("__e") && col("__o"), 1L).otherwise(0L)).as("n_noexp_out"),
        sum(when(!col("__e") && !col("__o"), 1L).otherwise(0L)).as("n_noexp_noout"))
      .select(col("n_exp_out"), col("n_exp_noout"),
        col("n_noexp_out"), col("n_noexp_noout"),
        expr("""CASE WHEN n_exp_noout * n_noexp_out = 0 THEN NULL
                     ELSE CAST((CAST(n_exp_out AS DECIMAL(38,0)) * n_noexp_noout
                                * 1000000)
                               DIV (CAST(n_exp_noout AS DECIMAL(38,0))
                                * n_noexp_out) AS BIGINT) END""").as("odds_ratio_e6"))
  }

  /** Herfindahl–Hirschman concentration index per group: Σ shareᵢ²
    * over each member's share of the group total, as ONE exact integer
    * ratio (Σvᵢ²·1e6) DIV (Σvᵢ)² — 1e6 = monopoly, →0 = atomized.
    * The market-concentration companion to the Gini (q198): HHI weighs
    * the head, Gini the whole curve. Groups with a zero total yield
    * NULL.
    *
    * DECIMAL(38,0) headroom: Σvᵢ²·1e6 < 1e38 ⇔ member values < 1e16.
    *
    * Scale shape: two hash aggregates (members, then groups), both
    * with map-side partials — never a sort or window. */
  def hhi(df: DataFrame, groupCol: String, memberCol: String,
          valCol: String): DataFrame = {
    df.select(col(groupCol).as("__g"), col(memberCol).as("__m"),
        col(valCol).cast(D).as("__v"))
      .groupBy("__g", "__m").agg(sum("__v").as("__mv"))
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_members"),
        sum("__mv").as("__s"), sum(expr("__mv * __mv")).as("__sq"))
      .select(col(groupCol), col("n_members"),
        expr("""CASE WHEN __s = 0 THEN NULL
                     ELSE CAST((__sq * 1000000) DIV (__s * __s) AS BIGINT)
                END""").as("hhi_e6"))
  }

  /** Seasonal-naive forecast backtest over a daily integer series:
    * forecast(d) = actual(d − season), scored with SMAPE and MAE over
    * every day where both sides exist (a calendar self-join, so gaps
    * score only when both endpoints are present). Each day's SMAPE
    * term 2·|f−a|/(f+a) is an exact e6 floor division (0 when both
    * sides are 0 — the standard convention, made explicit), summed as
    * integers and floor-averaged: no floats anywhere.
    *
    * Scale shape: the daily relation self-joins on a shifted date key
    * (DAYS-sized, broadcast/AQE territory) and reduces to one row. */
  def seasonalNaiveSmape(daily: DataFrame, dayCol: String,
                         valCol: String, seasonDays: Int = 7): DataFrame = {
    val a = daily.select(col(dayCol).cast("date").as("__d"),
      col(valCol).cast("long").as("__a"))
    val f = daily.select(date_add(col(dayCol).cast("date"), seasonDays).as("__d"),
      col(valCol).cast("long").as("__f"))
    a.join(f, Seq("__d"))
      .select(
        abs(col("__f") - col("__a")).as("__ae"),
        (col("__f") + col("__a")).as("__tot"))
      .agg(count(lit(1)).as("n_days"),
        sum(expr("CASE WHEN __tot = 0 THEN 0 " +
          "ELSE (__ae * 2000000) DIV __tot END")).as("__sm"),
        sum("__ae").as("__sae"))
      .select(col("n_days"),
        expr("CASE WHEN n_days = 0 THEN NULL ELSE __sm DIV n_days END")
          .as("smape_e6"),
        expr("CASE WHEN n_days = 0 THEN NULL ELSE __sae DIV n_days END")
          .as("mae"))
  }

  /** Period-over-period mix-shift decomposition: per segment, split
    * the metric delta between period 1 and period 2 into a VOLUME
    * effect (unit-count change at the old per-unit rate) and a RATE
    * effect (per-unit-rate change at the new unit count) — the
    * standard "is revenue down because fewer orders or smaller
    * orders?" analyst decomposition.
    *
    * Exact-integer contract: per-unit rates are e6 floor divisions of
    * non-negative sums (engine-identical); both effects are then pure
    * integer MULTIPLICATIONS of those rounded rates — no division of a
    * possibly-negative delta anywhere, sidestepping the Spark-DIV
    * (truncate) vs DuckDB-// (floor) disagreement on negatives. The
    * effects are in e6-value units; `residual_e6` (delta minus both
    * effects) carries the rate-rounding slack plus the interaction
    * term, so the decomposition visibly sums.
    *
    * Scale shape: ONE hash aggregate over the fact (conditional sums
    * per segment — the period split rides the same pass, no join, no
    * window), output is segments-sized. */
  def mixShift(df: DataFrame, keyCol: String, periodCol: String,
               valCol: String): DataFrame = {
    def s(p: Int, c: Column) = sum(when(col(periodCol) === p, c).otherwise(0L))
    df.groupBy(col(keyCol))
      .agg(s(1, lit(1L)).cast("long").as("u1"),
        s(2, lit(1L)).cast("long").as("u2"),
        s(1, col(valCol)).cast("long").as("v1"),
        s(2, col(valCol)).cast("long").as("v2"))
      .select(col(keyCol), col("u1"), col("u2"), col("v1"), col("v2"),
        (col("v2") - col("v1")).as("delta"),
        expr("CASE WHEN u1 = 0 THEN NULL ELSE v1 * 1000000L DIV u1 END")
          .as("rate1_e6"),
        expr("CASE WHEN u2 = 0 THEN NULL ELSE v2 * 1000000L DIV u2 END")
          .as("rate2_e6"))
      .withColumn("volume_effect_e6", (col("u2") - col("u1")) * col("rate1_e6"))
      .withColumn("rate_effect_e6", col("u2") * (col("rate2_e6") - col("rate1_e6")))
      .withColumn("residual_e6",
        col("delta") * 1000000L - col("volume_effect_e6") - col("rate_effect_e6"))
  }
}
