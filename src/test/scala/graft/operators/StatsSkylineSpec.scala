package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSkylineSpec extends SparkSpec {
  import spark.implicits._

  test("regressionByGroup: recovers an exact linear fit; constant x is NULL") {
    val pts = Seq(
      // group a: y = 2x + 3 exactly
      ("a", 1L, 5L), ("a", 2L, 7L), ("a", 3L, 9L), ("a", 10L, 23L),
      // group b: constant x -> zero denominator -> NULL fit
      ("b", 4L, 1L), ("b", 4L, 9L)
    ).toDF("g", "x", "y")
    val byG = Stats.regressionByGroup(pts, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(byG("a") == ((4L, Some(2.0), Some(3.0))))
    assert(byG("b") == ((2L, None, None)))
  }

  test("corrMatrix: exact +1 / -1 / NULL-on-constant, one scan, one aggregate") {
    val df = Seq(
      (1L, 2L, 9L, 5L), (2L, 4L, 8L, 5L), (3L, 6L, 7L, 5L), (4L, 8L, 6L, 5L)
    ).toDF("x", "y2x", "neg", "const")
    val got = Stats.corrMatrix(df, Seq(
        "x" -> col("x"), "y2x" -> col("y2x"),
        "neg" -> col("neg"), "const" -> col("const")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2))).toMap
    assert(got(("x", "y2x")) == Some(1.0))
    assert(got(("x", "neg")) == Some(-1.0))
    assert(got(("x", "const")) == None)
    assert(got(("y2x", "neg")) == Some(-1.0))
    // all six unordered pairs, exactly once
    assert(got.size == 6)
    // one scan feeds the whole matrix (the union-of-selects shape reads
    // the input once per pair)
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = Stats.corrMatrix(orders, Seq(
        "key" -> col("o_orderkey"), "cust" -> col("o_custkey"),
        "price" -> graft.queries.cents(col("o_totalprice"))))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("modeByGroup: ties break to the SMALLEST value, deterministically") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
      ("g2", "z")
    ).toDF("g", "v")
    val got = Stats.modeByGroup(df, Seq("g"), "v")
      .as[(String, String, Long)].collect().toSet
    // g1: a and b both count 2 -> a wins the tie
    assert(got == Set(("g1", "a", 2L), ("g2", "z", 1L)))
  }

  test("chiSquare: zero on exact independence, N on complete association") {
    // proportional rows -> E == O everywhere -> chi2 = 0
    val indep = (
      Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
        Seq.fill(20)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    ).toDF("a", "b")
    val gi = Stats.chiSquare(indep, "a", "b").collect().head
    assert(gi.getDecimal(0).compareTo(new java.math.BigDecimal("0.000000")) == 0)
    assert(gi.getLong(1) == 1L)
    // perfect diagonal association in a 2x2 -> chi2 = N
    val dep = (Seq.fill(30)(("r1", "c1")) ++ Seq.fill(30)(("r2", "c2")))
      .toDF("a", "b")
    val gd = Stats.chiSquare(dep, "a", "b").collect().head
    assert(gd.getDecimal(0).compareTo(new java.math.BigDecimal("60.000000")) == 0)
  }

  test("twoProportionZTest: clear lift significant, noise-level lift not") {
    def arms(ca: Int, cb: Int, n: Int) = (
      (1 to n).map(i => ("A", i <= ca)) ++ (1 to n).map(i => ("B", i <= cb))
    ).toDF("arm", "conv")
    val hit = Stats.twoProportionZTest(arms(50, 10, 100), "arm", "A", "B", "conv")
      .collect().head
    assert(hit.getLong(0) == 100L && hit.getLong(2) == 50L)
    assert(hit.getBoolean(6))
    assert(hit.getDouble(4) == 0.5 && hit.getDouble(5) == 0.1)
    val miss = Stats.twoProportionZTest(arms(50, 48, 100), "arm", "A", "B", "conv")
      .collect().head
    assert(!miss.getBoolean(6))
  }

  test("winsorizeByGroup: tails clamp to exact order statistics, middle intact") {
    // group g: values 1..20 -> p5 rank = (20*5+99)/100 = 1 -> lo = 1;
    // p95 rank = (20*95+99)/100 = 19 -> hi = 19; only 20 clips
    val df = (1L to 20L).map(v => ("g", v)).toDF("k", "v")
    val got = Stats.winsorizeByGroup(df, Seq("k"), "v")
      .as[(String, Long, Long)].collect()
      .map { case (_, v, w) => v -> w }.toMap
    assert(got(20L) == 19L)
    assert(got(19L) == 19L && got(1L) == 1L && got(10L) == 10L)
    // a skewed group: outlier pulled to the fence, not dropped
    val sk = ((1L to 99L) :+ 100000L).map(v => ("s", v)).toDF("k", "v")
    val gs = Stats.winsorizeByGroup(sk, Seq("k"), "v")
      .as[(String, Long, Long)].collect()
    assert(gs.length == 100) // nothing dropped
    assert(gs.map(_._3).max == 95L) // p95 rank = (100*95+99)/100 = 95
  }

  test("equiWidthHistogram: empty bins materialized, degenerate input safe") {
    // values 0..9 and 90..99 over 10 bins of width 10 -> bins 1..8 empty
    val df = ((0L to 9L) ++ (90L to 99L)).toDF("v")
    val got = Stats.equiWidthHistogram(df, "v", nBins = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 10)
    assert(got.head == ((0L, 0L, 9L, 10L)))
    assert(got.last == ((9L, 90L, 99L, 10L)))
    assert(got.slice(1, 9).forall(_._4 == 0L))
    // all-equal input: one width-1 bin carries everything
    val flat = Stats.equiWidthHistogram(Seq(7L, 7L, 7L).toDF("v"), "v", nBins = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(flat.head == ((0L, 7L, 7L, 3L)))
    assert(flat.map(_._4).sum == 3L)
  }

  test("topNWithOther: totals reconcile, ties deterministic, OTHER absorbs tail") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(1)("d") ++ Seq.fill(1)("e")).toDF("v")
    val got = Stats.topNWithOther(df, "v", n = 2)
      .as[(String, Long)].collect().toMap
    // a and b tie at 5 -> both win (ties to smallest value fill the N)
    assert(got == Map("a" -> 5L, "b" -> 5L, "OTHER" -> 5L))
    assert(got.values.sum == 15L) // nothing silently dropped
  }

  test("psiDrift: identical samples score ~0, a shifted sample alarms, clamps hold") {
    val ref = (1L to 1000L).toDF("v")
    val same = Stats.psiDrift(ref, (1L to 1000L).toDF("v"), "v")
      .agg(sum(col("psi_term"))).collect().head.getDecimal(0)
    assert(same.abs().doubleValue() < 0.01, s"identical halves scored $same")
    // current mass pushed far above the reference range: clamped into
    // the top bin, PSI blows past the 0.25 alarm line
    val shifted = Stats.psiDrift(ref, (5000L to 6000L).toDF("v"), "v")
    val rows = shifted.collect()
    assert(rows.length == 10)
    val total = shifted.agg(sum(col("psi_term"))).collect().head.getDecimal(0)
    assert(total.doubleValue() > 0.25, s"shifted sample scored only $total")
    // all the shifted mass sits in the clamped top bin
    val top = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top(9L) == 1001L && (0L to 8L).forall(b => top(b) == 0L))
  }

  test("benfordReport: all nine digits materialized, geometric data fits") {
    // 1,2,4,...,2^k spans decades -> roughly Benford; digits absent
    // from the data still get their zero row
    val geom = (0 to 40).map(k => math.pow(2, k).toLong).toDF("v")
    val got = Stats.benfordReport(geom, "v")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 9L))
    assert(got.map(_._2).sum == 41)
    // digit 1 leads (Benford's signature), and nonpositives are ignored
    assert(got.head._2 == got.map(_._2).max)
    val withJunk = Stats.benfordReport(
      (Seq(-5L, 0L) ++ Seq(100L, 200L)).toDF("v"), "v")
      .as[(Long, Long, Long, Long)].collect()
    assert(withJunk.map(_._2).sum == 2)
    // exp_ppm matches the closed form for every digit
    got.foreach { case (d, _, _, exp) =>
      assert(exp == math.round(math.log10(1.0 + 1.0 / d) * 1000000L))
    }
  }

  test("madOutliers: planted spike flagged, clean bulk untouched") {
    // 1..21 centered at 11, MAD = 5 (|v-11| sorted: 0,1,1,...,10 ->
    // 11th of 21 = 5); fence = 15 -> none of 1..21 is an outlier...
    val clean = (1L to 21L).map(("g", _)).toDF("k", "v")
    val gotClean = Stats.madOutliers(clean, Seq("k"), "v")
      .filter(col("is_outlier")).count()
    assert(gotClean == 0)
    // ...but a planted 1000 is (and barely shifts the fences)
    val spiked = ((1L to 21L) :+ 1000L).map(("g", _)).toDF("k", "v")
    val flagged = Stats.madOutliers(spiked, Seq("k"), "v")
      .filter(col("is_outlier")).select("v").as[Long].collect().toSeq
    assert(flagged == Seq(1000L))
  }

  test("frontier2D: matches the naive NOT-EXISTS dominance check, keeps ties") {
    val rows = (1 to 200).map { i =>
      // deterministic scatter with duplicate points and same-x ties
      val x = (i * 7919) % 50
      val y = (i * 104729) % 97
      (i.toLong, x.toLong, y.toLong)
    }.toDF("id", "x", "y")
    val fast = Skyline.frontier2D(rows, "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    val all = rows.as[(Long, Long, Long)].collect()
    val naive = all.filter { case (_, x, y) =>
      !all.exists { case (_, sx, sy) =>
        sx >= x && sy >= y && (sx > x || sy > y)
      }
    }.toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
    // duplicate frontier points must BOTH survive (equal rows don't
    // dominate each other)
    val dup = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 0L, 0L)).toDF("id", "x", "y")
    assert(Skyline.frontier2D(dup, "x", "y").count() == 2)
  }

  test("weightedMedian: crossing value, tie-heavy groups, weight-1 degenerates to median") {
    val df = Seq(
      // g1: weights 1,1,8 -> total 10, cum at v=30 is 10 >= 5: but v=20 cum=2 < 5 -> median 30
      ("g1", 10L, 1L), ("g1", 20L, 1L), ("g1", 30L, 8L),
      // g2: heavy low value -> median is the low value (cum 8 >= 5)
      ("g2", 10L, 8L), ("g2", 20L, 1L), ("g2", 30L, 1L),
      // g3: tied values split across rows; RANGE frame pools them:
      // cum(10)=4 < 5, cum(20)=8 (both rows) >= 5 -> 20
      ("g3", 10L, 4L), ("g3", 20L, 2L), ("g3", 20L, 2L), ("g3", 30L, 2L),
      // g4: all weights 1 over 1..4 -> 2*cum>=4 first at v=2 (lower median)
      ("g4", 1L, 1L), ("g4", 2L, 1L), ("g4", 3L, 1L), ("g4", 4L, 1L)
    ).toDF("g", "v", "w")
    val got = Stats.weightedMedian(df, Seq("g"), "v", "w")
      .as[(String, Long)].collect().toMap
    assert(got == Map("g1" -> 30L, "g2" -> 10L, "g3" -> 20L, "g4" -> 2L))
  }

  test("weightedQuantiles: one pass, monotone, p50 agrees with weightedMedian") {
    val df = Seq(
      ("g1", 10L, 1L), ("g1", 20L, 1L), ("g1", 30L, 8L),
      ("g2", 1L, 1L), ("g2", 2L, 1L), ("g2", 3L, 1L), ("g2", 4L, 1L)
    ).toDF("g", "v", "w")
    val got = Stats.weightedQuantiles(df, Seq("g"), "v", "w",
        Seq((1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75")))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // g1: cum(10)=1,cum(20)=2,cum(30)=10 of 10 -> p25: 4*1<10,4*2<10 -> 30
    assert(got("g1") == ((30L, 30L, 30L)))
    // g2 weights 1: p25 at v=1 (4*1>=4), p50 at v=2, p75 at v=3
    assert(got("g2") == ((1L, 2L, 3L)))
    val med = Stats.weightedMedian(df, Seq("g"), "v", "w")
      .as[(String, Long)].collect().toMap
    assert(got.forall { case (g, (p25, p50, p75)) =>
      p25 <= p50 && p50 <= p75 && p50 == med(g) })
  }

  test("autocorrelation: alternating series gives acf_k = ±(n−k)/n exactly") {
    // x alternates ±1, mean 0: acf_k = (-1)^k * (n-k)/n, n_pairs = n-k
    val s = (1 to 10).map(t => (t, if (t % 2 == 0) 1L else -1L)).toDF("t", "x")
    val got = Stats.autocorrelation(s, "t", "x", maxLag = 3)
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 9L, Some(-900000L)), (2L, 8L, Some(800000L)),
      (3L, 7L, Some(-700000L))))
  }

  test("autocorrelation: constant series yields NULL (zero variance), no ANSI error") {
    val const = (1 to 5).map(t => (t, 7L)).toDF("t", "x")
    val got = Stats.autocorrelation(const, "t", "x", maxLag = 2)
      .select("acf_e6").as[Option[Long]].collect()
    assert(got.length == 2 && got.forall(_.isEmpty))
  }

  test("cusumChangepoint: locates a planted level shift with direction") {
    // 10 days at 100 then 10 at 200: |S| peaks at t=10, level steps UP
    val up = ((1 to 10).map(t => (t, 100L)) ++ (11 to 20).map(t => (t, 200L)))
      .toDF("t", "x")
    val r = Stats.cusumChangepoint(up, "t", "x")
      .as[(Int, Long, Long, String)].head()
    // dev_t = 20*cum - t*3000 = -1000t for t<=10 -> peak |.| 10000 at t=10
    assert(r == ((10, 10L, 10000L, "up")))
    val down = ((1 to 10).map(t => (t, 200L)) ++ (11 to 20).map(t => (t, 100L)))
      .toDF("t", "x")
    val d = Stats.cusumChangepoint(down, "t", "x")
      .as[(Int, Long, Long, String)].head()
    assert(d == ((10, 10L, 10000L, "down")))
  }

  test("mannKendall: monotone series hit ±max S; constant series is NULL z") {
    val up = (1 to 10).map(t => (t, t * 5L)).toDF("t", "x")
    val u = Stats.mannKendall(up, "t", "x")
      .as[(Long, Long, Long, Option[Double])].head()
    // S = C(10,2) = 45; no ties: var18 = 10*9*25 = 2250; z = 44/sqrt(125)
    assert(u._1 == 10L && u._2 == 45L && u._3 == 2250L)
    assert(u._4.exists(z => z > 3.9 && z < 4.0))
    val down = (1 to 10).map(t => (t, -t * 5L)).toDF("t", "x")
    val d = Stats.mannKendall(down, "t", "x")
      .as[(Long, Long, Long, Option[Double])].head()
    // exact antisymmetry: same |z| to the last rounded decimal
    assert(d._2 == -45L && d._4 == u._4.map(-_))
    val const = (1 to 10).map(t => (t, 7L)).toDF("t", "x")
    val c = Stats.mannKendall(const, "t", "x")
      .as[(Long, Long, Long, Option[Double])].head()
    // all tied: S = 0 and the ties term cancels var18 to 0 -> z NULL
    assert(c._2 == 0L && c._3 == 0L && c._4.isEmpty)
  }

  test("theilSen: robust to one wild outlier where the mean slope is not") {
    // y = 10x with one corrupted point: median pairwise slope stays 10
    val pts = (1 to 11).map { i =>
      (java.sql.Date.valueOf(f"2024-01-${i}%02d"),
        if (i == 6) 100000L else i * 10L)
    }
    val r = Stats.theilSen(pts.toDF("d", "x"), "d", "x")
      .as[(Long, Double)].head()
    assert(r._1 == 55L) // C(11,2) pairs
    assert(r._2 == 10.0)
  }

  test("kmvDistinct: exact below k, within 15% above k, deterministic") {
    val small = (1 to 40).map(i => ("a", i)).toDF("g", "v")
    val s = Stats.kmvDistinct(small, "g", "v", k = 64)
      .as[(String, Double)].head()
    assert(s == (("a", 40.0))) // m < k -> exact count, no estimation
    val big = (1 to 5000).map(i => ("b", i * 7)).toDF("g", "v")
    val e1 = Stats.kmvDistinct(big, "g", "v", k = 64).as[(String, Double)].head()._2
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.15, s"estimate $e1 off by >15%")
    val e2 = Stats.kmvDistinct(big.repartition(7), "g", "v", k = 64)
      .as[(String, Double)].head()._2
    assert(e1 == e2) // md5-keyed: partitioning cannot move the estimate
  }

  test("interpolateDaily: interior gaps interpolate, edges clamp") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val sparse = Seq((d("2024-01-02"), 100L), (d("2024-01-05"), 400L),
      (d("2024-01-06"), 0L)).toDF("day", "x")
    val got = Stats.interpolateDaily(sparse, "day", "x")
      .as[(java.sql.Date, Double, Boolean)].collect()
      .map { case (dd, v, p) => (dd.toString, v, p) }.toList
    assert(got == List(
      ("2024-01-02", 100.0, true),
      ("2024-01-03", 200.0, false), // 100 + 300*1/3
      ("2024-01-04", 300.0, false),
      ("2024-01-05", 400.0, true),
      ("2024-01-06", 0.0, true)))
  }

  test("clampedRunningSum: matches the sequential fold, clamps at zero") {
    // deltas 5,-10,3: sequential B = 5,0,3 (the -10 clamps at 0, so the
    // naive unclamped prefix sum -2 is WRONG — final must be 3)
    val d = Seq(("s", 1, 5L), ("s", 2, -10L), ("s", 3, 3L)).toDF("g", "t", "d")
    val r = Stats.clampedRunningSum(d, "g", Seq("t"), "d")
      .as[(String, Long, Long, Long)].head()
    assert(r == (("s", 3L, 5L, 1L))) // final 3, peak 5, one floor hit
    // property check vs the sequential fold on a pseudo-random walk
    val walk = (1 to 200).map(t => ("w", t, ((t * 131) % 23 - 11).toLong))
    val seqB = walk.scanLeft(0L) { case (b, (_, _, dd)) => math.max(0L, b + dd) }.tail
    val got = Stats.clampedRunningSum(walk.toDF("g", "t", "d").repartition(7),
      "g", Seq("t"), "d")
      .as[(String, Long, Long, Long)].head()
    assert(got._2 == seqB.last && got._3 == seqB.max
      && got._4 == seqB.count(_ == 0L))
  }

  test("cusumChangepoint: bit-identical under repartitioning") {
    val s = (1 to 50).map(t => (t, (t * 37 % 11) * 10L + (if (t > 30) 400L else 0L)))
    val a = Stats.cusumChangepoint(s.toDF("t", "x"), "t", "x").head()
    val b = Stats.cusumChangepoint(s.toDF("t", "x").repartition(7), "t", "x").head()
    assert(a == b)
  }

  test("rankAuc: hand-computed 2U with a tie; degenerate orderings") {
    // positives score {3, 2}, negatives {1, 2}: pairs (3,1)(3,2)(2,1)
    // win, (2,2) ties -> AUC = 3.5/4 = 0.875
    val df = Seq((3L, true), (2L, true), (1L, false), (2L, false))
      .toDF("score", "pos")
    val r = Stats.rankAuc(df, "score", "pos").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((7L, 2L, 2L, 875000L)))
    // perfect separation -> 1e6; perfectly wrong -> 0
    val hi = Seq((9L, true), (8L, true), (1L, false)).toDF("score", "pos")
    assert(Stats.rankAuc(hi, "score", "pos").head().getLong(3) == 1000000L)
    val lo = Seq((1L, true), (9L, false)).toDF("score", "pos")
    assert(Stats.rankAuc(lo, "score", "pos").head().getLong(3) == 0L)
  }

  test("rankAuc matches brute-force pair counting (differential, seeded)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 80).map(_ => (rnd.nextInt(9).toLong, rnd.nextInt(3) != 0))
      val r = Stats.rankAuc(rows.toDF("score", "pos"), "score", "pos").head()
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      val twoU = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert((r.getLong(0), r.getLong(1), r.getLong(2))
        == ((twoU, pos.size.toLong, neg.size.toLong)), s"seed $seed")
      assert(r.getLong(3) == twoU * 1000000L / (2L * pos.size * neg.size))
    }
    // NULL labels are excluded, not negatives
    val withNull = Seq((5L, Some(true)), (3L, None), (1L, Some(false)))
      .toDF("score", "pos")
    val rn = Stats.rankAuc(withNull, "score", "pos").head()
    assert((rn.getLong(1), rn.getLong(2)) == ((1L, 1L)))
  }

  test("ksPerGroup and mannWhitneyPerGroup match brute force (differential, seeded)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val groups = Seq("a", "b", "c")
      val rows = (1 to 90).map(_ => (groups(rnd.nextInt(3)), rnd.nextInt(12).toLong))
      val df = rows.toDF("g", "v")
      val allV = rows.map(_._2).distinct.sorted
      def split(g: String) =
        (rows.filter(_._1 == g).map(_._2), rows.filterNot(_._1 == g).map(_._2))

      val ks = Stats.ksPerGroup(df, "g", "v").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      for (g <- groups) {
        val (a, b) = split(g)
        val dRef = allV.map(v =>
          math.abs(a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size)).max
        assert(ks(g) == ((dRef, a.size.toLong, b.size.toLong)), s"KS $g seed $seed")
      }

      val mwu = Stats.mannWhitneyPerGroup(df, "g", "v").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      for (g <- groups) {
        val (a, b) = split(g)
        // 2U = sum over (x in a, y in b) of [2 if x>y, 1 if tie, 0 else]
        val u2Ref = (for (x <- a; y <- b)
          yield if (x > y) 2L else if (x == y) 1L else 0L).sum
        assert(mwu(g) == ((u2Ref, a.size.toLong, b.size.toLong)), s"MWU $g seed $seed")
      }
    }
    // a group whose values all tie: KS distance from the complement is
    // still well-defined; MWU reduces to pure tie credits
    val tied = (Seq.fill(4)(("t", 7L)) ++ Seq(("u", 5L), ("u", 9L))).toDF("g", "v")
    val kt = Stats.ksPerGroup(tied, "g", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // at v=7: F_t=4/4, F_u=1/2 -> |4*2 - 1*4| = 4; at v=5: |0*2-1*4|=4
    assert(kt("t") == 4L)
    val mt = Stats.mannWhitneyPerGroup(tied, "g", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // t vs u: 4 values of 7 against {5, 9}: each scores 2 (beats 5) + 0 = 8
    assert(mt("t") == 8L)
  }

  test("calibrationBins: integer bin edges, top edge folds into last bin") {
    val df = Seq((0L, false), (999999L, true), (1000000L, true),
      (500000L, true), (500001L, false)).toDF("score_e6", "pos")
    val bins = Stats.calibrationBins(df, "score_e6", "pos")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 0 -> bin 0; 500000/500001 -> bin 5; 999999 -> bin 9; 1000000 -> folds to 9
    assert(bins == Map(
      0L -> ((1L, 0L, 0L)),
      5L -> ((2L, 1L, 500000L)),
      9L -> ((2L, 2L, 1000000L))))
  }

  test("wilsonIntervals: textbook values; interval brackets p-hat inside [0,1]") {
    val df = (1 to 100).map(i => ("half", i <= 50)) ++
      (1 to 10).map(i => ("nine", i <= 9))
    val got = Stats.wilsonIntervals(df.toDF("g", "ok"), "g", col("ok"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // scipy.stats.binomtest proportion_ci(method='wilson') agrees to 1e-6
    assert(got("half") == ((100L, 50L, 403830L, 596170L)))
    assert(got("nine") == ((10L, 9L, 595844L, 982124L)))
    got.values.foreach { case (n, s, lo, hi) =>
      assert(lo >= 0L && hi <= 1000000L && lo <= s * 1000000L / n && s * 1000000L / n <= hi)
    }
  }

  test("jackknifeRatio: hand-computed replicates; zero SE for identical groups") {
    val rows = Seq(("g1", 5L, 1L), ("g1", 5L, 1L), // s=10, n=2
      ("g2", 6L, 1L), ("g2", 7L, 1L), ("g2", 7L, 1L)) ++ // s=20, n=3
      Seq.fill(5)(("g3", 6L, 1L)) // s=30, n=5
    val df = rows.toDF("g", "num", "den")
    val got = Stats.jackknifeRatio(df, "g", col("num"), col("den"))
      .as[(Long, Long, Long)].head()
    // per-group (s,n) = (10,2),(20,3),(30,5): replicates e6 = 6250000,
    // 5714285, 6000000; tbar 5988095; SE = floor(sqrt(143707874150*2/3)+.5)
    assert(got == ((6000000L, 3L, 309524L)))
    // identical groups -> every leave-one-out replicate equals theta -> SE 0
    val same = Seq(("a", 10L, 2L), ("b", 10L, 2L), ("c", 10L, 2L))
      .toDF("g", "num", "den")
    val z = Stats.jackknifeRatio(same, "g", col("num"), col("den"))
      .as[(Long, Long, Long)].head()
    assert(z == ((5000000L, 3L, 0L)))
  }

  test("cohenKappa: perfect, chance-corrected, and degenerate agreement") {
    // confusion (x,x)=20 (x,y)=10 (y,x)=5 (y,y)=15: po=0.70, kappa=0.40
    val pairs = (Seq.fill(20)(("x", "x")) ++ Seq.fill(10)(("x", "y")) ++
      Seq.fill(5)(("y", "x")) ++ Seq.fill(15)(("y", "y")) ++
      Seq(("x", null), (null, "y"))).toDF("a", "b") // NULLs excluded
    val got = Stats.cohenKappa(pairs, "a", "b").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == ((50L, 35L, 700000L, 400000L)))
    // perfect agreement -> kappa exactly 1
    val perfect = Seq(("p", "p"), ("q", "q"), ("r", "r")).toDF("a", "b")
    val p = Stats.cohenKappa(perfect, "a", "b").collect().head
    assert(p.getLong(2) == 1000000L && p.getLong(3) == 1000000L)
    // constant labels: pe = N^2 -> NULL kappa, not a division error
    val const = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
    val c = Stats.cohenKappa(const, "a", "b").collect().head
    assert(c.getLong(2) == 1000000L && c.isNullAt(3))
  }

  test("classificationReport: exact e6 PRF1; unseen-side classes get NULLs not crashes") {
    val pairs = (Seq.fill(20)(("x", "x")) ++ Seq.fill(10)(("x", "y")) ++
      Seq.fill(5)(("y", "x")) ++ Seq.fill(15)(("y", "y")) ++
      Seq(("z", "x"))).toDF("t", "p") // z never predicted
    val got = Stats.classificationReport(pairs, "t", "p")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    // x: tp=20 fp=6 fn=10 -> p 20/26, r 20/30, f1 40/56
    assert(got("x") == ((20L, 6L, 10L,
      Some(769230L), Some(666666L), Some(714285L))))
    assert(got("y") == ((15L, 10L, 5L,
      Some(600000L), Some(750000L), Some(666666L))))
    // never predicted: precision NULL, recall 0, f1 0
    assert(got("z") == ((0L, 0L, 1L, None, Some(0L), Some(0L))))
  }

  test("cupedAdjust: removes covariate-explained variance; constant x degrades to raw mean") {
    // theta = (4*6100 - 100*200)/(4*3000 - 100*100) = 2.2; arm means
    // 30/70 adjust to 52/48 (the pre-period explains most of the gap)
    val units = Seq(("A", 10L, 20L), ("A", 20L, 40L),
      ("B", 30L, 50L), ("B", 40L, 90L)).toDF("arm", "x", "y")
    val got = Stats.cupedAdjust(units, "arm", col("x"), col("y"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (a, n, m, j) => a -> ((n, m, j)) }.toMap
    assert(got == Map("A" -> ((2L, 30000000L, 52000000L)),
      "B" -> ((2L, 70000000L, 48000000L))))
    // constant covariate: zero variance -> adjustment is a no-op
    val const = Seq(("A", 5L, 20L), ("B", 5L, 40L)).toDF("arm", "x", "y")
    val c = Stats.cupedAdjust(const, "arm", col("x"), col("y"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (a, n, m, j) => a -> ((n, m, j)) }.toMap
    assert(c == Map("A" -> ((1L, 20000000L, 20000000L)),
      "B" -> ((1L, 40000000L, 40000000L))))
  }

  test("ewmaDaily: exact alpha=1/2 recursion; month-length headroom holds") {
    val daily = Seq(("d1", 100L), ("d2", 200L), ("d3", 300L)).toDF("day", "c")
    val got = Stats.ewmaDaily(daily, "day", "c")
      .as[(String, Long, Long)].collect()
      .map { case (d, c, e) => d -> ((c, e)) }.toMap
    // e1=100, e2=(200+100)/2=150, e3=(300+150)/2=225
    assert(got == Map("d1" -> ((100L, 100000000L)),
      "d2" -> ((200L, 150000000L)), "d3" -> ((300L, 225000000L))))
    // 30 days at the documented 1e7-cents/day ceiling: N_30 = 1e7·2^29
    // stays < 2^53, and the steady-state EWMA of a constant is the
    // constant (1e7 cents = 1e13 in e6 units), exactly
    val month = (1 to 30).map(i => (f"d$i%02d", 10000000L)).toDF("day", "c")
    val last = Stats.ewmaDaily(month, "day", "c")
      .as[(String, Long, Long)].collect().maxBy(_._1)
    assert(last == (("d30", 10000000L, 10000000000000L)))
  }

  test("kaplanMeier: hand-computed integer product-limit curve") {
    // 10 subjects, one group: 2 events at t=1, 1 censored at t=2,
    // 1 event at t=3, 2 censored at t=5, 1 event at t=8, 3 censored
    // at t=9. Steps only at event times; n_risk counts everyone with
    // duration >= t (same-time censorings still at risk, the standard
    // deaths-before-censorings convention).
    val subj = (Seq.fill(2)((1L, 1L)) ++ Seq((2L, 0L)) ++ Seq((3L, 1L)) ++
      Seq.fill(2)((5L, 0L)) ++ Seq((8L, 1L)) ++ Seq.fill(3)((9L, 0L)))
      .map { case (t, o) => ("g", t, o) }.toDF("grp", "dur", "obs")
    val got = Stats.kaplanMeier(subj, "grp", "dur", "obs")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq(
      ("g", 1L, 10L, 2L, 800000000L),           // 1e9 * 8 DIV 10
      ("g", 3L, 7L, 1L, 685714285L),            // 8e8 * 6 DIV 7
      ("g", 8L, 4L, 1L, 514285713L)))           // 685714285 * 3 DIV 4
  }

  test("kaplanMeier: a fully-censored group emits no curve rows") {
    val subj = Seq(("a", 5L, 0L), ("a", 7L, 0L), ("b", 2L, 1L))
      .toDF("grp", "dur", "obs")
    val got = Stats.kaplanMeier(subj, "grp", "dur", "obs")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("b", 2L, 1L, 1L, 0L))) // lone subject dies: S=0
  }

  test("spearmanByGroup: monotone=1, reversed=-1, textbook 0.8, constant NULL") {
    val df = Seq(
      // monotone but nonlinear: Spearman 1.0 where Pearson isn't
      ("up", 1.0, 1.0), ("up", 2.0, 4.0), ("up", 3.0, 9.0), ("up", 4.0, 16.0),
      ("down", 1.0, 16.0), ("down", 2.0, 9.0), ("down", 3.0, 4.0), ("down", 4.0, 1.0),
      // one swapped pair: rho = 1 - 6*2/(4*15) = 0.8
      ("mid", 1.0, 1.0), ("mid", 2.0, 3.0), ("mid", 3.0, 2.0), ("mid", 4.0, 4.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0), ("flat", 3.0, 5.0)
    ).toDF("g", "x", "y")
    val got = Stats.spearmanByGroup(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(got("up") == Some(1000000L))
    assert(got("down") == Some(-1000000L))
    assert(got("mid") == Some(800000L))
    assert(got("flat") == None)
  }

  test("spearmanByGroup: ties use average ranks (tie-correct rho)") {
    // x = [1,2,2,3] vs y strictly descending: doubled avg ranks for x
    // are [2,5,5,8]; rho = -0.94868... -> floor(-948683.298+0.5) = -948683
    val df = Seq((1.0, 40.0), (2.0, 30.0), (2.0, 20.0), (3.0, 10.0))
      .map { case (x, y) => ("t", x, y) }.toDF("g", "x", "y")
    val got = Stats.spearmanByGroup(df, "g", "x", "y").collect()
    assert(got.head.getLong(2) == -948683L)
  }

  test("mccPerLabel: symmetric 2-class MCC; undefined margins are NULL") {
    // confusion: (a,a)x4 (a,b)x1 (b,a)x2 (b,b)x3 -> for both classes
    // num = 4*3 - 2*1 = 10, den = sqrt(6)sqrt(5)sqrt(5)sqrt(4) = 10*sqrt(6)
    // MCC = 1/sqrt(6) = 0.4082482... -> 408248
    val pairs = (Seq.fill(4)(("a", "a")) ++ Seq(("a", "b")) ++
      Seq.fill(2)(("b", "a")) ++ Seq.fill(3)(("b", "b"))).toDF("t", "p")
    val got = Stats.mccPerLabel(pairs, "t", "p")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5))))).toMap
    assert(got("a") == ((4L, 2L, 1L, 3L, Some(408248L))))
    assert(got("b") == ((3L, 1L, 2L, 4L, Some(408248L))))
    // degenerate: class never predicted -> tp+fp = 0 -> NULL
    val onesided = Seq(("a", "a"), ("b", "a")).toDF("t", "p")
    val g2 = Stats.mccPerLabel(onesided, "t", "p")
      .collect().map(r => r.getString(0) -> Option(r.get(5))).toMap
    assert(g2("b") == None)
  }

  test("anovaF: textbook two-group F; degenerate inputs are NULL") {
    // A=[1,2,3] B=[5,6,7]: SSB=24, SSW=4, F=(24/1)/(4/4)=24 exactly
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 5L), ("B", 6L), ("B", 7L)).toDF("g", "x")
    val got = Stats.anovaF(df, "g", "x").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((6L, 2L, 24L, 4L, 24000000L)))
    // one group -> k < 2 -> NULL F
    val one = Seq(("A", 1L), ("A", 2L)).toDF("g", "x")
    assert(Option(Stats.anovaF(one, "g", "x").collect().head.get(4)) == None)
    // zero within-group variance -> NULL F
    val flat = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L)).toDF("g", "x")
    assert(Option(Stats.anovaF(flat, "g", "x").collect().head.get(4)) == None)
  }

  test("ndcgAtK: exact 0 and 1 endpoints at k=1; score ties break by id") {
    // top-scored item has rel 0 while an rel-3 item exists: ndcg@1 = 0,
    // idcg = (2^3-1)/log2(2) = 7e9 exactly
    val bad = Seq(("g", 1L, 10L, 0L), ("g", 2L, 5L, 3L), ("g", 3L, 1L, 1L))
      .toDF("grp", "id", "score", "rel")
    val b = Stats.ndcgAtK(bad, "grp", "id", "score", "rel", k = 1).collect().head
    assert((b.getLong(1), b.getLong(2), Option(b.get(3))) ==
      ((0L, 7000000000L, Some(0L))))
    // aligned ranking: ndcg = 1e6 exactly
    val good = Seq(("g", 1L, 10L, 3L), ("g", 2L, 5L, 1L))
      .toDF("grp", "id", "score", "rel")
    val g = Stats.ndcgAtK(good, "grp", "id", "score", "rel", k = 1).collect().head
    assert((g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((7000000000L, 7000000000L, 1000000L)))
    // tied scores: lower id wins the position (deterministic permutation)
    val tie = Seq(("g", 1L, 5L, 3L), ("g", 2L, 5L, 0L))
      .toDF("grp", "id", "score", "rel")
    val tt = Stats.ndcgAtK(tie, "grp", "id", "score", "rel", k = 1).collect().head
    assert(tt.getLong(3) == 1000000L)
  }

  test("cramersV: perfect 2x2 association is exactly 1; single class NULL") {
    val perfect = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L)).toDF("a", "b")
    val got = Stats.cramersV(perfect, "a", "b").collect().head
    // chi2 = 4 exactly (each of the 4 grid cells contributes 1)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((4000000L, 1L, 4L, 1000000L)))
    val flat = Seq(("x", 1L), ("x", 2L)).toDF("a", "b")
    assert(Option(Stats.cramersV(flat, "a", "b").collect().head.get(3)) == None)
  }

  test("oddsRatio: exact 2x2 cross-product ratio; empty margin NULL") {
    val df = Seq((true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false)).toDF("e", "o")
    val got = Stats.oddsRatio(df, "e", "o").collect().head
    // (2*2)/(1*1) = 4
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((2L, 1L, 1L, 2L, 4000000L)))
    val degen = Seq((true, true), (false, false)).toDF("e", "o")
    assert(Option(Stats.oddsRatio(degen, "e", "o").collect().head.get(4)) == None)
  }

  test("hhi: duopoly 0.5, monopoly 1.0, zero total NULL") {
    val df = Seq(("A", 1L, 50L), ("A", 2L, 50L), ("B", 1L, 7L),
      ("Z", 1L, 0L), ("Z", 2L, 0L)).toDF("g", "m", "v")
    val got = Stats.hhi(df, "g", "m", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got == Map("A" -> ((2L, Some(500000L))),
      "B" -> ((1L, Some(1000000L))), "Z" -> ((2L, None))))
  }

  test("seasonalNaiveSmape: one matched calendar day, exact terms") {
    val daily = Seq(("2024-01-01", 100L), ("2024-01-08", 150L),
      ("2024-01-09", 60L)).toDF("d", "v")
    val got = Stats.seasonalNaiveSmape(daily, "d", "v", seasonDays = 7)
      .collect().head
    // only 01-08 has a value 7 days prior: smape = 2*50/250 = 0.4, mae = 50
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((1L, 400000L, 50L)))
  }

  test("brierScore: exact integer squared-error means") {
    val df = Seq(("g", 1000000L, true), ("g", 0L, false),
      ("h", 500000L, true), ("h", 500000L, false)).toDF("grp", "p", "y")
    val got = Stats.brierScore(df, "grp", "p", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("g") == ((2L, 0L)))                    // perfectly confident+right
    assert(got("h") == ((2L, 250000000000L)))         // p=0.5 both ways: 0.25
  }
}
