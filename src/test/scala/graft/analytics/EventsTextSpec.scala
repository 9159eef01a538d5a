package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsTextSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.queries.t(spark, sf, "events")

  test("sessionize: gaps above threshold start new sessions") {
    val ts = Seq(0L, 60L, 5000L, 5060L, 99999L).map(s =>
      new java.sql.Timestamp(s * 1000))
    val df = ts.zipWithIndex.map { case (t, i) => (1L, t, i.toLong) }
      .toDF("user_id", "ts", "event_id")
    val out = Events.sessionCounts(df, "user_id", "ts", gapSeconds = 1800, "event_id")
    assert(out.select("n_sessions").as[Long].head() == 3L)
  }

  test("tumbling window counts partition all events exactly once") {
    val out = Events.tumbling(events, "ts", "1 hour", Seq.empty,
      Seq(count(lit(1)).as("n")))
    assert(out.agg(sum("n")).as[Long].head() == events.count())
  }

  test("sliding windows contain each event width/slide times") {
    val out = Events.sliding(events, "ts", "1 hour", "15 minutes", Seq.empty,
      Seq(count(lit(1)).as("n")))
    assert(out.agg(sum("n")).as[Long].head() == events.count() * 4)
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = Events.approxDistinct(events, Seq("event_type"), "user_id")
      .withColumnRenamed("approx_user_id", "a")
    val exact = events.groupBy("event_type")
      .agg(countDistinct($"user_id").as("e"))
    val joined = approx.join(exact, "event_type")
      .select(abs($"a" - $"e").cast("double") / $"e").as[Double].collect()
    assert(joined.forall(_ <= 0.05))
  }

  test("langId picks the lexicon with most hits, deterministic tie-break") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "el gato y la casa de los perros que"),
      (3L, "qwerty zxcvb asdfgh")).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "und")
  }

  test("fingerprint is whitespace/case-invariant, content-sensitive") {
    val df = Seq(("a B  c", "A b c", "a b d")).toDF("x", "y", "z")
    val r = df.select(
      TextAnalysis.fingerprint($"x").as("fx"),
      TextAnalysis.fingerprint($"y").as("fy"),
      TextAnalysis.fingerprint($"z").as("fz")).head()
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) != r.getString(2))
  }

  test("multimodal stub decode: deterministic features, bounded dims") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.withBinaryContent(docs, "doc_id", "text", "text")
    val feats = Multimodal.decodeStub(media)
    val r = feats.agg(
      min($"width"), max($"width"), min($"height"), max($"height"),
      sum(when($"n_bytes" > 0, 0).otherwise(1))).head()
    assert(r.getInt(0) >= 1 && r.getInt(1) <= 1920)
    assert(r.getInt(2) >= 1 && r.getInt(3) <= 1080)
    assert(r.getLong(4) == 0L) // every payload non-empty
    // deterministic: same input -> same checksum set
    val c1 = feats.select("checksum").as[String].collect().toSet
    val c2 = Multimodal.decodeStub(media).select("checksum").as[String].collect().toSet
    assert(c1 == c2)
  }

  test("decodeBatched (mapPartitions codec shape) agrees with decodeStub") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val media = Multimodal.withBinaryContent(docs, "doc_id", "text", "img")
    val a = Multimodal.decodeStub(media)
      .select("media_id", "n_bytes", "checksum", "width", "height")
      .collect().map(_.toSeq).toSet
    val b = Multimodal.decodeBatched(media, batchSize = 7)
      .toDF().select("media_id", "n_bytes", "checksum", "width", "height")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("chunkAudio: chunks tile each payload exactly, only the tail is short") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val media = Multimodal.withBinaryContent(docs, "doc_id", "text", "audio")
    val chunks = Multimodal.chunkAudio(media, bytesPerSecond = 8000L, chunkMs = 50L)
    val sizes = media.select($"media_id", length($"content").cast("long").as("nb"))
    val per = chunks.groupBy("media_id")
      .agg(sum($"byte_len").as("covered"), max($"byte_off" + $"byte_len").as("hi"),
        count(lit(1)).as("k"),
        sum(when($"byte_len" < 400L, 1L).otherwise(0L)).as("short_chunks"))
      .join(sizes, "media_id").collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val (covered, hi, k, short, nb) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(covered == nb, "chunks must cover every byte exactly once")
      assert(hi == nb, "last chunk must end at the payload boundary")
      assert(k == math.max((nb + 399) / 400, 1), "chunk count = ceil(nb/bpc)")
      assert(short <= 1, "only the tail chunk may be short")
    }
    // timestamps advance by the window
    val ts = chunks.filter($"chunk_idx" === 3L).select("ms_off").distinct().collect()
    ts.foreach(r => assert(r.getLong(0) == 150L))
  }

  test("resizeStub: aspect-preserving fit-in-box, no upscale, proportional thumbnail") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val media = Multimodal.withBinaryContent(docs, "doc_id", "text", "img")
    val out = Multimodal.resizeStub(media, targetW = 256, targetH = 256)
    val rows = out.select("src_width", "src_height", "out_width", "out_height", "thumb_bytes")
      .collect()
    rows.foreach { r =>
      val (sw, sh, ow, oh, tb) =
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
      assert(ow <= 256 && oh <= 256, "must fit the box")
      assert(ow <= sw && oh <= sh, "never upscale")
      // aspect preserved within 1px of the floor rounding
      val scale = math.min(math.min(256.0 / sw, 256.0 / sh), 1.0)
      assert(math.abs(ow - math.floor(sw * scale)) <= 1)
      assert(math.abs(oh - math.floor(sh * scale)) <= 1)
      assert(tb >= 1L)
    }
    // deterministic checksums
    val a = out.select("thumb_checksum").as[String].collect().toSet
    val b = Multimodal.resizeStub(media, 256, 256)
      .select("thumb_checksum").as[String].collect().toSet
    assert(a == b)
  }

  test("frame sampling explodes bounded frame rows per media") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(10)
    val media = Multimodal.withBinaryContent(docs, "doc_id", "text", "video")
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 4)
    assert(frames.count() >= 10)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_payload"))
  }

  test("funnel: strict first-touch ordering, out-of-order stops the depth") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: view < click < purchase -> depth 3
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2: clicked BEFORE first view -> depth stops at 1
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(3), "purchase"),
      // user 3: view only -> depth 1
      (3L, ts(1), "view"),
      // user 4: never viewed -> depth 0
      (4L, ts(1), "purchase"),
      // user 5: view then purchase, no click -> depth 1
      (5L, ts(1), "view"), (5L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 1L, 1L -> 3L, 0L -> 1L))
  }

  test("rollingActiveUsers: trailing window counts exactly") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // u1 active day 1 and 10; u2 active days 1-3
    val ev = Seq((1L, ts(1)), (1L, ts(10)),
      (2L, ts(1)), (2L, ts(2)), (2L, ts(3))).toDF("user_id", "ts")
    val got = Events.rollingActiveUsers(ev, "user_id", "ts", windowDays = 3)
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, n) => d.toString -> n }.toMap
    // day 1-3 see both users; day 4 still sees u2 (active day 2,3);
    // day 5 sees u2 (day 3); day 6+ nobody until u1's day-10 activity
    assert(got("2024-01-01") == 2L && got("2024-01-03") == 2L)
    assert(got("2024-01-04") == 1L && got("2024-01-05") == 1L)
    assert(!got.contains("2024-01-06") && !got.contains("2024-01-09"))
    assert(got("2024-01-10") == 1L && got("2024-01-12") == 1L)
  }

  test("userGrowth: new-user counts partition users, cumulative is monotone") {
    val ev = graft.queries.t(spark, sf, "events")
    val g = Events.userGrowth(ev, "user_id", "ts")
      .orderBy("day")
      .as[(java.sql.Date, Long, Long)].collect()
    val users = ev.select("user_id").distinct().count()
    assert(g.map(_._2).sum == users)
    assert(g.last._3 == users)
    // running total is the prefix sum of the daily news
    assert(g.scanLeft(0L)(_ + _._2).tail.toSeq == g.map(_._3).toSeq)
  }

  test("forwardFill: LOCF repairs nulls, leading nulls stay null") {
    val rows = Seq(
      ("a", 1L, Some(10L)), ("a", 2L, None), ("a", 3L, None),
      ("a", 4L, Some(40L)), ("a", 5L, None),
      ("b", 1L, None), ("b", 2L, Some(7L)), ("b", 3L, None)
    ).toDF("k", "seq", "v")
    val got = Events.forwardFill(rows, "k", Seq("seq"), Seq("v"))
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got == Set(
      ("a", 1L, Some(10L)), ("a", 2L, Some(10L)), ("a", 3L, Some(10L)),
      ("a", 4L, Some(40L)), ("a", 5L, Some(40L)),
      ("b", 1L, None), ("b", 2L, Some(7L)), ("b", 3L, Some(7L))))
  }

  test("forwardFill: n fill columns ride ONE window (one exchange, one sort)") {
    val rows = Seq(("a", 1L, Some(1L), Some(2L)), ("a", 2L, None, None))
      .toDF("k", "seq", "x", "y")
    val plan = Events.forwardFill(rows, "k", Seq("seq"), Seq("x", "y"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(" Window ".r.findAllIn(plan).size <= 1 &&
      "Window".r.findAllIn(plan).nonEmpty, plan)
  }

  test("gapFillDaily: missing days zero-filled within each key's span only") {
    import java.sql.Timestamp
    val ev = Seq(
      ("u1", "2024-02-01"), ("u1", "2024-02-01"), ("u1", "2024-02-04"),
      ("u2", "2024-02-10")
    ).map { case (u, d) => (u, Timestamp.valueOf(s"$d 12:00:00")) }
      .toDF("u", "ts")
    val got = Events.gapFillDaily(ev, "u", "ts")
      .as[(String, java.sql.Date, Long)].collect()
      .map { case (u, d, n) => (u, d.toString, n) }.toSet
    assert(got == Set(
      ("u1", "2024-02-01", 2L), ("u1", "2024-02-02", 0L),
      ("u1", "2024-02-03", 0L), ("u1", "2024-02-04", 1L),
      // u2's single-day span gets no padding, and u1's span does not
      // bleed into u2's calendar
      ("u2", "2024-02-10", 1L)))
  }

  test("timeWeightedAvg: holding-duration weights, single-sample key is NULL") {
    import java.sql.Timestamp
    val ev = Seq(
      // u1: 10 held 1s, then 20 held 3s, last sample open -> (10+60)/4
      ("u1", Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 10L),
      ("u1", Timestamp.valueOf("2024-01-01 00:00:01"), 2L, 20L),
      ("u1", Timestamp.valueOf("2024-01-01 00:00:04"), 3L, 99L),
      // u2: one sample, no span -> NULL
      ("u2", Timestamp.valueOf("2024-01-01 00:00:00"), 4L, 5L)
    ).toDF("u", "ts", "eid", "v")
    val got = Events.timeWeightedAvg(ev, "u", "ts", "eid", "v")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("u1") == Some(17.5))
    assert(got("u2") == None)
  }

  test("eventTransitions: consecutive pairs per user, firsts open nothing") {
    import java.sql.Timestamp
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      ("u1", ts(0), 1L, "view"), ("u1", ts(1), 2L, "click"),
      ("u1", ts(2), 3L, "view"),
      ("u2", ts(0), 4L, "view"), ("u2", ts(5), 5L, "click")
    ).toDF("u", "ts", "eid", "et")
    val got = Events.eventTransitions(ev, "u", "ts", "eid", "et")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("view", "click", 2L), ("click", "view", 1L)))
  }

  test("trailingFeature: strict pre-day window, same-day facts agree") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val facts = Seq(
      ("u1", ts(1), 100L), ("u1", ts(1), 50L), // day 1: two same-day facts
      ("u1", ts(2), 10L),                      // day 2 sees day 1 only
      ("u1", ts(30), 7L),                      // day 30 still sees days 1-2
      ("u1", ts(31), 1L)                       // day 31 sees days 1-30
    ).toDF("u", "ts", "v")
    val got = Events.trailingFeature(facts, "u", "ts", "v", 30)
      .collect().map(r => (r.getTimestamp(1), r.getLong(2)) -> r.getLong(3)).toMap
    // day-1 facts see nothing (strictly before day 1 is empty), and
    // BOTH see the same value despite different intra-day values
    assert(got((ts(1), 100L)) == 0L && got((ts(1), 50L)) == 0L)
    assert(got((ts(2), 10L)) == 150L) // day 1 only, never its own day
    assert(got((ts(30), 7L)) == 160L) // days 1+2 inside [day0, day29]
    assert(got((ts(31), 1L)) == 167L) // day 1 exits? [1,30]: 150+10+7
  }

  test("audienceOverlap: sketch intersections track exact set algebra") {
    val ev = graft.queries.t(spark, sf, "events")
    val got = Events.audienceOverlap(ev, "event_type", "user_id")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val byType = ev.select("event_type", "user_id")
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.nonEmpty)
    got.foreach { case ((a, b), (both, onlyA, onlyB)) =>
      val (sa, sb) = (byType(a), byType(b))
      def ok(est: Long, exact: Int) =
        math.abs(est - exact) <= math.max(2L, (exact * 0.05).toLong)
      assert(ok(both, (sa & sb).size), s"($a,$b) both: $both vs ${(sa & sb).size}")
      assert(ok(onlyA, (sa -- sb).size), s"($a,$b) onlyA")
      assert(ok(onlyB, (sb -- sa).size), s"($a,$b) onlyB")
    }
  }

  test("hllDailyToWeekly: merge-of-days tracks the direct weekly sketch and exact") {
    val ev = graft.queries.t(spark, sf, "events")
    val merged = Events.hllDailyToWeekly(ev, "user_id", "ts")
      .as[(java.sql.Date, Long)].collect().toMap
    // direct weekly sketch over the raw stream: register-max union is
    // bit-identical only while both paths stay in coupon mode (true at
    // this scale); once dense the HLL_4 estimator and the HLL_8 union
    // gadget diverge ~0.4% (measured at sf0.1) — the operator contract
    // is the 1% consistency band the q133 verdict pins.
    val direct = ev
      .groupBy(date_trunc("week", to_date($"ts")).cast("date").as("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))).as("e"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (w, m) =>
      assert(math.abs(m - direct(w)) <= math.max(1L, direct(w) / 100),
        s"week $w: merged $m vs direct ${direct(w)}")
    }
    // and the estimate tracks the exact weekly distinct within the
    // lgK=12 error band (~1.6% rse; 5% is > 3 sigma)
    val exact = ev
      .groupBy(date_trunc("week", to_date($"ts")).cast("date").as("week"))
      .agg(countDistinct($"user_id").as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(exact.keySet == merged.keySet)
    exact.foreach { case (w, n) =>
      assert(math.abs(merged(w) - n) <= math.max(1L, (n * 0.05).toLong),
        s"week $w: hll ${merged(w)} vs exact $n")
    }
  }

  test("mergeIntervals: overlap chains merge, touching != overlapping") {
    val iv = Seq(
      // key A: [0,10] [5,20] [20,30] chain -> one island [0,30]
      // ([20,30] starts AT the running max 20, lo > prev_hi is false)
      ("A", 0L, 10L), ("A", 5L, 20L), ("A", 20L, 30L),
      // key A: [40,50] separate island
      ("A", 40L, 50L),
      // key B: containment [0,100] swallows [10,20]
      ("B", 0L, 100L), ("B", 10L, 20L),
      // key C: lo == prev_hi + 1 -> a NEW island (strictly after)
      ("C", 0L, 10L), ("C", 11L, 20L)
    ).toDF("k", "lo", "hi")
    val got = Events.mergeIntervals(iv, "k", "lo", "hi")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("A", 0L, 30L, 3L), ("A", 40L, 50L, 1L),
      ("B", 0L, 100L, 2L),
      ("C", 0L, 10L, 1L), ("C", 11L, 20L, 1L)))
  }

  test("dailyAnomalies: planted spike flagged, warm-up and steady days not") {
    import java.sql.Timestamp
    // type "a": ~100 events/day for 14 days with mild jitter, then a
    // 5x spike on day 15; jitter keeps window variance nonzero
    val rows = (1 to 15).flatMap { d =>
      val n = if (d == 15) 500 else 100 + (d % 3)
      (1 to n).map(i =>
        (s"a", Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")))
    }.toDF("event_type", "ts")
    val out = Events.dailyAnomalies(rows, "event_type", "ts",
      windowDays = 7, zThreshold = 3)
      .as[(String, java.sql.Date, Long, Long, Long, Boolean)].collect()
      .map(r => r._2.toString -> r._6).toMap
    assert(out("2024-03-15"), "spike day must be flagged")
    // warm-up days (< 7 predecessors) are never flagged
    (1 to 7).foreach(d => assert(!out(f"2024-03-$d%02d"), s"warm-up day $d flagged"))
    // steady days in between are not flagged
    (8 to 14).foreach(d => assert(!out(f"2024-03-$d%02d"), s"steady day $d flagged"))
  }

  test("retentionCohorts: week-0 counts are cohort sizes, offsets bounded") {
    val ev = graft.queries.t(spark, sf, "events")
    val m = Events.retentionCohorts(ev, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
    // every cohort has a week-0 row, and it's the cohort's largest count
    val byCohort = m.groupBy(_._1)
    byCohort.foreach { case (cw, rows) =>
      val w0 = rows.find(_._2 == 0L)
      assert(w0.isDefined, s"cohort $cw missing week 0")
      assert(rows.forall(_._3 <= w0.get._3), s"cohort $cw retains > size")
      assert(rows.forall(_._2 >= 0L))
    }
    // cohort sizes partition the user base
    val users = ev.select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == users)
  }

  test("topPaths: time-ordered within session, sessions split paths, ties on path asc") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val df = Seq(
      // user 1, one session, out-of-order event_ids: order is by ts
      (1L, ts(0), 10L, "view"), (1L, ts(60), 5L, "cart"), (1L, ts(120), 7L, "buy"),
      // user 1, second session (gap > 1800s)
      (1L, ts(9000), 20L, "view"),
      // user 2, one session with the same path as user 1's first
      (2L, ts(0), 30L, "view"), (2L, ts(10), 31L, "cart"), (2L, ts(20), 32L, "buy"),
      // user 3, a singleton path tied at count 1 with user 1's "view"
      (3L, ts(0), 40L, "search")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.topPaths(df, "user_id", "ts", "event_type", 1800L, "event_id", 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("view>cart>buy", 2L), ("search", 1L), ("view", 1L)))
  }

  test("dowSeasonality: flat week indexes 1e6; missing days absent; skew indexes up") {
    def day(d: Int) = new java.sql.Timestamp(d.toLong * 86400 * 1000)
    // type "flat": one event per day over exactly 2 weeks -> every dow index 1e6
    val flat = (0 until 14).map(d => ("flat", day(d)))
    // type "spiky": 6 events on dow 0, 1 on dow 1 -> 6*7e6/7 and 1e6
    val spiky = Seq.fill(6)(("spiky", day(0))) :+ (("spiky", day(1)))
    val got = Events.dowSeasonality(
        (flat ++ spiky).toDF("event_type", "ts"), "event_type", "ts")
      .as[(String, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> ((r._3, r._4))).toMap).toMap
    assert(got("flat").keySet == (0 to 6).toSet)
    assert(got("flat").values.forall(_ == ((2L, 1000000L))))
    assert(got("spiky").keySet == Set(0, 1)) // absent days yield no row
    assert(got("spiky")(0) == ((6L, 6000000L)))
    assert(got("spiky")(1) == ((1L, 1000000L)))
  }

  test("peakConcurrency: overlap counting, closing-instant handoff, first-peak instant") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // u1 session [0, 100]; u2 [50, 150]; u3 [100, 200]: at t=100 all
    // three overlap (u1 is live THROUGH its closing instant) -> peak 3.
    // u4 [5000, 5100], u5 [5050, 5150]: later peak of only 2.
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(100), 2L),
      (2L, ts(50), 3L), (2L, ts(150), 4L),
      (3L, ts(100), 5L), (3L, ts(200), 6L),
      (4L, ts(5000), 7L), (4L, ts(5100), 8L),
      (5L, ts(5050), 9L), (5L, ts(5150), 10L)
    ).toDF("user_id", "ts", "event_id")
    val r = Events.peakConcurrency(df, "user_id", "ts", 1800L, "event_id")
      .collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getTimestamp(1) == ts(100)) // first instant the peak is hit
  }

  test("entryExitProfile: entries/exits per session; singleton session is a bounce") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val df = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(60), 2L, "buy"),  // view enters, buy exits
      (2L, ts(0), 3L, "view"),                            // bounce on view
      (2L, ts(9000), 4L, "buy"), (2L, ts(9060), 5L, "view") // buy enters, view exits
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.entryExitProfile(df, "user_id", "ts", "event_type",
        1800L, "event_id")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("view") == ((2L, 2L, 1L, 3L))) // 2 entries, 2 exits, 1 bounce
    assert(got("buy") == ((1L, 1L, 0L, 2L)))
  }

  test("sequenceFunnel: strict-after, inclusive gap edge, greedy-earliest step times") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 5L), (1L, "purchase", 8L), // depth 3
      (2L, "view", 0L), (2L, "click", 11L),                      // click outside 10s -> 1
      (3L, "view", 0L), (3L, "click", 0L),                       // not strictly after -> 1
      (4L, "click", 0L),                                         // never viewed -> 0
      (5L, "view", 0L), (5L, "click", 10L),                      // inclusive edge -> 2
      // greedy takes click@2; purchase@13 is outside ITS window even
      // though click@9 would have admitted it -> depth 2
      (6L, "view", 0L), (6L, "click", 2L), (6L, "click", 9L), (6L, "purchase", 13L)
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")
    val got = Events.sequenceFunnel(rows, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), gapSeconds = 10L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("linearAttribution: equal split, lookback edges, direct fallback") {
    def ts(h: Long) = new java.sql.Timestamp(h * 3600 * 1000)
    val rows = Seq(
      // user 1: 2 in-window touches -> 5.00 each; the view AT the
      // purchase instant is excluded (strictly-before)
      (1L, "view", ts(0), 0.0), (1L, "click", ts(5), 0.0),
      (1L, "view", ts(10), 0.0), (1L, "purchase", ts(10), 10.0),
      // user 2: touch 8 days old -> outside 7-day lookback -> direct
      (2L, "click", ts(-8 * 24), 0.0), (2L, "purchase", ts(0), 7.0),
      // user 3: no touches at all -> direct
      (3L, "purchase", ts(0), 3.0)
    ).toDF("user_id", "event_type", "ts", "value")
    val got = Events.linearAttribution(rows, "user_id", "ts", "event_type",
        "value", Seq("view", "click"), "purchase")
      .as[(String, BigDecimal, Long)].collect()
      .map(r => r._1 -> ((r._2.toDouble, r._3))).toMap
    assert(got == Map( // attributed is integer-cents scaled
      "view" -> ((500.0, 1L)), "click" -> ((500.0, 1L)),
      "direct" -> ((1000.0, 2L)))) // 7.00 + 3.00 credited direct
  }

  test("linearAttribution: credits conserve total conversion value") {
    def ts(m: Long) = new java.sql.Timestamp(m * 60 * 1000)
    // pseudo-random activity; invariant: sum of credits == sum of values
    val rows = (1 to 300).map { i =>
      val u = i % 7L
      val typ = Seq("view", "click", "signup", "purchase")(i % 4)
      (u, typ, ts(i * 31L % 5000), if (typ == "purchase") (i % 50) + 0.25 else 0.0)
    }.toDF("user_id", "event_type", "ts", "value")
    val total = rows.filter($"event_type" === "purchase")
      .agg(sum(floor($"value" * 100 + 0.5).cast("long"))).as[Long].head()
    val attributed = Events.linearAttribution(rows, "user_id", "ts",
        "event_type", "value", Seq("view", "click", "signup"), "purchase")
      .agg(sum($"attributed")).as[BigDecimal].head()
    // attributed is cents; equal-split rounding loses < 1e-6 per credit
    assert((attributed - BigDecimal(total)).abs < BigDecimal(0.01))
  }

  test("frameDedup: shared aligned slices found, unique media silent") {
    val docs = Seq(
      (1L, "SHAREDPREFIX0000" + "a" * 20),
      (2L, "SHAREDPREFIX0000" + "b" * 30),
      (3L, "totally different content here")).toDF("doc_id", "text")
    val media = Multimodal.withBinaryContent(docs, "doc_id", "text", "video")
    val got = Multimodal.frameDedup(media, frameBytes = 16, stride = 4)
      .as[(String, Long, Long)].collect()
    // exactly one frame hash (the shared 16-byte frame 0) in 2 media
    assert(got.length == 1 && got.head._2 == 2L && got.head._3 == 2L)
  }

  test("sourceOverlap: identical corpora give J=1, disjoint pairs absent") {
    val docs = Seq(
      ("A", "the quick brown fox jumps"), // A and B share all shingles
      ("B", "the quick brown fox jumps"),
      ("B", "the quick brown fox leaps"), // plus one B-only shingle set
      ("C", "totally different words entirely here")
    ).toDF("source", "text")
    val got = Dedup.sourceOverlap(docs, "source", "text", n = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // A: 3 shingles; B: those 3 + "brown fox leaps" etc.
    val ab = got(("A", "B"))
    assert(ab._1 == 3L && ab._2 == 3L) // all of A's shingles overlap
    assert(!got.contains(("A", "C")) && !got.contains(("B", "C")))
  }

  test("rfmSegments: quintiles with deterministic tie-break, best=555 worst=111") {
    import java.sql.Date
    // 5 customers, one order each except c5 (2 orders): recency ranks
    // c5 (latest) ... c1 (oldest); frequency all 1 except c5=2; monetary
    // strictly increasing with custkey.
    val orders = Seq(
      (1L, Date.valueOf("2024-01-01"), 100L),
      (2L, Date.valueOf("2024-02-01"), 200L),
      (3L, Date.valueOf("2024-03-01"), 300L),
      (4L, Date.valueOf("2024-04-01"), 400L),
      (5L, Date.valueOf("2024-05-01"), 250L),
      (5L, Date.valueOf("2024-05-02"), 251L)
    ).toDF("ck", "d", "amt")
    val got = Events.rfmSegments(orders, "ck", "d", col("amt"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(7)))).toMap
    // c5: most recent (r_days=0, r=5), highest freq (f=5), m=501 ranks 5th
    assert(got(5L) == ((0L, 2L, 501L, "555")))
    // c1: oldest, f ties at 1 broken by custkey -> lowest quintile everywhere
    assert(got(1L) == ((122L, 1L, 100L, "111")))
    // frequency ties (c1..c4 all 1) assign quintiles by custkey order
    assert(got(2L)._4(1) == '2' && got(3L)._4(1) == '3' && got(4L)._4(1) == '4')
  }

  test("lifecycleStatus: thresholds are strict greater-than") {
    import java.sql.Date
    val mx = Date.valueOf("2024-12-31")
    val orders = Seq(
      (1L, mx),                           // 0 days -> active
      (2L, Date.valueOf("2024-07-04")),   // 180 days -> active (not > 180)
      (3L, Date.valueOf("2024-07-03")),   // 181 days -> at_risk
      (4L, Date.valueOf("2023-12-31")),   // 366 days -> churned
      (5L, Date.valueOf("2024-01-01"))    // 365 days -> at_risk (not > 365)
    ).toDF("ck", "d")
    val got = Events.lifecycleStatus(orders, "ck", "d", 180, 365)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((0L, "active")))
    assert(got(2L) == ((180L, "active")))
    assert(got(3L) == ((181L, "at_risk")))
    assert(got(4L) == ((366L, "churned")))
    assert(got(5L) == ((365L, "at_risk")))
  }

  test("sequencePatternCounts: non-overlapping v..p conversions in ts order") {
    import org.apache.spark.sql.functions._
    // user 1: v c p v v p p -> "vcpvvpp" -> 2 non-overlapping 'v[^p]*p'
    // user 2: p c v -> no conversion
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "view"), (1L, 5L, "view"), (1L, 6L, "purchase"),
      (1L, 7L, "purchase"),
      (2L, 1L, "purchase"), (2L, 2L, "click"), (2L, 3L, "view")
    ).toDF("user_id", "sec", "event_type")
      .select(col("user_id"), to_timestamp(col("sec")).as("ts"),
        col("sec").as("event_id"), col("event_type"))
    val got = Events.sequencePatternCounts(ev, "user_id", "ts",
        "event_type", "event_id", "v[^p]*p")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((7L, 2L)), 2L -> ((3L, 0L))))
  }

  test("burstiness: metronome is exactly -1; hand-computed mixed gaps") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      ("tick", 0L), ("tick", 10L), ("tick", 20L),      // equal gaps -> -1
      ("mix", 0L), ("mix", 1L), ("mix", 4L)            // gaps 1,3 -> -1/3
    ).toDF("stream", "sec")
      .select(col("stream"), to_timestamp(col("sec")).as("ts"), col("sec").as("event_id"))
    val got = Events.burstiness(ev, "stream", "ts", "event_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("tick" -> ((2L, -1000000L)), "mix" -> ((2L, -333333L))))
  }

  test("sentimentScore: hand-computed valences, labels, and zero-shuffle plan") {
    import graft.analytics.TextAnalysis
    val docs = Seq(
      (1L, "service was GOOD and fast"),     // good(3) + fast(1) = 4
      (2L, "slow and terrible error"),       // slow(-1) terrible(-5) error(-2) = -8
      (3L, "the line was open"),             // no lexicon hits
      (4L, "good good bad"),                 // 3 + 3 - 3 = 3, every occurrence counts
      (5L, "  fast  "),                      // trim + tokenize -> fast(1)
      (6L, "")                               // empty text -> one '' token, no hits
    ).toDF("doc_id", "text")
    val got = TextAnalysis.sentimentScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 4L, "positive")))
    assert(got(2L) == ((3L, -8L, "negative")))
    assert(got(3L) == ((0L, 0L, "neutral")))
    assert(got(4L) == ((3L, 3L, "positive")))
    assert(got(5L) == ((1L, 1L, "positive")))
    assert(got(6L) == ((0L, 0L, "neutral")))
    // the scaladoc's scale claim, pinned: an in-row map-literal probe
    // must plan as a pure projection — no Exchange, no Join
    val plan = TextAnalysis.sentimentScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"sentimentScore must be a zero-shuffle projection:\n$plan")
  }

  test("sentimentScore negation: immediate-predecessor cue flips the valence") {
    import graft.analytics.TextAnalysis
    val docs = Seq(
      (1L, "not good"),            // good(3) flipped -> -3
      (2L, "never slow again"),    // slow(-1) flipped -> +1
      (3L, "good not bad"),        // 3 + flipped(-3->+3) = 6
      (4L, "not the good one"),    // 'the' breaks adjacency: good stays +3
      (5L, "not not good"),        // only the IMMEDIATE predecessor counts:
                                   // second 'not' negates good -> -3
      (6L, "not"),                 // lone negator scores nothing
      (7L, "fast")                 // no negation context -> +1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.sentimentScore(docs, "doc_id", "text",
        negators = TextAnalysis.Negators)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((1L, -3L, "negative")))
    assert(got(2L) == ((1L, 1L, "positive")))
    assert(got(3L) == ((2L, 6L, "positive")))
    assert(got(4L) == ((1L, 3L, "positive")))
    assert(got(5L) == ((1L, -3L, "negative")))
    assert(got(6L) == ((0L, 0L, "neutral")))
    assert(got(7L) == ((1L, 1L, "positive")))
    // negation mode is still a zero-shuffle projection
    val plan = TextAnalysis.sentimentScore(docs, "doc_id", "text",
        negators = TextAnalysis.Negators)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"negation-aware sentiment must stay a projection:\n$plan")
  }
}
