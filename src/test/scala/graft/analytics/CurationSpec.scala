package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, exhaustive, and close to requested fractions") {
    val ids = (0L until 10000L).toDF("id")
    val splits = Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)
    val once = Curation.hashSplit(ids, "id", splits, salt = "v1")
    val counts = once.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L) // every row labeled exactly once
    assert(math.abs(counts("train") - 9800L) < 100)
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
    // content-independent determinism: same ids -> same assignment
    val twice = Curation.hashSplit(ids, "id", splits, salt = "v1")
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
    // different salt -> different assignment (resplittable corpora)
    val other = Curation.hashSplit(ids, "id", splits, salt = "v2")
    assert(once.except(other).count() > 0)
  }

  test("sampleByDomain: per-domain rates hold, sampling is deterministic") {
    val rows = (0L until 8000L).map(i => (i, if (i % 2 == 0) "keep" else "thin"))
      .toDF("id", "domain")
    val sampled = Curation.sampleByDomain(rows, "id", "domain",
      rates = Map("thin" -> 0.25), salt = "s1")
    val counts = sampled.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(counts("keep") == 4000L) // rate 1.0 keeps every row
    assert(math.abs(counts("thin") - 1000L) < 150) // ~25% of 4000
    val again = Curation.sampleByDomain(rows, "id", "domain",
      rates = Map("thin" -> 0.25), salt = "s1")
    assert(sampled.except(again).isEmpty && again.except(sampled).isEmpty)
  }

  test("writeSized bounds rows per output file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sized").toString
    val rows = (0L until 1000L).toDF("id")
    graft.operators.Layout.writeSized(rows, s"$dir/t", "id",
      rowsPerFile = 100L, totalRows = 1000L)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 1000L)
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length >= 10, s"expected >=10 files, got ${files.length}")
    // no file holds more than the cap
    files.foreach { f =>
      assert(spark.read.parquet(f.getAbsolutePath).count() <= 100L)
    }
  }

  test("contamination: identical doc fully tainted, unrelated doc clean") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst optimizer rewrites logical plans before execution")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("bench_id", "text")
    val byId = Curation.contamination(train, "doc_id", "text", bench, "text", n = 3)
      .select("id", "n_sh", "n_contaminated").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L)._1 == byId(1L)._2) // every shingle of doc 1 is in bench
    assert(byId(2L)._2 == 0L)          // doc 2 shares nothing
  }

  test("contaminationBloom matches contamination exactly (differential)") {
    // the bloom prefilter must be invisible in the RESULT: false
    // positives die in the verify join, and bloom filters have no false
    // negatives, so every (id, counts) row is identical
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = Curation.contamination(train, "doc_id", "text", bench, "text")
    val bloom = Curation.contaminationBloom(train, "doc_id", "text", bench, "text")
    assert(exact.except(bloom).isEmpty && bloom.except(exact).isEmpty)
  }

  test("contaminationBloom stays exact with a deliberately overloaded filter") {
    // expectedItems far below the true shingle count drives the
    // false-positive rate up; the result must not change (sizing is a
    // performance knob, never a correctness one)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = Curation.contamination(train, "doc_id", "text", bench, "text")
    val tiny = Curation.contaminationBloom(train, "doc_id", "text", bench, "text",
      expectedItems = 64, fpp = 0.5)
    assert(exact.except(tiny).isEmpty && tiny.except(exact).isEmpty)
  }

  test("exclusivePrefixSum matches the single-partition window (differential)") {
    val rows = (1L to 1000L).map(i => (i, (i * 2654435761L) % 97 + 1)).toDF("id", "v")
    val expected = rows.withColumn("ps",
      coalesce(sum($"v").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "ps").as[(Long, Long)].collect().toMap
    for (parts <- Seq(3, 7, 32)) {
      val got = Curation.exclusivePrefixSum(rows, "id", "v", "ps", numParts = parts)
        .select("id", "ps").as[(Long, Long)].collect().toMap
      assert(got == expected, s"prefix sum diverged at numParts=$parts")
    }
  }

  test("exclusivePrefixSum survives a nondeterministically-partitioned upstream") {
    // Regression for the sf0.1 q78 bin corruption: when the input is a
    // shuffle join (partition layout chosen at runtime by AQE), the
    // unfixed implementation re-derived repartitionByRange twice — once
    // for the local cumsums, once for the offsets — and the two
    // recomputations could sample DIFFERENT range boundaries, pairing
    // rows with offsets from a partitioning they were never in. The
    // deterministic ground truth must hold no matter how the upstream
    // was laid out.
    val left = (1L to 20000L).map(i => (i, (i * 2654435761L) % 997 + 1))
      .toDF("id", "v")
    val right = (1L to 20000L).filter(_ % 3 != 0).map(i => (i, i % 11))
      .toDF("id", "tag")
    val joined = left.repartition(8, $"v").join(right, Seq("id"))
      .select("id", "v")
    val expected = joined.withColumn("ps",
      coalesce(sum($"v").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "ps").as[(Long, Long)].collect().toMap
    for (trial <- 1 to 3) {
      val got = Curation.exclusivePrefixSum(joined, "id", "v", "ps", numParts = 16)
        .select("id", "ps").as[(Long, Long)].collect().toMap
      assert(got == expected, s"prefix sum diverged on join upstream, trial $trial")
    }
  }

  test("chunkDocuments at stride == chunkSize reconstructs the doc (property)") {
    val texts = Seq(
      (1L, (1 to 257).map(i => s"w$i").mkString(" ")), // 257 = 2 full + ragged tail
      (2L, (1 to 64).map(i => s"w$i").mkString(" ")),  // exactly half a chunk
      (3L, "one"))
    val chunks = Curation.chunkDocuments(texts.toDF("doc_id", "text"),
      "doc_id", "text", chunkSize = 128, stride = 128)
      .as[(Long, Int, Long, Long, String)].collect()
    for ((id, text) <- texts) {
      val mine = chunks.filter(_._1 == id).sortBy(_._2)
      // non-overlapping chunks concatenate back to the original text
      assert(mine.map(_._5).mkString(" ") == text, s"doc $id")
      // every chunk except the last is exactly chunkSize tokens
      assert(mine.init.forall(_._4 == 128L), s"doc $id")
    }
  }

  test("packSequences bins are nondecreasing in pack order (property)") {
    val rows = (1L to 500L).map(i => (i, (i * 7919) % 300 + 1)).toDF("id", "n")
    val bins = Curation.packSequences(rows, "id", "n", budget = 1000L)
      .orderBy("id").select("bin").as[Long].collect()
    assert(bins.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(bins.last > 0) // multiple bins actually produced
  }

  test("curateCorpus: scrub -> gates -> dedup -> split -> pack, end to end") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // plant: an exact dup of doc 0 (id 9000), a near-dup of doc 1
    // (id 9001), and a junk doc that must fail the quality gates
    val d0 = docs.filter($"doc_id" === 0).select($"text").as[String].head()
    val d1 = docs.filter($"doc_id" === 1).select($"text").as[String].head()
    val planted = docs.unionAll(Seq(
      (9000L, "  " + d0.toUpperCase + " "),
      (9001L, d1 + " extra tail token"),
      (9002L, "#### %%%% @@@@")).toDF("doc_id", "text"))
    val out = Curation.curateCorpus(planted, "doc_id", "text",
      Curation.CurateConfig(jaccardNum = 1, jaccardDen = 2))
    assert(out.columns.toSet ==
      Set("doc_id", "text", "n_tokens", "split", "bin"))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(9000L), "exact dup must not survive")
    assert(!ids.contains(9001L), "near dup must not survive")
    assert(!ids.contains(9002L), "junk doc must fail the gates")
    assert(ids.contains(0L) && ids.contains(1L), "originals survive")
    // every surviving row has a split and a bin
    assert(out.filter($"split".isNull || $"bin".isNull).count() == 0)
    assert(out.select("split").distinct().count() >= 2)
  }

  test("chunkDocuments: every token covered, consecutive chunks overlap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ") // 100 tokens
    val in = Seq((1L, text), (2L, "short doc here")).toDF("doc_id", "text")
    val chunks = Curation.chunkDocuments(in, "doc_id", "text",
      chunkSize = 32, stride = 24)
      .as[(Long, Int, Long, Long, String)].collect()
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,24,48,72,96 — while start < 100
    assert(d1.map(_._3).toSeq == Seq(0L, 24L, 48L, 72L, 96L))
    // full chunks are chunkSize; the tail chunk is the remainder
    assert(d1.init.forall(c => c._4 == 32L || c._3 + 32 > 100))
    assert(d1.last._4 == 4L) // tokens 97..100
    // consecutive chunks share chunkSize - stride = 8 tokens of context
    val c0 = d1(0)._5.split(" "); val c1 = d1(1)._5.split(" ")
    assert(c0.takeRight(8).sameElements(c1.take(8)))
    // every token appears in at least one chunk
    val covered = d1.flatMap(_._5.split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"t$i").toSet)
    // a doc shorter than chunkSize yields exactly one whole-doc chunk
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._5 == "short doc here")
  }

  test("packSequences: bins advance exactly at the token budget") {
    val docs = Seq((1L, 1000L), (2L, 1000L), (3L, 100L), (4L, 2000L), (5L, 10L))
      .toDF("id", "n_tokens")
    val bins = Curation.packSequences(docs, "id", "n_tokens", budget = 2048L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // prefixes: 0, 1000, 2000, 2100, 4100 -> bins 0,0,0,1,2
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("sampleToTokenBudget: within budget, monotone in budget, exact edges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def kept(budget: Long) = Curation.sampleToTokenBudget(
      docs, "doc_id", "text", budget)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    val total = kept(Long.MaxValue)
    val small = kept(5000L)
    val large = kept(20000L)
    // the sample never exceeds the budget and is nonempty when it can be
    assert(small.values.sum <= 5000L && small.nonEmpty)
    assert(large.values.sum <= 20000L)
    // raising the budget only ever adds documents
    assert(small.keySet.subsetOf(large.keySet))
    assert(large.keySet.subsetOf(total.keySet))
    // greedy prefix: shortfall is bounded by one more md5-ordered doc,
    // i.e. the sample isn't pathologically under-filled
    assert(small.values.sum > 5000L - total.values.max)
    // edges: zero budget keeps nothing, full budget keeps everything
    assert(kept(0L).isEmpty)
    assert(total.size == docs.count())
  }

  test("rankBuckets matches ntile-style global bucketing (differential)") {
    val rows = (0L until 1000L).map(i => (i, (i * 7919L) % 400)).toDF("id", "score")
    val expected = rows
      .withColumn("rk", row_number().over(
        Window.orderBy("score", "id")) - 1)
      .withColumn("bucket", expr("CAST((rk * 10) DIV 1000 AS LONG)"))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val got = Curation.rankBuckets(rows, "id", "score", nBuckets = 10)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got == expected)
    // buckets are balanced: exactly n/10 rows each here
    val sizes = got.values.groupBy(identity).map(_._2.size).toSet
    assert(sizes == Set(100))
  }

  test("removeContaminatedSpans: leaked window excised, clean text intact") {
    val bench = Seq((100L, "the secret answer is forty two")).toDF("id", "text")
    val train = Seq(
      // contains the full benchmark 5-gram "secret answer is forty two"
      (1L, "intro text the secret answer is forty two outro text"),
      // shares only a 3-token overlap -> untouched at w=5
      (2L, "the secret answer here differs completely from that"),
      (3L, "totally unrelated document body")
    ).toDF("id", "text")
    val out = Curation.removeContaminatedSpans(train, "id", "text",
      bench, "text", w = 5)
      .as[(Long, String)].collect().toMap
    // doc 1: the two overlapping leaked windows cover tokens 2..8
    // ("the secret answer is forty two" spans both 5-gram starts)
    assert(!out(1L).contains("secret") && !out(1L).contains("forty"))
    assert(out(1L).startsWith("intro text") && out(1L).endsWith("outro text"))
    assert(out(2L) == "the secret answer here differs completely from that")
    assert(out(3L) == "totally unrelated document body")
    // idempotent here: excising again changes nothing
    val again = Curation.removeContaminatedSpans(
      out.toSeq.toDF("id", "text"), "id", "text", bench, "text", w = 5)
      .as[(Long, String)].collect().toMap
    assert(again == out)
  }

  test("exclusivePrefixSumBy matches the per-group window (differential)") {
    val rows = (1L to 2000L)
      .map(i => (i, s"g${i % 5}", (i * 2654435761L) % 97 + 1))
      .toDF("id", "g", "v")
    val expected = rows.withColumn("ps",
      coalesce(sum($"v").over(
        Window.partitionBy("g").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "ps").as[(Long, Long)].collect().toMap
    for (parts <- Seq(3, 7, 32)) {
      val got = Curation.exclusivePrefixSumBy(rows, "g", "id", "v", "ps",
        numParts = parts)
        .select("id", "ps").as[(Long, Long)].collect().toMap
      assert(got == expected, s"per-group prefix diverged at numParts=$parts")
    }
  }

  test("sampleToTokenBudgetBySource: per-group budgets are independent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def kept(en: Long) = Curation.sampleToTokenBudgetBySource(
      docs, "doc_id", "text", "lang",
      budgets = Map("en" -> en, "es" -> 3000L), defaultBudget = 1000L)
      .select("doc_id", "lang", "n_tokens")
      .as[(Long, String, Long)].collect()
    val a = kept(4000L)
    val b = kept(12000L)
    // each group stays within its own budget
    def byLang(s: Seq[(Long, String, Long)]) =
      s.groupBy(_._2).map { case (l, xs) => l -> xs.map(_._3).sum }
    val totalsA = byLang(a.toSeq)
    assert(totalsA.getOrElse("en", 0L) <= 4000L)
    assert(totalsA.getOrElse("es", 0L) <= 3000L)
    totalsA.collect { case (l, t) if l != "en" && l != "es" =>
      assert(t <= 1000L, s"default budget violated for $l") }
    // raising en's budget adds en docs and changes NO other group
    val aIds = a.map(x => (x._1, x._2)).toSet
    val bIds = b.map(x => (x._1, x._2)).toSet
    assert(aIds.subsetOf(bIds))
    assert(aIds.filter(_._2 != "en") == bIds.filter(_._2 != "en"))
  }

  test("hashWeightedSample: weight-monotone, deterministic, total cut") {
    val docs = (1L to 200L).map(i => (i, if (i <= 5) 1000000L else 10L))
      .toDF("id", "w")
    val got = Curation.hashWeightedSample(docs, "id", "w", k = 20)
      .select("id").as[Long].collect().toSet
    // the five 100000x-weight rows have priorities ~1e5 smaller than any
    // light row can draw: all five must be in the sample
    assert((1L to 5L).toSet.subsetOf(got))
    assert(got.size == 20)
    // reproducible under repartitioning (pure hash arithmetic, no RNG)
    val again = Curation.hashWeightedSample(docs.repartition(11), "id", "w", k = 20)
      .select("id").as[Long].collect().toSet
    assert(got == again)
  }

  test("rankBuckets: NEGATIVE scores rank correctly (total sort key)") {
    // the %019d formulation inverted negatives ("-1" sorted before
    // "-2"); the decimal-offset key must order ... -2 < -1 < 0 < 1 ...
    val df = Seq((1L, -20L), (2L, -1L), (3L, 0L), (4L, 5L)).toDF("id", "score")
    val got = Curation.rankBuckets(df, "id", "score", nBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // extreme magnitudes survive the offset without overflow
    val ex = Seq((1L, Long.MinValue), (2L, -7L), (3L, Long.MaxValue))
      .toDF("id", "score")
    val eb = Curation.rankBuckets(ex, "id", "score", nBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(eb == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("quantileNormalize: equal-size groups land on identical multisets") {
    // group A runs 1..10, group B runs 1000..1009 — after mapping onto
    // the pooled distribution, both groups' normalized multisets must
    // coincide (that is what makes cross-source scores comparable),
    // and the map must be monotone within each group
    val df = ((1L to 10L).map(v => ("A", v, v)) ++
      (1L to 10L).map(i => ("B", i + 100L, i + 999L)))
      .toDF("g", "id", "v")
    val got = Curation.quantileNormalize(df, "g", "id", "v")
      .as[(String, Long, Long, Long)].collect()
    val byG = got.groupBy(_._1)
    assert(byG("A").map(_._4).sorted.toSeq == byG("B").map(_._4).sorted.toSeq)
    // normalized values are members of the pooled multiset
    val pooled = df.select("v").as[Long].collect().toSet
    assert(got.forall(r => pooled.contains(r._4)))
    // monotone within group: higher raw value -> >= normalized value
    byG.values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4)
        case _ =>
      }
    }
  }

  test("temperatureMix: tail languages keep a larger fraction than the head") {
    val docs = graft.queries.t(spark, sf, "documents").select("doc_id", "lang")
    val before = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curation.temperatureMix(docs, "doc_id", "lang", budgetDocs = 300L)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // total tracks the budget (md5 positions are uniform; 15% slack)
    val total = kept.values.sum
    assert(math.abs(total - 300L) <= 45, s"kept $total of budget 300")
    // every language survives, none exceeds its corpus count
    before.keys.foreach { l =>
      assert(kept.getOrElse(l, 0L) > 0, s"language $l wiped out")
      assert(kept(l) <= before(l))
    }
    // the α=0.5 point: the dominant language's keep-RATE is strictly
    // below every tail language's (that is what "flattening" means)
    val head = before.maxBy(_._2)._1
    val headRate = kept(head).toDouble / before(head)
    before.keys.filterNot(_ == head).foreach { l =>
      assert(kept(l).toDouble / before(l) > headRate,
        s"$l rate ${kept(l).toDouble / before(l)} !> $head rate $headRate")
    }
  }

  test("dsirWeights: target-looking docs score above pool-looking docs") {
    // target slice speaks "alpha"; the rest of the pool speaks "beta".
    // A held-out doc written in the target's vocabulary must out-weight
    // one written in the pool's.
    val docs = (
      (1 to 20).map(i => (i.toLong, "alpha alnum apex axiom alpha", true)) ++
        (21 to 80).map(i => (i.toLong, "beta bravo basalt borough beta", false)) ++
        Seq((100L, "alpha axiom alpha apex", false),
          (101L, "beta basalt beta bravo", false))
    ).toDF("id", "text", "is_target")
    val w = Curation.dsirWeights(docs, "id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(w(100L).compareTo(w(101L)) > 0,
      s"target-like ${w(100L)} should beat pool-like ${w(101L)}")
    // weights are exact decimals: identical under any partitioning
    val w7 = Curation.dsirWeights(docs.repartition(7), "id", "text",
      col("is_target")).collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(w == w7)
  }

  test("apportionBudget: quotas sum to the budget exactly, largest remainders win") {
    // weights 1,1,1 with budget 10: base 3 each, 1 seat left -> the
    // group-name tie-break gives it to 'a'
    val even = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("g", "w")
    val g1 = Curation.apportionBudget(even, "g", "w", budget = 10L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(g1 == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // skewed weights: quotas still sum EXACTLY to the budget (floats
    // would drift by up to one per group)
    val skew = (1 to 37).map(i => (f"g$i%02d", (i * i * 7 + 3).toLong)).toDF("g", "w")
    val q = Curation.apportionBudget(skew, "g", "w", budget = 999983L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(q.map(_._5).sum == 999983L)
    assert(q.forall(r => r._4 == 0L || r._4 == 1L))
    // proportionality: every quota within 1 of the real-valued share
    val W = skew.as[(String, Long)].collect().map(_._2).sum
    q.foreach { r =>
      val ideal = 999983.0 * r._2 / W
      assert(math.abs(r._5 - ideal) < 1.0, s"${r._1}: ${r._5} vs $ideal")
    }
  }

  test("stratifiedHashSample: exact per-stratum counts, deterministic, rank re-cuts") {
    val docs = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 110L).map(i => (i, "small")) ++
      Seq((111L, "tiny"))).toDF("id", "grp")
    val got = Curation.stratifiedHashSample(docs, "id", "grp", k = 25)
    val bySize = got.groupBy("grp").count().as[(String, Long)].collect().toMap
    // exactly min(k, |stratum|) per stratum
    assert(bySize == Map("big" -> 25L, "small" -> 10L, "tiny" -> 1L))
    // deterministic under repartitioning (md5 rank, no RNG)
    val again = Curation.stratifiedHashSample(docs.repartition(7), "id", "grp", k = 25)
      .select("id").as[Long].collect().toSet
    assert(again == got.select("id").as[Long].collect().toSet)
    // rank <= k' IS the k'-sample: re-cutting needs no re-rank
    val k5 = Curation.stratifiedHashSample(docs, "id", "grp", k = 5)
      .select("id").as[Long].collect().toSet
    val recut = got.filter($"rank" <= 5).select("id").as[Long].collect().toSet
    assert(k5 == recut)
  }

  test("kFoldAssign: total partition, near-even folds, salt-stable, salt-sensitive") {
    val ids = (1L to 5000L).toDF("id")
    val f = Curation.kFoldAssign(ids, "id", k = 5)
    val byFold = f.groupBy("fold").count()
      .as[(Long, Long)].collect().toMap
    assert(byFold.keySet == (0L to 4L).toSet, "every fold populated")
    assert(byFold.values.sum == 5000L, "every row assigned exactly once")
    // md5 is uniform: each fold within ~20% of 1000
    byFold.values.foreach(n => assert(n > 800 && n < 1200, byFold.toString))
    // deterministic under the same salt, different under another
    val again = Curation.kFoldAssign(ids, "id", k = 5)
      .as[(Long, Long)].collect().toSet
    assert(again == f.as[(Long, Long)].collect().toSet)
    val other = Curation.kFoldAssign(ids, "id", k = 5, salt = "fold2")
      .as[(Long, Long)].collect().toSet
    assert(other != again, "salt must reshuffle the folds")
    // k = 2 agrees with the 50/50 boundary convention: fold by '8000'
    val two = Curation.kFoldAssign(ids, "id", k = 2)
    val manual = ids.withColumn("fold",
      when(substring(md5(concat(lit("fold1"), $"id".cast("string"))), 1, 4)
        < "8000", 0L).otherwise(1L))
    assert(two.except(manual).isEmpty && manual.except(two).isEmpty)
  }

  test("classBalanceWeights: inverse frequency, balanced input is weight 1") {
    val skew = (Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ Seq.fill(10)("c"))
      .toDF("label")
    val got = Curation.classBalanceWeights(skew, "label")
      .as[(String, Long, Long)].collect()
      .map { case (l, n, w) => l -> ((n, w)) }.toMap
    // N=50, k=3: a -> 50e6/(3*30) = 555555; b,c -> 50e6/30 = 1666666
    assert(got == Map("a" -> ((30L, 555555L)),
      "b" -> ((10L, 1666666L)), "c" -> ((10L, 1666666L))))
    // perfectly balanced -> every weight exactly 1.0
    val bal = (Seq.fill(5)("x") ++ Seq.fill(5)("y")).toDF("label")
    val w = Curation.classBalanceWeights(bal, "label")
      .as[(String, Long, Long)].collect()
    assert(w.forall(_._3 == 1000000L))
  }
}
