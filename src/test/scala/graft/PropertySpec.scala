package graft

import graft.operators.{Clean, TableStore}
import graft.analytics.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based invariants (SURVEY §5.3) driven by ScalaCheck
  * generators over fixed seeds (deterministic CI). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val seed = rng.Seed(42L)
    Iterator.iterate((g.sample, seed)) { case (_, s) =>
      (g.apply(Gen.Parameters.default, s), s.next)
    }.take(n * 3).flatMap(_._1).take(n).toSeq
  }

  private val rowGen: Gen[(String, String)] = for {
    a <- Gen.oneOf("x", "y", "  x ", "x\t", "", "NULL")
    b <- Gen.oneOf("1", "2", "3")
  } yield (a, b)

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    (1 to 5).foreach { k =>
      val df = samples(Gen.listOfN(30, rowGen), k).flatten.toDF("a", "b")
      val once = Clean.dedupExact(df)
      assert(Clean.dedupExact(once).count() == once.count())
    }
  }

  test("clean pipeline leaves no untrimmed strings and no all-null rows") {
    val df = samples(rowGen, 200).toDF("a", "b")
    val cleaned = Clean.clean()(Clean.normalizeNullLiterals(df))
    val dirty = cleaned.filter(
      col("a").rlike("^\\s|\\s$") || col("b").rlike("^\\s|\\s$")).count()
    assert(dirty == 0)
    assert(cleaned.filter(col("a").isNull && col("b").isNull).count() == 0)
  }

  test("appendByName is invariant to column permutation and case") {
    val base = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "v", "w")
    val perms = Seq(
      base.select("v", "k", "w"),
      base.select("w", "v", "k").toDF("W", "V", "K"),
      base.select("k", "w", "v"))
    perms.foreach { p =>
      val u = TableStore.appendByName(Seq(base, p)).orderBy("k", "v")
      assert(u.count() == 4)
      assert(u.columns.toSeq == Seq("k", "v", "w"))
      // same multiset of rows from every permutation
      assert(u.groupBy("k", "v", "w").count().filter(col("count") =!= 2).count() == 0)
    }
  }

  test("jaccard pairs are symmetric-free and threshold-monotone") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val loose = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, num = 1, den = 5)
    val tight = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, num = 1, den = 2)
    val l = loose.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val t = tight.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(t.subsetOf(l), "raising the threshold must only remove pairs")
    assert(l.forall { case (a, b) => a < b })
  }

  test("winsorize: row-preserving, fence-bounded, sum-contracting") {
    import graft.operators.Stats
    val vals = samples(Gen.choose(1L, 1000000L), 300)
    val df = vals.map(("g", _)).toDF("k", "v")
    val got = Stats.winsorizeByGroup(df, Seq("k"), "v")
      .as[(String, Long, Long)].collect()
    assert(got.length == vals.length) // winsorize never drops rows
    val clamped = got.map(_._3)
    // every clamped value is an ORIGINAL value (order statistics are
    // members of the multiset, and clamping maps into [lo, hi])
    val orig = vals.toSet
    assert(clamped.forall(orig.contains))
    assert(clamped.sum <= vals.sum + 0L || vals.min < 0,
      "clamping a positive-tailed sample cannot raise the sum above " +
        "the original when the low fence is the p5 member")
    // idempotent: winsorizing the winsorized column is a no-op
    val again = Stats.winsorizeByGroup(
        got.map { case (k, _, w) => (k, w) }.toSeq.toDF("k", "v"), Seq("k"), "v")
      .as[(String, Long, Long)].collect().map(_._3).sorted
    assert(again.toSeq == clamped.sorted.toSeq)
  }

  test("equiWidthHistogram: counts partition the input for any bin count") {
    import graft.operators.Stats
    val vals = samples(Gen.choose(-500L, 500L), 250)
    for (bins <- Seq(1, 7, 10)) {
      val h = Stats.equiWidthHistogram(vals.toDF("v"), "v", nBins = bins)
        .as[(Long, Long, Long, Long)].collect()
      assert(h.length == bins)
      assert(h.map(_._4).sum == vals.length, s"bins=$bins must partition rows")
      // edges tile the range contiguously
      val sorted = h.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 == a._3 + 1, s"gap between bins ${a._1} and ${b._1}")
        case _ => // a single bin has no adjacency to check
      }
      assert(sorted.head._2 == vals.min)
    }
  }

  test("marketBasket: support-threshold monotone") {
    import graft.operators.Association
    val lines = samples(Gen.zip(Gen.choose(1L, 40L), Gen.choose(1L, 15L)), 300)
      .map { case (b, i) => (b, s"i$i") }
    val df = lines.toDF("basket", "item")
    def rules(s: Long) = Association.marketBasket(df, "basket", "item", s)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    val s2 = rules(2L); val s3 = rules(3L)
    assert(s3.subsetOf(s2), "raising minSupport must only remove rules")
  }

  test("weighted-quality Aggregator: partial merge equals single-pass") {
    import graft.functions.WeightedQuality
    val data = samples(Gen.choose(1.0, 100.0), 100)
      .zipWithIndex.map { case (w, i) =>
        WeightedQuality.Scored(w, (i % 10).toDouble)
      }
    val ds = data.toDS().repartition(7) // force partial buffers + merge
    val got = ds.select(WeightedQuality.agg.toColumn).head()
    val expect = data.map(s => s.score * s.weight).sum / data.map(_.weight).sum
    assert(math.abs(got - expect) < 1e-9)
  }

  test("sentimentScore equals the relational explode/join/sum on random docs") {
    import graft.analytics.TextAnalysis
    val word: Gen[String] = Gen.oneOf(
      "good", "bad", "slow", "fast", "terrible", "the", "line", "was",
      "open", "error", "ok", "fine", "dup")
    val docGen: Gen[String] =
      Gen.chooseNum(0, 8).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val docs = samples(docGen, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.sentimentScore(docs, "doc_id", "text")
      .select("doc_id", "n_scored_tokens", "sentiment_score")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // relational reference: explode tokens, join the lexicon as a
    // DataFrame, re-aggregate — the shape the operator deliberately
    // avoids at scale, used here as its oracle
    val lex = TextAnalysis.SentimentLexicon.toSeq.toDF("term", "w")
    val rel = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .join(lex, Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(col("w")).as("n"), coalesce(sum(col("w")), lit(0L)).as("s"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == rel)
  }

  test("minhash index probe: split-invariant — build(a)+append(b) == build(a++b)") {
    val word: Gen[String] = Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val docGen: Gen[String] =
      Gen.chooseNum(4, 10).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val corpus = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val (a, b) = corpus.splitAt(35)
    val batch = samples(docGen, 10).zipWithIndex
      .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
    val idx1 = java.nio.file.Files.createTempDirectory("mh-p1").toString
    Dedup.writeMinhashIndex(corpus.toDF("doc_id", "text"), "doc_id", "text", idx1)
    val idx2 = java.nio.file.Files.createTempDirectory("mh-p2").toString
    Dedup.writeMinhashIndex(a.toDF("doc_id", "text"), "doc_id", "text", idx2)
    Dedup.appendToMinhashIndex(b.toDF("doc_id", "text"), "doc_id", "text",
      path = idx2, batchId = "b1")
    def pairs(idx: String) =
      Dedup.probeMinhashIndex(spark, idx, batch, "doc_id", "text")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(pairs(idx1) == pairs(idx2),
      "a probe must not distinguish one-shot build from build+append")
  }
}
