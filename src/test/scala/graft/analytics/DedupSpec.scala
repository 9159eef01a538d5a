package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private def docs = Seq(
    (0L, base),
    (1L, base + " again"),                      // near-dup of 0
    (2L, "  THE   quick brown fox jumps over the lazy dog near the old river bank today "), // exact after normalize
    (3L, "completely different content about spark partitions and shuffle behavior here"),
    (4L, "another unrelated document mentioning catalyst optimizer rules and codegen stages")
  ).toDF("doc_id", "text")

  test("exactByFingerprint collapses case/whitespace variants, keeps min id") {
    val out = Dedup.exactByFingerprint(docs, "doc_id", "text")
    assert(out.count() == 4)
    val survivors = out.select("doc_id").as[Long].collect().toSet
    assert(survivors.contains(0L) && !survivors.contains(2L))
    assert(out.filter($"doc_id" === 0L).select("n_copies").as[Long].head() == 2L)
  }

  test("ngramJaccardPairs matches brute-force Jaccard on shingle sets") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, num = 4, den = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L))) // normalized-identical -> J = 1 on words? no: J >= 0.8
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 3L || b == 4L || a == 3L || a == 4L })
  }

  test("minhashLshPairs finds planted near-dups, excludes unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 2, numHashes = 32, bands = 16, num = 1, den = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(3L, 4L)).nonEmpty })
    // verified candidates are a subset of the exact-Jaccard pairs
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, num = 1, den = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(exact))
  }

  test("duplicateSpans finds planted cross-doc spans, ignores short docs and singletons") {
    // docs 10/11 share the exact 5-token span "one two three four five"
    // embedded at different positions; doc 12 repeats it twice WITHIN one
    // doc only (must not count as cross-doc without a second doc);
    // doc 13 is shorter than the window.
    val span = "one two three four five"
    val d = Seq(
      (10L, s"prefix tokens here $span and a tail"),
      (11L, s"$span with an entirely different continuation text"),
      (12L, s"$span again $span"),
      (13L, "too short"),
      (14L, "nothing in common with anything else at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(d, "doc_id", "text", w = 5, minDocs = 2L)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the planted span: 3 docs, 4 occurrences (doc 12 twice), first doc 10
    val md = java.security.MessageDigest.getInstance("MD5")
    val plantedHash = md.digest(span.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val planted = rows.filter(_._1 == plantedHash)
    assert(planted.length == 1 && planted.head == ((plantedHash, 3L, 4L, 10L)))
    // every reported span really is in >= 2 distinct docs
    assert(rows.forall(_._2 >= 2L))
    // doc 12's intra-doc repeat of OTHER spans ("again" window shifts)
    // must not leak in as cross-doc duplicates
    assert(!rows.exists(r => r._2 < 2L))
  }

  test("simhashPairs: near-identical docs within small Hamming distance") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L))) // token multiset identical after lower/trim
  }

  test("maxDocFreq cap kills the stop-shingle quadratic but keeps true near-dups") {
    // 60 docs all sharing the stop-trigram "of the and"; two planted
    // near-dups (50/51) sharing plenty of uncommon trigrams.
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = ((0 until 50).map(i =>
      (i.toLong, s"unique$i token$i of the and extra$i tail$i")) ++ Seq(
      (50L, nearDup + " of the and"),
      (51L, nearDup + " of the and omega"))).toDF("doc_id", "text")
    // uncapped: the shared trigram makes every doc pair a candidate
    val uncapped = Dedup.shingleCandidates(corpus, "doc_id", "text",
      n = 3, maxDocFreq = Long.MaxValue).count()
    assert(uncapped >= 52L * 51 / 2) // all-pairs via the stop bucket
    // capped: stop-grade trigrams (df > 10) drop out of the index
    val capped = Dedup.shingleCandidates(corpus, "doc_id", "text",
      n = 3, maxDocFreq = 10).count()
    assert(capped < 60) // no quadratic blowup
    // the planted near-dup still surfaces, with EXACT overlap counts
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, num = 1, den = 2, maxDocFreq = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((50L, 51L)))
  }

  test("capped overlap counts equal uncapped counts on surviving pairs") {
    // verification joins back to FULL shingle sets, so the cap must not
    // perturb common/n_a/n_b for any pair it keeps
    val capped = Dedup.shingleOverlapPairs(docs, "doc_id", "text",
      n = 2, maxDocFreq = 3)
      .select("id_a", "id_b", "common", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val uncapped = Dedup.shingleOverlapPairs(docs, "doc_id", "text",
      n = 2, maxDocFreq = Long.MaxValue)
      .select("id_a", "id_b", "common", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped))
  }

  test("adaptive simhash salting: all-salted == none-salted pair sets") {
    // saltThreshold=0 salts every bucket; MaxValue salts none — the
    // enumerated pair set must be identical either way
    val salted = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 16, saltThreshold = 0L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val unsalted = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 16, saltThreshold = Long.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(salted == unsalted && salted.nonEmpty)
  }

  test("crossCorpusNearDupPairs: new batch pairs against corpus only, never old x old") {
    val corpus = Seq(
      (1L, base),
      (2L, base + " slightly changed"), // near-dup of 1 INSIDE the corpus
      (3L, "completely different content about spark partitions and shuffles")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, base + " again"), // near-dup of corpus docs 1 and 2
      (101L, "fresh unseen topic nothing shared here at all today")
    ).toDF("doc_id", "text")
    val pairs = Dedup.crossCorpusNearDupPairs(batch, "doc_id", "text",
      corpus, "doc_id", "text", n = 2, num = 1, den = 2)
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 1L)))
    assert(!pairs.exists(_._1 == 101L)) // fresh doc matches nothing
    // the corpus-internal near-dup pair (1,2) must NOT appear
    assert(pairs.forall { case (n_, c) => n_ >= 100L && c < 100L })
  }

  test("crossCorpus cap bounds a stop-shingle NEW batch, keeps true pairs exact") {
    // every batch doc AND every corpus doc shares the stop-trigram
    // "of the and" — uncapped, the batch fans out |batch| x |corpus|
    // candidates through that single posting; with the combined-df cap
    // the stop shingle drops from BOTH sides and only genuinely-similar
    // pairs survive, with exact overlap counts.
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = ((0 until 40).map(i =>
      (i.toLong, s"corp$i token$i of the and extra$i tail$i")) ++ Seq(
      (50L, nearDup + " of the and"))).toDF("doc_id", "text")
    val batch = ((100 until 120).map(i =>
      (i.toLong, s"new$i word$i of the and other$i end$i")) ++ Seq(
      (150L, nearDup + " of the and omega"))).toDF("doc_id", "text")
    val capped = Dedup.crossCorpusNearDupPairs(batch, "doc_id", "text",
      corpus, "doc_id", "text", n = 3, num = 1, den = 2, maxDocFreq = 10)
      .select("id_new", "id_corpus", "common", "n_new", "n_corpus")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val uncapped = Dedup.crossCorpusNearDupPairs(batch, "doc_id", "text",
      corpus, "doc_id", "text", n = 3, num = 1, den = 2, maxDocFreq = Long.MaxValue)
      .select("id_new", "id_corpus", "common", "n_new", "n_corpus")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // the planted near-dup survives the cap with EXACT counts
    assert(capped.exists { case (n_, c, _, _, _) => n_ == 150L && c == 50L })
    assert(capped.subsetOf(uncapped))
    // nothing here is similar except the planted pair, so both agree
    assert(capped == uncapped)
  }

  test("dedupParagraphs: boilerplate survives only at its first (id, pos)") {
    val boiler = "subscribe to our newsletter"
    val in = Seq(
      (10L, s"alpha one\n$boiler\nalpha two"),
      (11L, s"$boiler\nbeta body"),             // later doc: boiler removed
      (12L, boiler),                            // entirely boilerplate
      (13L, s"gamma text\ngamma text")          // within-doc repeat too
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(in, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(10L)._2 == s"alpha one\n$boiler\nalpha two") // first owner keeps all
    assert(out(10L)._4 == 0L)
    assert(out(11L)._2 == "beta body" && out(11L)._4 == 1L)
    assert(out(12L)._2 == "" && out(12L)._3 == 1L && out(12L)._4 == 1L)
    // cross-doc semantics subsume within-doc repeats: second copy removed
    assert(out(13L)._2 == "gamma text" && out(13L)._4 == 1L)
    // reassembly preserves original order for untouched docs
    assert(out(10L)._3 == 3L)
  }

  test("dedupParagraphs is idempotent (property)") {
    val boiler = "shared footer line"
    val in = Seq(
      (1L, s"alpha\n$boiler\nbeta"),
      (2L, s"$boiler\ngamma"),
      (3L, s"delta\n$boiler")
    ).toDF("doc_id", "text")
    val once = Dedup.dedupParagraphs(in, "doc_id", "text")
    val twice = Dedup.dedupParagraphs(
      once.select(col("doc_id"), col("text_deduped").as("text")),
      "doc_id", "text")
    // a corpus with no cross-doc duplicates left is a fixed point
    val changed = twice.filter(col("n_removed") > 0).count()
    assert(changed == 0, "second pass must remove nothing")
  }

  test("dedup is idempotent (property)") {
    val once = Dedup.exactByFingerprint(docs, "doc_id", "text")
      .join(docs, Seq("doc_id")).select("doc_id", "text")
    val twice = Dedup.exactByFingerprint(once, "doc_id", "text")
    assert(once.count() == twice.count())
  }

  test("removeDuplicateSpans excises all but the min-id occurrence") {
    val span = "one two three four five"
    val d = Seq(
      (10L, s"prefix tokens here $span and a tail"),
      (11L, s"$span with an entirely different continuation text"),
      (12L, s"$span again $span"),
      (14L, "nothing in common with anything else at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 5, minDocs = 2L)
      .as[(Long, String)].collect().toMap
    // keeper (min doc id) keeps its occurrence; singleton docs intact
    assert(out(10L) == s"prefix tokens here $span and a tail")
    assert(out(14L) == "nothing in common with anything else at all here")
    // every non-keeper occurrence excised — including BOTH repeats in 12
    assert(out(11L) == "with an entirely different continuation text")
    assert(out(12L) == "again")
    // second pass is a no-op once surviving text is span-unique
    val once = out.toSeq.toDF("doc_id", "text")
    val twice = Dedup.removeDuplicateSpans(once, "doc_id", "text", w = 5, minDocs = 2L)
      .as[(Long, String)].collect().toMap
    assert(twice == out)
  }

  test("removeDuplicateSpans surfaces a null-text document as empty string") {
    // the q100 oracle coalesces missing docs to '' — the Spark side must
    // agree on null text rather than propagating NULL
    val d = Seq((1L, Option("alpha beta gamma delta epsilon zeta")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 5)
      .as[(Long, String)].collect().toMap
    assert(out(2L) == "")
    assert(out(1L) == "alpha beta gamma delta epsilon zeta")
  }

  test("removeDuplicateSpans coverage is anti-monotone in window width") {
    // every position excised at width w+1 is excised at width w (a dup
    // (w+1)-window contains two dup w-windows covering the same
    // positions) — so the w-survivors of each doc must be a sub-multiset
    // of the (w+1)-survivors. Checked on the real documents corpus.
    val docs001 = spark.read.parquet(s"$sf/documents.parquet")
    val a = Dedup.removeDuplicateSpans(docs001, "doc_id", "text", w = 5)
      .withColumnRenamed("text", "t5")
    val b = Dedup.removeDuplicateSpans(docs001, "doc_id", "text", w = 6)
      .withColumnRenamed("text", "t6")
    def multiset(s: String): Map[String, Int] =
      s.split("\\s+").filter(_.nonEmpty).groupBy(identity).map { case (k, v) => k -> v.length }
    a.join(b, "doc_id").select("doc_id", "t5", "t6")
      .as[(Long, String, String)].collect().foreach { case (id, t5, t6) =>
        val m5 = multiset(t5); val m6 = multiset(t6)
        m5.foreach { case (tok, n) =>
          assert(m6.getOrElse(tok, 0) >= n,
            s"doc $id: token '$tok' survived w=5 but not w=6")
        }
      }
  }

  test("editDistance1Pairs: matches brute force on sub/ins/del neighbors") {
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"),  // substitution -> 1
      (3L, "kitte"),                   // deletion of 1 -> 1
      (4L, "kittens"),                 // insertion on 1 -> 1
      (5L, "sitting"),                 // 3 from kitten -> absent
      (6L, "mitten")                   // exact dup of 2 -> dist 0
    ).toDF("id", "s")
    val got = Dedup.editDistance1Pairs(rows, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    // brute force over all 15 pairs
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val strs = rows.as[(Long, String)].collect()
    val want = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want)
    assert(got.contains((1L, 2L, 1L)) && got.contains((2L, 6L, 0L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("containmentPairs: finds quote-inclusion that Jaccard misses") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),                 // 3 trigram shingles
      (2L, "w1 w2 w3 w4 w5 x1 x2 x3"),       // contains doc 1 verbatim (6 shingles)
      (3L, "q1 q2 q3 q4 q5")                 // unrelated
    ).toDF("doc_id", "text")
    // containment(1,2) = 3/min(3,6) = 1.0 >= 0.8 -> pair found
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, num = 4, den = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(cont == Set((1L, 2L, 3L, 3L, 6L)))
    // Jaccard(1,2) = 3/6 = 0.5 < 0.8 -> same threshold misses the pair
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, num = 4, den = 5).collect()
    assert(jac.isEmpty)
    // a df-cap that keeps the shared shingles preserves the pair: the
    // upper-bound prefilter is lossless for candidates
    val capped = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, num = 4, den = 5, maxDocFreq = 2L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 3L, 3L, 6L)))
  }

  test("minhash index: probe finds planted near-dups; append extends the corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark physical plans here"),
      (3L, "another unrelated document mentioning warehouses and ledgers")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("mh-idx").toString
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", path = idx, n = 2)
    // probe: one exact twin of doc 1 + one unrelated doc
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog tonight"),
      (102L, "nothing in common with anything stored in this index")
    ).toDF("doc_id", "text")
    val got = Dedup.probeMinhashIndex(spark, idx, batch, "doc_id", "text")
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    assert(got == Set((101L, 1L)), s"probe found $got")
    // append doc 4 (near-dup of 102's future probe); re-probe sees it
    Dedup.appendToMinhashIndex(
      Seq((4L, "nothing in common with anything stored in this index"))
        .toDF("doc_id", "text"), "doc_id", "text", path = idx,
      batchId = "day1")
    val got2 = Dedup.probeMinhashIndex(spark, idx, batch, "doc_id", "text")
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    assert(got2 == Set((101L, 1L), (102L, 4L)), s"post-append probe found $got2")
  }
}
