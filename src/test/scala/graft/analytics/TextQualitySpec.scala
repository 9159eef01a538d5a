package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  test("gopherStats: duplicate lines, symbols and non-alpha words are measured") {
    val docs = Seq(
      (1L, "good clean prose with words\nanother line\nanother line"),
      (2L, "#### @@@@ 1234 %%%%")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 3 lines, 2 distinct -> dup fraction 1/3
    assert(math.abs(out(1L).getDouble(5) - 1.0 / 3.0) < 1e-12)
    assert(out(1L).getDouble(3) == 1.0) // every word alphabetic
    // doc 2: no alphabetic words, 12 symbol chars over 4 tokens
    assert(out(2L).getDouble(3) == 0.0)
    assert(out(2L).getDouble(4) == 3.0)
    assert(out(2L).getDouble(5) == 0.0) // single line, no dups
  }

  test("dedupLines: first occurrence kept in order, repeats dropped") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta"),
      (2L, "one line only")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 5L && out(1L).getLong(2) == 2L)
    assert(out(1L).getString(3) == "alpha\nbeta\ngamma")
    assert(out(2L).getLong(2) == 0L && out(2L).getString(3) == "one line only")
  }

  test("dedupLines: linear on a pathological 100k-repeated-line doc; agrees with the quadratic formulation") {
    // 100k lines, 1k distinct — the shape that pinned the previous
    // array_position formulation at ~10^10 comparisons in one task
    val big = (0 until 100000).map(i => s"line ${i % 1000}").mkString("\n")
    val docs = Seq((1L, big), (2L, "a\nb\na"), (3L, ""), (4L, "x\n\n\nx\n"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "pathological doc must not pin a task")
    assert(out(1L).getLong(1) == 100000L && out(1L).getLong(2) == 99000L)
    // differential: the O(lines²) array_position formulation is the
    // executable spec of keep-first semantics — results must be identical
    import org.apache.spark.sql.functions.{split, filter, array_position, size, concat_ws}
    val lines = split($"text", "\n", -1)
    val kept = filter(lines, (x, i) => array_position(lines, x) === (i + 1))
    val ref = docs.filter($"doc_id" =!= 1L).select($"doc_id",
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(kept)).cast("long").as("n_removed"),
      concat_ws("\n", kept).as("text_deduped"))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    ref.foreach { case (id, expected) => assert(out(id).toSeq == expected, s"doc $id diverged") }
  }

  test("approx length quantiles track the exact rank-selection quantiles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text")
    val exact = TextAnalysis.lengthQuantiles(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = TextAnalysis.lengthQuantilesApprox(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    for (lang <- exact.keySet; i <- 1 to 4) {
      val e = exact(lang).getInt(i); val a = approx(lang).getInt(i)
      // accuracy=10000 over <=5000-doc groups: rank error < 1, so the
      // sketch may differ from ceil(p*n) selection by at most one rank
      // position — bound the VALUE divergence loosely (10% + 2 tokens)
      assert(math.abs(e - a) <= math.max(2, e / 10),
        s"$lang quantile $i: exact=$e approx=$a")
    }
    // group sizes agree exactly
    for (lang <- exact.keySet)
      assert(exact(lang).getLong(5) == approx(lang).getLong(5))
  }

  test("sampleByDomain is monotone in rate: lower rate yields a subset") {
    import graft.analytics.Curation
    val rows = (0L until 2000L).map(i => (i, "d")).toDF("id", "domain")
    val lo = Curation.sampleByDomain(rows, "id", "domain", Map("d" -> 0.2), "s")
      .select("id").as[Long].collect().toSet
    val hi = Curation.sampleByDomain(rows, "id", "domain", Map("d" -> 0.6), "s")
      .select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi) && lo.nonEmpty && hi.size > lo.size)
  }

  test("repetitionStats: planted repetition found, tie-break and short-doc guards hold") {
    val docs = Seq(
      // "b b" occurs 3x (runs of b), top bigram by count
      (1L, "a b b b b c"),
      // all bigrams occur once -> tie broken to lexicographically first ("a b")
      (2L, "a b c d e"),
      // 8 tokens of one word: every 5-gram identical -> dup fraction (4-1)/4
      (3L, "x x x x x x x x"),
      (4L, "too short"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 == "b b")
    assert(out(1L)._2 == 3.0 * 3 / "a b b b b c".length)
    assert(out(2L)._1 == "a b" && out(2L)._2 == 1.0 * 3 / "a b c d e".length)
    assert(out(3L)._1 == "x x" && out(3L)._3 == 3.0 / 4)
    assert(out(4L) == (("too short", 9.0 / 9, 0.0))) // one bigram, no 5-grams
    assert(out(5L)._1 == "" && out(5L)._2 == 0.0 && out(5L)._3 == 0.0)
  }

  test("scrubPii: emails and phones replaced with typed placeholders, counted") {
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or 555-123-4567 thanks"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1L && out(1L).getLong(2) == 1L)
    val scrubbed = out(1L).getString(3)
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>"))
    assert(!scrubbed.contains("@") && !scrubbed.contains("555"))
    assert(out(2L).getLong(1) == 0L && out(2L).getString(3) == "no pii here at all")
  }

  test("invertedIndex: postings carry sorted positions that answer phrase queries") {
    val docs = Seq(
      (1L, "new york city new york"),
      (2L, "york new")
    ).toDF("id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getSeq[Long](2), r.getLong(3)))).toMap
    assert(idx(("new", 1L)) == ((Seq(1L, 4L), 2L)))
    assert(idx(("york", 1L)) == ((Seq(2L, 5L), 2L)))
    assert(idx(("city", 1L)) == ((Seq(3L), 1L)))
    // phrase "new york" in doc d <=> some p in pos(new,d) with p+1 in
    // pos(york,d): true in doc 1 (1->2, 4->5), false in doc 2 (2->3 no)
    def phrase(d: Long) = idx.get(("new", d)).toSeq.flatMap(_._1)
      .exists(p => idx.get(("york", d)).exists(_._1.contains(p + 1)))
    assert(phrase(1L) && !phrase(2L))
  }

  test("bm25: term saturation and idf ordering behave like a ranker should") {
    val docs = Seq(
      (1L, "cat cat cat cat dog filler filler filler"), // tf-heavy on 'cat'
      (2L, "cat dog filler filler filler filler filler filler"),
      (3L, "dog filler filler filler filler filler filler filler"),
      (4L, "filler filler filler filler filler filler filler filler")
    ).toDF("id", "text")
    val got = TextAnalysis.bm25(docs, "id", "text", Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    // both-term docs beat single-term; repeated tf beats single tf;
    // the no-hit doc is absent entirely
    assert(got(1L).compareTo(got(2L)) > 0)
    assert(got(2L).compareTo(got(3L)) > 0)
    assert(!got.contains(4L))
    // rarer term carries more idf: 'cat' (df 2) must out-score 'dog'
    // (df 3) at equal tf and equal doc length
    val rare = TextAnalysis.bm25(docs, "id", "text", Seq("cat"))
    val common = TextAnalysis.bm25(docs, "id", "text", Seq("dog"))
    val catIn2 = rare.filter($"id" === 2L).collect().head.getDecimal(1)
    val dogIn2 = common.filter($"id" === 2L).collect().head.getDecimal(1)
    assert(catIn2.compareTo(dogIn2) > 0)
  }

  test("phraseSearch: strict adjacency, multi-occurrence counts, 3-gram phrases") {
    val docs = Seq(
      (1L, "new york city new york"), // "new york" twice
      (2L, "york new"),               // reversed -> no match
      (3L, "new and york"),           // gap -> no match
      (4L, "new york city")           // 3-gram phrase lives here only
    ).toDF("id", "text")
    val two = TextAnalysis.phraseSearch(docs, "id", "text", Seq("new", "york"))
      .as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 2L, 4L -> 1L))
    val three = TextAnalysis.phraseSearch(docs, "id", "text",
      Seq("new", "york", "city")).as[(Long, Long)].collect().toMap
    assert(three == Map(1L -> 1L, 4L -> 1L))
    // single-word phrase degenerates to term lookup with counts
    val one = TextAnalysis.phraseSearch(docs, "id", "text", Seq("york"))
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("bpePairCounts: word-frequency-weighted char pairs; 1-char words carry none") {
    val docs = Seq(
      (1L, "aab aab x"),   // 'aab' twice here...
      (2L, "aab cd")       // ...once here; 'x' never pairs
    ).toDF("id", "text")
    val got = TextAnalysis.bpePairCounts(docs, "text", k = 10)
      .as[(String, Long)].collect()
    // aab x3 -> aa:3, ab:3; cd x1
    assert(got.toSet == Set(("aa", 3L), ("ab", 3L), ("cd", 1L)))
    // deterministic order: count desc then pair asc -> aa before ab
    assert(got.toSeq == Seq(("aa", 3L), ("ab", 3L), ("cd", 1L)))
    // the k cut happens after that total order
    val top1 = TextAnalysis.bpePairCounts(docs, "text", k = 1)
      .as[(String, Long)].collect().toSeq
    assert(top1 == Seq(("aa", 3L)))
  }

  test("bigrams: adjacent pairs in order; <2 tokens yield empty, not error") {
    val df = Seq((1L, "x y z"), (2L, "solo"), (3L, ""))
      .toDF("id", "text")
      .select($"id", TextAnalysis.bigrams(TextAnalysis.tokens($"text")).as("bg"))
    val got = df.as[(Long, Seq[(String, String)])].collect().toMap
    assert(got(1L) == Seq(("x", "y"), ("y", "z")))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty) // tokenizes to [""] -> one token -> no pairs
  }

  test("bigramLmScore: add-1 bigram LM, exact e9 integers, eval-only output") {
    // train: "a b a b" -> c2(a,b)=2, c2(b,a)=1; c1(a)=2, c1(b)=1; V=2
    val docs = Seq(
      (1L, "a b a b", true),
      (2L, "A b c", false),  // lowercased: p(a,b)=3/4 e9, p(b,c)=1/3 e9
      (3L, "z", false),      // single token -> no bigrams -> absent
      (4L, "q r", false)     // both unseen: p=1/(0+2) e9
    ).toDF("doc_id", "text", "is_train")
    val byId = TextAnalysis.bigramLmScore(docs, "doc_id", "text", "is_train")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId.keySet == Set(2L, 4L)) // train rows and bigram-less rows excluded
    assert(byId(2L) == ((2L, (750000000L + 333333333L) / 2))) // = 541666666
    assert(byId(4L) == ((1L, 500000000L)))
  }

  test("collocations: bound pair outranks chance pair; minCount floors rare pairs") {
    // "x y" always together (5 times); "a b" co-occur among independent
    // uses of a and b; "q r" appears only once -> floored out.
    val docs = (Seq.fill(5)("x y") ++ Seq.fill(5)("a b") ++
      Seq.fill(15)("a c") ++ Seq.fill(15)("d b") :+ "q r")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 5L, k = 10)
      .as[(String, String, Long, Long)].collect()
    val byPair = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(!byPair.contains(("q", "r")), "count-1 pair must be floored")
    assert(byPair(("x", "y")) > byPair(("a", "b")),
      s"exclusive pair must out-lift the chance pair: $byPair")
    // exclusive pair: p_xy=5/41, p_x=p_y=5/82 -> lift ~ 32.8
    assert(byPair(("x", "y")) > 30000000L && byPair(("x", "y")) < 34000000L)
  }

  test("bpeTrain: the classic low/lower/newest merge sequence, hand-verified") {
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", rounds = 6)
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    // round 1: "l o" and "o w" tie at 5 -> smallest pair wins;
    // round 3: "e r" (2) beats "low e" (2) lexicographically;
    // rounds 5-6 chew through newest's frequency-1 tail by pair order
    assert(got == List(
      (1L, "l o", 5L), (2L, "lo w", 5L), (3L, "e r", 2L),
      (4L, "low er", 2L), (5L, "e s", 1L), (6L, "e w", 1L)))
  }

  test("bpeTrain: non-overlapping greedy merge — 'a a a' merges once per round") {
    val docs = Seq("aaa aaa").toDF("text") // one word 'aaa', count 2
    val got = TextAnalysis.bpeTrain(docs, "text", rounds = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    // " a a a ": pair "a a" appears twice but merges leftmost-first
    // non-overlapping -> " aa a "; round 2 merges "aa a"
    assert(got == List((1L, "a a", 4L), (2L, "aa a", 2L)))
  }

  test("stopGrams: doc frequency not term frequency; threshold boundary exact") {
    // 10 docs in one source: 'the quick fox' in 2 docs (20%); one doc
    // repeats 'spam spam spam' 5x internally (TF high, DF=1)
    val docs = ((1L to 2L).map(i => (i, "s", "the quick fox jumps")) ++
      Seq((3L, "s", Seq.fill(5)("spam spam spam").mkString(" "))) ++
      (4L to 10L).map(i => (i, "s", s"unique$i words here now"))).toDF("doc_id", "src", "text")
    def grams(pct: Int) =
      graft.analytics.TextAnalysis.stopGrams(docs, "doc_id", "src", "text",
        n = 3, minDfPct = pct)
        .select("ngram").as[String].collect().toSet
    // at 20%: 'the quick fox'/'quick fox jumps' qualify (2/10 = exactly
    // the boundary, >= holds); the TF-heavy spam gram (DF 1/10) must not
    val g20 = grams(20)
    assert(g20.contains("the quick fox") && g20.contains("quick fox jumps"), g20)
    assert(!g20.exists(_.contains("spam")), g20)
    // at 21% the 2-doc grams fall below the integer threshold
    assert(!grams(21).contains("the quick fox"))
    // docs shorter than n contribute nothing (no crash, no grams)
    val short = Seq((1L, "s", "one two")).toDF("doc_id", "src", "text")
    assert(graft.analytics.TextAnalysis.stopGrams(short, "doc_id", "src",
      "text", n = 3, minDfPct = 0).count() == 0)
  }

  test("ngramNovelty: exact novel-gram counts vs a planted reference") {
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text") // grams: "a b c", "b c d"
    val cand = Seq(
      (1L, "a b c d"),       // both grams covered -> novelty 0
      (2L, "a b c x"),       // "a b c" covered, "b c x" novel -> 1/2
      (3L, "x y z w"),       // all novel -> 2/2
      (4L, "a b"),           // too short: excluded
      (5L, "A B C d")        // case-folded: covered
    ).toDF("doc_id", "text")
    val out = graft.analytics.TextAnalysis
      .ngramNovelty(cand, ref, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 0L, 0L)),
      2L -> ((2L, 1L, 500000L)),
      3L -> ((2L, 2L, 1000000L)),
      5L -> ((2L, 0L, 0L))))
  }

  test("zipfSlope: a perfect 1/rank law fits slope -1 exactly") {
    // counts 6, 3, 2 = 6/rank for ranks 1..3 -> ln-ln slope exactly -1
    val docs = Seq((1L, "a a a a a a b b b c c")).toDF("doc_id", "text")
    val got = graft.analytics.TextAnalysis.zipfSlope(docs, "text", topN = 100)
      .collect().head
    assert(got.getLong(0) == 3L)
    assert(got.getDouble(1) == -1.0)
  }

  test("readability: hand-computed exact e3 Flesch; no sentences -> NULL") {
    // "go to bed." -> 3 words, 1 sentence run, 3 vowel groups:
    // 206835 - 1015*3//1 - 84600*3//3 = 119190
    val docs = Seq(("g", "go to bed."), ("g", "")).toDF("lang", "text")
    val got = graft.analytics.TextAnalysis.readability(
      docs.filter(col("text") =!= ""), "lang", "text").collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4),
      got.getLong(5)) == ((1L, 3L, 1L, 3L, 119190L)))
    val flat = Seq(("h", "no punctuation here")).toDF("lang", "text")
    val n = graft.analytics.TextAnalysis.readability(flat, "lang", "text")
      .collect().head
    assert(Option(n.get(5)) == None)
  }

  test("tfIdfCosinePairs: identical docs hit cosine 1; blocking and zero-idf terms prune") {
    val docs = Seq(
      (1L, "x x y", "b1"), (2L, "x x y", "b1"),   // identical -> cos 1
      (3L, "z z z z", "b1"),                      // shares no weighted term
      (4L, "x x y", "b2")                         // identical but other block
    ).toDF("doc_id", "text", "source")
    val got = graft.analytics.TextAnalysis
      .tfIdfCosinePairs(docs, "doc_id", "text", "source", num = 4, den = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1000000L)))
    // a corpus-wide term carries idf 0 and is dropped: docs sharing
    // ONLY that term never pair
    val allShare = Seq((1L, "w a", "b"), (2L, "w b", "b")).toDF("doc_id", "text", "source")
    assert(graft.analytics.TextAnalysis
      .tfIdfCosinePairs(allShare, "doc_id", "text", "source").collect().isEmpty)
  }

  test("tfIdfCosinePairs: df cap is EXACT — capped == uncapped, incl. dropped-only pairs") {
    // Constructed so the cap bites: with maxDocFreq = 2, term h (df 3)
    // is dropped, so the (1,2) pair shares ONLY dropped terms and must
    // survive via the heavy-doc phase-1b path; (3,4) pairs on kept
    // terms through the capped phase-1a join. Fillers push nd to 8 so
    // no term is corpus-wide (idf stays > 0).
    val docs = Seq(
      (1L, "h h h h h h u1", "b"), (2L, "h h h h h h u2", "b"),
      (3L, "k k k m u3", "b"), (4L, "k k k m u4", "b"),
      (5L, "h z1 z2", "b"), (6L, "u5 u6", "b"), (7L, "u7", "b"),
      (8L, "u8", "b")).toDF("doc_id", "text", "source")
    def pairs(cap: Long) = graft.analytics.TextAnalysis
      .tfIdfCosinePairs(docs, "doc_id", "text", "source", num = 4, den = 5,
        maxDocFreq = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = pairs(Long.MaxValue)
    assert(uncapped.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L)))
    assert(pairs(2L) == uncapped)   // bit-identical cosines, both paths
    assert(pairs(1L) == uncapped)   // everything dropped -> all heavy-path
    // and on real data: the default cap changes nothing
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val capped = graft.analytics.TextAnalysis
      .tfIdfCosinePairs(real, "doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = graft.analytics.TextAnalysis
      .tfIdfCosinePairs(real, "doc_id", "text", "source",
        maxDocFreq = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == full)
  }

  test("tfIdfCosinePairs: heavy-grid guard fails loudly past maxHeavyPerBlock") {
    // same corpus as the cap-exactness case: with maxDocFreq = 2, docs
    // 1 and 2 hold their mass in dropped terms (heavy), so block "b"
    // has >= 2 heavy docs — a guard of 1 must throw with the block
    // named, instead of quietly enumerating the within-block grid
    val docs = Seq(
      (1L, "h h h h h h u1", "b"), (2L, "h h h h h h u2", "b"),
      (3L, "k k k m u3", "b"), (4L, "k k k m u4", "b"),
      (5L, "h z1 z2", "b"), (6L, "u5 u6", "b"), (7L, "u7", "b"),
      (8L, "u8", "b")).toDF("doc_id", "text", "source")
    val ex = intercept[Throwable] {
      graft.analytics.TextAnalysis.tfIdfCosinePairs(docs, "doc_id", "text",
        "source", num = 4, den = 5, maxDocFreq = 2L, maxHeavyPerBlock = 1L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m => m.contains("maxHeavyPerBlock")),
      s"expected the guard's message, got: $ex")
    // and a generous guard (the default) passes the same corpus
    assert(graft.analytics.TextAnalysis.tfIdfCosinePairs(docs, "doc_id",
      "text", "source", num = 4, den = 5, maxDocFreq = 2L)
      .collect().nonEmpty)
  }

  test("tokenEntropy: exact bits for uniform and single-token docs") {
    val docs = Seq((1L, "x x y y"), (2L, "z"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = graft.analytics.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((4L, 1000000L)),   // two symbols, p=1/2 each: H = 1 bit
      2L -> ((1L, 0L)),         // single token: H = 0
      3L -> ((4L, 2000000L))))  // four uniform symbols: H = 2 bits
  }
}
