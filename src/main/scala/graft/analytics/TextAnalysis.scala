package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (SURVEY §7.4):
  * tokenization, token counting, n-gram heuristic language ID, quality
  * scoring, document fingerprinting.
  *
  * Everything is built from codegen'd built-ins (`split`, higher-order
  * array functions, `regexp_*`, `md5`) — no UDFs, so the whole stage stays
  * inside WholeStageCodegen and scales linearly with no shuffle at all
  * (pure per-row projection).
  */
object TextAnalysis {

  /** Whitespace tokenization after pandas-parity trim. */
  def tokens(c: Column): Column =
    split(regexp_replace(c, "^\\s+|\\s+$", ""), "\\s+")

  /** Unicode NFC canonicalization (graft.functions.NfcNormalize) — run
    * BEFORE any byte-keyed operator (fingerprints, exact dedup,
    * shingles): composed and decomposed spellings of the same text must
    * collapse to one byte sequence or every hash-based stage double-
    * counts them. Codegen'd, with an isNormalized fast path that makes
    * already-clean (e.g. ASCII) corpora near-free. */
  def normalizeNfc(c: Column): Column = graft.functions.NfcNormalize(c)

  /** Full text canonicalization for match keys: NFC first (so composed
    * and decomposed spellings see the SAME downstream edits — stripping
    * punctuation before NFC would keep a decomposed base letter but
    * drop a composed one), then lower-case, strip everything outside
    * [a-z0-9 ], collapse whitespace runs, trim. A zero-shuffle
    * projection; the canonical form is what exact dedup and entity
    * matching should key on. */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(normalizeNfc(c)), "\\s+", " "),
        "[^a-z0-9 ]", ""),
      " +", " "))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup. */
  def shingles(tokensCol: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(size(tokensCol) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(tokensCol, i, lit(n)))))

  /** Tiny per-language stopword lexicons for the n-gram language-ID
    * heuristic. Public-knowledge top stopwords. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "los", "que", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un", "est", "pas"))

  /** Count of tokens that belong to `lexicon` (with multiplicity). */
  def lexiconHits(tokensCol: Column, lexicon: Seq[String]): Column =
    size(filter(tokensCol, tk => tk.isin(lexicon.map(lit): _*)))

  /** Heuristic language ID: argmax of stopword hits, fixed tie-break
    * order (declaration order of `Stopwords`), 'und' (undetermined) when
    * no lexicon hits at all. */
  def langId(textCol: Column): Column = {
    val toks = tokens(lower(textCol))
    val hits = Stopwords.map { case (lang, lex) => lang -> lexiconHits(toks, lex) }
    // argmax with declaration-order tie-break: first lang (in declaration
    // order) whose hits are > 0 and >= all others wins.
    val cases = hits.zipWithIndex.map { case ((lang, h), i) =>
      val others = hits.zipWithIndex.collect { case ((_, o), j) if j != i => o }
      val geAll = others.foldLeft(h > 0) { (c, o) => c && h >= o }
      (geAll, lang)
    }
    cases.foldRight(lit("und")) { case ((cond, lang), elseCol) =>
      when(cond, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality-scoring features: deterministic arithmetic only (integer
    * counts and exact-operand divisions), so results are engine-stable. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val toks = tokens(c)
    df.withColumn("n_chars_m", length(c).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_punct",
        size(split(c, "[.,;:!?]", -1)).cast("long") - 1L)
      .withColumn("n_stopwords",
        lexiconHits(tokens(lower(c)), Stopwords.flatMap(_._2)).cast("long"))
      .withColumn("avg_token_len",
        (length(c) - (size(toks) - 1)).cast("double") / size(toks).cast("double"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_tokens").cast("double"))
  }

  /** Composite quality score in [0,1]-ish: longer docs with a healthy
    * stopword ratio score higher. Deterministic double arithmetic. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol)
      .withColumn("quality_score",
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5
          + least(col("stopword_ratio") * 4.0, lit(1.0)) * 0.5)

  /** Document fingerprint: md5 of the whitespace-normalized, lower-cased
    * text — the exact-dedup key (content-addressed, engine-portable). */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(regexp_replace(c, "^\\s+|\\s+$", "")), "\\s+", " ")
      .cast("binary"))

  /** Engine-native 64-bit fingerprint over the same normalization —
    * the codegen'd rolling hash (graft.functions.RollingHash64), ~10×
    * cheaper than md5 for corpus-scale dedup keys. */
  def fingerprint64(c: Column): Column =
    graft.functions.RollingHash64(
      regexp_replace(lower(regexp_replace(c, "^\\s+|\\s+$", "")), "\\s+", " "))

  /** Repetition/quality signals in the style of the public Gopher-paper
    * filtering rules (mean word length, symbol-to-word ratio, fraction
    * of words with an alphabetic character, duplicate-line fraction) —
    * the standard web-corpus quality gates. Pure per-row projection of
    * exact integer counts + exact-operand divisions: codegen'd,
    * shuffle-free, engine-stable. */
  /** The gopher feature columns, named — shared by the batch
    * [[gopherStats]] projection and the streaming curation path (a
    * stream cannot join features back onto itself, so it projects them
    * inline alongside the text). */
  def gopherCols(c: Column): Seq[Column] = {
    val toks = tokens(c)
    val lines = split(c, "\n", -1)
    Seq(
      size(toks).cast("long").as("n_tokens"),
      (aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
        .cast("double") / size(toks).cast("double")).as("mean_word_length"),
      (size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double")
        / size(toks).cast("double")).as("alpha_word_ratio"),
      ((length(c) - length(regexp_replace(c, "[#@$%&]", ""))).cast("double")
        / size(toks).cast("double")).as("symbol_to_word_ratio"),
      (lit(1.0) - size(array_distinct(lines)).cast("double")
        / size(lines).cast("double")).as("duplicate_line_fraction"))
  }

  def gopherStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: gopherCols(col(textCol)): _*)

  /** Gopher repetition signals (Rae et al. 2021 appendix A1.1, public
    * arXiv:2112.11446) — the repeated-n-gram gates [[gopherCols]] lacks:
    * per document, the most frequent word BIGRAM (tie-break: max count,
    * then lexicographically smallest — total, so the result is
    * engine-independent and fully oracle-able), the fraction of
    * characters it covers (count × gram length / text length; overlaps
    * can push the signal past 1 on degenerate docs — it is a gate
    * feature, not a probability), and the fraction of 5-gram
    * OCCURRENCES that are duplicates (1 − distinct/total).
    *
    * Scale shape: a pure per-row projection, zero shuffles — the mode is
    * computed as the longest RUN in the SORTED gram array via one
    * `aggregate()` lambda per row (ascending scan + strictly-greater
    * update keeps the lexicographically-smallest max-count gram), where
    * the relational formulation (explode → count → window) would shuffle
    * corpus-volume gram rows twice. The oracle uses the relational form;
    * green means the two agree on every doc. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    def grams(n: Int): Column = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    val g2 = grams(2)
    val g5 = grams(5)
    val mode = aggregate(array_sort(g2),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit("").as("bestg")),
      (s, x) => {
        val run2 = when(x === s.getField("prev"), s.getField("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run2.as("run"),
          when(run2 > s.getField("best"), run2)
            .otherwise(s.getField("best")).as("best"),
          when(run2 > s.getField("best"), x)
            .otherwise(s.getField("bestg")).as("bestg"))
      })
    df.select(col(idCol),
      when(size(g2) === 0, lit("")).otherwise(mode.getField("bestg"))
        .as("top_bigram"),
      when(size(g2) === 0, lit(0.0))
        .otherwise(mode.getField("best") * length(mode.getField("bestg"))
          / length(col(textCol)))
        .as("top_bigram_char_fraction"),
      when(size(g5) === 0, lit(0.0))
        .otherwise((size(g5) - size(array_distinct(g5))).cast("double") / size(g5))
        .as("dup_5gram_fraction"))
  }

  /** Within-document repeated-line removal (the CCNet-style repetition
    * filter): keep each line's FIRST occurrence, preserving order, and
    * report how many were dropped. One hash-set pass per row via the
    * codegen'd DedupLinesExpr — O(total chars), robust to pathological
    * docs with 10⁵ repeated lines (the previous array_position filter
    * was O(lines²) per doc) — and still a shuffle-free projection. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n", -1)
    val deduped = graft.functions.DedupLinesExpr(col(textCol))
    df.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(split(deduped, "\n", -1))).cast("long").as("n_removed"),
      deduped.as("text_deduped"))
  }

  /** PII scrubbing: emails and phone-shaped digit runs replaced with
    * typed placeholders. Conservative regex syntax (character classes +
    * counted quantifiers only) so Java-regex and RE2 engines agree;
    * match counts returned alongside for audit. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"

  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    df.select(col(idCol),
      size(regexp_extract_all(c, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(c, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
        .as("text_scrubbed"))
  }

  /** Linear quality-model scoring — the engine-side shape of a trained
    * quality classifier (fasttext/logreg-style): a fixed-order dot
    * product of engineered features with literal weights. The LINEAR
    * score (no sigmoid) keeps the arithmetic a fixed sequence of IEEE
    * multiply-adds — deterministic on any engine, so the stage is fully
    * oracle-checkable; thresholding a monotone transform is equivalent
    * to thresholding the logit anyway. Weights ship with the pipeline
    * the way a model artifact would. */
  def linearQualityScore(df: DataFrame, idCol: String, textCol: String,
                         weights: Map[String, Double],
                         bias: Double = 0.0): DataFrame = {
    val feats = gopherStats(df, idCol, textCol)
    val score = weights.toSeq.sortBy(_._1).foldLeft(lit(bias)) {
      case (acc, (feature, w)) => acc + col(feature) * w
    }
    feats.withColumn("quality_logit", score)
  }

  /** Default sentiment lexicon: AFINN-style integer valences (public
    * convention: -5..+5 per term) for general sentiment words plus the
    * service/performance terms of the reference's complaint-analytics
    * domain (reference README.md:5-7 — resolution status, service
    * quality). Ships with the pipeline the way linearQualityScore's
    * weights do; callers pass their own lexicon for other domains. */
  val SentimentLexicon: Map[String, Int] = Map(
    "good" -> 3, "great" -> 3, "excellent" -> 5, "happy" -> 3,
    "love" -> 3, "best" -> 3, "helpful" -> 2, "thanks" -> 2,
    "resolved" -> 2, "fast" -> 1, "quick" -> 1, "big" -> 1,
    "bad" -> -3, "terrible" -> -5, "awful" -> -4, "worst" -> -5,
    "hate" -> -4, "angry" -> -3, "poor" -> -2, "broken" -> -3,
    "unresolved" -> -2, "problem" -> -2, "error" -> -2, "fail" -> -3,
    "slow" -> -1, "delay" -> -1, "dup" -> -1, "small" -> -1)

  /** Default negation cues for [[sentimentScore]]'s negation-aware mode
    * (public sentiment-analysis convention: a valence flips sign when
    * immediately preceded by a negator). */
  val Negators: Seq[String] = Seq(
    "not", "no", "never", "nor", "cannot", "isnt", "dont", "wont",
    "cant", "didnt", "wasnt", "doesnt")

  /** Lexicon sentiment scoring (SURVEY §7.4): per document, the number
    * of lexicon-matched tokens, the integer valence sum, and the sign
    * label — one native codegen'd pass over the token array
    * ([[graft.functions.SentimentExpr]]), zero shuffle, which at 100 TB
    * beats the relational explode→join→re-aggregate by the full
    * corpus-token shuffle it never does (a lexicon is KBs; shipping it
    * in the plan costs nothing, the classic broadcast-join degenerate
    * case). Exact integer arithmetic end to end — fully
    * oracle-checkable.
    *
    * With `negators` non-empty, a matched token's valence flips sign
    * when the IMMEDIATELY preceding token is a negation cue ("not
    * fast" scores −1, not +1) — the standard unigram-negation rule,
    * folded into the same single pass.
    *
    * §7.3 A/B vs the prior higher-order-function route (three
    * interpreted lambda walks per document — kept as
    * [[sentimentScoreHof]], the differential anchor), sf0.1 corpus,
    * 3-trial medians in one session (2026-08-15): scoring projection
    * alone (sum-aggregated) plain 0.44→0.37 s (1.2×), negation
    * 0.80→0.37 s (2.2×); the registered query shape (orderBy+collect)
    * plain 1.07→0.58 s (1.8×), negation 3.05→0.54 s (5.6×) — the
    * zip_with/shifted-self construction was the expensive half, and it
    * folds into the same generated loop for free. The per-document
    * projection cost is what scales to 100 TB. */
  def sentimentScore(df: DataFrame, idCol: String, textCol: String,
                     lexicon: Map[String, Int] = SentimentLexicon,
                     negators: Seq[String] = Nil): DataFrame = {
    require(lexicon.nonEmpty, "sentimentScore needs a non-empty lexicon")
    val s = graft.functions.SentimentExpr(
      tokens(lower(col(textCol))), lexicon, negators)
    df.select(col(idCol),
        s.getField("n_scored_tokens").as("n_scored_tokens"),
        s.getField("sentiment_score").as("sentiment_score"))
      .withColumn("sentiment_label",
        when(col("sentiment_score") > 0, "positive")
          .when(col("sentiment_score") < 0, "negative")
          .otherwise("neutral"))
  }

  /** The pre-§7.3-A/B higher-order-function formulation of
    * [[sentimentScore]] (in-row map literal probed via
    * `filter`/`aggregate`/`zip_with`): kept as the independent second
    * implementation SentimentExprSpec differentials the codegen'd
    * expression against — same contract, different evaluation engine
    * (interpreted lambdas vs generated loop). Not on any hot path. */
  private[graft] def sentimentScoreHof(df: DataFrame, idCol: String,
                                       textCol: String,
                                       lexicon: Map[String, Int] = SentimentLexicon,
                                       negators: Seq[String] = Nil): DataFrame = {
    require(lexicon.nonEmpty, "sentimentScore needs a non-empty lexicon")
    val lex = typedlit(lexicon.map { case (k, v) => k -> v.toLong })
    val toks = tokens(lower(col(textCol)))
    val scored =
      if (negators.isEmpty)
        df.select(col(idCol),
          size(filter(toks, t => element_at(lex, t).isNotNull)).cast("long")
            .as("n_scored_tokens"),
          aggregate(toks, lit(0L),
            (acc, t) => acc + coalesce(element_at(lex, t), lit(0L)))
            .as("sentiment_score"))
      else {
        val negLit = typedlit(negators)
        // prev[i] = toks[i-1] ('' for the first token): zip the array
        // against its shifted self — per-row, no window, no shuffle
        val prev = concat(array(lit("")),
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))))
        val signed = zip_with(toks, prev, (t, p) =>
          when(element_at(lex, t).isNotNull,
            when(array_contains(negLit, p), -element_at(lex, t))
              .otherwise(element_at(lex, t))))
        df.select(col(idCol),
          size(filter(signed, x => x.isNotNull)).cast("long")
            .as("n_scored_tokens"),
          aggregate(signed, lit(0L), (acc, x) => acc + coalesce(x, lit(0L)))
            .as("sentiment_score"))
      }
    scored.withColumn("sentiment_label",
      when(col("sentiment_score") > 0, "positive")
        .when(col("sentiment_score") < 0, "negative")
        .otherwise("neutral"))
  }

  /** BPE-ish subword tokenizer: letter runs, digit runs, and single
    * non-alphanumeric marks — the pre-tokenization split every BPE-family
    * tokenizer applies (public GPT-2/SentencePiece convention), a good
    * proxy for LLM token counting without a vocabulary. */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Per-(doc, term) TF-IDF with LINEAR idf (n_docs/df, no log): keyword
    * weighting for corpus exploration and topic-mix reports. The linear
    * variant keeps every float op exactly rounded (integer-valued
    * doubles through one divide and one multiply), so scores are
    * bit-identical on any IEEE engine — fully oracle-checkable, unlike
    * ln-based idf (libm ln is not correctly-rounded and differs across
    * engines in the last ulp). Ranking is idf-monotone either way.
    *
    * Plan shape: explode → (doc, term) count [one shuffle on the pair]
    * → term document-frequency from that relation [one shuffle on term,
    * vocabulary-sized output] → tf ⋈ df on term (the df side is
    * vocabulary-scale — AQE broadcasts it at corpus scale). Never
    * doc × doc, never a driver-side vocabulary. The df branch re-runs
    * the tokenize+explode+partial-agg lineage (one extra linear map
    * pass — no exchange reuse across different aggregates); this is
    * deliberate: the alternative `count over (partition by token)`
    * window would hash every occurrence of a stop word to one
    * partition, trading a linear pass for a skew hotspot. Cache the
    * input if the double tokenization dominates. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nDocs = df.groupBy().agg(count(lit(1)).as("__n_docs"))
    val tf = df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // tf rows are distinct (doc, token) pairs, so df = count(*) per token
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tf_idf",
        col("tf").cast("double")
          * (col("__n_docs").cast("double") / col("df").cast("double")))
      .drop("__n_docs")
  }

  /** The most distinctive term per document: argmax of [[tfIdf]] with a
    * deterministic token tie-break — the keyword-extraction stage of a
    * corpus report. One extra shuffle on the doc id for the per-doc
    * top-1 window. */
  def topTfIdfTerm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tf_idf").desc, col("token"))
    tfIdf(df, idCol, textCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tf_idf"))
  }

  /** Type-1 (inverse-empirical-CDF) quantiles of the whitespace token
    * count per group: the value at rank ceil(p·n) in sorted order — pure
    * integer SELECTION, no interpolation, so the report is engine-exact
    * where interpolated quantiles (quantile_cont / percentile) differ in
    * the last ulp across engines. Ties need no tie-break: the VALUE at a
    * rank under an order by value is well-defined regardless of how
    * equal values are permuted.
    *
    * One shuffle on the group key; the rank window runs per group. For
    * a 100 TB corpus with few groups (languages), the per-group sort is
    * the cost — acceptable for an offline report; use approx sketches
    * when per-group data exceeds a partition. */
  def lengthQuantiles(df: DataFrame, groupCol: String, textCol: String,
                      ps: Seq[(String, Double)] = Seq(
                        "p25" -> 0.25, "p50" -> 0.5,
                        "p75" -> 0.75, "p90" -> 0.9)): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("n_tokens")
    val ranked = df
      .select(col(groupCol), tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    val aggs = ps.map { case (name, p) =>
      max(when(col("__rn") === ceil(lit(p) * col("__n")).cast("long"),
        col("n_tokens"))).as(name)
    } :+ max(col("__n")).cast("long").as("n_docs")
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** The 100 TB path for [[lengthQuantiles]]: Spark's built-in GK sketch
    * (`percentile_approx`) — one mergeable sketch per group with
    * map-side partial aggregation, no per-group sort, rank error bounded
    * by n/accuracy. Sketch results depend on merge order within the
    * accuracy bound, so this registers rows-only; the differential spec
    * bounds its divergence from the exact rank-selection quantiles. */
  def lengthQuantilesApprox(df: DataFrame, groupCol: String, textCol: String,
                            ps: Seq[(String, Double)] = Seq(
                              "p25" -> 0.25, "p50" -> 0.5,
                              "p75" -> 0.75, "p90" -> 0.9),
                            accuracy: Int = 10000): DataFrame = {
    val sketch = percentile_approx(col("n_tokens"),
      array(ps.map(p => lit(p._2)): _*), lit(accuracy)).as("__qs")
    val counts = df
      .select(col(groupCol), tokenCount(col(textCol)).as("n_tokens"))
      .groupBy(groupCol)
      .agg(sketch, count(lit(1)).as("n_docs"))
    val cols = col(groupCol) +: ps.zipWithIndex.map { case ((name, _), i) =>
      element_at(col("__qs"), i + 1).as(name)
    } :+ col("n_docs")
    counts.select(cols: _*)
  }

  /** Driver-green verdict for [[lengthQuantilesApprox]]: the GK sketch
    * quantiles checked against the exact rank-selection quantiles
    * (both computed here), emitting the EXACT values (plain SQL — the
    * q85 oracle shape) plus a per-quantile within-bound boolean using
    * the differential spec's pinned bound |exact − approx| ≤
    * max(2, exact DIV 10). Deterministic: the sketch's merge-order
    * wobble stays inside the bound for any partitioning, so the
    * boolean is stable.
    *
    * Scale shape: the sketch path is the mergeable no-sort build; the
    * exact path is the per-group window (the verdict deliberately pays
    * it — the invariant is the point); the join is groups-sized. */
  def lengthQuantilesApproxVerdict(df: DataFrame, groupCol: String,
                                   textCol: String): DataFrame = {
    val ps = Seq("p25", "p50", "p75", "p90")
    val exact = lengthQuantiles(df, groupCol, textCol)
    val approx = lengthQuantilesApprox(df, groupCol, textCol)
      .select(col(groupCol) +: ps.map(p => col(p).as(s"__a_$p")): _*)
    val okCols = ps.map(p =>
      (abs(col(p) - col(s"__a_$p"))
        <= greatest(lit(2), expr(s"$p DIV 10"))).as(s"${p}_ok"))
    exact.join(approx, groupCol)
      .select((col(groupCol) +: ps.map(col)) ++ (col("n_docs") +: okCols): _*)
  }

  /** Positional inverted index: (term, doc, sorted 1-based positions,
    * tf) — the search-engine build artifact (posting lists with
    * positions enable phrase and proximity queries, not just lookup).
    * Positions come from the posexplode generator (no window, no
    * zipWithIndex RDD detour); the per-posting list is sorted so the
    * output is deterministic under any shuffle order — collect_list
    * alone is arrival-ordered and would flap the hash compare.
    *
    * Scale shape: one generator projection + ONE hash aggregate keyed
    * (term, doc). Postings skew (stop words) lands in the aggregate's
    * map-side partials, not a join; a df-cap for stop-term pruning is
    * the caller's filter on tf/df afterwards. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.select(col(idCol),
        posexplode(tokens(lower(col(textCol)))).as(Seq("__pos", "term")))
      .select(col(idCol), col("term"), (col("__pos") + 1).cast("long").as("__p"))
      .groupBy(col("term"), col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("positions"),
        count(lit(1)).as("tf"))
  }

  /** Exact phrase search by positional postings: documents where the
    * words of `phrase` occur strictly consecutively, with the match
    * count. The token stream is PRUNED to the phrase's words before
    * anything aggregates — the postings that materialize are the
    * phrase terms' only, never the whole index — and the adjacency
    * test is a higher-order filter over position arrays (p, p+1, …,
    * p+k all present), no self-join of the corpus.
    *
    * Scale shape: one filtered generator + one hash aggregate keyed
    * (doc, term), then k−1 equi-joins on the doc id between postings
    * relations already reduced to phrase-term size. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val words = phrase.map(_.toLowerCase)
    val postings = df
      .select(col(idCol),
        posexplode(tokens(lower(col(textCol)))).as(Seq("__pos", "__term")))
      .filter(col("__term").isin(words: _*))
      .select(col(idCol), col("__term"), (col("__pos") + 1).cast("long").as("__p"))
      .groupBy(col(idCol), col("__term"))
      .agg(sort_array(collect_list(col("__p"))).as("__ps"))
    def of(w: String, as: String) =
      postings.filter(col("__term") === w).select(col(idCol), col("__ps").as(as))
    val joined = words.indices.tail.foldLeft(of(words.head, "__p0")) {
      (acc, i) => acc.join(of(words(i), s"__p$i"), Seq(idCol))
    }
    val adjacency = org.apache.spark.sql.functions.filter(col("__p0"),
      p => words.indices.tail
        .map(i => array_contains(col(s"__p$i"), p + i))
        .reduceOption(_ && _).getOrElse(lit(true)))
    joined
      .select(col(idCol), size(adjacency).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** BM25 ranking (Robertson-Spärck Jones) for a bag-of-words query:
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene
    * variant — never negative). Determinism: tf/df/|d|/N are exact
    * longs; avgdl enters as the exact ratio sumdl/N so the normalizer
    * is (tf + k1·(1−b) + k1·b·|d|·N/sumdl) evaluated in one fixed
    * float order; per-term scores round to 9 decimals and SUM AS
    * DECIMALS (order-independent — the dsirWeights contract). k1/b
    * arrive ×100 as integers so the constants are exact.
    *
    * Scale shape: postings prune to the query's terms before
    * aggregating (phraseSearch's trick); df and the length stats are
    * two tiny aggregates broadcast back; one final per-doc sum. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           query: Seq[String], k1E2: Long = 120L, bE2: Long = 75L): DataFrame = {
    require(query.nonEmpty, "bm25: empty query")
    val words = query.map(_.toLowerCase).distinct
    val D6 = org.apache.spark.sql.types.DecimalType(18, 9)
    // persisted: consumed by the length stats AND the tf branch inside
    // the one returned plan, so there is no post-consumption point to
    // unpersist at; release is session cache hygiene (clearCache
    // between operators, as Verify/Bench do — marketBasket's contract)
    val toks = df.select(col(idCol),
        explode(tokens(lower(col(textCol)))).as("__term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__nd"), sum(col("__dl")).as("__sumdl"))
    val tf = toks.filter(col("__term").isin(words: _*))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val k1 = k1E2.toDouble / 100.0
    val b = bE2.toDouble / 100.0
    val idf = log(
      (col("__nd") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
    val norm = col("__tf") + lit(k1) * (lit(1.0 - b)
      + lit(b) * col("__dl") * col("__nd") / col("__sumdl"))
    val termScore = round(
      idf * (col("__tf") * lit(k1 + 1.0)) / norm, 9).cast(D6)
    tf.join(broadcast(dfreq), "__term")
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(sum(termScore)
        .cast(org.apache.spark.sql.types.DecimalType(28, 9)).as("bm25"))
  }

  /** Character-pair counts for the FIRST round of BPE vocabulary
    * induction (Sennrich et al. 2016): every adjacent character pair
    * inside a word, weighted by the word's corpus frequency — the
    * statistic a tokenizer trainer's merge step maximizes. Top `k`
    * pairs by (count desc, pair asc) so the cut is deterministic.
    *
    * Scale shape: the corpus collapses to the DISTINCT-WORD relation
    * first (one hash aggregate — Heaps' law makes this orders of
    * magnitude smaller than the token stream), then pairs explode from
    * distinct words only, weighted by the word count. Single-character
    * words carry no pairs and are filtered BEFORE the generator (Spark's
    * sequence(1, 0) counts DOWN rather than producing the empty array —
    * the guard is semantics, not just speed). Top-k plans as
    * TakeOrderedAndProject: map-side partial top-k, no global sort. */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int = 100): DataFrame = {
    val words = df
      .select(explode(tokens(lower(col(textCol)))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__wn"))
    words
      .filter(length(col("__w")) >= 2)
      .select(col("__wn"), explode(expr(
        "transform(sequence(1, length(__w) - 1), i -> substring(__w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("__wn")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(k)
  }

  /** Adjacent token pairs of a token array as an array of (w1, w2)
    * structs — a zero-shuffle generator (two slices zipped in-row).
    * Arrays with fewer than two tokens yield the empty array (slice
    * with length 0 would throw, so the guard is semantics). */
  def bigrams(tokensCol: Column): Column =
    when(size(tokensCol) >= 2,
      zip_with(
        slice(tokensCol, lit(1), size(tokensCol) - 1),
        slice(tokensCol, lit(2), size(tokensCol) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Bigram language-model likelihood scoring — the CCNet-style quality
    * filter (Wenzek et al. 2020): train an add-1-smoothed bigram LM on
    * the rows where `isTrainCol` is true, then score every eval row by
    * its mean per-bigram probability. Output: (idCol, n_bigrams,
    * score_e9) for eval rows with >= 2 tokens; fluent/common text scores
    * high, gibberish scores near 1e9/V.
    *
    * All arithmetic is exact integers (engine-portable): per-bigram
    * probability (c2+1)/(c1+V) is carried as `1e9 * (c2+1) DIV (c1+V)`
    * and the doc score is the integer mean — no floats, no logs, so the
    * result hash-matches any engine. The e9 scale bounds c2 < 9.2e9;
    * for corpora beyond ~1e10 occurrences of one bigram, drop to e6.
    *
    * Scale shape: bigram extraction is an in-row generator (no
    * positional self-join); the model relations c2/c1 are bigram-TYPE-
    * and vocabulary-sized (Heaps' law: far smaller than the token
    * stream), so the two model joins shuffle on w1[,w2] bounded by type
    * counts and AQE broadcasts them when small; V is a 1-row broadcast. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    isTrainCol: String): DataFrame = {
    val toks = df.select(col(idCol), col(isTrainCol).as("__train"),
      tokens(lower(col(textCol))).as("__toks"))
    val big = toks
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), col("__train"), explode(bigrams(col("__toks"))).as("__bg"))
      .select(col(idCol), col("__train"),
        col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val train = big.filter(col("__train"))
    val c2 = train.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
    val c1 = train.groupBy("w1").agg(count(lit(1)).as("__c1"))
    val v = toks.filter(col("__train"))
      .select(explode(col("__toks")).as("__term"))
      .agg(count_distinct(col("__term")).as("__v"))
    big.filter(!col("__train"))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col(idCol),
        expr("1000000000L * (coalesce(__c2, 0L) + 1L) DIV (coalesce(__c1, 0L) + __v)")
          .as("__p_e9"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("__p_e9").as("__sp"))
      .select(col(idCol), col("n_bigrams"),
        expr("__sp DIV n_bigrams").as("score_e9"))
  }

  /** Top-k collocations by lift — observed bigram probability over the
    * independence expectation, the log-free PMI analog ("new york"
    * scores high; "of the" near 1e6 despite its count). minCount floors
    * the bigram count so one-off pairs of rare words can't dominate.
    *
    * lift = p(w1w2) / (p(w1)·p(w2)) is computed as a FIXED integer
    * division sequence — ((c12·Nu DIV c1)·Nu DIV c2)·1e6 DIV Nb — so
    * every engine truncates identically (the value is lift±rounding,
    * the bytes are deterministic). Intermediate bound: ≤ Nu²·1e6, safe
    * in i64 through ~3e6-token corpora; scale the 1e6 down for more.
    *
    * Scale shape: bigram/unigram counts are type-sized relations
    * (Heaps' law); the two unigram joins shuffle on the word keys and
    * AQE broadcasts them when small; totals are 1-row broadcasts;
    * top-k plans as TakeOrderedAndProject. */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
                   k: Int): DataFrame = {
    val toks = df.select(tokens(lower(col(textCol))).as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("__c"))
    val nu = uni.agg(sum("__c").as("__nu"))
    val big = toks.filter(size(col("__toks")) >= 2)
      .select(explode(bigrams(col("__toks"))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
    val nb = big.agg(sum("pair_count").as("__nb"))
    big.filter(col("pair_count") >= minCount)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("__c", "__c1"), Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("__c", "__c2"), Seq("w2"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("pair_count"),
        expr("pair_count * __nu DIV __c1 * __nu DIV __c2 * 1000000L DIV __nb")
          .as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Distributed BPE tokenizer training, `rounds` merges. The Spark-
    * first move: BPE never needs the corpus after ONE scan — it
    * operates on the WORD-COUNT relation (Heaps-law-sized: a 100 TB
    * corpus collapses to a few million distinct words), so every merge
    * round is vocab-sized work. Each word is carried as a space-
    * delimited symbol string with sentinel spaces (" w o r d "); a
    * merge of pair "x y" is `replace(s, " x y ", " xy ")`, whose
    * leftmost-first non-overlapping semantics (scan resumes AFTER the
    * replacement — "a a a" merges once) is the classic greedy BPE
    * application, and is implemented identically by every engine's
    * `replace`. Pair selection is (max weighted count, then smallest
    * pair string) — a total order, so the merge sequence is
    * deterministic on any engine/partitioning.
    *
    * The argmax pair is a 1-row relation crossJoin-broadcast back onto
    * the vocab — no driver collect; rounds truncate lineage with the
    * shared capped cut (graft.operators.Fixpoint — reliable checkpoint
    * when a dir is configured, carried stats capped).
    *
    * Returns the merge table (round, pair, freq) — the artifact a
    * tokenizer ships. reference: the reference has no tokenizer; this
    * is the LLM-pipeline extension surface (SURVEY §7.5). */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    bpeCore(df, textCol, rounds)._1

  /** The train loop, returning (merge table, final vocab) — the vocab
    * keeps (word, symbol string, count) so encoders can map corpus
    * words to their post-merge segmentations without re-deriving. */
  private def bpeCore(df: DataFrame, textCol: String,
                      rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    val words = df
      .select(explode(tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .select(col("__w"), concat(lit(" "),
        array_join(expr("regexp_extract_all(__w, '.', 0)"), " "),
        lit(" ")).as("__s"),
        col("__c"))
    var vocab = graft.operators.Fixpoint.cut(words)
    var merges: DataFrame = null
    (1 to rounds).foreach { r =>
      val pairs = vocab
        .select(split(trim(col("__s")), " ").as("__syms"), col("__c"))
        .filter(size(col("__syms")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(__syms) - 2),
               i -> concat(__syms[i], ' ', __syms[i + 1]))""")).as("pair"),
          col("__c"))
        .groupBy("pair").agg(sum(col("__c")).as("freq"))
      val best = pairs
        .orderBy(col("freq").desc, col("pair").asc).limit(1)
        .withColumn("round", lit(r.toLong))
      val bestCut = graft.operators.Fixpoint.cut(best)
      merges = if (merges == null) bestCut else merges.unionByName(bestCut)
      vocab = graft.operators.Fixpoint.cut(
        vocab.crossJoin(broadcast(bestCut.select(col("pair").as("__p"))))
        .select(col("__w"), expr(
          "replace(__s, concat(' ', __p, ' '), concat(' ', replace(__p, ' ', ''), ' '))")
          .as("__s"), col("__c")))
    }
    (merges.select(col("round"), col("pair"), col("freq")), vocab)
  }

  /** BPE compression report per group: train `rounds` merges on the
    * WHOLE corpus (q216's loop), then measure each group's token /
    * char / post-merge symbol counts through the word→segmentation
    * mapping — the "how well does a shared tokenizer fit each source"
    * diagnostic (a source whose ratio_e6 stays near char count is
    * out-of-domain for the merges). The encode side never re-runs
    * merges on documents: corpus words join the vocab-sized mapping.
    * ratio_e6 = symbols·1e6 DIV chars — exact integers. */
  def bpeCompression(df: DataFrame, groupCol: String, textCol: String,
                     rounds: Int): DataFrame = {
    val vocab = bpeCore(df, textCol, rounds)._2
      .select(col("__w"),
        size(split(trim(col("__s")), " ")).cast("long").as("__nsym"))
    df.select(col(groupCol).as("grp"),
      explode(tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .join(vocab, Seq("__w"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("__w"))).as("n_chars"),
        sum(col("__nsym")).as("n_symbols"))
      .select(col("grp"), col("n_tokens"), col("n_chars"), col("n_symbols"),
        expr("n_symbols * 1000000L DIV n_chars").as("ratio_e6"))
  }

  /** Per-group boilerplate n-grams ("stop-grams"): token n-grams whose
    * DOCUMENT frequency within a group (source/domain) reaches
    * `minDfPct` percent — the CCNet/RefinedWeb-style diagnostic for
    * templated headers, navigation chrome, and license blurbs that
    * repeat across a crawl source and should be excised before
    * training. Doc frequency (distinct docs), not term frequency: a
    * single doc repeating a phrase 100× is content; 20% of a source
    * sharing it is boilerplate. Documents shorter than n tokens have
    * no n-grams and contribute nothing (both engines drop them in the
    * same place).
    *
    * Scale shape: one explode of per-doc DISTINCT n-grams (the
    * distinct runs inside the row — array_distinct — so the exchange
    * ships each (doc, gram) once), one hash aggregate to (group, gram)
    * doc counts with map-side partials, and the per-group doc totals
    * ride a broadcast join onto the gram relation. Nothing is ever
    * keyed on doc × doc, and the gram relation is bounded by corpus
    * tokens, not squared. The integer predicate n_docs·100 ≥ total·pct
    * keeps the threshold engine-exact (a float percentage can flip on
    * the boundary). */
  def stopGrams(df: DataFrame, idCol: String, groupCol: String,
                textCol: String, n: Int = 3, minDfPct: Int = 20): DataFrame = {
    val tk = tokens(lower(col(textCol)))
    val grams = df
      .select(col(idCol), col(groupCol).as("source"), tk.as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(col(idCol), col("source"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("__tk")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(col("__tk"), i + o)): _*)))).as("ngram"))
    val df_ = grams.groupBy(col("source"), col("ngram"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = df.groupBy(col(groupCol).as("source"))
      .agg(count(lit(1)).as("__total"))
    df_.join(broadcast(totals), Seq("source"))
      .filter(col("n_docs") * 100 >= col("__total") * minDfPct)
      .select(col("source"), col("ngram"), col("n_docs"))
  }

  /** N-gram novelty against a reference corpus — decontamination's
    * inverse, read as an analytics signal: how much of each candidate
    * document is NOT already covered by the reference (dedup-adjacent
    * docs score near 0; genuinely new material near 1e6). Per doc:
    * distinct word n-grams, how many are absent from the reference's
    * distinct-gram set, and their exact e6 ratio. Docs with fewer than
    * `n` tokens have no n-grams and are excluded (a 0/0 ratio has no
    * meaning).
    *
    * Scale shape: both gram relations are per-doc distinct at the
    * explode (each (doc, gram) ships once), the reference collapses to
    * ONE distinct gram set, and the membership test is a plain
    * gram-keyed left join — bounded by corpus tokens, never doc×doc.
    * For a tiny reference against a huge candidate corpus, swap the
    * join for the Bloom-prefilter path (`Curation.decontaminateBloom`'s
    * shape) — the exact join is the right default when both sides are
    * corpus-scale. */
  def ngramNovelty(candidates: DataFrame, reference: DataFrame,
                   idCol: String, textCol: String, n: Int = 3): DataFrame = {
    def grams(src: DataFrame, idCols: Seq[String]) = {
      val tk = tokens(lower(col(textCol)))
      src.select(idCols.map(col) :+ tk.as("__tk"): _*)
        .filter(size(col("__tk")) >= n)
        .select(idCols.map(col) :+
          explode(array_distinct(transform(
            sequence(lit(1), size(col("__tk")) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(o => element_at(col("__tk"), i + o)): _*))))
            .as("ngram"): _*)
    }
    val cand = grams(candidates, Seq(idCol))
    val ref = grams(reference, Seq.empty).distinct()
      .withColumn("__seen", lit(1))
    cand.join(ref, Seq("ngram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_e6", expr("n_novel * 1000000L DIV n_grams"))
  }

  /** Zipf's-law fit over the corpus unigram distribution: OLS slope of
    * ln(freq) on ln(rank) for the top `topN` terms (rank ties broken
    * by term so the permutation is engine-deterministic). A healthy
    * natural-language corpus slopes near −1; a scrape full of
    * boilerplate or generated spam flattens or steepens it — a cheap
    * corpus-level quality gate next to [[ngramNovelty]].
    *
    * Both logs are floored to exact e9 integers BEFORE the regression
    * (ln on a BIGINT count is one IEEE-envelope step feeding a floor —
    * the slope then comes from Stats.regressionByGroup's exact
    * DECIMAL(38,0) sums, and the e9 scale cancels in the slope).
    *
    * Scale shape: one token explode + hash aggregate to the TERMS
    * relation, a top-N rank on the single driver-bounded `topN` slice
    * (WindowGroupLimit prunes before the global sort), then a
    * TERMS-free 1-row regression. */
  def zipfSlope(df: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    val tc = df
      .select(explode(tokens(lower(col(textCol)))).as("__term"))
      .groupBy("__term").agg(count(lit(1)).as("__c"))
    val ranked = tc
      .withColumn("__rank", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("__c").desc, col("__term").asc)))
      .filter(col("__rank") <= topN)
      .select(
        expr("CAST(floor(1000000000 * ln(CAST(__rank AS DOUBLE)) + 0.5) AS BIGINT)")
          .as("__x_e9"),
        expr("CAST(floor(1000000000 * ln(CAST(__c AS DOUBLE)) + 0.5) AS BIGINT)")
          .as("__y_e9"))
    graft.operators.Stats.regressionByGroup(
        ranked, Seq.empty, col("__x_e9"), col("__y_e9"))
      .select(col("n").as("n_terms"), col("slope").as("zipf_slope"))
  }

  /** Flesch-style readability per group, ENTIRELY in exact integer
    * arithmetic: 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words), with sentences counted as [.!?]+ runs, "syllables" as
    * vowel-group runs (the standard codeless approximation), and both
    * ratios formed as e3 floor divisions over corpus-total counts.
    * Groups with no sentences or no words yield NULL.
    *
    * Scale shape: ONE scan, per-row regexp counts (codegen'd), one
    * hash aggregate to the GROUPS relation. */
  def readability(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    df.select(col(groupCol).as("__g"),
        tokenCount(col(textCol)).cast("long").as("__w"),
        regexp_count(col(textCol), lit("[.!?]+")).cast("long").as("__s"),
        regexp_count(lower(col(textCol)), lit("[aeiou]+")).cast("long").as("__v"))
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum("__w").as("n_words"),
        sum("__s").as("n_sentences"), sum("__v").as("n_vowel_groups"))
      .select(col(groupCol), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_vowel_groups"),
        expr("""CASE WHEN n_sentences = 0 OR n_words = 0 THEN NULL
                     ELSE 206835 - (1015 * n_words) DIV n_sentences
                          - (84600 * n_vowel_groups) DIV n_words
                END""").as("flesch_e3"))
  }

  /** TF-IDF cosine near-dup pairs within a blocking key — the sparse
    * (lexical) counterpart of Similarity's dense-embedding near-dup:
    * weights are exact integers (tf × e3-floored idf, identical on any
    * engine), dot products and norms are exact integer sums, and the
    * threshold is the exact inequality den²·dot² ≥ num²·|a|²·|b|²
    * (cos ≥ num/den, dot ≥ 0) — the reported cosine's only float steps
    * are one division and two sqrt's on exact operands.
    *
    * Corpus-wide terms (df = N) carry zero idf and are dropped;
    * `blockCol` bounds pair enumeration the way LSH bands do (the
    * all-pairs variant of this join is quadratic by definition —
    * ALWAYS block at scale).
    *
    * EXACT df-capped two-phase plan (the sibling of
    * Dedup.ngramJaccardPairs' counted prefilter, adapted to weighted
    * cosine — the result is cap-INDEPENDENT, unlike Jaccard's
    * documented recall caveat):
    *  1a. the (block, term) self-join runs only on KEPT terms
    *      (df ≤ maxDocFreq), so per-term fanout is ≤ maxDocFreq² and
    *      total join volume ≤ maxDocFreq · |postings| — a stop-ish
    *      term with df = 0.9·n can no longer emit (0.9·n)² rows. The
    *      dropped-term contribution is bounded by Cauchy-Schwarz:
    *      dot_D ≤ √(n2d_a·n2d_b) (all weights ≥ 0), and with
    *      (x+s)² ≤ 2(x²+s²) the candidate filter
    *      `2·den²·(dotK² + n2d_a·n2d_b) ≥ num²·n2_a·n2_b` is a pure-
    *      integer TRUE superset of the exact predicate — no float
    *      step, no missed pair.
    *  1b. a pair sharing NO kept term passes that bound only if BOTH
    *      docs hold ≥ num²/(2·den²) of their TF-IDF mass in dropped
    *      terms (n2d·2·den² ≥ n2·num²) — the "heavy" docs. Their
    *      candidate pairs are the BLOCK-LOCAL heavy-pair grid
    *      (Σ_blk |heavy_blk|² — never keyed by a hot dropped term,
    *      whose corpus-scale df would replay each pair once per
    *      shared term). At scale |heavy| is the stop-word-dominated
    *      fringe, tiny under any reasonable cap; on a small-vocab
    *      corpus where stop-mass dominates everywhere the grid IS the
    *      problem's inherent density, and phase 2 still resolves it
    *      exactly. Docs sharing no term at all have dot = 0 and can
    *      never pass a positive threshold.
    *  2.  exact full-vector dot recomputed ONLY for surviving
    *      candidates (pair-keyed joins at near-final volume), then
    *      the exact threshold — so the emitted rows are identical to
    *      the uncapped plan for every cap value.
    *
    * Integer headroom (e3 idf): weights ≲ tf·7e3, norms ≲ 1e12 for
    * 1e3-term docs, 2·den²·dotK² ≲ 5e25 — inside DECIMAL(38,0).
    *
    * Scale shape: one bounded (block, term) shuffle with map-side-
    * combining dot aggregate, pairs-sized norm joins, pair-keyed
    * exact verification. Never doc × doc, never uncapped fanout.
    * `maxHeavyPerBlock` is the loud-failure guard on phase 1b's grid:
    * a block with more heavy docs than the cap throws (with the block
    * named) instead of quietly going quadratic within the block —
    * the caller either raises the guard knowingly or raises
    * `maxDocFreq` so less mass is dropped. */
  def tfIdfCosinePairs(df: DataFrame, idCol: String, textCol: String,
                       blockCol: String, num: Long = 4,
                       den: Long = 5,
                       maxDocFreq: Long = 256L,
                       maxHeavyPerBlock: Long = 1L << 16): DataFrame = {
    require(maxHeavyPerBlock > 0, "maxHeavyPerBlock must be positive")
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val tf = df
      .select(col(blockCol).as("__blk"), col(idCol).as("__id"),
        explode(tokens(lower(col(textCol)))).as("__term"))
      .groupBy("__blk", "__id", "__term").agg(count(lit(1)).as("__tf"))
    val nd = tf.agg(count_distinct(col("__id")).as("__nd"))
    // each distinct term gets a dense bigint dictionary id (exact — a
    // distributed row_number over the vocab, no hash, no collisions):
    // every downstream join key and every per-pair sparse vector then
    // moves 8-byte ids instead of term strings (guide §2.3 — shuffle
    // keys and metadata, not payloads; round 15 measured the pair-join
    // phases dominating this operator with string-keyed vectors)
    val dft = graft.operators.GlobalRank.rowNumber(
      tf.groupBy("__term").agg(count(lit(1)).as("__df")),
      Seq(col("__term")), "__tid")
    val w = tf.join(dft, Seq("__term"))
      .crossJoin(broadcast(nd))
      .filter(col("__df") < col("__nd"))
      .select(col("__blk"), col("__id"), col("__tid"),
        (col("__tf") * expr(
          "CAST(floor(1000 * ln(CAST(__nd AS DOUBLE) / __df) + 0.5) AS BIGINT)"))
          .as("__wl"),
        (col("__df") <= maxDocFreq).as("__kept"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // norms stay DECIMAL (a Σw² overflows a long past ~1e5-term docs);
    // dots are long-safe (see the headroom note — phase 2's merge-scan
    // dot is long already, and the capped dot is ≤ the full dot)
    val zero = lit(0).cast(D)
    val norm = w.groupBy(col("__id"))
      .agg(sum(expr("CAST(__wl AS DECIMAL(38,0)) * __wl")).as("__n2"),
        sum(when(!col("__kept"), expr("CAST(__wl AS DECIMAL(38,0)) * __wl"))
          .otherwise(zero)).as("__n2d"))
    // Phase 1a: capped dot + integer Cauchy-Schwarz candidate bound.
    // The self-join shuffles (blk, tid, id, wl) — longs end to end.
    val wk = w.filter(col("__kept"))
    val dotK = wk.select(col("__blk"), col("__tid"),
        col("__id").as("id_a"), col("__wl").as("__wa"))
      .join(wk.select(col("__blk"), col("__tid"),
        col("__id").as("id_b"), col("__wl").as("__wb"))
        .hint("shuffle_hash"), Seq("__blk", "__tid"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(expr("__wa * __wb")).as("__dotkl"))
      .withColumn("__dotk", col("__dotkl").cast(D))
    val cand1 = dotK
      .join(norm.select(col("__id").as("id_a"), col("__n2").as("__na"),
        col("__n2d").as("__nda")), Seq("id_a"))
      .join(norm.select(col("__id").as("id_b"), col("__n2").as("__nb"),
        col("__n2d").as("__ndb")), Seq("id_b"))
      .filter(expr(s"2 * ${den * den} * (__dotk * __dotk + __nda * __ndb)" +
        s" >= ${num * num} * __na * __nb"))
      .select(col("id_a"), col("id_b"))
    // Phase 1b: pairs that could pass on dropped terms alone — both
    // docs must be "heavy" (dropped mass ≥ (num/den)²/2 of the norm).
    val heavy = norm
      .filter(expr(s"2 * ${den * den} * __n2d >= ${num * num} * __n2"))
      .select(col("__id"))
    // Enumerated as the BLOCK-LOCAL heavy-pair GRID, not a (blk, term)
    // self-join: a dropped term's df is corpus-scale by definition (it
    // exceeded the cap), so keying heavy pairs by term would replay
    // each pair once per shared dropped term and reintroduce exactly
    // the hot-key fanout the cap exists to kill (measured: 4.5e8 join
    // rows on a 31-term corpus whose heavy grid is 2.5e6). The grid is
    // the problem's inherent density when stop-mass dominates — never
    // more than Σ_blk |heavy_blk|², never keyed by a hot term.
    val wd = w.filter(!col("__kept"))
      .join(heavy.hint("broadcast"), Seq("__id"))
    // Loud-failure guard on the grid's quadratic term: a block whose
    // heavy-doc count exceeds `maxHeavyPerBlock` would make
    // Σ_blk |heavy_blk|² the dominant (and genuinely quadratic) cost —
    // on a stop-mass-dominated corpus that is the problem's inherent
    // density, but it must be an explicit caller decision (raise the
    // cap, or raise maxDocFreq so less mass is dropped), never a
    // silent degradation. The check is a block-sized aggregate riding
    // the same tiny heavy relation; assert_true keeps it inside the
    // plan (no extra driver action), and `.isNull` both forces
    // evaluation and passes every surviving row (assert_true yields
    // NULL on success, throws on failure).
    val heavyB0 = wd.select(col("__blk"), col("__id")).distinct()
    val heavyCnt = heavyB0.groupBy("__blk").agg(count(lit(1)).as("__hc"))
    val heavyB = heavyB0.join(heavyCnt.hint("broadcast"), Seq("__blk"))
      .filter(assert_true(col("__hc") <= maxHeavyPerBlock,
        concat(lit("tfIdfCosinePairs: block "), col("__blk").cast("string"),
          lit(s" has "), col("__hc").cast("string"),
          lit(s" heavy docs > maxHeavyPerBlock=$maxHeavyPerBlock — its " +
            "dropped-mass pair grid would be quadratic; raise " +
            "maxHeavyPerBlock explicitly or raise maxDocFreq"))).isNull)
      .select(col("__blk"), col("__id"))
    val cand2 = heavyB.as("hx")
      .join(heavyB.as("hy").hint("shuffle_hash"),
        col("hx.__blk") === col("hy.__blk")
          && col("hx.__id") < col("hy.__id"))
      .select(col("hx.__id").as("id_a"), col("hy.__id").as("id_b"))
    val cand = cand1.union(cand2).distinct()
    // Phase 2: exact full-vector dot for candidates only — per-doc
    // sorted sparse vectors built ONCE (docs-sized aggregate), then one
    // compiled merge-scan per candidate pair (functions.SparseDotLong).
    // The relational alternative (explode postings, equi-join on
    // (doc, term), re-aggregate) shuffles candidates × terms rows
    // twice; here nothing per-term crosses an exchange after the
    // vector build. Long headroom: dot ≤ norm ≲ 1e12-term·weight²
    // bounds from the note above — far inside 2^63; the Decimal cast
    // happens after the scan, for the squared threshold compare only.
    val vecs = w.groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("__tid"), col("__wl"))))
        .as("__v"))
      .select(col("__id"),
        transform(col("__v"), e => e.getField("__tid")).as("__ts"),
        transform(col("__v"), e => e.getField("__wl")).as("__ws"))
    val dot = cand
      .join(vecs.select(col("__id").as("id_a"), col("__ts").as("__tsa"),
        col("__ws").as("__wsa")), Seq("id_a"))
      .join(vecs.select(col("__id").as("id_b"), col("__ts").as("__tsb"),
        col("__ws").as("__wsb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.SparseDotLong(col("__tsa"), col("__wsa"),
          col("__tsb"), col("__wsb")).cast(D).as("__dot"))
    dot
      .join(norm.select(col("__id").as("id_a"), col("__n2").as("__na")), Seq("id_a"))
      .join(norm.select(col("__id").as("id_b"), col("__n2").as("__nb")), Seq("id_b"))
      .filter(col("__dot") >= 0
        && expr(s"__dot * __dot * ${den * den} >= __na * __nb * ${num * num}"))
      .select(col("id_a"), col("id_b"),
        expr("""CAST(floor(1000000 * (CAST(__dot AS DOUBLE)
                / (sqrt(CAST(__na AS DOUBLE)) * sqrt(CAST(__nb AS DOUBLE))))
                + 0.5) AS BIGINT)""").as("cosine_e6"))
  }

  /** Per-document unigram Shannon entropy (bits), the
    * gibberish/boilerplate detector next to [[repetitionStats]]:
    * H = log2(n) − (Σ c·log2(c))/n over the doc's token counts. Each
    * c·log2(c) term is floored to an exact e9 integer before the
    * order-independent integer sum; the two remaining double steps
    * (log2(n), one division) act on exact operands. A one-token doc
    * has H = 0; empty docs are dropped upstream by the tokenizer
    * guard.
    *
    * Scale shape: one token explode + hash aggregate to (doc, term)
    * counts, then one hash aggregate back to the DOCS relation —
    * never a sort. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(lower(col(textCol)))
    df.select(col(idCol), explode(tk).as("__term"))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_tokens"),
        sum(expr(
          "CAST(floor(1000000000 * __c * log2(CAST(__c AS DOUBLE)) + 0.5) AS BIGINT)"))
          .as("__clogc_e9"))
      .select(col(idCol), col("n_tokens"),
        expr("""CAST(floor(1000000 * (log2(CAST(n_tokens AS DOUBLE))
                - CAST(__clogc_e9 AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 1000000000))
                + 0.5) AS BIGINT)""").as("entropy_e6"))
  }
}
