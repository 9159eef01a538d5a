package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (SURVEY §7.4 extension surface):
  * deterministic corpus splitting, benchmark decontamination, and
  * concat-and-chunk sequence packing — the steps between "cleaned
  * corpus" and "training batches" in an LLM data pipeline.
  *
  * Everything here is engine-portable by construction: split assignment
  * hashes with md5 (identical hex on any engine), contamination counts
  * are exact set-overlap integers, and packing is exact integer prefix
  * arithmetic — so all three are DuckDB-oracle-checkable, unlike
  * xxhash64-seeded sketches.
  */
object Curation {

  /** Deterministic train/val/test split by content-independent hash:
    * the first 4 hex chars of md5(salt || id) give a uniform position in
    * [0, 65536); cumulative fraction cutoffs assign the split label.
    * Fractions quantize to 1/65536 — at corpus scale the error is
    * negligible and the assignment is stable across runs, engines, and
    * cluster layouts (a pure projection: no shuffle, no RNG state).
    *
    * `splits` are (label, fraction) with fractions summing to <= 1;
    * any remainder falls into the LAST label. */
  def splitColumn(idCol: Column, splits: Seq[(String, Double)],
                  salt: String = ""): Column = {
    require(splits.nonEmpty, "at least one split")
    val pos = substring(md5(concat(lit(salt), idCol.cast("string")).cast("binary")), 1, 4)
    // cutoffs as 4-digit lowercase hex; lexicographic compare == numeric
    val cuts = splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(f => f"${math.round(f * 65536).min(65536)}%04x")
    splits.init.zip(cuts).foldRight(lit(splits.last._1): Column) {
      case (((label, _), cut), elseCol) => when(pos < lit(cut), lit(label)).otherwise(elseCol)
    }
  }

  /** hashSplit over a DataFrame: adds a `split` column. */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                salt: String = ""): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), splits, salt))

  /** Deterministic domain mixing: per-domain keep-rates applied by the
    * same md5-hash position hashSplit uses — the data-mixture sampler
    * (down-weight low-quality domains, keep high-quality ones whole).
    * A pure filter projection: no shuffle, no RNG state, reproducible
    * on any engine and any cluster layout. Domains absent from `rates`
    * keep `defaultRate`. */
  def sampleByDomain(df: DataFrame, idCol: String, domainCol: String,
                     rates: Map[String, Double], salt: String = "",
                     defaultRate: Double = 1.0): DataFrame = {
    def cutHex(f: Double): String = f"${math.round(f * 65536).min(65536)}%05x"
    val pos = substring(md5(concat(lit(salt), col(idCol).cast("string")).cast("binary")), 1, 4)
    // 5-hex-digit cutoffs so rate 1.0 ("10000") sorts above every
    // 4-hex-digit position — lexicographic compare stays numeric
    val cutoff = rates.foldLeft(lit(cutHex(defaultRate)): Column) {
      case (elseCol, (domain, f)) =>
        when(col(domainCol) === domain, lit(cutHex(f))).otherwise(elseCol)
    }
    df.filter(concat(lit("0"), pos) < cutoff)
  }

  /** Benchmark decontamination: for each candidate training document,
    * how many of its distinct word n-gram shingles appear ANYWHERE in
    * the benchmark corpus. Returns (id, n_sh, n_contaminated,
    * contamination_ratio); filter on the ratio to drop tainted docs.
    *
    * Plan shape: inverted-index semi-join on 64-bit shingle hashes —
    * train explodes to (id, shash), benchmark reduces to a DISTINCT
    * shingle-hash set (tiny relative to the corpus: benchmarks are eval
    * sets), and the semi-join + per-doc count is one shuffle. Never
    * doc × doc. At 100 TB the benchmark side is broadcast-grade. */
  def contamination(train: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 3): DataFrame = {
    val tr = Dedup.shingleHashSets(train, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bsh = Dedup.shingleHashSets(
      bench.withColumn("__bid", monotonically_increasing_id()), "__bid", benchTextCol, n)
      .select(explode(col("shash")).as("shash")).distinct()
    // no join-strategy hint: the benchmark shingle set is usually
    // broadcast-grade (eval sets are small next to the corpus) — let
    // Catalyst/AQE pick broadcast left-semi when stats allow
    val counts = tr.select(col("id"), explode(col("shash")).as("shash"))
      .join(bsh, Seq("shash"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    tr.select(col("id"), size(col("shash")).cast("long").as("n_sh"))
      .join(counts, Seq("id"), "left")
      .select(col("id"), col("n_sh"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_ratio",
        col("n_contaminated").cast("double") / col("n_sh").cast("double"))
  }

  /** [[contamination]] for benchmark sets too large to broadcast: the
    * benchmark's distinct shingle hashes collapse into a Bloom filter
    * (built by a distributed aggregate, merged on the driver — ~1.2 MB
    * per million shingles at fpp 0.01, two orders of magnitude smaller
    * than the hash relation), and every corpus document's shingle array
    * is prefiltered MAP-SIDE through the filter before anything
    * explodes or shuffles. Only the surviving ~(contaminated + fpp ·
    * clean) shingles reach the exact semi-join, which removes the false
    * positives — so the output is bit-identical to [[contamination]]
    * (differential spec; shares q65's oracle) while the corpus-side
    * shuffle shrinks by roughly the contamination rate.
    *
    * `expectedItems` sizes the filter; UNDERestimating it only raises
    * the false-positive rate (more verify-join traffic), never changes
    * the result — the no-false-negative guarantee does not depend on
    * sizing (spec: deliberately overloaded filter still exact). */
  def contaminationBloom(train: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         n: Int = 3, expectedItems: Long = 1L << 20,
                         fpp: Double = 0.01): DataFrame = {
    val tr = Dedup.shingleHashSets(train, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // read twice (bloom build + verify join); persist pins one pass of
    // the benchmark shingling
    val bsh = Dedup.shingleHashSets(
      bench.withColumn("__bid", monotonically_increasing_id()), "__bid", benchTextCol, n)
      .select(explode(col("shash")).as("shash")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf = bsh.stat.bloomFilter("shash", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val counts = tr.select(col("id"),
        explode(graft.functions.BloomKeepHashes(col("shash"), bos.toByteArray))
          .as("shash"))
      .join(bsh, Seq("shash"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    tr.select(col("id"), size(col("shash")).cast("long").as("n_sh"))
      .join(counts, Seq("id"), "left")
      .select(col("id"), col("n_sh"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_ratio",
        col("n_contaminated").cast("double") / col("n_sh").cast("double"))
  }

  /** Distributed exclusive prefix sum of `valueCol` in `orderCol` order:
    * range-repartition on the order key, partition-local running sums
    * under a per-partition window, then a partition-offset join — the
    * two-pass parallel scan. No global single-partition window, so it
    * holds at any scale; the offsets relation has one row per partition.
    *
    * The result is independent of where the range boundaries fall:
    * local cumsum + the sum of everything in earlier ranges is the
    * global prefix sum under any partitioning of a total order.
    * `orderCol` must give a TOTAL order (unique values) — with ties the
    * prefix order (and thus the result) is undefined. */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         resultCol: String, numParts: Int = 0): DataFrame =
    // generalized in round 14 to graft.operators.GlobalRank (multi-
    // column sort, row_number/ntile siblings) — including the persist
    // that pins ONE range partitioning for both consumers (the q78
    // sf0.1 boundary-resample corruption this function's round-6 fix
    // documented lives there now)
    graft.operators.GlobalRank.exclusivePrefixSum(
      df, Seq(col(orderCol)), valueCol, resultCol, numParts)

  /** Tunables for the end-to-end corpus curation flow.
    *
    * `maxDocFreq` (the near-dedup inverted-index df cap) defaults to
    * [[Dedup.RecommendedMaxDocFreq]] — the curation pipeline is the
    * production-corpus path, where an uncapped stop-shingle bucket is a
    * guaranteed skew quadratic. The recall caveat (a pair sharing ONLY
    * shingles with df > cap is missed) is the documented trade; pass
    * `maxDocFreq = Long.MaxValue` for exact small-corpus runs. */
  final case class CurateConfig(
      minTokens: Long = 5,
      maxSymbolRatio: Double = 0.3,
      minAlphaRatio: Double = 0.5,
      jaccardNum: Long = 1, jaccardDen: Long = 5, shingleN: Int = 3,
      maxDocFreq: Long = Dedup.RecommendedMaxDocFreq,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      salt: String = "v1",
      packBudget: Long = 2048L)

  /** Stages 1+2 of [[curateCorpus]] as a standalone operator: PII scrub
    * and Gopher quality gates, fused into a single projection + filter
    * pass — the gate features are computed INLINE next to the text
    * (joining a `gopherStats` relation back onto the scrubbed corpus
    * would shuffle the full document text through two exchanges for a
    * join both of whose sides derive from the same rows). Returns
    * (idCol, text, n_tokens) for the surviving documents. PlanSpec pins
    * the zero-exchange shape. */
  def scrubAndGate(docs: DataFrame, idCol: String, textCol: String,
                   cfg: CurateConfig = CurateConfig()): DataFrame =
    TextAnalysis.scrubPii(docs, idCol, textCol)
      .select(col(idCol), col("text_scrubbed").as("text"))
      .select(col(idCol) +: col("text") +:
        TextAnalysis.gopherCols(col("text")): _*)
      .filter(col("n_tokens") >= cfg.minTokens
        && col("symbol_to_word_ratio") <= cfg.maxSymbolRatio
        && col("alpha_word_ratio") >= cfg.minAlphaRatio)
      .select(col(idCol), col("text"), col("n_tokens"))

  /** The raw-corpus → training-table flow, composed from the library's
    * curation operators in their canonical order:
    *  1. PII scrub (projection)
    *  2. Gopher quality gates (projection + filter)
    *  3. exact dedup by content fingerprint (one hash aggregate)
    *  4. near-dedup group resolution (inverted index + connected
    *     components); only each group's minimum id survives
    *  5. deterministic split assignment (projection)
    *  6. concat-and-chunk sequence packing (distributed prefix sum)
    * Returns (id, text, n_tokens, split, bin) — the training-ready
    * table. Each stage is individually oracled (q64-q70); this is the
    * composition a pipeline would actually deploy. */
  def curateCorpus(docs: DataFrame, idCol: String, textCol: String,
                   cfg: CurateConfig = CurateConfig()): DataFrame = {
    // 1+2. scrub + quality gates: one fused projection+filter pass
    // (see scrubAndGate — PlanSpec pins the zero-exchange shape)
    val quality = scrubAndGate(docs, idCol, textCol, cfg)
    // 3. exact dedup: min id per fingerprint survives
    val exactSurvivors = Dedup.exactByFingerprint(quality, idCol, "text")
      .select(col(idCol))
    // `exact` feeds three consumers (pair generation, verdict docs, the
    // survivor semi-join) — without a cache boundary each one re-runs
    // the scan + scrub + gates + fingerprint chain over the full corpus.
    // MEMORY_AND_DISK: the narrow (id, text, n_tokens) projection spills
    // rather than recomputing multi-pass regex work. Neutral at bench
    // scale (q78 unchanged at sf0.1, where the components iteration
    // dominates); the boundary is for corpus scale, where three regex
    // passes over 100 TB are the dominant cost.
    val exact = quality.join(exactSurvivors, Seq(idCol), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 4. near-dedup groups: min id per component survives
    val verdicts = Dedup.dedupVerdicts(exact, idCol,
      Dedup.ngramJaccardPairs(exact, idCol, "text",
        n = cfg.shingleN, num = cfg.jaccardNum, den = cfg.jaccardDen,
        maxDocFreq = cfg.maxDocFreq))
    val near = exact.join(
      verdicts.filter(col("is_survivor")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
    // 5. split, 6. pack
    packSequences(
      hashSplit(near, idCol, cfg.splits, cfg.salt),
      idCol, "n_tokens", cfg.packBudget)
  }

  /** Deterministic stratified head: exactly `k` documents per group,
    * chosen by md5-hash order (content-independent, engine-portable,
    * resalt-able) — the "give me 50 docs per language" eval-set / debug
    * sampler. Where [[sampleByDomain]] keeps an approximate RATE per
    * group with zero shuffles, this guarantees an exact COUNT per group
    * at the cost of one shuffle + per-group rank window. The
    * `row_number <= k` filter plans as a two-phase WindowGroupLimit
    * (PlanSpec-pinned): each map task keeps only its local top-k per
    * group BEFORE the shuffle, so even a group holding the whole corpus
    * ships k rows per input partition, never the group — the reduce-side
    * sort is over partitions×k rows, not the data. */
  def stratifiedHead(df: DataFrame, groupCol: String, idCol: String,
                     k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    val pos = md5(concat(lit(salt), col(idCol).cast("string")).cast("binary"))
    val w = Window.partitionBy(groupCol).orderBy(pos, col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Sliding-window document chunking: split each document into
    * fixed-size token chunks with overlap (`stride` < `chunkSize`) — the
    * context-length prep step for long documents, complementing
    * [[packSequences]] (which bins whole short documents). Chunk starts
    * are 0, stride, 2·stride, … while start < n_tokens, so every token
    * lands in at least one chunk and consecutive chunks share
    * (chunkSize − stride) tokens of context.
    *
    * A pure per-row generator — tokenize, `sequence` of starts,
    * posexplode, `slice` — all codegen'd, no shuffle, no UDF; chunking
    * 100 TB is exactly one pass over the corpus. Emits (id, chunk_idx,
    * start_token, n_tokens, chunk_text). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int = 128, stride: Int = 96): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__starts",
        sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride)))
      .select(col(idCol),
        posexplode(col("__starts")).as(Seq("chunk_idx", "__start")),
        col("__toks"))
      .select(col(idCol), col("chunk_idx"),
        col("__start").cast("long").as("start_token"),
        size(slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Concat-and-chunk sequence packing (the standard LLM pretraining
    * batch layout): documents are laid out end-to-end in `orderCol`
    * order and cut every `budget` tokens; a document's bin is
    * floor(exclusive_prefix_tokens / budget). Exact integer arithmetic
    * over the distributed prefix sum — deterministic on any engine.
    * Returns the input plus (n_tokens via `tokenCol`, bin). */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    exclusivePrefixSum(df, orderCol, tokenCol, "__prefix")
      // DIV: exact 64-bit integer division — a double floor would lose
      // exactness once the running token total passes 2^53
      .withColumn("bin", expr(s"__prefix DIV ${budget}L"))
      .drop("__prefix")
  }

  /** Deterministic token-budget sampling — the mixing step "take N
    * tokens of this source": documents are ordered by a salted md5 key
    * (a uniform, reproducible shuffle — never the natural order, whose
    * head would be whatever the upstream happened to write first) and
    * the longest prefix fitting the budget is kept: a document survives
    * iff its exclusive prefix sum plus its own tokens is <= `budget`.
    * Greedy prefix, not knapsack — the budget shortfall is at most one
    * document. Raising the budget only ever ADDS documents (the key
    * order is budget-independent), so mixture ratios can be retuned
    * without resampling what was already taken (specced).
    *
    * Scale shape: one projection for (key, n_tokens), then the
    * distributed two-pass prefix scan of [[exclusivePrefixSum]] — never
    * a global single-partition window — and a per-row filter. The md5
    * keys must be unique (a collision would make the prefix order
    * engine-dependent); distinct ids guarantee that up to md5 collision
    * odds. Returns the surviving rows plus (n_tokens, prefix_tokens). */
  def sampleToTokenBudget(df: DataFrame, idCol: String, textCol: String,
                          budget: Long, salt: String = "v1"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val keyed = df
      .withColumn("__key",
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
    exclusivePrefixSum(keyed, "__key", "n_tokens", "prefix_tokens")
      .filter(col("prefix_tokens") + col("n_tokens") <= budget)
      .drop("__key")
  }

  /** Per-group [[exclusivePrefixSum]]: each `groupCol` value gets its own
    * independent running total over `orderCol` order. Same two-pass
    * shape — range-partition on (group, order) so a group's rows are
    * contiguous across the partition sequence, per-(pid, group) local
    * window, then a per-group running offset over the SMALL
    * (partitions × groups-touching-that-partition) relation, broadcast
    * back. The naive `Window.partitionBy(group)` would ship each
    * group's ENTIRE data through one task — with a handful of source
    * groups over 100 TB that is a guaranteed single-task bottleneck;
    * here a group's data stays spread over all partitions it spans. */
  def exclusivePrefixSumBy(df: DataFrame, groupCol: String, orderCol: String,
                           valueCol: String, resultCol: String,
                           numParts: Int = 0): DataFrame = {
    val parts = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // same materialization requirement as exclusivePrefixSum: pin ONE
    // sampled range partitioning for both downstream consumers
    val parted = df.repartitionByRange(parts, col(groupCol), col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("__pid"), col(groupCol)).orderBy(orderCol)
    val local = parted.withColumn("__cum",
      sum(col(valueCol)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = local.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(valueCol)).as("__psum"))
      .withColumn("__off",
        coalesce(sum(col("__psum")).over(
          Window.partitionBy(groupCol).orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(groupCol), col("__off"))
    local.join(broadcast(offsets), Seq("__pid", groupCol))
      .withColumn(resultCol, col("__off") + col("__cum") - col(valueCol))
      .drop("__pid", "__cum", "__off")
  }

  /** Per-source token budgets — the mixing table made executable:
    * "30M tokens of web, 10M of code, 5M of forums". Within each
    * `groupCol` value, documents are ordered by the salted md5 key (the
    * same budget-monotone reproducible shuffle as
    * [[sampleToTokenBudget]]) and the longest prefix fitting that
    * group's budget survives; groups absent from `budgets` get
    * `defaultBudget`. Returns surviving rows plus
    * (n_tokens, prefix_tokens), where prefix_tokens is per-group.
    * Raising one group's budget never changes another group's sample —
    * the orders are independent by construction. */
  def sampleToTokenBudgetBySource(df: DataFrame, idCol: String, textCol: String,
                                  groupCol: String, budgets: Map[String, Long],
                                  defaultBudget: Long = 0L,
                                  salt: String = "v1"): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    val keyed = df
      .withColumn("__key",
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
    // sorted fold: deterministic when-chain regardless of Map iteration
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    exclusivePrefixSumBy(keyed, groupCol, "__key", "n_tokens", "prefix_tokens")
      .filter(col("prefix_tokens") + col("n_tokens") <= budgetCol)
      .drop("__key")
  }

  /** Global quantile-bucket assignment (deciles by default) WITHOUT a
    * global sort window: every row gets `bucket = rank·n DIV total`
    * where rank comes from the distributed two-pass prefix scan over a
    * zero-padded (score, id) sort key — `ntile`'s unpartitioned window
    * would ship the whole relation through ONE task, the exact shape
    * every operator here avoids. Exact integer arithmetic end to end:
    * bucket boundaries are engine-portable, no percentile
    * interpolation. The sort key is TOTAL over all longs — each value
    * is offset by 2^63 in exact DECIMAL arithmetic before zero-padding,
    * so negative scores (a quality logit, a signed delta) order
    * correctly; the former non-negative contract silently inverted
    * them ("%019d" of a negative emits a sign char that sorts
    * backwards). Returns (idCol, scoreCol, bucket), bucket in
    * [0, nBuckets). */
  /** Order-preserving fixed-width sort key for ANY long: exact
    * DECIMAL(21,0) offset by 2^63 lands every value in [0, 2^64), then
    * zero-pad to 20 digits — lexicographic order == numeric order with
    * no overflow and no sign-character inversion. */
  private def paddedKey(c: Column): Column =
    lpad((c.cast(org.apache.spark.sql.types.DecimalType(21, 0))
      + lit(new java.math.BigDecimal("9223372036854775808"))).cast("string"),
      20, "0")

  def rankBuckets(df: DataFrame, idCol: String, scoreCol: String,
                  nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val keyed = df
      .select(col(idCol).cast("long").as(idCol), col(scoreCol).cast("long").as(scoreCol))
      .withColumn("__one", lit(1L))
      .withColumn("__rk",
        concat(paddedKey(col(scoreCol)), paddedKey(col(idCol))))
    val ranked = exclusivePrefixSum(keyed, "__rk", "__one", "__rank")
    val totalDf = df.select(count(lit(1)).as("__total"))
    ranked.crossJoin(broadcast(totalDf))
      .withColumn("bucket", expr(s"(__rank * $nBuckets) DIV __total"))
      .select(idCol, scoreCol, "bucket")
  }

  /** Span-level decontamination — the surgical alternative to dropping
    * whole documents: excise every `w`-token window of a training
    * document that appears ANYWHERE in the benchmark corpus, keeping
    * the rest of the document. Doc-level decontamination
    * ([[contamination]] / [[contaminationBloom]]) discards a 10k-token
    * document over one leaked test question; this removes the leaked
    * window (Lee et al.'s ExactSubstr behavior, pointed at an external
    * benchmark instead of the corpus itself). Returns (idCol, textCol)
    * rewritten.
    *
    * Scale shape: the benchmark side reduces to DISTINCT span hashes
    * (eval sets are tiny relative to the corpus — broadcast-grade, the
    * same contract as [[contamination]]); the train side generates
    * (id, pos, hash) and hash-joins against it, flagged starts
    * aggregate per doc (bounded by tokens/doc), and the rewrite is the
    * shared codegen'd excision filter — no shuffle carries text except
    * the final projection's input. */
  def removeContaminatedSpans(train: DataFrame, idCol: String, textCol: String,
                              bench: DataFrame, benchTextCol: String,
                              w: Int = 5): DataFrame = {
    require(w >= 1, s"span width must be >= 1, got $w")
    def spanHashes(tkCol: Column): Column =
      transform(sequence(lit(0), size(tkCol) - w),
        i => md5(array_join(slice(tkCol, i + lit(1), lit(w)), " ")))
    val tk = train.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("tk"))
    val spans = tk.filter(size(col("tk")) >= w)
      .select(col("id"), posexplode(spanHashes(col("tk"))))
      .toDF("id", "pos", "span_hash")
    val benchSpans = bench
      .select(TextAnalysis.tokens(col(benchTextCol)).as("btk"))
      .filter(size(col("btk")) >= w)
      .select(explode(spanHashes(col("btk"))).as("span_hash"))
      .distinct()
    val badStarts = spans.join(benchSpans, Seq("span_hash"))
      .groupBy("id")
      .agg(collect_set(col("pos")).as("starts"))
    Dedup.exciseSpansByStarts(tk, badStarts, w, idCol, textCol)
  }

  /** Train/eval split-leakage audit: after [[hashSplit]] assigns splits,
    * which held-out documents still have a near-duplicate INSIDE the
    * training split? Hash splitting is uniform over documents, so two
    * near-identical documents routinely land on opposite sides of the
    * boundary — the eval set then measures memorization, not
    * generalization. This is decontamination's sibling: [[contamination]]
    * guards against EXTERNAL benchmark leakage, this audits the
    * pipeline's OWN split. Deduplicate before splitting (or drop the
    * flagged eval docs this audit returns).
    *
    * Composition: [[hashSplit]] tags, then
    * [[Dedup.crossCorpusNearDupPairs]] with the eval side as the "new"
    * batch — the eval split is a small fraction of the corpus, so the
    * pair search is eval × train through the df-capped inverted index,
    * never corpus × corpus. Returns one row per leaked (eval, train)
    * pair: (id_eval, split, id_train, common, n_eval, n_train). */
  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * score every document by the log-likelihood ratio of its hashed
    * unigram features under the TARGET slice's distribution vs the
    * whole pool's — the standard cheap proxy for "pick pool documents
    * that look like the high-quality target" ahead of a token-budget
    * sample (sampleToTokenBudget takes a score column).
    *
    *   weight(d) = Σ_{tokens w ∈ d} [ ln((t_b(w)+1)/(T+B)) − ln((r_b(w)+1)/(R+B)) ]
    *
    * with t_b/r_b the target/pool occurrence counts of bucket b,
    * T/R their totals, B the bucket count (add-one smoothing).
    *
    * Determinism contract: bucket counts are exact longs; each
    * bucket's log-ratio is computed ONCE from exact operands, rounded
    * to 6 decimals, and fixed as DECIMAL(18,6) — per-document weights
    * are then exact decimal dot-products, identical in any
    * accumulation order and engine (a raw float Σ log(...) per doc
    * would be order-dependent in the last bits). md5-hex bucketing
    * keeps the features engine-portable (same trick as hashSplit).
    *
    * Scale shape: one explode + hash aggregate to (doc, bucket)
    * counts; the bucket-stats relation is B rows (broadcast); totals
    * are a broadcast 1-row crossJoin; the weight is one more hash
    * aggregate keyed on the doc id. Nothing doc×doc, nothing sorted,
    * no driver actions. Documents with zero tokens have no features
    * and drop out (same as the oracle's join semantics). */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, nBuckets: Int = 1024,
                  salt: String = "v1"): DataFrame = {
    val feats = df
      .select(col(idCol), targetPred.as("__is_target"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("__w"))
      .select(col(idCol), col("__is_target"),
        (conv(substring(md5(concat(lit(salt), col("__w")).cast("binary")), 1, 4),
          16, 10).cast("long") % nBuckets).as("__b"))
    val docBuckets = feats.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
    val bucketStats = feats.groupBy(col("__b")).agg(
      sum(when(col("__is_target"), 1L).otherwise(0L)).as("__t"),
      count(lit(1)).as("__r"))
    val totals = bucketStats.agg(
      sum(col("__t")).as("__tt"), sum(col("__r")).as("__rr"))
    val llr = bucketStats.crossJoin(broadcast(totals))
      .select(col("__b"),
        round(
          log((col("__t") + 1).cast("double") / (col("__tt") + nBuckets).cast("double"))
            - log((col("__r") + 1).cast("double") / (col("__rr") + nBuckets).cast("double")),
          6).cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("__llr"))
    docBuckets.join(broadcast(llr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt").cast(org.apache.spark.sql.types.DecimalType(20, 0))
        * col("__llr")).cast(org.apache.spark.sql.types.DecimalType(38, 6))
        .as("dsir_weight"))
  }

  /** Deterministic weighted sampling: keep the k rows with the
    * smallest priority = hash(id)·10⁶ div weight, hash uniform on
    * [0, 2³²) from md5 — heavier rows draw proportionally smaller
    * priorities, so selection probability rises with weight, with NO
    * RNG state (reproducible on any engine/cluster/retry — the same
    * md5-position argument as hashSplit, extended per-row by the
    * weight divisor). Rows with weight ≤ 0 are EXCLUDED up front: a
    * zero divisor yields NULL under Spark's non-ANSI DIV, and NULLs
    * sort FIRST ascending — without the guard a zero-weight row would
    * silently jump the queue into every sample, the exact opposite of
    * its weight. Ties (hash collisions at equal weight) break on the
    * id, keeping the cut total.
    *
    * Scale shape: a pure projection plus a top-k, which Spark plans as
    * TakeOrderedAndProject — map-side partial top-k per partition, no
    * global sort of the relation. */
  def hashWeightedSample(df: DataFrame, idCol: String, weightCol: String,
                         k: Int, salt: String = "v1"): DataFrame = {
    // integer DIV throughout: a double `/` then truncate can land on
    // the wrong side of the floor when the quotient rounds to an
    // integer — DuckDB's `//` and this must agree bit-for-bit
    df.filter(col(weightCol) > 0)
      .withColumn("__priority",
        expr(s"cast(conv(substring(md5(cast(concat('$salt', cast($idCol as string)) as binary)), 1, 8), 16, 10) as bigint) * 1000000L DIV $weightCol"))
      .orderBy(col("__priority").asc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic stratified sample: the k rows per group whose md5
    * rank is smallest — every stratum (source, language, shard) is
    * represented with EXACTLY min(k, |stratum|) rows, chosen with no
    * RNG state (the hashSplit/hashWeightedSample md5 argument:
    * reproducible on any engine, cluster, or retry, and stable under
    * corpus append for rows that keep their hash rank). The per-group
    * rank is also returned — rank ≤ k' re-cuts a smaller sample
    * WITHOUT re-ranking, so one pass serves every downstream budget.
    *
    * Scale shape: one window partitioned BY GROUP (never a global
    * single-task window) over a hash-ordered partition; the row_number
    * frame carries no payload besides the projected columns. Skewed
    * strata sort within their own partition only. */
  def stratifiedHashSample(df: DataFrame, idCol: String, groupCol: String,
                           k: Int, salt: String = "rs1"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string")).cast("binary")),
        col(idCol))
    df.select(col(idCol), col(groupCol))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Quantile normalization onto the pooled distribution: each value is
    * replaced by the corpus-wide value at its group-relative quantile
    * position — afterwards every group's empirical distribution matches
    * the pooled one, so per-group scores become comparable (the classic
    * fix for "source A's quality scorer runs hot": rank 10%-within-A
    * maps to the same number as rank 10%-within-B). The mapping is
    * exact integer rank arithmetic: within-group rank r of n targets
    * pooled position t = ((2r − 1)·N) div (2n) (midpoint rule), and
    * the pooled value arrives by an equi-join on that position.
    *
    * Scale shape: within-group ranks are ordinary per-group windows
    * (one shuffle on the group key); the POOLED rank — the part a
    * naive formulation does with a global single-task row_number —
    * comes from the zero-padded distributed prefix sum (same machinery
    * as rankBuckets, sharing its total-over-all-longs sort key), and
    * the final lookup is an equi-join on the rank position. */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valCol: String): DataFrame = {
    val keyed = df
      .select(col(groupCol), col(idCol).cast("long").as(idCol),
        col(valCol).cast("long").as(valCol))
      .withColumn("__one", lit(1L))
      .withColumn("__rk", concat(paddedKey(col(valCol)), paddedKey(col(idCol))))
    val pooled = exclusivePrefixSum(keyed, "__rk", "__one", "__t")
      .select(col("__t"), col(valCol).as(s"${valCol}_qnorm"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(valCol), col(idCol))
    val ranked = df
      .select(col(groupCol), col(idCol).cast("long").as(idCol),
        col(valCol).cast("long").as(valCol))
      .withColumn("__r", row_number().over(wg).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
      .crossJoin(broadcast(df.select(count(lit(1)).as("__tot"))))
      .withColumn("__t", expr("((2 * __r - 1) * __tot) DIV (2 * __n)"))
    ranked.join(pooled, "__t")
      .select(col(groupCol), col(idCol), col(valCol), col(s"${valCol}_qnorm"))
  }

  /** Temperature-balanced language mixing at α = 0.5: sample the
    * corpus so language l's share moves from p_l toward p_l^α
    * (up-weighting tail languages, the standard multilingual
    * pretraining mix), keeping ~`budgetDocs` documents total. α is
    * FIXED at 0.5 because √n is correctly rounded under IEEE 754 on
    * every engine while pow(n, α) is not — the whole keep/drop
    * decision stays engine-portable: √n is rounded to 6 decimals and
    * fixed as a decimal, all arithmetic to the per-language keep-rate
    * is exact decimal products, and the single double division lands
    * in an integer md5 cutoff (the hashSplit argument, per-language).
    *
    * Scale shape: language stats are one hash aggregate reduced to a
    * languages-sized relation; rates broadcast back; the sample
    * itself is a pure filter projection — no RNG state, no shuffle of
    * the corpus, reproducible on any cluster layout. */
  def temperatureMix(df: DataFrame, idCol: String, langCol: String,
                     budgetDocs: Long, salt: String = "v1"): DataFrame = {
    val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
    // NULL languages are excluded up front: they would inflate the
    // weight normalizer (shrinking every real language's cut) while the
    // equi-join below can never sample them — a silent budget shortfall
    val known = df.filter(col(langCol).isNotNull)
    val counts = known.groupBy(col(langCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", round(sqrt(col("__n")), 6).cast(D6))
    val tot = counts.agg(sum(col("__w")).as("__wsum"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__cut", least(lit(65536L),
        expr(s"CAST(floor(CAST($budgetDocs * __w AS DOUBLE)" +
          s" / CAST(__wsum * __n AS DOUBLE) * 65536 + 0.5) AS BIGINT)")))
      .select(col(langCol), col("__cut"))
    known.join(broadcast(rates), Seq(langCol))
      .filter(
        expr(s"cast(conv(substring(md5(cast(concat('$salt', cast($idCol as string)) as binary)), 1, 4), 16, 10) as bigint)")
          < col("__cut"))
      .drop("__cut")
  }

  /** Largest-remainder (Hamilton) apportionment of an integer budget
    * across groups proportional to integer weights: base_g = N·w_g DIV
    * W, and the leftover N − Σbase seats go to the largest remainders
    * (N·w_g mod W), ties broken by group name — the EXACT way to turn
    * "sample 1M docs proportionally" into per-group integer quotas that
    * sum to the budget precisely (independent floor/round allocations
    * drift by up to one per group). Pure integer arithmetic — no float
    * anywhere — so any engine agrees bit-for-bit.
    *
    * Scale shape: the input here is the per-group WEIGHT relation
    * (group-sized — the caller's one fact-scan rollup produces it), so
    * the unpartitioned remainder-rank window is over groups, not data.
    * Output: (group, weight, base, extra, quota) with sum(quota) = N. */
  def apportionBudget(weights: DataFrame, groupCol: String,
                      weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val tot = weights.agg(sum(col(weightCol)).cast("long").as("__W"))
    val based = weights.crossJoin(broadcast(tot))
      .select(col(groupCol), col(weightCol).cast("long").as("weight"),
        expr(s"$budget * CAST($weightCol AS BIGINT) DIV __W").as("base"),
        expr(s"$budget * CAST($weightCol AS BIGINT) % __W").as("__rem"),
        col("__W"))
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(groupCol))
    val allW = rankW.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    based
      .withColumn("__rank", row_number().over(rankW))
      .withColumn("__remsum", sum(col("__rem")).over(allW))
      // leftover seats: Σ N·w = N·W, so N − Σ base = (Σ rem) / W — an
      // exact integer division by construction (DIV: no float detour)
      .select(col(groupCol), col("weight"), col("base"),
        when(col("__rank") <= expr("__remsum DIV __W"), 1L).otherwise(0L)
          .as("extra"))
      .withColumn("quota", col("base") + col("extra"))
  }

  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   splits: Seq[(String, Double)], trainSplit: String = "train",
                   salt: String = "v1", n: Int = 3, num: Long = 1, den: Long = 5,
                   maxDocFreq: Long = Dedup.RecommendedMaxDocFreq): DataFrame = {
    val tagged = hashSplit(df, idCol, splits, salt)
    val eval = tagged.filter(col("split") =!= trainSplit)
    val train = tagged.filter(col("split") === trainSplit)
    Dedup.crossCorpusNearDupPairs(eval, idCol, textCol, train, idCol, textCol,
        n, num, den, maxDocFreq)
      .withColumnRenamed("id_new", "id_eval")
      .withColumnRenamed("id_corpus", "id_train")
      .withColumnRenamed("n_new", "n_eval")
      .withColumnRenamed("n_corpus", "n_train")
      .join(tagged.select(col(idCol).as("id_eval"), col("split")), Seq("id_eval"))
      .select("id_eval", "split", "id_train", "common", "n_eval", "n_train")
  }

  /** Deterministic k-fold assignment by salted md5 — the cross-
    * validation split with the same no-RNG-state contract as
    * [[hashSplit]]: a row's fold is a pure function of (salt, id), so
    * it is reproducible on any engine, cluster, retry, or re-ingest,
    * and two pipelines using the same salt agree on every row. Folds
    * are cut on the first 4 hex chars against ⌈65536·i/k⌉ boundary
    * STRINGS — the string-compare trick avoids hex-to-int parsing,
    * which not every engine spells the same way; fold sizes are even
    * to within 1/65536.
    *
    * Scale shape: a zero-shuffle projection (one expression per row).
    * k ≤ 256 keeps the generated CASE chain codegen-friendly. */
  def kFoldAssign(df: DataFrame, idCol: String, k: Int,
                  salt: String = "fold1"): DataFrame = {
    require(k >= 2 && k <= 256, "k must be in [2, 256]")
    val h = substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 4)
    val fold = (1 until k).map(i => f"${65536 * i / k}%04x").zipWithIndex
      .foldRight(lit((k - 1).toLong)) { case ((b, i), els) =>
        when(h < b, lit(i.toLong)).otherwise(els)
      }
    df.withColumn("fold", fold)
  }

  /** Inverse-frequency class-balance weights: for each label,
    *   weight_e6 = N·10⁶ div (k·n_label)
    * (sklearn's `class_weight='balanced'`, as an exact integer) — the
    * loss reweighting that keeps a skewed training set from collapsing
    * onto its majority class. NULL labels are excluded from both N
    * and k.
    *
    * Scale shape: one hash aggregate to the LABELS-sized relation; the
    * 1-row total rides a broadcast. */
  def classBalanceWeights(df: DataFrame, labelCol: String): DataFrame = {
    val cnt = df.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum("n").as("__N"), count(lit(1)).as("__k"))
    cnt.crossJoin(broadcast(tot))
      .select(col("label"), col("n"),
        expr("__N * 1000000L DIV (__k * n)").as("weight_e6"))
  }
}
