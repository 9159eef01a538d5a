package graft.queries

import org.apache.spark.sql.functions._
import graft.analytics.{Curation, Dedup, Multimodal, TextAnalysis}

/** Text-analysis + dedup + multimodal operators over `documents`
  * (SURVEY §7.4). Oracles mirror the token/lexicon arithmetic with DuckDB
  * list functions; hash-based ops (MinHash/SimHash) are engine-specific
  * by construction and register rows-only.
  */
object TextQueries {

  // DuckDB equivalent of TextAnalysis.tokens: trim then regex-split.
  private val toksSql =
    """string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')"""
  private val toksLowerSql =
    """string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')"""

  private def lexList(lex: Seq[String]): String =
    lex.map(w => s"'$w'").mkString("[", ", ", "]")

  // DuckDB equivalents of Multimodal's md5-hex-prefix stub dims: the
  // value of hex digit i of md5(text), by ascii arithmetic (identical
  // semantics on any engine with an md5-to-hex function).
  private def nibSql(h: String, i: Int): String =
    s"(ascii(substring($h, $i, 1)) - CASE WHEN ascii(substring($h, $i, 1)) >= 97 THEN 87 ELSE 48 END)"
  private def hexValSql(h: String, start: Int): String =
    s"(${nibSql(h, start)} * 4096 + ${nibSql(h, start + 1)} * 256 + ${nibSql(h, start + 2)} * 16 + ${nibSql(h, start + 3)})"
  private def widthSql(h: String): String =
    s"CAST(${hexValSql(h, 1)} % 1920 + 1 AS INTEGER)"
  private def heightSql(h: String): String =
    s"CAST(${hexValSql(h, 5)} % 1080 + 1 AS INTEGER)"

  val defs: Map[String, Q] = Map(

    // Token counting (whitespace tokenizer).
    "q27_text_tokens" -> q(
      s"""SELECT doc_id, CAST(len($toksSql) AS INTEGER) AS n_tokens
          FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    },

    // Heuristic n-gram language ID: argmax of stopword-lexicon hits with
    // declaration-order tie-break.
    "q28_text_langid" -> q({
      val hits = TextAnalysis.Stopwords.map { case (lang, lex) =>
        s"len(list_filter($toksLowerSql, x -> list_contains(${lexList(lex)}, x))) AS h_$lang"
      }.mkString(", ")
      val langs = TextAnalysis.Stopwords.map(_._1)
      val cases = langs.zipWithIndex.map { case (lang, i) =>
        val others = langs.zipWithIndex.collect { case (o, j) if j != i => s"h_$lang >= h_$o" }
        s"WHEN h_$lang > 0 AND ${others.mkString(" AND ")} THEN '$lang'"
      }.mkString(" ")
      s"""SELECT doc_id, lang_detected FROM (
            SELECT doc_id, CASE $cases ELSE 'und' END AS lang_detected
            FROM (SELECT doc_id, $hits FROM documents))
          ORDER BY doc_id"""
    }) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_detected"))
        .orderBy("doc_id")
    },

    // Quality features: integer counts + exact-operand divisions only.
    "q29_text_quality" -> q({
      val allStops = lexList(TextAnalysis.Stopwords.flatMap(_._2))
      s"""SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars_m,
                 CAST(len($toksSql) AS BIGINT) AS n_tokens,
                 CAST(len(string_split_regex(text, '[.,;:!?]')) - 1 AS BIGINT) AS n_punct,
                 CAST(len(list_filter($toksLowerSql, x -> list_contains($allStops, x))) AS BIGINT) AS n_stopwords,
                 CAST(length(text) - (len($toksSql) - 1) AS DOUBLE)
                   / CAST(len($toksSql) AS DOUBLE) AS avg_token_len,
                 CAST(len(list_filter($toksLowerSql, x -> list_contains($allStops, x))) AS DOUBLE)
                   / CAST(len($toksSql) AS DOUBLE) AS stopword_ratio
          FROM documents ORDER BY doc_id"""
    }) { (s, dir) =>
      TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
        .select("doc_id", "n_chars_m", "n_tokens", "n_punct", "n_stopwords",
          "avg_token_len", "stopword_ratio")
        .orderBy("doc_id")
    },

    // Content fingerprint: md5 of whitespace-normalized lower-cased text.
    "q30_text_fingerprint" -> q(
      """SELECT doc_id,
                md5(regexp_replace(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')),
                                   '\s+', ' ', 'g')) AS fp
         FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // Exact dedup by fingerprint: lowest doc_id survives per content hash.
    "q31_dedup_exact" -> q(
      """SELECT fp, CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
         FROM (SELECT doc_id,
                      md5(regexp_replace(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')),
                                         '\s+', ' ', 'g')) AS fp
               FROM documents)
         GROUP BY fp ORDER BY doc_id""") { (s, dir) =>
      Dedup.exactByFingerprint(t(s, dir, "documents"), "doc_id", "text")
        .select("fp", "doc_id", "n_copies")
        .orderBy("doc_id")
    },

    // Trigram-Jaccard near-dup pairs via inverted shingle index; exact
    // integer threshold test (J >= 1/5). Oracle cross-joins (fine at
    // oracle scale) — the Spark side is the scalable inverted-index plan.
    // Trigrams (not bigrams): on a small-vocab corpus, bigram postings
    // lists are so dense that candidates ~= all pairs; trigram vocab is
    // ~vocab² sparser, cutting candidate volume ~25× with identical
    // exactness for near-dup-grade similarity.
    // maxDocFreq caps the worst inverted-index bucket (stop-shingle skew
    // defense at corpus scale); at oracle scale (<= cap docs) it drops
    // nothing, so the uncapped oracle still hash-matches.
    "q32_dedup_ngram_jaccard" -> q(
      s"""WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, greatest(len($toksSql) - 2, 1)),
                     i -> array_to_string(list_slice($toksSql, i, i + 2), ' '))) AS shingles
            FROM documents)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS common,
                 CAST(len(a.shingles) AS BIGINT) AS n_a,
                 CAST(len(b.shingles) AS BIGINT) AS n_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.shingles, b.shingles)) * 5
                >= (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) * 1
          ORDER BY id_a, id_b""") { (s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, num = 1, den = 5, maxDocFreq = 1000L)
        .orderBy("id_a", "id_b")
    },

    // Near-dedup GROUP resolution: exact trigram-Jaccard pairs ->
    // connected components (min-label contraction + pointer jumping) ->
    // per-doc survivor verdicts. Oracle recomputes components via a
    // recursive transitive-closure CTE.
    "q57_dedup_groups" -> q(
      s"""WITH RECURSIVE
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len($toksSql) - 2, 1)),
                       i -> array_to_string(list_slice($toksSql, i, i + 2), ' '))) AS shingles
              FROM documents),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.shingles, b.shingles)) * 5
                    >= (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) * 1),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
            reach(id, r) AS (
              SELECT a, a FROM edges
              UNION
              SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a),
            comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
          SELECT d.doc_id AS id,
                 coalesce(comp.component, d.doc_id) AS component,
                 coalesce(comp.component, d.doc_id) = d.doc_id AS is_survivor
          FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
          ORDER BY id""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.dedupVerdicts(docs, "doc_id",
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, num = 1, den = 5,
          maxDocFreq = 1000L))
        .select("id", "component", "is_survivor")
        .orderBy("id")
    },

    // Incremental (cross-corpus) near-dedup: every 5th doc plays the
    // day's new batch; pairs are new x corpus only. Same trigram
    // machinery and integer Jaccard test as q32.
    "q76_dedup_incremental" -> q(
      s"""WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, greatest(len($toksSql) - 2, 1)),
                     i -> array_to_string(list_slice($toksSql, i, i + 2), ' '))) AS shingles
            FROM documents),
          nw AS (SELECT doc_id, shingles FROM sh WHERE doc_id % 5 = 0),
          corp AS (SELECT doc_id, shingles FROM sh WHERE doc_id % 5 <> 0)
          SELECT nw.doc_id AS id_new, corp.doc_id AS id_corpus,
                 CAST(len(list_intersect(nw.shingles, corp.shingles)) AS BIGINT) AS common,
                 CAST(len(nw.shingles) AS BIGINT) AS n_new,
                 CAST(len(corp.shingles) AS BIGINT) AS n_corpus
          FROM nw JOIN corp ON true
          WHERE len(list_intersect(nw.shingles, corp.shingles)) * 5
                >= (len(nw.shingles) + len(corp.shingles) - len(list_intersect(nw.shingles, corp.shingles))) * 1
          ORDER BY id_new, id_corpus""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.crossCorpusNearDupPairs(
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
        n = 3, num = 1, den = 5, maxDocFreq = 1000L)
        .orderBy("id_new", "id_corpus")
    },

    // Incremental dedup-GROUP maintenance: the stored corpus assignment
    // (yesterday's components over corpus-only pairs) is folded together
    // with the day's new edges (batch x corpus + batch x batch) by
    // incrementalComponents — the CC fixpoint runs only on the
    // batch-sized label graph; the corpus assignment is never shuffled.
    // The oracle is the FULL recompute over all documents (q57's
    // recursive transitive closure): exact equality, not a verdict —
    // min-id labels make the incremental result bit-identical to
    // recomputing from scratch. Pairs run cap-free on both sides so the
    // split computation matches the uncapped oracle by construction
    // (a df cap is corpus-dependent and would desync the subsets).
    "q325_dedup_incr_components" -> q(
      s"""WITH RECURSIVE
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len($toksSql) - 2, 1)),
                       i -> array_to_string(list_slice($toksSql, i, i + 2), ' '))) AS shingles
              FROM documents),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.shingles, b.shingles)) * 5
                    >= (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) * 1),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
            reach(id, r) AS (
              SELECT a, a FROM edges
              UNION
              SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a),
            comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
          SELECT d.doc_id AS id,
                 coalesce(comp.component, d.doc_id) AS component,
                 coalesce(comp.component, d.doc_id) = d.doc_id AS is_survivor
          FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
          ORDER BY id""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val stored = corpus.select(col("doc_id").as("id"))
        .join(Dedup.connectedComponents(
            Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, num = 1, den = 5)
              .select("id_a", "id_b")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      val dayEdges = Dedup.crossCorpusNearDupPairs(
          batch, "doc_id", "text", corpus, "doc_id", "text", n = 3, num = 1, den = 5)
          .select(col("id_new").as("id_a"), col("id_corpus").as("id_b"))
        .unionByName(Dedup.ngramJaccardPairs(batch, "doc_id", "text", n = 3, num = 1, den = 5)
          .select("id_a", "id_b"))
      val updated = Dedup.incrementalComponents(stored, dayEdges)
      docs.select(col("doc_id").as("id"))
        .join(updated, Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("component"))
        .withColumn("is_survivor", col("component") === col("id"))
        .orderBy("id")
    },

    // Substring-level dedup: every 5-token span occurring in >= 2
    // distinct documents, keyed by md5 of the space-joined span
    // (portable across engines, so the whole inventory hash-matches).
    // One generator projection + one hash aggregate, no joins.
    "q97_dedup_spans" -> q(
      s"""WITH tk AS (SELECT doc_id, $toksSql AS tk FROM documents),
            sp AS (
              SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(tk) - 4),
                       i -> md5(array_to_string(list_slice(tk, i, i + 4), ' ')))) AS span_hash
              FROM tk WHERE len(tk) >= 5)
          SELECT span_hash,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_occ,
                 CAST(min(doc_id) AS BIGINT) AS first_doc
          FROM sp GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
          ORDER BY span_hash""") { (s, dir) =>
      Dedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        w = 5, minDocs = 2L)
        .orderBy("span_hash")
    },

    // Substring-level dedup REMOVAL (the action behind q97's inventory):
    // every token covered by a cross-doc duplicated 5-token window is
    // excised except in the span's min-id document; output is the full
    // rewritten corpus (surviving tokens space-joined), so the oracle
    // hash-checks every byte of every surviving document.
    "q100_dedup_spans_remove" -> q(
      s"""WITH tk AS (SELECT doc_id, $toksSql AS tk FROM documents),
            sp AS (SELECT doc_id, tk,
                          unnest(generate_series(1, len(tk) - 4)) AS i
                   FROM tk WHERE len(tk) >= 5),
            sph AS (SELECT doc_id, i - 1 AS pos,
                           md5(array_to_string(list_slice(tk, i, i + 4), ' ')) AS h
                    FROM sp),
            dup AS (SELECT h, min(doc_id) AS first_doc
                    FROM sph GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
            bad AS (SELECT DISTINCT s.doc_id, s.pos
                    FROM sph s JOIN dup d ON s.h = d.h AND s.doc_id <> d.first_doc),
            tokv AS (SELECT doc_id, tk,
                            unnest(generate_series(0, len(tk) - 1)) AS ti
                     FROM tk),
            keep AS (SELECT v.doc_id, v.ti, v.tk[v.ti + 1] AS tok
                     FROM tokv v
                     WHERE NOT EXISTS (SELECT 1 FROM bad b
                                       WHERE b.doc_id = v.doc_id
                                         AND b.pos <= v.ti AND v.ti < b.pos + 5))
          SELECT tk.doc_id,
                 coalesce(string_agg(k.tok, ' ' ORDER BY k.ti), '') AS text
          FROM tk LEFT JOIN keep k ON tk.doc_id = k.doc_id
          GROUP BY tk.doc_id
          ORDER BY tk.doc_id""") { (s, dir) =>
      Dedup.removeDuplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        w = 5, minDocs = 2L)
        .orderBy("doc_id")
    },

    // Gopher repeated-n-gram gates: most-frequent-bigram char fraction
    // (tie-break pinned: count desc, gram asc) + duplicate-5-gram
    // occurrence fraction. The engine computes the mode as a zero-
    // shuffle sorted-run scan per row; the oracle recomputes it
    // relationally (explode -> count -> window) — green means both
    // agree on every doc, including the tie-break and the guards.
    "q104_repetition_stats" -> q(
      s"""WITH tk AS (SELECT doc_id, text, $toksSql AS tk FROM documents),
            g AS (SELECT doc_id, text,
                    CASE WHEN len(tk) >= 2 THEN list_transform(generate_series(1, len(tk) - 1),
                      i -> array_to_string(list_slice(tk, i, i + 1), ' ')) ELSE [] END AS g2,
                    CASE WHEN len(tk) >= 5 THEN list_transform(generate_series(1, len(tk) - 4),
                      i -> array_to_string(list_slice(tk, i, i + 4), ' ')) ELSE [] END AS g5
                  FROM tk),
            ex AS (SELECT doc_id, unnest(g2) AS gram FROM g),
            cnt AS (SELECT doc_id, gram, count(*) AS c FROM ex GROUP BY doc_id, gram),
            top AS (SELECT doc_id, gram, c FROM (
                      SELECT doc_id, gram, c,
                             row_number() OVER (PARTITION BY doc_id
                               ORDER BY c DESC, gram ASC) AS rn
                      FROM cnt) WHERE rn = 1)
          SELECT g.doc_id,
                 coalesce(top.gram, '') AS top_bigram,
                 CASE WHEN len(g.g2) = 0 THEN 0.0
                      ELSE top.c * length(top.gram) / length(g.text)
                 END AS top_bigram_char_fraction,
                 CASE WHEN len(g.g5) = 0 THEN 0.0
                      ELSE CAST(len(g.g5) - len(list_distinct(g.g5)) AS DOUBLE) / len(g.g5)
                 END AS dup_5gram_fraction
          FROM g LEFT JOIN top ON g.doc_id = top.doc_id
          ORDER BY g.doc_id""") { (s, dir) =>
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // MinHash+LSH near-dup, registered as its VERDICT: the hashing is
    // engine-specific, but the ⊆-exact invariant is not — every LSH
    // pair must be in the exact trigram-Jaccard pair set (recomputed
    // independently in Spark, counted independently by DuckDB). Emits
    // (n_exact_pairs, n_violations): the exact count is real oracle
    // work, the zero is the invariant the whole rung stands on.
    "q33_dedup_minhash_lsh" -> q(
      s"""WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, greatest(len($toksSql) - 2, 1)),
                     i -> array_to_string(list_slice($toksSql, i, i + 2), ' '))) AS shingles
            FROM documents)
          SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
                 CAST(0 AS BIGINT) AS n_violations
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.shingles, b.shingles)) * 5
                >= (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))) * 1""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, num = 1, den = 5)
        .select("id_a", "id_b")
      // The exact baseline runs CAP-FREE (the DefaultMaxDocFreq = no
      // cap), matching the uncapped DuckDB oracle by construction: a
      // df-capped baseline can miss true pairs sharing only stop-grade
      // shingles, which would desync n_exact_pairs from the oracle AND
      // count genuine LSH pairs as violations on a hot-trigram corpus.
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, num = 1, den = 5)
        .select(col("id_a"), col("id_b"), lit(1L).as("__e"))
      lsh.withColumn("__l", lit(1L))
        .join(exact, Seq("id_a", "id_b"), "full_outer")
        .agg(sum(coalesce(col("__e"), lit(0L))).as("n_exact_pairs"),
          sum(when(col("__e").isNull, 1L).otherwise(0L)).as("n_violations"))
    },

    // SimHash near-dup, registered as its VERDICT: identical texts get
    // identical 64-bit signatures, so every identical-text pair MUST be
    // emitted at hamming 0 — and the corpus is twinned (every 10th doc
    // copied at id+1e6, replicated exactly in the oracle) so the
    // invariant has real pairs to bite on. n_identical_pairs is
    // DuckDB-recomputed; the zeros are the recall/bound invariants.
    "q34_dedup_simhash" -> q(
      """WITH d AS (SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT doc_id + 1000000, text FROM documents
                    WHERE doc_id % 10 = 0)
         SELECT CAST((SELECT count(*) FROM d a JOIN d b
                      ON a.doc_id < b.doc_id AND a.text = b.text) AS BIGINT)
                  AS n_identical_pairs,
                CAST(0 AS BIGINT) AS n_identical_missed,
                CAST(0 AS BIGINT) AS n_hamming_violations""") { (s, dir) =>
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val docs = base.unionByName(base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
      val ident = docs.as("a").join(docs.as("b"),
          col("a.doc_id") < col("b.doc_id") && col("a.text") === col("b.text"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          lit(1L).as("__i"))
      val joined = pairs.join(ident, Seq("id_a", "id_b"), "full_outer")
      joined.agg(
        sum(coalesce(col("__i"), lit(0L))).as("n_identical_pairs"),
        sum(when(col("__i").isNotNull
          && (col("hamming").isNull || col("hamming") =!= 0L), 1L)
          .otherwise(0L)).as("n_identical_missed"),
        sum(when(col("hamming") > 6L, 1L).otherwise(0L))
          .as("n_hamming_violations"))
    },

    // Multimodal plumbing: binary content column + stub decode. The
    // md5-hex-prefix stub dims are engine-portable (ascii arithmetic on
    // the md5 hex), so the ENTIRE feature row is oracle-checked.
    "q35_multimodal_decode" -> q(
      s"""SELECT doc_id AS media_id,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                 md5(text) AS checksum,
                 ${widthSql("md5(text)")} AS width,
                 ${heightSql("md5(text)")} AS height,
                 CAST(octet_length(encode(text)) * 10 AS BIGINT) AS duration_ms
          FROM documents ORDER BY media_id""") { (s, dir) =>
      val media = Multimodal.withBinaryContent(
        t(s, dir, "documents"), "doc_id", "text", kind = "text")
      Multimodal.decodeStub(media)
        .select("media_id", "n_bytes", "checksum", "width", "height", "duration_ms")
        .orderBy("media_id")
    },

    // BPE-ish subword token counting (LLM token-count proxy): letter
    // runs, digit runs, single marks.
    "q55_text_bpeish_tokens" -> q(
      """SELECT doc_id,
                CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_subtokens
         FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.bpeishTokens(col("text"))).as("n_subtokens"))
        .orderBy("doc_id")
    },

    // Engine-native rolling-hash fingerprint, registered as its
    // VERDICT: the 64-bit values are engine-specific, but the
    // fingerprint CONTRACT is not — equal texts must share one
    // fingerprint (determinism across partitions/runs) and distinct
    // texts must not collide on this corpus. Doc/text counts are
    // DuckDB-recomputed; the booleans are the contract.
    "q56_text_rolling_hash" -> q(
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
                TRUE AS fp_deterministic, TRUE AS fp_collision_free
         FROM documents""") { (s, dir) =>
      val fp = t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextAnalysis.fingerprint64(col("text")).as("fp64"))
      fp.agg(count(lit(1)).as("n_docs"),
          count_distinct(col("text")).as("n_distinct_texts"),
          count_distinct(col("text"), col("fp64")).as("__nd_pair"),
          count_distinct(col("fp64")).as("__nd_fp"))
        .select(col("n_docs"), col("n_distinct_texts"),
          (col("__nd_pair") === col("n_distinct_texts")).as("fp_deterministic"),
          (col("__nd_fp") === col("n_distinct_texts")).as("fp_collision_free"))
    },

    // Length-weighted mean quality per language via the typed
    // Aggregator (graft.functions.WeightedQuality). Inputs are
    // integer-valued doubles (quantized score × n_chars stays < 2^53),
    // so partial-buffer merge order cannot perturb the sums and the
    // final division is engine-deterministic.
    "q58_quality_weighted" -> q({
      val allStops = lexList(TextAnalysis.Stopwords.flatMap(_._2))
      s"""SELECT lang,
                 CAST(sum(sq * n_chars) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE)
                   AS weighted_quality
          FROM (
            SELECT lang, n_chars,
                   floor((least(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0) * 0.5
                          + least((CAST(len(list_filter($toksLowerSql, x -> list_contains($allStops, x))) AS DOUBLE)
                                   / CAST(len($toksSql) AS DOUBLE)) * 4.0, 1.0) * 0.5)
                         * 1000000 + 0.5) AS sq
            FROM documents)
          GROUP BY lang ORDER BY lang"""
    }) { (s, dir) =>
      import org.apache.spark.sql.functions.udaf
      val wq = udaf(graft.functions.WeightedQuality.agg)
      TextAnalysis.qualityScore(t(s, dir, "documents"), "text")
        .select(col("lang"), col("n_chars").cast("double").as("w"),
          floor(col("quality_score") * 1000000 + 0.5).cast("double").as("sq"))
        .groupBy("lang")
        .agg(wq(col("w"), col("sq")).as("weighted_quality"))
        .orderBy("lang")
    },

    // Resize: aspect-preserving fit-in-box geometry + proportional
    // thumbnail. Fully oracled now that stub dims are md5-derived; the
    // thumbnail byte-slice is expressed as a char substring in DuckDB,
    // exact because the corpus is pure ASCII (verified at every SF:
    // octet_length(encode(text)) == length(text) for all rows).
    "q77_multimodal_resize" -> q({
      val h = "md5(text)"
      s"""WITH f AS (
            SELECT doc_id AS media_id, text,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   ${widthSql(h)} AS width,
                   ${heightSql(h)} AS height
            FROM documents),
          g AS (
            SELECT media_id, text, n_bytes, width, height,
                   least(256.0 / width, 256.0 / height, 1.0) AS scale
            FROM f),
          o AS (
            SELECT media_id, text, n_bytes, width, height,
                   CAST(greatest(floor(width * scale), 1) AS INTEGER) AS out_width,
                   CAST(greatest(floor(height * scale), 1) AS INTEGER) AS out_height
            FROM g),
          th AS (
            SELECT media_id, width, height, out_width, out_height,
                   substring(text, 1,
                     CAST(greatest(floor(n_bytes * CAST(out_width * out_height AS DOUBLE)
                                          / CAST(width * height AS DOUBLE)), 1) AS INTEGER)) AS thumb
            FROM o)
          SELECT media_id,
                 width AS src_width, height AS src_height,
                 out_width, out_height,
                 CAST(length(thumb) AS BIGINT) AS thumb_bytes,
                 md5(thumb) AS thumb_checksum
          FROM th ORDER BY media_id"""
    }) { (s, dir) =>
      val media = Multimodal.withBinaryContent(
        t(s, dir, "documents"), "doc_id", "text", kind = "img")
      Multimodal.resizeStub(media, targetW = 256, targetH = 256)
        .select("media_id", "src_width", "src_height",
          "out_width", "out_height", "thumb_bytes", "thumb_checksum")
        .orderBy("media_id")
    },

    // The mapPartitions-batched decode path (real codec shape) must
    // produce byte-identical features to the projection stub.
    "q61_multimodal_batched" -> q(
      """SELECT doc_id AS media_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS checksum
         FROM documents ORDER BY media_id""") { (s, dir) =>
      val media = Multimodal.withBinaryContent(
        t(s, dir, "documents"), "doc_id", "text", kind = "text")
      Multimodal.decodeBatched(media).toDF()
        .select("media_id", "n_bytes", "checksum")
        .orderBy("media_id")
    },

    // Out-of-vocabulary rate: per eval-split document, the share of its
    // tokens absent from the train split's vocabulary (the tokenizer /
    // domain-shift health check run before trusting eval numbers). The
    // vocabulary is a distinct-token relation (Heaps' law: far smaller
    // than the stream) and the membership test is a broadcast-grade
    // left-anti join — never doc x doc.
    "q170_oov_rate" -> q(
      s"""WITH split AS (SELECT doc_id, text,
                               substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                                 AS is_train
                        FROM documents),
             vocab AS (SELECT DISTINCT unnest($toksLowerSql) AS term
                       FROM split WHERE is_train),
             eval_toks AS (SELECT doc_id, unnest($toksLowerSql) AS term
                           FROM split WHERE NOT is_train),
             oov AS (SELECT e.doc_id,
                            CAST(count(*) AS BIGINT) AS n_tokens,
                            CAST(count(*) FILTER (WHERE v.term IS NULL) AS BIGINT)
                              AS n_oov
                     FROM eval_toks e LEFT JOIN vocab v ON e.term = v.term
                     GROUP BY 1)
          SELECT doc_id, n_tokens, n_oov,
                 CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
          FROM oov ORDER BY doc_id""") { (s, dir) =>
      val split = Curation.hashSplit(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.9, "eval" -> 0.1), salt = "v1")
      val toks = (df: org.apache.spark.sql.DataFrame) => df.select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      val vocab = toks(split.filter(col("split") === "train"))
        .select("term").distinct()
      val evalToks = toks(split.filter(col("split") =!= "train"))
      val hits = evalToks.join(vocab.withColumn("__known", lit(1)),
        Seq("term"), "left")
      hits.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__known").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          expr("n_oov * 1000000L DIV n_tokens").as("oov_ppm"))
        .orderBy("doc_id")
    },

    // Vocabulary growth (Heaps' law profile): cumulative distinct terms
    // after each decile of the doc_id-ordered corpus. Exact without any
    // cumulative-distinct scan: each term charges its FIRST-occurrence
    // document (min doc_id — one hash aggregate over the token stream),
    // first-occurrences bucket into deciles, and the running total runs
    // over the 10-row bucket relation.
    "q171_vocab_growth" -> q(
      s"""WITH toks AS (SELECT doc_id, unnest($toksLowerSql) AS term FROM documents),
             firsts AS (SELECT term, min(doc_id) AS first_doc FROM toks GROUP BY 1),
             ids AS (SELECT doc_id,
                            CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) - 1 AS rk,
                            CAST(count(*) OVER () AS BIGINT) AS n
                     FROM (SELECT DISTINCT doc_id FROM toks)),
             bucketed AS (SELECT CAST((ids.rk * 10) // ids.n AS BIGINT) AS decile,
                                 CAST(count(*) AS BIGINT) AS new_terms
                          FROM firsts JOIN ids ON firsts.first_doc = ids.doc_id
                          GROUP BY 1)
          SELECT decile, new_terms,
                 CAST(sum(new_terms) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
          FROM bucketed ORDER BY decile""") { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(lower(col("text"))))
          .as("term"))
      val firsts = toks.groupBy("term").agg(min("doc_id").as("first_doc"))
      val ids = Curation.rankBuckets(
          toks.select("doc_id").distinct()
            .select(col("doc_id"), col("doc_id").as("score")),
          "doc_id", "score", nBuckets = 10)
        .select(col("doc_id").as("first_doc"), col("bucket").as("decile"))
      val bucketed = firsts.join(ids, "first_doc")
        .groupBy("decile").agg(count(lit(1)).as("new_terms"))
      import org.apache.spark.sql.expressions.Window
      bucketed.withColumn("vocab_size",
          sum("new_terms").over(Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("decile")
    },

    // Calibration report for the q82 quality model: global score
    // deciles (rankBuckets' distributed prefix rank over the e6-scaled
    // logit) against the empirical keep rate per decile — the
    // reliability-diagram table an ML pipeline reads before trusting a
    // threshold. All arithmetic after the (already-oracled) logit is
    // exact integers.
    "q165_model_calibration" -> q({
      val toks = toksSql
      val meanWord = s"CAST(list_sum(list_transform($toks, x -> length(x))) AS DOUBLE) / CAST(len($toks) AS DOUBLE)"
      val alphaRatio = s"CAST(len(list_filter($toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / CAST(len($toks) AS DOUBLE)"
      val symRatio = s"CAST(length(text) - length(regexp_replace(text, '[#@$$%&]', '', 'g')) AS DOUBLE) / CAST(len($toks) AS DOUBLE)"
      val dupFrac = s"1.0 - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE) / CAST(len(string_split(text, chr(10))) AS DOUBLE)"
      val logit = s"""(-1.0 + ($alphaRatio) * 2.0 + ($dupFrac) * -3.0
                      + ($meanWord) * 0.1 + CAST(len($toks) AS BIGINT) * 0.001
                      + ($symRatio) * -5.0)"""
      s"""WITH s AS (SELECT doc_id,
                            CAST(floor($logit * 1000000 + 0.5) AS BIGINT) AS logit_e6,
                            $logit >= 1.0 AS keep
                     FROM documents),
            r AS (SELECT doc_id, logit_e6, keep,
                         row_number() OVER (ORDER BY logit_e6, doc_id) - 1 AS rk,
                         count(*) OVER () AS n
                  FROM s),
            b AS (SELECT CAST((rk * 10) // n AS BIGINT) AS bucket, logit_e6, keep FROM r)
         SELECT bucket,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_keep,
                CAST(count(*) FILTER (WHERE keep) * 1000000 // count(*) AS BIGINT)
                  AS keep_ppm,
                CAST(sum(logit_e6) // count(*) AS BIGINT) AS mean_logit_e6
         FROM b GROUP BY 1 ORDER BY 1"""
    }) { (s, dir) =>
      val scored = TextAnalysis.linearQualityScore(t(s, dir, "documents"),
          "doc_id", "text",
          weights = Map(
            "alpha_word_ratio" -> 2.0,
            "duplicate_line_fraction" -> -3.0,
            "mean_word_length" -> 0.1,
            "n_tokens" -> 0.001,
            "symbol_to_word_ratio" -> -5.0),
          bias = -1.0)
        .select(col("doc_id"),
          floor(col("quality_logit") * 1000000 + 0.5).cast("long").as("logit_e6"),
          (col("quality_logit") >= 1.0).as("keep"))
      Curation.rankBuckets(
          scored.select("doc_id", "logit_e6"), "doc_id", "logit_e6",
          nBuckets = 10)
        .drop("logit_e6")
        .join(scored, "doc_id")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          expr("sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000L DIV count(*)")
            .as("keep_ppm"),
          expr("sum(logit_e6) DIV count(*)").as("mean_logit_e6"))
        .orderBy("bucket")
    },

    // Model-based quality scoring: linear logit over the gopher features
    // with literal weights (the trained-classifier stage of a curation
    // pipeline). Fixed-order multiply-adds -> engine-deterministic ->
    // fully oracled, keep-flag included.
    "q82_quality_model" -> q({
      val toks = toksSql
      val meanWord = s"CAST(list_sum(list_transform($toks, x -> length(x))) AS DOUBLE) / CAST(len($toks) AS DOUBLE)"
      val alphaRatio = s"CAST(len(list_filter($toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / CAST(len($toks) AS DOUBLE)"
      val symRatio = s"CAST(length(text) - length(regexp_replace(text, '[#@$$%&]', '', 'g')) AS DOUBLE) / CAST(len($toks) AS DOUBLE)"
      val dupFrac = s"1.0 - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE) / CAST(len(string_split(text, chr(10))) AS DOUBLE)"
      // feature order = sorted weight keys, matching linearQualityScore
      s"""SELECT doc_id,
                 CAST(-1.0 + ($alphaRatio) * 2.0 + ($dupFrac) * -3.0
                      + ($meanWord) * 0.1 + CAST(len($toks) AS BIGINT) * 0.001
                      + ($symRatio) * -5.0 AS DOUBLE) AS quality_logit,
                 (-1.0 + ($alphaRatio) * 2.0 + ($dupFrac) * -3.0
                      + ($meanWord) * 0.1 + CAST(len($toks) AS BIGINT) * 0.001
                      + ($symRatio) * -5.0) >= 1.0 AS keep
          FROM documents ORDER BY doc_id"""
    }) { (s, dir) =>
      TextAnalysis.linearQualityScore(t(s, dir, "documents"), "doc_id", "text",
        weights = Map(
          "alpha_word_ratio" -> 2.0,
          "duplicate_line_fraction" -> -3.0,
          "mean_word_length" -> 0.1,
          "n_tokens" -> 0.001,
          "symbol_to_word_ratio" -> -5.0),
        bias = -1.0)
        .select(col("doc_id"), col("quality_logit"),
          (col("quality_logit") >= 1.0).as("keep"))
        .orderBy("doc_id")
    },

    // Corpus length histogram: decimal-digit-count buckets of n_tokens
    // per language — exact string/integer ops, no floating log, so the
    // observability report is engine-deterministic.
    "q83_length_histogram" -> q(
      s"""SELECT lang,
                 CAST(length(CAST(len($toksSql) AS VARCHAR)) AS INTEGER) AS magnitude,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CAST(len($toksSql) AS BIGINT)) AS BIGINT) AS total_tokens
          FROM documents
          GROUP BY lang, magnitude
          ORDER BY lang, magnitude""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("magnitude", length(col("n_tokens").cast("string")))
        .groupBy("lang", "magnitude")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy("lang", "magnitude")
    },

    // Gopher-style quality gates (public Gopher-paper heuristics):
    // exact integer counts + exact-operand divisions, engine-stable.
    "q67_quality_gopher" -> q(
      s"""SELECT doc_id,
                 CAST(len($toksSql) AS BIGINT) AS n_tokens,
                 CAST(list_sum(list_transform($toksSql, x -> length(x))) AS DOUBLE)
                   / CAST(len($toksSql) AS DOUBLE) AS mean_word_length,
                 CAST(len(list_filter($toksSql, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                   / CAST(len($toksSql) AS DOUBLE) AS alpha_word_ratio,
                 CAST(length(text) - length(regexp_replace(text, '[#@$$%&]', '', 'g')) AS DOUBLE)
                   / CAST(len($toksSql) AS DOUBLE) AS symbol_to_word_ratio,
                 1.0 - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE)
                   / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS duplicate_line_fraction
          FROM documents ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.gopherStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // PII scrubbing. The synthetic corpus carries no PII, so every 7th
    // doc gets a deterministic planted email+phone (derived from doc_id
    // on BOTH engines) — the scrubber then has real matches to count
    // and rewrite, non-vacuously.
    "q68_scrub_pii" -> q(
      s"""WITH d AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                               || '@example.com or 555-123-4567'
                        ELSE text END AS text
            FROM documents)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
                 regexp_replace(regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
                                '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS text_scrubbed
          FROM d ORDER BY doc_id""") { (s, dir) =>
      val planted = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or 555-123-4567")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.scrubPii(planted, "doc_id", "text")
        .orderBy("doc_id")
    },

    // Repeated-line removal (CCNet-style repetition filter). The corpus
    // is single-line, so two copies of the doc's 40-char prefix are
    // planted as extra lines (derived identically on both engines) —
    // the filter then provably drops exactly the second copy.
    "q70_dedup_lines" -> q(
      """WITH d AS (
           SELECT doc_id,
                  text || chr(10) || substring(text, 1, 40)
                       || chr(10) || substring(text, 1, 40) AS text
           FROM documents),
         l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM d),
         k AS (SELECT doc_id, lines,
                      list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept
               FROM l)
         SELECT doc_id,
                CAST(len(lines) AS BIGINT) AS n_lines,
                CAST(len(lines) - len(kept) AS BIGINT) AS n_removed,
                array_to_string(kept, chr(10)) AS text_deduped
         FROM k ORDER BY doc_id""") { (s, dir) =>
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"),
          substring(col("text"), 1, 40), substring(col("text"), 1, 40)).as("text"))
      TextAnalysis.dedupLines(planted, "doc_id", "text")
        .orderBy("doc_id")
    },

    // Corpus composition report: per-(source, lang) doc/token/char
    // rollup with subtotals — the mix report every curation pipeline
    // publishes. One hash aggregate over grouping sets.
    "q71_corpus_stats" -> q(
      s"""SELECT source, lang,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CAST(len($toksSql) AS BIGINT)) AS BIGINT) AS total_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars
          FROM documents
          GROUP BY ROLLUP (source, lang)
          ORDER BY source NULLS FIRST, lang NULLS FIRST""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          col("n_chars"))
        .rollup("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
    },

    // Sentence segmentation via posexplode — the index-carrying
    // generator (position-aware UDTF shape). Indices are assigned
    // BEFORE the empty-sentence filter, so positions are stable on both
    // engines.
    "q72_text_sentences" -> q(
      """WITH s AS (
           SELECT doc_id, string_split_regex(text, '[.!?]') AS sents
           FROM documents),
         u AS (
           SELECT doc_id,
                  generate_subscripts(sents, 1) - 1 AS sent_idx,
                  regexp_replace(unnest(sents), '^\s+|\s+$', '', 'g') AS sentence
           FROM s)
         SELECT doc_id, CAST(sent_idx AS INTEGER) AS sent_idx, sentence,
                CAST(length(sentence) AS BIGINT) AS n_chars
         FROM u WHERE length(sentence) > 0
         ORDER BY doc_id, sent_idx""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), "[.!?]", -1)).as(Seq("sent_idx", "sentence")))
        .withColumn("sentence", regexp_replace(col("sentence"), "^\\s+|\\s+$", ""))
        .filter(length(col("sentence")) > 0)
        .select(col("doc_id"), col("sent_idx"), col("sentence"),
          length(col("sentence")).cast("long").as("n_chars"))
        .orderBy("doc_id", "sent_idx")
    },

    // Term frequencies: explode + count — the generator (UDTF-shaped) op.
    "q36_text_term_freq" -> q(
      s"""SELECT token, CAST(count(*) AS BIGINT) AS freq
          FROM (SELECT unnest($toksLowerSql) AS token FROM documents)
          GROUP BY token
          HAVING count(*) >= 50
          ORDER BY freq DESC, token""") { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 50)
        .orderBy(col("freq").desc, col("token"))
    },

    // Keyword extraction: most distinctive term per doc by linear-idf
    // TF-IDF (tf * n_docs/df — integer-valued doubles through exactly-
    // rounded ops only, so scores are bit-identical across engines;
    // ln-idf would drift in the last ulp). Deterministic token
    // tie-break.
    "q84_tf_idf" -> q(
      s"""WITH tf AS (
            SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest($toksLowerSql) AS token FROM documents)
            GROUP BY doc_id, token),
          dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          scored AS (
            SELECT doc_id, token, tf, df,
                   CAST(tf AS DOUBLE)
                     * (CAST((SELECT n_docs FROM n) AS DOUBLE) / CAST(df AS DOUBLE)) AS tf_idf
            FROM tf JOIN dfr USING (token))
          SELECT doc_id, token, tf, df, tf_idf
          FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf_idf DESC, token) AS rn
                FROM scored)
          WHERE rn = 1
          ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.topTfIdfTerm(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Per-language token-count quantiles by rank SELECTION (type-1,
    // value at ceil(p*n)) — integer selection, no interpolation, so the
    // corpus length report is engine-exact where quantile_cont/
    // percentile interpolation would differ in the last ulp.
    "q85_length_quantiles" -> q(
      s"""WITH c AS (
            SELECT lang, CAST(len($toksSql) AS INTEGER) AS n_tokens
            FROM documents),
          r AS (
            SELECT lang, n_tokens,
                   row_number() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM c)
          SELECT lang,
                 max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN n_tokens END) AS p25,
                 max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN n_tokens END) AS p50,
                 max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN n_tokens END) AS p75,
                 max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN n_tokens END) AS p90,
                 CAST(max(n) AS BIGINT) AS n_docs
          FROM r GROUP BY lang ORDER BY lang""") { (s, dir) =>
      TextAnalysis.lengthQuantiles(t(s, dir, "documents"), "lang", "text")
        .orderBy("lang")
    },

    // Corpus-level paragraph dedup (CCNet-style boilerplate removal):
    // the corpus is single-line, so each doc is planted as 3 paragraphs
    // — its 60-char prefix, a SHARED boilerplate line (the cross-corpus
    // duplicate), and its next 60 chars — derived identically on both
    // engines. Only the minimum (doc_id, pos) occurrence of any
    // duplicated paragraph survives; docs reassemble in order.
    "q86_dedup_paragraphs" -> q(
      """WITH d AS (
           SELECT doc_id,
                  substring(text, 1, 60) || chr(10)
                    || 'subscribe to our newsletter for updates' || chr(10)
                    || substring(text, 61, 60) AS text
           FROM documents),
         p AS (
           SELECT doc_id,
                  generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
                  unnest(string_split(text, chr(10))) AS para
           FROM d),
         k AS (
           SELECT doc_id, pos, para,
                  row_number() OVER (PARTITION BY md5(para)
                                     ORDER BY doc_id, pos) AS rn
           FROM p),
         r AS (
           SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text_deduped,
                  count(*) AS n_kept
           FROM k WHERE rn = 1 GROUP BY doc_id)
         SELECT d.doc_id,
                coalesce(r.text_deduped, '') AS text_deduped,
                CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_paras,
                CAST(len(string_split(d.text, chr(10)))
                     - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
         FROM d LEFT JOIN r USING (doc_id) ORDER BY doc_id""") { (s, dir) =>
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n", substring(col("text"), 1, 60),
          lit("subscribe to our newsletter for updates"),
          substring(col("text"), 61, 60)).as("text"))
      Dedup.dedupParagraphs(planted, "doc_id", "text")
        .orderBy("doc_id")
    },

    // Heavy-hitter terms via Spark's built-in approx_top_k sketch — the
    // BOUNDED-STATE path for q36's exact term frequency: one mergeable
    // aggregate whose memory is O(maxItemsTracked) regardless of
    // vocabulary size (q36's groupBy state grows with distinct terms).
    // With maxItemsTracked far above this corpus's vocabulary the
    // sketch never evicts, counts are exact, and the count>=50 filter
    // makes the result set tie-order-independent — so the sketch path
    // shares q36's EXACT oracle, the same differential gate the batched
    // multimodal decode (q61) uses.
    "q90_heavy_hitters" -> q(
      s"""SELECT token, CAST(count(*) AS BIGINT) AS freq
          FROM (SELECT unnest($toksLowerSql) AS token FROM documents)
          GROUP BY token
          HAVING count(*) >= 50
          ORDER BY freq DESC, token""") { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
        .agg(expr("approx_top_k(token, 1000, 65536)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("token"), col("e.count").as("freq"))
        .filter(col("freq") >= 50)
        .orderBy(col("freq").desc, col("token"))
    },

    // GK-sketch length quantiles — the no-sort scale path for q85,
    // registered as the VERDICT: the exact rank-selection quantiles
    // (q85's oracle shape) plus per-quantile booleans pinning the
    // sketch inside the differential spec's bound |e − a| ≤
    // max(2, e DIV 10) — driver-green instead of spec-only.
    "q89_length_quantiles_approx" -> q(
      s"""WITH c AS (
            SELECT lang, CAST(len($toksSql) AS INTEGER) AS n_tokens
            FROM documents),
          r AS (
            SELECT lang, n_tokens,
                   row_number() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM c)
          SELECT lang,
                 max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN n_tokens END) AS p25,
                 max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN n_tokens END) AS p50,
                 max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN n_tokens END) AS p75,
                 max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN n_tokens END) AS p90,
                 CAST(max(n) AS BIGINT) AS n_docs,
                 TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p90_ok
          FROM r GROUP BY lang ORDER BY lang""") { (s, dir) =>
      TextAnalysis.lengthQuantilesApproxVerdict(
        t(s, dir, "documents"), "lang", "text")
        .orderBy("lang")
    },

    // Quality-aware survivor selection: same components as q57, but the
    // cluster representative is the highest-token-count member (ties ->
    // min id) instead of the minimum id. The oracle recomputes the
    // winner with a row_number window; the engine uses one hash
    // aggregate max(struct(score, -id)) — green means both selections
    // agree on every cluster, tie-breaks included.
    "q106_dedup_keep_best" -> q(
      s"""WITH RECURSIVE
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len($toksSql) - 2, 1)),
                       i -> array_to_string(list_slice($toksSql, i, i + 2), ' '))) AS shingles
              FROM documents),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.shingles, b.shingles)) * 5
                    >= (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) * 1),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
            reach(id, r) AS (
              SELECT a, a FROM edges
              UNION
              SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a),
            comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
            scored AS (
              SELECT d.doc_id AS id,
                     coalesce(comp.component, d.doc_id) AS component,
                     CAST(len($toksSql) AS BIGINT) AS score
              FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
            best AS (
              SELECT component, id AS best_id FROM (
                SELECT component, id,
                       row_number() OVER (PARTITION BY component
                                          ORDER BY score DESC, id ASC) AS rn
                FROM scored) WHERE rn = 1)
          SELECT s.id, s.component, s.score, s.id = b.best_id AS keep
          FROM scored s JOIN best b USING (component)
          ORDER BY s.id""") { (s, dir) =>
      val docs = t(s, dir, "documents")
        .withColumn("score", TextAnalysis.tokenCount(col("text")).cast("long"))
      Dedup.keepBestPerComponent(docs, "doc_id", "score",
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, num = 1, den = 5,
          maxDocFreq = 1000L))
        .select("id", "component", "score", "keep")
        .orderBy("id")
    },

    // Unicode NFC canonicalization (custom codegen expression vs
    // DuckDB's nfc_normalize). The corpus is ASCII, so each row gets a
    // decomposed "cafe<combining acute>" prefix — every row genuinely
    // recomposes, and the hash compare proves byte-identical output.
    "q111_normalize_nfc" -> q(
      """SELECT doc_id,
                nfc_normalize('cafe' || chr(769) || ' ' || text) AS text_nfc
         FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.normalizeNfc(
            concat(lit("café "), col("text"))).as("text_nfc"))
        .orderBy("doc_id")
    },

    // Canonical match-key text: NFC -> lower -> whitespace to single
    // space -> strip non-[a-z0-9 ] -> collapse -> trim. The decomposed
    // prefix proves ORDER matters: NFC-first composes e+accent into one
    // e-acute which the class filter then drops whole; skipping NFC
    // would leave a bare 'e' behind. Both engines spell the same chain.
    "q124_canonical_text" -> q(
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(regexp_replace(
                  lower(nfc_normalize('Caf' || chr(101) || chr(769) || '!  ' || text)),
                  '\\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS text_canon
         FROM documents ORDER BY doc_id""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.canonicalText(
            concat(lit("Cafe\u0301!  "), col("text"))).as("text_canon"))
        .orderBy("doc_id")
    },

    // Positional inverted index: posting lists with sorted 1-based
    // term positions. The operator returns the real array<long>
    // column; the REGISTERED projection serializes it to a ','-joined
    // string because the driver harness cannot canonicalize array
    // cells (r5: pandas lexsort died on "unhashable numpy.ndarray").
    "q159_inverted_index" -> q(
      s"""WITH toks AS (SELECT doc_id, $toksLowerSql AS tk FROM documents),
             terms AS (SELECT doc_id, unnest(tk) AS term,
                              unnest(generate_series(1, len(tk))) AS pos
                       FROM toks)
          SELECT term, doc_id,
                 string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions,
                 CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      TextAnalysis.invertedIndex(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("positions", array_join(col("positions"), ","))
        .orderBy("term", "doc_id")
    },

    // Exact phrase search ("table hash") over positional postings —
    // the consumer of q159's index shape: adjacency via higher-order
    // position-array filters, corpus pruned to the phrase terms before
    // any aggregation.
    "q160_phrase_search" -> q(
      s"""WITH toks AS (SELECT doc_id, $toksLowerSql AS tk FROM documents),
             terms AS (SELECT doc_id, unnest(tk) AS term,
                              unnest(generate_series(1, len(tk))) AS pos
                       FROM toks),
             p0 AS (SELECT doc_id, list_sort(list(pos)) AS ps
                    FROM terms WHERE term = 'table' GROUP BY 1),
             p1 AS (SELECT doc_id, list_sort(list(pos)) AS ps
                    FROM terms WHERE term = 'hash' GROUP BY 1)
          SELECT p0.doc_id,
                 CAST(len(list_filter(p0.ps, p -> list_contains(p1.ps, p + 1)))
                   AS BIGINT) AS n_matches
          FROM p0 JOIN p1 USING (doc_id)
          WHERE len(list_filter(p0.ps, p -> list_contains(p1.ps, p + 1))) > 0
          ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.phraseSearch(t(s, dir, "documents"), "doc_id", "text",
          Seq("table", "hash"))
        .orderBy("doc_id")
    },

    // BM25 retrieval for the query {table, hash, spark}: exact
    // tf/df/length statistics, one rounded-then-decimal-fixed float
    // chain per (doc, term) in IDENTICAL operation order on both
    // engines (even k1+1 is spelled 1.2 + 1.0 — the literal 2.2 can
    // differ from the sum by an ulp), decimal sums per doc. The
    // registered output is the e9-scaled BIGINT (per-term scores are
    // rounded to 9 decimals, so the decimal sum *1e9 is lossless) —
    // DECIMAL outputs hash-mismatch at the driver harness (r5).
    "q161_bm25" -> q(
      s"""WITH toks AS (SELECT doc_id, unnest($toksLowerSql) AS term FROM documents),
             dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                    FROM toks GROUP BY 1),
             stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                              CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
             tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                    FROM toks WHERE term IN ('table', 'hash', 'spark')
                    GROUP BY 1, 2),
             dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                       FROM tf GROUP BY 1)
          SELECT doc_id,
                 CAST(sum(CAST(round(
                     ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * (1.2 + 1.0))
                       / (tf + 1.2 * ((1.0 - 0.75) + ((0.75 * dl) * nd) / sumdl)),
                     9) AS DECIMAL(18,9))) * 1000000000 AS BIGINT) AS bm25_e9
          FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
          GROUP BY doc_id ORDER BY bm25_e9 DESC, doc_id LIMIT 20""") { (s, dir) =>
      TextAnalysis.bm25(t(s, dir, "documents"), "doc_id", "text",
          Seq("table", "hash", "spark"))
        .select(col("doc_id"),
          expr("CAST(bm25 * 1000000000 AS BIGINT)").as("bm25_e9"))
        .orderBy(col("bm25_e9").desc, col("doc_id").asc)
        .limit(20)
    },

    // First BPE merge round: adjacent character pairs weighted by word
    // frequency, top 100 \u2014 corpus collapses to distinct words BEFORE
    // the pair generator (TextAnalysis.bpePairCounts).
    "q140_bpe_pairs" -> q(
      s"""WITH words AS (SELECT w, CAST(count(*) AS BIGINT) AS wn
                         FROM (SELECT unnest($toksLowerSql) AS w FROM documents)
                         GROUP BY 1),
             pairs AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, wn
                       FROM words, LATERAL (SELECT unnest(generate_series(1,
                         length(w) - 1)) AS i) g
                       WHERE length(w) >= 2)
          SELECT pair, CAST(sum(wn) AS BIGINT) AS pair_count
          FROM pairs GROUP BY 1
          ORDER BY pair_count DESC, pair ASC LIMIT 100""") { (s, dir) =>
      TextAnalysis.bpePairCounts(t(s, dir, "documents"), "text", k = 100)
    },

    // CCNet-style LM quality filter: add-1-smoothed bigram model trained
    // on the q170 hash-split's train side, eval docs scored by mean
    // per-bigram probability. All-integer e9 arithmetic (no floats, no
    // logs) so iterated Spark == DuckDB exactly; the oracle extracts
    // bigrams by positional self-join while Spark uses an in-row
    // zip_with generator — same relation, no shuffle on the Spark side.
    "q172_lm_score" -> q(
      s"""WITH split AS (SELECT doc_id, text,
                               substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                                 AS is_train
                        FROM documents),
             toks AS (SELECT doc_id, is_train,
                             unnest($toksLowerSql) AS term,
                             generate_subscripts($toksLowerSql, 1) AS pos
                      FROM split),
             big AS (SELECT a.doc_id, a.is_train, a.term AS w1, b.term AS w2
                     FROM toks a JOIN toks b
                       ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
             c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
                    FROM big WHERE is_train GROUP BY 1, 2),
             c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
                    FROM big WHERE is_train GROUP BY 1),
             v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v
                   FROM toks WHERE is_train),
             scored AS (SELECT e.doc_id,
                               (1000000000 * (COALESCE(c2.c2, 0) + 1))
                                 // (COALESCE(c1.c1, 0) + v.v) AS p_e9
                        FROM big e CROSS JOIN v
                        LEFT JOIN c2 ON e.w1 = c2.w1 AND e.w2 = c2.w2
                        LEFT JOIN c1 ON e.w1 = c1.w1
                        WHERE NOT e.is_train)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(p_e9) // count(*) AS BIGINT) AS score_e9
          FROM scored GROUP BY 1 ORDER BY doc_id""") { (s, dir) =>
      val split = Curation.hashSplit(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.9, "eval" -> 0.1), salt = "v1")
        .withColumn("is_train", col("split") === "train")
      TextAnalysis.bigramLmScore(split, "doc_id", "text", "is_train")
        .orderBy("doc_id")
    },

    // Lexical-diversity profile per source: type-token ratio, top-term
    // share, hapax share — the corpus-health numbers read before
    // trusting a source's contribution to a training mix. One shuffle
    // on (source, term) then one vocabulary-sized agg on source; all
    // ratios exact e6 integers.
    "q173_lexical_diversity" -> q(
      s"""WITH tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
                      FROM (SELECT source, unnest($toksLowerSql) AS term
                            FROM documents)
                      GROUP BY 1, 2)
          SELECT source,
                 CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_terms,
                 CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_e6,
                 CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top_share_e6,
                 CAST(count(*) FILTER (WHERE c = 1) * 1000000 // count(*)
                   AS BIGINT) AS hapax_e6
          FROM tc GROUP BY source ORDER BY source""") { (s, dir) =>
      val tc = t(s, dir, "documents")
        .select(col("source"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
      tc.groupBy("source")
        .agg(sum("c").as("n_tokens"),
          count(lit(1)).as("n_terms"),
          max("c").as("__max_c"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("__hapax"))
        .select(col("source"), col("n_tokens"), col("n_terms"),
          expr("n_terms * 1000000L DIV n_tokens").as("ttr_e6"),
          expr("__max_c * 1000000L DIV n_tokens").as("top_share_e6"),
          expr("__hapax * 1000000L DIV n_terms").as("hapax_e6"))
        .orderBy("source")
    },

    // Pairwise source-vocabulary Jaccard: how much two sources' word
    // inventories overlap (mix-design redundancy check). The corpus
    // collapses to the DISTINCT (source, term) relation first, so the
    // term self-join fans out at most nSources^2 per term; exact e6.
    "q174_vocab_jaccard" -> q(
      s"""WITH vt AS (SELECT DISTINCT source, term
                      FROM (SELECT source, unnest($toksLowerSql) AS term
                            FROM documents)),
             sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                    FROM vt GROUP BY 1),
             inter AS (SELECT a.source AS src_a, b.source AS src_b,
                              CAST(count(*) AS BIGINT) AS n_common
                       FROM vt a JOIN vt b
                         ON a.term = b.term AND a.source < b.source
                       GROUP BY 1, 2)
          SELECT src_a, src_b, n_common,
                 CAST(n_common * 1000000 // (sa.n + sb.n - n_common) AS BIGINT)
                   AS jaccard_e6
          FROM inter
          JOIN sz sa ON src_a = sa.source
          JOIN sz sb ON src_b = sb.source
          ORDER BY src_a, src_b""") { (s, dir) =>
      val vt = t(s, dir, "documents")
        .select(col("source"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        .distinct()
      val sz = vt.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = vt.as("a")
        .join(vt.as("b"),
          col("a.term") === col("b.term") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_common"))
      inter
        .join(sz.select(col("source").as("src_a"), col("n").as("__na")), "src_a")
        .join(sz.select(col("source").as("src_b"), col("n").as("__nb")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_common"),
          expr("n_common * 1000000L DIV (__na + __nb - n_common)")
            .as("jaccard_e6"))
        .orderBy("src_a", "src_b")
    },

    // Top-100 collocations by lift (TextAnalysis.collocations): the
    // log-free PMI analog as one FIXED integer-division chain, so the
    // bytes match any engine; the oracle extracts bigrams positionally
    // while Spark zips in-row — same relation.
    "q180_collocations" -> q(
      s"""WITH toks AS (SELECT doc_id, unnest($toksLowerSql) AS term,
                               generate_subscripts($toksLowerSql, 1) AS pos
                        FROM documents),
             uni AS (SELECT term AS w, CAST(count(*) AS BIGINT) AS c
                     FROM toks GROUP BY 1),
             nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni),
             big AS (SELECT a.term AS w1, b.term AS w2,
                            CAST(count(*) AS BIGINT) AS pair_count
                     FROM toks a JOIN toks b
                       ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                     GROUP BY 1, 2),
             nb AS (SELECT CAST(sum(pair_count) AS BIGINT) AS nb FROM big)
          SELECT w1, w2, pair_count,
                 CAST(((((pair_count * nu.nu) // u1.c) * nu.nu) // u2.c)
                      * 1000000 // nb.nb AS BIGINT) AS lift_e6
          FROM big
          JOIN uni u1 ON w1 = u1.w
          JOIN uni u2 ON w2 = u2.w
          CROSS JOIN nu CROSS JOIN nb
          WHERE pair_count >= 5
          ORDER BY lift_e6 DESC, w1, w2 LIMIT 100""") { (s, dir) =>
      TextAnalysis.collocations(t(s, dir, "documents"), "text",
        minCount = 5L, k = 100)
    },

    // Source-pair shingle-Jaccard overlap matrix (Dedup.sourceOverlap):
    // which ingest feeds mirror each other, BEFORE any doc-level dedup.
    // Literal trigram strings (q32's shingle definition) so counts are
    // engine-exact; per-shingle join fanout is bounded by the source
    // count, never corpus size.
    "q210_source_overlap" -> q(
      s"""WITH sh AS (
            SELECT DISTINCT g, sh FROM (
              SELECT source AS g,
                     unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len($toksSql) - 2, 1)),
                       i -> array_to_string(list_slice($toksSql, i, i + 2), ' ')))) AS sh
              FROM documents)),
            sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
            inter AS (SELECT a.g AS src_a, b.g AS src_b,
                             CAST(count(*) AS BIGINT) AS common
                      FROM sh a JOIN sh b ON a.sh = b.sh AND a.g < b.g
                      GROUP BY 1, 2)
         SELECT src_a, src_b, common, sa.n AS n_a, sb.n AS n_b,
                round(CAST(common AS DOUBLE)
                      / CAST(sa.n + sb.n - common AS DOUBLE), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON src_a = sa.g
         JOIN sizes sb ON src_b = sb.g
         ORDER BY src_a, src_b""") { (s, dir) =>
      Dedup.sourceOverlap(t(s, dir, "documents"), "source", "text", n = 3)
        .orderBy("src_a", "src_b")
    },

    // Distributed BPE tokenizer training (TextAnalysis.bpeTrain): 6
    // merge rounds on the word-count relation (ONE corpus scan — the
    // 100 TB corpus collapses to Heaps-law vocab size). Merge = string
    // replace with sentinel spaces (leftmost non-overlapping = greedy
    // BPE); selection (max freq, min pair) is a total order. The
    // oracle replays the identical rounds as MATERIALIZED CTEs.
    "q216_bpe_train" -> q({
      val base =
        s"""WITH w0 AS MATERIALIZED (
              SELECT word, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT unnest($toksSql) AS word FROM documents)
              WHERE word <> '' GROUP BY 1),
            s0 AS MATERIALIZED (
              SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
                     || ' ' AS s, c
              FROM w0)"""
      val rs = (1 to 6).map { r =>
        s""", p$r AS MATERIALIZED (
              SELECT pair, CAST(sum(c) AS BIGINT) AS freq FROM (
                SELECT unnest(list_transform(
                         generate_series(1, len(string_split(trim(s), ' ')) - 1),
                         i -> string_split(trim(s), ' ')[i] || ' '
                              || string_split(trim(s), ' ')[i + 1])) AS pair, c
                FROM s${r - 1}) GROUP BY 1),
            b$r AS MATERIALIZED (
              SELECT CAST($r AS BIGINT) AS round, pair, freq
              FROM p$r ORDER BY freq DESC, pair LIMIT 1),
            s$r AS MATERIALIZED (
              SELECT replace(s, ' ' || (SELECT pair FROM b$r) || ' ',
                             ' ' || replace((SELECT pair FROM b$r), ' ', '')
                             || ' ') AS s, c
              FROM s${r - 1})"""
      }.mkString
      base + rs +
        "\n SELECT round, pair, freq FROM (" +
        (1 to 6).map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ") +
        ") ORDER BY round"
    }) { (s, dir) =>
      TextAnalysis.bpeTrain(t(s, dir, "documents"), "text", rounds = 6)
        .orderBy("round")
    },

    // Vocabulary coverage curve: the smallest head-of-Zipf vocab that
    // covers 50/90/99% of corpus tokens (rank by freq desc, word asc —
    // total order), plus the full vocab size. The tokenizer-budget
    // sizing companion to q216. All-integer thresholds (cum*100 >=
    // total*p), one vocab-sized window after the corpus collapse.
    "q217_vocab_coverage" -> q(
      s"""WITH w AS (SELECT word, CAST(count(*) AS BIGINT) AS c
                     FROM (SELECT unnest($toksSql) AS word FROM documents)
                     WHERE word <> '' GROUP BY 1),
            r AS (SELECT c,
                         CAST(row_number() OVER (ORDER BY c DESC, word) AS BIGINT) AS rk,
                         CAST(sum(c) OVER (ORDER BY c DESC, word
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                         CAST(sum(c) OVER () AS BIGINT) AS total
                  FROM w)
         SELECT min(CASE WHEN cum * 100 >= total * 50 THEN rk END) AS r50,
                min(CASE WHEN cum * 100 >= total * 90 THEN rk END) AS r90,
                min(CASE WHEN cum * 100 >= total * 99 THEN rk END) AS r99,
                CAST(count(*) AS BIGINT) AS vocab_size
         FROM r""") { (s, dir) =>
      val w = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("c"))
      // distributed rank + cumulative share in ONE pass (GlobalRank —
      // no single-task sort of the vocab relation, which at 100 TB of
      // raw text is 10^8-10^9 distinct tokens); the corpus total rides
      // the offsets broadcast (totalCol) instead of a second pass over
      // the token aggregation
      graft.operators.GlobalRank.rowNumberAndPrefixSum(w,
          Seq(col("c").desc, col("word")), "c", "rk", "cum",
          totalCol = "total")
        .agg(min(when(col("cum") * 100 >= col("total") * 50, col("rk"))).as("r50"),
          min(when(col("cum") * 100 >= col("total") * 90, col("rk"))).as("r90"),
          min(when(col("cum") * 100 >= col("total") * 99, col("rk"))).as("r99"),
          count(lit(1)).as("vocab_size"))
    },

    // BPE compression per source (TextAnalysis.bpeCompression): train
    // q216's 6 merges corpus-wide, then measure each source's chars vs
    // post-merge symbols through the vocab-sized word→segmentation
    // mapping — encode never re-runs merges on documents. The oracle
    // replays training (word column carried through) and the join.
    "q220_bpe_compression" -> q({
      val base =
        s"""WITH w0 AS MATERIALIZED (
              SELECT word, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT unnest($toksSql) AS word FROM documents)
              WHERE word <> '' GROUP BY 1),
            s0 AS MATERIALIZED (
              SELECT word,
                     ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
                     || ' ' AS s, c
              FROM w0)"""
      val rs = (1 to 6).map { r =>
        s""", p$r AS MATERIALIZED (
              SELECT pair, CAST(sum(c) AS BIGINT) AS freq FROM (
                SELECT unnest(list_transform(
                         generate_series(1, len(string_split(trim(s), ' ')) - 1),
                         i -> string_split(trim(s), ' ')[i] || ' '
                              || string_split(trim(s), ' ')[i + 1])) AS pair, c
                FROM s${r - 1}) GROUP BY 1),
            b$r AS MATERIALIZED (SELECT pair FROM p$r ORDER BY freq DESC, pair LIMIT 1),
            s$r AS MATERIALIZED (
              SELECT word, replace(s, ' ' || (SELECT pair FROM b$r) || ' ',
                             ' ' || replace((SELECT pair FROM b$r), ' ', '')
                             || ' ') AS s, c
              FROM s${r - 1})"""
      }.mkString
      base + rs +
        s"""
          , m AS MATERIALIZED (
              SELECT word, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS nsym
              FROM s6),
            occ AS (SELECT source AS grp, unnest($toksSql) AS word FROM documents)
          SELECT grp, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(len(word)) AS BIGINT) AS n_chars,
                 CAST(sum(nsym) AS BIGINT) AS n_symbols,
                 CAST(sum(nsym) * 1000000 // sum(len(word)) AS BIGINT) AS ratio_e6
          FROM occ JOIN m USING (word)
          WHERE word <> ''
          GROUP BY grp ORDER BY grp"""
    }) { (s, dir) =>
      TextAnalysis.bpeCompression(t(s, dir, "documents"), "source", "text",
        rounds = 6)
        .orderBy("grp")
    },

    // Cross-media frame dedup (Multimodal.frameDedup): frames sampled
    // from the stub video payloads (16-byte slices at stride 4), md5'd
    // in place — only (hash, media) rows shuffle — and reported when
    // they recur across >= 2 distinct media. The oracle replays the
    // identical slicing on the ASCII payload (q77's text-as-bytes
    // equivalence).
    "q222_frame_dedup" -> q(
      """WITH fr AS (
           SELECT doc_id AS media_id,
                  md5(base64(encode(substring(text, CAST(i * 64 + 1 AS INTEGER), 16)))) AS fhash
           FROM (SELECT doc_id, text,
                        unnest(generate_series(0,
                          CAST(greatest(floor(octet_length(encode(text)) / 64) - 1, 0) AS BIGINT))) AS i
                 FROM documents))
         SELECT fhash, CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
                CAST(count(*) AS BIGINT) AS n_frames
         FROM fr GROUP BY 1
         HAVING count(DISTINCT media_id) >= 2
         ORDER BY fhash""") { (s, dir) =>
      Multimodal.frameDedup(
        Multimodal.withBinaryContent(t(s, dir, "documents"), "doc_id",
          "text", "video"),
        frameBytes = 16, stride = 4, minMedia = 2L)
        .orderBy("fhash")
    },

    // Per-source boilerplate trigrams (TextAnalysis.stopGrams): token
    // 3-grams shared by ≥5% of a source's documents — the crawl-chrome
    // detector that runs BEFORE span excision (q100 removes the spans
    // these identify). Doc frequency via per-row array_distinct, so the
    // exchange ships each (doc, gram) once; the integer n_docs·100 ≥
    // total·pct threshold is boundary-exact on both engines.
    "q226_stop_ngrams" -> q(
      s"""WITH toks AS (SELECT doc_id, source, $toksLowerSql AS tk FROM documents),
             grams AS (SELECT DISTINCT doc_id, source,
                              concat_ws(' ', tk[i], tk[i+1], tk[i+2]) AS ngram
                       FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i) g
                       WHERE len(tk) >= 3),
             df AS (SELECT source, ngram, CAST(count(*) AS BIGINT) AS n_docs
                    FROM grams GROUP BY 1, 2),
             tot AS (SELECT source, count(*) AS total FROM documents GROUP BY 1)
          SELECT source, ngram, n_docs
          FROM df JOIN tot USING (source)
          WHERE n_docs * 100 >= total * 5
          ORDER BY source, ngram""") { (s, dir) =>
      TextAnalysis.stopGrams(t(s, dir, "documents"), "doc_id", "source",
          "text", n = 3, minDfPct = 5)
        .orderBy("source", "ngram")
    },

    // Reliability diagram (Stats.calibrationBins) for a type-token-
    // ratio "quality score" against the lang=en label: per-decile
    // size, positives, and empirical rate — all integer-exact (the
    // min(9, score·10 div 1e6) bin edge cannot flip across engines).
    "q228_calibration_bins" -> q(
      s"""WITH s AS (SELECT CAST(len(list_distinct(tk)) * 1000000 // len(tk) AS BIGINT) AS score_e6,
                            lang = 'en' AS pos
                     FROM (SELECT doc_id, lang, $toksLowerSql AS tk FROM documents)
                     WHERE len(tk) > 0),
             b AS (SELECT least(9, score_e6 * 10 // 1000000) AS bin, pos FROM s)
          SELECT CAST(bin AS BIGINT) AS bin,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
                 CAST((count(*) FILTER (WHERE pos)) * 1000000 // count(*) AS BIGINT)
                   AS pos_rate_e6
          FROM b GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      val tk = TextAnalysis.tokens(lower(col("text")))
      val scored = t(s, dir, "documents")
        .select(tk.as("__tk"), (col("lang") === "en").as("pos"))
        .filter(size(col("__tk")) > 0)
        .select(expr("size(array_distinct(__tk)) * 1000000L DIV size(__tk)")
          .as("score_e6"), col("pos"))
      graft.operators.Stats.calibrationBins(scored, "score_e6", "pos")
        .orderBy("bin")
    },

    // Exact ROC AUC (Stats.rankAuc) of the same score/label pair:
    // doubled-U rank statistics in pure integers (ties at half
    // credit), the distinct-score relation bounded by e6 resolution,
    // prefix ranks from the DISTRIBUTED scan — the oracle's global
    // window is the single-task formulation the engine refuses
    // (q120's precedent).
    "q229_rank_auc" -> q(
      s"""WITH s AS (SELECT CAST(len(list_distinct(tk)) * 1000000 // len(tk) AS BIGINT) AS score,
                            lang = 'en' AS pos
                     FROM (SELECT doc_id, lang, $toksLowerSql AS tk FROM documents)
                     WHERE len(tk) > 0),
             g AS (SELECT score,
                          CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS np,
                          CAST(count(*) FILTER (WHERE NOT pos) AS BIGINT) AS nn
                   FROM s GROUP BY 1),
             c AS (SELECT score, np, nn,
                          CAST(coalesce(sum(nn) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                            AS BIGINT) AS cnb
                   FROM g),
             t AS (SELECT CAST(sum(2 * np * cnb + np * nn) AS BIGINT) AS two_u,
                          CAST(sum(np) AS BIGINT) AS n_pos,
                          CAST(sum(nn) AS BIGINT) AS n_neg
                   FROM c)
          SELECT two_u, n_pos, n_neg,
                 CAST(two_u * 1000000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_e6
          FROM t""") { (s, dir) =>
      val tk = TextAnalysis.tokens(lower(col("text")))
      val scored = t(s, dir, "documents")
        .select(tk.as("__tk"), (col("lang") === "en").as("pos"))
        .filter(size(col("__tk")) > 0)
        .select(expr("size(array_distinct(__tk)) * 1000000L DIV size(__tk)")
          .as("score"), col("pos"))
      graft.operators.Stats.rankAuc(scored, "score", "pos")
    },

    // Exact two-sample KS drift per source (each source's doc-length
    // distribution vs the pooled rest). Cross-multiplied integer CDFs —
    // d_num / (n_g*n_rest) is the KS distance, but no float ever forms
    // inside the engines. The step CDFs are forward-filled on the
    // (sources × distinct-lengths) grid and both cumsums run on the
    // distributed two-pass prefix scan, not a single-partition window.
    "q242_ks_drift" -> q(
      """WITH pts AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS m FROM documents
                      WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1),
              cum AS (SELECT v, CAST(coalesce(sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + m AS BIGINT) AS f_all FROM pts),
              grid AS (SELECT g, v FROM (SELECT DISTINCT source AS g FROM documents WHERE source IS NOT NULL) gs,
                                        (SELECT v FROM pts) vs),
              gv AS (SELECT source AS g, n_chars AS v, CAST(count(*) AS BIGINT) AS c FROM documents
                     WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2),
              f AS (SELECT grid.g, grid.v, CAST(sum(coalesce(gv.c, 0)) OVER (PARTITION BY grid.g ORDER BY grid.v) AS BIGINT) AS fg
                    FROM grid LEFT JOIN gv ON grid.g = gv.g AND grid.v = gv.v),
              sz AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n_g FROM documents
                     WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents
                      WHERE source IS NOT NULL AND n_chars IS NOT NULL)
         SELECT f.g AS source,
                CAST(max(abs(fg * (n - n_g) - (f_all - fg) * n_g)) AS BIGINT) AS d_num,
                n_g, CAST(n - n_g AS BIGINT) AS n_rest
         FROM f JOIN cum USING (v) JOIN sz ON f.g = sz.g, tot
         GROUP BY 1, n_g, n_rest ORDER BY source""") { (s, dir) =>
      graft.operators.Stats.ksPerGroup(t(s, dir, "documents"), "source", "n_chars")
        .orderBy("source")
    },

    // Exact Mann-Whitney rank-sum per source vs the pooled rest. Tied
    // ranks stay integral by doubling (2·avgrank = 2·C_before + m + 1),
    // so u_x2 = 2·U hash-matches across engines. No grid needed — one
    // aggregate, one distributed prefix scan, one equi join.
    "q243_mann_whitney" -> q(
      """WITH pts AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS m FROM documents
                      WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1),
              cum AS (SELECT v, m, CAST(coalesce(sum(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb FROM pts),
              gv AS (SELECT source AS g, n_chars AS v, CAST(count(*) AS BIGINT) AS c FROM documents
                     WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents
                      WHERE source IS NOT NULL AND n_chars IS NOT NULL)
         SELECT g AS source,
                CAST(sum(c * (2 * cb + m + 1)) - sum(c) * (sum(c) + 1) AS BIGINT) AS u_x2,
                CAST(sum(c) AS BIGINT) AS n_g,
                CAST(n - sum(c) AS BIGINT) AS n_rest
         FROM gv JOIN cum USING (v), tot
         GROUP BY g, n ORDER BY source""") { (s, dir) =>
      graft.operators.Stats.mannWhitneyPerGroup(t(s, dir, "documents"), "source", "n_chars")
        .orderBy("source")
    },

    // Fixed-window audio chunking from container metadata alone (8 kB/s
    // byte rate, 50 ms windows → 400-byte chunks): offsets, lengths and
    // timestamps from pure arithmetic + one explode; each chunk
    // checksums ONLY its own hex slice, so both engines hash identical
    // byte ranges without a BLOB-substring primitive. The decode-free
    // windowing a speech pipeline runs before any model sees a sample.
    "q244_audio_chunks" -> q(
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
                           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
                    FROM documents),
              c AS (SELECT media_id, n_bytes, hx,
                           CAST(unnest(generate_series(0, greatest((n_bytes + 399) // 400, 1) - 1)) AS BIGINT) AS chunk_idx
                    FROM m)
         SELECT media_id, chunk_idx,
                CAST(chunk_idx * 400 AS BIGINT) AS byte_off,
                CAST(greatest(least(400, n_bytes - chunk_idx * 400), 0) AS BIGINT) AS byte_len,
                CAST(chunk_idx * 50 AS BIGINT) AS ms_off,
                md5(substring(hx, CAST(chunk_idx * 800 + 1 AS BIGINT), CAST(greatest(least(400, n_bytes - chunk_idx*400), 0) * 2 AS BIGINT))) AS chunk_checksum
         FROM c ORDER BY media_id, chunk_idx""") { (s, dir) =>
      val media = Multimodal.withBinaryContent(
        t(s, dir, "documents"), "doc_id", "text", kind = "audio")
      Multimodal.chunkAudio(media, bytesPerSecond = 8000L, chunkMs = 50L)
        .orderBy("media_id", "chunk_idx")
    },

    // Trigram novelty of every non-src1 document against src1 as the
    // reference corpus (decontamination's inverse — a "how much of this
    // is actually new" signal). Exact e6 ratio of per-doc distinct
    // 3-grams absent from the reference's distinct-gram set; the
    // membership test is one gram-keyed left join, never doc×doc.
    "q245_ngram_novelty" -> q(
      s"""WITH toks AS (SELECT doc_id, source, $toksLowerSql AS tk FROM documents),
              cg AS (SELECT DISTINCT doc_id, concat_ws(' ', tk[i], tk[i+1], tk[i+2]) AS ngram
                     FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i) g
                     WHERE len(tk) >= 3 AND source <> 'src1'),
              rg AS (SELECT DISTINCT concat_ws(' ', tk[i], tk[i+1], tk[i+2]) AS ngram
                     FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i) g
                     WHERE len(tk) >= 3 AND source = 'src1')
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(count(*) FILTER (WHERE rg.ngram IS NULL) AS BIGINT) AS n_novel,
                 CAST(count(*) FILTER (WHERE rg.ngram IS NULL) * 1000000 // count(*) AS BIGINT) AS novelty_e6
          FROM cg LEFT JOIN rg ON cg.ngram = rg.ngram
          GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      TextAnalysis.ngramNovelty(
          candidates = docs.filter(col("source") =!= "src1"),
          reference = docs.filter(col("source") === "src1"),
          idCol = "doc_id", textCol = "text", n = 3)
        .orderBy("doc_id")
    },

    // Cohen's kappa (Stats.cohenKappa): chance-corrected agreement
    // between the corpus's declared `lang` labels and the heuristic
    // lang-ID (q28) — the annotation-audit primitive that says whether
    // a cheap classifier agrees with gold beyond luck. Exact DECIMAL
    // operands, one final division.
    "q261_cohen_kappa" -> q(
      s"""WITH det AS ($langDetectSql),
             cm AS (SELECT lang AS a, lang_detected AS b,
                           CAST(count(*) AS BIGINT) AS c
                    FROM det WHERE lang IS NOT NULL AND lang_detected IS NOT NULL
                    GROUP BY 1, 2),
             r AS (SELECT a AS l, CAST(sum(c) AS BIGINT) AS ra FROM cm GROUP BY 1),
             co AS (SELECT b AS l, CAST(sum(c) AS BIGINT) AS cb FROM cm GROUP BY 1),
             pe AS (SELECT COALESCE(CAST(sum(CAST(ra AS HUGEINT) * CAST(cb AS HUGEINT))
                             AS HUGEINT), 0) AS pe
                    FROM r JOIN co USING (l)),
             tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                            CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree
                     FROM cm)
          SELECT n AS n_items, agree AS n_agree,
                 (agree * 1000000) // n AS po_e6,
                 CASE WHEN CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - pe = 0 THEN NULL
                      ELSE CAST(floor(1000000 * (
                             CAST(CAST(n AS HUGEINT) * CAST(agree AS HUGEINT) - pe AS DOUBLE)
                             / CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - pe AS DOUBLE))
                             + 0.5) AS BIGINT)
                 END AS kappa_e6
          FROM tot CROSS JOIN pe""") { (s, dir) =>
      val det = t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_detected"))
      graft.operators.Stats.cohenKappa(det, "lang", "lang_detected")
    },

    // Per-class precision/recall/F1 (Stats.classificationReport) for
    // the same gold-vs-heuristic pair — all ratios exact integer e6
    // (F1 as 2tp/(2tp+fp+fn), never a float intermediate); classes
    // the union of both label sets, NULL where sklearn warns on
    // zero division.
    "q264_classification_report" -> q(
      s"""WITH det AS ($langDetectSql),
             cm AS (SELECT lang AS a, lang_detected AS b,
                           CAST(count(*) AS BIGINT) AS c
                    FROM det WHERE lang IS NOT NULL AND lang_detected IS NOT NULL
                    GROUP BY 1, 2),
             tpt AS (SELECT a AS label, c AS tp FROM cm WHERE a = b),
             tt AS (SELECT a AS label, CAST(sum(c) AS BIGINT) AS tt FROM cm GROUP BY 1),
             pt AS (SELECT b AS label, CAST(sum(c) AS BIGINT) AS pt FROM cm GROUP BY 1),
             j AS (SELECT COALESCE(tt.label, pt.label) AS label,
                          COALESCE(tpt.tp, 0) AS tp,
                          COALESCE(pt.pt, 0) - COALESCE(tpt.tp, 0) AS fp,
                          COALESCE(tt.tt, 0) - COALESCE(tpt.tp, 0) AS fn
                   FROM tt FULL OUTER JOIN pt ON tt.label = pt.label
                   LEFT JOIN tpt ON COALESCE(tt.label, pt.label) = tpt.label)
          SELECT label, tp, fp, fn,
                 CASE WHEN tp + fp = 0 THEN NULL
                      ELSE (tp * 1000000) // (tp + fp) END AS precision_e6,
                 CASE WHEN tp + fn = 0 THEN NULL
                      ELSE (tp * 1000000) // (tp + fn) END AS recall_e6,
                 CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                      ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS f1_e6
          FROM j ORDER BY label""") { (s, dir) =>
      val det = t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_detected"))
      graft.operators.Stats.classificationReport(det, "lang", "lang_detected")
        .orderBy("label")
    },

    // Per-class one-vs-rest Matthews correlation (Stats.mccPerLabel)
    // of the langid heuristic — same confusion relation as q264 plus
    // the tn margin; exact integer numerator, sqrt-product denominator.
    "q269_mcc" -> q(
      s"""WITH det AS ($langDetectSql),
             cm AS (SELECT lang AS a, lang_detected AS b,
                           CAST(count(*) AS BIGINT) AS c
                    FROM det WHERE lang IS NOT NULL AND lang_detected IS NOT NULL
                    GROUP BY 1, 2),
             nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cm),
             tpt AS (SELECT a AS label, c AS tp FROM cm WHERE a = b),
             tt AS (SELECT a AS label, CAST(sum(c) AS BIGINT) AS tt FROM cm GROUP BY 1),
             pt AS (SELECT b AS label, CAST(sum(c) AS BIGINT) AS pt FROM cm GROUP BY 1),
             j AS (SELECT COALESCE(tt.label, pt.label) AS label,
                          COALESCE(tpt.tp, 0) AS tp,
                          COALESCE(pt.pt, 0) - COALESCE(tpt.tp, 0) AS fp,
                          COALESCE(tt.tt, 0) - COALESCE(tpt.tp, 0) AS fn
                   FROM tt FULL OUTER JOIN pt ON tt.label = pt.label
                   LEFT JOIN tpt ON COALESCE(tt.label, pt.label) = tpt.label),
             w AS (SELECT label, tp, fp, fn,
                          (SELECT n FROM nn) - tp - fp - fn AS tn FROM j)
          SELECT label, tp, fp, fn, tn,
                 CASE WHEN tp + fp = 0 OR tp + fn = 0
                        OR tn + fp = 0 OR tn + fn = 0 THEN NULL
                      ELSE CAST(floor(1000000 * (
                        CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS DOUBLE)
                        / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))
                           * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE))))
                        + 0.5) AS BIGINT) END AS mcc_e6
          FROM w ORDER BY label""") { (s, dir) =>
      val det = t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_detected"))
      graft.operators.Stats.mccPerLabel(det, "lang", "lang_detected")
        .orderBy("label")
    },

    // NDCG@10 per language (Stats.ndcgAtK): rank docs by vocabulary
    // richness (distinct-token count), grade relevance by document
    // length — each positional gain floored to an exact e9 integer
    // before the order-independent integer sum.
    "q270_ndcg" -> q(
      s"""WITH s AS (SELECT lang, doc_id,
                  CAST(len(list_distinct(tk)) AS BIGINT) AS score,
                  CASE WHEN n_chars >= 450 THEN 3 WHEN n_chars >= 350 THEN 2
                       WHEN n_chars >= 250 THEN 1 ELSE 0 END AS rel
                FROM (SELECT lang, doc_id, n_chars, $toksLowerSql AS tk FROM documents)
                WHERE len(tk) > 0),
             r AS (SELECT lang, rel,
                     row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS pos,
                     row_number() OVER (PARTITION BY lang ORDER BY rel DESC, doc_id ASC) AS ipos
                   FROM s),
             g AS (SELECT lang,
                     CASE WHEN pos <= 10 THEN CAST(floor(1000000000 * (CAST(pow(2, rel) - 1 AS DOUBLE)
                          / log2(CAST(pos + 1 AS DOUBLE))) + 0.5) AS BIGINT) ELSE 0 END AS gain_e9,
                     CASE WHEN ipos <= 10 THEN CAST(floor(1000000000 * (CAST(pow(2, rel) - 1 AS DOUBLE)
                          / log2(CAST(ipos + 1 AS DOUBLE))) + 0.5) AS BIGINT) ELSE 0 END AS igain_e9
                   FROM r)
          SELECT lang, CAST(sum(gain_e9) AS BIGINT) AS dcg_e9,
                 CAST(sum(igain_e9) AS BIGINT) AS idcg_e9,
                 CASE WHEN sum(igain_e9) = 0 THEN NULL
                      ELSE CAST(sum(gain_e9) * 1000000 // sum(igain_e9) AS BIGINT) END AS ndcg_e6
          FROM g GROUP BY 1 ORDER BY lang""") { (s, dir) =>
      val tk = TextAnalysis.tokens(lower(col("text")))
      val scored = t(s, dir, "documents")
        .select(col("lang"), col("doc_id"), tk.as("__tk"), col("n_chars"))
        .filter(size(col("__tk")) > 0)
        .select(col("lang"), col("doc_id"),
          size(array_distinct(col("__tk"))).cast("long").as("score"),
          expr("""CAST(CASE WHEN n_chars >= 450 THEN 3 WHEN n_chars >= 350 THEN 2
                       WHEN n_chars >= 250 THEN 1 ELSE 0 END AS BIGINT)""").as("rel"))
      graft.operators.Stats.ndcgAtK(scored, "lang", "doc_id", "score", "rel", k = 10)
        .orderBy("lang")
    },

    // Per-source Brier score (Stats.brierScore) of the token-uniqueness
    // "is-English" scorer — squared e6 error summed exactly, e12 output.
    "q272_brier" -> q(
      s"""WITH s AS (SELECT source,
                  CAST(len(list_distinct(tk)) * 1000000 // len(tk) AS BIGINT) AS score,
                  lang = 'en' AS pos
                FROM (SELECT source, lang, $toksLowerSql AS tk FROM documents)
                WHERE len(tk) > 0),
             d AS (SELECT source,
                     CAST(score - CASE WHEN pos THEN 1000000 ELSE 0 END AS HUGEINT) AS dd
                   FROM s)
          SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(dd * dd) // count(*) AS BIGINT) AS brier_e12
          FROM d GROUP BY 1 ORDER BY source""") { (s, dir) =>
      val tk = TextAnalysis.tokens(lower(col("text")))
      val scored = t(s, dir, "documents")
        .select(col("source"), tk.as("__tk"), (col("lang") === "en").as("pos"))
        .filter(size(col("__tk")) > 0)
        .select(col("source"),
          expr("size(array_distinct(__tk)) * 1000000L DIV size(__tk)").as("score"),
          col("pos"))
      graft.operators.Stats.brierScore(scored, "source", "score", "pos")
        .orderBy("source")
    },

    // Zipf's-law slope (TextAnalysis.zipfSlope): OLS of ln(freq) on
    // ln(rank) over the top corpus terms, logs floored to exact e9
    // integers before the DECIMAL-exact regression. The synthetic
    // corpus's ~31-term vocabulary slopes shallow; natural corpora
    // slope near -1.
    "q273_zipf_slope" -> q(
      s"""WITH tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c
                      FROM (SELECT unnest($toksLowerSql) AS term FROM documents)
                      GROUP BY 1),
             r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rnk FROM tc),
             xy AS (SELECT CAST(floor(1000000000 * ln(CAST(rnk AS DOUBLE)) + 0.5) AS HUGEINT) AS x,
                           CAST(floor(1000000000 * ln(CAST(c AS DOUBLE)) + 0.5) AS HUGEINT) AS y
                    FROM r WHERE rnk <= 100),
             s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
                          sum(x*y) AS sxy, sum(x*x) AS sxx FROM xy)
          SELECT CAST(n AS BIGINT) AS n_terms,
                 round(CAST(n*sxy - sx*sy AS DOUBLE)
                       / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS zipf_slope
          FROM s""") { (s, dir) =>
      TextAnalysis.zipfSlope(t(s, dir, "documents"), "text", topN = 100)
    },

    // Flesch-style readability per language (TextAnalysis.readability)
    // — exact e3 integer arithmetic over corpus-total word / sentence /
    // vowel-group counts. The synthetic corpus carries no sentence
    // punctuation, so each doc is closed with '.' (doc = one sentence);
    // on a real corpus the operator counts [.!?]+ runs as-is.
    "q274_readability" -> q(
      s"""WITH d AS (SELECT lang, text || '.' AS text FROM documents),
             m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(len($toksSql)) AS BIGINT) AS n_words,
                          CAST(sum(len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
                          CAST(sum(len(regexp_extract_all(lower(text), '[aeiou]+'))) AS BIGINT) AS n_vowel_groups
                   FROM d GROUP BY 1)
          SELECT lang, n_docs, n_words, n_sentences, n_vowel_groups,
                 CASE WHEN n_sentences = 0 OR n_words = 0 THEN NULL
                      ELSE 206835 - (1015 * n_words) // n_sentences
                           - (84600 * n_vowel_groups) // n_words END AS flesch_e3
          FROM m ORDER BY lang""") { (s, dir) =>
      TextAnalysis.readability(
        t(s, dir, "documents")
          .select(col("lang"), concat(col("text"), lit(".")).as("text")),
        "lang", "text")
        .orderBy("lang")
    },

    // Per-doc unigram Shannon entropy (TextAnalysis.tokenEntropy) —
    // the gibberish/boilerplate signal: H = log2(n) - (sum c*log2 c)/n
    // with each c*log2(c) floored to an exact e9 integer pre-sum.
    "q275_token_entropy" -> q(
      s"""WITH tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
                      FROM (SELECT doc_id, unnest($toksLowerSql) AS term FROM documents)
                      GROUP BY 1, 2),
             ag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                           sum(CAST(floor(1000000000 * c * log2(CAST(c AS DOUBLE)) + 0.5)
                               AS BIGINT)) AS clogc
                    FROM tc GROUP BY 1)
          SELECT doc_id, n_tokens,
                 CAST(floor(1000000 * (log2(CAST(n_tokens AS DOUBLE))
                      - CAST(clogc AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 1000000000))
                      + 0.5) AS BIGINT) AS entropy_e6
          FROM ag ORDER BY doc_id""") { (s, dir) =>
      TextAnalysis.tokenEntropy(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Asymmetric containment near-dup pairs (Dedup.containmentPairs):
    // C(A,B) = common / min(|A|,|B|) >= 0.8 over trigram shingles —
    // catches a short doc quoted verbatim inside a long one, which
    // Jaccard (q32) dilutes toward min/max. Exact integer inequality;
    // same df-capped two-phase plan as q32.
    "q276_containment" -> q(
      s"""WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, greatest(len($toksSql) - 2, 1)),
                     i -> array_to_string(list_slice($toksSql, i, i + 2), ' '))) AS shingles
            FROM documents)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS common,
                 CAST(len(a.shingles) AS BIGINT) AS n_a,
                 CAST(len(b.shingles) AS BIGINT) AS n_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.shingles, b.shingles)) * 5
                >= least(len(a.shingles), len(b.shingles)) * 4
          ORDER BY id_a, id_b""") { (s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, num = 4, den = 5, maxDocFreq = 1000L)
        .orderBy("id_a", "id_b")
    },

    // Sparse TF-IDF cosine near-dup pairs within each source block
    // (TextAnalysis.tfIdfCosinePairs): exact integer weights/dots/
    // norms, exact-inequality 0.8 threshold — the lexical counterpart
    // of the embedding near-dup ladder. The Spark side runs the
    // df-capped two-phase plan (bounded per-term fanout + heavy-doc
    // completion + exact verify), which is provably identical to this
    // uncapped oracle for any cap — TextQualitySpec differentials it.
    "q284_tfidf_cosine" -> q(
      s"""WITH tf AS (SELECT source, doc_id, term, CAST(count(*) AS BIGINT) AS tf
                      FROM (SELECT source, doc_id, unnest($toksLowerSql) AS term
                            FROM documents)
                      GROUP BY 1, 2, 3),
             n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM tf),
             df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             w AS (SELECT tf.source, tf.doc_id, tf.term,
                      CAST(tf.tf * CAST(floor(1000 * ln(CAST((SELECT nd FROM n) AS DOUBLE)
                        / df.df) + 0.5) AS BIGINT) AS HUGEINT) AS w
                   FROM tf JOIN df USING (term)
                   WHERE df.df < (SELECT nd FROM n)),
             norm AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1),
             dot AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
                     FROM w a JOIN w b ON a.term = b.term AND a.source = b.source
                       AND a.doc_id < b.doc_id
                     GROUP BY 1, 2)
          SELECT id_a, id_b,
                 CAST(floor(1000000 * (CAST(dot AS DOUBLE)
                      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))))
                      + 0.5) AS BIGINT) AS cosine_e6
          FROM dot JOIN norm na ON na.doc_id = dot.id_a
                   JOIN norm nb ON nb.doc_id = dot.id_b
          WHERE dot >= 0 AND 25 * dot * dot >= 16 * na.n2 * nb.n2
          ORDER BY id_a, id_b""") { (s, dir) =>
      TextAnalysis.tfIdfCosinePairs(t(s, dir, "documents"),
          "doc_id", "text", "source", num = 4, den = 5)
        .orderBy("id_a", "id_b")
    },

    // Hapax-legomena ratio per source: the share of vocabulary types
    // occurring exactly once — the classic corpus-freshness /
    // boilerplate-contamination signal (a heavily templated source has
    // few hapaxes; a diverse one approaches Zipf's ~50%). Same
    // tokenizer contract as the rest of the text battery.
    // Scale shape: one (source, term) hash agg with map-side partials,
    // then one source-sized agg — no window, no join.
    "q296_hapax_ratio" -> q(
      s"""WITH tok AS (SELECT source, unnest($toksLowerSql) AS term
                       FROM documents),
             tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
                    FROM tok GROUP BY 1, 2),
             agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
                            CAST(count(*) FILTER (WHERE c = 1) AS BIGINT)
                              AS n_hapax
                     FROM tc GROUP BY 1)
          SELECT source, n_types, n_hapax,
                 CAST(n_hapax * 1000000 // n_types AS BIGINT) AS hapax_e6
          FROM agg ORDER BY source""") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("source"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_types"), col("n_hapax"),
          expr("n_hapax * 1000000L DIV n_types").as("hapax_e6"))
        .orderBy("source")
    },

    // Persisted MinHash-LSH index, probed by a daily batch (every 10th
    // doc twinned at id+1e6), registered as its VERDICT: the stored
    // index's probe result must equal the full from-scratch LSH
    // recomputation restricted to batch×corpus pairs (stored signatures
    // == fresh signatures by construction — this pins it), and every
    // identical-text twin MUST be found (identical shingles => identical
    // signature => collision in every band). n_probe_docs is
    // DuckDB-recomputed.
    "q323_minhash_index_probe" -> q(
      """SELECT CAST(count(*) AS BIGINT) AS n_probe_docs,
                CAST(0 AS BIGINT) AS n_index_fresh_mismatches,
                TRUE AS all_twins_found
         FROM documents WHERE doc_id % 10 = 0""")(tempScoped { (s, dir) =>
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = corpus.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val idx = scratchDir("graft_q323_idx")
      Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
      val probe = Dedup.probeMinhashIndex(s, idx, batch, "doc_id", "text")
      val fresh = Dedup.minhashLshPairs(corpus.unionByName(batch),
          "doc_id", "text", n = 3)
        .filter(col("id_a") < 1000000L && col("id_b") >= 1000000L)
        .select(col("id_b").as("id_new"), col("id_a").as("id_corpus"),
          col("common"), col("n_b").as("n_new"), col("n_a").as("n_corpus"))
      val mism = probe.withColumn("__p", lit(1))
        .join(fresh.withColumn("__f", lit(1)),
          Seq("id_new", "id_corpus", "common", "n_new", "n_corpus"),
          "full_outer")
        .agg(sum(when(col("__p").isNull || col("__f").isNull, 1L)
          .otherwise(0L)).as("n_index_fresh_mismatches"))
      val missingTwins = batch.select(col("doc_id").as("id_new"))
        .join(probe.filter(col("id_corpus") === col("id_new") - 1000000L),
          Seq("id_new"), "left_anti")
        .agg(count(lit(1)).as("__missing"))
      batch.agg(count(lit(1)).as("n_probe_docs"))
        .crossJoin(mism).crossJoin(missingTwins)
        .select(col("n_probe_docs"), col("n_index_fresh_mismatches"),
          (col("__missing") === 0L).as("all_twins_found"))
    }),

    // Lexicon sentiment scoring (SURVEY §7.4; reference domain is
    // complaint analytics — README.md:5-7): integer AFINN-style
    // valences summed per document via an in-row map-literal probe
    // (zero shuffle). The oracle replays the same lexicon as an inline
    // VALUES relation through the relational explode→join→sum form —
    // green means the map-probe projection and the join agree on every
    // document, counts, sums, and labels.
    "q321_sentiment_lexicon" -> q({
      val lexValues = sentimentLexValues
      s"""WITH lex(term, w) AS (VALUES $lexValues),
            tk AS (SELECT doc_id, unnest($toksLowerSql) AS term FROM documents),
            sc AS (SELECT tk.doc_id,
                          CAST(count(lex.w) AS BIGINT) AS n_scored_tokens,
                          CAST(coalesce(sum(lex.w), 0) AS BIGINT) AS sentiment_score
                   FROM tk LEFT JOIN lex ON tk.term = lex.term
                   GROUP BY tk.doc_id)
          SELECT doc_id, n_scored_tokens, sentiment_score,
                 CASE WHEN sentiment_score > 0 THEN 'positive'
                      WHEN sentiment_score < 0 THEN 'negative'
                      ELSE 'neutral' END AS sentiment_label
          FROM sc ORDER BY doc_id"""
    }) { (s, dir) =>
      TextAnalysis.sentimentScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Negation-aware sentiment (the standard unigram-negation rule: a
    // valence flips when immediately preceded by a negation cue).
    // Negations are PLANTED deterministically (the synthetic vocabulary
    // has none): every 5th doc opens "not fast ..." (flips +1 to -1),
    // every 7th-plus-3 "never slow ..." (flips -1 to +1) — so the rule
    // has real sign flips to bite on. The Spark side is the zipped
    // shifted-array projection (zero shuffle); the oracle replays the
    // rule relationally with generate_subscripts ordinality and a lag
    // via list indexing.
    "q324_sentiment_negation" -> q({
      val negList = TextAnalysis.Negators.map(n => s"'$n'").mkString(", ")
      s"""WITH lex(term, w) AS (VALUES $sentimentLexValues),
            planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN 'not fast ' || text
                          WHEN doc_id % 7 = 3 THEN 'never slow ' || text
                          ELSE text END AS text
              FROM documents),
            tok AS (SELECT doc_id, $toksLowerSql AS toks FROM planted),
            tk AS (SELECT doc_id, unnest(toks) AS term,
                          generate_subscripts(toks, 1) AS i, toks
                   FROM tok),
            tk2 AS (SELECT doc_id, term,
                           CASE WHEN i = 1 THEN '' ELSE toks[i - 1] END AS prev
                    FROM tk),
            sc AS (SELECT tk2.doc_id,
                          CAST(count(l.w) AS BIGINT) AS n_scored_tokens,
                          CAST(coalesce(sum(CASE WHEN tk2.prev IN ($negList)
                                                 THEN -l.w ELSE l.w END), 0)
                               AS BIGINT) AS sentiment_score
                   FROM tk2 LEFT JOIN lex l ON tk2.term = l.term
                   GROUP BY tk2.doc_id)
          SELECT doc_id, n_scored_tokens, sentiment_score,
                 CASE WHEN sentiment_score > 0 THEN 'positive'
                      WHEN sentiment_score < 0 THEN 'negative'
                      ELSE 'neutral' END AS sentiment_label
          FROM sc ORDER BY doc_id"""
    }) { (s, dir) =>
      val planted = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(lit("not fast "), col("text")))
          .when(col("doc_id") % 7 === 3, concat(lit("never slow "), col("text")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.sentimentScore(planted, "doc_id", "text",
          negators = TextAnalysis.Negators)
        .orderBy("doc_id")
    },

    // MinHash-index health report (Dedup.minhashIndexHealth) — the
    // operational monitor for the text index family (q327's sibling;
    // here there is no trained geometry to drift, so health is purely
    // delta accumulation): corpus-built index + one ledgered daily
    // batch (every 10th doc twinned) must report exact base/delta doc
    // counts and the integer delta percentage, with needs_compaction
    // still FALSE at ~9% delta (threshold 20%). The file-count /
    // fragmentation fields are environment-shaped (input-split
    // dependent) and stay spec-pinned, not oracled.
    "q329_minhash_index_health" -> q(
      """SELECT CAST(count(*) AS BIGINT) AS n_base_docs,
                CAST(count(*) FILTER (WHERE doc_id % 10 = 0) AS BIGINT)
                  AS n_delta_docs,
                CAST(count(*) FILTER (WHERE doc_id % 10 = 0) * 100
                  // (count(*) + count(*) FILTER (WHERE doc_id % 10 = 0))
                  AS BIGINT) AS delta_pct,
                FALSE AS needs_compaction
         FROM documents""")(tempScoped { (s, dir) =>
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val day1 = corpus.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val idx = scratchDir("graft_q329_idx")
      Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
      Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx,
        batchId = "q329-d1")
      Dedup.minhashIndexHealth(s, idx)
        .select(col("n_base_docs"), col("n_delta_docs"), col("delta_pct"),
          col("needs_compaction"))
    }),

    // MinHash-index ONLINE compaction + vacuum (Dedup.compactMinhashIndex
    // / vacuumMinhashIndex) — q328's text-family sibling, registered as
    // the VERDICT of the round-10 atomicity contract: probe rows
    // collected BEFORE the rewrite equal the rows after it (bit-equal
    // merge), a CRASHED previous attempt (next-version data written,
    // fold manifest never committed — simulated in-query) is invisible
    // to probes, the quiesced vacuum that follows changes nothing a
    // reader sees, and a very late replay of a folded-and-vacuumed
    // batch id is still a no-op (the ledger outlives both maintenance
    // passes). n_docs_indexed is DuckDB-recomputed; file counts are
    // environment-shaped and stay spec-pinned (IndexLifecycleSpec).
    "q332_minhash_compaction" -> q(
      """SELECT CAST(count(*) FILTER (WHERE doc_id % 4 IN (1, 2))
                  AS BIGINT) AS n_docs_indexed,
                TRUE AS crashed_attempt_invisible,
                TRUE AS probe_bit_equal,
                TRUE AS vacuum_preserves_relation,
                TRUE AS late_replay_noop
         FROM documents""")(tempScoped { (s, dir) =>
      import graft.analytics.IndexStore
      val all = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = all.filter(col("doc_id") % 4 === 1)
      val day1 = all.filter(col("doc_id") % 4 === 2)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val probe = all.filter(col("doc_id") % 4 === 2)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val idx = scratchDir("graft_q332_idx")
      Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
      Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx,
        batchId = "q332-d1")
      def probeRows(): Set[(Long, Long, Long, Long, Long)] =
        Dedup.probeMinhashIndex(s, idx, probe, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
      // MATERIALIZED before any rewrite (a lazy plan would re-resolve)
      val before = probeRows()
      // crashed previous attempt: v=1 data exists, fold manifest never
      // committed -> the incomplete version must be invisible
      Seq("shingles", "bands").foreach { c =>
        Dedup.storedMinhashComponent(s, idx, c)
          .write.mode("overwrite").parquet(IndexStore.versionDir(idx, c, 1))
      }
      val crashedInvisible = probeRows() == before
      Dedup.compactMinhashIndex(s, idx)
      val bitEqual = probeRows() == before
      Dedup.vacuumMinhashIndex(s, idx)
      val vacuumOk = probeRows() == before
      // the ledger outlived compaction AND vacuum: replaying the folded,
      // vacuumed batch appends nothing
      val n1 = Dedup.storedMinhashComponent(s, idx, "shingles").count()
      Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx,
        batchId = "q332-d1")
      val replayNoop =
        Dedup.storedMinhashComponent(s, idx, "shingles").count() == n1 &&
          probeRows() == before
      all.filter(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2)
        .agg(count(lit(1)).as("n_docs_indexed"))
        .select(col("n_docs_indexed"),
          lit(crashedInvisible).as("crashed_attempt_invisible"),
          lit(bitEqual).as("probe_bit_equal"),
          lit(vacuumOk).as("vacuum_preserves_relation"),
          lit(replayNoop).as("late_replay_noop"))
    }),

    // MinHash-index PARAMETER REBUILD (Dedup.rebuildMinhashIndex) —
    // q331's text-family sibling, registered as its VERDICT. The
    // operating point drifts in place: planted partial-overlap twins
    // (each keeps 70% of a corpus doc's tokens — ~0.5 shingle Jaccard,
    // well above the 1/5 verify threshold) are INVISIBLE to the stale
    // wide banding (2 bands × 16 rows: band-collision ~ J^16 ≈ 4e-5
    // per pair — measured ZERO planted hits at sf0.001/0.01/0.1),
    // and the rebuild to 32 single-row bands (candidate recall
    // 1-(1-J)^32 ≈ 1) finds EVERY planted pair (measured 100% at all
    // three scales; the driver-seeded data is fixed, so both are
    // stable facts). The drift SIGNAL is part of the verdict: sampled
    // ground-truth band recall (Dedup.minhashBandRecall) fires LOW on
    // the stale banding and clears after the rebuild — the full
    // monitor->rebuild->recover loop, mirroring q331. The rebuild
    // re-shingles the indexed population under the new params,
    // installs both components atomically as the next versions, flips
    // the self-describing meta (params_flipped is read back from the
    // index), and ledgers the rebuild id (replay no-op: versions and
    // probe results unchanged). Probe is rerun-identical. n_planted is
    // DuckDB-recomputed.
    "q333_minhash_rebuild" -> q(
      """SELECT CAST(count(*) FILTER (WHERE doc_id % 4 = 1
                  AND doc_id % 5 = 0
                  AND len(string_split(text, ' ')) >= 30) AS BIGINT)
                  AS n_planted,
                TRUE AS stale_misses_planted,
                TRUE AS band_recall_low_before,
                TRUE AS rebuilt_finds_all_planted,
                TRUE AS band_recall_ok_after,
                TRUE AS probe_rerun_identical,
                TRUE AS params_flipped,
                TRUE AS rebuild_replay_noop
         FROM documents""")(tempScoped { (s, dir) =>
      import graft.analytics.IndexStore
      val all = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = all.filter(col("doc_id") % 4 === 1)
      val planted = corpus.filter(col("doc_id") % 5 === 0 &&
        size(split(col("text"), " ")) >= 30)
      // each twin keeps the first 70% of its original's tokens plus a
      // junk tail absent from the corpus: shared-prefix shingles give
      // ~0.5 Jaccard against exactly one corpus doc
      val twins = planted.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(
          concat_ws(" ", slice(split(col("text"), " "), lit(1),
            size(split(col("text"), " ")) * 7 / 10)),
          lit(" zqa zqb zqc zqd zqe zqf zqg zqh")).as("text"))
      val idx = scratchDir("graft_q333_idx")
      Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx,
        n = 3, numHashes = 32, bands = 2)
      def probeSet(): Set[(Long, Long)] =
        Dedup.probeMinhashIndex(s, idx, twins, "doc_id", "text")
          .select("id_new", "id_corpus").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      // planted-pair key set (driver-bounded: ~5% of the corpus)
      val plantedPairs = planted.select(col("doc_id")).collect()
        .map(r => (r.getLong(0) + 1000000L, r.getLong(0))).toSet
      val staleFound = probeSet().intersect(plantedPairs)
      // the drift SIGNAL (minhashBandRecall — sampled ground-truth
      // candidate recall under the stored banding): fires LOW on the
      // stale wide banding, clears after the rebuild — the trigger
      // loop q331 has for the ANN family, closed for the text family
      def bandRecall(): Long =
        Dedup.minhashBandRecall(s, idx, planted.unionByName(twins),
          "doc_id", "text")
          .select("band_recall_pct").head().getLong(0)
      val recallBefore = bandRecall()
      Dedup.rebuildMinhashIndex(s, idx, corpus, "doc_id", "text",
        rebuildId = "q333-r1", n = 3, numHashes = 32, bands = 32)
      val recallAfter = bandRecall()
      val rebuilt = probeSet()
      val rerunIdentical = probeSet() == rebuilt
      val paramsFlipped =
        Dedup.minhashIndexParams(s, idx) == ((3, 32, 32))
      val vS = IndexStore.pinOf(s, idx, "shingles").v
      Dedup.rebuildMinhashIndex(s, idx, corpus, "doc_id", "text",
        rebuildId = "q333-r1", n = 3, numHashes = 32, bands = 2)
      val replayNoop = IndexStore.pinOf(s, idx, "shingles").v == vS &&
        probeSet() == rebuilt
      all.filter(col("doc_id") % 4 === 1 && col("doc_id") % 5 === 0 &&
          size(split(col("text"), " ")) >= 30)
        .agg(count(lit(1)).as("n_planted"))
        .select(col("n_planted"),
          lit(staleFound.isEmpty).as("stale_misses_planted"),
          lit(recallBefore < 80L).as("band_recall_low_before"),
          lit(plantedPairs.subsetOf(rebuilt)).as("rebuilt_finds_all_planted"),
          lit(recallAfter >= 80L).as("band_recall_ok_after"),
          lit(rerunIdentical).as("probe_rerun_identical"),
          lit(paramsFlipped).as("params_flipped"),
          lit(replayNoop).as("rebuild_replay_noop"))
    }),

    // DISASTER DRILL — the composed lifecycle verdict: every seam the
    // q322-q333 rows pin individually, walked in sequence on ONE index
    // (the q78-style end-to-end composition applied to the index
    // lifecycle). One MinHash index goes through offline build → daily
    // ledgered append → checkpointed streaming micro-batches → a
    // CRASH-SIMULATED half-written version → a parameter REBUILD
    // installed between micro-batches of the live checkpoint (the
    // stream self-heals: its next micro-batch re-reads params; health
    // must count ZERO foreign-params rows afterwards) → online
    // compaction (bit-equal probe) → quiesced vacuum (relation
    // unchanged) → a full REPLAY volley (daily append, rebuild id, the
    // drained stream — all exactly-once no-ops) → a fresh-checkpoint
    // restart attempt, which must fail with the named error instead of
    // silently skipping aliased micro-batches. Visibility is asserted
    // at every seam via the same probe batch (identical-text twins of
    // the day-1 docs must be found at every stage), and after the
    // post-rebuild stream run EVERY ingested doc must be visible
    // exactly once. n_corpus_docs is DuckDB-recomputed; the booleans
    // are the drill's seam invariants.
    "q334_minhash_disaster_drill" -> q(
      """SELECT CAST(count(*) FILTER (WHERE doc_id % 4 = 1) AS BIGINT)
                  AS n_corpus_docs,
                TRUE AS append_visible,
                TRUE AS crashed_attempt_invisible,
                TRUE AS stream_self_heals,
                TRUE AS all_ingested_exactly_once,
                TRUE AS compact_bit_equal,
                TRUE AS vacuum_preserves_relation,
                TRUE AS replays_all_noop,
                TRUE AS fresh_checkpoint_fails_loud
         FROM documents""")(tempScoped { (s, dir) =>
      import graft.analytics.IndexStore
      import graft.streaming.IncrementalStream
      val all = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = all.filter(col("doc_id") % 4 === 1)
      val day1 = all.filter(col("doc_id") % 4 === 2)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val wave1 = all.filter(col("doc_id") % 4 === 3)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val wave2 = all.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
      // probe twins of a day-1 slice: identical text => found at every
      // seam (expected corpus partner: id_new - 4000000)
      val probe = all.filter(col("doc_id") % 4 === 2 && col("doc_id") % 3 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      val idx = scratchDir("graft_q334_idx")
      def probeSet(): Set[(Long, Long)] =
        Dedup.probeMinhashIndex(s, idx, probe, "doc_id", "text")
          .select("id_new", "id_corpus").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      def nStored(): Long =
        Dedup.storedMinhashComponent(s, idx, "shingles").count()
      // seam 1: offline build + one ledgered daily append
      Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
      Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx,
        batchId = "q334-d1")
      // seam 2: streaming micro-batches (2 files, one checkpoint)
      val src = scratchDir("graft_q334_src")
      val ckpt = scratchDir("graft_q334_ckpt")
      wave1.repartition(2).write.mode("overwrite").parquet(src)
      def runStream(): Unit = IncrementalStream.minhashMaintenanceStream(
        s.readStream.schema(wave1.schema)
          .option("maxFilesPerTrigger", "1").parquet(src),
        "doc_id", "text", idx, ckpt).awaitTermination()
      runStream()
      val afterStream1 = probeSet()
      val twinPairs = probe.select(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(0) - 4000000L)).toSet
      val appendVisible = twinPairs.subsetOf(afterStream1)
      // seam 3: crash-sim — a maintenance pass died after writing the
      // next version's DATA, before committing its fold manifests
      Seq("shingles", "bands").foreach { c =>
        Dedup.storedMinhashComponent(s, idx, c).write.mode("overwrite")
          .parquet(IndexStore.versionDir(idx, c,
            IndexStore.pinOf(s, idx, c).v + 1))
      }
      val crashedInvisible = probeSet() == afterStream1
      // seam 4: parameter rebuild installed between micro-batches of
      // the LIVE checkpoint (drops the crashed attempt, re-bands the
      // whole indexed population, flips the meta); the stream's next
      // run on the SAME checkpoint re-reads params and self-heals
      val indexedCorpus = corpus.unionByName(day1).unionByName(wave1)
      Dedup.rebuildMinhashIndex(s, idx, indexedCorpus, "doc_id", "text",
        rebuildId = "q334-r1", n = 3, numHashes = 32, bands = 16)
      wave2.coalesce(1).write.mode("append").parquet(src)
      runStream()
      val foreign = Dedup.minhashIndexHealth(s, idx)
        .select("n_foreign_params_rows").head().getLong(0)
      val afterStream2 = probeSet()
      val streamHealed = foreign == 0L && twinPairs.subsetOf(afterStream2)
      val expectedDocs = corpus.count() + day1.count() +
        wave1.count() + wave2.count()
      val sh = Dedup.storedMinhashComponent(s, idx, "shingles")
      val exactlyOnce = nStored() == expectedDocs &&
        sh.groupBy("id").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).count() == 0
      // seam 5: online compaction — bit-equal probe
      Dedup.compactMinhashIndex(s, idx)
      val compactOk = probeSet() == afterStream2
      // seam 6: quiesced vacuum — relation unchanged
      Dedup.vacuumMinhashIndex(s, idx)
      val vacuumOk = probeSet() == afterStream2
      // seam 7: the replay volley — daily append id, rebuild id and the
      // drained stream are all exactly-once no-ops (ledger + checkpoint
      // outlive compaction AND vacuum)
      Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx,
        batchId = "q334-d1")
      Dedup.rebuildMinhashIndex(s, idx, indexedCorpus, "doc_id", "text",
        rebuildId = "q334-r1", n = 3, numHashes = 32, bands = 16)
      runStream()
      val replaysNoop = nStored() == expectedDocs && probeSet() == afterStream2
      // seam 8: a fresh-checkpoint restart against the stream-maintained
      // index must fail LOUD (silently starting would re-ingest the
      // whole source under aliased micro-batch ids)
      val freshFails =
        try {
          IncrementalStream.minhashMaintenanceStream(
            s.readStream.schema(wave1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src),
            "doc_id", "text", idx, scratchDir("graft_q334_ckpt2"))
          false
        } catch { case e: Throwable =>
          Option(e.getMessage).exists(_.contains("fresh checkpoint")) }
      all.filter(col("doc_id") % 4 === 1)
        .agg(count(lit(1)).as("n_corpus_docs"))
        .select(col("n_corpus_docs"),
          lit(appendVisible).as("append_visible"),
          lit(crashedInvisible).as("crashed_attempt_invisible"),
          lit(streamHealed).as("stream_self_heals"),
          lit(exactlyOnce).as("all_ingested_exactly_once"),
          lit(compactOk).as("compact_bit_equal"),
          lit(vacuumOk).as("vacuum_preserves_relation"),
          lit(replaysNoop).as("replays_all_noop"),
          lit(freshFails).as("fresh_checkpoint_fails_loud"))
    })
  )

  private def sentimentLexValues: String =
    TextAnalysis.SentimentLexicon.toSeq.sorted
      .map { case (t, w) => s"('$t', $w)" }.mkString(", ")

  /** SERVING-ONLY faces of the text-dedup verdict rungs (see
    * EmbeddingQueries.servingDefs for the contract): the LSH / SimHash
    * operator alone, without the exact pair set the registered verdict
    * recomputes in-query. Timed by Bench into the "serving" section;
    * never oracled. */
  val servingDefs: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "q33_dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, num = 1, den = 5)
    }),
    "q34_dedup_simhash" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val docs = base.unionByName(base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
    }),
    // the daily probe against a PRE-BUILT index (memoized, like the PQ
    // index: the offline build is priced once, serving is what recurs)
    "q323_minhash_index_probe" -> ((s, dir) => {
      val batch = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.probeMinhashIndex(s, minhashIdx(s, dir), batch, "doc_id", "text")
    }))

  /** Memoized whole-corpus MinHash index per scale-factor dir (the
    * q75/q81 memo pattern): build is an explicit offline action in
    * real deployments — the probe serving face above reads it without
    * rebuilding per trial. */
  private val mhIdxMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def minhashIdx(s: org.apache.spark.sql.SparkSession,
                         dir: String): String =
    mhIdxMemo.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-mh-idx").toString
      Dedup.writeMinhashIndex(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", p, n = 3)
      p
    })

  /** The q28 detection as a reusable DuckDB subquery: (doc_id, lang,
    * lang_detected) — gold label next to the heuristic argmax. */
  private def langDetectSql: String = {
    val hits = TextAnalysis.Stopwords.map { case (lang, lex) =>
      s"len(list_filter($toksLowerSql, x -> list_contains(${lexList(lex)}, x))) AS h_$lang"
    }.mkString(", ")
    val langs = TextAnalysis.Stopwords.map(_._1)
    val cases = langs.zipWithIndex.map { case (lang, i) =>
      val others = langs.zipWithIndex.collect { case (o, j) if j != i => s"h_$lang >= h_$o" }
      s"WHEN h_$lang > 0 AND ${others.mkString(" AND ")} THEN '$lang'"
    }.mkString(" ")
    s"""SELECT doc_id, lang, CASE $cases ELSE 'und' END AS lang_detected
        FROM (SELECT doc_id, lang, $hits FROM documents)"""
  }
}
