package graft.queries

import org.apache.spark.sql.functions._
import graft.analytics.{Curation, TextAnalysis}

/** Training-data curation operators over `documents` (SURVEY §7.4
  * extension surface): deterministic corpus splitting, benchmark
  * decontamination, sequence packing. All three are engine-portable by
  * construction (md5 / exact integer arithmetic), so each carries a full
  * DuckDB oracle.
  */
object CurationQueries {

  private val toksSql =
    """string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')"""

  // Same trigram construction q32/q57 use (proven hash-stable vs Spark's
  // hashed-shingle sets on this corpus).
  private val shinglesSql =
    s"""list_distinct(list_transform(
          generate_series(1, greatest(len($toksSql) - 2, 1)),
          i -> array_to_string(list_slice($toksSql, i, i + 2), ' ')))"""

  // 98/1/1 split; cutoffs quantized to 1/65536 exactly as
  // Curation.splitColumn computes them.
  private val splits = Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)
  private val cutHex: Seq[String] =
    splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(f => f"${math.round(f * 65536).min(65536)}%04x")

  // Shared by q65 (broadcast-grade semi-join) and q96 (Bloom-prefilter
  // scale path): both compute the SAME exact contamination counts, so
  // one oracle gates both plan shapes.
  private val decontaminateOracle =
    s"""WITH sh AS (
          SELECT doc_id, $shinglesSql AS shingles FROM documents),
        bench AS (
          SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 10 = 0),
        tr AS (SELECT doc_id, shingles FROM sh WHERE doc_id % 10 <> 0),
        cnt AS (
          SELECT u.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
          FROM (SELECT doc_id, unnest(shingles) AS s FROM tr) u
          JOIN bench USING (s)
          GROUP BY u.doc_id)
        SELECT tr.doc_id AS id,
               CAST(len(tr.shingles) AS BIGINT) AS n_sh,
               coalesce(cnt.n_contaminated, CAST(0 AS BIGINT)) AS n_contaminated,
               CAST(coalesce(cnt.n_contaminated, CAST(0 AS BIGINT)) AS DOUBLE)
                 / CAST(len(tr.shingles) AS DOUBLE) AS contamination_ratio
        FROM tr LEFT JOIN cnt ON tr.doc_id = cnt.doc_id
        ORDER BY id"""

  val defs: Map[String, Q] = Map(

    // Deterministic hash split: md5-position vs hex cutoffs, identical
    // on both engines (lexicographic compare of lowercase hex).
    "q64_hash_split" -> q({
      val Seq(trainCut, valCut) = cutHex
      s"""SELECT doc_id,
                 CASE WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4) < '$trainCut' THEN 'train'
                      WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4) < '$valCut' THEN 'val'
                      ELSE 'test' END AS split
          FROM documents ORDER BY doc_id"""
    }) { (s, dir) =>
      Curation.hashSplit(t(s, dir, "documents").select("doc_id"),
        "doc_id", splits, salt = "v1")
        .orderBy("doc_id")
    },

    // Deterministic domain mixing: per-language keep-rates via the same
    // md5-position trick (5-hex-digit cutoffs so rate 1.0 keeps all).
    "q69_domain_mix" -> q({
      def cut(f: Double): String = f"${math.round(f * 65536).min(65536)}%05x"
      s"""SELECT doc_id, lang
          FROM documents
          WHERE concat('0', substring(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 4))
                < CASE WHEN lang = 'en' THEN '${cut(0.5)}'
                       WHEN lang = 'es' THEN '${cut(0.25)}'
                       WHEN lang = 'fr' THEN '${cut(0.1)}'
                       ELSE '${cut(1.0)}' END
          ORDER BY doc_id"""
    }) { (s, dir) =>
      Curation.sampleByDomain(t(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang",
        rates = Map("en" -> 0.5, "es" -> 0.25, "fr" -> 0.1), salt = "mix1")
        .orderBy("doc_id")
    },

    // Benchmark decontamination: every 10th doc plays the benchmark set;
    // the rest are scored by shared-trigram counts (inverted-index
    // semi-join on the Spark side; string-shingle joins in the oracle).
    "q65_decontaminate" -> q(decontaminateOracle) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Curation.contamination(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 10 === 0), "text", n = 3)
        .orderBy("id")
    },

    // The Bloom-prefilter scale path for q65 — benchmark shingles
    // collapse into a ~MB Bloom filter probed map-side before any
    // explode/shuffle; the exact verify join removes false positives,
    // so it shares q65's EXACT oracle (the same differential gate the
    // approx paths q61/q90 use). The undersized-filter exactness
    // property is specced (CurationSpec); here the filter is sized for
    // the corpus so the bench reflects the intended operating point.
    "q96_decontaminate_bloom" -> q(decontaminateOracle) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Curation.contaminationBloom(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 10 === 0), "text", n = 3)
        .orderBy("id")
    },

    // End-to-end corpus curation (the flagship flow a pipeline deploys):
    // scrub -> quality gates -> exact dedup -> near-dedup components ->
    // split -> pack, each stage individually oracled as q64-q70 and the
    // COMPOSITION oracled here as one DuckDB CTE chain. Planted inputs
    // make every stage non-vacuous on the synthetic corpus: every 7th
    // doc gets a deterministic email+phone (scrub has real matches, as
    // q68), every 50th-plus-1 doc becomes identical boilerplate (exact
    // dedup has real groups); the corpus's own near-dups (q32: 25 pairs)
    // exercise the component stage.
    "q78_curate_corpus" -> q({
      val Seq(trainCut, valCut) = cutHex
      val splitCase =
        s"""CASE WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4) < '$trainCut' THEN 'train'
                 WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4) < '$valCut' THEN 'val'
                 ELSE 'test' END"""
      s"""WITH RECURSIVE
            planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 50 = 1
                          THEN 'duplicate boilerplate page about terms of service and privacy'
                          WHEN doc_id % 7 = 0
                          THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                                    || '@example.com or 555-123-4567'
                          ELSE text END AS text
              FROM documents),
            scrubbed AS (
              SELECT doc_id,
                     regexp_replace(regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
                                    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS text
              FROM planted),
            tok AS (SELECT doc_id, text, $toksSql AS toks FROM scrubbed),
            gated AS (
              SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens
              FROM tok
              WHERE len(toks) >= 5
                AND CAST(length(text) - length(regexp_replace(text, '[#@$$%&]', '', 'g')) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) <= 0.3
                AND CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) >= 0.5),
            fp AS (
              SELECT doc_id, text, n_tokens,
                     md5(regexp_replace(lower(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')),
                                        '\\s+', ' ', 'g')) AS fp
              FROM gated),
            exact AS (
              SELECT doc_id, text, n_tokens FROM (
                SELECT doc_id, text, n_tokens,
                       min(doc_id) OVER (PARTITION BY fp) AS keep
                FROM fp)
              WHERE doc_id = keep),
            sh AS (SELECT doc_id, $shinglesSql AS shingles FROM exact),
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
            near AS (
              SELECT e.doc_id, e.text, e.n_tokens
              FROM exact e LEFT JOIN comp ON e.doc_id = comp.id
              WHERE coalesce(comp.component, e.doc_id) = e.doc_id),
            sp AS (SELECT doc_id, text, n_tokens, $splitCase AS split FROM near)
          SELECT doc_id, text, n_tokens, split,
                 CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                       - n_tokens) // 2048 AS BIGINT) AS bin
          FROM sp ORDER BY doc_id"""
    }) { (s, dir) =>
      val planted = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 50 === 1,
          lit("duplicate boilerplate page about terms of service and privacy"))
          .when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or 555-123-4567")))
          .otherwise(col("text")).as("text"))
      Curation.curateCorpus(planted, "doc_id", "text")
        .orderBy("doc_id")
    },

    // Concat-and-chunk sequence packing at a 2048-token budget: bin =
    // exclusive-prefix-tokens DIV budget, via the distributed two-pass
    // prefix sum (no global single-partition window on the Spark side).
    "q66_pack_sequences" -> q(
      s"""SELECT doc_id,
                 CAST(len($toksSql) AS BIGINT) AS n_tokens,
                 CAST((sum(CAST(len($toksSql) AS BIGINT))
                         OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                       - CAST(len($toksSql) AS BIGINT)) // 2048 AS BIGINT) AS bin
          FROM documents ORDER BY doc_id""") { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Curation.packSequences(docs, "doc_id", "n_tokens", budget = 2048L)
        .select("doc_id", "n_tokens", "bin")
        .orderBy("doc_id")
    },

    // Sliding-window chunking at 32 tokens with stride 24 (sized to the
    // test corpus's short docs so multi-chunk output is non-vacuous):
    // starts are 0, 24, 48, ... while start < n_tokens; consecutive
    // chunks overlap by 8 tokens. Pure generator, no shuffle.
    "q87_chunk_documents" -> q(
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
          s AS (SELECT doc_id, toks,
                       unnest(range(0, greatest(len(toks), 1), 24)) AS start,
                       generate_subscripts(range(0, greatest(len(toks), 1), 24), 1) - 1
                         AS chunk_idx
                FROM tk)
          SELECT doc_id,
                 CAST(chunk_idx AS INTEGER) AS chunk_idx,
                 CAST(start AS BIGINT) AS start_token,
                 CAST(len(toks[start + 1 : start + 32]) AS BIGINT) AS n_tokens,
                 array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
          FROM s ORDER BY doc_id, chunk_idx""") { (s, dir) =>
      Curation.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx")
    },

    // Deterministic stratified head: exactly 20 docs per language by
    // md5-hash order — the eval-set sampler. Tie-break on doc_id makes
    // the rank total on any engine.
    "q88_stratified_head" -> q(
      """SELECT lang, doc_id, CAST(sample_rank AS INTEGER) AS sample_rank
         FROM (SELECT lang, doc_id,
                      row_number() OVER (
                        PARTITION BY lang
                        ORDER BY md5('s1' || CAST(doc_id AS VARCHAR)), doc_id)
                        AS sample_rank
               FROM documents)
         WHERE sample_rank <= 20
         ORDER BY lang, sample_rank""") { (s, dir) =>
      Curation.stratifiedHead(t(s, dir, "documents"), "lang", "doc_id",
        k = 20, salt = "s1")
        .select("lang", "doc_id", "sample_rank")
        .orderBy("lang", "sample_rank")
    },

    // Token-budget sampling (the mixing step "take N tokens of this
    // source"): keep the longest md5-ordered prefix fitting 20k tokens.
    // The oracle recomputes the prefix with a global window; the engine
    // uses the distributed two-pass scan — green means they agree on
    // every kept row AND its running total.
    "q105_token_budget_sample" -> q(
      s"""WITH k AS (SELECT doc_id,
                  md5('v1:' || CAST(doc_id AS VARCHAR)) AS key,
                  CAST(len($toksSql) AS BIGINT) AS n_tokens
           FROM documents),
          p AS (SELECT doc_id, n_tokens,
                  CAST(coalesce(SUM(n_tokens) OVER (ORDER BY key
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS prefix_tokens
                FROM k)
          SELECT doc_id, n_tokens, prefix_tokens FROM p
          WHERE prefix_tokens + n_tokens <= 20000
          ORDER BY doc_id""") { (s, dir) =>
      Curation.sampleToTokenBudget(t(s, dir, "documents"), "doc_id", "text",
        budget = 20000L, salt = "v1")
        .select("doc_id", "n_tokens", "prefix_tokens")
        .orderBy("doc_id")
    },

    // Per-source token budgets (the mixing table): independent salted
    // prefix per language, each cut at its own budget. The oracle's
    // PARTITION BY window is the single-task formulation the engine
    // deliberately avoids (per-group two-pass prefix scan instead) —
    // green proves the distributed form computes the identical sample.
    "q108_token_budget_by_source" -> q(
      s"""WITH k AS (SELECT doc_id, lang,
                  md5('v1:' || CAST(doc_id AS VARCHAR)) AS key,
                  CAST(len($toksSql) AS BIGINT) AS n_tokens
           FROM documents),
          p AS (SELECT doc_id, lang, n_tokens,
                  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY key
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS prefix_tokens
                FROM k)
          SELECT doc_id, lang, n_tokens, prefix_tokens FROM p
          WHERE prefix_tokens + n_tokens <=
                CASE WHEN lang = 'en' THEN 8000
                     WHEN lang = 'es' THEN 4000
                     ELSE 2000 END
          ORDER BY doc_id""") { (s, dir) =>
      Curation.sampleToTokenBudgetBySource(t(s, dir, "documents"),
        "doc_id", "text", "lang",
        budgets = Map("en" -> 8000L, "es" -> 4000L),
        defaultBudget = 2000L, salt = "v1")
        .select("doc_id", "lang", "n_tokens", "prefix_tokens")
        .orderBy("doc_id")
    },

    // Split-leakage audit: hashSplit at 80/10/10, then every held-out
    // doc with a Jaccard>=1/5 near-dup inside the train split. The
    // oracle recomputes split assignment AND the pair search
    // relationally; the engine goes through the df-capped inverted
    // index — green means identical leaked pairs, splits included.
    "q109_split_leakage" -> q({
      def cut(f: Double): String = f"${math.round(f * 65536).min(65536)}%04x"
      s"""WITH sh AS (
            SELECT doc_id, $shinglesSql AS shingles FROM documents),
          sp AS (
            SELECT doc_id,
                   CASE WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4) < '${cut(0.8)}' THEN 'train'
                        WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4) < '${cut(0.9)}' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents),
          ev AS (SELECT sh.doc_id, sp.split, sh.shingles
                 FROM sh JOIN sp USING (doc_id) WHERE sp.split <> 'train'),
          tr AS (SELECT sh.doc_id, sh.shingles
                 FROM sh JOIN sp USING (doc_id) WHERE sp.split = 'train')
          SELECT ev.doc_id AS id_eval, ev.split, tr.doc_id AS id_train,
                 CAST(len(list_intersect(ev.shingles, tr.shingles)) AS BIGINT) AS common,
                 CAST(len(ev.shingles) AS BIGINT) AS n_eval,
                 CAST(len(tr.shingles) AS BIGINT) AS n_train
          FROM ev JOIN tr ON true
          WHERE len(list_intersect(ev.shingles, tr.shingles)) * 5
                >= (len(ev.shingles) + len(tr.shingles) - len(list_intersect(ev.shingles, tr.shingles))) * 1
          ORDER BY id_eval, id_train"""
    }) { (s, dir) =>
      Curation.splitLeakage(t(s, dir, "documents"), "doc_id", "text",
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        trainSplit = "train", salt = "v1", n = 3, num = 1, den = 5,
        maxDocFreq = 1000L)
        .orderBy("id_eval", "id_train")
    },

    // Span-level decontamination: excise every 5-token window of a
    // train doc that appears anywhere in the benchmark split (q65's
    // doc-level decision made surgical). Same bench membership as
    // q65/q96 (doc_id % 10 = 0); the whole rewritten corpus is
    // hash-compared.
    "q119_decontaminate_spans" -> q(
      s"""WITH tk AS (SELECT doc_id, $toksSql AS tk FROM documents),
            tr AS (SELECT doc_id, tk FROM tk WHERE doc_id % 10 <> 0),
            be AS (SELECT tk FROM tk WHERE doc_id % 10 = 0),
            bs AS (SELECT DISTINCT md5(array_to_string(list_slice(tk, i, i + 4), ' ')) AS h
                   FROM (SELECT tk, unnest(generate_series(1, len(tk) - 4)) AS i
                         FROM be WHERE len(tk) >= 5)),
            sph AS (SELECT doc_id, i - 1 AS pos,
                           md5(array_to_string(list_slice(tk, i, i + 4), ' ')) AS h
                    FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i
                          FROM tr WHERE len(tk) >= 5)),
            bad AS (SELECT DISTINCT s.doc_id, s.pos FROM sph s JOIN bs USING (h)),
            tokv AS (SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 1)) AS ti
                     FROM tr),
            keep AS (SELECT v.doc_id, v.ti, v.tk[v.ti + 1] AS tok
                     FROM tokv v
                     WHERE NOT EXISTS (SELECT 1 FROM bad b
                                       WHERE b.doc_id = v.doc_id
                                         AND b.pos <= v.ti AND v.ti < b.pos + 5))
          SELECT tr.doc_id,
                 coalesce(string_agg(k.tok, ' ' ORDER BY k.ti), '') AS text
          FROM tr LEFT JOIN keep k ON tr.doc_id = k.doc_id
          GROUP BY tr.doc_id
          ORDER BY tr.doc_id""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      Curation.removeContaminatedSpans(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 10 === 0), "text", w = 5)
        .orderBy("doc_id")
    },

    // Global token-count deciles via the distributed prefix rank. The
    // oracle's unpartitioned row_number window is the single-task
    // formulation the engine refuses; green proves the two-pass scan
    // assigns the identical bucket to every document, boundary ties
    // included.
    "q120_quality_deciles" -> q(
      s"""WITH s AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS score
                     FROM documents),
            r AS (SELECT doc_id, score,
                         row_number() OVER (ORDER BY score, doc_id) - 1 AS rk,
                         count(*) OVER () AS n
                  FROM s)
          SELECT doc_id, score, CAST((rk * 10) // n AS BIGINT) AS bucket
          FROM r ORDER BY doc_id""") { (s, dir) =>
      val scored = t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("score"))
      Curation.rankBuckets(scored, "doc_id", "score", nBuckets = 10)
        .orderBy("doc_id")
    },

    // DSIR importance weights: every document scored by how much its
    // hashed-unigram distribution looks like the English slice vs the
    // whole pool (Curation.dsirWeights — exact-decimal dot product of
    // per-bucket log-likelihood ratios, so the hash compare holds).
    // Registered output is the e6-scaled BIGINT (the operator's
    // DECIMAL(38,6) has exactly 6 decimals, so *1e6 is lossless): the
    // driver harness canonicalizes integers identically in both
    // engines, while DECIMAL reaches it as Decimal objects from Spark
    // parquet but float64 from DuckDB fetchdf — r5's hash-mismatch.
    "q132_dsir_weights" -> q({
      // md5-hex nibble -> int by ascii arithmetic (engine-portable)
      def nib(h: String, i: Int) =
        s"(ascii(substring($h, $i, 1)) - CASE WHEN ascii(substring($h, $i, 1)) >= 97 THEN 87 ELSE 48 END)"
      def hex4(h: String) =
        s"(${nib(h, 1)} * 4096 + ${nib(h, 2)} * 256 + ${nib(h, 3)} * 16 + ${nib(h, 4)})"
      val toksLower =
        """string_split_regex(regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')"""
      s"""WITH feats AS (
            SELECT doc_id, lang = 'en' AS is_target,
                   ${hex4("substring(md5('v1' || w), 1, 4)")} % 1024 AS b
            FROM (SELECT doc_id, lang, unnest($toksLower) AS w FROM documents)),
          doc_buckets AS (
            SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt
            FROM feats GROUP BY 1, 2),
          bucket_stats AS (
            SELECT b, CAST(count(*) FILTER (WHERE is_target) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS r
            FROM feats GROUP BY 1),
          totals AS (SELECT sum(t) AS tt, sum(r) AS rr FROM bucket_stats),
          llr AS (
            SELECT b, CAST(round(
                ln(CAST(t + 1 AS DOUBLE) / CAST(tt + 1024 AS DOUBLE))
                - ln(CAST(r + 1 AS DOUBLE) / CAST(rr + 1024 AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS llr
            FROM bucket_stats, totals)
          SELECT d.doc_id,
                 CAST(sum(CAST(d.cnt AS DECIMAL(20,0)) * l.llr) * 1000000
                   AS BIGINT) AS dsir_weight_e6
          FROM doc_buckets d JOIN llr l USING (b)
          GROUP BY 1 ORDER BY 1"""
    }) { (s, dir) =>
      Curation.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
          targetPred = col("lang") === "en")
        .select(col("doc_id"),
          expr("CAST(dsir_weight * 1000000 AS BIGINT)").as("dsir_weight_e6"))
        .orderBy("doc_id")
    },

    // Quantile normalization: per-language document lengths mapped onto
    // the pooled length distribution by exact rank arithmetic — the
    // pooled rank from the distributed prefix sum, never a single-task
    // global window (the oracle USES that single-task window, which is
    // exactly the formulation the engine refuses — q120's precedent).
    "q158_quantile_normalize" -> q(
      """WITH p AS (SELECT doc_id, lang, n_chars FROM documents),
            g AS (SELECT doc_id, lang, n_chars,
                         CAST(row_number() OVER (PARTITION BY lang
                           ORDER BY n_chars, doc_id) AS BIGINT) AS r,
                         CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS grp_n,
                         CAST(count(*) OVER () AS BIGINT) AS tot_n FROM p),
            pooled AS (SELECT n_chars AS vq,
                              CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                                AS BIGINT) - 1 AS t
                       FROM p)
         SELECT g.doc_id, g.lang, g.n_chars, pooled.vq AS n_chars_qnorm
         FROM g JOIN pooled ON ((2*g.r - 1) * g.tot_n) // (2*g.grp_n) = pooled.t
         ORDER BY g.doc_id""") { (s, dir) =>
      Curation.quantileNormalize(
          t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "doc_id", "n_chars")
        .orderBy("doc_id")
    },

    // Temperature-balanced language mix at alpha = 0.5 (sqrt is
    // IEEE-exact on both engines, pow is not): tail languages
    // up-weighted toward sqrt-share, ~300 docs kept, md5-cutoff
    // sampling with zero RNG state (Curation.temperatureMix).
    "q153_temperature_mix" -> q({
      def nib(h: String, i: Int) =
        s"(ascii(substring($h, $i, 1)) - CASE WHEN ascii(substring($h, $i, 1)) >= 97 THEN 87 ELSE 48 END)"
      val h = "substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4)"
      val hex4 = (1 to 4).map(i => nib(h, i))
        .foldLeft("CAST(0 AS BIGINT)")((acc, n) => s"($acc * 16 + $n)")
      s"""WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                                 CAST(round(sqrt(CAST(count(*) AS BIGINT)), 6)
                                   AS DECIMAL(18,6)) AS w
                          FROM documents GROUP BY 1),
             tot AS (SELECT sum(w) AS wsum FROM counts),
             rates AS (SELECT lang,
                              least(65536, CAST(floor(CAST(300 * w AS DOUBLE)
                                / CAST(wsum * n AS DOUBLE) * 65536 + 0.5) AS BIGINT))
                                AS cut
                       FROM counts, tot)
          SELECT d.doc_id, d.lang
          FROM documents d JOIN rates r ON d.lang = r.lang
          WHERE $hex4 < r.cut
          ORDER BY d.doc_id"""
    }) { (s, dir) =>
      Curation.temperatureMix(
          t(s, dir, "documents").select("doc_id", "lang"),
          "doc_id", "lang", budgetDocs = 300L)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Deterministic weighted sampling: 50 documents drawn with
    // probability rising in n_chars, via integer hash-priority — no
    // RNG state, reproducible on any engine (Curation
    // .hashWeightedSample; top-k plans as TakeOrderedAndProject).
    "q144_weighted_sample" -> q({
      def nib(h: String, i: Int) =
        s"(ascii(substring($h, $i, 1)) - CASE WHEN ascii(substring($h, $i, 1)) >= 97 THEN 87 ELSE 48 END)"
      val h = "substring(md5('ws1' || CAST(doc_id AS VARCHAR)), 1, 8)"
      val hex8 = (1 to 8).map(i => nib(h, i))
        .foldLeft("CAST(0 AS BIGINT)")((acc, n) => s"($acc * 16 + $n)")
      s"""SELECT doc_id, n_chars,
                 CAST($hex8 AS BIGINT) * 1000000 // n_chars AS priority
          FROM documents WHERE n_chars > 0
          ORDER BY priority, doc_id LIMIT 50"""
    }) { (s, dir) =>
      Curation.hashWeightedSample(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", k = 50, salt = "ws1")
        .withColumnRenamed("__priority", "priority")
    },

    // Largest-remainder apportionment (Curation.apportionBudget): a
    // 1M-token sampling budget split across sources in EXACT integer
    // quotas that sum to the budget precisely — base = N*w DIV W, the
    // leftover (sum rem)/W seats to the largest remainders, group-name
    // tie-break. Pure integers: any engine agrees bit-for-bit.
    "q212_budget_apportion" -> q(
      s"""WITH w AS (SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS weight
                     FROM documents GROUP BY 1),
            t AS (SELECT CAST(sum(weight) AS BIGINT) AS W FROM w),
            b AS (SELECT source, weight,
                         CAST(1000000 * weight // W AS BIGINT) AS base,
                         CAST(1000000 * weight % W AS BIGINT) AS rem, W
                  FROM w, t),
            r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
                         CAST(sum(rem) OVER () // W AS BIGINT) AS leftover
                  FROM b)
         SELECT source, weight, base,
                CASE WHEN rk <= leftover THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS extra,
                base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS quota
         FROM r ORDER BY source""") { (s, dir) =>
      import graft.analytics.TextAnalysis
      val weights = t(s, dir, "documents")
        .groupBy("source")
        .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("toks"))
      Curation.apportionBudget(weights, "source", "toks", budget = 1000000L)
        .orderBy("source")
    },

    // Deterministic stratified sample (Curation.stratifiedHashSample):
    // exactly min(25, |source|) docs per source by md5 rank — no RNG
    // state, reproducible on any engine/cluster/retry; the returned
    // rank lets any smaller per-source budget re-cut without
    // re-ranking. Window partitioned BY SOURCE (never a single-task
    // global window).
    "q227_stratified_sample" -> q(
      """WITH r AS (SELECT doc_id, source,
                           CAST(row_number() OVER (
                             PARTITION BY source
                             ORDER BY md5('rs1' || CAST(doc_id AS VARCHAR)), doc_id)
                             AS BIGINT) AS rank
                    FROM documents)
         SELECT doc_id, source, rank FROM r
         WHERE rank <= 25 ORDER BY source, rank""") { (s, dir) =>
      Curation.stratifiedHashSample(t(s, dir, "documents"), "doc_id",
          "source", k = 25)
        .orderBy("source", "rank")
    },

    // Deterministic k-fold assignment (Curation.kFoldAssign): fold is
    // a pure function of (salt, doc_id) — cross-validation splits that
    // reproduce on any engine/cluster/retry; hex-string boundary
    // compares, the hashSplit convention. Registered as the per-
    // (source, fold) composition report.
    "q262_kfold_assign" -> q({
      val cases = (1 until 5).map(i => f"${65536 * i / 5}%04x").zipWithIndex
        .map { case (b, i) =>
          s"WHEN substring(md5('fold1' || CAST(doc_id AS VARCHAR)), 1, 4) < '$b' THEN $i"
        }.mkString(" ")
      s"""SELECT source, fold, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS chars
          FROM (SELECT source, n_chars,
                       CAST(CASE $cases ELSE 4 END AS BIGINT) AS fold
                FROM documents)
          GROUP BY 1, 2 ORDER BY 1, 2"""
    }) { (s, dir) =>
      Curation.kFoldAssign(t(s, dir, "documents"), "doc_id", k = 5)
        .groupBy("source", "fold")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
        .orderBy("source", "fold")
    },

    // Inverse-frequency class-balance weights
    // (Curation.classBalanceWeights): sklearn's 'balanced' as exact
    // integer e6 — N·1e6 div (k·n_label) over the embeddings labels.
    "q263_class_weights" -> q(
      """WITH c AS (SELECT label, CAST(count(*) AS BIGINT) AS n
                    FROM embeddings WHERE label IS NOT NULL GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                           CAST(count(*) AS BIGINT) AS k FROM c)
         SELECT label, n, (nn * 1000000) // (k * n) AS weight_e6
         FROM c CROSS JOIN tot ORDER BY label""") { (s, dir) =>
      Curation.classBalanceWeights(t(s, dir, "embeddings"), "label")
        .orderBy("label")
    }
  )
}
