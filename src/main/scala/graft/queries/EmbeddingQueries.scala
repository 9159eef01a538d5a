package graft.queries

import org.apache.spark.sql.functions._
import graft.analytics.Similarity

/** Embedding similarity search over `embeddings` (SURVEY §7.4).
  *
  * Oracle strategy: quantize floats to integer micro-units on BOTH
  * engines, so dot products / squared norms are exact integers and the
  * cosine is one deterministic IEEE division — hash-stable across
  * engines (see graft.analytics.Similarity).
  */
object EmbeddingQueries {

  // DuckDB equivalents of Similarity.quantize / qdot.
  private def quantSql(col: String) =
    s"list_transform($col, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
  private def qdotSql(a: String, b: String) =
    s"CAST(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) AS BIGINT)"

  val defs: Map[String, Q] = Map(

    // Brute-force cosine top-k against the vec_id=7 query vector.
    "q37_embed_topk_brute" -> q(
      s"""WITH c AS (SELECT vec_id, ${quantSql("embedding")} AS qv FROM embeddings),
               qy AS (SELECT qv AS q_qv FROM c WHERE vec_id = 7)
          SELECT vec_id AS id,
                 CAST(${qdotSql("qv", "q_qv")} AS DOUBLE)
                   / (sqrt(CAST(${qdotSql("qv", "qv")} AS DOUBLE))
                      * sqrt(CAST(${qdotSql("q_qv", "q_qv")} AS DOUBLE))) AS cosine
          FROM c, qy
          ORDER BY cosine DESC, id LIMIT 20""") { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.topKBruteForce(e, "vec_id", "embedding",
        e.filter(col("vec_id") === 7), k = 20)
        .orderBy(col("cosine").desc, col("id"))
    },

    // LSH-bucketed ANN top-k (hyperplane signs from xxhash64 — engine-
    // specific, rows-only; recall vs brute force asserted in the spec).
    "q38_embed_topk_lsh" -> qNoOracle { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.topKLsh(e, "vec_id", "embedding",
        e.filter(col("vec_id") === 7), k = 20)
        .orderBy(col("cosine").desc, col("id"))
    },

    // IVF-style ANN top-k (deterministic coarse cells, nProbe pruning).
    "q39_embed_topk_ivf" -> qNoOracle { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.topKIvf(e, "vec_id", "embedding",
        e.filter(col("vec_id") === 7), k = 20)
        .orderBy(col("cosine").desc, col("id"))
    },

    // Embedding-cosine near-dup pairs (LSH candidate generation): rows-
    // only (bucketing is hash-seeded); precision asserted in the spec.
    "q40_embed_near_dup" -> qNoOracle { (s, dir) =>
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.95)
        .orderBy("id_a", "id_b")
    },

    // Per-label centroid (element-wise vector sum) squared norm: grouped
    // vector aggregation as 64 integer sum columns — one hash aggregate,
    // exact integer math, oracle-checkable.
    "q41_embed_label_agg" -> q(
      s"""WITH c AS (SELECT label, ${quantSql("embedding")} AS qv FROM embeddings),
               d AS (SELECT label, i, CAST(sum(qv[i]) AS BIGINT) AS s, count(*) AS cnt
                     FROM c, (SELECT unnest(generate_series(1, 64)) AS i) ix
                     GROUP BY label, i)
          SELECT label, CAST(min(cnt) AS BIGINT) AS n,
                 CAST(sum(s * s) AS BIGINT) AS centroid_sq_norm
          FROM d GROUP BY label ORDER BY label""") { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("label"), Similarity.quantize(col("embedding")).as("qv"))
      val sumCols = (1 to 64).map(i => sum(element_at(col("qv"), i)).as(s"s_$i"))
      e.groupBy("label")
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .select(col("label"), col("n"),
          aggregate(array((1 to 64).map(i => col(s"s_$i")): _*),
            lit(0L), (acc, sv) => acc + sv * sv).as("centroid_sq_norm"))
        .orderBy("label")
    }
  )
}
