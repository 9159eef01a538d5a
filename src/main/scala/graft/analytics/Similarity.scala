package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §7.4): brute-force cosine top-k as
  * the exactness baseline, plus LSH-bucketed and IVF-style variants as the
  * scale path.
  *
  * Numeric determinism: embeddings are quantized to integer micro-units
  * (floor(x*1e6+0.5)) before any arithmetic, so dot products and squared
  * norms are exact 64-bit integers in ANY summation order and on ANY
  * engine; the final cosine is a single IEEE division/sqrt of exact
  * integers — bitwise reproducible, and oracle-comparable against DuckDB.
  */
object Similarity {

  /** Quantize a float-array embedding to exact integer micro-units. */
  def quantize(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 1000000d + 0.5d).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity from quantized vectors (deterministic double). */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b).cast("double") /
      (sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double")))

  /** Brute-force top-k by cosine against one query vector: a broadcast
    * 1-row cross join + TakeOrderedAndProject — O(n·d) work, k rows to
    * the driver, no full sort, no shuffle of the corpus. */
  def topKBruteForce(corpus: DataFrame, idCol: String, vecCol: String,
                     query: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
    val qv = query.select(quantize(col(vecCol)).as("q_qv"))
    c.crossJoin(broadcast(qv))
      .select(col("id"), qcosine(col("qv"), col("q_qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits, hyperplane j's
    * component i derived from xxhash64(j, i) — deterministic, seedable,
    * no stored model. Charikar's construction (public). */
  def lshSignature(qvCol: Column, nBits: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(nBits - 1)), j =>
      when(aggregate(
        zip_with(qvCol, sequence(lit(0), lit(dim - 1)),
          // pseudo-random +-1 hyperplane component from (j, i)
          (x, i) => x * when(xxhash64(j, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)),
        lit(0L), (acc, v) => acc + v) >= 0, 1L).otherwise(0L))

  /** LSH-bucketed ANN top-k: candidates share a signature band with the
    * query; exact cosine re-ranks candidates. Recall < 1 by design; at
    * corpus scale the candidate set is a tiny fraction of n. */
  def topKLsh(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, k: Int, nBits: Int = 16, bands: Int = 4,
              dim: Int = 64): DataFrame = {
    val rows = nBits / bands
    def banded(df: DataFrame, idAs: String): DataFrame = {
      val qv = df.withColumn("qv_", quantize(col(vecCol)))
        .withColumn("sig_", lshSignature(col("qv_"), nBits, dim))
      qv.select(col(idCol).as(idAs), col("qv_"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig_"), b * rows + 1, rows)).as("bh"))): _*))
          .as("bucket"))
        .select(col(idAs), col("qv_"), col("bucket.band"), col("bucket.bh"))
    }
    val cBands = banded(corpus, "id")
    val qBands = broadcast(
      banded(query.withColumn(idCol, lit(-1L)), "qid")
        .select(col("band"), col("bh"), col("qv_").as("q_qv")))
    cBands.join(qBands, Seq("band", "bh"))
      .select(col("id"), qcosine(col("qv_"), col("q_qv")).as("cosine"))
      .dropDuplicates("id")
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** IVF-style ANN: deterministic coarse centroids (every (n/nCells)-th
    * vector by id — a deterministic stand-in for k-means on synthetic
    * data), vectors assigned to their nearest centroid, queries probe the
    * `nProbe` nearest cells only. The partition-pruning shape of IVF:
    * at scale, cell assignment is a broadcast join against nCells
    * centroids and the probe reads ~nProbe/nCells of the corpus. */
  def topKIvf(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
    import org.apache.spark.sql.expressions.Window
    val n = c.count()
    val step = math.max(n / nCells, 1L)
    val centroids = c.filter(col("id") % step === 0)
      .withColumn("cell", (col("id") / step).cast("long"))
      .filter(col("cell") < nCells)
      .select(col("cell"), col("qv").as("cv"))
    // assign: nearest centroid per corpus vector (broadcast nCells rows)
    val wAssign = Window.partitionBy("id").orderBy(col("d2").desc, col("cell"))
    val assigned = c.crossJoin(broadcast(centroids))
      .withColumn("d2", qcosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select("id", "qv", "cell")
    // probe: nProbe nearest cells to the query
    val qv = query.select(quantize(col(vecCol)).as("q_qv"))
    val probeCells = centroids.crossJoin(broadcast(qv))
      .select(col("cell"), qcosine(col("cv"), col("q_qv")).as("qc"))
      .orderBy(col("qc").desc, col("cell"))
      .limit(nProbe)
      .select("cell")
    assigned.join(broadcast(probeCells), Seq("cell"))
      .crossJoin(broadcast(qv))
      .select(col("id"), qcosine(col("qv"), col("q_qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** All near-duplicate pairs by cosine >= threshold, LSH-bucketed so the
    * pair space is bucket-local, never O(n²). */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nBits: Int = 16, bands: Int = 4,
                         dim: Int = 64): DataFrame = {
    val rows = nBits / bands
    val qv = corpus.withColumn("qv_", quantize(col(vecCol)))
      .withColumn("sig_", lshSignature(col("qv_"), nBits, dim))
    val banded = qv.select(col(idCol).as("id"), col("qv_"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig_"), b * rows + 1, rows)).as("bh"))): _*))
        .as("bucket"))
      .select(col("id"), col("qv_"), col("bucket.band"), col("bucket.bh"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        qcosine(col("x.qv_"), col("y.qv_")).as("cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= threshold)
  }
}
