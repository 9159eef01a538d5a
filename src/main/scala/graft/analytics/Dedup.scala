package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (SURVEY §7.4):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: nothing here is O(n²) on the full corpus. Candidate
  * generation always goes through an inverted index or LSH banding — an
  * explode + hash-shuffle + bucket self-join, which is the standard
  * linear-ish shape (MMDS ch.3, the public MinHash/LSH construction).
  * Only bucket-mates are pairwise-compared; bucket width is tunable via
  * (numHashes, bands). All hashing uses Spark's codegen'd xxhash64/hash.
  */
object Dedup {

  /** Exact dedup by content fingerprint: keep the lowest id per distinct
    * normalized text. One hash aggregate on the fingerprint. */
  def exactByFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Candidate pairs sharing >= 1 shingle, with exact shingle-overlap
    * counts, via inverted index (explode -> self-join on shingle ->
    * count). Returns (id_a, id_b, common, n_a, n_b) with id_a < id_b.
    *
    * The shingle join is skew-prone (a very common shingle fans out); for
    * corpus-scale runs, `maxDocFreq` drops shingles appearing in more
    * than that many docs — the standard stopword-shingle cut that bounds
    * the worst bucket. */
  def shingleOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 2, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n).as("shingles"))
    val inv = sh.select(col("id"), explode(col("shingles")).as("shingle"))
    val filtered =
      if (maxDocFreq == Long.MaxValue) inv
      else {
        val freq = inv.groupBy("shingle").agg(count(lit(1)).as("df_"))
          .filter(col("df_") <= maxDocFreq).drop("df_")
        inv.join(freq, Seq("shingle"))
      }
    val sizes = sh.select(col("id"), size(col("shingles")).cast("long").as("n_sh"))
    val pairs = filtered.as("x")
      .join(filtered.as("y"), col("x.shingle") === col("y.shingle")
        && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .select("id_a", "id_b", "common", "n_a", "n_b")
  }

  /** N-gram Jaccard near-dup pairs: Jaccard(A,B) = common / (nA+nB-common)
    * >= threshold, evaluated as an exact integer inequality
    * (common * den >= num * (nA+nB-common)) — no float boundary issues.
    * threshold = num/den. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2, num: Long = 1, den: Long = 5): DataFrame =
    shingleOverlapPairs(df, idCol, textCol, n)
      .filter(col("common") * den >= (col("n_a") + col("n_b") - col("common")) * num)

  /** MinHash signature: k hash functions, each the min over the doc's
    * shingles of xxhash64(seed=i, shingle). Pure column algebra —
    * higher-order functions, fully codegen'd, no UDF. */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shinglesCol, sh => xxhash64(i, sh))))

  /** MinHash+LSH near-dup candidate pairs (MMDS banding): signature of
    * `numHashes` minhashes split into `bands` bands of rows each; docs
    * colliding on any band's hash become candidates; candidates are then
    * verified with exact shingle Jaccard >= num/den.
    *
    * Shuffle profile: explode(bands) -> groupBy(band, bandHash) bucket
    * join -> pair aggregate. Bucket sizes are controlled by band width
    * (rows = numHashes/bands): more rows per band = fewer, more-similar
    * candidates. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 2, numHashes: Int = 32, bands: Int = 8,
                      num: Long = 1, den: Long = 5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sh = df.select(col(idCol).as("id"),
      TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n).as("shingles"))
    val sig = sh.withColumn("sig", minhashSignature(col("shingles"), numHashes))
    val banded = sig.select(col("id"), col("shingles"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))): _*))
        .as("bucket"))
      .select(col("id"), col("shingles"), col("bucket.band"), col("bucket.bh"))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.shingles").as("sh_a"), col("y.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("n_a", size(col("sh_a")).cast("long"))
      .withColumn("n_b", size(col("sh_b")).cast("long"))
      .filter(col("common") * den >= (col("n_a") + col("n_b") - col("common")) * num)
      .select("id_a", "id_b", "common", "n_a", "n_b")
  }

  /** 64-bit SimHash: per token-hash, each bit contributes +1/-1 weighted
    * by presence; the sign of each accumulated bit forms the fingerprint.
    * Built from higher-order functions (fold over tokens of a 64-wide
    * +-1 vector), fully codegen'd. */
  def simhash(tokensCol: Column): Column = {
    val bitVotes = aggregate(
      tokensCol,
      array_repeat(lit(0L), 64),
      (acc, tk) => {
        val h = xxhash64(tk)
        val votes = array((0 until 64).map(j =>
          when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)): _*)
        zip_with(acc, votes, (a, v) => a + v)
      })
    (0 until 64).map(j =>
      when(element_at(bitVotes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs: candidates collide on any of 4 16-bit bands
    * (guarantees recall for Hamming distance <= 3), verified by exact
    * Hamming distance <= maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"),
      simhash(TextAnalysis.tokens(lower(col(textCol)))).as("sim"))
    val banded = withSim.select(col("id"), col("sim"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL).as("bh"))): _*))
        .as("bucket"))
      .select(col("id"), col("sim"), col("bucket.band"), col("bucket.bh"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.sim").as("sim_a"), col("y.sim").as("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
