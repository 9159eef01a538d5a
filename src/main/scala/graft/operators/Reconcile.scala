package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Cross-table reconciliation — the check that gates a migration or a
  * rewritten pipeline: does the new table carry the same rows as the
  * old one, and where not, HOW do they differ? The reference has no
  * answer beyond re-running COPY and eyeballing counts
  * (snowflake_load.py:168-208); this makes the comparison a distributed
  * operator with a per-key verdict.
  */
object Reconcile {

  /** Per-key diff verdict between two relations sharing a key and a set
    * of compared columns: `match`, `value_drift` (key on both sides,
    * compared columns differ), `only_left`, `only_right`.
    *
    * Scale shape: each side reduces to (key, md5-of-compared-columns)
    * BEFORE the join — the full-outer join ships 2 columns per row, not
    * the table; the verdict is a projection over the join. One shuffle
    * per side on the key (co-partitioned by the join). Values are
    * canonicalized with an unprintable separator and a null sentinel so
    * ("a", null) never collides with ("a,null"). */
  def diffByKey(left: DataFrame, right: DataFrame, key: String,
                compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def rowHash(cols: Seq[String]) =
      md5(concat_ws("\u0001",
        cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val l = left.select(col(key).as("k"), rowHash(compareCols).as("__lh"))
    val r = right.select(col(key).as("k"), rowHash(compareCols).as("__rh"))
    l.join(r, Seq("k"), "full_outer")
      .select(col("k").as(key),
        when(col("__lh").isNull, "only_right")
          .when(col("__rh").isNull, "only_left")
          .when(col("__lh") === col("__rh"), "match")
          .otherwise("value_drift").as("status"))
  }

  /** The reconciliation report: per-status row counts (4 rows). */
  def diffSummary(left: DataFrame, right: DataFrame, key: String,
                  compareCols: Seq[String]): DataFrame =
    diffByKey(left, right, key, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** Fuzzy entity matching: pairs of rows whose names are within
    * `maxDist` Levenshtein edits — the record-linkage primitive for
    * dirty dimension keys (misspelled vendors, re-keyed customers).
    *
    * Blocking makes it scale: candidates must share their first
    * `prefixLen` characters and differ in length by <= maxDist (the
    * semantics ARE "fuzzy pairs within a block", stated honestly, since
    * unblocked all-pairs Levenshtein is quadratic and never runs at
    * 100 TB). The length band turns into an equi-join: one side
    * explodes its length into the band, the join key is
    * (prefix, length) — so a block's volume is bounded by
    * names-per-(prefix, length), never the table. Size `prefixLen` to
    * the corpus: on self-similar names a 1-char prefix leaves
    * near-quadratic blocks (measured 25M candidate pairs vs 3.2M at
    * prefix 8 over 40k part names), while a longer prefix trades recall
    * for volume — a pair edited INSIDE the prefix is never considered.
    * Returns (id_a, id_b, dist), each pair once (id_a < id_b). */
  def fuzzyMatchPairs(df: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int = 2, prefixLen: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    val base = df.select(col(idCol).cast("long").as("id"),
        col(nameCol).as("nm"))
      .withColumn("fc", substring(col("nm"), 1, prefixLen))
      .withColumn("ln", length(col("nm")))
    val probe = base
      .withColumn("lnb", explode(sequence(col("ln") - maxDist, col("ln") + maxDist)))
      .select(col("id").as("id_a"), col("nm").as("nm_a"),
        col("fc"), col("lnb").as("ln"))
    probe
      .join(base.select(col("id").as("id_b"), col("nm").as("nm_b"),
        col("fc"), col("ln")), Seq("fc", "ln"))
      .filter(col("id_a") < col("id_b"))
      // plain levenshtein, NOT the threshold variant: A/B-benched at
      // sf0.1 (3.2M pairs, 5 trials) the banded levenshtein(l, r, k)
      // is ~2x SLOWER here (5.75 vs 2.98 s) — on ~30-char names the
      // full DP is tiny and the band bookkeeping dominates
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Jaro-Winkler record linkage over the same (prefix, length-band)
    * blocking as [[fuzzyMatchPairs]]: candidate pairs share their first
    * `prefixLen` chars and differ in length by <= `lenBand`, scored by
    * the codegen'd [[graft.functions.JaroWinklerE6]] expression and
    * kept when the score reaches `minScoreE6` micro-units.
    *
    * Where Levenshtein linkage counts edits, JW rewards shared
    * prefixes and tolerates transpositions — the conventional scorer
    * for person/vendor name linkage. Same scale contract as
    * fuzzyMatchPairs: the scorer only ever runs inside blocks, and the
    * equi-join on (prefix, banded length) bounds block volume.
    * Returns (id_a, id_b, jw_e6), each pair once (id_a < id_b). */
  def jaroWinklerPairs(df: DataFrame, idCol: String, nameCol: String,
                       minScoreE6: Long, prefixLen: Int = 4,
                       lenBand: Int = 2): DataFrame = {
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(lenBand >= 0, s"lenBand must be >= 0, got $lenBand")
    val base = df.select(col(idCol).cast("long").as("id"),
        col(nameCol).as("nm"))
      .withColumn("fc", substring(col("nm"), 1, prefixLen))
      .withColumn("ln", length(col("nm")))
    val probe = base
      .withColumn("lnb", explode(sequence(col("ln") - lenBand, col("ln") + lenBand)))
      .select(col("id").as("id_a"), col("nm").as("nm_a"),
        col("fc"), col("lnb").as("ln"))
    probe
      .join(base.select(col("id").as("id_b"), col("nm").as("nm_b"),
        col("fc"), col("ln")), Seq("fc", "ln"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw_e6",
        graft.functions.JaroWinklerE6(col("nm_a"), col("nm_b")))
      .filter(col("jw_e6") >= minScoreE6)
      .select("id_a", "id_b", "jw_e6")
  }

  /** Transposition-aware linkage: [[fuzzyMatchPairs]] with FULL
    * Damerau-Levenshtein (graft.functions.DamerauLevenshteinExpr) in
    * place of plain Levenshtein — a swapped character pair costs 1,
    * not 2, so keyboard/OCR transpositions link at tighter thresholds.
    * Same blocking equi-join, same scale contract. All-integer, so no
    * float-parity caveats. Returns (id_a, id_b, dist), id_a < id_b. */
  def damerauMatchPairs(df: DataFrame, idCol: String, nameCol: String,
                        maxDist: Int = 2, prefixLen: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    val base = df.select(col(idCol).cast("long").as("id"),
        col(nameCol).as("nm"))
      .withColumn("fc", substring(col("nm"), 1, prefixLen))
      .withColumn("ln", length(col("nm")))
    val probe = base
      .withColumn("lnb", explode(sequence(col("ln") - maxDist, col("ln") + maxDist)))
      .select(col("id").as("id_a"), col("nm").as("nm_a"),
        col("fc"), col("lnb").as("ln"))
    probe
      .join(base.select(col("id").as("id_b"), col("nm").as("nm_b"),
        col("fc"), col("ln")), Seq("fc", "ln"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        graft.functions.DamerauLevenshteinExpr(col("nm_a"), col("nm_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Sorted-neighborhood record linkage (Hernandez-Stolfo): globally
    * sort by the name key, then score only pairs within `window`
    * positions of each other. The classic complement to blocking —
    * blocking misses pairs that differ inside the block key; sorted
    * neighborhood misses pairs that sort far apart; production linkage
    * runs both and unions.
    *
    * Scale contract: the global rank comes from
    * [[graft.analytics.Curation.exclusivePrefixSum]]'s two-pass
    * distributed scan (range repartition + local window + offset
    * join) — NOT a single-partition `row_number()` window, which is
    * the naive formulation's bottleneck. The neighborhood join is an
    * equi-join on rank (each row exploded into `window` probe ranks),
    * so volume is exactly `window · n` — linear, never quadratic.
    *
    * The sort key is `nm || '|' || lpad(id)` — id-padded so it is
    * UNIQUE (a prefix-sum requirement) and deterministic under
    * duplicate names. NOTE the ordering is the BINARY order of that
    * concatenated string, which differs from (nm, id) tuple order when
    * one name strictly prefixes another; an oracle must sort by the
    * same concatenated key. Returns (id_a, id_b, dist) where id_a is
    * the lower-ranked row, dist <= maxDist. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, nameCol: String,
                              window: Int = 3, maxDist: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val ranked = graft.analytics.Curation.exclusivePrefixSum(
        df.select(col(idCol).cast("long").as("id"), col(nameCol).as("nm"))
          .withColumn("__sk", concat(col("nm"), lit("|"),
            // 20 chars covers every Long's decimal form (incl. the sign):
            // lpad TRUNCATES longer inputs, so a narrower pad would
            // collide ids >= 1e12 and break the uniqueness the prefix
            // sum requires.
            lpad(col("id").cast("string"), 20, "0")))
          .withColumn("__one", lit(1L)),
        "__sk", "__one", "__rk")
      .select(col("id"), col("nm"), (col("__rk") + 1L).as("__rk"))
    val probe = ranked
      .withColumn("__off", explode(sequence(lit(1), lit(window))))
      .select(col("id").as("id_a"), col("nm").as("nm_a"),
        (col("__rk") + col("__off")).as("__rk"))
    probe
      .join(ranked.select(col("id").as("id_b"), col("nm").as("nm_b"),
        col("__rk")), Seq("__rk"))
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Schema drift between two relations: added / removed / retyped
    * columns by lower-cased name. Pure metadata (schemas live on the
    * driver); returns a DataFrame for report composition. Columns with
    * identical types are omitted — an empty result means the schemas
    * agree. */
  def schemaDrift(old: DataFrame, newer: DataFrame): DataFrame = {
    def types(df: DataFrame) =
      df.schema.fields.map(f => f.name.toLowerCase -> f.dataType.simpleString).toMap
    val ot = types(old)
    val nt = types(newer)
    val rows =
      (ot.keySet -- nt.keySet).toSeq.sorted.map(c =>
        Row(c, "removed", ot(c), null)) ++
      (nt.keySet -- ot.keySet).toSeq.sorted.map(c =>
        Row(c, "added", null, nt(c))) ++
      (ot.keySet & nt.keySet).toSeq.sorted.collect {
        case c if ot(c) != nt(c) => Row(c, "retyped", ot(c), nt(c)) }
    val schema = StructType(Seq(
      StructField("column_name", StringType),
      StructField("change", StringType),
      StructField("old_type", StringType, nullable = true),
      StructField("new_type", StringType, nullable = true)))
    val spark = old.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Order-independent table content fingerprint: XOR of 60-bit
    * md5-prefix row hashes, plus the row count. Two tables with equal
    * (n_rows, fingerprint) agree with overwhelming probability — the
    * O(1)-output companion to diffByKey for cheap continuous migration
    * monitoring (diff only when the fingerprint moves).
    *
    * XOR is commutative/associative → partial aggregation map-side, one
    * shuffled row total, any row order. Known caveat (why n_rows rides
    * along): an IDENTICAL duplicate row pair cancels itself out of the
    * XOR. Values should be pre-canonicalized to integers/strings by the
    * caller (doubles print differently across engines). */
  def fingerprint(df: DataFrame, cols: Seq[String], label: String): DataFrame = {
    val rowStr = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    df.select(conv(substring(md5(rowStr.cast("binary")), 1, 15), 16, 10)
        .cast("long").as("__h"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("fingerprint"))
      .select(lit(label).as("table_name"), col("n_rows"), col("fingerprint"))
  }
}
