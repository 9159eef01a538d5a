package graft.queries

import org.apache.spark.sql.functions._
import graft.operators._

/** Reference-parity operators (SURVEY §2) exercised over the driver test
  * tables. Each entry pairs the Spark implementation (built from the
  * library operators in graft.operators) with a DuckDB oracle.
  *
  * Every query carries a deterministic ORDER BY on both sides so the
  * comparison is stable regardless of row-order sensitivity in the
  * driver's hash.
  */
object ParityQueries {

  val defs: Map[String, Q] = Map(

    // S5 + P7: parquet scan with projection — column pruning must reach
    // the scan (ReadSchema shows only 3 columns).
    "q01_scan_project" -> q(
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Filter pushdown: both predicates reach the parquet scan
    // (PushedFilters in .explain).
    "q02_filter_pushdown" -> q(
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_discount, l_extendedprice
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_discount > 0.05
         ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00"))
          && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_discount", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P1: map-driven rename with pandas semantics (unknown keys ignored)
    // — reference transform.py:91-92, maps at pipeline.py:49-99.
    "q03_clean_rename" -> q(
      """SELECT c_custkey AS customer_id, c_name AS customer_name,
                c_nationkey, c_acctbal, c_mktsegment AS segment
         FROM customer ORDER BY customer_id""") { (s, dir) =>
      Clean.renameColumns(Map(
        "c_custkey" -> "customer_id", "c_name" -> "customer_name",
        "c_mktsegment" -> "segment", "not_a_column" -> "ignored"))(
        t(s, dir, "customer"))
        .orderBy("customer_id")
    },

    // F5: "NULL"/"" literal narrowing — reference snowflake.tf:86.
    "q04_clean_null_literals" -> q(
      """SELECT c_custkey,
                CASE WHEN c_custkey % 10 = 0 THEN NULL
                     WHEN c_custkey % 10 = 1 THEN NULL
                     ELSE c_mktsegment END AS segment
         FROM customer ORDER BY c_custkey""") { (s, dir) =>
      val messy = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit(""))
          .when(col("c_custkey") % 10 === 1, lit("NULL"))
          .otherwise(col("c_mktsegment")).as("segment"))
      Clean.normalizeNullLiterals(messy).orderBy("c_custkey")
    },

    // P4: pandas-parity trim (all whitespace classes, not just spaces)
    // — reference transform.py:104-107.
    "q05_clean_trim" -> q(
      """SELECT c_custkey,
                regexp_replace('  ' || chr(9) || c_name || ' ' || chr(10),
                               '^\s+|\s+$', '', 'g') AS name
         FROM customer ORDER BY c_custkey""") { (s, dir) =>
      val messy = t(s, dir, "customer").select(
        col("c_custkey"),
        concat(lit("  \t"), col("c_name"), lit(" \n")).as("name"))
      Clean.trimStrings(messy).orderBy("c_custkey")
    },

    // P3: exact full-row dedup — reference transform.py:97-102.
    "q06_clean_dedup" -> q(
      """SELECT DISTINCT l_suppkey, l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_suppkey, l_returnflag, l_linestatus""") { (s, dir) =>
      Clean.dedupExact(
        t(s, dir, "lineitem").select("l_suppkey", "l_returnflag", "l_linestatus"))
        .orderBy("l_suppkey", "l_returnflag", "l_linestatus")
    },

    // P2: drop rows where every column is null — reference transform.py:95.
    "q07_clean_drop_all_null" -> q(
      """SELECT a, b FROM (
           SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS a,
                  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS b
           FROM orders)
         WHERE a IS NOT NULL OR b IS NOT NULL
         ORDER BY a, b""") { (s, dir) =>
      val messy = t(s, dir, "orders").select(
        when(col("o_orderkey") % 7 === 0, lit(null: String))
          .otherwise(col("o_orderstatus")).as("a"),
        when(col("o_orderkey") % 7 === 0, lit(null: String))
          .otherwise(col("o_orderpriority")).as("b"))
      Clean.dropAllNullRows(messy).orderBy("a", "b")
    },

    // P1-P5 composed: the full clean pipeline in reference order
    // (rename -> drop-all-null -> dedup -> trim) — transform.py:85-118.
    "q08_clean_pipeline" -> q(
      """SELECT c_custkey AS customer_id,
                regexp_replace('  ' || c_name || chr(9), '^\s+|\s+$', '', 'g') AS name,
                c_mktsegment AS segment
         FROM customer ORDER BY customer_id""") { (s, dir) =>
      val raw = t(s, dir, "customer").select(
        col("c_custkey").as("Customer ID"),
        concat(lit("  "), col("c_name"), lit("\t")).as("NaMe"),
        col("c_mktsegment").as("segment"))
      Clean.clean(Map(
        "Customer ID" -> "customer_id", "NaMe" -> "name",
        "missing col" -> "x"))(raw)
        .orderBy("customer_id")
    },

    // J1-J3 + P6/P7: star-schema fact build — inner joins to broadcast
    // dims as referential filters, fact columns only
    // (reference: fact_call_logs.sql:3-16).
    "q09_star_fact" -> q(
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE p_size <= 25 AND s_nationkey < 13
         ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      StarSchema.fact(
        t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice"),
        Seq(
          (t(s, dir, "part").filter(col("p_size") <= 25), "l_partkey", "p_partkey"),
          (t(s, dir, "supplier").filter(col("s_nationkey") < 13), "l_suppkey", "s_suppkey")))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // O2/K2: case-insensitive by-name append-union across drifting schemas
    // (reference: snowflake_load.py:191 MATCH_BY_COLUMN_NAME).
    "q10_union_by_name" -> q(
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, NULL, o_orderstatus FROM orders WHERE o_orderkey % 2 = 1
         ORDER BY o_orderkey""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val b = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderstatus").as("O_ORDERSTATUS"),
          col("o_orderkey").as("O_ORDERKEY")) // permuted, missing, re-cased
      TableStore.appendByName(Seq(a, b)).orderBy("o_orderkey")
    },

    // J4/K4/I2: the file ledger's anti-join — candidates minus
    // already-processed, keyed on (folder, file)
    // (reference: snowflake_load.py:108-133).
    "q11_ledger_anti" -> q(
      """SELECT 'staging' AS folder_name, 'f_' || o_orderkey AS file_name
         FROM orders WHERE o_orderkey >= 1000
         ORDER BY file_name""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val candidates = o.select(
        lit("staging").as("folder_name"),
        concat(lit("f_"), col("o_orderkey").cast("string")).as("file_name"))
      val ledger = o.filter(col("o_orderkey") < 1000).select(
        lit("staging").as("folder_name"),
        concat(lit("f_"), col("o_orderkey").cast("string")).as("file_name"),
        current_timestamp().as("loaded_at"))
      FileLedger.newFiles(candidates, ledger).orderBy("file_name")
    },

    // A2: `unique` data-quality test — duplicate keys with counts
    // (reference: dbt facts/schema.yml:9-11).
    "q12_quality_unique" -> q(
      """SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt FROM lineitem
         GROUP BY l_orderkey HAVING count(*) > 1
         ORDER BY l_orderkey""") { (s, dir) =>
      Quality.uniqueViolations(t(s, dir, "lineitem"), "l_orderkey")
        .orderBy("l_orderkey")
    },

    // A3: `not_null` data-quality test — violating rows
    // (reference: dbt facts/schema.yml:12-15).
    "q13_quality_notnull" -> q(
      """SELECT o_orderkey, CAST(NULL AS VARCHAR) AS status FROM orders
         WHERE o_orderstatus = 'O'
         ORDER BY o_orderkey""") { (s, dir) =>
      val withNulls = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "O", lit(null: String))
          .otherwise(col("o_orderstatus")).as("status"))
      Quality.notNullViolations(withNulls, "status").orderBy("o_orderkey")
    },

    // K3: the 3-type warehouse narrowing (NUMBER/FLOAT/VARCHAR)
    // (reference: snowflake_load.py:147-154).
    "q14_warehouse_narrow" -> q(
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                CAST(o_custkey AS BIGINT) AS o_custkey,
                o_orderstatus, o_totalprice,
                strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
                o_orderpriority
         FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      Narrow.toWarehouseTypes(t(s, dir, "orders")).orderBy("o_orderkey")
    },

    // SCD type 1 upsert (hand-rolled MERGE): a deterministic "daily
    // batch" derived from customer — every 10th key re-extracted with a
    // changed balance/segment, every 100th key re-keyed as a brand-new
    // customer. Updates win, untouched rows pass through, new keys
    // append. +100 on a double is IEEE-exact on both engines. The
    // brand-new keys are (-c_custkey - 1): strictly negative for every
    // non-negative real key (custkey 0 exists, so bare negation would
    // collide 0 with itself), at every SF — a fixed +offset collides
    // once the table outgrows it, ~SF 7.
    "q98_scd1_upsert" -> q(
      """WITH upd AS (
           SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal,
                  'UPDATED' AS c_mktsegment
           FROM customer WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT -c_custkey - 1, c_name, c_nationkey, c_acctbal, c_mktsegment
           FROM customer WHERE c_custkey % 100 = 0)
         SELECT * FROM upd
         UNION ALL
         SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
         ORDER BY c_custkey""") { (s, dir) =>
      val cur = t(s, dir, "customer")
      val upd = cur.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
        .withColumn("c_mktsegment", lit("UPDATED"))
        .unionByName(cur.filter(col("c_custkey") % 100 === 0)
          .withColumn("c_custkey", -col("c_custkey") - 1))
      Scd.upsertByKey(cur, upd, Seq("c_custkey")).orderBy("c_custkey")
    },

    // SCD type 2 history: per-customer runs of identical order status
    // over the order timeline — effective_from/effective_to intervals
    // with an open current run. The orderkey breaks same-date ties so
    // run boundaries are engine-independent, and the run-start orderkey
    // is CARRIED into the output so the final sort is total (same-day
    // same-status runs would otherwise tie on every sort key).
    "q99_scd2_history" -> q(
      """WITH m AS (
           SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
                  lag(o_orderstatus) OVER w AS prev,
                  row_number() OVER w AS rn
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
         runs AS (
           SELECT o_custkey, o_orderstatus, o_orderdate AS effective_from, o_orderkey
           FROM m WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus),
         fin AS (
           SELECT o_custkey, o_orderstatus, o_orderkey, effective_from,
                  lead(effective_from) OVER
                    (PARTITION BY o_custkey ORDER BY effective_from, o_orderkey)
                    AS effective_to
           FROM runs)
         SELECT o_custkey, o_orderstatus, o_orderkey, effective_from, effective_to,
                effective_to IS NULL AS is_current
         FROM fin ORDER BY o_custkey, effective_from, o_orderkey""") { (s, dir) =>
      Scd.scd2FromSnapshots(t(s, dir, "orders"),
        keyCols = Seq("o_custkey"), timeCol = "o_orderdate",
        tieCols = Seq("o_orderkey"), attrCols = Seq("o_orderstatus"),
        carryCols = Seq("o_orderkey"))
        .orderBy("o_custkey", "effective_from", "o_orderkey")
    },

    // Incremental SCD2 apply: four deterministic daily snapshots of the
    // customer dimension (segment mutated by a different modulus each
    // day; day 3 misses every 7th key — absence leaves the run open;
    // day 4 introduces brand-new NEGATED keys — appends on a later
    // apply). The Spark side folds snapshots 2..4 into the day-1 history
    // one at a time with scd2Apply; the oracle REBUILDS from the full
    // observation set — green means iterated-apply == rebuild exactly.
    "q101_scd2_apply" -> q(
      """WITH snaps AS (
           SELECT c_custkey,
                  CASE WHEN c_custkey % 2 = 0 THEN 'S0' ELSE c_mktsegment END AS segment,
                  DATE '1995-01-01' AS snap_date FROM customer
           UNION ALL
           SELECT c_custkey,
                  CASE WHEN c_custkey % 3 = 0 THEN 'S1' ELSE c_mktsegment END,
                  DATE '1995-01-02' FROM customer
           UNION ALL
           SELECT c_custkey,
                  CASE WHEN c_custkey % 4 = 0 THEN 'S2' ELSE c_mktsegment END,
                  DATE '1995-01-03' FROM customer WHERE c_custkey % 7 <> 0
           UNION ALL
           SELECT c_custkey,
                  CASE WHEN c_custkey % 5 = 0 THEN 'S3' ELSE c_mktsegment END,
                  DATE '1995-01-04' FROM customer
           UNION ALL
           SELECT -c_custkey - 1, 'NEW', DATE '1995-01-04'
           FROM customer WHERE c_custkey % 50 = 0),
         m AS (
           SELECT c_custkey, segment, snap_date,
                  lag(segment) OVER w AS prev, row_number() OVER w AS rn
           FROM snaps
           WINDOW w AS (PARTITION BY c_custkey ORDER BY snap_date)),
         runs AS (
           SELECT c_custkey, segment, snap_date AS effective_from
           FROM m WHERE rn = 1 OR prev IS DISTINCT FROM segment),
         fin AS (
           SELECT c_custkey, segment, effective_from,
                  lead(effective_from) OVER
                    (PARTITION BY c_custkey ORDER BY effective_from) AS effective_to
           FROM runs)
         SELECT c_custkey, segment, effective_from, effective_to,
                effective_to IS NULL AS is_current
         FROM fin ORDER BY c_custkey, effective_from""") { (s, dir) =>
      val cur = t(s, dir, "customer")
      def snap(i: Int) = {
        val base = if (i == 2) cur.filter(col("c_custkey") % 7 =!= 0) else cur
        val rows = base.select(col("c_custkey"),
          when(col("c_custkey") % (i + 2) === 0, lit("S" + i))
            .otherwise(col("c_mktsegment")).as("segment"),
          lit(java.sql.Date.valueOf(s"1995-01-0${i + 1}")).as("snap_date"))
        if (i == 3) rows.unionByName(
          cur.filter(col("c_custkey") % 50 === 0).select(
            (-col("c_custkey") - 1).as("c_custkey"), lit("NEW").as("segment"),
            lit(java.sql.Date.valueOf("1995-01-04")).as("snap_date")))
        else rows
      }
      // each fold step persists its history — in production the history
      // is a TABLE between daily applies; without the materialization
      // every apply level re-derives the whole chain per consumer
      // (3 consumers/level compound exponentially with depth)
      val h0 = Scd.scd2FromSnapshots(snap(0),
        keyCols = Seq("c_custkey"), timeCol = "snap_date",
        tieCols = Nil, attrCols = Seq("segment")).persist()
      (1 to 3).foldLeft(h0) { (h, i) =>
        Scd.scd2Apply(h, snap(i),
          keyCols = Seq("c_custkey"), timeCol = "snap_date",
          attrCols = Seq("segment")).persist()
      }.orderBy("c_custkey", "effective_from")
    },

    // Column profile (Quality.profileColumns): one aggregate pass over
    // orders producing the per-column preflight report. The oracle is
    // the UNION ALL of per-column aggregates — same numbers, table
    // scanned once per column there vs once total in the engine.
    "q114_profile_columns" -> q({
      val profiled = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority")
      profiled.map(c =>
        s"""SELECT '$c' AS column_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count($c) AS BIGINT) AS n_nonnull,
                   CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
                   CAST(min($c) AS VARCHAR) AS min_value,
                   CAST(max($c) AS VARCHAR) AS max_value
            FROM orders""").mkString("", " UNION ALL ", " ORDER BY column_name")
    }) { (s, dir) =>
      graft.operators.Quality.profileColumns(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("column_name")
    },

    // Cross-table reconciliation (Reconcile.diffSummary): orders vs a
    // deliberately drifted copy (every 97th priority rewritten, every
    // 101st row deleted, every 103rd re-keyed out of range). The engine
    // compares md5 row-hashes; the oracle compares the columns
    // directly — green means the per-key verdicts agree everywhere.
    "q116_reconcile_tables" -> q(
      """WITH l AS (SELECT o_orderkey AS k, o_orderstatus, o_orderpriority, o_custkey
                    FROM orders),
            r AS (SELECT o_orderkey AS k, o_orderstatus,
                         CASE WHEN o_orderkey % 97 = 0 THEN '9-DRIFTED'
                              ELSE o_orderpriority END AS o_orderpriority,
                         o_custkey
                  FROM orders WHERE o_orderkey % 101 <> 0
                  UNION ALL
                  SELECT -o_orderkey - 1, o_orderstatus, o_orderpriority, o_custkey
                  FROM orders WHERE o_orderkey % 103 = 0),
            j AS (SELECT CASE WHEN l.k IS NULL THEN 'only_right'
                              WHEN r.k IS NULL THEN 'only_left'
                              WHEN l.o_orderstatus = r.o_orderstatus
                                   AND l.o_orderpriority = r.o_orderpriority
                                   AND l.o_custkey = r.o_custkey THEN 'match'
                              ELSE 'value_drift' END AS status
                  FROM l FULL OUTER JOIN r ON l.k = r.k)
         SELECT status, CAST(count(*) AS BIGINT) AS n
         FROM j GROUP BY status ORDER BY status""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val drifted = o.filter(col("o_orderkey") % 101 =!= 0)
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 97 === 0, lit("9-DRIFTED"))
            .otherwise(col("o_orderpriority")))
        .unionByName(o.filter(col("o_orderkey") % 103 === 0)
          .withColumn("o_orderkey", -col("o_orderkey") - 1))
      graft.operators.Reconcile.diffSummary(o, drifted, "o_orderkey",
        Seq("o_orderstatus", "o_orderpriority", "o_custkey"))
        .orderBy("status")
    },

    // Fuzzy entity matching (record linkage): part names unioned with
    // planted one-edit variants (every 50th part re-keyed with its
    // last character swapped), pairs within 2 edits found via
    // (8-char prefix, length band) blocking — prefix 1 leaves
    // near-quadratic blocks on TPC-H's self-similar color-word names
    // (25M candidates vs 3.2M at sf0.1). Oracle applies the same
    // block + unblocked Levenshtein — identical pairs, distances
    // included.
    "q123_fuzzy_match" -> q(
      """WITH n AS (SELECT p_partkey AS id, p_name AS nm FROM part
                    UNION ALL
                    SELECT p_partkey + 1000000,
                           substr(p_name, 1, length(p_name) - 1) || 'x'
                    FROM part WHERE p_partkey % 50 = 0)
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
         FROM n a JOIN n b
           ON a.id < b.id
          AND substr(a.nm, 1, 8) = substr(b.nm, 1, 8)
          AND abs(length(a.nm) - length(b.nm)) <= 2
         WHERE levenshtein(a.nm, b.nm) <= 2
         ORDER BY id_a, id_b""") { (s, dir) =>
      val p = t(s, dir, "part")
      val names = p.select(col("p_partkey").as("id"), col("p_name").as("nm"))
        .unionByName(p.filter(col("p_partkey") % 50 === 0)
          .select((col("p_partkey") + 1000000L).as("id"),
            concat(expr("substring(p_name, 1, length(p_name) - 1)"),
              lit("x")).as("nm")))
      graft.operators.Reconcile.fuzzyMatchPairs(names, "id", "nm", maxDist = 2, prefixLen = 8)
        .orderBy("id_a", "id_b")
    },

    // Jaro-Winkler record linkage (Reconcile.jaroWinklerPairs) over the
    // q123 corrupted-names corpus: the transposition-tolerant scorer
    // runs as a codegen'd native expression (functions/JaroWinkler
    // .scala) inside the same (prefix, length-band) blocks. The e6
    // integer scores are bit-identical to DuckDB's
    // jaro_winkler_similarity (verified over all 32k blocked pairs:
    // same IEEE op order — see the expression's Scaladoc).
    "q293_jw_linkage" -> q(
      """WITH n AS (SELECT p_partkey AS id, p_name AS nm FROM part
                    UNION ALL
                    SELECT p_partkey + 1000000,
                           substr(p_name, 1, length(p_name) - 1) || 'x'
                    FROM part WHERE p_partkey % 50 = 0),
            cand AS (SELECT a.id AS id_a, b.id AS id_b,
                            CAST(floor(jaro_winkler_similarity(a.nm, b.nm)
                                       * 1000000 + 0.5) AS BIGINT) AS jw_e6
                     FROM n a JOIN n b
                       ON a.id < b.id
                      AND substr(a.nm, 1, 8) = substr(b.nm, 1, 8)
                      AND abs(length(a.nm) - length(b.nm)) <= 2)
         SELECT id_a, id_b, jw_e6 FROM cand WHERE jw_e6 >= 800000
         ORDER BY id_a, id_b""") { (s, dir) =>
      val p = t(s, dir, "part")
      val names = p.select(col("p_partkey").as("id"), col("p_name").as("nm"))
        .unionByName(p.filter(col("p_partkey") % 50 === 0)
          .select((col("p_partkey") + 1000000L).as("id"),
            concat(expr("substring(p_name, 1, length(p_name) - 1)"),
              lit("x")).as("nm")))
      graft.operators.Reconcile.jaroWinklerPairs(names, "id", "nm",
          minScoreE6 = 800000L, prefixLen = 8, lenBand = 2)
        .orderBy("id_a", "id_b")
    },

    // FULL Damerau-Levenshtein linkage (Reconcile.damerauMatchPairs,
    // codegen'd functions/DamerauLevenshtein.scala — Lowrance-Wagner,
    // transpositions cost 1 even across intervening edits, matching
    // DuckDB's damerau_levenshtein). All-integer DP: no float parity
    // caveats at all. Same corpus + blocks as q123, so the two result
    // sets diff exactly where a transposition was double-counted.
    "q299_dl_linkage" -> q(
      """WITH n AS (SELECT p_partkey AS id, p_name AS nm FROM part
                    UNION ALL
                    SELECT p_partkey + 1000000,
                           substr(p_name, 1, length(p_name) - 1) || 'x'
                    FROM part WHERE p_partkey % 50 = 0)
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(damerau_levenshtein(a.nm, b.nm) AS BIGINT) AS dist
         FROM n a JOIN n b
           ON a.id < b.id
          AND substr(a.nm, 1, 8) = substr(b.nm, 1, 8)
          AND abs(length(a.nm) - length(b.nm)) <= 2
         WHERE damerau_levenshtein(a.nm, b.nm) <= 2
         ORDER BY id_a, id_b""") { (s, dir) =>
      val p = t(s, dir, "part")
      val names = p.select(col("p_partkey").as("id"), col("p_name").as("nm"))
        .unionByName(p.filter(col("p_partkey") % 50 === 0)
          .select((col("p_partkey") + 1000000L).as("id"),
            concat(expr("substring(p_name, 1, length(p_name) - 1)"),
              lit("x")).as("nm")))
      graft.operators.Reconcile.damerauMatchPairs(names, "id", "nm",
          maxDist = 2, prefixLen = 8)
        .orderBy("id_a", "id_b")
    },

    // Sorted-neighborhood linkage (Reconcile.sortedNeighborhoodPairs):
    // the Hernandez-Stolfo complement to q123/q299's blocking — global
    // sort by name, score only rank-adjacent pairs (window 3). The
    // Spark rank is the DISTRIBUTED two-pass prefix sum (no global
    // window); the oracle's row_number() over the SAME concatenated
    // sort key pins exact agreement, pair for pair.
    "q301_sorted_neighborhood" -> q(
      """WITH n AS (SELECT p_partkey AS id, p_name AS nm FROM part
                    UNION ALL
                    SELECT p_partkey + 1000000,
                           substr(p_name, 1, length(p_name) - 1) || 'x'
                    FROM part WHERE p_partkey % 50 = 0),
            r AS (SELECT id, nm,
                         row_number() OVER (ORDER BY
                           nm || '|' || lpad(CAST(id AS VARCHAR), 20, '0'))
                           AS rk
                  FROM n)
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
         FROM r a JOIN r b
           ON b.rk - a.rk BETWEEN 1 AND 3
         WHERE levenshtein(a.nm, b.nm) <= 2
         ORDER BY id_a, id_b, dist""") { (s, dir) =>
      val p = t(s, dir, "part")
      val names = p.select(col("p_partkey").as("id"), col("p_name").as("nm"))
        .unionByName(p.filter(col("p_partkey") % 50 === 0)
          .select((col("p_partkey") + 1000000L).as("id"),
            concat(expr("substring(p_name, 1, length(p_name) - 1)"),
              lit("x")).as("nm")))
      graft.operators.Reconcile.sortedNeighborhoodPairs(names, "id", "nm",
          window = 3, maxDist = 2)
        .orderBy("id_a", "id_b", "dist")
    },

    // Jaro-Winkler entity clusters: the new scorer composed into the
    // dedup ladder — blocked JW pairs at >= 0.95 become edges, pointer-
    // jumped connected components pick the canonical id, survivors
    // flagged (q57's verdict shape over the linkage graph; recursive-
    // CTE components oracle).
    "q304_jw_components" -> q(
      """WITH RECURSIVE n AS (
              SELECT p_partkey AS id, p_name AS nm FROM part
              UNION ALL
              SELECT p_partkey + 1000000,
                     substr(p_name, 1, length(p_name) - 1) || 'x'
              FROM part WHERE p_partkey % 50 = 0),
            cand AS (SELECT a.id AS id_a, b.id AS id_b
                     FROM n a JOIN n b
                       ON a.id < b.id
                      AND substr(a.nm, 1, 8) = substr(b.nm, 1, 8)
                      AND abs(length(a.nm) - length(b.nm)) <= 2
                     WHERE CAST(floor(jaro_winkler_similarity(a.nm, b.nm)
                                      * 1000000 + 0.5) AS BIGINT) >= 950000),
            edges AS (SELECT id_a AS a, id_b AS b FROM cand
                      UNION ALL SELECT id_b, id_a FROM cand),
            reach(id, r) AS (
              SELECT a, a FROM edges
              UNION
              SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a),
            comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
         SELECT n.id, coalesce(comp.component, n.id) AS component,
                coalesce(comp.component, n.id) = n.id AS is_survivor
         FROM n LEFT JOIN comp ON n.id = comp.id
         ORDER BY n.id""") { (s, dir) =>
      val p = t(s, dir, "part")
      val names = p.select(col("p_partkey").as("id"), col("p_name").as("nm"))
        .unionByName(p.filter(col("p_partkey") % 50 === 0)
          .select((col("p_partkey") + 1000000L).as("id"),
            concat(expr("substring(p_name, 1, length(p_name) - 1)"),
              lit("x")).as("nm")))
      graft.analytics.Dedup.dedupVerdicts(names, "id",
          graft.operators.Reconcile.jaroWinklerPairs(names, "id", "nm",
            minScoreE6 = 950000L, prefixLen = 8, lenBand = 2))
        .select("id", "component", "is_survivor")
        .orderBy("id")
    },

    // CDC MERGE: a change batch (deletes, updates with an in-batch
    // superseded op, inserts on disjoint negative keys) applied to the
    // customer table in one anti-join + union (Scd.applyCdc) — the
    // warehouse MERGE INTO the reference's append-only COPY lacks.
    "q146_cdc_apply" -> q(
      """WITH cur AS (SELECT c_custkey, c_name FROM customer),
            changes AS (
              SELECT c_custkey, c_name, 'D' AS op, 1 AS seq FROM cur
              WHERE c_custkey % 10 = 0
              UNION ALL SELECT c_custkey, upper(c_name), 'U', 1 FROM cur
              WHERE c_custkey % 10 IN (1, 2)
              UNION ALL SELECT c_custkey, 'STALE', 'U', 0 FROM cur
              WHERE c_custkey % 10 = 1
              UNION ALL SELECT -c_custkey, 'NEW' || CAST(c_custkey AS VARCHAR), 'I', 1
              FROM cur WHERE c_custkey % 100 = 3),
            last AS (SELECT c_custkey, c_name, op FROM (
                       SELECT *, row_number() OVER (PARTITION BY c_custkey
                         ORDER BY seq DESC) AS rn FROM changes)
                     WHERE rn = 1),
            survivors AS (SELECT cur.c_custkey, cur.c_name FROM cur
                          WHERE NOT EXISTS (SELECT 1 FROM last
                                            WHERE last.c_custkey = cur.c_custkey)),
            upserts AS (SELECT c_custkey, c_name FROM last WHERE op <> 'D')
         SELECT c_custkey, c_name FROM survivors
         UNION ALL SELECT c_custkey, c_name FROM upserts
         ORDER BY c_custkey""") { (s, dir) =>
      val cur = t(s, dir, "customer").select("c_custkey", "c_name")
      val key = col("c_custkey")
      val changes = cur.filter(key % 10 === 0)
        .select(key, col("c_name"), lit("D").as("op"), lit(1L).as("seq"))
        .unionByName(cur.filter((key % 10).isin(1, 2))
          .select(key, upper(col("c_name")).as("c_name"), lit("U").as("op"), lit(1L).as("seq")))
        .unionByName(cur.filter(key % 10 === 1)
          .select(key, lit("STALE").as("c_name"), lit("U").as("op"), lit(0L).as("seq")))
        .unionByName(cur.filter(key % 100 === 3)
          .select((-key).as("c_custkey"),
            concat(lit("NEW"), key.cast("string")).as("c_name"),
            lit("I").as("op"), lit(1L).as("seq")))
      graft.operators.Scd.applyCdc(cur, changes, Seq("c_custkey"), "op", "seq")
        .orderBy("c_custkey")
    },

    // Point-in-time join (Scd.pointInTimeJoin): every third order picks
    // up the status RUN valid at its own date from the q99 SCD2
    // history — the feature store's training-serving-skew guard. The
    // half-open run intervals guarantee exactly one match per fact at
    // or after the entity's first observation.
    "q163_point_in_time" -> q(
      """WITH m AS (
           SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
                  lag(o_orderstatus) OVER w AS prev,
                  row_number() OVER w AS rn
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
         runs AS (
           SELECT o_custkey, o_orderstatus, o_orderdate AS effective_from, o_orderkey
           FROM m WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus),
         fin AS (
           SELECT o_custkey, o_orderstatus, effective_from,
                  lead(effective_from) OVER
                    (PARTITION BY o_custkey ORDER BY effective_from, o_orderkey)
                    AS effective_to
           FROM runs)
         SELECT f.o_orderkey, f.o_custkey, CAST(f.o_orderdate AS DATE) AS day,
                fin.o_orderstatus AS run_status,
                CAST(fin.effective_from AS DATE) AS run_from,
                CAST(fin.effective_to AS DATE) AS run_to,
                CASE WHEN fin.o_custkey IS NULL THEN NULL
                     ELSE fin.effective_to IS NULL END AS is_current
         FROM (SELECT * FROM orders WHERE o_orderkey % 3 = 0) f
         LEFT JOIN fin ON f.o_custkey = fin.o_custkey
           AND f.o_orderdate >= fin.effective_from
           AND (fin.effective_to IS NULL OR f.o_orderdate < fin.effective_to)
         ORDER BY f.o_orderkey""") { (s, dir) =>
      val orders = t(s, dir, "orders")
      val history = Scd.scd2FromSnapshots(orders,
          keyCols = Seq("o_custkey"), timeCol = "o_orderdate",
          tieCols = Seq("o_orderkey"), attrCols = Seq("o_orderstatus"))
        .select(col("o_custkey"), col("o_orderstatus").as("run_status"),
          col("effective_from"), col("effective_to"), col("is_current"))
      val facts = orders.filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      Scd.pointInTimeJoin(facts, history, Seq("o_custkey"), "o_orderdate")
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("day"), col("run_status"),
          to_date(col("effective_from")).as("run_from"),
          to_date(col("effective_to")).as("run_to"), col("is_current"))
        .orderBy("o_orderkey")
    },

    // Consistent pseudonymization for export (Clean.pseudonymize):
    // customer keys and names replaced by keyed sha256 tokens; the
    // query itself PROVES joinability survives by joining orders to
    // customers on the tokenized key — the property that separates
    // pseudonymization from redaction.
    "q156_pseudonymize" -> q(
      """WITH c AS (SELECT sha256('k1' || CAST(c_custkey AS VARCHAR)) AS cust_token,
                           sha256('k1' || c_name) AS name_token, c_mktsegment
                    FROM customer),
            o AS (SELECT sha256('k1' || CAST(o_custkey AS VARCHAR)) AS cust_token
                  FROM orders)
         SELECT c.cust_token, c.name_token, c.c_mktsegment,
                CAST(count(o.cust_token) AS BIGINT) AS n_orders
         FROM c LEFT JOIN o ON c.cust_token = o.cust_token
         GROUP BY 1, 2, 3 ORDER BY 1""") { (s, dir) =>
      val secret = "k1"
      val c = graft.operators.Clean.pseudonymize(
          t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
            col("c_mktsegment")),
          Seq("c_custkey", "c_name"), secret)
        .select(col("c_custkey").as("cust_token"),
          col("c_name").as("name_token"), col("c_mktsegment"))
      val o = graft.operators.Clean.pseudonymize(
          t(s, dir, "orders").select(col("o_custkey")),
          Seq("o_custkey"), secret)
        .select(col("o_custkey").as("cust_token"))
      c.join(o.withColumn("__hit", lit(1)), Seq("cust_token"), "left")
        .groupBy("cust_token", "name_token", "c_mktsegment")
        .agg(count(col("__hit")).as("n_orders"))
        .orderBy("cust_token")
    },

    // Change-data-feed generation: diff two table versions into the
    // I/U/D batch that transforms one into the other (Scd.diffToCdc,
    // the inverse of q146's applyCdc; ScdSpec pins the round trip).
    // One full outer join on the key; unchanged rows emit nothing.
    "q152_cdc_diff" -> q(
      """WITH oldt AS (SELECT c_custkey, c_name FROM customer),
            newt AS (SELECT c_custkey,
                            CASE WHEN c_custkey % 10 IN (1, 2) THEN upper(c_name)
                                 ELSE c_name END AS c_name
                     FROM oldt WHERE c_custkey % 10 <> 0
                     UNION ALL
                     SELECT -c_custkey, 'NEW' || CAST(c_custkey AS VARCHAR)
                     FROM oldt WHERE c_custkey % 100 = 3)
         SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
                CASE WHEN n.c_custkey IS NULL THEN o.c_name
                     ELSE n.c_name END AS c_name,
                CASE WHEN o.c_custkey IS NULL THEN 'I'
                     WHEN n.c_custkey IS NULL THEN 'D'
                     ELSE 'U' END AS op,
                CAST(1 AS BIGINT) AS seq
         FROM oldt o FULL JOIN newt n ON o.c_custkey = n.c_custkey
         WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
            OR o.c_name IS DISTINCT FROM n.c_name
         ORDER BY c_custkey, op""") { (s, dir) =>
      val oldT = t(s, dir, "customer").select("c_custkey", "c_name")
      val key = col("c_custkey")
      val newT = oldT.filter(key % 10 =!= 0)
        .select(key, when((key % 10).isin(1, 2), upper(col("c_name")))
          .otherwise(col("c_name")).as("c_name"))
        .unionByName(oldT.filter(key % 100 === 3)
          .select((-key).as("c_custkey"),
            concat(lit("NEW"), key.cast("string")).as("c_name")))
      graft.operators.Scd.diffToCdc(oldT, newT, Seq("c_custkey"))
        .orderBy("c_custkey", "op")
    },

    // dbt-test parity beyond unique/not_null: accepted_values (planted
    // violation: status 'P' outside the allowed set) and relationships
    // (lineitem parts orphaned against a filtered part dimension), one
    // violations report (Quality.acceptedValuesViolations /
    // .relationshipViolations — reference: the dbt tests the models
    // declare).
    "q149_dbt_tests" -> q(
      """WITH av AS (SELECT 'accepted_values_o_orderstatus' AS test_name,
                            o_orderstatus AS value,
                            CAST(count(*) AS BIGINT) AS n_rows
                     FROM orders
                     WHERE o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O', 'F')
                     GROUP BY 2),
            rel AS (SELECT 'relationships_l_partkey' AS test_name,
                           CAST(l_partkey AS VARCHAR) AS value,
                           CAST(count(*) AS BIGINT) AS n_rows
                    FROM lineitem
                    WHERE l_partkey IS NOT NULL
                      AND NOT EXISTS (SELECT 1 FROM part
                                      WHERE p_partkey = l_partkey AND p_size > 25)
                    GROUP BY 2)
         SELECT * FROM av UNION ALL SELECT * FROM rel
         ORDER BY test_name, value""") { (s, dir) =>
      val av = graft.operators.Quality.acceptedValuesViolations(
          t(s, dir, "orders"), "o_orderstatus", Seq("O", "F"))
        .select(lit("accepted_values_o_orderstatus").as("test_name"),
          col("value"), col("n_rows"))
      val rel = graft.operators.Quality.relationshipViolations(
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part").filter(col("p_size") > 25), "p_partkey")
        .select(lit("relationships_l_partkey").as("test_name"),
          col("orphan_key").cast("string").as("value"), col("n_rows"))
      av.unionByName(rel).orderBy("test_name", "value")
    },

    // Column-profile drift (Quality.profileDrift): first vs second
    // half-month of events, per-column counts + exact e6 null rates +
    // integer-compare drift verdict — the promote-or-hold gate between
    // yesterday's and today's ingest partition.
    "q259_profile_drift" -> q({
      val cols = Seq("event_type", "props", "user_id", "value")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
                   a.nr AS n_rows_a, a.nn AS n_nonnull_a, a.nd AS n_distinct_a,
                   b.nr AS n_rows_b, b.nn AS n_nonnull_b, b.nd AS n_distinct_b,
                   ((a.nr - a.nn) * 1000000) // a.nr AS null_rate_a_e6,
                   ((b.nr - b.nn) * 1000000) // b.nr AS null_rate_b_e6,
                   (abs((((a.nr - a.nn) * 1000000) // a.nr)
                        - (((b.nr - b.nn) * 1000000) // b.nr)) > 10000
                    OR a.nd * 2 < b.nd OR b.nd * 2 < a.nd) AS drifted
            FROM (SELECT CAST(count(*) AS BIGINT) AS nr,
                         CAST(count($c) AS BIGINT) AS nn,
                         CAST(count(DISTINCT $c) AS BIGINT) AS nd
                  FROM events
                  WHERE CAST(strftime(ts, '%d') AS INTEGER) <= 15) a
            CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS nr,
                               CAST(count($c) AS BIGINT) AS nn,
                               CAST(count(DISTINCT $c) AS BIGINT) AS nd
                        FROM events
                        WHERE CAST(strftime(ts, '%d') AS INTEGER) > 15) b"""
      }.mkString("", " UNION ALL ", " ORDER BY column_name")
    }) { (s, dir) =>
      val ev = t(s, dir, "events")
      val first = ev.filter(dayofmonth(col("ts")) <= 15)
      val second = ev.filter(dayofmonth(col("ts")) > 15)
      graft.operators.Quality.profileDrift(first, second,
        Seq("event_type", "props", "user_id", "value"))
        .orderBy("column_name")
    }
  )
}
