package graft.queries

import org.apache.spark.sql.functions._

/** The wider relational surface a warehouse user expects (the reference
  * delegated all of this to Snowflake — SURVEY §3.3): outer/semi/anti
  * joins, rollup, pivot, set ops, subqueries, running windows, date and
  * string scalar functions. Each entry oracle-checked against DuckDB.
  */
object SqlSurfaceQueries {

  val defs: Map[String, Q] = Map(

    // Left outer join + aggregate: zero-lineitem orders kept.
    "q42_join_left_outer" -> q(
      """SELECT o_orderkey, CAST(count(l_orderkey) AS BIGINT) AS n_items
         FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderkey ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(count(col("l_orderkey")).as("n_items"))
        .orderBy("o_orderkey")
    },

    // Full outer join over partially-overlapping key ranges.
    "q43_join_full_outer" -> q(
      """SELECT coalesce(a.k, b.k) AS k, a.c_name, b.c_acctbal
         FROM (SELECT c_custkey AS k, c_name FROM customer WHERE c_custkey <= 100) a
         FULL JOIN (SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_custkey >= 50) b
           ON a.k = b.k
         ORDER BY k""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val a = c.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("ka"), col("c_name"))
      val b = c.filter(col("c_custkey") >= 50)
        .select(col("c_custkey").as("kb"), col("c_acctbal"))
      a.join(b, col("ka") === col("kb"), "full")
        .select(coalesce(col("ka"), col("kb")).as("k"), col("c_name"), col("c_acctbal"))
        .orderBy("k")
    },

    // Row-level semi join (EXISTS).
    "q44_join_semi" -> q(
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Row-level anti join (NOT EXISTS).
    "q45_join_anti" -> q(
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ROLLUP: subtotal + grand-total rows (NULLS FIRST aligns DuckDB's
    // default NULLS LAST with Spark's NULLS FIRST).
    "q46_agg_rollup" -> q(
      """SELECT o_orderstatus, o_orderpriority,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
         FROM orders
         GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (s, dir) =>
      t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // Pivot: status columns from rows (CASE-aggregation in the oracle).
    "q47_agg_pivot" -> q(
      """SELECT o_orderpriority,
                CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS "O",
                CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS "F",
                CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("cents_", cents(col("o_totalprice")))
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(sum(col("cents_")))
        .orderBy("o_orderpriority")
    },

    // Date/time scalar functions over the typed timestamp column.
    "q48_dates" -> q(
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INTEGER) AS y,
                CAST(month(o_orderdate) AS INTEGER) AS m,
                CAST(day(o_orderdate) AS INTEGER) AS d,
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                CAST(o_orderdate AS DATE) + 30 AS plus30,
                CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER) AS days_to_end
         FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")),
            col("o_orderdate").cast("date")).as("days_to_end"))
        .orderBy("o_orderkey")
    },

    // String scalar functions (F-surface beyond the reference's trim).
    "q49_strings" -> q(
      """SELECT c_custkey,
                upper(c_name) AS up, lower(c_mktsegment) AS lo,
                substring(c_name, 1, 5) AS sub,
                CAST(length(c_name) AS INTEGER) AS len,
                replace(c_name, '#', '-') AS repl,
                lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
                c_name || ':' || c_mktsegment AS joined,
                regexp_extract(c_name, '([0-9]+)', 1) AS digits
         FROM customer ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"), lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 1, 5).as("sub"),
          length(col("c_name")).as("len"),
          regexp_replace(col("c_name"), "#", "-").as("repl"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          concat(col("c_name"), lit(":"), col("c_mktsegment")).as("joined"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey")
    },

    // Set operations: EXCEPT / INTERSECT (distinct semantics).
    "q50_setops" -> q(
      """(SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         UNION ALL
         (SELECT -o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT
          SELECT -o_custkey FROM orders WHERE o_orderstatus = 'P')
         ORDER BY k""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
      val fin = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      val openNeg = o.filter(col("o_orderstatus") === "O").select((-col("o_custkey")).as("k"))
      val partNeg = o.filter(col("o_orderstatus") === "P").select((-col("o_custkey")).as("k"))
      open.except(fin).union(openNeg.intersect(partNeg)).orderBy("k")
    },

    // Scalar subquery: rows above the global average (broadcast 1-row agg).
    "q51_scalar_subquery" -> q(
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
         ORDER BY o_orderkey""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val avgP = o.agg(avg(col("o_totalprice")).as("avg_p"))
      o.crossJoin(broadcast(avgP))
        .filter(col("o_totalprice") > col("avg_p"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Running (cumulative) windows: per-customer revenue accumulation.
    "q52_window_running" -> q(
      """SELECT o_custkey, o_orderkey,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
                CAST(lag(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS prev_cents
         FROM orders ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .withColumn("cents_", cents(col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("cents_"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_cents"),
          lag(col("cents_"), 1).over(w).as("prev_cents"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // UNION with distinct semantics.
    "q53_union_distinct" -> q(
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
         UNION
         SELECT o_custkey FROM orders WHERE o_totalprice > 100000
         ORDER BY k""") { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
        .union(o.filter(col("o_totalprice") > 100000).select(col("o_custkey").as("k")))
        .distinct()
        .orderBy("k")
    },

    // Exact interpolated percentiles (median/p90). Both engines define
    // the continuous quantile as linear interpolation at p*(n-1) over the
    // sorted values — same two operands, same IEEE result.
    "q59_percentiles" -> q(
      """SELECT o_orderstatus,
                quantile_cont(o_totalprice, 0.5) AS median_price,
                quantile_cont(o_totalprice, 0.9) AS p90_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90_price"))
        .orderBy("o_orderstatus")
    },

    // CUBE: all grouping-set combinations.
    "q60_agg_cube" -> q(
      """SELECT o_orderstatus, o_orderpriority,
                CAST(count(*) AS BIGINT) AS n
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // Window-function breadth beyond q19 (rank) and q52 (running sums):
    // lead/lag offsets, ntile quartiles, percent_rank and cume_dist —
    // the full analytic-window surface, on a (o_orderdate, o_orderkey)
    // total order so every value is deterministic. percent_rank and
    // cume_dist are exact-operand integer divisions on both engines.
    "q95_window_analytics" -> q(
      """SELECT o_orderkey, o_custkey,
                CAST(lag(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  OVER w AS BIGINT) AS prev_cents,
                CAST(lead(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  OVER w AS BIGINT) AS next_cents,
                CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                percent_rank() OVER w AS pr,
                cume_dist() OVER w AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_orderkey""") { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          lag(cents(col("o_totalprice")), 1).over(w).as("prev_cents"),
          lead(cents(col("o_totalprice")), 1).over(w).as("next_cents"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    },

    // Morton (Z-order) interleaving for multi-dimensional layout: the
    // oracle mirrors the bit-spreading identity with DuckDB's bitwise
    // operators — exact 64-bit integer arithmetic on both engines.
    "q94_zorder_value" -> q({
      def sp(e: String): String = {
        val x0 = s"(($e) & 65535)"
        val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
        val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
        val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
        s"(($x3 | ($x3 << 1)) & 1431655765)"
      }
      s"""SELECT o_orderkey,
                 CAST(${sp("o_custkey")} | (${sp("o_orderkey")} << 1) AS BIGINT) AS z_value
          FROM orders ORDER BY o_orderkey"""
    }) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          graft.operators.Layout.zorder2(col("o_custkey"), col("o_orderkey"))
            .as("z_value"))
        .orderBy("o_orderkey")
    },

    // Explicit GROUPING SETS — a set combination neither rollup nor
    // cube expresses: (status, priority) detail, (priority) margins,
    // and the grand total, skipping the (status) margin.
    "q93_agg_grouping_sets" -> q(
      """SELECT o_orderstatus, o_orderpriority,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // Bucketed interval (range) join: lineitems shipped within 30 days
    // of any order's date — an equi join on time buckets + exact range
    // filter instead of the cartesian plan Spark would pick for a raw
    // non-equi join. Oracle: DuckDB's native inequality join (IEJoin).
    "q62_range_join" -> q(
      """SELECT o_orderkey, CAST(count(l_orderkey) AS BIGINT) AS n_shipped
         FROM orders LEFT JOIN lineitem
           ON l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         GROUP BY o_orderkey ORDER BY o_orderkey""") { (s, dir) =>
      val orders = t(s, dir, "orders")
        .withColumn("o_hi", col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      graft.operators.RangeJoin.intervalJoin(
        points = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate"),
        intervals = orders.select("o_orderkey", "o_orderdate", "o_hi"),
        pointTs = "l_shipdate", loCol = "o_orderdate", hiCol = "o_hi",
        maxWidthSec = 30L * 86400, joinType = "left")
        .groupBy("o_orderkey")
        .agg(count(col("l_orderkey")).as("n_shipped"))
        .orderBy("o_orderkey")
    },

    // The same interval-join SEMANTICS as q62, but written as the plain
    // declarative non-equi join — no manual bucketing. The
    // plans.RangeJoinRewrite optimizer rule (scoped enable/disable, like
    // q182's rollup rule) detects `point >= lo AND point <= hi` with no
    // equi key and rewrites it into the bucketed equi join itself; the
    // builder REQUIRES the nested-loop plan is gone, so a silently
    // unfired rule fails Verify instead of passing slowly. The points
    // side is sliced to one quarter (pushed to the scan) to bound the
    // match cardinality.
    "q241_range_join_auto" -> q(
      """SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped
         FROM orders JOIN lineitem
           ON l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
         GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      graft.plans.RangeJoinRewrite.enable(s, 30L * 86400)
      try {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
            && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
          .select("l_shipdate")
        val o = t(s, dir, "orders")
          .withColumn("o_hi", col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .select("o_orderkey", "o_orderdate", "o_hi")
        val out = li
          .join(o, col("l_shipdate") >= col("o_orderdate")
            && col("l_shipdate") <= col("o_hi"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_shipped"))
          .orderBy("o_orderkey")
        require(!out.queryExecution.executedPlan.toString
            .contains("BroadcastNestedLoopJoin"),
          "range-join rewrite did not fire on the plain non-equi join")
        // materialize THROUGH the rewrite (q182's pattern): a consumer's
        // count()/write() re-plans the DataFrame from scratch, and by
        // then the finally has disabled the rule — the re-plan would
        // silently fall back to the nested loop. The grouped result is
        // one row per matched order, small by construction.
        val rows = out.collect()
        s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
          out.schema)
      } finally graft.plans.RangeJoinRewrite.disable()
    },

    // Conditional aggregation + HAVING.
    "q54_having_case" -> q(
      """SELECT o_orderstatus,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
         FROM orders
         GROUP BY o_orderstatus
         HAVING count(*) > 100
         ORDER BY o_orderstatus""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_totalprice") > 150000, 1L).otherwise(0L)).as("n_big"))
        .filter(col("n") > 100)
        .orderBy("o_orderstatus")
    },

    // Interpolated (continuous) percentiles per group: Spark's
    // percentile() and DuckDB's quantile_cont share the exact
    // idx = p*(n-1) linear-interpolation definition (verified on
    // boundary cases); operands are exact cents, results rounded well
    // above double ulp at cents magnitude.
    "q151_percentile_cont" -> q(
      """SELECT o_orderpriority,
                round(quantile_cont(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), 0.25), 4) AS p25,
                round(quantile_cont(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), 0.5), 4) AS p50,
                round(quantile_cont(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), 0.9), 4) AS p90
         FROM orders GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderpriority"), cents(col("o_totalprice")).as("v"))
        .groupBy("o_orderpriority")
        .agg(round(expr("percentile(v, 0.25D)"), 4).as("p25"),
          round(expr("percentile(v, 0.5D)"), 4).as("p50"),
          round(expr("percentile(v, 0.9D)"), 4).as("p90"))
        .orderBy("o_orderpriority")
    },

    // Unpivot/melt: lineitem's four measures to (measure, value) long
    // form via the native unpivot (a generator projection — zero
    // shuffle; the UNION-ALL formulation scans once per measure).
    "q141_unpivot" -> q(
      """WITH p AS (SELECT l_orderkey, l_linenumber,
                           CAST(l_quantity AS BIGINT) AS quantity,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
                           CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS discount_e4,
                           CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS tax_e4
                    FROM lineitem)
         SELECT l_orderkey, l_linenumber, measure, value FROM (
           SELECT l_orderkey, l_linenumber, 'quantity' AS measure, quantity AS value FROM p
           UNION ALL SELECT l_orderkey, l_linenumber, 'price_cents', price_cents FROM p
           UNION ALL SELECT l_orderkey, l_linenumber, 'discount_e4', discount_e4 FROM p
           UNION ALL SELECT l_orderkey, l_linenumber, 'tax_e4', tax_e4 FROM p)
         ORDER BY l_orderkey, l_linenumber, measure""") { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("quantity"),
          cents(col("l_extendedprice")).as("price_cents"),
          tenthCents(col("l_discount")).as("discount_e4"),
          tenthCents(col("l_tax")).as("tax_e4"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("price_cents"),
            col("discount_e4"), col("tax_e4")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // GROUPING SETS with explicit grouping() disambiguation: the
    // (flag, status) detail plus per-flag and grand-total rollups in
    // ONE aggregate pass (Spark plans Expand + single hash aggregate —
    // never three scans). Rolled-up dims are labeled 'ALL' and the gid
    // column separates a real NULL value from a rollup row, the
    // standard warehouse-report shape.
    "q231_grouping_sets" -> q(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
                coalesce(l_linestatus, 'ALL') AS status,
                CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
                CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY gid, flag, status""") { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS flag,
                  coalesce(l_linestatus, 'ALL') AS status,
                  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
                  sum(CAST(floor(l_quantity) AS BIGINT)) AS sum_qty,
                  count(*) AS n_rows
           FROM lineitem_gs
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
           ORDER BY gid, flag, status""")
    }
  )
}
