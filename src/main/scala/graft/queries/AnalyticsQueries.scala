package graft.queries

import org.apache.spark.sql.functions._

/** Headline analytics over the TPC-H-ish tables — the aggregate/join/
  * window/top-k surface the warehouse (Snowflake, in the reference) would
  * have executed. Money aggregates use exact integer-cents arithmetic
  * (see graft.queries.cents) so hashes are engine-stable.
  */
object AnalyticsQueries {

  val defs: Map[String, Q] = Map(

    // TPC-H Q1-shaped pricing summary: filtered scan -> hash aggregate
    // (partial + final, one shuffle on the 2 group keys).
    "q16_agg_pricing" -> q(
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
                avg(l_quantity) AS avg_qty,
                CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(tenthCents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_e4"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q3-shaped revenue by segment: fact->fact shuffle join + broadcast
    // dim, then a 5-group aggregate. customer is broadcast (a dim);
    // lineitem⋈orders shuffles on the order key — at 100 TB that is the
    // correct plan (both sides huge, AQE may still convert if orders
    // filters down).
    "q17_join_agg_revenue" -> q(
      """SELECT c_mktsegment,
                CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""") { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(tenthCents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_e4"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("c_mktsegment")
    },

    // Top-k without a full sort: Catalyst plans orderBy+limit as
    // TakeOrderedAndProject (per-partition heap + driver merge of k rows
    // — O(n) not O(n log n), no global sort shuffle).
    "q18_topk_orders" -> q(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""") { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Ranking window: top-3 orders per customer. One shuffle on the
    // partition key, per-partition sort — the standard distributed plan.
    "q19_window_rank" -> q(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  CAST(row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
           FROM orders)
         WHERE rn <= 3
         ORDER BY o_custkey, rn""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // Grouped distinct + conditional aggregation across a 3-way shape.
    "q20_orders_by_status" -> q(
      """SELECT o_orderstatus, o_orderpriority,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
         FROM orders
         GROUP BY o_orderstatus, o_orderpriority
         ORDER BY o_orderstatus, o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("total_cents"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // Salted hot-key join (SkewJoin.saltedEquiJoin): the oracle is the
    // PLAIN join — green proves salting is result-invisible (every big
    // row meets exactly the small-side replica carrying its salt).
    // The revenue agg keeps the output compact and order-independent.
    "q107_salted_join" -> q(
      """SELECT s_nationkey,
                CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
                CAST(count(*) AS BIGINT) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey
         ORDER BY s_nationkey""") { (s, dir) =>
      graft.operators.SkewJoin.saltedEquiJoin(
          t(s, dir, "lineitem"), "l_suppkey", col("l_orderkey"),
          t(s, dir, "supplier"), "s_suppkey", nSalts = 8)
        .groupBy("s_nationkey")
        .agg(
          sum(tenthCents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_e4"),
          count(lit(1)).as("n_items"))
        .orderBy("s_nationkey")
    }
  )
}
