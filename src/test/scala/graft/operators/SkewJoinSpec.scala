package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sf/customer.parquet")

  test("saltedEquiJoin inner == plain inner join") {
    val salted = SkewJoin.saltedEquiJoin(
      orders, "o_custkey", col("o_orderkey"), customer, "c_custkey", 8)
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedEquiJoin left-outer keeps unmatched big rows exactly once") {
    // drop half the customers so some orders have no match
    val halfCust = customer.filter(col("c_custkey") % 2 === 0)
    val salted = SkewJoin.saltedEquiJoin(
      orders, "o_custkey", col("o_orderkey"), halfCust, "c_custkey", 4,
      joinType = "left_outer")
    val plain = orders.join(halfCust,
      col("o_custkey") === col("c_custkey"), "left_outer")
    assert(salted.count() == orders.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedEquiJoin survives a pathological hot key") {
    // 10k rows, 99% on one key — the shape that stalls an unsalted task
    val big = spark.range(10000)
      .select(col("id"),
        when(col("id") % 100 === 0, col("id") % 7).otherwise(lit(42L)).as("k"))
    val small = Seq.tabulate(50)(i => (i.toLong, s"v$i")).toDF("k2", "v")
    val out = SkewJoin.saltedEquiJoin(big, "k", col("id"), small, "k2", 16)
    val expected = big.join(small, col("k") === col("k2"))
    assert(out.count() == expected.count())
    assert(out.exceptAll(expected).isEmpty)
    // the hot key's rows really do carry distinct salts (spread > 1 task)
    val salts = big.withColumn("__salt", pmod(hash(col("id")), lit(16)))
      .filter(col("k") === 42L).select("__salt").distinct().count()
    assert(salts == 16)
  }

  test("saltedEquiJoin rejects right/full outer") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(orders, "o_custkey", col("o_orderkey"),
        customer, "c_custkey", 4, joinType = "full_outer")
    }
  }
}
