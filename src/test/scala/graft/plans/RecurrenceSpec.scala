package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DecayedScan custom physical operator: correctness against a
  * hand-rolled fold, plan shape (our exec node + exactly one exchange),
  * and key-boundary isolation across partitions. */
class RecurrenceSpec extends SparkSpec {
  import spark.implicits._

  private def referenceFold(rows: Seq[(Long, Long, Long)],
                            num: Long, den: Long): Map[(Long, Long), Long] = {
    // (key, ord, value) -> (key, ord) -> expected state
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      var s = 0L
      rs.sortBy(_._2).map { case (_, o, v) =>
        s = (s * num) / den + v // truncating, like DuckDB // and Spark DIV
        (k, o) -> s
      }
    }
  }

  test("matches a hand-rolled per-key fold on shuffled input") {
    val data = Seq(
      (1L, 1L, 100L), (1L, 2L, 50L), (1L, 3L, 0L), (1L, 4L, 7L),
      (2L, 1L, 10L), (2L, 2L, 10L), (2L, 3L, 10L),
      (3L, 1L, 999L))
    val expected = referenceFold(data, 1, 2)
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(data), 5)
      .toDF("k", "o", "v")
    val out = Recurrence.decayedSum(df, "k", Seq("o"), "v", 1, 2, "s")
      .select("k", "o", "s").as[(Long, Long, Long)].collect()
    assert(out.length == data.length)
    out.foreach { case (k, o, s) => assert(s == expected((k, o)), s"key $k ord $o") }
  }

  test("plan contains DecayedScanExec fed by ONE exchange + sort") {
    val df = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"),
        (col("value") * 100).cast("long").as("v"))
    val out = Recurrence.decayedSum(df, "user_id", Seq("event_id"), "v", 9, 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("DecayedScan"), plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(plan.contains("Sort ["), plan.take(2000))
  }

  test("differential vs window closed form for pure running sum (num=den=1)") {
    // with decay 1/1 the recurrence IS a running sum, which windows can
    // express — differential-test the custom exec against the built-in
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value") * 100).cast("long").as("v"))
    val custom = Recurrence.decayedSum(ev, "user_id", Seq("ts", "event_id"), "v", 1, 1, "s")
      .select(col("user_id"), col("event_id"), col("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val builtin = ev.select(col("user_id"), col("event_id"),
      sum("v").over(w).as("s"))
    assert(custom.exceptAll(builtin).isEmpty && builtin.exceptAll(custom).isEmpty)
  }

  test("null values contribute zero; key groups never bleed") {
    val df = Seq((1L, 1L, Some(5L)), (1L, 2L, None), (1L, 3L, Some(3L)),
      (2L, 1L, None)).toDF("k", "o", "v")
    val out = Recurrence.decayedSum(df, "k", Seq("o"), "v", 1, 1, "s")
      .select("k", "o", "s").as[(Long, Long, Long)].collect().toMap2
    assert(out((1L, 1L)) == 5L && out((1L, 2L)) == 5L && out((1L, 3L)) == 8L)
    assert(out((2L, 1L)) == 0L)
  }

  test("holt: hand-computed coupled level/trend, including negative trend") {
    // key 1: v = 100, 40, 40, 40 — a level drop pulls trend negative,
    // exercising truncating (not floor) division on negatives
    //   t1: l=100 b=0
    //   t2: l=(40+100+0)/2=70,  b=(0+(70-100))/2  = -15
    //   t3: l=(40+70-15)/2=47,  b=(-15+(47-70))/2 = -19
    //   t4: l=(40+47-19)/2=34,  b=(-19+(34-47))/2 = -16
    val df = Seq((1L, 1L, 100L), (1L, 2L, 40L), (1L, 3L, 40L), (1L, 4L, 40L),
      (2L, 1L, 10L), (2L, 2L, 30L)).toDF("k", "o", "v")
    val out = Recurrence.holt(df, "k", Seq("o"), "v")
      .select("k", "o", "level", "trend")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(out((1L, 1L)) == (100L, 0L))
    assert(out((1L, 2L)) == (70L, -15L))
    assert(out((1L, 3L)) == (47L, -19L))
    assert(out((1L, 4L)) == (34L, -16L))
    assert(out((2L, 1L)) == (10L, 0L))
    assert(out((2L, 2L)) == (20L, 5L)) // l=(30+10+0)/2=20, b=(0+10)/2=5
  }

  test("holt plan: HoltScanExec fed by ONE exchange + sort, like DecayedScan") {
    val df = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"),
        (col("value") * 100).cast("long").as("v"))
    val plan = Recurrence.holt(df, "user_id", Seq("event_id"), "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HoltScan"), plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  private implicit class Map2[A, B, C](arr: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = arr.map(t => (t._1, t._2) -> t._3).toMap
  }
}
