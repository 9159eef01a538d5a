package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {

  /** A registered operator query: the Spark implementation plus, when
    * SQL-expressible, an equivalent ANSI SQL oracle for DuckDB. */
  final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  def q(oracle: String)(fn: (SparkSession, String) => DataFrame): Q = Q(fn, Some(oracle))
  def qNoOracle(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)

  /** Load a driver test table (TESTDATA.md): `$dir/<name>.parquet`.
    *
    * The `events.ts` column has shipped in two physical forms across
    * driver rounds, both normalized here to a session-zone TIMESTAMP so
    * every downstream query sees ONE type:
    *   - TIMESTAMP(NANOS) (rounds ≤5): Spark's vectorized reader
    *     rejects it; read nanos as long and convert with integer
    *     division (`DIV`, not `/` — double division loses ~200ns at
    *     epoch-nanos magnitude, enough to shift microsecond values).
    *   - timestamp[us] without UTC adjustment (round 6 regen): arrives
    *     as TIMESTAMP_NTZ, which unix_micros()/double casts reject;
    *     cast to TIMESTAMP — the session zone is pinned UTC everywhere
    *     (Verify/Bench/tests), so the wall-clock reinterpretation is
    *     value-identical and matches DuckDB's naive reading. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Exact integer-cents arithmetic for money columns. The test tables
    * carry 2-decimal doubles; summing doubles directly is order-dependent
    * in the last bits (and so engine-dependent), while integer sums are
    * exact in any order — this keeps oracle hash-comparisons stable.
    * DuckDB equivalent: `CAST(floor(x*100 + 0.5) AS BIGINT)`. */
  def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** 1e-4-dollar units for discounted prices (price*(1-disc) has 4
    * decimals). DuckDB: `CAST(floor(x*10000 + 0.5) AS BIGINT)`. */
  def tenthCents(c: Column): Column = floor(c * 10000 + 0.5).cast("long")
}
