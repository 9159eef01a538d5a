package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K3: the reference's 3-type warehouse model. Snowflake DDL inferred from
  * the first Parquet footer collapses every column to VARCHAR / FLOAT /
  * NUMBER: `string -> VARCHAR`, `*float* -> FLOAT`, `*int* -> NUMBER`,
  * anything else -> VARCHAR (reference:
  * airflow/dags/plugins/snowflake_load.py:136-165, mapping at 147-154).
  * Timestamps, dates, booleans, nested types all degrade to VARCHAR.
  *
  * In Spark the schema rides in the plan, so no DDL step exists; this
  * transform reproduces the *observable* type semantics for parity mode.
  * Pure projection — no shuffle, codegen'd.
  */
object Narrow {

  /** Apply the 3-type narrowing to a DataFrame. Timestamps are formatted
    * explicitly (not `cast(string)`) so the textual form is deterministic
    * and engine-independent. */
  def toWarehouseTypes(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val narrowed = f.dataType match {
        case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
          c.cast(LongType) // NUMBER
        case _: FloatType | _: DoubleType => c.cast(DoubleType) // FLOAT
        case _: DecimalType => c.cast(DoubleType)
        case _: StringType => c
        case _: TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
        case _: DateType => date_format(c, "yyyy-MM-dd")
        case _ => c.cast(StringType) // everything else -> VARCHAR
      }
      narrowed.as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Identifier normalization: the reference upper-cases table/column
    * identifiers at DDL time (snowflake_load.py:152,154); we normalize to
    * lower-case (equivalent case-insensitive semantics, Spark-idiomatic). */
  def lowerCaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSeq: _*)
}
