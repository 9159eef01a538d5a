package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.types._

/** Registry-wide output-type contract (round-6 lesson).
  *
  * The external correctness harness compares Spark parquet dumps to
  * DuckDB oracle results through PANDAS frames. In that path the two
  * engines canonicalize identically ONLY for plain atomic types:
  * string / long / int / double / date / timestamp / boolean. Types
  * that r5 proved outside the envelope:
  *
  *   - DecimalType: Spark parquet -> Decimal objects; DuckDB .df() ->
  *     float64. Same value, different cell string -> hash mismatch
  *     (r5: q132, q161, q162, q211).
  *   - ArrayType (any nesting): pandas sort_values dies on ndarray
  *     cells -> the whole query ERRORS the gate (r5: q159).
  *   - MapType/StructType: same unhashable-cell failure.
  *
  * So: every ORACLED query must emit only envelope types. Fixed-point
  * fractional results are published as scaled integers (`*_e6`/`*_e9`)
  * — the operator APIs keep their exact DECIMAL columns; only the
  * registered projection converts. Non-oracled (rows-only) queries may
  * return arrays (the driver only counts their rows, never sorts
  * cells), but must still be parquet-writable.
  */
class OutputContractSpec extends SparkSpec {

  private val envelope: Set[DataType] = Set(
    StringType, LongType, IntegerType, DoubleType,
    DateType, TimestampType, TimestampNTZType, BooleanType)

  test("every oracled query emits only driver-envelope atomic types") {
    val oracled = SparkEntry.oracleSql.keySet
    val bad = oracled.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.schema.fields.collect {
        case f if !envelope.contains(f.dataType) =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"oracled queries with out-of-envelope output types:\n  ${bad.mkString("\n  ")}")
  }

  test("non-oracled queries have parquet-writable, driver-loadable schemas") {
    // The driver loads every dump with pandas to count rows — MapType
    // arrives as an object column and still counts; all Spark SQL
    // types are parquet-writable except CalendarInterval/UDT, which
    // must not appear.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val bad = rowsOnly.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[CalendarIntervalType] ||
          f.dataType.typeName == "interval" =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty, s"non-parquet-writable outputs: ${bad.mkString(", ")}")
  }
}
