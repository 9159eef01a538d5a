package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytics layer: the reference's dbt star schema (2 dimensions,
  * 3 facts) re-expressed as DataFrame expressions (reference:
  * dbt/coretelecom/models/ — dim_agents.sql:6-11, dim_customers.sql:4-12,
  * fact_call_logs.sql:3-16, fact_social_media_complaints.sql:3-17,
  * fact_web_complaints.sql:3-17; build DAG via ref() edges —
  * fact_call_logs.sql:13,15).
  *
  * Join shape (J1-J3): fact INNER JOIN dim_customers ON customer_id INNER
  * JOIN dim_agents ON agent_id, projecting only fact-side columns. The
  * dims act as referential filters. Dims are small — always broadcast, so
  * the fact side never shuffles (critical at 100 TB: the fact table
  * streams through map-side hash joins with zero exchange).
  *
  * Parity note (SURVEY §7.5.5): `inner` (not `left_semi`) is kept
  * bug-for-bug — a duplicated dim key multiplies fact rows, exactly as the
  * reference's SQL would.
  */
object StarSchema {

  /** P6: a dimension = projection + aliases over a staging table
    * (reference: dim_agents.sql:6-11). */
  def dim(staging: DataFrame, projection: (String, String)*): DataFrame =
    staging.select(projection.map { case (from, to) => col(from).as(to) }: _*)

  /** J1-J3 + P7: a fact = fact-side projection referentially filtered by
    * inner joins to broadcast dims (reference: fact_call_logs.sql:3-16).
    * Each dim join is (dim, factKey, dimKey); only the dim's key column is
    * read (column pruning reaches the dim scan). */
  def fact(factTable: DataFrame, factCols: Seq[String],
           dimJoins: Seq[(DataFrame, String, String)]): DataFrame = {
    val joined = dimJoins.foldLeft(factTable) { case (acc, (dimDf, factKey, dimKey)) =>
      acc.join(broadcast(dimDf.select(col(dimKey).as(factKey))), Seq(factKey), "inner")
    }
    joined.select(factCols.map(col): _*)
  }

  /** C6: build order encoded explicitly — dims before facts, like dbt's
    * ref() DAG. Each model is a function of the catalog built so far
    * (staging ++ earlier models). Returns all built models by name. */
  def build(staging: Map[String, DataFrame],
            dims: Seq[(String, Map[String, DataFrame] => DataFrame)],
            facts: Seq[(String, Map[String, DataFrame] => DataFrame)]): Map[String, DataFrame] = {
    // P8: staging views are identity pass-throughs (models/staging/*.sql)
    staging.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    val afterDims = dims.foldLeft(staging) { case (catalog, (name, f)) =>
      val d = f(catalog); d.createOrReplaceTempView(name); catalog + (name -> d)
    }
    val all = facts.foldLeft(afterDims) { case (catalog, (name, f)) =>
      val df = f(catalog); df.createOrReplaceTempView(name); catalog + (name -> df)
    }
    all -- staging.keys
  }
}
