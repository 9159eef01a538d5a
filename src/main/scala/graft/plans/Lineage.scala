package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Column-level lineage from the analyzed Catalyst plan: which SOURCE
  * table columns feed each output column, through projections,
  * aggregates, windows, generators, and joins. The reference's dbt
  * layer tracks table-level lineage via ref() (SURVEY §2 C6); this is
  * the column-level refinement a governance/impact-analysis pass needs
  * ("which outputs break if we drop l_discount?").
  *
  * Pure plan-metadata traversal — no data is read and no job runs; the
  * result is a driver-local relation the size of the output schema. */
object Lineage {

  /** (output_column, source_table, source_column) rows, sorted. A
    * column with no scan ancestry (a literal) contributes no rows. */
  def columnLineage(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val srcs = sources(plan)
    val rows = plan.output.flatMap { a =>
      srcs.getOrElse(a.exprId, Set.empty).toSeq.sorted.map { case (t, c) =>
        Row(a.name, t, c)
      }
    }
    val schema = StructType(Seq(
      StructField("output_column", StringType, nullable = false),
      StructField("source_table", StringType, nullable = false),
      StructField("source_column", StringType, nullable = false)))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  private def tableName(lr: LogicalRelation): String = lr.relation match {
    case fs: HadoopFsRelation =>
      val base = fs.location.rootPaths.headOption
        .map(_.getName).getOrElse("<relation>")
      base.stripSuffix(".parquet")
    case _ => "<relation>"
  }

  /** exprId -> originating (table, column) set, built bottom-up. Named
    * expressions introduced anywhere (project lists, aggregates, window
    * lists, generator output) map to the union of their references'
    * sources; everything else passes its children's map through. */
  private def sources(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = {
    val fromChildren: Map[ExprId, Set[(String, String)]] = plan match {
      case lr: LogicalRelation =>
        val t = tableName(lr)
        lr.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case other =>
        other.children.map(sources)
          .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
    }
    def derive(nes: Seq[NamedExpression]): Map[ExprId, Set[(String, String)]] =
      nes.collect { case ne @ (_: Alias) =>
        ne.exprId -> ne.references.toSeq
          .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty)).toSet
      }.toMap
    val own: Map[ExprId, Set[(String, String)]] = plan match {
      case p: Project => derive(p.projectList)
      case a: Aggregate => derive(a.aggregateExpressions)
      case w: Window => derive(w.windowExpressions)
      case g: Generate =>
        val gs = g.generator.references.toSeq
          .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty)).toSet
        g.generatorOutput.map(a => a.exprId -> gs).toMap
      case _ => Map.empty
    }
    fromChildren ++ own
  }
}
