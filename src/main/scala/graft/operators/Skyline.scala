package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) queries — "the orders no other order beats
  * on BOTH recency and value" (extension surface; no reference analog).
  *
  * Row r is on the frontier iff no row s has s.x ≥ r.x AND s.y ≥ r.y
  * with at least one strict inequality (maximize both dimensions).
  * Equal-(x, y) rows do not dominate each other, so exact ties all
  * surface.
  */
object Skyline {

  /** 2-D skyline, maximizing `xCol` and `yCol`.
    *
    * The naive formulation is a NOT EXISTS self-join — O(n²)
    * comparisons, a non-starter at any scale. This decomposition is
    * O(n) + a window over the DISTINCT-x relation:
    *   1. one hash aggregate: per-x max of y (any row below its x's
    *      max is dominated by that max row — same x, higher y);
    *   2. over the per-x maxima ordered by x DESC, a running max of y
    *      over STRICTLY-earlier rows: x survives iff its max-y beats
    *      every higher-x max-y (equality loses — the higher-x row
    *      dominates with x strict, y ≥);
    *   3. broadcast the surviving (x, max-y) pairs back as an
    *      equi-semi-join to recover the original rows (frontier rows
    *      with duplicate (x, y) all return).
    *
    * Scale contract: the step-2 window is a SINGLE partition over
    * distinct x values — use an x with bounded cardinality (dates,
    * buckets, prices-in-cents), the usual skyline axis. The raw
    * relation is touched only by the aggregate (map-side partials) and
    * the final broadcast join; neither sorts it. */
  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val xmax = df.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__ymax"))
    val laterMax = max(col("__ymax")).over(
      Window.orderBy(col("__x").desc)
        .rowsBetween(Window.unboundedPreceding, -1))
    val frontier = xmax.withColumn("__later", laterMax)
      .filter(col("__later").isNull || col("__ymax") > col("__later"))
      .select(col("__x"), col("__ymax"))
    df.join(broadcast(frontier),
        df(xCol) === col("__x") && df(yCol) === col("__ymax"), "left_semi")
  }
}
