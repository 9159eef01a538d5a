package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: points joined to intervals containing them —
  * the non-equi join shape Spark would otherwise plan as a broadcast
  * nested loop (or a full cartesian product at scale).
  *
  * Construction: bucket time into `maxWidthSec`-wide cells; a point in
  * bucket b can only fall inside intervals starting in buckets {b-1, b}
  * (given interval width <= maxWidthSec), so the interval side explodes
  * into 2 bucket rows and the join becomes an EQUI join on the bucket
  * plus an exact range filter. O(matches) work, normal hash shuffle,
  * no cartesian blow-up — the standard bucketed range-join technique
  * every warehouse engine implements internally. */
object RangeJoin {

  /** @param maxWidthSec the bucket width, sized to the TYPICAL interval
    *                    width. An interval claims every bucket it
    *                    touches — `sequence(floor(lo/w), floor(hi/w))`
    *                    — so results are correct for ANY width (the old
    *                    fixed {b, b+1} expansion silently DROPPED
    *                    matches for intervals wider than one bucket);
    *                    an interval much wider than the bucket just
    *                    explodes into proportionally more rows. */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointTs: String, loCol: String, hiCol: String,
                   maxWidthSec: Long, joinType: String = "inner"): DataFrame = {
    // NTZ timestamps can't cast directly to double; go via TIMESTAMP
    // (session tz is UTC, so epoch seconds are well-defined either way)
    def epochSec(c: Column): Column = c.cast("timestamp").cast("double")
    val pb = points.withColumn("__pb",
      floor(epochSec(col(pointTs)) / maxWidthSec).cast("long"))
    val ib = intervals
      .withColumn("__pb", explode(sequence(
        floor(epochSec(col(loCol)) / maxWidthSec).cast("long"),
        floor(epochSec(col(hiCol)) / maxWidthSec).cast("long"))))
    val joined = ib.join(pb,
      ib("__pb") === pb("__pb")
        && pb(pointTs) >= ib(loCol) && pb(pointTs) <= ib(hiCol),
      joinType)
    joined.drop("__pb")
  }

  /** Interval × interval OVERLAP join (the genomics/sessions shape):
    * every (left, right) pair with `leftLo <= rightHi AND rightLo <=
    * leftHi` (inclusive endpoints). Both sides explode into the
    * time bins they touch and meet on an equi-join of the bin key —
    * the plan Catalyst can hash-partition, instead of the
    * BroadcastNestedLoopJoin a raw inequality join degenerates to.
    * A pair sharing several bins is emitted EXACTLY once, gated to
    * the canonical bin containing the intersection's start — no
    * distinct pass, no dedup shuffle.
    *
    * Scale shape: shuffle on the bin key only; per-bin work is
    * (left-in-bin × right-in-bin), so size `binSizeSec` near the
    * typical interval width — wide outliers cost proportionally more
    * bin rows, never correctness. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          leftLo: String, leftHi: String,
                          rightLo: String, rightHi: String,
                          binSizeSec: Long): DataFrame = {
    def epochSec(c: Column): Column = c.cast("timestamp").cast("double")
    def bin(c: Column): Column = floor(epochSec(c) / binSizeSec).cast("long")
    val lb = left.withColumn("__b",
      explode(sequence(bin(col(leftLo)), bin(col(leftHi)))))
    val rb = right.withColumn("__b",
      explode(sequence(bin(col(rightLo)), bin(col(rightHi)))))
    lb.join(rb,
        lb("__b") === rb("__b")
          && lb(leftLo) <= rb(rightHi) && rb(rightLo) <= lb(leftHi)
          && lb("__b") === bin(greatest(lb(leftLo), rb(rightLo))))
      .drop("__b")
  }
}
