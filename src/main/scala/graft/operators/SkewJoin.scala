package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join: the manual fix for hot-key skew when AQE's skew
  * split can't help — a shuffled join where ONE key carries a large
  * fraction of the probe side (every lineitem of a mega-customer, every
  * event of a bot account). A plain hash shuffle sends the whole hot
  * key to one task; that task runs for hours while 999 executors idle.
  *
  * Construction: the big side gets a deterministic salt in [0, nSalts)
  * derived from a NON-key column (salting by the key would keep the hot
  * key together — the point is to split it); the small side is
  * replicated once per salt value. The join becomes an equi-join on
  * (key, salt), so the hot key spreads over `nSalts` shuffle partitions
  * at the cost of building the small side's hash table nSalts times.
  * Inner and left-outer joins are exactly equivalent to the unsalted
  * join (each big row matches precisely the replica carrying its own
  * salt); right/full-outer are rejected — the replicated small side
  * would multiply its unmatched rows.
  *
  * When to reach for it at 100 TB: the small side is too big to
  * broadcast (else broadcast and no shuffle touches the big side) AND
  * the key histogram is power-law. AQE's skewedJoin handles sort-merge
  * skew post-hoc by splitting partitions, but only OPTIMIZE-able shapes;
  * salting is the plan-level guarantee that works for any shuffle join
  * and survives a cluster with AQE disabled.
  *
  * reference: the reference joins its star schema on Snowflake
  * (transform.py:85-118) where the warehouse handles distribution; this
  * operator is the explicit Spark-side answer for the same join under a
  * skewed key.
  */
object SkewJoin {

  /** @param saltSource any big-side column (or expression) that is NOT
    *                    the join key — ideally near-unique (a row id, an
    *                    order key) so the hot key spreads uniformly. The
    *                    salt is `pmod(hash(saltSource), nSalts)`:
    *                    deterministic, so retried tasks re-derive the
    *                    same salt (a random salt breaks exactly-once
    *                    under task retry). */
  def saltedEquiJoin(big: DataFrame, bigKey: String, saltSource: Column,
                     small: DataFrame, smallKey: String,
                     nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter").contains(jt),
      s"saltedEquiJoin supports inner/left_outer only, got $joinType " +
        "(the replicated small side would multiply right/full-outer nulls)")
    val bigS = big.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS,
        bigS(bigKey) === smallS(smallKey) && bigS("__salt") === smallS("__salt"),
        joinType)
      .drop(bigS("__salt")).drop(smallS("__salt"))
  }
}
