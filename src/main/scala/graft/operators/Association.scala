package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (extension surface; no reference
  * analog — the classic retail companion to the warehouse's star
  * schema).
  */
object Association {

  /** Pairwise association rules over (basket, item) lines: for every
    * item pair co-occurring in ≥ `minSupport` baskets,
    *   confidence(a→b) = P(b ∈ basket | a ∈ basket)
    *   lift(a,b)       = P(a,b) / (P(a)·P(b))
    * Pairs are unordered (a < b); confidence is reported both ways.
    *
    * Scale shape: the pair generator is a self-equi-join ON THE BASKET
    * KEY — blowup per basket is (lines choose 2), bounded by basket
    * size, never corpus size (the all-pairs-of-items formulation is
    * quadratic in the catalog and is exactly what this avoids). Both
    * join sides are the same deduplicated relation, so the sort/
    * exchange is planned once and reused. Counts are exact longs;
    * confidence/lift divide exact operands at the end (IEEE-defined,
    * engine-portable — same contract as Stats).
    *
    * minSupport prunes AFTER pair counting (a pair seen once is noise,
    * but its count still had to be taken); at 100 TB the same shape
    * holds because the shuffle key is the basket id — skew only if one
    * basket is pathologically wide, the usual per-entity bound. */
  def marketBasket(df: DataFrame, basketCol: String, itemCol: String,
                   minSupport: Long = 2L): DataFrame = {
    // persisted: five consumers (both pair-join sides, two item-count
    // lookups, the basket total) would otherwise each re-scan and
    // re-deduplicate the raw lines — 5 full input scans at any scale.
    // All five read inside the ONE returned plan, so there is no
    // point the operator could unpersist at; release is session cache
    // hygiene (clearCache between operators, as Verify/Bench do)
    val items = df.select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = items.as("a")
      .join(items.as("b"),
        col(s"a.__basket") === col(s"b.__basket")
          && col(s"a.__item") < col(s"b.__item"))
      .groupBy(col(s"a.__item").as("item_a"), col(s"b.__item").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minSupport)
    val counts = items.groupBy(col("__item")).agg(count(lit(1)).as("__n"))
    val nBaskets = items.select(col("__basket")).distinct()
      .agg(count(lit(1)).as("__total"))
    pairs
      .join(counts.select(col("__item").as("item_a"), col("__n").as("__na")), "item_a")
      .join(counts.select(col("__item").as("item_b"), col("__n").as("__nb")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_n"),
        round(col("pair_n").cast("double") / col("__na").cast("double"), 6)
          .as("conf_a_to_b"),
        round(col("pair_n").cast("double") / col("__nb").cast("double"), 6)
          .as("conf_b_to_a"),
        round((col("pair_n") * col("__total")).cast("double")
          / (col("__na") * col("__nb")).cast("double"), 6).as("lift"))
  }
}
