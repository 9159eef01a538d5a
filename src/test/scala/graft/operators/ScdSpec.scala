package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD maintenance invariants. q98/q99/q101 oracle the customer/orders
  * shapes; these specs pin the algebra on hand-built corners (null
  * attributes, absent keys, re-applied snapshots, carried columns) that
  * the test tables don't plant.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  // three daily snapshots: key 1 changes on day 3; key 2 changes on day
  // 2 then vanishes (absence leaves its run open); key 3 appears on day
  // 2; key 4 tracks a NULL attribute (null->null is "unchanged" under
  // <=>, null->value is a real change)
  private def s1 = Seq(
    (1L, Some("A"), d("2020-01-01")), (2L, Some("B"), d("2020-01-01")),
    (4L, None: Option[String], d("2020-01-01"))).toDF("k", "attr", "ts")
  private def s2 = Seq(
    (1L, Some("A"), d("2020-01-02")), (2L, Some("C"), d("2020-01-02")),
    (3L, Some("D"), d("2020-01-02")),
    (4L, None: Option[String], d("2020-01-02"))).toDF("k", "attr", "ts")
  private def s3 = Seq(
    (1L, Some("E"), d("2020-01-03")), (3L, Some("D"), d("2020-01-03")),
    (4L, Some("X"), d("2020-01-03"))).toDF("k", "attr", "ts")

  private val keys = Seq("k")
  private val attrs = Seq("attr")

  // sorted MULTISET of rows — a Set would collapse duplicate identical
  // rows and let a double-emitting union bug pass the invariants
  private def rows(df: DataFrame): Seq[(Long, Option[String], String, Option[String], Boolean)] =
    df.select("k", "attr", "effective_from", "effective_to", "is_current")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
        r.getBoolean(4))).toSeq.sorted

  private def applied: DataFrame = Seq(s2, s3).foldLeft(
    Scd.scd2FromSnapshots(s1, keys, "ts", Nil, attrs)) { (h, s) =>
    Scd.scd2Apply(h, s, keys, "ts", attrs)
  }

  test("iterated scd2Apply equals scd2FromSnapshots rebuild") {
    val rebuild = Scd.scd2FromSnapshots(
      s1.unionByName(s2).unionByName(s3), keys, "ts", Nil, attrs)
    assert(rows(applied) == rows(rebuild))
    // and the corners came out right
    val a = rows(applied).toSet
    assert(a.contains((2L, Some("C"), "2020-01-02", None, true))) // absent key stays open
    assert(a.contains((4L, None, "2020-01-01", Some("2020-01-03"), false))) // null->null no run, null->X closes
    assert(a.contains((1L, Some("E"), "2020-01-03", None, true)))
  }

  test("re-applying the same snapshot is a no-op") {
    val h = applied
    assert(rows(Scd.scd2Apply(h, s3, keys, "ts", attrs)) == rows(h))
  }

  test("scd2Apply with broadcastSnapshot=false matches the hinted plan") {
    val h = Scd.scd2FromSnapshots(s1, keys, "ts", Nil, attrs)
    val hinted = Scd.scd2Apply(h, s2, keys, "ts", attrs)
    val unhinted = Scd.scd2Apply(h, s2, keys, "ts", attrs,
      broadcastSnapshot = false)
    assert(rows(hinted) == rows(unhinted))
  }

  test("scd2Apply leaves closed runs untouched and appends new keys") {
    val h = applied
    val s4 = Seq((9L, Some("Z"), d("2020-01-04"))).toDF("k", "attr", "ts")
    val out = rows(Scd.scd2Apply(h, s4, keys, "ts", attrs))
    assert(out == (rows(h) :+ ((9L, Some("Z"), "2020-01-04", None, true))).sorted)
  }

  test("carryCols compose: apply propagates carried run-start columns") {
    // carry a per-observation source tag: history rows keep the tag of
    // their run-START observation; new/reopened runs take the snapshot's
    def tag(s: DataFrame, t: String) = s.withColumn("src", lit(t))
    val carried = Seq(tag(s2, "b2"), tag(s3, "b3")).foldLeft(
      Scd.scd2FromSnapshots(tag(s1, "b1"), keys, "ts", Nil, attrs,
        carryCols = Seq("src"))) { (h, s) =>
      Scd.scd2Apply(h, s, keys, "ts", attrs, carryCols = Seq("src"))
    }
    assert(carried.columns.contains("src"))
    val bySig = carried
      .select("k", "attr", "effective_from", "src")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2).toString) -> r.getString(3)).toMap
    // each run carries the batch tag of the snapshot that STARTED it
    assert(bySig((1L, Some("A"), "2020-01-01")) == "b1")
    assert(bySig((2L, Some("C"), "2020-01-02")) == "b2") // reopened by s2
    assert(bySig((3L, Some("D"), "2020-01-02")) == "b2") // new key in s2
    assert(bySig((1L, Some("E"), "2020-01-03")) == "b3")
    assert(bySig((4L, Some("X"), "2020-01-03")) == "b3")
    // and it equals the rebuild with the same carry
    val rebuild = Scd.scd2FromSnapshots(
      tag(s1, "b1").unionByName(tag(s2, "b2")).unionByName(tag(s3, "b3")),
      keys, "ts", Nil, attrs, carryCols = Seq("src"))
    def withSrc(df: DataFrame) = df
      .select("k", "attr", "src", "effective_from", "effective_to", "is_current")
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString("|"))
    assert(withSrc(carried) == withSrc(rebuild))
  }

  test("applyCdc: delete/update/insert in one batch, in-batch LWW, idempotent") {
    import spark.implicits._
    val cur = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "x", "D", 2L),   // delete key 1...
      (1L, "stale", "U", 1L), // ...superseding an earlier in-batch update
      (2L, "B2", "U", 1L),  // update key 2
      (9L, "new", "I", 1L)  // insert key 9; key 3 untouched
    ).toDF("k", "v", "op", "seq")
    val next = Scd.applyCdc(cur, changes, Seq("k"), "op", "seq")
    val got = next.as[(Long, String)].collect().toSet
    assert(got == Set((2L, "B2"), (3L, "c"), (9L, "new")))
    // re-applying the same batch reaches the same state (deletes are
    // no-ops on absent keys, upserts overwrite with identical payloads)
    val again = Scd.applyCdc(next, changes, Seq("k"), "op", "seq")
      .as[(Long, String)].collect().toSet
    assert(again == got)
  }

  test("pointInTimeJoin: each fact sees the run valid AT ITS time, never later") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // entity k1: state A on [d1, d5), B on [d5, open)
    val history = Seq(
      ("k1", "A", ts(1), Some(ts(5)), false),
      ("k1", "B", ts(5), None: Option[Timestamp], true)
    ).toDF("k", "state", "effective_from", "effective_to", "is_current")
    val facts = Seq(
      ("f_pre", "k1", ts(1)),   // first instant -> A
      ("f_mid", "k1", ts(3)),   // inside run A
      ("f_edge", "k1", ts(5)),  // boundary: half-open -> B, not A
      ("f_now", "k1", ts(9)),   // open run -> B
      ("f_alien", "k2", ts(3))  // unknown entity -> NULLs, row kept
    ).toDF("fid", "k", "t")
    val rows = Scd.pointInTimeJoin(facts, history, Seq("k"), "t")
      .select("fid", "state").collect()
    // exactly one row per fact — assert BEFORE collapsing to a Map,
    // or a duplicating join hides behind last-write-wins
    assert(rows.length == 5)
    val got = rows.map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "f_pre" -> Some("A"), "f_mid" -> Some("A"),
      "f_edge" -> Some("B"), "f_now" -> Some("B"),
      "f_alien" -> None))
  }

  test("diffToCdc: round trip applyCdc(old, diff(old, new)) == new; nulls honest") {
    import spark.implicits._
    val oldT = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("gone")), (5L, Some("same"))
    ).toDF("k", "v")
    val newT = Seq(
      (1L, Some("a2")),  // value change -> U
      (2L, None: Option[String]), // value -> NULL is a real change -> U
      (3L, None: Option[String]), // NULL == NULL under <=> -> no row
      (5L, Some("same")), // unchanged -> no row
      (9L, Some("new"))   // -> I; 4 is absent -> D
    ).toDF("k", "v")
    val cdc = Scd.diffToCdc(oldT, newT, Seq("k"))
    val ops = cdc.select("k", "op").as[(Long, String)].collect().toMap
    assert(ops == Map(1L -> "U", 2L -> "U", 4L -> "D", 9L -> "I"))
    // the round trip is exact
    val rebuilt = Scd.applyCdc(oldT, cdc, Seq("k"), "op", "seq")
      .as[(Long, Option[String])].collect().toSet
    assert(rebuilt == newT.as[(Long, Option[String])].collect().toSet)
    // diff of identical tables is empty
    assert(Scd.diffToCdc(oldT, oldT, Seq("k")).count() == 0)
  }
}
