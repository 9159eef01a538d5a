package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("diffByKey: all four verdicts, null-safe hashing") {
    val left = Seq(
      (1L, Some("a"), Some(10L)), // match
      (2L, Some("b"), Some(20L)), // drift (value changes)
      (3L, Some("c"), None),      // match with a null value
      (4L, None, Some(40L)),      // drift: null -> value
      (5L, Some("e"), Some(50L))  // only_left
    ).toDF("id", "s", "v")
    val right = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("B"), Some(20L)),
      (3L, Some("c"), None),
      (4L, Some(""), Some(40L)), // null vs empty string must NOT match
      (6L, Some("f"), Some(60L)) // only_right
    ).toDF("id", "s", "v")
    val got = Reconcile.diffByKey(left, right, "id", Seq("s", "v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "match", 2L -> "value_drift", 3L -> "match",
      4L -> "value_drift", 5L -> "only_left", 6L -> "only_right"))
  }

  test("diffByKey: separator prevents concatenation collisions") {
    // ("ab", "c") vs ("a", "bc") concatenate identically without a
    // separator; the verdict must still be drift
    val l = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val r = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val got = Reconcile.diffByKey(l, r, "id", Seq("x", "y"))
      .as[(Long, String)].head()
    assert(got._2 == "value_drift")
  }

  test("fuzzyMatchPairs: within-band edits found, each pair once") {
    val names = Seq(
      (1L, "acme corp"), (2L, "acme corp."),   // dist 1
      (3L, "acme korp"),                        // dist 1 of #1, 2 of #2
      (4L, "zenith ltd"), (5L, "zenith ltd"),   // dist 0 duplicates
      (6L, "bcme corp")                         // dist 1 of #1 but first char differs -> blocked out
    ).toDF("id", "nm")
    val got = Reconcile.fuzzyMatchPairs(names, "id", "nm", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L), (4L, 5L, 0L)))
  }

  test("schemaDrift reports added/removed/retyped, empty when identical") {
    val old = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val newer = Seq((1L, 2, true)).toDF("id", "score", "active")
    val drift = Reconcile.schemaDrift(old, newer)
      .as[(String, String, Option[String], Option[String])].collect().toSet
    assert(drift == Set(
      ("name", "removed", Some("string"), None),
      ("active", "added", None, Some("boolean")),
      ("score", "retyped", Some("double"), Some("int"))))
    assert(Reconcile.schemaDrift(old, old).isEmpty)
  }

  test("fingerprint: order-independent, value-sensitive, null-safe; dup-pair caveat holds") {
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Reconcile.fingerprint(df, Seq("k", "v"), "t").collect().head
      (r.getLong(1), r.getLong(2))
    }
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, None)).toDF("k", "v")
    val shuffled = Seq((3L, Option.empty[String]), (1L, Some("x")), (2L, Some("y")))
      .toDF("k", "v").repartition(7)
    assert(fp(a) == fp(shuffled), "row order and partitioning must not matter")
    val changed = Seq((1L, Some("x")), (2L, Some("Y")), (3L, None)).toDF("k", "v")
    assert(fp(a) != fp(changed), "a one-value change must flip the fingerprint")
    // the documented caveat: an identical duplicated PAIR cancels in the
    // XOR — only the row count still tells the tables apart
    val dupPair = Seq((1L, Some("x")), (2L, Some("y")), (2L, Some("y")),
      (2L, Some("y")), (3L, None)).toDF("k", "v")
    val (na, xa) = fp(a); val (nd, xd) = fp(dupPair)
    assert(xa == xd && na != nd)
  }
}
