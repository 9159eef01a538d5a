package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Needs its own SparkSession (withExtensions only applies at session
  * creation). getOrCreate would return the suite-shared session and skip
  * the extensions, so default/active are cleared around creation — the
  * underlying SparkContext is still reused. */
class ExtensionsSpec extends AnyFunSuite {

  test("custom expressions are callable from SQL via GraftExtensions") {
    graft.SparkSpec.session // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT array_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
                  rolling_hash64('hello world') AS h,
                  rolling_hash64('') AS h0""").head()
      assert(r.getLong(0) == 32L)
      assert(r.getLong(2) == 0xcbf29ce484222325L)
      // SQL path agrees with the Column API path
      import spark.implicits._
      val viaColumn = Seq("hello world").toDF("s")
        .select(RollingHash64($"s")).as[Long].head()
      assert(r.getLong(1) == viaColumn)
      // sketch expressions: SQL == Column API, bit for bit
      val s = spark.sql(
        """SELECT simhash64(array('the', 'quick', 'fox')) AS sh,
                  minhash_sig(array(xxhash64('a'), xxhash64('b')), 4) AS mh""").head()
      val shCol = Seq(Seq("the", "quick", "fox")).toDF("t")
        .select(SimHash64($"t")).as[Long].head()
      assert(s.getLong(0) == shCol)
      assert(s.getSeq[Long](1).length == 4)
      // non-literal k is rejected, not silently misread
      intercept[Exception] {
        spark.sql("SELECT minhash_sig(array(1L), cast(rand()*4 as int))").collect()
      }
      // line dedup from SQL: keep-first semantics
      val dl = spark.sql("SELECT dedup_lines('a\nb\na\nc\nb') AS d").head()
      assert(dl.getString(0) == "a\nb\nc")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
