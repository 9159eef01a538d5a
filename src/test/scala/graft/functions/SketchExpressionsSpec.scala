package graft.functions

import graft.SparkSpec
import graft.analytics.Dedup
import org.apache.spark.sql.functions._

class SketchExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("SimHash64 expression == explode+aggregate formulation, bit for bit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val viaExpr = Dedup.simhashByDoc(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val viaAgg = Dedup.simhashByDocAgg(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(viaAgg.nonEmpty && viaAgg.forall { case (id, sim) => viaExpr(id) == sim })
  }

  test("MinHashSig expression == xxhash64(seed, h) min-aggregate, bit for bit") {
    val k = 8
    val data = Seq((1L, Seq(11L, 22L, 33L)), (2L, Seq(44L, 55L))).toDF("id", "shash")
    val viaExpr = data.select(col("id"), MinHashSig(col("shash"), k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("h"))).as(s"m_$i"))
    val viaAgg = data.select(col("id"), explode(col("shash")).as("h"))
      .groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m_$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr == viaAgg)
  }

  test("SimHash64 rejects non-string arrays; empty array -> all-zero sim") {
    val empty = Seq((1L, Seq.empty[String])).toDF("id", "toks")
    assert(empty.select(SimHash64(col("toks"))).as[Long].head() == 0L)
    intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "xs")
        .select(SimHash64(col("xs"))).collect()
    }
  }
}
