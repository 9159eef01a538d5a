package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Day-2 lifecycle of the two persisted index families: exactly-once
  * batch appends (a replayed/retried daily job must not duplicate
  * posting rows or PQ codes), ledger-gated visibility (a crashed,
  * never-retried write is invisible), delta compaction (bounded file
  * counts, bit-equal probe/serve, pruning intact), the MinHash
  * streaming maintenance face, and the IVF-PQ health report. */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select($"doc_id", $"text")
  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def probePairs(idx: String, batch: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    Dedup.probeMinhashIndex(spark, idx, batch, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("appendToMinhashIndex: replaying the same batch id is a no-op (probe unchanged, no duplicate pairs)") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val day1 = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    // probe batch: exact twins of the appended day-1 docs
    val probe = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val idx = tmp("mh-replay")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx, batchId = "d1")
    val once = probePairs(idx, probe)
    assert(once.exists(_._2 >= 1000L), "appended docs must be probe-visible")
    // replay the SAME batch id — an at-least-once orchestrator retry
    Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx, batchId = "d1")
    Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx, batchId = "d1")
    val twice = probePairs(idx, probe)
    assert(twice == once, "replayed append must not change the probe result")
    // and no duplicate PAIR ROWS from duplicated shingle fanout: the
    // probe result is a set of distinct keys with one row each
    val rows = Dedup.probeMinhashIndex(spark, idx, probe, "doc_id", "text")
    assert(rows.count() == rows.dropDuplicates("id_new", "id_corpus").count(),
      "no duplicated verified-pair rows")
  }

  test("minhash index: an unledgered (crashed, never-retried) batch dir is invisible to probes") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val ghost = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    val probe = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val idx = tmp("mh-ghost")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val baseline = probePairs(idx, probe)
    // simulate the crash window: component dirs written, ledger never
    // appended (appendToMinhashIndex ledgers LAST)
    val (n, numHashes, bands) = Dedup.minhashIndexParams(spark, idx)
    val hashed = Dedup.shingleHashSets(ghost, "doc_id", "text", n)
    hashed.write.mode("overwrite").parquet(s"$idx/shingles_delta/batch=ghost")
    Dedup.bandRowsOf(hashed, numHashes, bands)
      .write.mode("overwrite").parquet(s"$idx/bands_delta/batch=ghost")
    assert(probePairs(idx, probe) == baseline,
      "an unledgered batch must not be probe-visible")
    // the retry completes the append (same id, same dirs) and ledgers it
    Dedup.appendToMinhashIndex(ghost, "doc_id", "text", idx, batchId = "ghost")
    assert(probePairs(idx, probe) != baseline,
      "the completed retry makes the batch visible exactly once")
  }

  test("compactMinhashIndex: bounded files, bit-equal probe, ledger survives") {
    val corpus = docs.filter($"doc_id" % 4 === 1)
    val idx = tmp("mh-compact")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    // several small daily batches -> many small delta files
    (0 until 3).foreach { d =>
      val day = docs.filter($"doc_id" % 4 === 2 && $"doc_id" % 3 === d)
        .select(($"doc_id" + 1000L * (d + 1)).as("doc_id"), $"text")
      Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = s"d$d")
    }
    val probe = docs.filter($"doc_id" % 4 === 2)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val before = probePairs(idx, probe)
    val (filesBefore, filesAfter, rows) = Dedup.compactMinhashIndex(spark, idx)
    assert(rows > 0 && filesAfter < filesBefore,
      s"compaction must shrink the file population ($filesBefore -> $filesAfter)")
    // default rowsPerFile >> this corpus: at most one file per storage
    // bucket per component (the bucket partitioning is the probe's
    // pruning layout and must survive compaction)
    val (pbN, sbN) = Dedup.minhashIndexBuckets(spark, idx)
    assert(filesAfter <= pbN + sbN,
      s"post-compaction file count bounded by the bucket layout: $filesAfter")
    assert(probePairs(idx, probe) == before,
      "compaction is a bit-equal rewrite of the probed relation")
    // the ledger survives: a late replay of a compacted batch is still
    // skipped (its rows are already in the compacted base)
    val day0 = docs.filter($"doc_id" % 4 === 2 && $"doc_id" % 3 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day0, "doc_id", "text", idx, batchId = "d0")
    assert(probePairs(idx, probe) == before,
      "a replayed pre-compaction batch must still be a no-op")
  }

  test("appendToIvfPqIndex: replaying the same batch id is a no-op (serve unchanged, no duplicate ids)") {
    val e = embeddings
    val base = e.filter($"vec_id" % 4 =!= 0)
    val newbies = e.filter($"vec_id" % 4 === 0)
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-replay")
    Similarity.writeIvfPqIndex(base, "vec_id", "embedding", cb, idx)
    Similarity.appendToIvfPqIndex(spark, idx, newbies, "vec_id", "embedding",
      batchId = "d1")
    def serve(qid: Long): Seq[(Long, Long)] =
      Similarity.topKIvfPqFromIndex(spark, idx, e.filter($"vec_id" === qid),
        "vec_id", "embedding", k = 20, cb)
        .as[(Long, Long)].collect().toSeq
    val once = serve(8L)
    assert(once.map(_._1).contains(8L), "ingested vector retrievable")
    Similarity.appendToIvfPqIndex(spark, idx, newbies, "vec_id", "embedding",
      batchId = "d1")
    val twice = serve(8L)
    assert(twice == once, "replayed append must not change serving")
    // duplicated codes would surface as the same id twice in a top-k
    assert(twice.map(_._1).distinct.size == twice.size,
      "no duplicate ids in the served top-k")
    // code count unchanged by the replay
    val n1 = IndexStore.storedComponent(spark, idx, "codes").count()
    Similarity.appendToIvfPqIndex(spark, idx, newbies, "vec_id", "embedding",
      batchId = "d1")
    assert(IndexStore.storedComponent(spark, idx, "codes").count() == n1)
  }

  test("compactIvfPqIndex: merges base+delta+stream, bounded files, bit-equal serving, pruning intact") {
    val e = embeddings
    val base = e.filter($"vec_id" % 4 === 1)
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-compact")
    Similarity.writeIvfPqIndex(base, "vec_id", "embedding", cb, idx)
    // batch delta
    Similarity.appendToIvfPqIndex(spark, idx,
      e.filter($"vec_id" % 4 === 2), "vec_id", "embedding", batchId = "d1")
    // stream delta through the file sink
    val src = tmp("ivfpq-compact-src")
    e.filter($"vec_id" % 4 === 3).select("vec_id", "embedding")
      .repartition(2).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(e.select("vec_id", "embedding").schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val sq = graft.streaming.IncrementalStream.ivfPqMaintenanceStream(
      stream, "vec_id", "embedding", idx, tmp("ivfpq-compact-ckpt"))
    sq.awaitTermination()
    def serve(qid: Long): Seq[(Long, Long)] =
      Similarity.topKIvfPqFromIndex(spark, idx, e.filter($"vec_id" === qid),
        "vec_id", "embedding", k = 20, cb)
        .as[(Long, Long)].collect().toSeq
    val before7 = serve(7L)
    val beforeCount = IndexStore.storedComponent(spark, idx, "codes").count()
    val (filesBefore, filesAfter, rows) =
      Similarity.compactIvfPqIndex(spark, idx)
    assert(rows == beforeCount)
    assert(filesAfter < filesBefore,
      s"compaction must shrink files ($filesBefore -> $filesAfter)")
    // one file per cell (16 default cells) is the target shape
    assert(filesAfter <= 16, s"bounded by the cell count: $filesAfter")
    assert(serve(7L) == before7, "compaction is serve-bit-equal")
    assert(IndexStore.storedComponent(spark, idx, "codes").count() == beforeCount)
    // the PartitionFilters pruning contract survives the rewrite
    val plan = Similarity.topKIvfPqFromIndex(spark, idx,
      e.filter($"vec_id" === 7), "vec_id", "embedding", k = 20, cb)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"expected cell partition pruning post-compaction in:\n$plan")
    // a replayed pre-compaction batch is still skipped
    Similarity.appendToIvfPqIndex(spark, idx,
      e.filter($"vec_id" % 4 === 2), "vec_id", "embedding", batchId = "d1")
    assert(IndexStore.storedComponent(spark, idx, "codes").count() == beforeCount)
  }

  test("minhashMaintenanceStream == appendToMinhashIndex: probe parity, replayed stream batch never double-appends") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val newbies = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    val probe = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val idxS = tmp("mh-stream")
    val idxB = tmp("mh-batch")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idxS, n = 3)
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idxB, n = 3)
    // stream face into S (2 micro-batches, one ledgered batch each)
    val src = tmp("mh-stream-src")
    newbies.repartition(2).write.mode("overwrite").parquet(src)
    def startStream(ckpt: String) = {
      val stream = spark.readStream.schema(newbies.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      graft.streaming.IncrementalStream.minhashMaintenanceStream(
        stream, "doc_id", "text", idxS, ckpt)
    }
    val ckpt = tmp("mh-stream-ckpt")
    startStream(ckpt).awaitTermination()
    // batch face into B
    Dedup.appendToMinhashIndex(newbies, "doc_id", "text", idxB, batchId = "d1")
    val fromStream = probePairs(idxS, probe)
    assert(fromStream == probePairs(idxB, probe),
      "stream-appended and batch-appended indexes must probe identically")
    assert(fromStream.exists(_._2 >= 1000L), "ingested docs probe-visible")
    // ACTUALLY restart the stream from the SAME checkpoint over the
    // same source: the source offsets + sink manifest make the restart
    // commit nothing — shingle rows and probe results bit-unchanged
    val n1 = Dedup.storedMinhashComponent(spark, idxS, "shingles").count()
    startStream(ckpt).awaitTermination()
    assert(probePairs(idxS, probe) == fromStream)
    assert(Dedup.storedMinhashComponent(spark, idxS, "shingles").count() == n1,
      "a restart from the same checkpoint must not double-append")
  }

  test("stream micro-batches are ledger-atomic: both components visible together or neither; a crashed (unledgered) micro-batch is invisible whole") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val newbies = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    val probe = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val idx = tmp("mh-atomic")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val src = tmp("mh-atomic-src")
    newbies.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(newbies.schema).parquet(src)
    graft.streaming.IncrementalStream.minhashMaintenanceStream(
      stream, "doc_id", "text", idx, tmp("mh-atomic-ckpt"))
      .awaitTermination()
    val committed = probePairs(idx, probe)
    assert(committed.exists(_._2 >= 1000L), "committed ingest probe-visible")
    val nSh = Dedup.storedMinhashComponent(spark, idx, "shingles").count()
    // plant the crash state a died micro-batch leaves behind: BOTH
    // component dirs fully written, ledger row never appended (the
    // append face ledgers LAST). Visibility is the ledger commit, so
    // neither phantom shingle rows nor phantom band rows may appear —
    // a document's two component row sets are atomic as a pair (the
    // property the round-10 combined sink existed for, now carried by
    // the ledger).
    val (n, numHashes, bands) = Dedup.minhashIndexParams(spark, idx)
    val (pbN, sbN) = Dedup.minhashIndexBuckets(spark, idx)
    val fp = Dedup.paramsFp(n, numHashes, bands, pbN, sbN)
    val ghosts = docs.filter($"doc_id" % 10 === 3)
      .select(($"doc_id" + 5000000L).as("doc_id"), $"text")
    val ghostHashed = Dedup.shingleHashSets(ghosts, "doc_id", "text", n)
      .withColumn("params_fp", lit(fp))
      .withColumn("sb", Dedup.shingleBucket($"id", sbN))
    ghostHashed.write.mode("overwrite")
      .parquet(s"$idx/shingles_delta/batch=stream-000000099")
    Dedup.bandRowsOf(ghostHashed, numHashes, bands)
      .withColumn("params_fp", lit(fp))
      .withColumn("pb", Dedup.bandBucket($"bh", pbN))
      .write.mode("overwrite")
      .parquet(s"$idx/bands_delta/batch=stream-000000099")
    assert(Dedup.probeMinhashIndex(spark, idx,
        ghosts.limit(5), "doc_id", "text")
      .filter($"id_corpus" >= 5000000L).count() == 0,
      "an unledgered stream micro-batch must not surface as corpus")
    assert(probePairs(idx, probe) == committed,
      "probe result unchanged by a crashed micro-batch")
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count() == nSh)
    // completing the commit (ledger the id) makes BOTH components
    // visible together
    IndexStore.ledgerBatch(spark, idx, "stream-000000099")
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count()
      == nSh + ghosts.count())
    assert(Dedup.probeMinhashIndex(spark, idx,
        ghosts.select(($"doc_id" + 1000000L).as("doc_id"), $"text"),
        "doc_id", "text")
      .filter($"id_corpus" >= 5000000L).count() > 0,
      "the ledgered micro-batch is probe-visible through both components")
  }

  test("online compaction: a reader mid-compaction sees old or new — both bit-equal, never empty; a crashed attempt is invisible and the re-run bakes no duplicates") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-online")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val day = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "d1")
    val probe = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val before = probePairs(idx, probe)
    val nVisible = Dedup.storedMinhashComponent(spark, idx, "shingles").count()
    val nBands = Dedup.storedMinhashComponent(spark, idx, "bands").count()
    // simulate the crash window: a previous compaction wrote the v=1
    // DATA of both components but died before committing the fold
    // manifests — the exact state a reader could race against
    Seq("shingles", "bands").foreach { c =>
      Dedup.storedMinhashComponent(spark, idx, c)
        .write.mode("overwrite").parquet(IndexStore.versionDir(idx, c, 1))
    }
    // mid-compaction reader: the incomplete v=1 is INVISIBLE (no fold
    // manifest) — the reader resolves v=0 + unfolded delta, bit-equal
    assert(probePairs(idx, probe) == before,
      "a reader mid-compaction must see the old relation, not an empty base")
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count() == nVisible)
    // recovery: re-run compaction. The crashed attempt is dropped and
    // redone; because visibility subtracts the fold manifest (not the
    // filesystem), the delta rows cannot be double-visible afterwards —
    // the failure mode a rename-based swap's crash window allowed
    val (filesBefore, filesAfter, rows) = Dedup.compactMinhashIndex(spark, idx)
    assert(rows == nVisible + nBands,
      "compacted rows == previously visible rows across both components")
    val (pbN, sbN) = Dedup.minhashIndexBuckets(spark, idx)
    assert(filesAfter < filesBefore && filesAfter <= pbN + sbN)
    assert(probePairs(idx, probe) == before, "post-install reader bit-equal")
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count() == nVisible,
      "no duplicates: folded delta rows are excluded, not deleted")
    // the folded delta dir is STILL on disk (vacuum has not run) — and
    // still invisible: the recovery path can never double-count it
    assert(new java.io.File(s"$idx/shingles_delta/batch=d1").exists())
  }

  test("a maintenance stream SURVIVES compaction: commits from the same checkpoint after the fold stay delta-visible, nothing duplicated or lost") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-livestream")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val wave1 = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    val wave2 = docs.filter($"doc_id" % 5 === 3)
      .select(($"doc_id" + 3000L).as("doc_id"), $"text")
    val src = tmp("mh-livestream-src")
    val ckpt = tmp("mh-livestream-ckpt")
    def run() = {
      val stream = spark.readStream.schema(wave1.schema).parquet(src)
      graft.streaming.IncrementalStream.minhashMaintenanceStream(
        stream, "doc_id", "text", idx, ckpt).awaitTermination()
    }
    // wave 1 commits, then compaction folds it into a new base version
    wave1.write.mode("overwrite").parquet(src)
    run()
    Dedup.compactMinhashIndex(spark, idx)
    val afterFold = Dedup.storedMinhashComponent(spark, idx, "shingles").count()
    assert(afterFold == corpus.count() + wave1.count())
    // the SAME stream (same checkpoint — source offsets survive the
    // compaction; wave-1's ledgered micro-batch is folded, not deleted)
    // keeps ingesting: wave 2 lands as a new unfolded ledgered batch
    wave2.write.mode("append").parquet(src)
    run()
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count()
      == corpus.count() + wave1.count() + wave2.count(),
      "post-compaction commits from the same checkpoint are delta-visible")
    // wave-1 rows are NOT double-visible: they live in the compacted
    // base and their micro-batch id is folded
    val probe1 = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val p = Dedup.probeMinhashIndex(spark, idx, probe1, "doc_id", "text")
    assert(p.count() == p.dropDuplicates("id_new", "id_corpus").count())
    assert(p.filter($"id_corpus" >= 1000L && $"id_corpus" < 2000L).count() > 0,
      "folded wave-1 docs still probe-visible exactly once")
  }

  test("fresh-checkpoint restart: default fails loud against a stream-maintained index; an explicit fresh streamId ingests every doc exactly once; id misuse fails loud") {
    import graft.streaming.IncrementalStream
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-freshckpt")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val wave1 = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    val wave2 = docs.filter($"doc_id" % 5 === 3)
      .select(($"doc_id" + 3000L).as("doc_id"), $"text")
    // incarnation 1: two micro-batches on checkpoint 1
    val src1 = tmp("mh-freshckpt-src1")
    wave1.repartition(2).write.mode("overwrite").parquet(src1)
    def streamOf(src: String) = spark.readStream.schema(wave1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    IncrementalStream.minhashMaintenanceStream(
      streamOf(src1), "doc_id", "text", idx, tmp("mh-freshckpt-ckpt1"))
      .awaitTermination()
    val afterWave1 = Dedup.storedMinhashComponent(spark, idx, "shingles").count()
    assert(afterWave1 == corpus.count() + wave1.count())
    // a FRESH checkpoint against the same index must not start silently:
    // its batchIds restart at 0 and would alias incarnation 1's ledgered
    // micro-batches (the old code silently DROPPED the early batches)
    val src2 = tmp("mh-freshckpt-src2")
    wave2.repartition(2).write.mode("overwrite").parquet(src2)
    val ex = intercept[Exception] {
      IncrementalStream.minhashMaintenanceStream(
        streamOf(src2), "doc_id", "text", idx, tmp("mh-freshckpt-ckpt2"))
    }
    assert(ex.getMessage.contains("fresh checkpoint"),
      s"expected the named fresh-checkpoint error, got: ${ex.getMessage}")
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count()
      == afterWave1, "the refused start must not have appended anything")
    // an explicit FRESH streamId declares the new incarnation: every
    // wave-2 doc becomes visible exactly once (batchIds 0,1 again, but
    // namespaced — nothing aliases, nothing is dropped)
    val ckpt2 = tmp("mh-freshckpt-ckpt2b")
    IncrementalStream.minhashMaintenanceStream(
      streamOf(src2), "doc_id", "text", idx, ckpt2,
      streamId = Some("inc2")).awaitTermination()
    val sh = Dedup.storedMinhashComponent(spark, idx, "shingles")
    assert(sh.count() == corpus.count() + wave1.count() + wave2.count(),
      "every ingested doc visible (the old code dropped the aliased batches)")
    assert(sh.groupBy("id").count().filter($"count" > 1).count() == 0,
      "no doc visible twice")
    // same checkpoint again (no new files): a no-op replay, still green
    IncrementalStream.minhashMaintenanceStream(
      streamOf(src2), "doc_id", "text", idx, ckpt2,
      streamId = Some("inc2")).awaitTermination()
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count()
      == corpus.count() + wave1.count() + wave2.count())
    // changing the streamId on an EXISTING checkpoint fails loud (it
    // would re-ledger replayed micro-batches under fresh ids)
    val ex2 = intercept[Exception] {
      IncrementalStream.minhashMaintenanceStream(
        streamOf(src2), "doc_id", "text", idx, ckpt2,
        streamId = Some("inc3"))
    }
    assert(ex2.getMessage.contains("stream instance mismatch"),
      s"expected the named mismatch error, got: ${ex2.getMessage}")
    // REUSING a spent streamId on another fresh checkpoint fails loud
    // (it would alias incarnation 2's ledgered micro-batches)
    val ex3 = intercept[Exception] {
      IncrementalStream.minhashMaintenanceStream(
        streamOf(src2), "doc_id", "text", idx, tmp("mh-freshckpt-ckpt3"),
        streamId = Some("inc2"))
    }
    assert(ex3.getMessage.contains("already used"),
      s"expected the named reuse error, got: ${ex3.getMessage}")
  }

  test("vacuum: removes superseded versions and folded delta dirs, probe unchanged; a late replay of a vacuumed batch stays a no-op") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-vacuum")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val day = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "d1")
    val probe = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val before = probePairs(idx, probe)
    Dedup.compactMinhashIndex(spark, idx)
    val (versionsGone, batchDirsGone) = Dedup.vacuumMinhashIndex(spark, idx)
    assert(versionsGone == 2L, "one superseded version per component")
    assert(batchDirsGone == 2L, "one folded batch dir per component")
    assert(!new java.io.File(s"$idx/shingles_delta/batch=d1").exists())
    assert(!new java.io.File(s"$idx/shingles/v=0").exists())
    assert(probePairs(idx, probe) == before, "vacuum never changes the relation")
    // the LEDGER survived vacuum: a very late replay of the folded,
    // vacuumed batch is still recognized and skipped
    val n1 = Dedup.storedMinhashComponent(spark, idx, "shingles").count()
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "d1")
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count() == n1)
    assert(probePairs(idx, probe) == before)
  }

  test("ledgered-delta reads prune at the partition level: batch isin is a PartitionFilter over string-typed batch") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-prune")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val day = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "007")
    val pin = IndexStore.pinOf(spark, idx, "shingles")
    val base = IndexStore.readBaseAt(spark, idx, "shingles", pin)
    val delta = IndexStore.ledgeredDelta(spark, idx, "shingles", pin,
      base.schema, Seq("id")).get
    assert(delta.schema.isEmpty || delta.count() == day.count())
    val plan = delta.queryExecution.executedPlan.toString
    // the ledger-id isin must reach the scan as a PARTITION filter —
    // a post-scan filter would read every batch dir (incl. unledgered
    // ghosts and vacuum-pending folded dirs) at probe time
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*batch[^\\]]*\\].*"),
      s"expected batch partition pruning in:\n$plan")
    // and the partition column is STRING by pinned schema, not inferred
    val deltaAll = spark.read
      .schema(base.schema.add("batch", org.apache.spark.sql.types.StringType))
      .parquet(s"$idx/shingles_delta")
    assert(deltaAll.schema("batch").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("probe bucket pruning: batch band buckets and candidate id buckets reach both base scans as PartitionFilters; lossless vs the fresh LSH recompute; layout survives compaction and rebuild") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-bucketprune")
    // explicit 64-bucket layout: a handful of probe docs then touches
    // well under all buckets, so the selectivity gate prunes BOTH scans
    // deterministically (the adaptive default would floor at 8 buckets
    // on a test corpus and the probe would saturate them)
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3,
      bandBuckets = Some(64), shingleBuckets = Some(64))
    val day = docs.filter($"doc_id" % 5 === 2).limit(40)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "d1")
    // small probe batch: twins of a few corpus and delta docs
    val probe = corpus.limit(3).select(($"doc_id" + 2000000L).as("doc_id"), $"text")
      .unionByName(docs.filter($"doc_id" % 5 === 2).limit(3)
        .select(($"doc_id" + 3000000L).as("doc_id"), $"text"))
    def assertPrunedPlan(): Unit = {
      val plan = Dedup.probeMinhashIndex(spark, idx, probe, "doc_id", "text")
        .queryExecution.executedPlan.toString
      // both corpus-sized base scans carry their bucket column as a
      // PARTITION filter — the pruning happens at file-listing time,
      // not as a post-scan filter over the whole artifact
      assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*pb[^\\]]*\\].*"),
        s"expected pb partition pruning on the bands base scan in:\n$plan")
      assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*sb[^\\]]*\\].*"),
        s"expected sb partition pruning on the shingles base scan in:\n$plan")
    }
    assertPrunedPlan()
    // losslessness: the pruned probe equals the full from-scratch LSH
    // recompute restricted to batch×corpus pairs (the q323 anchor)
    val stored = corpus.unionByName(day)
    val fresh = Dedup.minhashLshPairs(stored.unionByName(probe),
        "doc_id", "text", n = 3)
      .filter($"id_a" < 2000000L && $"id_b" >= 2000000L)
      .select($"id_b".as("id_new"), $"id_a".as("id_corpus"),
        $"common", $"n_b".as("n_new"), $"n_a".as("n_corpus"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(probePairs(idx, probe) == fresh,
      "bucket pruning must be lossless vs the fresh LSH recompute")
    assert(probePairs(idx, probe).exists(_._1 >= 3000000L),
      "delta twins found (delta is probed unpruned)")
    // the layout is preserved by compaction and by a parameter rebuild
    Dedup.compactMinhashIndex(spark, idx)
    assertPrunedPlan()
    assert(probePairs(idx, probe) == fresh)
    Dedup.rebuildMinhashIndex(spark, idx, stored, "doc_id", "text",
      rebuildId = "bp-r1", n = 3, numHashes = 32, bands = 8,
      bandBuckets = Some(64), shingleBuckets = Some(64))
    assertPrunedPlan()
    assert(probePairs(idx, probe) == fresh)
  }

  test("a rebuild's meta-flip window stays LOUD under bucket pruning: probes raise the named mid-install error; a re-run rebuild recovers") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-midinstall")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val probe = corpus.limit(5)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    assert(probePairs(idx, probe).nonEmpty)
    Dedup.rebuildMinhashIndex(spark, idx, corpus, "doc_id", "text",
      rebuildId = "mi-r1", n = 3, numHashes = 32, bands = 16)
    // crash-sim: the rebuild flipped the meta but its fold manifests
    // never committed — readers pin the OLD base (old params, old
    // bucket moduli) under the NEW meta. With pruning, a probe's
    // new-moduli buckets could select none of the old partitions and
    // the in-scan guard would see no rows — the pre-scan stamp check
    // must keep this window loud, not let it become a silent empty.
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("shingles_folds", "bands_folds").foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$idx/$c/v=1"), true)
    }
    val ex = intercept[Exception] { probePairs(idx, probe) }
    assert(ex.getMessage.contains("mid-install"),
      s"expected the named mid-install error, got: ${ex.getMessage}")
    // recovery: a fresh rebuild re-derives and installs cleanly (the
    // half-installed v=1 is incomplete and dropped by the re-run)
    Dedup.rebuildMinhashIndex(spark, idx, corpus, "doc_id", "text",
      rebuildId = "mi-r2", n = 3, numHashes = 32, bands = 16)
    val recovered = probePairs(idx, probe)
    assert(probe.select($"doc_id").as[Long].collect()
      .forall(id => recovered.exists(p => p._1 == id && p._2 == id - 2000000L)),
      "identical-text twins found after the recovered install")
  }

  test("retention-gated vacuum (keepVersions=2): a reader pinned at the previous version keeps all its files; keepVersions=1 then collects fully") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-retention")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val day1 = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx, batchId = "d1")
    val probe = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val before = probePairs(idx, probe)
    // a long-running reader pins v=0 (base + unfolded d1 delta) as a
    // LAZY plan — it will actually read its files only after vacuum
    val pinned = {
      val pin0 = IndexStore.pinOf(spark, idx, "shingles")
      val base0 = IndexStore.readBaseAt(spark, idx, "shingles", pin0)
      val cols = base0.columns.toSeq.map(org.apache.spark.sql.functions.col)
      IndexStore.ledgeredDelta(spark, idx, "shingles", pin0, base0.schema,
          base0.columns.toSeq)
        .map(base0.select(cols: _*).unionByName(_))
        .getOrElse(base0.select(cols: _*))
    }
    Dedup.compactMinhashIndex(spark, idx) // installs v=1, folds d1
    // retention vacuum keeps v=0 AND the d1 delta dir (folded only in
    // v=1, not in the oldest retained version v=0)
    val (gone2, batches2) = Dedup.vacuumMinhashIndex(spark, idx,
      keepVersions = 2)
    assert(gone2 == 0L && batches2 == 0L,
      "two versions exist, both retained; d1 unfolded at v=0 -> kept")
    assert(new java.io.File(s"$idx/shingles_delta/batch=d1").exists())
    // the pinned reader completes AFTER the vacuum, files intact
    assert(pinned.count() == corpus.count() + day1.count())
    assert(probePairs(idx, probe) == before)
    // full collection once readers drained: only v=1 survives
    val (gone1, batches1) = Dedup.vacuumMinhashIndex(spark, idx,
      keepVersions = 1)
    assert(gone1 == 2L && batches1 == 2L,
      "one stale version + one folded batch dir per component")
    assert(!new java.io.File(s"$idx/shingles/v=0").exists())
    assert(!new java.io.File(s"$idx/shingles_delta/batch=d1").exists())
    assert(probePairs(idx, probe) == before)
  }

  test("batch= partition type is pinned to string: a leading-zero batch id round-trips append -> ledger -> probe") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-zero")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val day = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    // an all-numeric id with a leading zero: directory-name inference
    // would type the partition column int (007 -> 7) while the ledger
    // stores the string "007" — the explicit read schema pins string
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "007")
    val probe = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    assert(probePairs(idx, probe).exists(_._2 >= 1000L),
      "the 007 batch must be probe-visible through the ledger isin")
    val n1 = Dedup.storedMinhashComponent(spark, idx, "shingles").count()
    assert(n1 == corpus.count() + day.count())
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "007")
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count() == n1,
      "replaying 007 is a no-op (no string/int cast in the isin)")
  }

  test("minhashIndexHealth: exact counts, compaction clears the delta and the fragmentation signal") {
    val corpus = docs.filter($"doc_id" % 3 =!= 0)
    val idx = tmp("mh-health")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val day1 = docs.filter($"doc_id" % 3 === 0)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx, batchId = "d1")
    val h = Dedup.minhashIndexHealth(spark, idx).collect().head
    assert(h.getLong(0) == corpus.count(), "n_base_docs exact")
    assert(h.getLong(1) == day1.count(), "n_delta_docs exact")
    assert(h.getLong(2) == h.getLong(1) * 100 / (h.getLong(0) + h.getLong(1)))
    // ~33% delta -> past the 20% default
    assert(h.getBoolean(3), "needs_compaction fires")
    assert(h.getLong(4) > 0, "file census populated")
    // a tight fragmentation threshold fires on the pre-compaction layout
    val tight = Dedup.minhashIndexHealth(spark, idx,
      maxFilesPerComponent = 1).collect().head
    assert(tight.getBoolean(5), "fragmented fires under a tight bound")
    // compaction folds the delta into the base and shrinks the census
    // (bounded by the bucket layout: ≤ one file per bucket per component)
    Dedup.compactMinhashIndex(spark, idx)
    val (pbN, sbN) = Dedup.minhashIndexBuckets(spark, idx)
    val post = Dedup.minhashIndexHealth(spark, idx).collect().head
    assert(post.getLong(0) == corpus.count() + day1.count())
    assert(post.getLong(1) == 0L && post.getLong(2) == 0L)
    assert(!post.getBoolean(3) && post.getLong(4) <= pbN + sbN)
  }

  test("rebuildIvfPqIndex: drift detected -> retrain + re-encode installs atomically, recall recovers, replay is a no-op, stale codebooks fail loud") {
    val e = embeddings
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-rebuild")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", cb, idx)
    Similarity.appendToIvfPqIndex(spark, idx, e.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", batchId = "d1")
    // the corpus drifts IN PLACE (same ids, re-embedded vectors — the
    // new-embedding-model scenario): scale+shift moves the distribution
    // far from the frozen codebook's fit
    val drifted = e.select($"vec_id",
      transform($"embedding", x => x * 3.0d + 7.0d).as("embedding"))
    val queries = drifted.filter($"vec_id".isin(3, 7, 8, 11))
    def health() = Similarity.ivfPqIndexHealth(spark, idx, drifted,
      "vec_id", "embedding", queries, k = 10, recallFloorPct = 0)
      .collect().head
    val stale = health()
    assert(stale.getBoolean(6), "quant drift must fire on the drifted corpus")
    val staleRecall = stale.getLong(7)
    Similarity.rebuildIvfPqIndex(spark, idx, drifted, "vec_id", "embedding",
      rebuildId = "r1")
    // the rebuilt index is version v=1 with retrained geometry; the
    // health report re-anchors on the new baseline
    val rebuilt = health()
    assert(!rebuilt.getBoolean(6), "re-anchored baseline: drift cleared")
    assert(rebuilt.getLong(7) >= staleRecall,
      s"rebuilt recall ${rebuilt.getLong(7)} must be >= stale $staleRecall")
    // all deltas were folded by the re-encode: nothing counts as delta
    assert(rebuilt.getLong(1) == 0L && rebuilt.getLong(2) == 0L)
    // id population preserved
    assert(IndexStore.storedComponent(spark, idx, "codes")
      .select("id").distinct().count() == e.count())
    // serving is rerun-identical and coherent with the NEW codebook
    val cb2 = Similarity.codebookOf(spark, idx)
    def serve() = Similarity.topKIvfPqFromIndex(spark, idx,
      drifted.filter($"vec_id" === 7), "vec_id", "embedding", k = 10, cb2)
      .as[(Long, Long)].collect().toSeq
    assert(serve() == serve(), "rebuilt serving rerun-identical")
    // a caller holding the PRE-rebuild codebook fails loud, not garbage
    val ex = intercept[IllegalArgumentException] {
      Similarity.topKIvfPqFromIndex(spark, idx,
        drifted.filter($"vec_id" === 7), "vec_id", "embedding", k = 10, cb)
        .collect()
    }
    assert(ex.getMessage.contains("stale codebook"))
    // replayed rebuild (same id): ledgered -> no-op, version unchanged
    val v1 = IndexStore.pinOf(spark, idx, "codes").v
    val s1 = serve()
    Similarity.rebuildIvfPqIndex(spark, idx, drifted, "vec_id", "embedding",
      rebuildId = "r1")
    assert(IndexStore.pinOf(spark, idx, "codes").v == v1)
    assert(serve() == s1, "replayed rebuild is a no-op")
  }

  test("crashed rebuild is invisible; the retry installs cleanly; post-rebuild vacuum collects everything and serving is unchanged") {
    val e = embeddings
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-rebuild-crash")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", cb, idx)
    Similarity.appendToIvfPqIndex(spark, idx, e.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", batchId = "d1")
    def serveWith(codebook: Array[Array[Array[Long]]]): Seq[(Long, Long)] =
      Similarity.topKIvfPqFromIndex(spark, idx, e.filter($"vec_id" === 8),
        "vec_id", "embedding", k = 10, codebook)
        .as[(Long, Long)].collect().toSeq
    val before = serveWith(cb)
    // simulate a rebuild that died after writing v=1 data AND meta but
    // before committing the fold manifest: readers must stay on v=0
    IndexStore.storedComponent(spark, idx, "codes")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(IndexStore.versionDir(idx, "codes", 1))
    Seq("centroids", "codebook", "quant_baseline").foreach { m =>
      spark.read.parquet(s"$idx/codes_meta/v=0/$m")
        .write.mode("overwrite").parquet(s"$idx/codes_meta/v=1/$m")
    }
    assert(IndexStore.pinOf(spark, idx, "codes").v == 0L,
      "a fold-manifest-less v=1 must be invisible")
    assert(serveWith(cb) == before, "serving unchanged by the crash debris")
    // the retry (fresh rebuild id — the crashed one never ledgered)
    // drops the debris and installs v=1 atomically
    Similarity.rebuildIvfPqIndex(spark, idx, e, "vec_id", "embedding",
      rebuildId = "r-crash-retry")
    assert(IndexStore.pinOf(spark, idx, "codes").v == 1L)
    val cb2 = Similarity.codebookOf(spark, idx)
    val served = serveWith(cb2)
    assert(served.map(_._1).contains(8L), "query vector still retrievable")
    // post-rebuild vacuum: v=0 (+ its meta) and the folded batch dir
    // collect; serving is bit-unchanged
    val (versions, batches) = Similarity.vacuumIvfPqIndex(spark, idx)
    assert(versions == 1L && batches == 1L)
    assert(!new java.io.File(s"$idx/codes/v=0").exists())
    assert(!new java.io.File(s"$idx/codes_meta/v=0").exists())
    assert(!new java.io.File(s"$idx/codes_delta/batch=d1").exists())
    assert(serveWith(cb2) == served, "vacuum never changes serving")
    // and the vacuumed batch's very late replay is still a no-op
    val n1 = IndexStore.storedComponent(spark, idx, "codes").count()
    Similarity.appendToIvfPqIndex(spark, idx, e.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", batchId = "d1")
    assert(IndexStore.storedComponent(spark, idx, "codes").count() == n1)
  }

  test("ivfPqIndexHealth: counts exact, no drift on the build corpus, recall above floor") {
    val e = embeddings
    val base = e.filter($"vec_id" % 4 =!= 0)
    val newbies = e.filter($"vec_id" % 4 === 0)
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-health")
    Similarity.writeIvfPqIndex(base, "vec_id", "embedding", cb, idx)
    Similarity.appendToIvfPqIndex(spark, idx, newbies, "vec_id", "embedding",
      batchId = "d1")
    // recall floor: measured 13% on this sf0.001 fixture (150-vector
    // corpus — ADC quantization noise dominates at tiny scale; the
    // registered health query pins the sf0.01/sf0.1-measured floor)
    val h = Similarity.ivfPqIndexHealth(spark, idx, e, "vec_id", "embedding",
      queries = e.filter($"vec_id".isin(7, 8, 11)), k = 10,
      recallFloorPct = 10).collect().head
    assert(h.getLong(0) == base.count(), "n_base_codes exact")
    assert(h.getLong(1) == newbies.count(), "n_delta_codes exact")
    assert(h.getLong(2) == h.getLong(1) * 100 / (h.getLong(0) + h.getLong(1)))
    // ~25% of the corpus is delta -> past the default 20% threshold
    assert(h.getBoolean(3), "needs_compaction fires at 25% delta")
    // the health sample IS the build distribution (base ∪ delta drawn
    // from the same table): no drift
    assert(!h.getBoolean(6), "no quant drift on the build distribution")
    assert(h.getLong(7) >= 10 && h.getBoolean(8),
      s"sampled recall ${h.getLong(7)} above floor")
    assert(h.getLong(9) == 0L && !h.getBoolean(10),
      "no foreign-codebook rows under the write discipline")
    // file census (round 13): manifest-recorded base count + listed
    // unfolded deltas == the actual recursive listing, and the
    // fragmentation verdict fires under a tight bound
    val pin = IndexStore.pinOf(spark, idx, "codes")
    val actual = graft.operators.Layout.nParquetFiles(spark,
      IndexStore.versionDir(idx, "codes", pin.v)) +
      IndexStore.unfoldedBatchIds(spark, idx, pin).map(id =>
        graft.operators.Layout.nParquetFiles(spark,
          s"$idx/codes_delta/batch=$id")).sum
    assert(h.getLong(11) == actual, "n_files census == actual listing")
    assert(!h.getBoolean(12), "not fragmented at the default bound")
    val hTight = Similarity.ivfPqIndexHealth(spark, idx, e, "vec_id",
      "embedding", queries = e.filter($"vec_id" === 7), k = 10,
      recallFloorPct = 0, maxFilesPerComponent = 1).collect().head
    assert(hTight.getBoolean(12), "fragmented fires under a tight bound")
    // cell-geometry re-anchor (round 13): the stored n_cells is read
    // back, the √N suggestion fires on an undersized geometry, and a
    // rebuild adopting it clears the verdict
    assert(h.getLong(13) == 16L, "default geometry read back")
    assert(h.getLong(14) == Similarity.suggestedCells(e.count()))
    assert(h.getBoolean(15) == (h.getLong(14) > h.getLong(13)),
      "recommendation fires exactly in the growth direction")
    val idx2 = tmp("ivfpq-health-cells")
    Similarity.writeIvfPqIndex(base, "vec_id", "embedding", cb, idx2,
      nCells = 4)
    def cellsHealth() = Similarity.ivfPqIndexHealth(spark, idx2, base,
      "vec_id", "embedding", queries = base.filter($"vec_id" === 7),
      k = 10, recallFloorPct = 0)
      .select("n_cells", "suggested_n_cells", "cell_resize_recommended")
      .head()
    val c1 = cellsHealth()
    assert(c1.getLong(0) == 4L && c1.getLong(1) >= 16L && c1.getBoolean(2),
      s"undersized geometry must recommend growth, got $c1")
    Similarity.rebuildIvfPqIndex(spark, idx2, base, "vec_id", "embedding",
      rebuildId = "cells-r1", nCells = Some(c1.getLong(1).toInt))
    val c2 = cellsHealth()
    assert(c2.getLong(0) == c1.getLong(1) && !c2.getBoolean(2),
      s"adopting the suggestion re-anchors and clears, got $c2")
  }

  test("ivfPqIndexHealth scale shape: the batched brute pass matches the per-query ground truth; the quant-err pass samples deterministically past its bound") {
    val e = embeddings
    val base = e.filter($"vec_id" % 4 =!= 0)
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-health-scale")
    Similarity.writeIvfPqIndex(base, "vec_id", "embedding", cb, idx)
    Similarity.appendToIvfPqIndex(spark, idx, e.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", batchId = "d1")
    val queries = e.filter($"vec_id".isin(3, 7, 8, 11))
    val k = 10
    // ground truth computed the pre-round-13 way — one topKBruteForce
    // corpus scan PER query row; the batched topKBruteForceMany pass
    // inside health must reproduce its hits bit-for-bit (identical
    // (cosine DESC, id) tie order)
    val qRows = queries.collect()
    val cb2 = Similarity.codebookOf(spark, idx)
    val expectedHits = qRows.map { r =>
      val qDf = spark.createDataFrame(
        java.util.Arrays.asList(r), queries.schema)
      val served = Similarity.topKIvfPqFromIndex(spark, idx, qDf,
        "vec_id", "embedding", k, cb2)
        .select("id").collect().map(_.getLong(0)).toSet
      val brute = Similarity.topKBruteForce(e, "vec_id", "embedding", qDf, k)
        .select("id").collect().map(_.getLong(0)).toSet
      served.intersect(brute).size.toLong
    }.sum
    def health(current: DataFrame, bound: Int) =
      Similarity.ivfPqIndexHealth(spark, idx, current, "vec_id", "embedding",
        queries, k = k, recallFloorPct = 0, maxQuantErrRows = bound)
        .collect().head
    val h = health(e, 1 << 20)
    assert(h.getLong(7) == expectedHits * 100L / (k.toLong * qRows.length),
      "batched recall must equal the per-query loop's")
    assert(h.getLong(16) == 1L,
      "below the bound the quant-err pass is exact (sample mod 1)")
    // forced sampling: a bound of a quarter of the population makes
    // m > 1; the report NAMES it, two calls agree (xxhash64 sampling
    // is deterministic), and the build distribution still reads as
    // no-drift on the sample
    val n = e.count()
    val bound = math.max(1, (n / 4).toInt)
    val hs = health(e, bound)
    assert(hs.getLong(16) > 1L, s"sample mod must be reported, got $hs")
    val hs2 = health(e, bound)
    assert(hs.getLong(5) == hs2.getLong(5) &&
      hs.getLong(16) == hs2.getLong(16), "sampling is deterministic")
    assert(!hs.getBoolean(6), "no drift verdict on the sampled build distribution")
    // a genuinely drifted corpus fires the verdict even sampled
    val drifted = e.select($"vec_id",
      transform($"embedding", x => x * 3.0d + 7.0d).as("embedding"))
    assert(health(drifted, bound).getBoolean(6),
      "sampled pass must still detect real drift")
    // pathological shape guard: a `current` none of whose ids land in
    // the 1-in-m sample falls back to the exact pass (reported mod 1)
    // instead of dying on an empty statistic
    val m = hs.getLong(16)
    val off = e.filter(pmod(xxhash64($"vec_id"), lit(m)) =!= 0L).limit(3)
    assert(health(off, bound).getLong(16) == 1L,
      "an empty sample must fall back to the exact pass")
  }

  test("topKIvfPqManyFromIndex: one union-of-probed-cells scan, per-query bit-identical to the single serve; cell pruning and WindowGroupLimit pinned; guards fire") {
    val e = embeddings
    val base = e.filter($"vec_id" % 4 =!= 0)
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-many-serve")
    Similarity.writeIvfPqIndex(base, "vec_id", "embedding", cb, idx)
    // with a ledgered delta: the batched serve must read base ∪ delta
    // through the same pin as the single-query form
    Similarity.appendToIvfPqIndex(spark, idx, e.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", batchId = "d1")
    val qids = Seq(3L, 7L, 11L, 19L, 23L)
    val qs = e.filter($"vec_id".isin(qids: _*))
    val many = Similarity.topKIvfPqManyFromIndex(spark, idx, qs,
      "vec_id", "embedding", k = 10, cb)
    val got = many.select("qid", "id", "adc_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = qids.flatMap { qid =>
      Similarity.topKIvfPqFromIndex(spark, idx,
        e.filter($"vec_id" === qid), "vec_id", "embedding", 10, cb)
        .select("id", "adc_dist").collect()
        .map(r => (qid, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(got == want,
      "batched serve must equal the per-query serves bit-for-bit")
    // plan pins: the code scan is cell-pruned at the PARTITION level
    // (the union of probed cells, a PartitionFilter — serving never
    // lists unprobed cells) and the per-qid rank filter is the
    // map-side WindowGroupLimit
    val plan = many.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit:\n$plan")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell.*"),
      s"expected a cell PartitionFilter on the code scan:\n$plan")
    // the serve-shape observable (ProbeShape's IVF twin): the union of
    // probed cells vs the cell space, the "batch saturates the
    // PartitionFilter" runtime signal
    val shape = Similarity.lastServeShape.get
    assert(shape.queries == qids.length)
    assert(shape.unionCellsProbed >= 4 &&
      shape.unionCellsProbed <= math.min(shape.nCells, qids.length * 4),
      s"union of probed cells bounded by min(nCells, |q|*nProbe): $shape")
    assert(shape.cellCoveragePct ==
      shape.unionCellsProbed * 100L / shape.nCells)
    // guards, all driver-side: stale codebook, duplicate qids, empty
    // batch
    val stale = cb.map(_.map(_.clone()))
    stale(0)(0)(0) += 1L
    val exStale = intercept[Exception] {
      Similarity.topKIvfPqManyFromIndex(spark, idx, qs,
        "vec_id", "embedding", 10, stale)
    }
    assert(exStale.getMessage.contains("stale codebook"))
    val exDup = intercept[Exception] {
      Similarity.topKIvfPqManyFromIndex(spark, idx,
        qs.unionAll(e.filter($"vec_id" === 7)), "vec_id", "embedding", 10, cb)
    }
    assert(exDup.getMessage.contains("duplicate query ids"))
    val exEmpty = intercept[Exception] {
      Similarity.topKIvfPqManyFromIndex(spark, idx,
        e.filter($"vec_id" === -1), "vec_id", "embedding", 10, cb)
    }
    assert(exEmpty.getMessage.contains("empty query batch"))
  }

  // ------------------------------------------------------------------ //
  // Round 11: mechanized vacuum retention, codebook-stamped code rows,
  // self-healing stream geometry, MinHash parameter rebuild
  // ------------------------------------------------------------------ //

  test("vacuum TTL: a fresh half-written install survives the vacuum and can still commit; an aged crashed attempt is collected") {
    val e = embeddings
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-vacuum-ttl")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", cb, idx)
    def serve(): Seq[(Long, Long)] =
      Similarity.topKIvfPqFromIndex(spark, idx, e.filter($"vec_id" === 7),
        "vec_id", "embedding", k = 10, Similarity.codebookOf(spark, idx))
        .as[(Long, Long)].collect().toSeq
    val before = serve()
    // an in-flight compactor/rebuild: v=1 data fully written (_SUCCESS
    // present), fold manifest not yet committed
    IndexStore.storedComponent(spark, idx, "codes")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(IndexStore.versionDir(idx, "codes", 1))
    Seq("centroids", "codebook", "quant_baseline").foreach { m =>
      spark.read.parquet(s"$idx/codes_meta/v=0/$m")
        .write.mode("overwrite").parquet(s"$idx/codes_meta/v=1/$m")
    }
    // a mis-scheduled vacuum cron fires mid-install: the attempt is
    // younger than the TTL, so it must be LEFT INTACT
    val (gone, _) = Similarity.vacuumIvfPqIndex(spark, idx)
    assert(gone == 0L, "a fresh incomplete attempt is an in-flight install, not debris")
    assert(new java.io.File(IndexStore.versionDir(idx, "codes", 1)).exists(),
      "the in-flight install's data must survive the vacuum")
    // ... and the install can still commit afterwards
    IndexStore.commitFolds(spark, idx, "codes", 1, Set.empty)
    assert(IndexStore.pinOf(spark, idx, "codes").v == 1L)
    assert(serve() == before, "the committed install is bit-equal (v=1 is a rewrite of v=0)")
    // now plant a CRASHED attempt and age it past the TTL: collected
    IndexStore.storedComponent(spark, idx, "codes")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(IndexStore.versionDir(idx, "codes", 2))
    val (gone2, _) = Similarity.vacuumIvfPqIndex(spark, idx,
      keepVersions = 1, incompleteTtlMs = -60000L) // cutoff in the future = aged out
    // v=0 (complete, past retention) and v=2 (aged incomplete debris)
    assert(gone2 == 2L, s"expected v=0 + aged v=2 collected, got $gone2")
    assert(!new java.io.File(IndexStore.versionDir(idx, "codes", 2)).exists())
    assert(serve() == before, "vacuum never changes serving")
  }

  test("cb_fp guard: out-of-contract old-codebook delta rows fail the next serve with the named error; health reports them") {
    val e = embeddings
    val cb1 = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-foreign")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", cb1, idx)
    // an out-of-contract writer pins the OLD geometry...
    val (oldCentroids, oldCb) = Similarity.frozenGeometryOf(spark, idx)
    // ...a rebuild installs new geometry underneath it...
    val drifted = e.select($"vec_id",
      transform($"embedding", x => x * 3.0d + 7.0d).as("embedding"))
    Similarity.rebuildIvfPqIndex(spark, idx,
      drifted.filter($"vec_id" % 4 =!= 0), "vec_id", "embedding",
      rebuildId = "r1")
    val cb2 = Similarity.codebookOf(spark, idx)
    // ...and then lands old-codebook rows, bypassing the append
    // discipline (raw write + raw ledger — simulating a writer that is
    // not using the library's append face)
    Similarity.encodeForIndex(e.filter($"vec_id" % 4 === 0),
        "vec_id", "embedding", oldCentroids, oldCb)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$idx/codes_delta/batch=rogue")
    IndexStore.ledgerBatch(spark, idx, "rogue")
    // the next serve must raise the named guard error, not mis-rank
    val ex = intercept[Exception] {
      Similarity.topKIvfPqFromIndex(spark, idx, e.filter($"vec_id" === 7),
        "vec_id", "embedding", k = 10, cb2).collect()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(ex).contains("foreign-codebook code rows"),
      s"expected the named guard error, got: ${messages(ex)}")
    // health DETECTS instead of dying: foreign rows counted, recall skipped
    val h = Similarity.ivfPqIndexHealth(spark, idx, drifted, "vec_id",
      "embedding", queries = drifted.filter($"vec_id" === 7), k = 10,
      recallFloorPct = 0)
      .select("n_foreign_codebook_rows", "foreign_codes_detected",
        "recall_ok").collect().head
    assert(h.getLong(0) > 0L && h.getBoolean(1) && !h.getBoolean(2))
  }

  test("appendToIvfPqIndex: a rebuild installing mid-append fails the append loud and unledgered; the retry re-encodes with the new geometry") {
    val e = embeddings
    val cb1 = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-append-race")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", cb1, idx)
    val newbies = e.filter($"vec_id" % 4 === 0)
    val drifted = e.select($"vec_id",
      transform($"embedding", x => x * 3.0d + 7.0d).as("embedding"))
    val ex = intercept[Exception] {
      Similarity.appendToIvfPqIndex(spark, idx, newbies, "vec_id",
        "embedding", batchId = "d1",
        preCommitHook = () => Similarity.rebuildIvfPqIndex(spark, idx,
          drifted.filter($"vec_id" % 4 =!= 0), "vec_id", "embedding",
          rebuildId = "race-r1"))
    }
    assert(ex.getMessage.contains("rebuild installed during append"),
      s"expected the named race error, got: ${ex.getMessage}")
    // the raced batch is NOT ledgered: invisible to serving (which is
    // green — no foreign rows reached visibility)
    val cb2 = Similarity.codebookOf(spark, idx)
    val served = Similarity.topKIvfPqFromIndex(spark, idx,
      drifted.filter($"vec_id" === 7), "vec_id", "embedding", k = 10, cb2)
      .as[(Long, Long)].collect().toSeq
    assert(!served.map(_._1).contains(8L), "raced batch stays invisible")
    // the retry re-encodes under the new geometry and lands cleanly
    Similarity.appendToIvfPqIndex(spark, idx,
      drifted.filter($"vec_id" % 4 === 0), "vec_id", "embedding",
      batchId = "d1")
    val after = Similarity.topKIvfPqFromIndex(spark, idx,
      drifted.filter($"vec_id" === 8), "vec_id", "embedding", k = 20, cb2)
      .as[(Long, Long)].collect().toSeq
    assert(after.map(_._1).contains(8L), "retried append visible under the new geometry")
  }

  test("ivfPqMaintenanceStream self-heals across a mid-stream rebuild: later micro-batches encode with the new geometry, no foreign rows") {
    val e = embeddings
    val cb1 = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-stream-rebuild")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", cb1, idx)
    val newbies = e.filter($"vec_id" % 4 === 0).select($"vec_id", $"embedding")
    val src = tmp("ivfpq-stream-rebuild-src")
    newbies.repartition(2).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(newbies.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    // rebuild installs between micro-batch 0 and micro-batch 1
    val sq = graft.streaming.IncrementalStream.ivfPqMaintenanceStream(
      stream, "vec_id", "embedding", idx, tmp("ivfpq-stream-rebuild-ckpt"),
      streamId = None,
      onBatchStart = bid => if (bid == 1L)
        Similarity.rebuildIvfPqIndex(spark, idx, e, "vec_id", "embedding",
          rebuildId = "mid-stream-r1"))
    sq.awaitTermination()
    // every visible delta row is stamped with the LIVE codebook: batch 0
    // was folded by the rebuild (re-encoded), batch 1 re-pinned the new
    // geometry — nothing foreign remains
    val h = Similarity.ivfPqIndexHealth(spark, idx, e, "vec_id", "embedding",
      queries = e.filter($"vec_id" === 7), k = 10, recallFloorPct = 0)
      .select("n_foreign_codebook_rows", "foreign_codes_detected").collect().head
    assert(h.getLong(0) == 0L && !h.getBoolean(1),
      "the stream must self-heal: no foreign-codebook rows after a mid-stream rebuild")
    // ingested vectors from BOTH micro-batches are retrievable under the
    // new codebook
    val cb2 = Similarity.codebookOf(spark, idx)
    val ids = IndexStore.storedComponent(spark, idx, "codes")
      .select("id").as[Long].collect().toSet
    assert(newbies.select("vec_id").as[Long].collect().toSet.subsetOf(ids),
      "all streamed vectors visible exactly once")
    val got = Similarity.topKIvfPqFromIndex(spark, idx,
      e.filter($"vec_id" === 8), "vec_id", "embedding", k = 20, cb2)
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1).contains(8L), "streamed vector retrievable post-rebuild")
  }

  test("ivfPqMaintenanceStream fresh-checkpoint restart: fails loud by default, ingests exactly once under an explicit streamId (the minhash contract, IVF-PQ face)") {
    import graft.streaming.IncrementalStream
    val e = embeddings
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-freshckpt")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 4 === 1),
      "vec_id", "embedding", cb, idx)
    val wave1 = e.filter($"vec_id" % 4 === 2).select($"vec_id", $"embedding")
    val wave2 = e.filter($"vec_id" % 4 === 3).select($"vec_id", $"embedding")
    def streamOf(src: String) = spark.readStream.schema(wave1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val src1 = tmp("ivfpq-freshckpt-src1")
    wave1.repartition(2).write.mode("overwrite").parquet(src1)
    IncrementalStream.ivfPqMaintenanceStream(streamOf(src1),
      "vec_id", "embedding", idx, tmp("ivfpq-freshckpt-ckpt1"))
      .awaitTermination()
    val n1 = IndexStore.storedComponent(spark, idx, "codes").count()
    val src2 = tmp("ivfpq-freshckpt-src2")
    wave2.repartition(2).write.mode("overwrite").parquet(src2)
    val ex = intercept[Exception] {
      IncrementalStream.ivfPqMaintenanceStream(streamOf(src2),
        "vec_id", "embedding", idx, tmp("ivfpq-freshckpt-ckpt2"))
    }
    assert(ex.getMessage.contains("fresh checkpoint"),
      s"expected the named fresh-checkpoint error, got: ${ex.getMessage}")
    assert(IndexStore.storedComponent(spark, idx, "codes").count() == n1)
    IncrementalStream.ivfPqMaintenanceStream(streamOf(src2),
      "vec_id", "embedding", idx, tmp("ivfpq-freshckpt-ckpt2b"),
      streamId = Some("inc2")).awaitTermination()
    val codes = IndexStore.storedComponent(spark, idx, "codes")
    assert(codes.count() == n1 + wave2.count(),
      "every streamed vector visible (aliased ids would have been dropped)")
    assert(codes.groupBy("id").count().filter($"count" > 1).count() == 0,
      "no vector visible twice")
  }

  test("appendEncodedStreamBatch: a rebuild between encode and commit fails loud; the batch stays invisible") {
    val e = embeddings
    val cb1 = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-stream-race")
    Similarity.writeIvfPqIndex(e.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", cb1, idx)
    val (centroids, oldCb) = Similarity.frozenGeometryOf(spark, idx)
    val encoded = Similarity.encodeForIndex(e.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", centroids, oldCb)
    // the rebuild wins the race before the micro-batch commits
    Similarity.rebuildIvfPqIndex(spark, idx,
      e.filter($"vec_id" % 4 =!= 0), "vec_id", "embedding",
      rebuildId = "stream-race-r1")
    val ex = intercept[Exception] {
      Similarity.appendEncodedStreamBatch(spark, idx, encoded,
        "stream-000000000", Similarity.codebookFp(oldCb))
    }
    assert(ex.getMessage.contains("rebuild installed during streaming append"))
    // unledgered -> invisible; serving green under the new codebook
    val cb2 = Similarity.codebookOf(spark, idx)
    val served = Similarity.topKIvfPqFromIndex(spark, idx,
      e.filter($"vec_id" === 7), "vec_id", "embedding", k = 10, cb2)
      .as[(Long, Long)].collect().toSeq
    assert(!served.map(_._1).contains(8L), "raced micro-batch stays invisible")
  }

  test("rebuildMinhashIndex: new banding finds the planted pair the old banding misses; probe rerun-identical; replay no-op; appends re-derive under new params") {
    // planted near-dup pair: ~31% 3-shingle Jaccard — above the 1/5
    // verify threshold, but with 2 bands of 16 rows the band-collision
    // probability is ~0.31^16 per band: the OLD banding misses it
    val shared = (0 until 20).map(i => s"alpha$i").mkString(" ")
    val restA = (0 until 18).map(i => s"beta$i").mkString(" ")
    val restB = (0 until 18).map(i => s"gamma$i").mkString(" ")
    val corpus = Seq((1L, s"$shared $restA")).toDF("doc_id", "text")
    val probe = Seq((900L, s"$shared $restB")).toDF("doc_id", "text")
    val idx = tmp("mh-rebuild")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx,
      n = 3, numHashes = 32, bands = 2)
    assert(probePairs(idx, probe).isEmpty,
      "the wide-band build must miss the planted pair (that is the drift)")
    // the drift SIGNAL: sampled ground-truth band recall sees the miss
    def bandRecall(): (Long, Long, Boolean) = {
      val r = Dedup.minhashBandRecall(spark, idx,
        corpus.unionByName(probe), "doc_id", "text").collect().head
      (r.getLong(0), r.getLong(2), r.getBoolean(3))
    }
    assert(bandRecall() == ((1L, 0L, false)),
      "one truth pair, zero band hits, below the floor -> rebuild fires")
    // re-tune: 32 bands of 1 row — candidate recall ~1 at J=0.31
    Dedup.rebuildMinhashIndex(spark, idx, corpus, "doc_id", "text",
      rebuildId = "mh-r1", n = 3, numHashes = 32, bands = 32)
    assert(bandRecall() == ((1L, 100L, true)),
      "the re-banded index recovers the sampled recall — signal cleared")
    assert(Dedup.minhashIndexParams(spark, idx) == ((3, 32, 32)),
      "the self-describing params flip with the rebuild")
    val found = probePairs(idx, probe)
    assert(found.map(p => (p._1, p._2)) == Set((900L, 1L)),
      s"the re-banded index must find the planted pair, got $found")
    assert(probePairs(idx, probe) == found, "probe is rerun-identical")
    // replaying the ledgered rebuild id is a no-op
    val vS = IndexStore.pinOf(spark, idx, "shingles").v
    Dedup.rebuildMinhashIndex(spark, idx, corpus, "doc_id", "text",
      rebuildId = "mh-r1", n = 3, numHashes = 32, bands = 2)
    assert(IndexStore.pinOf(spark, idx, "shingles").v == vS &&
      probePairs(idx, probe) == found, "replayed rebuild must change nothing")
    // appends after the rebuild re-derive under the NEW params (read
    // back from the self-describing meta) and are probe-visible
    Dedup.appendToMinhashIndex(
      Seq((2L, s"$shared $restB")).toDF("doc_id", "text"),
      "doc_id", "text", idx, batchId = "post-rebuild")
    val withNew = probePairs(idx, probe)
    assert(withNew.map(p => (p._1, p._2)) == Set((900L, 1L), (900L, 2L)),
      s"post-rebuild append joins the new bucket space, got $withNew")
  }

  test("minhash params guard: foreign-parameter delta rows fail the probe with the named error; health reports them; a raced append is never ledgered") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0).limit(200)
    val idx = tmp("mh-foreign")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx,
      n = 3, numHashes = 32, bands = 8)
    val (pbN0, sbN0) = Dedup.minhashIndexBuckets(spark, idx)
    val day1 = docs.filter($"doc_id" % 10 === 0).limit(50)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    // a raced append: the parameter rebuild installs between the append's
    // derive and its ledger commit -> named error, batch invisible
    val ex = intercept[Exception] {
      Dedup.appendToMinhashIndex(day1, "doc_id", "text", idx,
        batchId = "raced",
        preCommitHook = () => Dedup.rebuildMinhashIndex(spark, idx, corpus,
          "doc_id", "text", rebuildId = "mh-race-r1",
          n = 3, numHashes = 32, bands = 16))
    }
    assert(ex.getMessage.contains("parameter rebuild installed during append"),
      s"expected the named race error, got: ${ex.getMessage}")
    val probe = docs.filter($"doc_id" % 10 === 0).limit(20)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    // probes are green (the raced batch never became visible)...
    probePairs(idx, probe)
    // ...until an out-of-contract writer force-ledgers old-params rows
    // (stamped with the PRE-rebuild fingerprint and bucket layout)
    val hashed = Dedup.shingleHashSets(day1, "doc_id", "text", 3)
      .withColumn("params_fp", lit(Dedup.paramsFp(3, 32, 8, pbN0, sbN0)))
      .withColumn("sb", Dedup.shingleBucket($"id", sbN0))
    hashed.write.mode("overwrite").parquet(s"$idx/shingles_delta/batch=rogue")
    Dedup.bandRowsOf(hashed, 32, 8)
      .withColumn("params_fp", lit(Dedup.paramsFp(3, 32, 8, pbN0, sbN0)))
      .withColumn("pb", Dedup.bandBucket($"bh", pbN0))
      .write.mode("overwrite").parquet(s"$idx/bands_delta/batch=rogue")
    IndexStore.ledgerBatch(spark, idx, "rogue")
    val ex2 = intercept[Exception] { probePairs(idx, probe) }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(ex2).contains("foreign-parameter rows"),
      s"expected the named guard error, got: ${messages(ex2)}")
    val h = Dedup.minhashIndexHealth(spark, idx)
      .select("n_foreign_params_rows", "foreign_params_detected")
      .collect().head
    assert(h.getLong(0) > 0L && h.getBoolean(1),
      "health must report the foreign-parameter rows")
  }

  test("maintenance lease: a concurrent maintenance job fails loud; a stale lock is broken; failure inside the lease still releases it") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0).limit(100)
    val idx = tmp("mh-lease")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val day = docs.filter($"doc_id" % 10 === 0).limit(30)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "d1")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$idx/_maintenance_lock")
    // another maintenance job holds the lease (fresh lock)
    fs.create(lock, false).close()
    val ex = intercept[Exception] { Dedup.compactMinhashIndex(spark, idx) }
    assert(ex.getMessage.contains("maintenance already in progress"),
      s"expected the named lease error, got: ${ex.getMessage}")
    val ex2 = intercept[Exception] { Dedup.vacuumMinhashIndex(spark, idx) }
    assert(ex2.getMessage.contains("maintenance already in progress"))
    // the holder CRASHED: its lock ages past the TTL and is broken
    fs.setTimes(lock, System.currentTimeMillis() - 25L * 3600 * 1000, -1)
    val (fb, fa, rows) = Dedup.compactMinhashIndex(spark, idx)
    // rows sums both components: one shingle row + `bands` band rows
    // per doc (default 8 bands -> 9 rows/doc)
    assert(rows == (corpus.count() + day.count()) * 9 && fa < fb)
    assert(!fs.exists(lock), "the lease is released after a successful pass")
    // a FAILING pass (foreign-params delta trips the compaction guard)
    // must release the lease too — a wedged index would need manual
    // lock removal after every guard trip
    val rogue = Dedup.shingleHashSets(day.limit(5)
        .select(($"doc_id" + 7000000L).as("doc_id"), $"text"),
        "doc_id", "text", 3)
      .withColumn("params_fp", lit("n9-h99-b9"))
    rogue.write.mode("overwrite").parquet(s"$idx/shingles_delta/batch=rg")
    Dedup.bandRowsOf(rogue, 32, 8).withColumn("params_fp", lit("n9-h99-b9"))
      .write.mode("overwrite").parquet(s"$idx/bands_delta/batch=rg")
    IndexStore.ledgerBatch(spark, idx, "rg")
    intercept[Exception] { Dedup.compactMinhashIndex(spark, idx) }
    assert(!fs.exists(lock),
      "the lease is released when the pass fails (finally semantics)")
  }

  test("maintenance lease is owner-checked: an over-TTL holder's release cannot delete a successor's lock; a third job still fails loud") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0).limit(50)
    val idx = tmp("mh-lease-owner")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$idx/_maintenance_lock")
    // job A acquires the lease and then OUTLIVES the TTL (its body
    // blocks until released; the lock is aged manually below)
    val aInside = new java.util.concurrent.CountDownLatch(1)
    val aRelease = new java.util.concurrent.CountDownLatch(1)
    val aThread = new Thread(() => {
      IndexStore.withMaintenanceLease(spark, idx, "slow-a") {
        aInside.countDown()
        aRelease.await()
      }
      ()
    })
    aThread.start()
    assert(aInside.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // age A's lease: staleness is judged from the lock CONTENT's create
    // timestamp (mtime is rename-unstable on object stores), so the
    // spec rewrites the timestamp while preserving A's token
    val content = {
      val in = fs.open(lock)
      try {
        val buf = new Array[Byte](256)
        val n = math.max(in.read(buf), 0)
        new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
    val aged = content.substring(0, content.lastIndexOf('|')) +
      s"|${System.currentTimeMillis() - 25L * 3600 * 1000}"
    locally {
      val out = fs.create(lock, true)
      out.write(aged.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
    // successor B breaks A's stale lock and holds the lease; while B
    // holds it, A's release runs — and must NOT delete B's lock
    IndexStore.withMaintenanceLease(spark, idx, "succ-b") {
      aRelease.countDown()
      aThread.join(30000)
      assert(!aThread.isAlive, "job A must have finished releasing")
      assert(fs.exists(lock),
        "A's owner-checked release must leave the successor's lock intact")
      // third job: B's lock is fresh, so it fails loud — the lease was
      // not silently vacated by A's release
      val ex = intercept[Exception] { Dedup.vacuumMinhashIndex(spark, idx) }
      assert(ex.getMessage.contains("maintenance already in progress"),
        s"expected the named lease error, got: ${ex.getMessage}")
    }
    assert(!fs.exists(lock), "B's own release still clears its lock")
  }

  test("writeMinhashIndex half-install (bands live, shingles not) recovers: probes fail loud, the re-run finishes installing v=0") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0).limit(100)
    val idx = tmp("mh-half-install")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val probe = docs.filter($"doc_id" % 10 === 0).limit(20)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val healthy = probePairs(idx, probe)
    // simulate the crash between the two fold commits: bands committed,
    // shingles not (build order is bands first, shingles last)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/shingles_folds/v=0"), true)
    val ex = intercept[Exception] { probePairs(idx, probe) }
    assert(ex.getMessage.contains("no complete version"),
      "a half-installed index must fail probes loud, not return zero pairs")
    // the create-once gate checks the LAST-committed component, so the
    // re-run is allowed and completes the install
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    assert(probePairs(idx, probe) == healthy,
      "the recovered v=0 must probe identically to the uncrashed build")
  }

  test("probe second-level pruning: the batch's band hashes and candidate ids reach the base scans as pushed IN filters; probe shape observable records both levels") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-inpush")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3,
      bandBuckets = Some(64), shingleBuckets = Some(64))
    val probe = corpus.limit(4)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val plan = Dedup.probeMinhashIndex(spark, idx, probe, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // partition level (round 12) AND the new row-group level: the
    // bands base scan carries bh IN (...) in PushedFilters, the
    // shingles verify scan id IN (...) — exact-value predicates over
    // the columns the buckets are SORTED by, so parquet row-group
    // stats prune within the selected buckets
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*In\\(bh, *\\[.*"),
      s"expected a pushed In(bh, ...) on the bands base scan in:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*In\\(id, *\\[.*"),
      s"expected a pushed In(id, ...) on the shingles base scan in:\n$plan")
    // the observable latch: a selective probe records coverage and both
    // pushed-list sizes
    val shape = Dedup.lastProbeShape.get
    assert(shape.bandBuckets == 64 && shape.shingleScanPruned)
    assert(shape.bucketCoveragePct ==
      shape.batchBandBuckets * 100L / shape.bandBuckets)
    assert(shape.pushedBandHashes > 0 && shape.pushedBandHashes <= 4 * 8,
      "a 4-doc probe pushes at most 4*bands distinct band hashes")
    // a bucket-saturating bulk probe reports the gate skip: coverage at
    // or past the 75% gate, verify-scan pruning off
    val bulk = corpus.select(($"doc_id" + 3000000L).as("doc_id"), $"text")
    Dedup.probeMinhashIndex(spark, idx, bulk, "doc_id", "text").count()
    val bulkShape = Dedup.lastProbeShape.get
    assert(!bulkShape.shingleScanPruned &&
      bulkShape.bucketCoveragePct * 4 >= 300L,
      s"bulk probe must report the gate skip, got $bulkShape")
  }

  test("pushed IN over a sorted column prunes row groups: the scan reads only the matching files' rows") {
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
    val dest = tmp("in-rowgroup-prune")
    // 20 single-row-group files, each a contiguous sorted bh range —
    // the writeBucketed layout in miniature (row-group stats == file
    // stats here, so skipped row groups are directly observable)
    spark.range(100000).select($"id".as("bh"))
      .orderBy("bh").coalesce(1)
      .write.option("maxRecordsPerFile", 5000).mode("overwrite").parquet(dest)
    val vals: Seq[Any] = Seq(3L, 50001L, 99999L)
    val df = spark.read.parquet(dest).filter($"bh".isin(vals: _*))
    assert(df.count() == 3)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val rowsRead = scans.map(_.metrics("numOutputRows").value).sum
    assert(rowsRead <= 15000,
      s"expected row-group stats to prune to ~3 of 20 groups, read $rowsRead rows")
  }

  test("lease release is rename-fenced: a release racing a break+reacquire restores the successor's lock instead of deleting it") {
    val idx = tmp("lease-release-fence")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$idx/_maintenance_lock")
    val successorTok = s"successor-${java.util.UUID.randomUUID()}"
    // inside the release's read-vs-rename window: a breaker captures
    // the (presumed stale) lock and a successor acquires the path
    IndexStore.withMaintenanceLease(spark, idx, "holder",
      releaseRaceHook = () => {
        fs.rename(lock,
          new org.apache.hadoop.fs.Path(s"$idx/_maintenance_lock.breaking.t"))
        val out = fs.create(lock, false)
        out.write(s"$successorTok|${System.currentTimeMillis()}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
      }) { () }
    // the round-12 release would have deleted the lock here (token
    // matched before the window); the rename fence captures the
    // successor's lock, sees the foreign token, and hands it back
    assert(fs.exists(lock), "successor's lock must survive the release")
    val in = fs.open(lock)
    val buf = new Array[Byte](256)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      .startsWith(successorTok), "the surviving lock is the successor's")
    // and it still excludes a third maintenance job
    val ex = intercept[Exception] {
      IndexStore.withMaintenanceLease(spark, idx, "third") { () }
    }
    assert(ex.getMessage.contains("maintenance already in progress"))
    // no capture debris left behind (the hand-back restored, not copied)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(idx)).exists(
      _.getPath.getName.startsWith("_maintenance_lock.releasing.")))
  }

  test("file census reads the manifest-recorded counts: census == actual listing after build, append and compaction; a pre-upgrade manifest falls back to listing") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-census")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val day = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    Dedup.appendToMinhashIndex(day, "doc_id", "text", idx, batchId = "d1")
    def actual(component: String): Long = {
      val pin = IndexStore.pinOf(spark, idx, component)
      graft.operators.Layout.nParquetFiles(spark,
        IndexStore.versionDir(idx, component, pin.v)) +
        IndexStore.unfoldedBatchIds(spark, idx, pin)
          .map(id => graft.operators.Layout.nParquetFiles(spark,
            s"$idx/${component}_delta/batch=$id")).sum
    }
    def census(component: String): Long =
      IndexStore.liveComponentFiles(spark, idx, component,
        IndexStore.pinOf(spark, idx, component))
    Seq("shingles", "bands").foreach { c =>
      assert(census(c) == actual(c), s"census mismatch on $c pre-compaction")
    }
    Dedup.compactMinhashIndex(spark, idx)
    Seq("shingles", "bands").foreach { c =>
      assert(census(c) == actual(c), s"census mismatch on $c post-compaction")
    }
    // pre-upgrade manifest (no base_files row): rewrite the live fold
    // manifest without the count — the census falls back to listing
    // and still matches
    val pin = IndexStore.pinOf(spark, idx, "shingles")
    IndexStore.commitFolds(spark, idx, "shingles", pin.v, pin.foldedBatches)
    assert(census("shingles") == actual("shingles"),
      "pre-upgrade manifests must fall back to the actual listing")
  }

  test("health surfaces the bucket re-anchor: suggested_*_buckets escape the layout clamp, and a rebuild adopting the suggestion re-anchors the meta") {
    // the suggestion is the UNclamped sizing rule
    assert(Dedup.suggestedBuckets(100L) == 8L, "floor at 8")
    assert(Dedup.suggestedBuckets(8192L * 4096L) == 4096L)
    assert(Dedup.suggestedBuckets(8192L * 4096L * 16L) == 65536L,
      "the suggestion keeps growing past the clamp")
    assert(Dedup.bucketsFor(8192L * 4096L * 16L) == 4096,
      "the default layout clamps at 4096")
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-suggest")
    // deliberately undersized layout: health must recommend the resize
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3,
      bandBuckets = Some(1), shingleBuckets = Some(1))
    val h = Dedup.minhashIndexHealth(spark, idx)
      .select("band_buckets", "suggested_band_buckets",
        "suggested_shingle_buckets", "bucket_resize_recommended",
        "rows_per_band_bucket").head()
    assert(h.getLong(0) == 1L)
    assert(h.getLong(1) >= 8L && h.getLong(2) >= 8L)
    assert(h.getBoolean(3), "1-bucket layout must recommend a resize")
    assert(h.getLong(4) == corpus.count() * 8,
      "band rows per bucket = docs*bands/buckets exactly")
    val probe = corpus.limit(4)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val before = probePairs(idx, probe)
    // the adoption loop: rebuild with the suggested counts; the meta
    // re-anchors and the probe result is unchanged
    Dedup.rebuildMinhashIndex(spark, idx, corpus, "doc_id", "text",
      rebuildId = "suggest-r1", n = 3, numHashes = 32, bands = 8,
      bandBuckets = Some(h.getLong(1).toInt),
      shingleBuckets = Some(h.getLong(2).toInt))
    val h2 = Dedup.minhashIndexHealth(spark, idx)
      .select("band_buckets", "shingle_buckets",
        "bucket_resize_recommended").head()
    assert(h2.getLong(0) == h.getLong(1) && h2.getLong(1) == h.getLong(2),
      "the rebuild adopts the suggested layout")
    assert(!h2.getBoolean(2), "adopting the suggestion clears the verdict")
    assert(probePairs(idx, probe) == before, "re-anchoring B is lossless")
  }

  test("legacy (pre-token) checkpoint resumes in legacy mode: un-namespaced ids, exactly-once; a streamId against it fails loud; oversized streamIds rejected") {
    import graft.streaming.IncrementalStream
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-legacy")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3)
    val wave1 = docs.filter($"doc_id" % 5 === 2)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    val wave2 = docs.filter($"doc_id" % 5 === 3)
      .select(($"doc_id" + 3000L).as("doc_id"), $"text")
    val src = tmp("mh-legacy-src")
    val ckpt = tmp("mh-legacy-ckpt")
    wave1.coalesce(1).write.mode("overwrite").parquet(src)
    def streamOf() = spark.readStream.schema(wave1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    IncrementalStream.minhashMaintenanceStream(
      streamOf(), "doc_id", "text", idx, ckpt).awaitTermination()
    val afterWave1 = Dedup.storedMinhashComponent(spark, idx, "shingles").count()
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a LOST token on a post-upgrade checkpoint is NOT legacy: the
    // ledger holds namespaced ids, so adopting un-namespaced ones
    // would let a replayed uncommitted micro-batch land twice — it
    // must fail with the lost-token remediation, not resume silently
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/_graft_stream_instance"), false)
    val exLost = intercept[Exception] {
      IncrementalStream.minhashMaintenanceStream(
        streamOf(), "doc_id", "text", idx, ckpt)
    }
    assert(exLost.getMessage.contains("token file was lost"),
      s"expected the lost-token error, got: ${exLost.getMessage}")
    // craft the faithful PRE-upgrade fixture: un-namespaced ledger ids
    // and delta dirs (what a pre-token incarnation actually wrote),
    // offsets present, no token file — the round-12 code dead-ended
    // here with the 'fresh checkpoint' error whose remediation ("reuse
    // the original checkpoint") is exactly what was being attempted
    val ledPath = s"$idx/_ledger"
    val led = spark.read.parquet(ledPath).collect().map { r =>
      (r.getString(r.fieldIndex("folder_name")),
        r.getString(r.fieldIndex("file_name"))
          .replaceAll("^stream-[^-]+-", "stream-"),
        r.getTimestamp(r.fieldIndex("loaded_at")))
    }.toSeq
    led.toDF("folder_name", "file_name", "loaded_at")
      .write.mode("overwrite").parquet(ledPath)
    Seq("shingles_delta", "bands_delta").foreach { d =>
      new java.io.File(s"$idx/$d").listFiles()
        .filter(_.getName.startsWith("batch=stream-")).foreach { f =>
          val fixed = f.getName.replaceAll("^batch=stream-[^-]+-", "batch=stream-")
          if (fixed != f.getName)
            fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
              new org.apache.hadoop.fs.Path(s"$idx/$d/$fixed"))
        }
    }
    wave2.coalesce(1).write.mode("append").parquet(src)
    IncrementalStream.minhashMaintenanceStream(
      streamOf(), "doc_id", "text", idx, ckpt).awaitTermination()
    val sh = Dedup.storedMinhashComponent(spark, idx, "shingles")
    assert(sh.count() == afterWave1 + wave2.count(),
      "the resumed legacy checkpoint ingests the new wave exactly once")
    assert(sh.groupBy("id").count().filter($"count" > 1).count() == 0)
    // the adopted incarnation ledgers UN-namespaced legacy ids
    val ids = IndexStore.ledgeredBatchIds(spark, idx)
    assert(ids.exists(_.matches("stream-\\d{9}")),
      s"expected legacy stream-NNNNNNNNN ids, got ${ids.mkString(",")}")
    // a replay run on the same checkpoint stays a no-op
    IncrementalStream.minhashMaintenanceStream(
      streamOf(), "doc_id", "text", idx, ckpt).awaitTermination()
    assert(Dedup.storedMinhashComponent(spark, idx, "shingles").count()
      == afterWave1 + wave2.count())
    // renaming the legacy incarnation via an explicit streamId is the
    // same instance change the token path refuses
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/_graft_stream_instance"), false)
    val ex = intercept[Exception] {
      IncrementalStream.minhashMaintenanceStream(
        streamOf(), "doc_id", "text", idx, ckpt, streamId = Some("late"))
    }
    assert(ex.getMessage.contains("legacy"),
      s"expected the named legacy-mismatch error, got: ${ex.getMessage}")
    // a streamId longer than the persisted-token read can round-trip
    // is rejected up front (it would spuriously mismatch on read-back)
    val ex2 = intercept[Exception] {
      IncrementalStream.minhashMaintenanceStream(
        streamOf(), "doc_id", "text", idx, tmp("mh-legacy-ckpt2"),
        streamId = Some("x" * 65))
    }
    assert(ex2.getMessage.contains("64"),
      s"expected the length bound in: ${ex2.getMessage}")
  }

  test("minhashIndexHealth carries the probe-shape observables: a saturating probe is visible in the report, not just the latch") {
    val corpus = docs.filter($"doc_id" % 5 === 1)
    val idx = tmp("mh-shape-health")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx, n = 3,
      bandBuckets = Some(64), shingleBuckets = Some(64))
    // fresh index, no probes yet: the report says so (per-path history
    // — another index's probes never leak into this one's row)
    val h0 = Dedup.minhashIndexHealth(spark, idx).collect().head
    assert(h0.getAs[Long]("probes_observed") == 0L &&
      !h0.getAs[Boolean]("probe_saturation_observed"),
      s"fresh index must report zero probes, got $h0")
    // a selective (at-ingest-shaped) probe: recorded, not saturating
    val small = corpus.limit(4)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    Dedup.probeMinhashIndex(spark, idx, small, "doc_id", "text").count()
    val h1 = Dedup.minhashIndexHealth(spark, idx).collect().head
    assert(h1.getAs[Long]("probes_observed") == 1L &&
      !h1.getAs[Boolean]("probe_saturation_observed"),
      s"selective probe must be visible and non-saturating, got $h1")
    // a bucket-saturating bulk probe: the gate skip reaches the REPORT
    // (round 13 it lived only in the latch, which concurrent probes
    // could clobber before anything polled it)
    val bulk = corpus.select(($"doc_id" + 3000000L).as("doc_id"), $"text")
    Dedup.probeMinhashIndex(spark, idx, bulk, "doc_id", "text").count()
    val h2 = Dedup.minhashIndexHealth(spark, idx).collect().head
    assert(h2.getAs[Long]("probes_observed") == 2L &&
      h2.getAs[Boolean]("probe_saturation_observed") &&
      h2.getAs[Long]("probe_max_bucket_coverage_pct") * 4 >= 300L,
      s"saturating probe must be visible in the report, got $h2")
    // per-path isolation: a sibling index sees none of these probes
    val idx2 = tmp("mh-shape-health2")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idx2, n = 3)
    val hSib = Dedup.minhashIndexHealth(spark, idx2).collect().head
    assert(hSib.getAs[Long]("probes_observed") == 0L,
      "shape history is keyed by index path")
  }

  test("ivfPqIndexHealth carries the serve-shape observables: a cell-saturating batch serve is visible in the report") {
    val e = embeddings
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-shape-health")
    Similarity.writeIvfPqIndex(e, "vec_id", "embedding", cb, idx)
    val queries = e.filter($"vec_id".isin(3, 7, 8, 11))
    def health() = Similarity.ivfPqIndexHealth(spark, idx, e,
      "vec_id", "embedding", queries, k = 5, recallFloorPct = 0)
      .collect().head
    // the health report itself runs ONE batched serve (its served
    // sides), so the first row already observes it — at the default
    // nProbe=4 over 16 cells a 4-query batch may or may not saturate;
    // what must hold is that the count and max coverage are recorded
    val h0 = health()
    assert(h0.getAs[Long]("serves_observed") >= 1L,
      s"health's own batched serve must be recorded, got $h0")
    // an all-cells serve (nProbe = n_cells) saturates the partition
    // pruning by construction; the NEXT report must say so
    Similarity.topKIvfPqManyFromIndex(spark, idx, queries,
      "vec_id", "embedding", k = 5, Similarity.codebookOf(spark, idx),
      nProbe = h0.getAs[Long]("n_cells").toInt).count()
    val h1 = health()
    assert(h1.getAs[Boolean]("serve_saturation_observed") &&
      h1.getAs[Long]("serve_max_cell_coverage_pct") == 100L,
      s"a saturating batch must be visible in the report, got $h1")
  }

  test("quant-err sampling: a partition-column sample is a PartitionFilter reading a strict file subset; forced sampling over it still fires drift") {
    val e = embeddings
    // land `current` as a pb-partitioned vector store (the shape the
    // 100 TB daily health job would read)
    val src = tmp("qerr-partcol")
    e.withColumn("pb", pmod(xxhash64($"vec_id"), lit(8L)))
      .write.partitionBy("pb").mode("overwrite").parquet(src)
    val cur = spark.read.parquet(src)
    val nCur = cur.count()
    // pick an m (deterministically — xxhash64 is fixed) that selects
    // SOME but not ALL of the 8 pb partition values
    val m = Seq(2L, 3L, 4L, 5L, 7L).find { cand =>
      val sel = spark.range(8)
        .filter(pmod(xxhash64($"id"), lit(cand)) === 0L).count()
      sel > 0L && sel < 8L
    }.get
    val sampled = Similarity.quantErrSampleRelation(cur, "pb", m)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*pb.*"),
      s"expected the 1-in-m predicate as a pb PartitionFilter in:\n$plan")
    val totalFiles = cur.select(input_file_name()).distinct().count()
    val sampledFiles = sampled.select(input_file_name()).distinct().count()
    assert(sampledFiles > 0 && sampledFiles < totalFiles,
      s"partition-level sample must read a strict file subset " +
        s"($sampledFiles of $totalFiles)")
    // e2e: health with the partition sample key, bound sized so the
    // applied m is exactly the one probed above (nCur >> m²), over a
    // genuinely drifted corpus — sampling is REPORTED and drift fires
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("qerr-partcol-idx")
    Similarity.writeIvfPqIndex(e, "vec_id", "embedding", cb, idx)
    val drifted = cur.select($"vec_id",
      transform($"embedding", x => x * 3.0d + 7.0d).as("embedding"),
      $"pb")
    val bound = ((nCur + m - 1) / m).toInt
    val h = Similarity.ivfPqIndexHealth(spark, idx, drifted,
      "vec_id", "embedding", queries = e.filter($"vec_id".isin(3, 7)),
      k = 5, recallFloorPct = 0, maxQuantErrRows = bound,
      quantErrPartitionCol = Some("pb")).collect().head
    assert(h.getAs[Long]("quant_err_sample_mod") == m,
      s"the partition-sampled pass must report its m, got $h")
    assert(h.getAs[Boolean]("quant_drift_detected"),
      "partition-level sampling must still detect real drift")
  }

  test("serve guards: a null query id fails by name; the driver-side cell-selection ceiling refuses unservable geometries") {
    val e = embeddings
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val idx = tmp("ivfpq-guards")
    Similarity.writeIvfPqIndex(e, "vec_id", "embedding", cb, idx)
    // a NULL id (ANSI mode already fails loud on a MALFORMED string
    // cast — a null value is the case that sails through the cast and
    // would NPE at getLong) must raise the named guard instead
    val badIds = e.filter($"vec_id".isin(3, 7))
      .select(when($"vec_id" === 3, lit(null).cast("long"))
        .otherwise($"vec_id").as("nid"), $"embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.topKIvfPqManyFromIndex(spark, idx, badIds,
        "nid", "embedding", k = 5, cb)
    }
    assert(ex.getMessage.contains("produced null"),
      s"expected the named null-qid error, got: ${ex.getMessage}")
    // the cell ceiling: cell selection collects the centroid relation
    // to the driver (|q| × nCells dots) — a geometry past the
    // suggestedCells clamp is refused at BUILD time (and rebuild), so
    // an unservable index can never be installed
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.writeIvfPqIndex(e, "vec_id", "embedding", cb,
        tmp("ivfpq-too-many-cells"), nCells = 70000)
    }
    assert(ex2.getMessage.contains("coarse quantizer"),
      s"expected the ceiling error with its remediation, got: ${ex2.getMessage}")
  }
}
