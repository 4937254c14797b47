package graft.streaming

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.index.IndexBuilder
import graft.query.{And, Or, Searcher}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ingestion: a MemoryStream of turns folded into the index via
  * foreachBatch must equal a batch build over everything seen, including
  * replacement of re-delivered (conv_id, turn_idx) turns; and per-batch
  * WORK must be bounded by the batch, not the index. */
class StreamingIndexerSpec extends SparkSpec {
  import spark.implicits._

  private val analyzer = Analyzer.standard()

  test("stream-fold == batch build; redelivery replaces") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Int, String)]
    val turns = stream.toDF().toDF("conv_id", "turn_idx", "text")

    val empty = IndexBuilder.build(
      Seq.empty[(Long, String, Int, String)].toDF("doc_ord", "conv_id", "turn_idx", "text"),
      analyzer, materialize = true)
    val si = new StreamingIndexer(empty, analyzer)
    val q = si.writer(turns).start()

    stream.addData(("c1", 0, "aa bb"), ("c1", 1, "cc dd"))
    q.processAllAvailable()
    stream.addData(("c2", 0, "aa zz"), ("c1", 1, "cc REPLACED"))
    q.processAllAvailable()
    q.stop()

    val s = new Searcher(si.index, analyzer)
    def ids(kw: String) =
      s.matchQuery(kw, Or).select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(si.index.numDocs == 3)
    assert(ids("aa") == Set(("c1", 0), ("c2", 0)))
    assert(ids("replaced") == Set(("c1", 1)))
    assert(ids("dd").isEmpty) // replaced content gone
    assert(ids("zz") == Set(("c2", 0)))
  }

  private def turnsDf(rows: Seq[(String, Int, String)]) =
    rows.toDF("conv_id", "turn_idx", "text")

  private def corpus(n: Int): Seq[(String, Int, String)] =
    (0 until n).map(i => (f"c$i%05d", 0,
      s"term${i % 37} term${(i * 7) % 37} term${(i * 13) % 37} filler common"))

  private def freshIndexer(baseRows: Seq[(String, Int, String)]): StreamingIndexer = {
    val base = IndexBuilder.buildFromTurns(turnsDf(baseRows), analyzer, materialize = true)
    new StreamingIndexer(base, analyzer)
  }

  private def queriesOf(si: StreamingIndexer): Seq[Set[Long]] = {
    val s = new Searcher(si.index, analyzer)
    Seq(
      s.matchQuery("term3 common", And),
      s.matchQuery("replacedterm newterm", Or),
      s.phraseQuery("filler common"),
      s.bm25TopK("term5 term11", 10)
    ).map(_.select("doc_ord").collect().map(_.getLong(0)).toSet)
  }

  test("multi-batch fold (with replacements + flush) == fresh batch build") {
    val baseRows = corpus(60)
    val b1 = Seq(("x1", 0, "newterm alpha common"), ("c00003", 0, "replacedterm beta"))
    val b2 = Seq(("x2", 0, "gamma newterm"), ("x1", 0, "delta replaced again"),
      ("c00007", 0, ""))
    val si = freshIndexer(baseRows)
    si.addBatch(turnsDf(b1))
    si.addBatch(turnsDf(b2))

    // fresh build over the final state of every key
    val finalRows = (baseRows.map(r => (r._1, r._2) -> r._3).toMap
      ++ b1.map(r => (r._1, r._2) -> r._3) ++ b2.map(r => (r._1, r._2) -> r._3))
      .toSeq.map { case ((c, t), x) => (c, t, x) }
    val fresh = new StreamingIndexer(
      IndexBuilder.buildFromTurns(turnsDf(finalRows), analyzer, materialize = true), analyzer)

    assert(si.index.numDocs == fresh.index.numDocs)
    assert(math.abs(si.index.avgDocLen - fresh.index.avgDocLen) < 1e-12,
      s"${si.index.avgDocLen} vs ${fresh.index.avgDocLen}")
    // doc_ord assignment differs between the two paths; compare by key sets
    def byKey(si2: StreamingIndexer, kw: String) = {
      val s = new Searcher(si2.index, analyzer)
      s.matchQuery(kw, Or).select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
    }
    for (kw <- Seq("newterm", "replacedterm", "beta", "common", "term3", "again"))
      assert(byKey(si, kw) == byKey(fresh, kw), s"query '$kw'")
    // df/cf stay exact across replacements
    val dictS = si.index.termDict.select("term", "df", "cf").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val dictF = fresh.index.termDict.select("term", "df", "cf").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dictS == dictF)

    // flush compacts without changing any answer
    val before = queriesOf(si)
    si.flush()
    assert(queriesOf(si) == before)
    assert(dictS == si.index.termDict.select("term", "df", "cf").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap)
  }

  test("removeBatch: base/delta removals + revival == fresh build of survivors") {
    val baseRows = corpus(60)
    val si = freshIndexer(baseRows)
    si.addBatch(turnsDf(Seq(
      ("x1", 0, "newterm alpha common"), ("c00003", 0, "replacedterm beta"))))
    // remove a base doc, a delta-resident replacement, a fresh delta doc;
    // unknown keys are no-ops
    si.removeBatch(Seq(("c00010", 0), ("c00003", 0), ("x1", 0), ("nope", 9))
      .toDF("conv_id", "turn_idx"))
    // double-remove is a no-op too
    si.removeBatch(Seq(("c00010", 0)).toDF("conv_id", "turn_idx"))
    // revive one removed key with new content: stable semantics, and the
    // removal's decrement must not be repeated (df/cf stay exact)
    si.addBatch(turnsDf(Seq(("x1", 0, "revived gamma common"))))

    val finalRows = (baseRows.map(r => (r._1, r._2) -> r._3).toMap
      + (("c00003", 0) -> "replacedterm beta")
      - (("c00010", 0)) - (("c00003", 0))
      + (("x1", 0) -> "revived gamma common"))
      .toSeq.map { case ((c, t), x) => (c, t, x) }
    val fresh = new StreamingIndexer(
      IndexBuilder.buildFromTurns(turnsDf(finalRows), analyzer, materialize = true), analyzer)

    assert(si.index.numDocs == fresh.index.numDocs)
    assert(math.abs(si.index.avgDocLen - fresh.index.avgDocLen) < 1e-12,
      s"${si.index.avgDocLen} vs ${fresh.index.avgDocLen}")
    def byKey(si2: StreamingIndexer, kw: String) = {
      val s = new Searcher(si2.index, analyzer)
      s.matchQuery(kw, Or).select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
    }
    for (kw <- Seq("newterm", "alpha", "replacedterm", "beta", "common",
        "term3", "revived", "gamma"))
      assert(byKey(si, kw) == byKey(fresh, kw), s"query '$kw'")
    assert(byKey(si, "replacedterm").isEmpty) // the c00003 replacement is gone
    def dict(si2: StreamingIndexer) =
      si2.index.termDict.select("term", "df", "cf").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dict(si) == dict(fresh))

    // flush compacts removals away without changing any answer
    val before = queriesOf(si)
    si.flush()
    assert(queriesOf(si) == before)
    assert(dict(si) == dict(fresh))
  }

  test("storage-backed removeBatch folds removals through the staged removal delta") {
    import graft.index.BlockParams
    import graft.storage.{ParquetIndexStorage, StorageParams}
    val baseRows = corpus(60)
    val baseIdx = IndexBuilder.buildFromTurns(turnsDf(baseRows), analyzer, materialize = true)
    val path = java.nio.file.Files.createTempDirectory("graft_stream_rm_").toString
    ParquetIndexStorage.build(baseIdx.docs, analyzer, path,
      StorageParams(termBuckets = 8, writeGroups = 2, saltFactor = 2,
        blockParams = BlockParams(blockSize = 32, bucketSpan = 64),
        dGroupSpan = 64, keyCols = Seq("conv_id", "turn_idx"), keyBuckets = 16), "spec")

    val si = StreamingIndexer.overStorage(spark, path, analyzer,
      flushThreshold = Long.MaxValue)
    si.addBatch(turnsDf(Seq(
      ("x1", 0, "newterm alpha common"), ("c00003", 0, "replacedterm beta"))))
    // remove a committed base doc AND the never-committed fresh delta doc
    si.removeBatch(Seq(("c00005", 0), ("x1", 0)).toDF("conv_id", "turn_idx"))
    si.addBatch(turnsDf(Seq(("c00007", 0, "late zeta"))))
    si.flush()

    val finalRows = (baseRows.map(r => (r._1, r._2) -> r._3).toMap
      + (("c00003", 0) -> "replacedterm beta")
      - (("c00005", 0))
      + (("c00007", 0) -> "late zeta"))
      .toSeq.map { case ((c, t), x) => (c, t, x) }
    val fresh = IndexBuilder.buildFromTurns(turnsDf(finalRows), analyzer, materialize = true)
    val freshS = new Searcher(fresh, analyzer)
    val cold = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    def byKey(s: Searcher, kw: String) =
      s.matchQuery(kw, Or).select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
    for (kw <- Seq("newterm", "alpha", "replacedterm", "common", "term3",
        "term5", "zeta"))
      assert(byKey(cold, kw) == byKey(freshS, kw), s"query '$kw'")
    assert(cold.index.numDocs == fresh.numDocs)
    assert(math.abs(cold.index.avgDocLen - fresh.avgDocLen) < 1e-12)
    def dict(ti: graft.index.TextIndex) =
      ti.termDict.select("term", "df", "cf").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dict(cold.index) == dict(fresh))
    // removed committed key left the on-disk keymap; never-committed key
    // never entered it
    import org.apache.spark.sql.functions.col
    assert(ParquetIndexStorage.lookupOrds(spark, path,
      Seq(("c00005", 0), ("x1", 0)).toDF("conv_id", "turn_idx")).count() == 0)
    // WAND over the rebuilt persisted blocks ranks like the fresh build
    val freshTop = freshS.bm25TopK("term5 term11", 10)
      .select("conv_id", "turn_idx").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val coldTop = cold.bm25TopKWand("term5 term11", 10)
      .select("conv_id", "turn_idx").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(coldTop == freshTop)
    // live view == cold view after the rebase
    assert(si.index.numDocs == fresh.numDocs)
    assert(byKey(new Searcher(si.index, analyzer), "zeta") == Set(("c00007", 0)))
  }

  test("flush refuses to write into a store compacted since attach") {
    import graft.index.BlockParams
    import graft.storage.{ParquetIndexStorage, StorageParams}
    val baseRows = corpus(60)
    val baseIdx = IndexBuilder.buildFromTurns(turnsDf(baseRows), analyzer, materialize = true)
    val path = java.nio.file.Files.createTempDirectory("graft_stream_cmp_").toString
    ParquetIndexStorage.build(baseIdx.docs, analyzer, path,
      StorageParams(termBuckets = 8, writeGroups = 2, saltFactor = 2,
        blockParams = BlockParams(blockSize = 32, bucketSpan = 64),
        dGroupSpan = 64, keyCols = Seq("conv_id", "turn_idx"), keyBuckets = 16), "spec")
    // open a hole so the compaction actually remaps ordinals
    ParquetIndexStorage.removeDocuments(spark, path,
      Seq(("c00002", 0)).toDF("conv_id", "turn_idx"), "pre_rm")

    val si = StreamingIndexer.overStorage(spark, path, analyzer,
      flushThreshold = Long.MaxValue)
    si.addBatch(turnsDf(Seq(("y1", 0, "buffered sigma"))))
    // external compaction while the indexer holds buffered state: its
    // minted ordinal for y1 now points into the REMAPPED space
    ParquetIndexStorage.compact(spark, path, "cmp_guard")
    val e = intercept[IllegalArgumentException](si.flush())
    assert(e.getMessage.contains("compacted"), e.getMessage)
    // nothing was written: the store still answers from the compacted state
    val cold = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    assert(cold.index.numDocs == baseIdx.numDocs - 1)
    assert(cold.matchQuery("sigma", Or).count() == 0)
    // a FRESH indexer over the compacted store works
    val si2 = StreamingIndexer.overStorage(spark, path, analyzer,
      flushThreshold = Long.MaxValue)
    si2.addBatch(turnsDf(Seq(("y1", 0, "buffered sigma"))))
    si2.flush()
    val cold2 = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    assert(cold2.matchQuery("sigma", Or).count() == 1)
  }

  test("storage-backed flush commits deltas to disk == fresh batch build") {
    import graft.index.BlockParams
    import graft.storage.{ParquetIndexStorage, StorageParams}
    val baseRows = corpus(60)
    val baseIdx = IndexBuilder.buildFromTurns(turnsDf(baseRows), analyzer, materialize = true)
    val path = java.nio.file.Files.createTempDirectory("graft_stream_store_").toString
    ParquetIndexStorage.build(baseIdx.docs, analyzer, path,
      StorageParams(termBuckets = 8, writeGroups = 2, saltFactor = 2,
        blockParams = BlockParams(blockSize = 32, bucketSpan = 128)), "spec")

    // flushThreshold=1: every batch goes through addDocuments' staged
    // dynamic-partition-overwrite and the indexer rebases on committed state
    val si = StreamingIndexer.overStorage(spark, path, analyzer, flushThreshold = 1)
    val b1 = Seq(("x1", 0, "newterm alpha common"), ("c00003", 0, "replacedterm beta"))
    val b2 = Seq(("x2", 0, "gamma newterm"), ("x1", 0, "delta replacedagain"),
      ("c00007", 0, ""))
    si.addBatch(turnsDf(b1))
    si.addBatch(turnsDf(b2))

    val finalRows = (baseRows.map(r => (r._1, r._2) -> r._3).toMap
      ++ b1.map(r => (r._1, r._2) -> r._3) ++ b2.map(r => (r._1, r._2) -> r._3))
      .toSeq.map { case ((c, t), x) => (c, t, x) }
    val fresh = IndexBuilder.buildFromTurns(turnsDf(finalRows), analyzer, materialize = true)
    val freshS = new Searcher(fresh, analyzer)

    // the COMMITTED on-disk index (re-read cold) must answer like the fresh build
    val cold = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    def byKey(s: Searcher, kw: String) =
      s.matchQuery(kw, Or).select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
    for (kw <- Seq("newterm", "replacedterm", "beta", "common", "term3",
        "replacedagain", "alpha"))
      assert(byKey(cold, kw) == byKey(freshS, kw), s"query '$kw'")
    assert(byKey(cold, "dd").isEmpty)

    // dictionary df/cf exact across storage-path replacements
    def dict(ti: graft.index.TextIndex) =
      ti.termDict.select("term", "df", "cf").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dict(ParquetIndexStorage.read(spark, path).index) == dict(fresh))

    // global stats survive the rebase; live view == cold view
    assert(si.index.numDocs == fresh.numDocs)
    assert(math.abs(si.index.avgDocLen - fresh.avgDocLen) < 1e-12)
    val liveS = new Searcher(si.index, analyzer)
    for (kw <- Seq("newterm", "common"))
      assert(byKey(liveS, kw) == byKey(freshS, kw), s"live query '$kw'")

    // BM25 ranking parity on the committed layout (WAND over persisted blocks)
    val freshTop = freshS.bm25TopK("term5 term11", 10)
      .select("conv_id", "turn_idx").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val coldTop = cold.bm25TopKWand("term5 term11", 10)
      .select("conv_id", "turn_idx").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(coldTop == freshTop)

    // RESTART SAFETY: a new indexer over the same committed path starts its
    // flush-epoch counter at 0 again; its first flush must NOT be swallowed
    // by the previous session's delta_stream_0 idempotency marker
    val si2 = StreamingIndexer.overStorage(spark, path, analyzer, flushThreshold = 1)
    si2.addBatch(turnsDf(Seq(("x9", 0, "postrestart epsilon"))))
    val cold2 = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
    assert(byKey(cold2, "postrestart") == Set(("x9", 0)),
      "post-restart flush was swallowed by a stale stream-epoch marker")
    assert(byKey(cold2, "newterm") == byKey(freshS, "newterm")) // old content intact
  }

  test("storage-backed addBatch INPUT BYTES bounded via keymap + d_bucket pruning") {
    import graft.index.BlockParams
    import graft.storage.{ParquetIndexStorage, StorageParams}
    // same vocabulary, 16x the documents: key resolution must go through
    // the bucketed keymap + a d_bucket-pruned docs read — if it scanned the
    // base docs table per micro-batch, bytes read would scale ~16x
    def buildStore(n: Int): String = {
      val baseIdx = IndexBuilder.buildFromTurns(turnsDf(corpus(n)), analyzer,
        materialize = true)
      val path = java.nio.file.Files.createTempDirectory("graft_stream_bytes_").toString
      ParquetIndexStorage.build(baseIdx.docs, analyzer, path,
        StorageParams(termBuckets = 8, writeGroups = 2, saltFactor = 2,
          blockParams = BlockParams(blockSize = 32, bucketSpan = 64),
          dGroupSpan = 64, keyCols = Seq("conv_id", "turn_idx"), keyBuckets = 16), "spec")
      path
    }
    val pSmall = buildStore(100)
    val pLarge = buildStore(1600)
    val siSmall = StreamingIndexer.overStorage(spark, pSmall, analyzer,
      flushThreshold = 1000000L)
    val siLarge = StreamingIndexer.overStorage(spark, pLarge, analyzer,
      flushThreshold = 1000000L)
    val batch = turnsDf(Seq(
      ("z1", 0, "newterm one common term3"),
      ("c00004", 0, "replacement content term5"),
      ("z2", 0, "two more turns term7")))

    val counter = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) counter.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def measure(body: => Unit): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        Thread.sleep(300); counter.set(0)
        body
        var prev = -1L; var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val cur = counter.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        counter.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val bSmall = measure(siSmall.addBatch(batch))
    val bLarge = measure(siLarge.addBatch(batch))
    assert(bLarge < bSmall * 3 + (1 << 20),
      s"streaming key resolution scales with index size: small=$bSmall large=$bLarge")
    // and the replacement actually happened through the pruned path
    val s = new Searcher(siLarge.index, analyzer)
    assert(s.matchQuery("replacement", graft.query.Or).count() == 1)
  }

  test("per-batch shuffle work is bounded by batch size, not index size") {
    // same vocabulary, 16x the documents: if addBatch re-aggregated the
    // posting store or shuffled base tables, shuffle records would scale
    // with the base. Key lookups are broadcast-side scans (no shuffle) by
    // design, so shuffle records are the right boundedness metric.
    val small = freshIndexer(corpus(100))
    val large = freshIndexer(corpus(1600))
    val batch = turnsDf(Seq(
      ("z1", 0, "newterm one common term3"),
      ("c00004", 0, "replacement content term5"),
      ("z2", 0, "two more turns term7")))

    val counter = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) counter.addAndGet(
          m.shuffleReadMetrics.recordsRead + m.shuffleWriteMetrics.recordsWritten)
      }
    }
    def measure(body: => Unit): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        // drain in-flight events from previous work before counting
        Thread.sleep(300); counter.set(0)
        body
        var prev = -1L
        var stable = 0
        while (stable < 3) { // wait until the async listener bus drains
          Thread.sleep(200)
          val cur = counter.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        counter.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    val wSmall = measure(small.addBatch(batch))
    val wLarge = measure(large.addBatch(batch))
    assert(wLarge <= wSmall * 2 + 1000,
      s"addBatch shuffle work scales with index size: small=$wSmall large=$wLarge")
  }
}
