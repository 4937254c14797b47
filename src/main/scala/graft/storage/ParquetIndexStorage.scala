package graft.storage

import graft.analysis.Analyzer
import graft.index.{BlockParams, PostingBlockRow, PostingBlocks, TextIndex}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, resumable index build over partitioned Parquet with
  * Iceberg-style manifest + commit markers (SURVEY.md §2.6, north_rule).
  *
  * Layout under `path/`:
  * {{{
  *   docs/d_bucket=N/               doc_ord + passthrough columns + text
  *   doc_stats/d_bucket=N/          doc_ord, token_count
  *   keymap/k_bucket=N/             key columns -> doc_ord (when keyCols set)
  *   _stage/raw/t_bucket=N/         (term, term_h, doc_ord, positions, tf, dl)
  *   term_dict/                     term_id, term, term_h, df, cf, t_bucket
  *   postings/t_bucket=N/d_group=M/ term_id, doc_ord, positions, tf, dl
  *   blocks/bucket=N/               WAND block table (doc-range partitioned)
  *   _markers/<stage>.json          atomic per-stage commit + metrics
  *   manifest.json                  overall commit (written last)
  * }}}
  *
  * Resumability: every stage (and every postings write-group) is guarded by
  * an atomic marker; a restarted build skips committed work and recomputes
  * nothing upstream of the `_stage/raw` checkpoint — analysis runs at most
  * once per build. Idempotence of retried groups comes from dynamic
  * partition overwrite (a group owns a disjoint set of t_bucket partitions).
  *
  * Scale partitioning (the O(batch) incremental contract):
  *  - postings are partitioned by BOTH term bucket and doc-range group
  *    (`d_group = doc_ord / dGroupSpan`). Queries prune on t_bucket; an
  *    incremental delta touches only the d_groups its doc_ords fall in, so
  *    the per-batch rewrite and the block rebuild read are DIRECTORY-pruned
  *    to the touched doc ranges — never a scan of the whole store. Files
  *    inside each leaf are doc_ord-sorted, so parquet row-group stats prune
  *    further within a touched group.
  *  - the keymap table buckets (conv_id, turn_idx) -> doc_ord rows by a hash
  *    of the FIRST key column, so a streaming micro-batch carrying C
  *    conversations resolves keys by reading at most C key buckets — not the
  *    docs table.
  *
  * Skew: the raw checkpoint is written with an explicit salt on doc_ord in
  * the repartition key, so a hot term's bucket is produced by `saltFactor`
  * parallel tasks instead of one (north_rule's explicit skew handling); the
  * doc-range-bucketed block table re-spreads hot terms again at query time.
  */
/** @param groupParallelism how many postings write-groups run CONCURRENTLY
  *   (as parallel Spark jobs over disjoint t_bucket partition sets). Groups
  *   exist for resumability granularity — a retried build redoes at most
  *   1/writeGroups of the postings work — but running them serially leaves
  *   the cluster idle between jobs (measured 2s/group of fixed scheduling +
  *   commit cost). Disjoint dynamic-overwrite targets commit independently
  *   on HDFS-like filesystems; set to 1 for object stores whose rename
  *   semantics dislike concurrent committers on one table root.
  * @param dGroupSpan doc_ords per postings doc-range partition (must be a
  *   multiple of blockParams.bucketSpan so a WAND bucket never straddles
  *   groups). Default 2^26 keeps the leaf-directory count manageable at
  *   10^12 docs (~15k groups) while bounding a delta batch's touched bytes.
  * @param keyCols document key columns (e.g. conv_id, turn_idx) to maintain
  *   the keymap table for; empty = no keymap.
  * @param keyBuckets hash buckets of the keymap (on the first key column).
  * @param sortPostingsFiles additionally sort each postings file by doc_ord
  *   at write time. Directory-level d_group pruning (the primary O(batch)
  *   mechanism) never needs this; sorted files tighten parquet row-group
  *   stats so doc-range predicates prune WITHIN a touched group too —
  *   worthwhile when dGroupSpan/bucketSpan is large (e.g. 1024 WAND buckets
  *   per group at the petabyte defaults) at the cost of one extra sort per
  *   write task (measured ~2x the postings-group time at toy scale).
  */
final case class StorageParams(
    termBuckets: Int = 64,
    writeGroups: Int = 8,
    saltFactor: Int = 8,
    blockParams: BlockParams = BlockParams(),
    groupParallelism: Int = 8,
    dGroupSpan: Long = 1L << 26,
    keyCols: Seq[String] = Nil,
    keyBuckets: Int = 64,
    sortPostingsFiles: Boolean = false
)

final case class PersistedIndex(
    index: TextIndex,
    blocks: Dataset[PostingBlockRow],
    manifest: IndexManifest,
    // formatVersion 4 layout: the block table WITH its (t_bucket, d_group)
    // partition columns, so a per-query WAND read directory-prunes to the
    // query terms' buckets instead of scanning the whole block store (None
    // on stores written before the layout)
    blocksByTerm: Option[DataFrame] = None
)

/** Thrown by tests via `failAfter` to simulate a crashed build. */
final class InjectedFailure(stage: String)
  extends RuntimeException(s"injected failure after stage $stage")

object ParquetIndexStorage {

  private def marker(path: String, stage: String) = s"$path/_markers/$stage.json"

  /** Whether `batchId` is already claimed at `path` — staged OR applied.
    * addDocuments with an applied id is an idempotent no-op, and with a
    * staged id it re-applies the OLD staged content (ignoring the caller's
    * frame). Callers that generate batch ids from a restarting counter
    * (StreamingIndexer's flush epoch) must probe past claimed ids, or a
    * reused id silently swallows their batch. */
  def deltaClaimed(path: String, batchId: String): Boolean =
    ManifestIO.exists(marker(path, s"delta_${batchId}_applied")) ||
      ManifestIO.exists(marker(path, s"delta_${batchId}_staged"))

  /** Smallest epoch >= `from` whose candidate id(s) are unclaimed — the ONE
    * probe loop behind every auto-generated batch id (CLI remove/compact,
    * streaming flush). Generators whose counter restarts with the process
    * must probe past claimed ids: reusing a claimed id silently swallows
    * the new batch ([[deltaClaimed]]'s idempotence contract). */
  def nextFreeEpoch(from: Long)(claimed: Long => Boolean): Long = {
    var e = from
    while (claimed(e)) e += 1
    e
  }

  /** addDocuments and removeDocuments share the delta_<id> marker
    * namespace; an id reused ACROSS kinds would hit the other operation's
    * idempotence marker and silently no-op (a remove that "succeeds"
    * without deleting). Markers record their kind (`op` in lineage); a
    * mismatch fails loudly. Markers from older stores lack `op` — no check
    * is possible there. */
  private def checkDeltaKind(path: String, batchId: String, expected: String): Unit =
    Seq(s"delta_${batchId}_applied", s"delta_${batchId}_staged").foreach { name =>
      ManifestIO.read(marker(path, name), classOf[StageMarker])
        .flatMap(_.lineage.get("op")).filter(_ != expected)
        .foreach { other =>
          throw new IllegalArgumentException(
            s"batch id '$batchId' at $path was already used by a '$other' delta; " +
              s"reusing it for a '$expected' would silently no-op — use a distinct id")
        }
    }

  /** Row bound under which a compaction's (doc_ord, new_ord) remap table is
    * BROADCAST to its remap joins instead of shuffle-joined: 8M rows ≈
    * ~256 MB of hashed relation — comfortable on any executor profile this
    * engine targets, and far under the 8 GB broadcast cap. Conf-tunable
    * (`spark.graft.remapBroadcastMaxRows`) because the right bound is an
    * executor-memory question, not an algorithm question. */
  private def remapBroadcastMaxRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.remapBroadcastMaxRows")
      .map(_.toLong).getOrElse(8000000L)

  /** How many compactions this manifest has applied. Staged deltas record
    * it ([[applyStagedDelta]] refuses a mismatch): a compaction REMAPS
    * ordinals, so staged content from before one refers to documents that
    * no longer live at those ordinals — applying it would silently
    * overwrite arbitrary other documents. */
  private def compactEpoch(mf: IndexManifest): Long =
    mf.stages.count(_.stage.startsWith("compact_"))

  /** Pushable doc-range predicate for a set of span-sized buckets: an OR of
    * BETWEENs (parquet row-group prunable) for few buckets, else a single
    * covering range AND the exact bucket membership. `floor(doc_ord/span)
    * IN (...)` alone is a derived expression no reader can push down. */
  private def docRangePred(c: Column, buckets: Seq[Long], span: Long): Column =
    if (buckets.isEmpty) lit(false)
    else if (buckets.size <= 32)
      buckets.map(b => c.between(b * span, b * span + span - 1)).reduce(_ || _)
    else
      c.between(buckets.min * span, buckets.max * span + span - 1) &&
        floor(c / lit(span)).isin(buckets: _*)

  private def kBucketCol(keyCols: Seq[String], keyBuckets: Int): Column =
    pmod(xxhash64(col(keyCols.head)), lit(keyBuckets)).cast("int")

  /** A resumed `_stage/raw` checkpoint from a build that predates the
    * precomputed hash column lacks `term_h`; derive it (term_h is DEFINED
    * as xxhash64(term), so this is equivalent, just not prematerialized)
    * instead of crashing the resumed dict/postings stages on an
    * unresolved column. */
  private def rawWithHash(raw: DataFrame): DataFrame =
    if (raw.columns.contains("term_h")) raw
    else raw.withColumn("term_h", xxhash64(col("term")))

  /** Build (or resume building) a persisted index.
    *
    * @param docs      input with dense doc_ord + `textCol` (+ passthrough)
    * @param failAfter test hook: throw after completing the named stage
    */
  def build(
      docs: DataFrame,
      analyzer: Analyzer,
      path: String,
      params: StorageParams = StorageParams(),
      sourceDesc: String = "unknown",
      textCol: String = "text",
      failAfter: Option[String] = None
  ): IndexManifest = {
    val spark = docs.sparkSession
    val p = params
    require(p.dGroupSpan % p.blockParams.bucketSpan == 0,
      s"dGroupSpan ${p.dGroupSpan} must be a multiple of bucketSpan ${p.blockParams.bucketSpan}")
    val keyCols = p.keyCols.filter(docs.columns.contains)
    val lineage = Map(
      "source" -> sourceDesc,
      "analyzer" -> analyzer.describe,
      "termBuckets" -> p.termBuckets.toString,
      "blockSize" -> p.blockParams.blockSize.toString,
      "bucketSpan" -> p.blockParams.bucketSpan.toString,
      "dGroupSpan" -> p.dGroupSpan.toString
    )
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageMarker]

    def runStage(name: String)(body: => StageMarker): StageMarker = {
      val existing = ManifestIO.read(marker(path, name), classOf[StageMarker])
      val m = existing.getOrElse {
        val t0 = System.currentTimeMillis()
        val res = body
        val m0 = res.copy(durationMs = System.currentTimeMillis() - t0)
        ManifestIO.write(marker(path, name), m0)
        m0
      }
      stages.synchronized { stages += m }
      if (failAfter.contains(name)) throw new InjectedFailure(name)
      m
    }

    // ---- stage: docs (doc-range partitioned: key lookups prune, and the
    // incremental path overwrites only the touched ranges) -----------------
    val docsMarker = runStage("docs") {
      // row count observed ON the write job (guide §1.4/§5): the former
      // read-back count() was one extra job locally and a full re-scan of
      // the docs table at corpus scale, for a number the write already knows
      val obs = org.apache.spark.sql.Observation()
      docs.withColumn("d_bucket",
          floor(col("doc_ord") / lit(p.blockParams.bucketSpan)).cast("long"))
        .observe(obs, count(lit(1)).as("n"))
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$path/docs")
      StageMarker("docs", obs.get("n").asInstanceOf[Long], 0, lineage)
    }
    val numDocs = docsMarker.rows

    // ---- stage: keymap (key -> doc_ord, bucketed by the first key column
    // so streaming key resolution reads only the batch's buckets) ----------
    if (keyCols.nonEmpty) runStage("keymap") {
      spark.read.parquet(s"$path/docs")
        .select((keyCols.map(col) :+ col("doc_ord")): _*)
        .withColumn("k_bucket", kBucketCol(keyCols, p.keyBuckets))
        .write.mode("overwrite").partitionBy("k_bucket").parquet(s"$path/keymap")
      StageMarker("keymap", numDocs, 0, lineage)
    }

    // ---- stage: raw postings checkpoint (analysis runs HERE, once) ------
    runStage("raw") {
      // fused analyze+group mapPartitions pass (see
      // IndexBuilder.docTermPostings) — no shuffle, no ObjectHashAggregate.
      // t_bucket derives from the precomputed term_h (== xxhash64(term)).
      val byTermDoc = graft.index.IndexBuilder
        .docTermPostings(spark.read.parquet(s"$path/docs"), analyzer, textCol)
        .withColumn("t_bucket", pmod(col("term_h"), lit(p.termBuckets)).cast("int"))
      byTermDoc
        .repartition(col("t_bucket"), pmod(col("doc_ord"), lit(p.saltFactor)))
        .write.mode("overwrite").partitionBy("t_bucket").parquet(s"$path/_stage/raw")
      StageMarker("raw", -1, 0, lineage)
    }

    // ---- stage: doc stats (token_count = Σ tf from the raw checkpoint) ----
    // Independent of the dictionary stage, so it runs CONCURRENTLY with it
    // (guide §2.6: overlap independent jobs — the dictionary's vocab-sized
    // collect otherwise leaves the cluster underused while stats waits).
    // Joined BEFORE the postings groups launch: overlapping stats with the
    // 4 concurrent group writers as well was measured to push a 10^6-turn
    // build over an 8 GiB heap (each open parquet writer buffers row groups
    // per partition leaf — guide §5: concurrency multiplies peak memory).
    // The injected-crash hook keeps strict serial order for deterministic
    // crash semantics.
    def runStatsStage(): StageMarker = runStage("stats") {
      // token total observed ON the write (guide §1.4/§5): the former
      // read-back aggregation was one extra job and a full doc_stats
      // re-scan at corpus scale; the observed sum sees the identical rows
      val obs = org.apache.spark.sql.Observation()
      spark.read.parquet(s"$path/_stage/raw")
        .groupBy(col("doc_ord"))
        .agg(sum(col("tf")).cast("int").as("token_count"))
        .observe(obs, coalesce(sum(col("token_count").cast("long")), lit(0L)).as("tokens"))
        .withColumn("d_bucket",
          floor(col("doc_ord") / lit(p.blockParams.bucketSpan)).cast("long"))
        // re-cluster on the leaf key: the agg output is hash(doc_ord)-
        // partitioned, so a bare partitionBy writes every task's file into
        // every leaf (measured 32 files/leaf at 10^6 turns); one file per
        // leaf, doc_ord-sorted for row-group pruning
        .repartition(col("d_bucket"))
        .sortWithinPartitions(col("d_bucket"), col("doc_ord"))
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$path/doc_stats")
      val tokens = obs.get("tokens").asInstanceOf[Long]
      // exact sum/count division (not avg()): keeps avgdl — and with it all
      // BM25 scores — bit-identical across parallelism levels
      val avgdl0 = if (numDocs == 0) 0.0 else tokens.toDouble / numDocs
      StageMarker("stats", numDocs, 0,
        lineage ++ Map("avgdl" -> avgdl0.toString, "tokens" -> tokens.toString))
    }
    val statsFuture: scala.concurrent.Future[StageMarker] =
      if (failAfter.isDefined)
        scala.concurrent.Future.successful(runStatsStage())
      else
        scala.concurrent.Future(runStatsStage())(
          scala.concurrent.ExecutionContext.global)

    // ---- stage: term dictionary -----------------------------------------
    // When the single-collect path runs THIS build, the driver-resident
    // LocalRelation is kept and handed to the postings groups below: each
    // group's dictionary probe then broadcasts straight from driver rows
    // instead of re-reading the term_dict parquet (one scan job per group).
    // Resumed builds (stage marker already present) fall back to the
    // parquet read — the rows are identical by construction.
    var dictLocal: Option[DataFrame] = None
    val dictMarker = runStage("dict") {
      val raw = rawWithHash(spark.read.parquet(s"$path/_stage/raw"))
      val termStats = raw.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
          max(col("term_h")).as("term_h"))
      // 64-bit term-hash collision check ("hashKeyOk"): when clean, the
      // postings id-swap joins on the LONG term_h — no per-posting-row
      // string decode+hash; a collision (expected once per ~6e9-term
      // vocabulary) falls back to the exact string join.
      // Vocab-sized dictionaries: ONE collect job assembles ids + the
      // collision check on the driver (IndexBuilder.localTermDict); the
      // t_bucket re-derives from term_h exactly as the raw stage derived it.
      graft.index.IndexBuilder.localTermDict(termStats) match {
        case Some((ld, _, hashOk)) =>
          val n = ld.count() // LocalRelation — driver-side, no cluster scan
          val withBucket = ld
            .withColumn("t_bucket", pmod(col("term_h"), lit(p.termBuckets)).cast("int"))
            .select("term_id", "term", "term_h", "df", "cf", "t_bucket")
          withBucket
            .coalesce(1) // vocab-sized single file beats 2×cpus 600-row files
            .write.mode("overwrite").parquet(s"$path/term_dict")
          dictLocal = Some(withBucket)
          StageMarker("dict", n, 0, lineage + ("hashKeyOk" -> hashOk.toString))
        case None =>
          val withBucket = raw.groupBy(col("term"), col("t_bucket"))
            .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
              max(col("term_h")).as("term_h"))
          val (withIds, cleanup) =
            graft.index.Ids.withDenseOrdinalCounted(withBucket, "term_id", Seq("term"),
              assumeUnsorted = true) match { case (d0, _, c0) => (d0, c0) }
          withIds.select("term_id", "term", "term_h", "df", "cf", "t_bucket")
            .write.mode("overwrite").parquet(s"$path/term_dict")
          cleanup()
          val row = spark.read.parquet(s"$path/term_dict")
            .agg(count(lit(1)).as("n"), countDistinct(col("term_h")).as("nh")).head()
          StageMarker("dict", row.getLong(0), 0,
            lineage + ("hashKeyOk" -> (row.getLong(0) == row.getLong(1)).toString))
      }
    }
    // exists, not forall: a resumed marker from a build that predates the
    // hash-keyed probe has no hashKeyOk (and its staged parquet no term_h
    // column) — the absent flag must mean the SAFE string join
    val joinKey =
      if (dictMarker.lineage.get("hashKeyOk").exists(_.toBoolean)) "term_h" else "term"

    // stats joins here: committed before the postings groups open their
    // concurrent parquet writers (see the stats stage comment on peak heap)
    val statsMarker = scala.concurrent.Await.result(
      statsFuture, scala.concurrent.duration.Duration.Inf)
    val avgdl = statsMarker.lineage("avgdl").toDouble

    // ---- stage: final postings, in resumable bucket groups ---------------
    // groups run as CONCURRENT Spark jobs (disjoint t_bucket partition
    // sets; each commits its own marker) — serial groups leave the cluster
    // idle between jobs, and wall time here is max(group), not sum
    val groups = 0 until p.writeGroups
    def runGroup(g: Int): StageMarker =
      runStage(s"postings_g$g") {
        val buckets = (0 until p.termBuckets).filter(_ % p.writeGroups == g)
        val raw = rawWithHash(spark.read.parquet(s"$path/_stage/raw"))
          .filter(col("t_bucket").isin(buckets: _*))
        val dict = dictLocal.getOrElse(spark.read.parquet(s"$path/term_dict"))
          .filter(col("t_bucket").isin(buckets: _*))
          .select(joinKey, "term_id")
        val fin = raw.join(dict, joinKey)
          .withColumn("d_group", floor(col("doc_ord") / lit(p.dGroupSpan)).cast("long"))
          .select("term_id", "doc_ord", "positions", "tf", "dl", "t_bucket", "d_group")
        // per-write dynamic overwrite (NOT a session-conf mutation, which
        // would silently change overwrite semantics for the caller's other
        // partitioned writes): each group owns a disjoint t_bucket set, so
        // a retried group replaces only its own partitions — with the
        // default static mode this write would wipe the other groups' work.
        val finOut = if (p.sortPostingsFiles)
          fin.sortWithinPartitions(col("t_bucket"), col("d_group"), col("doc_ord"))
        else fin
        // Per-bucket metrics observed ON the write job (guide §1.4/§5):
        // the former read-back groupBy(t_bucket) was two extra jobs per
        // group locally and re-scanned the whole just-written postings
        // store at corpus scale. termBuckets is bounded (a config constant,
        // 16-64), so one conditional aggregate per (bucket, metric) keeps
        // the observation fixed-size; approx_count_distinct over the
        // when()-masked term_id sees exactly the bucket's rows (nulls are
        // ignored), identical to the read-back per-group HLL.
        val obs = org.apache.spark.sql.Observation()
        val mexprs = buckets.flatMap { b =>
          Seq(
            sum(when(col("t_bucket") === b, 1L).otherwise(0L)).as(s"n_$b"),
            sum(when(col("t_bucket") === b, col("tf").cast("long"))
              .otherwise(0L)).as(s"tok_$b"),
            approx_count_distinct(
              when(col("t_bucket") === b, col("term_id"))).as(s"terms_$b"))
        }
        finOut.observe(obs, mexprs.head, mexprs.tail: _*)
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("t_bucket", "d_group").parquet(s"$path/postings")
        val m = obs.get
        val metrics = buckets
          .map(b => BucketMetrics(b, m(s"terms_$b").asInstanceOf[Long],
            m(s"n_$b").asInstanceOf[Long], m(s"tok_$b").asInstanceOf[Long], 0))
          .filter(_.postings > 0) // empty buckets stayed absent before too
        StageMarker(s"postings_g$g", metrics.map(_.postings).sum, 0, lineage, metrics)
      }
    // the injected-crash hook needs deterministic "later groups never ran"
    // semantics — run strictly inline under it (a queued future would still
    // execute after a failed one)
    val gp = if (failAfter.isDefined) 1 else math.min(p.groupParallelism, p.writeGroups)
    if (gp <= 1) groups.foreach(runGroup)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(gp)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        import scala.concurrent.duration.Duration
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(groups.map(g =>
            scala.concurrent.Future(runGroup(g)))), Duration.Inf)
      } finally pool.shutdown()
    }

    // ---- stage: WAND block table -----------------------------------------
    runStage("blocks") {
      val postings = spark.read.parquet(s"$path/postings")
      val docStats = spark.read.parquet(s"$path/doc_stats")
      // block count observed ON the write: the read-back count() was one
      // extra job and a full block-store re-scan at corpus scale
      val obs = org.apache.spark.sql.Observation()
      writeBlocks(PostingBlocks.buildFrom(postings, docStats, p.blockParams),
        dictLocal.getOrElse(spark.read.parquet(s"$path/term_dict")), p.dGroupSpan,
        p.blockParams.bucketSpan, s"$path/blocks", countInto = Some(obs))
      StageMarker("blocks", obs.get("n").asInstanceOf[Long], 0, lineage)
    }

    val mf = IndexManifest(4, sourceDesc, analyzer.describe, numDocs, avgdl,
      p.termBuckets, p.blockParams.blockSize, p.blockParams.bucketSpan, stages.toSeq,
      k1 = p.blockParams.k1, b = p.blockParams.b,
      dGroupSpan = p.dGroupSpan, keyCols = keyCols, keyBuckets = p.keyBuckets)
    ManifestIO.write(s"$path/manifest.json", mf)
    mf
  }

  /** Write a block table in the (t_bucket, d_group) layout — the SAME
    * two-level partitioning as postings (formatVersion 4): per-query WAND
    * reads directory-prune on the query terms' buckets (previously the
    * per-query block read listed and footer-scanned the ENTIRE block store
    * — measured 23.6 s vs 5.5 s exhaustive for 8 cold queries at 10^6
    * turns), and incremental deltas overwrite complete (t_bucket, d_group)
    * leaves exactly like the postings table. t_bucket joins in from the
    * term dictionary (vocab-sized — Spark broadcasts a small dict; at web
    * vocab it is one build-time shuffle of the already-shuffled block
    * rows, never a query-time cost); d_group derives from the block's
    * doc-range bucket (blocks never span buckets, dGroupSpan is a multiple
    * of bucketSpan, so a block sits in exactly one d_group). One
    * repartition keys the write so each leaf holds whole files; files are
    * (term_id, min_doc)-sorted for row-group pruning within a leaf. */
  private def writeBlocks(blocks: Dataset[PostingBlockRow], termDict: DataFrame,
      dGroupSpan: Long, bucketSpan: Long, dest: String,
      countInto: Option[org.apache.spark.sql.Observation] = None): Unit = {
    val gSpan = if (dGroupSpan > 0) dGroupSpan else bucketSpan
    val clustered = blocks.toDF()
      .join(termDict.select(col("term_id"), col("t_bucket")), "term_id")
      .withColumn("d_group",
        floor(col("bucket") * lit(bucketSpan) / lit(gSpan)).cast("long"))
      .repartition(col("t_bucket"), col("d_group"))
      .sortWithinPartitions(col("term_id"), col("bucket"), col("min_doc"))
    val observed = countInto.fold(clustered)(o =>
      clustered.observe(o, count(lit(1)).as("n")))
    observed.write.mode("overwrite").partitionBy("t_bucket", "d_group").parquet(dest)
  }

  /** Refuse mutating a store whose block table predates the (t_bucket,
    * d_group) layout: staged blocks would dynamic-overwrite into fresh
    * t_bucket= directories while the old bucket= partitions kept serving
    * stale rows beside them. */
  private def requireBlocksLayout(spark: SparkSession, path: String, op: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$path/blocks")
    if (fs.exists(root) && fs.listStatus(root).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("bucket=")))
      throw new IllegalStateException(
        s"index at $path has a pre-t_bucket block layout; rebuild it before $op")
  }

  def read(spark: SparkSession, path: String): PersistedIndex = {
    import spark.implicits._
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    val tokens = mf.stages.reverse.collectFirst {
      case s if s.lineage.contains("tokens") => s.lineage("tokens").toLong
    }.getOrElse(-1L)
    val index = TextIndex(
      docs = spark.read.parquet(s"$path/docs"),
      docStats = spark.read.parquet(s"$path/doc_stats"),
      termDict = spark.read.parquet(s"$path/term_dict"),
      postings = spark.read.parquet(s"$path/postings"),
      numDocs = mf.numDocs,
      avgDocLen = mf.avgDocLen,
      termBuckets = mf.termBuckets,
      totalTokens = tokens
    )
    // layout detect by listing (robust to manifests rewritten by older
    // code): t_bucket= top-level dirs = the formatVersion 4 two-level
    // layout, bucket= = the legacy doc-range-only layout
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val termLayout = fs.exists(new org.apache.hadoop.fs.Path(s"$path/blocks")) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/blocks")).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("t_bucket="))
    val rawBlocks = spark.read.parquet(s"$path/blocks")
    def toRows(df: DataFrame): Dataset[PostingBlockRow] =
      df.select(col("term_id"), col("bucket").cast("long"), col("min_doc"),
        col("max_doc"), col("n"), col("max_tf"), col("min_dl"),
        col("docs"), col("tfs"), col("dls"))
      .as[PostingBlockRow]
    PersistedIndex(index, toRows(rawBlocks), mf,
      blocksByTerm = if (termLayout) Some(rawBlocks) else None)
  }

  /** Delete staging data whose delta is already APPLIED (the staged content
    * is only needed to recover a crash between staging and apply; once the
    * applied marker exists the apply is complete and re-runnable as a
    * no-op). Also drops the build's `_stage/raw` checkpoint when the build
    * manifest is committed. Markers are kept — they are the idempotence
    * record (bytes, not gigabytes). Returns the deleted paths. */
  def vacuum(spark: SparkSession, path: String): Seq[String] = {
    // the INDEX PATH's filesystem, not fs.defaultFS — an s3a:// index on an
    // hdfs-default cluster must resolve to the s3a filesystem
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(s"$path/_stage")
    if (!fs.exists(stage)) return Nil
    val committed = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).isDefined
    val deletable = fs.listStatus(stage).toSeq.filter(_.isDirectory).map(_.getPath).filter { p =>
      p.getName match {
        case "raw" => committed
        case n if n.startsWith("delta_") || n.startsWith("compact_") =>
          ManifestIO.exists(marker(path, s"${n}_applied"))
        case _ => false
      }
    }
    deletable.foreach(fs.delete(_, true))
    deletable.map(_.toString)
  }

  /** Resolve document keys to ordinals through the bucketed keymap: reads
    * ONLY the key buckets the probe keys hash to — never the docs table.
    * Returns `keys`' key columns + doc_ord (inner join: unknown keys drop).
    * The keymap reflects the last committed state (build or applied delta).
    */
  def lookupOrds(spark: SparkSession, path: String, keys: DataFrame): DataFrame = {
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    require(mf.keyCols.nonEmpty, s"index at $path has no keymap (keyCols empty)")
    val kb = kBucketCol(mf.keyCols, mf.keyBuckets)
    val probe = keys.select(mf.keyCols.map(col): _*)
    val kbs = probe.select(kb.as("kb")).distinct().collect().map(_.getInt(0)).toSeq
    spark.read.parquet(s"$path/keymap")
      .filter(col("k_bucket").isin(kbs: _*))
      .join(broadcast(probe), mf.keyCols)
      .select((mf.keyCols.map(col) :+ col("doc_ord")): _*)
  }

  /** Incrementally add (or replace) documents in a committed persisted
    * index — the storage-level `UpsertInvertedIndex` (SURVEY.md §2.2 row
    * 17; the reference's threshold merge `indexer.go:38-60` upserts each
    * buffered token's list, `storage_rdb_Impl.go:174-190`).
    *
    * Two-phase commit, idempotent per `batchId`:
    *  1. STAGE — compute the complete new content of every TOUCHED
    *     partition into `_stage/delta_<batchId>/`, then write the staged
    *     marker. Touched = the d_groups/d_buckets of the batch's doc_ords
    *     (postings, docs, stats, blocks — all reads DIRECTORY-pruned to
    *     them) + the keymap's touched key buckets + the adjusted term
    *     dictionary; df/cf adjustments come from re-analyzing the replaced
    *     docs' old text (exact, batch-sized). Because postings are
    *     partitioned by doc range, per-batch bytes read and written are
    *     proportional to the content of the touched doc ranges — NEVER the
    *     whole store (the O(index)-scan-per-batch trap).
    *  2. APPLY — dynamic-partition-overwrite each touched partition from
    *     the staged content, update the manifest, write the applied marker.
    *     Every apply write is a deterministic function of the staged data,
    *     so a crash mid-apply is recovered by re-running the SAME batchId
    *     (staging is skipped, overwrites repeat byte-identically).
    *
    * Block maxima stay valid under the avgdl shift because blocks store
    * (max_tf, min_dl), not a precomputed quotient (see PostingBlockRow).
    *
    * @param newDocs rows with doc_ord + textCol + the passthrough columns
    *                of the persisted docs table (minus d_bucket); ordinals
    *                may collide with existing docs (replacement) or extend
    *                past them (append). Each ordinal must appear ONCE —
    *                fold in-batch replacements before submitting (a
    *                duplicated ordinal would write duplicate docs rows and
    *                conflicting postings; refused loudly).
    * @param failAfter test hook: throw after completing the named phase
    *                  ("staged") to simulate a crash between the phases
    */
  def addDocuments(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      analyzer: Analyzer,
      batchId: String,
      textCol: String = "text",
      failAfter: Option[String] = None
  ): IndexManifest = {
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    checkDeltaKind(path, batchId, "add")
    val appliedM = marker(path, s"delta_${batchId}_applied")
    if (ManifestIO.exists(appliedM))
      return ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    val stagedM = marker(path, s"delta_${batchId}_staged")
    val sp = s"$path/_stage/delta_$batchId"
    val span = mf.bucketSpan
    val gSpan = if (mf.dGroupSpan > 0) mf.dGroupSpan else span
    val bp = BlockParams(mf.blockSize, mf.bucketSpan, mf.k1, mf.b)
    def dBucketOf(c: Column) = floor(c / lit(span)).cast("long")
    def dGroupOf(c: Column) = floor(c / lit(gSpan)).cast("long")
    // Pre-d_group stores (flat t_bucket postings partitions) cannot take
    // deltas from this version: the staged/apply writes are
    // (t_bucket, d_group)-partitioned, and dynamic overwrite would leave
    // BOTH layouts on disk — the pre-existing flat files (including the
    // replaced docs' old postings) survive next to the new two-level
    // directories, so partition discovery conflicts or silently serves
    // stale duplicates. Refusing loudly beats corrupting; rebuild migrates.
    require(mf.dGroupSpan > 0,
      s"index at $path predates the d_group postings layout " +
        s"(manifest dGroupSpan=${mf.dGroupSpan}); rebuild it to accept deltas")
    requireBlocksLayout(spark, path, "deltas")
    // A keymapped index REQUIRES every batch to carry the key columns:
    // silently skipping keymap maintenance would let it drift from the docs
    // table, and a later streaming lookup would miss the key and mint a
    // SECOND doc_ord for it — duplicate documents in every query.
    // INVARIANT: a doc_ord's key never changes across replacements
    // (ordinals are minted per key); only then is removing the batch's own
    // keys from the touched buckets enough to keep the keymap exact.
    require(mf.keyCols.isEmpty || mf.keyCols.forall(newDocs.columns.contains),
      s"index at $path maintains a keymap over (${mf.keyCols.mkString(",")}) " +
        s"but the batch only has (${newDocs.columns.mkString(",")})")

    val staged = ManifestIO.read(stagedM, classOf[StageMarker]).getOrElse {
      val t0 = System.currentTimeMillis()
      val batch = newDocs.persist()
      val newOrds = batch.select("doc_ord")
      val added = batch.count()
      val distinctOrds = newOrds.distinct().count()
      require(distinctOrds == added,
        s"batch '$batchId' carries ${added - distinctOrds} duplicated doc_ord(s) — " +
          "each ordinal must appear once (fold in-batch replacements before " +
          "submitting); duplicates would write duplicate docs rows and " +
          "conflicting postings")
      val dBuckets = batch.select(dBucketOf(col("doc_ord")).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val dGroups = dBuckets.map(b => b * span / gSpan).distinct

      // replaced docs' old text — pruned to the batch's d_buckets
      val oldDocs = spark.read.parquet(s"$path/docs")
        .filter(col("d_bucket").isin(dBuckets: _*))
        .join(broadcast(newOrds), Seq("doc_ord"), "left_semi")
        .select(col("doc_ord"), col(textCol))
        .persist()
      val byNew = graft.index.IndexBuilder.docTermPostings(batch, analyzer, textCol)
        .withColumn("t_bucket", pmod(col("term_h"), lit(mf.termBuckets)).cast("int"))
        .persist()
      val byOld = graft.index.IndexBuilder.docTermPostings(oldDocs, analyzer, textCol)
        .withColumn("t_bucket", pmod(col("term_h"), lit(mf.termBuckets)).cast("int"))
        .persist()

      // ---- dictionary: adjust df/cf by batch deltas; mint ids above max --
      val dict0 = spark.read.parquet(s"$path/term_dict")
      val dict = if (dict0.columns.contains("term_h")) dict0
                 else dict0.withColumn("term_h", xxhash64(col("term")))
      val batchTerms = byNew.select("term", "term_h").distinct()
      val known = dict.join(broadcast(batchTerms.select("term")), Seq("term"), "left_semi")
        .select("term_id", "term")
      val newTerms = batchTerms.join(known, Seq("term"), "left_anti")
      val maxId = dict.agg(coalesce(max(col("term_id")), lit(-1L))).head().getLong(0)
      val (mintedRaw, mintCleanup) =
        graft.index.Ids.withDenseOrdinalCounted(newTerms, "term_id0", Seq("term"),
          assumeUnsorted = true) match { case (d0, _, c0) => (d0, c0) }
      val minted = mintedRaw
        .select((col("term_id0") + lit(maxId + 1)).as("term_id"), col("term"), col("term_h"))
      val incs = byNew.groupBy(col("term"))
        .agg(count(lit(1)).as("df_i"), sum(col("tf")).cast("long").as("cf_i"))
      val decs = byOld.groupBy(col("term"))
        .agg(count(lit(1)).as("df_x"), sum(col("tf")).cast("long").as("cf_x"))
      val deltas = incs.join(decs, Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("df_i"), lit(0L)) - coalesce(col("df_x"), lit(0L))).as("df_d"),
          (coalesce(col("cf_i"), lit(0L)) - coalesce(col("cf_x"), lit(0L))).as("cf_d"))
      val dictNew = dict
        .join(broadcast(deltas), Seq("term"), "left")
        .select(col("term_id"), col("term"), col("term_h"),
          (col("df") + coalesce(col("df_d"), lit(0L))).as("df"),
          (col("cf") + coalesce(col("cf_d"), lit(0L))).as("cf"), col("t_bucket"))
        .filter(col("df") > 0)
        .unionByName(minted.join(broadcast(deltas), Seq("term"), "left")
          .select(col("term_id"), col("term"), col("term_h"),
            coalesce(col("df_d"), lit(0L)).as("df"), coalesce(col("cf_d"), lit(0L)).as("cf"),
            pmod(col("term_h"), lit(mf.termBuckets)).cast("int").as("t_bucket")))
      dictNew.write.mode("overwrite").parquet(s"$sp/term_dict")
      mintCleanup()
      val dictStaged = spark.read.parquet(s"$sp/term_dict")

      // ---- postings: new content of the touched doc-range groups ---------
      // Old rows of other doc ranges are untouched by definition (their docs
      // are not in the batch), so the read is directory-pruned to the
      // batch's d_groups — per-batch bytes ∝ touched ranges, not the store.
      val oldPost = spark.read.parquet(s"$path/postings")
        .filter(col("d_group").isin(dGroups: _*))
      val ids = dictStaged.join(broadcast(batchTerms.select("term")), Seq("term"), "left_semi")
        .select("term_id", "term")
      val newRows = byNew.join(broadcast(ids), "term")
        .select("term_id", "doc_ord", "positions", "tf", "dl", "t_bucket")
      oldPost.select("term_id", "doc_ord", "positions", "tf", "dl", "t_bucket")
        .join(broadcast(newOrds), Seq("doc_ord"), "left_anti")
        .unionByName(newRows)
        .withColumn("d_group", dGroupOf(col("doc_ord")))
        .write.mode("overwrite").partitionBy("t_bucket", "d_group").parquet(s"$sp/postings")

      // ---- docs + doc_stats: new content of the touched d_buckets --------
      val docsCols = spark.read.parquet(s"$path/docs").drop("d_bucket").columns
      spark.read.parquet(s"$path/docs")
        .filter(col("d_bucket").isin(dBuckets: _*))
        .join(broadcast(newOrds), Seq("doc_ord"), "left_anti")
        .drop("d_bucket")
        .unionByName(batch.select(docsCols.map(col): _*))
        .withColumn("d_bucket", dBucketOf(col("doc_ord")))
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$sp/docs")
      val newStats = byNew.groupBy(col("doc_ord"))
        .agg(max(col("dl")).cast("int").as("token_count"))
      spark.read.parquet(s"$path/doc_stats")
        .filter(col("d_bucket").isin(dBuckets: _*))
        .join(broadcast(newOrds), Seq("doc_ord"), "left_anti")
        .drop("d_bucket")
        .unionByName(newStats)
        .withColumn("d_bucket", dBucketOf(col("doc_ord")))
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$sp/doc_stats")

      // ---- keymap: new content of the touched key buckets ----------------
      val kBucketsTouched: Seq[Int] =
        if (mf.keyCols.isEmpty) Nil
        else {
          val kb = kBucketCol(mf.keyCols, mf.keyBuckets)
          val batchKeys = batch.select(mf.keyCols.map(col): _*)
          val kbs = batchKeys.select(kb.as("kb")).distinct()
            .collect().map(_.getInt(0)).toSeq
          spark.read.parquet(s"$path/keymap")
            .filter(col("k_bucket").isin(kbs: _*))
            .join(broadcast(batchKeys), mf.keyCols, "left_anti")
            .drop("k_bucket")
            .unionByName(batch.select((mf.keyCols.map(col) :+ col("doc_ord")): _*))
            .withColumn("k_bucket", kb)
            .write.mode("overwrite").partitionBy("k_bucket").parquet(s"$sp/keymap")
          kbs
        }

      // ---- blocks: rebuild the touched d_groups' block leaves -------------
      // the staged postings are the complete post-delta content of the
      // touched d_groups, and blocks share their (t_bucket, d_group)
      // partition unit — so the staged blocks are the complete post-delta
      // content of exactly the leaves apply overwrites
      val postDelta = spark.read.parquet(s"$sp/postings")
      writeBlocks(
        PostingBlocks.buildFrom(postDelta.drop("t_bucket", "d_group"), null, bp),
        spark.read.parquet(s"$sp/term_dict"), gSpan, span, s"$sp/blocks")

      // ---- exact global stats by integer delta ---------------------------
      val replaced = oldDocs.count()
      val remTok = byOld.groupBy(col("doc_ord")).agg(max(col("dl")).as("dl"))
        .agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)
      val addTok = newStats
        .agg(coalesce(sum(col("token_count").cast("long")), lit(0L))).head().getLong(0)
      val prevTokens = mf.stages.reverse.collectFirst {
        case s if s.lineage.contains("tokens") => s.lineage("tokens").toLong
      }.getOrElse(0L)
      val n2 = mf.numDocs - replaced + added
      val tok2 = prevTokens - remTok + addTok
      Seq(batch, oldDocs, byNew, byOld).foreach(_.unpersist())
      val m = StageMarker(s"delta_${batchId}_staged", added,
        System.currentTimeMillis() - t0,
        Map("op" -> "add",
          "compactEpoch" -> compactEpoch(mf).toString,
          "stagesAtStaging" -> mf.stages.size.toString,
          "tokens" -> tok2.toString, "numDocs" -> n2.toString,
          "replaced" -> replaced.toString,
          "dGroups" -> dGroups.mkString(","),
          "kBuckets" -> kBucketsTouched.mkString(","),
          "dBuckets" -> dBuckets.mkString(",")))
      ManifestIO.write(stagedM, m)
      m
    }
    if (failAfter.contains("staged")) throw new InjectedFailure("staged")

    applyStagedDelta(spark, path, sp, staged, batchId, mf)
  }

  /** APPLY phase shared by [[addDocuments]] and [[removeDocuments]]:
    * deterministic dynamic-partition overwrites from the staged content,
    * explicit deletion of touched partitions whose post-delta content is
    * empty, manifest update, applied marker. Every write is a pure function
    * of the staged data, so a crash mid-apply is recovered by re-running
    * the same batchId (staging is skipped, overwrites repeat). */
  /** Dynamic-overwrite `table` at `path` from its staged copy under `sp`,
    * then delete touched partitions ABSENT from the staged content: dynamic
    * overwrite only replaces partitions present in the staged data, so a
    * touched partition whose post-apply content is EMPTY (e.g. every doc of
    * a range replaced or compacted away) must be deleted explicitly or its
    * stale rows would keep matching old content. An all-empty staged table
    * (batch of empty docs) writes no parquet and cannot be re-read — treated
    * as "no partitions present". */
  private def overwriteTouched(spark: SparkSession, path: String, sp: String,
      table: String, partCols: Seq[String], touched: Seq[Seq[Long]]): Unit = {
    val staged0 =
      try Some(spark.read.parquet(s"$sp/$table"))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    staged0.foreach(_.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*).parquet(s"$path/$table"))
    val present: Set[Seq[Long]] =
      staged0.map(_.select(partCols.map(c => col(c).cast("long")): _*)
        .distinct().collect()
        .map(r => partCols.indices.map(r.getLong).toSeq: Seq[Long]).toSet)
      .getOrElse(Set.empty[Seq[Long]])
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(present).foreach { vals =>
      val sub = partCols.zip(vals).map { case (c, v) => s"$c=$v" }.mkString("/")
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$table/$sub"), true)
    }
  }

  private def applyStagedDelta(
      spark: SparkSession, path: String, sp: String,
      staged: StageMarker, batchId: String, mf: IndexManifest): IndexManifest = {
    // crash window between the manifest write and the applied marker: the
    // manifest is the LAST write before the marker, so its containing THIS
    // batch's staged stage proves every overwrite finished — finish the
    // marker and return (re-running the overwrites would be deterministic
    // but wasted, and the staleness guards below would misfire on the
    // store's own manifest growth)
    if (mf.stages.exists(_.stage == staged.stage)) {
      ManifestIO.write(marker(path, s"delta_${batchId}_applied"),
        staged.copy(stage = s"delta_${batchId}_applied"))
      return mf
    }
    // a staged delta computed against an OLDER committed state must never
    // apply: its staged partitions are the complete content of the touched
    // ranges AS OF STAGING, so overwriting from them silently reverts every
    // later delta's changes to those ranges. Reachable only through crash
    // recovery (A staged, crash, B staged+applied, A re-run). The manifest
    // stage count is the write clock — any delta/compaction applied since
    // staging bumps it. Absent field = pre-guard marker; no check there.
    staged.lineage.get("stagesAtStaging").foreach { n =>
      if (n.toInt != mf.stages.size)
        throw new IllegalStateException(
          s"staged delta '$batchId' at $path predates ${mf.stages.size - n.toInt} " +
            "later applied delta(s)/compaction(s): its staged partitions reflect " +
            "the store as of ITS staging and applying them would revert the later " +
            "changes — discard the staged batch (vacuum cannot; delete " +
            s"_stage/delta_$batchId and its markers) and re-submit it under a " +
            "fresh id")
    }
    // staged content indexed by PRE-compaction ordinals must never reach a
    // compacted store (the recovery path hits this: delta staged, crash
    // before apply, compact, delta re-run). Subsumed by the stage-count
    // guard on current markers; kept for markers that predate it. Absent
    // field = pre-guard marker from an older store version — no check.
    staged.lineage.get("compactEpoch").foreach { e =>
      if (e.toLong != compactEpoch(mf))
        throw new IllegalStateException(
          s"staged delta '$batchId' at $path predates a compaction (staged at " +
            s"compact epoch $e, store is at ${compactEpoch(mf)}): its ordinals were " +
            "remapped and applying it would overwrite other documents — discard " +
            "the staged batch (vacuum cannot; delete _stage/delta_" + batchId +
            " and its markers) and re-submit it")
    }
    def applyTable(table: String, partCols: Seq[String],
        touched: Seq[Seq[Long]]): Unit =
      overwriteTouched(spark, path, sp, table, partCols, touched)
    def parseBuckets(key: String): Seq[Long] = {
      val s = staged.lineage.getOrElse(key, "")
      if (s.isEmpty) Nil else s.split(",").map(_.toLong).toSeq
    }
    // postings/blocks: touched leaves = every pre-existing or staged
    // (t_bucket, d_group) pair inside the touched d_groups. Enumerate via
    // listing the touched group dirs (bounded by termBuckets × groups).
    val touchedGroups = parseBuckets("dGroups")
    def twoLevelTouched(table: String): Seq[Seq[Long]] = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val root = new org.apache.hadoop.fs.Path(s"$path/$table")
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("t_bucket="))
        .flatMap { tb =>
          val t = tb.stripPrefix("t_bucket=").toLong
          touchedGroups.map(g => Seq(t, g))
        }
    }
    val blocksTouched = twoLevelTouched("blocks")
    applyTable("postings", Seq("t_bucket", "d_group"), twoLevelTouched("postings"))
    applyTable("docs", Seq("d_bucket"), parseBuckets("dBuckets").map(Seq(_)))
    applyTable("doc_stats", Seq("d_bucket"), parseBuckets("dBuckets").map(Seq(_)))
    // blocks share the postings' (t_bucket, d_group) partition unit — the
    // staged blocks are the complete post-delta content of those leaves
    applyTable("blocks", Seq("t_bucket", "d_group"), blocksTouched)
    if (staged.lineage.getOrElse("kBuckets", "").nonEmpty)
      applyTable("keymap", Seq("k_bucket"), parseBuckets("kBuckets").map(Seq(_)))
    spark.read.parquet(s"$sp/term_dict")
      .write.mode("overwrite").parquet(s"$path/term_dict")

    val n2 = staged.lineage("numDocs").toLong
    val tok2 = staged.lineage("tokens").toLong
    val mf2 = mf.copy(numDocs = n2,
      avgDocLen = if (n2 == 0) 0.0 else tok2.toDouble / n2,
      stages = mf.stages :+ staged)
    ManifestIO.write(s"$path/manifest.json", mf2)
    ManifestIO.write(marker(path, s"delta_${batchId}_applied"),
      staged.copy(stage = s"delta_${batchId}_applied"))
    mf2
  }

  /** Incrementally REMOVE documents from a committed persisted index — the
    * retention/right-to-be-forgotten delta a 100 TB training store needs
    * (the reference has no delete surface; this extends its threshold-merge
    * contract, `/root/reference/indexer.go:38-61`, to removals).
    *
    * Same two-phase staged protocol as [[addDocuments]], idempotent per
    * `batchId`, and the same O(touched partitions) cost contract: every
    * read is directory-pruned to the d_buckets/d_groups of the removed
    * ordinals (+ the removed keys' key buckets), never a scan of the store.
    * No re-analysis is needed: df/cf decrements come from the removed
    * ordinals' own posting rows (exact by construction), token decrements
    * from their doc_stats rows.
    *
    * @param keys either rows with a `doc_ord` column (used directly), or —
    *             on a keymapped index — rows with the manifest's key
    *             columns, resolved through the bucketed keymap. Unknown
    *             keys/ordinals are ignored (remove is idempotent on them).
    */
  def removeDocuments(
      spark: SparkSession,
      path: String,
      keys: DataFrame,
      batchId: String,
      failAfter: Option[String] = None
  ): IndexManifest = {
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    checkDeltaKind(path, batchId, "remove")
    val appliedM = marker(path, s"delta_${batchId}_applied")
    if (ManifestIO.exists(appliedM))
      return ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    val stagedM = marker(path, s"delta_${batchId}_staged")
    val sp = s"$path/_stage/delta_$batchId"
    val span = mf.bucketSpan
    val gSpan = if (mf.dGroupSpan > 0) mf.dGroupSpan else span
    val bp = BlockParams(mf.blockSize, mf.bucketSpan, mf.k1, mf.b)
    def dBucketOf(c: Column) = floor(c / lit(span)).cast("long")
    require(mf.dGroupSpan > 0,
      s"index at $path predates the d_group postings layout " +
        s"(manifest dGroupSpan=${mf.dGroupSpan}); rebuild it to accept deltas")
    requireBlocksLayout(spark, path, "deltas")

    val staged = ManifestIO.read(stagedM, classOf[StageMarker]).getOrElse {
      val t0 = System.currentTimeMillis()
      // resolve to ordinals: an explicit doc_ord column wins; otherwise the
      // keymap (which requires the manifest's key columns in `keys`)
      val probeOrds = (if (keys.columns.contains("doc_ord")) keys.select("doc_ord")
        else {
          require(mf.keyCols.nonEmpty && mf.keyCols.forall(keys.columns.contains),
            s"remove batch must carry doc_ord or the keymap columns " +
              s"(${mf.keyCols.mkString(",")}); got (${keys.columns.mkString(",")})")
          lookupOrds(spark, path, keys).select("doc_ord")
        }).distinct().persist()
      // phantom ordinals (never indexed / already removed) must not widen
      // the touched set: intersect with the docs table first, pruned to the
      // probe's candidate buckets
      val candBuckets = probeOrds.select(dBucketOf(col("doc_ord")).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val removedDocs = spark.read.parquet(s"$path/docs")
        .filter(col("d_bucket").isin(candBuckets: _*))
        .join(broadcast(probeOrds), Seq("doc_ord"), "left_semi")
        .persist()
      val removeOrds = removedDocs.select("doc_ord")
      val dBuckets = removedDocs.select(col("d_bucket").cast("long").as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val dGroups = dBuckets.map(b => b * span / gSpan).distinct

      // ---- dictionary: exact df/cf decrements from the removed ordinals'
      // own posting rows (directory-pruned to the touched d_groups) --------
      val remPost = spark.read.parquet(s"$path/postings")
        .filter(col("d_group").isin(dGroups: _*))
        .join(broadcast(removeOrds), Seq("doc_ord"), "left_semi")
      val decs = remPost.groupBy(col("term_id"))
        .agg(count(lit(1)).as("df_x"), sum(col("tf")).cast("long").as("cf_x"))
      val dict0 = spark.read.parquet(s"$path/term_dict")
      val dict = if (dict0.columns.contains("term_h")) dict0
                 else dict0.withColumn("term_h", xxhash64(col("term")))
      dict
        .join(broadcast(decs), Seq("term_id"), "left")
        .select(col("term_id"), col("term"), col("term_h"),
          (col("df") - coalesce(col("df_x"), lit(0L))).as("df"),
          (col("cf") - coalesce(col("cf_x"), lit(0L))).as("cf"), col("t_bucket"))
        .filter(col("df") > 0)
        .write.mode("overwrite").parquet(s"$sp/term_dict")

      // ---- postings / docs / doc_stats: touched partitions minus removed -
      spark.read.parquet(s"$path/postings")
        .filter(col("d_group").isin(dGroups: _*))
        .join(broadcast(removeOrds), Seq("doc_ord"), "left_anti")
        .write.mode("overwrite").partitionBy("t_bucket", "d_group").parquet(s"$sp/postings")
      spark.read.parquet(s"$path/docs")
        .filter(col("d_bucket").isin(dBuckets: _*))
        .join(broadcast(removeOrds), Seq("doc_ord"), "left_anti")
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$sp/docs")
      val oldStats = spark.read.parquet(s"$path/doc_stats")
        .filter(col("d_bucket").isin(dBuckets: _*))
      oldStats
        .join(broadcast(removeOrds), Seq("doc_ord"), "left_anti")
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$sp/doc_stats")

      // ---- keymap: drop the removed docs' keys from their key buckets ----
      val kBucketsTouched: Seq[Int] =
        if (mf.keyCols.isEmpty) Nil
        else {
          val kb = kBucketCol(mf.keyCols, mf.keyBuckets)
          val remKeys = removedDocs.select(mf.keyCols.map(col): _*)
          val kbs = remKeys.select(kb.as("kb")).distinct()
            .collect().map(_.getInt(0)).toSeq
          spark.read.parquet(s"$path/keymap")
            .filter(col("k_bucket").isin(kbs: _*))
            .join(broadcast(remKeys), mf.keyCols, "left_anti")
            .drop("k_bucket")
            .withColumn("k_bucket", kb)
            .write.mode("overwrite").partitionBy("k_bucket").parquet(s"$sp/keymap")
          kbs
        }

      // ---- blocks: rebuild the touched d_groups' block leaves from the
      // staged (post-removal) postings — complete content of exactly the
      // (t_bucket, d_group) leaves apply overwrites. A batch that empties
      // its doc groups stages ZERO postings (an unreadable fileless parquet
      // dir) — skip the rebuild; apply then DELETES the touched block
      // partitions, which is exactly the post-removal content ---------------
      val stagedPost =
        try Some(spark.read.parquet(s"$sp/postings"))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      stagedPost.foreach { sp0 =>
        writeBlocks(
          PostingBlocks.buildFrom(sp0.drop("t_bucket", "d_group"), null, bp),
          spark.read.parquet(s"$sp/term_dict"), gSpan, span, s"$sp/blocks")
      }

      // ---- exact global stats by integer delta ----------------------------
      val removed = removedDocs.count()
      val remTok = oldStats
        .join(broadcast(removeOrds), Seq("doc_ord"), "left_semi")
        .agg(coalesce(sum(col("token_count").cast("long")), lit(0L))).head().getLong(0)
      val prevTokens = mf.stages.reverse.collectFirst {
        case s if s.lineage.contains("tokens") => s.lineage("tokens").toLong
      }.getOrElse(0L)
      val n2 = mf.numDocs - removed
      val tok2 = prevTokens - remTok
      removedDocs.unpersist(); probeOrds.unpersist()
      val m = StageMarker(s"delta_${batchId}_staged", removed,
        System.currentTimeMillis() - t0,
        Map("op" -> "remove",
          "compactEpoch" -> compactEpoch(mf).toString,
          "stagesAtStaging" -> mf.stages.size.toString,
          "tokens" -> tok2.toString, "numDocs" -> n2.toString,
          "removed" -> removed.toString,
          "dGroups" -> dGroups.mkString(","),
          "kBuckets" -> kBucketsTouched.mkString(","),
          "dBuckets" -> dBuckets.mkString(",")))
      ManifestIO.write(stagedM, m)
      m
    }
    if (failAfter.contains("staged")) throw new InjectedFailure("staged")

    applyStagedDelta(spark, path, sp, staged, batchId, mf)
  }

  /** Whether `batchId` is already claimed by a compaction at `path` —
    * staged OR applied (the compact twin of [[deltaClaimed]]; compactions
    * have their own marker namespace, so ids never collide with deltas). */
  def compactClaimed(path: String, batchId: String): Boolean =
    ManifestIO.exists(marker(path, s"compact_${batchId}_applied")) ||
      ManifestIO.exists(marker(path, s"compact_${batchId}_staged"))

  /** Fraction of the ordinal space [0, maxOrd] that live documents occupy.
    * Removals never reclaim ordinals, so a churned index drifts below 1.0:
    * WAND doc-range buckets underfill (looser block maxima per scanned
    * bucket), d_group leaf directories proliferate, and downstream dense
    * arrays sized by maxOrd waste space. Cheap: maxOrd comes from ONE
    * partition of the docs table (the max d_bucket directory — a listing,
    * not a scan). Compact when this drifts below ~0.5. */
  def ordinalDensity(spark: SparkSession, path: String): Double = {
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    if (mf.numDocs == 0) return 1.0
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/docs"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("d_bucket=")).map(_.stripPrefix("d_bucket=").toLong)
    if (buckets.isEmpty) return 1.0
    val maxOrd = spark.read.parquet(s"$path/docs")
      .filter(col("d_bucket") === buckets.max)
      .agg(max(col("doc_ord"))).head().getLong(0)
    mf.numDocs.toDouble / (maxOrd + 1)
  }

  /** Rewrite the committed index with a DENSE ordinal space — the offline
    * maintenance op a churned store needs (Lucene's forceMerge; the
    * reference's threshold merge `/root/reference/indexer.go:38-61` compacts
    * its in-memory buffer the same way). Removal deltas leave holes:
    * ordinals are never reclaimed, so doc-range WAND buckets underfill and
    * d_group directories accumulate. Compaction remaps every surviving
    * doc_ord to its rank (order-PRESERVING, so the north_rule's stable
    * (conv_id, turn_idx) turn ordering survives) and rewrites docs,
    * doc_stats, keymap, postings, and blocks; the term dictionary is
    * content-unchanged (df/cf were kept exact by the deltas). The result is
    * bit-identical to a fresh [[build]] over the surviving docs in ordinal
    * order. numDocs/avgdl are unchanged by construction.
    *
    * Cost: O(index) by nature — one remap join per table plus a full block
    * rebuild — run it when [[ordinalDensity]] drifts, not per batch. The
    * remap itself scales: per-d_group survivor counts collect to the driver
    * (~15k entries at 10^12 docs with the default 2^26 span) and ranks are
    * computed within d_group partitions.
    *
    * Two-phase and idempotent per `batchId`, same contract as the deltas:
    * STAGE writes the complete new content of every table under
    * `_stage/compact_<id>/` then the staged marker; APPLY overwrites each
    * table root from the staged content (static overwrite — every partition
    * is rewritten, vanished high buckets disappear), updates the manifest,
    * writes the applied marker. Every apply write is a pure function of the
    * staged data, so a crash mid-apply is recovered by re-running the SAME
    * batchId. Like all writes here: no concurrent writer. A live
    * [[graft.streaming.StreamingIndexer]] attached to this store holds
    * pre-compaction ordinals — its flush detects the compaction (manifest
    * compact-stage count) and fails loudly; re-attach after compacting.
    */
  def compact(
      spark: SparkSession,
      path: String,
      batchId: String,
      failAfter: Option[String] = None
  ): IndexManifest = {
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    require(mf.dGroupSpan > 0,
      s"index at $path predates the d_group postings layout " +
        s"(manifest dGroupSpan=${mf.dGroupSpan}); rebuild it instead")
    val appliedM = marker(path, s"compact_${batchId}_applied")
    if (ManifestIO.exists(appliedM))
      return ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    if (mf.numDocs == 0) { // nothing to remap; tables are already empty
      val m = StageMarker(s"compact_${batchId}_applied", 0, 0,
        Map("op" -> "compact", "numDocs" -> "0"))
      ManifestIO.write(appliedM, m)
      return mf
    }
    val stagedM = marker(path, s"compact_${batchId}_staged")
    val sp = s"$path/_stage/compact_$batchId"
    val span = mf.bucketSpan
    val gSpan = mf.dGroupSpan
    val bp = BlockParams(mf.blockSize, mf.bucketSpan, mf.k1, mf.b)
    def dBucketOf(c: Column) = floor(c / lit(span)).cast("long")
    def dGroupOf(c: Column) = floor(c / lit(gSpan)).cast("long")

    val staged = ManifestIO.read(stagedM, classOf[StageMarker]).getOrElse {
      val t0 = System.currentTimeMillis()
      val docs0 = spark.read.parquet(s"$path/docs")
      // per-d_group survivor counts -> driver-side cumulative offsets. The
      // remap is deterministic across staging retries (a pure function of
      // the committed docs table, which apply has not yet touched).
      val gCounts = docs0.select(dGroupOf(col("doc_ord")).as("g"))
        .groupBy("g").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val offsets = {
        var acc = 0L
        gCounts.map { case (g, c) => val o = (g, acc); acc += c; o }.toSeq
      }
      import spark.implicits._
      val offDf = offsets.toDF("g", "g_off")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("doc_ord"))
      val remap = docs0
        .select(col("doc_ord"), dGroupOf(col("doc_ord")).as("g"))
        .join(broadcast(offDf), "g")
        .withColumn("new_ord",
          col("g_off") + row_number().over(w).cast("long") - lit(1L))
        .select("doc_ord", "new_ord")
        .persist()
      // (old, new) ordinal pairs are two longs/row: BROADCAST the remap
      // when it fits (guide §3.1) — the un-hinted join otherwise
      // sort-merge-shuffles every table it remaps, including the postings
      // store WITH its positions payload, just to swap an ordinal (guide
      // §8: heavy bytes should move once, in the re-cluster exchange, not
      // twice). Beyond the bound (conf-tunable; at 10^12 docs no remap
      // broadcasts) the shuffle join is the correct fallback.
      val remapJoin =
        if (gCounts.map(_._2).sum <= remapBroadcastMaxRows(spark)) broadcast(remap)
        else remap
      def remapped(df: DataFrame): DataFrame =
        df.join(remapJoin, "doc_ord").drop("doc_ord")
          .withColumnRenamed("new_ord", "doc_ord")

      // every remapped table passes through a shuffle join on doc_ord, so
      // its output partitioning is hash(doc_ord) — WITHOUT re-clustering,
      // partitionBy makes EVERY write task emit a file into EVERY leaf it
      // holds rows for (measured at 10^6 turns: docs went 2.0 -> 22.3
      // files/leaf and cold queries from the compacted store read 2x
      // SLOWER than pre-maintenance). Repartition on the leaf key so each
      // leaf is written by one task, and sort by doc_ord inside files so
      // row-group min/max pruning serves the per-query doc fetch.
      val docsCols = docs0.drop("d_bucket").columns
      remapped(docs0.drop("d_bucket"))
        .select(docsCols.map(col): _*)
        .withColumn("d_bucket", dBucketOf(col("doc_ord")))
        .repartition(col("d_bucket"))
        .sortWithinPartitions(col("d_bucket"), col("doc_ord"))
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$sp/docs")
      remapped(spark.read.parquet(s"$path/doc_stats").drop("d_bucket"))
        .select("doc_ord", "token_count")
        .withColumn("d_bucket", dBucketOf(col("doc_ord")))
        .repartition(col("d_bucket"))
        .sortWithinPartitions(col("d_bucket"), col("doc_ord"))
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$sp/doc_stats")
      if (mf.keyCols.nonEmpty)
        remapped(spark.read.parquet(s"$path/keymap").drop("k_bucket"))
          .select((mf.keyCols.map(col) :+ col("doc_ord")): _*)
          .withColumn("k_bucket", kBucketCol(mf.keyCols, mf.keyBuckets))
          .repartition(col("k_bucket"))
          .sortWithinPartitions((col("k_bucket") +: mf.keyCols.map(col)): _*)
          .write.mode("overwrite").partitionBy("k_bucket").parquet(s"$sp/keymap")
      remapped(spark.read.parquet(s"$path/postings").drop("d_group"))
        .select("term_id", "doc_ord", "positions", "tf", "dl", "t_bucket")
        .withColumn("d_group", dGroupOf(col("doc_ord")))
        .repartition(col("t_bucket"), col("d_group"))
        .sortWithinPartitions(col("t_bucket"), col("d_group"),
          col("term_id"), col("doc_ord"))
        .write.mode("overwrite").partitionBy("t_bucket", "d_group")
        .parquet(s"$sp/postings")
      // dict content is unchanged; staged copy keeps apply uniform (every
      // table root rewritten from _stage, nothing read from live tables)
      spark.read.parquet(s"$path/term_dict")
        .write.mode("overwrite").parquet(s"$sp/term_dict")
      writeBlocks(PostingBlocks.buildFrom(
          spark.read.parquet(s"$sp/postings").drop("t_bucket", "d_group"), null, bp),
        spark.read.parquet(s"$sp/term_dict"), gSpan, span, s"$sp/blocks")
      remap.unpersist()
      val prevTokens = mf.stages.reverse.collectFirst {
        case s if s.lineage.contains("tokens") => s.lineage("tokens").toLong
      }.getOrElse(0L)
      val m = StageMarker(s"compact_${batchId}_staged", mf.numDocs,
        System.currentTimeMillis() - t0,
        Map("op" -> "compact", "compactEpoch" -> compactEpoch(mf).toString,
          "stagesAtStaging" -> mf.stages.size.toString,
          "tokens" -> prevTokens.toString,
          "numDocs" -> mf.numDocs.toString))
      ManifestIO.write(stagedM, m)
      m
    }
    if (failAfter.contains("staged")) throw new InjectedFailure("staged")
    // crash window between the manifest write and the applied marker: the
    // manifest is the LAST write before the marker, so its containing THIS
    // batch's staged stage proves every swap finished — finish the marker
    // and return instead of tripping the epoch check below (which would
    // misread the store's own bumped compact count as a foreign compaction
    // and tell the operator to discard a fully-applied compaction)
    if (mf.stages.exists(_.stage == staged.stage)) {
      ManifestIO.write(appliedM, staged.copy(stage = s"compact_${batchId}_applied"))
      return mf
    }
    // same recovery hazard as deltas: this compaction's staged tables are
    // the complete store content AS OF STAGING — ANY delta or compaction
    // applied since (crash-recovery interleaving) would be silently erased
    // by the swap. The manifest stage count is the write clock.
    staged.lineage.get("stagesAtStaging").foreach { n =>
      if (n.toInt != mf.stages.size)
        throw new IllegalStateException(
          s"staged compaction '$batchId' at $path predates " +
            s"${mf.stages.size - n.toInt} later applied delta(s)/compaction(s); " +
            "applying its staged tables would erase their changes — discard its " +
            "staging (delete _stage/compact_" + batchId +
            " and its markers) and re-run with a fresh id")
    }
    // pre-stage-count markers: at least refuse an intervening compaction
    staged.lineage.get("compactEpoch").foreach { e =>
      if (e.toLong != compactEpoch(mf))
        throw new IllegalStateException(
          s"staged compaction '$batchId' at $path predates another compaction; " +
            "discard its staging (delete _stage/compact_" + batchId +
            " and its markers) and re-run with a fresh id")
    }

    def swap(table: String, partCols: Seq[String]): Unit = {
      val staged0 =
        try Some(spark.read.parquet(s"$sp/$table"))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      staged0 match {
        case Some(df) =>
          val wtr = df.write.mode("overwrite")
          (if (partCols.nonEmpty) wtr.partitionBy(partCols: _*) else wtr)
            .parquet(s"$path/$table")
        case None => // staged empty => post-compact table is empty
          new org.apache.hadoop.fs.Path(path)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(s"$path/$table"), true)
      }
    }
    swap("postings", Seq("t_bucket", "d_group"))
    if (failAfter.contains("apply_postings")) throw new InjectedFailure("apply_postings")
    swap("docs", Seq("d_bucket"))
    swap("doc_stats", Seq("d_bucket"))
    // static overwrite truncates the table root, so a full compact also
    // MIGRATES a pre-t_bucket block layout to (t_bucket, d_group)
    swap("blocks", Seq("t_bucket", "d_group"))
    if (mf.keyCols.nonEmpty) swap("keymap", Seq("k_bucket"))
    swap("term_dict", Nil)
    val mf2 = mf.copy(stages = mf.stages :+ staged)
    ManifestIO.write(s"$path/manifest.json", mf2)
    ManifestIO.write(appliedM, staged.copy(stage = s"compact_${batchId}_applied"))
    mf2
  }

  /** d_groups whose live-ordinal density sits below `threshold` — the
    * selection input for [[compactGroups]]. Per-group density = live docs /
    * occupied ordinal prefix (maxOrd-in-group − groupBase + 1): a group
    * that was never full but has no HOLES scores 1.0 and is skipped, while
    * a churned group (removals punched gaps) drops toward 0. Cost: one
    * column-pruned scan of the narrow doc_stats table (doc_ord only) plus
    * a ~#groups-row aggregate — cheap next to any rewrite, which is the
    * point: probe often, compact only what drifted. */
  def sparseDGroups(spark: SparkSession, path: String,
      threshold: Double = 0.5): Seq[Long] = {
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    require(mf.dGroupSpan > 0,
      s"index at $path predates the d_group postings layout; rebuild it instead")
    if (mf.numDocs == 0) return Nil
    val gSpan = mf.dGroupSpan
    spark.read.parquet(s"$path/doc_stats")
      .select(col("doc_ord"), floor(col("doc_ord") / lit(gSpan)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("live"), max(col("doc_ord")).as("mx"))
      .filter(col("live").cast("double") /
        (col("mx") - col("g") * lit(gSpan) + 1) < threshold)
      .select("g").collect().map(_.getLong(0)).toSeq.sorted
  }

  /** Compact ONLY the given d_groups — the incremental maintenance twin of
    * [[compact]] for a churned large store: a 10^12-doc index with removal
    * churn concentrated in a few doc ranges should not pay an O(index)
    * rewrite to re-densify them. Each selected group's surviving ordinals
    * are remapped to be dense FROM THE GROUP'S OWN BASE (`g*dGroupSpan +
    * rank`), order-preserving; the group boundary is the remap FENCE — no
    * ordinal crosses it, so untouched groups (their postings leaves, docs/
    * doc_stats buckets, and WAND block partitions) are not read, not
    * rewritten, and keep their file mtimes. Reads and writes are
    * directory-pruned to the touched groups' partitions (plus the touched
    * docs' key buckets in the keymap), the same O(touched) contract as the
    * deltas. The term dictionary, numDocs, and avgdl are unchanged (no doc
    * enters or leaves).
    *
    * Semantics: queries are UNAFFECTED (same documents, same scores — only
    * internal ordinals move); within each compacted group the ordinal space
    * is dense from the base, so its WAND buckets re-fill and its d_bucket
    * directory count shrinks. Inter-group holes (a group's unused tail, or
    * groups below `threshold` NOT selected) remain — global densification
    * is [[compact]]'s job. Select groups with [[sparseDGroups]].
    *
    * Two-phase and idempotent per `batchId` in the compact marker
    * namespace, with the same write-clock guards as [[compact]]: it counts
    * as a compaction ([[compactEpoch]]), so staged-but-unapplied deltas
    * from before it are refused at apply (their ordinals may be remapped).
    */
  def compactGroups(
      spark: SparkSession,
      path: String,
      batchId: String,
      groups: Seq[Long],
      failAfter: Option[String] = None
  ): IndexManifest = {
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    require(mf.dGroupSpan > 0,
      s"index at $path predates the d_group postings layout " +
        s"(manifest dGroupSpan=${mf.dGroupSpan}); rebuild it instead")
    requireBlocksLayout(spark, path, "group compaction")
    require(groups.nonEmpty, "compactGroups needs at least one d_group")
    // full compact and group compact share the compact_<id> marker
    // namespace; a reused id across kinds would hit the other's idempotence
    // marker and silently no-op
    Seq(s"compact_${batchId}_applied", s"compact_${batchId}_staged").foreach { n =>
      ManifestIO.read(marker(path, n), classOf[StageMarker])
        .flatMap(_.lineage.get("op")).filter(_ != "compact_groups")
        .foreach { other =>
          throw new IllegalArgumentException(
            s"batch id '$batchId' at $path was already used by a '$other'; " +
              "reusing it for a 'compact_groups' would silently no-op — use a distinct id")
        }
    }
    val appliedM = marker(path, s"compact_${batchId}_applied")
    if (ManifestIO.exists(appliedM))
      return ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest]).get
    val stagedM = marker(path, s"compact_${batchId}_staged")
    val sp = s"$path/_stage/compact_$batchId"
    val span = mf.bucketSpan
    val gSpan = mf.dGroupSpan
    val bp = BlockParams(mf.blockSize, mf.bucketSpan, mf.k1, mf.b)
    val bucketsPerGroup = gSpan / span
    val gs = groups.distinct.sorted
    def dBucketOf(c: Column) = floor(c / lit(span)).cast("long")
    def dGroupOf(c: Column) = floor(c / lit(gSpan)).cast("long")
    def listLong(table: String, prefix: String): Seq[Long] = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val root = new org.apache.hadoop.fs.Path(s"$path/$table")
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix).toLong)
    }
    def inGroups(b: Long): Boolean = gs.contains(b / bucketsPerGroup)

    val staged = ManifestIO.read(stagedM, classOf[StageMarker]).getOrElse {
      val t0 = System.currentTimeMillis()
      // touched leaves BEFORE the rewrite (deletion candidates at apply):
      // enumerated from directory listings, never a scan
      val oldDocBuckets = listLong("docs", "d_bucket=").filter(inGroups)
      val docs0 = spark.read.parquet(s"$path/docs")
        .filter(col("d_bucket").isin(oldDocBuckets: _*))
      // per-(group, d_bucket) live counts -> driver-side offsets: dense
      // rank within a group = docs in its EARLIER buckets + rank within
      // own bucket. Bounded: |groups| × (dGroupSpan/bucketSpan) entries,
      // and window partitions stay ≤ bucketSpan rows.
      val counts = docs0
        .groupBy(dGroupOf(col("doc_ord")).as("g"), col("d_bucket").cast("long").as("db"))
        .count().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      val offsets = counts.groupBy(_._1).toSeq.flatMap { case (g, bs) =>
        var acc = 0L
        bs.sortBy(_._2).map { case (_, db, c) => val o = (g, db, acc); acc += c; o }
      }
      import spark.implicits._
      val offDf = offsets.toDF("g", "db", "off")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("db")).orderBy(col("doc_ord"))
      val remap = docs0
        .select(col("doc_ord"), dGroupOf(col("doc_ord")).as("g"),
          col("d_bucket").cast("long").as("db"))
        .join(broadcast(offDf), Seq("g", "db"))
        .withColumn("new_ord", col("g") * lit(gSpan) + col("off") +
          row_number().over(w).cast("long") - lit(1L))
        .select("doc_ord", "new_ord")
        .persist()
      // touched-groups-sized (old, new) pairs: broadcast when they fit,
      // same rationale as [[compact]]'s remap join
      val remapJoin =
        if (counts.map(_._3).sum <= remapBroadcastMaxRows(spark)) broadcast(remap)
        else remap
      def remapped(df: DataFrame): DataFrame =
        df.join(remapJoin, "doc_ord").drop("doc_ord")
          .withColumnRenamed("new_ord", "doc_ord")

      val docsCols = docs0.drop("d_bucket").columns
      remapped(docs0.drop("d_bucket"))
        .select(docsCols.map(col): _*)
        .withColumn("d_bucket", dBucketOf(col("doc_ord")))
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$sp/docs")
      remapped(spark.read.parquet(s"$path/doc_stats")
          .filter(col("d_bucket").isin(oldDocBuckets: _*)).drop("d_bucket"))
        .select("doc_ord", "token_count")
        .withColumn("d_bucket", dBucketOf(col("doc_ord")))
        .write.mode("overwrite").partitionBy("d_bucket").parquet(s"$sp/doc_stats")
      remapped(spark.read.parquet(s"$path/postings")
          .filter(col("d_group").isin(gs: _*)).drop("d_group"))
        .select("term_id", "doc_ord", "positions", "tf", "dl", "t_bucket")
        .withColumn("d_group", dGroupOf(col("doc_ord")))
        .write.mode("overwrite").partitionBy("t_bucket", "d_group")
        .parquet(s"$sp/postings")
      // blocks: rebuild the touched groups' (t_bucket, d_group) block
      // leaves from their staged (remapped) postings. Zero staged postings
      // (groups holding only token-less docs) stage no blocks; apply then
      // deletes the old touched block partitions — the post-compact content.
      val stagedPost =
        try Some(spark.read.parquet(s"$sp/postings"))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      stagedPost.foreach { sp0 =>
        // the group compaction leaves the dictionary untouched, so the
        // t_bucket attach joins against the LIVE term_dict
        writeBlocks(PostingBlocks.buildFrom(sp0.drop("t_bucket", "d_group"), null, bp),
          spark.read.parquet(s"$path/term_dict"), gSpan, span, s"$sp/blocks")
      }
      // keymap: the touched docs' keys keep their k_bucket (hash of the
      // key), so the touched bucket set is the distinct k_bucket of those
      // keys; each touched bucket is rewritten with remapped ordinals
      // substituted (rows of untouched docs in the same bucket ride along
      // unchanged). Proportional to the touched docs' key spread.
      val kBucketsTouched: Seq[Int] =
        if (mf.keyCols.isEmpty) Nil
        else {
          val kb = kBucketCol(mf.keyCols, mf.keyBuckets)
          val kbs = docs0.select(kb.as("kb")).distinct()
            .collect().map(_.getInt(0)).toSeq
          spark.read.parquet(s"$path/keymap")
            .filter(col("k_bucket").isin(kbs: _*))
            .join(remapJoin, Seq("doc_ord"), "left")
            .withColumn("doc_ord", coalesce(col("new_ord"), col("doc_ord")))
            .drop("new_ord", "k_bucket")
            .withColumn("k_bucket", kBucketCol(mf.keyCols, mf.keyBuckets))
            .write.mode("overwrite").partitionBy("k_bucket").parquet(s"$sp/keymap")
          kbs
        }
      remap.unpersist()
      val prevTokens = mf.stages.reverse.collectFirst {
        case s if s.lineage.contains("tokens") => s.lineage("tokens").toLong
      }.getOrElse(0L)
      val m = StageMarker(s"compact_${batchId}_staged", mf.numDocs,
        System.currentTimeMillis() - t0,
        Map("op" -> "compact_groups",
          "compactEpoch" -> compactEpoch(mf).toString,
          "stagesAtStaging" -> mf.stages.size.toString,
          "tokens" -> prevTokens.toString,
          "numDocs" -> mf.numDocs.toString,
          "dGroups" -> gs.mkString(","),
          "dBuckets" -> oldDocBuckets.sorted.mkString(","),
          "kBuckets" -> kBucketsTouched.sorted.mkString(",")))
      ManifestIO.write(stagedM, m)
      m
    }
    if (failAfter.contains("staged")) throw new InjectedFailure("staged")
    // crash window between manifest write and applied marker (see compact)
    if (mf.stages.exists(_.stage == staged.stage)) {
      ManifestIO.write(appliedM, staged.copy(stage = s"compact_${batchId}_applied"))
      return mf
    }
    // write-clock guards, same hazard as the deltas: staged partitions are
    // the complete content of the touched ranges AS OF STAGING
    staged.lineage.get("stagesAtStaging").foreach { n =>
      if (n.toInt != mf.stages.size)
        throw new IllegalStateException(
          s"staged group compaction '$batchId' at $path predates " +
            s"${mf.stages.size - n.toInt} later applied delta(s)/compaction(s); " +
            "applying its staged tables would erase their changes — discard its " +
            "staging (delete _stage/compact_" + batchId +
            " and its markers) and re-run with a fresh id")
    }
    def parseBuckets(key: String): Seq[Long] = {
      val s = staged.lineage.getOrElse(key, "")
      if (s.isEmpty) Nil else s.split(",").map(_.toLong).toSeq
    }
    val postTouched: Seq[Seq[Long]] =
      listLong("postings", "t_bucket=").flatMap(t => gs.map(g => Seq(t, g)))
    overwriteTouched(spark, path, sp, "postings", Seq("t_bucket", "d_group"), postTouched)
    if (failAfter.contains("apply_postings")) throw new InjectedFailure("apply_postings")
    overwriteTouched(spark, path, sp, "docs", Seq("d_bucket"),
      parseBuckets("dBuckets").map(Seq(_)))
    overwriteTouched(spark, path, sp, "doc_stats", Seq("d_bucket"),
      parseBuckets("dBuckets").map(Seq(_)))
    overwriteTouched(spark, path, sp, "blocks", Seq("t_bucket", "d_group"),
      listLong("blocks", "t_bucket=").flatMap(t => gs.map(g => Seq(t, g))))
    if (staged.lineage.getOrElse("kBuckets", "").nonEmpty)
      overwriteTouched(spark, path, sp, "keymap", Seq("k_bucket"),
        parseBuckets("kBuckets").map(Seq(_)))
    val mf2 = mf.copy(stages = mf.stages :+ staged)
    ManifestIO.write(s"$path/manifest.json", mf2)
    ManifestIO.write(appliedM, staged.copy(stage = s"compact_${batchId}_applied"))
    mf2
  }
}
