package graft.streaming

import graft.analysis.Analyzer
import graft.index.{Ids, IndexBuilder, TextIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

/** Structured-Streaming index maintenance, O(batch) per micro-batch.
  *
  * The reference buffers per-document updates in memory and merges into
  * storage past a size threshold (`/root/reference/indexer.go:20-61`). This
  * is that exact shape at Spark scale:
  *
  *  - a micro-batch folds into small CACHED DELTA frames (postings, docs,
  *    stats, dictionary adjustments, tombstoned base ordinals) — per-batch
  *    shuffle work is proportional to the batch + accumulated delta, NEVER
  *    to the base index (pinned by a metrics-listener test);
  *  - the queryable index is a lazy view: base tables anti-joined with the
  *    (broadcast, batch-sized) tombstones, unioned with the delta frames,
  *    and a dictionary adjusted by the delta df/cf — Catalyst pushes each
  *    query's term filters below the view, so queries stay pruned;
  *  - past `flushThreshold` buffered docs the delta is compacted into a new
  *    materialized base (the threshold merge, `indexer.go:38-60`), which
  *    also resets the cached-plan lineage.
  *
  * Re-delivered turns (same conv_id, turn_idx) replace their previous
  * version — exactly-once index content under at-least-once delivery. df/cf
  * stay exact across replacements: the replaced version's text is
  * re-analyzed (O(batch)) for per-term decrements rather than re-counting
  * the posting store. [[removeBatch]] deletes by key under the same
  * contract (retention / right-to-be-forgotten), with removals folded
  * through the storage layer's staged removal delta at flush.
  */
/** @param storagePath when set, `initial` must be (the TextIndex of) the
  *   persisted index at that path, and flush() folds the buffered delta
  *   into storage via `ParquetIndexStorage.addDocuments` — a staged,
  *   idempotent dynamic-partition-overwrite of only the touched t_bucket /
  *   d_bucket partitions — then rebases on the committed state. Without it,
  *   flush() compacts into a new in-memory base. */
final class StreamingIndexer(
    initial: TextIndex,
    analyzer: Analyzer,
    textCol: String = "text",
    flushThreshold: Long = 100000L,
    storagePath: Option[String] = None
) extends Serializable {

  private val spark: SparkSession = initial.docs.sparkSession
  import spark.implicits._

  // persisted layouts carry partition columns the delta frames do not
  private def docsOf(ti: TextIndex): DataFrame = ti.docs.drop("d_bucket")
  private def statsOf(ti: TextIndex): DataFrame = ti.docStats.drop("d_bucket")
  private def postingsOf(ti: TextIndex): DataFrame =
    ti.postings.drop("t_bucket", "d_group")

  /** Committed-storage manifest, when storage-backed: provides the keymap
    * key columns (pruned key resolution) and the docs bucket span. */
  private val storageManifest: Option[graft.storage.IndexManifest] =
    storagePath.flatMap(p => graft.storage.ManifestIO.read(
      s"$p/manifest.json", classOf[graft.storage.IndexManifest]))
  private def keymapUsable: Boolean =
    storageManifest.exists(m => m.keyCols == Seq("conv_id", "turn_idx"))

  // A compaction REMAPS ordinals: this indexer's cached base frames and its
  // minted ordinals (nextOrd) refer to the PRE-compaction space, and
  // addDocuments treats an ordinal collision as a REPLACEMENT — flushing
  // stale ordinals into a compacted store would silently overwrite
  // arbitrary other documents. Record the store's compaction count at
  // attach; flush checks it and fails loudly on a mismatch.
  private def compactCount(mf: graft.storage.IndexManifest): Long =
    mf.stages.count(_.stage.startsWith("compact_"))
  private val attachedCompactCount: Long =
    storageManifest.map(compactCount).getOrElse(0L)

  // ---- mutable state (driver-side; all DataFrames below are cached) ------
  @volatile private var base: TextIndex = initial
  @volatile private var tombstones: DataFrame = emptyOrds() // base ords replaced
  @volatile private var deltaDocs: DataFrame = docsOf(initial).limit(0).cache()
  @volatile private var deltaStats: DataFrame = statsOf(initial).limit(0).cache()
  @volatile private var deltaPostings: DataFrame =
    postingsOf(initial).limit(0).cache()
  @volatile private var flushEpoch: Long = 0L
  @volatile private var mintedTerms: DataFrame =
    Seq.empty[(Long, String)].toDF("term_id", "term").cache()
  @volatile private var dictAdj: DataFrame =
    Seq.empty[(String, Long, Long)].toDF("term", "df_d", "cf_d").cache()
  @volatile private var nDelta: Long = 0L      // net new docs in delta
  @volatile private var tokensDelta: Long = 0L // net new tokens in delta
  @volatile private var bufferedDocs: Long = 0L
  // keys removed this epoch (conv_id, turn_idx, doc_ord): their base/storage
  // versions still need removal at flush, the on-disk keymap still lists
  // them (resolution must skip them), and a re-add gets the stable ordinal
  // back WITHOUT an old-text decrement (the removal already decremented)
  private def emptyRemovedKeys(ti: TextIndex): DataFrame =
    (if (Seq("conv_id", "turn_idx").forall(ti.docs.columns.contains))
       docsOf(ti).select("conv_id", "turn_idx", "doc_ord").limit(0)
     else Seq.empty[(String, Int, Long)].toDF("conv_id", "turn_idx", "doc_ord")).cache()
  @volatile private var removedKeys: DataFrame = emptyRemovedKeys(initial)
  @volatile private var removedBuffered: Long = 0L
  @volatile private var deltaDocsRows: Long = 0L
  @volatile private var nextOrd: Long =
    initial.docs.agg(coalesce(max(col("doc_ord")), lit(-1L))).head().getLong(0) + 1
  @volatile private var nextTermId: Long =
    initial.termDict.agg(coalesce(max(col("term_id")), lit(-1L))).head().getLong(0) + 1
  @volatile private var baseTokens: Long = initial.exactTotalTokens

  private def emptyOrds(): DataFrame = Seq.empty[Long].toDF("doc_ord").cache()

  /** The live queryable index: a lazy view over base + delta. */
  def index: TextIndex = synchronized {
    val tomb = tombstones
    def minusTomb(df: DataFrame) =
      df.join(broadcast(tomb), Seq("doc_ord"), "left_anti")
    val adjusted = base.termDict.select("term_id", "term", "df", "cf")
      .join(dictAdj, Seq("term"), "left")
      .select(col("term_id"), col("term"),
        (col("df") + coalesce(col("df_d"), lit(0L))).as("df"),
        (col("cf") + coalesce(col("cf_d"), lit(0L))).as("cf"))
    val mintedRows = mintedTerms
      .join(dictAdj, Seq("term"), "left")
      .select(col("term_id"), col("term"),
        coalesce(col("df_d"), lit(0L)).as("df"), coalesce(col("cf_d"), lit(0L)).as("cf"))
    val n = base.numDocs + nDelta
    val tokens = baseTokens + tokensDelta
    TextIndex(
      docs = minusTomb(docsOf(base)).unionByName(deltaDocs),
      docStats = minusTomb(statsOf(base)).unionByName(deltaStats),
      termDict = adjusted.unionByName(mintedRows).filter(col("df") > 0),
      postings = minusTomb(postingsOf(base)).unionByName(deltaPostings),
      numDocs = n,
      avgDocLen = if (n == 0) 0.0 else tokens.toDouble / n,
      termBuckets = 0,
      totalTokens = tokens
    )
  }

  /** Resolve which of `batchKeys` (conv_id, turn_idx) currently EXIST in
    * the live view, returning (conv_id, turn_idx, doc_ord, __old_text) and
    * a cleanup for pinned lookup frames.
    *
    * Storage-backed: delta overrides first (keys rewritten this epoch live
    * in the cached, delta-sized deltaDocs with their current text), then
    * the BUCKETED KEYMAP (reads only the batch's key buckets) plus a
    * d_bucket-pruned docs read for the old text — per-batch input bytes ∝
    * touched partitions, never the base docs table (which a 10^12-turn
    * index cannot scan per micro-batch). Keys removed this epoch are
    * excluded (the on-disk keymap still lists them until flush). In-memory
    * fallback: broadcast probe of the live view (a cache scan, no shuffle),
    * which already excludes removed and tombstoned rows. */
  private def resolveExisting(batchKeys: DataFrame): (DataFrame, () => Unit) =
    if (keymapUsable) {
      val fromDelta = deltaDocs
        .select(col("conv_id"), col("turn_idx"), col("doc_ord"),
          col(textCol).as("__old_text"))
        .join(broadcast(batchKeys), Seq("conv_id", "turn_idx"))
      val remaining = batchKeys
        .join(fromDelta.select("conv_id", "turn_idx"), Seq("conv_id", "turn_idx"), "left_anti")
        .join(broadcast(removedKeys.select("conv_id", "turn_idx")),
          Seq("conv_id", "turn_idx"), "left_anti")
      // committed keys: doc_ords are STABLE across replacement, so keymap
      // entries stay valid even when the delta already replaced the text
      // (those keys were peeled off above and never reach the keymap)
      val ordsBase = graft.storage.ParquetIndexStorage
        .lookupOrds(spark, storagePath.get, remaining)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val span = storageManifest.get.bucketSpan
      val dbs = ordsBase.select(floor(col("doc_ord") / lit(span)).cast("long").as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val fromBase = base.docs.filter(col("d_bucket").isin(dbs: _*))
        .select(col("conv_id"), col("turn_idx"), col("doc_ord"),
          col(textCol).as("__old_text"))
        .join(broadcast(ordsBase.select("doc_ord")), Seq("doc_ord"), "left_semi")
      (fromDelta.unionByName(fromBase), () => ordsBase.unpersist())
    } else {
      val live = index
      (live.docs.select(col("conv_id"), col("turn_idx"),
          col("doc_ord"), col(textCol).as("__old_text"))
        .join(broadcast(batchKeys), Seq("conv_id", "turn_idx")), () => ())
    }

  /** Remove turns by (conv_id, turn_idx) from the live view — the streaming
    * counterpart of `ParquetIndexStorage.removeDocuments` (retention /
    * right-to-be-forgotten under the same O(batch) per-micro-batch
    * contract). Unknown and already-removed keys are no-ops. Removals
    * count toward the flush threshold; a storage-backed flush folds them
    * through the staged removal delta before applying the buffered adds. */
  def removeBatch(keys: DataFrame): Unit = synchronized {
    if (keys.isEmpty) return
    val keyed = keys.select(col("conv_id"), col("turn_idx"))
      .dropDuplicates("conv_id", "turn_idx")
      .join(broadcast(removedKeys.select("conv_id", "turn_idx")),
        Seq("conv_id", "turn_idx"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (keyed.count() == 0) { keyed.unpersist(); return }
    val (hits0, hitsCleanup) = resolveExisting(keyed)
    val hits = hits0.persist(StorageLevel.MEMORY_AND_DISK)
    val removedCount = hits.count()
    hitsCleanup()
    if (removedCount == 0) { hits.unpersist(); keyed.unpersist(); return }
    val remOrds = hits.select("doc_ord")
    // exact df/cf decrements: re-analyze ONLY the removed versions' text
    val byOld = IndexBuilder.docTermPostings(
      hits.select(col("doc_ord"), col("__old_text").as(textCol)), analyzer, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // state generations localCheckpoint (materialize + truncate lineage),
    // not persist — see the matching note in addBatch
    val tombstones2 = tombstones.unionByName(remOrds).distinct()
      .localCheckpoint()
    val deltaDocs2 = deltaDocs
      .join(broadcast(remOrds), Seq("doc_ord"), "left_anti")
      .localCheckpoint()
    val deltaStats2 = deltaStats
      .join(broadcast(remOrds), Seq("doc_ord"), "left_anti")
      .localCheckpoint()
    val deltaPostings2 = deltaPostings
      .join(broadcast(remOrds), Seq("doc_ord"), "left_anti")
      .localCheckpoint()
    val decs = byOld.groupBy(col("term"))
      .agg((count(lit(1)) * lit(-1L)).as("df_d"),
        (sum(col("tf")).cast("long") * lit(-1L)).as("cf_d"))
    val dictAdj2 = dictAdj.unionByName(decs)
      .groupBy(col("term"))
      .agg(sum(col("df_d")).as("df_d"), sum(col("cf_d")).as("cf_d"))
      .filter(col("df_d") =!= 0 || col("cf_d") =!= 0)
      .localCheckpoint()
    val removedKeys2 = removedKeys
      .unionByName(hits.select("conv_id", "turn_idx", "doc_ord"))
      .localCheckpoint()
    val removedTokens = byOld.groupBy(col("doc_ord")).agg(max(col("dl")).as("dl"))
      .agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)

    deltaDocsRows = deltaDocs2.count()
    val old = Seq(deltaDocs, deltaStats, deltaPostings, dictAdj, tombstones, removedKeys)
    deltaDocs = deltaDocs2; deltaStats = deltaStats2; deltaPostings = deltaPostings2
    dictAdj = dictAdj2; tombstones = tombstones2; removedKeys = removedKeys2
    nDelta -= removedCount
    tokensDelta -= removedTokens
    removedBuffered += removedCount
    bufferedDocs += removedCount
    old.foreach(_.unpersist())
    Seq(hits, byOld, keyed).foreach(_.unpersist())

    if (bufferedDocs >= flushThreshold) flush()
  }

  /** Fold one (micro-)batch of turns into the delta. Turns whose
    * (conv_id, turn_idx) already exists replace the old version (keeping
    * its doc_ord); new turns get fresh dense ordinals. */
  def addBatch(turns: DataFrame): Unit = synchronized {
    if (turns.isEmpty) return
    // the batch must carry EVERY docs column (not just key + text): the
    // delta frames union with the base docs view, and a storage-backed
    // flush stages complete replacement rows for the touched d_buckets —
    // passthrough columns (role, tool, ts, ...) included
    val docCols = docsOf(base).columns.filterNot(_ == "doc_ord").toSeq
    require(docCols.forall(turns.columns.contains),
      s"batch must carry the docs columns (${docCols.mkString(",")}) " +
        s"but has (${turns.columns.mkString(",")})")
    val keyed = turns.select(docCols.map(col): _*)
      .dropDuplicates("conv_id", "turn_idx")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val batchSize = keyed.count()
    if (batchSize == 0) { keyed.unpersist(); return }

    val (hits, hitsCleanup) = resolveExisting(keyed.select("conv_id", "turn_idx"))
    val existing = keyed.join(broadcast(hits), Seq("conv_id", "turn_idx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    existing.count()
    hitsCleanup()
    // keys removed earlier this epoch re-enter with their stable ordinal
    // and NO old-text decrement (the removal already decremented that
    // version's terms)
    val revived = keyed.join(broadcast(removedKeys), Seq("conv_id", "turn_idx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val revivedCount = revived.count()
    val fresh0 = keyed
      .join(existing.select("conv_id", "turn_idx"), Seq("conv_id", "turn_idx"), "left_anti")
      .join(revived.select("conv_id", "turn_idx"), Seq("conv_id", "turn_idx"), "left_anti")
    val (freshOrd, freshCleanup) =
      Ids.withDenseOrdinalHandle(fresh0, "doc_ord0", Seq("conv_id", "turn_idx"))
    val fresh = freshOrd.withColumn("doc_ord", col("doc_ord0") + lit(nextOrd)).drop("doc_ord0")
    val batchDocs = existing.select((col("doc_ord") +: docCols.map(col)): _*)
      .unionByName(revived.select((col("doc_ord") +: docCols.map(col)): _*))
      .unionByName(fresh.select((col("doc_ord") +: docCols.map(col)): _*))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freshCount = batchDocs.count() - existing.count() - revivedCount
    nextOrd += freshCount
    freshCleanup()

    // -- analysis: new content, and the replaced docs' OLD content (for
    // exact df/cf decrements) — both O(batch)
    val newPost = IndexBuilder.docTermPostings(batchDocs, analyzer, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val oldPost = IndexBuilder.docTermPostings(
      existing.select(col("doc_ord"), col("__old_text").as(textCol)), analyzer, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // -- term ids: known from base/minted, new ones minted above the max
    val batchTerms = newPost.select("term").distinct()
    val known = base.termDict.select("term_id", "term")
      .unionByName(mintedTerms)
      .join(broadcast(batchTerms), Seq("term"), "left_semi")
      .select("term_id", "term")
    val newTerms = batchTerms.join(known, Seq("term"), "left_anti")
    val (newMintedRaw, mintCleanup) =
      Ids.withDenseOrdinalCounted(newTerms, "term_id0", Seq("term"),
        assumeUnsorted = true) match { case (d0, _, c0) => (d0, c0) }
    val newMinted = newMintedRaw
      .select((col("term_id0") + lit(nextTermId)).as("term_id"), col("term"))
    // STATE frames (mintedTerms2 and every *2 generation below) are cut
    // over with an EAGER localCheckpoint, not persist: a cached frame keeps
    // its full logical plan, and since each micro-batch's state references
    // the previous generation (and, through key resolution, the live view),
    // plans would compound across batches — a multi-hour stream slowly
    // chokes the driver on analysis/explain of ever-deeper trees. The
    // checkpoint materializes the rows AND truncates lineage to a leaf.
    val mintedTerms2 = mintedTerms.unionByName(newMinted).localCheckpoint()
    // materialized BEFORE releasing the mint handle: the minted ids are only
    // stable while the handle's pinned partitioning lives
    val mintedCount2 = mintedTerms2.count()
    nextTermId += mintedCount2 - mintedTerms.count()
    mintCleanup()
    // ids for every batch term, all read from cached/base frames
    val idByTerm = known
      .unionByName(mintedTerms2.join(broadcast(batchTerms), Seq("term"), "left_semi"))
      .dropDuplicates("term")

    // -- delta frame updates (replaced ords leave the delta; tombstones
    // only ever filter BASE tables)
    val replacedOrds = existing.select("doc_ord")
    val tombstones2 = tombstones.unionByName(replacedOrds).distinct()
      .localCheckpoint()
    val deltaDocs2 = deltaDocs
      .join(broadcast(replacedOrds), Seq("doc_ord"), "left_anti")
      .unionByName(batchDocs.select(deltaDocs.columns.map(col): _*))
      .localCheckpoint()
    val newStats = newPost.groupBy(col("doc_ord"))
      .agg(max(col("dl")).cast("int").as("token_count"))
    val deltaStats2 = deltaStats
      .join(broadcast(replacedOrds), Seq("doc_ord"), "left_anti")
      .unionByName(newStats)
      .localCheckpoint()
    val deltaPostings2 = deltaPostings
      .join(broadcast(replacedOrds), Seq("doc_ord"), "left_anti")
      .unionByName(newPost.join(broadcast(idByTerm), "term")
        .select(deltaPostings.columns.map(col): _*))
      .localCheckpoint()

    // -- dictionary adjustments: adds from new postings, removes from the
    // replaced versions — batch-sized aggregates merged into the running adj
    val incs = newPost.groupBy(col("term"))
      .agg(count(lit(1)).as("df_i"), sum(col("tf")).cast("long").as("cf_i"))
    val decs = oldPost.groupBy(col("term"))
      .agg(count(lit(1)).as("df_x"), sum(col("tf")).cast("long").as("cf_x"))
    val batchAdj = incs.join(decs, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_i"), lit(0L)) - coalesce(col("df_x"), lit(0L))).as("df_d"),
        (coalesce(col("cf_i"), lit(0L)) - coalesce(col("cf_x"), lit(0L))).as("cf_d"))
    val dictAdj2 = dictAdj.unionByName(batchAdj)
      .groupBy(col("term"))
      .agg(sum(col("df_d")).as("df_d"), sum(col("cf_d")).as("cf_d"))
      .filter(col("df_d") =!= 0 || col("cf_d") =!= 0)
      .localCheckpoint()

    // -- exact global stats by integer delta
    val addedTokens = newStats
      .agg(coalesce(sum(col("token_count").cast("long")), lit(0L))).head().getLong(0)
    val removedTokens = oldPost.groupBy(col("doc_ord")).agg(max(col("dl")).as("dl"))
      .agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)

    // revived keys are live again — they leave the removal ledger
    val removedKeys2 =
      if (revivedCount == 0) removedKeys // unchanged: keep the cached frame
      else removedKeys.join(broadcast(revived.select("conv_id", "turn_idx")),
        Seq("conv_id", "turn_idx"), "left_anti").localCheckpoint()

    // -- swap in the new (already-materialized) generation, retire the old
    deltaDocsRows = deltaDocs2.count()
    val old = Seq(deltaDocs, deltaStats, deltaPostings, mintedTerms, dictAdj,
      tombstones) ++ (if (revivedCount > 0) Seq(removedKeys) else Nil)
    deltaDocs = deltaDocs2; deltaStats = deltaStats2; deltaPostings = deltaPostings2
    mintedTerms = mintedTerms2; dictAdj = dictAdj2; tombstones = tombstones2
    removedKeys = removedKeys2
    nDelta += freshCount + revivedCount
    removedBuffered -= revivedCount
    tokensDelta += addedTokens - removedTokens
    bufferedDocs += batchSize
    old.foreach(_.unpersist())
    Seq(newPost, oldPost, existing, revived, batchDocs, keyed).foreach(_.unpersist())

    if (bufferedDocs >= flushThreshold) flush()
  }

  /** Fold the delta into a new base (the reference's threshold merge,
    * `indexer.go:38-60`), amortized over `flushThreshold` buffered docs.
    * Storage-backed: the buffered docs' FINAL content goes through
    * `ParquetIndexStorage.addDocuments` (staged + dynamic overwrite of
    * touched partitions only) and the indexer rebases on the committed
    * layout. In-memory: materialize the assembled view. Both reset the
    * delta state and the cached-plan lineage. */
  def flush(): Unit = flush(None)

  /** As [[flush()]], with a caller-chosen batch id (CLI/orchestrator runs
    * that need cross-process idempotence: re-flushing an already-APPLIED id
    * is a no-op at the storage layer, so re-running the same job twice
    * cannot double-apply). Auto ids (None) probe past claimed stream
    * epochs instead. */
  def flush(explicitBatchId: Option[String]): Unit = synchronized {
    if (bufferedDocs == 0) return
    val oldBase = base
    val oldDelta = Seq(deltaDocs, deltaStats, deltaPostings, mintedTerms, dictAdj,
      tombstones, removedKeys)
    storagePath match {
      case Some(path) =>
        val nowMf = graft.storage.ManifestIO
          .read(s"$path/manifest.json", classOf[graft.storage.IndexManifest])
          .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
        require(compactCount(nowMf) == attachedCompactCount,
          s"index at $path was compacted while this StreamingIndexer was " +
            "attached: its buffered ordinals refer to the pre-compaction " +
            "space and flushing them would alias other documents — discard " +
            "this indexer and re-attach with StreamingIndexer.overStorage")
        // restart-safe batch id: the epoch counter restarts at 0 with the
        // process, and addDocuments is idempotent PER id — reusing a
        // claimed id would silently swallow this flush's buffered docs
        // (applied: marker hit, no-op; staged: the OLD session's staged
        // content gets applied instead of this frame) while the delta
        // state reset below discards them. Probe past every claimed
        // stream epoch before staging (the removal twin `<id>_rm` too).
        val id = explicitBatchId.getOrElse {
          flushEpoch = graft.storage.ParquetIndexStorage.nextFreeEpoch(flushEpoch)(e =>
            graft.storage.ParquetIndexStorage.deltaClaimed(path, s"stream_$e") ||
              graft.storage.ParquetIndexStorage.deltaClaimed(path, s"stream_${e}_rm"))
          val s = s"stream_$flushEpoch"; flushEpoch += 1; s
        }
        // removals first: their ordinals are disjoint from deltaDocs' by
        // construction (a revived key leaves the removal ledger), so the
        // two staged deltas commute — but removing first keeps the
        // intermediate committed state smallest
        if (removedBuffered > 0)
          graft.storage.ParquetIndexStorage.removeDocuments(
            spark, path, removedKeys.select("doc_ord"), batchId = s"${id}_rm")
        // deltaDocs holds exactly one row per buffered key — its final
        // content (in-delta replacements were folded by addBatch)
        if (deltaDocsRows > 0)
          graft.storage.ParquetIndexStorage.addDocuments(
            spark, path, deltaDocs, analyzer, batchId = id, textCol)
        base = graft.storage.ParquetIndexStorage.read(spark, path).index
        baseTokens = base.exactTotalTokens
        // storage minted its own ids for the flushed batch's new terms —
        // realign the counter with the committed dictionary
        nextTermId = base.termDict
          .agg(coalesce(max(col("term_id")), lit(-1L))).head().getLong(0) + 1
      case None =>
        val compacted = index.cache()
        compacted.postings.count(); compacted.docStats.count()
        compacted.termDict.count(); compacted.docs.count()
        base = compacted
        baseTokens = compacted.totalTokens
    }
    tombstones = emptyOrds()
    deltaDocs = docsOf(base).limit(0).cache()
    deltaStats = statsOf(base).limit(0).cache()
    deltaPostings = postingsOf(base).limit(0).cache()
    mintedTerms = Seq.empty[(Long, String)].toDF("term_id", "term").cache()
    dictAdj = Seq.empty[(String, Long, Long)].toDF("term", "df_d", "cf_d").cache()
    // fresh leaf plan over the NEW base, not limit(0) over the old frame —
    // that would stack one plan node per flush (the growth this class's
    // localCheckpoints exist to prevent)
    removedKeys = emptyRemovedKeys(base)
    nDelta = 0L; tokensDelta = 0L; bufferedDocs = 0L
    removedBuffered = 0L; deltaDocsRows = 0L
    oldDelta.foreach(_.unpersist())
    if ((oldBase ne initial) && storagePath.isEmpty) oldBase.unpersist()
  }

  /** Attach to a streaming Dataset of turns; caller starts/stops the query. */
  def writer(turns: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    turns.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => addBatch(batch) }

  def start(turns: DataFrame, trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    writer(turns).trigger(trigger).start()
}

object StreamingIndexer {
  /** Streaming maintenance OVER a committed persisted index: micro-batches
    * buffer in memory, threshold flushes go through the storage layer's
    * staged dynamic-partition-overwrite delta. */
  def overStorage(spark: SparkSession, path: String, analyzer: Analyzer,
      textCol: String = "text", flushThreshold: Long = 100000L): StreamingIndexer =
    new StreamingIndexer(
      graft.storage.ParquetIndexStorage.read(spark, path).index,
      analyzer, textCol, flushThreshold, Some(path))
}
