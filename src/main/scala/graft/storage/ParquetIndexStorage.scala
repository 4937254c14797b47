package graft.storage

import graft.analysis.Analyzer
import graft.index.{BlockParams, PostingBlockRow, PostingBlocks, TextIndex}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, resumable index build over partitioned Parquet with
  * Iceberg-style manifest + commit markers (SURVEY.md §2.6, north_rule).
  *
  * Layout under `path/`:
  * {{{
  *   docs/                          doc_ord + passthrough columns + text
  *   doc_stats/                     doc_ord, token_count
  *   _stage/raw/t_bucket=N/         (term, doc_ord, positions, tf) checkpoint
  *   term_dict/                     term_id, term, df, cf, t_bucket
  *   postings/t_bucket=N/           term_id, doc_ord, positions, tf
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
  *   semantics dislike concurrent committers on one table root. */
final case class StorageParams(
    termBuckets: Int = 64,
    writeGroups: Int = 8,
    saltFactor: Int = 8,
    blockParams: BlockParams = BlockParams(),
    groupParallelism: Int = 8
)

final case class PersistedIndex(
    index: TextIndex,
    blocks: Dataset[PostingBlockRow],
    manifest: IndexManifest
)

/** Thrown by tests via `failAfter` to simulate a crashed build. */
final class InjectedFailure(stage: String)
  extends RuntimeException(s"injected failure after stage $stage")

object ParquetIndexStorage {

  private def marker(path: String, stage: String) = s"$path/_markers/$stage.json"

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
    val lineage = Map(
      "source" -> sourceDesc,
      "analyzer" -> analyzer.describe,
      "termBuckets" -> p.termBuckets.toString,
      "blockSize" -> p.blockParams.blockSize.toString,
      "bucketSpan" -> p.blockParams.bucketSpan.toString
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

    // ---- stage: docs ------------------------------------------------------
    val docsMarker = runStage("docs") {
      docs.write.mode("overwrite").parquet(s"$path/docs")
      StageMarker("docs", spark.read.parquet(s"$path/docs").count(), 0, lineage)
    }
    val numDocs = docsMarker.rows

    // ---- stage: raw postings checkpoint (analysis runs HERE, once) ------
    runStage("raw") {
      // fused analyze+group mapPartitions pass (see
      // IndexBuilder.docTermPostings) — no shuffle, no ObjectHashAggregate
      val byTermDoc = graft.index.IndexBuilder
        .docTermPostings(spark.read.parquet(s"$path/docs"), analyzer, textCol)
        .withColumn("t_bucket", pmod(xxhash64(col("term")), lit(p.termBuckets)).cast("int"))
      byTermDoc
        .repartition(col("t_bucket"), pmod(col("doc_ord"), lit(p.saltFactor)))
        .write.mode("overwrite").partitionBy("t_bucket").parquet(s"$path/_stage/raw")
      StageMarker("raw", -1, 0, lineage)
    }

    // ---- stage: doc stats (token_count = Σ tf from the raw checkpoint) ----
    val statsMarker = runStage("stats") {
      spark.read.parquet(s"$path/_stage/raw")
        .groupBy(col("doc_ord"))
        .agg(sum(col("tf")).cast("int").as("token_count"))
        .write.mode("overwrite").parquet(s"$path/doc_stats")
      val tokens = spark.read.parquet(s"$path/doc_stats")
        .agg(coalesce(sum(col("token_count").cast("long")), lit(0L))).head().getLong(0)
      // exact sum/count division (not avg()): keeps avgdl — and with it all
      // BM25 scores — bit-identical across parallelism levels
      val avgdl0 = if (numDocs == 0) 0.0 else tokens.toDouble / numDocs
      StageMarker("stats", numDocs, 0,
        lineage ++ Map("avgdl" -> avgdl0.toString, "tokens" -> tokens.toString))
    }
    val avgdl = statsMarker.lineage("avgdl").toDouble

    // ---- stage: term dictionary -----------------------------------------
    runStage("dict") {
      val raw = spark.read.parquet(s"$path/_stage/raw")
      val termStats = raw.groupBy(col("term"), col("t_bucket"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      val (withIds, cleanup) =
        graft.index.Ids.withDenseOrdinalHandle(termStats, "term_id", Seq("term"))
      withIds.select("term_id", "term", "df", "cf", "t_bucket")
        .write.mode("overwrite").parquet(s"$path/term_dict")
      cleanup()
      StageMarker("dict", spark.read.parquet(s"$path/term_dict").count(), 0, lineage)
    }

    // ---- stage: final postings, in resumable bucket groups ---------------
    // groups run as CONCURRENT Spark jobs (disjoint t_bucket partition
    // sets; each commits its own marker) — serial groups leave the cluster
    // idle between jobs, and wall time here is max(group), not sum
    val groups = 0 until p.writeGroups
    def runGroup(g: Int): StageMarker =
      runStage(s"postings_g$g") {
        val buckets = (0 until p.termBuckets).filter(_ % p.writeGroups == g)
        val raw = spark.read.parquet(s"$path/_stage/raw")
          .filter(col("t_bucket").isin(buckets: _*))
        val dict = spark.read.parquet(s"$path/term_dict")
          .filter(col("t_bucket").isin(buckets: _*))
          .select("term", "term_id")
        val fin = raw.join(dict, "term")
          .select("term_id", "doc_ord", "positions", "tf", "dl", "t_bucket")
        // per-write dynamic overwrite (NOT a session-conf mutation, which
        // would silently change overwrite semantics for the caller's other
        // partitioned writes): each group owns a disjoint t_bucket set, so
        // a retried group replaces only its own partitions — with the
        // default static mode this write would wipe the other groups' work
        fin.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("t_bucket").parquet(s"$path/postings")
        val metrics = spark.read.parquet(s"$path/postings")
          .filter(col("t_bucket").isin(buckets: _*))
          .groupBy(col("t_bucket"))
          .agg(count(lit(1)).as("postings"), sum(col("tf")).as("tokens"),
            approx_count_distinct(col("term_id")).as("terms"))
          .collect()
          .map(r => BucketMetrics(r.getInt(0), r.getLong(3), r.getLong(1), r.getLong(2), 0))
        StageMarker(s"postings_g$g", metrics.map(_.postings).sum, 0, lineage, metrics.toSeq)
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
      PostingBlocks.buildFrom(postings, docStats, avgdl, p.blockParams)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/blocks")
      StageMarker("blocks", spark.read.parquet(s"$path/blocks").count(), 0, lineage)
    }

    val mf = IndexManifest(2, sourceDesc, analyzer.describe, numDocs, avgdl,
      p.termBuckets, p.blockParams.blockSize, p.blockParams.bucketSpan, stages.toSeq,
      k1 = p.blockParams.k1, b = p.blockParams.b)
    ManifestIO.write(s"$path/manifest.json", mf)
    mf
  }

  def read(spark: SparkSession, path: String): PersistedIndex = {
    import spark.implicits._
    val mf = ManifestIO.read(s"$path/manifest.json", classOf[IndexManifest])
      .getOrElse(throw new IllegalStateException(s"no committed index at $path"))
    val index = TextIndex(
      docs = spark.read.parquet(s"$path/docs"),
      docStats = spark.read.parquet(s"$path/doc_stats"),
      termDict = spark.read.parquet(s"$path/term_dict"),
      postings = spark.read.parquet(s"$path/postings"),
      numDocs = mf.numDocs,
      avgDocLen = mf.avgDocLen,
      termBuckets = mf.termBuckets
    )
    // partition column comes back as int — restore the case-class schema
    val blocks = spark.read.parquet(s"$path/blocks")
      .select(col("term_id"), col("bucket").cast("long"), col("min_doc"),
        col("max_doc"), col("n"), col("max_q"), col("docs"), col("tfs"), col("dls"))
      .as[PostingBlockRow]
    PersistedIndex(index, blocks, mf)
  }
}
