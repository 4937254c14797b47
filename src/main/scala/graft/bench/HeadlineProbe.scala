package graft.bench

import graft.analysis.Analyzer
import graft.index.BlockParams
import graft.ops.{Dedup, Multimodal, Similarity, TextStats}
import graft.query.{And, Or, Searcher}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query decomposition of the Bench headline block: wall time, Spark
  * job/stage/task counts (the fixed-cost drivers at sf0.1 where 500-doc
  * data work is negligible). Guide §1: measure first. Not part of the
  * benchmark surface.
  */
object HeadlineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-headline-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalTmp.dir("graft_probe_local_"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobDurations = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        jobStartNs.put(js.jobId, System.nanoTime())
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStartNs.remove(je.jobId)
        if (t0 != 0L)
          jobDurations.add((je.jobId, (System.nanoTime() - t0) / 1e9, ""))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val analyzer = Analyzer.standard()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("doc_ord", col("doc_id"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.count(); emb.count()

    def probe(name: String, warm: Int = 1)(body: => Any): Unit = {
      (0 until warm).foreach(_ => body) // warm codegen/broadcast caches
      Thread.sleep(100)                 // let listener events drain
      jobs = 0; stages = 0; tasks = 0; jobDurations.clear()
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val jd = jobDurations.asScala.toSeq.sortBy(_._1)
        .map(j => f"${j._2}%.3f").mkString(",")
      println(f"PROBE $name%-24s ${dt}%7.3f s  jobs=$jobs%-3d stages=$stages%-3d tasks=$tasks%-4d [$jd]")
    }

    // ---- index build (fresh dir each run; probe the second to have warm JVM)
    var searcher: Searcher = null
    probe("index_build", warm = 1) {
      val path = graft.LocalTmp.dir("graft_probe_idx_") + "/index"
      graft.storage.ParquetIndexStorage.build(docs, analyzer, path,
        graft.storage.StorageParams(termBuckets = 16, writeGroups = 4,
          blockParams = BlockParams(blockSize = 128, bucketSpan = 4096)),
        sourceDesc = sfDir)
      searcher = Searcher(graft.storage.ParquetIndexStorage.read(spark, path), analyzer)
    }

    probe("q_match_and")(searcher.matchQuery("spark join", And).count())
    probe("q_match_or")(searcher.matchQuery("vector window", Or).count())
    probe("q_phrase")(searcher.phraseQuery("batch batch").count())
    probe("q_tfidf")(searcher.matchQueryRanked("spark join", Or).count())
    probe("q_bm25_exhaustive")(searcher.bm25TopK("spark join table", 10).collect())
    probe("q_bm25_wand")(searcher.bm25TopKWand("spark join table", 10).collect())
    probe("q_bool_tree")(searcher.boolQuery(
      (graft.query.BTerm("spark") && graft.query.BTerm("join")) ||
      (graft.query.BTerm("group") && !graft.query.BTerm("window"))).count())
    probe("q_fuzzy")(searcher.fuzzyQuery("sport", maxEdits = 2).count())
    probe("q_phrase_slop")(searcher.phraseQuery("sort merge", slop = 2).count())
    probe("q_collapse")(searcher.bm25TopKCollapse("spark join", "source", 10).collect())
    probe("q_dismax")(searcher.disMaxTopK(Seq("spark join", "vector window"), 10, 0.3).collect())
    probe("q_percolate")(graft.query.Percolator.matches(docs,
      (0 until 200).map(i => graft.query.Percolator.StoredQuery(i.toLong,
        if (i % 2 == 0) "spark join" else "vector window group",
        if (i % 3 == 0) And else Or)), analyzer).count())
    val fed = graft.query.Federation(
      (0 until 2).map(r => graft.index.IndexBuilder.build(
        docs.filter(col("doc_id") % 2 === r), analyzer).cache()),
      analyzer)
    probe("q_federated_bm25")(fed.bm25TopK("spark join table", 10).collect())
    probe("q_federated_batch")(fed.bm25TopKBatch(
      Seq("spark join", "vector window", "group data", "slow merge data",
        "sort merge", "spark join table", "batch stream", "hash filter"),
      10).collect())
    val hybQv = emb.filter(col("vec_id") === 7).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble).toSeq
    probe("q_hybrid_rrf")(graft.query.Hybrid.bm25VectorTopK(
      searcher, emb, "spark join", hybQv, k = 20, nPerSide = 100).collect())
    probe("op_dedup_exact")(Dedup.exact(docs).count())
    probe("op_dedup_minhash")(
      Dedup.minhashLshPairs(docs, threshold = 0.05, numHashes = 16, bands = 8).count())
    probe("op_dedup_simhash")(Dedup.simhashPairs(docs, maxHamming = 3).count())
    probe("op_text_quality")(TextStats.quality(docs).count())
    probe("op_mm_decode")(
      Multimodal.extractFeatures(Multimodal.withRealMedia(docs),
        new Multimodal.JdkMediaDecoder(12)).count())
    probe("op_ann_brute")(
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), 10).count())
    probe("op_ann_lsh")(
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20), 10, planes = 6, tables = 4).count())
    spark.stop()
  }
}
