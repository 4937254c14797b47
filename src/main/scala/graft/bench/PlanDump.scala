package graft.bench

import graft.analysis.Analyzer
import graft.index.BlockParams
import graft.ops.{Dedup, Multimodal, Similarity, TextStats}
import graft.query.{And, Or, Searcher}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dumps `.explain("formatted")` for every headline query to the directory
  * given in SPARK_GRAFT_PLAN_DIR with the suffix SPARK_GRAFT_PLAN_TAG
  * (e.g. plans/r06 + _before / _after). Evidence tool for the optimization
  * round; not part of the benchmark surface. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r06")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "_before")
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalTmp.dir("graft_plan_local_"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val analyzer = Analyzer.standard()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("doc_ord", col("doc_id"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.count(); emb.count()

    val path = graft.LocalTmp.dir("graft_plan_idx_") + "/index"
    graft.storage.ParquetIndexStorage.build(docs, analyzer, path,
      graft.storage.StorageParams(termBuckets = 16, writeGroups = 4,
        blockParams = BlockParams(blockSize = 128, bucketSpan = 4096)),
      sourceDesc = sfDir)
    val searcher = Searcher(graft.storage.ParquetIndexStorage.read(spark, path), analyzer)

    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name$tag.txt"), plan)
      println(s"PLANDUMP $name -> $outDir/$name$tag.txt")
    }

    dump("q_match_and", searcher.matchQuery("spark join", And))
    dump("q_phrase", searcher.phraseQuery("batch batch"))
    dump("q_tfidf", searcher.matchQueryRanked("spark join", Or))
    dump("q_bm25_exhaustive", searcher.bm25TopK("spark join table", 10))
    dump("q_bm25_wand", searcher.bm25TopKWand("spark join table", 10))
    dump("q_bool_tree", searcher.boolQuery(
      (graft.query.BTerm("spark") && graft.query.BTerm("join")) ||
      (graft.query.BTerm("group") && !graft.query.BTerm("window"))))
    dump("q_fuzzy", searcher.fuzzyQuery("sport", maxEdits = 2))
    dump("q_collapse", searcher.bm25TopKCollapse("spark join", "source", 10))
    dump("q_dismax", searcher.disMaxTopK(Seq("spark join", "vector window"), 10, 0.3))
    dump("q_percolate", graft.query.Percolator.matches(docs,
      (0 until 200).map(i => graft.query.Percolator.StoredQuery(i.toLong,
        if (i % 2 == 0) "spark join" else "vector window group",
        if (i % 3 == 0) And else Or)), analyzer))
    val hybQv = emb.filter(col("vec_id") === 7).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble).toSeq
    dump("q_hybrid_rrf", graft.query.Hybrid.bm25VectorTopK(
      searcher, emb, "spark join", hybQv, k = 20, nPerSide = 100))
    dump("q_bm25_batch", searcher.bm25TopKBatch(
      Seq("spark join", "vector window", "group data", "slow merge data"), 10))
    dump("op_dedup_exact", Dedup.exact(docs))
    dump("op_dedup_minhash",
      Dedup.minhashLshPairs(docs, threshold = 0.05, numHashes = 16, bands = 8))
    dump("op_dedup_simhash", Dedup.simhashPairs(docs, maxHamming = 3))
    dump("op_text_quality", TextStats.quality(docs))
    dump("op_mm_decode",
      Multimodal.extractFeatures(Multimodal.withRealMedia(docs),
        new Multimodal.JdkMediaDecoder(12)))
    dump("op_ann_brute",
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), 10))
    dump("op_ann_lsh",
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20), 10, planes = 6, tables = 4))
    spark.stop()
  }
}
