package graft.bench

import graft.analysis.Analyzer
import graft.index.BlockParams
import graft.query.{BlockMaxWand, Searcher}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: break the per-query latency floor on the 135k-turn WAND
  * demo corpus into its parts (dictionary resolve job, WAND core, docs
  * join, exhaustive core), with and without cached block/posting tables,
  * to target the serving-mode work.
  */
object SynLatencyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("syn-latency-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalTmp.dir("graft_probe_local_"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val analyzer = Analyzer.standard()

    val turns = graft.fixtures.SyntheticTranscripts.df(spark,
      graft.fixtures.SyntheticTranscripts.Params(
        seed = 42L, nConvs = 30000, maxTurnsPerConv = 8, vocabSize = 20000,
        minLen = 5, maxLen = 200, partitions = cpus.toInt * 2))
    val synPath = graft.LocalTmp.dir("graft_probe_wand_") + "/index"
    val (withOrd, ordCleanup) = graft.index.Ids.withDenseOrdinalHandle(
      turns.select("conv_id", "turn_idx", "text"), "doc_ord",
      Seq("conv_id", "turn_idx"))
    graft.storage.ParquetIndexStorage.build(withOrd, analyzer, synPath,
      graft.storage.StorageParams(
        blockParams = BlockParams(blockSize = 64, bucketSpan = 16384)),
      sourceDesc = "probe")
    ordCleanup()
    val searcher = Searcher(graft.storage.ParquetIndexStorage.read(spark, synPath), analyzer)

    val wandQueries = Seq(
      "hot0 t005000", "hot1 t009999 t003333", "t000002 t012345", "hot2 t007777 t001111",
      "hot0 t002000", "hot1 t001500 t001501", "t000002 t002500", "hot2 t001800 t002200")

    def t[A](name: String, k: Int = 3)(body: => A): Unit = {
      var best = Double.MaxValue
      for (_ <- 0 until k) {
        val t0 = System.nanoTime(); body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-34s ${best}%.3f s  (${best / wandQueries.size}%.3f s/q)")
    }
    def t1[A](name: String, k: Int = 3)(body: => A): Unit = {
      var best = Double.MaxValue
      for (_ <- 0 until k) {
        val t0 = System.nanoTime(); body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-34s ${best}%.3f s")
    }

    // warm
    searcher.bm25TopK("hot0", 3).collect()
    searcher.bm25TopKWand("hot0", 3).collect()

    t("resolve only")(wandQueries.foreach(q => searcher.resolve(analyzer.terms(q).distinct)))
    t("wand core (no docs join)")(wandQueries.foreach { q =>
      val rts = searcher.resolve(analyzer.terms(q).distinct)
      val weights = rts.map(rt => rt.termId -> searcher.bm25Idf(rt.df)).toMap
      BlockMaxWand.topK(searcher.blocks, weights, 10, searcher.blockParams,
        searcher.index.avgDocLen).collect()
    })
    t("wand full (join docs)")(wandQueries.foreach(q => searcher.bm25TopKWand(q, 10).collect()))
    t("exhaustive core (no docs join)")(wandQueries.foreach { q =>
      searcher.bm25Scores(q).orderBy(desc("score"), asc("doc_ord")).limit(10).collect()
    })
    t("exhaustive full")(wandQueries.foreach(q => searcher.bm25TopK(q, 10).collect()))

    println("--- cached blocks + postings + docs ---")
    searcher.blocks.cache().count()
    searcher.index.postings.cache().count()
    searcher.index.docs.cache().count()
    searcher.index.termDict.cache().count()
    t("resolve only (dict cached)")(wandQueries.foreach(q => searcher.resolve(analyzer.terms(q).distinct)))
    t("wand core cached")(wandQueries.foreach { q =>
      val rts = searcher.resolve(analyzer.terms(q).distinct)
      val weights = rts.map(rt => rt.termId -> searcher.bm25Idf(rt.df)).toMap
      BlockMaxWand.topK(searcher.blocks, weights, 10, searcher.blockParams,
        searcher.index.avgDocLen).collect()
    })
    t("wand full cached")(wandQueries.foreach(q => searcher.bm25TopKWand(q, 10).collect()))
    t("exhaustive full cached")(wandQueries.foreach(q => searcher.bm25TopK(q, 10).collect()))

    // driver-side dict: how much does killing the resolve job save?
    val dictMap = searcher.index.termDict.select("term", "term_id", "df", "cf", "t_bucket")
      .collect().map(r => r.getString(0) ->
        graft.query.ResolvedTerm(r.getString(0), r.getLong(1), r.getLong(2), r.getInt(4), r.getLong(3))).toMap
    t("wand core, driver dict")(wandQueries.foreach { q =>
      val rts = analyzer.terms(q).distinct.flatMap(dictMap.get)
      val weights = rts.map(rt => rt.termId -> searcher.bm25Idf(rt.df)).toMap
      BlockMaxWand.topK(searcher.blocks, weights, 10, searcher.blockParams,
        searcher.index.avgDocLen).collect()
    })
    // AQE off for the wand plan?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("wand core, driver dict, no AQE")(wandQueries.foreach { q =>
      val rts = analyzer.terms(q).distinct.flatMap(dictMap.get)
      val weights = rts.map(rt => rt.termId -> searcher.bm25Idf(rt.df)).toMap
      BlockMaxWand.topK(searcher.blocks, weights, 10, searcher.blockParams,
        searcher.index.avgDocLen).collect()
    })
    t("exhaustive full, no AQE")(wandQueries.foreach(q => searcher.bm25TopK(q, 10).collect()))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
