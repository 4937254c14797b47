package graft

import graft.analysis.Analyzer
import graft.index.{BlockParams, IndexBuilder}
import graft.ops.{Dedup, Similarity, TextStats}
import graft.query.{And, Or, Searcher}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: staged measurement over SPARK_GRAFT_SF_DIR.
  * Prints exactly ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":"..."}
  *
  * Stages: full index build (analyze → postings/dict/stats + WAND blocks,
  * materialized), then the reference query surface (AND/OR/phrase/TF-IDF/
  * BM25 exhaustive/BM25 WAND) and the training-data ops, each timed
  * individually.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      results(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    val analyzer = Analyzer.standard()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("doc_ord", col("doc_id"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // ---- index build (incl. WAND block table), fully materialized --------
    val searcher = timed("index_build") {
      val idx = IndexBuilder.build(docs, analyzer, materialize = true)
      val s = new Searcher(idx, analyzer, BlockParams(blockSize = 128, bucketSpan = 4096))
      s.blocks.count()
      s
    }

    // ---- query surface ----------------------------------------------------
    timed("q_match_and")(searcher.matchQuery("spark join", And).count())
    timed("q_match_or")(searcher.matchQuery("vector window", Or).count())
    timed("q_phrase")(searcher.phraseQuery("batch batch").count())
    timed("q_tfidf")(searcher.matchQueryRanked("spark join", Or).count())
    timed("q_bm25_exhaustive")(searcher.bm25TopK("spark join table", 10).collect())
    timed("q_bm25_wand")(searcher.bm25TopKWand("spark join table", 10).collect())
    timed("q_bm25_wand_warm")(searcher.bm25TopKWand("slow merge data", 10).collect())

    // ---- training-data ops ------------------------------------------------
    timed("op_dedup_exact")(Dedup.exact(docs).count())
    timed("op_dedup_minhash")(
      Dedup.minhashLshPairs(docs, threshold = 0.05, numHashes = 16, bands = 8).count())
    timed("op_dedup_simhash")(Dedup.simhashPairs(docs, maxHamming = 10).count())
    timed("op_text_quality")(TextStats.quality(docs).count())
    timed("op_ann_brute")(
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), 10).count())
    timed("op_ann_lsh")(
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20), 10, planes = 6, tables = 4).count())

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
