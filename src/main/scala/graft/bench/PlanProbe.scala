package graft.bench

import graft.analysis.Analyzer
import graft.query.{And, BPhrase, BTerm, Or, Searcher}
import graft.storage.{ParquetIndexStorage, StorageParams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-plan audit of the compound query surface over the PERSISTED
  * layout: counts parquet scans and exchanges and greps the pruning
  * evidence (t_bucket partition filters, broadcast joins) that the
  * DataFrame-level tests assert only structurally. Run on demand:
  * `sbt "runMain graft.bench.PlanProbe /root/testdata/sf0.001"`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-planprobe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val analyzer = Analyzer.standard()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("doc_ord", col("doc_id"))
    val path = graft.LocalTmp.dir("graft_planprobe_") + "/index"
    ParquetIndexStorage.build(docs, analyzer, path,
      StorageParams(termBuckets = 16, writeGroups = 4), sourceDesc = sfDir)
    val s = Searcher(ParquetIndexStorage.read(spark, path), analyzer)

    def audit(name: String, df: DataFrame): Unit = {
      df.count() // force AQE final plan
      val plan = df.queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val scans = lines.count(_.contains("Scan parquet"))
      val postingScans = lines.count(l =>
        l.contains("Scan parquet") && l.contains("positions"))
      val exchanges = lines.count(_.contains("Exchange"))
      val bcasts = lines.count(_.contains("BroadcastHashJoin"))
      val bucketPruned = lines.exists(l =>
        l.contains("PartitionFilters") && l.contains("t_bucket") &&
          !l.contains("PartitionFilters: []"))
      println(f"PLAN $name%-18s scans=$scans%2d postingScans=$postingScans " +
        f"exchanges=$exchanges bcastJoins=$bcasts tBucketPruned=$bucketPruned")
    }

    audit("match_and", s.matchQuery("spark join", And))
    audit("bool_tree", s.boolQuery(
      (BTerm("spark") && BTerm("join")) || (BTerm("group") && !BTerm("window"))))
    audit("bool_phrase", s.boolQuery(BPhrase("batch batch") && !BTerm("window")))
    audit("bool_ranked", s.boolQueryRanked(BTerm("spark join", Or) && !BTerm("window")))
    audit("facets", s.facetCounts("spark join", Or, "source"))
    audit("snippet", s.snippet("vector"))
    audit("mlt", s.moreLikeThis(42L, maxQueryTerms = 5, k = 100))
    audit("fuzzy", s.fuzzyQuery("sport", maxEdits = 2))
    // round-3 session additions: all stay single-pruned-scan; the slop path
    // must not add a scan or an exchange over the exact phrase plan
    audit("phrase_slop", s.phraseQuery("sort merge", slop = 2))
    audit("msm", s.matchQueryMsm("spark join vector", 2))
    audit("collapse", s.bm25TopKCollapse("spark join", "source", 10))
    audit("search_after", s.bm25TopKAfter("spark join", 10, 1.0, 0L))
    audit("dismax", s.disMaxTopK(Seq("spark join", "vector window"), 10, 0.3))
    audit("filtered", s.bm25TopKFiltered("spark join", col("lang") === "en", 10))
    audit("facet_hist", s.facetHistogram("spark join", Or, "n_chars", 200L))
    audit("phrase_slop_ord", s.phraseQuery("sort merge", slop = 2, inOrder = true))
    audit("qs_slop_fuzzy", s.queryString("\"sort merge\"~2 AND sport~2"))
    audit("funcscore", s.bm25TopKFunctionScore("spark join",
      log(col("n_chars").cast("double") + 1), 10))
    // sigterms is the documented exception: postings scan NOT term-pruned
    // (matched-set-proportional by design)
    audit("sigterms", s.significantTerms("spark join", And, 10, 2))
    // later round-3 additions
    audit("grouped", s.bm25TopKGrouped("spark join", "source", 10, "sum"))
    audit("sortby", s.matchTopKSortBy("spark join", And, "n_chars", 10))
    audit("cardinality", s.facetCardinality("spark join", Or, "source"))
    audit("facet_date", s.facetDateHistogram("spark join", Or,
      date_add(to_date(lit("2025-01-01")), (col("doc_id") % 400).cast("int"))
        .cast("timestamp"), "month"))
    // rescore phase two: window-restricted phrase + scoring aggregations
    audit("rescore", s.bm25TopKRescore("spark join", "join table",
      windowSize = 100, k = 10, rescoreWeight = 0.7))
    // phrase-prefix: one pruned scan for exact terms + expansion set
    audit("phrase_prefix", s.matchPhrasePrefix("the s"))
    // boosting: positive scoring scan + negative matched scan, doc-keyed join
    audit("boosting", s.bm25TopKBoosting("spark join", "window", 0.5, 10))

    // round-3 session-2 additions
    // LM-Dirichlet: same one-pruned-scan one-agg shape as bm25
    audit("lm_dirichlet", s.lmDirichletTopK("spark join", 10))
    // percentiles facet: matched-ordinal join + ONE aggregation
    audit("facet_pctl", s.facetPercentiles("spark join", Or, "n_chars", Seq(0.5, 0.9)))
    // context windows: hit keys resolved + broadcast — docs never shuffles
    audit("context", s.contextWindows(
      s.bm25TopK("spark join", 5).select("doc_ord"),
      "source", "n_chars", 2))
    // hybrid RRF: each side its own plan; fusion agg over <= 2n rank rows
    audit("hybrid_rrf", {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val qv = emb.filter(col("vec_id") === 7).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toSeq
      graft.query.Hybrid.bm25VectorTopK(s, emb, "spark join", qv, 10, nPerSide = 50)
    })

    // federation: per-slice plans must keep their slice-local t_bucket
    // pruning; the gather is a union of per-slice TakeOrdered cuts
    val fedDocs = (0 until 2).map(r => docs.filter(col("doc_id") % 2 === r))
    val fedPaths = fedDocs.zipWithIndex.map { case (d, i) =>
      val p = graft.LocalTmp.dir("graft_planprobe_fed_") + s"/slice$i"
      ParquetIndexStorage.build(d, analyzer, p,
        StorageParams(termBuckets = 8, writeGroups = 2), sourceDesc = s"$sfDir %2==$i")
      p
    }
    val fed = graft.query.Federation.ofPersisted(
      fedPaths.map(ParquetIndexStorage.read(spark, _)), analyzer)
    audit("fed_bm25_topk", fed.bm25TopK("spark join", 10))
    audit("fed_match_or", fed.matchQuery("spark join", Or))
    spark.stop()
  }
}
