package graft.bench

import graft.analysis.Analyzer
import graft.index.BlockParams
import graft.query.Searcher
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the BENCH_r03 `q_bm25_wand_warm` regression: times the
  * two headline WAND queries (plus permutations) against the same persisted
  * sf layout Bench builds, per-rep, to localize the 7x gap.
  */
object WandWarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("wand-warm-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalTmp.dir("graft_probe_local_"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val analyzer = Analyzer.standard()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("doc_ord", col("doc_id"))
    docs.count()

    val path = graft.LocalTmp.dir("graft_probe_idx_") + "/index"
    graft.storage.ParquetIndexStorage.build(docs, analyzer, path,
      graft.storage.StorageParams(termBuckets = 16, writeGroups = 4,
        blockParams = BlockParams(blockSize = 128, bucketSpan = 4096)),
      sourceDesc = sfDir)
    val searcher = Searcher(graft.storage.ParquetIndexStorage.read(spark, path), analyzer)

    def t[A](name: String)(body: => A): Unit = {
      for (i <- 0 until 4) {
        val t0 = System.nanoTime()
        body
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    // exact bench order
    t("q_bm25_exhaustive")(searcher.bm25TopK("spark join table", 10).collect())
    t("q_bm25_wand      ")(searcher.bm25TopKWand("spark join table", 10).collect())
    t("q_bm25_wand_warm ")(searcher.bm25TopKWand("slow merge data", 10).collect())
    t("wand_swap_1      ")(searcher.bm25TopKWand("slow merge data", 10).collect())
    t("wand_swap_2      ")(searcher.bm25TopKWand("spark join table", 10).collect())
    t("wand_other       ")(searcher.bm25TopKWand("group window fast", 10).collect())
    spark.stop()
  }
}
