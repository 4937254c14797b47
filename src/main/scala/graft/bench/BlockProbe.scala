package graft.bench

import graft.analysis.Analyzer
import graft.fixtures.SyntheticTranscripts
import graft.index.{BlockParams, Ids, IndexBuilder, PostingBlocks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of the WAND block-table stage (scaling analysis):
  * times the cache+join scan, the streaming pack, and the block cache write
  * separately at one parallelism level. Not part of the benchmark surface.
  */
object BlockProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_SCALING_CONVS", "180000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-blockprobe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val analyzer = Analyzer.standard()
    val turns = SyntheticTranscripts.df(spark, SyntheticTranscripts.Params(
      seed = 42L, nConvs = nConvs, maxTurnsPerConv = 8, vocabSize = 20000,
      minLen = 5, maxLen = 200, partitions = cpus * 2))
      .select("conv_id", "turn_idx", "text").cache()
    turns.count()
    val (docs, _) = Ids.withDenseOrdinalHandle(turns, "doc_ord", Seq("conv_id", "turn_idx"))
    val byTermDoc = IndexBuilder.docTermPostings(docs, analyzer, "text").persist()
    t("analyze+cache")(byTermDoc.count())
    val termStats = byTermDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        max(col("term_h")).as("term_h"))
    val (td, _, _) = Ids.withDenseOrdinalCounted(termStats, "term_id", Seq("term"),
      assumeUnsorted = true)
    val termDict = td.select("term_id", "term", "term_h").cache()
    t("dict")(termDict.count())
    // long-keyed probe (see IndexBuilder) — the string-keyed variant was
    // the measured floor this probe exists to decompose
    val postings = byTermDoc.join(broadcast(termDict.select("term_id", "term_h")), "term_h")
      .select("term_id", "doc_ord", "positions", "tf", "dl")
    val bp = BlockParams(blockSize = 128, bucketSpan = 16384)

    // A: scan + broadcast join only (no pack): count rows off the same toRdd
    val projected = postings.select(col("term_id"), col("doc_ord"),
      col("tf").cast("long").as("tf"), col("dl").cast("long").as("dl"))
    (1 to 2).foreach { i =>
      t(s"A$i scan+join toRdd")(projected.queryExecution.toRdd
        .mapPartitions { it => var c = 0L; while (it.hasNext) { it.next(); c += 1 }; Iterator(c) }
        .sum())
    }
    // B: full pack, materialized via rdd count (no Dataset cache write)
    (1 to 2).foreach { i =>
      t(s"B$i pack rdd-count") {
        val blk = PostingBlocks.buildFromDocPartitioned(postings, bp)
        blk.queryExecution.toRdd
          .mapPartitions { it => var c = 0L; while (it.hasNext) { it.next(); c += 1 }; Iterator(c) }
          .sum()
      }
    }
    // C: pack + cache write + count (the benchmark's shape)
    t("C pack+cache+count") {
      val blk = PostingBlocks.buildFromDocPartitioned(postings, bp).cache()
      blk.count()
    }
    spark.stop()
  }
}
