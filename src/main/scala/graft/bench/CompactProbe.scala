package graft.bench

import graft.analysis.Analyzer
import graft.fixtures.SyntheticTranscripts
import graft.index.BlockParams
import graft.query.Searcher
import graft.storage.{ParquetIndexStorage, StorageParams}
import org.apache.spark.sql.SparkSession

/** One-off diagnosis of the r4 `q_bm25_wand_postcompact` anomaly (cold
  * queries 1.7× SLOWER from a 30%-smaller compacted store): compares the
  * physical layout (files per table, bytes, files per leaf directory) of
  * the block store before and after remove+compact, and times the same
  * cold query set against both — post-compact FIRST, pre-maintenance LAST,
  * so any page-cache bias favors the post store and a post-store slowdown
  * cannot be a cache artifact. Not part of the benchmark surface.
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_WAND_CONVS", "60000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-compactprobe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def storeStats(path: String): Unit = {
      val root = java.nio.file.Paths.get(path)
      val tables = java.nio.file.Files.list(root).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      val it = scala.jdk.CollectionConverters.IteratorHasAsScala(tables).asScala
      for (t <- it.toSeq.sortBy(_.getFileName.toString)
           if java.nio.file.Files.isDirectory(t) && !t.getFileName.toString.startsWith("_")) {
        var nFiles = 0L; var bytes = 0L
        val leaves = scala.collection.mutable.Map.empty[String, Int]
        java.nio.file.Files.walk(t).forEach { p =>
          val name = p.getFileName.toString
          if (name.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p)) {
            nFiles += 1; bytes += java.nio.file.Files.size(p)
            val leaf = t.relativize(p.getParent).toString
            leaves(leaf) = leaves.getOrElse(leaf, 0) + 1
          }
        }
        val nLeaves = math.max(1, leaves.size)
        val maxPerLeaf = if (leaves.isEmpty) 0 else leaves.values.max
        println(f"PROBE   ${t.getFileName.toString}%-12s files=$nFiles%6d  " +
          f"leaves=$nLeaves%5d  files/leaf avg=${nFiles.toDouble / nLeaves}%6.1f " +
          f"max=$maxPerLeaf%4d  MB=${bytes / 1e6}%9.1f")
      }
    }

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val analyzer = Analyzer.standard()
    val turns = SyntheticTranscripts.df(spark, SyntheticTranscripts.Params(
      seed = 42L, nConvs = nConvs, maxTurnsPerConv = 8, vocabSize = 20000,
      minLen = 5, maxLen = 200, partitions = cpus * 2))
      .select("conv_id", "turn_idx", "text")
    val base = graft.LocalTmp.dir("graft_compactprobe_")
    val synPath = s"$base/index"
    t("build") {
      val (withOrd, ordCleanup) = graft.index.Ids.withDenseOrdinalHandle(
        turns, "doc_ord", Seq("conv_id", "turn_idx"))
      ParquetIndexStorage.build(withOrd, analyzer, synPath,
        StorageParams(blockParams = BlockParams(blockSize = 64, bucketSpan = 16384)),
        sourceDesc = s"compactprobe($nConvs convs)")
      ordCleanup()
    }
    println("PROBE == store layout PRE-maintenance ==")
    storeStats(synPath)

    // snapshot the pre-maintenance store (maintenance mutates in place)
    val prePath = s"$base/index_pre"
    t("fs copy of pre store") {
      val src = java.nio.file.Paths.get(synPath)
      java.nio.file.Files.walk(src).forEach { p =>
        val dst = java.nio.file.Paths.get(prePath).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      }
    }

    val wandQueries = Seq(
      "hot0 t005000", "hot1 t009999 t003333", "t000002 t012345", "hot2 t007777 t001111",
      "hot0 t002000", "hot1 t001500 t001501", "t000002 t002500", "hot2 t001800 t002200")

    val nSyn = ParquetIndexStorage.read(spark, synPath).index.numDocs
    t("remove 30pct")(ParquetIndexStorage.removeDocuments(spark, synPath,
      spark.range((nSyn * 3) / 10).toDF("doc_ord"), "probe_rm"))
    println("PROBE == store layout POST-remove ==")
    storeStats(synPath)
    t("compact")(ParquetIndexStorage.compact(spark, synPath, "probe_c0"))
    println("PROBE == store layout POST-compact ==")
    storeStats(synPath)

    // cold sets: post-compact FIRST (any residual cache bias favors it,
    // since compact just wrote these files), pre-maintenance LAST
    def coldSet(name: String, path: String): Unit = {
      var best = Double.MaxValue
      for (_ <- 0 until reps) {
        spark.catalog.clearCache()
        val sc = Searcher(ParquetIndexStorage.read(spark, path), analyzer)
        val t0 = System.nanoTime()
        wandQueries.foreach(q => sc.bm25TopKWand(q, 10).collect())
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE cold8 $name%-24s best=$best%.2f s (of $reps)")
    }
    coldSet("post-compact", synPath)
    coldSet("pre-maintenance", prePath)
    spark.stop()
  }
}
