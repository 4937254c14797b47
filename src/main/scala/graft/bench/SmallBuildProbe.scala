package graft.bench

import graft.analysis.Analyzer
import graft.index.BlockParams
import graft.storage.{ParquetIndexStorage, StorageParams}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of the PERSISTED build at small (sf0.1) scale,
  * where fixed per-job costs dominate: prints per-stage marker durations
  * for repeated builds. Not part of the benchmark surface. */
object SmallBuildProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("doc_ord", col("doc_id"))
    docs.count()
    (1 to 3).foreach { i =>
      val path = graft.LocalTmp.dir("probe_idx_") + "/index"
      val t0 = System.nanoTime()
      val mf = ParquetIndexStorage.build(docs, Analyzer.standard(), path,
        StorageParams(termBuckets = 16, writeGroups = 4,
          blockParams = BlockParams(blockSize = 128, bucketSpan = 4096)), "probe")
      println(f"PROBE run$i total ${(System.nanoTime() - t0) / 1e9}%.2f s :: " +
        mf.stages.map(s => s"${s.stage}=${s.durationMs / 1000.0}").mkString(" "))
    }
    spark.stop()
  }
}
