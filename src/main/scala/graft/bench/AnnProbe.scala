package graft.bench

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of the ANN demo's IVF build cost (Bench's
  * `ann_ivf_build`): times the centroid collect, the argmax assignment
  * scan, and the cache materialization separately, at several nlist
  * values. Diagnoses whether the unrolled literal-centroid assignment
  * expression degrades super-linearly in nlist (codegen size limits /
  * repeated-subexpression evaluation). Not part of the benchmark surface.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_ANN_VECS", "60000").toInt
    val dim = 64
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-annprobe-$cpus")
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
    // exactly Bench's ann_demo corpus: 256 hash-centers + per-id noise
    val vecs = spark.range(nVecs).toDF("vec_id")
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           |  cast((pmod(xxhash64(pmod(vec_id, 256) * $dim + j), 2001) - 1000) / 1000.0
           |     + (pmod(xxhash64(vec_id * $dim + j + 999), 2001) - 1000) / 5000.0
           |   as float))""".stripMargin))
      .cache()
    t("corpus cache")(vecs.count())
    // does the per-plane VecDot unrolling hit the same interpreted cliff
    // at wide LSH configs? (planes × tables independent projections in one
    // projection node)
    for ((planes, tables) <- Seq((12, 4), (16, 8), (24, 8))) {
      t(s"lsh build planes=$planes tables=$tables") {
        val idx = Similarity.lshIndex(vecs, planes, tables)
        idx.buckets.select(sum(col("bucket"))).head()
      }
    }
    for (nlist <- Seq(8, 16, 32)) {
      val cents = t(s"centroids nlist=$nlist")(
        Similarity.ivfCentroids(vecs, nlist))
      val assigned = Similarity.ivfAssign(vecs, cents)
      t(s"assign count nlist=$nlist")(
        assigned.select(sum(col("cid"))).head())
      t(s"assign cache nlist=$nlist") {
        assigned.cache().count()
      }
      assigned.unpersist()
    }
    spark.stop()
  }
}
