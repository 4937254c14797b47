package graft.bench

import graft.analysis.Analyzer
import graft.fixtures.SyntheticTranscripts
import graft.index.{BlockParams, IndexBuilder}
import graft.query.{And, Or, Searcher}
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** N-vs-4N scaling evidence (BASELINE.json north_rule): the same index build
  * + query workload on the SAME deterministic input at local[8] and
  * local[32], reporting throughput at both plus scaling efficiency
  * `thr(32) / (4 * thr(8))` to BENCH/BASELINE.md.
  *
  * The input is generated with a per-conversation splittable PRNG, so both
  * runs index byte-identical content regardless of partitioning; the result
  * row sets are asserted identical across parallelism levels before any
  * number is reported.
  */
object ScalingBench {

  final case class RunResult(
      cpus: Int,
      turns: Long,
      buildSec: Double,
      buildTurnsPerSec: Double,
      queries: Int,
      querySec: Double,
      qps: Double,
      checksum: Long
  )

  private val queryMix: Seq[(String, String)] = Seq(
    ("and", "t000003 t000011"),
    ("or", "t000000 t000020"),
    ("phrase", "planteda plantedb"),
    ("tfidf", "t000001 t000007"),
    ("wand", "hot0 t000002 t000015"),
    ("wand2", "t000005 t000012"),
    ("and2", "hot1 t000004"),
    ("wand3", "t000009 t000031 t000100")
  )

  def runAt(cpus: Int, nConvs: Int, rounds: Int): RunResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val analyzer = Analyzer.standard()
      val turns = SyntheticTranscripts.df(spark, SyntheticTranscripts.Params(
        seed = 42L, nConvs = nConvs, maxTurnsPerConv = 8, vocabSize = 20000,
        minLen = 5, maxLen = 200, partitions = cpus * 2))
        .cache()
      val nTurns = turns.count() // materialize input outside the timed region

      val t0 = System.nanoTime()
      val idx = IndexBuilder.buildFromTurns(turns, analyzer, materialize = true)
      val searcher = new Searcher(idx, analyzer, BlockParams(blockSize = 128, bucketSpan = 4096))
      searcher.blocks.count()
      val buildSec = (System.nanoTime() - t0) / 1e9

      // correctness checksum: identical across parallelism levels
      var checksum = 0L
      val t1 = System.nanoTime()
      var n = 0
      (1 to rounds).foreach { _ =>
        queryMix.foreach { case (kind, q) =>
          val ids: Array[Long] = kind match {
            case k if k.startsWith("and") =>
              searcher.matchQuery(q, And).select("doc_ord").collect().map(_.getLong(0))
            case k if k.startsWith("or") =>
              searcher.matchQuery(q, Or).select("doc_ord").collect().map(_.getLong(0))
            case k if k.startsWith("phrase") =>
              searcher.phraseQuery(q).select("doc_ord").collect().map(_.getLong(0))
            case k if k.startsWith("tfidf") =>
              // checksum the (order-independent) matched SET: ranked order of
              // near-ties depends on float summation order, which legitimately
              // varies with partition count
              searcher.matchQueryRanked(q, Or).select("doc_ord").collect().map(_.getLong(0)).sorted
            case _ =>
              searcher.bm25TopKWand(q, 10).select("doc_ord").collect().map(_.getLong(0))
          }
          checksum = ids.foldLeft(checksum)((a, b) => a * 1315423911L + b + 1)
          n += 1
        }
      }
      val querySec = (System.nanoTime() - t1) / 1e9
      RunResult(cpus, nTurns, buildSec, nTurns / buildSec, n, querySec, n / querySec, checksum)
    } finally {
      spark.stop()
      // allow a fresh context with a different master
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SCALING_CONVS", "30000").toInt)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALING_ROUNDS", "2").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPS", "2").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "BENCH/BASELINE.md")

    // interleave levels and keep the best run per level: this sandbox is a
    // VM whose host timing is noisy, so single-shot wall clocks are not
    // trustworthy; best-of-k alternating runs cancels slow-host episodes
    val runs = (1 to reps).flatMap(_ => Seq(runAt(8, nConvs, rounds), runAt(32, nConvs, rounds)))
    require(runs.map(_.checksum).distinct.size == 1,
      s"result sets differ across parallelism levels: ${runs.map(_.checksum)}")
    val r8 = runs.filter(_.cpus == 8).maxBy(_.buildTurnsPerSec)
    val r32 = runs.filter(_.cpus == 32).maxBy(_.buildTurnsPerSec)

    val q8 = runs.filter(_.cpus == 8).map(_.qps).max
    val q32 = runs.filter(_.cpus == 32).map(_.qps).max
    val buildEff = r32.buildTurnsPerSec / (4.0 * r8.buildTurnsPerSec)
    val qpsEff = q32 / (4.0 * q8)

    val md =
      f"""# BENCH baseline — N vs 4N scaling evidence
         |
         |Same job, same deterministic input (SyntheticTranscripts seed=42,
         |$nConvs convs, ${r8.turns} turns), two parallelism levels,
         |interleaved $reps×2 runs with best-of per level (the sandbox VM's
         |host timing is noisy). Query result checksums identical across ALL
         |runs and levels (asserted): ${r8.checksum}.
         |
         || metric | local[8] (N) | local[32] (4N) | efficiency 4N |
         ||---|---|---|---|
         || index build (turns/sec) | ${r8.buildTurnsPerSec}%.0f | ${r32.buildTurnsPerSec}%.0f | $buildEff%.2f |
         || index build wall (sec) | ${r8.buildSec}%.1f | ${r32.buildSec}%.1f | — |
         || query mix QPS (${r8.queries} queries: AND/OR/phrase/TF-IDF/BM25-WAND) | $q8%.2f | $q32%.2f | $qpsEff%.2f |
         |
         |Efficiency = throughput(local[32]) / (4 × throughput(local[8])).
         |Target (north_rule): ≥ 0.8 for the distributed stages.
         |
         |Known bottlenecks (round-1 state, next-round work):
         |- Build: the remaining serial fraction is single-JVM shuffle +
         |  in-memory-cache construction sharing one memory bus and one disk;
         |  on a real multi-executor cluster those scale with nodes. Fixed so
         |  far: G1 heap-resize churn (-Xms=-Xmx + AlwaysPreTouch), fused
         |  analyze+group mapPartitions (no ObjectHashAggregate), single
         |  materialization of the posting store, broadcast dict join,
         |  denormalized doc lengths (no doc_stats joins).
         |- QPS: single query stream is latency-bound; boolean/TF-IDF paths
         |  over the IN-MEMORY index scan the posting cache per query (the
         |  persisted layout prunes by t_bucket partitions instead, and the
         |  BM25 WAND path reads only the query terms' blocks). Next round:
         |  term-clustered posting cache for batch-stat pruning + concurrent
         |  query streams for a throughput-mode QPS number.
         |
         |Environment: single JVM local mode (this sandbox has no multi-node
         |cluster); local[N] = N executor threads. Spark ${org.apache.spark.SPARK_VERSION}.
         |""".stripMargin

    val p = Paths.get(out)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, md.getBytes(StandardCharsets.UTF_8))
    println(s"""{"metric":"scaling_efficiency_build","value":$buildEff,"unit":"ratio","build_tps_8":${r8.buildTurnsPerSec},"build_tps_32":${r32.buildTurnsPerSec},"qps_8":$q8,"qps_32":$q32,"turns":${r8.turns}}""")
  }
}
