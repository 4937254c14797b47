package graft.bench

import graft.analysis.Analyzer
import graft.fixtures.SyntheticTranscripts
import graft.index.{Ids, IndexBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of the term-dictionary stage at both parallelism
  * levels: where does its ~1.8 s parallelism-independent floor live —
  * the docs-cache build it overlaps, the posting-store groupBy, or the
  * fixed-latency small jobs (collect / dict-cache agg / broadcast build)?
  * Also times a fused single-collect alternative (dictionary assembled on
  * the driver as a LocalRelation). Not part of the benchmark surface. */
object DictProbe {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(180000)
    Seq(8, 32).foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"dict-probe-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val analyzer = Analyzer.standard()
        val turns = SyntheticTranscripts.df(spark, SyntheticTranscripts.Params(
          seed = 42L, nConvs = nConvs, maxTurnsPerConv = 8, vocabSize = 20000,
          minLen = 5, maxLen = 200, partitions = cpus * 2))
          .select("conv_id", "turn_idx", "text").cache()
        turns.count()
        def t[A](body: => A): (A, Double) = {
          val t0 = System.nanoTime(); val r = body
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val (docs, ordCleanup) =
          Ids.withDenseOrdinalHandle(turns, "doc_ord", Seq("conv_id", "turn_idx"))
        val byTermDoc = IndexBuilder.docTermPostings(docs, analyzer, "text").persist()
        byTermDoc.count()

        (1 to 2).foreach { rep =>
          // (a) docs cache build, alone
          val d = docs.cache()
          val (_, tDocsCache) = t(d.count())

          // (b) current path, decomposed. Mirrors timedBuild's dict stage
          // minus the concurrent d.count (timed above).
          val termStats = byTermDoc.groupBy(col("term"))
            .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
              max(col("term_h")).as("term_h"))
          val ((td, cnt, c), tIds) = t {
            Ids.withDenseOrdinalCounted(termStats, "term_id", Seq("term"),
              assumeUnsorted = true)
          }
          val (out, tOutCache) = t {
            val o = td.select("term_id", "term", "term_h", "df", "cf").cache()
            o.agg(coalesce(sum(col("cf").cast("long")), lit(0L)),
              (count(lit(1)) === countDistinct(col("term_h"))).as("ok")).head()
            o
          }
          c()

          // (c) broadcast-exchange build over the cached dict (what the
          // postings view pays on first materialization)
          val (_, tBcast) = t {
            byTermDoc.limit(1)
              .join(broadcast(out.select("term_id", "term_h")), "term_h")
              .count()
          }

          // (d) fused alternative: ONE collect job, dictionary assembled on
          // the driver, returned as a LocalRelation — the SHIPPED path
          // (IndexBuilder.localTermDict), called directly so the probe
          // cannot drift from what it claims to measure
          val (local, tFused) = t {
            IndexBuilder.localTermDict(termStats).get
          }
          val (_, tBcastLocal) = t {
            byTermDoc.limit(1)
              .join(broadcast(local._1.select("term_id", "term_h")), "term_h")
              .count()
          }

          // (e) REJECTED alternative, kept as evidence: keying the vocab agg
          // on the LONG term_h (min/max(term) carrying the string + a free
          // collision check) measured ~2x SLOWER than the string-keyed agg
          // (2.1s vs 1.0s warm at local[8]) — maintaining two running
          // string min/max per group costs more per row than hashing the
          // string key once. The string agg stays.
          val (hRows, tHashed) = t {
            byTermDoc.groupBy(col("term_h"))
              .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
                min(col("term")).as("term"), max(col("term")).as("term_mx"))
              .limit(IndexBuilder.SmallVocabMax + 1).collect()
          }
          require(hRows.forall(r => r.getAs[String]("term") == r.getAs[String]("term_mx")),
            "unexpected 64-bit term_h collision in probe corpus")

          // (f) REJECTED alternative, kept as evidence (round-5 probe): a
          // string-FREE vocab agg — the shuffle carries only longs
          // (term_h -> df, cf); surface strings resolve in a SEPARATE
          // shuffle-free pass (per-partition-distinct (term_h, term) pairs
          // collected straight to the driver and deduped there). Measured
          // warm at 180k convs: 2.54 s @local[8] -> 1.57 s @local[32]
          // (0.40 efficiency) vs the shipped fused path's 2.22 s -> 0.98 s
          // (0.57) — slower absolutely AND scales worse, because the extra
          // full cached-postings pass for string resolution costs more
          // than the string shuffle payload it removes. The dict stage's
          // scaling floor is the memory-bus-bound scan, not string bytes
          // in the exchange; the string-keyed agg stays.
          val ((fStats, fStrings), tLongOnly) = t {
            val stats = byTermDoc.groupBy(col("term_h"))
              .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
              .limit(IndexBuilder.SmallVocabMax + 1).collect()
            val strings = byTermDoc.select(col("term_h"), col("term")).rdd
              .mapPartitions { it =>
                val seen = new java.util.HashMap[Long, String]()
                it.foreach(r => seen.putIfAbsent(r.getLong(0), r.getString(1)))
                scala.jdk.CollectionConverters.MapHasAsScala(seen).asScala.iterator
              }.collect().toMap
            (stats, strings)
          }
          require(fStats.length == fStrings.size,
            s"string-free agg: ${fStats.length} hashes vs ${fStrings.size} strings")

          println(f"PROBE cpus=$cpus rep=$rep docsCache=$tDocsCache%.2f " +
            f"ids(count+collect)=$tIds%.2f outCache+agg=$tOutCache%.2f " +
            f"bcastCached=$tBcast%.2f :: fusedLocal=$tFused%.2f bcastLocal=$tBcastLocal%.2f " +
            f"fusedHashed=$tHashed%.2f longOnly=$tLongOnly%.2f (vocab=$cnt)")
          out.unpersist(); d.unpersist()
        }
        ordCleanup()
      } finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
  }
}
