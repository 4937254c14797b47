package graft

import graft.analysis.Analyzer
import graft.index.{BlockParams, IndexBuilder}
import graft.ops.{Dedup, Multimodal, Similarity, TextStats}
import graft.query.{And, Or, Searcher}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: staged measurement over SPARK_GRAFT_SF_DIR.
  * Prints exactly ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":"..."}
  *
  * Stages: full PERSISTED index build (analyze → postings/dict/stats + WAND
  * blocks, committed to a t_bucket-partitioned layout), then the reference
  * query surface (AND/OR/phrase/TF-IDF/BM25 exhaustive/BM25 WAND) served
  * from it, and the training-data ops.
  *
  * Every stage is best-of-k: this sandbox VM's host timing has multi-second
  * steal episodes (measured 2.5x swings on identical work), so a single
  * shot is noise, and min-of-k is the standard de-noising estimator for
  * fixed work.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", LocalTmp.dir("graft_spark_local_"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[A](name: String, k: Int = reps)(body: => A): A = {
      var best = Double.MaxValue
      var r: A = null.asInstanceOf[A]
      var i = 0
      while (i < k) {
        val t0 = System.nanoTime()
        r = body
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
        i += 1
      }
      results(name) = best
      r
    }

    val analyzer = Analyzer.standard()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("doc_ord", col("doc_id"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // warm the session before any timed region: first-job costs (executor
    // start, codegen compiler, parquet footer reads) are JVM startup, not
    // engine throughput
    docs.count(); emb.count()

    // ---- index build: the PERSISTED t_bucket-partitioned layout (what a
    // 100 TB deployment runs) — docs/stats/dict/postings/WAND blocks all
    // written and committed; queries below are served from it with
    // partition pruning, not from an in-memory posting cache ---------------
    val searcher = timed("index_build", k = math.min(reps, 2)) {
      val path = LocalTmp.dir("graft_bench_idx_") + "/index"
      // termBuckets/writeGroups sized to the corpus (tiny vocab at sf<=0.1):
      // bucket count should track vocabulary, not be fixed at the 100 TB
      // default — empty bucket dirs are pure per-job overhead
      graft.storage.ParquetIndexStorage.build(docs, analyzer, path,
        graft.storage.StorageParams(termBuckets = 16, writeGroups = 4,
          blockParams = BlockParams(blockSize = 128, bucketSpan = 4096)),
        sourceDesc = sfDir)
      Searcher(graft.storage.ParquetIndexStorage.read(spark, path), analyzer)
    }

    // ---- query surface ----------------------------------------------------
    // Registered as thunks and measured best-of-k with the k rounds
    // INTERLEAVED round-robin across queries (not k back-to-back reps per
    // query): this VM's host has multi-second steal episodes, and with
    // back-to-back reps one episode poisons a query's ENTIRE best-of-k —
    // the BENCH_r03 run shows exactly that (the 7-10x outliers
    // q_bm25_wand_warm..q_dismax are one contiguous program-order span;
    // the same queries measure ~0.2 s in every clean run). Round-robin
    // bounds an episode's damage to one round of each query.
    val headline = scala.collection.mutable.ArrayBuffer.empty[(String, () => Any)]
    def q(name: String)(body: => Any): Unit = headline += name -> (() => body)
    q("q_match_and")(searcher.matchQuery("spark join", And).count())
    q("q_match_or")(searcher.matchQuery("vector window", Or).count())
    q("q_phrase")(searcher.phraseQuery("batch batch").count())
    q("q_tfidf")(searcher.matchQueryRanked("spark join", Or).count())
    q("q_bm25_exhaustive")(searcher.bm25TopK("spark join table", 10).collect())
    q("q_bm25_wand")(searcher.bm25TopKWand("spark join table", 10).collect())
    q("q_bm25_wand_warm")(searcher.bm25TopKWand("slow merge data", 10).collect())
    q("q_bool_tree")(searcher.boolQuery( // 4 live leaves, ONE postings scan
      (graft.query.BTerm("spark") && graft.query.BTerm("join")) ||
      (graft.query.BTerm("group") && !graft.query.BTerm("window"))).count())
    q("q_fuzzy")(searcher.fuzzyQuery("sport", maxEdits = 2).count())
    q("q_phrase_slop")(searcher.phraseQuery("sort merge", slop = 2).count())
    q("q_collapse")(searcher.bm25TopKCollapse("spark join", "source", 10).collect())
    q("q_dismax")(searcher.disMaxTopK(Seq("spark join", "vector window"), 10, 0.3).collect())
    q("q_percolate")(graft.query.Percolator.matches(docs,
      (0 until 200).map(i => graft.query.Percolator.StoredQuery(i.toLong,
        if (i % 2 == 0) "spark join" else "vector window group",
        if (i % 3 == 0) And else Or)), analyzer).count())
    // federated scatter-gather over two independently built slices with
    // merged global stats: per-query cost = two pruned slice plans + a
    // <= 2k-row gather (rank-identical to the monolithic index; the
    // per-query delta vs q_bm25_exhaustive is the fan-out overhead)
    val fed = graft.query.Federation(
      (0 until 2).map(r => graft.index.IndexBuilder.build(
        docs.filter(col("doc_id") % 2 === r), analyzer).cache()),
      analyzer)
    q("q_federated_bm25")(fed.bm25TopK("spark join table", 10).collect())
    // federated query-set replay: 8 queries in ONE plan per slice (slot
    // broadcast + pruned scan + per-(slice, q) cut) + one gather window —
    // per-query cost amortizes the fan-out that q_federated_bm25 pays per
    // call (ranks/scores identical to the monolithic batch)
    q("q_federated_batch")(fed.bm25TopKBatch(
      Seq("spark join", "vector window", "group data", "slow merge data",
        "sort merge", "spark join table", "batch stream", "hash filter"),
      10).collect())
    // hybrid retrieval: BM25 ranks + exact-cosine ranks fused via RRF —
    // each side its own top-100 plan, fusion touches <= 200 rank rows
    val hybQv = emb.filter(col("vec_id") === 7).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble).toSeq
    q("q_hybrid_rrf")(graft.query.Hybrid.bm25VectorTopK(
      searcher, emb, "spark join", hybQv, k = 20, nPerSide = 100).collect())
    // ---- training-data ops (same interleaved rounds) -----------------------
    q("op_dedup_exact")(Dedup.exact(docs).count())
    q("op_dedup_minhash")(
      Dedup.minhashLshPairs(docs, threshold = 0.05, numHashes = 16, bands = 8).count())
    // maxHamming 3 = the scale-safe budget (4 chunks of 16 bits); the
    // pigeonhole banding derives maxHamming+1 chunks, so wider budgets
    // shrink the chunk keys and blow up bucket sizes (documented in Dedup)
    q("op_dedup_simhash")(Dedup.simhashPairs(docs, maxHamming = 3).count())
    q("op_text_quality")(TextStats.quality(docs).count())
    q("op_mm_decode")( // real PNG/WAV decode, batched one decoder per task
      Multimodal.extractFeatures(Multimodal.withRealMedia(docs),
        new Multimodal.JdkMediaDecoder(12)).count())
    q("op_ann_brute")(
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), 10).count())
    q("op_ann_lsh")(
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20), 10, planes = 6, tables = 4).count())
    for (_ <- 0 until reps; (name, thunk) <- headline) {
      val t0 = System.nanoTime()
      thunk()
      val dt = (System.nanoTime() - t0) / 1e9
      results(name) = math.min(results.getOrElse(name, Double.MaxValue), dt)
    }

    // ---- WAND pruning win on a corpus big enough to prune -----------------
    // The sf documents tables are tiny (5k docs, 31-term vocab) — every
    // query matches most docs and nothing can be skipped. The pruning claim
    // is demonstrated on a 135k-turn Zipf synthetic corpus from PERSISTED
    // blocks: wand vs exhaustive on the same queries, plus the decoded-vs-
    // total block counters (skip rate). Queries mix a COMMON term (hot*/low
    // Zipf rank, idf near 0) with RARE terms (high rank, idf ~7): the rare
    // cursor drives the pivots, so the common cursor's blocks — the bulk of
    // the data — are skipped undecoded. Reported separately from `queries`
    // so the headline total stays the sf-dir workload.
    val wandDemo = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val sf1Queries = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    locally {
      val synConvs = sys.env.getOrElse("SPARK_GRAFT_WAND_CONVS", "222000").toInt
      val turns = graft.fixtures.SyntheticTranscripts.df(spark,
        graft.fixtures.SyntheticTranscripts.Params(
          seed = 42L, nConvs = synConvs, maxTurnsPerConv = 8, vocabSize = 20000,
          minLen = 5, maxLen = 200, partitions = cpus.toInt * 2))
      val synPath = LocalTmp.dir("graft_bench_wand_") + "/index"
      def timedBest[A](name: String, k: Int)(body: => A): A = {
        var best = Double.MaxValue; var r: A = null.asInstanceOf[A]; var i = 0
        while (i < k) {
          val t0 = System.nanoTime(); r = body
          best = math.min(best, (System.nanoTime() - t0) / 1e9); i += 1
        }
        wandDemo(name) = best; r
      }
      val synSearcher = timedBest("syn_index_build", 1) {
        val (withOrd, ordCleanup) = graft.index.Ids.withDenseOrdinalHandle(
          turns.select("conv_id", "turn_idx", "text"), "doc_ord",
          Seq("conv_id", "turn_idx"))
        // bucketSpan trades doc-space parallelism against pruning depth
        // (each bucket's WAND has its own k-heap, so fewer/larger buckets
        // let the threshold climb where it can actually skip); blockSize 64
        // makes the skip granularity finer than the common terms' pivot
        // gaps. Probed: 128/4096 -> skip 0.00; 64/16384 -> skip 0.26-0.45.
        // Since the term_h long-keyed postings probe, the per-query
        // EXHAUSTIVE baseline got ~1.7x faster, so at this corpus size both
        // per-query paths are fixed-cost-bound (~0.5s/query of driver and
        // plan latency) and their wall times cross over; the capacity
        // comparison is the BATCH pair below (~11ms/query WAND vs ~40ms
        // exhaustive), where pruning shows through undiluted.
        graft.storage.ParquetIndexStorage.build(withOrd, analyzer, synPath,
          graft.storage.StorageParams(
            blockParams = BlockParams(blockSize = 64, bucketSpan = 16384)),
          sourceDesc = s"synthetic($synConvs convs)")
        ordCleanup()
        Searcher(graft.storage.ParquetIndexStorage.read(spark, synPath), analyzer)
      }
      val wandQueries = Seq(
        "hot0 t005000", "hot1 t009999 t003333", "t000002 t012345", "hot2 t007777 t001111",
        "hot0 t002000", "hot1 t001500 t001501", "t000002 t002500", "hot2 t001800 t002200")
      timedBest("q_bm25_exhaustive_syn", reps)(
        wandQueries.foreach(q => synSearcher.bm25TopK(q, 10).collect()))
      val m = graft.query.WandMetrics(spark)
      timedBest("q_bm25_wand_syn", reps)(
        wandQueries.foreach(q => synSearcher.bm25TopKWand(q, 10, Some(m)).collect()))
      wandDemo("wand_skip_rate") = m.skipRate

      // ---- sf1 headline block: the full query SURFACE at ~10^6 turns ------
      // The sf0.1 documents table is 500 docs — at that size every number
      // in `queries` is fixed latency (driver + plan + listing), and says
      // nothing about the PLANS. This block times the same surfaces against
      // the ~1M-turn corpus above, where engine work dominates: a surface
      // whose plan hides a corpus scan or an unpruned window would read
      // many times q_match_and here, not within a small factor of it.
      // Same interleaved best-of-k discipline as the headline block.
      // Percolation runs on a 50k-turn slice — its deployment shape is
      // per-ingest-batch (docs arrive, standing queries match), so corpus
      // size is batch size, not index size.
      if (sys.env.getOrElse("SPARK_GRAFT_SF1", "1") == "1") {
        // 3-point batch-size sweep: percolation cost must be ∝ batch size
        // (flat per-doc cost) — the standing-query broadcast is shared, so
        // a super-linear trend would mean the match plan hides a
        // corpus-size dependence
        val percSlices = Seq(10000, 50000, 200000).map { nn =>
          nn -> synSearcher.index.docs.filter(col("doc_ord") < nn)
            .select(col("doc_ord").as("doc_id"), col("text")).cache()
        }
        percSlices.foreach(_._2.count())
        val percQs = (0 until 200).map(i => graft.query.Percolator.StoredQuery(
          i.toLong,
          if (i % 2 == 0) "hot0 t005000" else "hot1 t009999 t003333",
          if (i % 3 == 0) And else Or))
        val sf1 = scala.collection.mutable.ArrayBuffer.empty[(String, () => Any)]
        def q1(name: String)(body: => Any): Unit = sf1 += name -> (() => body)
        q1("q_match_and")(synSearcher.matchQuery("hot0 t000200", And).count())
        q1("q_match_or")(synSearcher.matchQuery("t000100 t000200", Or).count())
        q1("q_phrase")(synSearcher.phraseQuery("planteda plantedb").count())
        q1("q_tfidf")(synSearcher.matchQueryRanked("hot1 t000300", Or).count())
        q1("q_bm25_exhaustive")(synSearcher.bm25TopK("hot0 t005000 t000777", 10).collect())
        q1("q_bm25_wand")(synSearcher.bm25TopKWand("hot0 t005000 t000777", 10).collect())
        q1("q_bm25_wand_warm")(synSearcher.bm25TopKWand("hot1 t009999 t003333", 10).collect())
        q1("q_bool_tree")(synSearcher.boolQuery(
          (graft.query.BTerm("hot0") && graft.query.BTerm("t000200")) ||
          (graft.query.BTerm("t000300") && !graft.query.BTerm("hot2"))).count())
        q1("q_fuzzy")(synSearcher.fuzzyQuery("t000345", maxEdits = 1).count())
        q1("q_phrase_slop")(synSearcher.phraseQuery("planteda plantedb", slop = 2).count())
        q1("q_collapse")(synSearcher.bm25TopKCollapse("hot0 t005000", "conv_id", 10).collect())
        q1("q_dismax")(synSearcher.disMaxTopK(
          Seq("hot0 t005000", "hot1 t009999"), 10, 0.3).collect())
        for ((nn, dfp) <- percSlices)
          q1(s"q_percolate_${nn / 1000}k")(
            graft.query.Percolator.matches(dfp, percQs, analyzer).count())
        for (_ <- 0 until reps; (name, thunk) <- sf1) {
          val t0 = System.nanoTime()
          thunk()
          val dt = (System.nanoTime() - t0) / 1e9
          sf1Queries(name) = math.min(sf1Queries.getOrElse(name, Double.MaxValue), dt)
        }
        percSlices.foreach(_._2.unpersist())
        sf1Queries("n_turns") = synSearcher.index.numDocs.toDouble
      }

      // SERVING mode (the interactive deployment shape): blocks pinned
      // MEMORY_AND_DISK, dictionary driver-resident — removes the
      // ~0.5 s/query floor (blocks-parquet re-read + dictionary job) that
      // made cold per-query WAND read slower than exhaustive above. Same
      // queries, same skip logic; pruning now shows through per query.
      synSearcher.serving(pinDocs = true, pinPostings = true)
      timedBest("q_bm25_exhaustive_syn_pinned", reps)(
        wandQueries.foreach(q => synSearcher.bm25TopK(q, 10).collect()))
      timedBest("q_bm25_wand_syn_pinned", reps)(
        wandQueries.foreach(q => synSearcher.bm25TopKWand(q, 10).collect()))
      // single-stream latency mix: one client, mixed surface (ranked WAND
      // top-k / boolean-match hit counts / a content phrase), sequential —
      // reported as QPS. The count legs use countMatches (the _count /
      // track_total_hits serving API — block-local, one shuffle-free job,
      // spec-asserted count-identical to matchQuery().count()); the FULL
      // match/phrase materializations are reported separately below so the
      // mix composition hides nothing.
      locally {
        val mix: Seq[() => Unit] = Seq(
          () => { synSearcher.bm25TopKWand("hot0 t005000", 10).collect(); () },
          () => { synSearcher.countMatches("hot1 t009999", And); () },
          () => { synSearcher.bm25TopKWand("hot2 t007777 t001111", 10).collect(); () },
          () => { synSearcher.phraseQuery("planteda plantedb").count(); () },
          () => { synSearcher.bm25TopKWand("t000002 t012345", 10).collect(); () },
          () => { synSearcher.countMatches("hot2 t001800", Or); () })
        var best = Double.MaxValue
        for (_ <- 0 until reps) {
          val t0 = System.nanoTime()
          mix.foreach(_.apply())
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        wandDemo("serving_mix_qps") = mix.size / best
      }
      // full-materialization serving surfaces, timed on their own: the
      // boolean match fetching every matching doc row, and the adversarial
      // two-hottest-terms phrase — both dominated by a fixed multi-stage
      // plan floor (~0.4 s of AQE stage scheduling at local[32]) plus real
      // matched-set work, NOT by the pinned scans (decomposed in
      // bench/ServingProbe.scala)
      timedBest("serving_match_full", reps)(
        synSearcher.matchQuery("hot1 t009999", And).count())
      timedBest("serving_phrase_hot", reps)(
        synSearcher.phraseQuery("hot0 hot1").count())
      synSearcher.unpin()

      // batch + WAND combined (the realistic offline query-set shape):
      // 120 hot+rare mixes evaluated in ONE plan, vs the exhaustive batch
      // plan on the same set — skip rate reported from the accumulators
      val rnd = new java.util.Random(11L)
      val batchSet = (0 until 120).map { i =>
        val hot = s"hot${i % 3}"
        val rare = f"t${2000 + rnd.nextInt(15000)}%06d"
        val rare2 = f"t${2000 + rnd.nextInt(15000)}%06d"
        if (i % 2 == 0) s"$hot $rare" else s"$hot $rare $rare2"
      }
      timedBest("q_bm25_batch_exh_syn", reps)(
        synSearcher.bm25TopKBatch(batchSet, 10).count())
      val mb = graft.query.WandMetrics(spark)
      timedBest("q_bm25_batch_wand_syn", reps)(
        synSearcher.bm25TopKBatchWand(batchSet, 10, Some(mb)).count())
      wandDemo("batch_wand_skip_rate") = mb.skipRate

      // maintenance demo on the same persisted index: a realistic retention
      // delta (drop the OLDEST 30% of ordinals — contiguous, so the staged
      // rewrite is directory-pruned to those doc ranges), then compaction
      // (the O(index) dense-ordinal rewrite), then query service from the
      // compacted store. Densities evidence the hole and its repair.
      if (sys.env.getOrElse("SPARK_GRAFT_MAINT", "1") == "1") {
        val nSyn = synSearcher.index.numDocs
        val cutoff = (nSyn * 3) / 10
        timedBest("maint_remove_30pct", 1)(
          graft.storage.ParquetIndexStorage.removeDocuments(spark, synPath,
            spark.range(cutoff).toDF("doc_ord"), "bench_rm"))
        wandDemo("maint_density_after_remove") =
          graft.storage.ParquetIndexStorage.ordinalDensity(spark, synPath)
        timedBest("maint_compact", 1)(
          graft.storage.ParquetIndexStorage.compact(spark, synPath, "bench_c0"))
        wandDemo("maint_density_after_compact") =
          graft.storage.ParquetIndexStorage.ordinalDensity(spark, synPath)
        val sc2 = Searcher(
          graft.storage.ParquetIndexStorage.read(spark, synPath), analyzer)
        timedBest("q_bm25_wand_postcompact", reps)(
          wandQueries.foreach(q => sc2.bm25TopKWand(q, 10).collect()))
      }
    }

    // ---- ANN pruning win on a workload big enough to prune -----------------
    // The sf embeddings tables are tiny (2k vectors) — a full brute-force
    // scan is cheaper than any index there, so op_ann_lsh reads slower than
    // op_ann_brute below. And with a HANDFUL of queries brute stays cheaper
    // at any corpus size: brute costs |Q| dots per corpus row, while LSH
    // pays planes×tables plane projections and IVF nlist centroid dots per
    // row — the indexes amortize across the query SET (the offline shape:
    // hundreds of queries per batch, or a prebuilt index reused). The demo
    // is therefore 200 queries over a deterministic 60k-vector clustered
    // corpus (256 hash-centers + small per-id noise — clustered like real
    // embeddings; uniform random 64-d vectors are near-orthogonal and
    // nothing can bucket them): brute = 12M exact dots per batch; LSH
    // projects each row onto 12 planes × 4 tables ONCE at build, then a
    // query batch is a bucket join + candidate verify; IVF does 32 centroid
    // dots per row once at build, then scans nprobe/nlist of the corpus per
    // query. Recall@10 vs the exact result is reported alongside the times.
    val annDemo = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    locally {
      val nVecs = sys.env.getOrElse("SPARK_GRAFT_ANN_VECS", "60000").toInt
      val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "200").toInt
      val dim = 64
      val vecs = spark.range(nVecs).toDF("vec_id")
        .withColumn("embedding", expr(
          s"""transform(sequence(0, ${dim - 1}), j ->
             |  cast((pmod(xxhash64(pmod(vec_id, 256) * $dim + j), 2001) - 1000) / 1000.0
             |     + (pmod(xxhash64(vec_id * $dim + j + 999), 2001) - 1000) / 5000.0
             |   as float))""".stripMargin))
        .cache()
      vecs.count()
      val qs = vecs.filter(col("vec_id") < nQ)
      def timedBest[A](name: String, k: Int)(body: => A): A = {
        var best = Double.MaxValue; var r: A = null.asInstanceOf[A]; var i = 0
        while (i < k) {
          val t0 = System.nanoTime(); r = body
          best = math.min(best, (System.nanoTime() - t0) / 1e9); i += 1
        }
        annDemo(name) = best; r
      }
      def resultSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        df.select("q_id", "id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val exact = timedBest("ann_brute", 1)( // the expensive baseline: one shot
        resultSet(Similarity.bruteForceTopK(vecs, qs, 10)))
      // the deployment shape: hash/assign the corpus ONCE into a persisted
      // index (timed as *_build), then serve the query batch from it (timed
      // as *_query — the number that beats the per-batch full scan). The
      // one-shot lshTopK/ivfTopK compositions pay the build on EVERY call,
      // which only amortizes if the index is kept.
      val lshIdx = timedBest("ann_lsh_build", 1)(
        Similarity.lshIndex(vecs, planes = 12, tables = 4).cached())
      val lsh = timedBest("ann_lsh_query", math.min(reps, 2))(
        resultSet(Similarity.lshTopKIndexed(lshIdx, qs, 10)))
      // multiprobe: SAME index (no extra tables, no corpus growth) — each
      // (query, table) additionally looks up the `probes` nearest-boundary
      // single-bit-flip buckets, so recall rises for a query-side-only cost
      val mprobes = sys.env.getOrElse("SPARK_GRAFT_LSH_PROBES", "2").toInt
      val lshMp = timedBest("ann_lsh_mp_query", math.min(reps, 2))(
        resultSet(Similarity.lshTopKIndexed(lshIdx, qs, 10, probes = mprobes)))
      // realistic codebook size: assignment is a constant-size codegen'd
      // kernel (VecNearestCentroid), flat in nlist — bigger codebooks cost
      // nothing at build and shrink the probed corpus fraction per query
      val nlist = sys.env.getOrElse("SPARK_GRAFT_IVF_NLIST", "128").toInt
      val nprobe = sys.env.getOrElse("SPARK_GRAFT_IVF_NPROBE", "8").toInt
      val ivfIdx = timedBest("ann_ivf_build", 1)(
        Similarity.ivfIndex(vecs, nlist = nlist).cached())
      val ivf = timedBest("ann_ivf_query", math.min(reps, 2))(
        resultSet(Similarity.ivfTopKIndexed(ivfIdx, qs, 10, nprobe = nprobe)))
      lshIdx.buckets.unpersist(); lshIdx.corpus.unpersist()
      ivfIdx.assigned.unpersist()
      def recall(got: Map[Long, Set[Long]]): Double =
        exact.map { case (q, want) =>
          got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
        }.sum / exact.size
      annDemo("lsh_recall") = recall(lsh)
      annDemo("lsh_mp_recall") = recall(lshMp)
      annDemo("lsh_mp_probes") = mprobes.toDouble
      annDemo("ivf_recall") = recall(ivf)
      annDemo("n_vecs") = nVecs.toDouble
      vecs.unpersist()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val wd = wandDemo.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val ad = annDemo.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val s1 = sf1Queries.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_sf1":$s1,"wand_demo":$wd,"ann_demo":$ad,"sf":"$sfDir"}""")
    spark.stop()
  }
}
