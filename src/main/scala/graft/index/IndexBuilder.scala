package graft.index

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch inverted-index construction.
  *
  * The reference indexes row-at-a-time with an in-memory buffer and a
  * threshold-triggered merge into MySQL (`/root/reference/indexer.go:20-61`),
  * paying 1-2 DB round-trips per token occurrence. The Spark-native build is
  * one DAG: a fused analyze+group mapPartitions pass over the documents
  * (narrow — no shuffle), then a hash-aggregated term dictionary and a
  * dictionary join; doc stats fall out of the same pass as `sum(tf)`.
  */
object IndexBuilder {

  /** xxhash64-identical 64-bit term hash (seed 42 over the UTF-8 bytes),
    * computed ONCE per distinct term per document inside the analyze pass.
    * `pmod(xxhash64(col("term")), n)` == `pmod(col("term_h"), n)` by
    * construction, so bucket derivations can reuse it too. */
  def termHash(term: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L)

  /** (doc_ord, term, term_h, positions, tf, dl) rows straight from
    * (doc_ord, text): analysis AND per-term position grouping fused into one
    * mapPartitions pass using the same pure-Scala Analyzer the query side
    * uses (parity by construction). Positions are ordinals within one
    * document's filtered token stream (`/root/reference/indexer.go:64-71`)
    * — an intra-row grouping, so no shuffle is needed.
    *
    * `term_h` is the term's xxhash64, precomputed here so every downstream
    * dictionary probe (the postings view's broadcast join, bucket
    * derivation) is a LONG-keyed lookup instead of a per-posting-row
    * UTF8String decode + string hash — that per-row string probe was the
    * measured parallelism-independent floor of the block-table stage
    * (~5 s at 53M postings; it reads the cached string column and rehashes
    * it on every row, on every consumer).
    *
    * Why not declarative: `groupBy(term, doc).agg(collect_list(pos))` plans
    * as ObjectHashAggregate (sort-based fallback past 128 groups, per-group
    * buffer reflection — measured minutes at 55M tokens), and higher-order
    * `transform/filter` columns evaluate interpreted, not codegen'd
    * (measured ~4ms/doc). This is the one spot where mapPartitions is the
    * Spark-honest answer, and the north_star names it for posting build.
    */
  def docTermPostings(docs: DataFrame, analyzer: Analyzer, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_ord"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (doc, text) =>
          val terms = analyzer.analyze(if (text == null) "" else text)
          val m = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuilder.ofInt]()
          var i = 0
          terms.foreach { t =>
            var b = m.get(t.term)
            if (b == null) { b = new scala.collection.mutable.ArrayBuilder.ofInt; m.put(t.term, b) }
            b += i
            i += 1
          }
          // dl (= Document.TokenCount) denormalized onto every posting row:
          // +4 bytes buys freedom from any doc_stats join at block-build and
          // query time — at 10^12 docs that join is a full shuffle
          val dl = i
          val out = new Array[(Long, String, Long, Seq[Int], Int, Int)](m.size)
          var j = 0
          val e = m.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            val pos = kv.getValue.result()
            out(j) = (doc, kv.getKey, termHash(kv.getKey),
              scala.collection.immutable.ArraySeq.unsafeWrapArray(pos), pos.length, dl)
            j += 1
          }
          out.iterator
        }
      }
      .toDF("doc_ord", "term", "term_h", "positions", "tf", "dl")
  }

  /** Vocabularies up to this many terms get the single-collect dictionary
    * (one job, driver-side id assignment, LocalRelation output). Matches
    * Ids.SmallMax in spirit: ~300k × ~40 B ≈ 12 MB on the driver. */
  val SmallVocabMax = 300000

  /** Single-job term dictionary for vocab-sized aggregates: ONE action
    * (`limit(max+1).collect()` — the limit proves completeness: ≤ max rows
    * returned means the whole vocabulary was returned) runs the term-stats
    * aggregation; term_id order, Σcf, and the 64-bit term_h collision check
    * are computed on the driver; the dictionary comes back as a
    * LocalRelation, which downstream `broadcast(dict)` joins materialize
    * straight from driver rows — no scan job, no cache, no exchange.
    *
    * The alternative (Ids' broadcast path + a cache-materializing agg)
    * costs three fixed-latency jobs and a cache write for the same result;
    * those fixed costs are parallelism-independent and were the measured
    * scaling floor of the dictionary stage (DictProbe: 2.0 s → 1.25 s vs
    * 1.6 s → 0.8 s at local[8]/[32] on a 20k vocab).
    *
    * Returns None when the vocabulary exceeds `max` — the caller falls back
    * to the exchange path, paying one wasted aggregation scan; callers that
    * KNOW the vocab is huge (10^12-turn web corpora) should skip the
    * attempt via build's `largeVocabHint`.
    *
    * @param termStats aggregate with columns (term, df, cf, term_h)
    * @return (dictionary LocalRelation with (term_id, term, df, cf,
    *         term_h), Σcf, collision-free) */
  def localTermDict(
      termStats: DataFrame,
      max: Int = SmallVocabMax
  ): Option[(DataFrame, Long, Boolean)] = {
    val spark = termStats.sparkSession
    val rows = termStats.select("term", "df", "cf", "term_h").limit(max + 1).collect()
    if (rows.length > max) return None
    // UTF8String byte order == the order the exchange path's range sort
    // uses, so term_ids are identical whichever path assigned them
    val sorted = rows.sortBy(r =>
      org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
    var tokens = 0L
    var hashOk = true
    val seen = new java.util.HashSet[java.lang.Long](sorted.length * 2)
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](sorted.length)
    var i = 0
    while (i < sorted.length) {
      val r = sorted(i)
      tokens += r.getLong(2)
      if (!seen.add(r.getLong(3))) hashOk = false
      out.add(org.apache.spark.sql.Row(
        i.toLong, r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      i += 1
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term_id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("df", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cf", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("term_h", org.apache.spark.sql.types.LongType, nullable = false)))
    Some((spark.createDataFrame(out, schema), tokens, hashOk))
  }

  /** Build from any DataFrame that has a dense `doc_ord:long` and a text
    * column. Extra columns on `docs` are kept (for returning documents).
    *
    * @param materialize cache + count every output DF (and drop intermediate
    *                    caches) so the analyze+group pass runs exactly once,
    *                    not once per downstream consumer.
    * @param largeVocabHint skip the single-collect dictionary attempt when
    *                       the vocabulary is known to exceed
    *                       [[SmallVocabMax]] — avoids one wasted
    *                       aggregation scan on the fallback.
    */
  def build(
      docsIn: DataFrame,
      analyzer: Analyzer,
      docOrdCol: String = "doc_ord",
      textCol: String = "text",
      materialize: Boolean = false,
      largeVocabHint: Boolean = false
  ): TextIndex = {
    val docs = if (docOrdCol == "doc_ord") docsIn
               else docsIn.withColumnRenamed(docOrdCol, "doc_ord")

    val byTermDoc0 = docTermPostings(docs, analyzer, textCol)
    val byTermDoc = if (materialize) byTermDoc0.persist() else byTermDoc0

    // Document.TokenCount = size of the filtered stream = the denormalized
    // dl (`/root/reference/indexer.go:21-22`). Zero-token docs carry no
    // postings and can never match, so their absence here is harmless;
    // N and avgdl are computed against the full docs table below.
    // This table is a LAZY view over the materialized posting store: the
    // hot paths never touch it (dl is denormalized onto postings), and
    // its groupBy(doc) shuffle measured ZERO 8->32 scaling in one JVM —
    // paying it at build time bought nothing.
    val docStats = byTermDoc
      .groupBy(col("doc_ord"))
      .agg(max(col("dl")).cast("int").as("token_count"))

    // Term dictionary with document/collection frequencies; term_id assigned
    // by deterministic term order (vs the reference's DB auto-increment,
    // `/root/reference/storage_rdb_Impl.go:106-121`). term_h rides along
    // (constant per term) so the postings view can probe on the long key.
    // Vocab-sized dictionaries take the single-collect LocalRelation path
    // (one job; see localTermDict); larger vocabularies fall back to the
    // distributed dense-ordinal assignment.
    val termStats = byTermDoc
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        max(col("term_h")).as("term_h"))
    val localDict = if (largeVocabHint) None else localTermDict(termStats)
    val (termDict, dictCleanup) = localDict match {
      case Some((ld, _, _)) => (ld, () => ())
      case None =>
        val (termDictRaw, c0) =
          Ids.withDenseOrdinalCounted(termStats, "term_id", Seq("term"),
            assumeUnsorted = true) match { case (d0, _, c) => (d0, c) }
        (termDictRaw.select("term_id", "term", "df", "cf", "term_h"), c0)
    }

    // postings is a broadcast-join VIEW over the one materialized store
    // (byTermDoc) — the id swap costs a hash probe per row at read time
    // instead of a second 100M+-row cache build (measured 98s at 115M rows).
    // The probe key is the precomputed term_h LONG: joining on the term
    // string measured a ~5 s parallelism-independent floor at 53M postings
    // (UTF8String decode + string hash per row, repaid by every consumer of
    // the view — the block pack above all). Correctness gate: the join is
    // only keyed on term_h when the dictionary saw no 64-bit collision
    // (checked below, vocab-sized agg); a collision — expected once per
    // ~6e9-term vocabulary — falls back to the exact string join.
    // The dict side is hinted broadcast: its lineage passes through
    // mapPartitions, which blocks size estimation, so Catalyst would
    // otherwise plan a shuffle join even for a 20k-term vocabulary.
    def postingsVia(key: String) = byTermDoc
      .join(broadcast(termDict.select("term_id", key)), key)
      .select("term_id", "doc_ord", "positions", "tf", "dl")

    val (docsF, docStatsF, termDictF) =
      if (materialize) {
        val d = docs.cache()
        if (localDict.isDefined) {
          // the localTermDict collect already ran the analyze pass (and with
          // it the one big cache materialization); the dictionary is a
          // LocalRelation — nothing to cache or count
          d.count()
          (d, docStats, termDict)
        } else {
          val td = termDict.cache()
          byTermDoc.count() // the single big materialization
          td.count(); d.count()
          dictCleanup()
          (d, docStats, td)
        }
      } else (docs, docStats, termDict)

    val (n, tokens, hashKeyOk) = localDict match {
      // single-collect path: Σ cf and the collision check were computed on
      // the driver from the complete collected vocabulary
      case Some((_, tok, ok)) => (docsF.count(), tok, ok)
      case None =>
        // exact integer arithmetic, one division: avg() would sum doubles in
        // partition order and make avgdl (hence every BM25 score) differ in
        // the last ulp across parallelism levels. Σ cf over the dictionary ==
        // Σ tf over postings == Σ dl over docs — summed over the VOCAB-sized
        // (cached, when materialized) dictionary instead of a full pass over
        // the posting store. The term_h collision check rides the same job.
        val nn = docsF.count()
        val row = termDictF.agg(
          coalesce(sum(col("cf").cast("long")), lit(0L)).as("tokens"),
          (count(lit(1)) === countDistinct(col("term_h"))).as("hash_ok")).head()
        (nn, row.getLong(0), row.getBoolean(1))
    }
    val postingsF = postingsVia(if (hashKeyOk) "term_h" else "term")

    TextIndex(docsF, docStatsF, termDictF, postingsF, n,
      if (n == 0) 0.0 else tokens.toDouble / n, totalTokens = tokens)
  }

  /** Build over a transcripts table per BASELINE.json `input_hint`:
    * (conv_id:string, turn_idx:int, role, text, tool, ts). DocumentID is the
    * composite (conv_id, turn_idx); a dense doc_ord is assigned by stable
    * (conv_id, turn_idx) order so posting lists stay delta-encodable and tie
    * breaks are deterministic (SURVEY.md §1.2).
    */
  def buildFromTurns(turns: DataFrame, analyzer: Analyzer,
      materialize: Boolean = false): TextIndex = {
    val (docs, cleanup) = Ids.withDenseOrdinalHandle(
      turns.select("conv_id", "turn_idx", "text"),
      "doc_ord", Seq("conv_id", "turn_idx"))
    val idx = build(docs, analyzer, materialize = materialize)
    if (materialize) cleanup() // docs are cached + counted by build()
    idx
  }
}
