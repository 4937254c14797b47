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

  /** (doc_ord, term, positions, tf) rows straight from (doc_ord, text):
    * analysis AND per-term position grouping fused into one mapPartitions
    * pass using the same pure-Scala Analyzer the query side uses (parity by
    * construction). Positions are ordinals within one document's filtered
    * token stream (`/root/reference/indexer.go:64-71`) — an intra-row
    * grouping, so no shuffle is needed.
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
          val out = new Array[(Long, String, Seq[Int], Int, Int)](m.size)
          var j = 0
          val e = m.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            val pos = kv.getValue.result()
            out(j) = (doc, kv.getKey, scala.collection.immutable.ArraySeq.unsafeWrapArray(pos), pos.length, dl)
            j += 1
          }
          out.iterator
        }
      }
      .toDF("doc_ord", "term", "positions", "tf", "dl")
  }

  /** Build from any DataFrame that has a dense `doc_ord:long` and a text
    * column. Extra columns on `docs` are kept (for returning documents).
    *
    * @param materialize cache + count every output DF (and drop intermediate
    *                    caches) so the analyze+group pass runs exactly once,
    *                    not once per downstream consumer.
    */
  def build(
      docsIn: DataFrame,
      analyzer: Analyzer,
      docOrdCol: String = "doc_ord",
      textCol: String = "text",
      materialize: Boolean = false
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
    // `/root/reference/storage_rdb_Impl.go:106-121`).
    val termStats = byTermDoc
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val (termDictRaw, dictCleanup) =
      Ids.withDenseOrdinalCounted(termStats, "term_id", Seq("term"),
        assumeUnsorted = true) match { case (d0, _, c0) => (d0, c0) }
    val termDict = termDictRaw.select("term_id", "term", "df", "cf")

    // postings is a broadcast-join VIEW over the one materialized store
    // (byTermDoc) — the id swap costs a hash probe per row at read time
    // instead of a second 100M+-row cache build (measured 98s at 115M rows).
    // The dict side is hinted broadcast: its lineage passes through
    // mapPartitions, which blocks size estimation, so Catalyst would
    // otherwise plan a shuffle join even for a 20k-term vocabulary.
    val postings = byTermDoc
      .join(broadcast(termDict.select("term_id", "term")), "term")
      .select("term_id", "doc_ord", "positions", "tf", "dl")

    val (docsF, docStatsF, termDictF, postingsF) =
      if (materialize) {
        val d = docs.cache()
        val td = termDict.cache()
        byTermDoc.count() // the single big materialization
        td.count(); d.count()
        dictCleanup()
        (d, docStats, td, postings)
      } else (docs, docStats, termDict, postings)

    val (n, tokens) = {
      // exact integer arithmetic, one division: avg() would sum doubles in
      // partition order and make avgdl (hence every BM25 score) differ in
      // the last ulp across parallelism levels. Σ cf over the dictionary ==
      // Σ tf over postings == Σ dl over docs — summed over the VOCAB-sized
      // (cached, when materialized) dictionary instead of a full pass over
      // the posting store
      val nn = docsF.count()
      val tk = termDictF.agg(
        coalesce(sum(col("cf").cast("long")), lit(0L))).head().getLong(0)
      (nn, tk)
    }

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
