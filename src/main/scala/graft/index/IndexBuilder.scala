package graft.index

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch inverted-index construction.
  *
  * The reference indexes row-at-a-time with an in-memory buffer and a
  * threshold-triggered merge into MySQL (`/root/reference/indexer.go:20-61`),
  * paying 1-2 DB round-trips per token occurrence. The Spark-native build is
  * one declarative DAG — analyze → posexplode → hash-aggregate → dictionary
  * join — whose two shuffles (`groupBy(term, doc)` and the dict join) replace
  * the buffer/merge dance entirely; partial (map-side) aggregation collapses
  * repeated terms before anything crosses the network.
  */
object IndexBuilder {

  /** Build from any DataFrame that has a dense `doc_ord:long` and a text
    * column. Extra columns on `docs` are kept (for returning documents).
    *
    * @param docOrdCol  name of the dense document ordinal column
    * @param textCol    name of the indexed text column
    */
  /** @param materialize cache + count every output DF (and drop the
    *                     intermediate analysis/aggregation caches) so the
    *                     expensive analyze→explode→agg chain runs exactly
    *                     once, not once per downstream consumer. */
  def build(
      docsIn: DataFrame,
      analyzer: Analyzer,
      docOrdCol: String = "doc_ord",
      textCol: String = "text",
      materialize: Boolean = false
  ): TextIndex = {
    val docs = if (docOrdCol == "doc_ord") docsIn
               else docsIn.withColumnRenamed(docOrdCol, "doc_ord")

    // One pass of analysis per document; token position = ordinal in the
    // filtered stream (`/root/reference/indexer.go:64-71`).
    val analyzed0 = docs
      .select(col("doc_ord"), analyzer.termsColumn(col(textCol)).as("terms"))
    val analyzed = if (materialize) analyzed0.persist() else analyzed0

    val docStats = analyzed
      .select(col("doc_ord"), size(col("terms")).as("token_count"))

    val tokens = analyzed
      .select(col("doc_ord"), posexplode(col("terms")).as(Seq("pos", "term")))

    // (term, doc) aggregation: sorted positions + tf. Map-side combine makes
    // this the skew-safe first reduction (hot terms still fan out across
    // doc_ord values, so no single reducer key explodes here).
    val byTermDoc0 = tokens
      .groupBy(col("term"), col("doc_ord"))
      .agg(
        sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).cast("int").as("tf")
      )
    val byTermDoc = if (materialize) byTermDoc0.persist() else byTermDoc0

    // Term dictionary with document/collection frequencies; term_id assigned
    // by deterministic term order (vs the reference's DB auto-increment,
    // `/root/reference/storage_rdb_Impl.go:106-121`).
    val termStats = byTermDoc
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val termDict = Ids.withDenseOrdinal(termStats, "term_id", Seq("term"))
      .select("term_id", "term", "df", "cf")

    val postings = byTermDoc
      .join(termDict.select("term_id", "term"), "term")
      .select("term_id", "doc_ord", "positions", "tf")

    val (docsF, docStatsF, termDictF, postingsF) =
      if (materialize) {
        val d = docs.cache(); val ds = docStats.cache()
        val td = termDict.cache(); val po = postings.cache()
        ds.count(); td.count(); po.count(); d.count()
        analyzed.unpersist(); byTermDoc.unpersist()
        (d, ds, td, po)
      } else (docs, docStats, termDict, postings)

    val (n, avgdl) = {
      val r = docStatsF.agg(
        count(lit(1)).as("n"),
        coalesce(avg(col("token_count")), lit(0.0)).as("avgdl")
      ).head()
      (r.getLong(0), r.getDouble(1))
    }

    TextIndex(docsF, docStatsF, termDictF, postingsF, n, avgdl)
  }

  /** Build over a transcripts table per BASELINE.json `input_hint`:
    * (conv_id:string, turn_idx:int, role, text, tool, ts). DocumentID is the
    * composite (conv_id, turn_idx); a dense doc_ord is assigned by stable
    * (conv_id, turn_idx) order so posting lists stay delta-encodable and tie
    * breaks are deterministic (SURVEY.md §1.2).
    */
  def buildFromTurns(turns: DataFrame, analyzer: Analyzer,
      materialize: Boolean = false): TextIndex = {
    val docs = Ids.withDenseOrdinal(
      turns.select("conv_id", "turn_idx", "text"),
      "doc_ord", Seq("conv_id", "turn_idx"))
    build(docs, analyzer, materialize = materialize)
  }
}
