package graft.query

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Percolation — reverse search: a registered query SET is matched against
  * a flow of documents, emitting (doc, query) pairs. The forward engine
  * answers "which docs match this query"; a streaming ingest pipeline also
  * needs "which of my standing queries match this arriving doc" (alerting,
  * routing, saved searches). The reference has no equivalent — its queries
  * are one-shot against the stored index (`query.go:13-44`).
  *
  * Both shapes are stateless per document (queries are driver-held and
  * broadcast), so they distribute trivially and work identically in batch
  * and under Structured Streaming.
  */
object Percolator {

  /** A standing match query: analyzed with the same analyzer as the
    * documents; `logic` per [[Searcher.matchQuery]] (And = all terms,
    * Or = any term). A query whose keyword analyzes to no terms matches
    * nothing. */
  final case class StoredQuery(qId: Long, keyword: String, logic: Logic)

  /** Join-shaped percolation, for LARGE query sets: one broadcast of
    * (term → q_id) slots, one explode of each doc's distinct terms, one
    * (doc, query) aggregation. Scales in the number of stored queries
    * (thousands+) because the query set is data, not plan size. Contains a
    * streaming-stateful aggregation — under Structured Streaming run it via
    * `foreachBatch` (per-micro-batch semantics, no cross-batch state).
    *
    * Returns (doc_id, q_id), one row per matching pair.
    */
  def matches(docs: DataFrame, queries: Seq[StoredQuery], analyzer: Analyzer,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slots = queries.flatMap { q =>
      val ts = analyzer.terms(q.keyword).distinct
      ts.map(t => (q.qId, t, ts.size.toLong, q.logic == And))
    }
    if (slots.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("doc_id", lit(0L)).withColumn("q_id", lit(0L)).limit(0)
    val slotsDf = slots.toDF("q_id", "term", "req", "is_and")
    docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(analyzer.termsColumn(col(textCol)))).as("term"))
      .join(broadcast(slotsDf), "term")
      .groupBy(col("doc_id"), col("q_id"))
      .agg(count(lit(1)).as("n"), first(col("req")).as("req"),
        first(col("is_and")).as("is_and"))
      .filter(!col("is_and") || col("n") === col("req"))
      .select("doc_id", "q_id")
  }

  /** Column-compiled percolation, for MODERATE query sets: every query
    * becomes a boolean expression over the doc's analyzed token array
    * (array_contains / arrays_overlap — whole-stage codegen, zero shuffle,
    * zero state). Because it is a pure per-row projection it runs under
    * Structured Streaming in plain append mode — percolate-on-ingest.
    * Plan size grows with the query count; beyond a few hundred queries
    * switch to [[matches]].
    */
  def matchesStateless(docs: DataFrame, queries: Seq[StoredQuery],
      analyzer: Analyzer, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = array_distinct(analyzer.termsColumn(col(textCol)))
    val perQuery: Seq[Column] = queries.map { q =>
      val ts = analyzer.terms(q.keyword).distinct
      val m =
        if (ts.isEmpty) lit(false)
        else if (q.logic == And) ts.map(t => array_contains(toks, t)).reduce(_ && _)
        else arrays_overlap(toks, array(ts.map(lit): _*))
      struct(lit(q.qId).as("q_id"), m.as("m"))
    }
    if (perQuery.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("doc_id", lit(0L)).withColumn("q_id", lit(0L)).limit(0)
    docs
      .select(col(idCol).as("doc_id"),
        explode(filter(array(perQuery: _*), s => s.getField("m"))).as("s"))
      .select(col("doc_id"), col("s").getField("q_id").as("q_id"))
  }
}
