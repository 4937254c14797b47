package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-field search — the Elasticsearch `multi_match` (most_fields) /
  * Lucene BM25F-lite shape the reference's single-field model
  * (`/root/reference/README.md:8` "Document has only one field") cannot
  * express. Each field is indexed INDEPENDENTLY (one inverted index per
  * field — its own dictionary, df, avgdl — built over the SAME document
  * ordinal space via `IndexBuilder.build(docs, analyzer, textCol = field)`),
  * and a query scores
  *
  *   score(doc) = Σ_field  weight_f · BM25_f(doc, query)
  *
  * — per-field statistics, field weights at query time, the most_fields
  * combination. Dis-max combination across fields (best_fields) composes
  * from the same per-field frames with max instead of sum.
  *
  * Scale shape: one pruned postings scan per field index (each t_bucket
  * partition-pruned to ITS resolved terms), a union + one doc-level
  * aggregation to combine, TakeOrderedAndProject for the top-k — fields
  * never multiply the corpus, and a field whose analyzer drops every query
  * term contributes an empty frame that Catalyst folds away.
  */
object MultiField {

  /** Shared scaffold: per-field weighted score frames, unioned, grouped by
    * doc_ord under `aggExpr`, joined to docs, (score desc, doc_ord asc)
    * top-k. */
  private def combine(docs: DataFrame, fields: Seq[(Searcher, Double)],
      keyword: String, k: Int)(aggExpr: org.apache.spark.sql.Column): DataFrame = {
    require(fields.nonEmpty, "multi-field search needs at least one field")
    fields.foreach { case (_, w) =>
      require(w > 0, s"field weights must be > 0, got $w") }
    val combined = fields
      .map { case (s, w) =>
        s.bm25Scores(keyword)
          .select(col("doc_ord"), (col("score") * lit(w)).as("score"))
      }
      .reduce(_ unionByName _)
      .groupBy(col("doc_ord"))
      .agg(aggExpr.as("score"))
    docs.join(combined, "doc_ord")
      .orderBy(desc("score"), asc("doc_ord"))
      .limit(k)
  }

  /** BM25 top-k over weighted fields. `docs` is the shared document table
    * (must carry `doc_ord`); `fields` maps each field's [[Searcher]] to its
    * query-time weight. Returns docs + `score`, (score desc, doc_ord asc),
    * k rows. */
  def bm25TopK(docs: DataFrame, fields: Seq[(Searcher, Double)],
      keyword: String, k: Int): DataFrame =
    combine(docs, fields, keyword, k)(sum(col("score")))

  /** Best-fields combination (ES `multi_match` type best_fields with
    * tie_breaker): the strongest field wins, others contribute
    * `tieBreaker ×` their weighted score. */
  def bm25TopKBestFields(docs: DataFrame, fields: Seq[(Searcher, Double)],
      keyword: String, k: Int, tieBreaker: Double = 0.0): DataFrame = {
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0,
      s"tieBreaker must be in [0, 1], got $tieBreaker")
    combine(docs, fields, keyword, k)(
      Searcher.disMaxCombine(col("score"), tieBreaker))
  }

  /** Federated combine scaffold: each FIELD is its own [[Federation]] over
    * the SAME document slicing (per-field dictionaries, dfs, avgdls merge
    * independently — per-field global statistics by construction, exactly
    * like the monolithic per-field indexes). Per-field federated score
    * frames are keyed by the shared stable key ([[Federation]] ordinals
    * are slice-local), combined under `aggExpr`, joined to the caller's
    * union docs table, (score desc, key asc) top-k. Scale shape matches
    * the monolithic combine: per-slice pruned scans per field, one
    * doc-level aggregation, TakeOrderedAndProject. */
  private def combineFed(docs: DataFrame, fields: Seq[(Federation, Double)],
      keyword: String, k: Int)(aggExpr: org.apache.spark.sql.Column): DataFrame = {
    require(fields.nonEmpty, "multi-field search needs at least one field")
    fields.foreach { case (_, w) =>
      require(w > 0, s"field weights must be > 0, got $w") }
    val keys = fields.map(_._1.tieColumns).distinct
    require(keys.size == 1, s"field federations disagree on key columns: $keys")
    val tieCols = keys.head
    val combined = fields
      .map { case (f, w) =>
        f.bm25ScoresByKey(keyword)
          .select(tieCols.map(col) :+ (col("score") * lit(w)).as("score"): _*)
      }
      .reduce(_ unionByName _)
      .groupBy(tieCols.map(col): _*)
      .agg(aggExpr.as("score"))
    docs.join(combined, tieCols)
      .orderBy(desc("score") +: tieCols.map(asc): _*)
      .limit(k)
  }

  /** Federated multi_match most_fields: [[bm25TopK]] across field
    * federations — scores float-exact to the monolithic multi-field
    * combine over the union corpus (each field's global stats merge is the
    * proved single-field one; the cross-field sum is the same plan). */
  def bm25TopKFederated(docs: DataFrame, fields: Seq[(Federation, Double)],
      keyword: String, k: Int): DataFrame =
    combineFed(docs, fields, keyword, k)(sum(col("score")))

  /** Federated best_fields with tie_breaker ([[bm25TopKBestFields]]). */
  def bm25TopKBestFieldsFederated(docs: DataFrame,
      fields: Seq[(Federation, Double)], keyword: String, k: Int,
      tieBreaker: Double = 0.0): DataFrame = {
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0,
      s"tieBreaker must be in [0, 1], got $tieBreaker")
    combineFed(docs, fields, keyword, k)(
      Searcher.disMaxCombine(col("score"), tieBreaker))
  }
}
