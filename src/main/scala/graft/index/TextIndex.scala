package graft.index

import org.apache.spark.sql.DataFrame

/** Logical inverted index as a set of DataFrames (the Spark mapping of the
  * reference's three MySQL tables, SURVEY.md §1.2):
  *
  *  - `docs`:      doc_ord:long, text:string (+ passthrough key columns)
  *  - `docStats`:  doc_ord:long, token_count:int   (= Document.TokenCount,
  *                 `/root/reference/indexer.go:21-22`)
  *  - `termDict`:  term_id:long, term:string, df:long, cf:long
  *  - `postings`:  term_id:long, doc_ord:long, positions:array<int>, tf:int
  *                 (positional postings, docID-ascending per term —
  *                 `/root/reference/index.go:23-61`)
  *
  * `numDocs` / `avgDocLen` are the global stats TF-IDF and BM25 need; they
  * are computed once at build time instead of per-query
  * (`CountDocuments`, `/root/reference/sorter.go:23`).
  */
final case class TextIndex(
    docs: DataFrame,
    docStats: DataFrame,
    termDict: DataFrame,
    postings: DataFrame,
    numDocs: Long,
    avgDocLen: Double,
    termBuckets: Int = 0, // >0 when postings/term_dict carry a t_bucket
                          // partition column (persisted layout) usable for
                          // partition pruning at query time
    totalTokens: Long = -1L // exact Σ token_count; lets incremental merges
                            // maintain avgdl by integer deltas instead of
                            // re-aggregating doc_stats (-1 = unknown)
) {
  /** Exact total token count: the stored value, or one doc_stats aggregate
    * for indexes built before the field existed. */
  def exactTotalTokens: Long =
    if (totalTokens >= 0) totalTokens
    else docStats.agg(org.apache.spark.sql.functions.coalesce(
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("token_count").cast("long")),
      org.apache.spark.sql.functions.lit(0L))).head().getLong(0)

  def cache(): TextIndex = {
    docs.cache(); docStats.cache(); termDict.cache(); postings.cache()
    this
  }
  def unpersist(): Unit = {
    docs.unpersist(); docStats.unpersist(); termDict.unpersist(); postings.unpersist()
  }
}
