package graft.index

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental index maintenance: add (or re-add) documents to an existing
  * index without rebuilding it.
  *
  * The reference merges an in-memory buffer into stored posting lists with a
  * linear docID-sorted merge, keeping the memory side on equal docIDs
  * (`/root/reference/indexer.go:38-60,134-172`). The Spark equivalent is
  * declarative: drop the re-added documents' old postings (last-write-wins,
  * matching the reference's memory-side preference), union the new ones, and
  * extend the term dictionary — existing term_ids stay STABLE (queries
  * resolve by term, so results are identical to a fresh rebuild; property
  * `merged == fresh` is pinned in IndexMergeSpec).
  */
object IndexMerge {

  /** @param newDocs rows with doc_ord + textCol (+ passthrough columns,
    *                schema-compatible with the existing index's docs).
    *                doc_ords may collide with existing ones (replacement)
    *                or extend beyond them (append).
    */
  def addDocuments(
      index: TextIndex,
      newDocs: DataFrame,
      analyzer: Analyzer,
      textCol: String = "text",
      materialize: Boolean = false
  ): TextIndex = {
    val spark = index.docs.sparkSession
    val newOrds = newDocs.select("doc_ord")

    val byTermDocNew = IndexBuilder.docTermPostings(newDocs, analyzer, textCol)

    // extend the dictionary: unseen terms get dense ids after the current max
    val newTerms = byTermDocNew.select("term").distinct()
      .join(index.termDict.select("term"), Seq("term"), "left_anti")
    val maxId = index.termDict.agg(coalesce(max(col("term_id")), lit(-1L))).head().getLong(0)
    val (mintedRaw, mintCleanup) = Ids.withDenseOrdinalHandle(newTerms, "term_id0", Seq("term"))
    val minted = mintedRaw.select((col("term_id0") + lit(maxId + 1)).as("term_id"), col("term"))

    // stats must be recomputed over the merged postings (df/cf of re-added
    // docs' terms change); ids stay stable via the union dictionary
    val idByTerm = index.termDict.select("term_id", "term").union(minted)

    // merged output is a plain (unbucketed) logical index — re-persisting a
    // bucketed layout is a storage-level operation (dynamic overwrite of the
    // touched t_bucket partitions, SURVEY.md §2.2 row 17)
    val survivingOld = index.postings.drop("t_bucket")
      .join(newOrds, Seq("doc_ord"), "left_anti") // last-write-wins
    val newPostings = byTermDocNew
      .join(broadcast(idByTerm), "term")
      .select(survivingOld.columns.map(col): _*)
    val postings = survivingOld.union(newPostings)

    val termDict = postings
      .groupBy(col("term_id"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).cast("long").as("cf"))
      .join(idByTerm, "term_id")
      .select("term_id", "term", "df", "cf")

    val docs = index.docs.join(newOrds, Seq("doc_ord"), "left_anti")
      .unionByName(newDocs.select(index.docs.columns.map(col): _*))
    val docStats = postings.groupBy(col("doc_ord"))
      .agg(max(col("dl")).cast("int").as("token_count"))

    val (docsF, docStatsF, termDictF, postingsF) =
      if (materialize) {
        val d = docs.cache(); val ds = docStats.cache()
        val td = termDict.cache(); val po = postings.cache()
        po.count(); ds.count(); td.count(); d.count()
        mintCleanup()
        (d, ds, td, po)
      } else (docs, docStats, termDict, postings)

    val n = docsF.count()
    val tokens = docStatsF.agg(
      coalesce(sum(col("token_count").cast("long")), lit(0L))).head().getLong(0)
    TextIndex(docsF, docStatsF, termDictF, postingsF, n,
      if (n == 0) 0.0 else tokens.toDouble / n, termBuckets = 0)
  }
}
