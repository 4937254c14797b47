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
  * declarative AND batch-proportional: per-batch work is
  *
  *  - analysis of the batch and of the REPLACED docs' old versions (for
  *    exact df/cf decrements) — O(batch);
  *  - a broadcast join of batch-sized df/cf deltas into the dictionary view
  *    (no re-aggregation of the posting store, which a 10^12-turn index
  *    cannot afford per batch);
  *  - broadcast anti-joins of the (batch-sized) replaced-ordinal set against
  *    postings/docs/doc_stats — lazy views, no shuffle of base data;
  *  - N/avgdl maintained by integer deltas from TextIndex.totalTokens.
  *
  * Existing term_ids stay STABLE (queries resolve by term, so results are
  * identical to a fresh rebuild; property `merged == fresh` is pinned in
  * IndexMergeSpec, batch-boundedness in StreamingIndexerSpec).
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
    val newOrds = newDocs.select("doc_ord")

    val byTermDocNew0 = IndexBuilder.docTermPostings(newDocs, analyzer, textCol)
    // the batch-sized frames are each consumed 2-3 times below — persist so
    // analysis runs once per batch, not once per consumer
    val byTermDocNew = byTermDocNew0.persist()

    // old versions being replaced: re-analyze their text for exact df/cf
    // decrements and token-count deltas. The ordinal lookup is a broadcast
    // semi-join (data-skipping scan at the storage layer, no shuffle).
    val replacedOld = index.docs
      .join(broadcast(newOrds), Seq("doc_ord"), "left_semi")
      .select(col("doc_ord"), col(textCol))
    val byTermDocOld = IndexBuilder.docTermPostings(replacedOld, analyzer, textCol).persist()

    // ---- dictionary: unseen terms get dense ids after the current max ----
    val batchTerms = byTermDocNew.select("term").distinct()
    val knownIds = index.termDict // batch-vocabulary-sized pushdown scan
      .join(broadcast(batchTerms), Seq("term"), "left_semi")
      .select("term_id", "term")
    val newTerms = batchTerms.join(knownIds, Seq("term"), "left_anti")
    val maxId = index.termDict.agg(coalesce(max(col("term_id")), lit(-1L))).head().getLong(0)
    val (mintedRaw, mintCleanup) = Ids.withDenseOrdinalCounted(newTerms, "term_id0", Seq("term"),
      assumeUnsorted = true) match { case (d0, _, c0) => (d0, c0) }
    val minted = mintedRaw.select((col("term_id0") + lit(maxId + 1)).as("term_id"), col("term"))

    // ---- df/cf deltas (batch-sized): adds from the new postings, removes
    // from the replaced docs' old postings — NOT a re-aggregation of the
    // whole posting store
    val incs = byTermDocNew.groupBy(col("term"))
      .agg(count(lit(1)).as("df_inc"), sum(col("tf")).cast("long").as("cf_inc"))
    val decs = byTermDocOld.groupBy(col("term"))
      .agg(count(lit(1)).as("df_dec"), sum(col("tf")).cast("long").as("cf_dec"))
    val deltas = incs.join(decs, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_inc"), lit(0L)) - coalesce(col("df_dec"), lit(0L))).as("df_d"),
        (coalesce(col("cf_inc"), lit(0L)) - coalesce(col("cf_dec"), lit(0L))).as("cf_d"))

    val existingUpdated = index.termDict
      .join(broadcast(deltas), Seq("term"), "left")
      .select(col("term_id"), col("term"),
        (col("df") + coalesce(col("df_d"), lit(0L))).as("df"),
        (col("cf") + coalesce(col("cf_d"), lit(0L))).as("cf"))
      .filter(col("df") > 0) // a term whose last doc was replaced away
    val mintedWithStats = minted
      .join(broadcast(deltas), Seq("term"), "left")
      .select(col("term_id"), col("term"),
        coalesce(col("df_d"), lit(0L)).as("df"), coalesce(col("cf_d"), lit(0L)).as("cf"))
    val termDict = existingUpdated.unionByName(mintedWithStats)

    // ---- postings: drop the re-added docs' old rows (last-write-wins,
    // matching the reference's memory-side preference), append the new ones
    val idByTerm = knownIds.union(minted)
    val survivingOld = index.postings.drop("t_bucket")
      .join(broadcast(newOrds), Seq("doc_ord"), "left_anti")
    val newPostings = byTermDocNew
      .join(broadcast(idByTerm), "term")
      .select(survivingOld.columns.map(col): _*)
    val postings = survivingOld.union(newPostings)

    // ---- docs / doc_stats: anti-join views + batch-sized appends ----------
    val docs = index.docs.join(broadcast(newOrds), Seq("doc_ord"), "left_anti")
      .unionByName(newDocs.select(index.docs.columns.map(col): _*))
    val newStats = byTermDocNew.groupBy(col("doc_ord"))
      .agg(max(col("dl")).cast("int").as("token_count"))
    val docStats = index.docStats
      .join(broadcast(newOrds), Seq("doc_ord"), "left_anti")
      .unionByName(newStats)

    // ---- global stats by integer delta (no re-aggregation) ---------------
    // one row per replaced doc / per new doc — both batch-sized aggregates
    val replacedCount = replacedOld.count()
    val removedTokens = byTermDocOld.groupBy(col("doc_ord")).agg(max(col("dl")).as("dl"))
      .agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)
    val newCount = newDocs.count()
    val addedTokens = newStats
      .agg(coalesce(sum(col("token_count").cast("long")), lit(0L))).head().getLong(0)
    val n = index.numDocs - replacedCount + newCount
    val tokens = index.exactTotalTokens - removedTokens + addedTokens

    val (docsF, docStatsF, termDictF, postingsF) =
      if (materialize) {
        val d = docs.cache(); val ds = docStats.cache()
        val td = termDict.cache(); val po = postings.cache()
        po.count(); ds.count(); td.count(); d.count()
        mintCleanup()
        byTermDocNew.unpersist(); byTermDocOld.unpersist()
        (d, ds, td, po)
      } else (docs, docStats, termDict, postings)

    TextIndex(docsF, docStatsF, termDictF, postingsF, n,
      if (n == 0) 0.0 else tokens.toDouble / n, termBuckets = 0, totalTokens = tokens)
  }
}
