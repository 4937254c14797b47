package graft.query

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of independently produced
  * rankings — the modern search-stack shape (Elasticsearch's `rrf`
  * retriever, Cormack et al. 2009) that combines lexical BM25 with vector
  * similarity without score calibration: each retriever contributes
  * `weight / (rrfK + rank)` per document, and documents are ordered by the
  * summed contribution. Rank-based fusion side-steps the incomparable-score
  * problem (BM25 is unbounded, cosine lives in [-1, 1]) that makes naive
  * score mixing brittle.
  *
  * Scale shape: each side produces its own top-n with its own index (the
  * pruned BM25 plan, an LSH/IVF probe) — corpus-scale work stays inside the
  * retrievers. Fusion itself only ever touches ≤ sides·n rank rows: one
  * union, one id-keyed aggregation, one top-k cut. At 10^12 docs the fusion
  * stage is metadata-sized no matter the corpus.
  */
object Hybrid {

  /** `(idCol, rank)` from a scored frame: sequential 1-based ranks
    * (`row_number`) by (score desc, id asc), cut to the top `n` —
    * quantized ties get distinct consecutive ranks, broken by id asc.
    *
    * The cut runs FIRST (`orderBy.limit` → TakeOrderedAndProject, a k-heap
    * per partition — the corpus-sized input is never globally sorted); the
    * `row_number` window then orders only the surviving ≤ n rows. Scores are
    * quantized to `scale` decimal digits before ranking because fused
    * output depends on RANKS, not scores: rank assignment must be stable
    * under distributed float reduce-order jitter, and — since rank lists
    * are what get compared across engines (the DuckDB oracle) — under
    * cross-engine last-ulp drift too. That second requirement is why the
    * default grain (6) is deliberately COARSER than `Searcher.PageGrain`
    * (9, jitter-only): scores within 1e-6 rank as ties (id asc) rather
    * than in an order the last ulps happen to pick. Callers wanting finer
    * discrimination pass `scale` up to 9. */
  def ranks(scored: DataFrame, n: Int, scoreCol: String = "score",
      idCol: String = "doc_id", scale: Int = 6): DataFrame = {
    require(n > 0, s"n must be > 0, got $n")
    val q = round(col(scoreCol), scale).as("_s")
    scored.select(col(idCol), q)
      .orderBy(desc("_s"), asc(idCol)).limit(n)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("_s"), asc(idCol))).cast("long"))
      .select(col(idCol), col("rank"))
  }

  /** Fuse rank lists: each entry is a `(idCol, rank)` frame (1-based ranks,
    * e.g. from [[ranks]] or [[graft.ops.Similarity.bruteForceTopK]]) with a
    * positive weight. A document's fused score is
    * `Σ_r weight_r / (rrfK + rank_r)` over the lists that ranked it; output
    * is the top `k` by (score desc, id asc) as `(idCol, score)`.
    *
    * `rrfK` (Elasticsearch `rank_constant`, default 60) damps the head:
    * larger values flatten the difference between rank 1 and rank 10, giving
    * lower-ranked agreement between retrievers more say.
    *
    * Contributions are exact per (list, doc); with two lists the sum of two
    * doubles is order-independent, so fused scores are engine-reproducible —
    * what lets the DuckDB oracle check hybrid end-to-end. With three or
    * more lists the sum is reduce-order-dependent in the last ulp, so the
    * top-k CUT orders by the fused score quantized to the same 6-digit
    * grain [[ranks]] uses (near-ties collapse to id-asc order instead of
    * an order the last ulps happen to pick); the emitted `score` column
    * stays the unquantized sum. */
  def rrfTopK(rankings: Seq[(DataFrame, Double)], k: Int, rrfK: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "rrf fusion needs at least one ranking")
    require(k > 0, s"k must be > 0, got $k")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    require(rankings.forall(_._2 > 0.0),
      s"rrf weights must be > 0, got ${rankings.map(_._2)}")
    val parts = rankings.map { case (r, w) =>
      r.select(col(idCol),
        (lit(w) / (lit(rrfK.toDouble) + col("rank").cast("double"))).as("contrib"))
    }
    val fused = parts.reduce(_ unionByName _)
      .groupBy(col(idCol)).agg(sum("contrib").as("score"))
    val cutKey = if (rankings.size <= 2) col("score") else round(col("score"), 6)
    fused.orderBy(cutKey.desc, asc(idCol)).limit(k)
  }

  /** BM25 + exact-cosine hybrid top-k — the canonical two-retriever
    * composition: fuse `searcher.bm25All(queryText)` ranks with the cosine
    * ranking of `queryVec` over `corpusVecs` (`idCol` lives in the same id
    * space as the index's `doc_id`). Each side is cut to `nPerSide` before
    * fusion. Returns `(doc_id, score)`.
    *
    * The vector side here scans the corpus once (codegen'd dot — the exact
    * baseline); at serving scale swap it for an ANN probe
    * ([[graft.ops.Similarity.lshTopKIndexed]] /
    * [[graft.ops.Similarity.ivfTopKIndexed]]) and feed its `(id, rank)`
    * through [[rrfTopK]] directly — fusion is retriever-agnostic. */
  def bm25VectorTopK(searcher: Searcher, corpusVecs: DataFrame,
      queryText: String, queryVec: Seq[Double], k: Int, nPerSide: Int = 100,
      rrfK: Int = 60, textWeight: Double = 1.0, vecWeight: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(queryVec.nonEmpty, "queryVec must be non-empty")
    val text = ranks(
      searcher.bm25All(queryText).select(col("doc_id"), col("score")),
      nPerSide)
    val qv = typedLit(queryVec)
    val vec = ranks(
      corpusVecs.select(col(idCol).as("doc_id"),
        graft.ops.Similarity.cosine(col(vecCol), qv).as("score")),
      nPerSide)
    rrfTopK(Seq(text -> textWeight, vec -> vecWeight), k, rrfK)
  }
}
