package graft.query

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.index.IndexBuilder
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpec {
  import spark.implicits._

  private lazy val analyzer = Analyzer.standard()
  private lazy val docs = Seq(
    (0L, "spark join performance tuning for large tables"),
    (1L, "spark shuffle and join internals"),
    (2L, "vector embeddings for semantic search"),
    (3L, "join strategies in distributed engines"),
    (4L, "cats and dogs and other animals"),
    (5L, "spark spark spark join join tuning")
  ).toDF("doc_id", "text").withColumn("doc_ord", col("doc_id"))
  private lazy val se =
    new Searcher(IndexBuilder.build(docs, analyzer).cache(), analyzer)

  // unit-ish vectors: 0/1/5 cluster near the query direction, 4 opposite
  private lazy val emb = Seq(
    (0L, Array(0.9f, 0.1f, 0.0f)),
    (1L, Array(0.8f, 0.2f, 0.1f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.3f, 0.3f, 0.9f)),
    (4L, Array(-0.9f, 0.0f, 0.1f)),
    (5L, Array(0.7f, 0.0f, 0.3f))
  ).toDF("vec_id", "embedding")
  private val qVec = Seq(1.0, 0.0, 0.0)

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("rrfTopK == driver reference on hand-built rank lists") {
    val a = Seq((0L, 1L), (1L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((1L, 1L), (4L, 2L), (0L, 3L)).toDF("doc_id", "rank")
    val got = Hybrid.rrfTopK(Seq(a -> 1.0, b -> 1.0), k = 10, rrfK = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Map(
      0L -> (1.0 / 61 + 1.0 / 63),
      1L -> (1.0 / 62 + 1.0 / 61),
      3L -> 1.0 / 63,
      4L -> 1.0 / 62)
    assert(got.keySet == want.keySet)
    want.foreach { case (id, s) => assert(got(id) == s, s"doc $id") }
    // ordering: fused score desc, id asc
    val order = Hybrid.rrfTopK(Seq(a -> 1.0, b -> 1.0), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order == want.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1))
  }

  test("rrfTopK weights scale contributions per list") {
    val a = Seq((0L, 1L)).toDF("doc_id", "rank")
    val b = Seq((0L, 1L)).toDF("doc_id", "rank")
    val got = Hybrid.rrfTopK(Seq(a -> 2.0, b -> 1.0), k = 1)
      .collect().head.getDouble(1)
    assert(got == 3.0 / 61)
  }

  test("ranks: quantized ties break by id; cut happens before ranking") {
    val scored = Seq(
      (7L, 0.5000000001), // within 1e-6 quantum of doc 2 — ties, id breaks
      (2L, 0.5000000004),
      (9L, 0.9),
      (1L, 0.1)
    ).toDF("doc_id", "score")
    val r = rankMap(Hybrid.ranks(scored, n = 3))
    assert(r == Map(9L -> 1L, 2L -> 2L, 7L -> 3L)) // doc 1 cut by n=3
  }

  test("bm25VectorTopK == per-side ranks fused (decomposition)") {
    val k = 6
    val got = Hybrid.bm25VectorTopK(se, emb, "spark join", qVec, k,
      nPerSide = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val textRanks = rankMap(Hybrid.ranks(
      se.bm25All("spark join").select(col("doc_id"), col("score")), 4))
    val vecRanks = rankMap(Hybrid.ranks(
      emb.select(col("vec_id").as("doc_id"),
        Similarity.cosine(col("embedding"), typedLit(qVec)).as("score")), 4))
    assert(textRanks.nonEmpty && vecRanks.nonEmpty)
    val want = (textRanks.keySet ++ vecRanks.keySet).map { id =>
      id -> (textRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vecRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
    }.toMap
    assert(got.keySet == want.keySet.toSeq.sortBy(id => (-want(id), id)).take(k).toSet)
    got.foreach { case (id, s) => assert(s == want(id), s"doc $id") }
  }

  test("hybrid surfaces docs that either side alone would miss in its head") {
    // doc 2 is the vector side's business, doc 3 matches 'join' only: both
    // appear in the fused list even though neither tops both rankings
    val fusedIds = Hybrid.bm25VectorTopK(se, emb, "spark join", qVec,
      k = 6, nPerSide = 6).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fusedIds.contains(2L)) // no text match; cosine-ranked
    assert(fusedIds.contains(4L)) // no text match; cosine-ranked (low)
  }

  test("rrf guards: empty rankings, bad k/rrfK/weight") {
    val a = Seq((0L, 1L)).toDF("doc_id", "rank")
    intercept[IllegalArgumentException](Hybrid.rrfTopK(Nil, 5))
    intercept[IllegalArgumentException](Hybrid.rrfTopK(Seq(a -> 1.0), 0))
    intercept[IllegalArgumentException](Hybrid.rrfTopK(Seq(a -> 1.0), 5, rrfK = 0))
    intercept[IllegalArgumentException](Hybrid.rrfTopK(Seq(a -> 0.0), 5))
    intercept[IllegalArgumentException](
      Hybrid.bm25VectorTopK(se, emb, "spark", Nil, 5))
  }
}
