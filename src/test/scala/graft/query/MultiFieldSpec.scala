package graft.query

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.index.IndexBuilder
import org.apache.spark.sql.DataFrame

/** Multi-field (multi_match) scoring: per-field indexes over a shared
  * ordinal space, weighted most_fields / best_fields combination. */
class MultiFieldSpec extends SparkSpec {
  import spark.implicits._

  private val analyzer = Analyzer.standard()

  private lazy val docs = Seq(
    (0L, 1L, "spark tuning guide", "how to tune spark jobs and joins"),
    (1L, 2L, "join strategies", "broadcast and merge joins in spark"),
    (2L, 3L, "kafka intro", "streams and topics"),
    (3L, 4L, "misc notes", "spark spark spark")
  ).toDF("doc_ord", "doc_id", "title", "body")

  private lazy val title =
    new Searcher(IndexBuilder.build(docs, analyzer, textCol = "title").cache(), analyzer)
  private lazy val body =
    new Searcher(IndexBuilder.build(docs, analyzer, textCol = "body").cache(), analyzer)

  private def scores(df: DataFrame): Map[Long, Double] =
    df.select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap

  test("most_fields == weighted sum of per-field BM25 scores") {
    val t = scores(title.bm25All("spark"))
    val b = scores(body.bm25All("spark"))
    val got = scores(MultiField.bm25TopK(docs, Seq(title -> 3.0, body -> 1.0), "spark", 10))
    assert(got.keySet == (t.keySet ++ b.keySet))
    got.foreach { case (id, s) =>
      val want = 3.0 * t.getOrElse(id, 0.0) + b.getOrElse(id, 0.0)
      assert(math.abs(s - want) < 1e-9, s"doc $id: $s vs $want")
    }
    // title hit outranks body-only stuffing under a strong title weight
    val order = MultiField.bm25TopK(docs, Seq(title -> 3.0, body -> 1.0), "spark", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order.head == 1L, s"got $order") // title 'spark tuning guide'
  }

  test("a field without the term contributes nothing (empty frame folds away)") {
    val got = scores(MultiField.bm25TopK(docs, Seq(title -> 2.0, body -> 1.0), "broadcast", 10))
    val b = scores(body.bm25All("broadcast"))
    assert(got.keySet == b.keySet)
    got.foreach { case (id, s) => assert(math.abs(s - b(id)) < 1e-9) }
    // unknown everywhere -> empty
    assert(MultiField.bm25TopK(docs, Seq(title -> 1.0, body -> 1.0), "zzz", 10)
      .collect().isEmpty)
  }

  test("non-positive field weights are rejected by BOTH combinations") {
    intercept[IllegalArgumentException](
      MultiField.bm25TopK(docs, Seq(title -> 0.0), "spark", 5).collect())
    intercept[IllegalArgumentException](
      MultiField.bm25TopKBestFields(docs, Seq(title -> -1.0, body -> 1.0), "spark", 5).collect())
  }

  test("best_fields: max across fields, tieBreaker adds the rest") {
    val t = scores(title.bm25All("spark join"))
    val b = scores(body.bm25All("spark join"))
    val got = scores(MultiField.bm25TopKBestFields(
      docs, Seq(title -> 1.0, body -> 1.0), "spark join", 10, tieBreaker = 0.4))
    assert(got.keySet == (t.keySet ++ b.keySet))
    got.foreach { case (id, s) =>
      val a = t.getOrElse(id, 0.0); val c = b.getOrElse(id, 0.0)
      val want = math.max(a, c) + 0.4 * math.min(a, c)
      assert(math.abs(s - want) < 1e-9, s"doc $id: $s vs $want")
    }
  }

  test("federated multi-field == monolithic (per-field federations over the" +
      " same slicing; most_fields and best_fields)") {
    // doc_id % 2 slicing, each FIELD rebuilt per slice with fresh local
    // ordinals — per-field global stats must merge independently
    def slice(r: Int, field: String) = {
      val rows = Seq(
        (1L, "spark tuning guide", "how to tune spark jobs and joins"),
        (2L, "join strategies", "broadcast and merge joins in spark"),
        (3L, "kafka intro", "streams and topics"),
        (4L, "misc notes", "spark spark spark"))
        .filter(_._1 % 2 == r).zipWithIndex
        .map { case ((id, t, b), ord) => (ord.toLong, id, t, b) }
        .toDF("doc_ord", "doc_id", "title", "body")
      IndexBuilder.build(rows, analyzer, textCol = field).cache()
    }
    val titleFed = Federation((0 until 2).map(slice(_, "title")), analyzer)
    val bodyFed = Federation((0 until 2).map(slice(_, "body")), analyzer)
    for (q <- Seq("spark", "spark join", "broadcast")) {
      val m = scores(MultiField.bm25TopK(docs, Seq(title -> 3.0, body -> 1.0), q, 10))
      val f = scores(MultiField.bm25TopKFederated(
        docs.drop("doc_ord"), Seq(titleFed -> 3.0, bodyFed -> 1.0), q, 10))
      assert(f.keySet == m.keySet, s"most_fields set '$q'")
      f.foreach { case (id, s) =>
        assert(math.abs(s - m(id)) < 1e-9, s"most_fields doc $id '$q'") }
      val mB = scores(MultiField.bm25TopKBestFields(
        docs, Seq(title -> 1.0, body -> 1.0), q, 10, tieBreaker = 0.4))
      val fB = scores(MultiField.bm25TopKBestFieldsFederated(
        docs.drop("doc_ord"), Seq(titleFed -> 1.0, bodyFed -> 1.0), q, 10, 0.4))
      assert(fB.keySet == mB.keySet, s"best_fields set '$q'")
      fB.foreach { case (id, s) =>
        assert(math.abs(s - mB(id)) < 1e-9, s"best_fields doc $id '$q'") }
    }
    // federations with different key columns are refused
    val otherKey = Federation((0 until 2).map(slice(_, "title")), analyzer,
      tieCols = Seq("title"))
    intercept[IllegalArgumentException](MultiField.bm25TopKFederated(
      docs, Seq(titleFed -> 1.0, otherKey -> 1.0), "spark", 5))
  }
}
