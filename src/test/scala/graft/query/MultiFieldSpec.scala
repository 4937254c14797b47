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
}
