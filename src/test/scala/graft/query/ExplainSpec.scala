package graft.query

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.index.IndexBuilder

/** Term vectors + per-term BM25 score explanation. */
class ExplainSpec extends SparkSpec {
  import spark.implicits._

  private val analyzer = Analyzer.standard()

  // 1 "ruby php js"  2 "go ruby"   3 "ruby go php"  4 "go php"
  // 5 "rust go"      6 "js js go"  7 "php js php js"
  private val bodies = Seq(
    "ruby php js", "go ruby", "ruby go php", "go php",
    "rust go", "js js go", "php js php js")

  private lazy val searcher = {
    val docs = bodies.zipWithIndex
      .map { case (b, i) => (i.toLong, (i + 1).toLong, b) }
      .toDF("doc_ord", "doc_id", "text")
    new Searcher(IndexBuilder.build(docs, analyzer).cache(), analyzer)
  }

  test("termVectors: every term with tf and 0-based positions, term asc") {
    // doc 7 (ord 6) "php js php js"
    val got = searcher.termVectors(6L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(("js", 2L, "1,3"), ("php", 2L, "0,2")))
    assert(searcher.termVectors(999L).count() == 0)
  }

  test("explainScore: contributions sum to the bm25All score") {
    val rows = searcher.explainScore("php js", 6L).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("js", "php")) // term asc
    val total = rows.map(_.getDouble(5)).sum
    val ref = searcher.bm25All("php js")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 7L)
      .select("score").head().getDouble(0)
    assert(math.abs(total - ref) < 1e-9, s"$total vs $ref")
    // idf * tf_factor == contribution per row
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) * r.getDouble(4) - r.getDouble(5)) < 1e-12)
    }
  }

  test("explainScore: unknown terms drop; empty query yields empty frame") {
    assert(searcher.explainScore("zzz", 6L).count() == 0)
    val one = searcher.explainScore("php zzz", 6L).collect()
    assert(one.length == 1 && one.head.getString(0) == "php")
    assert(searcher.explainScore("", 6L).count() == 0)
  }
}
