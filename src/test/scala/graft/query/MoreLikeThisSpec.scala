package graft.query

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.index.IndexBuilder

/** MoreLikeThis: characteristic-term selection + BM25 over the selection,
  * source doc excluded. */
class MoreLikeThisSpec extends SparkSpec {
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

  test("selects the source doc's top tf*idf terms and ranks by BM25 over them") {
    // doc 7 (ord 6) "php js php js": terms {php tf=2, js tf=2}. With
    // maxQueryTerms=2 both survive -> result == bm25 over "php js" minus doc 7.
    val got = searcher.moreLikeThis(6L, maxQueryTerms = 2, k = 10)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = searcher.bm25TopK("php js", 10)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == (ref - 7L))
  }

  test("maxQueryTerms truncation keeps the highest tf*idf term (ties term asc)") {
    // doc 7 with maxQueryTerms=1: php and js have tf=2 each; df(php)=4,
    // df(js)=3 -> js has higher idf -> 'js' selected.
    val got = searcher.moreLikeThis(6L, maxQueryTerms = 1, k = 10)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = searcher.bm25TopK("js", 10)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == (ref - 7L))
  }

  test("k limits the ranked output; unknown doc yields empty") {
    assert(searcher.moreLikeThis(6L, maxQueryTerms = 2, k = 1).count() == 1)
    assert(searcher.moreLikeThis(999L).count() == 0)
  }

  test("works over the persisted layout (d_group-pruned source lookup)") {
    val docs = bodies.zipWithIndex
      .map { case (b, i) => (i.toLong, (i + 1).toLong, b) }
      .toDF("doc_ord", "doc_id", "text")
    val path = graft.LocalTmp.dir("graft_mlt_") + "/index"
    graft.storage.ParquetIndexStorage.build(docs, analyzer, path,
      graft.storage.StorageParams(termBuckets = 4, writeGroups = 2),
      sourceDesc = "mlt-spec")
    val ps = Searcher(graft.storage.ParquetIndexStorage.read(spark, path), analyzer)
    val mem = searcher.moreLikeThis(6L, maxQueryTerms = 2, k = 10)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val per = ps.moreLikeThis(6L, maxQueryTerms = 2, k = 10)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(per == mem)
  }
}
