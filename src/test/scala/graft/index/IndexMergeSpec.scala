package graft.index

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.query.{And, Or, Searcher}
import org.apache.spark.sql.DataFrame

/** merged == fresh: adding documents incrementally must answer every query
  * exactly like an index built from scratch over the union corpus
  * (term_ids may differ — queries resolve by term, results must not).
  * Mirrors the reference merge cases incl. replacement semantics
  * (`/root/reference/indexer_test.go:209-279`). */
class IndexMergeSpec extends SparkSpec {
  import spark.implicits._

  private val analyzer = Analyzer.standard()

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.map { case (o, t) => (o, o + 1, t) }.toDF("doc_ord", "doc_id", "text")

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_ord").collect().map(_.getLong(0)).toSeq

  private val base = Seq(
    0L -> "aa bb cc",
    1L -> "dd ee",
    2L -> "ff aa bb"
  )
  private val added = Seq(
    3L -> "aa zz",       // new doc, new term zz
    4L -> "bb cc bb"
  )
  private val replaced = Seq(
    1L -> "aa replaced"  // re-add doc 1 with different content
  )

  private def queries(s: Searcher): Seq[Seq[Long]] = Seq(
    ids(s.matchQuery("aa", Or)),
    ids(s.matchQuery("aa bb", And)),
    ids(s.matchQuery("dd", Or)),
    ids(s.matchQuery("zz", Or)),
    ids(s.phraseQuery("aa bb")),
    ids(s.phraseQuery("bb cc")),
    ids(s.matchQueryRanked("aa bb cc", Or)),
    ids(s.bm25TopK("aa bb", 10))
  )

  test("append merge == fresh rebuild on the union corpus") {
    val fresh = IndexBuilder.build(docsDf(base ++ added), analyzer, materialize = true)
    val inc = IndexMerge.addDocuments(
      IndexBuilder.build(docsDf(base), analyzer, materialize = true),
      docsDf(added), analyzer, materialize = true)
    assert(inc.numDocs == fresh.numDocs)
    assert(math.abs(inc.avgDocLen - fresh.avgDocLen) < 1e-12)
    assert(queries(new Searcher(inc, analyzer)) == queries(new Searcher(fresh, analyzer)))
  }

  test("replacement merge drops the old version (last-write-wins)") {
    val fresh = IndexBuilder.build(
      docsDf(Seq(base(0), replaced(0), base(2))), analyzer, materialize = true)
    val inc = IndexMerge.addDocuments(
      IndexBuilder.build(docsDf(base), analyzer, materialize = true),
      docsDf(replaced), analyzer, materialize = true)
    assert(inc.numDocs == fresh.numDocs)
    val si = new Searcher(inc, analyzer)
    val sf = new Searcher(fresh, analyzer)
    assert(queries(si) == queries(sf))
    assert(ids(si.matchQuery("dd", Or)).isEmpty)        // old content gone
    assert(ids(si.matchQuery("replaced", Or)) == Seq(1L)) // new content live
  }

  test("existing term_ids stay stable across a merge") {
    val before = IndexBuilder.build(docsDf(base), analyzer, materialize = true)
    val old = before.termDict.select("term", "term_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = IndexMerge.addDocuments(before, docsDf(added), analyzer, materialize = true)
    val now = after.termDict.select("term", "term_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    old.foreach { case (t, id) => assert(now(t) == id, s"term '$t' id changed") }
    assert(now.contains("zz") && now("zz") > old.values.max)
  }
}
