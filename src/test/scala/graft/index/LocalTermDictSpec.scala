package graft.index

import graft.SparkSpec
import graft.analysis.Analyzer
import org.apache.spark.sql.functions._

/** The single-collect LocalRelation dictionary must be indistinguishable
  * from the distributed (dense-ordinal exchange) dictionary: same term_ids,
  * same df/cf, same Σcf and collision verdict — and the over-vocab guard
  * must fall back rather than truncate. */
class LocalTermDictSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    (0L, "spark joins tables and tables join spark"),
    (1L, "wand prunes blocks; blocks prune scans"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "spark spark spark blocks"),
    (4L, "")
  ).toDF("doc_ord", "text")

  private def termStats(docs: org.apache.spark.sql.DataFrame) =
    IndexBuilder.docTermPostings(docs, Analyzer.standard(), "text")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        max(col("term_h")).as("term_h"))

  test("localTermDict == exchange-path dictionary (ids, df, cf, tokens, hashOk)") {
    val ts = termStats(corpus())
    val Some((local, tokens, hashOk)) = IndexBuilder.localTermDict(ts)

    val (exch, _, cleanup) =
      Ids.withDenseOrdinalCounted(ts, "term_id", Seq("term"), assumeUnsorted = true)
    val expect = exch.select("term_id", "term", "df", "cf", "term_h")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val got = local.select("term_id", "term", "df", "cf")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == expect.toSeq.map(t => (t._1, t._2, t._3, t._4)))

    val row = exch.agg(sum(col("cf").cast("long")),
      (count(lit(1)) === countDistinct(col("term_h")))).head()
    assert(tokens == row.getLong(0))
    assert(hashOk == row.getBoolean(1))
    cleanup()
  }

  test("dictionary is a LocalRelation: broadcast joins need no scan job") {
    val ts = termStats(corpus())
    val Some((local, _, _)) = IndexBuilder.localTermDict(ts)
    val plan = local.queryExecution.optimizedPlan
    assert(plan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      s"expected LocalRelation leaves, got:\n$plan")
  }

  test("over-vocab input returns None (fallback), never a truncated dictionary") {
    val ts = termStats(corpus())
    assert(IndexBuilder.localTermDict(ts, max = 3).isEmpty)
  }

  test("build() on the local-dict path matches build() forced onto the fallback") {
    val docs = corpus()
    val a = IndexBuilder.build(docs, Analyzer.standard(), materialize = true)
    val b = IndexBuilder.build(docs, Analyzer.standard(), materialize = true,
      largeVocabHint = true)
    assert(a.numDocs == b.numDocs && a.avgDocLen == b.avgDocLen &&
      a.totalTokens == b.totalTokens)
    def dict(i: TextIndex) = i.termDict.select("term_id", "term", "df", "cf")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(dict(a) == dict(b))
    def post(i: TextIndex) = i.postings
      .select("term_id", "doc_ord", "tf", "dl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).sorted.toSeq
    assert(post(a) == post(b))
  }
}
