package graft.query

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.index.IndexBuilder
import org.apache.spark.sql.DataFrame

/** Query-string parsing (pure driver) and the ranked boolean path. */
class QueryStringSpec extends SparkSpec {
  import spark.implicits._

  private val analyzer = Analyzer.standard()

  // Same corpus as BoolQuerySpec (1-based ids):
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

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  // ------------------------------------------------------------- parsing

  test("parse: precedence NOT > AND > OR, adjacency is AND") {
    assert(QueryString.parse("a AND b OR c") ==
      BOr(Seq(BAnd(Seq(BTerm("a"), BTerm("b"))), BTerm("c"))))
    assert(QueryString.parse("a b") == BAnd(Seq(BTerm("a"), BTerm("b"))))
    assert(QueryString.parse("NOT a AND b") ==
      BAnd(Seq(BNot(BTerm("a")), BTerm("b"))))
    assert(QueryString.parse("-a b") == BAnd(Seq(BNot(BTerm("a")), BTerm("b"))))
  }

  test("parse: parentheses and quoted phrases") {
    assert(QueryString.parse("a AND (b OR c)") ==
      BAnd(Seq(BTerm("a"), BOr(Seq(BTerm("b"), BTerm("c"))))))
    assert(QueryString.parse("\"ruby go\" OR rust") ==
      BOr(Seq(BPhrase("ruby go"), BTerm("rust"))))
    assert(QueryString.parse("NOT (a b)") ==
      BNot(BAnd(Seq(BTerm("a"), BTerm("b")))))
  }

  test("parse: ^boost on terms and phrases; bad boosts are loud") {
    assert(QueryString.parse("a^2 b") ==
      BAnd(Seq(BTerm("a", boost = 2.0), BTerm("b"))))
    assert(QueryString.parse("\"x y\"^1.5 OR c^0.5") ==
      BOr(Seq(BPhrase("x y", 1.5), BTerm("c", boost = 0.5))))
    intercept[QueryString.ParseError](QueryString.parse("a^"))
    intercept[QueryString.ParseError](QueryString.parse("a^zz"))
    intercept[QueryString.ParseError](QueryString.parse("a^-1"))
    intercept[QueryString.ParseError](QueryString.parse("\"x y\"^bad"))
  }

  test("boosted ranked query: boost scales only that term's contribution") {
    // score(doc | ruby^2 OR go) = 2*bm25(ruby) + bm25(go)
    val boosted = searcher.queryString("ruby^2 OR go", ranked = true)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    def scores(kw: String): Map[Long, Double] =
      searcher.bm25All(kw).select("doc_id", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val ruby = scores("ruby"); val go = scores("go")
    assert(boosted.keySet == (ruby.keySet ++ go.keySet))
    boosted.foreach { case (id, s) =>
      val want = 2.0 * ruby.getOrElse(id, 0.0) + go.getOrElse(id, 0.0)
      assert(math.abs(s - want) < 1e-9, s"doc $id: $s vs $want")
    }
    // all-1.0 boosts reproduce the unboosted ranking exactly
    val flat = searcher.queryString("ruby^1 OR go", ranked = true)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val unboosted = searcher.queryString("ruby OR go", ranked = true)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(flat.toSeq == unboosted.toSeq)
  }

  test("boost in several positive leaves: distinct term takes the MAX boost") {
    val two = searcher.boolQueryRanked(
      BOr(Seq(BTerm("ruby", boost = 3.0), BTerm("ruby", boost = 2.0))))
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val base = searcher.bm25All("ruby").select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(two.keySet == base.keySet)
    two.foreach { case (id, s) =>
      assert(math.abs(s - 3.0 * base(id)) < 1e-9)
    }
  }

  test("parse: ~slop on phrases, ~edits on terms, stacked with boosts") {
    assert(QueryString.parse("\"x y\"~2") == BPhrase("x y", 1.0, 2))
    assert(QueryString.parse("\"x y\"~2^1.5 a~1^2 b") ==
      BAnd(Seq(BAnd(Seq(BPhrase("x y", 1.5, 2), BFuzzy("a", 1, 2.0))), BTerm("b"))))
    intercept[QueryString.ParseError](QueryString.parse("a~"))
    intercept[QueryString.ParseError](QueryString.parse("a~3")) // edits are 1..2
    intercept[QueryString.ParseError](QueryString.parse("a~x"))
    intercept[QueryString.ParseError](QueryString.parse("\"x y\"~-1"))
    intercept[QueryString.ParseError](QueryString.parse("\"x y\"~1.5"))
    // slop capped (int overflow of anchor + slop would silently match nothing)
    intercept[QueryString.ParseError](QueryString.parse("\"x y\"~2147483647"))
  }

  test("fuzzy terms are analyzer-normalized like every other leaf") {
    // 'Rubi~1' must lowercase BEFORE the edit distance, or the case burns
    // the edit budget and the leaf silently goes empty
    assert(ids(searcher.queryString("Rubi~1")) == ids(searcher.queryString("rubi~1")))
    assert(ids(searcher.queryString("Rubi~1")).nonEmpty)
  }

  test("query-string slop and fuzzy run end-to-end through the tree compiler") {
    // "ruby go"~1: doc 3 'ruby go php' only (doc 2 'go ruby' is reversed,
    // spread 2); ~2 admits the reversal
    assert(ids(searcher.queryString("\"ruby go\"~1")) == Seq(3L))
    assert(ids(searcher.queryString("\"ruby go\"~2")) == Seq(2L, 3L))
    // rubi~1 expands to {ruby} in the dictionary
    assert(ids(searcher.queryString("rubi~1")) == ids(searcher.matchQuery("ruby", Or)))
    assert(ids(searcher.queryString("rubi~1 AND NOT js")) == Seq(2L, 3L))
    // ranked: the fuzzy leaf's expansion scores like the plain term query
    val fz = searcher.queryString("rubi~1", ranked = true)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val ref = searcher.bm25All("ruby")
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(fz.toSeq == ref.toSeq)
    // sloppy phrase under NOT composes
    assert(ids(searcher.queryString("go AND NOT \"ruby go\"~2")) ==
      (ids(searcher.matchQuery("go", Or)).toSet -- Set(2L, 3L)).toSeq.sorted)
  }

  test("parse: operator case-insensitive; errors are loud") {
    assert(QueryString.parse("a and b or c") == QueryString.parse("a AND b OR c"))
    intercept[QueryString.ParseError](QueryString.parse(""))
    intercept[QueryString.ParseError](QueryString.parse("a AND"))
    intercept[QueryString.ParseError](QueryString.parse("(a OR b"))
    intercept[QueryString.ParseError](QueryString.parse("a OR b)"))
    intercept[QueryString.ParseError](QueryString.parse("\"unterminated"))
  }

  // ------------------------------------------------------- end to end

  test("queryString == boolQuery of the hand-built tree") {
    val s = "ruby AND (go OR php) AND NOT \"php js\""
    assert(ids(searcher.queryString(s)) == ids(searcher.boolQuery(
      BTerm("ruby") && (BTerm("go") || BTerm("php")) && !BPhrase("php js"))))
    assert(ids(searcher.queryString("go -ruby")) ==
      ids(searcher.boolQuery(BTerm("go") && !BTerm("ruby"))))
  }

  // ------------------------------------------------------- ranked path

  test("boolQueryRanked: positive-clause BM25 == bm25 score of the flat query") {
    // Single positive term: scores must equal bm25TopK's for the same docs.
    val ranked = searcher.boolQueryRanked(BTerm("php"))
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val flat = searcher.bm25TopK("php", 10)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranked == flat)
  }

  test("boolQueryRanked: negated clauses never score; filter still applies") {
    // php AND NOT js -> {3, 4}; score from 'php' only.
    val got = searcher.boolQueryRanked(BTerm("php") && !BTerm("js"))
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val phpScores = searcher.bm25TopK("php", 10)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(3L, 4L))
    got.foreach { case (id, sc) => assert(sc == phpScores(id)) }
  }

  test("boolQueryRanked: docs matched only through negation score 0") {
    // NOT php matches {2, 5, 6}; 'rust' is positive nowhere -> all score 0
    val got = searcher.boolQueryRanked(!BTerm("php"))
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(2L, 5L, 6L))
    assert(got.values.forall(_ == 0.0))
    // mixed: (rust) OR (NOT php): rust doc scores, pure-negation docs get 0
    val mixed = searcher.boolQueryRanked(BTerm("rust") || !BTerm("php"))
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mixed(5L) > 0.0 && mixed(2L) == 0.0 && mixed(6L) == 0.0)
  }

  test("boolQueryRanked: ranked output is score desc, doc_ord tie-break") {
    val rows = searcher.boolQueryRanked(BTerm("js") || BTerm("go"))
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val resorted = rows.sortBy { case (id, sc) => (-sc, id) }.toSeq
    assert(rows.toSeq == resorted)
  }

  test("queryString ranked flag routes to the ranked path") {
    assert(searcher.queryString("php -js", ranked = true).columns.contains("score"))
    assert(ids(searcher.queryString("php -js", ranked = true)) == Seq(3L, 4L))
  }
}
