package graft.query

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.index.IndexBuilder
import org.apache.spark.sql.DataFrame

/** Boolean query trees: compound AND/OR/NOT over match and phrase leaves,
  * checked against hand-derived sets on a corpus small enough to verify by
  * eye, plus a brute-force property against the flat match/phrase queries.
  */
class BoolQuerySpec extends SparkSpec {
  import spark.implicits._

  private val analyzer = Analyzer.standard()

  // Docs (1-based ids):
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

  test("single term leaf == matchQuery") {
    assert(ids(searcher.boolQuery(BTerm("ruby"))) ==
      ids(searcher.matchQuery("ruby", Or)))
  }

  test("AND of two term leaves") {
    // ruby AND go -> {2, 3}
    assert(ids(searcher.boolQuery(BTerm("ruby") && BTerm("go"))) == Seq(2L, 3L))
  }

  test("OR of AND branches") {
    // (ruby AND php) OR (rust) -> {1, 3} ∪ {5}
    assert(ids(searcher.boolQuery(
      (BTerm("ruby") && BTerm("php")) || BTerm("rust"))) == Seq(1L, 3L, 5L))
  }

  test("AND NOT anchors a negation under a positive branch") {
    // go AND NOT ruby -> {4, 5, 6}
    assert(ids(searcher.boolQuery(BTerm("go") && !BTerm("ruby"))) ==
      Seq(4L, 5L, 6L))
  }

  test("pure NOT takes the complement (docs with none of the terms included)") {
    // NOT php -> {2, 5, 6}; doc 5/6 contain no query term at all
    assert(ids(searcher.boolQuery(!BTerm("php"))) == Seq(2L, 5L, 6L))
  }

  test("NOT of an AND (De Morgan against driver-computed sets)") {
    // NOT (ruby AND go) -> everything but {2, 3}
    assert(ids(searcher.boolQuery(!(BTerm("ruby") && BTerm("go")))) ==
      Seq(1L, 4L, 5L, 6L, 7L))
  }

  test("phrase leaf == phraseQuery, and composes under NOT") {
    assert(ids(searcher.boolQuery(BPhrase("ruby go"))) ==
      ids(searcher.phraseQuery("ruby go")))
    // (php) AND NOT (phrase "php js") -> php docs without the phrase
    val phpDocs = ids(searcher.matchQuery("php", Or)).toSet
    val phraseDocs = ids(searcher.phraseQuery("php js")).toSet
    assert(ids(searcher.boolQuery(BTerm("php") && !BPhrase("php js"))) ==
      (phpDocs -- phraseDocs).toSeq.sorted)
  }

  test("multi-term leaves keep matchQuery logic inside the leaf") {
    // BTerm("ruby php", And) == matchQuery AND; BTerm("ruby rust", Or) == OR
    assert(ids(searcher.boolQuery(BTerm("ruby php", And))) ==
      ids(searcher.matchQuery("ruby php", And)))
    assert(ids(searcher.boolQuery(BTerm("ruby rust", Or))) ==
      ids(searcher.matchQuery("ruby rust", Or)))
  }

  test("unknown term folds statically: AND leaf false, OR leaf drops it") {
    // AND leaf with unknown term is statically false -> OR falls through
    assert(ids(searcher.boolQuery(
      BTerm("ruby zzz", And) || BTerm("rust"))) == Seq(5L))
    // OR leaf drops the unknown term
    assert(ids(searcher.boolQuery(BTerm("ruby zzz", Or))) ==
      ids(searcher.matchQuery("ruby", Or)))
    // NOT(statically false) is the whole corpus
    assert(ids(searcher.boolQuery(!BTerm("zzz"))) == (1L to 7L))
    // constant-false tree -> empty without any scan
    assert(ids(searcher.boolQuery(BTerm("zzz") && BTerm("ruby"))).isEmpty)
  }

  test("brute-force property: random trees == driver evaluation over flat sets") {
    val leafPool: Seq[(BoolQuery, Set[Long])] = Seq(
      BTerm("ruby") -> ids(searcher.matchQuery("ruby", Or)).toSet,
      BTerm("go") -> ids(searcher.matchQuery("go", Or)).toSet,
      BTerm("php js", And) -> ids(searcher.matchQuery("php js", And)).toSet,
      BPhrase("js go") -> ids(searcher.phraseQuery("js go")).toSet,
      BTerm("zzz") -> Set.empty[Long]
    )
    val all = (1L to 7L).toSet
    val rnd = new scala.util.Random(42)
    def gen(depth: Int): (BoolQuery, Set[Long]) =
      if (depth == 0 || rnd.nextInt(3) == 0) leafPool(rnd.nextInt(leafPool.size))
      else rnd.nextInt(3) match {
        case 0 =>
          val (q1, s1) = gen(depth - 1); val (q2, s2) = gen(depth - 1)
          (BAnd(Seq(q1, q2)), s1 intersect s2)
        case 1 =>
          val (q1, s1) = gen(depth - 1); val (q2, s2) = gen(depth - 1)
          (BOr(Seq(q1, q2)), s1 union s2)
        case _ =>
          val (q1, s1) = gen(depth - 1); (BNot(q1), all diff s1)
      }
    (1 to 25).foreach { i =>
      val (q, expected) = gen(3)
      assert(ids(searcher.boolQuery(q)).toSet == expected, s"tree #$i: $q")
    }
  }

  test("one postings scan per tree, not one per leaf") {
    // The postings relation is the only plan leaf exposing `positions`;
    // count its occurrences in the optimized plan. A per-leaf compiler
    // would scan it 3x here.
    val df = searcher.boolQuery(
      (BTerm("ruby") && BTerm("go")) || (BTerm("php") && !BTerm("js")))
    val postingLeaves = df.queryExecution.optimizedPlan.collectLeaves()
      .count(_.output.exists(_.name == "positions"))
    assert(postingLeaves == 1)
  }

  test("at most 62 live leaves, enforced loudly") {
    val wide = BOr(Seq.fill(63)(BTerm("ruby")))
    val e = intercept[IllegalArgumentException](searcher.boolQuery(wide))
    assert(e.getMessage.contains("62"))
    // 62 itself is fine
    assert(ids(searcher.boolQuery(BOr(Seq.fill(62)(BTerm("ruby"))))) ==
      ids(searcher.matchQuery("ruby", Or)))
  }

  test("result rows carry the full docs schema in doc order") {
    val df = searcher.boolQuery(BTerm("go") && !BTerm("ruby"))
    assert(df.columns.toSet == Set("doc_ord", "doc_id", "text"))
    assert(df.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(4L, 5L, 6L))
  }
}
