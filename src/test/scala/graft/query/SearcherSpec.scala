package graft.query

import graft.SparkSpec
import graft.analysis._
import graft.index.IndexBuilder
import org.apache.spark.sql.DataFrame

/** End-to-end golden ports of the reference query tests:
  * README.md:49-70 (Example1), searcher_test.go:37-292 (9 Match + 7 Phrase
  * cases over the aa/bb/cc corpus), sorter_test.go:11-73 (2 TF-IDF
  * rankings). Doc IDs here = reference docID (doc_ord + 1).
  */
class SearcherSpec extends SparkSpec {
  import spark.implicits._

  private def index(bodies: Seq[String], analyzer: Analyzer) = {
    val docs = bodies.zipWithIndex
      .map { case (b, i) => (i.toLong, (i + 1).toLong, b) }
      .toDF("doc_ord", "doc_id", "text")
    IndexBuilder.build(docs, analyzer).cache()
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq

  // --- README Example1: 4-doc corpus, standard + lowercase ----------------
  private lazy val readme =
    new Searcher(
      index(Seq("Ruby PHP JS", "Go Ruby", "Ruby Go PHP", "Go PHP"),
        Analyzer.standard()),
      Analyzer.standard())

  test("README example1: MatchQuery(GO Ruby, OR, tfidf) ⇒ [2,3,4,1]") {
    assert(ids(readme.matchQueryRanked("GO Ruby", Or)) == Seq(2L, 3L, 4L, 1L))
  }
  test("README example1: PhraseQuery(go RUBY) ⇒ [2]") {
    assert(ids(readme.phraseQuery("go RUBY")) == Seq(2L))
  }
  test("MatchAll returns all docs in doc order") {
    assert(ids(readme.matchAll()) == Seq(1L, 2L, 3L, 4L))
  }

  // --- searcher_test.go corpus: aa bb cc / dd ee / ff aa bb ---------------
  private lazy val abc =
    new Searcher(
      index(Seq("aa bb cc", "dd ee", "ff aa bb"), Analyzer.standard()),
      Analyzer.standard())

  private val matchCases: Seq[(String, Logic, Seq[Long])] = Seq(
    ("dd", And, Seq(2L)),
    ("aa bb", And, Seq(1L, 3L)),
    ("aa dd", And, Seq()),
    ("", And, Seq()),
    ("test", And, Seq()),
    ("dd", Or, Seq(2L)),
    ("cc dd", Or, Seq(1L, 2L)),
    ("aa ff", Or, Seq(1L, 3L)),
    ("", Or, Seq()),
    ("test", Or, Seq())
  )
  matchCases.foreach { case (kw, logic, want) =>
    test(s"MatchQuery('$kw', $logic) ⇒ $want") {
      assert(ids(abc.matchQuery(kw, logic)) == want)
    }
  }

  private val phraseCases: Seq[(String, Seq[Long])] = Seq(
    ("aa bb", Seq(1L, 3L)),
    ("dd ee", Seq(2L)),
    ("ff aa bb", Seq(3L)),
    ("aa", Seq(1L, 3L)),
    ("ff", Seq(3L)),
    ("", Seq()),
    ("test", Seq())
  )
  phraseCases.foreach { case (kw, want) =>
    test(s"PhraseQuery('$kw') ⇒ $want") {
      assert(ids(abc.phraseQuery(kw)) == want)
    }
  }

  test("phrase hits are a subset of AND hits") {
    val and = ids(abc.matchQuery("aa bb", And)).toSet
    val ph = ids(abc.phraseQuery("aa bb")).toSet
    assert(ph.subsetOf(and))
  }

  // --- sorter_test.go: fruits corpus, full-width-space separated ----------
  private lazy val fruits =
    new Searcher(
      index(Seq("りんご　みかん", "りんご　りんご　みかん", "りんご　りんご　みかん　みかん　みかん"),
        Analyzer.standard()),
      Analyzer.standard())

  test("TF-IDF golden: りんご ⇒ [2,1,3]") {
    assert(ids(fruits.matchQueryRanked("りんご", Or)) == Seq(2L, 1L, 3L))
  }
  test("TF-IDF golden: みかん ⇒ [3,1,2]") {
    assert(ids(fruits.matchQueryRanked("みかん", Or)) == Seq(3L, 1L, 2L))
  }

  // --- indexer_test.go:63-116: repeated-term position assignment ----------
  test("positions are ordinals in the filtered stream: 'aa bb cc aa' ⇒ aa@[0,3]") {
    val idx = index(Seq("aa bb cc aa"), Analyzer.standard())
    val row = idx.postings
      .join(idx.termDict.where($"term" === "aa"), "term_id")
      .select("positions", "tf").head()
    assert(row.getSeq[Int](0) == Seq(0, 3))
    assert(row.getInt(1) == 2)
  }

  // --- BM25 sanity + duplicate-term AND set semantics ----------------------
  test("bm25TopK returns scored docs descending") {
    val top = readme.bm25TopK("GO Ruby", 10)
    val scores = top.select("score").collect().map(_.getDouble(0)).toSeq
    assert(scores == scores.sorted.reverse && scores.nonEmpty)
    assert(scores.forall(_ > 0))
  }
  test("bm25TopKBatch == per-query bm25TopK for every query in the set") {
    val kws = Seq("GO Ruby", "php", "ruby go php", "unknownterm", "")
    val batch = readme.bm25TopKBatch(kws, 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    kws.zipWithIndex.foreach { case (kw, qi) =>
      val want = readme.bm25TopK(kw, 3).select("doc_ord", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batch.getOrElse(qi, Seq.empty)
      assert(got.map(_._1) == want.map(_._1), s"query '$kw' docs: $got vs $want")
      got.zip(want).foreach { case ((_, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-9, s"query '$kw' score $gs vs $ws")
      }
    }
  }

  test("AND with a duplicated query term uses set semantics (documented divergence)") {
    // reference would return empty because len(tokens) != len(terms)
    // (`searcher.go:66-68` after SQL IN dedup); we match on the term SET.
    assert(ids(abc.matchQuery("aa aa bb", And)) == Seq(1L, 3L))
  }

  test("Japanese corpus end-to-end: lattice morphology + kana readings") {
    // the reference's Japanese pipeline shape (morphological tokenizer +
    // reading-form filter) over the in-repo lattice analyzer: queries
    // written in surface forms match documents via shared readings
    val ja = Analyzer(Nil,
      MorphologicalTokenizer(LatticeMorphology.demo),
      Seq(KanaReadingformFilter()))
    val s = new Searcher(index(Seq(
      "東京都に住む", "京都の人", "形態素解析をします", "東京の天気"), ja), ja)
    assert(ids(s.matchQuery("東京都", And)) == Seq(1L))
    assert(ids(s.matchQuery("京都", And)) == Seq(2L))
    assert(ids(s.matchQuery("東京 天気", And)) == Seq(4L))
    assert(ids(s.matchQuery("解析", Or)) == Seq(3L))
    // phrase: readings must be positionally adjacent
    assert(ids(s.phraseQuery("形態素 解析")) == Seq(3L))
    assert(ids(s.phraseQuery("解析 形態素")) == Seq())
  }
}
