package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Golden ports of the reference analysis tests (pure functions, no Spark):
  * analyzer_test.go, char_filter_test.go, tokenizer_test.go,
  * token_filter_test.go, README.md Example2.
  */
class AnalysisSpec extends AnyFunSuite {

  private def terms(ts: TokenStream.TokenStream): Seq[String] = ts.map(_.term)

  // --- analyzer_test.go:10-71 --------------------------------------------
  test("analyzer: empty string → empty stream") {
    assert(Analyzer(Nil, StandardTokenizer(), Nil).analyze("") == Vector())
  }
  test("analyzer: single char") {
    assert(Analyzer(Nil, StandardTokenizer(), Nil).terms("a") == Seq("a"))
  }
  test("analyzer: punctuation split") {
    assert(Analyzer(Nil, StandardTokenizer(), Nil).terms("small wild,cat!") ==
      Seq("small", "wild", "cat"))
  }
  test("analyzer: lowercase filter") {
    assert(Analyzer(Nil, StandardTokenizer(), Seq(LowercaseFilter())).terms("I am BIG") ==
      Seq("i", "am", "big"))
  }
  test("analyzer: stopword filter (pre-lowercase keeps Big)") {
    assert(Analyzer(Nil, StandardTokenizer(), Seq(StopWordFilter(Seq("a")))).terms("how a Big") ==
      Seq("how", "Big"))
  }
  test("analyzer: stemmer filter") {
    assert(Analyzer(Nil, StandardTokenizer(), Seq(StemmerFilter())).terms("Long pens") ==
      Seq("long", "pen"))
  }

  // --- README.md:86-92 Example2 ------------------------------------------
  test("README example2: full pipeline with char filter, stemmer, stopwords") {
    val a = Analyzer(
      Seq(MappingCharFilter(Map(":(" -> "sad"))),
      StandardTokenizer(),
      Seq(LowercaseFilter(), StemmerFilter(),
        StopWordFilter(Seq("i", "my", "me", "the", "a", "for")))
    )
    assert(a.terms("I feel TIRED :(") == Seq("feel", "tire", "sad"))
  }

  // --- char_filter_test.go:8-30 ------------------------------------------
  test("mapping char filter golden") {
    val c = MappingCharFilter(Map("か" -> "ka", "き" -> "ki"))
    assert(c.filter("かきくけこ") == "kakiくけこ")
  }

  // --- tokenizer_test.go:60-112 (ngram) ----------------------------------
  test("ngram tokenizer goldens") {
    assert(terms(NgramTokenizer(1).tokenize("hogefuga")) ==
      Seq("h", "o", "g", "e", "f", "u", "g", "a"))
    assert(terms(NgramTokenizer(2).tokenize("hogefuga")) ==
      Seq("ho", "og", "ge", "ef", "fu", "ug", "ga"))
    assert(terms(NgramTokenizer(3).tokenize("hogefuga")) ==
      Seq("hog", "oge", "gef", "efu", "fug", "uga"))
    assert(terms(NgramTokenizer(1).tokenize("日本昔ばなし")) ==
      Seq("日", "本", "昔", "ば", "な", "し"))
    assert(terms(NgramTokenizer(2).tokenize("日本昔ばなし")) ==
      Seq("日本", "本昔", "昔ば", "ばな", "なし"))
    assert(terms(NgramTokenizer(6).tokenize("日本昔ばなし")) == Seq("日本昔ばなし"))
    assert(terms(NgramTokenizer(7).tokenize("日本昔ばなし")) == Seq())
  }

  // --- tokenizer_test.go:13-58 (morphological via mock) -------------------
  test("morphological tokenizer with injected fake") {
    val fake = new Morphology {
      override def analyze(s: String): Seq[(String, String)] =
        if (s == "今日は天気が良い") Seq(("今日", "キョウ"), ("は", "ハ"),
          ("天気", "テンキ"), ("が", "ガ"), ("良い", "ヨイ"))
        else Seq.empty
    }
    val got = MorphologicalTokenizer(fake).tokenize("今日は天気が良い")
    assert(got == Vector(Token("今日", "キョウ"), Token("は", "ハ"),
      Token("天気", "テンキ"), Token("が", "ガ"), Token("良い", "ヨイ")))
  }

  // --- token_filter_test.go ----------------------------------------------
  test("lowercase filter golden") {
    assert(LowercaseFilter().filter(Vector(Token("Hoge"), Token("fuGA"), Token("PIYO"))) ==
      Vector(Token("hoge"), Token("fuga"), Token("piyo")))
  }
  test("stopword filter golden") {
    assert(StopWordFilter(Seq("hoge")).filter(Vector(Token("hoge"), Token("fuga"), Token("piyo"))) ==
      Vector(Token("fuga"), Token("piyo")))
  }
  test("stemmer filter golden: pens→pen, came→came") {
    assert(StemmerFilter().filter(Vector(Token("pens"), Token("came"))) ==
      Vector(Token("pen"), Token("came")))
  }
  test("romaji readingform golden") {
    val in = Vector(Token("おっ早う！", "おはよう"), Token("チョット！", "ちょっと"))
    assert(RomajiReadingformFilter().filter(in) ==
      Vector(Token("ohayo", "おはよう"), Token("chotto", "ちょっと")))
  }
  test("kana readingform golden") {
    val in = Vector(Token("おっ早う！", "おはよう"), Token("チョット！", "ちょっと"))
    assert(KanaReadingformFilter().filter(in) ==
      Vector(Token("おはよう", "おはよう"), Token("ちょっと", "ちょっと")))
  }
}
