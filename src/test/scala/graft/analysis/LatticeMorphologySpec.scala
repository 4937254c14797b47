package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** The lattice analyzer must earn its Viterbi: these inputs have cheaper
  * wrong segmentations under naive longest-match or per-char splitting,
  * and the expected outputs are the ones kagome/IPADIC produce. */
class LatticeMorphologySpec extends AnyFunSuite {
  private val m = LatticeMorphology.demo

  test("classic ambiguity: すもももももももものうち") {
    val got = m.analyze("すもももももももものうち")
    assert(got == Seq(
      "すもも" -> "スモモ", "も" -> "モ", "もも" -> "モモ",
      "も" -> "モ", "もも" -> "モモ", "の" -> "ノ", "うち" -> "ウチ"))
  }

  test("compound beats split: 東京都に住む") {
    val got = m.analyze("東京都に住む")
    assert(got == Seq("東京都" -> "トウキョウト", "に" -> "ニ", "住む" -> "スム"))
  }

  test("split beats compound when the compound is absent: 京都の人") {
    assert(m.analyze("京都の人") ==
      Seq("京都" -> "キョウト", "の" -> "ノ", "人" -> "ヒト"))
  }

  test("unknown katakana run groups whole, reading = surface") {
    val got = m.analyze("グーグルを検索")
    assert(got == Seq(
      "グーグル" -> "グーグル", "を" -> "ヲ", "検索" -> "ケンサク"))
  }

  test("unknown hiragana falls back per-char with katakana reading") {
    val got = m.analyze("ぬこ")
    assert(got == Seq("ぬ" -> "ヌ", "こ" -> "コ"))
  }

  test("whitespace tokens are dropped; latin/digit runs group") {
    val got = m.analyze("日本語 spark 42 解析")
    assert(got == Seq(
      "日本語" -> "ニホンゴ", "spark" -> "spark", "42" -> "42",
      "解析" -> "カイセキ"))
  }

  test("verbs and auxiliaries: 形態素解析をします") {
    val got = m.analyze("形態素解析をします")
    assert(got == Seq(
      "形態素" -> "ケイタイソ", "解析" -> "カイセキ",
      "を" -> "ヲ", "し" -> "シ", "ます" -> "マス"))
  }

  test("empty and whitespace-only inputs analyze to nothing") {
    assert(m.analyze("") == Nil)
    assert(m.analyze("   ") == Nil)
  }

  test("empty dictionary degrades to unknown-node segmentation, no crash") {
    val empty = new LatticeMorphology(Seq.empty)
    assert(empty.analyze("グーグル abc") ==
      Seq("グーグル" -> "グーグル", "abc" -> "abc"))
    assert(empty.analyze("") == Nil)
  }

  test("MorphologicalTokenizer + KanaReadingformFilter indexes readings") {
    val a = Analyzer(Nil, MorphologicalTokenizer(m), Seq(KanaReadingformFilter()))
    assert(a.analyze("東京都の天気").map(_.term) ==
      Vector("トウキョウト", "ノ", "テンキ"))
  }

  test("MorphologicalTokenizer + RomajiReadingformFilter matches reference shape") {
    // reference golden shape: surface tokens become romanized readings
    // (/root/reference/analyzer_test.go uses the kana/romaji filter chain)
    val a = Analyzer(Nil, MorphologicalTokenizer(m), Seq(RomajiReadingformFilter()))
    assert(a.analyze("すもももももももものうち").map(_.term) ==
      Vector("sumomo", "mo", "momo", "mo", "momo", "no", "uchi"))
  }

  test("deterministic across repeated runs (serializable value)") {
    val bytes = {
      val bo = new java.io.ByteArrayOutputStream()
      val oo = new java.io.ObjectOutputStream(bo)
      oo.writeObject(m); oo.close(); bo.toByteArray
    }
    val m2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject()
      .asInstanceOf[LatticeMorphology]
    val s = "東京都に住む人も形態素解析をします"
    assert(m2.analyze(s) == m.analyze(s))
  }
}
