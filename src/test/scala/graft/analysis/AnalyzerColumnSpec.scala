package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The Catalyst column path (native functions or UDF fallback) must be
  * behaviourally identical to the pure-Scala `Analyzer.analyze` — the index
  * uses the former, query analysis uses the latter, and term matching relies
  * on their agreement. (No scalatestplus bridge in the offline cache, so we
  * draw a deterministic sample from the Gen with a fixed seed.) */
class AnalyzerColumnSpec extends SparkSpec {
  import spark.implicits._

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(" ", ",", "!", "　", ":(", "日本", "ば", "'s", "-", "123")
  )).map(_.mkString)

  private def check(a: Analyzer, inputs: Seq[String]): Unit = {
    val df = inputs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "text")
    val got = df.select(col("id"), a.termsColumn(col("text")).as("terms"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    inputs.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) == a.terms(s), s"input=${s.take(60)}")
    }
  }

  private val analyzers = Seq(
    "standard" -> Analyzer.standard(),
    "standard+stop" -> Analyzer.standard(stopWords = Seq("a", "the", "i")),
    "standard+stem(udf)" -> Analyzer.standard(stem = true),
    "charfilter+standard" -> Analyzer(
      Seq(MappingCharFilter(Map(":(" -> "sad", "-" -> " "))),
      StandardTokenizer(), Seq(LowercaseFilter())),
    "ngram2" -> Analyzer(Nil, NgramTokenizer(2), Seq(LowercaseFilter())),
    "ngram3+stop" -> Analyzer(Nil, NgramTokenizer(3), Seq(LowercaseFilter(), StopWordFilter(Seq("abc")))),
    "standard+synonym" -> Analyzer(Nil, StandardTokenizer(),
      Seq(LowercaseFilter(), SynonymFilter(Map("js" -> "javascript", "rb" -> "ruby", "the" -> "the")))),
    "standard+asciifold" -> Analyzer(Nil, StandardTokenizer(),
      Seq(LowercaseFilter(), AsciiFoldingFilter())),
    "standard+fold+synonym+stop" -> Analyzer(Nil, StandardTokenizer(),
      Seq(LowercaseFilter(), AsciiFoldingFilter(),
        SynonymFilter(Map("cafe" -> "coffeehouse")), StopWordFilter(Seq("a")))),
    "standard+length" -> Analyzer(Nil, StandardTokenizer(),
      Seq(LowercaseFilter(), LengthFilter(2, 6))),
    "standard+shingle2" -> Analyzer(Nil, StandardTokenizer(),
      Seq(LowercaseFilter(), ShingleFilter(2))),
    "standard+stop+shingle3" -> Analyzer(Nil, StandardTokenizer(),
      Seq(LowercaseFilter(), StopWordFilter(Seq("the", "a")), ShingleFilter(3)))
  )

  private val sampleInputs: Seq[String] =
    Gen.listOfN(150, textGen)(Gen.Parameters.default, Seed(42L)).getOrElse(Nil) ++
      Seq("", " ", "a", "I feel TIRED :(", "日本昔ばなし", "aa bb cc aa",
        "the the the", "Ruby PHP JS", "x'y's z",
        // \p{N} beyond Nd: Ⅷ is Nl, ½ and ³ are No — Character.isDigit
        // keeps none of them while the column path's \p{N} keeps all
        "Ⅷ chapter", "½ cup", "x³ y", "٣ arabic",
        // accent folding + synonym canonicalization inputs
        "Café naïve RÉSUMÉ", "señor Ångström ø Ø", "js and rb", "crème brûlée")

  analyzers.foreach { case (name, a) =>
    test(s"column path == scala path: $name") {
      assert(sampleInputs.size > 150)
      check(a, sampleInputs)
    }
  }

  test("native path is used (no UDF) for standard+lowercase+stopword") {
    val a = Analyzer.standard(stopWords = Seq("the"))
    val plan = spark.range(1).selectExpr("'x y the z' as text")
      .select(a.termsColumn(col("text"))).queryExecution.analyzed.toString()
    assert(!plan.toLowerCase.contains("udf"), s"expected no UDF in: $plan")
  }

  test("native path is used (no UDF) for synonym + ascii folding") {
    val a = Analyzer(Nil, StandardTokenizer(),
      Seq(LowercaseFilter(), AsciiFoldingFilter(), SynonymFilter(Map("js" -> "javascript"))))
    val plan = spark.range(1).selectExpr("'café js' as text")
      .select(a.termsColumn(col("text"))).queryExecution.analyzed.toString()
    assert(!plan.toLowerCase.contains("udf"), s"expected no UDF in: $plan")
  }

  test("native path is used (no UDF) for length + shingle filters") {
    val a = Analyzer(Nil, StandardTokenizer(),
      Seq(LowercaseFilter(), LengthFilter(2, 20), ShingleFilter(2)))
    val plan = spark.range(1).selectExpr("'x yy zzz' as text")
      .select(a.termsColumn(col("text"))).queryExecution.analyzed.toString()
    assert(!plan.toLowerCase.contains("udf"), s"expected no UDF in: $plan")
  }

  test("shingle/length golden cases: windows, short streams, codepoint lengths") {
    val sh2 = Analyzer(Nil, StandardTokenizer(), Seq(LowercaseFilter(), ShingleFilter(2)))
    assert(sh2.terms("Quick brown fox") == Seq("quick brown", "brown fox"))
    assert(sh2.terms("solo") == Seq.empty)          // shorter than n
    assert(sh2.terms("") == Seq.empty)
    val len = Analyzer(Nil, StandardTokenizer(), Seq(LowercaseFilter(), LengthFilter(2, 3)))
    assert(len.terms("a bb ccc dddd") == Seq("bb", "ccc"))
    // code-point length: 𝔘 (surrogate pair) counts as ONE code point
    assert(len.terms("𝔘 xy") == Seq("xy"))
  }
}
