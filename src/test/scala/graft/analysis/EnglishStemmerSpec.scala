package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Porter2 behaviour pinned on words whose snowball-English outputs are
  * known, including every stemmed form the reference's own tests and README
  * exercise. */
class EnglishStemmerSpec extends AnyFunSuite {
  private val golden: Seq[(String, String)] = Seq(
    // reference goldens
    "pens" -> "pen", "came" -> "came", "tired" -> "tire", "feel" -> "feel",
    "long" -> "long", "i" -> "i", "sad" -> "sad",
    // plurals / -es / -ies
    "cats" -> "cat", "ties" -> "tie", "cries" -> "cri", "caresses" -> "caress",
    "gaps" -> "gap", "gas" -> "gas", "this" -> "this", "dress" -> "dress",
    // -ed / -ing families
    "agreed" -> "agre", "plastered" -> "plaster", "motoring" -> "motor",
    "sing" -> "sing", "running" -> "run", "hopping" -> "hop",
    "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
    "failing" -> "fail", "filing" -> "file", "hoping" -> "hope",
    // y → i
    "happy" -> "happi", "cry" -> "cri", "say" -> "say", "by" -> "by",
    // steps 2-4
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "digitizer" -> "digit", "operational" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "triplicate" -> "triplic", "formative" -> "format", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good", "revival" -> "reviv", "allowance" -> "allow",
    "inference" -> "infer", "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "communism", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "controll" -> "control",
    "roll" -> "roll", "cease" -> "ceas",
    // exceptional forms
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "news" -> "news", "sky" -> "sky", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "inning" -> "inning", "proceed" -> "proceed", "exceed" -> "exceed",
    // misc well-known
    "beautiful" -> "beauti", "beauty" -> "beauti", "generate" -> "generat",
    "generically" -> "generic", "communication" -> "communic",
    "knightly" -> "knight", "easily" -> "easili"
  )

  golden.foreach { case (in, want) =>
    test(s"stem($in) == $want") {
      assert(EnglishStemmer.stem(in) == want)
    }
  }

  test("stemmer is total on arbitrary short strings") {
    val inputs = Seq("", "a", "ab", "'", "''", "'s", "y", "yy", "日本語", "123", "x'")
    inputs.foreach(s => EnglishStemmer.stem(s)) // must not throw
  }
}
