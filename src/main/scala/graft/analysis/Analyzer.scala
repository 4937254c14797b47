package graft.analysis

import graft.analysis.TokenStream.TokenStream
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** char filters → tokenizer → token filters, applied in order
  * (`/root/reference/analyzer.go:17-26`). The same analyzer instance is used
  * for documents at index time and for query strings at plan time, which is
  * what makes term matching well-defined.
  */
final case class Analyzer(
    charFilters: Seq[CharFilter],
    tokenizer: Tokenizer,
    tokenFilters: Seq[TokenFilter]
) extends Serializable {

  def analyze(s: String): TokenStream = {
    val filtered = charFilters.foldLeft(s)((acc, f) => f.filter(acc))
    tokenFilters.foldLeft(tokenizer.tokenize(filtered))((ts, f) => f.filter(ts))
  }

  /** Terms only (the common case for indexing/matching). */
  def terms(s: String): Seq[String] = analyze(s).map(_.term)

  /** A stable description for lineage records. */
  def describe: String = {
    val cf = charFilters.map(_.toString).mkString("[", ",", "]")
    val tf = tokenFilters.map(_.toString).mkString("[", ",", "]")
    s"Analyzer(charFilters=$cf, tokenizer=$tokenizer, tokenFilters=$tf)"
  }

  /** Catalyst Column producing `array<string>` of terms for a text column.
    *
    * Spark-first hot path: when every stage is expressible with built-in
    * (codegen'd) functions — mapping char filter, standard/ngram tokenizer,
    * lowercase and stopword filters — the whole analyzer compiles to native
    * expressions and stays inside WholeStageCodegen. Stages that genuinely
    * need custom scalar logic (the Snowball stemmer, reading forms) fall back
    * to a single UDF wrapping the same pure-Scala pipeline, so the column
    * path and `analyze` are behaviourally identical by construction either
    * way (property-tested in AnalyzerColumnSpec).
    */
  def termsColumn(text: Column): Column =
    Analyzer.nativeTermsColumn(this, text).getOrElse {
      val self = this
      udf((s: String) => if (s == null) Seq.empty[String] else self.terms(s))
        .apply(text)
    }
}

object Analyzer {

  /** Standard English pipeline used by the engine defaults. */
  def standard(stopWords: Seq[String] = Nil, stem: Boolean = false): Analyzer =
    Analyzer(
      Nil,
      StandardTokenizer(),
      Seq(LowercaseFilter()) ++
        (if (stopWords.nonEmpty) Seq(StopWordFilter(stopWords)) else Nil) ++
        (if (stem) Seq(StemmerFilter()) else Nil)
    )

  /** Build a native (no-UDF) Column pipeline if every stage allows it. */
  private[analysis] def nativeTermsColumn(a: Analyzer, text: Column): Option[Column] = {
    // char filters: literal replaces in fixed order
    val afterChar: Option[Column] = a.charFilters.foldLeft(Option(text)) {
      case (Some(c), MappingCharFilter(mappings)) =>
        Some(mappings.foldLeft(c) { case (cc, (k, v)) => regexp_replace(cc, java.util.regex.Pattern.quote(k), java.util.regex.Matcher.quoteReplacement(v)) })
      case _ => None
    }
    val tokenized: Option[Column] = afterChar.flatMap { c =>
      a.tokenizer match {
        case StandardTokenizer() =>
          // split() emits empty strings at the edges; drop them like
          // strings.FieldsFunc does.
          Some(filter(split(c, StandardTokenizer.SplitPattern), t => t =!= lit("")))
        case NgramTokenizer(n) =>
          // len(runes)+1-n grams; n > len ⇒ empty. Guarded because
          // sequence(1, cnt) with cnt <= 0 would generate a DESCENDING
          // sequence, not an empty one. Spark counts string length and
          // substring offsets in code points, matching the rune semantics.
          val cnt = char_length(c) - lit(n - 1)
          Some(
            when(cnt <= 0, array().cast("array<string>"))
              .otherwise(transform(sequence(lit(1), cnt), i => c.substr(i, lit(n))))
          )
        case _ => None
      }
    }
    a.tokenFilters.foldLeft(tokenized) {
      case (Some(c), LowercaseFilter())    => Some(transform(c, t => lower(t)))
      case (Some(c), StopWordFilter(stop)) =>
        // order-preserving filter (array_except would dedupe — wrong,
        // SURVEY.md §2.1 row 7)
        Some(filter(c, t => !t.isin(stop: _*)))
      case (Some(c), SynonymFilter(mapping)) =>
        if (mapping.isEmpty) Some(c)
        else {
          val m = map(mapping.toSeq.sortBy(_._1)
            .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
          Some(transform(c, t => coalesce(element_at(m, t), t)))
        }
      case (Some(c), AsciiFoldingFilter()) =>
        Some(transform(c, t =>
          translate(t, AsciiFoldingFilter.Src, AsciiFoldingFilter.Dst)))
      case (Some(c), LengthFilter(mn, mx)) =>
        // char_length counts code points, matching codePointCount
        Some(filter(c, t => char_length(t) >= mn && char_length(t) <= mx))
      case (Some(c), ShingleFilter(n)) =>
        // windows = size − n + 1; guarded like the ngram tokenizer because
        // sequence(1, cnt) with cnt <= 0 would count DOWN, not be empty
        val cnt = size(c) - lit(n - 1)
        Some(
          when(cnt <= 0, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), cnt),
              i => array_join(slice(c, i, lit(n)), " "))))
      case _ => None
    }
  }
}
