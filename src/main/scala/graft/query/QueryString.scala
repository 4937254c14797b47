package graft.query

/** Lucene-lite query-string syntax compiled to a [[BoolQuery]] tree — the
  * human-facing entry to the compound surface (the reference's queries are
  * programmatic structs only, `query.go:13-44`).
  *
  * Grammar (case-insensitive operators, whitespace-separated):
  *
  * {{{
  *   expr   := and ( OR and )*
  *   and    := unary ( AND? unary )*      // adjacency = implicit AND
  *   unary  := (NOT | '-') unary | atom
  *   atom   := '(' expr ')' | '"' phrase '"' slop? boost? | word fuzzy? boost?
  *   slop   := '~' non-negative-int           // e.g. "a b"~2 (sloppy phrase)
  *   fuzzy  := '~' (1 | 2)                    // e.g. term~1 (edit distance)
  *   boost  := '^' positive-number            // e.g. title^2, "a b"~2^1.5
  * }}}
  *
  * Precedence NOT > AND > OR; `-term` is sugar for NOT. A quoted string is
  * a [[BPhrase]] (positional; `~slop` relaxes it to the unordered window),
  * a bare word a single-term [[BTerm]], `word~N` a [[BFuzzy]] dictionary
  * expansion; a `^boost` suffix scales the leaf's scoring contribution in
  * ranked mode (Lucene query-time boost — ignored by the unranked filter).
  * Parsing is pure driver-side string work; all corpus semantics live in
  * [[Searcher.boolQuery]].
  */
object QueryString {

  /** Parse failure with position context; message is user-facing. */
  final case class ParseError(message: String)
    extends IllegalArgumentException(message)

  private sealed trait Tok
  private case object LPar extends Tok
  private case object RPar extends Tok
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TNot extends Tok
  private final case class TPhrase(s: String, boost: Double = 1.0,
      slop: Int = 0) extends Tok
  private final case class TWord(s: String, boost: Double = 1.0) extends Tok
  private final case class TFuzzy(s: String, edits: Int,
      boost: Double = 1.0) extends Tok

  /** Parse the `^boost` suffix value; Lucene requires a positive number. */
  private def parseBoost(raw: String, at: Int): Double =
    raw.toDoubleOption.filter(_ > 0).getOrElse(
      throw ParseError(s"invalid boost '$raw' at offset $at"))

  /** Parse a `~N` suffix value (phrase slop ≥ 0 / fuzzy edits 1-2). */
  private def parseTilde(raw: String, at: Int, lo: Int, hi: Int,
      what: String): Int =
    raw.toIntOption.filter(n => n >= lo && n <= hi).getOrElse(
      throw ParseError(s"invalid $what '$raw' at offset $at (need $lo..$hi)"))

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    // suffixes after a closing quote, in Lucene order: `"a b"~2^1.5`
    def phraseSuffix(): (Int, Double) = {
      def run(): String = {
        val start = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
          "()\"~^".indexOf(s.charAt(i)) < 0) i += 1
        s.substring(start, i)
      }
      var slop = 0; var boost = 1.0
      if (i < s.length && s.charAt(i) == '~') {
        i += 1; val at = i
        slop = parseTilde(run(), at, 0, Searcher.MaxSlop, "slop")
      }
      if (i < s.length && s.charAt(i) == '^') {
        i += 1; val at = i; boost = parseBoost(run(), at)
      }
      (slop, boost)
    }
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LPar; i += 1
        case ')' => out += RPar; i += 1
        case '-' => out += TNot; i += 1
        case '"' =>
          val end = s.indexOf('"', i + 1)
          if (end < 0) throw ParseError(s"unterminated quote at offset $i")
          val p = s.substring(i + 1, end); i = end + 1
          val (slop, boost) = phraseSuffix()
          out += TPhrase(p, boost, slop)
        case _ =>
          val start = i
          while (i < s.length && !s.charAt(i).isWhitespace &&
            "()\"".indexOf(s.charAt(i)) < 0) i += 1
          val raw = s.substring(start, i)
          raw.toUpperCase match {
            case "AND" => out += TAnd
            case "OR"  => out += TOr
            case "NOT" => out += TNot
            case _ =>
              // suffixes in Lucene order: `term~1^2` (fuzzy edits, boost);
              // split the boost at the LAST caret, then the tilde
              val caret = raw.lastIndexOf('^')
              val (core, boost) =
                if (caret < 0) (raw, 1.0)
                else if (caret == 0 || caret == raw.length - 1)
                  throw ParseError(s"dangling '^' in '$raw' at offset $start")
                else (raw.substring(0, caret),
                  parseBoost(raw.substring(caret + 1), start + caret + 1))
              val tilde = core.lastIndexOf('~')
              if (tilde < 0) out += TWord(core, boost)
              else if (tilde == 0 || tilde == core.length - 1)
                throw ParseError(s"dangling '~' in '$raw' at offset $start")
              else out += TFuzzy(core.substring(0, tilde),
                parseTilde(core.substring(tilde + 1), start + tilde + 1, 1, 2,
                  "fuzzy edit distance"), boost)
          }
      }
    }
    out.result()
  }

  /** Compile `s` to a [[BoolQuery]]; throws [[ParseError]] on bad syntax. */
  def parse(s: String): BoolQuery = {
    val toks = lex(s)
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }

    def atomStart(t: Tok): Boolean = t match {
      case LPar | TNot | TPhrase(_, _, _) | TWord(_, _) | TFuzzy(_, _, _) => true
      case _ => false
    }

    def expr(): BoolQuery = {
      var node = andExpr()
      while (peek.contains(TOr)) { next(); node = BOr(Seq(node, andExpr())) }
      node
    }
    def andExpr(): BoolQuery = {
      var node = unary()
      var continue = true
      while (continue) peek match {
        case Some(TAnd) => next(); node = BAnd(Seq(node, unary()))
        case Some(t) if atomStart(t) => node = BAnd(Seq(node, unary()))
        case _ => continue = false
      }
      node
    }
    def unary(): BoolQuery = peek match {
      case Some(TNot) => next(); BNot(unary())
      case _          => atom()
    }
    def atom(): BoolQuery = peek match {
      case Some(LPar) =>
        next()
        val e = expr()
        if (!peek.contains(RPar)) throw ParseError("missing ')'")
        next(); e
      case Some(TPhrase(p, b, sl)) => next(); BPhrase(p, b, sl)
      case Some(TWord(w, b))       => next(); BTerm(w, boost = b)
      case Some(TFuzzy(w, e, b))   => next(); BFuzzy(w, e, b)
      case Some(t)          => throw ParseError(s"unexpected '$t'")
      case None             => throw ParseError("unexpected end of query")
    }

    if (toks.isEmpty) throw ParseError("empty query")
    val result = expr()
    if (pos != toks.length) throw ParseError("unexpected trailing ')'")
    result
  }
}
