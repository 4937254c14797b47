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
  *   atom   := '(' expr ')' | '"' phrase '"' boost? | word boost?
  *   boost  := '^' positive-number            // e.g. title^2, "a b"^1.5
  * }}}
  *
  * Precedence NOT > AND > OR; `-term` is sugar for NOT. A quoted string is
  * a [[BPhrase]] (positional), a bare word a single-term [[BTerm]]; a
  * `^boost` suffix scales the leaf's scoring contribution in ranked mode
  * (Lucene query-time boost — ignored by the unranked filter). Parsing
  * is pure driver-side string work; all corpus semantics live in
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
  private final case class TPhrase(s: String, boost: Double = 1.0) extends Tok
  private final case class TWord(s: String, boost: Double = 1.0) extends Tok

  /** Parse the `^boost` suffix value; Lucene requires a positive number. */
  private def parseBoost(raw: String, at: Int): Double =
    raw.toDoubleOption.filter(_ > 0).getOrElse(
      throw ParseError(s"invalid boost '$raw' at offset $at"))

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    // a boost suffix immediately after a closing quote: `"a b"^2`
    def phraseBoost(): Double = {
      if (i >= s.length || s.charAt(i) != '^') return 1.0
      i += 1
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace &&
        "()\"".indexOf(s.charAt(i)) < 0) i += 1
      parseBoost(s.substring(start, i), start)
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
          out += TPhrase(p, phraseBoost())
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
              // `term^2.5`: split at the LAST caret; anything after it must
              // be a positive number (operators never carry boosts — a word
              // with a caret can't have matched AND/OR/NOT above)
              val caret = raw.lastIndexOf('^')
              if (caret < 0) out += TWord(raw)
              else if (caret == 0 || caret == raw.length - 1)
                throw ParseError(s"dangling '^' in '$raw' at offset $start")
              else out += TWord(raw.substring(0, caret),
                parseBoost(raw.substring(caret + 1), start + caret + 1))
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
      case LPar | TNot | TPhrase(_, _) | TWord(_, _) => true
      case _                                         => false
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
      case Some(TPhrase(p, b)) => next(); BPhrase(p, b)
      case Some(TWord(w, b))   => next(); BTerm(w, boost = b)
      case Some(t)          => throw ParseError(s"unexpected '$t'")
      case None             => throw ParseError("unexpected end of query")
    }

    if (toks.isEmpty) throw ParseError("empty query")
    val result = expr()
    if (pos != toks.length) throw ParseError("unexpected trailing ')'")
    result
  }
}
