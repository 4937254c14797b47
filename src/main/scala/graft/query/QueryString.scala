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
  *   atom   := '(' expr ')' | '"' phrase '"' | word
  * }}}
  *
  * Precedence NOT > AND > OR; `-term` is sugar for NOT. A quoted string is
  * a [[BPhrase]] (positional), a bare word a single-term [[BTerm]]. Parsing
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
  private final case class TPhrase(s: String) extends Tok
  private final case class TWord(s: String) extends Tok

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LPar; i += 1
        case ')' => out += RPar; i += 1
        case '-' => out += TNot; i += 1
        case '"' =>
          val end = s.indexOf('"', i + 1)
          if (end < 0) throw ParseError(s"unterminated quote at offset $i")
          out += TPhrase(s.substring(i + 1, end)); i = end + 1
        case _ =>
          val start = i
          while (i < s.length && !s.charAt(i).isWhitespace &&
            "()\"".indexOf(s.charAt(i)) < 0) i += 1
          s.substring(start, i).toUpperCase match {
            case "AND" => out += TAnd
            case "OR"  => out += TOr
            case "NOT" => out += TNot
            case _     => out += TWord(s.substring(start, i))
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
      case LPar | TNot | TPhrase(_) | TWord(_) => true
      case _                                   => false
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
      case Some(TPhrase(p)) => next(); BPhrase(p)
      case Some(TWord(w))   => next(); BTerm(w)
      case Some(t)          => throw ParseError(s"unexpected '$t'")
      case None             => throw ParseError("unexpected end of query")
    }

    if (toks.isEmpty) throw ParseError("empty query")
    val result = expr()
    if (pos != toks.length) throw ParseError("unexpected trailing ')'")
    result
  }
}
