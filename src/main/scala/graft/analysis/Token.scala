package graft.analysis

/** A single analyzed token.
  *
  * Mirrors the reference's token abstraction (`/root/reference/token.go:3-9`):
  * `term` is the indexed form, `kana` carries the Japanese reading for the
  * morphological path and is empty otherwise. A token's position in the index
  * is its ordinal in the *filtered* stream, not a character offset
  * (`/root/reference/indexer.go:64-71`).
  */
final case class Token(term: String, kana: String = "")

object TokenStream {
  /** Ordered token stream; position of a token = its index in this Seq. */
  type TokenStream = Vector[Token]
  val empty: TokenStream = Vector.empty
}
