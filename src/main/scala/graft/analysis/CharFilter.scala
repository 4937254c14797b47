package graft.analysis

/** Pre-tokenization character-level text transform
  * (`/root/reference/char_filter.go:5-7`). */
trait CharFilter extends Serializable {
  def filter(s: String): String
}

/** Literal (non-regex) substring replacement for each mapping entry.
  *
  * The reference iterates a Go map (`/root/reference/char_filter.go:17-22`),
  * whose iteration order is randomized — nondeterministic when patterns
  * overlap. We take an ordered Seq and apply replacements in insertion order,
  * making the latent nondeterminism deterministic.
  */
final case class MappingCharFilter(mappings: Seq[(String, String)]) extends CharFilter {
  override def filter(s: String): String =
    mappings.foldLeft(s) { case (acc, (k, v)) => acc.replace(k, v) }
}

object MappingCharFilter {
  def apply(m: Map[String, String]): MappingCharFilter =
    MappingCharFilter(m.toSeq.sortBy(_._1)) // deterministic order from a Map
}
