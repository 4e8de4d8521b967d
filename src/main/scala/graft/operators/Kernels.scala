package graft.operators

/**
 * Shared scalar kernels for the operator package — ONE definition each of the
 * SplitMix64 finalizer and the ASCII whitespace set. Both were previously
 * duplicated verbatim between [[Dedup]] and [[Similarity]] (and the separator
 * set between two tokenizers inside [[Dedup]]); the minhash/simhash/LSH
 * kernels and their exact-verify counterparts depend on these matching
 * EXACTLY, so a drift between copies would silently break cross-kernel
 * hash/tokenization consistency.
 */
private[operators] object Kernels {

  /** SplitMix64 finalizer (public-domain constant mix; the deterministic
    * hash behind minhash seeds, simhash features, and LSH plane entries). */
  @inline def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** The 6-char ASCII whitespace separator set shared by every tokenizer
    * (matches the Catalyst `\s`-class splits the SQL verifies use on this
    * ASCII corpus). */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B
}
