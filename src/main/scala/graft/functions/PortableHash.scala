package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact uniform hashing — the q49/q50 "md5-prefix
  * 60-bit" construction, factored out for every sketch/LSH operator
  * that wants a DRIVER-CHECKABLE twin: md5 is md5 in every engine,
  * the first 15 hex chars are a uniform 60-bit integer, and both
  * Spark (`conv(substring(md5(x), 1, 15), 16, 10)`) and DuckDB
  * (`('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT`) produce the
  * SAME non-negative int64. The native xxhash64 family stays the hot
  * path (codegen'd, no string materialization); this family exists so
  * the identical pipeline code can run with an oracle-replayable hash.
  */
object PortableHash {

  /** 60-bit md5-prefix uniform hash of a string column.
    * DuckDB replay: `('0x' || substr(md5(X), 1, 15))::UBIGINT::BIGINT`.
    * Native fused expression (the value reads straight off the digest
    * bytes); bit-identical to the original
    * `conv(substring(md5(c), 1, 15), 16, 10)` composition, which
    * allocated three intermediate strings per call — ExpressionSpec
    * pins the equality on random inputs.
    */
  def uniform60(c: Column): Column =
    org.apache.spark.sql.graft.expressions.md5_uniform60(c)

  /** Bits 60..119 of the SAME digest — the second independent 60-bit
    * value the [[permuteFrom]] family pairs with [[uniform60]].
    * DuckDB replay: `('0x' || substr(md5(X), 16, 15))::UBIGINT::BIGINT`.
    */
  def uniform60Tail(c: Column): Column =
    org.apache.spark.sql.graft.expressions.md5_uniform60_tail(c)

  private val Mask30 = (1L << 30) - 1
  private val Mask60 = (1L << 60) - 1

  /** Seeded permutation family via Kirsch–Mitzenmacher double
    * hashing: permutation `i` of a key with hash pair (h1, h2) is
    * `(h1 + i*h2) mod 2^60`. One md5 digest yields EVERY permutation
    * (vs the previous per-(key, i) rehash, which cost `numHashes`
    * digests per key — the asymptotic cost of the portable MinHash
    * family at web-scale shingle vocabularies). The arithmetic is
    * exact, overflow-free int64 in both engines: split h2 at bit 30,
    * reduce the high product mod 2^30 before re-widening — every
    * intermediate stays < 2^61. Requires 0 <= i < 2^30.
    *
    * Standard KM caveat: a key with h2 = 0 gets the same value for
    * all i (probability 2^-60 per key) — the family trades that for
    * one-digest cost, exactly as production MinHash libraries do.
    */
  def permuteFrom(h1: Column, h2: Column, i: Column): Column = {
    val hi = shiftright(h2, 30)
    val lo = h2.bitwiseAND(lit(Mask30))
    (h1 + (i * hi).bitwiseAND(lit(Mask30)) * lit(1L << 30) + i * lo)
      .bitwiseAND(lit(Mask60))
  }

  /** DuckDB SQL fragment computing [[uniform60]] of expression `x`. */
  def sqlUniform60(x: String): String =
    s"('0x' || substr(md5($x), 1, 15))::UBIGINT::BIGINT"

  /** DuckDB SQL fragment computing [[uniform60Tail]] of `x`. */
  def sqlUniform60Tail(x: String): String =
    s"('0x' || substr(md5($x), 16, 15))::UBIGINT::BIGINT"

  /** DuckDB SQL fragment computing [[permuteFrom]] of (`h1`,`h2`,`i`)
    * — the same overflow-free split arithmetic, `//`/`%` on
    * non-negative BIGINTs.
    */
  def sqlPermuteFrom(h1: String, h2: String, i: String): String =
    s"""(($h1) + ((($i) * (($h2) // 1073741824)) % 1073741824)
        * 1073741824 + ($i) * (($h2) % 1073741824))
        % 1152921504606846976"""
}
