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

  /** Seeded permutation of an int64 hash — "one strong hash, many
    * seeds": rehash the decimal rendering of (h, i). Both engines
    * render a non-negative BIGINT identically, so
    * `md5(CAST(h AS VARCHAR) || ':' || CAST(i AS VARCHAR))` replays.
    */
  def permute60(h: Column, i: Column): Column =
    uniform60(concat(h.cast("string"), lit(":"), i.cast("string")))

  /** DuckDB SQL fragment computing [[uniform60]] of expression `x`. */
  def sqlUniform60(x: String): String =
    s"('0x' || substr(md5($x), 1, 15))::UBIGINT::BIGINT"

  /** DuckDB SQL fragment computing [[permute60]] of (`h`, `i`). */
  def sqlPermute60(h: String, i: String): String =
    sqlUniform60(s"CAST($h AS VARCHAR) || ':' || CAST($i AS VARCHAR)")
}
