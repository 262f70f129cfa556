package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{expressions => native}

/** Vector math over `array<float>`/`array<double>` embedding columns.
  *
  * The default entry points delegate to the native codegen'd Catalyst
  * expressions (org.apache.spark.sql.graft.expressions); the `Hof`
  * variants are the same math composed from higher-order built-ins
  * (`zip_with`/`aggregate`) — kept as the readable reference
  * implementation and as the benchmark baseline the native versions
  * are measured against.
  */
object VectorFunctions {

  /** Widen a float array to double (exact). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def cosineSim(a: Column, b: Column): Column =
    native.cosine_sim(asDouble(a), asDouble(b))

  def dotProduct(a: Column, b: Column): Column =
    native.dot_product(asDouble(a), asDouble(b))

  def simhash64(tokens: Column): Column = native.simhash64(tokens)

  def l2Norm(v: Column): Column = sqrt(dotProduct(v, v))

  // ------------------------------------------------------------------
  // Higher-order-function reference implementations.

  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def cosineSimHof(a: Column, b: Column): Column = {
    val dot = dotProductHof(a, b)
    val na = dotProductHof(a, a)
    val nb = dotProductHof(b, b)
    when(na === 0.0 || nb === 0.0, 0.0)
      .otherwise(dot / (sqrt(na) * sqrt(nb)))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of projections
    * onto deterministic pseudo-random hyperplanes, packed into a
    * Long. Planes are derived from xxhash64(seed, plane, dim) — no
    * driver-side randomness, identical on every executor, stable
    * across runs. Cosine-similar vectors agree on most bits.
    */
  def hyperplaneSig(v: Column, bits: Int = 16, seed: Int = 7): Column = {
    require(bits >= 1 && bits <= 63, "bits must be in [1,63]")
    val dv = asDouble(v)
    val planeBits = (0 until bits).map { p =>
      // plane_p[i] in {-1,+1} from a hash of (seed, p, i): a cheap
      // Rademacher hyperplane, good enough for bucketing.
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(dv) - 1), (x, i) =>
          when(pmod(xxhash64(lit(seed), lit(p), i), lit(2)) === 0, x)
            .otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    planeBits.reduce(_.bitwiseOR(_))
  }

  /** Multi-table LSH signatures (the OR-construction): `tables`
    * independent `bits`-bit hyperplane signatures. A single b-bit
    * table has recall p^b at per-bit agreement p — hopeless for
    * moderate similarity; L tables lift it to 1-(1-p^b)^L. `bits`
    * scales with corpus size (bucket occupancy), `tables` buys
    * recall. Returns array<long>, index = table id.
    */
  def hyperplaneSigs(
      v: Column, bits: Int, tables: Int, seed: Int = 7): Column =
    array((0 until tables).map(t =>
      hyperplaneSig(v, bits, seed * 1009 + t)): _*)
}
