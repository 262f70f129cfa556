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

  /** Native cosine: accepts array<float>/array<double> directly (the
    * expression widens elements in-register, bit-identical to casting
    * the array first but without the per-row allocation).
    */
  def cosineSim(a: Column, b: Column): Column =
    native.cosine_sim(a, b)

  def dotProduct(a: Column, b: Column): Column =
    native.dot_product(a, b)

  def simhash64(tokens: Column): Column = native.simhash64(tokens)

  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    native.minhash_signature(shingleHashes, numHashes)

  /** Sorted distinct xxhash64 values of word n-gram shingles,
    * computed natively from the raw text bytes (no string
    * materialization — see ShingleHashes scaladoc).
    */
  def shingleHashes(text: Column, n: Int): Column =
    native.shingle_hashes(text, n)

  /** Jaccard over two SORTED distinct long arrays (linear merge,
    * no hash set) — pairs with shingleHashes' output shape.
    */
  def jaccardSorted(a: Column, b: Column): Column =
    native.jaccard_sorted(a, b)

  def l2Norm(v: Column): Column = sqrt(dotProduct(v, v))

  /** Symmetric int8 scalar quantization to BINARY codes: byte i =
    * clamp(round(v_i / scale), -127, 127). With scale = maxAbs/127
    * the per-component reconstruction error is <= scale/2 — the
    * bound the streaming vector probe's prefilter rests on.
    */
  def int8Codes(v: Column, scale: Column): Column =
    native.int8_codes(v, scale)

  /** Unscaled dot of exact vector against int8 codes: sum v_i *
    * codes_i (caller multiplies by the row's scale). +Infinity on
    * length mismatch — the sound (never-drop) direction.
    */
  def int8Dot(codes: Column, v: Column): Column =
    native.int8_dot(codes, v)

  /** maxAbs(v)/127 — the [[int8Codes]] scale of one vector. */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)

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

  /** Deterministic Rademacher (+-1) hyperplane, embedded as a plan
    * literal: sign i = parity of splitmix64(seed, plane, i). Computed
    * once on the driver, shipped inside the serialized plan — no
    * per-row hashing, no executor-side randomness, stable across runs
    * and JVMs (pure integer arithmetic).
    */
  private def planeLit(dim: Int, seed: Long): Column = {
    val arr = Array.tabulate(dim) { i =>
      if ((splitmix64(seed * 0x9E3779B97F4A7C15L + i) & 1L) == 0L) 1.0 else -1.0
    }
    lit(arr)
  }

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of projections
    * onto literal +-1 hyperplanes (native dot product per plane),
    * packed into a Long. `dim` must match the vector dimension.
    * Cosine-similar vectors agree on a bit with prob 1 - theta/pi.
    */
  def hyperplaneSig(v: Column, bits: Int, dim: Int, seed: Int = 7): Column = {
    require(bits >= 1 && bits <= 63, "bits must be in [1,63]")
    val planeBits = (0 until bits).map { p =>
      val proj = dotProduct(v, planeLit(dim, seed.toLong * 7919L + p))
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    planeBits.reduce(_.bitwiseOR(_))
  }

  /** The exact +-1 plane tensor [[hyperplaneSigs]] embeds as plan
    * literals, exported for oracle generators: [tables][bits][dim].
    * Same splitmix64 arithmetic, so an oracle that inlines this
    * matrix replays the engine's signatures bit-for-bit without
    * copying a frozen literal into the SQL source.
    */
  def planeMatrix(bits: Int, tables: Int, dim: Int,
      seed: Int = 7): Seq[Seq[Seq[Double]]] =
    (0 until tables).map { t =>
      val s = seed * 1009 + t
      (0 until bits).map { p =>
        Seq.tabulate(dim) { i =>
          if ((splitmix64((s.toLong * 7919L + p) *
            0x9E3779B97F4A7C15L + i) & 1L) == 0L) 1.0 else -1.0
        }
      }
    }

  /** Multi-table LSH signatures (the OR-construction): `tables`
    * independent `bits`-bit hyperplane signatures. A single b-bit
    * table has recall p^b at per-bit agreement p — hopeless for
    * moderate similarity; L tables lift it to 1-(1-p^b)^L. `bits`
    * scales with corpus size (bucket occupancy), `tables` buys
    * recall. Returns array<long>, index = table id.
    *
    * Delegates to the fused native expression (one codegen call, one
    * cached plane tensor) — bit-identical to the composed
    * per-plane-dot-product form (ExpressionSpec pins the equality),
    * which at refinement depth (16 planes x 12 tables) exceeded
    * Janino's 64 KB method limit and fell out of codegen.
    */
  def hyperplaneSigs(
      v: Column, bits: Int, tables: Int, dim: Int, seed: Int = 7): Column =
    native.hyperplane_sigs(v, bits, tables, dim, seed)

  /** The composed reference form of [[hyperplaneSigs]] (per-plane
    * DotProduct columns) — kept as the equality baseline the fused
    * expression is spec-checked against.
    */
  def hyperplaneSigsComposed(
      v: Column, bits: Int, tables: Int, dim: Int, seed: Int = 7): Column =
    array((0 until tables).map(t =>
      hyperplaneSig(v, bits, dim, seed * 1009 + t)): _*)

  /** Achlioptas (+-1) random projection into `projDim` dimensions —
    * the Johnson-Lindenstrauss sketch with integer-deterministic
    * planes: component p = dot(v, r_p) where r_p is the same literal
    * +-1 plane family hyperplaneSig signs. Keeping the MAGNITUDE
    * (not just the sign bit) preserves cosine geometry in
    * expectation with variance ~1/projDim, so a 64-dim corpus scans
    * as 16 doubles. No scaling factor: cosine is scale-invariant.
    * Planes are driver-computed plan literals — no executor
    * randomness, stable across runs/JVMs.
    */
  def randProj(
      v: Column, projDim: Int, dim: Int, seed: Int = 11): Column =
    array((0 until projDim).map(p =>
      dotProduct(v, planeLit(dim, seed.toLong * 15485863L + p))): _*)
}
