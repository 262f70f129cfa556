package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch

/** Native Catalyst expressions for the engine's hot paths.
  *
  * Hosted under org.apache.spark.sql (the standard extension-package
  * pattern) because `AbstractDataType`/`ExpressionUtils` are
  * private[sql]. Everything here is public-Spark-API knowledge: the
  * Expression/codegen contracts from the Spark source tree.
  *
  * Rationale (SURVEY.md §7): `aggregate`/`zip_with` compositions walk
  * arrays multiple times and allocate intermediates; Scala UDFs
  * deserialize to boxed collections. These expressions read raw
  * `ArrayData` once, allocation-free, inside whole-stage codegen —
  * the difference compounds over a 100 TB similarity or dedup scan.
  */
object expressions {

  // -------------------------------------------------------------------
  /** Cosine similarity of two numeric arrays in one fused loop,
    * accumulated in double. Accepts array<float> AND array<double>
    * natively — no per-row widening cast is materialized ((double)f
    * in-register equals the cast array's element bit-for-bit, so
    * results are identical either way, just without the allocation).
    * Null if either input is null; 0.0 on length mismatch or zero
    * norm (never NaN).
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

    override def dataType: DataType = DoubleType

    override def prettyName: String = "cosine_sim"

    private def floatSide(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return 0.0d
      val fx = floatSide(left)
      val fy = floatSide(right)
      var dot = 0.0d
      var nx = 0.0d
      var ny = 0.0d
      var i = 0
      while (i < n) {
        val xi = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
        dot += xi * yi
        nx += xi * xi
        ny += yi * yi
        i += 1
      }
      if (nx == 0.0d || ny == 0.0d) 0.0d
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val gx = if (floatSide(left)) "getFloat" else "getDouble"
        val gy = if (floatSide(right)) "getFloat" else "getDouble"
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
          final int $n = $x.numElements();
          if ($n != $y.numElements()) {
            ${ev.value} = 0.0d;
          } else {
            double $dot = 0.0d; double $nx = 0.0d; double $ny = 0.0d;
            for (int $i = 0; $i < $n; $i++) {
              final double $xi = (double) $x.$gx($i);
              final double $yi = (double) $y.$gy($i);
              $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
            }
            ${ev.value} = ($nx == 0.0d || $ny == 0.0d)
              ? 0.0d
              : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
          }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------------------
  /** Dot product of two double arrays (fused loop, codegen). Same
    * null/length conventions as CosineSimilarity (0.0 on mismatch).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

    override def dataType: DataType = DoubleType

    override def prettyName: String = "dot_product"

    private def floatSide(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return 0.0d
      val fx = floatSide(left)
      val fy = floatSide(right)
      var dot = 0.0d
      var i = 0
      while (i < n) {
        val xi = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
        dot += xi * yi
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val gx = if (floatSide(left)) "getFloat" else "getDouble"
        val gy = if (floatSide(right)) "getFloat" else "getDouble"
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
          final int $n = $x.numElements();
          double $dot = 0.0d;
          if ($n == $y.numElements()) {
            for (int $i = 0; $i < $n; $i++) {
              $dot += ((double) $x.$gx($i)) * ((double) $y.$gy($i));
            }
          }
          ${ev.value} = $dot;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------------------
  /** Multi-table hyperplane-LSH signatures in ONE fused expression:
    * `tables` signatures of `bits` sign bits each (bit p = sign of
    * the projection onto deterministic +-1 plane (t, p)), identical
    * arithmetic to composing `tables x bits` [[DotProduct]] calls
    * against [[graft.functions.VectorFunctions.planeMatrix]] literals
    * (left-to-right double accumulation; length mismatch -> proj 0.0
    * -> bit set), but O(1) expression nodes instead of O(tables x
    * bits x dim) — the composed form at refinement depth (16 planes x
    * 12 tables x 64 dims) blew Janino's 64 KB method limit and fell
    * out of codegen entirely. Planes are cached per
    * (bits, tables, dim, seed) in a process-wide table; the same pure
    * splitmix64 arithmetic runs on every executor, so no plane data
    * ships with the plan at all.
    */
  case class HyperplaneSigs(
      child: Expression, bits: Int, tables: Int, dim: Int, seed: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def prettyName: String = "hyperplane_sigs"

    private def isFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(input: Any): Any =
      HyperplaneUtil.evalSigs(input.asInstanceOf[ArrayData], isFloat,
        bits, tables, dim, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = org.apache.spark.sql.graft.HyperplaneUtil.evalSigs(
          $a, $isFloat, $bits, $tables, $dim, $seed);
      """)

    override protected def withNewChildInternal(c: Expression): HyperplaneSigs =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  /** 64-bit SimHash over an array of string tokens.
    *
    * Each token is hashed with two 32-bit Murmur3 passes (different
    * seeds) combined into 64 bits — the same public Murmur3 Spark's
    * `hash()` uses — then the classic Charikar bit-vote: per bit,
    * +1 if set else -1, summed over tokens; the fingerprint has bit i
    * set iff vote(i) > 0. Near-duplicate docs differ in few bits
    * (compare with `bit_count(a ^ b)`).
    *
    * Null if the token array is null; null tokens are skipped.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType))

    override def dataType: DataType = LongType

    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any =
      SimHashUtil.evalArray(input.asInstanceOf[ArrayData])

    // Murmur3 over UTF8String bytes is not worth inlining as Java
    // source; call back into the static helper (still inside
    // whole-stage codegen, no boxing).
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graft.SimHashUtil.evalArray($a);")

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  /** MinHash signature over an array of shingle hashes: one fused
    * pass computing all `numHashes` minima. Permutation i of shingle
    * hash h is xxhash64(h, seed=i) — the "one strong hash, many
    * seeds" construction, computed in-register.
    *
    * Replaces the `transform(sequence(0,n-1), i -> array_min(
    * transform(hashes, h -> xxhash64(h,i))))` HOF composition, which
    * allocates n intermediate arrays per row and runs interpreted —
    * ~30x slower (the difference between 217 s and 7 s on the sf0.1
    * dedup bench, and the difference between feasible and not at
    * 100 TB).
    *
    * Null input or empty array -> null signature (docs too short to
    * shingle are excluded from LSH).
    */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType))

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullable: Boolean = true

    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(input: Any): Any =
      MinHashUtil.evalArray(input.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} =
          org.apache.spark.sql.graft.MinHashUtil.evalArray($a, $numHashes);
        ${ev.isNull} = (${ev.value} == null);
      """)

    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  /** Word-shingle hashes straight from the raw UTF8 bytes: tokenize
    * on spaces, hash each n-token window (tokens joined by a single
    * space) with xxhash64, return the SORTED DISTINCT hash array.
    *
    * This replaces the `array_distinct(transform(sequence(...),
    * i -> concat_ws(" ", slice(tokens, i, n))))` composition that
    * materializes every shingle as a new string — the dominant cost
    * of the MinHash dedup pipeline. Downstream, Jaccard on distinct
    * hash arrays equals Jaccard on shingle sets (collisions are
    * ~2^-64). Sorted output also makes array_intersect cheap.
    *
    * Null text -> null; fewer than n tokens -> empty array.
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(input: Any): Any =
      ShingleUtil.evalText(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graft.ShingleUtil.evalText($a, $n);")

    override protected def withNewChildInternal(c: Expression): ShingleHashes =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  /** Word n-gram shingles as STRINGS ("a b c"), in document order,
    * duplicates preserved; empty array when the doc has fewer than n
    * tokens. The string twin of ShingleHashes for surfaces that need
    * the n-gram text itself (vocabulary counts, decontamination,
    * oracle-checkable outputs).
    *
    * Exists because the equivalent HOF pipeline —
    * `transform(sequence(...), i -> concat_ws(' ', slice(tokens(text),
    * i+1, n)))` — re-evaluates the whole tokenize subtree once PER
    * ELEMENT (lambda args are expression trees, not bound values), an
    * O(tokens^2) split per document. This expression tokenizes once
    * and slices byte spans.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    override def prettyName: String = "word_shingles"

    override def nullSafeEval(input: Any): Any =
      ShingleUtil.evalStrings(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graft.ShingleUtil.evalStrings($a, $n);")

    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  /** Jaccard similarity of two SORTED long arrays (the shape
    * ShingleHashes emits) via a single linear merge — no hash set, no
    * intermediate intersection array. |A∩B| / (|A|+|B|-|A∩B|); 0.0
    * when both sides are empty; null if either input is null.
    *
    * Inputs MUST be sorted ascending and distinct (as produced by
    * ShingleHashes); unsorted inputs give garbage, which is why this
    * is exposed as jaccard_sorted, not jaccard.
    */
  case class JaccardSorted(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))

    override def dataType: DataType = DoubleType

    override def prettyName: String = "jaccard_sorted"

    override def nullSafeEval(a: Any, b: Any): Any =
      JaccardUtil.evalSorted(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = org.apache.spark.sql.graft.JaccardUtil.evalSorted($x, $y);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaccardSorted =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------------------
  /** Membership probe against a pre-built Bloom filter
    * (`org.apache.spark.util.sketch.BloomFilter`, serialized). The
    * filter bytes ride inside the expression — a few hundred KB in
    * the task closure — so the probe runs as a plain codegen'd scan
    * filter with NO join and NO shuffle of the probed side.
    *
    * This is the join-reduction primitive for 100 TB scrubs: when the
    * key set is too large to broadcast as a hash relation but its
    * Bloom sketch is not, prefilter the big side down to candidates
    * and run the exact (shuffle) semi-join on survivors only. False
    * positives are possible (callers MUST verify exactly); false
    * negatives are not.
    */
  case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

    override def dataType: DataType = BooleanType

    override def prettyName: String = "bloom_might_contain"

    @transient private lazy val filter: sketch.BloomFilter =
      sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes))

    /** Public for generated code (referenced via addReferenceObj). */
    def mightContain(v: Long): Boolean = filter.mightContainLong(v)

    override def nullSafeEval(v: Any): Any =
      filter.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // Reference the expression itself, not the deserialized filter:
      // the expression is Serializable by construction and rebuilds
      // its transient filter once per executor.
      val ref = ctx.addReferenceObj("bloomProbe", this,
        "org.apache.spark.sql.graft.expressions.BloomMightContain")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $ref.mightContain($v);")
    }

    override protected def withNewChildInternal(c: Expression): BloomMightContain =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  /** Point estimate against a pre-built Count-Min sketch
    * (`org.apache.spark.util.sketch.CountMinSketch`, serialized).
    * Same deployment shape as [[BloomMightContain]]: the sketch rides
    * in the expression, the probe is a codegen'd per-row lookup with
    * no join and no shuffle. Estimates NEVER undercount; they
    * overcount by at most eps*totalCount (w.p. >= confidence), so a
    * `cms_estimate(x) >= T` filter keeps a superset of the true
    * heavy hitters — exactly the prefilter contract.
    */
  case class CmsEstimate(child: Expression, cmsBytes: Array[Byte])
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

    override def dataType: DataType = LongType

    override def prettyName: String = "cms_estimate"

    @transient private lazy val cms: sketch.CountMinSketch =
      sketch.CountMinSketch.readFrom(cmsBytes)

    /** Public for generated code (referenced via addReferenceObj). */
    def estimate(v: Long): Long =
      cms.estimateCount(java.lang.Long.valueOf(v))

    override def nullSafeEval(v: Any): Any =
      estimate(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmsProbe", this,
        "org.apache.spark.sql.graft.expressions.CmsEstimate")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $ref.estimate($v);")
    }

    override protected def withNewChildInternal(c: Expression): CmsEstimate =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  /** Shannon entropy (bits) of the byte-value distribution of a
    * string — a cheap, language-agnostic quality signal: natural text
    * sits ~4.0–4.5 bits/byte, base64/hex blobs higher, repeated
    * boilerplate lower. On ASCII corpora byte entropy IS character
    * entropy. One pass over the raw bytes into a 256-cell histogram,
    * then a fixed ascending-index fold (deterministic summation
    * order). Empty string -> 0.0; null -> null.
    */
  case class ByteEntropy(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

    override def dataType: DataType = DoubleType

    override def prettyName: String = "byte_entropy"

    override def nullSafeEval(s: Any): Any =
      ByteEntropyUtil.entropy(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""${ev.value} =
           org.apache.spark.sql.graft.ByteEntropyUtil.entropy($v);""")

    override protected def withNewChildInternal(c: Expression): ByteEntropy =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  /** Jaro-Winkler similarity of two strings — the standard record-
    * linkage kernel for short entity strings (names, titles). Byte-
    * level matching over the UTF-8 encoding (codegen-friendly, and
    * identical to character-level on ASCII); classic parameters:
    * match window floor(max/2)-1, Winkler prefix boost p=0.1 over at
    * most 4 leading bytes, applied only when jaro > 0.7. Either side
    * empty -> 0.0 (NOT the textbook both-empty->1.0: similarity of
    * nothing is no evidence of linkage, and this convention matches
    * common engine implementations so thresholds transfer). Null if
    * either input is null.
    *
    * The arithmetic is pinned to the canonical evaluation order
    * ((m/l1 + m/l2 + (m-t)/m)/3, then jr + l*0.1*(1-jr)) so results
    * are bit-for-bit reproducible across engines that follow the
    * same definition — d15's oracle hash-checks the raw double.
    */
  /** The md5-prefix 60-bit uniform hash (PortableHash.uniform60 /
    * q49/q50's cross-engine hash), fused: the value IS the first 60
    * bits of the digest, so it reads straight off the digest bytes —
    * the `conv(substring(md5(x), 1, 15), 16, 10)` composition this
    * replaces hex-encodes the digest to a 32-char string, substrings
    * it, and parses it back through a base converter, three UTF8String
    * allocations per call on the portable dedup family's hottest path
    * (one call per shingle occurrence). Bit-identical by construction:
    * 15 hex chars = bytes 0..6 + the high nibble of byte 7,
    * big-endian, always non-negative. DuckDB replay unchanged:
    * `('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT`.
    */
  case class Md5Uniform60(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

    override def dataType: DataType = LongType

    override def prettyName: String = "md5_uniform60"

    override def nullSafeEval(input: Any): Any =
      Md5Util.uniform60(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graft.Md5Util.uniform60($a);")

    override protected def withNewChildInternal(c: Expression): Md5Uniform60 =
      copy(child = c)
  }

  /** Bits 60..119 of the md5 digest (hex chars 16..30) — the second
    * independent 60-bit value the Kirsch–Mitzenmacher-style MinHash
    * permutation family needs (permutation i = h1 + i·h2 mod 2^60,
    * one digest instead of one md5 per permutation). DuckDB replay:
    * `('0x' || substr(md5(x), 16, 15))::UBIGINT::BIGINT`.
    */
  case class Md5Uniform60Tail(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

    override def dataType: DataType = LongType

    override def prettyName: String = "md5_uniform60_tail"

    override def nullSafeEval(input: Any): Any =
      Md5Util.uniform60Tail(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graft.Md5Util.uniform60Tail($a);")

    override protected def withNewChildInternal(c: Expression): Md5Uniform60Tail =
      copy(child = c)
  }

  // -------------------------------------------------------------------
  case class JaroWinkler(
      left: Expression, right: Expression,
      threshold: Option[Double] = None)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(StringType, StringType)

    override def dataType: DataType = DoubleType

    override def prettyName: String = "jaro_winkler"

    // threshold = Some(t): the expression only feeds a `>= t`
    // comparison (JaroWinklerThresholdRule installs it), so pairs the
    // length-ratio bound proves can't reach t return 0.0 WITHOUT
    // running the O(|a|*|b|) match loop. Bound (see
    // JaroWinklerUtil.similarityBounded): jw >= t requires
    // min(l1,l2)/max(l1,l2) >= 5t - 4.
    private val thr: Double = threshold.getOrElse(Double.NaN)

    override def nullSafeEval(a: Any, b: Any): Any =
      JaroWinklerUtil.similarityBounded(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], thr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""${ev.value} =
           org.apache.spark.sql.graft.JaroWinklerUtil.similarityBounded(
             $a, $b, ${if (thr.isNaN) "Double.NaN" else s"${thr}d"});""")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinkler =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------------------
  /** Symmetric int8 scalar quantization of a numeric vector: byte i =
    * clamp(round(v_i / scale), -127, 127), packed as BINARY (64 bytes
    * for a dim-64 vector — 8x smaller than the double array). With
    * `scale` = maxAbs(v)/127 every component is in range and the
    * reconstruction error per component is <= scale/2 — the bound the
    * streaming vector probe's candidate prefilter rests on
    * (VecDedupSync). scale <= 0 (a zero vector — filtered upstream by
    * vecDedupIndex, defended here) yields all-zero codes.
    */
  case class Int8Codes(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      DoubleType)

    override def dataType: DataType = BinaryType

    override def prettyName: String = "int8_codes"

    private def isFloat: Boolean = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      Int8Util.codes(a.asInstanceOf[ArrayData], isFloat,
        b.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, s) => s"""
        ${ev.value} = org.apache.spark.sql.graft.Int8Util.codes(
          $v, $isFloat, $s);
      """)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Int8Codes =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------------------
  /** Dot product of an exact numeric vector against [[Int8Codes]]
    * bytes (unscaled: the caller multiplies by the row's scale):
    * sum_i v_i * codes_i in double. One fused allocation-free loop —
    * this is the streaming vector probe's per-candidate-pair hot
    * path. Length mismatch (corrupt codes) returns +Infinity, which
    * makes any upper bound built on it SURVIVE the prefilter (the
    * exact verify then decides) — the sound direction, where the
    * 0.0-on-mismatch convention of the other vector expressions
    * could silently drop a true pair.
    */
  case class Int8Dot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(
      BinaryType,
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

    override def dataType: DataType = DoubleType

    override def prettyName: String = "int8_dot"

    private def isFloat: Boolean = right.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      Int8Util.dot(a.asInstanceOf[Array[Byte]],
        b.asInstanceOf[ArrayData], isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, v) => s"""
        ${ev.value} = org.apache.spark.sql.graft.Int8Util.dot(
          $c, $v, $isFloat);
      """)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Int8Dot =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------------------
  // Column-level API (the engine-facing surface).

  def byte_entropy(text: Column): Column =
    ExpressionUtils.column(ByteEntropy(ExpressionUtils.expression(text)))

  def jaro_winkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def minhash_signature(shingleHashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(shingleHashes), numHashes))

  def shingle_hashes(text: Column, n: Int): Column =
    ExpressionUtils.column(
      ShingleHashes(ExpressionUtils.expression(text), n))

  def word_shingles(text: Column, n: Int): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(text), n))

  def jaccard_sorted(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSorted(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def bloom_might_contain(hashed: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomMightContain(
      ExpressionUtils.expression(hashed), bloomBytes))

  def cms_estimate(hashed: Column, cmsBytes: Array[Byte]): Column =
    ExpressionUtils.column(CmsEstimate(
      ExpressionUtils.expression(hashed), cmsBytes))

  def hyperplane_sigs(v: Column, bits: Int, tables: Int, dim: Int,
      seed: Int): Column =
    ExpressionUtils.column(HyperplaneSigs(
      ExpressionUtils.expression(v), bits, tables, dim, seed))

  def md5_uniform60(text: Column): Column =
    ExpressionUtils.column(Md5Uniform60(ExpressionUtils.expression(text)))

  def md5_uniform60_tail(text: Column): Column =
    ExpressionUtils.column(Md5Uniform60Tail(ExpressionUtils.expression(text)))

  def int8_codes(v: Column, scale: Column): Column =
    ExpressionUtils.column(Int8Codes(
      ExpressionUtils.expression(v), ExpressionUtils.expression(scale)))

  def int8_dot(codes: Column, v: Column): Column =
    ExpressionUtils.column(Int8Dot(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(v)))
}

/** Shared by the Int8 expressions' eval and generated code (Janino
  * references it by literal name).
  */
object Int8Util {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def codes(v: ArrayData, isFloat: Boolean, scale: Double): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    if (scale <= 0.0d) return out
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val q = Math.round(x / scale)
      out(i) = Math.max(-127L, Math.min(127L, q)).toByte
      i += 1
    }
    out
  }

  def dot(codes: Array[Byte], v: ArrayData, isFloat: Boolean): Double = {
    val n = codes.length
    if (n != v.numElements()) return Double.PositiveInfinity
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      acc += x * codes(i).toDouble
      i += 1
    }
    acc
  }
}

/** Shared by Md5Uniform60.eval and its generated code (Janino
  * references it by literal name).
  */
object Md5Util {
  import org.apache.spark.unsafe.types.UTF8String

  /** First 60 bits of md5(utf8 bytes), big-endian — equals
    * `conv(substring(hex(md5), 1, 15), 16, 10)`: bytes 0..6 are the
    * first 14 hex nibbles, the high nibble of byte 7 is the 15th.
    */
  def uniform60(s: UTF8String): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Bits 60..119 of md5(utf8 bytes) — hex chars 16..30: the low
    * nibble of byte 7 followed by bytes 8..14. Equals
    * `conv(substring(hex(md5), 16, 15), 16, 10)`.
    */
  def uniform60Tail(s: UTF8String): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    var v = d(7) & 0x0fL
    var i = 8
    while (i < 15) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }
}

/** Top-level (stable-classname) helper shared by JaroWinkler.eval and
  * its generated code — Janino references it by literal name.
  */
object JaroWinklerUtil {
  import org.apache.spark.unsafe.types.UTF8String

  /** Threshold-aware entry: when `thr` is set (non-NaN) the caller
    * only cares whether the similarity reaches `thr`, so pairs the
    * length bound disqualifies skip the match loop entirely.
    *
    * Bound derivation: every match m <= min(l1,l2), so
    *   jaro <= (min/l1 + min/l2 + 1)/3 = (2 + min/max)/3,
    * and the Winkler boost (prefix <= 4, p = 0.1) gives
    *   jw <= jaro + 0.4*(1 - jaro) = 0.6*jaro + 0.4.
    * Chaining: jw >= t  ==>  min/max >= 5t - 4 (useful for t > 0.8).
    * The 1e-12 slack absorbs the double rounding of 5t-4 so the
    * guard can only under-prune, never drop a qualifying pair.
    */
  def similarityBounded(
      a: UTF8String, b: UTF8String, thr: Double): Double = {
    if (!thr.isNaN && thr > 0.8) {
      val l1 = a.numBytes()
      val l2 = b.numBytes()
      val mn = if (l1 < l2) l1 else l2
      val mx = if (l1 < l2) l2 else l1
      if (mn.toDouble < (5.0 * thr - 4.0 - 1e-12) * mx) return 0.0
    }
    similarity(a, b)
  }

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = {
      val w = (if (l1 > l2) l1 else l2) / 2 - 1
      if (w < 0) 0 else w
    }
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window < l2 - 1) i + window else l2 - 1
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched bytes out of order, halved
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val jr = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jr <= 0.7) return jr
    var l = 0
    val maxL = math.min(4, math.min(l1, l2))
    while (l < maxL && s1(l) == s2(l)) l += 1
    jr + l * 0.1 * (1.0 - jr)
  }
}

/** Top-level (stable-classname) helper shared by ByteEntropy.eval and
  * its generated code — Janino references it by literal name.
  */
object ByteEntropyUtil {
  import org.apache.spark.unsafe.types.UTF8String

  private val Log2 = math.log(2.0)

  def entropy(s: UTF8String): Double = {
    val b = s.getBytes
    val n = b.length
    if (n == 0) return 0.0
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(b(i) & 0xff) += 1; i += 1 }
    val dn = n.toDouble
    var ent = 0.0
    var k = 0
    while (k < 256) {
      val c = hist(k)
      if (c > 0) {
        val p = c / dn
        ent -= p * (math.log(p) / Log2)
      }
      k += 1
    }
    ent
  }
}

/** Top-level (stable-classname) helper shared by HyperplaneSigs.eval
  * and its generated code. The plane tensor is regenerated on demand
  * per (bits, tables, dim, seed) from the SAME splitmix64 arithmetic
  * as [[graft.functions.VectorFunctions.planeMatrix]] (the oracle
  * export) and cached process-wide — a few KB per configuration,
  * bounded by the distinct LSH configurations a job uses.
  */
object HyperplaneUtil {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Int),
      Array[Double]]()

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Flat [t][p][i] +-1 tensor; identical values to planeMatrix. */
  def planes(bits: Int, tables: Int, dim: Int, seed: Int): Array[Double] =
    cache.computeIfAbsent((bits, tables, dim, seed), _ => {
      val arr = new Array[Double](tables * bits * dim)
      var t = 0
      while (t < tables) {
        val s = seed * 1009 + t // Int arithmetic, as hyperplaneSigs
        var p = 0
        while (p < bits) {
          val ps = s.toLong * 7919L + p
          var i = 0
          while (i < dim) {
            arr((t * bits + p) * dim + i) =
              if ((splitmix64(ps * 0x9E3779B97F4A7C15L + i) & 1L) == 0L) 1.0
              else -1.0
            i += 1
          }
          p += 1
        }
        t += 1
      }
      arr
    })

  /** Public for generated code. Bit p of table t = sign of the
    * left-to-right double dot product with plane (t, p); a vector
    * whose length differs from `dim` projects to 0.0 on every plane
    * (bit set) — both exactly the composed DotProduct semantics.
    */
  def evalSigs(v: ArrayData, isFloat: Boolean, bits: Int, tables: Int,
      dim: Int, seed: Int): ArrayData = {
    val pl = planes(bits, tables, dim, seed)
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < bits) {
        var proj = 0.0d
        if (n == dim) {
          val off = (t * bits + p) * dim
          var i = 0
          while (i < n) {
            val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
            proj += xi * pl(off + i)
            i += 1
          }
        }
        if (proj >= 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Top-level (stable-classname) helper shared by SimHash64.eval and
  * its generated code — Janino references it by literal name.
  */
object SimHashUtil {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.hash.Murmur3_x86_32
  import org.apache.spark.unsafe.types.UTF8String

  /** Two seeded 32-bit Murmur3 hashes of the token bytes, packed. */
  def tokenHash(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes2(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 41)
    val hi = Murmur3_x86_32.hashUnsafeBytes2(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 83)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** Charikar bit-vote over the token hashes. */
  def evalArray(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = tokenHash(arr.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Top-level helper for MinHashSignature (stable classname for
  * Janino-generated code).
  */
object MinHashUtil {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** All-minima pass: sig[i] = min over shingle hashes h of
    * xxhash64(h, seed=i). Returns null for empty inputs.
    */
  def evalArray(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = arr.getLong(t)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashLong(h, i)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }
}

/** Top-level helper for ShingleHashes (stable classname for
  * Janino-generated code).
  */
object ShingleUtil {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  private val Seed = 42L

  /** Tokenize on 0x20, hash every n-token window joined by single
    * spaces, sort + dedup in place.
    */
  def evalText(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // token spans: starts(i) inclusive, ends(i) exclusive
    var count = 0
    var i = 0
    val len = bytes.length
    var starts = new Array[Int](math.max(8, len / 4))
    var ends = new Array[Int](starts.length)
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) {
        val s0 = i
        while (i < len && bytes(i) != ' ') i += 1
        if (count == starts.length) {
          starts = java.util.Arrays.copyOf(starts, count * 2)
          ends = java.util.Arrays.copyOf(ends, count * 2)
        }
        starts(count) = s0
        ends(count) = i
        count += 1
      }
    }
    if (count < n) return new GenericArrayData(Array.empty[Long])
    val nShingles = count - n + 1
    val hashes = new Array[Long](nShingles)
    // reusable join buffer sized to the longest window
    var maxWin = 0
    var w = 0
    while (w < nShingles) {
      val need = ends(w + n - 1) - starts(w)
      if (need > maxWin) maxWin = need
      w += 1
    }
    val buf = new Array[Byte](maxWin)
    w = 0
    while (w < nShingles) {
      // join tokens w..w+n-1 with single spaces into buf
      var pos = 0
      var t = w
      while (t < w + n) {
        if (t > w) { buf(pos) = ' '; pos += 1 }
        val tl = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, pos, tl)
        pos += tl
        t += 1
      }
      hashes(w) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, Seed)
      w += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup
    var out = 0
    var r = 0
    while (r < nShingles) {
      if (r == 0 || hashes(r) != hashes(r - 1)) {
        hashes(out) = hashes(r)
        out += 1
      }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
  }

  /** Same tokenization as evalText, but emits each n-token window as
    * a single-space-joined STRING, in document order with duplicates
    * preserved (the vocabulary-count / decontamination shape; hash,
    * sort, dedup are the caller's choice).
    */
  def evalStrings(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    var count = 0
    var i = 0
    val len = bytes.length
    var starts = new Array[Int](math.max(8, len / 4))
    var ends = new Array[Int](starts.length)
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) {
        val s0 = i
        while (i < len && bytes(i) != ' ') i += 1
        if (count == starts.length) {
          starts = java.util.Arrays.copyOf(starts, count * 2)
          ends = java.util.Arrays.copyOf(ends, count * 2)
        }
        starts(count) = s0
        ends(count) = i
        count += 1
      }
    }
    if (count < n)
      return new GenericArrayData(Array.empty[AnyRef])
    val nShingles = count - n + 1
    val out = new Array[AnyRef](nShingles)
    var w = 0
    while (w < nShingles) {
      var need = n - 1 // single-space joints
      var t = w
      while (t < w + n) { need += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](need)
      var pos = 0
      t = w
      while (t < w + n) {
        if (t > w) { buf(pos) = ' '; pos += 1 }
        val tl = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, pos, tl)
        pos += tl
        t += 1
      }
      out(w) = UTF8String.fromBytes(buf)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Top-level helper for JaccardSorted (stable classname for
  * Janino-generated code).
  */
object JaccardUtil {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Linear merge-count over two sorted distinct long arrays. Null
    * ELEMENTS are skipped (treated as absent) — the SQL-registered
    * form can receive array<bigint> with null slots, and an unguarded
    * getLong would NPE interpreted / read garbage under codegen.
    */
  def evalSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var ea = 0
    var eb = 0
    var t = 0
    while (t < na) { if (!a.isNullAt(t)) ea += 1; t += 1 }
    t = 0
    while (t < nb) { if (!b.isNullAt(t)) eb += 1; t += 1 }
    if (ea == 0 && eb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val va = a.getLong(i)
        val vb = b.getLong(j)
        if (va == vb) { inter += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
    }
    inter.toDouble / (ea + eb - inter).toDouble
  }
}
