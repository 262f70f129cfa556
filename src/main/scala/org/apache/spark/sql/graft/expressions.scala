package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

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
  /** Cosine similarity of two double arrays in one fused loop.
    * Null if either input is null; 0.0 on length mismatch or zero
    * norm (never NaN). Float arrays are widened by the implicit cast
    * ExpectsInputTypes inserts.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))

    override def dataType: DataType = DoubleType

    override def prettyName: String = "cosine_sim"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return 0.0d
      var dot = 0.0d
      var nx = 0.0d
      var ny = 0.0d
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i)
        val yi = y.getDouble(i)
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
              final double $xi = $x.getDouble($i);
              final double $yi = $y.getDouble($i);
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

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))

    override def dataType: DataType = DoubleType

    override def prettyName: String = "dot_product"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return 0.0d
      var dot = 0.0d
      var i = 0
      while (i < n) {
        dot += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
          final int $n = $x.numElements();
          double $dot = 0.0d;
          if ($n == $y.numElements()) {
            for (int $i = 0; $i < $n; $i++) {
              $dot += $x.getDouble($i) * $y.getDouble($i);
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
  // Column-level API (the engine-facing surface).

  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))
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
