package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator (SURVEY.md §2.11 custom-aggregate surface):
  * element-wise minimum of MinHash signatures.
  *
  * MinHash signatures form a monoid under element-wise min: the
  * union-of-sets signature is the min of the member signatures. This
  * turns per-document signatures into CLUSTER-level signatures with
  * an ordinary `groupBy(...).agg(minhash_union(sig))` — e.g. after
  * near-dup clustering, one more agg yields a signature per cluster
  * that can be LSH-bucketed again for cluster-vs-cluster dedup
  * (hierarchical dedup at corpus scale), all map-side combinable.
  */
object MinHashUnion {

  final class Agg(numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      if (sig != null) {
        var i = 0
        val n = math.min(buf.length, sig.length)
        while (i < n) {
          if (sig(i) < buf(i)) buf(i) = sig(i)
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) {
        if (b(i) < a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] =
      if (buf.forall(_ == Long.MaxValue)) null else buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: groupBy(...).agg(MinHashUnion(col("sig"), 128)). */
  def apply(sig: Column, numHashes: Int = 128): Column =
    udaf(new Agg(numHashes)).apply(sig)
}
