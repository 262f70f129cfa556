package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.expressions._

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT cosine_sim(a,b)
  * ...")` works next to the Column API.
  *
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two numeric arrays",
      { case Seq(a, b) => CosineSimilarity(a, b) })
    register(ext, "dot_product",
      "dot_product(a, b) - dot product of two numeric arrays",
      { case Seq(a, b) => DotProduct(a, b) })
    register(ext, "simhash64",
      "simhash64(tokens) - 64-bit SimHash of a string-token array",
      { case Seq(t) => SimHash64(t) })
    register(ext, "shingle_hashes",
      "shingle_hashes(text, n) - sorted distinct xxhash64 of word n-grams",
      { case Seq(t, n) => ShingleHashes(t, toIntLit(n, "shingle_hashes")) })
    register(ext, "minhash_signature",
      "minhash_signature(hashes, k) - k-permutation MinHash signature",
      { case Seq(h, k) => MinHashSignature(h, toIntLit(k, "minhash_signature")) })
    register(ext, "jaccard_sorted",
      "jaccard_sorted(a, b) - Jaccard of two sorted distinct bigint arrays",
      { case Seq(a, b) => JaccardSorted(a, b) })
    register(ext, "word_shingles",
      "word_shingles(text, n) - word n-grams as strings, document order",
      { case Seq(t, n) => WordShingles(t, toIntLit(n, "word_shingles")) })
    register(ext, "byte_entropy",
      "byte_entropy(text) - Shannon entropy (bits) of the byte distribution",
      { case Seq(t) => ByteEntropy(t) })
    register(ext, "jaro_winkler",
      "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings",
      { case Seq(a, b) => JaroWinkler(a, b) })
    ext.injectOptimizerRule(_ => LevenshteinThresholdRule)
    ext.injectOptimizerRule(_ => JaroWinklerThresholdRule)
  }

  private def toIntLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected integer literal, got $other")
  }

  private def register(
      ext: SparkSessionExtensions, name: String, usage: String,
      builder: PartialFunction[Seq[Expression], Expression]): Unit = {
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      (args: Seq[Expression]) =>
        builder.applyOrElse(args, (a: Seq[Expression]) =>
          throw new IllegalArgumentException(
            s"$name: unexpected argument count ${a.size}"))))
  }
}
