package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality-classifier filtering — the model-based sibling of
  * the heuristic rules (t03/c09): train a logistic-regression scorer
  * on surface features of labeled documents, freeze the weights, and
  * score the whole corpus with one map-only pass. This is the
  * GPT-3/CCNet/FineWeb curation pattern (a small linear model scores
  * "reference-like" quality; the corpus keeps what clears the
  * margin) re-expressed Spark-first.
  *
  * Scale shape (the 100 TB contract):
  *  - featurization and scoring are pure column expressions — whole-
  *    stage codegen, zero shuffle, weights folded in as literals;
  *  - training is DRIVER-BOUNDED, the coarseCentroids discipline: a
  *    deterministic `maxTrainRows`-capped sample (ordered by id —
  *    TakeOrderedAndProject, never a full global sort) is collected
  *    and fitted with full-batch gradient descent. The corpus never
  *    participates in training beyond that sample.
  *
  * Cross-engine exactness: every feature is a ratio of exact integer
  * counts (one IEEE division), the margin is an explicit left-
  * associated dot product of weight literals, and training never
  * needs a SQL replica — only its frozen output does (the s03/s07
  * trained-model-literals discipline). The sigmoid lives ONLY in the
  * driver-side trainer; scored output is the raw margin, so no
  * transcendental function ever crosses an engine boundary.
  */
object Classifier {

  /** t03's stopword list — shared so the feature replays verbatim. */
  val StopWords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Feature count (intercept included). */
  val Dim = 6

  /** Feature columns over a raw `text` column, in model order:
    * intercept, tokens/100, distinct-token ratio, stopword ratio,
    * mean token length / 10, chars/1000. All exact-integer ratios
    * (IEEE divisions of int64-valued doubles in a pinned order), so
    * Spark and any replaying engine produce bit-identical doubles.
    * Every feature lands in roughly [0, 1] — keeps the fixed-step
    * full-batch descent in its stable region (step < 1/L with
    * L = 0.25·max‖x‖² ≈ 1). Callers must pre-filter empty docs
    * (n_tokens > 0).
    */
  def features(text: Column): Seq[Column] = {
    val ts = graft.functions.TextFunctions.tokens(text)
    val lts = graft.functions.TextFunctions.tokens(lower(text))
    val nt = size(ts).cast("double")
    Seq(
      lit(1.0),
      nt / 100.0,
      size(array_distinct(ts)).cast("double") / nt,
      size(filter(lts, t => t.isin(StopWords.map(lit): _*))).cast("double")
        / nt,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / nt / 10.0,
      length(text).cast("double") / 1000.0)
  }

  /** DuckDB fragments for [[features]], same order, over a relation
    * exposing `text`. Each is the literal SQL twin of the Spark
    * expression above (string_split on ' ', empty-token filter).
    */
  def sqlFeatures: Seq[String] = {
    val ts = "list_filter(string_split(text, ' '), x -> x != '')"
    val lts = "list_filter(string_split(lower(text), ' '), x -> x != '')"
    val stop = StopWords.map("'" + _ + "'").mkString("[", ", ", "]")
    val nt = s"CAST(len($ts) AS DOUBLE)"
    Seq(
      "1.0",
      s"$nt / 100.0",
      s"CAST(len(list_distinct($ts)) AS DOUBLE) / $nt",
      s"CAST(len(list_filter($lts, x -> list_contains($stop, x))) " +
        s"AS DOUBLE) / $nt",
      s"CAST(list_sum(list_transform($ts, x -> length(x))) AS DOUBLE)" +
        s" / $nt / 10.0",
      "CAST(length(text) AS DOUBLE) / 1000.0")
  }

  /** Margin w·f as an explicit left-associated sum of products —
    * the one evaluation order both engines share, so the scored
    * double is bit-exact cross-engine.
    */
  def marginCol(weights: Seq[Double], f: Seq[Column]): Column = {
    require(weights.length == f.length, "weight/feature arity")
    weights.zip(f).map { case (w, c) => lit(w) * c }.reduceLeft(_ + _)
  }

  /** DuckDB twin of [[marginCol]] (weights rendered shortest-round-
    * trip so the parsed literal is the identical IEEE value).
    */
  def sqlMargin(weights: Seq[Double], f: Seq[String]): String =
    weights.zip(f).map { case (w, c) =>
      s"(${java.lang.Double.toString(w)}) * ($c)"
    }.mkString(" + ")

  /** Deterministic bounded trainer: full-batch logistic-regression
    * gradient descent on a `maxTrainRows`-capped, id-ordered sample.
    * `df` must expose the id, text and a 0/1 double label column.
    * Row order is pinned (sorted by id on the driver) so the float
    * gradient fold is reproducible call-to-call — oracleGen re-trains
    * and MUST land on byte-identical weights.
    */
  def train(
      df: DataFrame, textCol: String, idCol: String, labelCol: String,
      iters: Int = 80, lr: Double = 0.5,
      maxTrainRows: Long = 100000L): Array[Double] =
    trainWithTrace(df, textCol, idCol, labelCol, iters, lr,
      maxTrainRows)._1

  /** [[train]] plus the per-iteration mean log-loss trace (spec
    * surface: the trace must be non-increasing on separable data).
    */
  private[graft] def trainWithTrace(
      df: DataFrame, textCol: String, idCol: String, labelCol: String,
      iters: Int, lr: Double, maxTrainRows: Long)
      : (Array[Double], Seq[Double]) = {
    val f = features(col(textCol))
    val sample = df
      .filter(size(graft.functions.TextFunctions.tokens(col(textCol))) > 0)
      .select(col(idCol).cast("long").as("id"),
        array(f: _*).as("f"), col(labelCol).cast("double").as("y"))
      .orderBy(col("id"))
      .limit(maxTrainRows.min(Int.MaxValue.toLong).toInt)
      .collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getSeq[Double](1).toArray, r.getDouble(2)))
    require(sample.nonEmpty, "empty training sample")
    val n = sample.length
    val w = new Array[Double](Dim)
    val losses = Seq.newBuilder[Double]
    var it = 0
    while (it < iters) {
      val g = new Array[Double](Dim)
      var loss = 0.0
      var r = 0
      while (r < n) {
        val (x, y) = sample(r)
        var m = 0.0
        var j = 0
        while (j < Dim) { m += w(j) * x(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-m))
        // clamped log-loss (the trace is a spec surface, not part of
        // the model): avoids -Inf when the model saturates
        val pc = math.min(math.max(p, 1e-15), 1 - 1e-15)
        loss -= (if (y > 0.5) math.log(pc) else math.log1p(-pc))
        val d = p - y
        j = 0
        while (j < Dim) { g(j) += d * x(j); j += 1 }
        r += 1
      }
      var j = 0
      while (j < Dim) { w(j) -= lr * g(j) / n; j += 1 }
      losses += loss / n
      it += 1
    }
    (w, losses.result())
  }

  /** Score a corpus with frozen weights: (id, margin, keep) — raw
    * bit-exact margin double plus the decision bit. Map-only.
    */
  def score(
      df: DataFrame, textCol: String, idCol: String,
      weights: Seq[Double]): DataFrame = {
    val m = marginCol(weights, features(col(textCol)))
    df.filter(size(graft.functions.TextFunctions.tokens(col(textCol))) > 0)
      .select(col(idCol), m.as("margin"),
        when(m > 0.0, 1L).otherwise(0L).as("keep"))
  }
}
