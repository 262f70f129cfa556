package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}

/** End-to-end corpus-curation pipeline over the documents fixture —
  * the composed flow a training-data run executes, each stage one of
  * the library's operators:
  *
  *   clean -> quality gate -> exact dedup -> MinHash near-dup pairs
  *   -> connected components -> keep set -> stratified sample
  *   -> deterministic train/eval split
  *   -> BPE tokenizer induction + per-doc token pricing
  *   -> seeded training-order shuffle -> verified shard emission
  *
  * `sbt "runMain graft.tools.CurationDemo [sfDir]"`.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session(appName = "graft-curation-demo")

    val raw = Engine.Tables(spark, sfDir).documents
    val cleaned = raw.select(col("doc_id"), col("lang"),
      TextFunctions.cleanText(col("text")).as("text"))

    val gated = cleaned
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
      .localCheckpoint() // consumed by pair-gen, components, and output

    // compact pair form: star + rep pairs carry the same connected
    // components as the fully-expanded member pairs, without
    // materializing k^2 rows per duplicate group
    val pairs = Dedup.nearDupPairs(gated, "text", "doc_id",
      threshold = 0.5, expandGroups = false)
    val reps = Dedup.clusterReps(
      gated.select(col("doc_id").as("id")), pairs)
    val kept = gated.join(
      reps.filter(col("id") === col("rep")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")

    val sampled = Sampling.stratifiedHashSample(kept, "doc_id", "lang",
      Map("en" -> 0.5, "es" -> 1.0, "de" -> 1.0, "fr" -> 1.0, "zh" -> 1.0))
    val train = Sampling.sampleBand(sampled, "doc_id", 0.0, 0.9)
    val eval = Sampling.sampleBand(sampled, "doc_id", 0.9, 1.0)

    val (nRaw, nGated, nKept) = (raw.count(), gated.count(), kept.count())
    val (nTrain, nEval) = (train.count(), eval.count())
    println(s"[demo] raw=$nRaw  quality-gated=$nGated  after-dedup=$nKept")
    println(s"[demo] stratified-sampled=${sampled.count()}  " +
      s"train=$nTrain  eval=$nEval")
    println("[demo] kept per lang:")
    kept.groupBy("lang").count().orderBy("lang").show(false)

    // tokenizer induction on the TRAIN split only (eval must not
    // shape the vocabulary), then price every train doc in subwords
    val merges = graft.operators.Bpe.learnMerges(train, "text", 32)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val priced = graft.operators.Bpe
      .tokenize(train, "doc_id", "text", merges)
    val nTok = priced.agg(sum(col("n_bpe_tokens"))).head().getLong(0)
    println(s"[demo] learned ${merges.size} BPE merges on train; " +
      s"train corpus = $nTok subword tokens")

    // seeded training order + verified shard handoff: 16 hash shards,
    // manifest recomputed FROM the written files
    val out = java.nio.file.Files
      .createTempDirectory("graft-demo-shards").toString
    train
      .withColumn("key",
        md5(concat(lit("epoch0:"), col("doc_id").cast("string"))))
      .withColumn("shard", substring(col("key"), 1, 1))
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val manifest = spark.read.parquet(out)
      .groupBy(col("shard")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("shard"))
    println(s"[demo] emitted ${manifest.count()} training shards -> $out")
    spark.stop()
  }
}
