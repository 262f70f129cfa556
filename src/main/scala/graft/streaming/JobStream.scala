package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.JobSpec
import graft.operators.PipeTransform
import graft.sinks.NamedSink

/** Streaming realization of the reference worker (SURVEY.md §2.10,
  * §3.2): the SQS long-poll loop becomes a Structured Streaming
  * micro-batch query over a file-queue of job envelopes.
  *
  * Mapping, element for element:
  *  - queue           -> a watched directory; each file holds JSON
  *                       envelope lines (the reference's message body)
  *  - 20 s long poll  -> Trigger.ProcessingTime (default 20 s)
  *  - SQS batch size  -> maxFilesPerTrigger
  *  - ack on success  -> checkpointed micro-batch commit; together
  *                       with the idempotent NamedSink this UPGRADES
  *                       the reference's at-least-once to effective
  *                       exactly-once (SURVEY.md §1.4)
  *  - poison messages -> quarantine parquet, not infinite redelivery
  *  - SIGINT handler  -> query.stop() via stopGracefully
  */
object JobStream {

  /** Parsed, dispatch-filtered job stream from an envelope file-queue
    * (one JSON array envelope per line).
    */
  def jobs(spark: SparkSession, queueDir: String,
      maxFilesPerTrigger: Int = 10): DataFrame = {
    val raw = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(queueDir)
    raw.select(JobSpec.fromEnvelope(col("value")).as("job"), col("value"))
      .select(col("job.*"), col("value").as("envelope"))
  }

  /** Run the worker: for each micro-batch, stage inputs from
    * `inputDir/fileName`, run the command, publish outputs to
    * `outputDir/fileName+ext`, quarantine failures+unknown actions.
    * Returns the running query (caller stops it).
    */
  def runWorker(
      spark: SparkSession, queueDir: String, inputDir: String,
      outputDir: String, checkpointDir: String, command: Seq[String],
      ext: String = ".out",
      trigger: Trigger = Trigger.ProcessingTime("20 seconds")): StreamingQuery = {
    jobs(spark, queueDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, inputDir, outputDir, command, ext)
        ()
      }
      .start()
  }

  /** Graceful shutdown (reference T4, GetJobs.py:63-65 SIGINT
    * handler): stop the query at the next micro-batch boundary; also
    * installable as a JVM shutdown hook so ^C drains cleanly. The
    * checkpoint guarantees the interrupted batch is either fully
    * committed or fully re-run on restart.
    */
  def stopGracefully(query: StreamingQuery, installHook: Boolean = false): Unit = {
    def stop(): Unit = if (query.isActive) query.stop()
    if (installHook)
      Runtime.getRuntime.addShutdownHook(new Thread(() => stop()))
    else stop()
  }

  /** One micro-batch = one bounded BatchPipeline pass over the named
    * input files. Package-private for direct testing.
    */
  private[streaming] def processBatch(
      batch: DataFrame, inputDir: String, outputDir: String,
      command: Seq[String], ext: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val (ok, bad) = JobSpec.dispatch(batch)
    // load content for dispatchable jobs by file name
    val keyed = ok.select(col("fileName").as("key"))
      .join(
        graft.sources.FileIngest.keyed(
          graft.sources.FileIngest.readDir(spark, inputDir)),
        Seq("key"), "left")
    val missing = keyed.filter(col("content").isNull)
      .select(col("key"), lit(-2).as("exitCode"),
        lit("input object not found").as("error"))
    val results = PipeTransform.transform(
      keyed.filter(col("content").isNotNull), command)
      .persist()
    try {
      val (succ, fail) = PipeTransform.split(results)
      NamedSink.write(succ, outputDir, ext)
      fail.select("key", "exitCode", "error")
        .unionByName(missing)
        .unionByName(bad.select(
          coalesce(col("fileName"), col("envelope")).as("key"),
          lit(-3).as("exitCode"),
          concat(lit("undispatchable action: "),
            coalesce(col("action"), lit("null"))).as("error")))
        .write.mode("append").parquet(s"${outputDir}_quarantine")
    } finally { results.unpersist(); () }
  }
}
