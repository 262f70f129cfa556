package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session bootstrap + fixture-table catalog.
  *
  * The engine is a library: callers normally bring their own
  * `SparkSession`. `Engine.session()` is the tuned default used by the
  * CLI mains (Bench / Verify / demos) — AQE on, shuffle partitions
  * sized for the local core count rather than the 200 default, UTC
  * timestamps for oracle parity.
  *
  * Scale stance: every knob here is what you'd set on a real cluster
  * too (AQE + skew-join handling + partition-count discipline); only
  * `master(local[N])` is test-harness-specific.
  */
object Engine {

  def session(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Typed access to the driver fixture tables under one sf dir. */
  final case class Tables(spark: SparkSession, dir: String) {
    private def t(name: String): DataFrame =
      spark.read.parquet(s"$dir/$name.parquet")
    def region: DataFrame     = t("region")
    def nation: DataFrame     = t("nation")
    def customer: DataFrame   = t("customer")
    def supplier: DataFrame   = t("supplier")
    def part: DataFrame       = t("part")
    def orders: DataFrame     = t("orders")
    def lineitem: DataFrame   = t("lineitem")

    /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no
      * native type for. Read it as raw nanos (legacy conf) and floor
      * to microsecond TimestampType with integer `div` — float
      * division would lose precision at 1e18 nanos. DuckDB's reader
      * floors ns→µs the same way, so oracle compares stay exact.
      */
    def events: DataFrame = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      t("events").withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    }
    def documents: DataFrame  = t("documents")
    def embeddings: DataFrame = t("embeddings")
  }
}
