package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}

/** File-format surface (SURVEY.md §2.1 S8).
  *
  * The reference has NO format support — file contents are opaque and
  * the only "format" is the output extension suffix (GetJobs.py:45,47).
  * The engine exposes Spark's readers/writers wholesale; this module
  * is the thin, discoverable catalog of them (plus the `binaryFile`
  * opaque-object scan in FileIngest, which IS the reference's model).
  *
  * `avro` is served by [[AvroFormat]]: the spark-avro *module* is not
  * on this zero-egress classpath, but avro + avro-mapred ship inside
  * Spark's own distribution, so the format is implemented first-class
  * over `AvroKeyInputFormat` (splittable) / `AvroKeyOutputFormat`
  * (committer-safe). It routes through [[load]]/[[save]] like every
  * other format; only the `DataFrameReader`-shaped accessors below
  * exclude it (avro-mapred has no DataFrameReader surface).
  */
object Formats {

  /** Formats available in this build, all round-trip tested.
    * `xml` is Spark 4's native XML source (spark-xml was merged
    * upstream in 4.0).
    */
  val supported: Seq[String] = Seq(
    "parquet", "orc", "json", "csv", "text", "xml", "avro")

  def read(spark: SparkSession, format: String): DataFrameReader = {
    require(format != "avro",
      "avro has no DataFrameReader surface here - use Formats.load/save")
    require(supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format)
    format match {
      case "csv" => r.option("header", "true").option("inferSchema", "true")
      case "xml" => r.option("rowTag", "row")
      case _ => r
    }
  }

  /** Unified load: every `supported` format through one entry point
    * (avro dispatches to [[AvroFormat.read]]). */
  def load(spark: SparkSession, format: String, path: String): DataFrame =
    if (format == "avro") AvroFormat.read(spark, path)
    else read(spark, format).load(path)

  /** Unified save (avro dispatches to [[AvroFormat.write]]). */
  def save(df: DataFrame, format: String, path: String): Unit =
    if (format == "avro") AvroFormat.write(df, path)
    else write(df, format).save(path)

  /** Read-only formats: no writer exists, so they sit outside
    * `supported`'s round-trip contract. `image` is Spark's built-in
    * image datasource (struct<origin,height,width,nChannels,mode,
    * data>) — the ingestion front door for the multimodal operators;
    * `binaryFile` is the opaque-object scan (see FileIngest.readDir,
    * which also fixes its zero-length-file drop).
    */
  val readOnly: Seq[String] = Seq("image", "binaryFile")

  def readOnlyReader(spark: SparkSession, format: String): DataFrameReader = {
    require(readOnly.contains(format), s"not a read-only format: $format")
    spark.read.format(format)
  }

  def write(df: DataFrame, format: String): DataFrameWriter[Row] = {
    require(format != "avro",
      "avro has no DataFrameWriter surface here - use Formats.load/save")
    require(supported.contains(format), s"unsupported format: $format")
    val w = df.write.format(format)
    format match {
      case "csv" => w.option("header", "true")
      case "xml" => w.option("rowTag", "row")
      case _ => w
    }
  }
}
