package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalType, LogicalTypes, Schema}
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro source/sink over the avro-mapred InputFormat/OutputFormat that
  * ship inside Spark's own distribution (SURVEY.md §2.1 S8 — the one
  * format the engine was missing; the spark-avro *module* is not on
  * this zero-egress classpath, but avro-1.12.1 + avro-mapred-1.12.1
  * are, so the format is implementable first-class).
  *
  * Scale notes:
  *  - Reads go through `AvroKeyInputFormat`, which splits container
  *    files on their sync markers — a 100 TB avro dataset parallelizes
  *    across executors exactly like parquet does, no whole-file tasks.
  *  - Writes go through `saveAsNewAPIHadoopFile` + `AvroKeyOutputFormat`
  *    so output commits use the Hadoop committer (task attempts, temp +
  *    rename) — safe under speculative execution and task retry.
  *  - Records are converted GenericRecord→Row inside the reading task
  *    before anything else sees them, because Hadoop record readers
  *    reuse their key objects; the Row conversion is the deep copy.
  *
  * Type mapping (both directions): boolean/int/long/float/double/string
  * /bytes, date (logical `date` on int), timestamp (logical
  * `timestamp-micros`/`-millis` on long), decimal (logical `decimal` on
  * bytes), arrays, nested records; nullable columns are `union[null,T]`.
  */
object AvroFormat {

  // ---------------------------------------------------------------- read

  /** Read a DIRECTORY of `.avro` container files (globs are not
    * expanded — point this at the directory a writer produced). The
    * writer schema is taken from the first file's header on the
    * driver; all files are then scanned in parallel with
    * split-by-sync-marker.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    require(fs.getFileStatus(dir).isDirectory,
      s"AvroFormat.read expects a directory of .avro files, got: $path")
    val avroFiles = fs.listStatus(dir).iterator
      .map(_.getPath)
      .filter(_.getName.endsWith(".avro"))
      .toSeq.sortBy(_.getName)
    require(avroFiles.nonEmpty, s"no .avro files under $path")
    def headerSchema(f: Path): Schema = {
      val in = fs.open(f)
      try {
        val s = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        try s.getSchema finally s.close()
      } finally in.close()
    }
    val avroSchema = headerSchema(avroFiles.head)
    // Per-field value conversion (e.g. timestamp-millis vs -micros
    // scaling) is driven by ONE writer schema — a directory mixing
    // writers with different schemas would be silently mis-decoded,
    // so fail loudly instead. Header reads are a few hundred bytes
    // per file (the parquet-footer cost model) and run PARALLEL on
    // the driver so a many-thousand-file object-store directory pays
    // round-trip latency once, not once per file.
    java.util.Arrays.stream(avroFiles.tail.toArray).parallel().forEach {
      f =>
        val other = headerSchema(f)
        require(other == avroSchema,
          s"mixed avro writer schemas in $path: ${avroFiles.head} vs $f")
    }
    val struct = toSparkSchema(avroSchema)

    val job = Job.getInstance(conf)
    AvroJob.setInputKeySchema(job, avroSchema)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      s"${dir.toString}/*.avro",
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      job.getConfiguration)
    // ship the writer schema as JSON (avro Schema serializability
    // varies across versions) so value conversion can honor per-field
    // logical types (timestamp-millis vs -micros) inside the task
    val schemaJson = avroSchema.toString
    val rows = rdd.mapPartitions { it =>
      val ws = new Schema.Parser().parse(schemaJson)
      it.map { case (k, _) => avroToRow(k.datum(), struct, ws) }
    }
    spark.createDataFrame(rows, struct)
  }

  // --------------------------------------------------------------- write

  /** Write a DataFrame as avro container files under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val struct = df.schema
    val avroSchema = toAvroSchema(struct, "graft_record")
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    df.rdd.mapPartitions { it =>
      // Schema is not Serializable across all avro versions — ship the
      // canonical JSON and re-parse once per task.
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { r =>
        (new AvroKey[GenericRecord](rowToAvro(r, schema, struct)),
          NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  // ------------------------------------------------- schema conversion

  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"top-level avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def toSparkType(s: Schema): (DataType, Boolean) =
    s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala.toSeq
        val nonNull = branches.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1,
          s"only union[null, T] is supported, got $s")
        (toSparkType(nonNull.head)._1, true)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT =>
        if (isLogical(s, "date")) (DateType, false)
        else (IntegerType, false)
      case Schema.Type.LONG =>
        if (isLogical(s, "timestamp-micros") ||
          isLogical(s, "timestamp-millis")) (TimestampType, false)
        else if (isLogical(s, "local-timestamp-micros") ||
          isLogical(s, "local-timestamp-millis")) (TimestampNTZType, false)
        else (LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            (DecimalType(d.getPrecision, d.getScale), false)
          case _ => (BinaryType, false)
        }
      case Schema.Type.ARRAY =>
        val (et, n) = toSparkType(s.getElementType)
        (ArrayType(et, containsNull = n), false)
      case Schema.Type.MAP =>
        val (vt, n) = toSparkType(s.getValueType)
        (MapType(StringType, vt, valueContainsNull = n), false)
      case Schema.Type.RECORD => (toSparkSchema(s), false)
      case other =>
        throw new UnsupportedOperationException(s"avro type $other")
    }

  private def isLogical(s: Schema, name: String): Boolean = {
    val lt: LogicalType = s.getLogicalType
    lt != null && lt.getName == name
  }

  def toAvroSchema(struct: StructType, name: String): Schema = {
    val fields = struct.fields.toSeq.map { f =>
      new Schema.Field(f.name, toAvroType(f.dataType, f.nullable, f.name),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.asJava)
  }

  private def toAvroType(dt: DataType, nullable: Boolean,
      name: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType =>
        Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvroType(et, containsNull, s"${name}_item"))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(toAvroType(vt, valueContainsNull, s"${name}_value"))
      case st: StructType => toAvroSchema(st, s"${name}_record")
      case other =>
        throw new UnsupportedOperationException(s"spark type $other")
    }
    if (nullable)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  // -------------------------------------------------- value conversion

  private def avroToRow(rec: GenericRecord, struct: StructType,
      schema: Schema): Row = {
    val vals = new Array[Any](struct.length)
    var i = 0
    while (i < struct.length) {
      vals(i) = avroToSpark(rec.get(i), struct(i).dataType,
        nonNullBranch(schema.getFields.get(i).schema()))
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def avroToSpark(v: Any, dt: DataType, s: Schema): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString
      case BinaryType => v match {
        case bb: java.nio.ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
        case a: Array[Byte] => a
      }
      case DateType =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType =>
        // honor the writer's logical type: -millis longs scale to micros
        val micros =
          if (isLogical(s, "timestamp-millis")) v.asInstanceOf[Long] * 1000L
          else v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case TimestampNTZType =>
        val micros =
          if (isLogical(s, "local-timestamp-millis"))
            v.asInstanceOf[Long] * 1000L
          else v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case d: DecimalType =>
        val bytes = v match {
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case ArrayType(et, _) =>
        val el = nonNullBranch(s.getElementType)
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(avroToSpark(_, et, el))
      case MapType(_, vt, _) =>
        val mv0 = nonNullBranch(s.getValueType)
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> avroToSpark(mv, vt, mv0)
        }.toMap
      case st: StructType =>
        avroToRow(v.asInstanceOf[GenericRecord], st, s)
      case _ => v // boolean/int/long/float/double pass through
    }

  private def rowToAvro(row: Row, schema: Schema,
      struct: StructType): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < struct.length) {
      val fieldSchema = schema.getFields.get(i).schema()
      rec.put(i, sparkToAvro(row.get(i), struct(i).dataType,
        nonNullBranch(fieldSchema)))
      i += 1
    }
    rec
  }

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def sparkToAvro(v: Any, dt: DataType, target: Schema): Any =
    if (v == null) null
    else dt match {
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case DateType =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case TimestampType =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
      case TimestampNTZType =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      case d: DecimalType =>
        java.nio.ByteBuffer.wrap(
          v.asInstanceOf[java.math.BigDecimal]
            .setScale(d.scale).unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        val el = target.getElementType
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(sparkToAvro(_, et, nonNullBranch(el))).toSeq.asJava
      case MapType(_, vt, _) =>
        val mv = target.getValueType
        v.asInstanceOf[scala.collection.Map[String, Any]].map {
          case (k, x) => k -> sparkToAvro(x, vt, nonNullBranch(mv))
        }.toMap.asJava
      case st: StructType =>
        rowToAvro(v.asInstanceOf[Row], target, st)
      case _ => v
    }
}
