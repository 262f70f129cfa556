package graft.tools

import graft.Engine
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.sql.Timestamp
import scala.util.Random

/** Randomized-fixture generator — the anti-overfit gate.
  *
  * Every oracle-green row in CORRECTNESS_r*.json has, until round 18,
  * been green against the SAME frozen `/root/testdata` parquet (seed
  * 42). A constant-folded answer, or a query whose oracle accidentally
  * encodes a fixture constant (a row count, a key range, a planted
  * value), would be invisible to that gate forever. This main emits a
  * FRESH fixture with the same schemas and value domains (FIXTURES.md
  * §B) but a different seed and ±20% jittered row counts, so
  * `graft.Verify` + `tools/check.py` can be re-run on data the engine
  * has never seen. Any query that goes red on a re-roll but is green
  * on the frozen fixture has a data dependency to fix.
  *
  * Usage: `runMain graft.tools.FixtureGen <outDir> [seed]`
  * (default seed 20260816 — the round-18 gate seed; re-roll with any
  * other value).
  *
  * Determinism: all rows are derived from `java.util.Random` streams
  * seeded per-table from the single CLI seed, generated driver-side
  * and written as ONE parquet file per table (matching the flat
  * `<dir>/<table>.parquet` layout of /root/testdata that both the
  * engine's readers and the DuckDB oracle expect). Driver-side
  * generation is deliberate: this is a correctness-gate tool emitting
  * sf0.01-scale inputs (~90k rows total), not a data-scale benchmark
  * generator — byte-determinism across JVMs matters more than
  * distributed throughput here.
  *
  * Shape fidelity (measured off the frozen sf0.01 fixture):
  *   - region/nation: fixed dimension domains (5 regions by name,
  *     25 nations round-robin over regions) — queries name these
  *     values ('EUROPE', 'NATION_7'), so the DOMAIN is contract, only
  *     fact-table data re-rolls.
  *   - part: 8×8 adjective/noun names, Brand#1..25, 6 types, size
  *     1..50, retailprice = 900 + (key % 1000)/10 (the frozen
  *     fixture's exact formula, keeps the 900..1000 band at any
  *     count).
  *   - lineitem: integral quantity 1..50, discount 0.00..0.10 and tax
  *     0.00..0.08 in cent steps, flags A/N/R × F/O, midnight-UTC ship
  *     dates 1995..2001, linenumber 1..7 (NOT sequential per order —
  *     the frozen fixture draws it independently too).
  *   - events: 30 days of microsecond timestamps from 2024-01-01,
  *     users ≈ 1.5% of events, props exactly `{"k": N}`.
  *   - documents: 10..99 words from the frozen 31-word vocabulary,
  *     n_chars = length(text), lang skewed to en, source round-robin
  *     src0..src19; ~6% planted near-duplicates (single-word edit of
  *     an earlier doc) and ~2% planted EXACT duplicate texts under
  *     fresh doc_ids — the frozen fixture has no exact text dups, so
  *     re-rolls exercise the dedup operators harder, not softer.
  *   - embeddings: 10 gaussian clusters on the unit sphere (dim 64,
  *     float32, L2-normalized like the frozen fixture).
  */
object FixtureGen {

  val DefaultSeed = 20260816L

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FixtureGen <outDir> [seed]")
    val outDir = args(0)
    val seed = if (args.length > 1) args(1).toLong else DefaultSeed
    val spark = Engine.session(appName = "graft-fixturegen")
    try generate(spark, outDir, seed)
    finally spark.stop()
  }

  /** Emit all ten tables under `outDir/<table>.parquet`. */
  def generate(spark: SparkSession, outDir: String, seed: Long): Unit = {
    new java.io.File(outDir).mkdirs()
    // per-table independent streams: jitter one table's count without
    // disturbing any other table's row stream
    def rng(table: Int) = new Random(seed * 1000003L + table * 7919L)
    def jitter(base: Int, r: Random): Int =
      math.max(1, math.round(base * (0.8 + 0.4 * r.nextDouble())).toInt)

    val rCust = rng(3); val nCust = jitter(1500, rCust)
    val rSupp = rng(4); val nSupp = jitter(100, rSupp)
    val rPart = rng(5); val nPart = jitter(2000, rPart)
    val rOrd = rng(6); val nOrd = jitter(15000, rOrd)
    val rLi = rng(7); val nLi = jitter(60000, rLi)
    val rEv = rng(8); val nEv = jitter(10000, rEv)
    val rDoc = rng(9); val nDoc = jitter(500, rDoc)
    val rEmb = rng(10); val nEmb = jitter(500, rEmb)

    writeOne(spark, outDir, "region", regionSchema,
      Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
        .zipWithIndex.map { case (n, k) => Row(k, n) })

    writeOne(spark, outDir, "nation", nationSchema,
      (0 until 25).map(k => Row(k, s"NATION_$k", k % 5)))

    writeOne(spark, outDir, "customer", customerSchema, {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      (0 until nCust).map { k =>
        Row(k.toLong, f"Customer#$k%09d", rCust.nextInt(25),
          round2(-1000.0 + 11000.0 * rCust.nextDouble()),
          segs(rCust.nextInt(segs.length)))
      }
    })

    writeOne(spark, outDir, "supplier", supplierSchema,
      (0 until nSupp).map { k =>
        Row(k.toLong, f"Supplier#$k%09d", rSupp.nextInt(25),
          round2(-1000.0 + 11000.0 * rSupp.nextDouble()))
      })

    writeOne(spark, outDir, "part", partSchema, {
      val adjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
      val nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
      val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
      (0 until nPart).map { k =>
        Row(k.toLong,
          s"${adjs(rPart.nextInt(8))} ${nouns(rPart.nextInt(8))}",
          s"Brand#${1 + rPart.nextInt(25)}",
          types(rPart.nextInt(types.length)),
          1 + rPart.nextInt(50),
          900.0 + (k % 1000) / 10.0)
      }
    })

    writeOne(spark, outDir, "orders", ordersSchema, {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val statuses = Seq("F", "O", "P")
      (0 until nOrd).map { k =>
        Row(k.toLong, rOrd.nextInt(nCust).toLong,
          statuses(rOrd.nextInt(3)),
          round2(1000.0 + 499000.0 * rOrd.nextDouble()),
          midnight(1995, rOrd.nextInt(2405)),
          prios(rOrd.nextInt(prios.length)))
      }
    })

    writeOne(spark, outDir, "lineitem", lineitemSchema,
      (0 until nLi).map { _ =>
        Row(rLi.nextInt(nOrd).toLong, rLi.nextInt(nPart).toLong,
          rLi.nextInt(nSupp).toLong, 1 + rLi.nextInt(7),
          (1 + rLi.nextInt(50)).toDouble,
          round2(900.0 + 104100.0 * rLi.nextDouble()),
          rLi.nextInt(11) / 100.0, rLi.nextInt(9) / 100.0,
          Seq("A", "N", "R")(rLi.nextInt(3)),
          Seq("F", "O")(rLi.nextInt(2)),
          midnight(1995, 1 + rLi.nextInt(2500)))
      })

    writeOne(spark, outDir, "events", eventsSchema, {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val nUsers = math.max(2, math.round(nEv * 0.015).toInt)
      val t0 = java.time.LocalDate.of(2024, 1, 1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
      (0 until nEv).map { k =>
        val micros = (rEv.nextDouble() * 30L * 86400L * 1000000L).toLong
        val ts = Timestamp.from(t0.plusSeconds(micros / 1000000L)
          .plusNanos((micros % 1000000L) * 1000L))
        Row(k.toLong, ts, rEv.nextInt(nUsers).toLong,
          types(rEv.nextInt(types.length)),
          round2(0.01 + 499.99 * rEv.nextDouble()),
          s"""{"k": ${rEv.nextInt(100)}}""")
      }
    })

    writeOne(spark, outDir, "documents", documentsSchema, {
      val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
        "data", "dup", "fast", "filter", "group", "hash", "join", "key",
        "line", "merge", "order", "part", "query", "row", "scan", "slow",
        "small", "sort", "spark", "stream", "table", "the", "value",
        "vector", "window")
      val langs = Seq("en", "en", "en", "de", "es", "fr", "zh")
      val texts = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until nDoc).map { k =>
        val roll = rDoc.nextDouble()
        val text =
          if (roll < 0.02 && texts.nonEmpty) // exact duplicate
            texts(rDoc.nextInt(texts.length))
          else if (roll < 0.08 && texts.nonEmpty) { // near-dup: one-word edit
            val words = texts(rDoc.nextInt(texts.length)).split(" ")
            words(rDoc.nextInt(words.length)) = vocab(rDoc.nextInt(vocab.length))
            words.mkString(" ")
          } else
            Seq.fill(10 + rDoc.nextInt(90))(
              vocab(rDoc.nextInt(vocab.length))).mkString(" ")
        texts += text
        Row(k.toLong, text, langs(rDoc.nextInt(langs.length)),
          s"src${k % 20}", text.length.toLong)
      }
    })

    writeOne(spark, outDir, "embeddings", embeddingsSchema, {
      val dim = 64
      val centers = Array.fill(10)(normalize(Array.fill(dim)(rEmb.nextGaussian())))
      (0 until nEmb).map { k =>
        val label = rEmb.nextInt(10)
        val v = normalize(Array.tabulate(dim)(i =>
          centers(label)(i) + 0.35 * rEmb.nextGaussian()))
        Row(k.toLong, v.map(_.toFloat).toSeq, label)
      }
    })
  }

  private def round2(v: Double): Double = math.round(v * 100.0) / 100.0

  private def midnight(baseYear: Int, plusDays: Int): Timestamp =
    Timestamp.from(java.time.LocalDate.of(baseYear, 1, 1).plusDays(plusDays)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant)

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Write rows as the single flat file `outDir/<table>.parquet` —
    * Spark emits a directory, so stage there and move the lone part
    * file up (both Spark's reader and DuckDB's `read_parquet` expect
    * the frozen fixture's file-per-table layout).
    */
  private def writeOne(spark: SparkSession, outDir: String, table: String,
      schema: StructType, rows: Seq[Row]): Unit = {
    import scala.jdk.CollectionConverters._
    val stage = new java.io.File(outDir, s"_gen_$table")
    spark.createDataFrame(rows.asJava, schema).coalesce(1)
      .write.mode("overwrite").parquet(stage.getPath)
    val part = stage.listFiles().find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file for $table"))
    val dest = new java.io.File(outDir, s"$table.parquet")
    if (dest.exists()) dest.delete()
    require(part.renameTo(dest), s"rename failed for $table")
    stage.listFiles().foreach(_.delete())
    stage.delete()
    println(s"[fixturegen] $table: ${rows.length} rows -> $dest")
  }

  private val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))
  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))
  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))
  private val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType), StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
  private val partSchema = StructType(Seq(
    StructField("p_partkey", LongType), StructField("p_name", StringType),
    StructField("p_brand", StringType), StructField("p_type", StringType),
    StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))
  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))
  private val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))
  private val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))
  private val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))
}
