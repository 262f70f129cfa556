package graft.model

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Adversarial-input gate for the job envelope (round-17 order #2):
  * `fromEnvelope` parses ATTACKER-ADJACENT text (the reference's SQS
  * message body, parsed positionally with no validation and fatally
  * on mismatch — GetJobs.py:27-34). Invariant: the parse is total —
  * any string yields a struct row (malformed → null fields), the
  * stage never dies, and `dispatch` routes every row to exactly one
  * of (dispatchable, quarantine) with nothing dropped.
  */
class JobSpecFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val hostile: Seq[String] = Seq(
    "", "null", "{}", "[", "]", "[[[[", "\"x\"", "42", "true",
    """["process"]""",
    """["process", "b", "i", "o"]""",
    """[1, 2, 3, 4, 5]""",
    """[null, null, null, null, null]""",
    """[{"a":1}, [], "i", "o", "f"]""",
    "\u0000garbage with a NUL byte",
    "\ufffd\ud800 unpaired surrogate-ish",
    "[" + ("\"x\"," * 5000) + "\"x\"]")

  // positional-protocol LENIENCE (not hostility): extra trailing
  // elements are ignored, and a non-string element coerces to its
  // JSON text — both parse to a complete job and DISPATCH. Pinned
  // here so the behavior is a documented decision, not an accident.
  private val lenient: Seq[String] = Seq(
    """["process", "b", "i", "o", "f", "extra", "extra2"]""",
    """["process", "b", "i", "o", {"not":"a string"}]""")

  test("fromEnvelope is total: hostile + random envelopes all parse " +
    "to rows (null fields for garbage), the stage completes, and " +
    "dispatch partitions everything with nothing dropped") {
    import spark.implicits._
    val rnd = (0 until 300).map(i =>
      sample(Gen.asciiPrintableStr, 3000L + i)) ++
      (0 until 100).map(i => sample(
        Gen.stringOf(Gen.choose(Char.MinValue, Char.MaxValue)),
        3500L + i))
    val all = (hostile ++ rnd).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = all.toDF("id", "envelope")
      .select(col("id"), JobSpec.fromEnvelope(col("envelope")).as("j"))
      .select(col("id"), col("j.*"))
    val rows = df.collect() // must not throw under ANSI mode
    assert(rows.length == all.length)
    val (ok, bad) = JobSpec.dispatch(df)
    val nOk = ok.count()
    val nBad = bad.count()
    assert(nOk + nBad == all.length,
      s"dispatch dropped rows: $nOk ok + $nBad quarantined != " +
        s"${all.length}")
    // none of the hostile envelopes is dispatchable (no well-formed
    // ["process", ..., fileName] among them)
    assert(nOk == 0, s"hostile envelope dispatched: " +
      s"${ok.collect().mkString("; ")}")
    // the LENIENT envelopes (positional protocol: trailing extras
    // ignored, non-string elements coerce to their JSON text) DO
    // dispatch — the documented decision, pinned
    val ldf = lenient.toDF("envelope")
      .select(JobSpec.fromEnvelope(col("envelope")).as("j"))
      .select(col("j.*"))
    val (lok, lbad) = JobSpec.dispatch(ldf)
    assert(lok.count() == lenient.length && lbad.count() == 0,
      s"lenient envelopes must all dispatch: " +
        s"${lbad.collect().mkString("; ")}")
  }

  test("pathSafe: traversal/absolute/scheme/NUL fileNames refused, " +
    "ordinary relative names (with subdirs) allowed") {
    val unsafe = Seq(null, "", "/etc/passwd", "../x", "a/../../x",
      "..", "a/..", "sub/../../x", "a\\..\\x", "file:/etc/passwd",
      "hdfs://nn/x", "a:b", "a//b", "nul\u0000byte",
      "s3:bucket/key") // scheme-shaped: colon before the first slash
    unsafe.foreach(n => assert(!JobSpec.pathSafe(n),
      s"'$n' must be refused"))
    // a colon AFTER the first '/' cannot start a Hadoop Path scheme -
    // ISO-timestamp keys are legitimate and the reference processes
    // them; quarantining them would silently diverge from it
    val safe = Seq("f.csv", "sub/dir/f.csv", "weird name.txt",
      "..hidden", "a..b", "trailing.dots..", "0", "ключ.dat",
      "logs/2024-01-01T12:00:00.json", "a/b:c")
    safe.foreach(n => assert(JobSpec.pathSafe(n),
      s"'$n' must be allowed"))
  }

  test("a well-formed envelope among garbage still dispatches; its " +
    "neighbours quarantine (row-level isolation, not batch death)") {
    import spark.implicits._
    val good = JobSpec.toEnvelope(lit("process"), lit("bkt"),
      lit("in/"), lit("out/"), lit("f.csv"))
    val df = Seq("[[", "{}", "noise").toDF("envelope")
      .select(col("envelope"))
      .union(spark.range(1).select(good.as("envelope")))
      .select(JobSpec.fromEnvelope(col("envelope")).as("j"))
      .select(col("j.*"))
    val (ok, bad) = JobSpec.dispatch(df)
    assert(ok.count() == 1 && bad.count() == 3)
    val r = ok.head()
    assert(r.getString(4) == "f.csv")
  }
}
