package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PipeLinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("line pipe: one process per partition, line-for-line transform") {
    val in = spark.createDataset(Seq("hello", "world", "spark"))
      .repartition(2)
    val out = PipeTransform.transformLines(in,
      Seq("tr", "a-z", "A-Z")).collect().toSet
    assert(out == Set("HELLO", "WORLD", "SPARK"))
  }

  test("line pipe with a filtering command changes cardinality") {
    val in = spark.createDataset((1 to 100).map(i => s"line$i"))
      .repartition(4)
    // grep exits 1 on a partition with no matches — a legal outcome
    // for a filter, declared via okExitCodes rather than special-cased
    val out = PipeTransform.transformLines(in,
      Seq("grep", "line1"), okExitCodes = Set(0, 1)).collect()
    // line1, line10..line19, line100
    assert(out.length == 12)
  }

  test("line pipe: buffering command (sort) emits after stdin closes") {
    // sort produces NOTHING until EOF of stdin: the idle watchdog must
    // count from the last progress, not kill a command that is simply
    // batch-shaped — writing finishes fast here, then output flows
    val in = spark.createDataset(Seq("b", "a", "c")).repartition(1)
    val out = PipeTransform.transformLines(in, Seq("sort"),
      idleTimeoutSec = 30).collect().toSeq
    assert(out == Seq("a", "b", "c"))
  }

  test("line pipe: hung command is killed at the idle timeout and the " +
    "task fails for redelivery") {
    val in = spark.createDataset(Seq("x")).repartition(1)
    val t0 = System.nanoTime()
    val ex = intercept[org.apache.spark.SparkException] {
      PipeTransform.transformLines(in,
        Seq("sh", "-c", "sleep 600"), idleTimeoutSec = 1).collect()
    }
    val elapsedS = (System.nanoTime() - t0) / 1e9
    assert(elapsedS < 30, s"kill took ${elapsedS}s")
    assert(String.valueOf(ex.getMessage).contains("idle") ||
      String.valueOf(ex.getCause).contains("idle"))
    // the grandchild sleep must be gone too (tree kill, not child kill)
    Thread.sleep(500)
    val ps = new String(new ProcessBuilder("ps", "-eo", "args")
      .start().getInputStream.readAllBytes())
    assert(!ps.contains("sleep 600") ||
      !ps.contains("sh -c sleep 600"), "pipe child survived")
  }

  test("line pipe: upstream iterator failure fails the task even when " +
    "the child tolerates truncated stdin and exits 0") {
    // head -1 closes stdin after one line and exits 0 — a child that
    // makes PARTIAL input look complete. An upstream read failure
    // (corrupt record, fetch failure) must still fail the task, not
    // vanish into the writer thread (silent data loss).
    val in = spark.createDataset((1 to 100).toSeq).repartition(1)
      .map(i => if (i == 50)
        throw new RuntimeException("corrupt upstream record")
      else s"line$i")
    val ex = intercept[org.apache.spark.SparkException] {
      PipeTransform.transformLines(in, Seq("head", "-1")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(String.valueOf(_)).toSeq
    assert(chain(ex).exists(_.contains("corrupt upstream record")),
      s"upstream failure not propagated: ${chain(ex)}")
  }

  test("line pipe: a selective filter consuming stdin without emitting " +
    "is progress, not a stall") {
    // six records trickling in at ~0.9 s each against a 2 s idle
    // window: grep matches nothing, so stdout is silent for ~5.4 s —
    // but stdin IS being consumed, and the progress clock must count
    // it (the old stdout-only detector killed exactly this shape)
    val in = spark.createDataset((1 to 6).toSeq).repartition(1)
      .map { i => Thread.sleep(900); s"nomatch$i" }
    val out = PipeTransform.transformLines(in, Seq("grep", "ZZZ"),
      idleTimeoutSec = 2, okExitCodes = Set(0, 1)).collect()
    assert(out.isEmpty)
  }

  test("line pipe: nonzero exit fails the task loudly") {
    val in = spark.createDataset(Seq("x", "y")).repartition(1)
    val ex = intercept[org.apache.spark.SparkException] {
      PipeTransform.transformLines(in,
        Seq("sh", "-c", "cat > /dev/null; exit 3")).collect()
    }
    assert(String.valueOf(ex.getMessage).contains("exited 3") ||
      String.valueOf(ex.getCause).contains("exited 3"))
  }
}
