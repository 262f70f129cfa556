package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, prefixes) = (args(0), args(1), args.drop(2).toSeq)
    val spark = Engine.session(appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    // optional name-prefix filter (dev iteration; the driver always
    // runs the full two-arg form)
    val selected =
      if (prefixes.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) =>
        prefixes.exists(n.startsWith) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally Engine.releaseCheckpoints(spark) // per-query blocks (see Engine)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // static oracles verbatim; data-dependent ones (oracleGen — IVF /
    // PQ / SemDeDup trained-model literals) resolved HERE with the
    // same (session, sfDir) the queries ran with, so the frozen model
    // in the SQL is byte-identical to the one the query trained.
    val json = SparkEntry.all
      .filter { case (k, _) => selected.contains(k) }
      .flatMap { case (k, d) =>
        val sql = d.oracle.orElse(d.oracleGen.map { g =>
          try g(spark, sfDir)
          catch { case e: Throwable =>
            System.err.println(
              s"[verify] $k oracleGen failed: ${e.getMessage}")
            null
          }
        }).filter(_ != null)
        sql.map(s => s"${q(k)}: ${q(s.trim)}")
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
