package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark implementation plus (when
  * SQL-expressible) an ANSI-SQL oracle the driver runs in DuckDB over
  * the same parquet tables. Column names/aliases MUST match between
  * the two — the driver sorts columns by name before hashing values.
  *
  * Float discipline: every aggregated/computed double is `round`ed to
  * a fixed scale in BOTH implementations, and timestamps are emitted
  * as exact integer microseconds (`unix_micros` / `epoch_us`), so the
  * hash compare never trips on last-ulp float or epoch-format drift.
  *
  * `oracleGen` is the data-dependent form of `oracle`: some operators
  * (IVF / PQ / SemDeDup) train a tiny deterministic model (k-means
  * centroids, PQ codebooks) whose SQL replay needs the trained values
  * as literals. The generator runs at Verify-dump time with the same
  * (session, sfDir) the query ran with, re-derives the same frozen
  * model (training is seeded and bounded), and splices it into the
  * SQL — the d06/s02 "hyperplanes as plan literals" discipline
  * extended to trained parameters. `oracle` wins if both are set.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    oracleGen: Option[(SparkSession, String) => String] = None)
