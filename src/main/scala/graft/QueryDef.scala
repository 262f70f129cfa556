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
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
