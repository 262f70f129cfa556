package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every registered capability of the engine: the relational
  * surface (graft.queries.RelationalQueries), the reference-parity file
  * pipeline (graft.queries.PipelineQueries), and the LLM-data-pipeline
  * operators (dedup / similarity / text analysis / multimodal). Each
  * entry is a (SparkSession, sfDir) => DataFrame plus, when
  * SQL-expressible, a DuckDB oracle with IDENTICAL column aliases.
  */
object SparkEntry {

  /** All registered capabilities, in build order. */
  def all: ListMap[String, QueryDef] =
    queries_.foldLeft(ListMap.empty[String, QueryDef])(_ ++ _)

  private def queries_ : Seq[ListMap[String, QueryDef]] = Seq(
    graft.queries.RelationalQueries.defs,
    graft.queries.PipelineQueries.defs,
    graft.queries.TextQueries.defs,
    graft.queries.CurationQueries.defs,
    graft.queries.DedupQueries.defs,
    graft.queries.MultimodalQueries.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, d) if d.oracle.isDefined =>
      k -> d.oracle.get.trim }
}
