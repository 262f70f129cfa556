package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for additive aggregates.
  *
  * The 100 TB motivation: a corpus-level rollup (docs and bytes per
  * source, revenue per status, token counts per shard) is far too
  * expensive to recompute from scratch every time a CDC batch lands,
  * and the reference's pipeline shape (S4 job dequeue -> T1 transform
  * -> S6 result PUT) implies exactly this kind of continuously-
  * maintained output. Count/sum (and anything built from them: mean,
  * weighted mixes) are self-maintainable views: a delta batch folds
  * into the state with a key-local merge — no rescan of the base
  * table, shuffle proportional to |delta| + |touched keys| only.
  *
  * Contract: `state` carries (key, n, tot) — the current aggregate;
  * `delta` carries (key, dn, ds) — the PRE-AGGREGATED effect of a CDC
  * batch (insert: +1/+v; delete: -1/-v; value update: 0/+(new-old)).
  * The merge is a full-outer join on the key: keys only in `delta`
  * are group BIRTHS, keys whose merged count reaches zero are group
  * DEATHS and are dropped (a count below zero means the delta stream
  * was inconsistent with the state — surfaced loudly rather than
  * clamped). Sums stay in whatever exact type the caller aggregated
  * in (DECIMAL end-to-end here; callers cast to double only at the
  * output boundary, per the repo-wide oracle-exactness discipline).
  */
object IncrementalAgg {

  /** Merge aggregate state (key, `n`, `tot`) with a delta-aggregated
    * batch (key, `dn`, `ds`). Column names are positional contracts:
    * state carries (n, tot), delta carries (dn, ds); output carries
    * (key, n, tot). With `keepDeaths` the count-zero groups stay as
    * tombstone rows instead of dropping — required by sinks (AggSync)
    * whose storage upserts by key and cannot unwrite a row; readers
    * filter `n > 0`.
    */
  def mergeCountSum(state: DataFrame, delta: DataFrame,
      key: String, keepDeaths: Boolean = false): DataFrame = {
    val zeroTot: Column = lit(0).cast(state.schema("tot").dataType)
    val zeroDs: Column = lit(0).cast(delta.schema("ds").dataType)
    val merged = state.join(delta, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n"),
        (coalesce(col("tot"), zeroTot) + coalesce(col("ds"), zeroDs))
          .as("tot"))
    // A negative merged count can only mean the caller fed deletes
    // for rows the state never contained: fail the job, don't mask.
    val checked = merged.withColumn("n",
      when(col("n") < 0L,
        raise_error(concat(lit("IncrementalAgg: negative count for key "),
          col(key).cast("string")))).otherwise(col("n")))
    if (keepDeaths) checked else checked.filter(col("n") > 0L)
  }
}
