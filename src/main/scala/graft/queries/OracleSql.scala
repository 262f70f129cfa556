package graft.queries

import graft.functions.PortableHash.{sqlPermute60, sqlUniform60}

/** Shared DuckDB-SQL fragments for the md5-portable MinHash oracle
  * replays (d18/d10/c19/d08 — the hash-green twins of the xxhash64
  * dedup family). Each fragment is a SQL EXPRESSION or CTE body over
  * agreed column names: `did` (doc id), `text`, `ts` (token list),
  * `hv` (sorted-distinct 60-bit shingle hashes), `sig` (minhash
  * signature list). Centralizing them keeps the four oracles
  * literally the same computation the Spark side runs
  * (Dedup.MinHashFamily.Md5 + TextFunctions.shingles/fingerprint).
  */
private[queries] object OracleSql {

  /** Render a double so DuckDB parses back the identical IEEE value:
    * Java's shortest round-trip decimal (`Double.toString`), which
    * any correctly-rounding strtod (DuckDB's is) maps to the same
    * bits. Used to inline trained-model parameters (k-means
    * centroids, PQ codebooks) into oracle SQL at Verify-dump time.
    */
  def sqlDouble(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, s"non-finite model parameter $d")
    java.lang.Double.toString(d)
  }

  def sqlDoubleArr(a: Seq[Double]): String =
    a.map(sqlDouble).mkString("[", ", ", "]")

  def sqlDoubleArr2(m: Seq[Seq[Double]]): String =
    m.map(sqlDoubleArr).mkString("[", ", ", "]")

  def sqlDoubleArr3(t: Seq[Seq[Seq[Double]]]): String =
    t.map(sqlDoubleArr2).mkString("[", ", ", "]")

  /** Token list of `text` — TextFunctions.tokens replay. */
  val tsExpr: String =
    "list_filter(string_split(text, ' '), x -> x <> '')"

  /** Canonical fingerprint — TextFunctions.fingerprint replay. */
  val fpExpr: String =
    """md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"""

  /** Sorted-distinct md5-60 hashes of word 3-gram shingles of `ts` —
    * Dedup.MinHashFamily.Md5.shingleHashes replay.
    */
  val hvExpr: String =
    s"""list_sort(list_distinct(list_transform(
           CASE WHEN len(ts) >= 3 THEN
             list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
           ELSE [] END,
           s -> ${sqlUniform60("s")})))"""

  /** MinHash signature of `hv` — MinHashFamily.Md5.signature replay. */
  def sigExpr(numHashes: Int): String =
    s"""list_transform(range(0, $numHashes), i ->
           list_min(list_transform(hv, h -> ${sqlPermute60("h", "i")})))"""

  /** CTE body: (did, band, bkey) LSH band keys from a `(did, sig)`
    * relation — lshBuckets replay (r = numHashes / bands signature
    * values per band; the Spark side buckets on xxhash64 of the same
    * slice, an injective-enough compaction of exactly this key).
    */
  def bandsCte(sigRel: String, numHashes: Int, bands: Int): String = {
    val r = numHashes / bands
    s"""SELECT did, b.b AS band,
           list_slice(sig, b.b * $r + 1, b.b * $r + $r) AS bkey
        FROM $sigRel, (SELECT unnest(range(0, $bands)) AS b) b"""
  }

  /** Exact-Jaccard expression over hash lists `ah` / `bh` —
    * VectorFunctions.jaccardSorted replay (one IEEE division of
    * identical int64 counts in both engines).
    */
  def jaccardExpr(ah: String, bh: String): String =
    s"""CAST(len(list_intersect($ah, $bh)) AS DOUBLE) /
        CAST(len($ah) + len($bh) - len(list_intersect($ah, $bh))
          AS DOUBLE)"""

  /** Full nearDupPairs(Md5) replay over a `(did, text)` relation
    * `corpusRel`: canonicalize-first groups, rep-only signatures,
    * band-bucket candidates (bucket cap included), exact-Jaccard
    * verification, star pairs, membership expansion, max-merge.
    * Emits CTEs prefixed `$p` and a final relation `${p}_out`
    * with (id_a, id_b, jaccard).
    */
  def nearDupPairsCtes(
      p: String, corpusRel: String,
      numHashes: Int, bands: Int,
      threshold: Double, maxBucketSize: Int): String =
    s"""${p}_g AS (
          SELECT did, text, min(did) OVER (PARTITION BY fp) AS keep
          FROM (SELECT did, text, $fpExpr AS fp FROM $corpusRel)),
        ${p}_star AS (
          SELECT keep AS id_a, did AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
          FROM ${p}_g WHERE did <> keep),
        ${p}_sh AS (
          SELECT did, $hvExpr AS hv
          FROM (SELECT did, $tsExpr AS ts
                FROM ${p}_g WHERE did = keep)),
        ${p}_sig AS (
          SELECT did, ${sigExpr(numHashes)} AS sig
          FROM ${p}_sh WHERE len(hv) > 0),
        ${p}_bk AS (${bandsCte(s"${p}_sig", numHashes, bands)}),
        ${p}_ok AS (
          SELECT band, bkey FROM ${p}_bk
          GROUP BY band, bkey HAVING count(*) <= $maxBucketSize),
        ${p}_sized AS (
          SELECT b.did, b.band, b.bkey
          FROM ${p}_bk b JOIN ${p}_ok USING (band, bkey)),
        ${p}_cand AS (
          SELECT l.did AS id_a, r.did AS id_b
          FROM ${p}_sized l JOIN ${p}_sized r
            ON l.band = r.band AND l.bkey = r.bkey AND l.did < r.did
          GROUP BY 1, 2),
        ${p}_ver AS (
          SELECT id_a, id_b, jaccard FROM (
            SELECT c.id_a, c.id_b,
                   ${jaccardExpr("a.hv", "b.hv")} AS jaccard
            FROM ${p}_cand c
              JOIN ${p}_sh a ON a.did = c.id_a
              JOIN ${p}_sh b ON b.did = c.id_b)
          WHERE jaccard >= $threshold),
        ${p}_out AS (
          SELECT id_a, id_b, max(jaccard) AS jaccard
          FROM (SELECT * FROM ${p}_ver
                UNION ALL SELECT * FROM ${p}_star)
          GROUP BY id_a, id_b)"""

  /** incrementalNearDups(Md5) CROSS-boundary replay: per-doc index
    * (no canonicalization — dedupIndex is per-doc) on both sides,
    * band-key candidate join, exact-Jaccard verification, and the
    * stored-fingerprint exact leg. Emits CTEs prefixed `$p` and a
    * final `${p}_cross` with (id_a = index did, id_b = batch did,
    * jaccard). Within-batch pairs are NOT included (compose
    * [[nearDupPairsCtes]] over the batch relation when needed).
    */
  def incrementalCrossCtes(
      p: String, indexRel: String, batchRel: String,
      numHashes: Int, bands: Int, threshold: Double): String =
    s"""${p}_ix AS (
          SELECT did, $fpExpr AS fp, $hvExpr AS hv
          FROM (SELECT did, text, $tsExpr AS ts FROM $indexRel)),
        ${p}_ixsig AS (
          SELECT did, ${sigExpr(numHashes)} AS sig
          FROM ${p}_ix WHERE len(hv) > 0),
        ${p}_b AS (
          SELECT did, $fpExpr AS fp, $hvExpr AS hv
          FROM (SELECT did, text, $tsExpr AS ts FROM $batchRel)),
        ${p}_bsig AS (
          SELECT did, ${sigExpr(numHashes)} AS sig
          FROM ${p}_b WHERE len(hv) > 0),
        ${p}_ixbk AS (${bandsCte(s"${p}_ixsig", numHashes, bands)}),
        ${p}_bbk AS (${bandsCte(s"${p}_bsig", numHashes, bands)}),
        ${p}_cand AS (
          SELECT i.did AS id_a, n.did AS id_b
          FROM ${p}_ixbk i JOIN ${p}_bbk n
            ON i.band = n.band AND i.bkey = n.bkey AND i.did <> n.did
          GROUP BY 1, 2),
        ${p}_ver AS (
          SELECT id_a, id_b, jaccard FROM (
            SELECT c.id_a, c.id_b,
                   ${jaccardExpr("a.hv", "b.hv")} AS jaccard
            FROM ${p}_cand c
              JOIN ${p}_ix a ON a.did = c.id_a
              JOIN ${p}_b b ON b.did = c.id_b)
          WHERE jaccard >= $threshold),
        ${p}_fp AS (
          SELECT a.did AS id_a, b.did AS id_b,
                 CAST(1.0 AS DOUBLE) AS jaccard
          FROM ${p}_ix a JOIN ${p}_b b ON a.fp = b.fp
          WHERE a.did <> b.did),
        ${p}_cross AS (
          SELECT * FROM ${p}_ver UNION ALL SELECT * FROM ${p}_fp)"""
}
