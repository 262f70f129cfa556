package graft.queries

import graft.functions.PortableHash.{
  sqlPermuteFrom, sqlUniform60, sqlUniform60Tail}

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

  /** MinHash signature of `hv` — MinHashFamily.Md5.signature replay:
    * the Kirsch–Mitzenmacher family, permutation i of shingle hash h
    * = (h1 + i*h2) mod 2^60 with (h1, h2) the two 60-bit halves of
    * md5(decimal rendering of h). DuckDB re-derives the digest pair
    * inside the per-i lambda (md5 twice per (h, i) — fine at oracle
    * scale); the Spark side computes it once per distinct h.
    */
  def sigExpr(numHashes: Int): String =
    s"""list_transform(range(0, $numHashes), i ->
           list_min(list_transform(hv, h -> ${sqlPermuteFrom(
             sqlUniform60("CAST(h AS VARCHAR)"),
             sqlUniform60Tail("CAST(h AS VARCHAR)"), "i")})))"""

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
        ${p}_exp AS (
          -- verified REP pairs expand through fingerprint-group
          -- membership (cross-group member pairs inherit the reps'
          -- jaccard) — the engine's canonicalize-first contract.
          -- Without this leg the replay was 7 rows short at sf0.1,
          -- where (unlike the sf0.01 gate fixture) a multi-member
          -- group participates in a cross-group near-dup pair.
          SELECT least(ma.did, mb.did) AS id_a,
                 greatest(ma.did, mb.did) AS id_b, v.jaccard
          FROM ${p}_ver v
          JOIN ${p}_g ma ON ma.keep = v.id_a
          JOIN ${p}_g mb ON mb.keep = v.id_b),
        ${p}_out AS (
          SELECT id_a, id_b, max(jaccard) AS jaccard
          FROM (SELECT * FROM ${p}_exp
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

  /** [[incrementalCrossCtes]] with the round-11 PER-BUCKET
    * REFINEMENT replayed: overfull corpus band buckets subdivide by
    * appended signature coordinates, iteratively, exactly as
    * `Dedup.incrementalPairs` computes them. The engine's chained
    * xxhash64 keys replay as concatenated SLICE LISTS — key equality
    * is slice-tuple equality (the same injective-enough compaction
    * argument as the base band key: the band slice is always `r`
    * values and the appended prefix length is uniform within a
    * bucket chain, so the concatenation is unambiguous). The
    * adaptive rounds unroll as `rounds` fixed CTE rounds — a round
    * with nothing overfull is an identity on both sides, which is
    * also precisely the engine's early exit. Emits `${p}_cross`.
    */
  def incrementalRefinedCrossCtes(
      p: String, indexRel: String, batchRel: String,
      numHashes: Int, bands: Int, threshold: Double,
      maxBucketSize: Int, rounds: Int = 3): String = {
    val r = numHashes / bands
    val maxExtra = numHashes - r
    // exact integer depth ladder — the engine's when-chain verbatim
    val ladder = (1 to 12).map(e =>
      s"WHEN ((cnt + ${maxBucketSize - 1}) // $maxBucketSize) <= ${1L << e} THEN $e")
      .mkString(
        s"CASE WHEN ((cnt + ${maxBucketSize - 1}) // $maxBucketSize) <= 1 THEN 0 ",
        " ", " ELSE 12 END")
    // rotated coordinate sequence after band b, cyclic (qualified —
    // the per-round left join puts `band` on both sides)
    val rot = s"""(list_slice(k.sig, k.band * $r + $r + 1, $numHashes) ||
                   list_slice(k.sig, 1, k.band * $r))"""
    val d2 = s"least(o.depth, $maxExtra - k.used)"
    def step(prev: String, over: String): String =
      s"""SELECT k.did, k.band,
                 CASE WHEN o.depth IS NOT NULL AND $d2 > 0
                   THEN k.bkey || list_slice($rot, k.used + 1,
                     k.used + $d2)
                   ELSE k.bkey END AS bkey,
                 CASE WHEN o.depth IS NOT NULL AND $d2 > 0
                   THEN k.used + $d2
                   ELSE k.used END AS used,
                 k.sig
          FROM $prev k
          LEFT JOIN $over o
            ON o.band = k.band AND o.bkey = k.bkey"""
    def roundCtes(i: Int): String = {
      val (prevK, prevN) = (s"${p}_k${i - 1}", s"${p}_n${i - 1}")
      s"""${p}_ov$i AS (
            SELECT band, bkey, $ladder AS depth
            FROM (SELECT band, bkey, count(*) AS cnt
                  FROM $prevK GROUP BY band, bkey)
            WHERE cnt > $maxBucketSize),
          ${p}_k$i AS (${step(prevK, s"${p}_ov$i")}),
          ${p}_n$i AS (${step(prevN, s"${p}_ov$i")})"""
    }
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
        ${p}_k0 AS (
          SELECT did, b.b AS band,
                 list_slice(sig, b.b * $r + 1, b.b * $r + $r) AS bkey,
                 0 AS used, sig
          FROM ${p}_ixsig, (SELECT unnest(range(0, $bands)) AS b) b),
        ${p}_n0 AS (
          SELECT did, b.b AS band,
                 list_slice(sig, b.b * $r + 1, b.b * $r + $r) AS bkey,
                 0 AS used, sig
          FROM ${p}_bsig, (SELECT unnest(range(0, $bands)) AS b) b),
        ${(1 to rounds).map(roundCtes).mkString(",\n        ")},
        ${p}_okr AS (
          SELECT band, bkey FROM ${p}_k$rounds
          GROUP BY band, bkey HAVING count(*) <= $maxBucketSize),
        ${p}_cand AS (
          SELECT i.did AS id_a, n.did AS id_b
          FROM ${p}_k$rounds i
            JOIN ${p}_okr USING (band, bkey)
            JOIN ${p}_n$rounds n
              ON n.band = i.band AND n.bkey = i.bkey AND i.did <> n.did
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

  /** Recursive-CTE replay of Bpe.tokenize — the greedy-by-rank BPE
    * apply — with a FROZEN merge list inlined as literals (oracleGen
    * supplies the corpus-trained merges at Verify-dump time, the
    * trained-model-literal discipline of the IVF/PQ oracles).
    *
    * Encoding: a word's symbol sequence renders as ONE string with
    * every symbol wrapped in chr(30) separators ("␞s1␞␞s2␞…"), so
    * "merge all non-overlapping occurrences of pair (l,r)
    * left-to-right" — the operator's inner loop — is a plain
    * substring replace of ␞l␞␞r␞ with ␞lr␞ (replace() scans
    * left-to-right and resumes after each replacement, exactly the
    * k += 2 sweep). Rank selection is a CASE chain in rank order, so
    * the first matching WHEN is the minimum — Bpe.segment's
    * bestRank. The recursion steps while any learned pair is
    * present; termination is structural (every merge strictly
    * shrinks the string). Callers MUST verify chr(30) never occurs
    * in the corpus (the generators do, loudly) — symbols can then
    * never contain the separator and pattern matches align exactly
    * with symbol boundaries.
    *
    * Emits CTEs (the enclosing WITH must say RECURSIVE): `bpewords`
    * (distinct corpus words — segmentation runs once per word, the
    * oracle's mirror of the operator's per-partition memoization),
    * `bpeseg`, `bpedoc` (doc_id -> n_bpe_tokens, zero for wordless
    * docs).
    */
  def bpeApplyCtes(merges: Seq[(String, String)],
      docRel: String = "documents"): String = {
    def q(x: String) = "'" + x.replace("'", "''") + "'"
    val rs = "chr(30)"
    def pat(l: String, r: String) =
      s"$rs||${q(l)}||$rs||$rs||${q(r)}||$rs"
    val br = merges.zipWithIndex.map { case ((l, r), i) =>
      s"WHEN contains(s, ${pat(l, r)}) THEN ${i + 1}"
    }.mkString("CASE ", " ", " END")
    val step = merges.zipWithIndex.map { case ((l, r), i) =>
      s"WHEN ${i + 1} THEN replace(s, ${pat(l, r)}, " +
        s"$rs||${q(l + r)}||$rs)"
    }.mkString("CASE br ", " ", " END")
    val norm = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""
    val docWords = s"list_filter(string_split($norm, ' '), x -> x != '')"
    s"""bpewords AS (
          SELECT DISTINCT w FROM (
            SELECT unnest($docWords) AS w FROM $docRel)),
        bpeseg AS (
          SELECT w,
                 $rs || array_to_string(
                   list_append(regexp_extract_all(w, '.'), '</w>'),
                   $rs||$rs) || $rs AS s
          FROM bpewords
          UNION ALL
          SELECT w, $step AS s
          FROM (SELECT w, s, $br AS br FROM bpeseg)
          WHERE br IS NOT NULL),
        bpefin AS (
          SELECT w, (length(s) - length(replace(s, chr(30), ''))) // 2
                   AS n_sub
          FROM (SELECT w, s, $br AS br FROM bpeseg)
          WHERE br IS NULL),
        bpedoc AS (
          SELECT d.doc_id,
                 CAST(coalesce(sum(t.n_sub), 0) AS BIGINT)
                   AS n_bpe_tokens
          FROM $docRel d
          LEFT JOIN (
            SELECT dt.doc_id, f.n_sub
            FROM (SELECT doc_id, unnest($docWords) AS w FROM $docRel) dt
            JOIN bpefin f USING (w)) t
            ON d.doc_id = t.doc_id
          GROUP BY d.doc_id)"""
  }

  /** Full SQL replay of Bpe.learnMerges — the merge-SELECTION loop
    * itself, not just the apply half (bpeApplyCtes): DuckDB re-runs
    * tokenizer INDUCTION from the raw corpus and must land on the
    * identical (rank, left, right, pair_count) sequence. The loop is
    * a bounded iteration (numMerges rounds of argmax over weighted
    * adjacent-pair counts), so it UNROLLS as numMerges chained CTE
    * blocks — pair-count, argmax, merge-rewrite — rather than a
    * recursive CTE (standard SQL forbids aggregating over the
    * recursive reference, and the bound is a plan-time constant
    * anyway):
    *
    *  - `bpehist`: the word histogram with the operator's
    *    deterministic (count desc, word) maxVocab cut;
    *  - `v0`: each word as a chr(30)-wrapped symbol string (the
    *    bpeApplyCtes encoding — one symbol per codepoint + `</w>`);
    *  - `p{k}`: adjacent-pair counts weighted by word count, with
    *    within-word multiplicity (unnest preserves duplicates — the
    *    operator's addWordPairs counts every adjacency);
    *  - `b{k}`: the argmax with the operator's total-order tie-break
    *    (count desc, then lexicographically smallest (left, right));
    *  - `v{k}`: all non-overlapping occurrences merged left-to-right
    *    (replace() resumes after each replacement = the k += 2
    *    sweep).
    *
    * Every stage is AS MATERIALIZED: `v{k}` references `v{k-1}`
    * twice (pair counts + rewrite), so default CTE inlining doubles
    * the expression tree per round — 2^numMerges scans of the base
    * relation (measured: "too many open files" at 20 rounds);
    * materialization makes the chain linear (0.26 s at sf0.01).
    * Early exhaustion degrades identically: an empty `b{k}` empties
    * every later stage and contributes no rank row, exactly the
    * operator's stop-early path. Callers must run the
    * [[bpeLearnOracleGuards]] first: the chr(30) separator guard,
    * plus a supplementary-plane guard because the tie-break compares
    * strings — Java orders by UTF-16 code unit, DuckDB by UTF-8 byte
    * (= codepoint), and the two disagree precisely on
    * supplementary-plane characters.
    */
  def bpeLearnSql(numMerges: Int, maxVocab: Int = 65536,
      docRel: String = "documents"): String = {
    val rs = "chr(30)"
    val norm = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""
    val docWords = s"list_filter(string_split($norm, ' '), x -> x != '')"
    val symRe = s"$rs||'([^'||$rs||']+)'||$rs"
    val blocks = (1 to numMerges).map { k =>
      val prev = s"v${k - 1}"
      s"""p$k AS MATERIALIZED (
          SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n
          FROM (
            SELECT cnt, unnest(list_transform(range(1, len(sy)),
              i -> [sy[i], sy[i+1]])) AS pr
            FROM (SELECT cnt, regexp_extract_all(s, $symRe, 1) AS sy
                  FROM $prev))
          GROUP BY 1, 2),
        b$k AS MATERIALIZED (SELECT l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1),
        v$k AS MATERIALIZED (
          SELECT w, cnt,
                 replace(s, $rs||l||$rs||$rs||r||$rs, $rs||l||r||$rs) AS s
          FROM $prev CROSS JOIN b$k)"""
    }
    val ranks = (1 to numMerges).map { k =>
      s"""SELECT CAST($k AS INTEGER) AS rank, l AS "left",
             r AS "right", n AS pair_count FROM b$k"""
    }.mkString("\nUNION ALL ")
    s"""WITH bpehist AS MATERIALIZED (
          SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest($docWords) AS w FROM $docRel)
          GROUP BY w ORDER BY cnt DESC, w LIMIT $maxVocab),
        v0 AS MATERIALIZED (
          SELECT w, cnt,
                 $rs || array_to_string(
                   list_append(regexp_extract_all(w, '.'), '</w>'),
                   $rs||$rs) || $rs AS s
          FROM bpehist),
        ${blocks.mkString(",\n")}
        SELECT * FROM ($ranks) ORDER BY rank"""
  }

  /** Loud preconditions for [[bpeLearnSql]] (see its scaladoc): the
    * corpus must be free of the chr(30) symbol separator AND of
    * supplementary-plane characters (the argmax tie-break is a
    * string comparison, and Java UTF-16 order diverges from DuckDB
    * codepoint order exactly there). Failing the generator keeps the
    * query rows-only instead of risking a misaligned replay.
    */
  def bpeLearnOracleGuards(docs: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val sep = docs.filter(col("text").contains("\u001e")).count()
    require(sep == 0,
      s"bpe oracle: corpus contains chr(30) separator in $sep docs")
    val supp = docs
      .filter(col("text").rlike("[\\x{10000}-\\x{10FFFF}]")).count()
    require(supp == 0,
      s"bpe learn oracle: $supp docs contain supplementary-plane " +
        "characters (UTF-16 vs codepoint tie-break order may diverge)")
  }

  /** Shared oracleGen preamble for the BPE-apply replays: re-derive
    * the frozen merge list (learnMerges is deterministic — one
    * bounded histogram with a total-order cut, then an exact greedy
    * loop) and verify the chr(30) separator never occurs in the
    * corpus, failing the generator loudly if it does (the query then
    * stays rows-only rather than risking a misaligned replay).
    */
  def bpeTrainedMerges(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      numMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions.col
    val sep = docs.filter(col("text").contains("\u001e")).count()
    require(sep == 0,
      s"bpe oracle: corpus contains chr(30) separator in $sep docs")
    graft.operators.Bpe.learnMerges(docs, "text", numMerges)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }
}
