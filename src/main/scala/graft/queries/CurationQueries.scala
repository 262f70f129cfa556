package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Engine, QueryDef}
import graft.functions.TextFunctions
import graft.operators.Sampling

/** Corpus-curation surface: the composed pipeline a training-data
  * run actually executes (quality gate -> exact dedup -> keep set)
  * plus deterministic hash sampling for reproducible train/eval
  * splits. Everything here is SQL-expressible by construction, so
  * the whole curation path is oracle-checked end-to-end.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String) =
    Engine.Tables(s, dir).documents

  private def T(s: SparkSession, dir: String) = Engine.Tables(s, dir)

  /** One cached c36 table dir per sfDir, recursively wiped at entry
    * (TableSync no-ops on already-applied batch ids, so a reused path
    * must start empty) and removed at JVM exit — the p05TmpDir
    * discipline; without it every execution (including bench
    * re-measure passes) leaked a fresh orders-scale table on disk.
    */
  private val tmpDirs =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }
  private def cachedTmpDir(tag: String, dir: String): String = {
    val path = tmpDirs.getOrElseUpdate((tag, dir), {
      // the PID keeps the fixed-name leak fix per-process: two JVMs
      // running the harness against the same sfDir (or a hashCode
      // collision across dirs) must not rmTree each other's live
      // TableSync state mid-query
      val f = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-$tag-${Integer.toHexString(dir.hashCode)}-" +
          ProcessHandle.current().pid())
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => rmTree(f)))
      f.toString
    })
    val f = new java.io.File(path)
    rmTree(f); f.mkdirs()
    path
  }
  private def c36Dir(dir: String): String = cachedTmpDir("evo-cdc", dir)

  /** DuckDB mirror of TextFunctions.qualityScore (same shape as the
    * t03 oracle), as a CTE body computing (doc_id, text, quality).
    */
  private val qualityCte = """
    f AS (
      SELECT doc_id, text,
        CAST(length(text) AS DOUBLE) AS nc,
        list_filter(string_split(text, ' '), x -> x != '') AS toks,
        list_filter(string_split(lower(text), ' '), x -> x != '') AS ltoks,
        CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))
          AS DOUBLE) AS np
      FROM documents),
    g AS (
      SELECT doc_id, text, nc, np,
        CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(len(list_filter(ltoks,
                 x -> list_contains(
                   ['the','a','of','and','to','in','is','it','that','for'], x)))
               AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS stop_ratio,
        CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
               AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS mtl
      FROM f),
    scored AS (
      SELECT doc_id, text,
        round(
          (least(nc / 200.0, 1.0) *
            (CASE WHEN nc > 20000 THEN 0.5 ELSE 1.0 END)) * 0.3 +
          least(stop_ratio * 5.0, 1.0) * 0.3 +
          (CASE WHEN np / greatest(nc, 1.0) > 0.3
                THEN 0.2 ELSE 1.0 END) * 0.2 +
          (CASE WHEN mtl BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.4 END) * 0.2,
          6) AS quality
      FROM g)"""

  val defs: ListMap[String, QueryDef] = ListMap(
    // ------------------------------------------------------------------
    "c01_curation" -> QueryDef(
      fn = { (s, dir) =>
        // The flagship composed pipeline: quality-gate, then exact
        // dedup over the survivors, one keep-row per distinct content.
        // Plan shape at scale: one codegen scan computes quality +
        // fingerprint, one hash-agg shuffle on the fingerprint — the
        // same cost as d01 alone; the quality gate is free.
        val scored = docs(s, dir).select(col("doc_id"), col("text"),
          TextFunctions.qualityScore(col("text")).as("quality"))
          .filter(col("quality") >= 0.5)
        scored
          .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"),
            count(lit(1)).as("n_dups"),
            max(col("quality")).as("quality"))
      },
      oracle = Some(s"""
        WITH $qualityCte
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
               min(doc_id) AS keep_id, count(*) AS n_dups,
               max(quality) AS quality
        FROM scored WHERE quality >= 0.5
        GROUP BY 1"""),
      doc = "Composed curation pipeline: quality gate -> exact dedup " +
        "keep set (oracle-checked end-to-end)."),

    // ------------------------------------------------------------------
    "c02_hash_sample" -> QueryDef(
      fn = { (s, dir) =>
        // Deterministic 10% sample: membership is a pure function of
        // doc_id (md5-prefix threshold), so the split is identical on
        // any engine, partitioning, or cluster size — unlike
        // df.sample(seed), which drifts with partition layout.
        Sampling.hashSample(docs(s, dir), "doc_id", 0.10)
          .select(col("doc_id"), col("source"), col("lang"))
      },
      oracle = Some(s"""
        SELECT doc_id, source, lang
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                < '${Sampling.thresholdHex(0.10)}'"""),
      doc = "Deterministic content-keyed 10% sample (engine-portable)."),

    // ------------------------------------------------------------------
    "c03_stratified_sample" -> QueryDef(
      fn = { (s, dir) =>
        // Stratified curation sampling: downsample the dominant
        // language, keep rare ones whole — per-stratum deterministic
        // thresholds on the same record hash.
        Sampling.stratifiedHashSample(docs(s, dir), "doc_id", "lang",
          Map("en" -> 0.25, "zh" -> 1.0, "es" -> 0.5, "de" -> 0.5,
            "fr" -> 0.5))
          .select(col("doc_id"), col("lang"))
      },
      oracle = Some(s"""
        SELECT doc_id, lang
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) <
          CASE lang
            WHEN 'en' THEN '${Sampling.thresholdHex(0.25)}'
            WHEN 'zh' THEN '${Sampling.thresholdHex(1.0)}'
            WHEN 'es' THEN '${Sampling.thresholdHex(0.5)}'
            WHEN 'de' THEN '${Sampling.thresholdHex(0.5)}'
            WHEN 'fr' THEN '${Sampling.thresholdHex(0.5)}'
            ELSE '${Sampling.thresholdHex(0.0)}' END"""),
      doc = "Stratified deterministic sampling per language " +
        "(sampleBy analog, reproducible)."),

    // ------------------------------------------------------------------
    "c04_dedup_corpus" -> QueryDef(
      fn = { (s, dir) =>
        graft.operators.Dedup.dedupCorpus(
          Engine.widenIfNarrow(Engine.Tables(s, dir).documents),
          "text", "doc_id", threshold = 0.5)
          .select(col("doc_id"), col("source"), col("lang"))
      },
      // Mirrors the engine's pipeline stage by stage (d16's closure
      // form): fingerprint groups -> star edges, rep-rep pairs by
      // exact distinct-shingle Jaccard >= 0.5 (the oracle scores ALL
      // rep pairs where the engine scores LSH candidates — equal
      // whenever banding recall is total, so a recall miss goes RED
      // here instead of hiding), recursive-CTE closure, min-id keep
      // set. The all-pairs rep join is oracle-side only.
      oracle = Some("""
        WITH RECURSIVE
        fp AS (
          SELECT doc_id,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
          FROM documents),
        grp AS (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS keep FROM fp),
        star AS (
          SELECT keep AS id_a, doc_id AS id_b FROM grp WHERE doc_id <> keep),
        sh AS (
          SELECT d.doc_id,
                 list_distinct(CASE WHEN len(ts) >= 3 THEN
                   list_transform(range(1, len(ts) - 1),
                     i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
                   ELSE [] END) AS s
          FROM (SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '') AS ts
                FROM documents JOIN grp USING (doc_id)
                WHERE grp.doc_id = grp.keep) d(doc_id, ts)),
        reppairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON b.doc_id > a.doc_id
          WHERE len(a.s) > 0 AND len(b.s) > 0
            AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                >= 0.5),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM star
          UNION SELECT id_b, id_a FROM star
          UNION SELECT id_a, id_b FROM reppairs
          UNION SELECT id_b, id_a FROM reppairs),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
        keepset AS (
          SELECT id FROM reach GROUP BY id HAVING id = min(r))
        SELECT d.doc_id, d.source, d.lang
        FROM documents d JOIN keepset k ON d.doc_id = k.id"""),
      doc = "One-call corpus dedup keep set (exact + MinHash LSH + " +
        "connected components), closure hash-checked end to end."),

    // ------------------------------------------------------------------
    "c05_decontaminate" -> QueryDef(
      fn = { (s, dir) =>
        // Benchmark decontamination: flag every training doc sharing a
        // word trigram with the held-out eval slice (deterministic
        // slice: doc_id % 97 == 0). Scale shape: the eval n-gram set
        // is millions of rows even for a large benchmark suite ->
        // BROADCAST it; the corpus side is explode -> broadcast
        // semi-join -> partial count, so the 100 TB side is never
        // shuffled at all.
        val d = docs(s, dir).select(col("doc_id"),
          array_distinct(TextFunctions.shingles(col("text"), 3)).as("ng"))
        val evalNg = d.filter(col("doc_id") % 97 === 0)
          .select(explode(col("ng")).as("ngram")).distinct()
        d.filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), explode(col("ng")).as("ngram"))
          .join(broadcast(evalNg), Seq("ngram"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x != '') AS ts
          FROM documents),
        tri AS (
          SELECT doc_id, list_distinct(CASE WHEN len(ts) >= 3 THEN
            list_transform(range(1, len(ts) - 1),
              i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS ng
          FROM toks),
        ev AS (
          SELECT DISTINCT unnest(ng) AS ngram FROM tri
          WHERE doc_id % 97 = 0),
        corpus AS (
          SELECT doc_id, unnest(ng) AS ngram FROM tri
          WHERE doc_id % 97 != 0)
        SELECT c.doc_id, count(*) AS n_hits
        FROM corpus c JOIN ev USING (ngram)
        GROUP BY c.doc_id"""),
      doc = "Benchmark decontamination: trigram overlap vs a held-out " +
        "eval slice (broadcast semi-join; corpus side never shuffles)."),

    // ------------------------------------------------------------------
    "c06_shards" -> QueryDef(
      fn = { (s, dir) =>
        // Training-shard assignment: content-keyed shard in [0,16)
        // from the first md5 hex digit (uniform, engine-portable, and
        // stable under repartitioning — unlike spark_partition_id),
        // with per-shard doc/token totals to verify balance. At scale
        // this is the landing step before
        // df.repartition(col("shard")).write: one hash-agg shuffle.
        docs(s, dir)
          .select(
            expr("cast(instr('0123456789abcdef', " +
              "substring(md5(cast(doc_id as string)), 1, 1)) - 1 as int)")
              .as("shard"),
            TextFunctions.tokenCount(col("text")).as("ntok"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ntok").cast("long")).as("n_tokens"))
      },
      oracle = Some("""
        SELECT CAST(strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
               AS INTEGER) AS shard,
               count(*) AS n_docs,
               CAST(sum(len(list_filter(string_split(text, ' '),
                 x -> x != ''))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY 1"""),
      doc = "Deterministic training-shard assignment + balance stats " +
        "(md5-digit sharding, engine-portable)."),

    // ------------------------------------------------------------------
    "c07_topk_per_source" -> QueryDef(
      fn = { (s, dir) =>
        // Best-k-per-domain selection (keep the 3 highest-quality docs
        // per source). rank <= k over a window is the declarative
        // form; Spark 4 plans it as WindowGroupLimit — a per-partition
        // top-k pushed BELOW the shuffle — so at 100 TB each map task
        // forwards at most k rows per group instead of sorting whole
        // partitions (asserted in PlanShapeSpec). Ties broken by
        // doc_id for cross-engine determinism.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id").asc)
        docs(s, dir)
          .select(col("doc_id"), col("source"),
            TextFunctions.qualityScore(col("text")).as("quality"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
      },
      oracle = Some(s"""
        WITH $qualityCte,
        ranked AS (
          SELECT s.doc_id, d.source, s.quality,
                 row_number() OVER (PARTITION BY d.source
                   ORDER BY s.quality DESC, s.doc_id) AS rk
          FROM scored s JOIN documents d USING (doc_id))
        SELECT doc_id, source, quality, CAST(rk AS INTEGER) AS rk
        FROM ranked WHERE rk <= 3"""),
      doc = "Top-3 docs per source by quality (WindowGroupLimit " +
        "top-k-per-group, no full partition sort)."),

    // ------------------------------------------------------------------
    "c08_pii_redact" -> QueryDef(
      fn = { (s, dir) =>
        // PII scrubbing pass: e-mail -> <EMAIL>, IPv4 -> <IP>, long
        // digit runs -> <NUM>, applied in that order (an e-mail
        // contains digit runs; an IPv4 contains digit runs — ordering
        // is part of the contract). The fixture corpus is synthetic
        // word salad with no PII, so the query plants deterministic
        // PII derived from doc_id first; the redaction then has real
        // work to undo, and the oracle checks byte-identical output.
        // Scale shape: pure per-row regex chain, one codegen map pass,
        // zero shuffle.
        val aug = concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 2 === 0,
            concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
              lit(".7"))).otherwise(lit("")),
          lit(" ref "), (col("doc_id") + 100000000L).cast("string"))
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
        val numRe = "[0-9]{6,}"
        val r1 = regexp_replace(aug, emailRe, "<EMAIL>")
        val r2 = regexp_replace(r1, ipRe, "<IP>")
        val r3 = regexp_replace(r2, numRe, "<NUM>")
        docs(s, dir).select(
          col("doc_id"),
          r3.as("clean"),
          size(regexp_extract_all(aug, lit(emailRe), lit(0))).as("n_email"),
          size(regexp_extract_all(r1, lit(ipRe), lit(0))).as("n_ip"),
          size(regexp_extract_all(r2, lit(numRe), lit(0))).as("n_num"))
      },
      oracle = Some("""
        WITH aug AS (
          SELECT doc_id,
            text ||
            CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END ||
            CASE WHEN doc_id % 2 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                 ELSE '' END ||
            ' ref ' || CAST(doc_id + 100000000 AS VARCHAR) AS t
          FROM documents),
        r AS (
          SELECT doc_id, t,
            regexp_replace(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g') AS t1
          FROM aug),
        r2 AS (
          SELECT doc_id, t, t1,
            regexp_replace(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS t2
          FROM r)
        SELECT doc_id,
          regexp_replace(t2, '[0-9]{6,}', '<NUM>', 'g') AS clean,
          CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
            AS n_email,
          CAST(len(regexp_extract_all(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}'))
            AS INTEGER) AS n_ip,
          CAST(len(regexp_extract_all(t2, '[0-9]{6,}')) AS INTEGER) AS n_num
        FROM r2"""),
      doc = "PII redaction (e-mail/IPv4/digit-run -> placeholders, " +
        "ordered regex chain; byte-identical oracle)."),

    // ------------------------------------------------------------------
    "c09_quality_rules" -> QueryDef(
      fn = { (s, dir) =>
        // Gopher-style rule filter: instead of one blended score (t03),
        // emit each rule's raw signal plus the pass verdict, so a
        // curation run can tune thresholds without recomputing
        // signals. All per-row ratios stay raw IEEE doubles (identical
        // ops in both engines — see QueryDef float discipline); the
        // verdict is an INT for hash stability. One codegen map pass,
        // zero shuffle.
        val toks = TextFunctions.tokens(col("text"))
        val nw = size(toks)
        val mwl = TextFunctions.meanTokenLen(col("text"))
        val stopHits = TextFunctions.stopwordCount(col("text"))
        val alphaRatio = when(nw === 0, 0.0).otherwise(
          size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
            nw.cast("double"))
        val symRatio = when(nw === 0, 0.0).otherwise(
          size(regexp_extract_all(col("text"), lit("#|\\.\\.\\."), lit(0)))
            .cast("double") / nw.cast("double"))
        docs(s, dir).select(
          col("doc_id"),
          nw.as("n_words"),
          mwl.as("mean_wl"),
          stopHits.as("stop_hits"),
          alphaRatio.as("alpha_ratio"),
          symRatio.as("sym_ratio"),
          (nw.between(30, 10000) && mwl.between(3.0, 10.0) &&
            (stopHits >= 2) && (alphaRatio >= 0.8) && (symRatio <= 0.1))
            .cast("int").as("passes"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x != '') AS toks,
            list_filter(string_split(lower(text), ' '), x -> x != '') AS ltoks,
            CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE) AS nsym
          FROM documents),
        g AS (
          SELECT doc_id,
            CAST(len(toks) AS INTEGER) AS n_words,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                   AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS mean_wl,
            CAST(len(list_filter(ltoks, x -> list_contains(
              ['the','a','of','and','to','in','is','it','that','for'], x)))
              AS INTEGER) AS stop_hits,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks,
                     x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) /
                   CAST(len(toks) AS DOUBLE) END AS alpha_ratio,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE nsym / CAST(len(toks) AS DOUBLE) END AS sym_ratio
          FROM f)
        SELECT doc_id, n_words, mean_wl, stop_hits, alpha_ratio, sym_ratio,
          CASE WHEN n_words BETWEEN 30 AND 10000
                AND mean_wl BETWEEN 3.0 AND 10.0
                AND stop_hits >= 2 AND alpha_ratio >= 0.8
                AND sym_ratio <= 0.1
               THEN 1 ELSE 0 END AS passes
        FROM g"""),
      doc = "Gopher-style per-rule quality signals + pass verdict " +
        "(word count, mean word length, stopword hits, alpha ratio, " +
        "symbol ratio)."),

    // ------------------------------------------------------------------
    "c10_repetition" -> QueryDef(
      fn = { (s, dir) =>
        // Repetition detection: fraction of duplicate word bigrams per
        // doc — the cheap boilerplate/spam signal (Gopher's repeated
        // n-gram family). Uses the native word_shingles expression
        // (tokenize once, slice spans); ratio stays raw double. One
        // codegen map pass, zero shuffle.
        val ng = TextFunctions.shingles(col("text"), 2)
        val total = size(ng)
        val uniq = size(array_distinct(ng))
        docs(s, dir).select(
          col("doc_id"),
          total.as("n_grams"),
          uniq.as("n_uniq"),
          when(total === 0, 0.0).otherwise(
            (total - uniq).cast("double") / total.cast("double"))
            .as("rep_ratio"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x != '') AS ts
          FROM documents),
        bi AS (
          SELECT doc_id, CASE WHEN len(ts) >= 2 THEN
            list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])
            ELSE CAST([] AS VARCHAR[]) END AS ng
          FROM toks)
        SELECT doc_id,
          CAST(len(ng) AS INTEGER) AS n_grams,
          CAST(len(list_distinct(ng)) AS INTEGER) AS n_uniq,
          CASE WHEN len(ng) = 0 THEN 0.0
               ELSE CAST(len(ng) - len(list_distinct(ng)) AS DOUBLE) /
                 CAST(len(ng) AS DOUBLE) END AS rep_ratio
        FROM bi"""),
      doc = "Repeated-bigram fraction per doc (boilerplate/spam " +
        "signal; native shingles, zero shuffle)."),

    // ------------------------------------------------------------------
    "c11_upsert" -> QueryDef(
      fn = { (s, dir) =>
        // Corpus refresh: a revised slice (deterministic: doc_id % 10
        // == 0, text re-tagged) overrides the base snapshot by key —
        // the merge-on-read shape. At 100 TB the base side is NOT
        // rewritten: left_anti + union is one shuffle on the key (and
        // with the update set small, the anti-join broadcasts — the
        // base never shuffles at all). Copy-on-write compaction is
        // then a background zorderWrite/writePartitioned pass, not
        // part of the query path.
        val base = docs(s, dir).select(col("doc_id"), col("text"))
        val updates = base.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" [rev2]")).as("text"))
        base.join(updates, Seq("doc_id"), "left_anti")
          .withColumn("rev", lit(1))
          .unionByName(updates.withColumn("rev", lit(2)))
      },
      oracle = Some("""
        WITH upd AS (
          SELECT doc_id, text || ' [rev2]' AS text
          FROM documents WHERE doc_id % 10 = 0)
        SELECT b.doc_id, b.text, 1 AS rev
        FROM documents b ANTI JOIN upd u ON b.doc_id = u.doc_id
        UNION ALL
        SELECT doc_id, text, 2 AS rev FROM upd"""),
      doc = "Keyed upsert / corpus refresh (merge-on-read: anti-join " +
        "+ union, base side never rewritten)."),

    // ------------------------------------------------------------------
    "c12_snapshot_diff" -> QueryDef(
      fn = { (s, dir) =>
        // Snapshot diff / CDC between corpus versions: old = the base
        // table, new = base with a revised slice (doc_id % 10 == 0)
        // and a deleted slice (doc_id % 17 == 3). Full outer join on
        // the key, change class from fingerprint comparison. One
        // shuffle on the key at any scale; fingerprints (not full
        // text) are what cross the exchange... except the text IS the
        // fingerprint input, so compare md5s computed before the join.
        val old = docs(s, dir).select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp_old"))
        val newSnap = docs(s, dir)
          .filter(col("doc_id") % 17 =!= 3)
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 0,
              TextFunctions.fingerprint(concat(col("text"), lit(" [rev2]"))))
              .otherwise(TextFunctions.fingerprint(col("text"))).as("fp_new"))
        old.join(newSnap, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("fp_old").isNull, "added")
              .when(col("fp_new").isNull, "removed")
              .when(col("fp_old") =!= col("fp_new"), "changed")
              .otherwise("same").as("change"))
          .filter(col("change") =!= "same")
      },
      oracle = Some("""
        WITH old AS (
          SELECT doc_id,
            md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_old
          FROM documents),
        new_snap AS (
          SELECT doc_id,
            CASE WHEN doc_id % 10 = 0 THEN
              md5(trim(regexp_replace(lower(text || ' [rev2]'), '\s+', ' ', 'g')))
            ELSE md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) END
              AS fp_new
          FROM documents WHERE doc_id % 17 != 3),
        j AS (
          SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
            CASE WHEN o.doc_id IS NULL THEN 'added'
                 WHEN n.doc_id IS NULL THEN 'removed'
                 WHEN o.fp_old != n.fp_new THEN 'changed'
                 ELSE 'same' END AS change
          FROM old o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id)
        SELECT doc_id, change FROM j WHERE change != 'same'"""),
      doc = "Snapshot diff / CDC between corpus versions (full outer " +
        "join on key, fingerprint comparison)."),

    // ------------------------------------------------------------------
    "c13_weighted_sample" -> QueryDef(
      fn = { (s, dir) =>
        // Quality-weighted curation sampling: keep probability =
        // 0.5 x quality (soft preference for good documents instead
        // of a hard gate). Same determinism guarantees as c02: the
        // decision is a pure function of (doc_id, quality), stable
        // under partitioning/appends, reproducible in any engine.
        val scored = docs(s, dir).select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        Sampling.weightedHashSample(scored, "doc_id", col("quality"),
          rate = 0.5)
      },
      oracle = Some(s"""
        WITH $qualityCte
        SELECT doc_id, quality
        FROM scored
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) <
          CASE WHEN CAST(floor(least(greatest(quality * 0.5, 0.0), 1.0)
                     * 16777216) AS BIGINT) >= 16777216 THEN 'g'
               ELSE lpad(lower(hex(CAST(floor(least(greatest(
                      quality * 0.5, 0.0), 1.0) * 16777216) AS BIGINT))),
                      6, '0') END"""),
      doc = "Quality-weighted deterministic sampling (keep prob = " +
        "rate x quality; reproducible, append-stable)."),

    // ------------------------------------------------------------------
    "c14_sequence_pack" -> QueryDef(
      fn = { (s, dir) =>
        // GPT-style pack-and-chunk assignment: docs are concatenated
        // in deterministic order within their shard and cut every
        // `seqLen` tokens; each doc's pack id and offset fall out of
        // the running token sum. Scale shape: one window per shard —
        // the md5-digit shard bounds partition size, so the sort is
        // shard-local, never global; all integer math (hash-stable).
        val seqLen = 2048L
        val t = docs(s, dir).select(
          col("doc_id"),
          expr("cast(instr('0123456789abcdef', " +
            "substring(md5(cast(doc_id as string)), 1, 1)) - 1 as int)")
            .as("shard"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("doc_id"))
        t.withColumn("cum", sum(col("ntok")).over(w))
          .select(col("doc_id"), col("shard"), col("ntok"),
            expr(s"(cum - ntok) div $seqLen").as("pack_id"),
            ((col("cum") - col("ntok")) % seqLen).as("pack_off"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id,
            CAST(strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
            AS INTEGER) AS shard,
            CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
              AS BIGINT) AS ntok
          FROM documents),
        c AS (
          SELECT doc_id, shard, ntok,
            sum(ntok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
          FROM t)
        SELECT doc_id, shard, ntok,
          CAST((cum - ntok) // 2048 AS BIGINT) AS pack_id,
          CAST((cum - ntok) % 2048 AS BIGINT) AS pack_off
        FROM c"""),
      doc = "Training-sequence packing: concat-then-chunk pack/offset " +
        "assignment per shard (shard-local window, integer math)."),

    // ------------------------------------------------------------------
    "c15_chunk_windows" -> QueryDef(
      fn = { (s, dir) =>
        // Overlapping token windows per document (the RAG/embedding
        // chunking pass): win=32 tokens, stride=24. One generate pass,
        // zero shuffle; chunk_idx = start/stride is deterministic.
        // The transform lambda re-evaluates the tokenize subtree per
        // chunk (HOF lambdas bind trees) — bounded here by chunks ~=
        // ntok/stride per doc, unlike the O(n^2) shingle case that
        // forced the native word_shingles expression.
        val win = 32
        val stride = 24
        val toks = TextFunctions.tokens(col("text"))
        val n = size(toks)
        val starts = filter(
          sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)),
          st => st < n)
        docs(s, dir)
          .select(col("doc_id"), posexplode(
            transform(starts, st => struct(
              least(lit(win), n - st).as("n_chunk_toks"),
              concat_ws(" ", slice(toks, st + 1, lit(win))).as("chunk")))))
          .select(col("doc_id"), col("pos").as("chunk_idx"),
            col("col.n_chunk_toks").as("n_chunk_toks"),
            col("col.chunk").as("chunk"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x != '') AS ts
          FROM documents),
        st AS (
          SELECT doc_id, ts, len(ts) AS n, unnest(range(0, len(ts), 24)) AS s
          FROM t WHERE len(ts) > 0)
        SELECT doc_id,
          CAST(s // 24 AS INTEGER) AS chunk_idx,
          CAST(least(32, n - s) AS INTEGER) AS n_chunk_toks,
          array_to_string(ts[s + 1 : s + 32], ' ') AS chunk
        FROM st"""),
      doc = "Overlapping token windows per doc (RAG/embedding " +
        "chunking; win=32, stride=24; zero shuffle)."),

    // ------------------------------------------------------------------
    "c16_banlist_scrub" -> QueryDef(
      fn = { (s, dir) =>
        // Banlist scrub via Bloom-prefiltered semi-join: the
        // "takedown list" is the fingerprint of every doc_id % 37
        // doc; every corpus doc carrying a listed fingerprint (the
        // listed doc AND any exact duplicate of it) is returned.
        // Layout.bloomSemiJoin probes a serialized Bloom sketch as a
        // codegen'd scan filter, so the corpus side shuffles only
        // Bloom survivors into the exact verify join — the 100 TB
        // scrub shape when the banlist is too big to broadcast. The
        // exact join removes Bloom false positives, so the result is
        // oracle-exact despite the probabilistic prefilter.
        val d = docs(s, dir).withColumn("fp",
          TextFunctions.fingerprint(col("text")))
        val ban = d.where(col("doc_id") % 37 === 0).select(col("fp"))
        graft.operators.Layout.bloomSemiJoin(d, "fp", ban, "fp")
          .select(col("doc_id"), col("source"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT doc_id, source,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   AS fp
          FROM documents)
        SELECT doc_id, source FROM f
        WHERE fp IN (SELECT fp FROM f WHERE doc_id % 37 = 0)"""),
      doc = "Banlist scrub: Bloom-sketch prefilter (zero corpus " +
        "shuffle) + exact semi-join verify on survivors."),

    // ------------------------------------------------------------------
    "c17_compaction" -> QueryDef(
      fn = { (s, dir) =>
        // Small-file compaction end-to-end under the driver's eye:
        // deliberately fragment a copy of `documents` into exactly 16
        // files (round-robin repartition spreads rows evenly, so all
        // 16 are non-empty), then Layout.compact with a 1 TB target —
        // ceil(bytes / 1 TB) = 1 output file regardless of
        // compression, so the measured counts are deterministic and
        // the oracle can pin them. n_rows re-reads the COMPACTED
        // directory: a compaction that drops or duplicates rows
        // breaks the hash.
        import s.implicits._
        val frag = java.nio.file.Files
          .createTempDirectory("graft-c17-frag").toString
        val out = java.nio.file.Files
          .createTempDirectory("graft-c17-out").toString
        docs(s, dir).repartition(16)
          .write.mode("overwrite").parquet(frag)
        val (before, after) = graft.operators.Layout.compact(
          s, frag, out, targetBytes = 1L << 40, sortCols = Seq("doc_id"))
        val nRows = s.read.parquet(out).count()
        Seq((before, after, nRows))
          .toDF("files_before", "files_after", "n_rows")
      },
      oracle = Some("""
        SELECT CAST(16 AS BIGINT) AS files_before,
               CAST(1 AS BIGINT) AS files_after,
               count(*) AS n_rows
        FROM documents"""),
      doc = "Small-file compaction: 16 fragments -> 1 file " +
        "(measured counts + row-preservation, oracle-pinned)."),

    // ------------------------------------------------------------------
    "c18_domain_mix" -> QueryDef(
      fn = { (s, dir) =>
        // Training-mix rebalance: cap any language at 25% of the
        // corpus (the fixture is en-heavy at ~44%, so the cap binds
        // on en and leaves the rest whole). Per-domain rates are
        // computed from the corpus itself, broadcast back, and
        // applied as a deterministic hash threshold — one corpus
        // scan, zero corpus shuffle, append-stable membership.
        Sampling.capDomainShare(
          docs(s, dir).select(col("doc_id"), col("lang")),
          "doc_id", "lang", cap = 0.25)
          .select(col("doc_id"), col("lang"))
      },
      oracle = Some("""
        WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        r AS (SELECT lang,
                least(1.0, 0.25 * (SELECT sum(n) FROM c) / n) AS rate
              FROM c)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN r USING (lang)
        WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) <
          CASE WHEN CAST(floor(least(greatest(rate * 1.0, 0.0), 1.0)
                     * 16777216) AS BIGINT) >= 16777216 THEN 'g'
               ELSE lpad(lower(hex(CAST(floor(least(greatest(
                      rate * 1.0, 0.0), 1.0) * 16777216) AS BIGINT))),
                      6, '0') END"""),
      doc = "Domain-mix rebalance: cap over-represented domains at a " +
        "target corpus share via per-domain deterministic hash rates."),

    // ------------------------------------------------------------------
    "c19_fuzzy_decontam" -> QueryDef(
      fn = { (s, dir) =>
        // Fuzzy benchmark decontamination: c05 removes docs CONTAINING
        // exact eval n-grams; this flags docs NEAR-DUPLICATE to an
        // eval doc (excerpted/paraphrased leakage survives exact
        // containment checks). The eval set is derived as 80%-prefix
        // excerpts of a corpus slice — the realistic leak: a benchmark
        // quoting most of a training document (trigram Jaccard ~0.8
        // to its source). The shape is incremental-dedup reversed:
        // the corpus is indexed once and STREAMS (never shuffles,
        // never sorts — the d10 plan assertion), the small eval set
        // broadcasts into bucket generation and verification;
        // candidates are exact-Jaccard verified. LSH candidate
        // generation -> rows-only; recall pinned by
        // CurationRulesSpec's planted leak.
        import graft.operators.Dedup
        val d = Engine.widenIfNarrow(docs(s, dir))
        val toks = TextFunctions.tokens(col("text"))
        val evalSet = d.filter(col("doc_id") % 97 === 0)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            concat_ws(" ", slice(toks, lit(1),
              greatest(lit(1), (size(toks) * 0.8).cast("int")))).as("text"))
        // HASH-CHECKED (round 9): md5-portable hash family — the
        // oracle rebuilds the eval excerpts, replays both indexes,
        // the band-key candidate join, exact-Jaccard verification
        // and the fingerprint leg. Within-eval pairs need no replay:
        // both ids sit above the 10M offset and die in the id_a
        // filter. The xxhash64 fast path keeps its planted-leak
        // recall spec in CurationRulesSpec.
        val idx = Dedup.dedupIndex(d, "text", "doc_id",
          numHashes = 24, hasher = Dedup.MinHashFamily.Md5)
          .localCheckpoint() // consumed by buckets + verify + fp legs
        Dedup.incrementalNearDups(idx, evalSet, "text", "doc_id",
          threshold = 0.5, numHashes = 24, bands = 8,
          hasher = Dedup.MinHashFamily.Md5)
          .filter(col("id_a") < 10000000L) // corpus-vs-eval hits only
          .select(col("id_a").as("doc_id"),
            (col("id_b") - lit(10000000L)).as("eval_id"),
            round(col("jaccard"), 6).as("jaccard"))
      },
      oracle = Some(s"""
        WITH corpus AS (SELECT doc_id AS did, text FROM documents),
        evals AS (
          SELECT did + 10000000 AS did,
                 array_to_string(list_slice(ts, 1,
                   greatest(1, CAST(floor(len(ts) * 0.8) AS BIGINT))), ' ')
                   AS text
          FROM (SELECT doc_id AS did, ${OracleSql.tsExpr} AS ts
                FROM documents WHERE doc_id % 97 = 0)),
        ${OracleSql.incrementalCrossCtes("x", "corpus", "evals",
          numHashes = 24, bands = 8, threshold = 0.5)}
        SELECT id_a AS doc_id, id_b - 10000000 AS eval_id,
               round(max(jaccard), 6) AS jaccard
        FROM x_cross
        WHERE id_a < 10000000
        GROUP BY 1, 2"""),
      doc = "Fuzzy decontamination: corpus docs near-duplicate to a " +
        "held-out eval set (broadcast eval, corpus never shuffles; " +
        "md5-portable hash family, full-pipeline oracle replay)."),

    // ------------------------------------------------------------------
    "c20_token_budget" -> QueryDef(
      fn = { (s, dir) =>
        // Token-budget curation: fill half the corpus's token budget
        // with the highest-quality docs (greedy by quality bucket,
        // then doc_id within the boundary bucket) — the "select the
        // best N tokens for this training run" primitive. Scale
        // shape: NO global sort — docs are coarse-bucketed by
        // floor(quality*100) (~100 buckets), the running bucket
        // offsets are a window over that driver-tiny bucket table,
        // and the only per-doc window partitions BY BUCKET (~1% of
        // the corpus each), with offsets and the total joining back
        // as broadcasts. A naive quality-ordered cumsum would move
        // the whole corpus to one partition.
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          floor(TextFunctions.qualityScore(col("text")) * 100)
            .cast("long").as("bucket"))
        val buckets = d.groupBy(col("bucket"))
          .agg(sum(col("n_tokens")).as("btoks"))
        val wOff = Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = buckets
          .withColumn("start", coalesce(sum(col("btoks")).over(wOff), lit(0L)))
          .select(col("bucket"), col("start"))
        val tot = d.agg(sum(col("n_tokens")).as("total"))
        val wCum = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        d.join(broadcast(offs), Seq("bucket"))
          .crossJoin(broadcast(tot))
          .withColumn("cum", sum(col("n_tokens")).over(wCum))
          .filter(col("start") + col("cum") <= expr("total div 2"))
          .select(col("doc_id"), col("bucket"), col("n_tokens"))
      },
      oracle = Some(s"""
        WITH $qualityCte,
        t AS (
          SELECT s.doc_id,
                 CAST(len(list_filter(string_split(s.text, ' '),
                   x -> x != '')) AS BIGINT) AS n_tokens,
                 CAST(floor(s.quality * 100) AS BIGINT) AS bucket
          FROM scored s),
        b AS (SELECT bucket, sum(n_tokens) AS btoks FROM t GROUP BY 1),
        o AS (SELECT bucket,
                     coalesce(sum(btoks) OVER (ORDER BY bucket DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS start
              FROM b),
        tot AS (SELECT sum(n_tokens) AS total FROM t),
        sel AS (SELECT t.doc_id, t.bucket, t.n_tokens, o.start,
                       sum(t.n_tokens) OVER (PARTITION BY t.bucket
                         ORDER BY t.doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum
                FROM t JOIN o USING (bucket))
        SELECT doc_id, bucket, n_tokens
        FROM sel, tot WHERE start + cum <= total // 2"""),
      doc = "Greedy quality-ranked token-budget fill (half the corpus " +
        "tokens) without a global sort: bucket offsets broadcast, " +
        "per-doc window partitions by bucket."),

    // ------------------------------------------------------------------
    "c21_leakfree_split" -> QueryDef(
      fn = { (s, dir) =>
        // Leakage-free train/eval split: a doc-level hash split (c02)
        // puts duplicate CONTENT on both sides — the eval set then
        // scores memorization, not generalization. Splitting on the
        // dup-cluster REPRESENTATIVE's hash moves whole clusters to
        // one side. This registers the exact-dup (fingerprint-group)
        // core, which is fully oracle-checkable; the near-dup variant
        // is the same operator over Dedup.clusterReps output (d07)
        // instead of the fingerprint rep. Shape: one window over the
        // fingerprint groups (the d01 shuffle), then the split is a
        // pure map on md5(rep) — deterministic under repartitioning
        // and appends, like every sampling primitive here.
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir).select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        val withRep = d.withColumn("rep",
          min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        Sampling.leakFreeSplit(
          withRep.select(col("doc_id"), col("rep")), "rep", 0.9)
      },
      oracle = Some(s"""
        WITH g AS (
          SELECT doc_id,
                 min(doc_id) OVER (PARTITION BY
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
                   AS rep
          FROM documents)
        SELECT doc_id, rep,
               CASE WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 6)
                      < '${Sampling.thresholdHex(0.9)}'
                    THEN 'train' ELSE 'eval' END AS split
        FROM g"""),
      doc = "Leakage-free 90/10 split: hash the dup-cluster " +
        "representative, not the doc, so duplicate content never " +
        "straddles train/eval."),

    // ------------------------------------------------------------------
    "c22_overlap_report" -> QueryDef(
      fn = { (s, dir) =>
        // Contamination MEASUREMENT to c05/c19's removal: per eval
        // doc (deterministic doc_id % 31 slice), how many of its
        // 8-token spans also occur anywhere in the train split —
        // the "what fraction of eval is in train" report run
        // before deciding what to scrub. Exact span-string
        // membership (no hash collisions in the measurement), d12's
        // tokenization. Scale shape: the train side streams through
        // ONE left-semi shuffle keyed on span; no distinct() on the
        // train spans (semi join absorbs duplicates); eval side is
        // 1/31 of the corpus. Counts are per-doc, so the final agg
        // is narrow.
        val d = docs(s, dir)
        def spans(df: org.apache.spark.sql.DataFrame) =
          df.select(col("doc_id"),
            explode(TextFunctions.shingles(col("text"), 8)).as("span"))
        val ev = spans(d.filter(col("doc_id") % 31 === 0))
        val tr = spans(d.filter(col("doc_id") % 31 =!= 0))
          .select(col("span"))
        val leaked = ev.join(tr, Seq("span"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("span")).as("n_leaked"))
        ev.groupBy(col("doc_id"))
          .agg(countDistinct(col("span")).as("n_spans"))
          .join(leaked, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_leaked"))
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x != '') AS ts
          FROM documents),
        sp AS (
          SELECT doc_id, unnest(CASE WHEN len(ts) >= 8 THEN
            list_transform(range(1, len(ts) - 6),
              i -> array_to_string(ts[i:i+7], ' '))
            ELSE CAST([] AS VARCHAR[]) END) AS span
          FROM tok),
        ev AS (SELECT * FROM sp WHERE doc_id % 31 = 0),
        tr AS (SELECT DISTINCT span FROM sp WHERE doc_id % 31 != 0)
        SELECT ev.doc_id,
               count(DISTINCT ev.span) AS n_spans,
               count(DISTINCT CASE WHEN tr.span IS NOT NULL
                                   THEN ev.span END) AS n_leaked
        FROM ev LEFT JOIN tr USING (span)
        GROUP BY 1"""),
      doc = "Cross-corpus contamination report: per-eval-doc 8-gram " +
        "overlap counts vs the train split (exact span membership)."),

    // ------------------------------------------------------------------
    "c23_integrity_report" -> QueryDef(
      fn = { (s, dir) =>
        // Data-quality gate for the warehouse side: referential
        // integrity (orphan orders / lineitems), key uniqueness, and
        // null checks, as ONE narrow report row. Each check is the
        // minimal distributed shape: anti joins for orphans (shuffle
        // on the key, no data movement beyond ids), a groupBy-count
        // for dup keys, partial-agg null counts. At 100 TB this is
        // the pre-publish contract check run on every snapshot; every
        // count is exact and the row is hash-checked.
        val t = T(s, dir)
        val orphanOrders = t.orders.join(t.customer,
          col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(col("n").as("n_orphan_orders"))
        val orphanLines = t.lineitem.join(t.orders,
          col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(col("n").as("n_orphan_lineitems"))
        val dupKeys = t.orders.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(count(lit(1)).as("n")).select(col("n").as("n_dup_orderkeys"))
        val nulls = t.customer.agg(
          sum(when(col("c_name").isNull, 1L).otherwise(0L))
            .as("n_null_custnames"))
        val totals = t.orders.agg(count(lit(1)).as("n_orders"))
        totals.crossJoin(orphanOrders).crossJoin(orphanLines)
          .crossJoin(dupKeys).crossJoin(nulls)
      },
      oracle = Some("""
        SELECT
          (SELECT count(*) FROM orders) AS n_orders,
          (SELECT count(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey
           WHERE c.c_custkey IS NULL) AS n_orphan_orders,
          (SELECT count(*) FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey IS NULL) AS n_orphan_lineitems,
          (SELECT count(*) FROM (
             SELECT o_orderkey FROM orders GROUP BY 1
             HAVING count(*) > 1)) AS n_dup_orderkeys,
          (SELECT CAST(coalesce(sum(CASE WHEN c_name IS NULL THEN 1
                                         ELSE 0 END), 0) AS BIGINT)
             FROM customer) AS n_null_custnames"""),
      doc = "Snapshot integrity report: orphan keys, duplicate " +
        "primary keys, null checks — one exact hash-checked row."),

    // ------------------------------------------------------------------
    "c24_cdc_apply" -> QueryDef(
      fn = { (s, dir) =>
        // CDC-apply through the TableSync snapshot+pointer sink: the
        // orders feed replays as two update batches (even / odd
        // orderkeys) into a keyed table where the highest version per
        // customer wins; the read resolves the _CURRENT pointer to
        // ONE consistent snapshot. The same applyBatch drives the
        // streaming upsertSink (TableSyncSpec pins restart-replay
        // idempotence); this registration oracle-checks the merge
        // semantics end-to-end: the result must equal latest-order-
        // per-customer computed relationally.
        val path = java.nio.file.Files
          .createTempDirectory("graft-cdc-").toString
        val ups = T(s, dir).orders.select(col("o_custkey").as("k"),
          col("o_orderkey").as("ver"), col("o_totalprice").as("price"))
        graft.streaming.TableSync.applyBatch(
          ups.filter(col("ver") % 2 === 0), path, "k", "ver", 0L)
        graft.streaming.TableSync.applyBatch(
          ups.filter(col("ver") % 2 =!= 0), path, "k", "ver", 1L)
        graft.streaming.TableSync.readCurrent(s, path)
      },
      oracle = Some("""
        SELECT o_custkey AS k, o_orderkey AS ver, o_totalprice AS price
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1"""),
      doc = "CDC upsert-apply via the snapshot+pointer table sink " +
        "(highest version per key wins; consistent snapshot read)."),

    // ------------------------------------------------------------------
    "c36_evolving_cdc" -> QueryDef(
      fn = { (s, dir) =>
        // c24's merge semantics THROUGH online bucket evolution and a
        // re-base: the orders feed replays as four version-striped
        // batches into a table bootstrapped at 8 deliberately
        // undersized buckets with the split trigger armed
        // (maxBucketBytes = 1 forces the maximum allowed splits every
        // batch: (8,0) -> (8,4) -> (16,0) -> (16,4) across the
        // sequence), then a one-shot rebucket(64) re-bases the whole
        // table. The driver-gated claim: the consistent snapshot a
        // reader resolves is IDENTICAL to the relational
        // latest-per-key replay no matter how the bucket scheme
        // shifted beneath the writes — evolution is pure layout,
        // invisible to merge semantics. (The scheme arithmetic itself
        // is spec-pinned in TableSyncSpec/DedupSyncSpec; a DuckDB
        // oracle can't see physical bytes, so the correctness gate
        // checks the CONTENT across the evolution.)
        val path = c36Dir(dir)
        val ups = T(s, dir).orders.select(col("o_custkey").as("k"),
          col("o_orderkey").as("ver"), col("o_totalprice").as("price"))
        (0L to 3L).foreach { b =>
          graft.streaming.TableSync.applyBatch(
            ups.filter(pmod(col("ver"), lit(4)) === b), path, "k", "ver",
            b, numBuckets = 8, maxBucketBytes = 1L, splitsPerBatch = 4)
        }
        graft.streaming.TableSync.rebucket(s, path, "k", 64)
        // ...and back DOWN: two maintenance batches re-deliver stripe
        // 0 (idempotent upserts) with a huge-but-finite threshold, so
        // the 64-bucket re-base CONTRACTS by bounded reverse merges
        // ((64,0) -> (32,16) -> (32,0)) beneath live writes — the
        // gate proves shrink evolution is as invisible to merge
        // semantics as growth.
        (4L to 5L).foreach { b =>
          graft.streaming.TableSync.applyBatch(
            ups.filter(pmod(col("ver"), lit(4)) === 0), path, "k", "ver",
            b, numBuckets = 8, maxBucketBytes = Long.MaxValue / 4,
            splitsPerBatch = 16)
        }
        graft.streaming.TableSync.readCurrent(s, path)
      },
      oracle = Some("""
        SELECT o_custkey AS k, o_orderkey AS ver, o_totalprice AS price
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1"""),
      doc = "CDC upsert-apply across ONLINE bucket evolution in BOTH " +
        "directions + a one-shot rebucket: splits advance beneath " +
        "four update batches, a 64-bucket re-base contracts by " +
        "bounded reverse merges beneath two more, and the final " +
        "snapshot still equals the relational latest-per-key replay " +
        "(hash-checked)."),

    // ------------------------------------------------------------------
    "c37_evolving_agg" -> QueryDef(
      fn = { (s, dir) =>
        // The NON-idempotent maintained aggregate (AggSync count/sum
        // fold) across bucket evolution in BOTH directions, under the
        // DRIVER gate: four version-striped order batches fold into a
        // TableSync-backed rollup bootstrapped at 4 buckets with the
        // split trigger forcing maximum splits every batch
        // ((4,0)->(8,0)->(8,4)->(16,0)), then two singleton batches
        // with a huge-but-finite threshold contract the scheme by
        // bounded reverse merges. c36 proved evolution is invisible
        // to IDEMPOTENT merge semantics; this proves it for the fold
        // where a lost or doubled state row is a wrong sum — the
        // final view must equal a from-scratch aggregate exactly
        // (decimal accumulation; double only at the output).
        val path = cachedTmpDir("evo-agg", dir)
        val ord = T(s, dir).orders
          .select(col("o_orderstatus"), col("o_totalprice"),
            col("o_orderkey"))
        (0L to 3L).foreach { b =>
          graft.streaming.AggSync.applyDelta(
            ord.filter(pmod(col("o_orderkey"), lit(4)) === b),
            path, "o_orderstatus", "o_totalprice", b,
            numBuckets = 4, maxBucketBytes = 1L, splitsPerBatch = 4)
        }
        (4L to 5L).foreach { b =>
          graft.streaming.AggSync.applyDelta(
            s.range(1).select(lit(s"Z$b").as("o_orderstatus"),
              lit(b * 10.0).as("o_totalprice")),
            path, "o_orderstatus", "o_totalprice", b,
            numBuckets = 4, maxBucketBytes = Long.MaxValue / 4,
            splitsPerBatch = 4)
        }
        graft.streaming.AggSync.readView(s, path)
          .select(col("o_orderstatus"), col("n"),
            col("tot").cast("double").as("total"))
      },
      oracle = Some("""
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS total
        FROM orders GROUP BY o_orderstatus
        UNION ALL SELECT 'Z4', CAST(1 AS BIGINT), 40.0
        UNION ALL SELECT 'Z5', CAST(1 AS BIGINT), 50.0"""),
      doc = "Maintained count/sum rollup (the NON-idempotent fold) " +
        "across online bucket splits AND reverse merges: six batches " +
        "while the scheme widens (4,0)->(16,0) then contracts, final " +
        "view equals a from-scratch aggregate (hash-checked)."),

    // ------------------------------------------------------------------
    "c25_corpus_shuffle" -> QueryDef(
      fn = { (s, dir) =>
        // Deterministic seeded training-order shuffle WITHOUT a global
        // sort: key = md5(seed || doc_id) is a pure content function
        // (identical on any engine/partitioning), the first hex char
        // IS the shard (16-way here; widen the prefix for 256/4096
        // shards at corpus scale), and training position is the rank
        // of the key within its shard only. The plan is one shuffle
        // on shard + a per-shard sort — each shard sorts
        // independently, so at 100 TB this is 4096 bounded sorts, not
        // one global total order. Epoch reshuffle = change the seed.
        docs(s, dir)
          .withColumn("key",
            md5(concat(lit("shuf42:"), col("doc_id").cast("string"))))
          .withColumn("shard", substring(col("key"), 1, 1))
          .withColumn("pos", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("shard")).orderBy(col("key"))))
          .select(col("doc_id"), col("shard"),
            col("pos").cast("int").as("pos"))
      },
      oracle = Some("""
        SELECT doc_id, substring(key, 1, 1) AS shard,
               CAST(row_number() OVER (
                 PARTITION BY substring(key, 1, 1) ORDER BY key)
                 AS INTEGER) AS pos
        FROM (SELECT doc_id,
                md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS key
              FROM documents)"""),
      doc = "Seeded deterministic corpus shuffle into sharded " +
        "training order (per-shard rank, no global sort)."),

    // ------------------------------------------------------------------
    "c26_epoch_mix" -> QueryDef(
      fn = { (s, dir) =>
        // Mixture-with-repetition (the Llama/Pile data recipe): hit
        // target per-language token weights against a global budget
        // of 1.2x the corpus by REPEATING docs — repeat rate r_d =
        // w_d * budget / domain_tokens, realized per doc as
        // floor(r_d) copies plus one more iff the doc's md5-derived
        // uniform u < frac(r_d) (deterministic stochastic rounding:
        // the expected token count hits the target exactly, and
        // membership is a pure content function — no RNG state, no
        // partition sensitivity). Output is the expanded training
        // list (doc_id, copy). Scale: two stats aggregates broadcast
        // as scalars; the expansion is a per-row sequence explode —
        // no shuffle beyond the tiny per-lang aggregate.
        val d = docs(s, dir)
        val w = typedLit(Map(
          "en" -> 0.5, "zh" -> 0.2, "es" -> 0.1, "de" -> 0.1,
          "fr" -> 0.1))
        val perLang = d.groupBy(col("lang"))
          .agg(sum(col("n_chars")).as("t_d"))
        val total = d.agg(sum(col("n_chars")).as("t_all"))
        val rated = d
          .join(broadcast(perLang), Seq("lang"))
          .crossJoin(broadcast(total))
          .withColumn("r",
            (w(col("lang")) * (col("t_all").cast("double") * 1.2)) /
              col("t_d").cast("double"))
          .withColumn("u",
            graft.functions.PortableHash.uniform60(concat(lit("mix7:"),
              col("doc_id").cast("string")))
              .cast("double") / lit(1152921504606846976.0))
          .withColumn("n_copies",
            floor(col("r")).cast("long") +
              when(col("u") < col("r") - floor(col("r")), 1L)
                .otherwise(0L))
        rated.filter(col("n_copies") >= 1)
          .select(col("doc_id"),
            explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      },
      oracle = Some("""
        WITH per_lang AS (
          SELECT lang, sum(n_chars) AS t_d FROM documents GROUP BY 1),
        total AS (SELECT sum(n_chars) AS t_all FROM documents),
        rated AS (
          SELECT d.doc_id,
                 (CASE d.lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2
                              WHEN 'es' THEN 0.1 WHEN 'de' THEN 0.1
                              WHEN 'fr' THEN 0.1 END
                  * (CAST(t.t_all AS DOUBLE) * 1.2))
                   / CAST(p.t_d AS DOUBLE) AS r,
                 CAST(CAST(('0x' || substr(md5('mix7:' ||
                     CAST(d.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
                   AS DOUBLE) / 1152921504606846976.0 AS u
          FROM documents d
          JOIN per_lang p ON p.lang = d.lang
          CROSS JOIN total t),
        counted AS (
          SELECT doc_id,
                 CAST(floor(r) AS BIGINT) +
                   (CASE WHEN u < r - floor(r) THEN 1 ELSE 0 END)
                   AS n_copies
          FROM rated)
        SELECT doc_id, unnest(range(1, n_copies + 1)) AS copy
        FROM counted WHERE n_copies >= 1"""),
      doc = "Mixture-with-repetition epoch expansion: per-language " +
        "repeat rates vs a 1.2x token budget, deterministic " +
        "stochastic rounding per doc."),

    // ------------------------------------------------------------------
    "c27_dsir_select" -> QueryDef(
      fn = { (s, dir) =>
        // DSIR-style importance resampling toward a target domain:
        // score every doc by how much more its char bigrams resemble
        // the TARGET model (bigram counts over the 'en' slice) than
        // the CORPUS model, w = (tf/tt) / (cf/ct) as a ratio of
        // familiarity rates, then keep iff the doc's md5-uniform
        // u < w/2 — deterministic importance sampling whose
        // acceptance rate tracks target-likeness. Integer count sums
        // make w engine-exact (one pinned double expression at the
        // end); the uniform is the same md5->60-bit->double
        // construction as c26. Scale: both models are vocabulary-
        // bounded broadcasts; scoring is one explode + broadcast
        // join + per-doc sum — the DSIR shape (hashed n-gram
        // features, linear scan, no pairwise work).
        val d = docs(s, dir)
        val nt = d.select(col("doc_id"), col("lang"),
          TextFunctions.normText(col("text")).as("t"))
        // localCheckpoint: bg feeds model-build AND scoring, and the
        // explode itself is the expensive part (measured: dropping
        // the checkpoint re-explodes twice, 2.8 -> 4.7 s even with
        // the single-pass model below). At 100 TB you'd persist the
        // tiny MODEL between the two passes instead of caching the
        // exploded stream — same two-scan plan, no cache.
        val bg = nt.select(col("doc_id"), col("lang"),
          explode(when(length(col("t")) >= 2,
            transform(sequence(lit(1), length(col("t")) - 1),
              i => col("t").substr(i, lit(2))))
            .otherwise(array().cast("array<string>"))).as("b"))
          .localCheckpoint()
        // BOTH models from ONE aggregation (conditional sum for the
        // target slice): every bigram has cf >= 1 by construction, so
        // the scoring join is inner and needs no null handling.
        val model = bg.groupBy(col("b")).agg(
          count(lit(1)).as("cf"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tf"))
        val totals = model.agg(sum(col("tf")).as("tt"),
          sum(col("cf")).as("ct"))
        val scored = bg
          .join(broadcast(model), Seq("b"))
          .groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("tf_sum"),
            sum(col("cf")).as("cf_sum"))
          .crossJoin(broadcast(totals))
          .withColumn("w",
            (col("tf_sum").cast("double") * col("ct").cast("double")) /
              (col("cf_sum").cast("double") * col("tt").cast("double")))
          .withColumn("u",
            graft.functions.PortableHash.uniform60(concat(lit("dsir3:"),
              col("doc_id").cast("string")))
              .cast("double") / lit(1152921504606846976.0))
        scored.filter(col("u") < col("w") * 0.5)
          .select(col("doc_id"), col("w"))
      },
      oracle = Some("""
        WITH nt AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
          FROM documents),
        bg AS (
          SELECT doc_id, lang, unnest(CASE WHEN length(t) >= 2 THEN
            list_transform(range(1, length(t)), i -> t[i:i+1])
            ELSE CAST([] AS VARCHAR[]) END) AS b
          FROM nt),
        model AS (
          SELECT b, count(*) AS cf,
                 sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tf
          FROM bg GROUP BY b),
        totals AS (
          SELECT sum(tf) AS tt, sum(cf) AS ct FROM model),
        scored AS (
          SELECT s.doc_id,
                 (CAST(sum(m.tf) AS DOUBLE)
                    * CAST(t.ct AS DOUBLE)) /
                 (CAST(sum(m.cf) AS DOUBLE)
                    * CAST(t.tt AS DOUBLE)) AS w,
                 CAST(CAST(('0x' || substr(md5('dsir3:' ||
                     CAST(s.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
                   AS DOUBLE) / 1152921504606846976.0 AS u
          FROM bg s
          JOIN model m ON m.b = s.b
          CROSS JOIN totals t
          GROUP BY s.doc_id, t.tt, t.ct)
        SELECT doc_id, w FROM scored WHERE u < w * 0.5"""),
      doc = "DSIR-style importance resampling toward the 'en' target " +
        "model: bigram familiarity-rate ratio weights, deterministic " +
        "md5-uniform acceptance."),

    // ------------------------------------------------------------------
    "c28_shard_manifest" -> QueryDef(
      fn = { (s, dir) =>
        // Verified shard emission — the handoff artifact to a
        // training job: write the corpus as 16 hash-sharded parquet
        // partitions, then RE-READ the written files and compute the
        // manifest (per-shard doc count + order-free content
        // checksum) from DISK. The oracle computes the same manifest
        // from the source table, so a write that drops, duplicates,
        // or corrupts any row breaks the hash — integrity of the
        // emitted artifact, not just of the plan that produced it.
        // Checksum = modular sum (mod 2^60) of each doc's 60-bit
        // md5 integer: order-free (modular addition commutes) and —
        // the round-5 lesson — RANGE-portable: the reduced value
        // stays < 2^60 < 2^63-1, so it survives any int64-typed
        // downstream hash. The raw DECIMAL(38,0) sum was value-exact
        // on both engines but overflowed int64 (~2.6e19), which the
        // driver's typed hash cannot carry. DECIMAL intermediates on
        // both sides keep the pre-mod sum exact.
        val out = java.nio.file.Files
          .createTempDirectory("graft-c28-shards").toString
        docs(s, dir)
          .withColumn("shard",
            concat(lit("s"), substring(
              md5(concat(lit("shard:"), col("doc_id").cast("string"))),
              1, 1)))
          .write.mode("overwrite").partitionBy("shard").parquet(out)
        s.read.parquet(out)
          .withColumn("h",
            graft.functions.PortableHash.uniform60(col("text"))
              .cast("decimal(38,0)"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("h")) % lit(new java.math.BigDecimal(
              "1152921504606846976")))
              .cast("long").as("checksum"))
      },
      oracle = Some("""
        SELECT 's' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                 1, 1) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(('0x' || substr(md5(text), 1, 15))
                 AS UBIGINT)) % 1152921504606846976 AS BIGINT)
                 AS checksum
        FROM documents
        GROUP BY 1"""),
      doc = "Verified training-shard emission: 16 hash-sharded " +
        "parquet partitions, manifest (counts + order-free content " +
        "checksums) recomputed FROM THE WRITTEN FILES."),

    // ------------------------------------------------------------------
    "c29_bpe_token_budget" -> QueryDef(
      fn = { (s, dir) =>
        // c20's greedy quality-ranked budget fill, priced in the unit
        // a training run actually consumes: BPE subwords from the
        // corpus-induced tokenizer (t15/t16), not whitespace words.
        // Long words cost more subwords under a small merge table, so
        // the fill boundary genuinely moves vs c20 — this closes the
        // loop between the tokenizer and the curation operators that
        // exist to feed one. Same no-global-sort shape as c20
        // (bucket offsets broadcast, per-doc window partitions by
        // bucket); the only addition is one doc_id-keyed join of the
        // map-only tokenize output against the quality buckets.
        // HASH-CHECKED via oracleGen: the trained merges inline as
        // literals and DuckDB replays the greedy apply with
        // OracleSql.bpeApplyCtes (t16's replay) feeding c20's fill
        // SQL. CurationRulesSpec additionally pins selection parity
        // vs c20 on a planted corpus where BPE and whitespace
        // pricing agree, and divergence where they don't.
        import org.apache.spark.sql.expressions.Window
        val merges = graft.operators.Bpe
          .learnMerges(docs(s, dir), "text", numMerges = 20)
          .collect().sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val priced = graft.operators.Bpe
          .tokenize(docs(s, dir), "doc_id", "text", merges)
          .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
        val d = docs(s, dir).select(col("doc_id"),
          floor(TextFunctions.qualityScore(col("text")) * 100)
            .cast("long").as("bucket"))
          .join(priced, Seq("doc_id"))
        val buckets = d.groupBy(col("bucket"))
          .agg(sum(col("n_tokens")).as("btoks"))
        val wOff = Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = buckets
          .withColumn("start", coalesce(sum(col("btoks")).over(wOff), lit(0L)))
          .select(col("bucket"), col("start"))
        val tot = d.agg(sum(col("n_tokens")).as("total"))
        val wCum = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        d.join(broadcast(offs), Seq("bucket"))
          .crossJoin(broadcast(tot))
          .withColumn("cum", sum(col("n_tokens")).over(wCum))
          .filter(col("start") + col("cum") <= expr("total div 2"))
          .select(col("doc_id"), col("bucket"), col("n_tokens"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        val merges = OracleSql.bpeTrainedMerges(s, docs(s, dir), 20)
        s"""WITH RECURSIVE $qualityCte,
        ${OracleSql.bpeApplyCtes(merges)},
        t AS (
          SELECT s.doc_id, b.n_bpe_tokens AS n_tokens,
                 CAST(floor(s.quality * 100) AS BIGINT) AS bucket
          FROM scored s JOIN bpedoc b ON s.doc_id = b.doc_id),
        b AS (SELECT bucket, sum(n_tokens) AS btoks FROM t GROUP BY 1),
        o AS (SELECT bucket,
                     coalesce(sum(btoks) OVER (ORDER BY bucket DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS start
              FROM b),
        tot AS (SELECT sum(n_tokens) AS total FROM t),
        sel AS (SELECT t.doc_id, t.bucket, t.n_tokens, o.start,
                       sum(t.n_tokens) OVER (PARTITION BY t.bucket
                         ORDER BY t.doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum
                FROM t JOIN o USING (bucket))
        SELECT doc_id, bucket, n_tokens
        FROM sel, tot WHERE start + cum <= total // 2"""
      },
      doc = "Greedy token-budget fill priced in BPE subwords from the " +
        "corpus-induced tokenizer — hash-checked (frozen-merge " +
        "recursive-CTE apply replay feeding c20's fill)."),

    // ------------------------------------------------------------------
    "c30_curriculum" -> QueryDef(
      fn = { (s, dir) =>
        // Curriculum schedule: three epochs of increasingly
        // quality-selective membership — epoch 0 sees the whole
        // corpus, epoch 1 keeps a doc with probability q (its quality
        // score), epoch 2 with q^2, so later epochs concentrate on
        // the best data (quality ramp, anneal-to-clean). Membership
        // is the same deterministic md5-uniform acceptance as
        // c26/c27 — u and q are both IEEE-bitwise-equal cross-engine
        // and q*q is one multiply of identical operands, so the
        // acceptance BOUNDARY itself hash-checks; integer powers
        // only, no libm pow. Scale: pure per-row map over a
        // broadcast 3-row epoch table — no shuffle at all.
        val d = docs(s, dir).select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("q"))
        val epochs = s.range(0, 3)
          .select(col("id").cast("int").as("epoch"))
        d.crossJoin(broadcast(epochs))
          .withColumn("u",
            graft.functions.PortableHash.uniform60(concat(lit("curr:"),
              col("epoch").cast("string"), lit(":"),
              col("doc_id").cast("string")))
              .cast("double") / lit(1152921504606846976.0))
          .filter(col("epoch") === 0 ||
            (col("epoch") === 1 && col("u") < col("q")) ||
            (col("epoch") === 2 && col("u") < col("q") * col("q")))
          .select(col("epoch"), col("doc_id"))
      },
      oracle = Some(s"""
        WITH $qualityCte,
        e AS (SELECT unnest([0, 1, 2]) AS epoch),
        u AS (
          SELECT s.doc_id, s.quality, e.epoch,
                 CAST(CAST(('0x' || substr(md5('curr:'
                   || CAST(e.epoch AS VARCHAR) || ':'
                   || CAST(s.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
                   AS DOUBLE) / 1152921504606846976.0 AS u
          FROM scored s CROSS JOIN e)
        SELECT epoch, doc_id FROM u
        WHERE epoch = 0 OR (epoch = 1 AND u < quality)
           OR (epoch = 2 AND u < quality * quality)"""),
      doc = "Quality-ramped curriculum: per-epoch md5-uniform " +
        "acceptance at probability q^epoch (deterministic, " +
        "hash-checked boundary; zero-shuffle map)."),

    // ------------------------------------------------------------------
    "c31_incremental_agg" -> QueryDef(
      fn = { (s, dir) =>
        // Incremental materialized-view maintenance: fold a CDC batch
        // into a per-status (count, revenue) rollup WITHOUT rescanning
        // the base — the delta side aggregates only the changed rows,
        // and IncrementalAgg.mergeCountSum is a key-local full-outer
        // merge handling births/updates/deletes/deaths. The oracle
        // recomputes the post-batch state from scratch, so hash-green
        // here proves state + fold(delta) == recompute(final) exactly
        // (sums kept in DECIMAL through the merge; double only at the
        // output). Deterministic CDC batch: orders with key%13==0 are
        // DELETEd, surviving key%7==0 rows get price += 1.00.
        // Scale: delta agg shuffles |changed rows|; the merge
        // shuffles |groups| — base is read once to SEED the state
        // (standing in for the already-materialized table) and never
        // again.
        val money = (c: org.apache.spark.sql.Column) =>
          c.cast("decimal(12,2)")
        val ord = T(s, dir).orders
        val state = ord.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(money(col("o_totalprice"))).as("tot"))
        val deletes = ord
          .filter(pmod(col("o_orderkey"), lit(13)) === 0)
          .select(col("o_orderstatus"), lit(-1L).as("dn"),
            (-money(col("o_totalprice"))).as("ds"))
        val updates = ord
          .filter(pmod(col("o_orderkey"), lit(7)) === 0 &&
            pmod(col("o_orderkey"), lit(13)) =!= 0)
          .select(col("o_orderstatus"), lit(0L).as("dn"),
            lit("1.00").cast("decimal(12,2)").as("ds"))
        val delta = deletes.unionByName(updates)
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
        graft.operators.IncrementalAgg
          .mergeCountSum(state, delta, "o_orderstatus")
          .select(col("o_orderstatus"), col("n"),
            col("tot").cast("double").as("total"))
      },
      oracle = Some("""
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))
                 + CASE WHEN o_orderkey % 7 = 0
                        THEN CAST(1.00 AS DECIMAL(12,2))
                        ELSE CAST(0.00 AS DECIMAL(12,2)) END)
                 AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 13 != 0
        GROUP BY o_orderstatus"""),
      doc = "Incremental aggregate maintenance: CDC delta batch " +
        "(deletes + price updates) folded into a count/sum rollup by " +
        "key-local merge; hash-proven equal to full recompute."),

    // ------------------------------------------------------------------
    "c32_data_card" -> QueryDef(
      fn = { (s, dir) =>
        // The dataset card — the standard artifact shipped alongside
        // a training corpus: per (source, lang) strata it reports
        // volume (docs, tokens, bytes), exact-dup mass (distinct
        // fingerprints vs rows), and the quality-gate pass count.
        // ALL-INTEGER by construction (counts and exact sums), so
        // the card is hash-exact with no float discipline — the
        // quality threshold is the only double and it's a boundary
        // both engines compute identically (t03's oracle-proven
        // score). One groupBy over the corpus; count_distinct on the
        // md5 fingerprint is the same partial-agg shape as c01's
        // dedup shuffle — at 100 TB this is a single pass.
        docs(s, dir)
          .withColumn("fp", TextFunctions.fingerprint(col("text")))
          .withColumn("q", TextFunctions.qualityScore(col("text")))
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("fp")).as("n_distinct"),
            sum(size(TextFunctions.tokens(col("text"))).cast("long"))
              .as("total_tokens"),
            sum(octet_length(col("text")).cast("long")).as("total_bytes"),
            sum(when(col("q") >= 0.5, 1L).otherwise(0L))
              .as("n_quality_pass"))
      },
      oracle = Some(s"""
        WITH $qualityCte
        SELECT d.source, d.lang, count(*) AS n_docs,
               count(DISTINCT md5(trim(regexp_replace(lower(sc.text),
                 '\\s+', ' ', 'g')))) AS n_distinct,
               CAST(sum(len(list_filter(string_split(sc.text, ' '),
                 x -> x != ''))) AS BIGINT) AS total_tokens,
               CAST(sum(octet_length(encode(sc.text))) AS BIGINT)
                 AS total_bytes,
               CAST(sum(CASE WHEN sc.quality >= 0.5 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_quality_pass
        FROM scored sc JOIN documents d ON sc.doc_id = d.doc_id
        GROUP BY d.source, d.lang"""),
      doc = "Per-(source, lang) dataset card: volume, exact-dup " +
        "mass, quality-gate pass counts — all-integer, hash-exact."),

    // ------------------------------------------------------------------
    "c33_kmv_distinct_view" -> QueryDef(
      fn = { (s, dir) =>
        // Maintained DISTINCT-count view (AggSync.kmvDistinctSink's
        // batch kernel): distinct count is the textbook non-additive
        // aggregate — c31's count/sum fold cannot maintain it — and
        // the KMV bottom-k set (q50) is its textbook mergeable state.
        // Two CDC batches (orderkey even, then odd) fold one at a
        // time through IncrementalAgg.mergeKmv; the oracle recomputes
        // the per-status sketch FROM SCRATCH over all orders, so
        // hash-green proves the fold lossless: bottom-k(bottom-k(A) ∪
        // bottom-k(B)) = bottom-k(A ∪ B). 'P' status saturates below
        // k at this SF and exercises the exact (size < k) path; est
        // is one double division on exact int64s. Scale: each fold
        // shuffles |batch| once for the distinct, the merge is
        // key-local on <= k longs per key — O(|delta| + touched keys)
        // per batch, never a rescan of accumulated data.
        val k = 64
        val ord = T(s, dir).orders
          .select(col("o_orderkey"), col("o_orderstatus").as("grp"),
            col("o_custkey"))
        def deltaOf(half: org.apache.spark.sql.DataFrame) =
          graft.operators.IncrementalAgg
            .kmvDelta(half, "grp", "o_custkey", k)
        val d1 = deltaOf(ord.filter(pmod(col("o_orderkey"), lit(2)) === 0))
        val d2 = deltaOf(ord.filter(pmod(col("o_orderkey"), lit(2)) === 1))
        val s0 = d1.select(col("grp"), col("dkmv").as("kmv")).limit(0)
        val s1 = graft.operators.IncrementalAgg.mergeKmv(s0, d1, "grp", k)
        val s2 = graft.operators.IncrementalAgg.mergeKmv(s1, d2, "grp", k)
        s2.select(col("grp"),
          size(col("kmv")).as("n_seen"),
          when(size(col("kmv")) >= k, element_at(col("kmv"), k))
            .as("kth_min"),
          expr("aggregate(kmv, 0L, (a, x) -> a ^ x)").as("xor_check"),
          graft.operators.IncrementalAgg.kmvEstimate(col("kmv"), k)
            .as("est"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT DISTINCT o_orderstatus AS grp,
                 ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                   ::UBIGINT::BIGINT AS hv
          FROM orders),
        bk AS (
          SELECT grp, hv FROM (
            SELECT grp, hv,
                   row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
            FROM h) WHERE rn <= 64)
        SELECT grp, CAST(count(*) AS INT) AS n_seen,
               CASE WHEN count(*) >= 64 THEN max(hv) END AS kth_min,
               bit_xor(hv) AS xor_check,
               CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                    ELSE 63.0 * 1152921504606846976.0 /
                         CAST(max(hv) AS DOUBLE) END AS est
        FROM bk GROUP BY grp"""),
      doc = "Maintained distinct-count view: KMV bottom-k state " +
        "folded batch-at-a-time; oracle recomputes from scratch — " +
        "hash-green proves the incremental fold lossless."),

    // ------------------------------------------------------------------
    "c34_cluster_sample" -> QueryDef(
      fn = { (s, dir) =>
        // Cluster-balanced diversity sampling: cap every semantic
        // (k-means) cell of the embedding space at 10 vectors so
        // dense regions stop dominating the training subset.
        // Assignment is a map pass (centroid literals, s03's
        // quantizer), the cap is one WindowGroupLimit-pruned shuffle
        // on cell, within-cell order is the md5-uniform hash of the
        // id. HASH-CHECKED via oracleGen: the trained centroids
        // inline as SQL literals (s03's discipline) and DuckDB
        // replays assignment argmax, hash order and the cap.
        val e = T(s, dir).embeddings
        val cents = graft.operators.Similarity.coarseCentroids(
          e, "embedding", "vec_id", nlist = 16, seed = 42L,
          maxTrainRows = 100000L)
        Sampling.clusterBalancedSample(
          e, "embedding", "vec_id", cents, perCluster = 10)
          .select(col("id").as("vec_id"), col("cell"), col("rk"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        val e = T(s, dir).embeddings
        val cents = graft.operators.Similarity.coarseCentroids(
          e, "embedding", "vec_id", nlist = 16, seed = 42L,
          maxTrainRows = 100000L)
        val m = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
        val h = graft.functions.PortableHash
          .sqlUniform60("CAST(id AS VARCHAR)")
        s"""
        WITH ct AS (SELECT $m::DOUBLE[][] AS m),
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
              FROM embeddings),
        ascore AS (
          SELECT v.id, c.c AS cell,
                 list_cosine_similarity(ct.m[c.c + 1], v.vec) AS csim
          FROM v, ct, (SELECT unnest(range(0, 16)) AS c) c),
        cells AS (
          SELECT id, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore) WHERE rn = 1)
        SELECT id AS vec_id, CAST(cell AS INT) AS cell,
               CAST(rk AS INT) AS rk
        FROM (SELECT id, cell, row_number() OVER (PARTITION BY cell
                ORDER BY $h, id) AS rk
              FROM cells)
        WHERE rk <= 10"""
      },
      doc = "Cluster-balanced diversity sample: per-k-means-cell cap " +
        "over the embedding space (map-only assignment via centroid " +
        "literals, WindowGroupLimit cap, md5-hash within-cell order; " +
        "centroids inlined into the oracle at Verify time)."),

    // ------------------------------------------------------------------
    "c35_semantic_decontam" -> QueryDef(
      fn = { (s, dir) =>
        // Embedding-space decontamination — the third leg of the
        // family (c05 exact n-grams, c19 fuzzy excerpts): flag
        // corpus vectors cosine-close to ANY eval vector. The eval
        // benchmark broadcasts (small by definition), the corpus
        // scans once through a broadcast NLJ, and only flagged hits
        // reach the aggregation shuffle. Exact — a drop decision
        // tolerates no LSH recall gap.
        val e = T(s, dir).embeddings
        graft.operators.Similarity.semanticDecontam(
          e.filter(col("vec_id") % 50 =!= 0),
          e.filter(col("vec_id") % 50 === 0),
          threshold = 0.35)
          .select(col("id").as("vec_id"), col("n_hits"),
            col("max_cosine"), col("first_eval_id"))
      },
      oracle = Some("""
        WITH ev AS (
          SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS evec
          FROM embeddings WHERE vec_id % 50 = 0),
        co AS (
          SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
          FROM embeddings WHERE vec_id % 50 <> 0),
        hits AS (
          SELECT co.id, ev.eval_id,
                 list_cosine_similarity(co.vec, ev.evec) AS cos
          FROM co, ev
          WHERE list_cosine_similarity(co.vec, ev.evec) >= 0.35)
        SELECT id AS vec_id, count(*) AS n_hits,
               round(max(cos), 4) AS max_cosine,
               min(eval_id) AS first_eval_id
        FROM hits GROUP BY id"""),
      doc = "Semantic benchmark decontamination: eval set broadcast, " +
        "exact cosine flagging, only hits shuffle — paraphrased " +
        "contamination that defeats n-gram checks still co-locates " +
        "in embedding space."))
}
