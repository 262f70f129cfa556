package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Engine, QueryDef}
import graft.functions.TextFunctions

/** Text-analysis surface over the `documents` fixture: token stats,
  * BPE-ish token counting, fingerprinting, quality scoring,
  * language-ID. All pure column expressions (whole-stage codegen) —
  * a 100 TB corpus pass is one parquet scan with no shuffle at all
  * except the final write.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String) =
    Engine.Tables(s, dir).documents

  val defs: ListMap[String, QueryDef] = ListMap(
    // ------------------------------------------------------------------
    "t01_text_stats" -> QueryDef(
      fn = { (s, dir) =>
        val t = col("text")
        docs(s, dir).select(
          col("doc_id"),
          TextFunctions.tokenCount(t).as("n_tokens"),
          length(t).as("n_chars"),
          TextFunctions.punctCount(t).as("n_punct"),
          TextFunctions.stopwordRatio(t).as("stop_ratio"),
          TextFunctions.meanTokenLen(t).as("mean_tok_len"))
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id, text,
                 list_filter(string_split(text, ' '), x -> x != '') AS toks
          FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(length(text)
                 - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))
                 AS INTEGER) AS n_punct,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(
                        list_filter(string_split(lower(text), ' '), x -> x != ''),
                        x -> list_contains(
                          ['the','a','of','and','to','in','is','it','that','for'], x)))
                      AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS stop_ratio,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                      AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS mean_tok_len
        FROM tk"""),
      doc = "Per-doc token/char/punct/stopword stats (codegen, no shuffle)."),

    // ------------------------------------------------------------------
    "t02_fingerprint" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir).select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp"),
          TextFunctions.bpeishTokenCount(col("text")).as("n_bpeish"))
      },
      oracle = Some("""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpeish
        FROM documents"""),
      doc = "Canonical md5 fingerprint + BPE-ish subword count."),

    // ------------------------------------------------------------------
    "t03_quality_score" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir).select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT doc_id,
            CAST(length(text) AS DOUBLE) AS nc,
            list_filter(string_split(text, ' '), x -> x != '') AS toks,
            list_filter(string_split(lower(text), ' '), x -> x != '') AS ltoks,
            CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))
              AS DOUBLE) AS np
          FROM documents),
        g AS (
          SELECT doc_id, nc, np,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(ltoks,
                     x -> list_contains(
                       ['the','a','of','and','to','in','is','it','that','for'], x)))
                   AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS stop_ratio,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                   AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS mtl
          FROM f)
        SELECT doc_id,
          round(
            (least(nc / 200.0, 1.0) *
              (CASE WHEN nc > 20000 THEN 0.5 ELSE 1.0 END)) * 0.3 +
            least(stop_ratio * 5.0, 1.0) * 0.3 +
            (CASE WHEN np / greatest(nc, 1.0) > 0.3
                  THEN 0.2 ELSE 1.0 END) * 0.2 +
            (CASE WHEN mtl BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.4 END) * 0.2,
            6) AS quality
        FROM g"""),
      doc = "C4-style composite quality score, fully SQL-mirrored."),

    // ------------------------------------------------------------------
    "t04_lang_id" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir).select(col("doc_id"),
          TextFunctions.langId(col("text")).as("lang_pred"))
      },
      // Full per-doc mirror of the heuristic: charset beacons are
      // regexp_matches (RE2 \x{...} = Java \uXXXX, all-BMP ranges);
      // the stopword argmax encodes (score, lang) as a zero-padded
      // sortable string so VARCHAR greatest() reproduces Spark's
      // struct array_max ordering (score, then lang) exactly —
      // profiles hold 10 words, so two digits never saturate.
      oracle = Some(raw"""
        WITH toks AS (
          SELECT doc_id, text,
                 list_distinct(list_filter(
                   string_split(lower(text), ' '), x -> x <> '')) AS tk
          FROM documents
        ), scored AS (
          SELECT doc_id, text,
                 greatest(
                   printf('%02d', len(list_intersect(tk, ['der','die','das','und','ist','nicht','ein','mit','zu','auf']))) || 'de',
                   printf('%02d', len(list_intersect(tk, ['the','a','of','and','to','in','is','it','that','for']))) || 'en',
                   printf('%02d', len(list_intersect(tk, ['el','la','los','y','es','un','una','en','que','por']))) || 'es',
                   printf('%02d', len(list_intersect(tk, ['le','la','les','et','est','un','une','dans','que','pour']))) || 'fr'
                 ) AS best
          FROM toks
        )
        SELECT doc_id,
          CASE
            WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
            WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
            WHEN regexp_matches(text, '[\x{ac00}-\x{d7af}]') THEN 'ko'
            WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
            WHEN regexp_matches(text, '[\x{0600}-\x{06ff}]') THEN 'ar'
            WHEN CAST(substr(best, 1, 2) AS INT) > 0 THEN substr(best, 3)
            ELSE 'und' END AS lang_pred
        FROM scored"""),
      doc = "Per-doc language-ID heuristic, hash-checked end to end."),

    // ------------------------------------------------------------------
    "t06_text_clean" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir).select(col("doc_id"),
          TextFunctions.cleanText(col("text")).as("clean"),
          length(TextFunctions.cleanText(col("text"))).as("n_clean_chars"))
      },
      oracle = Some("""
        SELECT doc_id,
               trim(regexp_replace(
                 regexp_replace(
                   regexp_replace(text, 'https?://\S+', ' ', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
                 '\s+', ' ', 'g')) AS clean,
               CAST(length(trim(regexp_replace(
                 regexp_replace(
                   regexp_replace(text, 'https?://\S+', ' ', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
                 '\s+', ' ', 'g')))
                 AS INTEGER) AS n_clean_chars
        FROM documents"""),
      doc = "URL/e-mail strip + whitespace collapse (codegen, no shuffle)."),

    // ------------------------------------------------------------------
    "t07_top_ngrams" -> QueryDef(
      fn = { (s, dir) =>
        // Corpus-wide n-gram vocabulary: explode word trigrams, count,
        // top-100. The scale shape is explode -> partial+final hash
        // agg -> TakeOrderedAndProject: the exploded stream never
        // materializes, map-side combine crushes the heavy hitters
        // before the shuffle, and top-k avoids a global sort.
        docs(s, dir)
          .select(explode(TextFunctions.shingles(col("text"), 3))
            .as("ngram"))
          .groupBy(col("ngram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("ngram"))
          .limit(100)
      },
      oracle = Some("""
        WITH toks AS (
          SELECT list_filter(string_split(text, ' '), x -> x != '') AS ts
          FROM documents),
        tri AS (
          SELECT unnest(CASE WHEN len(ts) >= 3 THEN
            list_transform(range(1, len(ts) - 1),
              i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS ngram
          FROM toks)
        SELECT ngram, count(*) AS n
        FROM tri GROUP BY ngram
        ORDER BY n DESC, ngram LIMIT 100"""),
      doc = "Corpus top-100 word trigrams (explode + agg + top-k)."),

    // ------------------------------------------------------------------
    "t05_rolling_hash" -> QueryDef(
      fn = { (s, dir) =>
        // Order-sensitive doc fingerprint. The mod-prime accumulation
        // keeps every intermediate < 2^31, so DuckDB's list_reduce
        // replicates it exactly in BIGINT — fully oracle-checked
        // (ASCII corpus: ascii() agrees between engines).
        docs(s, dir).select(col("doc_id"),
          TextFunctions.rollingHash(col("text")).as("rh"))
      },
      oracle = Some("""
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(text) + 1),
                     i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
                 (acc, c) -> (acc * 31 + c) % 2147483647) AS rh
        FROM documents"""),
      doc = "Rolling polynomial hash fingerprint (mod-prime, " +
        "engine-exact)."),

    // ------------------------------------------------------------------
    "t08_doc_freq" -> QueryDef(
      fn = { (s, dir) =>
        // Corpus document-frequency table (the IDF numerator): tokens
        // appearing in >= 5% of docs. Scale shape: explode distinct
        // per-doc tokens -> partial+final hash agg (map-side combine
        // crushes stopword heavy hitters before the shuffle); the
        // count(*) scalar joins in as a 1-row broadcast. Integer
        // outputs only — idf itself is ln(), which is libm-dependent
        // and would break cross-engine hash equality.
        val d = docs(s, dir)
        val df_ = d.select(col("doc_id"),
          explode(array_distinct(TextFunctions.tokens(col("text"))))
            .as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("df"))
        df_.crossJoin(broadcast(d.select(count(lit(1)).as("n_docs"))))
          .filter(col("df") >= col("n_docs") * 0.05)
          .select(col("token"), col("df"), col("n_docs"))
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct(
            list_filter(string_split(text, ' '), x -> x != ''))) AS token
          FROM documents),
        dfreq AS (
          SELECT token, count(*) AS df FROM tok GROUP BY token)
        SELECT token, df,
               (SELECT count(*) FROM documents) AS n_docs
        FROM dfreq
        WHERE df >= 0.05 * (SELECT count(*) FROM documents)"""),
      doc = "Document-frequency table at >=5% support (IDF numerator; " +
        "explode + map-side-combined agg)."),

    // ------------------------------------------------------------------
    "t09_heavy_hitters" -> QueryDef(
      fn = { (s, dir) =>
        import graft.functions.PortableHash
        // Sketch-based heavy hitters at 0.5% support: one pass builds
        // a depth-4 x width-2048 Count-Min sketch as a RELATIONAL agg
        // (mergeable map-side-combined partials — the tree-aggregated
        // 100 TB shape, vs t07/t08's exact groupBy whose shuffle
        // carries the whole vocabulary); the 64 KB counter matrix
        // then inlines as array literals so the probe runs as a
        // codegen'd SCAN FILTER — only occurrences of heavy
        // CANDIDATES reach the distinct's shuffle. CMS never
        // undercounts -> the result is a superset of the true heavy
        // hitters (bounded overcount asserted in SketchSpec for the
        // binary-sketch path, which stays the drop-in alternative).
        // HASH-CHECKED (round 9): row hashes are the md5-portable
        // 60-bit family, so the oracle rebuilds the same counters and
        // min-probe in DuckDB — estimates AND collisions replay
        // exactly. The collect is sketch-sized (depth x width longs),
        // corpus-independent.
        val depth = 4; val width = 2048
        def bucket(r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          pmod(PortableHash.uniform60(
            concat(col("token"), lit("#"), r.cast("string"))), lit(width))
        val toks = Engine.widenIfNarrow(docs(s, dir))
          .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        val counters = toks
          .select(col("token"),
            explode(sequence(lit(0), lit(depth - 1))).as("r"))
          .select(col("r"), bucket(col("r")).as("bucket"))
          .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("c"))
          .collect()
        val cmat = Array.fill(depth)(new Array[Long](width))
        counters.foreach { row =>
          cmat(row.getInt(0))(row.getLong(1).toInt) = row.getLong(2) }
        val total = cmat(0).sum // row sums == token occurrence count
        val support = math.max(1L, total / 200)
        val est = (0 until depth).map { r =>
          element_at(typedlit(cmat(r).toSeq),
            (bucket(lit(r)) + 1).cast("int"))
        }.reduce(least(_, _))
        toks.where(est >= support)
          .distinct()
          .select(col("token"), est.as("est"))
      },
      oracle = Some(s"""
        WITH tok AS (
          SELECT unnest(${graft.queries.OracleSql.tsExpr}) AS token
          FROM documents),
        occ AS (
          SELECT token, r.r AS r,
                 ${graft.functions.PortableHash.sqlUniform60(
                   "token || '#' || CAST(r.r AS VARCHAR)")} % 2048
                   AS bucket
          FROM tok, (SELECT unnest(range(0, 4)) AS r) r),
        cnt AS (
          SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
          FROM occ GROUP BY r, bucket),
        total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
        est AS (
          SELECT o.token, min(cnt.c) AS est
          FROM (SELECT DISTINCT token, r, bucket FROM occ) o
            JOIN cnt ON cnt.r = o.r AND cnt.bucket = o.bucket
          GROUP BY o.token)
        SELECT token, est FROM est, total
        WHERE est >= greatest(1, total.n // 200)"""),
      doc = "Count-Min heavy hitters at 0.5% support (relational " +
        "sketch agg + literal-matrix probe as a codegen scan filter; " +
        "superset of exact, bounded overcount; md5-portable hashes, " +
        "oracle rebuilds the sketch)."),

    // ------------------------------------------------------------------
    "t10_char_entropy" -> QueryDef(
      fn = { (s, dir) =>
        // Shannon entropy of each doc's character distribution — the
        // cheap perplexity proxy: natural prose ~4.0-4.5 bits/char,
        // base64/hex junk higher, repeated boilerplate lower. Native
        // one-pass codegen expression (byte histogram + fixed-order
        // fold); on the ASCII fixture byte entropy == char entropy,
        // which is what DuckDB's entropy() recomputes. round(6):
        // summation order differs between engines by ~1 ulp.
        import org.apache.spark.sql.graft.expressions.byte_entropy
        docs(s, dir).select(col("doc_id"),
          round(byte_entropy(col("text")), 6).as("entropy_bits"))
      },
      oracle = Some("""
        SELECT doc_id, round(entropy(c), 6) AS entropy_bits
        FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
              FROM documents)
        GROUP BY doc_id"""),
      doc = "Per-doc character-distribution Shannon entropy (native " +
        "codegen expression; quality/perplexity proxy)."),

    // ------------------------------------------------------------------
    "t11_bm25" -> QueryDef(
      fn = { (s, dir) =>
        // BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed query —
        // the lexical-search complement of s06's TF-IDF cosine. Scale
        // shape: the query-term filter is a codegen'd In() applied
        // BEFORE the shuffle, so only occurrences of the ~8 query
        // terms ever leave the scan; df and corpus stats are 1-row /
        // tiny broadcasts. Engine-exactness discipline: the classic
        // ln() idf is libm-dependent, so this uses the rational idf
        // (N - df + 0.5)/(df + 0.5) (same ranking for any fixed df
        // ordering); per-term contributions are bitwise-deterministic
        // double chains, summed as DECIMAL(18,8) so the per-doc sum
        // is order-independent and hash-green against DuckDB.
        val d = docs(s, dir)
        val qterms = Seq("data", "model", "system", "learning",
          "training", "quality", "random", "sample")
        val base = d.select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).as("dl"),
            explode(col("toks")).as("token"))
          .filter(col("token").isInCollection(qterms))
        val tf = base.groupBy(col("doc_id"), col("dl"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val dfq = tf.groupBy(col("token"))
          .agg(count(lit(1)).as("df"))
        val stats = d.agg(count(lit(1)).as("n_docs"),
          avg(TextFunctions.tokenCount(col("text"))).as("avgdl"))
        val contrib =
          ((col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          ((col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) *
              (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
        tf.join(broadcast(dfq), "token")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"),
            contrib.cast("decimal(18,8)").as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).cast("double").as("score"),
            count(lit(1)).as("n_terms"))
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x != '') AS ts
          FROM documents),
        base AS (
          SELECT doc_id, len(ts) AS dl, unnest(ts) AS token FROM tok),
        tf AS (
          SELECT doc_id, dl, token, count(*) AS tf FROM base
          WHERE token IN ('data','model','system','learning',
                          'training','quality','random','sample')
          GROUP BY 1, 2, 3),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        stats AS (SELECT count(*) AS n_docs, avg(len(ts)) AS avgdl
                  FROM tok)
        SELECT doc_id,
               CAST(sum(CAST(
                 ((n_docs - df + 0.5) / (df + 0.5)) *
                 ((tf * 2.2) /
                  (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
                 AS DECIMAL(18,8))) AS DOUBLE) AS score,
               count(*) AS n_terms
        FROM tf JOIN dfq USING (token), stats
        GROUP BY doc_id"""),
      doc = "BM25 ranked retrieval for a fixed query (rational idf, " +
        "decimal-summed contributions; broadcast df/stats)."),

    // ------------------------------------------------------------------
    "t12_readability" -> QueryDef(
      fn = { (s, dir) =>
        // Flesch reading ease from three integer counts (words,
        // sentence-final punctuation runs, vowel-group "syllables") —
        // the classic curation readability gate, as one codegen map
        // pass with zero shuffle. Engine-exact: the counts are
        // identical regex integers in both engines and the score is
        // one fixed double expression tree over them (no libm).
        val w = TextFunctions.tokenCount(col("text")).cast("double")
        val sen = greatest(lit(1),
          regexp_count(col("text"), lit("[.!?]+"))).cast("double")
        val syl = greatest(lit(1),
          regexp_count(lower(col("text")), lit("[aeiouy]+"))).cast("double")
        docs(s, dir)
          .select(col("doc_id"), w.as("w"), sen.as("sen"), syl.as("syl"))
          .filter(col("w") > 0)
          .select(col("doc_id"),
            col("w").cast("long").as("n_words"),
            col("sen").cast("long").as("n_sentences"),
            col("syl").cast("long").as("n_syllables"),
            (lit(206.835) - lit(1.015) * (col("w") / col("sen")) -
              lit(84.6) * (col("syl") / col("w"))).as("flesch"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                   x -> x != '')) AS DOUBLE) AS w,
                 CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                   AS DOUBLE) AS sen,
                 CAST(greatest(1, len(regexp_extract_all(lower(text),
                   '[aeiouy]+'))) AS DOUBLE) AS syl
          FROM documents)
        SELECT doc_id,
               CAST(w AS BIGINT) AS n_words,
               CAST(sen AS BIGINT) AS n_sentences,
               CAST(syl AS BIGINT) AS n_syllables,
               206.835 - 1.015 * (w / sen) - 84.6 * (syl / w) AS flesch
        FROM f WHERE w > 0"""),
      doc = "Flesch reading ease from integer word/sentence/syllable " +
        "counts (single codegen pass, engine-exact doubles)."),

    // ------------------------------------------------------------------
    "t13_collocations" -> QueryDef(
      fn = { (s, dir) =>
        // Collocation extraction (pointwise-mutual-information family,
        // kept exact): lift(a,b) = n_ab * N / (n_a * n_b) — the
        // log-free PMI core, computed as ONE double division of exact
        // integer products so both engines agree bitwise (the same
        // rational-form discipline as t11's idf; products stay far
        // under 2^53 here, and the 100 TB variant would emit the
        // integer triple and defer division). Shape: two token
        // explodes feeding partial-agg counts, a min-support filter
        // (n_ab >= 5) BEFORE the unigram joins so the join input is
        // the small surviving bigram set, and the corpus-total N as a
        // broadcast 1-row cross join.
        val d = docs(s, dir)
        val uni = d.select(
          explode(TextFunctions.shingles(col("text"), 1)).as("w"))
        val un = uni.groupBy(col("w")).agg(count(lit(1)).as("n"))
        val tot = uni.agg(count(lit(1)).as("n_total"))
        d.select(explode(TextFunctions.shingles(col("text"), 2)).as("bg"))
          .groupBy(col("bg")).agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
          .select(split(col("bg"), " ").getItem(0).as("w1"),
            split(col("bg"), " ").getItem(1).as("w2"), col("n_ab"))
          .join(un.select(col("w").as("w1"), col("n").as("n_a")), Seq("w1"))
          .join(un.select(col("w").as("w2"), col("n").as("n_b")), Seq("w2"))
          .crossJoin(broadcast(tot))
          .select(col("w1"), col("w2"), col("n_ab"), col("n_a"),
            col("n_b"),
            ((col("n_ab") * col("n_total")).cast("double") /
              (col("n_a") * col("n_b")).cast("double")).as("lift"))
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x != '') AS ts
          FROM documents),
        uni AS (SELECT unnest(ts) AS w FROM tok),
        un AS (SELECT w, count(*) AS n FROM uni GROUP BY 1),
        tot AS (SELECT count(*) AS n_total FROM uni),
        bg AS (
          SELECT unnest(CASE WHEN len(ts) >= 2 THEN
            list_transform(range(1, len(ts)),
              i -> array_to_string(ts[i:i+1], ' '))
            ELSE CAST([] AS VARCHAR[]) END) AS bg
          FROM tok),
        bn AS (SELECT bg, count(*) AS n_ab FROM bg
               GROUP BY 1 HAVING count(*) >= 5)
        SELECT string_split(bn.bg, ' ')[1] AS w1,
               string_split(bn.bg, ' ')[2] AS w2,
               bn.n_ab, a.n AS n_a, b.n AS n_b,
               CAST(bn.n_ab * tot.n_total AS DOUBLE)
                 / CAST(a.n * b.n AS DOUBLE) AS lift
        FROM bn
        JOIN un a ON a.w = string_split(bn.bg, ' ')[1]
        JOIN un b ON b.w = string_split(bn.bg, ' ')[2]
        CROSS JOIN tot"""),
      doc = "Bigram collocation lift (exact-rational PMI core; " +
        "min-support before joins, broadcast total)."),

    // ------------------------------------------------------------------
    "t14_bigram_quality" -> QueryDef(
      fn = { (s, dir) =>
        // CCNet-style LM quality scoring with a character-bigram
        // model: train counts on the even-doc_id half, score the odd
        // half by how familiar its bigrams are (freq_sum) and how
        // many it has the model never saw (oov). The held-out split
        // gives real generalization semantics: gibberish/base64 docs
        // score near-zero freq and high oov. All-INTEGER outputs by
        // design — the log transform a production scorer would apply
        // is monotone per-term and engine-divergent in the last ulp,
        // so the exactness gate scores frequencies, not log-probs.
        // Scale: the model is vocabulary-bounded (<= charset^2 rows)
        // -> broadcast; scoring is explode + broadcast-join + one
        // groupBy on doc_id.
        val nt = docs(s, dir).select(col("doc_id"),
          TextFunctions.normText(col("text")).as("t"))
        // (no localCheckpoint here, unlike c27: with only TWO
        // consumers the 10M-row materialization costs what the saved
        // re-explode earns — measured 2.15 s plain vs 2.4 s
        // checkpointed at sf0.1)
        val bg = nt.select(col("doc_id"),
          explode(when(length(col("t")) >= 2,
            transform(sequence(lit(1), length(col("t")) - 1),
              i => col("t").substr(i, lit(2))))
            .otherwise(array().cast("array<string>"))).as("b"))
        val model = bg.filter(col("doc_id") % 2 === 0)
          .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
        bg.filter(col("doc_id") % 2 === 1)
          .join(broadcast(model), Seq("b"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(coalesce(col("cnt"), lit(0L))).as("freq_sum"),
            sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("oov"))
      },
      oracle = Some("""
        WITH nt AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
          FROM documents),
        bg AS (
          SELECT doc_id, unnest(CASE WHEN length(t) >= 2 THEN
            list_transform(range(1, length(t)), i -> t[i:i+1])
            ELSE CAST([] AS VARCHAR[]) END) AS b
          FROM nt),
        model AS (
          SELECT b, count(*) AS cnt FROM bg
          WHERE doc_id % 2 = 0 GROUP BY b)
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(coalesce(m.cnt, 0)) AS BIGINT) AS freq_sum,
               CAST(sum(CASE WHEN m.cnt IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS oov
        FROM bg s LEFT JOIN model m USING (b)
        WHERE s.doc_id % 2 = 1
        GROUP BY s.doc_id"""),
      doc = "Char-bigram LM quality scoring vs a held-out-half " +
        "model (integer-exact familiarity + OOV counts; bounded " +
        "broadcast model)."),

    // ------------------------------------------------------------------
    "t15_bpe_merges" -> QueryDef(
      fn = { (s, dir) =>
        // Tokenizer induction: learn the corpus's top-20 BPE merges.
        // One distributed word-count shuffle; the merge loop runs on
        // the bounded word histogram (the standard trainer split —
        // pair statistics over a histogram equal pair statistics
        // over the corpus). HASH-CHECKED: the loop is a BOUNDED
        // iteration (20 rounds of argmax over weighted pair counts),
        // so the oracle unrolls it as 20 chained CTE blocks and
        // DuckDB re-runs the INDUCTION itself from the raw corpus —
        // no trained literals, a fully independent replay
        // (OracleSql.bpeLearnSql; chr(30)/supplementary-plane guards
        // keep a misalignable corpus rows-only). BpeSpec additionally
        // pins the incremental trainer against the naive recount
        // loop, which is exactly the recount the SQL performs.
        graft.operators.Bpe.learnMerges(
          docs(s, dir), "text", numMerges = 20)
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        OracleSql.bpeLearnOracleGuards(docs(s, dir))
        OracleSql.bpeLearnSql(numMerges = 20)
      },
      doc = "BPE tokenizer induction: top-20 learned merges " +
        "(distributed word histogram + bounded driver merge loop; " +
        "hash-checked via an unrolled-iteration SQL replay of the " +
        "selection loop itself)."),

    // ------------------------------------------------------------------
    "t16_bpe_tokenize" -> QueryDef(
      fn = { (s, dir) =>
        // The apply half of the tokenizer story: induce 20 merges
        // (t15), then segment every doc and report its subword
        // count — the number that actually prices a doc against a
        // token budget. The merge table rides the closure; the
        // tokenize pass is map-only. HASH-CHECKED via oracleGen: the
        // trained merges are deterministic plan-time constants, so
        // the generator inlines them as literals and DuckDB replays
        // the greedy-by-rank apply itself with a recursive CTE
        // (OracleSql.bpeApplyCtes) — the LEARNING loop stays
        // SQL-inexpressible (t15), but the apply half it feeds is
        // fully driver-checkable, the q49/q50 twin discipline.
        val merges = graft.operators.Bpe
          .learnMerges(docs(s, dir), "text", numMerges = 20)
          .collect().sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.operators.Bpe.tokenize(docs(s, dir), "doc_id", "text", merges)
          .select(col("doc_id"), col("n_bpe_tokens"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        val merges = OracleSql.bpeTrainedMerges(s, docs(s, dir), 20)
        s"""WITH RECURSIVE
        ${OracleSql.bpeApplyCtes(merges)}
        SELECT doc_id, n_bpe_tokens FROM bpedoc"""
      },
      doc = "BPE tokenization with corpus-induced merges: per-doc " +
        "subword counts — hash-checked (frozen-merge recursive-CTE " +
        "replay of the greedy apply)."),

    // ------------------------------------------------------------------
    "t17_tfidf_keywords" -> QueryDef(
      fn = { (s, dir) =>
        // Per-doc keyword extraction: top-3 tokens by TF-IDF. The
        // score is (tf * n_docs) / df — the ln() is monotone, so
        // ranking by the RATIO is ranking by idf-weighted tf without
        // libm (t08's rule). Exact-long product cast once to double
        // for ONE division: identical operand trees on both engines
        // -> bitwise-equal doubles -> identical ranks; ties break on
        // token for a total order. No df support cut: the fixture's
        // vocabulary is 31 dense tokens (df ~80% across the corpus),
        // so any stopword-style threshold empties the output — the
        // idf weight itself already demotes near-universal tokens,
        // which is the point of the score.
        // Scale shape: tf is one (doc_id, token) agg; the df table is
        // vocabulary-bounded and BROADCASTS; the only per-doc window
        // partitions by doc_id. Output stays all-integer.
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir)
        val tf = d.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val n = d.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(((col("tf") * col("n_docs")).cast("double") /
            col("df").cast("double")).desc, col("token"))
        tf.join(broadcast(dfreq), Seq("token"))
          .crossJoin(broadcast(n))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("token"), col("tf"), col("df"),
            col("rank"))
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '),
            x -> x != '')) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        ranked AS (
          SELECT t.doc_id, t.token, t.tf, d.df, n.n_docs,
                 row_number() OVER (PARTITION BY t.doc_id
                   ORDER BY CAST(t.tf * n.n_docs AS DOUBLE)
                              / CAST(d.df AS DOUBLE) DESC,
                            t.token) AS rank
          FROM tf t JOIN dfreq d USING (token) CROSS JOIN n)
        SELECT doc_id, token, tf, df, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3"""),
      doc = "Top-3 TF-IDF keywords per doc: rational idf-weighted " +
        "ranking (no libm), broadcast df table, all-integer output."),

    // ------------------------------------------------------------------
    "t18_quality_classifier" -> QueryDef(
      fn = { (s, dir) =>
        // Learned quality filter (the GPT-3/FineWeb curation
        // pattern): train a logistic-regression scorer on surface
        // features with lang='en' as the reference label, freeze the
        // weights, score every doc map-only. Training is driver-
        // bounded (id-ordered maxTrainRows sample — the
        // coarseCentroids discipline); scoring folds the weights in
        // as literals, one codegen scan, no shuffle. HASH-CHECKED
        // via oracleGen: the trained weights inline as SQL literals
        // and DuckDB replays the exact-integer-ratio features and
        // the left-associated dot product bit-for-bit (the raw
        // margin double hashes, d15's raw-similarity discipline).
        val d = docs(s, dir)
        val w = graft.operators.Classifier.train(
          d.withColumn("y", (col("lang") === "en").cast("double")),
          "text", "doc_id", "y")
        graft.operators.Classifier.score(d, "text", "doc_id", w)
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        import graft.operators.Classifier
        val w = Classifier.train(
          docs(s, dir)
            .withColumn("y", (col("lang") === "en").cast("double")),
          "text", "doc_id", "y")
        val f = Classifier.sqlFeatures
        val names = f.indices.map(i => s"f$i")
        val feats = f.zip(names)
          .map { case (e, n) => s"$e AS $n" }.mkString(",\n          ")
        s"""
        WITH d AS (
          SELECT doc_id, text FROM documents
          WHERE len(list_filter(string_split(text, ' '), x -> x != ''))
                > 0),
        f AS (
          SELECT doc_id,
          $feats
          FROM d)
        SELECT doc_id, margin,
               CASE WHEN margin > 0.0 THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS keep
        FROM (SELECT doc_id,
                ${Classifier.sqlMargin(w.toSeq, names)} AS margin
              FROM f)"""
      },
      doc = "Trained logistic-regression quality filter: driver-" +
        "bounded deterministic training, weight-literal map-only " +
        "scoring; oracle replays features + margin with the frozen " +
        "weights inlined."),

    // ------------------------------------------------------------------
    "t19_bpe_merges_deep" -> QueryDef(
      fn = { (s, dir) =>
        // t15 at REALISTIC depth: 200 merge rounds instead of 20 —
        // deep enough that the fixture's 31-word vocabulary EXHAUSTS
        // its pair space mid-run (every word collapses to a single
        // symbol), so the gate covers the early-stop path AND the
        // regime where the incremental trainer's advantage is real
        // (per-merge cost ~ affected words, not vocabulary; the naive
        // recount the oracle performs is 200 full rescans). Same one
        // corpus-scale shuffle as t15 — depth changes only the
        // driver-side histogram loop, which is the scale point:
        // a 32k-merge production vocabulary costs 160x this driver
        // loop and ZERO additional cluster work.
        graft.operators.Bpe.learnMerges(
          docs(s, dir), "text", numMerges = 200)
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        OracleSql.bpeLearnOracleGuards(docs(s, dir))
        OracleSql.bpeLearnSql(numMerges = 200)
      },
      doc = "Deep BPE induction (200 rounds, exhaustion-covering): " +
        "hash-checked via the same unrolled-iteration SQL replay as " +
        "t15 — 200 chained argmax/rewrite CTE blocks."))
}
