package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Engine, QueryDef}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{AnnIndex, Dedup, Similarity}

/** Dedup + similarity-search surface (builder brief: exact, MinHash
  * LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup; ANN
  * top-k). Oracle-checked wherever DuckDB can recompute the exact
  * semantics; probabilistic-but-deterministic LSH pipelines get
  * rows-only driver checks plus recall specs in ScalaTest.
  */
object DedupQueries {

  private def T(s: SparkSession, dir: String) = Engine.Tables(s, dir)

  val defs: ListMap[String, QueryDef] = ListMap(
    // ------------------------------------------------------------------
    "d01_exact_dedup" -> QueryDef(
      fn = { (s, dir) =>
        Dedup.exact(T(s, dir).documents, "text", "doc_id")
      },
      oracle = Some("""
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                 AS fingerprint,
               min(doc_id) AS keep_id, count(*) AS n_dups
        FROM documents GROUP BY 1"""),
      doc = "Exact dedup: hash-groupBy on normalized fingerprint."),

    // ------------------------------------------------------------------
    "d02_jaccard_adjacent" -> QueryDef(
      fn = { (s, dir) =>
        // Exact token-set Jaccard on a deterministic pair set
        // (consecutive doc ids) — the verification kernel of the LSH
        // pipeline, oracle-checked in isolation.
        val d = T(s, dir).documents
        // localCheckpoint: `sets` feeds BOTH sides of the self-join
        // and Spark fires no ReusedExchange on a derived-frame
        // self-join, so without it the corpus is tokenized twice
        // (r03's slowest non-composite query at 4.7 s).
        val sets = d.select(col("doc_id"),
          array_distinct(TextFunctions.tokens(col("text"))).as("ts"))
          .localCheckpoint()
        val a = sets.select(col("doc_id").as("id_a"), col("ts").as("set_a"))
        val b = sets.select((col("doc_id") - 1).as("id_a"),
          col("doc_id").as("id_b"), col("ts").as("set_b"))
        a.join(b, Seq("id_a"))
          .withColumn("n_inter",
            size(array_intersect(col("set_a"), col("set_b"))))
          .select(col("id_a"), col("id_b"),
            (col("n_inter").cast("double") /
              (size(col("set_a")) + size(col("set_b")) - col("n_inter"))
                .cast("double")).as("jaccard"))
      },
      oracle = Some("""
        WITH sets AS (
          SELECT doc_id,
                 list_distinct(list_filter(string_split(text, ' '),
                   x -> x != '')) AS ts
          FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
               CAST(len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
                 AS DOUBLE) AS jaccard
        FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1"""),
      doc = "Exact n-gram(1) Jaccard kernel on adjacent-id pairs."),

    // ------------------------------------------------------------------
    "d14_containment_adjacent" -> QueryDef(
      fn = { (s, dir) =>
        // ASYMMETRIC containment |A∩B| / |A| — the excerpt/subset
        // detector Jaccard misses: a short doc fully quoted inside a
        // long one has low Jaccard (union is large) but containment
        // 1.0 from the short side. Same deterministic adjacent-pair
        // kernel as d02 so the measure itself is oracle-checked
        // exactly; the scale path pairs via the same LSH candidates
        // as d03 (candidates are symmetric; only the verify measure
        // changes). Both directions emitted per pair.
        val d = T(s, dir).documents
        val sets = d.select(col("doc_id"),
          array_distinct(TextFunctions.tokens(col("text"))).as("ts"))
          .localCheckpoint()
        val a = sets.select(col("doc_id").as("id_a"), col("ts").as("set_a"))
        val b = sets.select((col("doc_id") - 1).as("id_a"),
          col("doc_id").as("id_b"), col("ts").as("set_b"))
        a.join(b, Seq("id_a"))
          .withColumn("n_inter",
            size(array_intersect(col("set_a"), col("set_b"))))
          .select(col("id_a"), col("id_b"),
            (col("n_inter").cast("double") /
              size(col("set_a")).cast("double")).as("containment_ab"),
            (col("n_inter").cast("double") /
              size(col("set_b")).cast("double")).as("containment_ba"))
      },
      oracle = Some("""
        WITH sets AS (
          SELECT doc_id,
                 list_distinct(list_filter(string_split(text, ' '),
                   x -> x != '')) AS ts
          FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
                 CAST(len(a.ts) AS DOUBLE) AS containment_ab,
               CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
                 CAST(len(b.ts) AS DOUBLE) AS containment_ba
        FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1"""),
      doc = "Asymmetric set containment on adjacent-id pairs (the " +
        "excerpt detector; both directions)."),

    // ------------------------------------------------------------------
    "d03_minhash_neardups" -> QueryDef(
      fn = { (s, dir) =>
        // Full MinHash(128)+LSH(32 bands) near-dup pipeline with
        // exact-Jaccard verification at 0.5. Deterministic (seeded
        // xxhash64) but not SQL-expressible -> rows-only; recall vs
        // brute force is asserted in DedupSpec.
        Dedup.nearDupPairs(
          Engine.widenIfNarrow(T(s, dir).documents),
          "text", "doc_id", threshold = 0.5)
      },
      oracle = None,
      doc = "MinHash+LSH near-dup pairs, Jaccard>=0.5 verified."),

    // ------------------------------------------------------------------
    "d04_simhash_neardups" -> QueryDef(
      fn = { (s, dir) =>
        Dedup.simhashPairs(Engine.widenIfNarrow(T(s, dir).documents),
          "text", "doc_id", maxHamming = 10)
      },
      oracle = None,
      doc = "SimHash banded near-dup pairs, hamming<=10 (rows-only)."),

    // ------------------------------------------------------------------
    "d05_embedding_dups" -> QueryDef(
      fn = { (s, dir) =>
        // Brute-force cosine pair scan through the native codegen'd
        // expression — the exact baseline the LSH path is measured
        // against; DuckDB recomputes it bit-for-bit (double math).
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val a = e.select(col("vec_id").as("id_a"),
          col("embedding").as("v_a"))
        val b = e.select(col("vec_id").as("id_b"),
          col("embedding").as("v_b"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            round(VectorFunctions.cosineSim(col("v_a"), col("v_b")), 4)
              .as("cosine"))
          .filter(col("cosine") >= 0.35)
      },
      oracle = Some("""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(
                 CAST(a.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(
                CAST(a.embedding AS DOUBLE[]),
                CAST(b.embedding AS DOUBLE[])), 4) >= 0.35"""),
      doc = "Embedding near-dup pairs (exact cosine >= 0.35)."),

    // ------------------------------------------------------------------
    "d06_embedding_lsh_dups" -> QueryDef(
      fn = { (s, dir) =>
        // The SCALE path for embedding dedup: hyperplane-LSH bucketed
        // candidate generation (ids-only through the exploded
        // self-join) + exact-cosine verification — replaces d05's
        // all-pairs crossJoin with a per-bucket slice at 100 TB.
        // Hash-checked (round 8): the 12x4 +-1 hyperplanes are
        // plan-time splitmix64 literals, so the oracle inlines the
        // same matrix and replays bucketing, the bucket-size cap,
        // exact-cosine verification, group expansion and the
        // exact-dup star — the whole candidate pipeline, not just
        // the verified tail. Parameter changes (bits/tables/seed)
        // break the compare loudly. Recall vs the exact d05 pair set
        // additionally asserted in DedupSpec.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Dedup.embeddingDupPairs(e, "embedding", "vec_id",
          threshold = 0.35, bits = 4, tables = 12)
          .select(col("id_a"), col("id_b"),
            round(col("cosine"), 4).as("cosine"))
      },
      oracle = Some("""
        WITH pl AS (SELECT [[[-1,-1,-1,-1,-1,1,-1,1,-1,-1,1,-1,1,1,-1,1,1,-1,-1,-1,1,1,1,1,1,1,1,-1,-1,-1,1,1,-1,-1,1,-1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,1,1,-1,1,1,-1,-1,-1,-1,-1,1,-1,-1],[1,1,1,-1,1,1,-1,1,1,1,-1,1,1,-1,-1,-1,1,1,-1,-1,1,1,1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,-1,1,1,1,1,1,1,-1,-1,1,1,-1,-1,1,-1,1,1,1,1,1,-1,-1,1,-1,-1,1,1,1,1],[-1,1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,1,1,1,-1,-1,-1,1,1,1,1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,-1,1,1,1,-1,-1,1,-1,1,-1,1,-1,-1,1,-1,1,1,1,1,1,-1],[1,-1,1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,1,1,-1,1,1,-1,1,1,-1,1,1,1,1,-1,1,-1,1,-1,1,1,-1,1,-1,1,1,1,-1,-1,1,1]],[[1,1,-1,1,1,1,1,1,-1,1,-1,-1,-1,1,1,1,1,-1,-1,1,-1,1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,1,1,-1,-1,-1,1,-1,-1,1,1,1,1,-1,-1,1,1,-1,-1,1,1,-1,1,1,-1,1],[-1,1,1,-1,1,-1,-1,1,-1,1,-1,-1,1,-1,1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,-1,1,1,1,1,1,1,1,-1,-1,-1,-1,-1,1],[-1,1,1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,1,1,1,-1,1,1,1,1,1,-1,1,1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,-1,1,-1,1,1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,1,1],[-1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,-1,-1,-1,1,1,-1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,1,-1,1,-1,-1,1,-1,1,1,-1,1,1,1,1,-1,1,1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,1,1,-1,-1]],[[-1,1,1,1,-1,1,1,1,1,-1,-1,-1,-1,1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,-1,1,-1,1,1,-1,-1,1,1,-1,1,1,-1,-1,1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,1,-1,1],[1,1,-1,-1,1,1,1,1,-1,-1,1,-1,1,1,1,-1,-1,1,-1,1,1,1,1,-1,-1,-1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,1,1,1,-1,-1,1,1,1,-1,-1,1,1,1,1,-1,-1,1,1,-1,-1,-1,-1,1,-1,1,1,-1],[-1,-1,-1,-1,-1,1,1,-1,-1,-1,1,-1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,1,1,1,-1,1,1,-1,1,-1,1,-1,1,1,1,-1,-1,1,1,-1,1,1,-1,-1,-1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,1,-1,-1,-1],[1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,1,1,1,1,-1,-1,-1,-1,1,-1,1,1,1,-1,-1,1,1,1,-1,-1,1,1,-1,1,-1,-1,-1,1,-1,1,1,1,1,-1,-1,1,1,1,1,-1,-1,1,-1,-1,1,-1,-1,1,-1,1,1]],[[1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,-1,-1,1,-1,-1,1,1,1,1,-1,1,-1,-1,1,-1,1,-1,1,-1,1,1,1,1,1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,1,1,-1,-1,-1,-1,-1,1,1,-1,-1,-1,-1],[-1,1,-1,1,-1,-1,-1,1,-1,1,-1,-1,1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,-1,1,-1,1,1,1,-1,-1,1,1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1],[1,1,1,-1,-1,-1,-1,1,-1,-1,-1,1,1,1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,1,-1,-1,1,1,1,-1,1,1,1,-1,1,-1,1,1,-1,1,1,1,1,1],[-1,-1,1,-1,1,1,-1,1,1,1,-1,1,1,1,-1,1,1,1,-1,1,1,-1,-1,1,-1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1,1,1,-1,-1,1,1,1,-1,1,1,1,1,1,1,-1,-1,1,1,1,-1]],[[1,1,-1,1,1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,1,1,-1,1,1,-1,1,-1,1,1,-1,-1,-1,1,1,1,-1,-1,1,-1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,-1],[-1,-1,1,1,1,-1,-1,1,1,-1,1,-1,-1,-1,1,-1,1,-1,-1,1,1,-1,1,-1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,-1,-1],[1,1,-1,1,1,1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,1,1,1,1,1,1,-1,1,1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,1,-1,-1,-1],[-1,-1,1,-1,1,-1,-1,1,1,-1,-1,1,-1,-1,1,1,1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,1,1,1,1,1,-1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,-1,1,1,1,1,1,1,1,1,1,1,1,1,1]],[[1,1,1,1,-1,1,-1,1,1,-1,-1,1,1,1,1,1,-1,-1,1,1,1,1,1,1,1,1,-1,1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,1,1,1,1,-1,1,-1,1,1,-1,1,-1,1,1,-1,1,1,-1],[-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,1,1,1,1,-1,-1,1,-1,1,1,-1,1,1,1,1,1,1,1,-1,-1,-1,-1,1,-1,1,1,-1,1,-1,1,1,1,-1,-1,1,1,-1,-1,-1,1,1,-1,1,1,-1,-1,-1,1,-1,-1],[1,-1,1,-1,-1,1,-1,-1,1,1,-1,1,1,1,1,1,1,1,1,-1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,1,-1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,-1,-1,-1,1,1,-1],[1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,-1,1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,1,-1,1,1,-1,1,1,-1,-1,-1]],[[1,1,-1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,-1,-1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,1,-1,-1,1,-1,1,1,-1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,1,1,1,-1,1],[-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,1,1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,1,-1,1,1,1,1,1,1,1,1,1,-1,1,1,-1,-1,1,1,-1,1,-1,-1,1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,-1],[1,-1,-1,1,1,-1,-1,-1,-1,1,-1,1,1,-1,-1,1,1,-1,1,1,-1,1,-1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,-1,-1,1,1,-1,1,1,1,-1,1,1,1,-1,1,1,1,-1,-1,1,-1,1,-1,-1,1,1,-1,-1,1,-1],[1,1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,-1,-1,-1,-1,-1,1,1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1]],[[1,-1,-1,-1,1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,1,-1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,-1,-1,-1,1,-1,1,1,-1,1,1,-1,-1,-1,-1,1,1,1,1,1],[1,-1,-1,1,1,-1,1,1,1,-1,1,1,1,1,1,1,-1,-1,-1,-1,-1,1,1,-1,-1,1,-1,1,-1,1,-1,-1,-1,1,1,1,1,1,1,1,-1,-1,1,-1,1,1,1,1,-1,1,1,1,1,-1,-1,1,-1,1,-1,-1,1,-1,-1,1],[-1,1,-1,1,-1,1,-1,1,-1,1,1,1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,-1,1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,1,-1,1,-1,-1,-1,1,-1,1,1,-1,-1,-1],[1,-1,1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,1,1,1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,1,1,-1,1,-1,1,-1,-1,1,1,1,-1,1,-1,1,1]],[[1,1,-1,-1,-1,1,-1,-1,-1,1,1,1,1,-1,-1,-1,-1,1,1,-1,1,1,-1,1,1,1,-1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,-1,1,1,1,1,1,1,-1,-1,-1,1,1,1,1,1,-1,1,1,-1,-1,1,1,1,1],[1,1,1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,-1,-1,1,1,1,1,1,1,1,1,-1,1,1,-1,1,-1,-1,1,-1,-1,1,1,-1,-1,-1,1,1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,-1,-1,-1,-1,1],[-1,1,-1,-1,1,-1,-1,1,-1,1,-1,1,1,1,1,1,-1,1,-1,1,-1,1,1,-1,-1,1,1,1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,-1,-1,1,-1,-1,1,1,-1,1,1,1,1,1,1,1,1,-1,-1,1,1,1,1,1,1,1],[-1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,1,1,-1,1,1,1,-1,-1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,1,1,-1,-1,1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,1,-1,-1,1,-1]],[[-1,-1,-1,1,1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,-1,-1,-1,-1,1,1,1,1,1,-1,1,-1,-1,1,1,1,1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,1,1,-1,-1,-1,1,1,1],[-1,1,-1,-1,-1,-1,1,-1,-1,-1,1,1,-1,1,1,-1,-1,1,1,-1,1,1,1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,1,1,1,-1,-1,1,1,1,1,1,-1,1,1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,1],[-1,-1,-1,-1,-1,1,1,1,1,-1,-1,1,1,1,1,-1,1,-1,1,-1,-1,-1,1,1,1,1,-1,1,-1,1,-1,1,-1,-1,-1,-1,1,-1,1,-1,1,-1,1,-1,-1,1,-1,-1,1,1,-1,-1,-1,-1,-1,-1,1,1,1,-1,1,1,1,1],[-1,-1,1,-1,1,1,1,-1,-1,-1,1,1,-1,-1,1,1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,1,1,1,-1,-1,1,-1,-1,1,1,1,-1,-1,-1,-1,-1,1,-1,1,1,1,1,1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,-1,1,1]],[[-1,-1,1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,1,1,-1,1,-1,-1,1,-1,1,1,1,1,-1,1,1,-1,-1,-1,1,-1,1,1,-1,1,-1,-1,-1,1,-1,1,1,-1,-1,1,-1,1,1,1,1,-1,-1,1,1,1,-1,1,1,-1,-1],[1,-1,-1,-1,1,1,-1,1,-1,1,-1,-1,-1,-1,1,1,1,1,-1,-1,1,1,1,-1,-1,1,-1,1,1,-1,-1,1,1,1,1,1,-1,1,1,-1,1,1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,1,-1,1,-1,1,-1,-1,-1,1,-1,-1],[-1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,1,-1,-1,1,1,1,1,1,-1,1,1,1,-1,-1,1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,1,1,1,1,1,1,1,1],[-1,-1,1,-1,1,1,1,-1,1,-1,1,1,1,1,1,-1,-1,-1,1,1,1,-1,-1,-1,1,1,1,1,-1,1,1,1,1,1,1,-1,1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,-1,1,1,-1,1,1,1,-1,-1,-1,1,1,1,-1]],[[1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,1,1,-1,-1,-1,1,1,-1,-1,-1,1,-1,1,-1,1,1,-1,1,1,1,-1,1,1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,1,1,1,-1,1,1,1,-1,-1,-1,1,-1,1,-1,-1],[-1,1,1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,-1,1,1,-1,-1,1,-1,1,1,1,-1,-1,1,1,1,-1,1,1,1,1,1,1,-1,1,-1,1,1,-1,-1,1,-1,1,-1,-1,1,1,1,-1,-1,1,1],[1,1,-1,1,1,1,-1,1,-1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,1,-1,1,-1,1,-1,1,1,-1,-1,-1,1,-1,1,-1,-1,1,1,1,1,1,1,-1,-1,1,1,1,1,-1,1,1,-1,1,-1,1,1,1],[-1,-1,1,1,1,-1,-1,1,1,1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,-1,-1,1,1,-1,1,-1,-1,1,-1,1,-1,-1,-1,1,1,1,1,1,1,1,1,-1,1,-1,1,-1,1,-1,-1,1,-1,1,1,1,1,1,1,1,1,1,1,-1]]]::DOUBLE[][][] AS m),
        g0 AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS vec
               FROM embeddings
               WHERE embedding IS NOT NULL
                 AND len(list_filter(embedding, x -> x != 0)) > 0),
        g AS (SELECT did, vec, min(did) OVER (PARTITION BY vec) AS keep
              FROM g0),
        reps AS (SELECT did AS id, vec FROM g WHERE did = keep),
        sigs AS (SELECT r.id, t.t AS tbl,
                        CAST(list_sum(list_transform(range(0, 4),
                          p -> CASE WHEN list_dot_product(
                                 pl.m[t.t + 1][p + 1], r.vec) >= 0
                               THEN (1::BIGINT << p)
                               ELSE 0::BIGINT END)) AS BIGINT) AS bucket
                 FROM reps r, pl,
                      (SELECT unnest(range(0, 12)) AS t) t),
        ok AS (SELECT tbl, bucket FROM sigs
               GROUP BY tbl, bucket HAVING count(*) <= 10000),
        sized AS (SELECT s.* FROM sigs s
                  SEMI JOIN ok ON s.tbl = ok.tbl AND s.bucket = ok.bucket),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM sized a JOIN sized b
                   ON a.tbl = b.tbl AND a.bucket = b.bucket
                  AND a.id < b.id),
        rp AS (SELECT c.id_a, c.id_b,
                      list_cosine_similarity(ra.vec, rb.vec) AS cosine
               FROM cand c JOIN reps ra ON ra.id = c.id_a
                           JOIN reps rb ON rb.id = c.id_b
               WHERE list_cosine_similarity(ra.vec, rb.vec) >= 0.35),
        expd AS (SELECT least(ma.did, mb.did) AS id_a,
                        greatest(ma.did, mb.did) AS id_b, rp.cosine
                 FROM rp JOIN g ma ON ma.keep = rp.id_a
                         JOIN g mb ON mb.keep = rp.id_b),
        star AS (SELECT keep AS id_a, did AS id_b, 1.0 AS cosine
                 FROM g WHERE did != keep),
        u AS (SELECT * FROM expd UNION ALL SELECT * FROM star)
        SELECT id_a, id_b, round(max(cosine), 4) AS cosine
        FROM u GROUP BY id_a, id_b"""),
      doc = "Embedding near-dup pairs via hyperplane-LSH buckets " +
        "(scale path for d05; hash-checked — plan-literal planes " +
        "replayed in SQL)."),

    // ------------------------------------------------------------------
    "d07_cluster_reps" -> QueryDef(
      fn = { (s, dir) =>
        // Dedup end-to-end: pair list -> connected components ->
        // per-doc representative (the keep-set). The pair set here is
        // chosen SQL-expressible (exact-fingerprint star pairs +
        // adjacent-id Jaccard>=0.5 pairs) so DuckDB can recompute the
        // closure with a recursive CTE and hash-check the labels.
        val d = T(s, dir).documents
        val fp = d.select(col("doc_id").as("did"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        val exactPairs = fp.withColumn("keep",
          min(col("did")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
          .filter(col("did") =!= col("keep"))
          .select(col("keep").as("id_a"), col("did").as("id_b"))
        // localCheckpoint for the same double-tokenize reason as d02
        val sets = d.select(col("doc_id"),
          array_distinct(TextFunctions.tokens(col("text"))).as("ts"))
          .localCheckpoint()
        val a = sets.select(col("doc_id").as("id_a"), col("ts").as("set_a"))
        val b = sets.select((col("doc_id") - 1).as("id_a"),
          col("doc_id").as("id_b"), col("ts").as("set_b"))
        val jacPairs = a.join(b, Seq("id_a"))
          .withColumn("n_inter",
            size(array_intersect(col("set_a"), col("set_b"))))
          .filter(col("n_inter").cast("double") /
            (size(col("set_a")) + size(col("set_b")) - col("n_inter"))
              .cast("double") >= 0.5)
          .select("id_a", "id_b")
        val pairs = exactPairs.unionByName(jacPairs).distinct()
        val ids = d.select(col("doc_id").as("id"))
        Dedup.clusterReps(ids, pairs)
      },
      oracle = Some("""
        WITH RECURSIVE
        fps AS (
          SELECT doc_id AS did,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM documents),
        exact_pairs AS (
          SELECT k.id_a, f.did AS id_b
          FROM fps f JOIN (SELECT fp, min(did) AS id_a FROM fps GROUP BY fp) k
            USING (fp)
          WHERE f.did != k.id_a),
        sets AS (
          SELECT doc_id,
                 list_distinct(list_filter(string_split(text, ' '),
                   x -> x != '')) AS ts
          FROM documents),
        jac_pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1
          WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
                CAST(len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
                  AS DOUBLE) >= 0.5),
        pairs AS (SELECT * FROM exact_pairs UNION SELECT * FROM jac_pairs),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)
        SELECT id, min(r) AS rep FROM reach GROUP BY id"""),
      doc = "Dup-cluster representatives: connected components " +
        "(pointer-doubling min-label) over a SQL-expressible pair set."),

    // ------------------------------------------------------------------
    "d08_source_signatures" -> QueryDef(
      fn = { (s, dir) =>
        // Hierarchical dedup surface: per-doc MinHash signatures fold
        // into per-SOURCE signatures with the map-side-combinable
        // MinHashUnion aggregator (signatures form a monoid under
        // element-wise min), then pairwise source-overlap estimates
        // come from signature agreement — corpus-vs-corpus similarity
        // without ever touching doc pairs. At 100 TB: one agg shuffle
        // on source, then a trivially small signature self-join.
        // HASH-CHECKED (round 9): the md5-portable hash family — the
        // oracle recomputes each source signature as the min over all
        // (doc, shingle) permutation hashes, which equals the
        // element-wise-min union by the monoid property; the xxhash64
        // fast path stays spec-pinned in DedupSpec.
        val numHashes = 24
        val d = Engine.widenIfNarrow(T(s, dir).documents)
        val hashed = d.select(col("doc_id").as("id"), col("source"),
          Dedup.MinHashFamily.Md5.shingleHashes(col("text"), 3).as("shset"))
          .localCheckpoint() // consumed by permute-table + postings join
        // per-doc signatures through the distinct-hash permute table
        // (one md5 per DISTINCT shingle hash — vocabulary-bounded,
        // not corpus-linear; the bench's reference detector caught
        // the per-occurrence HOF form at 9.1 s vs 0.8 s committed),
        // then the MinHashUnion monoid folds doc -> source
        val sigs = Dedup
          .md5Signatures(hashed.select(col("id"), col("shset")),
            "id", numHashes)
          .join(hashed.select(col("id"), col("source")), Seq("id"))
        val bySrc = sigs.groupBy(col("source"))
          .agg(graft.functions.MinHashUnion(col("sig"), numHashes).as("sig"))
        val a = bySrc.select(col("source").as("src_a"), col("sig").as("sig_a"))
        val b = bySrc.select(col("source").as("src_b"), col("sig").as("sig_b"))
        a.join(b, col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b"),
            (aggregate(
              zip_with(col("sig_a"), col("sig_b"),
                (x, y) => when(x === y, 1).otherwise(0)),
              lit(0), (acc, v) => acc + v).cast("double") / numHashes)
              .as("est_jaccard"))
      },
      oracle = Some(s"""
        WITH sh AS (
          SELECT did, source, ${OracleSql.hvExpr} AS hv
          FROM (SELECT doc_id AS did, source, ${OracleSql.tsExpr} AS ts
                FROM documents)),
        srch AS (
          SELECT DISTINCT source, h
          FROM (SELECT source, unnest(hv) AS h
                FROM sh WHERE len(hv) > 0)),
        sig AS (
          SELECT source, i.i AS i,
                 min(${graft.functions.PortableHash.sqlPermuteFrom(
                   graft.functions.PortableHash
                     .sqlUniform60("CAST(h AS VARCHAR)"),
                   graft.functions.PortableHash
                     .sqlUniform60Tail("CAST(h AS VARCHAR)"), "i.i")})
                   AS m
          FROM srch, (SELECT unnest(range(0, 24)) AS i) i
          GROUP BY 1, 2),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END)
                   AS BIGINT) AS agree
          FROM sig a JOIN sig b ON a.i = b.i AND a.source < b.source
          GROUP BY 1, 2)
        SELECT src_a, src_b,
               CAST(agree AS DOUBLE) / 24 AS est_jaccard
        FROM pairs"""),
      doc = "Per-source MinHash union signatures + pairwise overlap " +
        "estimate (hierarchical dedup; md5-portable hash family, " +
        "oracle recomputes the union signatures from scratch)."),

    // ------------------------------------------------------------------
    "d09_semantic_dups" -> QueryDef(
      fn = { (s, dir) =>
        // SemDeDup-style semantic dedup: k-means cells + within-cell
        // exact-cosine verification — the data-adaptive sibling of
        // d06's LSH path. HASH-CHECKED (round 9) via oracleGen: the
        // trained centroids are tiny, seeded, and collect-order
        // deterministic, so the Verify-time generator re-trains the
        // SAME frozen centroids and inlines them as SQL literals —
        // DuckDB then replays cell assignment (top-nprobe with the
        // exact tie order), the cell-size cap, candidate join,
        // exact-cosine verification, star pairs and membership
        // expansion. Recall vs the exact d05 pair set additionally
        // asserted in DedupSpec.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Dedup.semanticDupPairs(e, "embedding", "vec_id",
          threshold = 0.35, nlist = 4, nprobe = 2)
          .select(col("id_a"), col("id_b"),
            round(col("cosine"), 4).as("cosine"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // EXACTLY the query's training path: same frames, same
        // canonicalization, same seed -> same collect order -> the
        // same centroids the query trained.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val reps = Dedup.vecGroups(e, "embedding", "vec_id")
          .filter(col("did") === col("keep"))
          .select(col("did").as("id"), col("vec"))
        val cents = Similarity.coarseCentroids(
          reps, "vec", "id", nlist = 4, seed = 42L, maxTrainRows = 100000L)
        val m = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
        s"""
        WITH ct AS (SELECT $m::DOUBLE[][] AS m),
        g0 AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS vec
               FROM embeddings
               WHERE embedding IS NOT NULL
                 AND len(list_filter(embedding, x -> x != 0)) > 0),
        g AS (SELECT did, vec, min(did) OVER (PARTITION BY vec) AS keep
              FROM g0),
        reps AS (SELECT did AS id, vec FROM g WHERE did = keep),
        ascore AS (
          SELECT r.id, c.c AS cell,
                 list_cosine_similarity(ct.m[c.c + 1], r.vec) AS csim
          FROM reps r, ct, (SELECT unnest(range(0, 4)) AS c) c),
        cells AS (
          SELECT id, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore) WHERE rn <= 2),
        ok AS (SELECT cell FROM cells
               GROUP BY cell HAVING count(*) <= 10000),
        sized AS (SELECT c.* FROM cells c
                  SEMI JOIN ok ON c.cell = ok.cell),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM sized a JOIN sized b
                   ON a.cell = b.cell AND a.id < b.id),
        rp AS (SELECT c.id_a, c.id_b,
                      list_cosine_similarity(ra.vec, rb.vec) AS cosine
               FROM cand c JOIN reps ra ON ra.id = c.id_a
                           JOIN reps rb ON rb.id = c.id_b
               WHERE list_cosine_similarity(ra.vec, rb.vec) >= 0.35),
        expd AS (SELECT least(ma.did, mb.did) AS id_a,
                        greatest(ma.did, mb.did) AS id_b, rp.cosine
                 FROM rp JOIN g ma ON ma.keep = rp.id_a
                         JOIN g mb ON mb.keep = rp.id_b),
        star AS (SELECT keep AS id_a, did AS id_b, 1.0 AS cosine
                 FROM g WHERE did != keep),
        u AS (SELECT * FROM expd UNION ALL SELECT * FROM star)
        SELECT id_a, id_b, round(max(cosine), 4) AS cosine
        FROM u GROUP BY id_a, id_b"""
      },
      doc = "Embedding near-dup pairs via k-means cells (SemDeDup " +
        "shape; data-adaptive scale path; hash-checked — trained " +
        "centroids inlined as oracle literals at Verify time)."),

    // ------------------------------------------------------------------
    "d10_incremental_dedup" -> QueryDef(
      fn = { (s, dir) =>
        // The daily-append path: dedup a new batch (doc_id % 5 == 0)
        // against the indexed remainder of the corpus — bucket keys
        // derive from STORED signatures, the batch's buckets
        // broadcast, the corpus side never shuffles and its text is
        // never re-read. HASH-CHECKED (round 9): the md5-portable
        // hash family; the oracle replays BOTH sides' indexes, the
        // band-key candidate join, exact-Jaccard verification, the
        // stored-fingerprint exact leg AND the within-batch
        // nearDupPairs composite. DedupSpec still asserts the
        // xxhash64 fast path equals the full-batch run restricted to
        // batch-touching pairs.
        val d = Engine.widenIfNarrow(T(s, dir).documents)
        val index = Dedup.dedupIndex(
          d.filter(col("doc_id") % 5 =!= 0), "text", "doc_id",
          numHashes = 24, hasher = Dedup.MinHashFamily.Md5)
          .localCheckpoint() // consumed by buckets + verify + fp legs
        Dedup.incrementalNearDups(index,
          d.filter(col("doc_id") % 5 === 0), "text", "doc_id",
          threshold = 0.5, numHashes = 24, bands = 8,
          hasher = Dedup.MinHashFamily.Md5)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 4).as("jaccard"))
      },
      oracle = Some(s"""
        WITH corpus AS (
          SELECT doc_id AS did, text FROM documents WHERE doc_id % 5 <> 0),
        batch AS (
          SELECT doc_id AS did, text FROM documents WHERE doc_id % 5 = 0),
        ${OracleSql.incrementalCrossCtes("x", "corpus", "batch",
          numHashes = 24, bands = 8, threshold = 0.5)},
        ${OracleSql.nearDupPairsCtes("w", "batch",
          numHashes = 24, bands = 8, threshold = 0.5,
          maxBucketSize = 1000)}
        SELECT id_a, id_b, round(max(jaccard), 4) AS jaccard
        FROM (SELECT * FROM x_cross UNION ALL SELECT * FROM w_out)
        GROUP BY id_a, id_b"""),
      doc = "Incremental near-dup detection of an append batch vs a " +
        "persisted corpus index (corpus never re-hashed or shuffled; " +
        "md5-portable hash family, full-pipeline oracle replay)."),

    // ------------------------------------------------------------------
    "s01_topk_bruteforce" -> QueryDef(
      fn = { (s, dir) =>
        // Exact ANN baseline: top-5 neighbors for a deterministic
        // query sample. Ranking on (rounded cosine, id) so both
        // engines order identically.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("id"),
            round(VectorFunctions.cosineSim(col("embedding"), col("qvec")), 4)
              .as("cosine"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
      },
      oracle = Some("""
        WITH scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS id,
                 round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 4) AS cosine
          FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
          WHERE q.vec_id % 50 = 0),
        ranked AS (
          SELECT qid, id, cosine,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cosine DESC, id) AS rank
          FROM scored)
        SELECT qid, id, cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5"""),
      doc = "Brute-force cosine top-5 per sampled query vector."),

    // ------------------------------------------------------------------
    "s02_topk_lsh" -> QueryDef(
      fn = { (s, dir) =>
        // The scale path: hyperplane-LSH bucketed ANN with 1-bit
        // multi-probe. Hash-checked (round 8): the 8x8 +-1
        // hyperplanes are plan-time splitmix64 literals, so the
        // oracle inlines the matrix and replays signatures,
        // multi-probe bit flips, the candidate union and the exact
        // rescore. Recall vs s01 additionally asserted in
        // SimilaritySpec.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Similarity.lshTopK(e, e.filter(col("vec_id") % 50 === 0), k = 5)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = Some("""
        WITH pl AS (SELECT [[[-1,-1,-1,-1,-1,1,-1,1,-1,-1,1,-1,1,1,-1,1,1,-1,-1,-1,1,1,1,1,1,1,1,-1,-1,-1,1,1,-1,-1,1,-1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,1,1,-1,1,1,-1,-1,-1,-1,-1,1,-1,-1],[1,1,1,-1,1,1,-1,1,1,1,-1,1,1,-1,-1,-1,1,1,-1,-1,1,1,1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,-1,1,1,1,1,1,1,-1,-1,1,1,-1,-1,1,-1,1,1,1,1,1,-1,-1,1,-1,-1,1,1,1,1],[-1,1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,1,1,1,-1,-1,-1,1,1,1,1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,-1,1,1,1,-1,-1,1,-1,1,-1,1,-1,-1,1,-1,1,1,1,1,1,-1],[1,-1,1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,1,1,-1,1,1,-1,1,1,-1,1,1,1,1,-1,1,-1,1,-1,1,1,-1,1,-1,1,1,1,-1,-1,1,1],[1,1,1,1,-1,-1,1,-1,-1,1,1,1,1,1,1,1,1,-1,1,1,1,-1,1,-1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,1,1,1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,-1,1],[1,1,1,1,-1,-1,1,1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,-1,-1,-1,1,1,1,1,-1,-1,-1,-1,1,-1,1,1,1,1,-1,-1,1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1],[-1,1,-1,1,-1,-1,1,1,1,-1,-1,1,-1,1,-1,1,-1,-1,-1,1,1,-1,-1,-1,1,-1,1,1,-1,1,1,-1,1,1,-1,1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,1,-1,-1,1,-1,-1,1,1,-1,-1,-1,1,-1,-1,1],[-1,1,-1,1,-1,-1,-1,-1,-1,1,1,1,1,1,-1,-1,-1,1,-1,-1,-1,1,-1,1,-1,-1,-1,1,-1,1,-1,-1,1,1,1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,1,1,-1,-1,-1,-1,1,1,1,-1,1,-1,-1,-1,-1,1,1]],[[1,1,-1,1,1,1,1,1,-1,1,-1,-1,-1,1,1,1,1,-1,-1,1,-1,1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,1,1,-1,-1,-1,1,-1,-1,1,1,1,1,-1,-1,1,1,-1,-1,1,1,-1,1,1,-1,1],[-1,1,1,-1,1,-1,-1,1,-1,1,-1,-1,1,-1,1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,-1,1,1,1,1,1,1,1,-1,-1,-1,-1,-1,1],[-1,1,1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,1,1,1,-1,1,1,1,1,1,-1,1,1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,-1,1,-1,1,1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,1,1],[-1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,-1,-1,-1,1,1,-1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,1,-1,1,-1,-1,1,-1,1,1,-1,1,1,1,1,-1,1,1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,1,1,-1,-1],[1,-1,-1,1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,-1,1,1,-1,1,1,1,1,1,-1,-1,1,1,-1,-1,1,-1,1,1,1,-1,1,-1,1,1,1,-1,1,1,1,-1,-1,1,1,1,1,1,-1,-1,-1,-1,1],[-1,-1,-1,1,1,1,1,1,1,1,1,1,-1,1,1,-1,-1,-1,-1,1,-1,1,-1,-1,1,-1,-1,1,1,-1,-1,-1,-1,-1,1,1,1,-1,-1,-1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,-1,-1,-1,1,1,-1,-1,1],[1,1,1,-1,1,1,-1,-1,-1,1,1,-1,1,1,1,1,1,1,-1,1,1,-1,-1,-1,1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,-1,1,1,1,-1,-1,-1,-1,1,1,1,1,-1,-1,1,-1,1,1,1,1,-1,-1,-1,-1,-1,-1],[-1,1,1,-1,1,1,1,1,1,-1,1,-1,1,1,1,1,1,-1,1,-1,1,-1,1,-1,1,-1,-1,1,-1,1,1,-1,-1,-1,1,-1,1,1,1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,1,1,-1,1,1,-1,1,-1,-1,1,-1,1,-1,-1]],[[-1,1,1,1,-1,1,1,1,1,-1,-1,-1,-1,1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,-1,1,-1,1,1,-1,-1,1,1,-1,1,1,-1,-1,1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,1,-1,1],[1,1,-1,-1,1,1,1,1,-1,-1,1,-1,1,1,1,-1,-1,1,-1,1,1,1,1,-1,-1,-1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,1,1,1,-1,-1,1,1,1,-1,-1,1,1,1,1,-1,-1,1,1,-1,-1,-1,-1,1,-1,1,1,-1],[-1,-1,-1,-1,-1,1,1,-1,-1,-1,1,-1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,1,1,1,-1,1,1,-1,1,-1,1,-1,1,1,1,-1,-1,1,1,-1,1,1,-1,-1,-1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,1,-1,-1,-1],[1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,1,1,1,1,-1,-1,-1,-1,1,-1,1,1,1,-1,-1,1,1,1,-1,-1,1,1,-1,1,-1,-1,-1,1,-1,1,1,1,1,-1,-1,1,1,1,1,-1,-1,1,-1,-1,1,-1,-1,1,-1,1,1],[-1,-1,-1,-1,-1,-1,1,1,1,1,1,1,1,-1,-1,-1,1,1,1,-1,-1,1,1,1,-1,-1,1,-1,1,-1,1,1,1,-1,1,1,1,-1,1,-1,-1,-1,1,-1,1,1,1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,1,-1,-1,1,1],[1,-1,-1,1,1,1,1,-1,-1,-1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,-1,1,-1,-1,1,1,1,1,1,1,-1,1,-1,1,1,-1,1,-1,-1,-1,1,1,1,-1,1,-1,1,1,-1,1,-1,1,1,1,1,-1,1,-1,1,-1,-1,1,-1],[-1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,1,1,-1,-1,-1,-1,-1,1,1,1,-1,1,1,-1,1,1,1,1,1,1,1,-1,1,1,-1,-1,1,1,1,1,-1,1,1,1,1,1,-1,-1,1,-1,-1,-1,-1],[1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,-1,1,-1,1,-1,1,-1,1,1,1,-1,1,-1,1,-1,-1,1,1,1,-1,1,1,1,-1,-1,1,-1,1,-1,1,1,-1,-1,1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,1,-1,1,-1,1,1]],[[1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,-1,-1,1,-1,-1,1,1,1,1,-1,1,-1,-1,1,-1,1,-1,1,-1,1,1,1,1,1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,1,1,-1,-1,-1,-1,-1,1,1,-1,-1,-1,-1],[-1,1,-1,1,-1,-1,-1,1,-1,1,-1,-1,1,1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,-1,1,-1,1,1,1,-1,-1,1,1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1],[1,1,1,-1,-1,-1,-1,1,-1,-1,-1,1,1,1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,1,-1,-1,1,1,1,-1,1,1,1,-1,1,-1,1,1,-1,1,1,1,1,1],[-1,-1,1,-1,1,1,-1,1,1,1,-1,1,1,1,-1,1,1,1,-1,1,1,-1,-1,1,-1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1,1,1,-1,-1,1,1,1,-1,1,1,1,1,1,1,-1,-1,1,1,1,-1],[1,1,1,-1,1,1,-1,1,-1,-1,-1,1,-1,-1,-1,1,-1,1,-1,1,-1,-1,1,1,-1,-1,-1,-1,1,-1,-1,-1,1,1,1,-1,1,1,1,1,1,-1,-1,-1,-1,1,-1,1,1,1,-1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,-1,1],[-1,1,-1,1,1,-1,1,1,-1,-1,1,-1,1,1,1,1,1,-1,-1,-1,1,-1,-1,-1,1,1,1,1,1,-1,-1,1,-1,-1,-1,1,1,1,1,-1,-1,-1,1,1,-1,1,1,-1,1,-1,1,1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,1],[1,-1,-1,-1,-1,1,-1,-1,-1,1,1,1,1,-1,-1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,-1,1,1,1,1,-1,-1,1,-1,-1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,1,1,1,1,-1,1,1],[-1,1,1,-1,1,1,-1,-1,-1,-1,-1,-1,1,1,1,-1,1,1,-1,1,1,1,-1,-1,1,-1,1,-1,-1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,1,-1,-1,1,1,-1,1,1,1,1,1,-1,-1,-1,-1,1,1,1,-1,1,-1]],[[1,1,-1,1,1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,1,1,-1,1,1,-1,1,-1,1,1,-1,-1,-1,1,1,1,-1,-1,1,-1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,-1],[-1,-1,1,1,1,-1,-1,1,1,-1,1,-1,-1,-1,1,-1,1,-1,-1,1,1,-1,1,-1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,-1,-1],[1,1,-1,1,1,1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,1,1,1,1,1,1,-1,1,1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,1,-1,-1,-1],[-1,-1,1,-1,1,-1,-1,1,1,-1,-1,1,-1,-1,1,1,1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,1,1,1,1,1,-1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,-1,1,1,1,1,1,1,1,1,1,1,1,1,1],[1,1,1,1,1,1,-1,1,1,1,1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,1,-1,1,-1,-1,-1,-1,-1,-1,1,1,1,-1,-1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,1,1,1,-1,-1,1,-1,1,-1,1,-1],[-1,1,-1,1,1,1,1,-1,-1,1,1,-1,-1,1,-1,-1,-1,1,-1,1,1,1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,1,1,1,1,-1,-1,-1,1,-1,-1,1,-1,1,-1,1,1,1,-1,-1,-1,1,1,-1,1,1,-1,-1],[-1,1,1,-1,-1,1,1,1,1,-1,1,-1,1,1,-1,1,-1,1,-1,-1,1,1,-1,-1,1,1,1,1,-1,-1,1,1,1,1,-1,1,1,1,-1,1,-1,1,1,1,1,1,1,-1,1,-1,-1,1,1,1,1,1,1,1,1,-1,-1,-1,1,-1],[-1,1,1,-1,1,1,-1,-1,1,1,1,-1,-1,-1,-1,1,1,1,1,1,1,-1,-1,1,-1,1,1,-1,-1,1,1,-1,1,-1,1,-1,-1,1,1,1,-1,-1,-1,1,-1,1,1,1,-1,1,-1,1,-1,1,1,1,1,-1,-1,1,-1,-1,-1,-1]],[[1,1,1,1,-1,1,-1,1,1,-1,-1,1,1,1,1,1,-1,-1,1,1,1,1,1,1,1,1,-1,1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,1,1,1,1,-1,1,-1,1,1,-1,1,-1,1,1,-1,1,1,-1],[-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,1,1,1,1,-1,-1,1,-1,1,1,-1,1,1,1,1,1,1,1,-1,-1,-1,-1,1,-1,1,1,-1,1,-1,1,1,1,-1,-1,1,1,-1,-1,-1,1,1,-1,1,1,-1,-1,-1,1,-1,-1],[1,-1,1,-1,-1,1,-1,-1,1,1,-1,1,1,1,1,1,1,1,1,-1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,1,-1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,-1,-1,-1,1,1,-1],[1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,-1,1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,1,-1,1,1,-1,1,1,-1,-1,-1],[1,1,-1,1,-1,1,1,-1,1,-1,1,1,-1,1,1,1,1,-1,-1,1,1,1,1,1,-1,1,1,1,1,-1,1,-1,-1,1,-1,1,1,1,-1,1,-1,-1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,1,-1,-1,1,-1,-1,-1,1,-1,1,-1],[1,1,-1,1,1,-1,-1,1,-1,1,-1,1,1,-1,-1,1,-1,-1,1,1,-1,1,-1,1,-1,-1,1,-1,-1,1,1,1,1,1,1,1,-1,1,1,1,1,-1,1,1,-1,-1,-1,-1,-1,-1,-1,1,1,-1,1,-1,-1,1,1,1,1,-1,1,-1],[1,1,-1,-1,1,1,1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,-1,1,-1,1,-1,-1,1,1,1,1,1,-1,1,1,-1,1,1,-1,-1,-1,1,1,1,-1,1,1,-1,1,1,1,1,1,-1,1,1,-1,1,1],[1,-1,1,-1,-1,-1,1,1,1,-1,1,-1,-1,-1,1,-1,1,1,-1,1,1,1,-1,-1,1,1,-1,-1,1,-1,1,1,1,-1,-1,1,1,1,-1,-1,-1,-1,-1,1,1,-1,1,1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,1]],[[1,1,-1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,-1,-1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,1,-1,-1,1,-1,1,1,-1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,1,1,1,-1,1],[-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,1,1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,1,-1,1,1,1,1,1,1,1,1,1,-1,1,1,-1,-1,1,1,-1,1,-1,-1,1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,-1],[1,-1,-1,1,1,-1,-1,-1,-1,1,-1,1,1,-1,-1,1,1,-1,1,1,-1,1,-1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,-1,-1,1,1,-1,1,1,1,-1,1,1,1,-1,1,1,1,-1,-1,1,-1,1,-1,-1,1,1,-1,-1,1,-1],[1,1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,-1,-1,-1,-1,-1,1,1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1],[1,-1,-1,-1,1,1,-1,1,1,-1,1,1,1,1,-1,-1,1,1,-1,-1,1,1,1,1,-1,-1,1,1,-1,-1,1,1,1,1,-1,1,-1,-1,-1,-1,1,-1,1,1,-1,1,-1,1,-1,1,-1,-1,-1,1,1,1,-1,1,1,1,-1,-1,-1,-1],[-1,-1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,1,-1,-1,1,1,1,-1,-1,-1,1,-1,1,-1,1,-1,1,1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,1,1,-1,-1,-1,-1,-1,-1,1,-1,1,1,1,1,1,1,-1,-1],[1,-1,1,1,-1,1,1,1,-1,-1,1,1,-1,-1,1,1,1,-1,-1,-1,-1,1,-1,-1,1,1,-1,-1,1,1,1,1,1,1,1,1,1,1,1,-1,-1,-1,-1,1,1,1,-1,-1,-1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,1,-1,-1,-1],[-1,-1,1,-1,1,-1,1,-1,1,-1,1,1,1,1,1,1,-1,1,1,1,-1,-1,-1,-1,1,1,-1,1,-1,-1,-1,1,1,-1,-1,1,-1,1,-1,1,1,-1,-1,-1,1,-1,1,-1,-1,1,-1,1,-1,-1,-1,1,-1,-1,-1,1,1,-1,-1,-1]],[[1,-1,-1,-1,1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,-1,1,1,-1,1,-1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,-1,-1,-1,1,-1,1,1,-1,1,1,-1,-1,-1,-1,1,1,1,1,1],[1,-1,-1,1,1,-1,1,1,1,-1,1,1,1,1,1,1,-1,-1,-1,-1,-1,1,1,-1,-1,1,-1,1,-1,1,-1,-1,-1,1,1,1,1,1,1,1,-1,-1,1,-1,1,1,1,1,-1,1,1,1,1,-1,-1,1,-1,1,-1,-1,1,-1,-1,1],[-1,1,-1,1,-1,1,-1,1,-1,1,1,1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,-1,1,1,-1,1,1,-1,1,1,-1,-1,-1,1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,1,-1,1,-1,-1,-1,1,-1,1,1,-1,-1,-1],[1,-1,1,1,-1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,1,1,1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,1,1,-1,1,-1,1,-1,-1,1,1,1,-1,1,-1,1,1],[1,-1,-1,-1,-1,-1,1,1,-1,1,-1,-1,1,-1,1,1,1,1,1,1,-1,1,-1,1,-1,-1,-1,1,1,1,-1,-1,-1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,1,-1,1,-1,1,1,1,-1,1,-1,1,-1,-1,-1,1,1,-1,1,-1,-1],[-1,1,-1,-1,1,1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,1,-1,1,-1,-1,-1,1,1,-1,1,-1,-1,1,1,1,1,-1,1,-1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,1,1,1,1,1,1,1,1,-1,-1,1,1,-1,1,-1,1,1,1,-1],[1,1,-1,1,1,1,1,-1,1,-1,-1,1,-1,1,1,1,-1,1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1,1,1,-1,-1,1,-1,1,1,-1,-1,-1,1,-1,-1,1,1,1,1,-1,-1,-1,1,-1,1,1,1,-1,1,1,-1,1,-1,-1,-1,1],[1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,1,1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,-1,1,-1,-1,1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1,1,1,1,1]]]::DOUBLE[][][] AS m),
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
              FROM embeddings),
        sig AS (SELECT v.id, t.t AS tbl,
                       CAST(list_sum(list_transform(range(0, 8),
                         p -> CASE WHEN list_dot_product(
                                pl.m[t.t + 1][p + 1], v.vec) >= 0
                              THEN (1::BIGINT << p)
                              ELSE 0::BIGINT END)) AS BIGINT) AS bucket
                FROM v, pl, (SELECT unnest(range(0, 8)) AS t) t),
        qs AS (SELECT id AS qid, tbl, bucket FROM sig WHERE id % 50 = 0),
        probes AS (SELECT qid, tbl, bucket FROM qs
                   UNION
                   SELECT qid, tbl,
                          CAST(xor(bucket, 1::BIGINT << b.b) AS BIGINT)
                   FROM qs, (SELECT unnest(range(0, 8)) AS b) b),
        cand AS (SELECT DISTINCT p.qid, s.id
                 FROM probes p
                 JOIN sig s ON s.tbl = p.tbl AND s.bucket = p.bucket
                 WHERE s.id != p.qid),
        scored AS (SELECT c.qid, c.id,
                          list_cosine_similarity(cv.vec, qv.vec) AS cosine
                   FROM cand c JOIN v cv ON cv.id = c.id
                               JOIN v qv ON qv.id = c.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""),
      doc = "LSH-bucketed ANN top-5 with multi-probe (hash-checked " +
        "— plan-literal planes replayed in SQL)."),

    // ------------------------------------------------------------------
    "s03_topk_ivf" -> QueryDef(
      fn = { (s, dir) =>
        // IVF variant: k-means coarse quantizer + nprobe cell scan.
        // HASH-CHECKED (round 9) via oracleGen: the 16x64 trained
        // centroids inline as SQL literals, so DuckDB replays corpus
        // cell assignment (argmax with the exact (csim, -cell) tie
        // order), query probing (top-3 cells), the cell join and the
        // exact-cosine ranking. Recall vs s01 stays asserted in
        // SimilaritySpec.
        val e = T(s, dir).embeddings
        Similarity.ivfTopK(e, e.filter(col("vec_id") % 50 === 0),
          k = 5, nlist = 16, nprobe = 3)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // ivfTopK's exact training call: same frame, same defaults
        // (seed 42, maxTrainRows 100000) -> the same centroids.
        val e = T(s, dir).embeddings
        val cents = Similarity.coarseCentroids(
          e, "embedding", "vec_id", nlist = 16, seed = 42L,
          maxTrainRows = 100000L)
        val m = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
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
            FROM ascore) WHERE rn = 1),
        probed AS (
          SELECT id AS qid, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore WHERE id % 50 = 0) WHERE rn <= 3),
        scored AS (
          SELECT DISTINCT p.qid, c.id,
                 list_cosine_similarity(cv.vec, qv.vec) AS cosine
          FROM probed p
            JOIN cells c ON c.cell = p.cell AND c.id != p.qid
            JOIN v cv ON cv.id = c.id
            JOIN v qv ON qv.id = p.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "IVF (k-means cells, nprobe=3) ANN top-5 (hash-checked " +
        "— trained centroids inlined as oracle literals at Verify " +
        "time)."),

    // ------------------------------------------------------------------
    "s04_semantic_filter" -> QueryDef(
      fn = { (s, dir) =>
        // Semantic curation filter: keep vectors cosine-similar to a
        // reference probe (vec_id 1). The probe is a 1-row broadcast
        // — at 100 TB the corpus is scanned once, the similarity is a
        // fused codegen expression, and nothing shuffles (the plan is
        // scan -> broadcast NLJ(1 row) -> project/filter).
        val e = T(s, dir).embeddings
        val probe = e.filter(col("vec_id") === 1)
          .select(col("embedding").as("probe"))
        e.crossJoin(broadcast(probe))
          .filter(col("vec_id") =!= 1)
          .select(col("vec_id"),
            round(VectorFunctions.cosineSim(col("embedding"), col("probe")), 4)
              .as("sim"))
          .filter(col("sim") >= 0.15)
      },
      oracle = Some("""
        SELECT vec_id,
               round(list_cosine_similarity(
                 CAST(embedding AS DOUBLE[]),
                 (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                  WHERE vec_id = 1)), 4) AS sim
        FROM embeddings
        WHERE vec_id != 1
          AND round(list_cosine_similarity(
                CAST(embedding AS DOUBLE[]),
                (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                 WHERE vec_id = 1)), 4) >= 0.15"""),
      doc = "Semantic filter vs a probe vector (1-row broadcast, " +
        "single corpus scan, no shuffle)."),

    // ------------------------------------------------------------------
    "s05_topk_quantized" -> QueryDef(
      fn = { (s, dir) =>
        // Memory-bandwidth ANN path: int8 scalar-quantized candidate
        // scan (4x fewer bytes than float32) + full-precision rescore
        // of the top k*refine. Hash-checked (round 8): the
        // quantization is fully deterministic — global max-|x| scale,
        // round-half-away int8 cells (identical in both engines), and
        // the quantized cosine is integer dot / sqrt(int)*sqrt(int),
        // bitwise-reproducible — so DuckDB replays the coarse ranking
        // AND the exact rescore. Recall + exact-rescore equality
        // additionally asserted in SimilaritySpec.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Similarity.quantizedTopK(e, e.filter(col("vec_id") % 50 === 0),
          k = 5, refine = 4)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = Some("""
        WITH sc AS (SELECT max(list_max(list_transform(
                      CAST(embedding AS DOUBLE[]), x -> abs(x)))) AS s
                    FROM embeddings),
        cq AS (SELECT e.vec_id AS id,
                      list_transform(CAST(e.embedding AS DOUBLE[]),
                        x -> CAST(CAST(least(greatest(
                            round(x / sc.s * 127), -127), 127)
                          AS TINYINT) AS DOUBLE)) AS v
               FROM embeddings e, sc),
        qq AS (SELECT id AS qid, v AS qv FROM cq WHERE id % 50 = 0),
        cand AS (SELECT qid, id FROM (
                   SELECT q.qid, c.id,
                          row_number() OVER (PARTITION BY q.qid
                            ORDER BY list_cosine_similarity(c.v, q.qv)
                              DESC, c.id) AS rn
                   FROM qq q JOIN cq c ON c.id != q.qid)
                 WHERE rn <= 20),
        scored AS (SELECT cand.qid, cand.id,
                          list_cosine_similarity(
                            CAST(ce.embedding AS DOUBLE[]),
                            CAST(qe.embedding AS DOUBLE[])) AS cosine
                   FROM cand
                   JOIN embeddings ce ON ce.vec_id = cand.id
                   JOIN embeddings qe ON qe.vec_id = cand.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""),
      doc = "Int8-quantized ANN top-5 with exact rescore (4x scan " +
        "bytes reduction; hash-checked — deterministic quantization " +
        "replayed in SQL)."),

    // ------------------------------------------------------------------
    "s07_topk_pq" -> QueryDef(
      fn = { (s, dir) =>
        // Product-quantization ANN (Jégou et al. ADC): 8-byte codes
        // (32x scan-byte reduction), per-query lookup tables, m array
        // reads per pair, exact rescore of top k*refine.
        // HASH-CHECKED (round 9) via oracleGen: the 16x16x4 trained
        // codebook (and the Scala-computed |c|^2/2 offsets) inline as
        // SQL literals; DuckDB replays unitization, per-subspace
        // argmax encoding with the exact tie order, the ADC
        // lookup-table sum in the same left-fold order, the
        // candidate cut and the exact rescore. Recall +
        // exact-rescore stay pinned in SimilaritySpec.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Similarity.pqTopK(e, e.filter(col("vec_id") % 50 === 0),
          k = 5, m = 16, refine = 8)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // pqTopK's exact training call (same frame, m=16, ksub=16,
        // seed 42, maxTrainRows 20000) -> the same codebook; the
        // half-norm offsets replicate encodeExpr's Scala expression.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val cb = Similarity.pqCodebook(e, m = 16, ksub = 16,
          seed = 42L, maxTrainRows = 20000L)
        val halfs = cb.map(_.map(c => c.map(x => x * x).sum / 2.0).toSeq)
        val mLit = OracleSql.sqlDoubleArr3(
          cb.map(_.map(_.toSeq).toSeq).toSeq)
        val hLit = OracleSql.sqlDoubleArr2(halfs.toSeq)
        s"""
        WITH cb AS (SELECT $mLit::DOUBLE[][][] AS m),
        hb AS (SELECT $hLit::DOUBLE[][] AS h),
        u1 AS (SELECT vec_id AS id, dv,
                      sqrt(list_dot_product(dv, dv)) AS nrm
               FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
                     FROM embeddings)),
        u AS (SELECT id, list_transform(dv, x -> x / nrm) AS uv
              FROM u1 WHERE nrm > 0),
        qu AS (SELECT id AS qid, uv FROM u WHERE id % 50 = 0),
        subsc AS (
          SELECT u.id, s.s AS sub, i.i AS i,
                 list_dot_product(
                   list_slice(u.uv, s.s * 4 + 1, s.s * 4 + 4),
                   cb.m[s.s + 1][i.i + 1]) - hb.h[s.s + 1][i.i + 1]
                   AS score
          FROM u, cb, hb,
               (SELECT unnest(range(0, 16)) AS s) s,
               (SELECT unnest(range(0, 16)) AS i) i),
        enc AS (
          SELECT id, sub, i FROM (
            SELECT id, sub, i, row_number() OVER (PARTITION BY id, sub
                     ORDER BY score DESC, i) AS rn
            FROM subsc) WHERE rn = 1),
        codes AS (
          SELECT id, list(i ORDER BY sub) AS codes FROM enc GROUP BY id),
        approx AS (
          SELECT q.qid, c.id,
                 list_sum(list_transform(range(0, 16), sub ->
                   list_dot_product(
                     list_slice(q.uv, sub * 4 + 1, sub * 4 + 4),
                     cb.m[sub + 1][c.codes[sub + 1] + 1]))) AS adot
          FROM codes c, qu q, cb
          WHERE c.id != q.qid),
        cand AS (
          SELECT qid, id FROM (
            SELECT qid, id, row_number() OVER (PARTITION BY qid
                     ORDER BY adot DESC, id) AS qrank
            FROM approx) WHERE qrank <= 40),
        scored AS (
          SELECT cand.qid, cand.id,
                 list_cosine_similarity(
                   CAST(ce.embedding AS DOUBLE[]),
                   CAST(qe.embedding AS DOUBLE[])) AS cosine
          FROM cand
          JOIN embeddings ce ON ce.vec_id = cand.id
          JOIN embeddings qe ON qe.vec_id = cand.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "Product-quantization ANN top-5 (ADC lookup-table scan, " +
        "32x scan bytes reduction; hash-checked — trained codebook " +
        "inlined as oracle literals at Verify time)."),

    // ------------------------------------------------------------------
    "s14_topk_ivfpq" -> QueryDef(
      fn = { (s, dir) =>
        // IVF x PQ — the billion-vector composition (FAISS IVFADC):
        // coarse cells prune WHICH vectors each query meets (s03's
        // quantizer), PQ codes shrink the COST of meeting one (s07's
        // ADC scan), and the exact rescore touches only k*refine full
        // vectors. Corpus side is ONE zero-shuffle map pass (cell
        // argmax + encoding from plan literals — the persisted index
        // layout); the ADC scan's input is the probed-cell broadcast
        // HASH join, never a corpus cross join (plan-asserted).
        // Hash-checked via oracleGen: centroids AND codebook re-train
        // at Verify time and inline as SQL literals, so DuckDB
        // replays cell assignment (exact (csim desc, cell) ties),
        // probing, per-subspace argmax encoding, the ADC sum, the
        // candidate cut and the exact rescore.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Similarity.ivfPqTopK(e, e.filter(col("vec_id") % 50 === 0),
          k = 5, nlist = 16, nprobe = 3, m = 16, refine = 8)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // ivfPqTopK's exact training calls: coarseCentroids with
        // s03's defaults (nlist 16, seed 42, maxTrainRows 100000),
        // pqCodebook with s07's (m 16, ksub 16, seed 42, 20000).
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val cents = Similarity.coarseCentroids(
          e, "embedding", "vec_id", nlist = 16, seed = 42L,
          maxTrainRows = 100000L)
        val cLit = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
        val cb = Similarity.pqCodebook(e, m = 16, ksub = 16,
          seed = 42L, maxTrainRows = 20000L)
        val halfs = cb.map(_.map(c => c.map(x => x * x).sum / 2.0).toSeq)
        val mLit = OracleSql.sqlDoubleArr3(
          cb.map(_.map(_.toSeq).toSeq).toSeq)
        val hLit = OracleSql.sqlDoubleArr2(halfs.toSeq)
        s"""
        WITH ct AS (SELECT $cLit::DOUBLE[][] AS m),
        cb AS (SELECT $mLit::DOUBLE[][][] AS m),
        hb AS (SELECT $hLit::DOUBLE[][] AS h),
        u1 AS (SELECT vec_id AS id, dv,
                      sqrt(list_dot_product(dv, dv)) AS nrm
               FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
                     FROM embeddings)),
        u AS (SELECT id, dv, list_transform(dv, x -> x / nrm) AS uv
              FROM u1 WHERE nrm > 0),
        ascore AS (
          SELECT u.id, c.c AS cell,
                 list_cosine_similarity(ct.m[c.c + 1], u.dv) AS csim
          FROM u, ct, (SELECT unnest(range(0, 16)) AS c) c),
        cells AS (
          SELECT id, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore) WHERE rn = 1),
        probed AS (
          SELECT id AS qid, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore WHERE id % 50 = 0) WHERE rn <= 3),
        subsc AS (
          SELECT u.id, s.s AS sub, i.i AS i,
                 list_dot_product(
                   list_slice(u.uv, s.s * 4 + 1, s.s * 4 + 4),
                   cb.m[s.s + 1][i.i + 1]) - hb.h[s.s + 1][i.i + 1]
                   AS score
          FROM u, cb, hb,
               (SELECT unnest(range(0, 16)) AS s) s,
               (SELECT unnest(range(0, 16)) AS i) i),
        enc AS (
          SELECT id, sub, i FROM (
            SELECT id, sub, i, row_number() OVER (PARTITION BY id, sub
                     ORDER BY score DESC, i) AS rn
            FROM subsc) WHERE rn = 1),
        codes AS (
          SELECT id, list(i ORDER BY sub) AS codes FROM enc GROUP BY id),
        approx AS (
          SELECT p.qid, c.id,
                 list_sum(list_transform(range(0, 16), sub ->
                   list_dot_product(
                     list_slice(q.uv, sub * 4 + 1, sub * 4 + 4),
                     cb.m[sub + 1][c.codes[sub + 1] + 1]))) AS adot
          FROM probed p
            JOIN cells cl ON cl.cell = p.cell
            JOIN codes c ON c.id = cl.id AND c.id != p.qid
            JOIN u q ON q.id = p.qid, cb),
        cand AS (
          SELECT qid, id FROM (
            SELECT qid, id, row_number() OVER (PARTITION BY qid
                     ORDER BY adot DESC, id) AS qrank
            FROM approx) WHERE qrank <= 40),
        scored AS (
          SELECT cand.qid, cand.id,
                 list_cosine_similarity(
                   CAST(ce.embedding AS DOUBLE[]),
                   CAST(qe.embedding AS DOUBLE[])) AS cosine
          FROM cand
          JOIN embeddings ce ON ce.vec_id = cand.id
          JOIN embeddings qe ON qe.vec_id = cand.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "IVF x PQ composition (probe coarse cells, ADC-scan only " +
        "their codes, exact rescore) — the billion-vector ANN shape; " +
        "hash-checked with centroids + codebook as regenerated " +
        "oracle literals."),

    // ------------------------------------------------------------------
    "s08_topk_mmr" -> QueryDef(
      fn = { (s, dir) =>
        // MMR diversified top-5: greedy lambda*rel - (1-lambda)*maxSim
        // rerank over the exact top-20 candidate slice per query.
        // Hash-checked (round 8): the greedy loop IS SQL-expressible
        // as a recursive CTE — each step LATERAL-picks the argmax of
        // 0.7*rel - 0.3*max(0, maxSim-over-selected) with the
        // engine's exact tie order (score desc, rel desc, id). The
        // maxSim clamp at 0 mirrors the operator's maxSim array
        // initialized to 0.0 and only ever raised — negative
        // similarities earn no diversity bonus. Diversity +
        // determinism additionally pinned in SimilaritySpec.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Similarity.mmrTopK(e, e.filter(col("vec_id") % 50 === 0),
          k = 5, fetch = 4, lambda = 0.7)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = Some("""
        WITH RECURSIVE
        q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id % 50 = 0),
        c0 AS (SELECT q.qid, e.vec_id AS id,
                      list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]), q.qv) AS rel
               FROM q JOIN embeddings e ON e.vec_id != q.qid),
        cand AS (SELECT qid, id, rel FROM (
                   SELECT qid, id, rel,
                          row_number() OVER (PARTITION BY qid
                            ORDER BY rel DESC, id) AS rn
                   FROM c0) WHERE rn <= 20),
        ps AS (SELECT a.qid, a.id AS id_a, b.id AS id_b,
                      list_cosine_similarity(
                        CAST(ea.embedding AS DOUBLE[]),
                        CAST(eb.embedding AS DOUBLE[])) AS sim
               FROM cand a JOIN cand b
                 ON a.qid = b.qid AND a.id != b.id
               JOIN embeddings ea ON ea.vec_id = a.id
               JOIN embeddings eb ON eb.vec_id = b.id),
        sel AS (
          SELECT qid, [id] AS ids, 1 AS r FROM (
            SELECT qid, id, row_number() OVER (PARTITION BY qid
              ORDER BY rel DESC, id) AS rn FROM cand) WHERE rn = 1
          UNION ALL
          SELECT s.qid, list_append(s.ids, pick.id), s.r + 1
          FROM sel s, LATERAL (
            SELECT c.id
            FROM cand c
            WHERE c.qid = s.qid AND NOT list_contains(s.ids, c.id)
            ORDER BY 0.7 * c.rel - 0.3 * greatest(coalesce((
                SELECT max(p.sim) FROM ps p
                WHERE p.qid = s.qid AND p.id_a = c.id
                  AND list_contains(s.ids, p.id_b)), 0.0), 0.0) DESC,
              c.rel DESC, c.id
            LIMIT 1) pick
          WHERE s.r < 5),
        fin AS (SELECT qid, ids FROM sel WHERE r = 5)
        SELECT f.qid AS qid, c.id AS id, round(c.rel, 4) AS cosine,
               CAST(list_position(f.ids, c.id) AS INT) AS rank
        FROM fin f JOIN cand c
          ON c.qid = f.qid AND list_contains(f.ids, c.id)"""),
      doc = "MMR diversified ANN top-5 (bounded greedy rerank per " +
        "query over the top-20 slice; hash-checked via a " +
        "recursive-CTE replay of the greedy selection)."),

    // ------------------------------------------------------------------
    "s09_topk_randproj" -> QueryDef(
      fn = { (s, dir) =>
        // Johnson-Lindenstrauss two-stage ANN: coarse scan in a
        // 16-dim +-1-projection sketch (4x cheaper per comparison),
        // top-20 shortlist per query, exact rescore in 64-dim.
        // Hash-checked (round 8): the planes are PLAN-TIME LITERALS
        // (splitmix64 of (seed, plane, dim) — pure integer
        // arithmetic), so the oracle inlines the same 16x64 +-1
        // matrix and replays both stages; a seed/projDim change
        // breaks the compare loudly. Recall is pinned in
        // SimilaritySpec on
        // PLANTED clusters: this fixture's neighbors sit ~0.03
        // cosine above bulk, which no fixed-dim sketch separates —
        // a sketch preserves separations that exist; `oversample`
        // is the recall lever on weakly-separated corpora.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Similarity.randProjTopK(e, e.filter(col("vec_id") % 50 === 0),
          k = 5, projDim = 16, oversample = 4)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = Some(s"""
        WITH pl AS (SELECT [
          [1,-1,1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,-1,-1,-1,1,-1,1,1,-1,-1,-1,1,-1,-1,1,1,1,-1,1,1,-1,-1,1,-1,-1,1,-1,-1,1,1,1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,-1,-1,1],
          [1,1,1,1,1,-1,1,1,1,-1,-1,1,1,-1,-1,-1,-1,1,1,-1,-1,1,-1,1,1,-1,1,1,-1,1,1,-1,-1,-1,1,1,1,1,1,-1,1,1,-1,-1,-1,-1,1,1,1,1,-1,-1,1,-1,1,1,-1,1,1,-1,-1,-1,-1,-1],
          [1,-1,-1,1,-1,1,1,1,-1,1,1,1,-1,-1,-1,1,1,1,1,1,-1,1,-1,-1,-1,-1,-1,1,1,1,-1,1,1,-1,-1,-1,1,1,1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,-1,1,1,1,1,-1,-1,-1,1,1,-1,-1,1],
          [-1,-1,-1,1,1,-1,-1,-1,1,1,1,1,-1,-1,1,-1,-1,-1,-1,1,-1,1,-1,-1,1,1,1,1,-1,1,-1,-1,1,1,1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1,-1,1,1,1,1,1,-1,1,1,-1,-1,-1,1,1,-1],
          [-1,1,-1,1,-1,1,1,-1,-1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,-1,1,1,1,1,-1,-1,-1,1,-1,-1,-1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,1,1,-1,1,1,-1,1,1,1,1,-1,1,-1,1,1,-1],
          [-1,1,1,1,-1,-1,1,-1,-1,1,-1,1,-1,-1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,-1,-1,-1,1,-1,1,1,1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,1,1,-1,1,1,-1,-1,1,1,-1,1,1,1,1,-1,-1,-1,-1],
          [-1,-1,1,-1,-1,1,1,1,1,1,1,-1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,-1,1,1,1,-1,1,1,1,1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1,1,-1],
          [-1,-1,1,1,1,1,1,1,-1,1,-1,-1,-1,1,-1,1,1,1,1,-1,1,1,-1,1,1,1,-1,-1,-1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,1,1,1,1,1,-1,1,-1,1,1,-1,-1,1,1,1,-1,1,-1,-1,-1,-1,-1,-1,-1],
          [-1,1,1,1,-1,1,-1,1,-1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,-1,-1,1,1,1,-1,-1,1,1,1,-1,-1,-1,1,1,-1,1,1,1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,-1,1,1,1,-1,-1,-1,1,-1,-1,-1,1,-1,-1,1],
          [-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,1,1,1,1,-1,-1,1,1,-1,1,-1,1,1,1,1,-1,-1,1,-1,1,-1,1,1,-1,1,-1,-1,1,-1,-1,1,-1,1,-1,-1,-1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1],
          [-1,1,-1,1,1,1,-1,-1,1,-1,1,-1,-1,-1,-1,1,1,-1,-1,1,-1,-1,-1,-1,1,-1,1,1,-1,1,1,-1,1,1,-1,1,-1,1,-1,-1,1,-1,1,-1,1,-1,-1,-1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,1,1,-1,-1,-1,1],
          [1,-1,-1,-1,1,-1,1,-1,-1,1,-1,1,-1,1,1,1,-1,-1,1,1,-1,1,1,1,1,1,1,1,-1,-1,1,-1,1,-1,1,1,-1,-1,1,-1,1,-1,1,1,1,1,-1,1,1,1,-1,-1,-1,1,1,1,-1,-1,-1,1,1,1,1,-1],
          [-1,1,-1,1,-1,-1,-1,1,-1,-1,1,1,1,1,1,1,1,-1,1,-1,-1,1,-1,-1,1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,1,1,-1,-1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,-1,-1,-1,-1,1],
          [1,1,1,1,-1,-1,1,1,1,-1,-1,-1,1,1,-1,-1,1,-1,-1,1,-1,-1,-1,1,1,-1,1,-1,-1,-1,1,1,-1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,-1,1,1,1,-1,1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,1,-1],
          [1,-1,-1,-1,1,-1,-1,1,1,-1,1,1,-1,1,-1,1,1,1,1,1,-1,-1,1,-1,1,-1,1,-1,1,-1,1,1,1,1,1,1,-1,1,1,-1,-1,1,-1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,1,-1,-1,1,-1,1,1,-1,1,-1],
          [-1,-1,-1,-1,-1,-1,-1,1,1,-1,1,-1,-1,1,-1,-1,-1,-1,1,-1,-1,1,-1,1,-1,1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,-1,-1,1,1,1,1,-1,1,-1,1,-1,-1,-1,1,-1,1,1,1,1,-1,1,-1,-1,-1,1,1,1]]::DOUBLE[][] AS m),
        pr AS (SELECT e.vec_id AS id,
                      list_transform(pl.m,
                        row -> list_dot_product(row,
                          CAST(e.embedding AS DOUBLE[]))) AS p
               FROM embeddings e, pl),
        qq AS (SELECT id AS qid, p AS qp FROM pr WHERE id % 50 = 0),
        short AS (SELECT qid, id FROM (
                    SELECT q.qid, c.id,
                           row_number() OVER (PARTITION BY q.qid
                             ORDER BY list_cosine_similarity(c.p, q.qp)
                               DESC, c.id) AS rn
                    FROM qq q JOIN pr c ON c.id != q.qid)
                  WHERE rn <= 20),
        scored AS (SELECT short.qid, short.id,
                          list_cosine_similarity(
                            CAST(ce.embedding AS DOUBLE[]),
                            CAST(qe.embedding AS DOUBLE[])) AS cosine
                   FROM short
                   JOIN embeddings ce ON ce.vec_id = short.id
                   JOIN embeddings qe ON qe.vec_id = short.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""),
      doc = "Random-projection (JL sketch) two-stage ANN top-5: " +
        "16-dim coarse scan + exact rescore (rows-only)."),

    // ------------------------------------------------------------------
    "s10_hard_negatives" -> QueryDef(
      fn = { (s, dir) =>
        // Contrastive hard-negative mining: for each anchor, the
        // top-5 most-similar vectors with a DIFFERENT label — the
        // negatives that actually move a contrastive loss (random
        // negatives are trivially separable; same-label lookalikes
        // are positives, not negatives). Same broadcast-scan shape
        // as s01 with the label guard fused into the scan filter; at
        // corpus scale swap the exact scan for lshTopK/pqTopK
        // candidates and keep the label anti-filter + rescore.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            col("label").as("qlabel"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid") &&
            col("label") =!= col("qlabel"))
          .select(col("qid"), col("vec_id").as("id"),
            round(VectorFunctions.cosineSim(col("embedding"), col("qvec")), 4)
              .as("cosine"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
      },
      oracle = Some("""
        WITH scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS id,
                 round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 4) AS cosine
          FROM embeddings q JOIN embeddings c
            ON c.vec_id != q.vec_id AND c.label != q.label
          WHERE q.vec_id % 50 = 0),
        ranked AS (
          SELECT qid, id, cosine,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cosine DESC, id) AS rank
          FROM scored)
        SELECT qid, id, cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5"""),
      doc = "Contrastive hard-negative mining: top-5 cross-label " +
        "near-neighbors per anchor (exact, label guard fused into " +
        "the scan)."),

    // ------------------------------------------------------------------
    "s11_filtered_ann" -> QueryDef(
      fn = { (s, dir) =>
        // FILTERED vector search — the production ANN pattern where
        // the predicate lives in a METADATA table, not on the vector
        // row: top-5 cosine neighbors among candidates whose joined
        // document is English. Strategy is PRE-filter (restrict the
        // candidate set before scoring), the right side of the
        // pre/post-filter trade whenever the predicate is selective —
        // post-filtering a top-k retrieved blind would under-fill k.
        // Scale shape: the lang predicate pushes to the documents
        // parquet scan; the surviving ids semi-join the embedding
        // scan BEFORE any distance math; queries broadcast as in s01.
        // At corpus scale the scored scan swaps for lshTopK/pqTopK
        // candidates — s13 IS that swap, registered and hash-checked
        // on the same predicate-filtered path (s11 stays the exact
        // oracle anchor).
        val enIds = T(s, dir).documents
          .filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id"))
        val e = Engine.widenIfNarrow(T(s, dir).embeddings
          .join(enIds, Seq("vec_id"), "left_semi"))
        val q = T(s, dir).embeddings
          .filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("id"),
            round(VectorFunctions.cosineSim(col("embedding"), col("qvec")), 4)
              .as("cosine"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
      },
      oracle = Some("""
        WITH en AS (
          SELECT doc_id FROM documents WHERE lang = 'en'),
        scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS id,
                 round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 4) AS cosine
          FROM embeddings q
          JOIN embeddings c ON c.vec_id != q.vec_id
          JOIN en ON en.doc_id = c.vec_id
          WHERE q.vec_id % 50 = 0),
        ranked AS (
          SELECT qid, id, cosine,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cosine DESC, id) AS rank
          FROM scored)
        SELECT qid, id, cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5"""),
      doc = "Metadata-filtered vector search: pre-filter the candidate " +
        "set through a semi-join on the documents table, then exact " +
        "top-5 cosine."),

    // ------------------------------------------------------------------
    "s12_bitext_margin" -> QueryDef(
      fn = { (s, dir) =>
        // Margin-based bitext mining (Artetxe & Schwenk): raw cosine
        // over-pairs hub vectors (points similar to EVERYTHING), so
        // score each (x, y) by its cosine RELATIVE to both sides'
        // neighborhoods: margin = cos(x,y) / ((avgTop4(x) +
        // avgTop4(y)) / 2), emitting the best cross-"language"
        // candidate per query (labels stand in for the two language
        // sides). Float discipline: cosines round to 4 first (s10's
        // rule), neighborhood sums go through DECIMAL(8,4) so
        // summation order can't matter, and the margin is ONE
        // identical double expression tree both engines evaluate on
        // identical inputs — (c4 * 8.0) / (sx + sy), the /4 and /2
        // folded into a power-of-two multiply. Scale: neighborhoods
        // and the scored pairs are the same broadcast-scan as s01
        // (queries broadcast, one linear pass over the corpus side);
        // at corpus scale both neighborhoods come from lshTopK
        // candidates (s10's swap) and the margin normalizer is
        // computed over the SAME candidate sets.
        val e = T(s, dir).embeddings
        val qs = e.filter(col("label") === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val cs = Engine.widenIfNarrow(e.filter(col("label") =!= 0)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
        // one scored frame feeds forward ranks, backward ranks, and
        // the final margin join
        val scored = cs.crossJoin(broadcast(qs))
          .select(col("qid"), col("cid"),
            round(VectorFunctions.cosineSim(col("cvec"), col("qvec")), 4)
              .as("c4"))
          .localCheckpoint()
        val wf = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("c4").desc, col("cid"))
        val fwd = scored.withColumn("r", row_number().over(wf))
          .filter(col("r") <= 4).groupBy(col("qid"))
          .agg(sum(col("c4").cast("decimal(8,4)")).cast("double").as("sx"))
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cid")).orderBy(col("c4").desc, col("qid"))
        val bwd = scored.withColumn("r", row_number().over(wb))
          .filter(col("r") <= 4).groupBy(col("cid"))
          .agg(sum(col("c4").cast("decimal(8,4)")).cast("double").as("sy"))
        val m = scored
          .join(broadcast(fwd), Seq("qid"))
          .join(bwd, Seq("cid"))
          .withColumn("margin",
            (col("c4") * lit(8.0)) / (col("sx") + col("sy")))
        val wm = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("margin").desc, col("cid"))
        m.withColumn("rk", row_number().over(wm)).filter(col("rk") === 1)
          .select(col("qid"), col("cid"), col("c4"), col("margin"))
      },
      oracle = Some("""
        WITH q AS (
          SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE label = 0),
        c AS (
          SELECT vec_id AS cid, embedding AS cv FROM embeddings
          WHERE label <> 0),
        s AS (
          SELECT qid, cid,
                 round(list_cosine_similarity(
                   CAST(cv AS DOUBLE[]), CAST(qv AS DOUBLE[])), 4) AS c4
          FROM c, q),
        f AS (
          SELECT qid, CAST(sum(CAST(c4 AS DECIMAL(8,4))) AS DOUBLE) AS sx
          FROM (SELECT qid, c4, row_number() OVER (PARTITION BY qid
                  ORDER BY c4 DESC, cid) AS r FROM s) t
          WHERE r <= 4 GROUP BY qid),
        b AS (
          SELECT cid, CAST(sum(CAST(c4 AS DECIMAL(8,4))) AS DOUBLE) AS sy
          FROM (SELECT cid, c4, row_number() OVER (PARTITION BY cid
                  ORDER BY c4 DESC, qid) AS r FROM s) t
          WHERE r <= 4 GROUP BY cid),
        m AS (
          SELECT s.qid, s.cid, s.c4,
                 (s.c4 * 8.0) / (f.sx + b.sy) AS margin
          FROM s JOIN f USING (qid) JOIN b USING (cid))
        SELECT qid, cid, c4, margin
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY margin DESC, cid) AS rk FROM m) t
        WHERE rk = 1"""),
      doc = "Margin-based bitext mining: cosine normalized by both " +
        "sides' top-4 neighborhood averages (hub correction), best " +
        "cross-label candidate per query — margins hash-check via " +
        "decimal-summed neighborhoods and one shared expression tree."),

    // ------------------------------------------------------------------
    "s13_filtered_ann_lsh" -> QueryDef(
      fn = { (s, dir) =>
        // s11's registered SCALE path: the same metadata pre-filter
        // (English documents semi-join, predicate pushed to the
        // documents scan) but candidates come from the hyperplane-LSH
        // bucket join instead of an exact scored scan — filter FIRST,
        // then bucket: the corpus side of the LSH join is already
        // restricted before any signature or distance math, so bucket
        // occupancy (and the candidate set) shrinks with the
        // predicate instead of post-filtering a blind top-k that
        // would under-fill k. Plan-asserted (PlanShapeSpec): the
        // candidate join broadcasts the query-probe side; the corpus
        // side reaches it through a semi-join, never a shuffle of
        // vectors.
        val enIds = T(s, dir).documents
          .filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id"))
        val e = Engine.widenIfNarrow(T(s, dir).embeddings
          .join(enIds, Seq("vec_id"), "left_semi"))
        val q = Engine.widenIfNarrow(T(s, dir).embeddings)
          .filter(col("vec_id") % 50 === 0)
        Similarity.lshTopK(e, q, k = 5)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // the plane tensor is regenerated from the same splitmix64
        // arithmetic hyperplaneSigs embeds (no frozen copy to drift)
        val m = OracleSql.sqlDoubleArr3(
          graft.functions.VectorFunctions.planeMatrix(
            bits = 8, tables = 8, dim = 64))
        s"""
        WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        pl AS (SELECT $m::DOUBLE[][][] AS m),
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
              FROM embeddings),
        cf AS (SELECT v.id, v.vec FROM v JOIN en ON en.doc_id = v.id),
        sig AS (SELECT cf.id, t.t AS tbl,
                       CAST(list_sum(list_transform(range(0, 8),
                         p -> CASE WHEN list_dot_product(
                                pl.m[t.t + 1][p + 1], cf.vec) >= 0
                              THEN (1::BIGINT << p)
                              ELSE 0::BIGINT END)) AS BIGINT) AS bucket
                FROM cf, pl, (SELECT unnest(range(0, 8)) AS t) t),
        qs AS (SELECT v.id AS qid, t.t AS tbl,
                      CAST(list_sum(list_transform(range(0, 8),
                        p -> CASE WHEN list_dot_product(
                               pl.m[t.t + 1][p + 1], v.vec) >= 0
                             THEN (1::BIGINT << p)
                             ELSE 0::BIGINT END)) AS BIGINT) AS bucket
               FROM v, pl, (SELECT unnest(range(0, 8)) AS t) t
               WHERE v.id % 50 = 0),
        probes AS (SELECT qid, tbl, bucket FROM qs
                   UNION
                   SELECT qid, tbl,
                          CAST(xor(bucket, 1::BIGINT << b.b) AS BIGINT)
                   FROM qs, (SELECT unnest(range(0, 8)) AS b) b),
        cand AS (SELECT DISTINCT p.qid, s.id
                 FROM probes p
                 JOIN sig s ON s.tbl = p.tbl AND s.bucket = p.bucket
                 WHERE s.id != p.qid),
        scored AS (SELECT c.qid, c.id,
                          list_cosine_similarity(cv.vec, qv.vec) AS cosine
                   FROM cand c JOIN v cv ON cv.id = c.id
                               JOIN v qv ON qv.id = c.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "Metadata-filtered ANN at the bucketed scale path: " +
        "pre-filter through the documents semi-join, then " +
        "hyperplane-LSH candidates + exact rescore (hash-checked — " +
        "regenerated plane tensor replayed in SQL)."),

    // ------------------------------------------------------------------
    "s15_hard_negatives_lsh" -> QueryDef(
      fn = { (s, dir) =>
        // s10's registered SCALE path (the swap s10's own comment
        // prescribes): candidates come from the hyperplane-LSH bucket
        // join instead of the exact scored scan; the cross-label
        // anti-filter and the exact-cosine rescore run on the (small)
        // candidate set. The anchor's label is per-query, so the
        // label guard cannot pre-filter the corpus — it rides the
        // candidate join, where it prunes same-label lookalikes
        // before ranking. s10 stays the exact oracle anchor.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val q = e.filter(col("vec_id") % 50 === 0)
        val cand = Similarity.lshCandidates(e, q)
        val scored = cand
          .join(e.select(col("vec_id").as("id"),
            col("embedding").as("cvec"), col("label").as("clabel")),
            Seq("id"))
          .join(broadcast(q.select(col("vec_id").as("qid"),
            col("embedding").as("qvec"), col("label").as("qlabel"))),
            Seq("qid"))
          .filter(col("clabel") =!= col("qlabel"))
          .select(col("qid"), col("id"),
            round(VectorFunctions.cosineSim(col("cvec"), col("qvec")), 4)
              .as("cosine"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        val m = OracleSql.sqlDoubleArr3(
          graft.functions.VectorFunctions.planeMatrix(
            bits = 8, tables = 8, dim = 64))
        s"""
        WITH pl AS (SELECT $m::DOUBLE[][][] AS m),
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec,
                     label
              FROM embeddings),
        sig AS (SELECT v.id, t.t AS tbl,
                       CAST(list_sum(list_transform(range(0, 8),
                         p -> CASE WHEN list_dot_product(
                                pl.m[t.t + 1][p + 1], v.vec) >= 0
                              THEN (1::BIGINT << p)
                              ELSE 0::BIGINT END)) AS BIGINT) AS bucket
                FROM v, pl, (SELECT unnest(range(0, 8)) AS t) t),
        qs AS (SELECT id AS qid, tbl, bucket FROM sig
               WHERE qid % 50 = 0),
        probes AS (SELECT qid, tbl, bucket FROM qs
                   UNION
                   SELECT qid, tbl,
                          CAST(xor(bucket, 1::BIGINT << b.b) AS BIGINT)
                   FROM qs, (SELECT unnest(range(0, 8)) AS b) b),
        cand AS (SELECT DISTINCT p.qid, s.id
                 FROM probes p
                 JOIN sig s ON s.tbl = p.tbl AND s.bucket = p.bucket
                 WHERE s.id != p.qid),
        scored AS (SELECT c.qid, c.id,
                          round(list_cosine_similarity(
                            cv.vec, qv.vec), 4) AS cosine
                   FROM cand c
                   JOIN v cv ON cv.id = c.id
                   JOIN v qv ON qv.id = c.qid
                   WHERE cv.label != qv.label)
        SELECT qid, id, cosine, CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "Hard-negative mining at the bucketed scale path: " +
        "hyperplane-LSH candidates, cross-label anti-filter, exact " +
        "rescore (hash-checked — regenerated plane tensor replayed " +
        "in SQL)."),

    // ------------------------------------------------------------------
    "s16_bitext_margin_lsh" -> QueryDef(
      fn = { (s, dir) =>
        // s12's registered SCALE path: margin-based bitext mining
        // where BOTH neighborhoods (forward top-4 per query, backward
        // top-4 per candidate) and the final ranking are computed
        // over the SAME LSH candidate sets — the margin normalizer
        // must see exactly the pairs the candidate stage produced, or
        // hub correction silently mixes estimates from different
        // universes. Float discipline identical to s12: cosines round
        // to 4 first, neighborhood sums through DECIMAL(8,4), one
        // shared margin expression tree.
        val e = T(s, dir).embeddings
        val qs = Engine.widenIfNarrow(e.filter(col("label") === 0))
          .select(col("vec_id"), col("embedding"))
        val cs = Engine.widenIfNarrow(e.filter(col("label") =!= 0))
          .select(col("vec_id"), col("embedding"))
        val cand = Similarity.lshCandidates(cs, qs)
          .select(col("qid"), col("id").as("cid"))
        val scored = cand
          .join(cs.select(col("vec_id").as("cid"),
            col("embedding").as("cvec")), Seq("cid"))
          .join(broadcast(qs.select(col("vec_id").as("qid"),
            col("embedding").as("qvec"))), Seq("qid"))
          .select(col("qid"), col("cid"),
            round(VectorFunctions.cosineSim(col("cvec"), col("qvec")), 4)
              .as("c4"))
          .localCheckpoint()
        val wf = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("c4").desc, col("cid"))
        val fwd = scored.withColumn("r", row_number().over(wf))
          .filter(col("r") <= 4).groupBy(col("qid"))
          .agg(sum(col("c4").cast("decimal(8,4)")).cast("double").as("sx"))
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cid")).orderBy(col("c4").desc, col("qid"))
        val bwd = scored.withColumn("r", row_number().over(wb))
          .filter(col("r") <= 4).groupBy(col("cid"))
          .agg(sum(col("c4").cast("decimal(8,4)")).cast("double").as("sy"))
        val m = scored
          .join(broadcast(fwd), Seq("qid"))
          .join(bwd, Seq("cid"))
          .withColumn("margin",
            (col("c4") * lit(8.0)) / (col("sx") + col("sy")))
        val wm = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("margin").desc, col("cid"))
        m.withColumn("rk", row_number().over(wm)).filter(col("rk") === 1)
          .select(col("qid"), col("cid"), col("c4"), col("margin"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        val m = OracleSql.sqlDoubleArr3(
          graft.functions.VectorFunctions.planeMatrix(
            bits = 8, tables = 8, dim = 64))
        s"""
        WITH pl AS (SELECT $m::DOUBLE[][][] AS m),
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec,
                     label
              FROM embeddings),
        cs AS (SELECT id, vec FROM v WHERE label <> 0),
        qv AS (SELECT id, vec FROM v WHERE label = 0),
        sig AS (SELECT cs.id, t.t AS tbl,
                       CAST(list_sum(list_transform(range(0, 8),
                         p -> CASE WHEN list_dot_product(
                                pl.m[t.t + 1][p + 1], cs.vec) >= 0
                              THEN (1::BIGINT << p)
                              ELSE 0::BIGINT END)) AS BIGINT) AS bucket
                FROM cs, pl, (SELECT unnest(range(0, 8)) AS t) t),
        qs AS (SELECT qv.id AS qid, t.t AS tbl,
                      CAST(list_sum(list_transform(range(0, 8),
                        p -> CASE WHEN list_dot_product(
                               pl.m[t.t + 1][p + 1], qv.vec) >= 0
                             THEN (1::BIGINT << p)
                             ELSE 0::BIGINT END)) AS BIGINT) AS bucket
               FROM qv, pl, (SELECT unnest(range(0, 8)) AS t) t),
        probes AS (SELECT qid, tbl, bucket FROM qs
                   UNION
                   SELECT qid, tbl,
                          CAST(xor(bucket, 1::BIGINT << b.b) AS BIGINT)
                   FROM qs, (SELECT unnest(range(0, 8)) AS b) b),
        cand AS (SELECT DISTINCT p.qid, s.id AS cid
                 FROM probes p
                 JOIN sig s ON s.tbl = p.tbl AND s.bucket = p.bucket
                 WHERE s.id != p.qid),
        s AS (SELECT c.qid, c.cid,
                     round(list_cosine_similarity(
                       cv.vec, q.vec), 4) AS c4
              FROM cand c JOIN cs cv ON cv.id = c.cid
                          JOIN qv q ON q.id = c.qid),
        f AS (
          SELECT qid, CAST(sum(CAST(c4 AS DECIMAL(8,4))) AS DOUBLE) AS sx
          FROM (SELECT qid, c4, row_number() OVER (PARTITION BY qid
                  ORDER BY c4 DESC, cid) AS r FROM s) t
          WHERE r <= 4 GROUP BY qid),
        b AS (
          SELECT cid, CAST(sum(CAST(c4 AS DECIMAL(8,4))) AS DOUBLE) AS sy
          FROM (SELECT cid, c4, row_number() OVER (PARTITION BY cid
                  ORDER BY c4 DESC, qid) AS r FROM s) t
          WHERE r <= 4 GROUP BY cid),
        mg AS (
          SELECT s.qid, s.cid, s.c4,
                 (s.c4 * 8.0) / (f.sx + b.sy) AS margin
          FROM s JOIN f USING (qid) JOIN b USING (cid))
        SELECT qid, cid, c4, margin
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY margin DESC, cid) AS rk FROM mg) t
        WHERE rk = 1"""
      },
      doc = "Bitext margin mining at the bucketed scale path: LSH " +
        "candidates with BOTH neighborhood normalizers computed over " +
        "the same candidate sets (hash-checked — regenerated plane " +
        "tensor replayed in SQL)."),

    // ------------------------------------------------------------------
    "s17_topk_ivfsq" -> QueryDef(
      fn = { (s, dir) =>
        // IVF x SQ — s05's registered scale composition and the third
        // use of the same coarse cells (s03 full vectors, s14 PQ
        // codes, here int8): each query scans only its probed cells'
        // quantized vectors, exact rescore of top k*refine. With this
        // every exact-scan anchor has a registered scale twin:
        // s01->s02, s05->s17, s07->s14, s10->s15, s11->s13, s12->s16,
        // d05->d06. Hash-checked via oracleGen: trained centroids
        // inline as literals; the quantization scale derives IN SQL
        // (s05's replay) and the candidate cut runs inside the probed
        // cells only.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        Similarity.ivfQuantizedTopK(e,
          e.filter(col("vec_id") % 50 === 0), k = 5,
          nlist = 16, nprobe = 3, refine = 4)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val cents = Similarity.coarseCentroids(
          e, "embedding", "vec_id", nlist = 16, seed = 42L,
          maxTrainRows = 100000L)
        val cLit = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
        s"""
        WITH ct AS (SELECT $cLit::DOUBLE[][] AS m),
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
            FROM ascore) WHERE rn = 1),
        probed AS (
          SELECT id AS qid, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore WHERE id % 50 = 0) WHERE rn <= 3),
        sc AS (SELECT max(list_max(list_transform(vec, x -> abs(x))))
                 AS s FROM v),
        cq AS (SELECT v.id,
                      list_transform(v.vec,
                        x -> CAST(CAST(least(greatest(
                            round(x / sc.s * 127), -127), 127)
                          AS TINYINT) AS DOUBLE)) AS qv
               FROM v, sc),
        qq AS (SELECT id AS qid, qv FROM cq WHERE id % 50 = 0),
        cand AS (SELECT qid, id FROM (
                   SELECT p.qid, c.id,
                          row_number() OVER (PARTITION BY p.qid
                            ORDER BY list_cosine_similarity(cv.qv, q.qv)
                              DESC, c.id) AS rn
                   FROM probed p
                   JOIN cells c ON c.cell = p.cell AND c.id != p.qid
                   JOIN cq cv ON cv.id = c.id
                   JOIN qq q ON q.qid = p.qid)
                 WHERE rn <= 20),
        scored AS (SELECT cand.qid, cand.id,
                          list_cosine_similarity(
                            CAST(ce.embedding AS DOUBLE[]),
                            CAST(qe.embedding AS DOUBLE[])) AS cosine
                   FROM cand
                   JOIN embeddings ce ON ce.vec_id = cand.id
                   JOIN embeddings qe ON qe.vec_id = cand.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "IVF x int8-SQ composition (probe coarse cells, scan only " +
        "their quantized vectors, exact rescore) — s05's registered " +
        "scale twin; hash-checked with centroids as regenerated " +
        "literals and the quantization replayed in SQL."),

    // ------------------------------------------------------------------
    "s18_ann_index_persisted" -> QueryDef(
      fn = { (s, dir) =>
        // The PERSISTED ANN artifact: build once (train + one
        // partitioned-by-cell projection of (id, int8 codes, vec)),
        // then serve top-k from the artifact alone — the probe reads
        // centroids (16 rows), prunes `codes/` to the probed cell
        // PARTITIONS (a planning-time partition filter, asserted in
        // PlanShapeSpec), scans int8, and rescores k*refine exactly.
        // Bit-identical to the transient s17 path at the same
        // parameters by construction — which is what the shared
        // oracle proves.
        val path = annixDir(dir)
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        AnnIndex.build(e, path, nlist = 16)
        AnnIndex.probe(s, path, e.filter(col("vec_id") % 50 === 0),
          k = 5, nprobe = 3, refine = 4)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // the s17 replay verbatim: the artifact is a materialization
        // of exactly that computation (same training, same clamped
        // int8 quantization, same tie-breaks)
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val cents = Similarity.coarseCentroids(
          e, "embedding", "vec_id", nlist = 16, seed = 42L,
          maxTrainRows = 100000L)
        val cLit = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
        s"""
        WITH ct AS (SELECT $cLit::DOUBLE[][] AS m),
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
            FROM ascore) WHERE rn = 1),
        probed AS (
          SELECT id AS qid, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore WHERE id % 50 = 0) WHERE rn <= 3),
        sc AS (SELECT max(list_max(list_transform(vec, x -> abs(x))))
                 AS s FROM v),
        cq AS (SELECT v.id,
                      list_transform(v.vec,
                        x -> CAST(CAST(least(greatest(
                            round(x / sc.s * 127), -127), 127)
                          AS TINYINT) AS DOUBLE)) AS qv
               FROM v, sc),
        qq AS (SELECT id AS qid, qv FROM cq WHERE id % 50 = 0),
        cand AS (SELECT qid, id FROM (
                   SELECT p.qid, c.id,
                          row_number() OVER (PARTITION BY p.qid
                            ORDER BY list_cosine_similarity(cv.qv, q.qv)
                              DESC, c.id) AS rn
                   FROM probed p
                   JOIN cells c ON c.cell = p.cell AND c.id != p.qid
                   JOIN cq cv ON cv.id = c.id
                   JOIN qq q ON q.qid = p.qid)
                 WHERE rn <= 20),
        scored AS (SELECT cand.qid, cand.id,
                          list_cosine_similarity(
                            CAST(ce.embedding AS DOUBLE[]),
                            CAST(qe.embedding AS DOUBLE[])) AS cosine
                   FROM cand
                   JOIN embeddings ce ON ce.vec_id = cand.id
                   JOIN embeddings qe ON qe.vec_id = cand.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "Persisted IVF-SQ ANN index: build-once artifact " +
        "(centroids + cell-partitioned int8 codes + vectors), " +
        "probe-many with planning-time cell-partition pruning — " +
        "hash-checked against the transient IVFxSQ replay."),

    // ------------------------------------------------------------------
    "s19_ann_index_append" -> QueryDef(
      fn = { (s, dir) =>
        // INCREMENTAL ingestion into the persisted artifact: build on
        // half the corpus (training centroids + int8 scale on that
        // half only), then append the other half through the FROZEN
        // geometry — one O(batch) projection job into its own seg
        // subtree, no rebuild, the FAISS train-then-add story. The
        // probe (queries drawn from BOTH halves) serves from the
        // merged artifact with the same planning-time cell-partition
        // pruning across segments. The oracle replays the frozen-
        // geometry semantics independently: centroids and scale from
        // the build half, assignment + quantization of ALL vectors
        // through those literals.
        val path = annixaDir(dir)
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        AnnIndex.build(e.filter(col("vec_id") % 2 === 0), path,
          nlist = 16)
        AnnIndex.append(e.filter(col("vec_id") % 2 === 1), path,
          segId = 1L)
        AnnIndex.probe(s, path, e.filter(col("vec_id") % 25 === 0),
          k = 5, nprobe = 3, refine = 4)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // s18's replay with the geometry CTEs restricted to the build
        // half: centroids trained on evens, scale from evens, every
        // vector (both halves) assigned and quantized through them
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val cents = Similarity.coarseCentroids(
          e.filter(col("vec_id") % 2 === 0), "embedding", "vec_id",
          nlist = 16, seed = 42L, maxTrainRows = 100000L)
        val cLit = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
        s"""
        WITH ct AS (SELECT $cLit::DOUBLE[][] AS m),
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
            FROM ascore) WHERE rn = 1),
        probed AS (
          SELECT id AS qid, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore WHERE id % 25 = 0) WHERE rn <= 3),
        sc AS (SELECT max(list_max(list_transform(vec, x -> abs(x))))
                 AS s FROM v WHERE id % 2 = 0),
        cq AS (SELECT v.id,
                      list_transform(v.vec,
                        x -> CAST(CAST(least(greatest(
                            round(x / sc.s * 127), -127), 127)
                          AS TINYINT) AS DOUBLE)) AS qv
               FROM v, sc),
        qq AS (SELECT id AS qid, qv FROM cq WHERE id % 25 = 0),
        cand AS (SELECT qid, id FROM (
                   SELECT p.qid, c.id,
                          row_number() OVER (PARTITION BY p.qid
                            ORDER BY list_cosine_similarity(cv.qv, q.qv)
                              DESC, c.id) AS rn
                   FROM probed p
                   JOIN cells c ON c.cell = p.cell AND c.id != p.qid
                   JOIN cq cv ON cv.id = c.id
                   JOIN qq q ON q.qid = p.qid)
                 WHERE rn <= 20),
        scored AS (SELECT cand.qid, cand.id,
                          list_cosine_similarity(
                            CAST(ce.embedding AS DOUBLE[]),
                            CAST(qe.embedding AS DOUBLE[])) AS cosine
                   FROM cand
                   JOIN embeddings ce ON ce.vec_id = cand.id
                   JOIN embeddings qe ON qe.vec_id = cand.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "Incremental ANN index ingestion: append new vectors " +
        "through the frozen trained geometry (stored centroids + " +
        "scale) as an O(batch) segment write — probe spans build + " +
        "appended segments; hash-checked via the frozen-geometry " +
        "replay."),

    // ------------------------------------------------------------------
    "s20_ann_index_delete" -> QueryDef(
      fn = { (s, dir) =>
        // FULL LIFECYCLE of the persisted artifact: build on the even
        // half, append the odd half through the frozen geometry,
        // DELETE a slice spanning both segments (tombstone segment —
        // segment-ordered, so copies stored before it vanish from
        // probes), then RE-ADD a sub-slice of the deleted ids (a
        // later segment outranks the tombstone: re-ingestion after
        // retraction, the S3 overwrite-by-name semantic the
        // append-only artifact was missing). The probe must rank
        // among exactly the LIVE rows.
        val path = annixdDir(dir)
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        AnnIndex.build(e.filter(col("vec_id") % 2 === 0), path,
          nlist = 16)
        AnnIndex.append(e.filter(col("vec_id") % 2 === 1), path,
          segId = 1L)
        AnnIndex.delete(e.filter(col("vec_id") % 10 === 3)
          .select(col("vec_id")), path, segId = 2L)
        AnnIndex.append(e.filter(col("vec_id") % 20 === 3), path,
          segId = 3L)
        AnnIndex.probe(s, path, e.filter(col("vec_id") % 25 === 0),
          k = 5, nprobe = 3, refine = 4)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // s19's frozen-geometry replay with the candidate space
        // restricted to LIVE ids: deleted (vec_id % 10 = 3) except
        // re-added (vec_id % 20 = 3). Queries still draw from the
        // full table — a deleted id may query, it just cannot be a
        // result.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val cents = Similarity.coarseCentroids(
          e.filter(col("vec_id") % 2 === 0), "embedding", "vec_id",
          nlist = 16, seed = 42L, maxTrainRows = 100000L)
        val cLit = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
        s"""
        WITH ct AS (SELECT $cLit::DOUBLE[][] AS m),
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
              FROM embeddings),
        live AS (SELECT id FROM v
                 WHERE id % 10 != 3 OR id % 20 = 3),
        ascore AS (
          SELECT v.id, c.c AS cell,
                 list_cosine_similarity(ct.m[c.c + 1], v.vec) AS csim
          FROM v, ct, (SELECT unnest(range(0, 16)) AS c) c),
        cells AS (
          SELECT id, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore) WHERE rn = 1),
        probed AS (
          SELECT id AS qid, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore WHERE id % 25 = 0) WHERE rn <= 3),
        sc AS (SELECT max(list_max(list_transform(vec, x -> abs(x))))
                 AS s FROM v WHERE id % 2 = 0),
        cq AS (SELECT v.id,
                      list_transform(v.vec,
                        x -> CAST(CAST(least(greatest(
                            round(x / sc.s * 127), -127), 127)
                          AS TINYINT) AS DOUBLE)) AS qv
               FROM v, sc),
        qq AS (SELECT id AS qid, qv FROM cq WHERE id % 25 = 0),
        cand AS (SELECT qid, id FROM (
                   SELECT p.qid, c.id,
                          row_number() OVER (PARTITION BY p.qid
                            ORDER BY list_cosine_similarity(cv.qv, q.qv)
                              DESC, c.id) AS rn
                   FROM probed p
                   JOIN cells c ON c.cell = p.cell AND c.id != p.qid
                   JOIN live l ON l.id = c.id
                   JOIN cq cv ON cv.id = c.id
                   JOIN qq q ON q.qid = p.qid)
                 WHERE rn <= 20),
        scored AS (SELECT cand.qid, cand.id,
                          list_cosine_similarity(
                            CAST(ce.embedding AS DOUBLE[]),
                            CAST(qe.embedding AS DOUBLE[])) AS cosine
                   FROM cand
                   JOIN embeddings ce ON ce.vec_id = cand.id
                   JOIN embeddings qe ON qe.vec_id = cand.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "ANN index DELETE lifecycle: segment-ordered tombstones " +
        "suppress earlier copies, a later append re-adds cleanly, " +
        "probes rank among live rows only — hash-checked against the " +
        "frozen-geometry replay restricted to live ids."),

    // ------------------------------------------------------------------
    "s21_ann_index_drift_rebuild" -> QueryDef(
      fn = { (s, dir) =>
        // CLOSED drift loop: build on the even half, record the
        // as-trained recall baseline, append a distribution-shifted
        // mass (the odd half pushed into the all-positive quadrant
        // the centroids never saw — recall over the merged corpus
        // degrades), then maybeRebuild RETRAINS on the live rows into
        // a new generation and swaps the pointer atomically. The
        // probe must rank through the POST-REBUILD geometry; the
        // require makes the drift trigger itself part of the gate.
        // The shift is float-exact (abs + 2.0f) so the replay can
        // reproduce it bit-for-bit.
        val path = annixrDir(dir)
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        AnnIndex.build(e.filter(col("vec_id") % 2 === 0), path,
          nlist = 16)
        AnnIndex.driftCheck(s, path, sample = 32, k = 10)
        val shifted = e.filter(col("vec_id") % 2 === 1)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            transform(col("embedding"),
              x => abs(x) + lit(2.0f)).as("embedding"))
        AnnIndex.append(shifted, path, segId = 1L)
        val drift = AnnIndex.maybeRebuild(s, path, sample = 32, k = 10)
        require(drift.rebuildRecommended,
          s"drift fixture failed to trigger a rebuild: $drift")
        AnnIndex.probe(s, path, e.filter(col("vec_id") % 50 === 0),
          k = 5, nprobe = 3, refine = 4)
          .select(col("qid"), col("id"),
            round(col("cosine"), 4).as("cosine"), col("rank"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // the s18 replay over the POST-REBUILD state: corpus = evens
        // + the float-exact shifted odds, geometry (centroids + int8
        // scale) retrained on exactly that union — what maybeRebuild
        // trains on the live rows
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val union = e.filter(col("vec_id") % 2 === 0)
          .select(col("vec_id"), col("embedding"))
          .unionByName(e.filter(col("vec_id") % 2 === 1)
            .select((col("vec_id") + lit(1000000L)).as("vec_id"),
              transform(col("embedding"),
                x => abs(x) + lit(2.0f)).as("embedding")))
        val cents = Similarity.coarseCentroids(
          union, "embedding", "vec_id", nlist = 16, seed = 42L,
          maxTrainRows = 100000L)
        val cLit = OracleSql.sqlDoubleArr2(cents.sortBy(_._1).map(_._2))
        s"""
        WITH ct AS (SELECT $cLit::DOUBLE[][] AS m),
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
              FROM embeddings WHERE vec_id % 2 = 0
              UNION ALL
              SELECT vec_id + 1000000 AS id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(CAST(abs(x) + 2 AS FLOAT) AS DOUBLE))
                       AS vec
              FROM embeddings WHERE vec_id % 2 = 1),
        ascore AS (
          SELECT v.id, c.c AS cell,
                 list_cosine_similarity(ct.m[c.c + 1], v.vec) AS csim
          FROM v, ct, (SELECT unnest(range(0, 16)) AS c) c),
        cells AS (
          SELECT id, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore) WHERE rn = 1),
        probed AS (
          SELECT id AS qid, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id
                     ORDER BY csim DESC, cell) AS rn
            FROM ascore WHERE id % 50 = 0 AND id < 1000000)
          WHERE rn <= 3),
        sc AS (SELECT max(list_max(list_transform(vec, x -> abs(x))))
                 AS s FROM v),
        cq AS (SELECT v.id,
                      list_transform(v.vec,
                        x -> CAST(CAST(least(greatest(
                            round(x / sc.s * 127), -127), 127)
                          AS TINYINT) AS DOUBLE)) AS qv
               FROM v, sc),
        qq AS (SELECT id AS qid, qv FROM cq
               WHERE id % 50 = 0 AND id < 1000000),
        cand AS (SELECT qid, id FROM (
                   SELECT p.qid, c.id,
                          row_number() OVER (PARTITION BY p.qid
                            ORDER BY list_cosine_similarity(cv.qv, q.qv)
                              DESC, c.id) AS rn
                   FROM probed p
                   JOIN cells c ON c.cell = p.cell AND c.id != p.qid
                   JOIN cq cv ON cv.id = c.id
                   JOIN qq q ON q.qid = p.qid)
                 WHERE rn <= 20),
        scored AS (SELECT cand.qid, cand.id,
                          list_cosine_similarity(cv.vec, qv.vec)
                            AS cosine
                   FROM cand
                   JOIN v cv ON cv.id = cand.id
                   JOIN v qv ON qv.id = cand.qid)
        SELECT qid, id, round(cosine, 4) AS cosine,
               CAST(rank AS INT) AS rank
        FROM (SELECT qid, id, cosine,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, id) AS rank
              FROM scored)
        WHERE rank <= 5"""
      },
      doc = "ANN drift loop CLOSED: driftCheck recommends, " +
        "maybeRebuild retrains on the live rows into a new " +
        "generation and swaps the pointer atomically — hash-checked " +
        "against the replay of the post-rebuild geometry."),

    // ------------------------------------------------------------------
    "s06_topk_sparse" -> QueryDef(
      fn = { (s, dir) =>
        // Sparse TF-IDF cosine top-50 pairs via inverted-index join —
        // the text-side similarity path: docs only meet on shared
        // surviving tokens (df <= 20% of corpus), so the plan is
        // token-shuffle + partial-agg, never all-pairs. Rounded to 6
        // decimals BEFORE the >0 filter and the ordering so both
        // engines select the identical top-50 (sum order and libm ln
        // differ by ~1 ulp between engines).
        val pairs = Similarity.tfidfPairs(
          T(s, dir).documents, "text", "doc_id", maxDfFrac = 0.2)
        pairs.select(col("id_a"), col("id_b"),
          round(col("cosine"), 6).as("cosine"))
          .filter(col("cosine") > 0)
          .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
          .limit(50)
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id AS doc,
                 unnest(list_filter(string_split(text, ' '),
                   x -> x != '')) AS token
          FROM documents),
        tf AS (SELECT doc, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        w AS (SELECT doc, tf.token,
                     tf * ln((SELECT n_docs FROM nd) / df) AS w
              FROM tf JOIN dfq USING (token)
              WHERE df <= (SELECT n_docs FROM nd) * 0.2),
        nrm AS (SELECT doc, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
        wn AS (SELECT doc, token, w / nrm AS wn
               FROM w JOIN nrm USING (doc)),
        p AS (SELECT a.doc AS id_a, b.doc AS id_b,
                     round(sum(a.wn * b.wn), 6) AS cosine
              FROM wn a JOIN wn b
                ON a.token = b.token AND a.doc < b.doc
              GROUP BY 1, 2)
        SELECT id_a, id_b, cosine FROM p WHERE cosine > 0
        ORDER BY cosine DESC, id_a, id_b LIMIT 50"""),
      doc = "Sparse TF-IDF cosine top-50 doc pairs via inverted-" +
        "index join (df-pruned vocabulary, never all-pairs)."),

    // ------------------------------------------------------------------
    "d11_fuzzy_pairs" -> QueryDef(
      fn = { (s, dir) =>
        // Edit-distance near-dup kernel with blocking: candidates are
        // same-language docs in the same 16-char length band (id_a <
        // id_b), verified by levenshtein over the first 64 canonical
        // chars. Spark's thresholded levenshtein(l, r, t) is O(len*t)
        // and returns -1 past t — the kernel cost is bounded even on
        // long docs. At corpus scale the candidate generator would be
        // LSH (d03) instead of length-band blocking (whose blocks
        // grow O(n) with corpus size); this registers the exact,
        // oracle-checkable kernel + blocking shape.
        val f = T(s, dir).documents.select(
          col("doc_id"), col("lang"),
          (col("n_chars") / 16).cast("int").as("band"),
          substring(TextFunctions.normText(col("text")), 1, 64).as("nt"))
        val a = f.select(col("doc_id").as("id_a"), col("lang"),
          col("band"), col("nt").as("nt_a"))
        val b = f.select(col("doc_id").as("id_b"), col("lang"),
          col("band"), col("nt").as("nt_b"))
        a.join(b, Seq("lang", "band"))
          .where(col("id_b") > col("id_a"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("nt_a"), col("nt_b"), 16).as("edit_dist"))
          .where(col("edit_dist") >= 0)
      },
      oracle = Some("""
        WITH f AS (
          SELECT doc_id, lang, n_chars // 16 AS band,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g'))[1:64]
                   AS nt
          FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.nt, b.nt) AS INTEGER) AS edit_dist
        FROM f a JOIN f b
          ON a.lang = b.lang AND a.band = b.band AND b.doc_id > a.doc_id
        WHERE levenshtein(a.nt, b.nt) <= 16"""),
      doc = "Edit-distance near-dup pairs: (lang, length-band) " +
        "blocking + thresholded levenshtein kernel."),

    // ------------------------------------------------------------------
    "d12_span_dedup" -> QueryDef(
      fn = { (s, dir) =>
        // Repeated-substring detection (the span-level dedup building
        // block of Lee et al. 2022, "Deduplicating Training Data Makes
        // Language Models Better"): every 8-token window is hashed and
        // windows appearing in >= 2 distinct docs surface as cross-doc
        // boilerplate. Scale shape: the explode emits (doc_id, md5)
        // only — the shuffle carries 32-byte hashes, never span text —
        // and count(distinct doc_id) expands to the standard two-phase
        // partial agg. At 100 TB this is the exact complement of d03:
        // MinHash finds whole-doc near-dups, this finds shared SPANS
        // inside otherwise-distinct docs (licence headers, templates).
        Dedup.spanDups(T(s, dir).documents, "text", "doc_id",
          n = 8, minDocs = 2)
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
          FROM tok)
        SELECT md5(span) AS span_hash,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_occ
        FROM sp GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2"""),
      doc = "Cross-doc repeated 8-token spans (substring-level dedup; " +
        "hash-only shuffle)."),

    // ------------------------------------------------------------------
    "d13_incremental_vec_dedup" -> QueryDef(
      fn = { (s, dir) =>
        // The embedding-side daily-append path (vector twin of d10):
        // dedup a new vector batch (vec_id % 5 == 0) against the
        // indexed remainder. Bucket keys derive from STORED seeded
        // hyperplane signatures, so last month's index and today's
        // batch agree on buckets with no model state; the corpus index
        // streams (never shuffled or re-signed), the batch broadcasts,
        // every pair exact-cosine verified. Hash-checked (round 8):
        // the signatures are plan-time splitmix64 literals (d06's
        // matrix), so the oracle replays index/batch signing, the
        // index-side bucket cap, the cap-exempt exact boundary, both
        // expansions and the within-batch pair set. DedupSpec
        // additionally pins subset-of-brute-force + planted recall.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val index = Dedup.vecDedupIndex(
          e.filter(col("vec_id") % 5 =!= 0), "embedding", "vec_id")
        Dedup.incrementalVecDups(index,
          e.filter(col("vec_id") % 5 === 0), "embedding", "vec_id",
          threshold = 0.35)
          .select(col("id_a"), col("id_b"),
            round(col("cosine"), 4).as("cosine"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // the plane tensor regenerates from the same splitmix64
        // arithmetic hyperplaneSigs embeds (s13's pattern — no
        // frozen copy to drift on parameter change). Candidate
        // buckets are the LOW 4 bits of the stored deep signature,
        // so the 4-plane tensor replays them exactly regardless of
        // the index's refinement headroom.
        val m = OracleSql.sqlDoubleArr3(
          graft.functions.VectorFunctions.planeMatrix(
            bits = 4, tables = 12, dim = 64))
        s"""
        WITH pl AS (SELECT $m::DOUBLE[][][] AS m),
        -- index side: vec_id % 5 != 0 ; batch side: % 5 == 0
        ixg0 AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS vec
                 FROM embeddings WHERE vec_id % 5 != 0 AND embedding IS NOT NULL
                   AND len(list_filter(embedding, x -> x != 0)) > 0),
        ixg AS (SELECT did, vec, min(did) OVER (PARTITION BY vec) AS keep FROM ixg0),
        nbg0 AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS vec
                 FROM embeddings WHERE vec_id % 5 = 0 AND embedding IS NOT NULL
                   AND len(list_filter(embedding, x -> x != 0)) > 0),
        nbg AS (SELECT did, vec, min(did) OVER (PARTITION BY vec) AS keep FROM nbg0),
        ixr AS (SELECT did AS id, vec FROM ixg WHERE did = keep),
        nbr AS (SELECT did AS id, vec FROM nbg WHERE did = keep),
        tt AS (SELECT unnest(range(0, 12)) AS t),
        ixs AS (SELECT r.id, tt.t AS tbl,
                       CAST(list_sum(list_transform(range(0, 4),
                         p -> CASE WHEN list_dot_product(pl.m[tt.t + 1][p + 1], r.vec) >= 0
                              THEN (1::BIGINT << p) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
                FROM ixr r, pl, tt),
        nbs AS (SELECT r.id, tt.t AS tbl,
                       CAST(list_sum(list_transform(range(0, 4),
                         p -> CASE WHEN list_dot_product(pl.m[tt.t + 1][p + 1], r.vec) >= 0
                              THEN (1::BIGINT << p) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
                FROM nbr r, pl, tt),
        ok AS (SELECT tbl, bucket FROM ixs GROUP BY tbl, bucket HAVING count(*) <= 10000),
        cand AS (SELECT DISTINCT i.id AS ix_rep, n.id AS n_rep
                 FROM ixs i SEMI JOIN ok ON i.tbl = ok.tbl AND i.bucket = ok.bucket
                 JOIN nbs n ON n.tbl = i.tbl AND n.bucket = i.bucket
                 WHERE i.id != n.id),
        lshrp AS (SELECT c.ix_rep, c.n_rep,
                         list_cosine_similarity(a.vec, b.vec) AS cosine
                  FROM cand c JOIN ixr a ON a.id = c.ix_rep
                              JOIN nbr b ON b.id = c.n_rep
                  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.35),
        exb AS (SELECT a.id AS ix_rep, b.id AS n_rep, 1.0 AS cosine
                FROM ixr a JOIN nbr b ON a.vec = b.vec),
        rp AS (SELECT ix_rep, n_rep, max(cosine) AS cosine
               FROM (SELECT * FROM lshrp UNION ALL SELECT * FROM exb)
               GROUP BY ix_rep, n_rep),
        crossp AS (SELECT least(ma.did, mb.did) AS id_a,
                          greatest(ma.did, mb.did) AS id_b, rp.cosine
                   FROM rp JOIN ixg ma ON ma.keep = rp.ix_rep
                           JOIN nbg mb ON mb.keep = rp.n_rep
                   WHERE ma.did != mb.did),
        -- within-batch embeddingDupPairs replay on the batch subset
        bsigs AS (SELECT * FROM nbs),
        bok AS (SELECT tbl, bucket FROM bsigs GROUP BY tbl, bucket HAVING count(*) <= 10000),
        bcand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                  FROM (SELECT s.* FROM bsigs s SEMI JOIN bok ON s.tbl = bok.tbl AND s.bucket = bok.bucket) a
                  JOIN (SELECT s.* FROM bsigs s SEMI JOIN bok ON s.tbl = bok.tbl AND s.bucket = bok.bucket) b
                    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id),
        brp AS (SELECT c.id_a, c.id_b, list_cosine_similarity(ra.vec, rb.vec) AS cosine
                FROM bcand c JOIN nbr ra ON ra.id = c.id_a
                             JOIN nbr rb ON rb.id = c.id_b
                WHERE list_cosine_similarity(ra.vec, rb.vec) >= 0.35),
        bexp AS (SELECT least(ma.did, mb.did) AS id_a,
                        greatest(ma.did, mb.did) AS id_b, brp.cosine
                 FROM brp JOIN nbg ma ON ma.keep = brp.id_a
                          JOIN nbg mb ON mb.keep = brp.id_b),
        bstar AS (SELECT keep AS id_a, did AS id_b, 1.0 AS cosine FROM nbg WHERE did != keep),
        bpairs AS (SELECT id_a, id_b, max(cosine) AS cosine
                   FROM (SELECT * FROM bexp UNION ALL SELECT * FROM bstar)
                   GROUP BY id_a, id_b),
        u AS (SELECT * FROM crossp UNION ALL SELECT * FROM bpairs)
        SELECT id_a, id_b, round(max(cosine), 4) AS cosine
        FROM u GROUP BY id_a, id_b
        ORDER BY id_a, id_b"""
      },
      doc = "Incremental embedding dedup of an append batch vs a " +
        "persisted hyperplane-signature index (corpus streams, batch " +
        "broadcasts; hash-checked — plan-literal planes replayed)."),

    // ------------------------------------------------------------------
    "d15_jaro_linkage" -> QueryDef(
      fn = { (s, dir) =>
        // Record linkage with the Jaro-Winkler kernel (the classic
        // choice for short entity strings) over 32-char normalized
        // title prefixes: candidates are same-language docs whose
        // titles share a 2-byte prefix (standard prefix blocking —
        // near-linear candidate growth vs the lang-only join's
        // quadratic blowup; 107k vs 3.2M pairs at sf0.1), verified by
        // the native codegen jaro_winkler Expression at >= 0.93. The
        // similarity column is emitted RAW: JaroWinklerUtil pins the
        // canonical evaluation order, so the double is bit-for-bit
        // reproducible cross-engine and the oracle hash-checks it.
        // Blocking recall is declared, not hidden: a near-dup pair
        // differing in its first two bytes is out of scope here
        // (d03/d11 cover order-robust candidates).
        // Dedup.jaroLinkage canonicalizes identical titles before the
        // quadratic kernel (flood discipline; no-op on this fixture,
        // which has no exact-title dups) — ScaleSmoke's k=20 replica
        // flood measured 208 s naive vs kernel-flat canonicalized.
        val f = T(s, dir).documents.select(
          col("doc_id"), col("lang"),
          substring(TextFunctions.normText(col("text")), 1, 32)
            .as("title"))
        graft.operators.Dedup.jaroLinkage(
          f, "doc_id", "lang", "title", threshold = 0.93)
      },
      oracle = Some("""
        WITH f AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g'))[1:32]
                   AS title
          FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               jaro_winkler_similarity(a.title, b.title) AS sim
        FROM f a JOIN f b
          ON a.lang = b.lang AND a.title[1:2] = b.title[1:2]
         AND b.doc_id > a.doc_id
        WHERE jaro_winkler_similarity(a.title, b.title) >= 0.93"""),
      doc = "Record linkage: (lang, 2-byte title prefix) blocking + " +
        "Jaro-Winkler >= 0.93 on normalized 32-char titles; raw " +
        "double hash-checked cross-engine."),

    // ------------------------------------------------------------------
    "d16_entity_resolution" -> QueryDef(
      fn = { (s, dir) =>
        // Entity resolution end-to-end: d15's linkage pairs close
        // into connected components and every doc gets a canonical
        // representative (min id reachable through links) — the full
        // match->cluster->survivorship pipeline, and the proof that
        // the linkage operator composes with the component machinery.
        // Deterministic pair set -> DuckDB recomputes the closure
        // with a recursive CTE and hash-checks every label (d07's
        // pattern, over the jw edge set).
        val d = T(s, dir).documents
        val f = d.select(col("doc_id"), col("lang"),
          substring(TextFunctions.normText(col("text")), 1, 32)
            .as("title"))
        val pairs = graft.operators.Dedup.jaroLinkage(
          f, "doc_id", "lang", "title", threshold = 0.93)
          .select(col("id_a"), col("id_b"))
        graft.operators.Dedup.clusterReps(
          d.select(col("doc_id").as("id")), pairs)
      },
      oracle = Some("""
        WITH RECURSIVE
        f AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g'))[1:32]
                   AS title
          FROM documents),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM f a JOIN f b
            ON a.lang = b.lang AND a.title[1:2] = b.title[1:2]
           AND b.doc_id > a.doc_id
          WHERE jaro_winkler_similarity(a.title, b.title) >= 0.93),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)
        SELECT id, min(r) AS rep FROM reach GROUP BY id"""),
      doc = "Entity resolution: Jaro-Winkler linkage pairs -> " +
        "connected components -> canonical representative per doc " +
        "(closure hash-checked via recursive CTE)."),

    // ------------------------------------------------------------------
    "d17_containment_dedup" -> QueryDef(
      fn = { (s, dir) =>
        // The operator form of d14's containment measure: inverted
        // shingle index -> candidate pairs -> integer-exact verify
        // over the WHOLE corpus (d14 pairs adjacent ids only, a toy
        // pairing that oracle-checks the kernel). The fixture has no
        // natural excerpts (memory: near-dups sit at hamming >= 13),
        // so excerpts are PLANTED inside the query, both engines
        // identically: docs with doc_id % 7 == 0 contribute a second
        // doc (+1000000) holding their first 40% of tokens — each
        // must surface as a contained pair at containment >= 8/10.
        // Output is all-integer (ids + counts): hash-exact with no
        // float discipline needed at all.
        val d = T(s, dir).documents
          .withColumn("ts", filter(split(col("text"), " "),
            x => x =!= ""))
        val planted = d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            array_join(expr(
              "slice(ts, 1, greatest(1, (size(ts)*2) div 5))"), " ")
              .as("text"))
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(planted)
        graft.operators.Dedup.containmentPairs(
          corpus, "text", "doc_id", thresholdNum = 8, thresholdDen = 10)
      },
      oracle = Some("""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000,
                 array_to_string(
                   list_slice(ts, 1, greatest(1, (len(ts)*2)//5)), ' ')
          FROM (SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '')
                         AS ts
                FROM documents WHERE doc_id % 7 = 0)),
        sh AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(ts) >= 3 THEN
                   list_transform(range(1, len(ts) - 1),
                     i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
                   ELSE [] END) AS s
          FROM (SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '')
                         AS ts
                FROM corpus) t),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.s, b.s)) AS BIGINT)
                   AS n_common,
                 CAST(len(a.s) AS BIGINT) AS n_a,
                 CAST(len(b.s) AS BIGINT) AS n_b
          FROM sh a JOIN sh b ON b.doc_id > a.doc_id
          WHERE len(a.s) > 0 AND len(b.s) > 0)
        SELECT CASE WHEN n_a <= n_b THEN id_a ELSE id_b END AS small_id,
               CASE WHEN n_a <= n_b THEN id_b ELSE id_a END AS big_id,
               n_common,
               CASE WHEN n_a <= n_b THEN n_a ELSE n_b END AS n_small
        FROM pairs
        WHERE n_common * 10 >= 8 *
              (CASE WHEN n_a <= n_b THEN n_a ELSE n_b END)"""),
      doc = "Corpus-wide asymmetric-containment dedup (excerpt " +
        "detection): inverted shingle index -> integer-exact verify; " +
        "planted 40%-prefix excerpts must all surface."),

    // ------------------------------------------------------------------
    "d18_minhash_md5" -> QueryDef(
      fn = { (s, dir) =>
        // The HASH-CHECKED twin of d03 (the q49/q50 pattern): the
        // IDENTICAL nearDupPairs pipeline — canonicalize-first
        // groups, LSH banding, bucket cap, exact-Jaccard verify,
        // membership expansion — run with the md5-portable hash
        // family, so DuckDB replays signatures, bands, candidates
        // and verification from scratch. d03 keeps the native
        // xxhash64 family (codegen'd, ~5-10x cheaper hashing) as the
        // registered fast path with its recall spec; a parameter
        // drift anywhere in the shared pipeline breaks THIS compare
        // loudly.
        Dedup.nearDupPairs(
          Engine.widenIfNarrow(T(s, dir).documents),
          "text", "doc_id", threshold = 0.5, numHashes = 24, bands = 8,
          hasher = Dedup.MinHashFamily.Md5)
      },
      oracle = Some(s"""
        WITH corpus AS (SELECT doc_id AS did, text FROM documents),
        ${OracleSql.nearDupPairsCtes("m", "corpus",
          numHashes = 24, bands = 8, threshold = 0.5,
          maxBucketSize = 1000)}
        SELECT id_a, id_b, jaccard FROM m_out"""),
      doc = "MinHash+LSH near-dup pairs on the md5-portable hash " +
        "family — the hash-checked twin of d03; the oracle replays " +
        "the entire LSH pipeline in DuckDB."),

    // ------------------------------------------------------------------
    "d19_simhash_md5" -> QueryDef(
      fn = { (s, dir) =>
        // The HASH-CHECKED twin of d04: a 60-bit md5-portable SimHash
        // (bit j of the signature = majority vote of token-hash bit j,
        // ties to 1, multiplicity preserved) fed through the SAME
        // banded-hamming core d04's simhashPairs uses
        // (Dedup.hammingPairs64: canonicalize-on-value, segment
        // buckets, bit_count verify, star + membership expansion).
        // bands=8 (seg=8) keeps 64 % bands == 0 with the top segment
        // carrying the 4 zero pad bits; maxHamming=7 < bands keeps
        // the pigeonhole guarantee, so the oracle can verify with a
        // plain all-pairs hamming filter over the reps — provably the
        // same pair set the banded join finds.
        import graft.functions.PortableHash
        val d = Engine.widenIfNarrow(T(s, dir).documents)
        val hvs = d.select(col("doc_id").as("did"),
          transform(TextFunctions.tokens(col("text")),
            t => PortableHash.uniform60(t)).as("hvs"))
          .filter(size(col("hvs")) > 0)
          .localCheckpoint() // 60 bit-majority aggregates read it below
        val sh = (0 until 60).map { j =>
          when(lit(2) * aggregate(col("hvs"), lit(0L),
            (acc, h) => acc + shiftright(h, j).bitwiseAND(lit(1L))) >=
              size(col("hvs")).cast("long"),
            lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
        Dedup.hammingPairs64(
          hvs.select(col("did"), sh.as("sh")),
          "did", "sh", maxHamming = 7, bands = 8)
      },
      oracle = Some(s"""
        WITH tok AS (
          SELECT did,
                 ${graft.functions.PortableHash.sqlUniform60("t")} AS hv
          FROM (SELECT doc_id AS did, unnest(${OracleSql.tsExpr}) AS t
                FROM documents)),
        bits AS (
          SELECT did, j.j AS j,
                 CAST(sum((hv >> j.j) & 1) AS BIGINT) AS sj,
                 CAST(count(*) AS BIGINT) AS n
          FROM tok, (SELECT unnest(range(0, 60)) AS j) j
          GROUP BY 1, 2),
        sh AS (
          SELECT did,
                 CAST(sum(CASE WHEN 2 * sj >= n THEN (1::BIGINT << j)
                          ELSE 0::BIGINT END) AS BIGINT) AS sh
          FROM bits GROUP BY did),
        g AS (SELECT did, sh, min(did) OVER (PARTITION BY sh) AS keep
              FROM sh),
        star AS (
          SELECT keep AS id_a, did AS id_b, 0 AS hamming
          FROM g WHERE did <> keep),
        reps AS (SELECT did, sh FROM g WHERE did = keep),
        rp AS (
          SELECT a.did AS id_a, b.did AS id_b,
                 CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
          FROM reps a JOIN reps b ON a.did < b.did
          WHERE bit_count(xor(a.sh, b.sh)) <= 7),
        exp AS (
          SELECT least(ma.did, mb.did) AS id_a,
                 greatest(ma.did, mb.did) AS id_b, rp.hamming
          FROM rp JOIN g ma ON ma.keep = rp.id_a
                  JOIN g mb ON mb.keep = rp.id_b)
        SELECT id_a, id_b, CAST(min(hamming) AS INTEGER) AS hamming
        FROM (SELECT * FROM exp UNION ALL SELECT * FROM star)
        GROUP BY id_a, id_b"""),
      doc = "SimHash near-dup pairs on a 60-bit md5-portable " +
        "signature through the shared banded-hamming core — the " +
        "hash-checked twin of d04 (oracle: all-pairs hamming filter, " +
        "equivalent by the segment pigeonhole)."),

    // ------------------------------------------------------------------
    "d20_vec_dedup_sync" -> QueryDef(
      fn = { (s, dir) =>
        // VecDedupSync under the DRIVER gate (c36's treatment, vector
        // side): three version-striped batches stream through the
        // two-store exactly-once composition — pairs-first/index-
        // second, TableSync storage bootstrapped deliberately
        // undersized with the split trigger forcing max splits every
        // batch — and the accumulated pairs view must equal the
        // ONE-SHOT embeddingDupPairs run on the whole corpus. The
        // equivalence is exact here because the corpus has no
        // vec-identical groups (verified; a >= 3-way identical group
        // straddling batches would legitimately add non-min boundary
        // pairs the one-shot star omits) and no bucket approaches the
        // cap; the small-fixture spec pins the group/boundary cases.
        val path = d20Dir(dir)
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        (0L to 2L).foreach { b =>
          graft.streaming.VecDedupSync.applyVecs(
            e.filter(pmod(col("vec_id"), lit(3)) === b),
            s"$path/ix", s"$path/pr", "embedding", "vec_id", b,
            threshold = 0.35, numBuckets = 8, maxBucketBytes = 1L,
            splitsPerBatch = 4)
        }
        graft.streaming.VecDedupSync.readPairs(s, s"$path/pr")
          .select(col("id_a"), col("id_b"),
            round(col("cosine"), 4).as("cosine"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // the one-shot embeddingDupPairs replay (d06's SQL) with the
        // plane tensor regenerated from the engine's splitmix64
        // arithmetic — streaming ingestion across an evolving store
        // must land on exactly this set
        val m = OracleSql.sqlDoubleArr3(
          VectorFunctions.planeMatrix(bits = 4, tables = 12, dim = 64))
        s"""
        WITH pl AS (SELECT $m::DOUBLE[][][] AS m),
        g0 AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS vec
               FROM embeddings
               WHERE embedding IS NOT NULL
                 AND len(list_filter(embedding, x -> x != 0)) > 0),
        g AS (SELECT did, vec, min(did) OVER (PARTITION BY vec) AS keep
              FROM g0),
        reps AS (SELECT did AS id, vec FROM g WHERE did = keep),
        sigs AS (SELECT r.id, t.t AS tbl,
                        CAST(list_sum(list_transform(range(0, 4),
                          p -> CASE WHEN list_dot_product(
                                 pl.m[t.t + 1][p + 1], r.vec) >= 0
                               THEN (1::BIGINT << p)
                               ELSE 0::BIGINT END)) AS BIGINT) AS bucket
                 FROM reps r, pl,
                      (SELECT unnest(range(0, 12)) AS t) t),
        ok AS (SELECT tbl, bucket FROM sigs
               GROUP BY tbl, bucket HAVING count(*) <= 10000),
        sized AS (SELECT s.* FROM sigs s
                  SEMI JOIN ok ON s.tbl = ok.tbl AND s.bucket = ok.bucket),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM sized a JOIN sized b
                   ON a.tbl = b.tbl AND a.bucket = b.bucket
                  AND a.id < b.id),
        rp AS (SELECT c.id_a, c.id_b,
                      list_cosine_similarity(ra.vec, rb.vec) AS cosine
               FROM cand c JOIN reps ra ON ra.id = c.id_a
                           JOIN reps rb ON rb.id = c.id_b
               WHERE list_cosine_similarity(ra.vec, rb.vec) >= 0.35),
        expd AS (SELECT least(ma.did, mb.did) AS id_a,
                        greatest(ma.did, mb.did) AS id_b, rp.cosine
                 FROM rp JOIN g ma ON ma.keep = rp.id_a
                         JOIN g mb ON mb.keep = rp.id_b),
        star AS (SELECT keep AS id_a, did AS id_b, 1.0 AS cosine
                 FROM g WHERE did != keep),
        u AS (SELECT * FROM expd UNION ALL SELECT * FROM star)
        SELECT id_a, id_b, round(max(cosine), 4) AS cosine
        FROM u GROUP BY id_a, id_b"""
      },
      doc = "Streaming vector dedup (VecDedupSync) under the gate: " +
        "3 batches through the pairs-first/index-second two-store " +
        "commit with storage splits forced every batch — accumulated " +
        "pairs equal the one-shot embeddingDupPairs set " +
        "(hash-checked; regenerated plane tensor)."),

    // ------------------------------------------------------------------
    "d21_vec_refined_dups" -> QueryDef(
      fn = { (s, dir) =>
        // PER-BUCKET REFINEMENT under the DRIVER gate: d13's
        // incremental probe with the cap tightened to 50, so EVERY
        // base bucket is overfull at this scale and the candidate
        // stage runs entirely through refined deep-signature keys
        // (depth = 4 + ceil(log2(overflow)) per bucket, from the
        // index's own occupancy). The oracle replays the WHOLE
        // refinement pipeline in SQL — 16-plane signatures, base
        // occupancy, the integer depth ladder, masked keys, the
        // refined-level cap, the probe join — from a regenerated
        // plane tensor; DedupSpec separately proves the recall claim
        // on a planted flood.
        val e = Engine.widenIfNarrow(T(s, dir).embeddings)
        val index = Dedup.vecDedupIndex(
          e.filter(col("vec_id") % 5 =!= 0), "embedding", "vec_id")
        Dedup.incrementalVecDups(index,
          e.filter(col("vec_id") % 5 === 0), "embedding", "vec_id",
          threshold = 0.35, maxBucketSize = 50)
          .select(col("id_a"), col("id_b"),
            round(col("cosine"), 4).as("cosine"))
      },
      oracle = None,
      oracleGen = Some { (s, dir) =>
        // the FULL 16-plane refinement tensor (depth headroom
        // included), regenerated from the engine's arithmetic
        val m = OracleSql.sqlDoubleArr3(
          VectorFunctions.planeMatrix(bits = 16, tables = 12, dim = 64))
        s"""
        WITH pl AS (SELECT $m::DOUBLE[][][] AS m),
        ixg0 AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS vec
                 FROM embeddings WHERE vec_id % 5 != 0
                   AND embedding IS NOT NULL
                   AND len(list_filter(embedding, x -> x != 0)) > 0),
        ixg AS (SELECT did, vec, min(did) OVER (PARTITION BY vec) AS keep
                FROM ixg0),
        nbg0 AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS vec
                 FROM embeddings WHERE vec_id % 5 = 0
                   AND embedding IS NOT NULL
                   AND len(list_filter(embedding, x -> x != 0)) > 0),
        nbg AS (SELECT did, vec, min(did) OVER (PARTITION BY vec) AS keep
                FROM nbg0),
        ixr AS (SELECT did AS id, vec FROM ixg WHERE did = keep),
        nbr AS (SELECT did AS id, vec FROM nbg WHERE did = keep),
        tt AS (SELECT unnest(range(0, 12)) AS t),
        ixs AS (SELECT r.id, tt.t AS tbl,
                       CAST(list_sum(list_transform(range(0, 16),
                         p -> CASE WHEN list_dot_product(
                                pl.m[tt.t + 1][p + 1], r.vec) >= 0
                              THEN (1::BIGINT << p)
                              ELSE 0::BIGINT END)) AS BIGINT) AS sig
                FROM ixr r, pl, tt),
        nbs AS (SELECT r.id, tt.t AS tbl,
                       CAST(list_sum(list_transform(range(0, 16),
                         p -> CASE WHEN list_dot_product(
                                pl.m[tt.t + 1][p + 1], r.vec) >= 0
                              THEN (1::BIGINT << p)
                              ELSE 0::BIGINT END)) AS BIGINT) AS sig
                FROM nbr r, pl, tt),
        ixb AS (SELECT id, tbl, sig, sig & 15 AS bucket FROM ixs),
        nbb AS (SELECT id, tbl, sig, sig & 15 AS bucket FROM nbs),
        -- refinement map: exact integer depth ladder, engine-identical
        -- (ratio = ceil(cnt / 50); extra = bit_length(ratio - 1))
        refine AS (
          SELECT tbl, bucket,
                 least(16, 4 + CASE
                   WHEN r <= 1 THEN 0 WHEN r <= 2 THEN 1
                   WHEN r <= 4 THEN 2 WHEN r <= 8 THEN 3
                   WHEN r <= 16 THEN 4 WHEN r <= 32 THEN 5
                   WHEN r <= 64 THEN 6 WHEN r <= 128 THEN 7
                   WHEN r <= 256 THEN 8 WHEN r <= 512 THEN 9
                   WHEN r <= 1024 THEN 10 WHEN r <= 2048 THEN 11
                   ELSE 12 END) AS depth
          FROM (SELECT tbl, bucket, (cnt + 49) // 50 AS r
                FROM (SELECT tbl, bucket, count(*) AS cnt
                      FROM ixb GROUP BY 1, 2)
                WHERE cnt > 50)),
        ixk AS (SELECT b.id, b.tbl,
                       b.sig & ((1::BIGINT << coalesce(rf.depth, 4)) - 1)
                         AS kk
                FROM ixb b LEFT JOIN refine rf
                  ON rf.tbl = b.tbl AND rf.bucket = b.bucket),
        okr AS (SELECT tbl, kk FROM ixk
                GROUP BY tbl, kk HAVING count(*) <= 50),
        ixok AS (SELECT k.* FROM ixk k
                 SEMI JOIN okr ON k.tbl = okr.tbl AND k.kk = okr.kk),
        nbk AS (SELECT b.id, b.tbl,
                       b.sig & ((1::BIGINT << coalesce(rf.depth, 4)) - 1)
                         AS kk
                FROM nbb b LEFT JOIN refine rf
                  ON rf.tbl = b.tbl AND rf.bucket = b.bucket),
        cand AS (SELECT DISTINCT i.id AS ix_rep, n.id AS n_rep
                 FROM ixok i JOIN nbk n
                   ON n.tbl = i.tbl AND n.kk = i.kk
                 WHERE i.id != n.id),
        lshrp AS (SELECT c.ix_rep, c.n_rep,
                         list_cosine_similarity(a.vec, b.vec) AS cosine
                  FROM cand c JOIN ixr a ON a.id = c.ix_rep
                              JOIN nbr b ON b.id = c.n_rep
                  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.35),
        exb AS (SELECT a.id AS ix_rep, b.id AS n_rep, 1.0 AS cosine
                FROM ixr a JOIN nbr b ON a.vec = b.vec),
        rp AS (SELECT ix_rep, n_rep, max(cosine) AS cosine
               FROM (SELECT * FROM lshrp UNION ALL SELECT * FROM exb)
               GROUP BY ix_rep, n_rep),
        crossp AS (SELECT least(ma.did, mb.did) AS id_a,
                          greatest(ma.did, mb.did) AS id_b, rp.cosine
                   FROM rp JOIN ixg ma ON ma.keep = rp.ix_rep
                           JOIN nbg mb ON mb.keep = rp.n_rep
                   WHERE ma.did != mb.did),
        -- within-batch leg: BASE-depth buckets with the cap (the
        -- engine's vecPairsFromIndex semantics)
        bok AS (SELECT tbl, bucket FROM nbb
                GROUP BY tbl, bucket HAVING count(*) <= 50),
        bcand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                  FROM (SELECT s.* FROM nbb s SEMI JOIN bok
                          ON s.tbl = bok.tbl AND s.bucket = bok.bucket) a
                  JOIN (SELECT s.* FROM nbb s SEMI JOIN bok
                          ON s.tbl = bok.tbl AND s.bucket = bok.bucket) b
                    ON a.tbl = b.tbl AND a.bucket = b.bucket
                   AND a.id < b.id),
        brp AS (SELECT c.id_a, c.id_b,
                       list_cosine_similarity(ra.vec, rb.vec) AS cosine
                FROM bcand c JOIN nbr ra ON ra.id = c.id_a
                             JOIN nbr rb ON rb.id = c.id_b
                WHERE list_cosine_similarity(ra.vec, rb.vec) >= 0.35),
        bexp AS (SELECT least(ma.did, mb.did) AS id_a,
                        greatest(ma.did, mb.did) AS id_b, brp.cosine
                 FROM brp JOIN nbg ma ON ma.keep = brp.id_a
                          JOIN nbg mb ON mb.keep = brp.id_b),
        bstar AS (SELECT keep AS id_a, did AS id_b, 1.0 AS cosine
                  FROM nbg WHERE did != keep),
        bpairs AS (SELECT id_a, id_b, max(cosine) AS cosine
                   FROM (SELECT * FROM bexp UNION ALL SELECT * FROM bstar)
                   GROUP BY id_a, id_b),
        u AS (SELECT * FROM crossp UNION ALL SELECT * FROM bpairs)
        SELECT id_a, id_b, round(max(cosine), 4) AS cosine
        FROM u GROUP BY id_a, id_b"""
      },
      doc = "Incremental vector dedup with EVERY base bucket overfull " +
        "(cap 50): candidates run entirely through per-bucket " +
        "deep-signature refinement — occupancy-derived depths, masked " +
        "stored-prefix keys, refined-level cap — all replayed in SQL " +
        "from a regenerated 16-plane tensor (hash-checked)."),

    // ------------------------------------------------------------------
    "d22_text_refined_dups" -> QueryDef(
      fn = { (s, dir) =>
        // TEXT band-bucket refinement under the DRIVER gate (the d21
        // treatment, text side): every doc gains a shared 40-token
        // boilerplate prefix, so the bands whose minhash coordinates
        // all come from the boilerplate crowd the same buckets far
        // past cap = 10 — the template-family regime — and the cross
        // probe runs through ITERATIVE appended-coordinate refinement
        // (Dedup.incrementalPairs). The oracle replays the whole
        // pipeline via the md5-portable family: signatures, band
        // slices, per-round occupancy + the exact integer depth
        // ladder, appended-slice keys (chained-hash equality ==
        // concatenated-slice equality), the refined-level cap, exact
        // Jaccard, the fingerprint leg, and the within-batch
        // composite at the same cap.
        val boiler = (1 to 40).map(i => s"tmpl$i").mkString(" ")
        val d = T(s, dir).documents.select(col("doc_id"),
          concat(lit(boiler + " "), col("text")).as("text"))
        val index = Dedup.dedupIndex(
          d.filter(col("doc_id") % 5 =!= 0), "text", "doc_id",
          numHashes = 24, hasher = Dedup.MinHashFamily.Md5)
          .localCheckpoint()
        val newIdx = Dedup.dedupIndex(
          d.filter(col("doc_id") % 5 === 0), "text", "doc_id",
          numHashes = 24, hasher = Dedup.MinHashFamily.Md5)
          .localCheckpoint()
        Dedup.incrementalPairs(index, newIdx, threshold = 0.6,
          numHashes = 24, bands = 8, maxBucketSize = 10)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 4).as("jaccard"))
      },
      oracle = Some(s"""
        WITH pre AS (
          SELECT doc_id AS did,
                 '${(1 to 40).map(i => s"tmpl$i").mkString(" ")} ' || text
                   AS text
          FROM documents),
        corpus AS (SELECT did, text FROM pre WHERE did % 5 <> 0),
        batch AS (SELECT did, text FROM pre WHERE did % 5 = 0),
        ${OracleSql.incrementalRefinedCrossCtes("x", "corpus", "batch",
          numHashes = 24, bands = 8, threshold = 0.6,
          maxBucketSize = 10)},
        ${OracleSql.nearDupPairsCtes("w", "batch",
          numHashes = 24, bands = 8, threshold = 0.6,
          maxBucketSize = 10)}
        SELECT id_a, id_b, round(max(jaccard), 4) AS jaccard
        FROM (SELECT * FROM x_cross UNION ALL SELECT * FROM w_out)
        GROUP BY id_a, id_b"""),
      doc = "Incremental text dedup through a corpus-wide boilerplate " +
        "flood (every band bucket overfull at cap 10): the cross " +
        "probe's iterative appended-coordinate refinement replayed " +
        "end-to-end in SQL — per-round occupancy, integer depth " +
        "ladder, concatenated-slice keys, refined-level cap " +
        "(hash-checked; md5-portable family)."),

    // ------------------------------------------------------------------
    "d23_text_dedup_sync" -> QueryDef(
      fn = { (s, dir) =>
        // DedupSync (the TEXT streaming sink) under the DRIVER gate —
        // d20's treatment, text side: three id-striped batches stream
        // through the pairs-first/index-second two-store commit with
        // the TableSync index bootstrapped undersized and the split
        // trigger forcing max splits every batch; the accumulated
        // pairs view must equal the composed incremental semantics.
        // The oracle replays the composition faithfully rather than
        // assuming one-shot equivalence (fp-equal docs may differ in
        // RAW text, so expansions and per-doc probes can legitimately
        // diverge from the canonicalized one-shot on adversarial
        // corpora): batch 0 within-pairs, then each later batch's
        // REFINED cross probe against the union of earlier batches
        // plus its own within-pairs, canonicalized and max-merged —
        // exactly applyDocs' write path.
        val path = cachedTmpDir("tsync-d23", dir)
        val d = T(s, dir).documents.select(col("doc_id"), col("text"))
        (0L to 2L).foreach { b =>
          graft.streaming.DedupSync.applyDocs(
            d.filter(pmod(col("doc_id"), lit(3)) === b),
            s"$path/ix", s"$path/pr", "text", "doc_id", b,
            threshold = 0.5, numHashes = 24, bands = 8,
            hasher = Dedup.MinHashFamily.Md5,
            numBuckets = 8, maxBucketBytes = 1L, splitsPerBatch = 4)
        }
        graft.streaming.DedupSync.readPairs(s, s"$path/pr")
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 4).as("jaccard"))
      },
      oracle = Some(s"""
        WITH b0 AS (SELECT doc_id AS did, text FROM documents
                    WHERE doc_id % 3 = 0),
        b1 AS (SELECT doc_id AS did, text FROM documents
               WHERE doc_id % 3 = 1),
        b2 AS (SELECT doc_id AS did, text FROM documents
               WHERE doc_id % 3 = 2),
        b01 AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1),
        ${OracleSql.incrementalRefinedCrossCtes("x1", "b0", "b1",
          numHashes = 24, bands = 8, threshold = 0.5,
          maxBucketSize = 1000)},
        ${OracleSql.incrementalRefinedCrossCtes("x2", "b01", "b2",
          numHashes = 24, bands = 8, threshold = 0.5,
          maxBucketSize = 1000)},
        ${OracleSql.nearDupPairsCtes("w0", "b0",
          numHashes = 24, bands = 8, threshold = 0.5,
          maxBucketSize = 1000)},
        ${OracleSql.nearDupPairsCtes("w1", "b1",
          numHashes = 24, bands = 8, threshold = 0.5,
          maxBucketSize = 1000)},
        ${OracleSql.nearDupPairsCtes("w2", "b2",
          numHashes = 24, bands = 8, threshold = 0.5,
          maxBucketSize = 1000)}
        SELECT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b,
               round(max(jaccard), 4) AS jaccard
        FROM (SELECT * FROM x1_cross UNION ALL SELECT * FROM x2_cross
              UNION ALL SELECT * FROM w0_out
              UNION ALL SELECT * FROM w1_out
              UNION ALL SELECT * FROM w2_out)
        GROUP BY 1, 2"""),
      doc = "Streaming text dedup (DedupSync) under the gate: 3 " +
        "batches through the two-store commit with storage splits " +
        "forced every batch — accumulated pairs equal the composed " +
        "incremental replay (refined cross probes + per-batch " +
        "within-pairs, canonicalized, max-merged; md5-portable " +
        "family, hash-checked)."))

  /** One cached store dir per (tag, sfDir), wiped at entry (TableSync
    * no-ops on already-applied batch ids) and removed at JVM exit —
    * the c36Dir discipline; repeated bench runs must not leak stores.
    */
  private val tmpDirs =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }
  private def cachedTmpDir(tag: String, dir: String): String = {
    val path = tmpDirs.getOrElseUpdate((tag, dir), {
      // PID-scoped like CurationQueries.cachedTmpDir: two JVMs on the
      // same sfDir must not wipe each other's live state
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
  private def d20Dir(dir: String): String = cachedTmpDir("vsync-d20", dir)
  private def annixDir(dir: String): String = cachedTmpDir("annix", dir)
  private def annixaDir(dir: String): String = cachedTmpDir("annixa", dir)
  private def annixdDir(dir: String): String = cachedTmpDir("annixd", dir)
  private def annixrDir(dir: String): String = cachedTmpDir("annixr", dir)
}
