package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Guards the physical-plan properties the 100 TB story depends on:
  * pushdown, pruning, broadcast joins, top-k without global sort,
  * whole-stage codegen. A regression here is a performance bug even
  * while every correctness test stays green.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"no pushed filters in:\n$p")
    assert(p.contains("ReadSchema") &&
      !p.contains("l_extendedprice"), "projection not pruned")
  }

  test("q03: dim join is a broadcast hash join, not SMJ") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"no BHJ in:\n$p")
    assert(!p.contains("SortMergeJoin"), "unexpected SMJ")
  }

  test("q04: star join broadcasts every dim") {
    val p = plan("q04_star_join")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"expected >=3 BHJ, got $bhj")
  }

  test("q06: top-k plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q06_topk")
    assert(p.contains("TakeOrderedAndProject"), s"no TOAP in:\n$p")
  }

  test("q01: aggregation is partial+final hash agg") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate")
  }

  test("native cosine projection runs inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    val e = graft.Engine.Tables(spark, dir).embeddings
    val df = e.select(graft.functions.VectorFunctions
      .cosineSim(col("embedding"), col("embedding")).as("c"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(p.contains("*(1) Project"), s"no codegen stage in:\n$p")
    assert(p.contains("cosine_sim"), "native expression missing")
    // and it actually executes through the generated path
    assert(df.limit(5).collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("c01 curation: exactly one exchange (the fingerprint agg shuffle)") {
    val p = plan("c01_curation")
    val exchanges = "Exchange".r.findAllIn(p).size
    // AQE may show the same exchange as a shuffle-read stage; what must
    // NOT happen is a second shuffle for the quality gate
    assert(exchanges <= 2, s"expected a single shuffle, plan:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final agg on the fingerprint")
  }

  test("c02 hash sample: pure scan+filter, no shuffle at all") {
    val p = plan("c02_hash_sample")
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(p.contains("Filter"), "expected the threshold filter")
  }

  test("d06 embedding LSH: no float-array column crosses an exchange") {
    val p = plan("d06_embedding_lsh_dups")
    val exchangeLines = p.linesIterator
      .filter(_.contains("Exchange")).mkString("\n")
    // candidate generation and dedup shuffle ids/buckets only; the
    // wide embedding vectors are re-joined after the distinct
    assert(!exchangeLines.contains("embedding"),
      s"vector column in exchange:\n$exchangeLines")
  }

  test("q33: interval join is an equi-join on user_id, never BNLJ") {
    val p = plan("q33_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to BNLJ:\n$p")
    assert(p.contains("Join"), "expected a join")
  }

  test("t07 top-ngrams: top-k via TakeOrderedAndProject, not global sort") {
    val p = plan("t07_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), s"no TOAP in:\n$p")
  }

  test("s01 rank<=k filter plans WindowGroupLimit (per-key top-k pushdown)") {
    val p = plan("s01_topk_bruteforce")
    // Spark 3.5+ rewrites rank-filter into a per-group limit BEFORE
    // the window sort — without it every group fully sorts at scale
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("c05 decontamination: eval set broadcast, corpus side never shuffles") {
    val p = plan("c05_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast semi-join in:\n$p")
    // the only exchanges allowed are for the (tiny) eval n-gram
    // distinct and the final per-doc agg — never a join shuffle of
    // the exploded corpus stream
    assert(!p.contains("SortMergeJoin"),
      s"corpus side shuffled for the join:\n$p")
  }

  test("c07 top-k per source plans WindowGroupLimit, not full sort") {
    val p = plan("c07_topk_per_source")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("q35 LATERAL decorrelates to partial WindowGroupLimit + broadcast join") {
    val p = plan("q35_lateral_topk")
    // the correlated LATERAL-with-LIMIT must NOT execute per outer row:
    // Catalyst rewrites it to top-k-per-group (partial group limit
    // below the shuffle) joined hash-wise to the outer side
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"no partial group limit in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no hash join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), "per-row nested loop")
  }

  test("d10 incremental dedup: every corpus-side join is a broadcast probe") {
    val p = plan("d10_incremental_dedup")
    // bucket probe + candidate verify + fingerprint cross: all three
    // corpus-side joins carry explicit broadcast hints — the index is
    // streamed, never shuffled (within-batch LSH joins operate on the
    // small batch only)
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 4, s"expected >=4 broadcast joins, got $bhj in:\n$p")
  }

  test("s13 filtered ANN: predicate pushed to documents scan, " +
    "bucketed candidate join broadcasts the probe side") {
    val p = plan("s13_filtered_ann_lsh")
    // the lang filter reaches the documents parquet scan...
    assert(p.contains("PushedFilters") && p.contains("lang"),
      s"lang predicate not pushed:\n$p")
    // ...the corpus restriction is a semi-join before any vector math
    assert(p.contains("LeftSemi"), s"no semi-join pre-filter:\n$p")
    // ...and candidates come from the bucketed (table, bucket) hash
    // join with the query-probe side broadcast — never a sort-merge
    // of the corpus, never a nested-loop scan
    assert(p.contains("BroadcastHashJoin"), s"no broadcast probe:\n$p")
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"corpus side must not SMJ/BNLJ:\n$p")
  }

  test("s14 IVF x PQ: ADC scan input is the probed-cell broadcast " +
    "hash join, never a corpus cross join") {
    val p = plan("s14_topk_ivfpq")
    // the probe side (qid, cell, lut) broadcasts into a HASH join on
    // cell — the composition's whole point is that the ADC scan never
    // meets the unprobed corpus
    assert(p.contains("BroadcastHashJoin"), s"no broadcast cell join:\n$p")
    assert(!p.contains("CartesianProduct"), s"corpus cross join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side SMJ:\n$p")
    // corpus-side cell assignment + encoding is a map pass: the only
    // BNLJ allowed is none — s07's crossJoin shape must be gone
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"ADC ran as a nested-loop corpus scan:\n$p")
  }

  test("s15/s16 bucketed twins: candidates come from the broadcast " +
    "bucket hash join — never the anchors' nested-loop corpus scan") {
    Seq("s15_hard_negatives_lsh", "s16_bitext_margin_lsh").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n: no broadcast probe:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"$n: full corpus scan in:\n$p")
    }
    // s15's joins are all broadcast (candidates, labels, rescore);
    // s16's backward-neighborhood join keys on cid — candidate-
    // bounded but corpus-cardinality, so it is deliberately NOT
    // broadcast (s12's shape) and a shuffle join there is correct
    val p15 = plan("s15_hard_negatives_lsh")
    assert(!p15.contains("SortMergeJoin"), s"s15 corpus-side SMJ:\n$p15")
  }

  test("s17 IVF x SQ: quantized scan input is the probed-cell " +
    "broadcast hash join, never a corpus cross join") {
    val p = plan("s17_topk_ivfsq")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast cell join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"corpus-wide scan crept in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side SMJ:\n$p")
  }

  test("s18 persisted ANN index: probed cells reach the codes scan " +
    "as PARTITION filters (planning-time directory pruning), and " +
    "the candidate scan is the broadcast cell join") {
    val p = plan("s18_ann_index_persisted")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no cell partition filter on the codes scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast cell join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"corpus-wide scan crept in:\n$p")
  }

  test("s19 appended ANN index: cell partition pruning holds across " +
    "build + appended segments, probe stays the broadcast cell join") {
    val p = plan("s19_ann_index_append")
    // the codes layout is seg=<s>/cell=<c>; the probe's isin filter
    // must still prune at the CELL level (i.e. within every segment),
    // or an append would silently widen each probe to whole segments
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no cell partition filter on the multi-segment codes scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast cell join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"corpus-wide scan crept in:\n$p")
  }

  test("s20 deleted ANN index: tombstone filtering rides ABOVE the " +
    "scan — cell partition pruning survives, the tombstone anti-join " +
    "broadcasts, and no corpus-wide join appears") {
    val p = plan("s20_ann_index_delete")
    // the delete's liveOnly anti-join must not push the codes scan
    // off its planning-time cell-partition pruning
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no cell partition filter on the tombstoned codes scan:\n$p")
    // tombstones are id-bounded and broadcast into the anti-join
    assert(p.contains("BroadcastNestedLoopJoin LeftAnti") ||
      "BroadcastHashJoin [^\\n]*LeftAnti".r.findFirstIn(p).isDefined,
      s"tombstone anti-join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"corpus-wide scan crept in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side SMJ:\n$p")
  }

  test("d13 incremental vec dedup: index side never sort-merge-joins") {
    val p = plan("d13_incremental_vec_dedup")
    // cross-boundary candidates + verification come in as broadcasts;
    // the persisted index is streamed (d10's contract, vector side)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected broadcast probes:\n$p")
    assert(!p.contains("SortMergeJoin"), s"index-side SMJ:\n$p")
  }

  test("c19 fuzzy decon: corpus index streams through broadcast probes") {
    // same operator contract as d10 (the eval set is the broadcast
    // batch side); the corpus index must never shuffle or sort
    val p = plan("c19_fuzzy_decontam")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 4, s"expected >=4 broadcast joins, got $bhj in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side SMJ:\n$p")
  }

  test("q52 skewed join: the join runs on (k, __salt) as a shuffle " +
    "join — the hot key is spread, nothing broadcasts the fact side") {
    val p = plan("q52_skew_join")
    // the salt participates in the join keys (the spread mechanism)
    assert("(ShuffledHashJoin|SortMergeJoin) \\[k#\\d+L?, __salt"
      .r.findFirstIn(p).isDefined,
      s"join does not key on (k, __salt):\n$p")
    // honest shuffle-join shape: the dim is past broadcast size by
    // assumption at scale, and the hint pins it
    assert(!p.contains("BroadcastHashJoin"), s"dim broadcast crept in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"degenerate join:\n$p")
  }

  test("AQE splits a deliberately skewed join partition (skew-join " +
    "path taken, observed in the final adaptive plan)") {
    import org.apache.spark.sql.functions._
    // thresholds scaled to fixture bytes so the default-on skew
    // machinery (Engine.session arms it) actually fires: a partition
    // is "skewed" past 64 KB and 2x the median, split toward 16 KB
    // advisory chunks. Broadcast disabled so the join genuinely
    // shuffles both sides — the regime where skew exists at all.
    val prior = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "65536")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      // 200k fact rows, 90% on one hot key; dim unique per key with
      // a wide payload so the hot partition's bytes dominate
      val fact = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 200000).select(col("id").as("k"),
        concat(lit("attr-"), col("id")).as("attr"))
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val row = joined.collect().head
      assert(row.getLong(0) == 200000L, s"join row count ${row.getLong(0)}")
      // the FINAL adaptive plan must show the skew-split read — the
      // property q52's salted twin provides statically
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
      assert(p.contains("skewed"),
        s"no skew-split AQEShuffleRead in final plan:\n$p")
    } finally prior.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None    => spark.conf.unset(k)
      }
    }
  }

  test("t12 readability: single codegen map pass, no shuffle") {
    val p = plan("t12_readability")
    assert(!p.contains("Exchange"), s"t12 shuffles:\n$p")
  }

  test("c20 token budget: corpus window partitions by bucket, no global sort") {
    val p = plan("c20_token_budget")
    // SinglePartition exchanges allowed only for the tiny sides: the
    // ~100-row bucket-offset window and the 1-row total agg; the
    // per-doc cumsum must partition by bucket
    val single = "Exchange SinglePartition".r.findAllIn(p).size
    assert(single <= 2, s"corpus-wide single-partition window:\n$p")
    assert(p.contains("hashpartitioning(bucket"),
      s"per-doc window not bucket-partitioned:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"offsets/total not broadcast:\n$p")
  }

  test("c11 upsert: anti-join broadcasts the update set; base never shuffles") {
    val p = plan("c11_upsert")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"base side shuffled:\n$p")
  }

  test("q25: bucketed join never hash-shuffles a fact side") {
    // at tiny SF Catalyst may pick BHJ (broadcast, not a shuffle);
    // what must never appear is a hash-partition exchange — bucketing
    // already co-located the join key (LayoutSpec pins the SMJ case)
    val p = plan("q25_bucketed_join")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
  }

  test("approx_count_distinct is within HLL error bounds") {
    val got = SparkEntry.queries("q23_approx_distinct")(spark, dir).head()
    val li = graft.Engine.Tables(spark, dir).lineitem
    val exactParts = li.select("l_partkey").distinct().count()
    val exactOrders = li.select("l_orderkey").distinct().count()
    assert(math.abs(got.getLong(0) - exactParts).toDouble / exactParts < 0.1)
    assert(math.abs(got.getLong(1) - exactOrders).toDouble / exactOrders < 0.1)
  }

  test("s06 sparse tfidf: inverted-index equi-join, never cartesian") {
    val p = plan("s06_topk_sparse")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in sparse similarity:\n$p")
    // final selection is top-k machinery, not a global sort
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator:\n$p")
  }

  test("c18 domain mix: per-domain rates broadcast back to the corpus") {
    val p = plan("c18_domain_mix")
    assert(p.contains("BroadcastHashJoin"),
      s"rates not broadcast — corpus would shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ:\n$p")
  }

  test("q37 histogram: single partial+final hash agg, no extra exchange") {
    val p = plan("q37_histogram")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n$p")
  }

  test("t11 bm25: query-term filter precedes the shuffle; df/stats broadcast") {
    val p = plan("t11_bm25")
    // df table and corpus stats must come in as broadcasts — the big
    // (doc, term) side never re-shuffles for them
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1 &&
      p.contains("BroadcastNestedLoopJoin"), // 1-row stats cross join
      s"df/stats not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ:\n$p")
    // the In() filter on query terms runs in the scan stage, upstream
    // of the tf shuffle: plans print top-down, so the filter must sit
    // AFTER (deeper than) the doc_id/token hash Exchange in the string
    val tfShuffle = p.indexOf("Exchange hashpartitioning(doc_id")
    val termFilter = p.indexOf("IN (data,model")
    assert(tfShuffle > 0 && termFilter > tfShuffle,
      s"query-term filter not below the tf shuffle:\n$p")
  }

  test("d12 span dedup: shuffle carries hashes, not span text") {
    val q = SparkEntry.queries("d12_span_dedup")(spark, dir)
    val p = q.queryExecution.executedPlan.toString
    // the md5 projection happens in the scan stage: everything
    // downstream of the shuffle (printed ABOVE the Exchange) may only
    // reference span_hash#, never the raw span# string attribute
    val exchangeIdx = p.indexOf("Exchange")
    assert(exchangeIdx > 0)
    val downstream = p.substring(0, exchangeIdx)
    assert(!downstream.contains("span#") && downstream.contains("span_hash"),
      s"span text crosses the shuffle:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final agg for countDistinct")
  }

  test("q41 anomaly: one window shuffle, no join, no extra exchange") {
    val p = plan("q41_anomaly")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected exactly the window partition shuffle, got $exchanges:\n$p")
    assert(p.contains("Window"), s"no window operator:\n$p")
  }

  test("d15: the threshold rule reaches the filter through the alias") {
    // the registered query filters on the PROJECTED sim column; the
    // optimizer must collapse the alias so JaroWinklerThresholdRule
    // sees `jaro_winkler(a,b) >= 0.93` and installs the length-bound
    // early exit in the filter's kernel call
    val q = SparkEntry.queries("d15_jaro_linkage")(spark, dir)
    val opt = q.queryExecution.optimizedPlan
    val bounded = opt.collect { case node => node.expressions }.flatten
      .flatMap(_.collect {
        case org.apache.spark.sql.graft.expressions
          .JaroWinkler(_, _, Some(t)) => t
      })
    assert(bounded == Seq(0.93), s"no bounded jaro_winkler in:\n$opt")
  }

  test("s11 filtered ANN: lang filter pushed to the documents scan; " +
    "pre-filter semi-join and query side both broadcast") {
    val p = plan("s11_filtered_ann")
    // predicate pushdown: the lang filter must reach the parquet scan
    assert(p.contains("PushedFilters:") && p.contains("lang"),
      s"lang filter not pushed in:\n$p")
    // the metadata restriction is a semi-join BEFORE scoring, and both
    // small sides (en ids, query vectors) broadcast — the embedding
    // scan itself must never shuffle for this plan
    assert(p.contains("LeftSemi"), s"no semi-join in:\n$p")
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(p).size >= 2, s"expected 2 broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), "embedding side shuffled")
  }

  test("t17 keywords: df table and corpus count broadcast; the only " +
    "exchanges are the tf agg and the per-doc window") {
    val p = plan("t17_tfidf_keywords")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1 &&
      "BroadcastNestedLoopJoin|BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"df/n_docs not broadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side SMJ in:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=3 not pushed into the window in:\n$p")
  }

  test("c30 curriculum: zero-shuffle map over a broadcast epoch table") {
    val p = plan("c30_curriculum")
    // the 3-row epoch table broadcasts; the corpus scan itself must
    // not exchange at all — membership is a pure per-row predicate
    assert(!p.contains("SortMergeJoin"), s"SMJ in:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 0, s"corpus shuffled ($exchanges):\n$p")
  }

  test("m09 scene cuts: ascii-id restriction joins BELOW the frame-diff " +
    "pass (no byte-diff work on rows the predicate discards)") {
    val p = plan("m09_scene_cuts")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"SMJ in:\n$p")
    // plans print root-first: the MapPartitions (frameDiffs) must
    // consume the join's output, i.e. the join prints DEEPER (later)
    val mp = p.indexOf("MapPartitions")
    val join = p.indexOf("BroadcastHashJoin")
    assert(mp >= 0 && join > mp,
      s"ascii semi-join sits above frameDiffs (filter-after-scan):\n$p")
  }

  test("q50 KMV: per-group bottom-k cut plans WindowGroupLimit") {
    val p = plan("q50_kmv_sketch")
    // the rank<=k filter over the per-group window must prune to k
    // rows per partition BEFORE the window sort — at 100 TB the
    // distinct-hash stream per group is unbounded, the sketch is not
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("c33 KMV view: both delta folds plan WindowGroupLimit cuts") {
    val p = plan("c33_kmv_distinct_view")
    // kmvDelta's rank<=k filter must prune each batch's distinct-hash
    // stream to k rows per partition BEFORE the window sort, in BOTH
    // folds — the per-batch cost bound the maintained view rests on.
    // Each pruned window prints a Partial + Final WindowGroupLimit
    // pair, so two folds print four.
    val n = "WindowGroupLimit".r.findAllIn(p).length
    assert(n >= 4, s"expected 2 WindowGroupLimit pairs (one per " +
      s"fold), got $n:\n$p")
  }

  test("t18 quality classifier: frozen-weight scoring is one " +
    "codegen map pass, no shuffle") {
    // training happens driver-side while the frame is BUILT (bounded
    // id-ordered sample); the returned scoring plan must be a pure
    // scan + project with the weights folded in as literals — at
    // 100 TB this is the difference between a corpus pass and a
    // corpus shuffle.
    val p = plan("t18_quality_classifier")
    assert(!p.contains("Exchange"), s"t18 scoring shuffles:\n$p")
    // HOF lambdas (filter/aggregate over token arrays) are
    // codegen-exempt in Spark, so the span is scan-only; the
    // load-bearing claims are: one parquet scan, weights visible as
    // plan literals (no join against a weights table).
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"expected exactly 1 scan:\n$p")
  }

  test("c34 cluster sample: assignment is join-free and the per-cell " +
    "cap plans WindowGroupLimit") {
    val p = plan("c34_cluster_sample")
    // centroids must be plan literals — a join against a centroid
    // table would shuffle the corpus twice at 100 TB
    assert(!p.contains("Join"), s"centroid join leaked in:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-cell cap not pruned map-side:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected <= 1 shuffle, got $exchanges:\n$p")
  }

  test("c35 semantic decontam: eval side broadcasts and only flagged " +
    "hits reach the aggregation shuffle") {
    val p = plan("c35_semantic_decontam")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"eval side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus must not shuffle into the join:\n$p")
    // exactly one hash-partition exchange: the post-filter hit agg
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
  }

  test("c31 incremental agg: base table is scanned exactly once") {
    val p = plan("c31_incremental_agg")
    // state seed reads orders once; the delta side reuses the same
    // scan via two filters — a second full scan would mean the fold
    // rescans the base, defeating incremental maintenance. Parquet
    // scans print one 'Scan parquet' block per physical read.
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 3, s"expected <= 3 parquet scans (state + 2 delta " +
      s"branches), got $scans:\n$p")
  }
}
