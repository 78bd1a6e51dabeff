package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit: the scale-readiness properties SURVEY §2.4's
  * comments claim are asserted here against the actual plans, so a
  * regression (a lost pushdown, a join flipping to nested-loop, a
  * full-schema scan) fails CI rather than surfacing as a 100 TB
  * incident. Executed-plan checks run count() first so AQE has
  * finalized its runtime re-plan. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  // collect() (not count(), which builds a SEPARATE query execution) so
  // THIS df's adaptive plan finalizes before we read it
  private def executed(df: DataFrame): String = {
    df.collect()
    // AQE's toString prints "== Final Plan ==" followed by the initial
    // plan — keep only the final section so operator counts aren't doubled
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("q01: filters and projection reach the parquet scan") {
    val plan = formatted(queries.Declared.q01(spark, sf))
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      s"no pushed filters:\n$plan")
    // pruned read schema: none of the untouched measure/dim columns
    Seq("l_tax", "l_returnflag", "l_linestatus", "l_partkey").foreach { c =>
      assert(!plan.contains(c), s"unpruned column $c in scan:\n$plan")
    }
  }

  test("q04: small customer side broadcasts") {
    assert(executed(queries.Declared.q04(spark, sf)).contains("BroadcastHashJoin"))
  }

  test("q05: fact join shuffles on the key, dims broadcast, agg is partial+final") {
    val plan = executed(queries.Declared.q05(spark, sf))
    // lineitem⋈(orders⋈customer) must be a key-partitioned hash join —
    // never a broadcast of the fact side (the optimizer's pruned-column
    // size estimate would happily build 600k lineitem rows at sf0.1,
    // a plan that cannot survive scale-up)
    assert(plan.contains("ShuffledHashJoin"), s"fact join not shuffled:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("BroadcastHashJoin"))
    // two HashAggregate nodes (map-side partial, then final after shuffle)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("q06: global filtered agg is map-side partial until one-row final") {
    val plan = executed(queries.Declared.q06(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
    assert(plan.contains("PushedFilters"))
  }

  test("q09/q10: semi and anti joins plan as joins, not row multiplication") {
    assert(executed(queries.Declared.q09(spark, sf)).contains("LeftSemi"))
    assert(executed(queries.Declared.q10(spark, sf)).contains("LeftAnti"))
  }

  test("q11: rank-filter pattern gets the WindowGroupLimit pushdown") {
    // Spark 3.5+ rewrites rn<=k over a rank window into a per-partition
    // group limit — each partition keeps a bounded heap instead of fully
    // sorting every group. The difference between O(n log k) and
    // O(n log n) per group at 100 TB.
    val plan = executed(queries.Declared.q11(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$plan")
  }

  test("q13: top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = executed(queries.Declared.q13(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort shuffle for a limit-25:\n$plan")
  }

  test("q18: tiny-dim theta join is a broadcast nested loop") {
    assert(executed(queries.Declared.q18(spark, sf)).contains("BroadcastNestedLoopJoin"))
  }

  test("q25: both session windows and the final agg share ONE user_id shuffle") {
    val plan = executed(queries.Declared2.q25(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one exchange for the user_id windows; the groupBy(user_id, session)
    // reuses that partitioning (plus the final presentation sort)
    assert(shuffles <= 1, s"$shuffles hash shuffles — window partitioning not reused:\n$plan")
  }

  test("q01 executes inside whole-stage codegen") {
    val plan = executed(queries.Declared.q01(spark, sf))
    // codegen'd operators print with the "*(n)" star in executed plans
    assert(plan.contains("*("), s"interpreted path:\n$plan")
  }

  test("dedup exact: partial aggregation before the hash shuffle") {
    val plan = executed(dedup.Dedup.exact(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("sim brute-force top-k: query side broadcasts, data side streams") {
    val plan = executed(sim.Similarity.bruteForceTopK(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$plan")
  }

  test("dedup embedding cosine: candidates come from equi-joins, never a cartesian") {
    val plan = executed(dedup.Dedup.embeddingCosine(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian product in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$plan")
  }

  test("dedup_semantic: within-cell pairing is an equi-join on the cell, never a cartesian") {
    // SemDeDup's whole scale story is that pair generation shards by
    // cluster: the trained codebook broadcasts (BNLJ/BHJ against the
    // k-row centroid table is fine — that's the assignment), but the
    // VECTOR-vector pairing must join on cell
    val plan = executed(dedup.Dedup.semantic(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian product in plan:\n$plan")
  }

  test("dedup_embedding_topk: pair-list cap pushes down as WindowGroupLimit") {
    // the output-volume knob for permissive thresholds: partial group
    // limits must run BEFORE the exchange, so a dense threshold can't
    // flood the final window with the full quadratic pair list
    val plan = executed(dedup.Dedup.embeddingCosineTopK(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank-filter not pushed down:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join appeared:\n$plan")
  }

  test("q42: latest-per-key compaction gets the WindowGroupLimit pushdown") {
    // the scaladoc's scale claim: one candidate row per key per input
    // partition crosses the shuffle, not the full log
    val plan = executed(queries.Declared4.q42(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank-filter not pushed down:\n$plan")
  }

  test("q46: corpus total broadcasts — no empty-partition global window") {
    val plan = executed(queries.Declared4.q46(spark, sf))
    assert(plan.contains("BroadcastExchange"), s"total not broadcast:\n$plan")
    // the per-customer window + presentation sort may shuffle; the
    // 1-row total must NOT funnel the stream through one partition
    // (a global window would plan Window over Exchange SinglePartition
    // on the FULL orders stream)
    assert(!plan.contains("Exchange SinglePartition\n   +- Window"),
      s"global window over single partition:\n$plan")
  }

  test("q44: date spine joins onto the daily aggregate without a row-stream shuffle") {
    val plan = executed(queries.Declared4.q44(spark, sf))
    // spine (≤ thousands of rows from a 1-row bound agg) broadcasts
    assert(plan.contains("BroadcastHashJoin"), s"spine join not broadcast:\n$plan")
  }

  test("runtime bloom filter: a selective dim filter reaches the fact scan as a bloom probe") {
    // Spark's runtime row-level filtering (SPARK-32268): when a join's
    // creation side is selectively filtered, the optimizer builds a
    // bloom filter of its join keys at runtime and applies it to the
    // application side BEFORE the shuffle — at 100 TB this skips
    // shuffling the vast majority of fact rows that can never match.
    // The application-side size gate defaults to 10GB (real-cluster
    // sizing); local test data is tiny, so the test lowers it — the
    // PLAN SHAPE, not the byte threshold, is what's pinned here.
    val conf = spark.conf
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "0")
      conf.set(keys(1), "-1") // force a shuffle join so the probe matters
      import spark.implicits._
      val o = Tables(spark, sf, "orders").filter($"o_orderpriority" === "1-URGENT")
      val j = Tables(spark, sf, "lineitem")
        .join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum($"l_quantity").as("q"))
      val plan = executed(j)
      assert(plan.contains("bloom_filter_agg"), s"no bloom filter injected:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("q77: one corpus histogram pass; merge rounds are driver-local") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // r20 shape: the ONLY corpus-sized work is the bpeVocab0 histogram
    // (pinned: it scans the corpus); the greedy merge rounds run on the
    // driver over the vocab-capped (≤ BpeVocabCap, corpus-independent)
    // table, so q77's RESULT frame is a local relation — no parquet
    // scan, no join, no per-round Spark stage may appear in it
    val docs = Tables(spark, sf, "documents")
    val histPlan = queries.Declared7.bpeVocab0(docs).queryExecution.sparkPlan
    assert(histPlan.collect { case f: FileSourceScanExec => f }.nonEmpty,
      s"histogram does not scan the corpus:\n$histPlan")
    val fmt = formatted(queries.Declared7.q77(spark, sf))
    assert(!fmt.contains("Scan parquet"),
      s"merge rounds re-derive the corpus:\n$fmt")
    assert(!fmt.contains("Join"), s"unexpected join in training result:\n$fmt")
    assert(fmt.contains("LocalTableScan") || fmt.contains("Scan ExistingRDD"),
      s"training result not a local relation:\n$fmt")
  }

  test("aqe: a planted skewed key gets its partition split (skew=true in the final plan)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, repeat, when}
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "-1") // force a shuffle join; skew-split targets SMJ/SHJ
      // production thresholds are sized for real clusters (256 MB); the
      // local corpus is tiny, so scale them down — the OPTIMIZATION
      // FIRING, not the byte values, is what's pinned (complements the
      // manual salting in operators/SkewJoin for engines/joins AQE
      // cannot rewrite)
      conf.set(keys(1), "65536")
      conf.set(keys(2), "32768")
      conf.set(keys(3), "2.0")
      // one hot key carrying ~25× the uniform mass, with a payload wide
      // enough that the hot shuffle partition crosses the threshold
      val left = spark.range(300000)
        .select(when($"id" < 250000, lit(0L)).otherwise($"id" % 1000).as("k"),
          concat(lit("payload-"), $"id", lit("-"), repeat(lit("x"), 64)).as("pay"))
      val right = spark.range(1000).select($"id".as("k"), ($"id" * 7).as("w"))
      // global agg on top: no keyed distribution requirement above the
      // join (a groupBy on k would make OptimizeSkewedJoin refuse — the
      // split breaks the join's hash-partitioning guarantee). The agg
      // must consume `pay`, or column pruning drops it from the shuffle
      // and the hot partition compresses under the skew threshold
      val joined = left.join(right, "k")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length($"pay")).as("paylen"))
      val plan = executed(joined)
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
      // and the split is semantics-preserving: every left row matches
      assert(joined.head().getLong(0) == 300000L)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("cbo: ANALYZE'd stats reproduce q05's scale-safe fact-join shape with NO hints") {
    import graft.operators.CboDemo
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      CboDemo.setup(spark, sf)
      keys.foreach(conf.set(_, "true"))
      // ANALYZE wrote real statistics: exact row counts and per-column
      // NDVs are in the catalog (what join estimation consumes)
      val liStats = CboDemo.stats(spark, sf, "lineitem")
      assert(liStats.rowCount.exists(_.toLong ==
        Tables(spark, sf, "lineitem").count()), s"bad rowCount: $liStats")
      assert(liStats.colStats.get("l_orderkey").exists(_.distinctCount.isDefined),
        s"no l_orderkey NDV: ${liStats.colStats.keySet}")
      // the hint-free formulation is row-identical to the hinted q05
      val cbo = CboDemo.q05NoHint(spark, sf).collect().map(_.toString).toSeq
      val hinted = queries.Declared.q05(spark, sf).collect().map(_.toString).toSeq
      assert(cbo == hinted, s"cbo=$cbo hinted=$hinted")
      // and the optimizer — told NOTHING — builds the stats-smaller
      // orders⋈customer side, never the fact table: the l_orderkey join
      // line must carry BuildRight (lineitem is the left/stream side)
      val plan = executed(CboDemo.q05NoHint(spark, sf))
      val factJoin = plan.linesIterator
        .filter(l => l.contains("Join") && l.contains("l_orderkey"))
        .toSeq
      assert(factJoin.nonEmpty, s"no l_orderkey join found:\n$plan")
      assert(factJoin.forall(l => l.contains("BuildRight") ||
        (!l.contains("BroadcastHashJoin") && !l.contains("BuildLeft"))),
        s"fact side became the build side:\n$factJoin")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("cbo: when stats say no side fits a broadcast, the fact join degrades to a partitioned join") {
    import graft.operators.CboDemo
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      CboDemo.setup(spark, sf)
      Seq(keys(0), keys(1)).foreach(conf.set(_, "true"))
      // model the 100 TB regime: a threshold below EVERY relation's
      // stats-estimated size (64 bytes — even the CBO-reordered,
      // region-filtered orders side estimates above it). The PLAN SHAPE
      // under nothing-fits-a-broadcast stats is what's pinned, not the
      // byte value.
      conf.set(keys(2), "64")
      conf.set(keys(3), "64")
      val plan = executed(CboDemo.q05NoHint(spark, sf))
      val factJoin = plan.linesIterator
        .filter(l => l.contains("Join") && l.contains("l_orderkey")).toSeq
      assert(factJoin.nonEmpty, s"no l_orderkey join found:\n$plan")
      assert(factJoin.forall(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
        s"fact join still broadcasting under 100TB-modeled stats:\n$factJoin")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ appeared:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("cbo: joinReorder rewrites a deliberately bad join order, row-identically") {
    import graft.operators.CboDemo
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      CboDemo.setup(spark, sf)
      // authored order (fact ⋈ supplier first, region's filter last)
      // with the reorderer OFF: the optimizer keeps the bad order
      conf.set(keys(0), "true"); conf.set(keys(1), "false")
      val offOrder = CboDemo.leafJoinOrder(CboDemo.q05BadOrder(spark, sf))
      assert(offOrder.size == 6, s"expected 6 catalog leaves, got $offOrder")
      assert(offOrder.take(2) == Seq("lineitem", "supplier"),
        s"authored order not preserved with reorder off: $offOrder")
      // reorderer ON: stats (row counts + NDVs) drive a different join
      // order — the DP enumerator moves the small/selective relations
      // off the authored positions
      conf.set(keys(1), "true")
      val onDf = CboDemo.q05BadOrder(spark, sf)
      val onOrder = CboDemo.leafJoinOrder(onDf)
      assert(onOrder.sorted == offOrder.sorted, s"leaf set changed: $onOrder")
      assert(onOrder != offOrder,
        s"joinReorder did not change the authored bad order: $onOrder")
      // and the rewrite is semantics-preserving: row-identical to the
      // hinted q05 (same predicates, same arithmetic)
      val reordered = onDf.collect().map(_.toString).toSeq
      val hinted = queries.Declared.q05(spark, sf).collect().map(_.toString).toSeq
      assert(reordered == hinted, s"reordered=$reordered hinted=$hinted")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("q89: tokenizer apply is a broadcast join; the word stream shuffles once, on doc_id") {
    val df = queries.Declared7.q89(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the vocab-capped symbol table must come in as a broadcast build
    // side — a shuffled join here would exchange the full exploded word
    // stream on word text at 100 TB
    assert(plan.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"word stream shuffled for the vocab join:\n${plan.take(2000)}")
  }

  test("q54: tf-idf top-5 rank-filter gets the WindowGroupLimit pushdown") {
    val plan = executed(queries.Declared5.q54(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank-filter not pushed down:\n$plan")
  }

  test("q56: contamination joins broadcast the benchmark side") {
    val plan = executed(queries.Declared5.q56(spark, sf))
    // the train-side n-gram stream must meet the eval set map-side:
    // broadcast joins only, no shuffle of the train explode before the
    // per-pair aggregate
    assert(plan.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"train stream shuffled to join:\n$plan")
  }

  test("q63: k-means assignment broadcasts the centroids, never shuffles the vectors to them") {
    val plan = executed(queries.Declared5.q63(spark, sf))
    // both assign passes are BroadcastNestedLoopJoin/BroadcastHashJoin
    // of k (or k·d) rows against the vector stream; a SortMergeJoin
    // would mean the corpus shuffled toward the centroids
    assert(!plan.contains("SortMergeJoin"), s"vector stream shuffled to centroids:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"centroids not broadcast:\n$plan")
  }

  test("q60b: rank offsets come from chunked runs, not per-priority windows") {
    val plan = executed(queries.Declared5.q60b(spark, sf))
    // the only Window operators run over the chunks×priorities offset
    // aggregate (partitioned by priority over CHUNK rows); the corpus
    // itself passes through range repartition + local sort (now behind
    // an eager localCheckpoint that pins mid's determinism) + broadcast
    // join — no window whose partition is the 5-value priority column
    // ever sees the full row stream. The checkpoint hides the range
    // exchange from the downstream executed plan, so pin it on the
    // pre-checkpoint subtree, and pin the checkpoint scan + offsets
    // broadcast downstream.
    val basePlan = executed(queries.Declared5.q60bBase(spark, sf))
    assert(basePlan.contains("rangepartitioning"), s"no range repartition:\n$basePlan")
    assert(plan.contains("ExistingRDD"), s"base not checkpointed (mid determinism unpinned):\n$plan")
    assert(plan.contains("BroadcastExchange"), s"offsets not broadcast:\n$plan")
  }

  test("q57: the corpus stream never funnels through a single-partition window") {
    val plan = executed(queries.Declared5.q57(spark, sf))
    // two-phase prefix sum: only the per-CHUNK totals (corpus/chunk
    // rows) may cross a SinglePartition exchange; the doc-level window
    // partitions by chunk. One single-partition exchange is the tiny
    // totals side; the presentation sort is a range exchange.
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1, s"expected <=1 single-partition exchange, got $singles:\n$plan")
    assert(plan.contains("Window"), s"no window:\n$plan")
  }

  test("q61: funnel is ONE user_id repartition + streaming state machine") {
    val plan = executed(queries.Declared5.q61(spark, sf))
    val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashEx <= 1, s"expected <=1 user_id hash exchange, got $hashEx:\n$plan")
    assert(plan.contains("MapPartitions"), s"no streaming state machine:\n$plan")
    // the event log is scanned once — the chained-aggregate form read it 3×
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
  }

  test("q64: temporal join is an equi-join keyed on user_id, never BNLJ/cartesian") {
    val plan = executed(queries.Declared5.q64(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // the interval predicate must ride on a user_id equi-join (version
    // side is dimension-sized; equi key bounds the pair explosion)
    val keyed = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[user_id#\\d+L?\\], \\[v_user".r
    assert(keyed.findFirstIn(plan).isDefined, s"no user_id-keyed join:\n$plan")
  }

  test("q59: streaming fold — no per-key history array, one user_id exchange") {
    val plan = executed(queries.Declared5.q59(spark, sf))
    // scale-safety: each key's history must stream through the fold,
    // never materialize as a collect_list array in one row
    assert(!plan.contains("collect_list"), s"per-key array materialization:\n$plan")
    assert(plan.contains("MapPartitions"), s"no streaming fold operator:\n$plan")
    // exactly one hash exchange (the user_id repartition); the
    // presentation ORDER BY is a range exchange on top
    val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 user_id hash exchange, got $hashEx:\n$plan")
    // the secondary sort below the fold is a local (non-global) sort
    assert(plan.contains("Sort"), s"no secondary sort:\n$plan")
  }

  test("q65: exact counts only shuffle candidate-filtered rows (broadcast semi, no SMJ)") {
    val plan = executed(queries.Declared6.q65(spark, sf))
    // the Misra-Gries candidate set joins the bigram stream as a
    // broadcast — the full stream must never sort-merge or shuffle
    // toward the tiny candidate side
    assert(plan.contains("BroadcastHashJoin"), s"candidates not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"bigram stream shuffled to candidates:\n$plan")
  }

  test("q67: the two-phase skyline has NO join operator (vs the quadratic NOT-EXISTS shape)") {
    val plan = executed(queries.Declared6.q67(spark, sf))
    assert(!plan.contains("Join"), s"skyline should be join-free sweeps:\n$plan")
    assert(plan.contains("MapPartitions"), s"no sweep operator:\n$plan")
  }

  test("q68: within-source rank partitions by (source, chunk), not source alone") {
    val plan = executed(queries.Declared6.q68(spark, sf))
    // the q60b lesson: a row_number partitioned by the low-cardinality
    // source column alone is one task per source at scale; the doc
    // stream's window must carry the chunk in its partition spec
    val chunked = "windowspecdefinition\\(source#\\d+, chunk#\\d+L?,".r
    assert(chunked.findFirstIn(plan).isDefined,
      s"doc-stream window not chunk-partitioned:\n$plan")
  }

  test("q69: pagerank iterations are equi-joins — no cartesian/nested-loop anywhere") {
    val plan = executed(queries.Declared6.q69(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian in pagerank:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in pagerank:\n$plan")
  }

  test("q73: corpus touches ONE distributed Gram pass; iterations never re-derive it") {
    // r20 shape: the corpus-sized work is exactly one Gram
    // scan+aggregate (collected — the matrix is dimension-sized, d² =
    // 4096 longs), and the PiIters matvec steps run on the driver (the
    // MLlib RowMatrix Gramian design). The result frame is therefore a
    // local relation: NO parquet scan, NO join, NO exchange may appear
    // in it — if the corpus source or an iteration join shows up here,
    // the bounded-pull design regressed to per-iteration Spark jobs.
    val fmt = formatted(queries.Declared6.q73(spark, sf))
    assert(!fmt.contains("Scan parquet"),
      s"corpus source re-derived in the result frame:\n$fmt")
    assert(!fmt.contains("Join"), s"iteration join in the result frame:\n$fmt")
    assert(fmt.contains("LocalTableScan") || fmt.contains("Scan ExistingRDD"),
      s"result not a local relation:\n$fmt")
  }

  test("q71: literal-k sample gets the partial WindowGroupLimit before the exchange") {
    val plan = executed(queries.Declared6.q71(spark, sf))
    // the whole point of the hash-priority sample at scale: each input
    // partition forwards at most k rows per source, so the shuffle is
    // O(k · partitions · sources) — WindowGroupLimit in Partial mode
    // below the exchange is that property in the plan
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined,
      s"no partial (pre-shuffle) group limit:\n$plan")
  }

  test("q74: posting-list cap runs as a bounded WindowGroupLimit heap") {
    val plan = executed(queries.Declared7.q74(spark, sf))
    // the row_number()<=PostCap filter must plan as WindowGroupLimit
    // (a size-PostCap heap per term) with a map-side Partial pass —
    // the reason a stopword's postings never buffer a full per-term sort
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined,
      s"no partial (pre-shuffle) group limit:\n$plan")
  }

  test("q76: rolling anomaly is ONE user_id exchange, running-frame window") {
    val plan = executed(queries.Declared7.q76(spark, sf))
    val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 user_id hash exchange, got $hashEx:\n$plan")
    // the trailing frame is a ROWS window (O(1)/row), not a re-sorted
    // RANGE or a self-join
    assert(plan.contains("Window"), s"no window:\n$plan")
    assert(!plan.contains("Join"), s"anomaly detection must not self-join:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
  }

  test("q78: graph joins are equi-joins; only the in-slice kNN pass is nested-loop") {
    val plan = executed(queries.Declared7.q78(spark, sf))
    // exactly one BNLJ: the documented brute-force kNN within the
    // dimension-sized label slice (the 100 TB path swaps in the LSH
    // candidate generator). Mutual/triangle/degree joins must all be
    // hash equi-joins — a second nested loop means the graph algebra
    // regressed to pairwise scans.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj == 1, s"expected exactly 1 nested-loop (the kNN pass), got $bnlj:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("SortMergeJoin"), s"no equi-join in graph algebra:\n$plan")
  }

  test("q78b: data-to-data joins are all equi-joins; nested loops only hit the k-row centroid side") {
    val plan = executed(queries.Declared7.q78b(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // the only nested loops allowed are the k-row centroid broadcasts
    // (codebook-trainer assign + the single angular scoring pass — the
    // standard IVF assignment shape, ≤ Q78Cells rows on the broadcast
    // side). The candidate generation itself must be equi-joins on
    // cell: one more BNLJ than these means a data×data pairwise scan
    // crept in.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 2, s"expected ≤2 centroid-broadcast nested loops, got $bnlj:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("SortMergeJoin"), s"no equi-join in candidate path:\n$plan")
  }

  test("sim_topk_pq: ADC scoring joins only broadcasts of query-sized sides; top-R cut is partial") {
    val plan = executed(sim.Similarity.pqTopK(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // the only nested loop allowed is the packed per-query distance
    // tables against the codes stream — NumQueries rows of M·KS longs
    // on the broadcast side. Codebook training/encode are equi-joins on
    // `sub`; one more BNLJ means a corpus-sized pairwise scan crept in.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"expected ≤1 query-table broadcast nested loop, got $bnlj:\n$plan")
    // the top-R ADC cut must run map-side (WindowGroupLimit partial),
    // or every (query, vector) ADC row crosses the exchange at scale
    assert(plan.contains("WindowGroupLimit"), s"no partial top-R cut:\n$plan")
  }

  test("sim_topk_ivfpq: candidate path is cell/vec_id equi-joins; nested loops only on codebook-sized sides") {
    val plan = executed(sim.Similarity.ivfPqTopK(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // allowed nested loops: the KCells-row coarse-centroid broadcasts
    // (trainer assign + routing, duplicated across the home/qprobe
    // subtrees — all ≤16-row broadcast sides). Candidate generation and
    // re-rank must be equi-joins (cell, query_id, vec_id).
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 4, s"expected ≤4 codebook-sized nested loops, got $bnlj:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("SortMergeJoin"), s"no equi-join in candidate path:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"no partial top-R cut:\n$plan")
  }

  test("sim_topk_ivfpq_res: residual path stays equi-join + codebook-sized broadcasts") {
    val plan = executed(sim.Similarity.ivfPqResTopK(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // same budget as sim_topk_ivfpq: nested loops only on the
    // ≤KCells-row coarse-centroid broadcasts; the residual computation
    // itself joins on cell/vec_id/query_id (equi) and the per-(query,
    // cell) tables broadcast ≤ NumQueries·NProbe rows
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 4, s"expected ≤4 codebook-sized nested loops, got $bnlj:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"no partial top-R cut:\n$plan")
  }

  test("dedup incremental: the new batch broadcasts onto the corpus band stream") {
    val plan = executed(graft.dedup.Dedup.minhashIncremental(spark, sf))
    // ingestion-batch side is small by definition — the candidate join
    // must broadcast it; sort-merging would re-exchange the whole
    // corpus index per arriving batch
    assert(plan.contains("BroadcastHashJoin"), s"new batch not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$plan")
  }

  test("q21c: custom as-of plans as AsOfMergeJoin — one exchange per side, no window") {
    val plan = executed(queries.Declared7.q21c(spark, sf))
    assert(plan.contains("AsOfMergeJoin"), s"custom exec not planned:\n$plan")
    // the composition's cost model: union + ONE exchange + window carry.
    // the custom exec must instead co-partition the two sides (two hash
    // exchanges on user_id) and never plan a window or a Union
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(!plan.contains("Union"), s"union survived:\n$plan")
    // exactly two SINGLE-key (user_id) exchanges feed the merge — the
    // third exchange in the plan is the purchases (user_id, ts) pre-agg,
    // inherent to the query and keyed on both columns
    val joinEx = "Exchange hashpartitioning\\((?:__asofr_)?user_id#\\d+L, \\d"
      .r.findAllIn(plan).size
    assert(joinEx == 2, s"expected 2 single-key join exchanges, got $joinEx:\n$plan")
  }

  test("as-of custom node: left-only filters push below the merge join") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val ev = Tables(spark, sf, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(org.apache.spark.sql.functions.max($"value").as("purchase_value"))
    val joined = graft.plans.AsOfMergeJoin
      .asOf(clicks, purchases, "user_id", "ts", Seq("purchase_value"))
      .filter(col("event_id") < 100) // left-only predicate ABOVE the join
    // the optimized logical plan must carry the filter BELOW AsOfJoinNode
    val optimized = joined.queryExecution.optimizedPlan
    val node = optimized.collectFirst {
      case j: graft.plans.AsOfJoinNode => j }.getOrElse(fail("node gone"))
    assert(node.left.toString.contains("event_id"),
      s"filter not pushed into left child:\n$optimized")
    // and all the way into the probe-side scan as a pushed filter
    val plan = executed(joined)
    assert("PushedFilters: \\[[^\\]]*LessThan\\(event_id".r.findFirstIn(plan).isDefined,
      s"predicate missing from scan pushdown:\n$plan")
    // semantics unchanged: filter-above == filter-below
    val above = graft.plans.AsOfMergeJoin
      .asOf(clicks.filter($"event_id" < 100), purchases, "user_id", "ts",
        Seq("purchase_value")).collect().map(_.toSeq).toSet
    assert(joined.collect().map(_.toSeq).toSet == above)
  }

  test("q87: column-local constraints share one profile pass; FK checks are equi-joins") {
    val plan = executed(queries.Declared7.q87(spark, sf))
    // five constraints, ONE conditional-aggregate pass: orders scans
    // stay at 2 (profile + the o_custkey FK fact side), not one per
    // constraint; referential checks must never nested-loop
    val ordersScans = "Scan parquet .*orders".r.findAllIn(plan).size
    assert(ordersScans <= 3, s"orders scanned $ordersScans times:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equi join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("q86: market-basket pairs are join-free — basket-local fan-out, two aggregates") {
    val plan = executed(queries.Declared7.q86(spark, sf))
    // the self-join formulation re-shuffles the projection twice and
    // multiplies rows through a join operator; the basket-local
    // generator must plan with NO join and exactly two hash exchanges
    // (orderkey baskets, then pair counts)
    assert(!plan.contains("Join"), s"basket pairs must not self-join:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"expected <=2 hash exchanges, got $hashEx:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$plan")
  }

  test("q84: retention row-scale work stays on user_id; cohort sizes broadcast") {
    val plan = executed(queries.Declared7.q84(spark, sf))
    // the per-user aggregates and their join are co-partitioned on
    // user_id; the only broadcast is the (cohort-count)-row size table
    assert(plan.contains("BroadcastHashJoin"), s"cohort sizes not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$plan")
  }

  test("q85: group-wise OLS is one partial+final aggregate pass, no join") {
    val plan = executed(queries.Declared7.q85(spark, sf))
    assert(!plan.contains("Join"), s"OLS must not join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
  }

  test("q82: attribution is ONE user_id exchange with a running carry, no self-join") {
    val plan = executed(queries.Declared7.q82(spark, sf))
    val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 user_id hash exchange, got $hashEx:\n$plan")
    assert(!plan.contains("Join"), s"attribution must not self-join:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
  }

  test("q81: winsorize bounds join broadcasts; events scan at most twice") {
    val plan = executed(queries.Declared7.q81(spark, sf))
    // the |event_types|-row bounds side must broadcast onto the fact
    // stream — a shuffled join here re-exchanges every event row
    assert(plan.contains("BroadcastHashJoin"), s"bounds not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact stream sort-merged to bounds:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"expected <=2 events scans, got $scans:\n$plan")
  }

  test("q90_dsir: ratio table broadcasts to the pool counts; top-k is a TakeOrdered, no cartesian") {
    val plan = executed(queries.Declared8.dsirSelect(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // the B-row (≤1024) log-likelihood-ratio table must be the
    // broadcast side against the pool's per-doc bucket counts — a
    // shuffled join here re-exchanges every (doc, bucket) row at scale
    assert(plan.contains("BroadcastHashJoin"), s"LLR table not broadcast:\n$plan")
    // the final top-100 must be a TakeOrderedAndProject (per-partition
    // k-heaps), never a global sort of every scored doc
    assert(plan.contains("TakeOrderedAndProject"), s"top-k is a full sort:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop crept into an equi-join path:\n$plan")
  }
}
