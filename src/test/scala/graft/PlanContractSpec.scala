package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan contracts: the physical-plan properties the 100 TB design
  * depends on, pinned as tests so a refactor that silently loses a
  * pushdown, a broadcast, or a bounded top-k fails CI instead of a
  * benchmark. String-level assertions on the formatted plan are
  * deliberately coarse — they express "this shape must exist", not the
  * whole plan.
  */
class PlanContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q2: range predicates reach the parquet scan as pushed filters") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters"))
    assert(p.contains("LessThan(l_quantity") ||
      p.contains("GreaterThan(l_discount"), s"q2 lost its pushed range: $p")
  }

  test("q2: scan reads only the projected columns, not the full schema") {
    val p = plan("q2_filter_project")
    // ReadSchema must not include the wide comment column
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.nonEmpty)
    assert(!read.contains("l_comment"), s"l_comment not pruned: $read")
  }

  test("small dimension sides broadcast (q3 join_agg, q83 rates)") {
    assert(plan("q3_join_agg").contains("BroadcastHashJoin"))
    assert(plan("q83_temperature_resample").contains("BroadcastHashJoin"))
  }

  test("bounded top-k stays TakeOrdered, never a global sort (q28/q85/q89)") {
    Seq("q28_ann_bruteforce", "q85_ann_pq", "q89_ann_ivfpq").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lost TakeOrdered")
    }
  }

  test("two-level prefix sums never window an unbounded partition " +
    "(q72/q75/q84)") {
    // every Window in these plans must partition by a sharded key —
    // the scale contract that replaced the per-language/global windows
    Seq("q72_pack_sequences", "q75_shuffle_order", "q84_token_budget_mix")
      .foreach { q =>
        val p = plan(q)
        val windows = p.linesIterator
          .filter(_.contains("Arguments")).mkString("\n")
        // the in-shard window and the offsets window both carry the
        // shard column in their partition spec
        assert(p.contains("Window"), s"$q has no window?")
        assert(windows.contains("shard"), s"$q window lost its shard key")
      }
  }

  test("scan-only cleaning ops stay single-stage (q80/q82/q86)") {
    Seq("q80_pii_redact", "q82_domain_filter", "q86_quality_classifier")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("Exchange"), s"$q grew a shuffle:\n$p")
      }
  }

  test("q70 decontamination broadcasts the benchmark gram set") {
    val p = plan("q70_contamination")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q90 BM25 broadcasts df/stats and keeps the ranking TakeOrdered") {
    val p = plan("q90_bm25_search")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), s"q90 lost its broadcasts")
    assert(p.contains("TakeOrderedAndProject"), s"q90 lost TakeOrdered")
  }

  test("q93 winnow decontamination broadcasts the bench fingerprint set") {
    val p = plan("q93_winnow_contamination")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q224/q226 governance audits: join-free single-exchange rollups") {
    val p224 = plan("q224_readability")
    assert(!p224.contains("Join"), s"q224 grew a join:\n$p224")
    val p226 = plan("q226_k_anonymity")
    assert(!p226.contains("Join"), s"q226 grew a join:\n$p226")
    // the k sweep fans out AFTER the corpus collapses: an aggregate
    // must sit BELOW the explode (formatted explain prints root first,
    // so "below" = later in the text)
    val lines = p226.linesIterator.toSeq
    val gen = lines.indexWhere(_.contains("Generate"))
    val aggBelow = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(gen >= 0 && aggBelow > gen,
      s"q226 explode must ride the bounded group-size frame:\n$p226")
  }

  test("q250 explicit pivot is one pass (no distinct-values job: a " +
    "single scan feeds a single aggregate chain)") {
    val p = plan("q250_pivot_matrix")
    // formatted explain prints each scan as a tree line AND a detail
    // block — count the per-scan `Location:` detail lines instead
    val scans = p.linesIterator.count(_.trim.startsWith("Location:"))
    assert(scans == 1, s"q250 grew extra scans ($scans):\n$p")
    assert(!p.contains("Join"), s"q250 grew a join:\n$p")
  }

  test("q252 rolling burst windows per user (no global sort) and " +
    "q249 cohort conversion windows per user only") {
    // pin the PARTITION KEY, not just Window-exists — a window without
    // partitionBy would be the single-partition global-sort collapse
    // this contract forbids (the q72-family assertion idiom)
    Seq("q252_rolling_burst", "q249_cohort_conversion").foreach { q =>
      val p = plan(q)
      assert(p.contains("Window"), s"$q has no window?")
      val windowArgs = p.linesIterator
        .filter(_.contains("Arguments")).mkString("\n")
      assert(windowArgs.contains("user_id"),
        s"$q window lost its per-user partition:\n$p")
    }
    assert(!plan("q252_rolling_burst").contains("Join"))
  }

  test("q238 rule attribution is join-free; q239 phrase mining " +
    "broadcasts the winner set; q240 paths windows per user only") {
    val p238 = plan("q238_rule_attribution")
    assert(!p238.contains("Join"), s"q238 grew a join:\n$p238")
    val p239 = plan("q239_boilerplate_phrases")
    assert(p239.contains("BroadcastHashJoin"),
      s"q239 lost the winner-set broadcast:\n$p239")
    assert(p239.contains("TakeOrderedAndProject"),
      s"q239 lost TakeOrdered:\n$p239")
    val p240 = plan("q240_event_paths")
    assert(p240.contains("TakeOrderedAndProject"),
      s"q240 lost TakeOrdered:\n$p240")
    assert(!p240.contains("SortMergeJoin"), s"q240 grew a join:\n$p240")
  }

  test("q242 media overlap: segment counts broadcast at the pair " +
    "frame; q243 calibration stays on bounded frames") {
    val p242 = plan("q242_media_overlap")
    assert(p242.contains("BroadcastHashJoin"),
      s"q242 lost the count broadcast:\n$p242")
    assert(!p242.contains("SortMergeJoin"),
      s"q242 grew a sort-merge join:\n$p242")
    // q243's bounded-sample TakeOrdered sits BEHIND the 128-row
    // checkpoint (q214 plan-blindness), so the visible contract is
    // the downstream shape only: tiny-grid join, one aggregation
    val p243 = plan("q243_hamming_cosine_curve")
    assert(!p243.contains("SortMergeJoin"),
      s"q243 grew a sort-merge join:\n$p243")
    assert(!p243.contains("Window"), s"q243 grew a window:\n$p243")
  }

  test("q235 bursts: TakeOrdered over the hourly frame, no sort-merge " +
    "join; q234 topology joins never cartesian") {
    val p235 = plan("q235_burst_hours")
    assert(p235.contains("TakeOrderedAndProject"),
      s"q235 lost TakeOrdered:\n$p235")
    assert(!p235.contains("SortMergeJoin"),
      s"q235 grew a sort-merge join:\n$p235")
    val p234 = plan("q234_component_topology")
    assert(!p234.contains("CartesianProduct"),
      s"q234 grew a cartesian product:\n$p234")
  }

  test("q237 eval sampler: ranked + alloc frames broadcast back at " +
    "the corpus; apportionment window is the only Window") {
    val p = plan("q237_eval_sampler")
    assert(p.contains("BroadcastHashJoin"), s"q237 lost broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q237 grew a sort-merge join:\n$p")
    val nWindows = p.linesIterator.count(l =>
      l.contains("Window") && !l.contains("WindowGroupLimit"))
    assert(nWindows <= 2, // formatted explain: one tree line + detail
      s"q237 grew corpus windows ($nWindows):\n$p")
  }

  test("q231 matryoshka recall: windowless TopK rankings, broadcasts " +
    "only; q233 moments: single-pass aggregation, no corpus join") {
    val p231 = plan("q231_matryoshka_recall")
    assert(!p231.contains("Window"), s"q231 grew a window:\n$p231")
    assert(!p231.contains("SortMergeJoin"),
      s"q231 grew a sort-merge join:\n$p231")
    val p233 = plan("q233_dim_moments")
    assert(!p233.contains("SortMergeJoin") && !p233.contains("Window"),
      s"q233 plan shape wrong:\n$p233")
  }

  test("q232 domain reweight: small-frame joins broadcast, no " +
    "sort-merge join (corpus lineage sits behind the ev/shares " +
    "checkpoints; the vocab broadcast there is the q78 contract)") {
    val p = plan("q232_domain_reweight")
    assert(p.contains("BroadcastHashJoin"), s"q232 lost broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q232 grew a sort-merge join:\n$p")
  }

  test("q227 passage chunks: join-free; q228 leak rollup broadcasts " +
    "the leaked-id frame") {
    val p227 = plan("q227_passage_chunks")
    assert(!p227.contains("Join"), s"q227 grew a join:\n$p227")
    val p228 = plan("q228_split_leakage")
    assert(p228.contains("BroadcastHashJoin"),
      s"q228 lost the leaked-id broadcast:\n$p228")
    assert(!p228.contains("SortMergeJoin"),
      s"q228 grew a sort-merge join:\n$p228")
  }

  test("q223 binary ANN: Hamming shortlist is TakeOrdered, no " +
    "sort-merge join anywhere") {
    val p = plan("q223_ann_binary")
    assert(p.contains("TakeOrderedAndProject"), s"q223 lost TakeOrdered")
    assert(!p.contains("SortMergeJoin"), s"q223 grew a sort-merge join:\n$p")
  }

  test("q94 SQ8 ANN: stats broadcast, both ranking stages TakeOrdered") {
    val p = plan("q94_ann_sq8")
    assert(p.contains("TakeOrderedAndProject"), s"q94 lost TakeOrdered")
    assert(!p.contains("SortMergeJoin"), s"q94 grew a sort-merge join:\n$p")
  }

  test("q95 UniMax selection windows only sharded partitions") {
    val p = plan("q95_unimax_mix")
    val windows = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(p.contains("Window"), "q95 has no window?")
    assert(windows.contains("shard"), s"q95 window lost its shard key")
  }

  test("q97 shard assignment windows only bucketed partitions plus an " +
    "O(#buckets) offset pass") {
    val p = plan("q97_shard_assign")
    val windows = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(p.contains("Window"), "q97 has no window?")
    assert(windows.contains("bucket"), s"q97 window lost its bucket key")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), "q97 lost its broadcasts")
  }

  test("q81 paragraph dedup aggregates before joining (no window over " +
    "the paragraph hash)") {
    val p = plan("q81_para_dedup")
    assert(p.contains("HashAggregate"))
    // the first-occurrence resolution must NOT be a window over ph —
    // that would put a mega-duplicated paragraph into one task
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.isEmpty, s"q81 grew a window: $windowLines")
  }

  test("no hash pipeline ever re-runs inside a Filter below a Generate " +
    "(q101/q105/q49 — PLANS lesson 7)") {
    // InferFiltersFromGenerate + pushdown can inline the generator
    // child's whole array pipeline into a pre-projection filter
    // (measured 10x on q101); the outer-explode pattern must keep
    // every Filter condition md5-free in these plans
    Seq("q101_dup_spans", "q105_span_excise", "q49_trigram_search")
      .foreach { q =>
        val bad = plan(q).linesIterator
          .filter(_.startsWith("Condition"))
          .filter(l => l.contains("md5") || l.contains("transform("))
          .toSeq
        assert(bad.isEmpty, s"$q re-runs a hash pipeline in a filter: $bad")
      }
  }

  test("q102 weighted sampling stays a TakeOrdered over one scan") {
    val p = plan("q102_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), "q102 lost TakeOrdered")
    assert(!p.contains("Exchange"), s"q102 grew a shuffle")
  }

  test("q103 DSIR broadcasts the bucket feature table") {
    assert(plan("q103_dsir_weights").contains("BroadcastHashJoin"),
      "q103 lost its feature broadcast")
  }

  test("q106 k-means assignment is a pure scan: no join, no shuffle") {
    // training collects happen before the output plan; the assignment
    // itself must stay centroid-literals-against-a-scan
    val p = plan("q106_kmeans_assign")
    assert(!p.contains("Join"), s"q106 assignment grew a join:\n$p")
    assert(!p.contains("Exchange"), s"q106 assignment grew a shuffle:\n$p")
  }

  test("q107 SemDeDup pair mining never goes cartesian") {
    // the whole point of clustering first: the pair join keys on the
    // cell id — a nested-loop/cartesian here is the n-squared trap
    val p = plan("q107_semdedup")
    assert(!p.contains("Cartesian"), s"q107 went cartesian:\n$p")
    assert(!p.contains("NestedLoop"), s"q107 went nested-loop:\n$p")
  }

  test("q110 heavy hitters: the CMS gate filters BEFORE the count " +
    "aggregation and the plan has no join at all") {
    val p = plan("q110_cms_heavy_hitters")
    assert(!p.contains("Join"), s"q110 grew a join:\n$p")
    // the literal-matrix min() probe sits in a Filter condition
    val conds = p.linesIterator.filter(_.startsWith("Condition")).mkString
    assert(conds.contains("least("), s"q110 lost its sketch gate: $conds")
  }

  test("q111 HLL joins the per-lang exact count as a broadcast") {
    assert(plan("q111_hll_distinct").contains("BroadcastHashJoin"),
      "q111 lost the tiny-side broadcast")
  }

  test("q116 PMI broadcasts both corpus totals; q117 broadcasts the " +
    "boilerplate mark set") {
    val p116 = plan("q116_pmi_collocations")
    assert(p116.contains("BroadcastExchange"),
      s"q116 lost its broadcast totals:\n$p116")
    assert(plan("q117_boilerplate_strip").contains("BroadcastHashJoin"),
      "q117 boilerplate mark-join must broadcast — the boiler set is " +
        "tiny by construction")
  }

  test("q119 BPE apply is scan-only after training: no join, no shuffle") {
    // the merge list is a plan-time constant; tokenization must stay a
    // single codegen'd scan at any corpus size
    val p = plan("q119_bpe_apply")
    assert(!p.contains("Join"), s"q119 apply grew a join:\n$p")
    assert(!p.contains("Exchange"), s"q119 apply grew a shuffle:\n$p")
  }

  test("q120 canonical selection aggregates per cluster, never windows") {
    // a row_number window over cluster_id would put a whole mega-dup
    // cluster in one task — the argmax struct agg is the contract
    assert(!plan("q120_canonical_select").contains("Window"),
      "q120 must not window over clusters")
  }

  test("q121 label propagation joins on the cell id, never cartesian") {
    val p = plan("q121_knn_label_prop")
    assert(!p.contains("Cartesian"), s"q121 went cartesian:\n$p")
    assert(!p.contains("NestedLoop"), s"q121 went nested-loop:\n$p")
  }

  test("q122 manifest inherits q97's sharded windows (no global sort)") {
    val p = plan("q122_shard_manifest")
    val windows = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(p.contains("Window") && windows.contains("bucket"),
      s"q122 lost the bucketed two-level prefix sum:\n$windows")
  }

  test("q125 per-group top-k has NO window — the q9 baseline's scale fix") {
    val p = plan("q125_topk_per_group")
    assert(!p.contains("Window"), s"q125 regressed to a window:\n$p")
  }

  test("q126 interleave windows only sharded buckets; index broadcast") {
    val p = plan("q126_source_interleave")
    val windows = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(windows.contains("bucket"), "q126 lost the bucketed rank")
    assert(p.contains("BroadcastHashJoin"), "q126 lost the index broadcast")
  }

  test("q127 length batching windows only composite buckets; q128 " +
    "rollup is explode+agg with no join") {
    val w127 = plan("q127_length_batches").linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(w127.contains("bucket"), "q127 lost the bucketed rank")
    val p128 = plan("q128_domain_rollup")
    assert(!p128.contains("Join"), s"q128 grew a join:\n$p128")
  }

  test("q123/q124 vocab ranks window only composite buckets, offsets " +
    "broadcast") {
    // the Zipf-hostile case: a global row_number (or a count-only
    // bucket) would put the count=1 half of the vocabulary in one task
    Seq("q123_vocab_ids", "q124_token_ids").foreach { q =>
      val p = plan(q)
      val windows = p.linesIterator
        .filter(_.contains("Arguments")).mkString("\n")
      assert(windows.contains("bucket"), s"$q lost the bucketed rank")
      assert(p.contains("BroadcastHashJoin"),
        s"$q lost the offsets broadcast")
    }
  }

  test("q129 under the gate: power iterations broadcast the rank vector") {
    // small-domain-count shape: the corpus-scale frame is checkpointed
    // away; every join that remains (rank, degree, accumulator) is
    // domain-cardinality and broadcasts — nothing shuffles the edges
    val p = plan("q129_domain_pagerank")
    assert(p.contains("BroadcastHashJoin"), s"q129 lost broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q129 shuffle-joins ranks:\n$p")
  }

  test("q129 over the gate: ranks shuffle-join WITHOUT re-shuffling " +
    "the edge table per iteration") {
    // web-scale shape (10⁷⁺ domains): a broadcast of the rank vector
    // would be multi-GB per iteration — above the gate the edge table
    // is repartition(src)-ed and checkpointed ONCE, and only the
    // O(#domains) side exchanges each round. Contract: no Exchange
    // re-partitions the checkpointed (src, dst) scan by src.
    import org.apache.spark.sql.execution.RDDScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val conf = spark.conf
    conf.set(graft.ops.PageRank.GateConf, "0")
    conf.set("spark.sql.adaptive.enabled", "false") // plain executedPlan
    try {
      val df = SparkEntry.queries("q129_domain_pagerank")(spark, dir)
      val exec = df.queryExecution.executedPlan
      assert(exec.collect { case j: ShuffledHashJoinExec => j }.nonEmpty,
        s"over-gate q129 lost the shuffle-hash rank join:\n$exec")
      val edgeReshuffles = exec.collect {
        case e: ShuffleExchangeExec if (e.outputPartitioning match {
          case h: HashPartitioning =>
            h.references.exists(_.name == "src")
          case _ => false
        }) && e.child.collectFirst {
          case r: RDDScanExec
            if r.output.map(_.name).toSet == Set("src", "dst") => r
        }.nonEmpty => e
      }
      assert(edgeReshuffles.isEmpty,
        s"edge table re-shuffled by src per iteration:\n$exec")
    } finally {
      conf.unset(graft.ops.PageRank.GateConf)
      conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("q130 broadcasts the vocabulary at the token probe") {
    val p = plan("q130_oov_rate")
    assert(p.contains("BroadcastHashJoin"), s"q130 lost the broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q130 shuffle-joins vocab:\n$p")
  }

  test("q131 split assignment is join-free (hash mod only)") {
    val p = plan("q131_split_manifest")
    assert(!p.contains("Join"), s"q131 grew a join:\n$p")
  }

  test("q132 joins the per-source epoch factors broadcast") {
    val p = plan("q132_epoch_schedule")
    assert(p.contains("BroadcastHashJoin"), s"q132 lost the broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q132 shuffle-joins the factor table:\n$p")
  }

  test("q133 tagging is scan-only; q134 funnel folds in one agg, " +
    "join-free") {
    val p133 = plan("q133_policy_tags")
    assert(!p133.contains("Exchange"), s"q133 grew a shuffle:\n$p133")
    val p134 = plan("q134_filter_funnel")
    assert(!p134.contains("Join"), s"q134 grew a join:\n$p134")
  }

  test("q135 postings group on the composite (tok, doc) key — no " +
    "window, no join") {
    val p = plan("q135_positional_index")
    assert(!p.contains("Window"), s"q135 uses a window:\n$p")
    assert(!p.contains("Join"), s"q135 grew a join:\n$p")
  }

  test("q136 BPE apply chain is join-free literal replaces") {
    val p = plan("q136_bpe_fertility")
    assert(!p.contains("Join"), s"q136 grew a join:\n$p")
  }

  test("q137 signatures fold map-side; the pairwise compare never " +
    "shuffle-joins") {
    val p = plan("q137_source_overlap")
    assert(p.contains("HashAggregate"), s"q137 lost the min-agg:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q137 shuffle-joins sigs:\n$p")
  }

  test("q138 per-vector argmax is an aggregate, not a per-cell window") {
    val p = plan("q138_hard_negatives")
    assert(!p.contains("Window"), s"q138 uses a window:\n$p")
  }

  test("q139 running sums window only the O(#checkpoints) bucket " +
    "table; q140 histograms without a window") {
    // q139's corpus-scale work (token sums, first occurrences) must
    // stay in aggregates; the single-partition window may only see the
    // post-agg bucket rows (both window inputs are HashAggregate
    // outputs, joined broadcast)
    val p139 = plan("q139_vocab_growth")
    assert(p139.contains("Window"), s"q139 lost its running sum:\n$p139")
    assert(p139.contains("BroadcastHashJoin"),
      s"q139 shuffle-joins the bucket tables:\n$p139")
    val p140 = plan("q140_minhash_calibration")
    assert(!p140.contains("Window"), s"q140 uses a window:\n$p140")
  }

  test("q141 range join is an equi join on the bucket key — never a " +
    "nested-loop/cartesian theta join") {
    val p = plan("q141_session_overlap_rangejoin")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q141 fell back to a nested-loop theta join:\n$p")
    assert(!p.contains("CartesianProduct"), s"q141 goes cartesian:\n$p")
  }

  test("q29 under the gate: exact tiled shape — tile-pair table " +
    "broadcasts, no checkpointed candidate frames") {
    // 500 rows at sf0.001 sit under the 10⁴ default gate: the plan is
    // the tiled exact shape — the T(T+1)/2 tile-pair frame broadcasts
    // into both corpus sides and no localCheckpoint RDD scan appears
    val p = plan("q29_embed_neardup")
    assert(p.contains("BroadcastHashJoin"),
      s"q29 under-gate lost the tile-pair broadcast:\n$p")
    assert(!p.contains("Scan ExistingRDD"),
      s"q29 under-gate is not the exact tiled shape:\n$p")
  }

  test("q29 over the gate: cell-bounded shape — checkpointed cell " +
    "assignment, never an all-pairs join") {
    // forced over the gate the plan must be the cell-bounded reroute:
    // the assignment/vecs frames are localCheckpoint RDD scans and the
    // candidate join is an equi join on cell (no theta/cartesian)
    val conf = spark.conf
    conf.set(graft.ops.VectorSearch.GateConf, "0")
    try {
      val p = plan("q29_embed_neardup")
      assert(p.contains("Scan ExistingRDD"),
        s"q29 over-gate lost the checkpointed cell assignment:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"q29 over-gate degenerated to an all-pairs join:\n$p")
    } finally conf.unset(graft.ops.VectorSearch.GateConf)
  }

  test("q145 interval-overlap self join stays an anchored equi join; " +
    "q146's only corpus-scale op is the hourly aggregate") {
    val p = plan("q145_session_copresence")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q145 fell back to a nested-loop theta join:\n$p")
    assert(!p.contains("CartesianProduct"), s"q145 goes cartesian:\n$p")
    // the sampled sibling keeps the same anchored equi shape
    val p361 = plan("q361_copresence_sampled")
    assert(!p361.contains("BroadcastNestedLoopJoin") &&
      !p361.contains("CartesianProduct"),
      s"q361 lost the anchored equi join:\n$p361")
    val p146 = plan("q146_hourly_autocorrelation")
    assert(p146.contains("BroadcastHashJoin"),
      s"q146 shuffle-joins the tiny hourly series:\n$p146")
    assert(!p146.contains("Window"), s"q146 uses a window:\n$p146")
  }

  test("q360 global top-k merges executor-side: two-phase aggregate, " +
    "never a driver-funnel TakeOrdered") {
    val p = plan("q360_global_topk")
    assert(!p.contains("TakeOrderedAndProject"),
      s"q360 regressed to the driver-funnel shape:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate") ||
      p.contains("ObjectHashAggregate"),
      s"q360 lost the two-phase aggregate merge:\n$p")
  }

  test("q363's only shuffle is the O(#sources) rollup: the per-doc " +
    "max-run is a per-row fold — no explode, no per-gram exchange") {
    val p = plan("q363_repetition_audit")
    assert(!p.contains("Generate"),
      s"q363 regressed to the explode shape:\n$p")
    // formatted plans print each node twice (tree + detail): one
    // exchange = two occurrences
    val nEx = "Exchange".r.findAllIn(p).length
    assert(nEx <= 2, s"q363 grew a second shuffle ($nEx):\n$p")
  }

  test("q147 novelty curve windows only the O(#checkpoints) bucket " +
    "table (both window inputs are aggregate outputs, joined broadcast)") {
    val p = plan("q147_gram_novelty_curve")
    assert(p.contains("Window"), s"q147 lost its running sum:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q147 shuffle-joins the bucket tables:\n$p")
  }

  test("q143 per-source top-100 is the bounded two-phase TopK, not a " +
    "window over a corpus-scale partition") {
    val p = plan("q143_zipf_slope")
    assert(!p.contains("Window"), s"q143 uses a window:\n$p")
  }

  test("q144 centroids broadcast back to the probe side") {
    val p = plan("q144_embedding_dispersion")
    assert(p.contains("BroadcastHashJoin"),
      s"q144 shuffle-joins the tiny centroid table:\n$p")
  }

  test("q148 repetition screen is two map-side-combined aggregations " +
    "— no windows, no sort") {
    val p = plan("q148_gopher_repetition")
    assert(!p.contains("Window"), s"q148 grew a window:\n$p")
    assert(p.contains("HashAggregate"), s"q148 lost hash aggregation:\n$p")
  }

  test("q149 quantile window runs over the (lang, len) histogram, " +
    "never the corpus; totals broadcast") {
    val p = plan("q149_exact_length_quantiles")
    // the cumulative window's input is the aggregated histogram: a
    // HashAggregate must appear BELOW the Window in the plan tree
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, s"q149 has no cumulative window:\n$p")
    assert(p.substring(winIdx).contains("HashAggregate") ||
      p.substring(0, winIdx).contains("HashAggregate"),
      s"q149 windows unaggregated rows:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q149 shuffle-joins the per-lang totals:\n$p")
  }

  test("q150 stratified split windows only sharded buckets and " +
    "broadcasts stratum sizes") {
    val p = plan("q150_stratified_split")
    val windows = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(p.contains("Window"), s"q150 has no rank window?\n$p")
    assert(windows.contains("bucket"), s"q150 window lost its bucket key")
    assert(p.contains("BroadcastHashJoin"),
      s"q150 shuffle-joins the tiny stratum-size table:\n$p")
  }

  test("q152 truncation audit is one aggregation pass, no joins") {
    val p = plan("q152_truncation_loss")
    assert(!p.contains("Join"), s"q152 grew a join:\n$p")
  }

  test("q153 normalized dedup is the one-shuffle groupBy shape") {
    val p = plan("q153_normalized_dedup")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"q153 lost the plain aggregation shape:\n$p")
  }

  test("q154 epoch reshuffle windows only sharded buckets (epoch is a " +
    "group column, not a pass)") {
    val p = plan("q154_epoch_reshuffle")
    val windows = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(p.contains("Window"), s"q154 has no rank window?\n$p")
    assert(windows.contains("bucket"), s"q154 window lost its bucket key")
  }

  test("q155 threshold sweep joins candidates on the band key, " +
    "never all pairs") {
    val p = plan("q155_dedup_threshold_sweep")
    assert(!p.contains("CartesianProduct"),
      s"q155 went all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      p.contains("jm"), // the threshold probe is the only theta join
      s"q155's candidate join degraded:\n$p")
  }

  test("q158 split leakage probes the train gram set on the hash key, " +
    "never nested-loop") {
    // the split-rank windows sit behind q158's gram checkpoint and are
    // pinned by q150's contract (identical construction); this plan
    // shows the post-checkpoint probe join
    val p = plan("q158_split_leakage")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"q158 gram join degraded:\n$p")
    assert(p.contains("Join"), s"q158 lost the gram probe join:\n$p")
  }

  test("q159 outliers broadcast the per-lang moments back to the " +
    "doc-score side") {
    val p = plan("q159_nll_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"q159 shuffle-joins the tiny moment tables:\n$p")
    assert(!p.contains("Window"), s"q159 grew a window:\n$p")
  }

  test("q157 waterfill broadcasts its scalar frames; windows run over " +
    "the O(#langs) table") {
    val p = plan("q157_token_budget_waterfill")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"q157 lost the scalar broadcasts:\n$p")
    // the corpus-side aggregation happens BEFORE any window
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && p.contains("HashAggregate"),
      s"q157 shape changed:\n$p")
  }

  test("q160 char entropy is MAP-ONLY: the kernel computes the row-" +
    "local statistic inside the scan — no shuffle at all") {
    val p = plan("q160_char_entropy")
    assert(!p.contains("Join"), s"q160 grew a join:\n$p")
    assert(!p.contains("Window"), s"q160 grew a window:\n$p")
    assert(!p.contains("Exchange"), s"q160 grew a shuffle:\n$p")
    assert(p.contains("char_entropy_terms"), s"q160 lost the kernel:\n$p")
  }

  test("q162 backoff probes broadcast the vocabulary-sized count tables") {
    // only the 5% val stream carries doc granularity; the unigram
    // tables and the scalar total must reach it as broadcasts
    val p = plan("q162_backoff_score")
    assert(p.contains("BroadcastHashJoin"),
      s"q162 shuffle-joins the unigram tables:\n$p")
    assert(!p.contains("Window"), s"q162 grew a window:\n$p")
  }

  test("q164 ensemble ranks come from histograms: windows only over " +
    "aggregated (lang, value) rows, counts broadcast back") {
    val p = plan("q164_quality_ensemble")
    assert(p.contains("Window"), s"q164 lost the histogram windows:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q164 lost the per-lang count broadcast:\n$p")
    // every Window input is a HashAggregate output (value histogram),
    // never a corpus-scale scan: formatted plans list Window nodes
    // right above their child — coarse check: at least two windows and
    // at least as many aggregates
    val nWin = p.linesIterator.count(l => l.contains("Window"))
    assert(nWin >= 2, s"q164 expected two histogram windows:\n$p")
  }

  test("q165 balance audit is join-free; its only window orders the " +
    "O(k) cell histogram") {
    val p = plan("q165_ivf_balance")
    assert(!p.contains("Join"), s"q165 grew a join:\n$p")
    assert(p.contains("Window") && p.contains("HashAggregate"),
      s"q165 shape changed:\n$p")
  }

  test("q166 transition matrix windows by user and broadcasts the " +
    "per-type totals") {
    val p = plan("q166_markov_transitions")
    val args = p.linesIterator.filter(_.contains("Arguments"))
      .mkString("\n")
    assert(args.contains("user_id"), s"q166 lost the per-user window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q166 shuffle-joins the |types| totals:\n$p")
  }

  test("q167 norm audit broadcasts the per-label moments; no windows") {
    val p = plan("q167_embedding_norm_audit")
    assert(p.contains("BroadcastHashJoin"),
      s"q167 shuffle-joins the tiny moment tables:\n$p")
    assert(!p.contains("Window"), s"q167 grew a window:\n$p")
  }

  test("q169 pair fan-out stays on the vocab table: source list and " +
    "totals broadcast, no windows") {
    val p = plan("q169_source_cross_entropy")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"q169 lost the broadcast fan-out:\n$p")
    assert(!p.contains("Window"), s"q169 grew a window:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q169 degraded to a cartesian product:\n$p")
  }

  test("q170/q171 composition audits are aggregation + broadcast only") {
    Seq("q170_split_psi", "q171_lang_source_lift").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"), s"$q grew a window:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q shuffle-joins its tiny frames:\n$p")
      assert(p.contains("HashAggregate"), s"$q lost its aggregates:\n$p")
    }
  }

  test("q180 energy audit is one scan + a 3-row aggregate: no joins, " +
    "no windows") {
    val p = plan("q180_embedding_energy_prefix")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"q180 shape changed:\n$p")
    assert(p.contains("dot_product"), s"q180 lost the dot kernel:\n$p")
  }

  test("q177 calibration is one scan + one aggregation: no joins, " +
    "no windows, codegen'd dot kernel") {
    val p = plan("q177_score_calibration")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"q177 shape changed:\n$p")
    assert(p.contains("dot_product") && p.contains("HashAggregate"),
      s"q177 lost the kernel/aggregate:\n$p")
  }

  test("q172/q173 classifier evals stay windowless; q172 broadcasts " +
    "its row totals") {
    val p172 = plan("q172_lang_confusion")
    assert(!p172.contains("Window") && p172.contains("BroadcastHashJoin"),
      s"q172 shape changed:\n$p172")
    val p173 = plan("q173_filter_kappa")
    assert(!p173.contains("Window"), s"q173 grew a window:\n$p173")
    assert(p173.contains("HashAggregate"), s"q173 lost aggregates:\n$p173")
  }

  test("q183 domain cap runs through the partial/final TopK, never a " +
    "per-domain window") {
    val p = plan("q183_domain_cap")
    assert(!p.contains("Window"), s"q183 grew a window:\n$p")
    assert(p.contains("HashAggregate"), s"q183 lost the TopK aggs:\n$p")
  }

  test("q184 URL dedup is one scan + one aggregation: no joins, no " +
    "windows") {
    val p = plan("q184_url_dedup")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"q184 shape changed:\n$p")
  }

  test("q185 KMV sketch: per-source bottom-k is windowless and the " +
    "pair join broadcasts the O(#sources) sketch side") {
    val p = plan("q185_kmv_distinct")
    assert(!p.contains("Window"), s"q185 grew a window:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"q185 pair join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q185 pair join shape wrong:\n$p")
  }

  test("q186 KN scoring broadcasts the vocabulary-sized count tables " +
    "at the held-out stream") {
    val p = plan("q186_kn_score")
    assert(p.contains("BroadcastHashJoin"), s"q186 lost broadcasts:\n$p")
    assert(!p.contains("Window"), s"q186 grew a window:\n$p")
  }

  test("q187 CDC chunking windows only per-document partitions and " +
    "joins chunks on the 60-bit hash") {
    // the QDef checkpoints the chunk table, truncating its lineage out
    // of the query plan — inspect the operator's own plan for the
    // window contract, the QDef's for the join shape
    val op = graft.ops.CdcChunks
      .chunks(graft.Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val windows = op.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(windows.nonEmpty, s"q187 lost its per-doc prefix sum:\n$op")
    assert(windows.contains("doc_id"),
      s"q187 window no longer partitioned by doc_id:\n$windows")
    val p = plan("q187_cdc_chunks")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q187 join shape wrong:\n$p")
  }

  test("q189 AUC: the rank statistic's only window runs over the " +
    "aggregated score histogram, never corpus rows") {
    val p = plan("q189_classifier_auc")
    // histogram aggregation BELOW the window: HashAggregate before
    // Window in the plan's bottom-up order
    assert(p.contains("Window"), s"q189 lost its histogram window:\n$p")
    assert(p.contains("dot_product"), s"q189 lost the dot kernel:\n$p")
    assert(!p.contains("Join"), s"q189 grew a join:\n$p")
  }

  test("q190 snapshot diff joins content hashes full-outer on doc_id; " +
    "no windows, no broadcast-nested-loop") {
    val p = plan("q190_snapshot_diff")
    assert(p.contains("FullOuter"), s"q190 lost the full-outer join:\n$p")
    assert(!p.contains("Window") && !p.contains("BroadcastNestedLoopJoin"),
      s"q190 shape changed:\n$p")
  }

  test("q191 NLL mass curve: vocab broadcasts at the token stream; " +
    "the cumulative window runs over the bucket histogram only") {
    val p = plan("q191_nll_mass_curve")
    assert(p.contains("BroadcastHashJoin"), s"q191 lost the vocab " +
      s"broadcast:\n$p")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(windows.contains("bucket"),
      s"q191 window not over the bucket histogram:\n$windows")
  }

  test("q192 temperature sweep: one corpus aggregation; the " +
    "normalizer is a window over the O(3·langs) frame, never a " +
    "join-back that re-executes the tokenize pass") {
    val p = plan("q192_temperature_sweep")
    assert(!p.contains("Join"), s"q192 grew a join:\n$p")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(windows.contains("alpha_milli"),
      s"q192 window not per-alpha:\n$p")
  }

  test("q193 radius sweep: pair generators stay blocked equi joins — " +
    "no cartesian, no nested loop over the corpus") {
    val p = plan("q193_simhash_radius_sweep")
    assert(!p.contains("CartesianProduct"), s"q193 went cartesian:\n$p")
    assert(!p.contains("Window"), s"q193 grew a window:\n$p")
  }

  test("q194 batch-size sweep: ranks come from the two-level prefix " +
    "sum — every window partitions on the sharded bucket") {
    val p = plan("q194_batchsize_sweep")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(windows.nonEmpty, s"q194 lost its rank windows:\n$p")
    assert(windows.linesIterator.forall(_.contains("bucket")),
      s"q194 window not bucket-sharded:\n$windows")
  }

  test("q195 cluster purity joins members to sources on the id — " +
    "no cartesian anywhere in the CC + rollup pipeline") {
    val p = plan("q195_cluster_purity")
    assert(!p.contains("CartesianProduct"), s"q195 went cartesian:\n$p")
  }

  test("q198 curriculum audit is one scan + one aggregation: hash-" +
    "range deciles need no rank pass (no windows, no joins)") {
    val p = plan("q198_curriculum_audit")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"q198 shape changed:\n$p")
    assert(p.contains("char_entropy"), s"q198 lost the kernel:\n$p")
  }

  test("q199 gap sweep windows only per-user partitions") {
    val p = plan("q199_session_gap_sweep")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(windows.nonEmpty && windows.contains("user_id"),
      s"q199 window not per-user:\n$p")
    assert(!p.contains("Join"), s"q199 grew a join:\n$p")
  }

  test("q201 syndication: the pair join runs on the 60-bit chunk " +
    "hash — no cartesian, no nested loop") {
    val p = plan("q201_chunk_syndication")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q201 shape wrong:\n$p")
  }

  test("q202 coverage probe: distinct gram tables meet in a semi " +
    "join on (n, hash); no windows") {
    val p = plan("q202_ngram_coverage")
    assert(p.contains("LeftSemi"), s"q202 lost the semi join:\n$p")
    assert(!p.contains("Window"), s"q202 grew a window:\n$p")
  }

  test("q203 order sensitivity reads one scan into two aggregations " +
    "— no windows, no self-join of the corpus") {
    val p = plan("q203_dedup_order_sensitivity")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"q203 shape changed:\n$p")
  }

  test("q188 RP recall: rankings are windowless TopK and the overlap " +
    "join broadcasts (projections pinned by the op plan)") {
    val p = plan("q188_rp_recall")
    assert(!p.contains("Window"), s"q188 grew a window:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"), s"q188 join shape wrong:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q188 lost its broadcast:\n$p")
  }

  test("q208 fuzzy decon: the gram-df table and title joins broadcast; " +
    "per-doc prefix windows partition by doc_id") {
    val p = plan("q208_fuzzy_decon")
    assert(p.contains("BroadcastHashJoin"), s"q208 lost broadcasts:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q208 went all-pairs:\n$p")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(windows.nonEmpty && windows.contains("doc_id"),
      s"q208 prefix rank not per-doc:\n$p")
  }

  test("q209 NB: the vocabulary-sized model joins broadcast — the " +
    "corpus token stream is never sort-merge-joined") {
    val p = plan("q209_nb_langid")
    assert(p.contains("BroadcastHashJoin"), s"q209 lost broadcasts:\n$p")
    assert(!p.contains("Window"), s"q209 grew a window:\n$p")
  }

  test("q213 unigram apply: the word → piece-count model broadcasts " +
    "at the corpus token stream") {
    val p = plan("q213_unigram_fertility")
    assert(p.contains("BroadcastHashJoin"), s"q213 lost the broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q213 sort-merge-joins the corpus:\n$p")
  }

  test("q217 funnel: both running-min windows partition by user and " +
    "share one sort — no self-join of the event stream") {
    val p = plan("q217_event_funnel")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(windows.nonEmpty && windows.contains("user_id"),
      s"q217 windows not per-user:\n$p")
    assert(!p.contains("Join"), s"q217 grew a join:\n$p")
  }

  test("q214 LPA under the gate: label vectors broadcast, edges " +
    "resident") {
    val p = plan("q214_domain_communities")
    assert(p.contains("BroadcastHashJoin"), s"q214 lost broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q214 shuffle-joins labels:\n$p")
  }

  test("q215 triangles: oriented wedge + closing joins are equi " +
    "joins — no cartesian, no nested loop, and the close is a semi " +
    "join") {
    val p = plan("q215_domain_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q215 went all-pairs:\n$p")
    assert(p.contains("LeftSemi"), s"q215 lost the semi-join close:\n$p")
  }

  test("q216 per-lang quantiles: every window partitions by lang " +
    "(sample rows or value histogram — never the corpus unpartitioned)") {
    val p = plan("q216_lang_quantiles")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(windows.nonEmpty, s"q216 lost its rank windows:\n$p")
    assert(!windows.linesIterator.exists(w => !w.contains("lang")),
      s"q216 has an unpartitioned window:\n$windows")
  }

  test("q211 under the gate: HITS vectors broadcast, edges resident") {
    val p = plan("q211_domain_hits")
    assert(p.contains("BroadcastHashJoin"), s"q211 lost broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q211 shuffle-joins vectors:\n$p")
  }

  test("q211 over the gate: vectors shuffle-join WITHOUT re-shuffling " +
    "either resident edge copy per iteration") {
    // web-scale shape: edges laid out by src AND dst once; per
    // half-iteration only the O(#nodes) vector exchanges. Contract:
    // no Exchange re-partitions a checkpointed (src, dst) scan.
    import org.apache.spark.sql.execution.RDDScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val conf = spark.conf
    conf.set(graft.ops.Hits.GateConf, "0")
    conf.set("spark.sql.adaptive.enabled", "false") // plain executedPlan
    try {
      val df = SparkEntry.queries("q211_domain_hits")(spark, dir)
      val exec = df.queryExecution.executedPlan
      assert(exec.collect { case j: ShuffledHashJoinExec => j }.nonEmpty,
        s"over-gate q211 lost the shuffle-hash vector joins:\n$exec")
      // the contribution aggregation legitimately exchanges its
      // map-side-COMBINED partials each half-iteration; what must
      // never appear is an Exchange over RAW edge rows — i.e. one
      // whose subtree reaches the (src, dst) scan with no aggregate
      // in between
      import org.apache.spark.sql.execution.aggregate.HashAggregateExec
      val edgeReshuffles = exec.collect {
        case e: ShuffleExchangeExec if (e.outputPartitioning match {
          case h: HashPartitioning =>
            h.references.exists(a => a.name == "src" || a.name == "dst")
          case _ => false
        }) && e.child.collectFirst {
          case r: RDDScanExec
            if r.output.map(_.name).toSet == Set("src", "dst") => r
        }.nonEmpty && e.child.collectFirst {
          case a: HashAggregateExec => a
        }.isEmpty => e
      }
      assert(edgeReshuffles.isEmpty,
        s"raw edge rows re-shuffled per iteration:\n$exec")
    } finally {
      conf.unset(graft.ops.Hits.GateConf)
      conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("q256 winsorize fences are histogram-first: no raw-value " +
    "percentile aggregate (O(distinct) per-group state) in the plan") {
    val p = plan("q256_robust_value_stats")
    assert(!p.toLowerCase.contains("percentile"),
      s"q256 regressed to a percentile aggregate over raw values:\n$p")
    // the fence pass must ride the (event_type, vm) histogram: a
    // cumulative window partitioned by event_type over micro values
    assert(p.contains("Window"), s"q256 lost the cumulative window:\n$p")
    val windowArgs = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(windowArgs.contains("event_type"),
      s"q256 window lost its per-type partition:\n$p")
  }

  test("q257/q259 NSW beams: every id lookup broadcasts (the beam is " +
    "always the small side) and the final ranking is bounded") {
    // the beam rounds execute behind localCheckpoints; the visible
    // final stage must still carry the contract — broadcast lookups,
    // no sort-merge exchange of the corpus, bounded final top-k
    val p257 = plan("q257_ann_nsw")
    assert(p257.contains("TakeOrderedAndProject"),
      s"q257 final top-10 lost TakeOrdered:\n$p257")
    assert(p257.contains("BroadcastHashJoin"),
      s"q257 beam lookup lost its broadcast:\n$p257")
    assert(!p257.contains("SortMergeJoin"),
      s"q257 shuffles the corpus for a beam lookup:\n$p257")
    val p259 = plan("q259_ann_nsw_batch")
    assert(p259.contains("BroadcastHashJoin"),
      s"q259 beam lookup lost its broadcast:\n$p259")
    assert(!p259.contains("SortMergeJoin"),
      s"q259 shuffles the corpus for a beam lookup:\n$p259")
    // the final rank is PARTITION BY qid — per query, never global
    val w259 = p259.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(w259.contains("qid"),
      s"q259 final rank lost its per-query partition:\n$p259")
  }

  test("q264/q266/q276: the quantile/median family is histogram-first " +
    "— no raw percentile aggregate anywhere, per-key windows only") {
    Seq("q264_logbucket_quantiles", "q266_mad_outliers",
      "q276_source_length_sketch").foreach { q =>
      val p = plan(q)
      assert(!p.toLowerCase.contains("percentile("),
        s"$q fell back to a raw percentile aggregate:\n$p")
      val windowArgs = p.linesIterator
        .filter(_.contains("Arguments")).mkString("\n")
      assert(windowArgs.contains("event_type") ||
        windowArgs.contains("source"),
        s"$q window lost its per-key partition:\n$p")
    }
  }

  test("q268: the three gram orders aggregate without an Expand stack " +
    "(one distinct-aggregate per (source, n) group)") {
    val p = plan("q268_ngram_diversity")
    assert(!p.contains("Expand"),
      s"q268 planned stacked count-distincts via Expand:\n$p")
  }

  test("q278: the PCA projection is map-only against literal " +
    "eigenvectors — zero exchanges in the output plan") {
    val p = plan("q278_pca_project")
    assert(!p.contains("Exchange"),
      s"q278 projection shuffles:\n$p")
  }

  test("q336/q337: the two-sample grid windows partition by source " +
    "or run on the bounded value domain — never a corpus partition") {
    Seq("q336_ks_source_drift", "q337_auc_mann_whitney").foreach { q =>
      val p = plan(q)
      // every Window is over the O(S·V) grid: either partitioned by
      // source or ordered over the distinct-value domain after an
      // aggregate — the plan must not sort raw document rows
      assert(p.contains("Window"), s"$q lost its cumulative windows")
      assert(p.contains("HashAggregate"), s"$q lost the histogram agg")
    }
  }

  test("q341: corpus stats broadcast into the docs x terms grid (cf " +
    "and |C| never shuffle-join)") {
    val p = plan("q341_qlm_dirichlet")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"q341 lost the tiny-side broadcasts:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q341 lost the bounded top-k:\n$p")
  }

  test("q343: the per-source KMV sketch is the partial/final TopK — " +
    "no per-source sort window over the vocabulary") {
    val p = plan("q343_kmv_set_ops")
    // the only row_number windows allowed are over the O(S²·K)
    // pair-sketch frame (partitioned by the source PAIR)
    val windowArgs = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(!windowArgs.contains("windowspecdefinition(source#") ||
      windowArgs.contains("source_a"),
      s"q343 windows a per-source vocabulary partition:\n$p")
    assert(p.contains("HashAggregate"), s"q343 lost the TopK aggs:\n$p")
  }

  test("q350: the ring is the broadcast side of the owner probe") {
    val p = plan("q350_resharding_audit")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"q350 shuffles keys against the O(nodes·vnodes) ring:\n$p")
  }

  test("q355: split ranks come from the two-level bucket construction " +
    "— every doc-level window partitions by (source, bkt)") {
    val p = plan("q355_split_manifest")
    val windowArgs = p.linesIterator
      .filter(_.contains("Arguments")).mkString("\n")
    assert(windowArgs.contains("bkt"),
      s"q355 lost the bucketed rank partition:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q355 shuffle-joins the O(S·256) offsets:\n$p")
  }

  test("q376: the 12-row probe-key set is the BROADCAST side of the " +
    "bucket join (the corpus index never shuffles for a query) and " +
    "the re-rank stays TakeOrdered") {
    val p = plan("q376_ann_lsh_multiprobe")
    assert(p.contains("BroadcastHashJoin"),
      s"q376 must broadcast the probe keys:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q376 re-rank must stay a bounded TakeOrdered:\n$p")
  }

  test("q375: the final ranking reads the SERVED delta-part artifact " +
    "(multi-path parquet scan of delta_tokcounts payloads), not a " +
    "recomputation of the corpus") {
    val p = plan("q375_delta_token_counts")
    assert(p.contains("delta_tokcounts"),
      s"q375 must serve the committed parts:\n$p")
    // the counts were built at commit time — the returned plan ranks
    // the artifact and never scans the documents table
    assert(!p.contains("documents.parquet"),
      s"q375's serve path must not rescan the corpus:\n$p")
  }
  test("q395/q393: the maintained ANN/near-dup serves keep bounded " +
    "join shapes (store-read pins live in the Stream*IndexSpec " +
    "suites; q395/q401 checkpoint the served frame, which cuts it " +
    "out of the final plan's lineage)") {
    val p395 = plan("q395_ann_ivf_maintained_served")
    assert(p395.contains("TakeOrderedAndProject"),
      s"q395 re-rank must stay a bounded TakeOrdered:\n$p395")
    assert(!p395.contains("CartesianProduct"),
      s"q395 went cartesian:\n$p395")
    val p393 = plan("q393_neardup_maintained_served")
    assert(p393.contains("stream_minhash_serve"),
      s"q393 must read the maintained key store:\n$p393")
    assert(!p393.contains("CartesianProduct") &&
      !p393.contains("BroadcastNestedLoopJoin"),
      s"q393's band self-join must stay an equi join:\n$p393")
  }

  test("q401: the simhash near-dup answers ENTIRELY off the " +
    "maintained signature store - the plan never touches document " +
    "text") {
    val p = plan("q401_simhash_maintained_neardup")
    assert(!p.contains("documents.parquet"),
      s"q401 must not rescan the corpus:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q401's byte-block self-join must stay an equi join:\n$p")
  }
}
