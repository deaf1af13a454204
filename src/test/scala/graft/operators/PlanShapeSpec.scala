package graft.operators

import graft.SparkSpec

/** Physical-plan regression guards: the scale properties argued in
  * SCALING.md, machine-checked. If a refactor silently turns a broadcast
  * star join into sort-merge, or breaks filter pushdown through the
  * loader's repartition, these fail before any benchmark notices. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: filters and column pruning reach the parquet scan") {
    val p = planOf(Relational.q6FilterAgg(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(500))
    assert(p.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
        "l_discount:double,l_shipdate:timestamp_ntz>"), p.take(2000))
  }

  test("q5: star join is all-broadcast, no sort-merge") {
    val p = planOf(Relational.q5MultiJoin(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast")
  }

  test("q12: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = planOf(Relational.q12TopK(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("q61: hybrid search top-k is TakeOrdered, query vector broadcast") {
    val p = planOf(Similarity.q61HybridSearch(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query vector must broadcast")
  }

  test("q36: cosine expression participates in codegen (no UDF call)") {
    val p = planOf(Similarity.q36CosineTopK(spark, sfDir))
    assert(p.contains("cosine_sim"))
    assert(!p.toLowerCase.contains("scalaudf"), "must not fall back to a UDF")
  }

  test("q62: benchmark gram set broadcasts; no sort-merge join") {
    val p = planOf(Curation.q62Decontaminate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "benchmark grams must broadcast — the corpus side never shuffles " +
        "for the contamination check")
  }

  test("q63: hash split is a single-shuffle aggregation, no UDF") {
    val p = planOf(Curation.q63HashSplit(spark, sfDir))
    assert("Exchange".r.findAllMatchIn(p).length == 1, p.take(800))
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q67: no window runs over the full corpus in one task") {
    // the distributed prefix sum's only empty-partition window is over
    // BUCKET TOTALS; every corpus-row window is partitioned by bkt. A
    // regression to the naive global cumsum would put an unpartitioned
    // Window directly over the (large) token stream.
    val plan = Curation.packSequences(
      graft.Tables.load(spark, sfDir, "documents"), 8192L)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      // the unpartitioned window must sit above the bucket aggregate,
      // i.e. consume an Aggregate, never the raw doc scan
      val overAgg = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isDefined
      assert(overAgg,
        "unpartitioned window must consume bucket totals, not corpus rows")
    }
  }

  test("q68: quantile thresholds broadcast to the corpus filter") {
    val p = planOf(Curation.q68QualityPrune(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the 5-row threshold table must broadcast")
  }

  test("production scan path: no Exchange above a plain filter scan " +
    "(spreadScans defaults off)") {
    assert(spark.conf.getOption(graft.Tables.SpreadScansKey).isEmpty)
    val df = graft.Tables.load(spark, sfDir, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val p = planOf(df)
    assert(!p.contains("Exchange"),
      s"plain filter+project must not shuffle:\n${p.take(800)}")
    assert(p.contains("PushedFilters"), p.take(500))
  }

  test("harness scan path: spreadScans=true restores local parallelism") {
    spark.conf.set(graft.Tables.SpreadScansKey, "true")
    try {
      val df = graft.Tables.load(spark, sfDir, "lineitem")
      assert(df.queryExecution.executedPlan.toString.contains("Exchange"),
        "spread loader must repartition the one-row-group test parquet")
    } finally spark.conf.unset(graft.Tables.SpreadScansKey)
  }
  test("IVF probe: the cells scan partition-prunes to the probed cells") {
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("ivf_prune")
      .toString + "/idx"
    Similarity.buildIvfIndex(spark, e, idx, nlist = 16, replicas = 2)
    // ONE query at nprobe=4 → the static IN-filter names ≤ 4 of the 16
    // cell directories; anything more means the pruning claim regressed
    val queries = e.filter(
      org.apache.spark.sql.functions.col("vec_id") === 0)
      .select(org.apache.spark.sql.functions.col("vec_id").as("q_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_emb"))
    val probe = Similarity.probeIvfIndex(spark, idx, queries,
      k = 5, nprobe = 4)
    val p = planOf(probe)
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan") && l.contains("/cells"))
      .getOrElse(fail(s"no cells FileScan in plan:\n${p.take(2000)}"))
    val inList = raw"cell#\d+ IN \(([^)]*)\)".r.findFirstMatchIn(scanLine)
    assert(inList.isDefined,
      s"cells scan must carry a literal partition IN-filter:\n$scanLine")
    val nCells = inList.get.group(1).split(",").length
    assert(nCells <= 4, s"probe of nprobe=4 selected $nCells cells")
    assert(probe.count() > 0)
  }

  test("IVFADC probe: the codes scan partition-prunes to the probed cells") {
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_prune")
      .toString + "/idx"
    Quantize.buildIvfPqIndex(spark, e, idx, nlist = 16, replicas = 2)
    val queries = e.filter(
      org.apache.spark.sql.functions.col("vec_id") === 0)
      .select(org.apache.spark.sql.functions.col("vec_id").as("q_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_emb"))
    val probe = Quantize.probeIvfPqIndex(spark, idx, queries, e,
      k = 5, nprobe = 4, rerankN = 16)
    val p = planOf(probe)
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan") && l.contains("/cells"))
      .getOrElse(fail(s"no cells FileScan in plan:\n${p.take(2000)}"))
    val inList = raw"cell#\d+ IN \(([^)]*)\)".r.findFirstMatchIn(scanLine)
    assert(inList.isDefined,
      s"cells scan must carry a literal partition IN-filter:\n$scanLine")
    val nCells = inList.get.group(1).split(",").length
    assert(nCells <= 4, s"probe of nprobe=4 selected $nCells cells")
    // the pruned scan reads codes, never embeddings
    assert(!scanLine.contains("embedding"),
      s"IVFADC cell scan must read codes only:\n$scanLine")
    assert(probe.count() > 0)
  }

  test("IVF-SQ8 probe: the codes scan partition-prunes to the probed " +
      "cells and the decode-score expression stays codegen (no UDF)") {
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("ivfsq_prune")
      .toString + "/idx"
    Quantize.buildIvfSqIndex(spark, e, idx, nlist = 16, replicas = 2)
    val queries = e.filter(
      org.apache.spark.sql.functions.col("vec_id") === 0)
      .select(org.apache.spark.sql.functions.col("vec_id").as("q_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_emb"))
    val probe = Quantize.probeIvfSqIndex(spark, idx, queries, e,
      k = 5, nprobe = 4, rerankN = 16)
    val p = planOf(probe)
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan") && l.contains("/cells"))
      .getOrElse(fail(s"no cells FileScan in plan:\n${p.take(2000)}"))
    val inList = raw"cell#\d+ IN \(([^)]*)\)".r.findFirstMatchIn(scanLine)
    assert(inList.isDefined,
      s"cells scan must carry a literal partition IN-filter:\n$scanLine")
    val nCells = inList.get.group(1).split(",").length
    assert(nCells <= 4, s"probe of nprobe=4 selected $nCells cells")
    // the pruned scan reads codes, never embeddings; the asymmetric
    // decode-score is higher-order expressions, not a Scala UDF
    assert(!scanLine.contains("embedding"),
      s"IVF-SQ8 cell scan must read codes only:\n$scanLine")
    assert(!p.contains("BatchEvalPython") &&
      !p.toLowerCase.contains("scalaudf"),
      "SQ8 decode-score must stay in codegen expressions")
    assert(probe.count() > 0)
  }

  test("q72: mixture spec broadcasts; sampling itself adds no shuffle") {
    val p = planOf(Curation.q72DomainMix(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the per-domain rate spec must broadcast")
  }

  test("q73: OOV set broadcasts; reassembly is hash-aggregated, no sort") {
    val p = planOf(Curation.q73VocabPrune(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the rare-token set is |vocab|-bounded and must broadcast")
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q74: df side broadcasts; the top-3 window partitions by doc_id") {
    val p = planOf(Curation.q74Keywords(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the document-frequency table is |vocab|-bounded and must broadcast")
    assert(p.contains("windowspecdefinition(doc_id"), p.take(2000))
  }

  test("q90: both fusion signals TakeOrdered before any rank window") {
    val p = planOf(Similarity.q90RrfFusion(spark, sfDir))
    assert("TakeOrderedAndProject".r.findAllMatchIn(p).length >= 2,
      "lexical and vector signals must both bound to top-K via " +
        "TakeOrderedAndProject, never a global sort: " + p.take(800))
  }

  test("q94: winsorize thresholds broadcast; clamp adds no shuffle") {
    val p = planOf(Curation.q94Winsorize(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the |keys|-bounded threshold tables must broadcast")
  }

  test("q95: domain normalization is one aggregate exchange, no UDF") {
    val p = planOf(Curation.q95UrlDomains(spark, sfDir))
    assert("Exchange".r.findAllMatchIn(p).length == 1, p.take(800))
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q98: blocklist and blocked-id set both broadcast; corpus never shuffles") {
    val p = planOf(Curation.q98DomainBlocklist(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the bounded blocklist and the blocked-id set must broadcast — " +
        "the corpus side of the anti-join never shuffles")
  }

  test("q84: span detection is window-only — no join, no pair expansion") {
    val p = planOf(Dedup.q84DupSpans(spark, sfDir))
    assert(!p.contains("Join"),
      "dup-gram counting must be a count-window, never a self-join " +
        "(a join would recompute or re-shuffle the gram stream)")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("windowspecdefinition(g"), p.take(2000))
  }

  test("q86: PII redaction is map-only — zero exchanges") {
    val p = planOf(Curation.q86PiiRedact(spark, sfDir)
      .select("doc_id", "n_email", "redacted"))
    assert(!p.contains("Exchange"),
      "regex scrub must not shuffle at any scale")
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q88: header parse is map-only — zero exchanges, no UDF") {
    val p = planOf(Multimodal.q88MediaHeader(spark, sfDir))
    assert(!p.contains("Exchange"),
      "header extraction must not shuffle at any scale")
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q106: semdedup pairwise join shuffles on cell only, no cartesian") {
    graft.functions.VectorFunctions.register(spark)
    val p = planOf(Similarity.q106SemDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct"),
      "within-cell pairing must join on the cell key, never cross the " +
        "whole corpus")
    assert(p.contains("cosine_sim"))
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q107: BM25 stats broadcast; top-k is TakeOrdered, not a sort") {
    val p = planOf(TextAnalysis.q107Bm25(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "the |terms|-row df table and the 1-row corpus stats must " +
        "broadcast — the tf side never reshuffles for them")
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q108: snapshot diff is one join and no post-join shuffle blowup") {
    val p = planOf(Snapshot.q108SnapshotDiff(spark, sfDir))
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllMatchIn(p).length == 1,
      p.take(800))
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q118: global weighted sample is TakeOrdered; stratified side has no window") {
    val p = planOf(Sampling.q118WeightedSample(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Window"),
      "per-stratum top-k must be the bounded-heap aggregator, not a " +
        "corpus-sorting window")
  }

  test("q119: tf-idf top-k window partitions by doc_id, never global") {
    val p = planOf(TextAnalysis.q119Tfidf(spark, sfDir))
    assert(p.contains("Window"), p.take(500))
    assert("Window \\[[^\\]]*\\], \\[doc_id".r.findFirstIn(p).isDefined,
      "window must partition by doc_id: " + p.take(1200))
  }

  test("q120/q122: funnel and pagerank are equi-join only, no cartesian") {
    val pf = planOf(Behavior.q120Funnel(spark, sfDir))
    assert(!pf.contains("CartesianProduct"), pf.take(500))
    val pg = planOf(Graph.q122Pagerank(spark, sfDir))
    assert(!pg.contains("CartesianProduct"), pg.take(500))
    assert(!pg.toLowerCase.contains("scalaudf"))
  }

  test("q117: fuzzy-join candidates come from equi-joins, never a cross join") {
    val p = planOf(FuzzyJoin.q117EditdistJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct"),
      "prefix/band pruning must keep the pairing equi-keyed")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q130: PMI top-k is TakeOrdered; marginal joins never sort-merge") {
    val p = planOf(TextAnalysis.q130PmiCollocations(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q131: interval coverage is a SINGLE shuffle end-to-end") {
    // window on key, then (key, island) and (key) aggregates all reuse
    // the key partitioning — subset-clustering must keep them
    // exchange-free
    val p = planOf(Intervals.q131IntervalCoverage(spark, sfDir))
    assert("Exchange".r.findAllMatchIn(p).length == 1, p.take(1200))
  }

  test("q132: transition row-normalization joins broadcast") {
    val p = planOf(Behavior.q132MarkovTransitions(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "the |types|^2 totals table must broadcast")
  }

  test("q135: chi-square marginals broadcast back onto the cell table") {
    val p = planOf(Stats.q135Chi2Cells(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q136: CUSUM plans two exchanges (series agg + key window), no UDF") {
    val p = planOf(Stats.q136CusumChangepoint(spark, sfDir))
    assert("Exchange".r.findAllMatchIn(p).length == 2, p.take(1200))
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q138: jaro_winkler runs as the native expression, not a UDF") {
    val df = FuzzyJoin.q138JaroRerank(spark, sfDir)
    // the value-first rewrite moved the jaro expression into a
    // HashAggregate's resultExpressions, which the PHYSICAL plan string
    // does not print — assert presence on the optimized logical plan,
    // absence of UDF fallback on the physical one
    assert(df.queryExecution.optimizedPlan.toString.contains("jaro_winkler"),
      df.queryExecution.optimizedPlan.toString.take(800))
    assert(!planOf(df).toLowerCase.contains("scalaudf"))
  }

  test("q148: EWMA is one shuffle on the key, fold stays codegen-side") {
    val p = planOf(EventTime.q148Ewma(spark, sfDir))
    assert(!p.toLowerCase.contains("scalaudf"),
      "the ordered fold must be the native aggregate() HOF")
    assert(!p.contains("Window"), "no window — the fold runs per group")
  }

  test("q150/q155: two-sample tests never re-touch the corpus after the cell table") {
    val pw = planOf(Stats.q150WelchTtest(spark, sfDir))
    assert(!pw.contains("CartesianProduct"), pw.take(800))
    val pm = planOf(Stats.q155MannWhitney(spark, sfDir))
    assert(!pm.contains("CartesianProduct"), pm.take(800))
    assert(!pm.toLowerCase.contains("scalaudf"))
  }

  test("q151: c-TF-IDF class-mass broadcasts; top-k window partitions by class") {
    val p = planOf(TextAnalysis.q151Ctfidf(spark, sfDir))
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(p.contains("windowspecdefinition(source"),
      "the rank window must partition by the class column\n" + p.take(1500))
  }

  test("q153: basket pairs is an equi-join on the basket key, no cartesian") {
    val p = planOf(Baskets.q153BasketPairs(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must never be a global sort")
  }

  test("q156: novelty probe is an equi-join on the gram, no cartesian") {
    val p = planOf(TextAnalysis.q156NgramNovelty(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q178: benchmark vectors broadcast; corpus never shuffles pre-max") {
    val p = planOf(Similarity.q178SemanticDecontam(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("cosine_sim") && !p.toLowerCase.contains("scalaudf"))
  }

  test("q181: rule table broadcasts; prefix match is an equi-join") {
    val p = planOf(Curation.q181PrefixRules(spark, sfDir))
    // the PROBE join must be hash-equi on (domain, prefix) — a LIKE-scan
    // would plan a nested loop over the corpus. (The 10x9 rule-table
    // construction cross is bounded and allowed.)
    assert(p.contains("BroadcastHashJoin [domain#"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q180: HITS iterations are equi-joins, never cartesian") {
    val p = planOf(Graph.q180Hits(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q179: BPE pair stats plan is vocabulary-sided (top-k TakeOrdered)") {
    val p = planOf(Bpe.q179BpePairs(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("q176: k-anonymity preserves rows — one count shuffle, a join, no explosion") {
    val p = planOf(Curation.q176KAnonymity(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q205: evolved union binds columns by name, not position") {
    val rows = Relational.q205UnionEvolve(spark, sfDir).collect()
    // every legacy row must land with a real nation key and NULL segment
    assert(rows.exists(r => r.getString(1) == "<missing>"
      && r.getString(2) == "legacy"))
    assert(rows.exists(r => r.getString(2) == "<none>"
      && r.getString(1) != "<missing>"))
  }

  test("q208: skyline plans windows and joins, never a dominance cross join") {
    val p = planOf(Relational.q208Skyline(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the sort-based skyline must not fall back to the quadratic " +
        "dominance join")
  }

  test("q232: NB model joins are hash/equi joins — no cartesian anywhere " +
      "but the deliberate L-expansion broadcast") {
    val p = planOf(Classify.q232NbConfusion(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the argmax window partitions by doc_id, never globally
    assert(!p.contains("WindowExec: No Partition Defined"))
  }

  test("q234: covariance is ONE pass — partial+final aggregate, no self-join") {
    val p = planOf(Pca.q234Covariance(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"),
      "pair expansion must be a per-row HOF, never a row-to-row join")
    // map-side combine: a partial aggregation phase must exist
    assert(p.contains("partial_sum") || p.contains("Partial"), p.take(1200))
  }

  test("q252: the PCA projection is map-side against literal components " +
      "— no joins, no windows in the emitted plan") {
    val p = planOf(Pca.q252PcaProjection(spark, sfDir))
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("CartesianProduct"),
      "projection must be per-row math + one label aggregate\n" +
        p.take(800))
  }

  test("q239: the isotonic segment lattice is an equi-join on the group key") {
    val p = planOf(Eval.q239Isotonic(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the (j <= k) lattice must ride the group equi-join, not a " +
        "quadratic fallback")
  }

  test("q237: prefix-filter join verifies on equi-keys only") {
    val p = planOf(Dedup.q237Ppjoin(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }
}
