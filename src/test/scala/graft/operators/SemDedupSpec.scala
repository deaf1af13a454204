package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  private def removed(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("cellwise removals are a subset of single-cell (exhaustive) removals") {
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val exhaustive = removed(Similarity.semDedup(e, nlist = 1, tau = 0.3))
    val cellwise = removed(Similarity.semDedup(e, nlist = 4, tau = 0.3))
    assert(cellwise.subsetOf(exhaustive),
      "clustering may only LOSE pairs (across cells), never invent them")
    assert(exhaustive.nonEmpty, "fixture must have ≥0.3-cosine pairs")
  }

  test("well-separated clusters: cellwise equals brute force") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // 3 orthogonal clusters of 20 vectors; within a cluster, vectors
    // share a base axis with a small member-specific perturbation on a
    // private dimension — within-cluster cosine ≈ 1, across ≈ 0, so a
    // correct k-means (k = 3) must reproduce the exhaustive answer.
    val dim = 16
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val v = Array.fill(dim)(0.0f)
      v(c) = 1.0f
      v(8 + c) = 0.01f * (i % 5) // 4 duplicates per perturbation level
      ((c * 100 + i).toLong, v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val exhaustive = removed(Similarity.semDedup(e, nlist = 1, tau = 0.9))
    val cellwise = removed(Similarity.semDedup(e, nlist = 3, tau = 0.9))
    assert(cellwise == exhaustive,
      "no near-dup pair may straddle cells when clusters are separated")
    assert(exhaustive.nonEmpty)
  }

  test("semDedupProbe: corpus precedence, batch-internal keep-first, far kept") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val idx = java.nio.file.Files.createTempDirectory("semprobe").toString +
      "/index"
    Similarity.buildIvfIndex(spark, e, idx, nlist = 8, replicas = 2)
    // three-part batch: a ×2 copy of corpus vector 0 (corpus-removed), a
    // NEGATED corpus vector (cos ≤ 0.6 to everything: kept, and the
    // batch's earliest claimant of its direction), and a ×2 copy of that
    // negation with a HIGHER id (batch-internal removed)
    val e0 = e.filter(col("vec_id") === 0)
    val batch = e0.select(lit(100L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      .unionByName(e0.select(lit(200L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding")))
      .unionByName(e0.select(lit(300L).as("vec_id"),
        transform(col("embedding"), x => -x * lit(2.0f)).as("embedding")))
    val got = removed(Similarity.semDedupProbe(spark, batch, idx, tau = 0.9))
    assert(got == Set(100L, 300L),
      "copy of corpus → removed; negation → kept (first); its ×2 → removed")
  }

  test("×2-scaled copies land in their original's cell for any nlist") {
    // the q106b oracle's structural premise, at a different nlist than
    // the gate uses: scaling by two shifts exponents only, so every cell
    // affinity doubles exactly and the argmax cell cannot move — the
    // planted copy is always removed, at any clustering granularity
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + Dedup.PlantOffset).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val expected = e.filter(col("vec_id") % 10 === 0)
      .collect().map(_.getLong(0) + Dedup.PlantOffset).toSet
    for (nlist <- Seq(2, 5, 16)) {
      val got = removed(
        Similarity.semDedup(e.unionByName(planted), nlist, tau = 0.9))
      assert(got == expected, s"nlist=$nlist must remove exactly the copies")
    }
  }

  test("semDedupProbeSq: SQ8-backed probe equals the float probe, and " +
      "its candidate scan reads CODES ONLY (no embedding column)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("semsq").toString
    val fIdx = s"$dir/fidx"; val sIdx = s"$dir/sidx"
    Similarity.buildIvfIndex(spark, e, fIdx, nlist = 8, replicas = 2)
    Quantize.buildIvfSqIndex(spark, e, sIdx, nlist = 8, replicas = 2)
    // the q110 batch shape: ×2 copies of every 20th corpus vector plus
    // the probe-spec trio (corpus copy / negation / negated copy)
    val e0 = e.filter(col("vec_id") === 0)
    val batch = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + Dedup.PlantOffset).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      .unionByName(e0.select(lit(20000001L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding")))
      .unionByName(e0.select(lit(20000002L).as("vec_id"),
        transform(col("embedding"), x => -x * lit(2.0f)).as("embedding")))
    val viaFloat = removed(
      Similarity.semDedupProbe(spark, batch, fIdx, tau = 0.9))
    val sq = Similarity.semDedupProbeSq(spark, batch, sIdx, e, tau = 0.9)
    assert(removed(sq) == viaFloat,
      "SQ8 candidates + exact verify must reproduce the float probe")
    // plan shape: every scan of the SQ8 index's cell files carries a
    // codes-only read schema — the 4× working-set cut is physical,
    // not aspirational. The probe materializes the candidate stage
    // behind a localCheckpoint (one codes pass for count + join), so
    // the assertion targets the candidate frame itself — exactly the
    // plan the checkpoint executes.
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match { // descend through AQE wrappers, whose stages are not children
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => scans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
      }
    val candStage = Similarity.semDedupCandidatesSq(spark, batch, sIdx,
      tau = 0.9, candidateMargin = 0.05,
      broadcastMaxBytes = Similarity.ProbeBroadcastMaxBytes)._4
    val cellScans = scans(candStage.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("sidx/cells")))
      .map(_.requiredSchema.fieldNames.toSeq)
    assert(cellScans.nonEmpty, "the candidate pass must scan the index")
    cellScans.foreach { fields =>
      assert(fields.contains("codes") && !fields.contains("embedding"),
        s"candidate scan must read codes only, saw $fields")
    }
  }

  test("semDedupProbeSq sizes its broadcasts: over the budget the " +
      "probe runs entirely on shuffle joins — same verdicts, zero " +
      "driver-side broadcast pressure (the backfill shape)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("semsqbf").toString
    val sIdx = s"$dir/sidx"
    Quantize.buildIvfSqIndex(spark, e, sIdx, nlist = 8, replicas = 2)
    val batch = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + Dedup.PlantOffset).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val want = removed(
      Similarity.semDedupProbeSq(spark, batch, sIdx, e, tau = 0.9))
    // disable Catalyst's own size-based broadcasts (plan-time AND
    // AQE's runtime re-plan) so the only possible broadcast is the
    // probe's explicit hint — which the 1-byte budget must withhold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption(
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val sq = Similarity.semDedupProbeSq(spark, batch, sIdx, e,
        tau = 0.9, broadcastMaxBytes = 1L)
      assert(removed(sq) == want,
        "the shuffle-join path must produce identical verdicts")
      def nodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => p +: nodes(q.plan)
        case other => p +: (other.children.flatMap(nodes) ++
          other.subqueries.flatMap(nodes))
      }
      val broadcasts = nodes(sq.queryExecution.executedPlan).filter(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.exchange
          .BroadcastExchangeExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.adaptive
          .BroadcastQueryStageExec])
      assert(broadcasts.isEmpty,
        s"an over-budget probe must not broadcast anything, saw: " +
          s"${broadcasts.map(_.nodeName).mkString(", ")}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevA.foreach(v => spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", v))
    }
  }
}
