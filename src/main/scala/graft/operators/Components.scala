package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Connected components over a pair list — the step that turns
  * near-dup PAIRS (q32-q35) into dedup GROUPS: pairs are not transitive
  * ((a,b) and (b,c) near-dup does not list (a,c)), so "keep one copy per
  * duplicate group" needs the transitive closure, with one canonical
  * representative per component (min doc_id — deterministic). This is the
  * final stage of every production corpus-dedup pipeline; without it a
  * pair list only supports pairwise removal, which over-deletes (both
  * endpoints) or under-deletes (chains survive).
  *
  * Algorithm: iterative hash-min label propagation. Every node starts
  * with itself as label; each round sends labels across edges
  * and keeps the min. Terminates in O(component diameter) rounds.
  *
  * Scale design (100 TB):
  *  - each round is one shuffle-on-id join + one groupBy min — no
  *    driver-side graph state; node labels stay distributed;
  *  - near-dup graphs in corpus dedup are overwhelmingly tiny cliques
  *    (duplicate families), so diameter — and the round count — is small
  *    and does NOT grow with corpus size; for adversarial long-chain
  *    graphs, the alternating large-star/small-star variant (Kiveris et
  *    al., "Connected Components in MapReduce and Beyond", SoCC'14)
  *    converges in O(log²  n) with the same join shape — the loop below is
  *    the place to swap it in;
  *  - every round `localCheckpoint`s the labels: iterative self-joins
  *    otherwise stack lineage (plan grows per round, re-analysis cost
  *    compounds, and a task retry would recompute the whole chain);
  *  - convergence is an O(1)-per-round (count, xor-of-hashes) checksum
  *    over the label set — one aggregate action, shared with the LSS
  *    variant, instead of an extra join-against-previous-labels per
  *    round.
  *
  * Reference tie-in: the reference dedups at FILE level ("key already in
  * S3 → skip", `sync-canvas-data-files.py:62-67`); this is the content-
  * level generalization the LLM-pipeline mandate adds.
  */
object Components {

  /** O(1)-per-round convergence probe shared by both closure loops:
    * (row count, xor of row hashes) — order-independent, overflow-free
    * under ANSI arithmetic (bit_xor, not sum). Labels/edges only shrink
    * or re-point monotonically, so an unchanged checksum with a changed
    * set needs an xxhash64 xor-coincidence — negligible against
    * maxIters more rounds of convergence headroom. Computed as observed
    * sidecar aggregates riding each round's checkpoint job
    * ([[Graph.rollObserved]] — 1 job/round instead of 2). */
  private def checksumExprs(x: String, y: String) = Seq(
    count(lit(1)).as("n"),
    coalesce(bit_xor(xxhash64(col(x), col(y))), lit(0L)).as("h"))

  private def sigOf(r: org.apache.spark.sql.Row): (Long, Long) =
    (r.getLong(0), r.getLong(1))

  /** Standalone (count, xor-hash) probe for loops that manage their own
    * checkpoints (the LSS variant below): one aggregate action over the
    * already-checkpointed edge set. */
  private def checksum(d: DataFrame, x: String, y: String): (Long, Long) = {
    val es = checksumExprs(x, y)
    sigOf(d.agg(es.head, es.tail: _*).head())
  }

  /** (id, component) for every node appearing in `edges` (cols `a`, `b`);
    * component = min node id reachable. Nodes not in any edge are absent —
    * a singleton is its own component by definition, so callers union
    * them in if needed. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    // materialize the edge list once: the undirected union below references
    // it twice, and an expensive upstream (e.g. the whole near-dup pair
    // pipeline) would otherwise run per reference. checkpointDir selects
    // RELIABLE per-round truncation (Graph.truncate — survives executor
    // loss at cluster scale; same results bit-for-bit)
    val tr = new Graph.Truncator(edges.sparkSession, checkpointDir)
    val e = tr.pin(
      edges.select(col("a").cast("long"), col("b").cast("long"))
        .filter(col("a") =!= col("b")))
    // undirected: propagate both ways. (r14 note: pre-partitioning adj by
    // the join key was tried and measured SLOWER — the per-round label
    // side is small enough that the join broadcasts it, so the adjacency
    // list is never shuffled in the loop anyway and the repartition was a
    // pure extra exchange.)
    val adj = tr.pin(
      e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
        .distinct())
    val (labels0, sig0) = Graph.rollObserved(tr, "labels",
      adj.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("comp")),
      checksumExprs("id", "comp"))
    var labels = labels0
    var iters = 0
    var converged = false
    var sig = sigOf(sig0)
    while (!converged && iters < maxIters) {
      // each node offers its label to every neighbor; keep the min of
      // (own label, best offer)
      val offers = adj.join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("comp"))
      val (next, row) = Graph.rollObserved(tr, "labels",
        labels.unionByName(offers)
          .groupBy(col("id")).agg(min(col("comp")).as("comp")),
        checksumExprs("id", "comp"))
      val nextSig = sigOf(row)
      labels = next
      converged = nextSig == sig
      sig = nextSig
      iters += 1
    }
    require(converged,
      s"connected components did not converge in $maxIters rounds — " +
        "component diameter exceeds the bound; raise maxIters or use " +
        "connectedComponentsLSS (large-star/small-star)")
    labels
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): converges in O(log² n) rounds REGARDLESS of component
    * diameter, where hash-min label propagation needs O(diameter). Use
    * this variant for adversarial graphs (long chains — reply threads,
    * citation paths); [[connectedComponents]] stays the default for
    * near-dup graphs, whose components are tiny cliques.
    *
    * Both operations are one groupBy-min + one join per round over the
    * canonical (big, small) edge list — the same distributed shape as
    * the hash-min loop, no driver-side graph state:
    *  - large-star: every node u links its LARGER neighbors to
    *    m = min(Γ(u) ∪ u);
    *  - small-star: every node u links its smaller neighbors (and
    *    itself) to m = min of those.
    * The fixpoint is a star forest rooted at each component's minimum;
    * convergence is checked by an O(1) per-round edge-set checksum. */
  def connectedComponentsLSS(edges: DataFrame, maxIters: Int = 40): DataFrame = {
    var e = edges
      .select(greatest(col("a").cast("long"), col("b").cast("long")).as("u"),
        least(col("a").cast("long"), col("b").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint()

    def largeStar(d: DataFrame): DataFrame = {
      val adj = d.unionByName(d.select(col("v").as("u"), col("u").as("v")))
      val mins = adj.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      adj.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(d: DataFrame): DataFrame = {
      // canonical (big, small): a node's SMALLER neighbors are exactly its
      // v-side partners; m = min of them (all < u, so u never wins)
      val mins = d.groupBy(col("u")).agg(min(col("v")).as("m"))
      d.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var iters = 0
    var converged = false
    var sig = checksum(e, "u", "v")
    while (!converged && iters < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = checksum(next, "u", "v")
      converged = nextSig == sig
      e = next
      sig = nextSig
      iters += 1
    }
    require(converged,
      s"large-star/small-star did not converge in $maxIters rounds")
    // star forest: every (u, v) points u at its component min; roots
    // appear only on the v side
    e.select(col("u").as("id"), col("v").as("comp"))
      .unionByName(e.select(col("v").as("id"), col("v").as("comp")))
      .distinct()
  }

  // ---------------------------------------------------------------------
  // Persisted INCREMENTAL component store — the clustering analog of the
  // index appends: at 100 TB nobody re-runs the transitive closure over
  // every near-dup pair ever found to fold in a daily batch of new
  // pairs. The store keeps (id, comp) labels partitioned by
  // pmod(xxhash64(id), P); a batch folds in by CONTRACTION: every known
  // component collapses to its label (one node), the closure runs on
  // the contracted batch graph only — O(batch) nodes/edges, however
  // large the accumulated graph — and only CHANGED or NEW label rows
  // merge back through the partition-scoped upsert (a component's
  // members relabel only when the batch lowers its minimum, so in the
  // common new-docs-get-higher-ids regime most batches write new rows
  // only). The stored label table is scanned (map-only, broadcast
  // probes) but never shuffled.
  //
  // Replay/crash contract: min-label relabeling is MONOTONE (comps only
  // decrease toward the fixpoint), so re-running a batch from any
  // partially-applied state converges to the same labels — the
  // `_applied/` ledger entry (written last) is a cheap short-circuit,
  // not a correctness requirement. Single maintenance writer, like
  // every store.
  // ---------------------------------------------------------------------

  private def edgeFingerprint(e: DataFrame): String = {
    val r = e.agg(count(lit(1)),
      coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L))).head()
    s"${r.getLong(0)}|${r.getLong(1)}"
  }

  private def npartsMarker(spark: SparkSession, storeDir: String,
      write: Option[Int]): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storeDir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(storeDir, "_nparts")
    write match {
      case Some(n) =>
        val os = fs.create(p, true)
        try os.write(n.toString.getBytes("UTF-8")) finally os.close()
        n
      case None =>
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim.toInt
        finally in.close()
    }
  }

  /** Build the store from an initial edge list (full closure, once).
    * Requires at least one EFFECTIVE edge (non-null endpoints, not a
    * self-loop): zero labels under a partitionBy write would emit a
    * labels dir holding only `_SUCCESS` — a store that exists for
    * [[componentStoreExists]] but fails every read. Fail loud instead
    * of wedging the store. */
  def buildComponentStore(spark: SparkSession, storeDir: String,
      edges: DataFrame, nParts: Int = 32): Unit = {
    val e = edges.select(col("a").cast("long"), col("b").cast("long"))
      .filter(col("a") =!= col("b"))
      .localCheckpoint() // consumed by the closure AND the edge archive
    val labels = connectedComponents(e)
      .withColumn("part", pmod(xxhash64(col("id")), lit(nParts)))
      .localCheckpoint() // consumed by the emptiness guard + the write
    require(!labels.isEmpty,
      "cannot build a component store from zero effective edges " +
        "(all rows were null-endpoint or self-loop)")
    graft.pipeline.SafeSwap.replace(storeDir) { tmp =>
      labels.write.partitionBy("part").parquet(s"$tmp/labels")
      // the RAW effective edge set persists beside the labels: labels
      // alone cannot serve a record-grained DELETE (removing a cut
      // vertex SPLITS its component — only the surviving edges know
      // into what), so [[purgeNodes]] needs the ground truth the
      // closure was computed from. Flat dir; appends are file-additive.
      e.write.parquet(s"$tmp/edges")
      // marker swaps in WITH the labels — no window where a store
      // exists without its partition-count contract
      npartsMarker(spark, tmp, Some(nParts))
    }
  }

  // explicit schemas on every store read: a purge that evacuates the
  // whole store (a forgotten star hub isolating every spoke) leaves
  // valid-but-fileless trees, and schema inference would fail where an
  // empty result is the correct answer
  private val EdgesSchema = "a LONG, b LONG"
  private val LabelsSchema = "id LONG, comp LONG, part LONG"

  private def readEdges(spark: SparkSession, storeDir: String): DataFrame = {
    // heal a crashed archive compaction (nested SafeSwap on edges/)
    graft.pipeline.SafeSwap.recover(s"$storeDir/edges")
    spark.read.schema(EdgesSchema).parquet(s"$storeDir/edges")
  }

  /** Maintenance for the edge archive's append path — the two debts
    * [[appendEdges]] accrues by design: (1) one small file set lands per
    * batch, so years of daily folds leave a tree whose every purge pays
    * per-file open cost; (2) a crash between the archive write and the
    * ledger mark re-appends the batch on retry — duplicate edge rows
    * that min-label closure and the key delete are indifferent to, but
    * that nothing previously removed. Past `maxFiles` data files the
    * archive rewrites as its DISTINCT row set, coalesced to
    * max(1, ceil(bytes/targetBytes)) files, behind the dir's own
    * [[graft.pipeline.SafeSwap]] — crash-confined (every reader/writer
    * of the archive heals the swap on entry), idempotent, and
    * content-shrinking only. Auto-triggered by [[appendEdges]]; the
    * single-maintenance-writer contract and the converge-crashed-
    * appends-first ordering caveat of
    * [[graft.operators.Similarity.compactIvfIndex]] apply. Returns
    * true when a rewrite ran. */
  def compactEdgeArchive(spark: SparkSession, storeDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      maxFiles: Int = 64): Boolean = {
    val edir = s"$storeDir/edges"
    graft.pipeline.SafeSwap.recover(edir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storeDir),
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(edir)
    if (!fs.exists(p)) return false
    val files = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    if (files.length <= maxFiles) return false
    val bytes = files.map(_.getLen).sum
    val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // the lazy read executes inside the swap's write action, strictly
    // before the live dir renames aside; distinct() is where the
    // crash-retry duplicate rows leave
    val df = spark.read.schema(EdgesSchema).parquet(edir)
      .distinct().coalesce(want)
    graft.pipeline.SafeSwap.replace(edir) { tmp =>
      df.write.parquet(tmp)
    }
    spark.catalog.refreshByPath(edir)
    true
  }

  /** (id, comp) for every node the store has seen. */
  def readComponents(spark: SparkSession, storeDir: String): DataFrame = {
    graft.pipeline.SafeSwap.recover(storeDir)
    spark.read.schema(LabelsSchema).parquet(s"$storeDir/labels")
      .select(col("id"), col("comp"))
  }

  /** Does a label store live at `storeDir` (healing a crashed swap)? */
  def componentStoreExists(spark: SparkSession, storeDir: String): Boolean = {
    graft.pipeline.SafeSwap.recover(storeDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storeDir), spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$storeDir/labels"))
  }

  /** Fold a batch of new edges into the store. Returns false if this
    * exact batch (content fingerprint) was already applied. The replay
    * unit defaults to the batch's content fingerprint; pass an explicit
    * `batchId` when the delivery layer has its own replay identity
    * (e.g. a Structured Streaming micro-batch id). */
  def appendEdges(spark: SparkSession, storeDir: String,
      edges: DataFrame, batchId: String = null): Boolean = {
    graft.pipeline.SafeSwap.recover(storeDir)
    val e = edges.select(col("a").cast("long"), col("b").cast("long"))
      .filter(col("a") =!= col("b"))
      .localCheckpoint() // consumed by fingerprint, node set, contraction
    val fp = edgeFingerprint(e)
    val id = Option(batchId).getOrElse(
      graft.pipeline.AppendCommit.contentId(fp))
    if (graft.pipeline.AppendCommit.isApplied(storeDir, id))
      return false
    val nParts = npartsMarker(spark, storeDir, None)
    val labels = spark.read.schema(LabelsSchema)
      .parquet(s"$storeDir/labels")
      .select(col("id"), col("comp"))
    val nodes = e.select(explode(array(col("a"), col("b"))).as("id"))
      .distinct()
    // stored labels of batch-touched nodes: a map-side broadcast
    // semi-probe over the label scan — small output, no label shuffle
    val touched = labels
      .join(broadcast(nodes), Seq("id"), "left_semi")
      .localCheckpoint()
    // contraction: endpoints map to their stored component (or stay
    // themselves when unseen); edges inside one known component vanish
    val contracted = e
      .join(broadcast(touched.select(col("id").as("a"),
        col("comp").as("ca"))), Seq("a"), "left")
      .join(broadcast(touched.select(col("id").as("b"),
        col("comp").as("cb"))), Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
    // closure over the contracted graph only — O(batch), never O(graph)
    val sub = connectedComponents(contracted).localCheckpoint()
    // old components whose label drops (the batch connected them to a
    // smaller id): every stored member of such a component relabels —
    // again a broadcast probe over the label scan
    val remap = sub.filter(col("comp") =!= col("id"))
      .select(col("id").as("old"), col("comp").as("new_comp"))
    val changed = labels.as("l")
      .join(broadcast(remap), col("l.comp") === col("old"))
      .filter(col("new_comp") =!= col("l.comp"))
      .select(col("l.id").as("id"), col("new_comp").as("comp"))
    // brand-new nodes take their contracted-closure label
    val newNodes = nodes
      .join(touched.select(col("id")), Seq("id"), "left_anti")
      .join(broadcast(sub.withColumnRenamed("comp", "sub_comp")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("sub_comp"), col("id")).as("comp"))
    // materialize BEFORE the merge: `changed` lazily re-reads the live
    // label tree, and mergeIntoPartitioned swaps that tree partition by
    // partition — an unmaterialized plan re-evaluated for partition B
    // after partition A swapped would read moved/deleted files
    val updates = changed.unionByName(newNodes)
      .withColumn("part", pmod(xxhash64(col("id")), lit(nParts)))
      .localCheckpoint()
    // archive the batch's raw edges FIRST (file-additive append; a
    // crash between this write and the ledger mark re-appends the batch
    // on retry — duplicate edge rows, which min-label closure and the
    // purge's key delete are both indifferent to: edge SETS are
    // idempotent, and [[compactEdgeArchive]] eventually removes the
    // duplicates). The archive is what makes [[purgeNodes]] able to
    // recompute split components without the original pair pipeline.
    // Heal a crashed compaction first: appending into a half-swapped
    // dir would strand the full archive under the hidden aside name.
    graft.pipeline.SafeSwap.recover(s"$storeDir/edges")
    e.write.mode("append").parquet(s"$storeDir/edges")
    graft.pipeline.Upsert.mergeIntoPartitioned(spark,
      s"$storeDir/labels", updates, Seq("part", "id"), "part")
    graft.pipeline.AppendCommit.markApplied(storeDir, id, fp)
    // debt bound for the file-additive append path (no-op below the
    // file-count threshold)
    compactEdgeArchive(spark, storeDir)
    true
  }

  /** RTBF cascade hook: delete `ids` (documents, typically — the node
    * identity of the near-dup graph) from the component store so reads
    * equal a from-scratch closure over the FILTERED edge set. Label
    * rows cannot simply be dropped: a deleted cut vertex SPLITS its
    * component, a deleted minimum-id node RENAMES it, and a member
    * whose every edge died must LEAVE (a rebuild would never see it).
    * So the purge re-runs the closure — but only over the AFFECTED
    * components' surviving edges, never the whole graph:
    *
    *   1. affected components = stored labels of the deleted ids
    *      (bounded by the key count);
    *   2. their members and intra-component edges come from one
    *      semi-probed scan each of the label/edge trees;
    *   3. the filtered sub-closure is STAGED to disk
    *      (compute-once-pre-destruction — the
    *      [[graft.pipeline.AppendCommit.runWithIntent]] discipline:
    *      a crash-retry replays the staged plan over the already-
    *      mutated store instead of recomputing from half-purged
    *      edges);
    *   4. destructive, each idempotent: edge rows touching the ids
    *      leave ([[graft.pipeline.Maintain.deleteByKey]] per endpoint,
    *      O(hit files)); member label rows absent from the new closure
    *      leave; relabeled members merge back partition-scoped.
    *
    * Returns label rows removed (deleted ids + members isolated by the
    * delete). Replay of an applied purge no-ops on the ledger. */
  def purgeNodes(spark: SparkSession, storeDir: String,
      ids: Seq[Any]): Long = {
    require(ids.nonEmpty, "purge needs at least one id")
    import graft.pipeline.{AppendCommit, Maintain, MaintenanceLock, Upsert}
    graft.pipeline.SafeSwap.recover(storeDir)
    val id = "purge-" + AppendCommit.contentId(
      ids.map(String.valueOf).sorted.mkString("\n"))
    if (AppendCommit.isApplied(storeDir, id)) return 0L
    MaintenanceLock.withLock(storeDir, "purge") {
      // heal a crashed archive compaction before touching edges/
      graft.pipeline.SafeSwap.recover(s"$storeDir/edges")
      val nParts = npartsMarker(spark, storeDir, None)
      val stage = s"$storeDir/_purge_stage/$id"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(storeDir),
        spark.sparkContext.hadoopConfiguration)
      var unknownIds = false
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$stage/_staged"))) {
        // compute the post-delete truth from the still-intact store
        val labels = spark.read.schema(LabelsSchema)
          .parquet(s"$storeDir/labels")
          .select(col("id"), col("comp"))
        val comps: Seq[Any] = Maintain.matchingKeys(labels, "id", ids)
          .select(col("comp")).distinct()
          .collect().map(_.getLong(0)).toSeq
        if (comps.isEmpty) unknownIds = true // nothing to purge
        else {
          // edges live inside one component, so membership of endpoint
          // `a` selects exactly the affected components' edges
          val members = Maintain.matchingKeys(labels, "comp", comps)
          val memberIds = members.select(col("id"))
          val affected = readEdges(spark, storeDir)
            .select(col("a"), col("b"))
            // no broadcast HINT: membership is bounded by the affected
            // components, but a near-dup graph's hot component can hold
            // millions of members (spam clusters) — let Spark pick from
            // the parquet sizes instead of forcing driver-side
            // replication of an unbounded set
            .join(memberIds.withColumnRenamed("id", "a"),
              Seq("a"), "left_semi")
          val filtered = Maintain.droppingKeys(
            Maintain.droppingKeys(affected, "a", ids), "b", ids)
          val relabeled = connectedComponents(filtered)
            .withColumn("part", pmod(xxhash64(col("id")), lit(nParts)))
          fs.delete(new org.apache.hadoop.fs.Path(stage), true)
          members.select(col("id"), col("comp"))
            .write.parquet(s"$stage/members")
          relabeled.write.parquet(s"$stage/relabeled")
          fs.create(new org.apache.hadoop.fs.Path(s"$stage/_staged"),
            true).close()
        }
      }
      if (unknownIds) {
        AppendCommit.markApplied(storeDir, id)
        0L
      } else {
        // destructive from here — every step idempotent, driven by the
        // staged pre-delete plan
        val members = spark.read.parquet(s"$stage/members")
        // explicit schema: when EVERY affected member leaves (a star's
        // forgotten hub isolates all spokes), the staged closure is
        // empty and its parquet dir may hold no data files — a
        // schema-inferring read would fail on the _SUCCESS-only dir
        val relabeled = spark.read
          .schema("id LONG, comp LONG, part LONG")
          .parquet(s"$stage/relabeled")
        Maintain.deleteByKey(spark, s"$storeDir/edges", "a", ids)
        Maintain.deleteByKey(spark, s"$storeDir/edges", "b", ids)
        // `leaving` stays a DATAFRAME end-to-end: it is bounded by the
        // affected components' membership, NOT the request's key count —
        // forgetting the hub of a star component (a template document
        // whose variants all pair with it but not each other) isolates
        // every spoke, so a driver collect here would materialize
        // millions of ids for one key (the same hazard that kept
        // `members` un-broadcast above). Pinned once: consumed by the
        // count and by the delete's discovery + rewrites.
        val leaving = members.select(col("id"))
          .join(relabeled.select(col("id")), Seq("id"), "left_anti")
          .localCheckpoint()
        val nLeaving = leaving.count()
        if (nLeaving > 0)
          Maintain.deleteByKeyFrame(spark, s"$storeDir/labels", "id",
            leaving)
        if (!relabeled.isEmpty)
          Upsert.mergeIntoPartitioned(spark, s"$storeDir/labels",
            relabeled, Seq("part", "id"), "part")
        AppendCommit.markApplied(storeDir, id)
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
        nLeaving
      }
    }
  }

  /** Streaming maintenance: a `foreachBatch` sink that folds each
    * micro-batch of edges (cols `a`, `b` — e.g. a streaming near-dup
    * pair pipeline's output) into the component store, keyed by the
    * MICRO-BATCH ID as the replay unit. The engine re-delivers a failed
    * micro-batch under the same id, so the `_applied/` ledger turns
    * at-least-once delivery into exactly-once store maintenance; and
    * because contraction-fold only depends on the accumulated edge SET
    * (min-label closure is confluent — edge arrival order cannot change
    * the fixpoint), how the stream is chopped into micro-batches cannot
    * change the final labels (spec-proved 1-batch ≡ N-batch).
    *
    * The first micro-batch builds the store (full closure over itself);
    * a crash between that build and its ledger mark re-delivers the
    * batch as an APPEND, which contraction reduces to a no-op — the same
    * already-applied convergence argument as the batch path. */
  def foreachBatchEdgeSink(storeDir: String,
      nParts: Int = 32): (DataFrame, Long) => Unit = { (batch, id) =>
    val spark = batch.sparkSession
    // emptiness is judged on the EFFECTIVE edges (the same normalization
    // every store path applies), not the raw micro-batch: a first batch
    // of only self-loops/null endpoints is non-empty but carries zero
    // labels, and building from it would emit an unreadable store —
    // the exact zero-row partitionBy hazard the build guard rejects
    val e = batch.select(col("a").cast("long"), col("b").cast("long"))
      .filter(col("a") =!= col("b"))
    if (!e.isEmpty) {
      if (!componentStoreExists(spark, storeDir)) {
        buildComponentStore(spark, storeDir, e, nParts)
        graft.pipeline.AppendCommit.markApplied(storeDir, s"stream-$id")
      } else appendEdges(spark, storeDir, e, s"stream-$id")
    }
    ()
  }

  // ---------------------------------------------------------------------
  // q101_incremental_components — DERIVED ORACLE for the store (the q70
  // pattern for clustering): the q66 planted pair list splits by
  // (a + b) % 2 — the even-sum half builds the store, the odd-sum half
  // appends as a batch (then replays, which must no-op). Splitting by
  // parity fragments components across the two halves, so the append
  // path must perform REAL cross-component merges through contraction
  // to reconstruct the full closure — which DuckDB computes from
  // scratch with q66's recursive CTE. A wrong contraction, a missed
  // member relabel, or a double-applied batch changes some component's
  // membership string and hash-fails.
  // ---------------------------------------------------------------------
  private lazy val storeGateBase: String =
    java.nio.file.Files.createTempDirectory("graft_ccstore_").toString

  def q101IncrementalComponents(s: SparkSession, dir: String): DataFrame = {
    val store = s"$storeGateBase/cc_${dir.hashCode.toHexString}"
    if (!new java.io.File(s"$store.complete").exists()) {
      val pairs = plantedPairs(augmentedCorpus(s, dir))
        .select(col("a").cast("long"), col("b").cast("long"))
        .localCheckpoint()
      val base = pairs.filter((col("a") + col("b")) % 2 === 0)
      val batch = pairs.filter((col("a") + col("b")) % 2 === 1)
      buildComponentStore(s, store, base)
      appendEdges(s, store, batch)
      appendEdges(s, store, batch) // at-least-once replay: must no-op
      new java.io.File(s"$store.complete").createNewFile()
    }
    readComponents(s, store)
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(sort_array(collect_list(col("id"))),
          _.cast("string")), ",").as("members"))
      .select(col("comp").as("component"), col("n_docs"), col("members"))
  }

  // ---------------------------------------------------------------------
  // q66_dedup_clusters — pairs → groups end-to-end: plant an exact copy of
  // every 10th document (id + 10⁷), run the exact-Jaccard pair pipeline
  // (q33) over the augmented corpus, resolve transitive closure, report
  // each duplicate group with its canonical representative. A planted copy
  // c of doc d inherits ALL of d's near-dup edges (identical text ⇒
  // identical shingles), so natural pairs (a,b) with planted copies become
  // 3-4 node components — the gate exercises real merging, not just pair
  // echo. Fully oracle-checked: DuckDB computes the same closure with a
  // recursive CTE over the same SQL pair list.
  // ---------------------------------------------------------------------
  /** Same id space as q70's planted batch — ONE constant (the SQL twins
    * hard-code the literal, so a change must sweep all of them). */
  val PlantOffset: Long = Dedup.PlantOffset

  /** Shared q66/q71 fixture: corpus + an exact copy of every 10th doc. */
  private def augmentedCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + PlantOffset).as("doc_id"), col("text")))
  }

  /** Exact-Jaccard near-dup edges over the augmented corpus (the q33
    * pipeline), shared by the q66/q71 closures. */
  private def plantedPairs(aug: DataFrame): DataFrame =
    Dedup.jaccardPairs(Dedup.shingleRows(aug)).select(col("a"), col("b"))

  def q66DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = plantedPairs(augmentedCorpus(s, dir))
    connectedComponents(pairs)
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(sort_array(collect_list(col("id"))),
          _.cast("string")), ",").as("members"))
      .select(col("comp").as("component"), col("n_docs"), col("members"))
  }

  // ---------------------------------------------------------------------
  // q71_dedup_keep_best — the last step of the dedup pipeline: per
  // duplicate group, KEEP the best document (here: longest text; ties →
  // smallest doc_id — a deterministic quality rule, the production analog
  // being a quality-classifier score). Composes q66's closure with a
  // quality join: representative = min doc_id among members with the
  // group-max length. Relational argmax (max + filter-join), identical in
  // both engines — no reliance on engine-specific arg_max tie behavior.
  // ---------------------------------------------------------------------
  def q71DedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val aug = augmentedCorpus(s, dir)
    val comp = connectedComponents(plantedPairs(aug))
    val sized = comp.join(
      aug.select(col("doc_id").as("id"), length(col("text")).as("len")),
      "id")
    val best = sized.groupBy(col("comp"))
      .agg(count(lit(1)).as("n_members"), max(col("len")).as("max_len"))
    sized.join(best, "comp")
      .filter(col("len") === col("max_len"))
      .groupBy(col("comp"), col("n_members"), col("max_len"))
      .agg(min(col("id")).as("kept_doc"))
      .select(col("comp").as("component"), col("n_members"),
        col("kept_doc"), col("max_len").cast("long").as("max_len"))
  }

  /** Shared SQL prefix for the q66/q71 oracles: planted corpus → shingle
    * pairs → recursive-CTE closure, ending at the `comp(id, component)`
    * CTE. ONE copy so a change to the plant rule, threshold, or shingle
    * width cannot desynchronize the two oracles. */
  private val plantedClosureSqlPrefix: String =
    """WITH RECURSIVE base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 10 = 0),
      |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM base),
      |sh AS (SELECT DISTINCT doc_id,
      |         list_aggregate(w[i:i+2], 'string_agg', '_') AS s
      |       FROM t, UNNEST(range(1, len(w) - 1)) AS g(i)),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |c AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
      |      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      |      GROUP BY x.doc_id, y.doc_id),
      |p AS (SELECT a, b
      |      FROM c JOIN sz sa ON c.a = sa.doc_id JOIN sz sb ON c.b = sb.doc_id
      |      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.6),
      |edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
      |reach(id, r) AS (
      |  SELECT DISTINCT a, a FROM edges
      |  UNION
      |  SELECT x.id, e.b FROM reach x JOIN edges e ON e.a = x.r),
      |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)""".stripMargin

  val q71DedupKeepBestSql: String = plantedClosureSqlPrefix + ",\n" +
    """sized AS (SELECT comp.id, comp.component, length(base.text) AS len
      |          FROM comp JOIN base ON base.doc_id = comp.id),
      |best AS (SELECT component, COUNT(*) AS n_members,
      |           MAX(len) AS max_len
      |         FROM sized GROUP BY component)
      |SELECT s.component, b.n_members, MIN(s.id) AS kept_doc,
      |  CAST(b.max_len AS BIGINT) AS max_len
      |FROM sized s JOIN best b ON s.component = b.component
      |  AND s.len = b.max_len
      |GROUP BY s.component, b.n_members, b.max_len""".stripMargin

  val q66DedupClustersSql: String = plantedClosureSqlPrefix + "\n" +
    """SELECT component, COUNT(*) AS n_docs,
      |  STRING_AGG(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
      |FROM comp GROUP BY component""".stripMargin

  // ---------------------------------------------------------------------
  // q283_cluster_split — the decontamination-correct holdout split: a
  // row-level (or even source-level) split leaks when two NEAR-DUPLICATE
  // documents land in different splits, so the split unit must be the
  // near-dup CLUSTER. Composes q66's closure with the md5-cutoff group
  // split: every document's split key is its component id (its own
  // doc_id when unclustered — a LEFT join, so singletons are first-class
  // split members, not dropped), and the planted copies make the stake
  // concrete: every original+copy pair shares a cluster and therefore a
  // split. Split sizes, cluster counts, and a structural leak counter
  // (clusters straddling >1 split — must be ZERO) against the oracle's
  // full recomputation (closure AND md5 assignment, both engine-neutral).
  // ---------------------------------------------------------------------
  def q283ClusterSplit(s: SparkSession, dir: String): DataFrame = {
    val aug = augmentedCorpus(s, dir)
    val comp = connectedComponents(plantedPairs(aug))
    val rep = aug.select(col("doc_id").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("rep"))
    val split = Sampling.groupHoldoutSplit(col("rep"), 13L,
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val tagged = rep.select(col("id"), col("rep"), split.as("split"))
    val leaked = tagged.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"))
      .withColumn("leaked_clusters", lit(leaked))
  }

  val q283ClusterSplitSql: String = plantedClosureSqlPrefix + ",\n" +
    """all_ AS (
      |  SELECT b.doc_id AS id, COALESCE(c.component, b.doc_id) AS rep
      |  FROM base b LEFT JOIN comp c ON c.id = b.doc_id),
      |tagged AS (
      |  SELECT id, rep,
      |    CASE
      |      WHEN substring(md5(CAST(rep AS VARCHAR) || '|' || '13'),
      |        1, 4) < 'e666' THEN 'train'
      |      WHEN substring(md5(CAST(rep AS VARCHAR) || '|' || '13'),
      |        1, 4) < 'f333' THEN 'val'
      |      ELSE 'test' END AS split
      |  FROM all_)
      |SELECT split, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT rep) AS n_clusters,
      |  (SELECT COUNT(*) FROM (
      |     SELECT rep FROM tagged GROUP BY rep
      |     HAVING COUNT(DISTINCT split) > 1)) AS leaked_clusters
      |FROM tagged GROUP BY split""".stripMargin

  // ---------------------------------------------------------------------
  // q283b_split_under_merge — the cluster-keyed split's STABILITY
  // CONTRACT under cluster growth, pinned through the INCREMENTAL store:
  // when a later batch MERGES two clusters (q101's append path), the
  // surviving min-label renames the component and every document of the
  // renamed cluster migrates to the new label's split. That migration is
  // the CONTRACT, not a bug: the merged halves are near-duplicates of
  // each other, so persisting their first-assignment splits would leave
  // train and validation holding near-dups of one another — permanent
  // leakage, the exact contamination the cluster split exists to
  // prevent. The operational consequence (re-export affected splits
  // after merge-bearing appends) is pinned here as a first-class,
  // oracle-counted number: the gate builds the store on the even-sum
  // half of the planted pairs, appends the odd-sum half (real
  // cross-component contractions — q101's construction), and reports
  // per-split sizes/cluster counts of the POST-merge assignment plus
  // `migrated_docs` (documents whose split differs from the pre-merge
  // assignment) and the structural leak counter (must be ZERO
  // post-merge). DuckDB recomputes BOTH closures (even-only and full)
  // and both md5 assignments from scratch — a store that misses a
  // merge relabel, double-applies the batch, or freezes first
  // assignments changes migrated_docs or a membership and hash-fails.
  // ---------------------------------------------------------------------
  def q283bSplitUnderMerge(s: SparkSession, dir: String): DataFrame = {
    val aug = augmentedCorpus(s, dir)
    val store = s"$storeGateBase/ccsplit_${dir.hashCode.toHexString}"
    val pre = s"${store}_pre"
    if (!new java.io.File(s"$store.complete").exists()) {
      val pairs = plantedPairs(aug)
        .select(col("a").cast("long"), col("b").cast("long"))
        .localCheckpoint()
      buildComponentStore(s, store,
        pairs.filter((col("a") + col("b")) % 2 === 0))
      // the PRE-merge assignment is the store's own post-build state,
      // snapshotted before the merging append — so the gate pins the
      // build→read→append→read lifecycle, not a parallel recomputation
      readComponents(s, store).write.mode("overwrite").parquet(pre)
      appendEdges(s, store,
        pairs.filter((col("a") + col("b")) % 2 === 1))
      new java.io.File(s"$store.complete").createNewFile()
    }
    val fractions = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val ids = aug.select(col("doc_id").as("id"))
    val rep = ids.join(readComponents(s, store), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("rep"))
    val rep0 = ids.join(
      s.read.parquet(pre).withColumnRenamed("comp", "comp0"),
      Seq("id"), "left")
      .select(col("id"), coalesce(col("comp0"), col("id")).as("rep0"))
    val tagged = rep.join(rep0, Seq("id")).select(col("id"), col("rep"),
      Sampling.groupHoldoutSplit(col("rep"), 13L, fractions).as("split"),
      Sampling.groupHoldoutSplit(col("rep0"), 13L, fractions)
        .as("split0"))
      // consumed three times (migrated count, leak count, final agg)
      .localCheckpoint()
    val migrated = tagged.filter(col("split") =!= col("split0")).count()
    val leaked = tagged.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"))
      .withColumn("migrated_docs", lit(migrated))
      .withColumn("leaked_clusters", lit(leaked))
  }

  // ---------------------------------------------------------------------
  // q286_train_export — the END-TO-END training-export composition a
  // real run executes: near-dup clusters (q66's closure) → cluster-keyed
  // holdout split (q283's decontamination-correct unit) → the TRAIN
  // split alone → deterministic epoch-shard receipts (q285's closed
  // form, its own seed). One gate pins the whole artifact chain: a
  // single leaked near-dup, one migrated split assignment, or one
  // out-of-order shard row changes some shard's ids_md5 and
  // hash-fails. DuckDB replays the full chain from scratch — closure,
  // md5 split, md5 epoch order, receipts.
  // ---------------------------------------------------------------------
  def q286TrainExport(s: SparkSession, dir: String): DataFrame = {
    val aug = augmentedCorpus(s, dir)
    val comp = connectedComponents(plantedPairs(aug))
    val rep = aug.select(col("doc_id").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("rep"))
    val split = Sampling.groupHoldoutSplit(col("rep"), 13L,
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val train = rep.select(col("id"), split.as("split"))
      .filter(col("split") === "train")
      .select(col("id").as("doc_id"))
    Sampling.epochShardReceipts(train, "doc_id", seed = 11L,
      recordsPerShard = 128L)
  }

  val q286TrainExportSql: String = plantedClosureSqlPrefix + ",\n" +
    """all_ AS (
      |  SELECT b.doc_id AS id, COALESCE(c.component, b.doc_id) AS rep
      |  FROM base b LEFT JOIN comp c ON c.id = b.doc_id),
      |train AS (
      |  SELECT id FROM all_
      |  WHERE substring(md5(CAST(rep AS VARCHAR) || '|' || '13'),
      |    1, 4) < 'e666'),
      |o AS (
      |  SELECT id,
      |    ROW_NUMBER() OVER (
      |      ORDER BY md5(CAST(id AS VARCHAR) || '|' || '11'), id)
      |      AS pos
      |  FROM train)
      |SELECT CAST((pos - 1) // 128 AS INT) AS shard,
      |  COUNT(*) AS n_docs,
      |  MIN(pos) AS first_pos, MAX(pos) AS last_pos,
      |  md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos))
      |    AS ids_md5
      |FROM o GROUP BY 1""".stripMargin

  val q283bSplitUnderMergeSql: String = plantedClosureSqlPrefix + ",\n" +
    """edges0 AS (SELECT a, b FROM p WHERE (a + b) % 2 = 0
      |  UNION SELECT b, a FROM p WHERE (a + b) % 2 = 0),
      |reach0(id, r) AS (
      |  SELECT DISTINCT a, a FROM edges0
      |  UNION
      |  SELECT x.id, e.b FROM reach0 x JOIN edges0 e ON e.a = x.r),
      |comp0 AS (SELECT id, MIN(r) AS component FROM reach0 GROUP BY id),
      |all_ AS (
      |  SELECT b.doc_id AS id,
      |    COALESCE(c.component, b.doc_id) AS rep,
      |    COALESCE(c0.component, b.doc_id) AS rep0
      |  FROM base b
      |  LEFT JOIN comp c ON c.id = b.doc_id
      |  LEFT JOIN comp0 c0 ON c0.id = b.doc_id),
      |tagged AS (
      |  SELECT id, rep,
      |    CASE
      |      WHEN substring(md5(CAST(rep AS VARCHAR) || '|' || '13'),
      |        1, 4) < 'e666' THEN 'train'
      |      WHEN substring(md5(CAST(rep AS VARCHAR) || '|' || '13'),
      |        1, 4) < 'f333' THEN 'val'
      |      ELSE 'test' END AS split,
      |    CASE
      |      WHEN substring(md5(CAST(rep0 AS VARCHAR) || '|' || '13'),
      |        1, 4) < 'e666' THEN 'train'
      |      WHEN substring(md5(CAST(rep0 AS VARCHAR) || '|' || '13'),
      |        1, 4) < 'f333' THEN 'val'
      |      ELSE 'test' END AS split0
      |  FROM all_)
      |SELECT split, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT rep) AS n_clusters,
      |  (SELECT COUNT(*) FROM tagged WHERE split <> split0)
      |    AS migrated_docs,
      |  (SELECT COUNT(*) FROM (
      |     SELECT rep FROM tagged GROUP BY rep
      |     HAVING COUNT(DISTINCT split) > 1)) AS leaked_clusters
      |FROM tagged GROUP BY split""".stripMargin
}
