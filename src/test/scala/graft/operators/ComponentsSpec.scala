package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ComponentsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 10-node chain collapses to one component (multi-round propagation)") {
    // min label travels one hop per round — this exercises the loop, not
    // just the first join
    val got = cc((1L until 10L).map(i => (i, i + 1)))
    assert(got.keySet == (1L to 10L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("disjoint components keep distinct canonical labels") {
    val got = cc(Seq((5L, 6L), (6L, 7L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(got(5L) == 5L && got(6L) == 5L && got(7L) == 5L)
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got(30L) == 30L && got(31L) == 30L)
  }

  test("edge direction and duplicates don't matter") {
    val a = cc(Seq((2L, 1L), (3L, 2L), (3L, 1L), (1L, 3L)))
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("q66 groups every planted copy with its original") {
    val res = Components.q66DedupClusters(spark, sfDir).collect()
    assert(res.nonEmpty)
    val byComp = res.map(r => (r.getAs[Long]("component"),
      r.getAs[String]("members").split(",").map(_.toLong).toSet))
    byComp.foreach { case (comp, members) =>
      // canonical representative is the min member
      assert(comp == members.min)
      // transitive closure: a planted copy (id ≥ offset) is always in the
      // same component as its original
      members.filter(_ >= Components.PlantOffset).foreach { copy =>
        assert(members.contains(copy - Components.PlantOffset),
          s"copy $copy split from its original in component $comp")
      }
      assert(members.size >= 2)
    }
    // components are a partition: no doc in two components
    val all = byComp.flatMap(_._2)
    assert(all.length == all.distinct.length)
  }
  test("large-star/small-star equals hash-min on clique-ish graphs") {
    import spark.implicits._
    // several overlapping families + isolated pairs
    val edges = Seq((1L,2L),(2L,3L),(3L,1L),(10L,11L),(11L,12L),
      (20L,21L),(30L,31L),(31L,32L),(32L,33L),(33L,30L),(2L,10L))
      .toDF("a","b")
    val hm = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lss = Components.connectedComponentsLSS(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lss == hm)
  }

  // -------------------------------------------------------------------
  // Persisted incremental component store
  // -------------------------------------------------------------------

  private def storeLabels(dir: String): Map[Long, Long] =
    Components.readComponents(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fullClosure(pairs: Seq[(Long, Long)]): Map[Long, Long] = cc(pairs)

  test("component store: build + append == full rebuild (cross-component merges)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccstore").toString + "/s"
    // base: three components {1,2,3}, {10,11}, {100,101,102}
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (100L, 101L), (101L, 102L))
    // batch: merges {1..3} with {10,11}, attaches new node 50 to {100..},
    // and adds a brand-new pair {200,201}; plus a new node 0 that lowers
    // component 100's label (forces stored-member relabeling)
    val batch = Seq((3L, 10L), (50L, 100L), (200L, 201L), (0L, 102L))
    Components.buildComponentStore(spark, dir, base.toDF("a", "b"), nParts = 8)
    assert(Components.appendEdges(spark, dir, batch.toDF("a", "b")))
    assert(storeLabels(dir) == fullClosure(base ++ batch))
  }

  test("component store: replayed batch is a no-op; crash-retry (lost ledger) converges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccstore").toString + "/s"
    val base = Seq((1L, 2L), (10L, 11L))
    val batch = Seq((2L, 10L), (20L, 21L))
    Components.buildComponentStore(spark, dir, base.toDF("a", "b"), nParts = 4)
    assert(Components.appendEdges(spark, dir, batch.toDF("a", "b")))
    val after = storeLabels(dir)
    // exact replay short-circuits on the ledger
    assert(!Components.appendEdges(spark, dir, batch.toDF("a", "b")))
    assert(storeLabels(dir) == after)
    // crash window: data committed but ledger write lost — delete the
    // ledger entry and re-run; the monotone relabel must no-op on the
    // already-applied state, not corrupt it
    val ledger = new java.io.File(s"$dir/_applied")
    ledger.listFiles().foreach(_.delete())
    assert(Components.appendEdges(spark, dir, batch.toDF("a", "b")))
    assert(storeLabels(dir) == after)
    assert(after == fullClosure(base ++ batch))
  }

  test("purgeNodes ≡ rebuild over the filtered edges: a cut-vertex " +
      "delete SPLITS its component, a min-id delete RENAMES it, an " +
      "isolated survivor LEAVES; unaffected components untouched; " +
      "replay and unknown ids no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccpurge")
      .toString + "/s"
    // {1,2,3,4}: 2 is a cut vertex (1-2, 2-3, 3-4) → deleting 2 splits
    //   into {1} (isolated → leaves) and {3,4}
    // {10,11,12}: chain 10-11-12; deleting 10 (the MIN) renames to 11
    // {20,21}: untouched component
    // {30,31}: both endpoints die → everything leaves
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (30L, 31L))
    val batch = Seq((3L, 4L), (11L, 12L))
    Components.buildComponentStore(spark, dir, base.toDF("a", "b"),
      nParts = 4)
    assert(Components.appendEdges(spark, dir, batch.toDF("a", "b")))
    val doomed: Seq[Any] = Seq(2L, 10L, 30L, 31L)
    val removed = Components.purgeNodes(spark, dir, doomed)
    // leaving rows: 2, 30, 31 (deleted), 1 (isolated), 10 (deleted min)
    assert(removed == 5L, s"removed=$removed")
    val filtered = (base ++ batch).filter { case (a, b) =>
      !doomed.contains(a) && !doomed.contains(b) }
    assert(storeLabels(dir) == fullClosure(filtered),
      "the purged store must equal a from-scratch closure over the " +
        "filtered edge set")
    assert(storeLabels(dir) == Map(3L -> 3L, 4L -> 3L, 11L -> 11L,
      12L -> 11L, 20L -> 20L, 21L -> 20L))
    // no edge row references a deleted id
    val edges = spark.read.parquet(s"$dir/edges")
    assert(edges.filter(col("a").isInCollection(doomed) ||
      col("b").isInCollection(doomed)).count() == 0L)
    // replay no-ops on the ledger; unknown ids no-op loudly-not-at-all
    assert(Components.purgeNodes(spark, dir, doomed) == 0L)
    assert(Components.purgeNodes(spark, dir, Seq(999L)) == 0L)
    assert(storeLabels(dir) == fullClosure(filtered))
    // the store keeps working: a batch reconnecting the split halves
    assert(Components.appendEdges(spark, dir,
      Seq((4L, 12L)).toDF("a", "b")))
    assert(storeLabels(dir) == fullClosure(filtered :+ (4L, 12L)))
  }

  test("purgeNodes crash-retry: with the stage present and the edges " +
      "already purged, the retry finishes from the STAGED plan (it " +
      "cannot recompute the split from half-purged edges)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccpurge_crash")
      .toString + "/s"
    // 2 is a cut vertex: deleting it splits {1,2,3,4} into {1}
    // (isolated → leaves) and {3,4}
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (20L, 21L))
    Components.buildComponentStore(spark, dir, base.toDF("a", "b"),
      nParts = 4)
    val doomed: Seq[Any] = Seq(2L)
    // hand-build the exact crash state a first run leaves after its
    // stage write + edge purge but BEFORE the label rewrite/ledger mark
    val id = "purge-" + graft.pipeline.AppendCommit.contentId("2")
    val stage = s"$dir/_purge_stage/$id"
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("id", "comp")
      .write.parquet(s"$stage/members")
    // relabeled = closure over the filtered sub-edges {3-4}
    Seq((3L, 3L), (4L, 3L)).toDF("id", "comp")
      .withColumn("part", pmod(xxhash64(col("id")), lit(4L)))
      .write.parquet(s"$stage/relabeled")
    new java.io.File(stage, "_staged").createNewFile()
    graft.pipeline.Maintain.deleteByKey(spark, s"$dir/edges", "a", doomed)
    graft.pipeline.Maintain.deleteByKey(spark, s"$dir/edges", "b", doomed)
    // the retry must converge from the stage: 1 and 2 leave, 3/4 keep
    // comp 3, component {20,21} untouched
    val removed = Components.purgeNodes(spark, dir, doomed)
    assert(removed == 2L, s"removed=$removed")
    assert(storeLabels(dir) == Map(3L -> 3L, 4L -> 3L, 20L -> 20L,
      21L -> 20L))
    assert(Components.purgeNodes(spark, dir, doomed) == 0L)
  }

  test("component store: append rewrites only label partitions holding changed/new ids") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccstore").toString + "/s"
    // base nodes spread across partitions; batch touches only {200,201}
    val base = (1L to 64L by 2L).map(i => (i, i + 1L))
    Components.buildComponentStore(spark, dir, base.toDF("a", "b"), nParts = 8)
    val beforeParts = (0 until 8).map { p =>
      val d = new java.io.File(s"$dir/labels/part=$p")
      p -> (if (d.isDirectory)
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      else Set.empty[(String, Long, Long)])
    }.toMap
    assert(Components.appendEdges(spark, dir, Seq((200L, 201L)).toDF("a", "b")))
    // the two new ids land in a known partition set; every OTHER
    // partition keeps exact file identity (name+size+mtime)
    val touched = Seq(200L, 201L)
      .map(id => spark.range(1).select(
        pmod(xxhash64(lit(id)), lit(8)).cast("int")).head().getInt(0)).toSet
    (0 until 8).filterNot(touched).foreach { p =>
      val d = new java.io.File(s"$dir/labels/part=$p")
      val now = if (d.isDirectory)
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      else Set.empty[(String, Long, Long)]
      assert(now == beforeParts(p), s"partition $p was rewritten")
    }
    assert(storeLabels(dir) == fullClosure(base :+ (200L, 201L)))
  }

  test("streaming edge sink: micro-batch chopping and replays don't change the labels") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // chain + clique + isolated pair, arriving out of order so later
    // micro-batches force cross-component merges of earlier state
    val edges = Seq((5L, 6L), (1L, 2L), (10L, 11L), (3L, 4L),
      (2L, 3L), (11L, 12L), (4L, 5L), (20L, 21L))
    def ingest(store: String, chunks: Seq[Seq[(Long, Long)]]): Unit = {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      val q = mem.toDF().toDF("a", "b")
        .writeStream.foreachBatch(Components.foreachBatchEdgeSink(store, 4))
        .start()
      try chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      finally q.stop()
    }
    val oneShot = java.nio.file.Files.createTempDirectory("ccs1").toString + "/s"
    val chopped = java.nio.file.Files.createTempDirectory("ccs2").toString + "/s"
    ingest(oneShot, Seq(edges))
    ingest(chopped, Seq(edges.take(3), edges.slice(3, 5), edges.drop(5)))
    assert(storeLabels(oneShot) == storeLabels(chopped),
      "micro-batch chopping must not change the closure")
    assert(storeLabels(oneShot) == fullClosure(edges))
    // engine-style replay: re-delivering micro-batch id 1 must no-op
    Components.foreachBatchEdgeSink(chopped, 4)(
      edges.slice(3, 5).toDF("a", "b"), 1L)
    assert(storeLabels(chopped) == fullClosure(edges),
      "a re-delivered micro-batch id must not change the labels")
  }

  test("q101 equals q66's from-scratch closure through the store boundary") {
    val viaStore = Components.q101IncrementalComponents(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val scratch = Components.q66DedupClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(viaStore == scratch)
  }

  test("large-star/small-star converges on a 500-node chain in O(log^2 n)") {
    import spark.implicits._
    // a path graph: diameter 499 — hash-min would need ~499 rounds
    val chain = (1L until 500L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Components.connectedComponentsLSS(chain, maxIters = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 500)
    assert(comp.values.forall(_ == 1L), "single component rooted at the min")
  }

  test("purgeNodes on a star topology: forgetting the hub isolates " +
      "every spoke with NO corpus-proportional driver materialization " +
      "(the leaving set stays distributed end-to-end)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccstar")
      .toString + "/s"
    val nSpokes = 120000
    // hub 0 pairs with every spoke; spokes never pair with each other —
    // the template-document shape. Deleting the hub isolates ALL spokes.
    val edges = spark.range(1, nSpokes + 1)
      .select(lit(0L).as("a"), col("id").as("b"))
    Components.buildComponentStore(spark, dir, edges, nParts = 8)
    assert(storeLabels(dir).size == nSpokes + 1)
    // guard: during the purge, no single task may ship a result sized
    // like the spoke set back to the driver (the old .collect() path
    // returned ~nSpokes×16B per partition; aggregates/file-count
    // collects are orders of magnitude below the bound)
    val maxResult = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          maxResult.getAndAccumulate(e.taskMetrics.resultSize, math.max)
    }
    spark.sparkContext.addSparkListener(listener)
    // auto-broadcast off for the guard: Spark may legitimately choose to
    // broadcast the (threshold-bounded) key frame — that driver hop is
    // capped by spark.sql.autoBroadcastJoinThreshold, unlike the
    // unbounded .collect() this spec exists to forbid. With broadcasts
    // disabled, ONLY an explicit collect can ship the spoke set.
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val removed = Components.purgeNodes(spark, dir, Seq(0L))
      assert(removed == nSpokes + 1L,
        s"hub + every isolated spoke must leave, got $removed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      Thread.sleep(2000) // listener bus drains asynchronously
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(storeLabels(dir).isEmpty, "no member survives a hub forget")
    assert(spark.read.schema("a LONG, b LONG")
      .parquet(s"$dir/edges").count() == 0L)
    assert(maxResult.get() < 256 * 1024,
      s"a task shipped ${maxResult.get()} bytes to the driver — " +
        "corpus-proportional collect in the purge path")
    // replay no-ops; the store keeps working after total evacuation
    assert(Components.purgeNodes(spark, dir, Seq(0L)) == 0L)
    assert(Components.appendEdges(spark, dir,
      Seq((1L, 2L)).toDF("a", "b")))
    assert(storeLabels(dir) == Map(1L -> 1L, 2L -> 1L))
  }

  test("edge-archive maintenance: crash-retry duplicate rows collapse, " +
      "file count bounds, and purge/read/append results are unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccarch")
      .toString + "/s"
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val b1 = Seq((3L, 4L), (11L, 12L), (20L, 21L))
    Components.buildComponentStore(spark, dir, base.toDF("a", "b"),
      nParts = 4)
    assert(Components.appendEdges(spark, dir, b1.toDF("a", "b")))
    // crash injection: the batch's archive write landed but the ledger
    // mark did not, and the retry re-appended — duplicate rows
    b1.toDF("a", "b").write.mode("append").parquet(s"$dir/edges")
    def edgeRows() = spark.read.schema("a LONG, b LONG")
      .parquet(s"$dir/edges").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (base ++ b1).toSet
    assert(edgeRows().toSet == want && edgeRows().size > want.size,
      "the injection must have produced duplicate rows")
    def dataFiles() = new java.io.File(s"$dir/edges").listFiles()
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(Components.compactEdgeArchive(spark, dir, maxFiles = 1))
    assert(edgeRows().sorted == want.toSeq.sorted,
      "compaction must collapse to the exact distinct edge SET")
    assert(edgeRows().size == want.size, "duplicates must be gone")
    assert(dataFiles() <= 2, s"file count must bound: ${dataFiles()}")
    // idempotent: a second run under the same bound rewrites nothing
    assert(!Components.compactEdgeArchive(spark, dir, maxFiles = 1))
    // a crashed compaction SWAP heals on the next touch (archive was
    // renamed aside, live dir missing)
    val edir = new java.io.File(s"$dir/edges")
    val aside = new java.io.File(edir.getParent, ".edges.__old")
    assert(edir.renameTo(aside))
    assert(Components.appendEdges(spark, dir,
      Seq((30L, 31L)).toDF("a", "b")))
    assert(edgeRows().toSet == want + ((30L, 31L)),
      "the healed archive must keep its full history")
    // purge over the compacted+healed archive equals the filtered truth
    Components.purgeNodes(spark, dir, Seq(3L))
    val filtered = (base ++ b1 :+ (30L, 31L)).filter {
      case (a, b) => a != 3L && b != 3L }
    assert(storeLabels(dir) == fullClosure(filtered))
  }

  test("streaming sink: a degenerate first micro-batch cannot wedge the store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc_dgn").toString +
      "/store"
    val sink = Components.foreachBatchEdgeSink(dir)
    // only self-loops and a null endpoint: zero EFFECTIVE edges. A build
    // from this would write a labels dir holding just _SUCCESS — a store
    // that "exists" but fails every read, wedging the sink forever
    sink(Seq((Some(1L), Some(1L)), (Some(2L), Some(2L)),
      (Some(3L), Option.empty[Long])).toDF("a", "b"), 0L)
    assert(!Components.componentStoreExists(spark, dir),
      "a zero-effective-edge batch must not found the store")
    // the first REAL batch founds it and reads back fine
    sink(Seq((1L, 2L)).toDF("a", "b"), 1L)
    assert(Components.readComponents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 1L)))
  }
}
