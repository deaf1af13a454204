package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line: per-query seconds + total.
  *
  * Measurement validity is the whole design (round-2 lesson: a single
  * long-lived session accumulates JVM state — GC pressure, codegen
  * classes, broadcast/cleaner backlog — that inflated unchanged queries
  * 2-17× depending on their position in the run, and back-to-back
  * min-of-2 sampled both passes at the same polluted point):
  *
  *  - queries run in GROUPS, each group in a FRESH SparkSession, so no
  *    query's number depends on what ran more than a group-width before
  *    it (a forked JVM per query would isolate perfectly but costs ~15 s
  *    of JVM+session startup each; fresh sessions get the bulk of the
  *    isolation — caches, broadcasts, UI/listener state — at ~1 s each,
  *    while the JVM-global codegen/JIT caches carry the warmup benefit
  *    across restarts);
  *  - passes are INTERLEAVED (all queries pass 1, then all pass 2), so
  *    the per-query min is taken over samples from different process
  *    states and actually filters neighborhood effects;
  *  - per-group table registration runs before the timed loop, so the
  *    first query of a group doesn't absorb the 10-table listing cost;
  *  - warmup per group at the smallest SF generates the same codegen
  *    classes the timed plans use (steady-state, not first-call JIT).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    // 3 passes by default: the min filters one-time fixture builds and
    // co-tenant stalls, the MEDIAN separates structural regressions
    // from ambient noise (two r12 watch items were unjudgeable from
    // min-of-2 on a host with ±2× swings)
    val runs = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap(_.toIntOption)
        .getOrElse(3))
    // BENCH_ONLY adjudication runs select the heaviest queries by
    // construction; packing them into one 16-slot session concentrates
    // GC/codegen pressure that the full run dilutes across groups (r5:
    // q32b measured 12.3 s filtered vs 5.3 s in the full run). Shrink
    // the default group under an active filter so adjudication numbers
    // are comparable to full-run numbers; an explicit BENCH_GROUP still
    // wins for deliberate group-composition experiments.
    val defaultGroup = if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) 4
      else 16
    val groupSize = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_GROUP").flatMap(_.toIntOption)
        .getOrElse(defaultGroup))

    def freshSession(): SparkSession = {
      SparkSession.getActiveSession.foreach(_.stop())
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config(Tables.SpreadScansKey, "true") // one-row-group test parquet
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // local-iteration filter: comma-separated query names — full names or
    // the short keys the JSON line prints (copying "q68" from the output
    // must select q68_quality_prune, not silently nothing)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) =>
        names(n) || names(n.takeWhile(_ != '_')) })
    only.foreach { names =>
      val known = SparkEntry.queries.keySet
        .flatMap(n => Set(n, n.takeWhile(_ != '_')))
      val unknown = names.diff(known)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names match nothing: ${unknown.mkString(",")}")
    }

    // stable grouping: sorted names, fixed-size groups — identical group
    // membership across passes, so each query's samples share a context
    val groups = selected.toSeq.sortBy(_._1).grouped(groupSize).toSeq
    // ALL samples per query (not just the running min): the per-query
    // spread max/min is the interference signal the artifact must carry —
    // three same-day r4 runs disagreed up to 5× per query and the judge
    // had to adjudicate forensically because the JSON line hid it.
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    // A query that throws must FAIL the bench, not record its
    // time-to-crash as a legitimate sample (the r3 annIvf crash would
    // have benched as a *fast* query). Keep running the rest so one bad
    // query still yields a full artifact, then exit nonzero.
    val failures = scala.collection.mutable.Map.empty[String, String]
    for (pass <- 0 until runs; group <- groups) {
      val spark = freshSession()
      // codegen warmup for exactly this group's plans
      group.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      // pre-register the timed SF's tables so the group's first query
      // doesn't pay the per-session listing
      Tables.registerAll(spark, sfDir)
      group.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            failures(name) = s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(120)
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // leaked cached plans from one query must not degrade the next
        spark.catalog.clearCache()
        if (ok) samples(name) = dt :: samples.getOrElse(name, Nil)
      }
      spark.stop()
    }
    val timed = selected.keys.toSeq.sorted.filter(samples.contains)
    val results = timed.map(n => n -> samples(n).min)
    val total = results.map(_._2).sum
    // median per query (lower-middle for even sample counts): the
    // noise-robust statistic regressions are adjudicated against
    def medianOf(xs: List[Double]): Double = {
      val s = xs.sorted
      s((s.size - 1) / 2)
    }
    val medians = timed.map(n => n -> medianOf(samples(n)))
    val totalMedian = medians.map(_._2).sum
    // spread = max/min across passes; > 1.5 means the number is
    // interference-suspect, not a code regression
    val spreads = timed.map(n =>
      n -> (if (samples(n).min > 0) samples(n).max / samples(n).min else 1.0))

    // The harness keeps only the LAST ~2000 bytes of stdout and parses the
    // JSON line out of that tail; with ~75 full-name queries at nanosecond
    // precision the line is >2KB and has never fit (BENCH_r01..r03 all show
    // parsed:null). Emit the machine-read line with SHORT keys (the unique
    // prefix before the first '_' — the contract's own example shape,
    // {"q1":sec,...}) at ms precision (~1.1KB), and keep the full-name,
    // full-precision map in bench_full.json for humans.
    def shortKey(n: String): String = n.takeWhile(_ != '_')
    val shortKeys = results.map { case (n, _) => shortKey(n) }
    val keyOf: String => String =
      if (shortKeys.distinct.size == shortKeys.size) shortKey else identity
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // ~170 queries no longer fit the tail even with short keys+ms
    // (~2.3KB > the ~2KB tail). Spend the query-map budget on the
    // EXPENSIVE queries (the ones perf grading reads) and roll the
    // cheap tail into one (count, summed seconds) pair — every number
    // still lands full-precision in bench_full.json.
    val qsBudgetBytes = 1350
    val byCost = results.sortBy { case (n, v) => (-v, n) }
    val entries = byCost.map { case (k, v) =>
      "\"" + keyOf(k) + "\":" + fmt(v) }
    val cum = entries.scanLeft(0)((a, e) => a + e.length + 1)
    val nKeep = cum.takeWhile(_ <= qsBudgetBytes).length - 1
    val kept = entries.take(nKeep)
    val restN = results.size - nKeep
    val restSec = byCost.drop(nKeep).map(_._2).sum
    val qs = (kept ++ (if (restN > 0)
        Seq("\"rest_n\":" + restN, "\"rest_sec\":" + fmt(restSec))
      else Seq.empty)).mkString("{", ",", "}")
    // the compact line can't afford per-query min+max (would blow the
    // ~2KB tail buffer again); emit max only where spread > 1.5×, which
    // is exactly the set a reader needs to discount — capped at the 8
    // worst offenders so a fully interference-polluted run still fits
    // the tail buffer; all samples land in bench_full.json
    val suspect = spreads.filter(_._2 > 1.5).sortBy(-_._2).take(8)
      .map { case (n, _) =>
        "\"" + keyOf(n) + "\":" + fmt(samples(n).max) }.mkString("{", ",", "}")
    val failedArr = failures.keys.toSeq.sorted
      .map(n => "\"" + keyOf(n) + "\"").mkString("[", ",", "]")

    val fullQs = timed.map { n =>
      "\"" + n + "\":" + samples(n).sorted.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val fullFails = failures.toSeq.sortBy(_._1).map { case (n, e) =>
      "\"" + n + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val fullMedians = medians.map { case (n, v) =>
      "\"" + n + "\":" + v }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","value_median":$totalMedian,"samples":$fullQs,"medians":$fullMedians,"failed":$fullFails,"sf":"$sfDir","runs":$runs}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }

    // compact line: "value" stays the min-total (comparable to every
    // prior round); "value_median" is the noise-robust total. Per-query
    // medians live in bench_full.json (the ~2KB stdout tail cannot
    // carry two full per-query maps).
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","value_median":${fmt(totalMedian)},"queries":$qs,"failed":$failedArr,"spread_max":$suspect,"sf":"$sfDir","runs":$runs}""")
    if (failures.nonEmpty) {
      failures.toSeq.sortBy(_._1).foreach { case (n, e) =>
        System.err.println(s"BENCH FAILURE $n: $e") }
      sys.exit(1)
    }
  }
}
