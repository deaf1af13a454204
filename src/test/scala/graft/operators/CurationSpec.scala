package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Curation semantics beyond the DuckDB gate: split stability and
  * internal consistency of the decontamination/repetition accounting. */
class CurationSpec extends SparkSpec {

  test("decontamination accounting is internally consistent") {
    val rows = Curation.q62Decontaminate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_train_docs")
      val c = r.getAs[Long]("n_contaminated")
      val cl = r.getAs[Long]("n_clean")
      assert(c + cl == n, s"$c + $cl != $n")
      assert(c >= 0 && cl >= 0)
    }
    // benchmark docs (doc_id % 97 == 0) are excluded from the train side
    val total = rows.map(_.getAs[Long]("n_train_docs")).sum
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val expected = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0).count()
    assert(total == expected)
  }

  test("hash split is deterministic, exhaustive, and ~90/10") {
    val rows = Curation.q63HashSplit(spark, sfDir).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val total = bySplit.values.sum
    assert(total == graft.Tables.load(spark, sfDir, "documents").count())
    val trainFrac = bySplit.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    // determinism: same result on a second run (hash of doc_id only)
    val again = Curation.q63HashSplit(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("split"),
        r.getAs[Long]("n_docs"))).toSet
    val first = rows.map(r => (r.getAs[String]("lang"),
      r.getAs[String]("split"), r.getAs[Long]("n_docs"))).toSet
    assert(again == first)
  }

  test("stratified sample is k-per-stratum, deterministic, hash-ranked") {
    val rows = Curation.q65StratifiedSample(spark, sfDir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val langSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == math.min(20L, langSizes(lang)))
      assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to rs.length))
    }
    // determinism: identical on a second run
    val again = Curation.q65StratifiedSample(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rnk"),
        r.getAs[Long]("doc_id"))).toSet
    val first = rows.map(r => (r.getAs[String]("lang"),
      r.getAs[Int]("rnk"), r.getAs[Long]("doc_id"))).toSet
    assert(again == first)
  }

  test("repetition counts bound sanely") {
    val rows = Curation.q64Repetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_with_repeat") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("max_gram_count") >= 1L)
    }
  }

  test("distributed prefix sum matches the naive global window exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sfDir, "documents")
    // deliberately tiny buckets so the decomposition is exercised hard
    // (many buckets, uneven sizes — doc_ids need not be dense)
    val got = Curation.packSequences(docs, 8192L, bucketWidth = 17L)
      .orderBy("doc_id").collect()
    val w = Window.orderBy(col("doc_id")).rowsBetween(Long.MinValue, -1)
    val naive = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(w), lit(0L)))
      .orderBy("doc_id").collect()
    assert(got.length == naive.length)
    got.zip(naive).foreach { case (g, n) =>
      assert(g.getAs[Long]("doc_id") == n.getAs[Long]("doc_id"))
      assert(g.getAs[Long]("off") == n.getAs[Long]("off"),
        s"offset mismatch at doc ${g.getAs[Long]("doc_id")}")
    }
    // offsets are contiguous: each doc starts where the previous ended
    got.sliding(2).foreach {
      case Array(p, c) =>
        assert(c.getAs[Long]("off") ==
          p.getAs[Long]("off") + p.getAs[Long]("n_tokens"))
      case _ => ()
    }
    // bin/straddle arithmetic holds
    got.foreach { r =>
      val off = r.getAs[Long]("off"); val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("bin") == off / 8192L)
      assert(r.getAs[Long]("straddle") ==
        (if (off % 8192L + n > 8192L) 1L else 0L))
    }
  }

  test("quantile threshold is the exact upper-tail order statistic") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val thr = Curation.quantileThresholds(docs, "lang", "n_chars", 0.5)
      .collect().map(r => r.getAs[String]("lang") ->
        r.getAs[Long]("threshold")).toMap
    val local = docs.select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    local.foreach { case (lang, vals) =>
      val need = math.ceil(vals.length * 0.5).toLong
      val v = thr(lang)
      // v covers the top half...
      assert(vals.count(_ >= v) >= need, s"$lang: $v covers too little")
      // ...and is the LARGEST value doing so
      val above = vals.filter(_ > v)
      if (above.nonEmpty)
        assert(vals.count(_ >= above.min) < need,
          s"$lang: ${above.min} also covers — $v is not maximal")
    }
  }

  test("domain mixture sampling respects the spec and is deterministic") {
    val rows = Curation.q72DomainMix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getAs[Long]("pct")
      val n = r.getAs[Long]("n_docs")
      val k = r.getAs[Long]("n_sampled")
      assert(pct >= 25 && pct <= 60)
      assert(k >= 0 && k <= n)
    }
    val again = Curation.q72DomainMix(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_sampled")))
      .toSet
    assert(again == rows.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_sampled"))).toSet)
  }

  test("vocab pruning rewrites rare tokens only, preserving order") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Curation.q73VocabPrune(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unk"),
          r.getAs[String]("pruned_md5"))).toMap
    assert(out.size == docs.count())
    // a doc with zero OOV tokens must hash to its ORIGINAL text — the
    // order-restoring reassembly is the identity there
    val origMd5 = docs.select(col("doc_id"),
        md5(col("text").cast("binary")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val untouched = out.filter { case (_, (_, unk, _)) => unk == 0 }
    assert(untouched.nonEmpty)
    untouched.foreach { case (id, (_, _, h)) =>
      assert(h == origMd5(id), s"doc $id: reassembly is not the identity")
    }
    // total <unk> mass equals the corpus count of sub-1% tokens
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
    val counts = words.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val tot = counts.map(_._2).sum
    val rareMass = counts.filter(_._2 * 100 < tot).map(_._2).sum
    assert(out.values.map(_._2).sum == rareMass)
  }

  test("keyword extraction returns each doc's max-tf terms first") {
    val rows = Curation.q74Keywords(spark, sfDir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val rnks: Seq[Int] = rs.map(_.getAs[Int]("rnk")).toSeq.sorted
      assert(rnks == (1 to rs.length))
      // tf is non-increasing in rank
      val byRnk: Seq[Long] =
        rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("tf")).toSeq
      assert(byRnk.zip(byRnk.drop(1)).forall { case (a, b) => a >= b })
    }
    // rank-1 keyword carries the doc's true max term frequency
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val maxTf = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id").agg(max("count").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, rs) =>
      val top = rs.minBy(_.getAs[Int]("rnk"))
      assert(top.getAs[Long]("tf") == maxTf(id))
    }
  }

  test("continuous quantile thresholds match the naive order statistic") {
    import spark.implicits._
    // high-cardinality doubles (every value distinct within a key) plus
    // an atom-heavy key (90% of mass on one value) — the two shapes that
    // stress the bucket decomposition differently
    val rows = (0 until 30000).map { i =>
      val key = s"k${i % 3}"
      val v =
        if (i % 3 == 2 && i % 10 != 0) 42.0 // atom-heavy stratum
        else ((i * 2654435761L) % 1000003).toDouble / 7.0
      (key, v)
    }
    val df = rows.toDF("key", "score")
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val got = Curation.quantileThresholdsContinuous(df, "key", "score", q)
        .collect().map(r => r.getAs[String]("key") ->
          r.getAs[Double]("threshold")).toMap
      val expected = rows.groupBy(_._1).map { case (k, vs) =>
        val need = math.ceil(vs.size * q).toLong
        // walk distinct values downward; first v whose top-down
        // cumulative count reaches the quota is the largest eligible
        val byValueDesc = vs.groupBy(_._2).view.mapValues(_.size)
          .toSeq.sortBy(-_._1)
        var cum = 0L
        k -> byValueDesc.find { case (_, c) =>
          cum += c; cum >= need }.get._1
      }
      assert(got == expected, s"q=$q: $got vs $expected")
    }
    // degenerate: single distinct value per key
    val one = Seq(("a", 7.5), ("a", 7.5), ("b", 7.5)).toDF("key", "score")
    val g1 = Curation.quantileThresholdsContinuous(one, "key", "score", 0.5)
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Double]("threshold")).toMap
    assert(g1 == Map("a" -> 7.5, "b" -> 7.5))
  }

  test("quantile totals count NULL scores toward n on both paths " +
      "(totals now fold the counts table, not a second corpus scan)") {
    import spark.implicits._
    // scores 1..8 plus two NULLs → n = 10, need = ceil(10·0.5) = 5 →
    // threshold = largest v with #(score ≥ v) ≥ 5 → 4.0. A totals
    // derivation that dropped NULL rows would see n = 8, need = 4 →
    // threshold 5.0 — this pins the n-includes-NULLs contract.
    val df = ((1 to 8).map(i => ("x", Some(i.toDouble))) ++
      Seq(("x", Option.empty[Double]), ("x", Option.empty[Double])))
      .toDF("key", "score")
    val cont = Curation.quantileThresholdsContinuous(df, "key", "score", 0.5)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("threshold"))).toSeq
    assert(cont == Seq(("x", 10L, 4.0)), s"continuous: $cont")
    val disc = Curation.quantileThresholds(df, "key", "score", 0.5)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("threshold"))).toSeq
    assert(disc == Seq(("x", 10L, 4.0)), s"discrete: $disc")
  }

  test("continuous quantile: a LOOSE covering rangeHint yields the " +
      "identical threshold (the medianMad bound-reuse contract)") {
    import spark.implicits._
    val rows = (0 until 5000).map { i =>
      (s"k${i % 3}", ((i * 2654435761L) % 99991).toDouble / 13.0 - 100.0)
    }
    val df = rows.toDF("key", "score")
    def canon(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getAs[String]("key"), x.getAs[Long]("n"),
        x.getAs[Double]("threshold"))).toSet
    for (q <- Seq(0.5, 0.1)) {
      val exact = canon(
        Curation.quantileThresholdsContinuous(df, "key", "score", q))
      // a hint 3× wider than the data on both sides: correctness must
      // not depend on tightness, only on coverage
      val loose = canon(Curation.quantileThresholdsContinuous(
        df, "key", "score", q, rangeHint = Some((-8000.0, 8000.0))))
      assert(exact === loose, s"q=$q")
    }
  }

  test("continuous quantile: the value window never sees unrestricted corpus rows") {
    import spark.implicits._
    val df = (0 until 1000)
      .map(i => (s"k${i % 3}", i.toDouble / 7.0)).toDF("key", "score")
    val plan = Curation.quantileThresholdsContinuous(df, "key", "score", 0.5)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    // the window ordered by the score column must consume the
    // boundary-bucket SLICE (a join against the per-key boundary row),
    // never the raw input — a regression to the discrete path's
    // corpus-sized per-(key, value) window removes that join
    val valueWindows = windows.filter(_.orderSpec.exists(
      _.child.references.exists(_.name == "score")))
    assert(valueWindows.nonEmpty, "expected a window ordered by score")
    valueWindows.foreach { w =>
      assert(w.child.collectFirst { case j: Join => j }.isDefined,
        "score-ordered window must sit above the boundary-bucket join")
    }
  }

  test("domain normalization: case, www, port, and non-URL inputs") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://WWW.Foo.COM/p?q=1"),
      (2L, "http://foo.com:8080/x"),
      (3L, "https://www.sub.Bar.org#frag"),
      (4L, "ftp://Baz.net"),
      (5L, "no scheme here"),
      (6L, "https://www.foo.com"),
      (7L, "HTTPS://Upper.Example.com/x")
    ).toDF("doc_id", "url")
    val r = Curation.normalizeDomains(urls).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(2)) None else Some(x.getString(2)))).toMap
    assert(r(1L).contains("foo.com"))
    assert(r(2L).contains("foo.com"))
    assert(r(3L).contains("sub.bar.org"))
    assert(r(4L).contains("baz.net"))
    assert(r(5L).isEmpty, "schemeless input must yield NULL")
    assert(r(6L).contains("foo.com"))
    assert(r(7L).contains("upper.example.com"),
      "schemes are case-insensitive (RFC 3986): HTTPS:// must parse")
  }

  test("domain blocklist: suffix matches at dot boundaries only; NULL survives") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("example.com")),          // exact match → blocked
      (2L, Some("a.example.com")),        // subdomain → blocked
      (3L, Some("deep.a.b.example.com")), // multi-level subdomain → blocked
      (4L, Some("notexample.com")),       // NOT a dot-boundary match → kept
      (5L, Some("example.com.evil.io")),  // entry is not a SUFFIX → kept
      (6L, Some("safe.org")),             // unrelated → kept
      (7L, Option.empty[String])          // NULL domain → kept
    ).toDF("doc_id", "domain")
    val bl = Seq("example.com").toDF("entry")
    val kept = Curation.blockByDomain(docs, "doc_id", "domain", bl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(4L, 5L, 6L, 7L))
  }

  test("term blocklist matches whole tokens only; clean docs survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text here"),                 // no hit → survives
      (2L, "has xbadword inside"),             // whole-token hit → blocked
      (3L, "prefixxbadword and xbadwordsuffix"), // substrings only → survives
      (4L, "xspam xbadword xspam"),            // 3 hits, 2 distinct terms
      (5L, "xbadword")                         // doc IS the term
    ).toDF("doc_id", "text")
    val bl = Seq("xbadword", "xspam")
    val audit = Curation.matchBlockedTerms(docs, bl).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(audit.keySet === Set(2L, 4L, 5L))
    assert(audit(2L) === ((1L, 1L, "xbadword")))
    assert(audit(4L) === ((3L, 2L, "xbadword_xspam")),
      "hit count is occurrences; terms are distinct and sorted")
    val kept = Curation.blockByTerms(docs, bl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L),
      "substring-only docs must survive word-boundary matching")
  }

  test("winsorize clips exactly the tails the order statistic defines") {
    import spark.implicits._
    // 1..20, tail 0.1: hi = largest v with #(≥v) ≥ ceil(2) → 19;
    // lo = largest v with #(≥v) ≥ ceil(18) → 3
    val df = (1L to 20L).map(v => ("a", v)).toDF("k", "v")
    val r = Curation.winsorize(df, "k", "v", 0.1)
      .select("v", "lo", "hi", "clipped").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r(1L) === ((3L, 19L, 3L)))
    assert(r(2L) === ((3L, 19L, 3L)))
    assert(r(3L) === ((3L, 19L, 3L)))
    assert(r(10L) === ((3L, 19L, 10L)))
    assert(r(19L) === ((3L, 19L, 19L)))
    assert(r(20L) === ((3L, 19L, 19L)))
    intercept[IllegalArgumentException](Curation.winsorize(df, "k", "v", 0.6))
  }

  test("continuous winsorize agrees with discrete and never windows the corpus") {
    import spark.implicits._
    // same contract at both tails: on a distribution where both paths
    // apply, the clipped columns must be identical
    val df = (1L to 20L).map(v => ("a", v.toDouble)).toDF("k", "v")
    def canon(r: org.apache.spark.sql.DataFrame) =
      r.select("v", "lo", "hi", "clipped").collect()
        .map(x => (x.getDouble(0), x.getDouble(1), x.getDouble(2),
          x.getDouble(3))).toSet
    assert(canon(Curation.winsorizeContinuous(df, "k", "v", 0.1)) ===
      canon(Curation.winsorize(df, "k", "v", 0.1)))
    intercept[IllegalArgumentException](
      Curation.winsorizeContinuous(df, "k", "v", 0.6))
    // the q68b plan guard, extended to the winsorize shape: on a
    // unique-per-row double score, every score-ordered window must
    // consume the boundary-bucket slice (above a join), never raw
    // corpus rows. Both tails now ride ONE multi-quantile pass (r15),
    // so the plan carries a single score window partitioned by
    // (key, q) — the per-q fan-out happens on the small cum table,
    // never as a second corpus pipeline.
    val uniq = (0 until 1000)
      .map(i => (s"k${i % 3}", i.toDouble / 7.0)).toDF("key", "score")
    val plan = Curation.winsorizeContinuous(uniq, "key", "score", 0.05)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val valueWindows = plan.collect { case w: LWindow => w }
      .filter(_.orderSpec.exists(
        _.child.references.exists(_.name == "score")))
    assert(valueWindows.size == 1,
      "expected ONE shared score window for both tails (multi-quantile)")
    valueWindows.foreach { w =>
      assert(w.child.collectFirst { case j: Join => j }.isDefined,
        "score-ordered window must sit above the boundary-bucket join")
      assert(w.partitionSpec.exists(_.references.exists(_.name == "q")),
        "the shared window must partition by the quantile column")
    }
  }

  test("continuous quantile matches discrete on NULL-heavy keys") {
    import spark.implicits._
    // key "nul": 6 of 10 scores NULL and q=0.5 → the quota is only
    // reachable through the NULL tail; both paths must return the key
    // with a NULL threshold rather than dropping it
    val rows =
      (1 to 4).map(i => ("nul", Some(i.toDouble))) ++
        (1 to 6).map(_ => ("nul", Option.empty[Double])) ++
        (1 to 10).map(i => ("ok", Some(i.toDouble)))
    val df = rows.toDF("k", "score")
    def canon(r: org.apache.spark.sql.DataFrame) =
      r.select("k", "n", "threshold").collect()
        .map(x => (x.getString(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet
    val discrete = canon(Curation.quantileThresholds(df, "k", "score", 0.5))
    val continuous =
      canon(Curation.quantileThresholdsContinuous(df, "k", "score", 0.5))
    assert(discrete === continuous)
    assert(discrete.exists(r => r._1 == "nul" && r._3.isEmpty),
      "NULL-heavy key must surface with a NULL threshold, not vanish")
    assert(discrete.exists(r => r._1 == "ok" && r._3.contains(6.0)))
  }

  test("chunking covers every word once per stride, no suffix-only chunk") {
    import spark.implicits._
    // C=8, O=3 → stride 5; n=12 → chunks at 0 (8 words) and 5 (7 words);
    // n=8 → exactly one chunk; n=9 → two (the 9th word must appear);
    // n=3 → one short chunk
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (3L, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),
      (4L, "c1 c2 c3")
    ).toDF("doc_id", "text")
    val r = Curation.chunkDocs(docs, 8, 3).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getString(3))).toMap
    assert(r((1L, 0L)) === ((8L, "w1 w2 w3 w4 w5 w6 w7 w8")))
    assert(r((1L, 1L)) === ((7L, "w6 w7 w8 w9 w10 w11 w12")))
    assert(r((2L, 0L)) === ((8L, "a1 a2 a3 a4 a5 a6 a7 a8")))
    assert(!r.contains((2L, 1L)), "exactly-C doc yields one chunk")
    assert(r((3L, 0L))._1 === 8L)
    assert(r((3L, 1L)) === ((4L, "b6 b7 b8 b9")))
    assert(r((4L, 0L)) === ((3L, "c1 c2 c3")))
    assert(r.size === 6)
  }

  test("chunking property: full coverage, exact overlap, no empty chunks") {
    import spark.implicits._
    // sweep (n, C, O) shapes incl. n < C, n = C, n ≡ boundary cases
    for ((c, o) <- Seq((8, 3), (8, 0), (5, 4), (32, 8));
         n <- Seq(1, 4, c - 1, c, c + 1, 2 * c - o, 2 * c - o + 1, 57)) {
      val words = (0 until n).map(i => s"t$i")
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = Curation.chunkDocs(docs, c, o)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3).split(" ")))
      val stride = c - o
      chunks.foreach { case (k, nw, ws) =>
        assert(ws.nonEmpty && nw == ws.length, s"n=$n C=$c O=$o k=$k")
        assert(ws.head == s"t${k * stride}", "chunk starts on its stride")
      }
      val covered = chunks.flatMap { case (k, _, ws) =>
        ws.indices.map(_ + k.toInt * stride) }.toSet
      assert(covered == (0 until n).toSet,
        s"every word in some chunk: n=$n C=$c O=$o")
      // no chunk is a suffix of its predecessor (dedup of tail windows)
      chunks.sliding(2).foreach {
        case Array((k1, _, w1), (k2, _, w2)) =>
          assert(k2.toInt * stride + w2.length > k1.toInt * stride + w1.length,
            s"chunk $k2 must extend coverage: n=$n C=$c O=$o")
        case _ =>
      }
    }
  }

  test("PII redaction counts and replaces every occurrence, in rule order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write a@b.io or c.d+x@e-f.org today"),      // 2 emails
      (2L, "hosts 10.0.0.1 and 192.168.255.3"),          // 2 IPs, one at end
      (3L, "call 555-0134 then 555-9999"),               // 2 phones
      (4L, "mixed x@y.com at 10.1.2.3 call 555-0000"),   // one of each
      (5L, "clean text with 1234-5678 and a@b only")     // no matches
    ).toDF("doc_id", "text")
    val r = Curation.redactPii(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getAs[Long]("n_email"), x.getAs[Long]("n_ip"),
          x.getAs[Long]("n_phone"), x.getAs[String]("redacted"))).toMap
    assert(r(1L) === ((2L, 0L, 0L, "write <EMAIL> or <EMAIL> today")))
    assert(r(2L) === ((0L, 2L, 0L, "hosts <IP> and <IP>")))
    assert(r(3L) === ((0L, 0L, 2L, "call <PHONE> then <PHONE>")))
    assert(r(4L) === ((1L, 1L, 1L, "mixed <EMAIL> at <IP> call <PHONE>")))
    assert(r(5L) === ((0L, 0L, 0L, "clean text with 1234-5678 and a@b only")))
  }

  test("canonicalizeUrls: case, www, default ports, fragments, tracking params") {
    import spark.implicits._
    val urls = Seq(
      1L -> "HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&id=7#frag",
      2L -> "https://ex.com/A/b?id=7",                  // same page as 1
      3L -> "https://ex.com:8080/A/b?id=7",             // kept port differs
      4L -> "http://ex.com:80/x",                       // http default port
      5L -> "https://ex.com/only?utm_a=1&ref=z",        // tracking-only qs
      6L -> "https://ex.com/CaseSensitive/Path",        // path case kept
      7L -> "no scheme here"
    ).toDF("doc_id", "url")
    val got = Curation.canonicalizeUrls(urls).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(got(1L) == "https://ex.com/A/b?id=7")
    assert(got(2L) == got(1L), "variants must collapse")
    assert(got(3L) == "https://ex.com:8080/A/b?id=7",
      "non-default ports are meaningful")
    assert(got(4L) == "http://ex.com/x")
    assert(got(5L) == "https://ex.com/only",
      "a tracking-only query drops its '?' entirely")
    assert(got(6L) == "https://ex.com/CaseSensitive/Path")
    assert(got(7L) == null)
  }

  test("multi-quantile thresholds equal the single-q path for every q") {
    import spark.implicits._
    val df = (1 to 500).map(i =>
        (s"g${i % 3}", if (i % 7 == 0) None else Some(i * 13 % 97 / 4.0)))
      .toDF("k", "v")
    val qs = Seq(0.1, 0.5, 0.9)
    val multi = Curation.quantileThresholdsContinuousMulti(df, "k", "v", qs)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    qs.foreach { q =>
      val single = Curation.quantileThresholdsContinuous(df, "k", "v", q)
        .collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
      single.foreach { case (k, th) =>
        assert(multi((k, q)) == th, s"q=$q key=$k")
      }
    }
  }

  test("curationPipeline: dedup keeps the smallest id; quality gates bind") {
    import spark.implicits._
    val docs = Seq(
      (7L, "one two three four five six seven eight", "en", 40L),
      (3L, "one two three four five six seven eight", "en", 40L), // dup, kept
      (4L, "short text under the word floor", "en", 31L),         // <8 words
      (5L, "x " * 30 + "tail", "de", 3000L),                       // ok
      (6L, "too long " + "y " * 10, "de", 9999L)                   // >maxChars
    ).toDF("doc_id", "text", "lang", "n_chars")
    val got = Curation.curationPipeline(docs, 10L, 5000L, 8)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
    // survivors: doc 3 (en, 8 words) and doc 5 (de, 31 words)
    assert(got.map(x => (x._1, x._3)).toSet == Set(("en", 1L), ("de", 1L)))
    assert(got.find(_._1 == "de").get._4 == 31L)
    assert(got.find(_._1 == "en").get._4 == 8L)
  }

  test("temperatureMix: sqrt weights normalize to 1 and upweight the tail") {
    import spark.implicits._
    val docs = Seq(
      ("big", ("w " * 399).trim),   // 400 tokens? no: 399 words
      ("small", "a b c d")          // 4 tokens
    ).toDF("source", "text")
    val got = Curation.temperatureMix(docs, "source").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Double]("weight"))).toMap
    val (nb, wb) = got("big"); val (ns, ws) = got("small")
    assert(nb == 399L && ns == 4L)
    assert(math.abs(wb + ws - 1.0) < 1e-9)
    // raw share of small = 4/403 ≈ 1%; sqrt share = 2/(2+19.97) ≈ 9%
    assert(ws > ns.toDouble / (nb + ns), "temperature must upweight")
  }

  test("kAnonymize: sub-k groups suppress as a unit, rows are preserved") {
    import spark.implicits._
    val df = Seq(
      (1, "US", "a"), (2, "US", "a"), (3, "US", "a"),   // group of 3: kept
      (4, "FR", "b"), (5, "FR", "b"),                    // group of 2: wiped
      (6, "DE", "c")).toDF("id", "country", "seg")       // singleton: wiped
    val r = Curation.kAnonymize(df, Seq("country", "seg"), 3L)
    assert(r.count() == 6L)
    val m = r.collect().map(x => x.getInt(0) ->
      ((Option(x.getString(1)), Option(x.getString(2)),
        x.getBoolean(3)))).toMap
    assert(m(1) == ((Some("US"), Some("a"), false)))
    assert(m(4) == ((None, None, true)))
    assert(m(6) == ((None, None, true)))
  }

  test("kAnonymize: NULL quasi values form their own group") {
    import spark.implicits._
    val df = Seq(
      (1, Option.empty[String]), (2, Option.empty[String]),
      (3, Option.empty[String]), (4, Some("x"))).toDF("id", "q")
    val m = Curation.kAnonymize(df, Seq("q"), 3L).collect()
      .map(x => x.getInt(0) -> x.getBoolean(2)).toMap
    // the three NULLs are a group of 3 -> kept; the singleton x wipes
    assert(m(1) == false && m(2) == false && m(4) == true)
  }

  test("prefixRuleMatch: longest prefix wins and segment boundaries hold") {
    import spark.implicits._
    val urls = Seq(
      (1L, "d.com", "/p/1"),      // exact deny rule
      (2L, "d.com", "/p/10"),     // must NOT match the /p/1 rule
      (3L, "d.com", "/p/1/sub"),  // under the deny subtree
      (4L, "d.com", "/q"),        // no rule: default
      (5L, "e.com", "/p/1")       // other domain: no rule
    ).toDF("id", "domain", "path")
    val rules = Seq(
      ("d.com", "/p", "allow"), ("d.com", "/p/1", "deny"))
      .toDF("domain", "prefix", "action")
    val m = Curation.prefixRuleMatch(urls, rules, "default")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(3)), r.getString(4)))).toMap
    assert(m(1L) == ((Some("/p/1"), "deny")))
    assert(m(2L) == ((Some("/p"), "allow")))
    assert(m(3L) == ((Some("/p/1"), "deny")))
    assert(m(4L) == ((None, "default")))
    assert(m(5L) == ((None, "default")))
  }

  test("weightedQuantileThresholds: mass quantile differs from row quantile") {
    import spark.implicits._
    // scores 1..4; score 4 carries almost all weight
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("g", 4L, 97L)).toDF("k", "score", "w")
    val mass = Curation.weightedQuantileThresholds(df, "k", "score", "w", 0.5)
      .head()
    // W=100, need cum_ge >= 50: score 4 alone has 97 -> threshold 4
    assert(mass.getAs[Long]("w_total") == 100L)
    assert(mass.getAs[Long]("threshold") == 4L)
    val row = Curation.quantileThresholds(df, "k", "score", 0.5).head()
    // 4 rows, need 2 from the top: threshold 3
    assert(row.getAs[Long]("threshold") == 3L)
  }

  test("lDiversity: a k-large group with one sensitive value fails the audit") {
    import spark.implicits._
    val df = Seq(
      ("US", "a", 10L), ("US", "a", 10L), ("US", "a", 10L),  // 1 value
      ("FR", "b", 10L), ("FR", "b", 20L), ("FR", "b", 30L))  // 3 values
      .toDF("country", "seg", "sens")
    val m = Curation.lDiversity(df, Seq("country", "seg"), "sens", 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(m("US") == ((3L, 1L, false)))
    assert(m("FR") == ((3L, 3L, true)))
  }

  test("datasetCard: planted duplication and p50 are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text", "en", "web", 10L),
      (2L, "same text", "en", "web", 10L),
      (3L, "other", "fr", "book", 30L),
      (4L, "more", "en", "web", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Curation.datasetCard(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") == 4.0 && m("n_sources") == 2.0 && m("n_langs") == 2.0)
    assert(m("dup_rate") == 0.25)           // 3 distinct of 4
    assert(m("share_top_lang") == 0.75)     // en
    assert(m("p50_chars") == 20.0)          // top-half rule: 30,20 cover 2/4
    assert(m("total_chars") == 70.0 && m("mean_chars") == 17.5)
  }

  test("splitBalance: a perfectly proportional split has zero chi2 terms") {
    import spark.implicits._
    val df = (for { s <- Seq("a", "b"); sp <- Seq("t", "v");
                    _ <- 1 to (if (sp == "t") 9 else 1) }
      yield (s, sp)).toDF("src", "split")
    val rows = Curation.splitBalance(df, "src", "split").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2_term") == 0.0, r.toString) }
  }

  test("imputeMode: modal fill with ties to smallest; no-mode keeps NULL") {
    import spark.implicits._
    val df = Seq(
      ("g1", Some("en")), ("g1", Some("en")), ("g1", Some("fr")),
      ("g1", None),
      ("g2", Some("de")), ("g2", Some("es")), ("g2", None), // tie -> de
      ("g3", None))                                         // no mode
      .toDF("grp", "lang")
    val out = Curation.imputeMode(df, "grp", "lang").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))
    assert(out.count(_ == (("g1", Some("en"), true))) == 1)
    assert(out.count(_ == (("g2", Some("de"), true))) == 1)
    assert(out.count(_ == (("g3", None, false))) == 1)
    assert(out.length == 8, "rows must be preserved")
  }

  test("fdCheck: clean FDs pass, planted violation names the majority") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "c"))
      .toDF("x", "y")
    val m = Curation.fdCheck(df, "x", "y").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3), r.getBoolean(5)))).toMap
    assert(m(1) == ((2L, "a", 2L, true)))
    assert(m(2) == ((1L, "c", 2L, false)))
  }

  test("goldenRecord: fields survive independently and may mix members") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("x"), Some("p")), (1L, Some("x"), Some("q")),
      (1L, Some("y"), Some("q")),   // majority a=x (2), b=q (2)
      (2L, None, Some("z")))        // a all-NULL -> golden NULL
      .toDF("cl", "a", "b")
    val m = Curation.goldenRecord(df, "cl", Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.getString(2)),
        Option(r.getString(3))))).toMap
    assert(m(1L) == ((3L, Some("x"), Some("q"))))
    assert(m(2L) == ((1L, None, Some("z"))))
  }

  test("groupHoldoutSplit: every group is split-pure, and a group's " +
      "assignment never moves as the corpus grows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct}
    val docs = (1 to 300).map(i => (i.toLong, s"site${i % 37}", s"d$i"))
      .toDF("doc_id", "source", "text")
    val s1 = Curation.groupHoldoutSplit(docs, "source")
    // purity: no group straddles splits
    assert(s1.groupBy(col("source"))
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count() == 0L)
    // both splits are populated at the default cut
    assert(s1.select("split").distinct().count() == 2L)
    // growth stability: doubling the corpus cannot move any group
    val grown = docs.unionByName(
      (301 to 600).map(i => (i.toLong, s"site${i % 61}", s"d$i"))
        .toDF("doc_id", "source", "text"))
    val a1 = s1.select("source", "split").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val a2 = Curation.groupHoldoutSplit(grown, "source")
      .select("source", "split").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a1.forall { case (g, sp) => a2(g) == sp },
      "a group's split must be a pure function of its key")
  }

  test("incremental pack store: batches pack at the frontier, equal to " +
      "one arrival-order scan; applied batches replay as no-ops; " +
      "placements never move") {
    import spark.implicits._
    val docs = (1L to 90L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("pack_store").toString + "/s"
    val budget = 16L
    Curation.initPackStore(spark, store,
      docs.filter(col("doc_id") % 3 === 0), budget, "b0")
    Curation.appendToPackStore(spark, store,
      docs.filter(col("doc_id") % 3 === 1), budget, "b1")
    val afterB1 = Curation.readPackStore(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // replay: no-op, frontier unchanged
    Curation.appendToPackStore(spark, store,
      docs.filter(col("doc_id") % 3 === 1), budget, "b1")
    Curation.appendToPackStore(spark, store,
      docs.filter(col("doc_id") % 3 === 2), budget, "b2")
    val got = Curation.readPackStore(spark, store)
      .select("doc_id", "n_tokens", "off", "bin", "straddle").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // expected: one sequential scan in arrival order (batch, doc_id)
    val arrival = (1L to 90L).sortBy(i => (i % 3, i))
    var off = 0L
    val expected = arrival.map { i =>
      val n = i % 7 + 1
      val row = (n, off, off / budget,
        if (off % budget + n > budget) 1L else 0L)
      off += n
      i -> row
    }.toMap
    assert(got == expected, s"${got.toSeq.sorted.take(5)} vs " +
      s"${expected.toSeq.sorted.take(5)}")
    // earlier placements did not move when later batches landed
    afterB1.foreach { case (id, o) =>
      assert(got(id)._2 == o, s"doc $id moved: $o -> ${got(id)._2}") }
  }

  test("pack-store epoch re-pack: below-threshold no-ops; firing " +
      "rewrites survivors densely in arrival order, bumps the epoch, " +
      "resets the frontier (later appends land at the dense end) and " +
      "keeps the replay ledger (old batch ids still no-op)") {
    import spark.implicits._
    def text(i: Long) = Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")
    val docs = (1L to 90L).map(i => (i, text(i))).toDF("doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("pack_compact").toString + "/s"
    val budget = 16L
    Curation.initPackStore(spark, store,
      docs.filter(col("doc_id") % 3 === 0), budget, "b0")
    Curation.appendToPackStore(spark, store,
      docs.filter(col("doc_id") % 3 === 1), budget, "b1")
    Curation.appendToPackStore(spark, store,
      docs.filter(col("doc_id") % 3 === 2), budget, "b2")
    val doomed: Seq[Any] = (1L to 90L).filter(_ % 5 == 2)
    Curation.purgePackStore(spark, store, doomed)
    val total = (1L to 90L).map(i => i % 7 + 1).sum
    val live = (1L to 90L).filterNot(_ % 5 == 2).map(i => i % 7 + 1).sum
    val expectRatio = (total - live).toDouble / total
    assert(math.abs(
      Curation.packHoleRatio(spark, store) - expectRatio) < 1e-12)
    // threshold above the actual ratio: no rewrite, epoch stays 0,
    // placements untouched
    val before = Curation.readPackStore(spark, store)
      .select("doc_id", "off").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Curation.compactPackStore(spark, store, budget,
      minHoleRatio = expectRatio + 0.01).isEmpty)
    assert(Curation.packEpoch(store) == 0L)
    val after = Curation.readPackStore(spark, store)
      .select("doc_id", "off").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before)
    // firing: dense re-pack in survivor arrival order, epoch 1
    assert(Curation.compactPackStore(spark, store, budget,
      minHoleRatio = 0.01).contains(1L))
    assert(Curation.packEpoch(store) == 1L)
    assert(Curation.packHoleRatio(spark, store) == 0.0)
    // replay: no holes left, no rewrite, epoch unchanged
    assert(Curation.compactPackStore(spark, store, budget,
      minHoleRatio = 0.01).isEmpty)
    assert(Curation.packEpoch(store) == 1L)
    // an ALREADY-APPLIED batch id replayed after the compaction is
    // still a ledger no-op (the pk_ rewrite kept every id applied)
    Curation.appendToPackStore(spark, store,
      docs.filter(col("doc_id") % 3 === 1), budget, "b1")
    // a NEW batch lands at the dense frontier
    val extra = (91L to 100L).map(i => (i, text(i))).toDF("doc_id", "text")
    Curation.appendToPackStore(spark, store, extra, budget, "b3")
    val got = Curation.readPackStore(spark, store)
      .select("doc_id", "n_tokens", "off", "bin", "straddle").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val arrival = (1L to 90L).sortBy(i => (i % 3, i))
      .filterNot(_ % 5 == 2) ++ (91L to 100L)
    var off = 0L
    val expected = arrival.map { i =>
      val n = i % 7 + 1
      val row = (n, off, off / budget,
        if (off % budget + n > budget) 1L else 0L)
      off += n
      i -> row
    }.toMap
    assert(got == expected,
      s"${got.toSeq.sorted.take(5)} vs ${expected.toSeq.sorted.take(5)}")
  }

  test("streaming pack sink: micro-batch BOUNDARIES cannot move a " +
      "placement (same stream order, 1-chop ≡ 3-chop bit-for-bit); a " +
      "redelivered batch id is a ledger no-op; out-of-order arrival " +
      "packs at the frontier, never re-sorts history") {
    import spark.implicits._
    def text(i: Long) = Seq.fill((i % 5 + 1).toInt)("w").mkString(" ")
    def df(r: Range) = r.map(i => (i.toLong, text(i.toLong)))
      .toDF("doc_id", "text")
    val budget = 16L
    // chop-invariance: the SAME stream order under different
    // micro-batch boundaries
    val oneShot = java.nio.file.Files
      .createTempDirectory("pack_stream1").toString + "/s"
    val chopped = java.nio.file.Files
      .createTempDirectory("pack_stream3").toString + "/s"
    Curation.foreachBatchPackSink(oneShot, budget)(df(1 to 80), 0L)
    val sink3 = Curation.foreachBatchPackSink(chopped, budget)
    sink3(df(1 to 30), 0L); sink3(df(31 to 60), 1L)
    sink3(df(61 to 80), 2L)
    // replay of an applied micro-batch id: no-op
    sink3(df(31 to 60), 1L)
    def placements(store: String) =
      Curation.readPackStore(spark, store)
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(placements(chopped) == placements(oneShot),
      "micro-batch boundaries must not move any placement")
    // out-of-order arrival: a LATER batch of LOWER ids packs at the
    // frontier — earlier placements byte-identical, no global re-sort
    val before = placements(chopped)
    sink3(df(101 to 110), 3L)
    val withLate = placements(chopped)
    before.foreach { case (id, row) =>
      assert(withLate(id) == row, s"doc $id moved on a later batch") }
    val frontier = before.values.map(v => v._2 + v._1).max
    assert(withLate(101L)._2 == frontier,
      "the late batch must land exactly at the frontier")
  }

  test("readPackBins: the bin-window read equals the full-store filter " +
      "and the range predicate is PUSHED to the parquet scan " +
      "(bin-sorted files → row-group pruning)") {
    import spark.implicits._
    val docs = (1L to 90L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("pack_bins").toString + "/s"
    Curation.initPackStore(spark, store, docs, 16L, "b0")
    val all = Curation.readPackStore(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toSet
    val win = Curation.readPackBins(spark, store, 3L, 7L)
    val got = win.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == all.filter(t => t._3 >= 3L && t._3 <= 7L))
    assert(got.nonEmpty)
    val plan = win.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(bin,3)"),
      s"bin range must reach the scan as a pushed filter:\n$plan")
  }
}
