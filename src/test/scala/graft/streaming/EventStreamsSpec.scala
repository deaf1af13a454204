package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.EventTime

/** Stream/batch agreement: the streaming transforms must produce exactly
  * the oracle-checked batch results when fed the same events, and custom
  * state must evolve correctly across micro-batches. */
class EventStreamsSpec extends SparkSpec {

  import EventStreams.Ev

  private def eventsBatch = graft.Tables.load(spark, sfDir, "events")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("streaming tumbling windows == batch tumbling aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventsBatch
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .as[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .collect()
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    mem.addData(rows.toSeq)
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.tumblingCounts(streamDf)
      .writeStream.format("memory").queryName("tumb")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("tumb")
      .select(col("bucket_start").cast("long"), col("event_type"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = eventsBatch
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long"), col("event_type"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("session windows (streaming) agree with batch gap sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventsBatch.select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    mem.addData(rows.toSeq)
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStreams.sessionCounts(streamDf)
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()

    // per-user session counts and per-session event counts must match the
    // oracle-checked batch formulation (q25)
    val got = spark.table("sess")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventTime.q25Sessionize(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("mapGroupsWithState session counting evolves across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // day-1 base: the event-time watermark starts at epoch 0, and events
    // at-or-before the watermark are dropped as late — t=0 would vanish
    def ts(min: Long) = new java.sql.Timestamp((1440 + min) * 60000L)
    val mem = MemoryStream[Ev]
    val stream = EventStreams.statefulSessionCount(mem.toDS())
    val q = stream.writeStream.format("memory").queryName("stateful")
      .outputMode("update").start()
    try {
      // batch 1: user 1 has two events 10 min apart → one session
      mem.addData(Ev(1, ts(0), 1), Ev(2, ts(10), 1))
      q.processAllAvailable()
      val b1 = spark.table("stateful").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(b1.contains((1L, 1L, 2L)))
      // batch 2: 45 min gap → second session for user 1; user 2 appears
      mem.addData(Ev(3, ts(55), 1), Ev(4, ts(56), 2))
      q.processAllAvailable()
      val b2 = spark.table("stateful").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(b2.contains((1L, 2L, 1L)))
      assert(b2.contains((2L, 1L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup collapses redelivered events, keeps state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventsBatch
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSeq
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = EventStreams.dedupedEvents(
        mem.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(rows)      // original delivery
      q.processAllAvailable()
      mem.addData(rows.take(200)) // partial redelivery (at-least-once)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("dedup").count() == rows.size.toLong)
    assert(spark.table("dedup").select("event_id").distinct().count()
      == rows.size.toLong)
  }

  test("stream-stream interval join matches the batch formulation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = eventsBatch.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val memP = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val memC = MemoryStream[(Long, java.sql.Timestamp, Long)]
    memP.addData(base.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3)).toSeq)
    memC.addData(base.filter(_._4 == "click").map(e => (e._1, e._2, e._3)).toSeq)
    val q = EventStreams.clickAttribution(
        memP.toDF().toDF("event_id", "ts", "user_id"),
        memC.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("attr").select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val p = eventsBatch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = eventsBatch.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val want = p.join(c, expr(
        "p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("watermark drops events later than 1 hour behind the max ts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.tumblingCounts(streamDf)
      .writeStream.format("memory").queryName("wm")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(10), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // advance event time far ahead → watermark passes hour 0
      mem.addData((2L, ts(300), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // this event is hours late → must be dropped, not re-open hour 0
      mem.addData((3L, ts(11), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
      val hour0 = spark.table("wm").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
      assert(hour0.forall(_.getAs[Long]("n_events") == 1L),
        s"late event must not increment the finalized hour-0 window")
    } finally q.stop()
  }

  test("curation map-stages compose onto streams: PII scrub stream==batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a stateless curation operator (map-only by plan guard) must run
    // unchanged on a streaming DataFrame — the composition the ingest
    // path relies on (scrub-before-persist)
    val docs = Seq(
      (1L, "send to a@b.io now"),
      (2L, "from 10.0.0.7 call 555-0001"),
      (3L, "nothing sensitive here"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs)
    val q = graft.operators.Curation
      .redactPii(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "n_email", "n_ip", "n_phone", "redacted")
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("pii_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    val want = graft.operators.Curation
      .redactPii(docs.toDF("doc_id", "text"))
      .select("doc_id", "n_email", "n_ip", "n_phone", "redacted")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got === want)
    assert(got.exists(_._5 == "from <IP> call <PHONE>"))
  }

  test("stateful transitions: N micro-batches == 1 batch == batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.TEv
    def ts(min: Long) = new java.sql.Timestamp((1440 + min) * 60000L)
    val evs = Seq(
      TEv(1, ts(0), 1, "view"), TEv(2, ts(5), 1, "click"),
      TEv(3, ts(6), 2, "view"),
      TEv(4, ts(20), 1, "purchase"), TEv(5, ts(21), 2, "click"),
      TEv(6, ts(22), 2, "view"))

    def run(batches: Seq[Seq[TEv]], name: String) = {
      val mem = MemoryStream[TEv]
      val q = EventStreams.statefulTransitions(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name)
        .groupBy("prev_type", "event_type").count()
        .collect().map(r => ((r.getString(0), r.getString(1)),
          r.getLong(2))).toMap
    }

    // the step (click→purchase for user 1, view→click for user 2)
    // straddles the batch-2 boundary — the ONE-row carried state must
    // emit it exactly once
    val split = run(Seq(evs.take(3), evs.drop(3)), "steps_split")
    val whole = run(Seq(evs), "steps_whole")
    assert(split == whole)

    val batchCounts = graft.operators.Behavior
      .markovTransitions(
        evs.toDF("event_id", "ts", "user_id", "event_type"),
        "user_id", "ts", "event_type", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2))).toMap
    assert(split == batchCounts)
  }

  test("stateful EWMA: N micro-batches equal one batch and the batch operator, bit-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.VEv
    def ts(min: Long) = new java.sql.Timestamp((1440 + min) * 60000L)
    val evs = Seq(
      VEv(1, ts(0), 1, 10.0), VEv(2, ts(5), 1, 20.0),
      VEv(3, ts(10), 1, 7.5), VEv(4, ts(2), 2, 3.0),
      VEv(5, ts(20), 2, 9.0))
    def run(chunks: Seq[Seq[VEv]]): Map[Long, (Long, Double)] = {
      val mem = MemoryStream[VEv]
      val q = EventStreams.statefulEwma(mem.toDS(), alpha = 0.125)
        .writeStream.format("memory")
        .queryName(s"ewma_${chunks.size}")
        .outputMode("update").start()
      try {
        chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      // last update per user wins (update mode emits one row per batch)
      spark.table(s"ewma_${chunks.size}")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("ewma"))).as("s"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getStruct(1).getLong(0),
          r.getStruct(1).getDouble(1)))).toMap
    }
    val one = run(Seq(evs))
    val three = run(Seq(evs.take(2), evs.slice(2, 4), evs.drop(4)))
    assert(one == three, "micro-batch boundaries must not move a bit")
    val batch = EventTime.ewmaByKey(
        evs.toDF("event_id", "ts", "user_id", "value"),
        "user_id", "ts", "event_id", "value", alpha = 0.125)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(one == batch, "stream must equal the batch operator bit-exactly")
  }

  test("statefulSessionCount drops regressive and redelivered arrivals " +
      "— counters cannot double and gaps cannot mis-split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.Ev
    def ts(min: Long) = new java.sql.Timestamp((1440 + min) * 60000L)
    val b1 = Seq(Ev(1, ts(0), 1), Ev(4, ts(5), 1))
    // a regressive equal-ts lower-id event + a duplicate of (ts(5), 4)
    // + one genuine arrival 10 minutes later (same session)
    val b2 = Seq(Ev(3, ts(5), 1), Ev(4, ts(5), 1), Ev(7, ts(15), 1))
    val mem = MemoryStream[Ev]
    val q = EventStreams.statefulSessionCount(mem.toDS())
      .writeStream.format("memory").queryName("sess_regr")
      .outputMode("update").start()
    try Seq(b1, b2).foreach { c => mem.addData(c); q.processAllAvailable() }
    finally q.stop()
    import org.apache.spark.sql.functions.{col, max, struct}
    val last = spark.table("sess_regr").groupBy(col("user_id"))
      .agg(max(struct(col("n_sessions"),
        col("current_session_events"))).as("s"))
      .head().getStruct(1)
    assert((last.getLong(0), last.getLong(1)) == ((1L, 3L)),
      s"admitted events are exactly ids 1,4,7 in one session: $last")
  }

  test("statefulTransitions drops cross-batch regressive arrivals and " +
      "redelivered duplicates — no phantom steps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.TEv
    def ts(min: Long) = new java.sql.Timestamp((1440 + min) * 60000L)
    val b1 = Seq(TEv(1, ts(0), 1, "view"), TEv(4, ts(5), 1, "click"))
    // batch 2: an equal-ts LOWER-id late event, an exact duplicate of
    // (ts(5), id=4), then one genuine arrival
    val b2 = Seq(TEv(3, ts(5), 1, "spurious"),
      TEv(4, ts(5), 1, "click"), TEv(7, ts(9), 1, "purchase"))
    val mem = MemoryStream[TEv]
    val q = EventStreams.statefulTransitions(mem.toDS())
      .writeStream.format("memory").queryName("steps_regr")
      .outputMode("append").start()
    try Seq(b1, b2).foreach { c => mem.addData(c); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("steps_regr")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq.sorted
    assert(got == Seq(("click", "purchase"), ("view", "click")),
      s"only the true chain may emit steps: $got")
  }

  test("stateful EWMA drops on the full (ts, event_id) order: an " +
      "equal-ts lower-id late arrival and a redelivered duplicate both " +
      "no-op (the statefulInterArrival contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.VEv
    def ts(min: Long) = new java.sql.Timestamp((1440 + min) * 60000L)
    // batch 1 folds (5, id=4); batch 2 carries an equal-ts LOWER-id
    // event (id=3 — regressive in the total order), an exact duplicate
    // of (5, id=4) (at-least-once redelivery), and one genuine arrival
    val b1 = Seq(VEv(1, ts(0), 1, 10.0), VEv(4, ts(5), 1, 20.0))
    val b2 = Seq(VEv(3, ts(5), 1, 99.0), VEv(4, ts(5), 1, 20.0),
      VEv(7, ts(9), 1, 8.0))
    def run(chunks: Seq[Seq[VEv]], nm: String): (Long, Double) = {
      val mem = MemoryStream[VEv]
      val q = EventStreams.statefulEwma(mem.toDS(), alpha = 0.125)
        .writeStream.format("memory").queryName(nm)
        .outputMode("update").start()
      try chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      finally q.stop()
      import org.apache.spark.sql.functions.{col, max, struct}
      spark.table(nm).groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("ewma"))).as("s"))
        .head().getStruct(1) match {
        case s => (s.getLong(0), s.getDouble(1))
      }
    }
    val got = run(Seq(b1, b2), "ewma_regr")
    // the admitted fold is exactly ids 1, 4, 7
    val expect = Seq(10.0, 20.0, 8.0).reduceLeft((a, x) =>
      a * (1.0 - 0.125) + x * 0.125)
    assert(got == ((3L, expect)),
      s"regressive/duplicate arrivals must not fold: $got")
  }

  test("statefulInterArrival: 1-batch = N-batch = batch operator, bit-exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max, struct}
    val t0 = 1700000000000L
    val evs = Seq(
      (1L, new java.sql.Timestamp(t0), 1L, 1.0),
      (2L, new java.sql.Timestamp(t0 + 60000), 1L, 1.0),
      (3L, new java.sql.Timestamp(t0 + 250000), 1L, 1.0),
      (4L, new java.sql.Timestamp(t0 + 10000), 2L, 1.0),
      (5L, new java.sql.Timestamp(t0 + 70000), 2L, 1.0))
      .map(e => EventStreams.VEv(e._1, e._2, e._3, e._4))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def run(chunks: Seq[Seq[EventStreams.VEv]]): Map[Long, (Long, Long, Long, Double)] = {
      val mem = MemoryStream[EventStreams.VEv]
      val q = EventStreams.statefulInterArrival(mem.toDS())
        .writeStream.format("memory")
        .queryName(s"gaps_${chunks.size}_${System.nanoTime()}")
        .outputMode("update").start()
      val name = q.name
      try {
        chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name)
        .filter(col("n_gaps") > 0)
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_gaps"), col("min_gap_us"),
          col("max_gap_us"), col("mean_gap_s"))).as("s"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getStruct(1).getLong(0),
          r.getStruct(1).getLong(1), r.getStruct(1).getLong(2),
          r.getStruct(1).getDouble(3)))).toMap
    }
    val one = run(Seq(evs))
    val three = run(Seq(evs.take(1), evs.slice(1, 3), evs.drop(3)))
    assert(one == three, "micro-batch boundaries must not move a bit")
    val batch = graft.operators.EventTime.interArrival(
        evs.toDF().selectExpr("user_id", "event_id",
          "unix_micros(ts) AS ts_us"),
        "user_id", "ts_us", "event_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(one == batch, "stream must equal the batch operator bit-exactly")
  }

  test("statefulInterArrival: regressive cross-batch arrival is dropped, " +
      "never folded as a negative gap; sub-ms ts is exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max, struct}
    val t0 = 1700000000000L
    def ts(ms: Long, nanos: Int): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(ms)
      t.setNanos(t.getNanos + nanos) // add sub-ms nanos on top
      t
    }
    // batch 1 delivers t0 and t0+120s; batch 2 delivers an in-watermark
    // event at t0+60s — retro-insertion is impossible with O(1) state,
    // so it must be DROPPED (not folded as gap = -60s)
    val b1 = Seq(
      EventStreams.VEv(1L, ts(t0, 250000), 1L, 1.0), // +250 µs sub-ms
      EventStreams.VEv(2L, ts(t0 + 120000, 0), 1L, 1.0))
    val b2 = Seq(EventStreams.VEv(3L, ts(t0 + 60000, 0), 1L, 1.0))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EventStreams.VEv]
    val q = EventStreams.statefulInterArrival(mem.toDS())
      .writeStream.format("memory")
      .queryName(s"gaps_regress_${System.nanoTime()}")
      .outputMode("update").start()
    val name = q.name
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val r = spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_gaps"), col("min_gap_us"),
        col("max_gap_us"), col("mean_gap_s"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val s = r(1L)
    // one admitted gap: (t0+120s) − (t0 + 250 µs) = 120s − 250 µs exact
    assert(s.getLong(0) == 1L, "regressive event must not add a gap")
    assert(s.getLong(1) == 120000000L - 250L,
      "sub-millisecond micros must be exact (unix_micros semantics)")
    assert(s.getLong(2) == 120000000L - 250L)
    assert(s.getDouble(3) > 0.0, "no negative-gap corruption")
  }
}
