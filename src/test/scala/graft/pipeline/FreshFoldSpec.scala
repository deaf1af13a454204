package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class FreshFoldSpec extends SparkSpec {

  private def store(): String =
    Files.createTempDirectory("freshfold").toString + "/s"

  test("all fresh files fold in one batch; replay is a no-op") {
    val s = store()
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val n = FreshFold.foldFresh(s, Seq("a", "b", "c")) { (files, id) =>
      calls += files
      AppendCommit.markApplied(s, id, "") // what JoinView.merge does
    }
    assert(n == 3 && calls.toSeq == Seq(Seq("a", "b", "c")),
      "three fresh files must be ONE fold call")
    assert(FreshFold.covered(s) == Set("a", "b", "c"))
    val n2 = FreshFold.foldFresh(s, Seq("a", "b", "c")) { (_, _) =>
      fail("nothing fresh — fold must not run")
    }
    assert(n2 == 0)
    // growth folds only the delta, as a second single batch
    val n3 = FreshFold.foldFresh(s, Seq("a", "b", "c", "d", "e")) {
      (files, _) => calls += files
    }
    assert(n3 == 2 && calls.last == Seq("d", "e"))
    assert(FreshFold.covered(s) == Set("a", "b", "c", "d", "e"))
  }

  test("crash between fold-commit and covered-marker: the pinned set " +
      "completes under its ORIGINAL id — listing growth cannot double-fold") {
    val s = store()
    // attempt 1 "crashes": the fold itself committed (content id in the
    // ledger, as JoinView.merge/appendTo* do) but the covered marker
    // never landed — simulated by throwing from inside foldFresh after
    // the inner commit
    intercept[RuntimeException] {
      FreshFold.foldFresh(s, Seq("a", "b")) { (_, id) =>
        AppendCommit.markApplied(s, id, "") // inner commit survived
        throw new RuntimeException("crash before covered-marker")
      }
    }
    assert(FreshFold.pendingIntent(s).contains(Seq("a", "b")),
      "the intent must pin the crashed batch")
    // retry arrives with a GROWN listing; the fold body must NOT re-run
    // for the pinned set (its content id is applied) and must run once
    // for the true delta
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val n = FreshFold.foldFresh(s, Seq("a", "b", "c")) { (files, id) =>
      calls += files
      AppendCommit.markApplied(s, id, "")
    }
    assert(calls.toSeq == Seq(Seq("c")),
      s"pinned a,b must complete without re-folding; got $calls")
    assert(n == 1)
    assert(FreshFold.covered(s) == Set("a", "b", "c"))
    assert(FreshFold.pendingIntent(s).isEmpty)
  }

  test("crash BEFORE the fold commits: retry re-runs the pinned set verbatim") {
    val s = store()
    intercept[RuntimeException] {
      FreshFold.foldFresh(s, Seq("x", "y")) { (_, _) =>
        throw new RuntimeException("crash before any commit")
      }
    }
    assert(FreshFold.pendingIntent(s).contains(Seq("x", "y")))
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    // listing grew to x,y,z — the pinned batch must still fold as
    // exactly {x,y} (deterministic id), then {z} separately
    FreshFold.foldFresh(s, Seq("x", "y", "z")) { (files, id) =>
      calls += files
      AppendCommit.markApplied(s, id, "")
    }
    assert(calls.toSeq == Seq(Seq("x", "y"), Seq("z")),
      s"got $calls")
    assert(FreshFold.covered(s) == Set("x", "y", "z"))
  }

  test("legacyTag empty: bare file-name ids (pre-batch view ledgers) " +
      "count as covered — an upgrade must not re-fold history") {
    val s = store()
    AppendCommit.markApplied(s, "f1.tsv", "")
    AppendCommit.markApplied(s, "f2.tsv", "")
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    FreshFold.foldFresh(s, Seq("f1.tsv", "f2.tsv", "f3.tsv"),
        legacyTag = "") { (files, id) =>
      calls += files
      AppendCommit.markApplied(s, id, "")
    }
    assert(calls.toSeq == Seq(Seq("f3.tsv")),
      s"legacy-covered files must not re-fold, got $calls")
    assert(FreshFold.covered(s, legacyTag = "")
      .contains("f1.tsv"))
  }

  test("randomized crash injection: every file folds EXACTLY once under " +
      "arbitrary crash points and listing growth") {
    case object Crash extends RuntimeException("injected crash")
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val s = store()
      // a fold "commits" when markApplied lands (the JoinView.merge
      // shape); `committed` records every commit that survived
      val committed = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var all = Seq.empty[String]
      var next = 0
      for (_ <- 1 to 8) {
        all = all ++ (0 until 1 + rnd.nextInt(3)).map { _ =>
          next += 1; s"f$next"
        }
        val crashPre = rnd.nextInt(4) == 0  // before the data commit
        val crashPost = rnd.nextInt(4) == 0 // after commit, pre-marker
        try {
          FreshFold.foldFresh(s, all) { (files, id) =>
            if (crashPre) throw Crash
            AppendCommit.markApplied(s, id, "")
            committed += files
            if (crashPost) throw Crash
          }
        } catch { case Crash => () }
      }
      // a final healthy refresh must converge whatever happened
      FreshFold.foldFresh(s, all) { (files, id) =>
        AppendCommit.markApplied(s, id, "")
        committed += files
      }
      assert(FreshFold.covered(s) == all.toSet,
        s"trial $trial: covered ${FreshFold.covered(s)} != $all")
      val flat = committed.flatten
      assert(flat.size == flat.distinct.size,
        s"trial $trial: a file was folded twice: " +
          flat.groupBy(identity).filter(_._2.size > 1).keys)
      assert(flat.toSet == all.toSet,
        s"trial $trial: missed files ${all.toSet -- flat.toSet}")
      assert(FreshFold.pendingIntent(s).isEmpty)
    }
  }

  test("intent writes land via temp+rename: a stale crashed temp never " +
      "wedges the next refresh, and no temp survives a clean fold") {
    val s = store()
    // a crashed earlier writeIntent left a garbage temp — the next
    // refresh must ignore it (it is NOT the intent) and overwrite it
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s), new org.apache.hadoop.conf.Configuration())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s))
    val tmp = new org.apache.hadoop.fs.Path(s, "._fold_intent.tmp")
    val os = fs.create(tmp, true)
    os.write("garbage/truncated/pa".getBytes("UTF-8")); os.close()
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val n = FreshFold.foldFresh(s, Seq("a", "b")) { (files, id) =>
      calls += files
      AppendCommit.markApplied(s, id, "")
    }
    assert(n == 2 && calls.toSeq == Seq(Seq("a", "b")),
      "the garbage temp must not be mistaken for a pinned intent")
    assert(!fs.exists(tmp), "a clean fold leaves no temp behind")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s, "_fold_intent")),
      "a completed fold leaves no pinned intent")
  }

  test("newline-hostile filenames round-trip the covered set and the " +
      "intent — a fragment never marks an innocent file as folded") {
    val s = store()
    val evil = "evil\nold.tsv" // legal on POSIX; manifest-controlled
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    def fold(files: Seq[String], id: String): Unit = {
      calls += files
      AppendCommit.markApplied(s, id, "")
    }
    FreshFold.foldFresh(s, Seq(evil))(fold)
    assert(FreshFold.covered(s) == Set(evil),
      "the covered set must hold the exact name, not its fragments")
    // written raw, the payload fragment "old.tsv" would mark THIS
    // innocent file as already folded — silent missing data
    FreshFold.foldFresh(s, Seq(evil, "old.tsv"))(fold)
    assert(calls.toSeq == Seq(Seq(evil), Seq("old.tsv")),
      s"the innocent fragment-named file must fold: $calls")
    // a crashed intent pinning a newline name must replay verbatim
    intercept[RuntimeException] {
      FreshFold.foldFresh(s, Seq(evil, "old.tsv", "evil2\nx.tsv")) {
        (_, _) => throw new RuntimeException("crash pre-commit")
      }
    }
    assert(FreshFold.pendingIntent(s).contains(Seq("evil2\nx.tsv")),
      "the pinned intent must decode back to the exact name")
    FreshFold.foldFresh(s, Seq(evil, "old.tsv", "evil2\nx.tsv"))(fold)
    assert(calls.last == Seq("evil2\nx.tsv"))
    assert(FreshFold.covered(s) ==
      Set(evil, "old.tsv", "evil2\nx.tsv"))
  }

  test("legacy RAW covered payloads read VERBATIM — a legacy name " +
      "containing a literal codec triplet must not decode into a " +
      "different name") {
    val s = store()
    // a pre-codec writer stored this payload raw; the name legally
    // contains the literal three characters '%0A' (URL-encoded
    // upstream data) — decoding it would yield "weird\nname.tsv",
    // un-covering the real file (re-fold = double-count) and covering
    // a phantom
    AppendCommit.markApplied(s, FreshFold.Tag + "legacy1",
      "weird%0Aname.tsv\nplain.tsv")
    assert(FreshFold.covered(s) == Set("weird%0Aname.tsv", "plain.tsv"),
      "headerless payloads are legacy-raw: lines verbatim")
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    FreshFold.foldFresh(s,
        Seq("weird%0Aname.tsv", "plain.tsv", "new.tsv")) { (files, id) =>
      calls += files
      AppendCommit.markApplied(s, id, "")
    }
    assert(calls.toSeq == Seq(Seq("new.tsv")),
      s"legacy-covered names must not re-fold: $calls")
    // and a NEW payload written for a literal-'%0A' name round-trips
    // through the header format
    assert(FreshFold.covered(s).contains("weird%0Aname.tsv"))
  }

  test("legacy per-file rawfile- markers count as covered") {
    val s = store()
    AppendCommit.markApplied(s, "rawfile-old1.tsv", "")
    AppendCommit.markApplied(s, "rawfile-old2.tsv", "")
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    FreshFold.foldFresh(s, Seq("old1.tsv", "old2.tsv", "new.tsv")) {
      (files, _) => calls += files
    }
    assert(calls.toSeq == Seq(Seq("new.tsv")),
      "files covered by the pre-batch protocol must not re-fold")
  }
}
