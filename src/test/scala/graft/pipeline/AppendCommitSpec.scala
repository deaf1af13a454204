package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Ledger compaction contract of [[AppendCommit]]: entries survive any
  * interleaving of compaction, crashed compaction, and new appends —
  * and the ledger's file count stays bounded under unbounded batches. */
class AppendCommitSpec extends AnyFunSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("ledger").toString + "/store"

  private def ledgerFiles(root: String): Seq[String] = {
    val d = new java.io.File(s"$root/_applied")
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq.map(_.getName).filterNot(_.endsWith(".crc"))
  }

  test("compaction preserves every entry, payload-exact, and isApplied") {
    val root = tmpRoot()
    val entries = (1 to 20).map(i => s"b$i" -> s"payload\twith\nnewline-$i")
    entries.foreach { case (id, p) => AppendCommit.markApplied(root, id, p) }
    assert(AppendCommit.compactLedger(root) == 20)
    // all per-batch files folded into exactly one compacted generation
    assert(ledgerFiles(root) == Seq("_compacted_1"))
    assert(entries.forall { case (id, _) => AppendCommit.isApplied(root, id) })
    assert(!AppendCommit.isApplied(root, "b21"))
    assert(AppendCommit.appliedEntries(root).toMap == entries.toMap,
      "payloads (incl. tabs/newlines) must survive compaction byte-exact")
    // idempotent: a second compaction with nothing to fold is a no-op
    assert(AppendCommit.compactLedger(root) == 20)
    assert(ledgerFiles(root) == Seq("_compacted_1"))
  }

  test("appends after compaction land plain and fold into the next generation") {
    val root = tmpRoot()
    (1 to 5).foreach(i => AppendCommit.markApplied(root, s"x$i", s"v$i"))
    AppendCommit.compactLedger(root)
    AppendCommit.markApplied(root, "x6", "v6")
    assert(ledgerFiles(root).toSet == Set("_compacted_1", "x6"))
    assert(AppendCommit.isApplied(root, "x3") && AppendCommit.isApplied(root, "x6"))
    assert(AppendCommit.compactLedger(root) == 6)
    assert(ledgerFiles(root) == Seq("_compacted_2"))
    assert(AppendCommit.appliedEntries(root).toMap ==
      (1 to 6).map(i => s"x$i" -> s"v$i").toMap)
  }

  test("a crashed compaction (entry both compacted and plain) reads exact and heals") {
    val root = tmpRoot()
    (1 to 4).foreach(i => AppendCommit.markApplied(root, s"c$i", s"p$i"))
    AppendCommit.compactLedger(root)
    // crash simulation: generation 1 was placed but the source deletes
    // never ran — recreate a plain duplicate and a stale tmp
    AppendCommit.markApplied(root, "c2", "p2")
    Files.write(java.nio.file.Paths.get(s"$root/_applied/._compacted_9.tmp"),
      "junk".getBytes("UTF-8"))
    assert(AppendCommit.appliedEntries(root).toMap ==
      (1 to 4).map(i => s"c$i" -> s"p$i").toMap,
      "duplicate compacted+plain entries must read as one")
    assert(AppendCommit.compactLedger(root) == 4)
    assert(ledgerFiles(root).filterNot(_.startsWith(".")) == Seq("_compacted_2"))
  }

  test("ledger file count stays bounded across AutoCompactAt-many appends") {
    val root = tmpRoot()
    (1 to AppendCommit.AutoCompactAt + 3).foreach(i =>
      AppendCommit.markApplied(root, s"s$i"))
    val files = ledgerFiles(root)
    assert(files.size < AppendCommit.AutoCompactAt,
      s"auto-compaction must have folded the ledger, saw ${files.size} files")
    assert((1 to AppendCommit.AutoCompactAt + 3).forall(i =>
      AppendCommit.isApplied(root, s"s$i")))
  }

  test("cumulativeFingerprint classifies by id NAMESPACE: covered " +
      "markers skip whatever their payload looks like; a malformed " +
      "content entry throws instead of silently dropping") {
    val root = tmpRoot()
    new java.io.File(root).mkdirs()
    Files.writeString(java.nio.file.Paths.get(root, "_corpus_fingerprint"),
      "10|100|k=1")
    AppendCommit.markApplied(root, "ab12cd34", "5|7")
    // a FreshFold covered marker whose FILE-LIST payload happens to
    // match the n|h shape — by-namespace classification must skip it
    // (the old payload-shape sniffing would have summed it)
    AppendCommit.markApplied(root, s"${FreshFold.Tag}deadbeef", "3|9")
    AppendCommit.markApplied(root, "files-feed1234", "f1\nf2")
    AppendCommit.markApplied(root, "rawfile-x.gz", "")
    AppendCommit.markApplied(root, "stream-7")
    assert(AppendCommit.cumulativeFingerprint(root)
      == Some("15|107|k=1"))
    // an unregistered-namespace entry with a non-fingerprint payload is
    // a contract violation — loud, never a wrong cumulative count
    AppendCommit.markApplied(root, "mystery99", "not-a-fingerprint")
    intercept[Exception] { AppendCommit.cumulativeFingerprint(root) }
  }

  test("hidden or path-hostile batch ids are rejected") {
    val root = tmpRoot()
    intercept[IllegalArgumentException](AppendCommit.markApplied(root, "_x"))
    intercept[IllegalArgumentException](AppendCommit.markApplied(root, ".x"))
    intercept[IllegalArgumentException](AppendCommit.markApplied(root, "a/b"))
    intercept[IllegalArgumentException](AppendCommit.markApplied(root, ""))
  }
}
