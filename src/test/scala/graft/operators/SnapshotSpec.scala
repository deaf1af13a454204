package graft.operators

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val prev = Seq(
      (1L, Some("a"), 10.0), // unchanged
      (2L, Some("b"), 20.0), // value change
      (3L, None: Option[String], 30.0), // null → value change
      (4L, Some("d"), 40.0), // removed
      (6L, None: Option[String], 60.0) // null → null unchanged
    ).toDF("k", "s", "x")
    val cur = Seq(
      (1L, Some("a"), 10.0),
      (2L, Some("B"), 20.0),
      (3L, Some("c"), 30.0),
      (5L, Some("e"), 50.0), // added
      (6L, None: Option[String], 60.0)
    ).toDF("k", "s", "x")
    val d = Snapshot.snapshotDiff(prev, cur, Seq("k"), Seq("s", "x"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.getString(2)), Option(r.getString(4)))).toMap
    assert(d.keySet == Set(2L, 3L, 4L, 5L))
    assert(d(2L) == (("changed", Some("b"), Some("B"))))
    assert(d(3L) == (("changed", None, Some("c"))))
    // audit columns carry NULL on the absent side
    assert(d(4L) == (("removed", Some("d"), None)))
    assert(d(5L) == (("added", None, Some("e"))))
  }

  test("snapshotDiff with no compare columns is a pure key diff") {
    import spark.implicits._
    val prev = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val cur = Seq((2L, "DIFFERENT"), (3L, "z")).toDF("k", "v")
    val d = Snapshot.snapshotDiff(prev, cur, Seq("k"), Nil)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // v differs for key 2 but is not compared — only presence counts
    assert(d == Set((1L, "removed"), (3L, "added")))
  }

  test("composite keys diff independently per key tuple") {
    import spark.implicits._
    val prev = Seq(("a", 1L, 10), ("a", 2L, 20)).toDF("p", "k", "v")
    val cur = Seq(("a", 1L, 11), ("b", 2L, 20)).toDF("p", "k", "v")
    val d = Snapshot.snapshotDiff(prev, cur, Seq("p", "k"), Seq("v"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getString(2)))
      .toMap
    assert(d == Map(("a", 1L) -> "changed", ("a", 2L) -> "removed",
      ("b", 2L) -> "added"))
  }
}
