package graft

import java.nio.file.Files

import graft.model.{CDColumn, CDTable}
import graft.pipeline.Sync.ManifestEntry

/** End-to-end "reference user" scenario: sync a two-table extract, then run
  * analyst SQL (a join + aggregate) against the catalog — the full
  * migration surface in one test. */
class WarehouseSpec extends SparkSpec {

  test("sync then analyst SQL across synced tables") {
    val src = Files.createTempDirectory("wh_src")
    def put(table: String, name: String, content: String): ManifestEntry = {
      val d = src.resolve(table); Files.createDirectories(d)
      val f = d.resolve(name); Files.writeString(f, content)
      ManifestEntry(table, name, f.toUri.toString)
    }
    val manifest = Seq(
      put("course_dim", "c1.tsv",
        "1\tIntro Spark\t10\n2\tAdvanced SQL\t20\n3\t\\N\t10\n"),
      put("enrollment_fact", "e1.tsv",
        "1\t100\n1\t101\n2\t100\n2\t102\n2\t103\n3\t104\n"))
    val schema = Seq(
      CDTable("course_dim", Some("courses"), Seq(
        CDColumn("id", "bigint"),
        CDColumn("name", "varchar", Some(100)),
        CDColumn("account_id", "integer"))),
      CDTable("enrollment_fact", None, Seq(
        CDColumn("course_id", "bigint"),
        CDColumn("user_id", "bigint"))))

    val whDir = Files.createTempDirectory("wh_root").toUri.toString
      .stripSuffix("/")
    val notified = scala.collection.mutable.ArrayBuffer
      .empty[pipeline.Sync.SyncSummary]
    val wh = new Warehouse(spark,
      Warehouse.Config(whDir, db = "cd_wh", parallelism = 2,
        canonicalize = true, onSummary = notified += _))
    val s1 = wh.sync(manifest, schema)
    assert(s1.fetched == 2 && s1.tablesCreated == 2)
    // the notification hook (SNS analog) fired with the run's counts
    assert(notified.toSeq == Seq(s1))

    val res = wh.sql(
      """SELECT c.account_id, COUNT(*) AS n_enrollments,
        |       COUNT(DISTINCT e.user_id) AS n_users
        |FROM cd_wh.enrollment_fact e
        |JOIN cd_wh.course_dim c ON e.course_id = c.id
        |GROUP BY c.account_id
        |ORDER BY c.account_id""".stripMargin).collect()
    assert(res.length == 2)
    assert(res(0).getInt(0) == 10 && res(0).getLong(1) == 3L) // courses 1+3
    assert(res(1).getInt(0) == 20 && res(1).getLong(1) == 3L) // course 2
    assert(res(1).getLong(2) == 3L)

    // canonical layer carries the same rows
    assert(wh.canonicalTable("enrollment_fact").count() == 6L)
    // second sync is a no-op on data, full-replace on catalog
    val s2 = wh.sync(manifest, schema)
    assert(s2.fetched == 0 && s2.skipped == 2 && s2.tablesUpdated == 2)
    assert(notified.toSeq == Seq(s1, s2))
  }
}
