package graft.catalog

import graft.SparkSpec
import graft.model.{CDColumn, CDTable}

class CatalogSyncSpec extends SparkSpec {

  private val t = CDTable("course_dim", Some("canvas courses"), Seq(
    CDColumn("id", "bigint", None, Some("primary key")),
    CDColumn("name", "varchar", Some(256), Some("course name")),
    CDColumn("created_at", "datetime")))

  test("DDL carries types, comments, location, TSV options") {
    val ddl = CatalogSync.createTableDdl("cd", t, "/tmp/wh/raw_files/course_dim")
    assert(ddl.contains("`id` bigint COMMENT 'primary key'"))
    assert(ddl.contains("`name` varchar(256)"))
    assert(ddl.contains("`created_at` timestamp"))
    assert(ddl.contains("USING CSV"))
    assert(ddl.contains("nullValue '\\\\N'"))
    assert(ddl.contains("COMMENT 'canvas courses'"))
    assert(ddl.contains("LOCATION '/tmp/wh/raw_files/course_dim'"))
  }

  test("upsert returns created then updated (full-replace semantics)") {
    val loc = java.nio.file.Files.createTempDirectory("cat_loc").toString
    assert(CatalogSync.createOrUpdateTable(spark, "cd_cat", t, loc) == "created")
    assert(CatalogSync.createOrUpdateTable(spark, "cd_cat", t, loc) == "updated")
    // evolved schema is fully replaced
    val evolved = t.copy(columns = t.columns :+ CDColumn("extra", "integer"))
    assert(CatalogSync.createOrUpdateTable(spark, "cd_cat", evolved, loc)
      == "updated")
    val cols = spark.table("cd_cat.course_dim").schema.fieldNames.toSeq
    assert(cols == Seq("id", "name", "created_at", "extra"))
  }

  test("escaped quotes in comments don't break DDL") {
    val tricky = t.copy(description = Some("it's a 'test'"))
    val loc = java.nio.file.Files.createTempDirectory("cat_loc2").toString
    assert(CatalogSync.createOrUpdateTable(spark, "cd_cat2", tricky, loc)
      == "created")
  }
}
