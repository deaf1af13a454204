package graft.catalog

import org.apache.spark.sql.SparkSession

import graft.model.{CDTable, TypeLattice}

/** Catalog upsert (SURVEY.md §2A A12): the reference's
  * `create_or_update_table` (`sync-canvas-data-files.py:170-235`) builds a
  * Glue external-table descriptor — location, TSV SerDe, typed columns with
  * comments — and create-or-updates it. Here the catalog is the Spark
  * session catalog and the descriptor is `CREATE TABLE ... USING CSV`.
  *
  * Semantics preserved:
  *  - full-replace upsert: create, and on AlreadyExists re-push the whole
  *    definition (the reference calls `update_table` with a fresh
  *    TableInput, `:229-235`) — implemented as DROP + CREATE, which is what
  *    full-replace means without Glue's versioning;
  *  - column and table comments carried (`:172,206-216`);
  *  - schema evolution = next sync pushes the new definition; files under
  *    a changed schema mis-parse the same way they would in Athena.
  */
object CatalogSync {

  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** Quote/escape a comment for DDL. */
  private def q(s: String): String = s.replace("'", "''")

  /** Build the CREATE TABLE statement for a CD table over a TSV location —
    * the analog of the reference's TableInput dict (`:174-218`). */
  def createTableDdl(db: String, t: CDTable, location: String): String = {
    val cols = t.columns.map { c =>
      val comment = c.description
        .map(d => s" COMMENT '${q(d.take(254))}'").getOrElse("")
      s"  `${c.name}` ${TypeLattice.toDdl(c)}$comment"
    }.mkString(",\n")
    val tblComment = t.description
      .map(d => s"\nCOMMENT '${q(d.take(254))}'").getOrElse("")
    s"""CREATE TABLE `$db`.`${t.tableName}` (
       |$cols
       |)
       |USING CSV
       |OPTIONS (
       |  sep '\\t',
       |  nullValue '\\\\N',
       |  quote '\\u0000',
       |  header 'false',
       |  mode 'PERMISSIVE'
       |)$tblComment
       |LOCATION '$location'""".stripMargin
  }

  /** Create-or-update, returning "created" | "updated" exactly like the
    * reference (`:227,234`). */
  def createOrUpdateTable(
      spark: SparkSession, db: String, t: CDTable, location: String): String = {
    ensureDatabase(spark, db)
    val exists = spark.catalog.tableExists(s"`$db`.`${t.tableName}`")
    if (exists) {
      spark.sql(s"DROP TABLE `$db`.`${t.tableName}`")
      spark.sql(createTableDdl(db, t, location))
      "updated"
    } else {
      spark.sql(createTableDdl(db, t, location))
      "created"
    }
  }
}
