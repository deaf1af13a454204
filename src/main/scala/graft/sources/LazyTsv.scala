package graft.sources.lazytsv

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, SchemaRelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

import graft.sources.TsvSource

/** Data source (`USING graft.sources.lazytsv`) exposing the exact
  * LazySimpleSerDe TSV semantics of [[graft.sources.TsvSource.read]] to
  * catalog tables, so `spark.table(name)` and the programmatic read path
  * return identical rows — in particular, an unquoted empty field is an
  * empty STRING, not NULL (Spark's builtin CSV reader collapses it to
  * NULL, which is why `USING CSV` can't be the catalog format; reference
  * SerDe declaration: `sync-canvas-data-files.py:193-202`).
  *
  * DSv1 `TableScan` is the right altitude here: the underlying files are
  * whole-file gzip TSV — non-splittable, no column pruning or filter
  * pushdown to gain — and the scan simply delegates to the shared text
  * scan + split + try_cast projection, which runs in whole-stage codegen.
  * The catalog supplies the pushed schema (never inferred), matching the
  * reference's schema-push model.
  */
class DefaultSource extends SchemaRelationProvider with DataSourceRegister {
  override def shortName(): String = "lazytsv"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "lazytsv requires a path (LOCATION or option(\"path\", ...))"))
    LazyTsvRelation(sqlContext, path, schema)
  }
}

case class LazyTsvRelation(
    sqlContext: SQLContext, path: String, userSchema: StructType)
  extends BaseRelation with TableScan {

  override def schema: StructType = userSchema

  override def buildScan(): RDD[Row] =
    TsvSource.read(sqlContext.sparkSession, userSchema, path).rdd
}
