package graft.model

import org.apache.spark.sql.types._

/** Schema model for the warehouse: mirrors the shape the reference consumes
  * from the Canvas Data API (`sync-canvas-data-files.py:172-216` reads
  * `tableName`, `description`, `columns[].{name,type,length,description}`).
  * The engine is schema-agnostic — nothing anywhere hard-codes a table or
  * column name; everything flows from this model, exactly like the
  * reference's dynamic catalog push.
  */
final case class CDColumn(
    name: String,
    dataType: String,
    length: Option[Int] = None,
    description: Option[String] = None)

final case class CDTable(
    tableName: String,
    description: Option[String],
    columns: Seq[CDColumn])

object TypeLattice {
  /** The reference's full CD1 → engine type lattice
    * (`sync-canvas-data-files.py:150-167`), mapped to Spark types:
    * text/enum/guid → string; varchar(n) kept as varchar(n) in DDL;
    * double precision → double; integer → int; datetime → timestamp;
    * anything else passes through verbatim (bigint, boolean, date, ...).
    * Total function: unknown strings fall back to StringType rather than
    * throwing — the reference would emit them verbatim into DDL and fail
    * at query time; we degrade to string, which LazySimpleSerDe semantics
    * make lossless. */
  def toSpark(c: CDColumn): DataType = c.dataType.toLowerCase match {
    case "text" | "enum" | "guid" => StringType
    case "varchar" =>
      c.length match {
        case Some(n) if n > 0 => VarcharType(n)
        case _ => StringType
      }
    case "double precision" => DoubleType
    case "integer" => IntegerType
    case "datetime" => TimestampType
    case other =>
      try DataType.fromDDL(other)
      catch { case _: Throwable => StringType }
  }

  /** DDL string form (what the reference writes into Glue TableInput). */
  def toDdl(c: CDColumn): String = toSpark(c) match {
    case v: VarcharType => s"varchar(${v.length})"
    case dt => dt.simpleString
  }

  /** StructType with comments carried as metadata, mirroring the
    * reference's `Comment` fields (truncated at 254 chars there — we keep
    * them whole but tolerate truncated input). */
  def toStructType(t: CDTable): StructType =
    StructType(t.columns.map { c =>
      val base = StructField(c.name, toSpark(c) match {
        // Spark reads varchar back as string; keep read schema concrete
        case _: VarcharType => StringType
        case dt => dt
      })
      c.description.fold(base)(base.withComment)
    })
}
