package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The CD1 → Spark type lattice (`sync-canvas-data-files.py:150-167`),
  * exhaustively + property tested. */
class TypeLatticeSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def m(t: String, len: Option[Int] = None) =
    TypeLattice.toSpark(CDColumn("c", t, len))

  test("the exact reference lattice") {
    assert(m("text") == StringType)
    assert(m("enum") == StringType)
    assert(m("guid") == StringType)
    assert(m("varchar", Some(36)) == VarcharType(36))
    assert(m("varchar") == StringType)          // no length → string (:158)
    assert(m("varchar", Some(0)) == StringType)
    assert(m("double precision") == DoubleType)
    assert(m("integer") == IntegerType)
    assert(m("datetime") == TimestampType)
    // pass-through types (:166-167)
    assert(m("bigint") == LongType)
    assert(m("boolean") == BooleanType)
    assert(m("date") == DateType)
    assert(m("timestamp") == TimestampType)
  }

  test("DDL emission keeps varchar length") {
    assert(TypeLattice.toDdl(CDColumn("c", "varchar", Some(12))) == "varchar(12)")
    assert(TypeLattice.toDdl(CDColumn("c", "text")) == "string")
  }

  test("total function: never throws on arbitrary type strings") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.option(Gen.choose(-5, 500))) {
      (t: String, len: Option[Int]) =>
        TypeLattice.toSpark(CDColumn("c", t, len)) != null
    })
  }

  test("struct emission: comments carried, varchar reads as string") {
    val st = TypeLattice.toStructType(CDTable("tbl", None, Seq(
      CDColumn("a", "varchar", Some(5), Some("a comment")),
      CDColumn("b", "integer", None, None))))
    assert(st.fields(0).dataType == StringType)
    assert(st.fields(0).getComment().contains("a comment"))
    assert(st.fields(1).dataType == IntegerType)
  }
}
