package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** LazySimpleSerDe parsing contract (SURVEY.md §1.2): \N nulls, no quoting,
  * malformed numerics → NULL, round-trip stability. */
class TsvSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("\\N parses as NULL; quotes are data; malformed numeric → NULL") {
    val dir = Files.createTempDirectory("tsv_in")
    Files.writeString(dir.resolve("part-0.tsv"),
      "1\talice\t1.5\n" +
      "2\t\\N\t\\N\n" +
      "3\t\"quoted\"\t2.0\n" +   // quote char must be literal data
      "4\tbob\tnot_a_number\n")  // malformed double → NULL, not error
    val rows = TsvSource.read(spark, schema, dir.toString)
      .orderBy("id").collect()
    assert(rows(0) == Row(1L, "alice", 1.5))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).getString(1) == "\"quoted\"")
    assert(rows(3).getString(1) == "bob" && rows(3).isNullAt(2))
  }

  test("write → read round-trip preserves values incl. nulls and empties") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a"), Option(1.25)),
      (2L, None: Option[String], None: Option[Double]),
      (3L, Option(""), Option(-0.5))).toDF("id", "name", "score")
    val out = Files.createTempDirectory("tsv_rt").toString + "/t"
    TsvSource.write(df, out)
    val back = TsvSource.read(spark, StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType))), out)
      .orderBy("id").collect()
    assert(back(0) == Row(1L, "a", 1.25))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2))
    // LazySimpleSerDe cannot distinguish empty string from... empty string;
    // it is NOT null (null is \N)
    assert(back(2).getString(1) == "" && back(2).getDouble(2) == -0.5)
  }

  test("schema evolution: short rows pad NULL, long rows drop extras") {
    // LazySimpleSerDe's positional contract — the reference's requests
    // table accumulates raw files ACROSS schema versions, so a widened
    // schema must read old (narrower) files exactly as Athena does:
    // missing trailing columns are NULL, never an error (ANSI
    // element_at would throw out-of-bounds), and a file with MORE
    // columns than the schema ignores the extras.
    val dir = Files.createTempDirectory("tsv_evo")
    Files.writeString(dir.resolve("part-0.tsv"),
      "1\talice\n" +                  // v1 row: no score column yet
      "2\tbob\t2.5\n" +               // v2 row: full width
      "3\tcara\t3.5\textra\tmore\n")  // wider than schema: extras ignored
    val rows = TsvSource.read(spark, schema, dir.toString)
      .orderBy("id").collect()
    assert(rows(0) == Row(1L, "alice", null))
    assert(rows(1) == Row(2L, "bob", 2.5))
    assert(rows(2) == Row(3L, "cara", 3.5))
  }

  test("globEscape: a file named with glob metacharacters reads " +
      "exactly — not a sibling the glob would silently match") {
    val dir = Files.createTempDirectory("tsv_glob")
    // the glob `data[1].tsv` matches THIS sibling, so an unescaped
    // read of the bracket-named file silently returns wrong data
    Files.writeString(dir.resolve("data1.tsv"), "99\tsibling\t0.0\n")
    Files.writeString(dir.resolve("data[1].tsv"), "1\treal\t1.5\n")
    val escaped = s"${dir.toString}/${TsvSource.globEscape("data[1].tsv")}"
    val rows = TsvSource.read(spark, schema, Seq(escaped)).collect()
    assert(rows.toSeq == Seq(Row(1L, "real", 1.5)),
      s"escaped read must hit the literal file: ${rows.toSeq}")
    // and the escape is a no-op on ordinary names
    assert(TsvSource.globEscape("2024-01-02/events-0001.tsv.gz") ==
      "2024-01-02/events-0001.tsv.gz")
    assert(TsvSource.globEscape("a[b]{c}*?\\.tsv") ==
      "a\\[b\\]\\{c\\}\\*\\?\\\\.tsv")
  }

  test("gzip output is whole-file compressed (reference layout)") {
    import spark.implicits._
    val out = Files.createTempDirectory("tsv_gz").toString + "/t"
    TsvSource.write(Seq((1L, "x")).toDF("a", "b"), out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".gz"))
    assert(files.nonEmpty, "expected gzip part files")
  }
}
