package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.model.{CDColumn, CDTable}

class ValidateRawSpec extends SparkSpec {

  test("validateRaw flags files whose lines don't match the pushed schema") {
    val wh = Files.createTempDirectory("val_wh")
    val dir = wh.resolve("raw_files/t")
    Files.createDirectories(dir)
    // good file: 3 fields per line (current schema)
    Files.writeString(dir.resolve("new.tsv"), "1\ta\t2.0\n2\tb\t3.5\n")
    // stale file: 2 fields per line (pre-evolution schema)
    Files.writeString(dir.resolve("old.tsv"), "1\ta\n2\tb\n3\tc\n")
    val t = CDTable("t", None, Seq(
      CDColumn("id", "bigint"), CDColumn("name", "text"),
      CDColumn("score", "double precision")))
    val byFile = Canonicalize.validateRaw(spark,
        wh.toUri.toString.stripSuffix("/"), t)
      .collect()
      .map(r => r.getString(0).split("/").last ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_malformed"))).toMap
    assert(byFile("new.tsv") == (2L, 0L))
    assert(byFile("old.tsv") == (3L, 3L))
  }
}
