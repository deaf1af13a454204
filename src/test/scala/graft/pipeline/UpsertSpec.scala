package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class UpsertSpec extends SparkSpec {

  test("mergeInto replaces matched keys, inserts new, carries the rest") {
    import spark.implicits._
    val path = Files.createTempDirectory("upsert").toString + "/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score").write.parquet(path)

    val updates = Seq((2L, "b2", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "score")
    val s = Upsert.mergeInto(spark, path, updates, Seq("id"))
    assert(s.updated == 1L && s.inserted == 1L && s.total == 4L)

    val rows = spark.read.parquet(path).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))

    // idempotent: re-merging the same updates changes nothing
    val s2 = Upsert.mergeInto(spark, path, updates, Seq("id"))
    assert(s2.updated == 2L && s2.inserted == 0L && s2.total == 4L)
    val rows2 = spark.read.parquet(path).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows2.sameElements(rows))
  }

  test("mergeInto rejects schema mismatch") {
    import spark.implicits._
    val path = Files.createTempDirectory("upsert2").toString + "/t"
    Seq((1L, "a")).toDF("id", "name").write.parquet(path)
    intercept[IllegalArgumentException] {
      Upsert.mergeInto(spark, path,
        Seq((1L, 2.0)).toDF("id", "other"), Seq("id"))
    }
  }
}
