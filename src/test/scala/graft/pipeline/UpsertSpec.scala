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
  test("scd2Merge folds versions; as-of reads reconstruct every snapshot") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "val")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "val") // 3 del
    val v3 = Seq((1L, "A"), (2L, "B"), (4L, "d")).toDF("k", "val")
    val h1 = v1.withColumn("valid_from", lit(1L))
      .withColumn("valid_to", lit(null).cast("long"))
    val h2 = Upsert.scd2Merge(h1, v2, Seq("k"), version = 2L)
    val h3 = Upsert.scd2Merge(h2, v3, Seq("k"), version = 3L)

    def asOf(h: org.apache.spark.sql.DataFrame, v: Long) =
      h.filter(col("valid_from") <= v &&
          (col("valid_to").isNull || col("valid_to") > v))
        .select("k", "val").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet

    assert(asOf(h3, 1L) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(asOf(h3, 2L) == Set((1L, "a"), (2L, "B"), (4L, "d")))
    assert(asOf(h3, 3L) == Set((1L, "A"), (2L, "B"), (4L, "d")))
    // closed rows are immutable: the v1 row of key 2 keeps [1, 2)
    val closed2 = h3.filter(col("k") === 2 && col("valid_to").isNotNull)
      .select("val", "valid_from", "valid_to").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(closed2 == Set(("b", 1L, 2L)))
    // an unchanged re-fold is a no-op (idempotent on identical snapshots)
    val h3b = Upsert.scd2Merge(h3, v3, Seq("k"), version = 4L)
    assert(h3b.count() == h3.count())
  }

  /** (name, size, mtime) of every data file under a directory — the
    * "physically untouched" witness for the partition-scoped paths. */
  private def fileIdentity(dir: String): Set[(String, Long, Long)] = {
    val d = new java.io.File(dir)
    assert(d.isDirectory, s"$dir should exist")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
  }

  test("mergeIntoPartitioned rewrites only partitions containing update keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("upsert_part").toString + "/t"
    Seq((1, 1L, "a"), (1, 2L, "b"), (2, 3L, "c"), (3, 4L, "d"))
      .toDF("day", "id", "name").write.partitionBy("day").parquet(path)
    val before2 = fileIdentity(s"$path/day=2")
    val before3 = fileIdentity(s"$path/day=3")

    // updates touch day=1 (update + insert) and day=4 (new partition)
    val updates = Seq((1, 2L, "b2"), (1, 9L, "i"), (4, 5L, "e"))
      .toDF("day", "id", "name")
    val s = Upsert.mergeIntoPartitioned(spark, path, updates,
      Seq("day", "id"), "day")
    assert(s.updated == 1L && s.inserted == 2L && s.total == 4L)

    // untouched partitions keep their exact on-disk identity
    assert(fileIdentity(s"$path/day=2") == before2)
    assert(fileIdentity(s"$path/day=3") == before3)

    // content equals full-merge semantics across the whole dataset
    val rows = spark.read.parquet(path)
      .select("day", "id", "name").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((1, 1L, "a"), (1, 2L, "b2"), (1, 9L, "i"),
      (2, 3L, "c"), (3, 4L, "d"), (4, 5L, "e")))

    // partition col outside the key is rejected (stale-row hazard)
    intercept[IllegalArgumentException] {
      Upsert.mergeIntoPartitioned(spark, path, updates, Seq("id"), "day")
    }
  }

  test("swap leftovers are invisible to partition discovery") {
    import spark.implicits._
    val path = Files.createTempDirectory("upsert_ghost").toString + "/t"
    Seq((1, 1L, "a"), (2, 2L, "b"))
      .toDF("day", "id", "name").write.partitionBy("day").parquet(path)
    // simulate a crash that left BOTH hidden swap dirs behind: a stale
    // complete copy under the aside name and a half-written tmp
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/.day=1.__swap_tmp"))
    Seq((7L, "ghost")).toDF("id", "name")
      .write.parquet(s"$path/.day=1.__old/inner")
    // a full-dataset read must see neither phantom rows nor a type flip
    val df = spark.read.parquet(path)
    assert(df.schema("day").dataType ==
      org.apache.spark.sql.types.IntegerType,
      "hidden swap dirs must not widen the partition column to string")
    assert(df.count() == 2L, "no phantom partition rows")
    // and the next merge of that partition proceeds normally
    val s = Upsert.mergeIntoPartitioned(spark, path,
      Seq((1, 1L, "a2")).toDF("day", "id", "name"), Seq("day", "id"), "day")
    assert(s.updated == 1L)
    assert(spark.read.parquet(path).count() == 2L)
  }

  test("partition values with Hive-escaped characters hit the same dir") {
    import spark.implicits._
    val path = Files.createTempDirectory("upsert_esc").toString + "/t"
    Seq(("a:b", 1L, "x"), ("plain", 2L, "y"))
      .toDF("src", "id", "name").write.partitionBy("src").parquet(path)
    val s = Upsert.mergeIntoPartitioned(spark, path,
      Seq(("a:b", 1L, "x2")).toDF("src", "id", "name"),
      Seq("src", "id"), "src")
    assert(s.updated == 1L && s.inserted == 0L)
    val rows = spark.read.parquet(path).select("src", "id", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(rows == Set(("a:b", 1L, "x2"), ("plain", 2L, "y")),
      "the escaped on-disk dir must be rewritten, not shadowed by a raw one")
    // exactly one physical directory for the escaped value
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("src=")).sorted
    assert(dirs.toSeq == Seq("src=a%3Ab", "src=plain"), dirs.mkString(","))
  }

  test("scd2MergePartitioned leaves closed history physically in place") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("scd2_part").toString + "/h"
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "val")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "val")
    val v3 = Seq((1L, "A"), (2L, "B"), (4L, "d")).toDF("k", "val")
    Upsert.scd2Init(spark, path, v1, version = 1L)
    Upsert.scd2MergePartitioned(spark, path, v2, Seq("k"), version = 2L)
    val closed2Before = fileIdentity(s"$path/hist=closed_2")
    Upsert.scd2MergePartitioned(spark, path, v3, Seq("k"), version = 3L)
    // the v2 merge's closed partition was not touched by the v3 merge
    assert(fileIdentity(s"$path/hist=closed_2") == closed2Before)

    // full history content matches the in-memory scd2Merge chain
    val h1 = v1.withColumn("valid_from", lit(1L))
      .withColumn("valid_to", lit(null).cast("long"))
    val expected = Upsert.scd2Merge(
      Upsert.scd2Merge(h1, v2, Seq("k"), 2L), v3, Seq("k"), 3L)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("val"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")))).toSet
    val got = Upsert.readScd2(spark, path)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("val"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")))).toSet
    assert(got == expected)
  }

  test("asOfLookup: each fact sees its era; pre-birth facts surface NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hist = Seq(
      (1L, "v1", 1L, Some(3L)), (1L, "v3", 3L, None),
      (2L, "w3", 3L, None))
      .toDF("k", "attr", "valid_from", "valid_to")
    val facts = Seq((1L, 2L), (1L, 3L), (1L, 5L), (2L, 1L), (3L, 4L))
      .toDF("k", "v")
    val m = Upsert.asOfLookup(hist, facts, Seq("k"), "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(m((1L, 2L)) == Some("v1"))   // inside [1,3)
    assert(m((1L, 3L)) == Some("v3"))   // boundary: new row opens at 3
    assert(m((1L, 5L)) == Some("v3"))   // open row covers onward
    assert(m((2L, 1L)) == None)         // before the key existed
    assert(m((3L, 4L)) == None)         // unknown key
  }
}
