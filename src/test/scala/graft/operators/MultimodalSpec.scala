package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("stub decoder is a deterministic function of bytes") {
    val r = Multimodal.StubDecoder.decode(
      Multimodal.MediaRow(7L, "hello".getBytes("UTF-8")))
    assert(r.doc_id == 7L)
    assert(r.n_bytes == 5L)
    assert(r.width == 5L)
    assert(r.height == 35L)
    assert(r.first_byte == 'h'.toLong)
    val empty = Multimodal.StubDecoder.decode(
      Multimodal.MediaRow(1L, Array.emptyByteArray))
    assert(empty.n_bytes == 0L && empty.first_byte == -1L)
  }

  test("decode stage preserves row count and binary plumbing") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Multimodal.q38Multimodal(spark, sfDir)
    assert(out.count() == docs.count())
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "first_byte"))
  }
  test("frame sampling covers every 4th frame of every payload") {
    val rows = Multimodal.q80FrameSample(spark, sfDir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(byDoc.keySet == docs.keySet, "every payload is sampled")
    byDoc.foreach { case (id, rs) =>
      val nFrames = (docs(id) * 2 + 127) / 128 // hex doubles the length
      val expected = (0L until nFrames by 4).toSet
      assert(rs.map(_.getAs[Long]("frame_no")).toSet == expected)
      // fingerprints are well-formed md5 hex
      rs.foreach(r =>
        assert(r.getAs[String]("frame_md5").matches("[0-9a-f]{32}")))
    }
  }

  test("header parse: valid, wrong-magic, and too-short payloads") {
    import spark.implicits._
    def header(w: Int, h: Int): Array[Byte] =
      "IMG1".getBytes("UTF-8") ++
        java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array()
    val media = Seq(
      (1L, header(640, 480) ++ "body".getBytes("UTF-8")), // valid + body
      (2L, header(1, 16777216)),                          // valid, no body
      (3L, "PNG0".getBytes("UTF-8") ++ new Array[Byte](20)), // wrong magic
      (4L, "tiny".getBytes("UTF-8")),                     // shorter than hdr
      // ANSI audit (the q280 discipline applied to header offsets):
      // the empty payload and the 11-byte boundary are the shapes
      // where the height field's hex substring is EMPTY — an
      // unguarded CAST(conv('') AS BIGINT) throws under ANSI; the
      // is_valid `when` guard must keep both rows NULL, not fatal
      (5L, Array.empty[Byte]),                            // empty payload
      (6L, header(9, 9).take(11))                         // 1 byte short
    ).toDF("doc_id", "payload")
    val r = Multimodal.parseHeaders(media).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(1) && r(1L).getLong(3) == 640 &&
      r(1L).getLong(4) == 480 && r(1L).getLong(5) == 4)
    assert(r(2L).getBoolean(1) && r(2L).getLong(3) == 1 &&
      r(2L).getLong(4) == 16777216 && r(2L).getLong(5) == 0)
    Seq(3L, 4L, 5L, 6L).foreach { id =>
      assert(!r(id).getBoolean(1))
      (2 to 5).foreach(i => assert(r(id).isNullAt(i), s"doc $id col $i"))
    }
  }

  test("blockDedup: aligned shared blocks count, distinct tails don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // docs 1 and 2 share their first 64-byte block; tails differ;
    // doc 3 shares nothing; doc 4 is a short single partial block
    val docs = Seq(
      (1L, "A" * 64 + "X" * 10),
      (2L, "A" * 64 + "Y" * 10),
      (3L, "B" * 70),
      (4L, "zz")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val got = Multimodal.blockDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((2L, 1L)))
    assert(got(3L) == ((2L, 0L)))
    assert(got(4L) == ((1L, 0L)))
  }
}
