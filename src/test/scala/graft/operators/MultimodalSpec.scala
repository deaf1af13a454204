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
}
