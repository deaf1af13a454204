package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal-column conventions: opaque `binary` payload + typed
  * metadata struct, with decode/feature-extraction as a batched
  * mapPartitions stage.
  *
  * The media codec libraries aren't in this container, so the decode step
  * is a clearly-marked deterministic STUB ([[StubDecoder.decode]]); the
  * Spark-side plumbing — binary column, schema, partition-parallel batch
  * iteration, struct metadata output — is real and oracle-tested (the stub
  * derives metadata purely from byte content, which SQL can mirror).
  *
  * Scale notes: decode runs inside mapPartitions, one partition per task,
  * streaming the iterator (never materializing a partition's payloads);
  * binary payloads stay columnar in parquet and are pruned unless selected.
  */
object Multimodal {

  /** Payload record entering the decode stage. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Decoded metadata + features leaving the decode stage. */
  final case class DecodedRow(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, first_byte: Long)

  /** STUB decoder: stands in for image/audio decode (libs unavailable in
    * this container). Deterministic function of the bytes only — a real
    * implementation would replace the body, keeping the signature. */
  object StubDecoder {
    def decode(r: MediaRow): DecodedRow = {
      val n = r.payload.length.toLong
      DecodedRow(
        doc_id = r.doc_id,
        n_bytes = n,
        width = n % 640,
        height = (n * 7) % 480,
        first_byte = if (n > 0) r.payload(0).toLong & 0xFF else -1L)
    }
  }

  // ---------------------------------------------------------------------
  // q38_multimodal — build a binary media column (UTF-8 bytes of text,
  // standing in for an image blob), run the batched decode stage, emit the
  // metadata struct flattened. Oracle mirrors the stub arithmetic over
  // octet lengths.
  // ---------------------------------------------------------------------
  def q38Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val media = d.select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
    media.mapPartitions(_.map(StubDecoder.decode)).toDF()
  }

  val q38MultimodalSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
      |  CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
      |  CASE WHEN octet_length(encode(text)) = 0 THEN CAST(-1 AS BIGINT)
      |       ELSE CAST(('0x' || substring(hex(encode(text)), 1, 2)) AS BIGINT)
      |  END AS first_byte
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------------
  // q80_frame_sample — frame sampling over an opaque media payload: treat
  // the binary column as a fixed-frame-size stream (64-byte frames
  // standing in for video frames / audio windows), keep every 4th frame,
  // fingerprint each sampled frame. The frame arithmetic runs over the
  // hex view of the payload so the oracle can mirror it byte-exactly
  // (both engines' hex() is uppercase, md5() lowercase-hex).
  //
  // Scale design: fully relational — sequence+explode generates frame
  // indices (rows ∝ sampled frames, not payload bytes re-copied per
  // frame), the per-frame substring/md5 stays inside codegen, and no
  // decode library is touched: sampling/slicing is pure byte plumbing, so
  // unlike decode it needs no stub. One narrow shuffle only if the
  // consumer aggregates.
  // ---------------------------------------------------------------------
  val FrameHexChars = 128 // 64-byte frames in hex chars
  val FrameStride = 4     // keep every 4th frame

  def q80FrameSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
      .withColumn("n_frames",
        ceil(length(col("hx")).cast("double") / FrameHexChars).cast("long"))
      // n_frames = 0 (empty payload) must yield NO rows: Spark's
      // sequence(0, -1) would produce a DESCENDING [0, -1] — frame 0
      // would pass the stride filter while the oracle's range(0, 0) is
      // empty. Filter before the explode.
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("hx"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_no"))
      .filter(col("frame_no") % FrameStride === 0)
      .select(col("doc_id"), col("frame_no"),
        md5(expr(s"CAST(substring(hx, CAST(frame_no * $FrameHexChars + 1" +
          s" AS INT), $FrameHexChars) AS BINARY)")).as("frame_md5"))
  }

  val q80FrameSampleSql: String =
    """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
      |f AS (SELECT doc_id, hx,
      |        CAST(CEIL(len(hx) / 128.0) AS BIGINT) AS n_frames
      |      FROM h)
      |SELECT doc_id, i AS frame_no,
      |  md5(substring(hx, CAST(i * 128 + 1 AS INTEGER), 128)) AS frame_md5
      |FROM f, UNNEST(range(0, n_frames)) AS t(i)
      |WHERE i % 4 = 0""".stripMargin

  // ---------------------------------------------------------------------
  // q88_media_header — typed metadata EXTRACTION from the binary payload
  // itself: a 12-byte container header (4-byte magic "IMG1", 4-byte
  // big-endian width, 4-byte big-endian height) parsed relationally —
  // no decode stub, no mapPartitions, pure codegen byte plumbing, so
  // unlike q38's stubbed decode this is fully oracle-checked. Corrupt
  // payloads (wrong magic or shorter than the header) surface as
  // is_valid=false with NULL fields instead of poisoning the batch —
  // the at-scale contract for ingesting crawled media.
  //
  // Scale note: only the 12-byte header is sliced out of the (binary,
  // possibly multi-MB) payload before hexing — O(header) per row, never
  // O(payload); the payload column itself is pruned unless selected.
  // ---------------------------------------------------------------------
  val MagicHex = "494D4731" // hex of the ASCII magic "IMG1"

  /** Adds is_valid/magic_hex/width/height/body_bytes parsed from a 12-byte
    * big-endian header on `payload`. Invalid rows keep NULL fields. */
  def parseHeaders(media: DataFrame): DataFrame =
    media
      .withColumn("hdr", hex(expr("substring(payload, 1, 12)")))
      .withColumn("is_valid",
        length(col("payload")) >= 12 &&
          substring(col("hdr"), 1, 8) === MagicHex)
      .select(col("doc_id"), col("is_valid"),
        when(col("is_valid"), substring(col("hdr"), 1, 8)).as("magic_hex"),
        when(col("is_valid"),
          expr("CAST(conv(substring(hdr, 9, 8), 16, 10) AS BIGINT)"))
          .as("width"),
        when(col("is_valid"),
          expr("CAST(conv(substring(hdr, 17, 8), 16, 10) AS BIGINT)"))
          .as("height"),
        when(col("is_valid"), (length(col("payload")) - 12).cast("long"))
          .as("body_bytes"))

  /** Gate corpus: headered payloads with doc_id-derived dimensions; every
    * 13th payload is raw text bytes (wrong magic) — the corrupt case. */
  def q88MediaHeader(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val media = d.select(col("doc_id"),
      when(col("doc_id") % 13 =!= 0,
        concat(
          unhex(lit(MagicHex)),
          unhex(lpad(hex(lit(64L) + col("doc_id") % 512), 8, "0")),
          unhex(lpad(hex(lit(48L) + col("doc_id") % 256), 8, "0")),
          col("text").cast("binary")))
        .otherwise(col("text").cast("binary")).as("payload"))
    parseHeaders(media)
  }

  val q88MediaHeaderSql: String =
    """WITH media AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 <> 0 THEN
      |      from_hex('494D4731') ||
      |      from_hex(lpad(to_hex(64 + doc_id % 512), 8, '0')) ||
      |      from_hex(lpad(to_hex(48 + doc_id % 256), 8, '0')) ||
      |      encode(text)
      |    ELSE encode(text) END AS payload
      |  FROM documents),
      |h AS (SELECT doc_id, octet_length(payload) AS nb,
      |        substring(hex(payload), 1, 24) AS hdr
      |      FROM media),
      |v AS (SELECT doc_id, nb, hdr,
      |        (nb >= 12 AND substring(hdr, 1, 8) = '494D4731') AS is_valid
      |      FROM h)
      |SELECT doc_id, is_valid,
      |  CASE WHEN is_valid THEN substring(hdr, 1, 8) END AS magic_hex,
      |  CASE WHEN is_valid THEN ('0x' || substring(hdr, 9, 8))::BIGINT END
      |    AS width,
      |  CASE WHEN is_valid THEN ('0x' || substring(hdr, 17, 8))::BIGINT END
      |    AS height,
      |  CASE WHEN is_valid THEN CAST(nb - 12 AS BIGINT) END AS body_bytes
      |FROM v""".stripMargin

  // ---------------------------------------------------------------------
  // q165_block_dedup — block-level BLOB dedup accounting: slice each
  // binary payload into fixed 64-byte blocks, fingerprint each block,
  // and report per doc how many of its blocks also occur in OTHER docs —
  // the storage-dedup / near-identical-media signal (fixed-size chunking,
  // the rsync/VM-image baseline; content-defined chunking changes only
  // the slicing rule, not this plumbing). Runs over the hex view like
  // q80 so the oracle mirrors it byte-exactly; no decode library.
  //
  // Scale shape: the block stream is rows ∝ payload-bytes/64 — ONE
  // shuffle on the block hash for the global occurrence counts, one on
  // doc_id for the rollup; a block shared by a million docs contributes
  // its occurrence count, never count² (the count table is |distinct
  // blocks| rows). The payload column prunes out after the slice.
  // ---------------------------------------------------------------------
  val BlockHexChars = 128 // 64-byte blocks in hex chars

  def blockDedup(media: DataFrame): DataFrame = {
    val blocks = media
      .select(col("doc_id"), hex(col("payload")).as("hx"))
      .withColumn("n_blocks",
        ceil(length(col("hx")).cast("double") / BlockHexChars).cast("long"))
      .filter(col("n_blocks") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_blocks") - 1)).as("blk_no"),
        col("hx"))
      .select(col("doc_id"), col("blk_no"),
        md5(expr(s"CAST(substring(hx, CAST(blk_no * $BlockHexChars + 1" +
          s" AS INT), $BlockHexChars) AS BINARY)")).as("blk"))
    val occ = blocks.groupBy(col("blk"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    blocks.join(occ, "blk")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared_blocks"))
  }

  def q165BlockDedup(s: SparkSession, dir: String): DataFrame =
    blockDedup(t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload")))

  val q165BlockDedupSql: String =
    """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
      |f AS (SELECT doc_id, hx,
      |        CAST(CEIL(len(hx) / 128.0) AS BIGINT) AS n_blocks
      |      FROM h WHERE len(hx) > 0),
      |blocks AS (
      |  SELECT doc_id,
      |    md5(substring(hx, CAST(i * 128 + 1 AS INTEGER), 128)) AS blk
      |  FROM f, UNNEST(range(0, n_blocks)) AS t(i)),
      |occ AS (SELECT blk, COUNT(DISTINCT doc_id) AS nd
      |        FROM blocks GROUP BY blk)
      |SELECT b.doc_id, COUNT(*) AS n_blocks,
      |  CAST(SUM(CASE WHEN o.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_shared_blocks
      |FROM blocks b JOIN occ o ON b.blk = o.blk
      |GROUP BY b.doc_id""".stripMargin
}
