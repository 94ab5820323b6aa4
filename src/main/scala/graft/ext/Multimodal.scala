package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-processed per partition.
  *
  * The DECODE step is a real container-header parser ([[parseHeader]]):
  * pure byte arithmetic over the published container layouts — PNG
  * signature + IHDR chunk (with CRC verification), JPEG marker scan to
  * the first SOF frame header, GIF logical screen descriptor — no codec
  * libraries, fully deterministic. Payloads that are none of the three
  * fall back to [[decodeStub]]'s pseudo-metadata (format "unknown"), so
  * the pipeline never throws on junk bytes; a production deployment adds
  * formats by extending the parser, not by touching the pipeline.
  *
  * [[encodePng]]/[[encodeJpeg]]/[[encodeGif]] build minimal VALID files
  * of those layouts (real signatures, real chunk CRCs, real marker
  * lengths) — the write half of the modality: test-vector builders for
  * the oracle queries and the payload synthesizer for binary-column
  * sinks. Full pixel codecs (DEFLATE for PNG IDAT, DCT for JPEG scans)
  * are intentionally out of scope: header metadata is what a 100 TB
  * curation pass reads, and the parser never touches pixel data.
  */
object Multimodal {

  /** Output schema of the decode/feature step. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload_bytes", IntegerType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(DoubleType, containsNull = false))))

  // ---- real container-header parsing ------------------------------------

  private val PngSig: Array[Int] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def u8(b: Byte): Int = b & 0xff

  private def be32(p: Array[Byte], off: Int): Long =
    (u8(p(off)).toLong << 24) | (u8(p(off + 1)).toLong << 16) |
      (u8(p(off + 2)).toLong << 8) | u8(p(off + 3)).toLong

  private def be16(p: Array[Byte], off: Int): Int =
    (u8(p(off)) << 8) | u8(p(off + 1))

  private def le16(p: Array[Byte], off: Int): Int =
    u8(p(off)) | (u8(p(off + 1)) << 8)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first per the
    * spec): length=13, type "IHDR", width/height as big-endian u32, and a
    * CRC-32 over type+data that we VERIFY — a bit-flipped header is
    * rejected, not mis-parsed. */
  private def parsePng(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 33) return None
    var i = 0
    while (i < 8) { if (u8(p(i)) != PngSig(i)) return None; i += 1 }
    if (be32(p, 8) != 13L) return None
    if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')) return None
    val crc = new java.util.zip.CRC32
    crc.update(p, 12, 4 + 13) // chunk type + data
    if (crc.getValue != be32(p, 29)) return None
    val w = be32(p, 16)
    val h = be32(p, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(("png", w.toInt, h.toInt))
  }

  /** JPEG: SOI then a marker scan — every non-standalone segment carries a
    * big-endian length (self-inclusive) used to skip APPn/COM/DQT/... until
    * the first frame header SOFn (C0-CF minus C4/C8/CC), which holds
    * precision(1), height(2 BE), width(2 BE). Truncated or structurally
    * invalid streams return None. */
  private def parseJpeg(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 4 || u8(p(0)) != 0xff || u8(p(1)) != 0xd8) return None
    var i = 2
    while (i + 3 < p.length) {
      if (u8(p(i)) != 0xff) return None
      // fill bytes: consecutive FFs pad before a marker
      var j = i + 1
      while (j < p.length && u8(p(j)) == 0xff) j += 1
      if (j >= p.length) return None
      val marker = u8(p(j))
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS before any SOF
      if ((marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i = j + 1 // standalone marker, no length
      } else {
        if (j + 2 >= p.length) return None
        val len = be16(p, j + 1)
        if (len < 2 || j + 1 + len > p.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 7) return None
          val h = be16(p, j + 4)
          val w = be16(p, j + 6)
          return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** GIF: "GIF87a"/"GIF89a" signature, then the logical screen descriptor
    * with width/height as little-endian u16. */
  private def parseGif(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 10) return None
    val sig = new String(p, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(p, 6)
    val h = le16(p, 8)
    if (w > 0 && h > 0) Some(("gif", w, h)) else None
  }

  /** Real header decode: (format, width, height) for PNG / JPEG / GIF
    * payloads, None for anything else (caller picks the fallback). */
  def parseHeader(payload: Array[Byte]): Option[(String, Int, Int)] =
    parsePng(payload).orElse(parseJpeg(payload)).orElse(parseGif(payload))

  // ---- minimal-valid container encoders ---------------------------------

  private def be32b(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngChunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val t = tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    be32b(data.length) ++ t ++ data ++ be32b(crc.getValue.toInt)
  }

  /** Minimal valid-layout PNG: signature + IHDR (8-bit RGB, correct CRCs)
    * + one IDAT carrying `data` verbatim + IEND. 57 + data.length bytes. */
  def encodePng(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val sig = PngSig.map(_.toByte)
    val ihdr = be32b(width) ++ be32b(height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, color RGB, deflate, filter0, no interlace
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", data) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Minimal valid-layout JPEG: SOI + APP0/JFIF + a COM segment carrying
    * `data` (exercises the parser's length-skip) + SOF0 (3-component) +
    * EOI. 45 + data.length bytes. */
  def encodeJpeg(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    require(data.length <= 65531, "COM segment payload exceeds u16 length")
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++
      "JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val comLen = data.length + 2
    val com = Array[Byte](0xff.toByte, 0xfe.toByte,
      ((comLen >>> 8) & 0xff).toByte, (comLen & 0xff).toByte) ++ data
    val sof = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, 8,
      ((height >>> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >>> 8) & 0xff).toByte, (width & 0xff).toByte, 3,
      1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ com ++ sof ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Minimal valid-layout GIF89a: signature + logical screen descriptor +
    * a comment extension carrying `data` + trailer. 18 + data.length
    * bytes (data must fit one 255-byte sub-block). */
  def encodeGif(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    require(data.length <= 255, "GIF comment sub-block limited to 255 bytes")
    val hdr = "GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val lsd = Array[Byte]((width & 0xff).toByte, ((width >>> 8) & 0xff).toByte,
      (height & 0xff).toByte, ((height >>> 8) & 0xff).toByte, 0, 0, 0)
    val com = Array[Byte](0x21, 0xfe.toByte, data.length.toByte) ++ data ++
      Array[Byte](0)
    hdr ++ lsd ++ com ++ Array[Byte](0x3b)
  }

  /** Deterministic corpus payload synthesizer for the oracle queries: the
    * documents table carries no binary column, so each doc gets a REAL
    * minimal container derived from its key — format by `doc_id % 3`,
    * dimensions `16 + doc_id % 64` x `16 + (doc_id / 64) % 64`, the first
    * 32 UTF-8 bytes of `text` as the data segment. The resulting payload
    * length is closed-form in (doc_id, octet_length(text)), which is what
    * lets DuckDB pin the full encode -> [[parseHeader]] round trip. */
  def encodeSample(docId: Long, text: String): Array[Byte] = {
    val w = (16 + Math.floorMod(docId, 64L)).toInt
    val h = (16 + Math.floorMod(docId / 64L, 64L)).toInt
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val data = bytes.take(32)
    Math.floorMod(docId, 3L) match {
      case 0L => encodePng(w, h, data)
      case 1L => encodeJpeg(w, h, data)
      case _  => encodeGif(w, h, data)
    }
  }

  /** FALLBACK pseudo-decode for payloads [[parseHeader]] rejects: derives
    * deterministic dimensions + an 8-dim byte-sampling feature from the
    * raw bytes so junk rows keep flowing with format "unknown" instead of
    * throwing. (Until r9 this stub WAS the decode; the real parser above
    * replaced it.) */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Array[Double]) = {
    val n = payload.length
    val w = 16 + (n % 64)
    val h = 16 + ((n / 64) % 64)
    ("unknown", w, h, byteFeature(payload))
  }

  /** 8-dim strided byte-mean feature — the deterministic stand-in for an
    * embedding model, computed over the raw payload (any format). */
  def byteFeature(payload: Array[Byte]): Array[Double] = {
    val n = payload.length
    Array.tabulate(8) { i =>
      var acc = 0.0
      var j = i
      while (j < n) { acc += (payload(j) & 0xff) / 255.0; j += 8 }
      acc / math.max(1, (n + 7 - i) / 8)
    }
  }

  /** Decoded record produced by the UDF; encodes to the nullable-struct
    * half of [[featureSchema]]. */
  final case class Decoded(payload_bytes: Int, format: String,
                           width: Option[Int], height: Option[Int],
                           feature: Option[Seq[Double]])

  /** Decode + feature-extract a binary column: real header parse
    * ([[parseHeader]]) with the stub as unknown-format fallback. A
    * struct-returning Scala UDF rather than `rdd.mapPartitions`: the query
    * stays on the DataFrame/Tungsten plane, so column pruning still
    * reaches the scan for metadata-only consumers (e.g. [[resizePlan]]
    * never deserialises the payload bytes of OTHER columns) and the
    * surrounding projections remain whole-stage codegen'd. Expects
    * (doc_id: long, payload: binary). */
  def decodeFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val decode = udf((payload: Array[Byte]) =>
      if (payload == null) Decoded(0, null, None, None, None)
      else {
        val (fmt, w, h) = parseHeader(payload).getOrElse {
          val (f, sw, sh, _) = decodeStub(payload)
          (f, sw, sh)
        }
        Decoded(payload.length, fmt, Some(w), Some(h),
          Some(byteFeature(payload).toSeq))
      })
    df.select(col("doc_id").cast("long").as("doc_id"),
        decode(col(payloadCol)).as("d"))
      .select(col("doc_id"), col("d.payload_bytes").as("payload_bytes"),
        col("d.format").as("format"), col("d.width").as("width"),
        col("d.height").as("height"), col("d.feature").as("feature"))
  }

  /** `(doc_id, payload)` with a real synthesized container per document —
    * the binary-column source the multimodal oracle queries decode. */
  def synthesizedPayloads(docs: DataFrame): DataFrame = {
    val enc = udf((id: Long, text: String) =>
      encodeSample(id, if (text == null) "" else text))
    docs.select(col("doc_id").cast("long").as("doc_id"),
      enc(col("doc_id").cast("long"), col("text")).as("payload"))
  }

  /** Resize metadata transform (pure column math over the typed metadata —
    * no payload touch, so it prunes to the metadata columns at scan). */
  def resizePlan(features: DataFrame, maxSide: Int): DataFrame =
    features.withColumn("scale",
        least(lit(1.0), lit(maxSide.toDouble) /
          greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))

  /** Frame sampling plan for video-like payloads: every nth frame index up
    * to `frames`, exploded as (doc_id, frame_idx) work units. */
  def frameSamplePlan(features: DataFrame, everyNth: Int, frames: Int): DataFrame =
    features.select(col("doc_id"),
      explode(sequence(lit(0), lit(frames - 1), lit(everyNth))).as("frame_idx"))
}
