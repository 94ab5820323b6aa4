package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-processed per partition.
  *
  * The DECODE step is a real container-header parser ([[parseHeader]] for
  * images, [[parseAv]] for audio/video): pure byte arithmetic over the
  * published container layouts — PNG signature + IHDR chunk (with CRC
  * verification), JPEG marker scan to the first SOF frame header, GIF
  * logical screen descriptor, WAV RIFF chunk walk to `fmt `/`data`
  * (channels, sample rate, duration), MP4 ISO-BMFF box walk to
  * `moov`/`mvhd` (timescale, duration) — no codec libraries, fully
  * deterministic. Payloads that are none of the five fall back to
  * [[decodeStub]]'s pseudo-metadata (format "unknown"), so the pipeline
  * never throws on junk bytes; a production deployment adds formats by
  * extending the parser, not by touching the pipeline.
  *
  * [[encodePng]]/[[encodeJpeg]]/[[encodeGif]]/[[encodeWav]]/[[encodeMp4]]
  * build minimal VALID files of those layouts (real signatures, real
  * chunk CRCs, real marker/box lengths) — the write half of the modality:
  * test-vector builders for the oracle queries and the payload
  * synthesizer for binary-column sinks. Full payload codecs (DEFLATE for
  * PNG IDAT, DCT for JPEG scans, PCM frames, H.264 track data) are
  * intentionally out of scope: header metadata is what a 100 TB curation
  * pass reads, and the parser never touches sample data.
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

  private def le32(p: Array[Byte], off: Int): Long =
    u8(p(off)).toLong | (u8(p(off + 1)).toLong << 8) |
      (u8(p(off + 2)).toLong << 16) | (u8(p(off + 3)).toLong << 24)

  private def fourcc(p: Array[Byte], off: Int): String =
    new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Audio/video container metadata: channels + sample rate are WAV
    * `fmt ` fields (None for MP4, whose mvhd carries no audio layout);
    * durationMs is data-chunk bytes over byte rate (WAV) or mvhd
    * duration over timescale (MP4). */
  final case class AvMeta(format: String, channels: Option[Int],
                          sampleRate: Option[Int], durationMs: Double)

  /** WAV (RIFF): "RIFF" + LE32 size + "WAVE", then a LE chunk walk
    * (id(4), size LE32, data, odd sizes padded to even) to the `fmt `
    * chunk — audioFormat(LE16), channels(LE16), sampleRate(LE32),
    * byteRate(LE32), blockAlign(LE16), bitsPerSample(LE16) — and the
    * `data` chunk, whose byte count over the byte rate is the duration.
    * Layout per the original Microsoft/IBM RIFF spec (the multimedia
    * programming interface every audio tool implements); structurally
    * invalid or truncated streams return None. */
  private def parseWav(p: Array[Byte]): Option[AvMeta] = {
    if (p.length < 44) return None
    if (fourcc(p, 0) != "RIFF" || fourcc(p, 8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Long)] = None // channels, sampleRate, byteRate
    var dataBytes: Option[Long] = None
    while (i + 8 <= p.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val id = fourcc(p, i)
      val sz = le32(p, i + 4)
      if (sz < 0 || i + 8 + sz > p.length) return None
      if (id == "fmt ") {
        if (sz < 16) return None
        val channels = le16(p, i + 10)
        val rate = le32(p, i + 12)
        val byteRate = le32(p, i + 16)
        val blockAlign = le16(p, i + 20)
        if (channels <= 0 || rate <= 0 || rate > Int.MaxValue ||
          byteRate <= 0 || blockAlign <= 0) return None
        fmt = Some((channels, rate.toInt, byteRate))
      } else if (id == "data") dataBytes = Some(sz)
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even offsets
    }
    for ((ch, rate, byteRate) <- fmt; d <- dataBytes)
      yield AvMeta("wav", Some(ch), Some(rate),
        d.toDouble * 1000.0 / byteRate.toDouble)
  }

  /** MP4 (ISO BMFF, ISO/IEC 14496-12): a big-endian box walk — each box
    * is size(BE32) + type(4), size 1 meaning a 64-bit largesize follows
    * — requiring `ftyp` first (brand check only), skipping free/other
    * boxes to `moov`, then walking moov's children to `mvhd`, whose
    * version-0 body holds timescale at offset 12 and duration at 16
    * (version 1: 64-bit times, timescale at 20, duration at 24).
    * duration/timescale is the presentation length in seconds. */
  private def parseMp4(p: Array[Byte]): Option[AvMeta] = {
    if (p.length < 16 || fourcc(p, 4) != "ftyp") return None
    // box walk over [from, to) returning the (start, bodyStart, end) of
    // the first box of the wanted type
    def findBox(from: Int, to: Int, tpe: String): Option[(Int, Int, Int)] = {
      var i = from
      while (i + 8 <= to) {
        val sz0 = be32(p, i)
        val (body, sz) =
          if (sz0 == 1L) {
            if (i + 16 > to) return None
            val hi = be32(p, i + 8); val lo = be32(p, i + 12)
            (i + 16, (hi << 32) | lo)
          } else if (sz0 == 0L) (i + 8, (to - i).toLong) // box runs to end
          else (i + 8, sz0)
        if (sz < (body - i).toLong || i + sz > to) return None
        if (fourcc(p, i + 4) == tpe) return Some((i, body, (i + sz).toInt))
        i += sz.toInt
      }
      None
    }
    for {
      (_, moovBody, moovEnd) <- findBox(0, p.length, "moov")
      (_, mvhdBody, mvhdEnd) <- findBox(moovBody, moovEnd, "mvhd")
      meta <- {
        if (mvhdBody + 4 > mvhdEnd) None
        else {
          val version = u8(p(mvhdBody))
          val (tsOff, durLen) = if (version == 1) (mvhdBody + 20, 8)
                                else (mvhdBody + 12, 4)
          if (tsOff + 4 + durLen > mvhdEnd) None
          else {
            val timescale = be32(p, tsOff)
            val duration =
              if (durLen == 8) (be32(p, tsOff + 4) << 32) | be32(p, tsOff + 8)
              else be32(p, tsOff + 4)
            if (timescale <= 0) None
            else Some(AvMeta("mp4", None, None,
              duration.toDouble * 1000.0 / timescale.toDouble))
          }
        }
      }
    } yield meta
  }

  /** Real AV container decode: WAV or MP4 metadata, None otherwise. */
  def parseAv(payload: Array[Byte]): Option[AvMeta] =
    parseWav(payload).orElse(parseMp4(payload))

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

  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  /** Minimal valid WAV: RIFF/WAVE header, a 16-byte PCM `fmt ` chunk and
    * a `data` chunk carrying `data` verbatim as the sample payload.
    * 44 + data.length bytes — the canonical PCM-WAV preamble size. */
  def encodeWav(channels: Int, sampleRate: Int, data: Array[Byte]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0)
    val blockAlign = channels * 2 // 16-bit samples
    val byteRate = sampleRate * blockAlign
    val fmt = "fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32b(16) ++ le16b(1) ++ le16b(channels) ++ le32b(sampleRate) ++
      le32b(byteRate) ++ le16b(blockAlign) ++ le16b(16)
    val dataChunk =
      "data".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        le32b(data.length) ++ data
    "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32b(36 + data.length) ++
      "WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      fmt ++ dataChunk
  }

  private def mp4Box(tpe: String, body: Array[Byte]): Array[Byte] =
    be32b(8 + body.length) ++
      tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body

  /** Minimal valid MP4 (ISO BMFF): `ftyp` (brand isom), a `free` box
    * carrying `data` (exercises the parser's box skip), and `moov`
    * containing a version-0 `mvhd` with the given timescale/duration.
    * 140 + data.length bytes. */
  def encodeMp4(timescale: Int, duration: Int, data: Array[Byte]): Array[Byte] = {
    require(timescale > 0 && duration >= 0)
    val ftyp = mp4Box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ be32b(0))
    val mvhdBody = Array[Byte](0, 0, 0, 0) ++ // version 0 + flags
      be32b(0) ++ be32b(0) ++ // creation, modification
      be32b(timescale) ++ be32b(duration) ++
      be32b(0x00010000) ++ // rate 1.0
      Array[Byte](1, 0) ++ Array.fill[Byte](10)(0) ++ // volume + reserved
      (be32b(0x00010000) ++ be32b(0) ++ be32b(0) ++
        be32b(0) ++ be32b(0x00010000) ++ be32b(0) ++
        be32b(0) ++ be32b(0) ++ be32b(0x40000000)) ++ // unity matrix
      Array.fill[Byte](24)(0) ++ // pre_defined
      be32b(1) // next_track_ID
    ftyp ++ mp4Box("free", data) ++ mp4Box("moov", mp4Box("mvhd", mvhdBody))
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

  /** Five-format synthesizer for the AV-extended decode: format by
    * `doc_id % 5` (png/jpeg/gif/wav/mp4), image dimensions as in
    * [[encodeSample]], WAV layout `channels = 1 + doc_id % 2`,
    * `sampleRate = 8000 + 1000·(doc_id % 4)`, MP4 timing
    * `timescale = 600 + 100·(doc_id % 10)`,
    * `duration = 1000 + 10·(doc_id % 100)`; the first 32 UTF-8 bytes of
    * `text` ride as the data segment in every format. All metadata is
    * closed-form in (doc_id, octet_length(text)), so DuckDB pins the
    * full encode → parse round trip across all five containers. */
  def encodeSampleAv(docId: Long, text: String): Array[Byte] = {
    val data = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(32)
    val w = (16 + Math.floorMod(docId, 64L)).toInt
    val h = (16 + Math.floorMod(docId / 64L, 64L)).toInt
    Math.floorMod(docId, 5L) match {
      case 0L => encodePng(w, h, data)
      case 1L => encodeJpeg(w, h, data)
      case 2L => encodeGif(w, h, data)
      case 3L => encodeWav((1 + Math.floorMod(docId, 2L)).toInt,
        (8000 + 1000 * Math.floorMod(docId, 4L)).toInt, data)
      case _  => encodeMp4((600 + 100 * Math.floorMod(docId, 10L)).toInt,
        (1000 + 10 * Math.floorMod(docId, 100L)).toInt, data)
    }
  }

  /** `(doc_id, payload)` over all five container formats. */
  def synthesizedAvPayloads(docs: DataFrame): DataFrame = {
    val enc = udf((id: Long, text: String) =>
      encodeSampleAv(id, if (text == null) "" else text))
    docs.select(col("doc_id").cast("long").as("doc_id"),
      enc(col("doc_id").cast("long"), col("text")).as("payload"))
  }

  /** Unified media record: image fields for PNG/JPEG/GIF, audio/video
    * fields for WAV/MP4, format "unknown" + stub dimensions for junk. */
  final case class DecodedMedia(payload_bytes: Int, format: String,
                                width: Option[Int], height: Option[Int],
                                channels: Option[Int],
                                sample_rate: Option[Int],
                                duration_ms: Option[Double])

  /** Decode a binary column across all five container formats: the image
    * header parse ([[parseHeader]]) and the AV parse ([[parseAv]]) feed
    * one typed metadata row; junk falls back to [[decodeStub]] (format
    * "unknown") so the pipeline never throws. Same UDF-over-Tungsten
    * shape as [[decodeFeatures]] — column pruning still reaches the scan
    * for metadata-only consumers. */
  def decodeMedia(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val decode = udf((payload: Array[Byte]) =>
      if (payload == null)
        DecodedMedia(0, null, None, None, None, None, None)
      else parseHeader(payload) match {
        case Some((fmt, w, h)) =>
          DecodedMedia(payload.length, fmt, Some(w), Some(h), None, None, None)
        case None => parseAv(payload) match {
          case Some(av) =>
            DecodedMedia(payload.length, av.format, None, None, av.channels,
              av.sampleRate, Some(av.durationMs))
          case None =>
            val (f, sw, sh, _) = decodeStub(payload)
            DecodedMedia(payload.length, f, Some(sw), Some(sh), None, None, None)
        }
      })
    df.select(col("doc_id").cast("long").as("doc_id"),
        decode(col(payloadCol)).as("d"))
      .select(col("doc_id"), col("d.payload_bytes").as("payload_bytes"),
        col("d.format").as("format"), col("d.width").as("width"),
        col("d.height").as("height"), col("d.channels").as("channels"),
        col("d.sample_rate").as("sample_rate"),
        col("d.duration_ms").as("duration_ms"))
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

  /** Frame sampling driven by the PARSED duration (what [[frameSamplePlan]]
    * presumed and [[decodeMedia]] now supplies): per payload,
    * `floor(duration_ms / 1000 · fps)` frames, every nth exploded as
    * (doc_id, frame_idx). Zero-frame payloads are filtered BEFORE the
    * sequence — `sequence(0, -1, n)` is a descending array (the r11
    * streaming-span crash), not an empty one. */
  def frameSamplePlanFromDuration(media: DataFrame, fps: Double,
                                  everyNth: Int): DataFrame = {
    val nFrames = floor(col("duration_ms") / lit(1000.0) * lit(fps))
    media.where(col("duration_ms").isNotNull && nFrames >= 1)
      .select(col("doc_id"), explode(sequence(lit(0),
        (nFrames - 1).cast("int"), lit(everyNth))).as("frame_idx"))
  }
}
