package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Real container-header decode: hand-built byte fixtures (written
  * directly from the PNG/JPEG/GIF specifications, independent of the
  * encoders), rejection/fallback behavior, and the encode -> parse
  * round-trip law the oracle query `q_multimodal_decode` rides on. */
class MultimodalSpec extends SparkSpec {

  private def crc32(bytes: Array[Byte]): Array[Byte] = {
    val c = new java.util.zip.CRC32
    c.update(bytes)
    val v = c.getValue.toInt
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  }

  /** A 3x2 PNG header laid out byte-for-byte from the spec: signature,
    * IHDR length 13, type, BE32 dims, 8-bit RGB, CRC over type+data. */
  private def pngFixture(w: Int = 3, h: Int = 2): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ Array[Byte](
      0, 0, 0, w.toByte, // width BE32
      0, 0, 0, h.toByte, // height BE32
      8, 2, 0, 0, 0)     // depth, color, compression, filter, interlace
    sig ++ Array[Byte](0, 0, 0, 13) ++ typeAndData ++ crc32(typeAndData)
  }

  test("PNG fixture: signature + IHDR parsed, dims big-endian, CRC checked") {
    assert(Multimodal.parseHeader(pngFixture()) === Some(("png", 3, 2)))
    // multi-byte dims: 300 = 0x012C
    val wide = pngFixture()
    wide(18) = 0x01; wide(19) = 0x2c.toByte
    // patch the CRC for the edited data
    val fixed = wide.take(29) ++ crc32(wide.slice(12, 29))
    assert(Multimodal.parseHeader(fixed) === Some(("png", 300, 2)))
    // a bit-flipped header must be REJECTED by the CRC, not mis-parsed
    val corrupt = pngFixture()
    corrupt(16) = 0x7f // width byte flipped, CRC now stale
    assert(Multimodal.parseHeader(corrupt) === None)
  }

  test("JPEG fixture: marker scan skips APP0/DQT/fill bytes to SOF2") {
    // SOI, APP0 (len 16), DQT-like segment (len 4), fill FF, then a
    // PROGRESSIVE frame header SOF2 with height 7, width 5
    val fixture = Array[Int](
      0xff, 0xd8,                                     // SOI
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0,  // APP0
      1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xdb, 0x00, 0x04, 0x00, 0x00,             // DQT stub (skipped)
      0xff,                                           // fill byte
      0xff, 0xc2, 0x00, 0x0b, 8,                      // SOF2, len 11
      0x00, 0x07,                                     // height 7
      0x00, 0x05,                                     // width 5
      1, 1, 0x11, 0                                   // 1 component
    ).map(_.toByte)
    assert(Multimodal.parseHeader(fixture) === Some(("jpeg", 5, 7)))
    // C4 (DHT) must NOT be taken for a frame header: same stream with the
    // SOF replaced by a DHT and then ending → no dims
    val dht = fixture.clone()
    dht(28) = 0xc4.toByte // the marker byte after the fill 0xff
    assert(Multimodal.parseHeader(dht) === None)
    // truncated before any SOF → rejected, not mis-parsed
    assert(Multimodal.parseHeader(fixture.take(20)) === None)
  }

  test("GIF fixture: 87a and 89a signatures, little-endian screen dims") {
    // 640 = 0x0280 LE -> 0x80 0x02 ; 480 = 0x01E0 LE -> 0xE0 0x01
    val gif87 = "GIF87a".getBytes("US-ASCII") ++
      Array(0x80, 0x02, 0xe0, 0x01, 0, 0, 0).map(_.toByte)
    assert(Multimodal.parseHeader(gif87) === Some(("gif", 640, 480)))
    val gif89 = "GIF89a".getBytes("US-ASCII") ++
      Array(0x01, 0x00, 0x01, 0x00, 0, 0, 0).map(_.toByte)
    assert(Multimodal.parseHeader(gif89) === Some(("gif", 1, 1)))
    assert(Multimodal.parseHeader(
      "GIF88a1234567".getBytes("US-ASCII")) === None)
  }

  test("unknown payloads fall back to the stub with format 'unknown'") {
    val junk = "not an image at all, just text bytes".getBytes("UTF-8")
    assert(Multimodal.parseHeader(junk) === None)
    val (fmt, w, h, feat) = Multimodal.decodeStub(junk)
    assert(fmt == "unknown" && w >= 16 && h >= 16 && feat.length == 8)
  }

  test("encode -> parse round trip: every format, dims up to 16 bits") {
    for ((w, h) <- Seq((1, 1), (16, 79), (300, 2), (65535, 65535))) {
      val data = "payload-data".getBytes("UTF-8")
      assert(Multimodal.parseHeader(Multimodal.encodePng(w, h, data))
        === Some(("png", w, h)))
      assert(Multimodal.parseHeader(Multimodal.encodeJpeg(w, h, data))
        === Some(("jpeg", w, h)))
      if (w <= 65535 && h <= 65535)
        assert(Multimodal.parseHeader(Multimodal.encodeGif(w, h, data))
          === Some(("gif", w, h)))
    }
    // payload lengths are the closed forms the DuckDB oracle computes
    val d = Array.fill[Byte](7)(1)
    assert(Multimodal.encodePng(4, 4, d).length == 57 + 7)
    assert(Multimodal.encodeJpeg(4, 4, d).length == 45 + 7)
    assert(Multimodal.encodeGif(4, 4, d).length == 18 + 7)
  }

  test("synthesized corpus payloads decode to the doc_id-derived metadata") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma"), (1L, "x" * 100), (2L, ""),
      (64L, "sixty-four"), (191L, "one ninety one"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodeFeatures(Multimodal.synthesizedPayloads(docs))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(3), r.getInt(4)))
    assert(got === Array(
      (0L, "png", 16, 16),
      (1L, "jpeg", 17, 16),
      (2L, "gif", 18, 16),
      (64L, "jpeg", 16, 17),   // 64 % 3 = 1; h = 16 + 64/64
      (191L, "gif", 16 + 63, 16 + 2))) // 191 % 3 = 2
    // feature vector present and 8-dim for every row
    val feats = Multimodal.decodeFeatures(Multimodal.synthesizedPayloads(docs))
      .select(size(col("feature"))).collect().map(_.getInt(0))
    assert(feats.forall(_ == 8))
  }
}
