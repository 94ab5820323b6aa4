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

  // ---- WAV / MP4 (round 12) ----------------------------------------------

  private def le16(v: Int) =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
  private def le32(v: Int) =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def be32(v: Long) =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A WAV laid out byte-for-byte from the RIFF spec, independently of
    * encodeWav: an ODD-sized LIST chunk BEFORE fmt (exercises the
    * pad-to-even chunk walk), 2ch 8000 Hz 16-bit PCM, 12 data bytes. */
  private def wavFixture: Array[Byte] = {
    val list = "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte]('I', 'N', 'F') ++ Array[Byte](0) // 3 bytes + pad
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(8000) ++ le32(8000 * 4) ++
      le16(4) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(12) ++
      Array.fill[Byte](12)(0x55)
    val body = "WAVE".getBytes("US-ASCII") ++ list ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("WAV fixture: chunk walk skips an odd LIST chunk to fmt/data; " +
      "duration = data bytes / byte rate") {
    val got = Multimodal.parseAv(wavFixture)
    assert(got === Some(Multimodal.AvMeta("wav", Some(2), Some(8000),
      12.0 * 1000.0 / 32000.0)))
    // truncated mid-chunk: rejected, not mis-parsed
    assert(Multimodal.parseAv(wavFixture.take(30)) === None)
    // bad magic
    val bad = wavFixture.clone; bad(9) = 'X'
    assert(Multimodal.parseAv(bad) === None)
    // a fmt chunk claiming zero channels is structurally invalid
    val zeroCh = wavFixture.clone
    // fmt channels live right after "fmt "+size+audioFormat in the walk;
    // locate fmt and zero its channel count
    val fi = zeroCh.indexOfSlice("fmt ".getBytes("US-ASCII"))
    zeroCh(fi + 10) = 0; zeroCh(fi + 11) = 0
    assert(Multimodal.parseAv(zeroCh) === None)
  }

  /** An MP4 laid out from ISO/IEC 14496-12 independently of encodeMp4:
    * ftyp, a skippable box, then moov whose SECOND child is a
    * version-1 mvhd (64-bit times, timescale 90000, duration 450000). */
  private def mp4Fixture: Array[Byte] = {
    def box(tpe: String, body: Array[Byte]) =
      be32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "mp42".getBytes("US-ASCII") ++ be32(0) ++
      "isom".getBytes("US-ASCII"))
    val skip = box("skip", Array.fill[Byte](5)(9))
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ // version 1
      Array.fill[Byte](8)(0) ++ Array.fill[Byte](8)(0) ++ // 64-bit times
      be32(90000) ++ be32(0) ++ be32(450000) ++ // timescale, duration BE64
      Array.fill[Byte](80)(0))
    val moov = box("moov", box("udta", Array[Byte](1, 2)) ++ mvhd1)
    ftyp ++ skip ++ moov
  }

  test("MP4 fixture: box walk skips to moov/mvhd, version-1 64-bit " +
      "duration over timescale") {
    assert(Multimodal.parseAv(mp4Fixture) ===
      Some(Multimodal.AvMeta("mp4", None, None, 450000.0 * 1000.0 / 90000.0)))
    // no ftyp first → rejected
    assert(Multimodal.parseAv(mp4Fixture.drop(24)) === None)
    // truncated inside moov → rejected
    assert(Multimodal.parseAv(mp4Fixture.dropRight(10)) === None)
  }

  test("WAV/MP4 encode -> parse round trip and closed-form payload sizes") {
    val d = Array.fill[Byte](7)(1)
    for ((ch, rate) <- Seq((1, 8000), (2, 11000), (6, 48000))) {
      val got = Multimodal.parseAv(Multimodal.encodeWav(ch, rate, d))
      assert(got === Some(Multimodal.AvMeta("wav", Some(ch), Some(rate),
        7.0 * 1000.0 / (rate.toDouble * ch * 2))))
    }
    for ((ts, dur) <- Seq((600, 0), (90000, 123456), (1000, 1))) {
      val got = Multimodal.parseAv(Multimodal.encodeMp4(ts, dur, d))
      assert(got === Some(Multimodal.AvMeta("mp4", None, None,
        dur.toDouble * 1000.0 / ts)))
    }
    assert(Multimodal.encodeWav(2, 8000, d).length == 44 + 7)
    assert(Multimodal.encodeMp4(600, 1000, d).length == 140 + 7)
    // images are not AV; AV payloads are not images — the unified decode
    // dispatches on real signatures, not doc_id arithmetic
    assert(Multimodal.parseAv(Multimodal.encodePng(4, 4, d)) === None)
    assert(Multimodal.parseHeader(Multimodal.encodeWav(1, 8000, d)) === None)
  }

  test("decodeMedia over the five-format synthesized corpus") {
    import spark.implicits._
    val docs = Seq((0L, "png doc"), (1L, "jpeg doc"), (2L, "gif doc"),
      (3L, "wav doc"), (4L, "mp4 doc"), (13L, "wav two"), (9L, "mp4 two"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodeMedia(Multimodal.synthesizedAvPayloads(docs))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2),
        Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(0L)._2 == "png" && byId(1L)._2 == "jpeg" &&
      byId(2L)._2 == "gif")
    // doc 3: wav, channels 1+3%2=2, rate 8000+1000*(3%4)=11000, 7-byte
    // data ("wav doc"), byteRate 11000*2*2
    assert(byId(3L) === ((3L, "wav", Some(2), Some(11000),
      Some(7.0 * 1000.0 / 44000.0))))
    // doc 13: channels 1+1=2, rate 8000+1000=9000
    assert(byId(13L)._2 == "wav" && byId(13L)._3 === Some(2) &&
      byId(13L)._4 === Some(9000))
    // doc 4: mp4, timescale 600+400=1000, duration 1000+40=1040
    assert(byId(4L) === ((4L, "mp4", None, None,
      Some(1040.0 * 1000.0 / 1000.0))))
    assert(byId(9L)._2 == "mp4")
  }

  test("duration-driven frame plan: counts from parsed duration, " +
      "zero-frame payloads emit nothing (no descending sequence)") {
    import spark.implicits._
    val docs = Seq((4L, "a"), (9L, "b")).toDF("doc_id", "text")
    val media = Multimodal.decodeMedia(Multimodal.synthesizedAvPayloads(docs))
    // doc 4: 1040 ms at 2 fps → floor(2.08) = 2 frames → idx 0, 2? no —
    // every 2nd of {0, 1} → {0}; doc 9: ts 1500, dur 1090 → 726.67 ms →
    // floor(1.45) = 1 frame → {0}
    val got = Multimodal.frameSamplePlanFromDuration(media, fps = 2.0,
        everyNth = 2).orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got === Array((4L, 0), (9L, 0)))
    // a sub-frame duration row vanishes instead of exploding descending
    val tiny = Seq((0L, 100.0), (1L, 2600.0))
      .toDF("doc_id", "duration_ms")
    val tinyGot = Multimodal.frameSamplePlanFromDuration(tiny, 2.0, 2)
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(tinyGot === Array((1L, 0), (1L, 2), (1L, 4)))
  }
}
