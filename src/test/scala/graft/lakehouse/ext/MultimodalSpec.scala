package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  lazy val blobs = Multimodal.asBlob(
    spark.read.parquet(s"$sf0001/documents.parquet").limit(50), "text", "payload")

  test("blob metadata: size matches text length, sha is 64 hex chars") {
    val out = Multimodal.withBlobMetadata(blobs, "payload")
      .select("n_chars", "byte_size", "content_sha256", "magic_hex").collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0)) // ascii fixture text: 1 byte/char
      assert(r.getString(2).matches("[0-9a-f]{64}"))
      assert(r.getString(3).matches("[0-9a-f]{8}"))
    }
  }

  // real PNG payloads of known dims: decode must return EXACT pixel sizes
  lazy val pngs = spark.range(0, 50).toDF("img_id")
    .withColumn("w", (col("img_id") % 90 + 10).cast("int"))
    .withColumn("h", ((col("img_id") * 7) % 90 + 10).cast("int"))
    .withColumn("payload", Multimodal.syntheticPngUdf(col("w"), col("h")))

  test("decodeImages: REAL ImageIO decode recovers exact PNG dims + channels") {
    val out = Multimodal.decodeImages(pngs, "payload")
    assert(out.schema.fieldNames.contains("decoded"))
    out.select("w", "h", "decoded.width", "decoded.height", "decoded.channels")
      .collect().foreach { r =>
        assert(r.getInt(2) == r.getInt(0) && r.getInt(3) == r.getInt(1))
        assert(r.getInt(4) == 3) // TYPE_INT_RGB
      }
  }

  test("decodeImages: undecodable payloads yield (0,0,0), not a crash") {
    val out = Multimodal.decodeImages(blobs, "payload") // utf-8 text, not media
      .select("decoded.width", "decoded.height", "decoded.channels").collect()
    out.foreach(r => assert(r.getInt(0) == 0 && r.getInt(1) == 0 && r.getInt(2) == 0))
  }

  test("decodeImages: stub codec stays available behind the seam") {
    val out = Multimodal.decodeImages(blobs, "payload", Multimodal.FakeCodec)
    val a = out.select("doc_id", "decoded.width", "decoded.height").orderBy("doc_id").collect()
    a.foreach { r => assert(r.getInt(1) >= 16 && r.getInt(2) >= 16) }
  }

  test("resizeImages: aspect cap at maxSide") {
    val decoded = Multimodal.decodeImages(pngs, "payload")
    val out = Multimodal.resizeImages(decoded, "decoded", maxSide = 64)
      .select("resized.width", "resized.height").collect()
    out.foreach(r => assert(r.getInt(0) <= 64 && r.getInt(1) <= 64))
  }

  test("extractFeatures: fixed dim, normalized-ish, deterministic") {
    val out = Multimodal.extractFeatures(blobs, "payload", dim = 8)
      .select("features").collect()
    out.foreach { r =>
      val f = r.getSeq[Double](0)
      assert(f.length == 8)
      assert(f.forall(v => v >= 0.0 && v <= 8.0))
    }
  }

  test("real audio decode: synthetic WAVs roundtrip their parameters") {
    val rows = Seq((1L, 8000, 400, 0), (2L, 16000, 999, 3), (3L, 44100, 1, 6))
      .toDF("id", "rate", "n", "seed")
      .withColumn("payload", Multimodal.syntheticWavUdf($"rate", $"n", $"seed"))
    val got = Multimodal.decodeAudio(rows, "payload")
      .select("id", "audio.frames", "audio.sample_rate", "audio.channels",
        "audio.bits")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(got == Set((1L, 400L, 8000, 1, 16), (2L, 999L, 16000, 1, 16),
      (3L, 1L, 44100, 1, 16)))
    // corrupt payloads zero out, never throw
    assert(Multimodal.audioMeta("not a wav".getBytes) == ((0L, 0, 0, 0)))
    assert(Multimodal.audioMeta(null) == ((0L, 0, 0, 0)))
  }

  test("real pixel resize: re-decoded thumbs have the capped dims; " +
      "in-bounds payloads pass through byte-identical") {
    val big = Multimodal.syntheticPng(640, 200)
    val small = Multimodal.syntheticPng(100, 50)
    val out = Multimodal.resizeImagePixels(
      Seq((1, big), (2, small)).toDF("id", "payload"), "payload", maxSide = 256)
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](2)).toMap
    val (w, h, _) = Multimodal.ImageIoCodec.dims(out(1))
    assert((w, h) == (256, 80), s"got ${(w, h)}") // 640x200 capped at 256
    assert(out(2).sameElements(small), "in-bounds image must pass through")
    assert(Multimodal.resizePixelsKernel("junk".getBytes, 256) == null)
  }

  test("sampleFrames: frames per doc, deterministic hashes") {
    val out = Multimodal.sampleFrames(blobs, "doc_id", "payload", frames = 4)
    assert(out.count() == 50 * 4)
    assert(out.groupBy("doc_id").count().select("count").distinct().head().getLong(0) == 4)
  }

  test("dHash: content-addressed — same pixels collide across PNG/BMP " +
      "containers while their bytes (and sha-256) differ") {
    val png = Multimodal.syntheticImage(64, 48, "png")
    val bmp = Multimodal.syntheticImage(64, 48, "bmp")
    assert(!png.sameElements(bmp), "containers should differ at byte level")
    val hp = Multimodal.dHash64Kernel(png)
    val hb = Multimodal.dHash64Kernel(bmp)
    assert(hp != null && hp == hb, s"dHash must see pixels, not bytes ($hp vs $hb)")
  }

  test("dHash: different images get different hashes; undecodable is null") {
    val hashes = for (w <- Seq(16, 32, 48); h <- Seq(16, 24))
      yield Multimodal.dHash64Kernel(Multimodal.syntheticImage(w, h, "png"))
    assert(hashes.forall(_ != null))
    assert(hashes.distinct.size == hashes.size,
      s"synthetic classes collided: $hashes")
    assert(Multimodal.dHash64Kernel("not an image".getBytes) == null)
    assert(Multimodal.dHash64Kernel(null) == null)
    assert(Multimodal.dHash64Kernel(Array.emptyByteArray) == null)
  }

  test("mp4Meta round-trips the synthetic ISO-BMFF writer") {
    val bytes = Multimodal.syntheticMp4(1500L, 45000L,
      Seq((1, "vide", 640, 360), (2, "soun", 0, 0), (3, "soun", 0, 0)),
      videoSamples = 750, videoSampleBytes = 4000)
    val m = Multimodal.mp4Meta(bytes)
    assert(m != null)
    assert(m.brand == "isom")
    assert(m.timescale == 1500L)
    assert(m.duration_ms == 30000L) // 45000 ticks / 1500 Hz = 30 s
    assert(m.tracks == 3)
    assert(m.video_width == 640 && m.video_height == 360)
    assert(m.audio_tracks == 2)
    // sample tables: 750 frames x 4000 B = 3 MB over 30 s = 800 kbps
    assert(m.video_samples == 750L)
    assert(m.video_bytes == 3000000L)
    assert(m.video_avg_bitrate_bps == 800000L)
    assert(m.has_chunk_offsets)
    // without sample tables every derived field reads zero/false
    val bare = Multimodal.mp4Meta(Multimodal.syntheticMp4(1500L, 45000L,
      Seq((1, "vide", 640, 360))))
    assert(bare.video_samples == 0L && bare.video_bytes == 0L &&
      bare.video_avg_bitrate_bps == 0L && !bare.has_chunk_offsets)
  }

  test("mp4Meta sums per-sample stsz entries and bounds hostile sample " +
      "tables") {
    // hand-build a variable-size stsz inside a real container: replace
    // the uniform writer output is complex — instead parse a track whose
    // stsz declares MORE entries than fit (truncation must degrade to
    // the entries present, never read OOB)
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload
    val stts = box("stts", be32(0L) ++ be32(2L) ++
      be32(3L) ++ be32(100L) ++ be32(2L) ++ be32(100L)) // 3+2 samples
    // variable sizes 10, 20, 30, but count LIES and claims 1000 entries
    val stsz = box("stsz", be32(0L) ++ be32(0L) ++ be32(1000L) ++
      be32(10L) ++ be32(20L) ++ be32(30L))
    val hdlr = box("hdlr", be32(0L) ++ be32(0L) ++
      "vide".getBytes("US-ASCII") ++ new Array[Byte](12))
    val mdia = box("mdia", hdlr ++ box("minf", box("stbl", stts ++ stsz)))
    val tkhd = box("tkhd", new Array[Byte](84))
    val mvhd = box("mvhd", be32(0L) ++ be32(0L) ++ be32(0L) ++
      be32(1000L) ++ be32(5000L) ++ new Array[Byte](80))
    val file = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512L)) ++
      box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    val m = Multimodal.mp4Meta(file)
    assert(m != null)
    assert(m.video_samples == 5L, m)           // 3 + 2 from stts
    assert(m.video_bytes == 60L, m)            // only the 3 real entries
    assert(!m.has_chunk_offsets)               // no stco/co64
    assert(m.video_avg_bitrate_bps == 60L * 8000L / 5000L)
  }

  test("mp4Meta rejects non-BMFF and truncated payloads as null") {
    assert(Multimodal.mp4Meta(null) == null)
    assert(Multimodal.mp4Meta("plainly not a video container".getBytes) == null)
    assert(Multimodal.mp4Meta(Multimodal.syntheticPng(32, 32)) == null)
    val good = Multimodal.syntheticMp4(1000L, 1000L,
      Seq((1, "vide", 320, 240)), videoSamples = 10, videoSampleBytes = 100)
    // every truncation point: either parses to null or (when only trailing
    // track boxes are lost) degrades — never throws, never reads OOB
    Seq(4, 8, 15, good.length / 2, good.length - 1).foreach { cut =>
      val t = java.util.Arrays.copyOf(good, cut)
      Multimodal.mp4Meta(t) // must not throw
    }
    // a hostile size field (beyond buffer) must not read outside
    val hostile = good.clone()
    hostile(0) = 0x7f.toByte // ftyp size becomes huge
    assert(Multimodal.mp4Meta(hostile) == null)
  }

  test("decodeVideoContainer: distributed parse, null for non-media rows") {
    val rows = Seq(
      (1, Multimodal.syntheticMp4(1000L, 2000L, Seq((1, "vide", 320, 180)))),
      (2, "garbage".getBytes),
      (3, Multimodal.syntheticMp4(2000L, 9000L,
        Seq((1, "vide", 1280, 720), (2, "soun", 0, 0))))
    ).toDF("id", "payload")
    val got = Multimodal.decodeVideoContainer(rows, "payload")
      .select("id", "video.duration_ms", "video.video_width",
        "video.audio_tracks")
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else (r.getLong(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got(1) == (2000L, 320, 0))
    assert(got(2) == null)
    assert(got(3) == (4500L, 1280, 1))
  }

  test("imageDupPairs: exactly the same-pixel pairs, no byte-format help") {
    // 3 classes × (png + bmp): each class yields exactly its 1 cross-format pair
    val rows = for {
      (dims, cls) <- Seq((20, 16), (28, 16), (20, 24)).zipWithIndex
      (fmt, i) <- Seq("png", "bmp").zipWithIndex
    } yield (cls * 10 + i, Multimodal.syntheticImage(dims._1, dims._2, fmt))
    val df = rows.toDF("id", "payload")
    val pairs = Multimodal.imageDupPairs(df, "id", "payload")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs == Set((0, 1), (10, 11), (20, 21)))
  }

  test("pngMeta: decode-free header walk on real ImageIO bytes; hostile " +
      "chunk lengths stop the walk without reading out of bounds") {
    val bytes = Multimodal.syntheticPng(20, 11)
    val m = Multimodal.pngMeta(bytes)
    assert(m != null)
    assert((m.width, m.height, m.bit_depth, m.color_type, m.interlace) ==
      ((20L, 11L, 8, 2, 0)), m.toString)
    assert(m.has_iend && m.n_chunks >= 3 && m.idat_bytes > 0 &&
      !m.has_alpha)
    // agreement with the real decoder on dims
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 20 && img.getHeight == 11)
    // not a PNG
    assert(Multimodal.pngMeta("JFIF-not-png".getBytes ++ bytes) == null)
    assert(Multimodal.pngMeta(null) == null)
    assert(Multimodal.pngMeta(bytes.take(20)) == null)
    // hostile: blow up the first post-IHDR chunk's length field
    val evil = bytes.clone()
    val pos = 8 + 8 + 13 + 4 // second chunk's length field
    evil(pos) = 0x7f.toByte; evil(pos + 1) = 0xff.toByte
    evil(pos + 2) = 0xff.toByte; evil(pos + 3) = 0xff.toByte
    val t = Multimodal.pngMeta(evil)
    assert(t != null && !t.has_iend && t.width == 20L,
      "truncation must surface as has_iend=false with parsed prefix")
    // truncated mid-chunk-payload: same contract
    val cut = Multimodal.pngMeta(bytes.dropRight(5))
    assert(cut != null && !cut.has_iend)
  }


  test("jpegMeta: decode-free SOF walk on real ImageIO bytes; EXIF " +
      "detection; hostile/truncated segments degrade, non-JPEG nulls") {
    val bytes = Multimodal.syntheticImage(33, 17, "jpg")
    val m = Multimodal.jpegMeta(bytes)
    assert(m != null)
    assert((m.width, m.height, m.precision, m.components,
      m.progressive) == ((33, 17, 8, 3, false)), m.toString)
    assert(m.n_segments >= 4 && !m.has_exif)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 33 && img.getHeight == 17)
    // plant an APP1/Exif segment right after SOI
    val exifSeg = Array[Byte](0xff.toByte, 0xe1.toByte, 0x00, 0x08) ++
      "Exif".getBytes ++ Array[Byte](0, 0)
    val withExif = bytes.take(2) ++ exifSeg ++ bytes.drop(2)
    val me = Multimodal.jpegMeta(withExif)
    assert(me != null && me.has_exif && me.width == 33)
    // non-JPEG and truncated-before-SOF payloads null out
    assert(Multimodal.jpegMeta(null) == null)
    assert(Multimodal.jpegMeta("PNG-not-jpeg".getBytes) == null)
    assert(Multimodal.jpegMeta(bytes.take(4)) == null)
    // hostile: blow the first segment's length past the buffer AFTER a
    // SOF was seen -> keep parsed metadata; BEFORE any SOF -> null
    val idx = bytes.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(idx > 0, "fixture must contain SOF0")
    val evil = bytes.take(idx + 10) // cut mid-SOF-payload region
    val t = Multimodal.jpegMeta(evil)
    assert(t == null || t.width == 33,
      "truncation returns parsed metadata or null, never garbage")
  }


  test("mp3Meta: frame walk on spec-shaped headers; ID3v2 skip by " +
      "synchsafe size; truncation keeps counted frames; junk nulls") {
    val bytes = Multimodal.syntheticMp3(brIdx = 9, srIdx = 0,
      mono = false, frames = 5, id3Pad = -1)
    val m = Multimodal.mp3Meta(bytes)
    assert(m != null)
    assert((m.bitrate_kbps, m.sample_rate, m.channels, m.n_frames,
      m.has_id3) == ((128, 44100, 2, 5L, false)), m.toString)
    assert(m.duration_ms == 5L * 1152 * 1000 / 44100)
    // ID3v2-prefixed mono variant
    val withId3 = Multimodal.syntheticMp3(3, 1, mono = true, frames = 2,
      id3Pad = 40)
    val mi = Multimodal.mp3Meta(withId3)
    assert(mi != null && mi.has_id3 && mi.channels == 1 &&
      mi.sample_rate == 48000 && mi.bitrate_kbps == 48 &&
      mi.n_frames == 2L)
    // truncated mid-frame: the complete frames still count
    val cut = Multimodal.mp3Meta(bytes.dropRight(10))
    assert(cut != null && cut.n_frames == 4L, cut.toString)
    // junk / null / ID3 longer than the buffer
    assert(Multimodal.mp3Meta(null) == null)
    assert(Multimodal.mp3Meta("RIFF-not-mp3-at-all".getBytes) == null)
    val evilId3 = withId3.clone()
    evilId3(8) = 0x7f.toByte; evilId3(9) = 0x7f.toByte
    assert(Multimodal.mp3Meta(evilId3) == null,
      "hostile ID3 size past the buffer must null, not read OOB")
  }

  test("gifMeta: block walk round-trips the synthetic writer; truncation " +
    "and hostile sub-block lengths bound the walk") {
    val g = Multimodal.gifMeta(Multimodal.syntheticGif(320, 200, 3, 5, 2))
    assert(g == Multimodal.GifMeta(320, 200, 32, 3, 2,
      animated = true, has_trailer = true))
    val still = Multimodal.gifMeta(Multimodal.syntheticGif(8, 8, 1, 0, 0))
    assert(still.gct_entries == 0 && !still.animated && still.has_trailer)
    // truncated mid-frame: frames seen so far kept, trailer false
    val full = Multimodal.syntheticGif(16, 16, 4, 0, 1)
    val cut = Multimodal.gifMeta(full.take(full.length - 12))
    assert(cut != null && !cut.has_trailer && cut.n_frames < 4)
    // hostile: a sub-block length pointing past the buffer must stop
    val evil = Multimodal.syntheticGif(16, 16, 1, 0, 0).clone()
    evil(13 + 10 + 1) = 0xff.toByte // LZW sub-block len -> way past end
    val em = Multimodal.gifMeta(evil)
    assert(em != null && !em.has_trailer)
    assert(Multimodal.gifMeta("GIF89x junk".getBytes) == null)
    assert(Multimodal.gifMeta(null) == null)
  }

  test("flacMeta: STREAMINFO bit unpack round-trips the writer; hostile " +
    "block length bounds the walk") {
    val f = Multimodal.flacMeta(
      Multimodal.syntheticFlac(44100, 2, 16, 441000L, 2))
    assert(f == Multimodal.FlacMeta(44100, 2, 16, 441000L, 10000L, 3,
      saw_last_block = true))
    // 36-bit total-sample boundary value survives the pack/unpack
    val big = Multimodal.flacMeta(
      Multimodal.syntheticFlac(96000, 8, 32, (1L << 36) - 1, 0))
    assert(big.total_samples == (1L << 36) - 1 && big.channels == 8 &&
      big.bits_per_sample == 32 && big.n_blocks == 1)
    // hostile: PADDING length past the buffer ends the walk un-finalized
    val evil = Multimodal.syntheticFlac(8000, 1, 16, 100L, 1).clone()
    evil(8 + 34 + 1) = 0x7f.toByte // pad block len 0x7f0004 -> OOB
    val em = Multimodal.flacMeta(evil)
    assert(em != null && !em.saw_last_block && em.n_blocks == 1)
    assert(Multimodal.flacMeta("fLaX not flac".getBytes) == null)
    assert(Multimodal.flacMeta(null) == null)
  }

  test("tiffMeta: both byte orders round-trip; truncated IFD keeps the " +
    "entries parsed before the cut") {
    val le = Multimodal.tiffMeta(
      Multimodal.syntheticTiff(littleEndian = true, 800L, 600L, 6, withExif = true))
    assert(le == Multimodal.TiffMeta(little_endian = true, 4, 800L, 600L,
      6, has_exif_ifd = true))
    val be = Multimodal.tiffMeta(
      Multimodal.syntheticTiff(littleEndian = false, 31L, 17L, 1, withExif = false))
    assert(be == Multimodal.TiffMeta(little_endian = false, 3, 31L, 17L,
      1, has_exif_ifd = false))
    // truncate inside the third entry: only the first two survive
    val full = Multimodal.syntheticTiff(littleEndian = true, 9L, 9L, 3,
      withExif = false)
    val cut = Multimodal.tiffMeta(full.take(10 + 2 * 12 + 5))
    assert(cut != null && cut.n_entries == 2 && cut.width == 9L &&
      cut.orientation == 0)
    // hostile IFD offset past the buffer
    val evil = full.clone()
    evil(4) = 0xff.toByte; evil(5) = 0xff.toByte
    assert(Multimodal.tiffMeta(evil) == null)
    assert(Multimodal.tiffMeta("XXno tiff".getBytes) == null)
    assert(Multimodal.tiffMeta(null) == null)
  }

  test("wavMeta: fixture arithmetic roundtrip, word alignment, hostile " +
    "size field flags truncation, non-RIFF is null") {
    val b = Multimodal.syntheticRiffWav(channels = 2, sampleRate = 8000,
      bits = 16, nSamples = 100, nFillerChunks = 2)
    val m = Multimodal.wavMeta(b)
    assert(m.audio_format == 1 && m.channels == 2 &&
      m.sample_rate == 8000 && m.bits_per_sample == 16 &&
      m.byte_rate == 32000 && m.data_bytes == 400L &&
      m.duration_ms == 400L * 1000 / 32000 &&
      m.n_chunks == 4 && !m.truncated)
    // hostile: declared data size beyond the buffer
    val cut = b.take(b.length - 10)
    assert(Multimodal.wavMeta(cut).truncated)
    assert(Multimodal.wavMeta("notariff-atall!!".getBytes) == null)
    assert(Multimodal.wavMeta(null) == null)
  }

  test("webpMeta: VP8X roundtrip with feature flags, VP8-only payload " +
    "reads frame-header dims, truncation flagged, non-WEBP null") {
    val full = Multimodal.syntheticWebp(320, 240, alpha = true,
      animated = false, exif = true)
    val m = Multimodal.webpMeta(full)
    assert(m.variant == "VP8X" && m.width == 320 && m.height == 240 &&
      m.has_alpha && !m.animated && m.has_exif && !m.has_icc &&
      m.n_chunks == 4 && !m.truncated)
    // strip the VP8X container down to a bare VP8 chunk payload
    val bare = Multimodal.syntheticWebp(100, 50, alpha = false,
      animated = false, exif = false)
    val b = Multimodal.webpMeta(bare)
    assert(b.n_chunks == 2 && b.variant == "VP8X" &&
      b.width == 100 && b.height == 50)
    assert(Multimodal.webpMeta(full.take(full.length - 6)).truncated)
    assert(Multimodal.webpMeta("RIFFxxxxWAVE".getBytes) == null)
    assert(Multimodal.webpMeta(null) == null)
  }

  test("bmpMeta: bottom-up and top-down roundtrips, declared-offset " +
    "truncation, non-BMP null") {
    val up = Multimodal.bmpMeta(Multimodal.syntheticBmp(17, 9, 24,
      topDown = false))
    assert(up.width == 17 && up.height == 9 && !up.top_down &&
      up.bits_per_pixel == 24 && up.compression == 0 &&
      up.data_offset == 54L && up.dib_header_size == 40 && !up.truncated)
    val down = Multimodal.bmpMeta(Multimodal.syntheticBmp(17, 9, 8,
      topDown = true))
    assert(down.top_down && down.height == 9,
      "negative height must surface as top_down with the magnitude")
    // header intact but the declared pixel offset overruns the buffer
    val cut = Multimodal.syntheticBmp(17, 9, 24, topDown = false).take(50)
    assert(Multimodal.bmpMeta(cut) == null, "DIB header itself cut")
    val cut2 = Multimodal.syntheticBmp(64, 64, 32, topDown = false)
      .take(56)
    assert(Multimodal.bmpMeta(cut2) != null,
      "54-byte header + 2 pixel bytes parses")
    assert(Multimodal.bmpMeta("GIF89a-not-a-bmp".getBytes) == null)
    assert(Multimodal.bmpMeta(null) == null)
  }

  test("aviMeta: avih timing/dims roundtrip, word-aligned odd movi, " +
    "truncation flagged, non-AVI null") {
    val b = Multimodal.syntheticAvi(40000, 250, 2, 640, 480, 101)
    val m = Multimodal.aviMeta(b)
    assert(m.us_per_frame == 40000L && m.total_frames == 250L &&
      m.n_streams == 2 && m.width == 640 && m.height == 480 &&
      m.movi_bytes == 101L && m.n_chunks == 2 && !m.truncated)
    assert(m.fps_permille == 1000000000L / 40000) // 25.000 fps
    assert(m.duration_ms == 250L * 40000 / 1000) // 10 s
    assert(Multimodal.aviMeta(b.take(b.length - 20)).truncated)
    assert(Multimodal.aviMeta(Multimodal.syntheticRiffWav(
      1, 8000, 16, 10, 0)) == null, "RIFF/WAVE is not RIFF/AVI")
    assert(Multimodal.aviMeta(null) == null)
  }

  test("tarMeta: member census and declared volumes roundtrip, cut " +
    "payload flags truncation, non-tar null") {
    val b = Multimodal.syntheticTar(2, 600, 100, withDir = true)
    val m = Multimodal.tarMeta(b)
    assert(m.n_entries == 3 && m.n_files == 2 && m.n_dirs == 1,
      m.toString)
    assert(m.total_size == 1300L && m.max_size == 700L && !m.truncated)
    // cut inside the second member's 700-byte payload (data ends at
    // offset 3260; keeping 3000 bites into it)
    assert(Multimodal.tarMeta(b.take(3000)).truncated)
    assert(Multimodal.tarMeta(Array.fill[Byte](600)(7)) == null,
      "no ustar magic -> null")
    assert(Multimodal.tarMeta(null) == null)
  }

  test("zipMeta: STORED central-directory census, damaged directory " +
    "flags truncation, no EOCD -> null") {
    val b = Multimodal.syntheticZip(3, 100, 10)
    val m = Multimodal.zipMeta(b)
    assert(m.n_entries == 3 && m.total_uncompressed == 330L &&
      m.total_compressed == 330L && m.ratio_permille == 1000L &&
      !m.truncated, m.toString)
    // corrupt the first central-directory signature
    val cut = b.clone()
    var i = 0
    var found = -1
    while (found < 0 && i < cut.length - 3) {
      if (cut(i) == 'P' && cut(i + 1) == 'K' && cut(i + 2) == 1 &&
        cut(i + 3) == 2) found = i
      i += 1
    }
    cut(found) = 'X'
    assert(Multimodal.zipMeta(cut).truncated)
    assert(Multimodal.zipMeta("no archive here at all!!!".getBytes)
      == null)
    assert(Multimodal.zipMeta(null) == null)
  }

  test("gzipMeta: synthetic FNAME/mtime/isize roundtrip; a REAL gzip " +
    "stream reports its true uncompressed size; truncation and " +
    "non-gzip handled") {
    val b = Multimodal.syntheticGzip("a.txt", 123456789L, 40, 5000L)
    val m = Multimodal.gzipMeta(b)
    assert(m.has_name && m.name == "a.txt" && m.mtime == 123456789L &&
      m.os == 3 && m.isize == 5000L && !m.truncated, m.toString)
    assert(m.compressed_len == (10 + 6 + 40 + 8).toLong)
    // real gzip: java's GZIPOutputStream writes a genuine trailer
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(Array.tabulate[Byte](100)(i => (i * 3).toByte)); gz.close()
    val real = Multimodal.gzipMeta(bos.toByteArray)
    assert(real.isize == 100L && !real.has_name && !real.truncated,
      real.toString)
    assert(Multimodal.gzipMeta(b.take(20)).truncated,
      "header intact but the trailer is gone")
    assert(Multimodal.gzipMeta("definitely not gzip".getBytes) == null)
    assert(Multimodal.gzipMeta(null) == null)
  }

  test("oggMeta: ident-header fields, page census, EOS granule -> " +
    "exact duration, truncation flagged, non-OGG null") {
    val b = Multimodal.syntheticOgg(2, 44100, 128000, 3, 441000L)
    val m = Multimodal.oggMeta(b)
    assert(m.channels == 2 && m.sample_rate == 44100 &&
      m.bitrate_nominal == 128000 && m.n_pages == 5 &&
      m.last_granule == 441000L && m.has_eos && !m.truncated)
    assert(m.duration_ms == 441000L * 1000 / 44100) // exactly 10 s
    val cut = Multimodal.oggMeta(b.take(b.length - 3))
    assert(cut.truncated && cut.n_pages == 4, "EOS page body cut")
    assert(Multimodal.oggMeta("not-an-ogg-stream-at-all!!!".getBytes)
      == null)
    assert(Multimodal.oggMeta(null) == null)
  }

  test("parquetFooterMeta: synthetic thrift-compact footer roundtrips") {
    val b = Multimodal.syntheticParquet(nCols = 3, nGroups = 2,
      rowsPer = 10L, base = 100L, step = 7L)
    val m = Multimodal.parquetFooterMeta(b)
    assert(m.version == 2 && m.n_schema == 4 && m.n_row_groups == 2 &&
      m.n_columns == 3, m.toString)
    assert(m.num_rows == 20L && m.total_byte_size == 207L)
    assert(m.created_by == "graft-synth 1.0" && !m.truncated)
    // a 15+-element list exercises the long-form list header
    val wide = Multimodal.parquetFooterMeta(Multimodal.syntheticParquet(
      nCols = 20, nGroups = 1, rowsPer = 1L, base = 1L, step = 0L))
    assert(wide.n_columns == 20 && wide.n_schema == 21 && !wide.truncated)
  }

  test("parquetFooterMeta: hostile inputs degrade to truncated/null, never throw") {
    val b = Multimodal.syntheticParquet(2, 1, 5L, 50L, 0L)
    // tail magic gone -> not a parquet file
    assert(Multimodal.parquetFooterMeta(b.take(b.length - 2)) == null)
    assert(Multimodal.parquetFooterMeta("PAR1junk".getBytes) == null)
    assert(Multimodal.parquetFooterMeta(null) == null)
    // footer length pointing before the file start
    val badLen = b.clone()
    badLen(b.length - 8) = 0xff.toByte
    badLen(b.length - 7) = 0xff.toByte
    badLen(b.length - 6) = 0xff.toByte
    assert(Multimodal.parquetFooterMeta(badLen).truncated)
    // unbounded varint in the footer region (10+ continuation bytes)
    val hostile = "PAR1".getBytes ++ Array.fill[Byte](16)(0xff.toByte) ++
      Array[Byte](16, 0, 0, 0) ++ "PAR1".getBytes
    assert(Multimodal.parquetFooterMeta(hostile).truncated)
  }

  test("parquetFooterMeta parses a REAL pyarrow-written parquet footer") {
    val path = java.nio.file.Paths.get("/root/testdata/sf0.001/region.parquet")
    assume(java.nio.file.Files.exists(path))
    val m = Multimodal.parquetFooterMeta(java.nio.file.Files.readAllBytes(path))
    assert(m != null && !m.truncated, s"$m")
    assert(m.num_rows == 5L, m.toString) // region has 5 rows at every sf
    assert(m.n_row_groups >= 1 && m.n_columns >= 2, m.toString)
    assert(m.n_schema == m.n_columns + 1, m.toString) // flat root schema
    assert(m.total_byte_size > 0L)
    assert(m.created_by != null && m.created_by.nonEmpty)
  }

  test("pdfMeta: page/object census roundtrips through the xref walk; " +
    "encrypt + linearized flags; cut xref flags truncation; non-PDF null") {
    val b = Multimodal.syntheticPdf(5, encrypted = false,
      linearized = false)
    val m = Multimodal.pdfMeta(b)
    assert(m.version_major == 1 && m.version_minor == 7, m.toString)
    assert(m.n_pages == 5 && m.n_objects == 7, m.toString) // 5p+cat+pages
    assert(!m.encrypted && !m.linearized && m.n_updates == 0 &&
      !m.xref_stream && !m.truncated, m.toString)
    val enc = Multimodal.pdfMeta(
      Multimodal.syntheticPdf(2, encrypted = true, linearized = true))
    assert(enc.encrypted && enc.linearized && enc.n_pages == 2 &&
      enc.n_objects == 6 && !enc.truncated, enc.toString)
    // cut inside the xref table: header survives, walk flags truncated
    assert(Multimodal.pdfMeta(b.take(b.length - 40)).truncated,
      "cut tail must flag truncation")
    assert(Multimodal.pdfMeta("%PDF-1.4\njunk with no startxref %%EOF"
      .getBytes("ISO-8859-1") ++ new Array[Byte](32)).truncated)
    assert(Multimodal.pdfMeta(Array.fill[Byte](64)(7)) == null,
      "no %PDF magic -> null")
    assert(Multimodal.pdfMeta(null) == null)
  }

  test("pdfMeta: hostile startxref/Prev offsets are bounds-checked, " +
    "xref-stream files report honestly instead of inflating") {
    val b = Multimodal.syntheticPdf(3, encrypted = false,
      linearized = false)
    val s = new String(b, "ISO-8859-1")
    // point startxref far past the buffer
    val hostile = s.replaceAll("startxref\n\\d+",
      "startxref\n999999999").getBytes("ISO-8859-1")
    assert(Multimodal.pdfMeta(hostile).truncated)
    // a /Prev loop back to the same xref terminates via the 16-rev cap
    val loop = s.replace("/Root 1 0 R",
      s"/Root 1 0 R /Prev ${s.indexOf("xref\n")}").getBytes("ISO-8859-1")
    val lm = Multimodal.pdfMeta(loop)
    assert(lm != null && lm.n_updates >= 1, String.valueOf(lm))
    // an xref STREAM target ("N 0 obj" at startxref) is reported, not
    // parsed: entries may be Flate-compressed
    val xs = s.replaceAll("startxref\n\\d+",
      "startxref\n" + s.indexOf("1 0 obj")).getBytes("ISO-8859-1")
    val xm = Multimodal.pdfMeta(xs)
    assert(xm.xref_stream && !xm.truncated, xm.toString)
  }

  test("avroMeta: OCF metadata map + block census roundtrips the " +
    "writer; truncation and sync damage flagged; non-Avro null") {
    val b = Multimodal.syntheticAvro(3, 10, 7, deflate = false,
      recordName = "evt")
    val m = Multimodal.avroMeta(b)
    assert(m.n_meta_entries == 2 && m.codec == "null" &&
      m.schema_type == "record" && m.record_name == "evt", m.toString)
    // rows: 10 + 17 + 24 = 51; bytes = 3x rows
    assert(m.n_blocks == 3 && m.total_rows == 51L &&
      m.total_block_bytes == 153L && m.max_block_rows == 24L &&
      !m.truncated, m.toString)
    val d = Multimodal.avroMeta(
      Multimodal.syntheticAvro(1, 5, 0, deflate = true, recordName = "x"))
    assert(d.codec == "deflate" && d.n_blocks == 1 && d.total_rows == 5L,
      d.toString)
    // cut inside the last block payload: earlier blocks survive
    val cut = Multimodal.avroMeta(b.take(b.length - 20))
    assert(cut != null && cut.truncated && cut.n_blocks == 2,
      String.valueOf(cut))
    // damage the trailing sync marker: census stops, flags truncated
    val dmg = b.clone(); dmg(dmg.length - 1) = (dmg.last ^ 0x5a).toByte
    assert(Multimodal.avroMeta(dmg).truncated)
    // hostile varint: all continuation bits -> overlong guard
    val hostile = Array[Byte]('O', 'b', 'j', 1) ++
      Array.fill[Byte](24)(0x80.toByte)
    assert(Multimodal.avroMeta(hostile).truncated)
    // hostile varint that DECODES (10 bytes, shift lands exactly on 63)
    // to Long.MaxValue: `pos + len` would wrap negative and pass an
    // addition-form bounds check -> String/array OOB crash; the
    // subtraction-form guards must flag truncated instead
    val maxVar = Array[Byte](0xfe.toByte) ++
      Array.fill[Byte](8)(0xff.toByte) :+ 0x01.toByte
    val hugeKey = Array[Byte]('O', 'b', 'j', 1, 2) ++ maxVar ++
      Array.fill[Byte](16)(0x00) // map cnt=1; padding past the 20-byte min
    assert(Multimodal.avroMeta(hugeKey).truncated, "huge klen must flag")
    val hugeBlock = Array[Byte]('O', 'b', 'j', 1, 0) ++ // empty meta map
      Array.fill[Byte](16)(0x11) ++ Array[Byte](2) ++ maxVar // rc=1, bs=MAX
    assert(Multimodal.avroMeta(hugeBlock).truncated, "huge bs must flag")
    assert(Multimodal.avroMeta("not avro at all, really".getBytes) == null)
    assert(Multimodal.avroMeta(null) == null)
  }

  test("docContainerMeta: DOCX kind sniff + part census roundtrips the " +
    "writer; plain ZIP stays 'zip'; damage flagged; non-ZIP null") {
    val b = Multimodal.syntheticDocx(2, 200, 1500)
    val m = Multimodal.docContainerMeta(b)
    assert(m.kind == "docx" && m.n_parts == 6 && m.n_xml_parts == 4,
      m.toString)
    assert(m.content_bytes == 1500L &&
      m.total_uncompressed == 270L + 1500L + 200L + 211L && !m.truncated,
      m.toString) // media: 200 + 211
    assert(m.mimetype == null, "docx has no stored mimetype entry")
    // a generic STORED zip is kind 'zip' with zero content bytes
    val z = Multimodal.docContainerMeta(Multimodal.syntheticZip(3, 50, 13))
    assert(z.kind == "zip" && z.n_parts == 3 && z.content_bytes == 0L,
      z.toString)
    // cut inside the central directory: truncated, never out-of-bounds
    assert(Multimodal.docContainerMeta(
      java.util.Arrays.copyOfRange(b, 0, b.length - 30)) == null ||
      Multimodal.docContainerMeta(
        java.util.Arrays.copyOfRange(b, 0, b.length - 30)).truncated)
    assert(Multimodal.docContainerMeta("PK no directory".getBytes) == null)
    assert(Multimodal.docContainerMeta(null) == null)
  }

  test("docContainerMeta: XLSX and PPTX kinds sniff from their part " +
    "roots; content sums worksheets/slides only") {
    val x = Multimodal.docContainerMeta(Multimodal.syntheticXlsx(2, 300))
    assert(x.kind == "xlsx" && x.n_parts == 5 && x.n_xml_parts == 5,
      x.toString)
    // sheets: 300 + 313 = 613; fixed parts 100+110+70 = 280
    assert(x.content_bytes == 613L && x.total_uncompressed == 893L &&
      !x.truncated, x.toString)
    val p = Multimodal.docContainerMeta(Multimodal.syntheticPptx(3, 400))
    assert(p.kind == "pptx" && p.n_parts == 5 && p.n_xml_parts == 5,
      p.toString)
    // slides: 400 + 419 + 438 = 1257; fixed 100 + 130 = 230
    assert(p.content_bytes == 1257L && p.total_uncompressed == 1487L,
      p.toString)
  }

  test("docContainerMeta: EPUB mimetype reads from the STORED local " +
    "header; chapter volume sums xhtml parts only") {
    val b = Multimodal.syntheticEpub(3, 800)
    val m = Multimodal.docContainerMeta(b)
    assert(m.kind == "epub" && m.mimetype == "application/epub+zip",
      m.toString)
    assert(m.n_parts == 6 && m.n_xml_parts == 5, m.toString)
    // chapters: 800 + 817 + 834 = 2451
    assert(m.content_bytes == 2451L &&
      m.total_uncompressed == 290L + 2451L && !m.truncated, m.toString)
  }

  test("zstdMeta: frame/block census roundtrips the RFC 8878 writer; " +
    "skippable frames censused; declared content summed") {
    val b = Multimodal.syntheticZstd(2, 4, 10, withChecksum = true,
      withSkippable = true)
    val m = Multimodal.zstdMeta(b)
    assert(m.n_frames == 2 && m.n_skippable == 1 &&
      m.skippable_bytes == 8L, m.toString)
    // per frame: comp 10, comp 17, RLE (1 payload, declared 10), comp 31
    assert(m.n_blocks == 8 && m.n_compressed_blocks == 6 &&
      m.n_rle_blocks == 2 && m.n_raw_blocks == 0, m.toString)
    assert(m.content_size == 2031L, m.toString) // 1000 + 1031
    assert(m.total_payload_bytes == 118L && m.max_block_size == 31L,
      m.toString) // (10+17+1+31) x 2
    assert(m.window_max == 8192L && m.has_checksum && m.dict_id == 0L &&
      !m.truncated, m.toString)
    val plain = Multimodal.zstdMeta(
      Multimodal.syntheticZstd(1, 1, 5, withChecksum = false,
        withSkippable = false))
    assert(plain.n_frames == 1 && plain.n_skippable == 0 &&
      !plain.has_checksum && plain.content_size == 1000L, plain.toString)
  }

  test("zstdMeta: absent content size -> -1; single-segment window = " +
    "content; hostile sizes and cuts flag truncated; non-zstd null") {
    // hand-built frame, fcsFlag=0, NOT single-segment: no FCS field
    val noFcs = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0x00, 0x18) ++ // FHD, window descriptor
      Array[Byte](0x11, 0x00, 0x00, 1, 2) // raw last block, size 2
    val nf = Multimodal.zstdMeta(noFcs)
    assert(nf.content_size == -1L && nf.n_raw_blocks == 1 &&
      !nf.truncated, nf.toString)
    // single-segment: 1-byte FCS doubles as the window size
    val ss = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0x20, 42) ++ // FHD single-segment, FCS=42 (no window byte)
      Array[Byte](0x11, 0x00, 0x00, 7, 8) // raw last block, size 2
    val sm = Multimodal.zstdMeta(ss)
    assert(sm.content_size == 42L && sm.window_max == 42L &&
      !sm.truncated, sm.toString)
    // reserved FHD bit set -> corrupt
    assert(Multimodal.zstdMeta(Array[Byte](0x28, 0xb5.toByte, 0x2f,
      0xfd.toByte, 0x08, 0x18, 0x01, 0x00, 0x00)).truncated)
    // hostile block size (0x1FFFFF) far past the buffer
    assert(Multimodal.zstdMeta(Array[Byte](0x28, 0xb5.toByte, 0x2f,
      0xfd.toByte, 0x00, 0x18, 0xfc.toByte, 0xff.toByte,
      0xff.toByte)).truncated)
    // cut mid-payload and mid-skippable
    val b = Multimodal.syntheticZstd(2, 3, 20, withChecksum = false,
      withSkippable = false)
    val cut = Multimodal.zstdMeta(b.take(b.length - 5))
    assert(cut.truncated && cut.n_frames == 1, cut.toString)
    assert(Multimodal.zstdMeta(Array[Byte](0x50, 0x2a, 0x4d, 0x18,
      0x20, 0x00, 0x00, 0x00)).truncated) // skippable declares 32, has 0
    assert(Multimodal.zstdMeta("plain text, not zstd".getBytes) == null)
    assert(Multimodal.zstdMeta(null) == null)
  }

  test("orcMeta: postscript + footer stripe/type census roundtrips the " +
    "writer, uncompressed and original-chunk zlib layouts") {
    val m = Multimodal.orcMeta(Multimodal.syntheticOrc(3, 100,
      zlib = false))
    assert(m.compression == "none" && m.writer_version == 9L &&
      m.metadata_length == 0L && m.footer_parsed && !m.truncated,
      m.toString)
    // stripes: rows 100/117/134, data 100/113/126, index 20/21/22
    assert(m.n_stripes == 3 && m.stripe_rows == 351L &&
      m.max_stripe_rows == 134L && m.total_rows == 351L, m.toString)
    assert(m.data_bytes == 339L && m.index_bytes == 63L, m.toString)
    assert(m.n_types == 3 && m.n_root_fields == 2 &&
      m.row_index_stride == 10000L && m.content_length == 387L,
      m.toString)
    // zlib postscript with the footer in one ORIGINAL chunk still parses
    val z = Multimodal.orcMeta(Multimodal.syntheticOrc(2, 50,
      zlib = true))
    assert(z.compression == "zlib" &&
      z.compression_block_size == 262144L && z.footer_parsed &&
      z.n_stripes == 2 && z.stripe_rows == 117L && !z.truncated,
      z.toString)
  }

  test("orcMeta: hostile declared footer length flags truncated; cuts " +
    "and non-ORC bytes never throw") {
    // hand-built postscript declaring footerLength=200 in a 14-byte file
    val ps = Array[Byte](0x08, 0xc8.toByte, 0x01) ++ // field 1 = 200
      Array[Byte](0x82.toByte, 0xf4.toByte, 0x03, 3) ++ // field 8000, len 3
      "ORC".getBytes("US-ASCII")
    val hostile = "ORC".getBytes("US-ASCII") ++ ps :+ ps.length.toByte
    val hm = Multimodal.orcMeta(hostile)
    assert(hm != null && hm.truncated && !hm.footer_parsed, String.valueOf(hm))
    val b = Multimodal.syntheticOrc(2, 40, zlib = false)
    // cut the tail: postscript length byte now points into garbage —
    // null (no magic field) or truncated, never an exception
    val cut = Multimodal.orcMeta(b.take(b.length - 6))
    assert(cut == null || cut.truncated, String.valueOf(cut))
    assert(Multimodal.orcMeta("ORC but not really a file".getBytes) == null
      || Multimodal.orcMeta("ORC but not really a file".getBytes).truncated)
    assert(Multimodal.orcMeta("parquet, actually".getBytes) == null)
    assert(Multimodal.orcMeta(null) == null)
  }

  test("heifMeta: ftyp brand + iinf count + ispe dims roundtrip the " +
    "writer for heic and avif; cuts flag truncated; non-HEIF null") {
    val m = Multimodal.heifMeta(Multimodal.syntheticHeif(3, 320, 240,
      avif = false))
    assert(m.brand == "heic" && m.n_compat_brands == 2 &&
      m.n_items == 3L, m.toString)
    assert(m.width == 320L && m.height == 240L && m.max_width == 328L &&
      m.max_height == 246L && m.n_ispe == 3 && !m.truncated, m.toString)
    val a = Multimodal.heifMeta(Multimodal.syntheticHeif(1, 64, 64,
      avif = true))
    assert(a.brand == "avif" && a.n_items == 1L && a.width == 64L &&
      a.n_ispe == 1, a.toString)
    // cut inside the meta box: the brand survives, truncated flags
    val b = Multimodal.syntheticHeif(2, 100, 80, avif = false)
    val cut = Multimodal.heifMeta(b.take(b.length - 10))
    assert(cut != null && cut.truncated, String.valueOf(cut))
    // a plain MP4 (brand isom) is mp4Meta's business -> null here
    assert(Multimodal.heifMeta(Multimodal.syntheticMp4(1000L, 5000L,
      Seq((1, "vide", 640, 480)))) == null)
    assert(Multimodal.heifMeta("ftypnope".getBytes) == null)
    assert(Multimodal.heifMeta(null) == null)
  }

  test("warcMeta: record/type/URI census roundtrips the ISO 28500 " +
    "writer; cut payloads and hostile lengths flag truncated") {
    val b = Multimodal.syntheticWarc(3, 100, withInfo = true)
    val m = Multimodal.warcMeta(b)
    assert(m.version == "1.0" && m.n_records == 7 && m.n_warcinfo == 1 &&
      m.n_response == 3 && m.n_request == 3 && m.n_other == 0,
      m.toString)
    // content: 40 + (20+23+26) + (100+109+118) = 436
    assert(m.content_bytes == 436L && m.max_content_length == 118L,
      m.toString)
    // uri 'http://h<i%5>.example.com/p<i>' = 24 chars for i<10, x2 types
    assert(m.n_with_uri == 6 && m.uri_bytes == 144L && !m.truncated,
      m.toString)
    val noInfo = Multimodal.warcMeta(
      Multimodal.syntheticWarc(1, 50, withInfo = false))
    assert(noInfo.n_records == 2 && noInfo.n_warcinfo == 0 &&
      noInfo.content_bytes == 70L, noInfo.toString)
    // cut inside the last payload: earlier records survive, flag set
    val cut = Multimodal.warcMeta(b.take(b.length - 30))
    assert(cut.truncated && cut.n_records == 6, cut.toString)
    // hostile declared Content-Length far past the buffer
    val hostile = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999999999\r\n\r\nxx").getBytes("ISO-8859-1")
    assert(Multimodal.warcMeta(hostile).truncated)
    // non-numeric Content-Length is hostile, not a crash
    val bad = ("WARC/1.0\r\nContent-Length: 12junk\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(Multimodal.warcMeta(bad).truncated)
    assert(Multimodal.warcMeta("HTTP/1.1 200 OK\r\n\r\n".getBytes) == null)
    assert(Multimodal.warcMeta(null) == null)
  }

  test("icoMeta: ICONDIR census roundtrips the writer — 0-byte = 256, " +
    "PNG sniff at declared offsets; hostile offsets flag truncated") {
    val m = Multimodal.icoMeta(Multimodal.syntheticIco(4, 20))
    assert(m.kind == "icon" && m.n_images == 4 && !m.truncated, m.toString)
    assert(m.max_width == 256 && m.max_height == 256 && m.max_bpp == 32,
      m.toString)
    // even entries carry PNG magic: entries 0, 2
    assert(m.n_png_entries == 2, m.toString)
    // payloads: 20 + 60 + 100 + 140 = 320
    assert(m.total_image_bytes == 320L, m.toString)
    // cut inside the entry table: truncated, survivors censused
    val b = Multimodal.syntheticIco(3, 16)
    val cut = Multimodal.icoMeta(b.take(6 + 16 * 2 + 4))
    assert(cut.truncated && cut.n_images == 2, cut.toString)
    // hostile declared offset past the buffer: flagged, no crash
    val dmg = b.clone()
    dmg(6 + 12) = 0xff.toByte; dmg(6 + 13) = 0xff.toByte
    dmg(6 + 14) = 0xff.toByte; dmg(6 + 15) = 0x7f.toByte
    assert(Multimodal.icoMeta(dmg).truncated)
    // CUR type reports kind cursor; non-ICO is null
    val cur = b.clone(); cur(2) = 2
    assert(Multimodal.icoMeta(cur).kind == "cursor")
    assert(Multimodal.icoMeta("not an icon file".getBytes) == null)
    assert(Multimodal.icoMeta(null) == null)
  }
}
