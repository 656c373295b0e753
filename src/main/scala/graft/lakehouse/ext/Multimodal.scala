package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-batched transforms.
  *
  * The Spark-side machinery — schemas, partition-batched execution
  * (mapPartitions over InternalRow batches, the Scala analogue of a Pandas
  * UDF over mapInPandas), deterministic output shapes — is real and tested.
  * The codec itself is a clearly-marked STUB (no image/audio libraries in
  * this environment): `FakeCodec` derives deterministic pseudo-metadata
  * from the payload bytes, so tests are reproducible; swap `FakeCodec` for
  * a real decoder (e.g. javax.imageio / ffmpeg bindings) at the single
  * marked seam to productionize.
  */
object Multimodal {

  /** Codec seam: anything that can turn a payload into (width, height,
    * channels). [[ImageIoCodec]] is a REAL decoder (JDK javax.imageio —
    * PNG/JPEG/GIF/BMP, no external jars); [[FakeCodec]] remains for payloads
    * that are not actual media (fixture text blobs) and for the
    * feature/audio paths where no decoder ships in this environment. */
  trait MediaCodec extends Serializable {
    def dims(bytes: Array[Byte]): (Int, Int, Int)
  }

  /** Real image decode via the JDK's ImageIO. Returns (0, 0, 0) for null /
    * undecodable payloads (the pipeline treats those as corrupt-media rows
    * to be filtered, not hard failures — at 100 TB some payloads WILL be
    * truncated). Channels = raster band count (3 RGB, 4 RGBA, 1 gray). */
  object ImageIoCodec extends MediaCodec {
    def dims(bytes: Array[Byte]): (Int, Int, Int) = {
      if (bytes == null || bytes.length == 0) return (0, 0, 0)
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) (0, 0, 0)
        else (img.getWidth, img.getHeight, img.getRaster.getNumBands)
      } catch { case _: Exception => (0, 0, 0) }
    }
  }

  /** STUB SEAM — deterministic fake decode (for non-media fixture payloads).
    * A real implementation parses actual media headers/frames; this derives
    * plausible, deterministic values from the first bytes so the pipeline
    * shape (schema, null handling, batching) is fully exercised. */
  object FakeCodec extends MediaCodec {
    def dims(bytes: Array[Byte]): (Int, Int, Int) = {
      if (bytes == null || bytes.length < 4) return (0, 0, 0)
      val w = 16 + (((bytes(0) & 0xff) << 8 | (bytes(1) & 0xff)) % 4080)
      val h = 16 + (((bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) % 4080)
      (w, h, 3)
    }
    /** deterministic 8-dim "feature vector" from byte content */
    def features(bytes: Array[Byte], dim: Int = 8): Array[Double] = {
      if (bytes == null) return Array.fill(dim)(0.0)
      val out = new Array[Double](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0
        i += 1
      }
      val n = math.max(bytes.length, 1).toDouble
      out.map(_ / n * dim)
    }
  }

  /** Text → binary payload (fixture tables carry no real media; utf-8 bytes
    * stand in so every downstream op runs on genuine binary columns). */
  def asBlob(df: DataFrame, srcCol: String, blobCol: String): DataFrame =
    df.withColumn(blobCol, encode(col(srcCol), "UTF-8"))

  /** Typed metadata over an opaque binary column — pure built-ins
    * (codegen'd, pushdown-friendly): byte size, sha-256 content hash,
    * 4-byte magic prefix (hex). */
  def withBlobMetadata(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("byte_size", octet_length(col(blobCol)).cast("long"))
      .withColumn("content_sha256", sha2(col(blobCol), 256))
      .withColumn("magic_hex", lower(hex(substring(col(blobCol), 1, 4))))

  private val decodedSchema = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** The partition-batched append-a-column scaffold every codec transform
    * shares: one kernel invocation per row over the blob column, executed
    * with mapPartitions (one codec context per partition — the shape a
    * real decoder needs; batch size = Spark partition, controlled upstream
    * via repartition). */
  private def appendMapped(df: DataFrame, blobCol: String,
      outField: StructField)(kernel: Array[Byte] => Any): DataFrame = {
    val schema = StructType(df.schema.fields :+ outField)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition codec init would go here (the expensive native setup)
      rows.map { r =>
        val bytes = r.get(blobIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ kernel(bytes))
      }
    }(enc)
  }

  /** Decode each payload into (width, height, channels) metadata via the
    * given codec (default: REAL ImageIO decode), partition-batched.
    * Appends a `decoded` struct column. */
  def decodeImages(df: DataFrame, blobCol: String,
      codec: MediaCodec = ImageIoCodec): DataFrame =
    appendMapped(df, blobCol, StructField("decoded", decodedSchema)) { bytes =>
      val (w, h, c) = codec.dims(bytes)
      Row(w, h, c)
    }

  /** Deterministic tiny-PNG generator (test/fixture payloads): a real
    * encoded PNG of the given dims whose pixels are a fixed function of
    * position, so decode tests exercise the REAL codec on real bytes. */
  def syntheticPng(width: Int, height: Int): Array[Byte] =
    syntheticImage(width, height, "png")

  /** `syntheticPng` as a column function for distributed fixture generation. */
  val syntheticPngUdf = udf((w: Int, h: Int) => syntheticPng(w, h))

  /** REAL pixel resize (JDK Graphics2D): decode, aspect-cap the long side
    * at `maxSide` with the same integer math as [[resizeImages]], repaint,
    * re-encode PNG. Payloads already within bounds pass through untouched
    * (byte-identical); undecodable payloads yield null (corrupt-media rows
    * to filter downstream). */
  def resizePixelsKernel(bytes: Array[Byte], maxSide: Int): Array[Byte] = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return null
      val (w, h) = (img.getWidth, img.getHeight)
      val long = math.max(w, h)
      if (long <= maxSide) return bytes
      val (nw, nh) = (math.max(w * maxSide / long, 1),
        math.max(h * maxSide / long, 1))
      // preserve alpha: an RGBA input must not silently come back 3-channel
      val outType =
        if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB
      val out = new java.awt.image.BufferedImage(nw, nh, outType)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    } catch { case _: Exception => null }
  }

  /** Partition-batched real resize: appends `resized_payload` (binary). */
  def resizeImagePixels(df: DataFrame, blobCol: String, maxSide: Int): DataFrame =
    appendMapped(df, blobCol, StructField("resized_payload", BinaryType))(
      resizePixelsKernel(_, maxSide))

  // ---- audio ---------------------------------------------------------------

  /** Real audio metadata decode via the JDK's javax.sound (WAV/AIFF/AU
    * parse without external jars — the audio analogue of [[ImageIoCodec]]).
    * Returns (frames, sampleRate, channels, bitsPerSample); zeros for
    * null/undecodable payloads. */
  def audioMeta(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    if (bytes == null || bytes.length == 0) return (0L, 0, 0, 0)
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      (aff.getFrameLength.toLong, aff.getFormat.getSampleRate.toInt,
        aff.getFormat.getChannels, aff.getFormat.getSampleSizeInBits)
    } catch { case _: Exception => (0L, 0, 0, 0) }
  }

  private val audioSchema = StructType(Seq(
    StructField("frames", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false)))

  /** Partition-batched audio decode, appending an `audio` metadata struct
    * (same shape as [[decodeImages]]). */
  def decodeAudio(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol, StructField("audio", audioSchema)) { bytes =>
      val (f, sr, ch, b) = audioMeta(bytes)
      Row(f, sr, ch, b)
    }

  /** Deterministic mono 16-bit WAV generator (test/fixture payloads): a
    * REAL RIFF/WAVE file whose PCM samples are a fixed function of
    * (position, seed), so decode tests exercise the real javax.sound
    * parser on real bytes. */
  def syntheticWav(sampleRate: Int, frames: Int, seed: Int): Array[Byte] = {
    val n = math.max(frames, 1)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (math.sin(i * 0.05 + seed) * 3000).toShort
      pcm(2 * i) = v.toByte
      pcm(2 * i + 1) = (v >> 8).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      math.max(sampleRate, 1).toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** `syntheticWav` as a column function for distributed fixture generation. */
  val syntheticWavUdf = udf((rate: Int, frames: Int, seed: Int) =>
    syntheticWav(rate, frames, seed))

  /** Resize stub: recompute dims capped at maxSide (aspect-preserving
    * integer math — deterministic), emitting a `resized` struct. */
  def resizeImages(df: DataFrame, decodedCol: String, maxSide: Int): DataFrame =
    df.withColumn("resized", struct(
      when(greatest(col(s"$decodedCol.width"), col(s"$decodedCol.height")) <= maxSide,
        col(s"$decodedCol.width"))
        .otherwise((col(s"$decodedCol.width") * maxSide /
          greatest(col(s"$decodedCol.width"), col(s"$decodedCol.height"))).cast("int"))
        .as("width"),
      when(greatest(col(s"$decodedCol.width"), col(s"$decodedCol.height")) <= maxSide,
        col(s"$decodedCol.height"))
        .otherwise((col(s"$decodedCol.height") * maxSide /
          greatest(col(s"$decodedCol.width"), col(s"$decodedCol.height"))).cast("int"))
        .as("height")))

  /** Feature-extraction stub: fixed-dim embedding per payload, partition-
    * batched like decodeImages. Appends `features` array<double>. */
  def extractFeatures(df: DataFrame, blobCol: String, dim: Int = 8): DataFrame =
    appendMapped(df, blobCol,
      StructField("features", ArrayType(DoubleType, containsNull = false)))(
      FakeCodec.features(_, dim).toSeq)

  // ---- perceptual hashing ----------------------------------------------

  /** 64-bit difference hash (dHash) over REAL decoded pixels: decode,
    * integer luminance (ITU-R 601: 299r+587g+114b), area-average onto a
    * 9×8 grid, one bit per horizontal gradient sign. Content-addressed,
    * not byte-addressed: the same pixels encoded as PNG and BMP collide
    * here while their sha-256 differ — which is the whole point of image
    * dedup at corpus scale. All math is exact integer (block sums compared
    * by cross-multiplication, never a float mean), so the hash is
    * bit-reproducible across JVMs and platforms. Null for undecodable
    * payloads (corrupt-media rows to filter, not failures). */
  def dHash64Kernel(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) return null
      val (w, h) = (img.getWidth, img.getHeight)
      val gw = 9; val gh = 8
      // block luminance sums + pixel counts on the gw×gh grid
      val sums = Array.ofDim[Long](gh, gw)
      val counts = Array.ofDim[Long](gh, gw)
      var y = 0
      while (y < h) {
        val gy = math.min(y * gh / h, gh - 1)
        var x = 0
        while (x < w) {
          val gx = math.min(x * gw / w, gw - 1)
          val rgb = img.getRGB(x, y)
          val lum = 299L * ((rgb >> 16) & 0xff) +
            587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
          sums(gy)(gx) += lum
          counts(gy)(gx) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < 8) {
          // meanRight > meanLeft  ⇔  sumR·nL > sumL·nR (integer-exact)
          if (sums(gy)(gx + 1) * counts(gy)(gx) >
              sums(gy)(gx) * counts(gy)(gx + 1))
            hash |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      java.lang.Long.valueOf(hash)
    } catch { case _: Exception => null }
  }

  /** Partition-batched dHash: appends a nullable `dhash` long column. */
  def withDHash(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol, StructField("dhash", LongType))(dHash64Kernel)

  /** Perceptually-duplicate image pairs: identical dHash (distance 0 —
    * catches re-encoded / format-shifted copies of the same pixels).
    * Bucket-then-verify shape: one shuffle on the 64-bit hash, pairs
    * expand only inside buckets — never an all-pairs comparison. For a
    * hamming-tolerant variant, band the hash 4×16 and reuse the SimHash
    * pigeonhole machinery ([[Dedup.simHashNearDupPairs]]). */
  def imageDupPairs(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val hashed = withDHash(df, blobCol)
      .where(col("dhash").isNotNull)
      .select(col(idCol), col("dhash"))
    val a = hashed.select(col(idCol).as("id_a"), col("dhash"))
    val b = hashed.select(col(idCol).as("id_b"), col("dhash"))
    a.join(b, Seq("dhash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** Deterministic synthetic image in an explicit container format
    * ("png" / "bmp"): same dims ⇒ same pixels, whatever the container —
    * the fixture for content-vs-bytes dedup tests. */
  def syntheticImage(width: Int, height: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      math.max(width, 1), math.max(height, 1),
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        img.setRGB(x, y, ((x * 31 + y * 17) & 0xffffff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** [[syntheticImage]] as a column function. */
  val syntheticImageUdf = udf((w: Int, h: Int, fmt: String) =>
    syntheticImage(w, h, fmt))

  // ---- PNG container metadata (decode-free) ----------------------------

  /** Parsed PNG container metadata, straight from the chunk structure
    * (ISO/IEC 15948): IHDR geometry/format fields, chunk census, total
    * compressed IDAT payload, and whether transparency is present
    * (alpha-bearing color type or a tRNS chunk). */
  case class PngMeta(width: Long, height: Long, bit_depth: Int,
    color_type: Int, interlace: Int, n_chunks: Int, idat_bytes: Long,
    has_alpha: Boolean, has_iend: Boolean)

  /** DECODE-FREE PNG metadata: walk the chunk list (8-byte signature,
    * then length/type/payload/CRC frames) and read geometry from IHDR —
    * O(chunk count) over a few dozen header bytes, never inflating a
    * pixel. At 100 TB of images this is the difference between a
    * metadata pass (read ~64 bytes per blob) and a full ImageIO decode
    * of every pixel grid ([[decodeImages]] stays the path when actual
    * pixels are needed). Bounds-checked against hostile fields: a chunk
    * length past the buffer (or above the spec's 2^31-1 cap) stops the
    * walk with what was parsed so far (has_iend stays false — the
    * truncation signal); payloads that are not PNG at all return null
    * (corrupt-media rows to filter, not failures). */
  def pngMeta(bytes: Array[Byte]): PngMeta = {
    if (bytes == null || bytes.length < 8 + 25) return null
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xff) != sig(i)) return null
      i += 1
    }
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def u32(at: Int): Long = bb.getInt(at) & 0xffffffffL
    def typ(at: Int): String = new String(bytes, at, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    // first chunk must be IHDR with the fixed 13-byte payload
    if (u32(8) != 13L || typ(12) != "IHDR") return null
    val width = u32(16)
    val height = u32(20)
    val bitDepth = bytes(24) & 0xff
    val colorType = bytes(25) & 0xff
    val interlace = bytes(28) & 0xff
    var pos = 8
    var nChunks = 0
    var idat = 0L
    var trns = false
    var iend = false
    while (!iend && pos + 8 <= bytes.length) {
      val len = u32(pos)
      // spec caps chunk length at 2^31-1; a bigger value is hostile
      if (len > Int.MaxValue || pos + 8 + len + 4 > bytes.length) {
        return PngMeta(width, height, bitDepth, colorType, interlace,
          nChunks, idat, colorType == 4 || colorType == 6 || trns,
          has_iend = false)
      }
      val t = typ(pos + 4)
      nChunks += 1
      if (t == "IDAT") idat += len
      if (t == "tRNS") trns = true
      if (t == "IEND") iend = true
      pos += 8 + len.toInt + 4
    }
    PngMeta(width, height, bitDepth, colorType, interlace, nChunks, idat,
      colorType == 4 || colorType == 6 || trns, iend)
  }

  private val pngSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[PngMeta].dataType.asInstanceOf[StructType]

  /** [[pngMeta]] over a blob column — appends a nullable `png` struct. */
  def decodePngHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("png", pngSchema, nullable = true)) { bytes =>
      pngMeta(bytes) match {
        case null => null
        case m => Row(m.width, m.height, m.bit_depth, m.color_type,
          m.interlace, m.n_chunks, m.idat_bytes, m.has_alpha, m.has_iend)
      }
    }

  // ---- MP3 container metadata (decode-free) -----------------------------

  /** Parsed MP3 (MPEG-1 Layer III) stream metadata from the frame
    * headers alone (ISO 11172-3): first-frame bitrate/sample-rate/
    * channel mode, the frame census from walking per-frame lengths
    * (VBR-safe — every frame's own header is read), exact integer
    * duration (frames · 1152 samples each), and ID3v2 presence. */
  case class Mp3Meta(bitrate_kbps: Int, sample_rate: Int, channels: Int,
    n_frames: Long, duration_ms: Long, has_id3: Boolean)

  /** MPEG-1 Layer III bitrate table (kbps) by 4-bit header index. */
  private val Mp3Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)
  private val Mp3SampleRates = Array(44100, 48000, 32000)

  /** DECODE-FREE MP3 metadata — the [[pngMeta]]/[[jpegMeta]] pattern for
    * compressed audio: skip an ID3v2 tag (synchsafe size), sync to the
    * first 0xFFE frame header, then walk frames by their own computed
    * lengths (`144·bitrate/rate + padding` for MPEG-1 L3). Truncation or
    * lost sync ends the walk with the frames counted so far; payloads
    * with no valid frame return null. Bounds-checked throughout. */
  def mp3Meta(bytes: Array[Byte]): Mp3Meta = {
    if (bytes == null || bytes.length < 4) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    var pos = 0
    var id3 = false
    if (bytes.length >= 10 && u8(0) == 'I' && u8(1) == 'D' &&
        u8(2) == '3') {
      val size = ((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
        ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f)
      val skip = 10L + size
      if (skip >= bytes.length) return null
      pos = skip.toInt
      id3 = true
    }
    var nFrames = 0L
    var br0 = 0; var sr0 = 0; var ch0 = 0
    var walking = true
    while (walking && pos + 4 <= bytes.length) {
      val h0 = u8(pos); val h1 = u8(pos + 1)
      // sync (11 bits) + MPEG-1 (version bits 11) + Layer III (bits 01)
      if (h0 != 0xff || (h1 & 0xfe) != 0xfa) walking = false
      else {
        val brIdx = (u8(pos + 2) >> 4) & 0xf
        val srIdx = (u8(pos + 2) >> 2) & 0x3
        val padding = (u8(pos + 2) >> 1) & 0x1
        val mode = (u8(pos + 3) >> 6) & 0x3
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) walking = false
        else {
          val br = Mp3Bitrates(brIdx)
          val sr = Mp3SampleRates(srIdx)
          val len = 144 * br * 1000 / sr + padding
          if (pos + len > bytes.length) walking = false // truncated frame
          else {
            if (nFrames == 0L) {
              br0 = br; sr0 = sr; ch0 = if (mode == 3) 1 else 2
            }
            nFrames += 1
            pos += len
          }
        }
      }
    }
    if (nFrames == 0L) null
    else Mp3Meta(br0, sr0, ch0, nFrames,
      nFrames * 1152L * 1000L / sr0, id3)
  }

  private val mp3Schema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[Mp3Meta].dataType.asInstanceOf[StructType]

  /** [[mp3Meta]] over a blob column — appends a nullable `mp3` struct. */
  def decodeMp3Headers(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("mp3", mp3Schema, nullable = true)) { bytes =>
      mp3Meta(bytes) match {
        case null => null
        case m => Row(m.bitrate_kbps, m.sample_rate, m.channels,
          m.n_frames, m.duration_ms, m.has_id3)
      }
    }

  /** Deterministic synthetic MP3 (fixture payloads): real spec-shaped
    * MPEG-1 Layer III frame headers with deterministic filler payloads
    * (this is a CONTAINER fixture — the filler is not decodable audio,
    * exactly as [[syntheticMp4]]'s sample data is not decodable video).
    * Optionally prefixed with a minimal ID3v2 tag. */
  def syntheticMp3(brIdx: Int, srIdx: Int, mono: Boolean, frames: Int,
      id3Pad: Int): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2 &&
      frames >= 1 && id3Pad >= -1, "syntheticMp3: invalid salt")
    val bos = new java.io.ByteArrayOutputStream()
    if (id3Pad >= 0) {
      bos.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      bos.write(Array[Byte](0, 0, ((id3Pad >> 7) & 0x7f).toByte,
        (id3Pad & 0x7f).toByte))
      bos.write(new Array[Byte](id3Pad))
    }
    val br = Mp3Bitrates(brIdx)
    val sr = Mp3SampleRates(srIdx)
    val len = 144 * br * 1000 / sr // padding bit 0
    var f = 0
    while (f < frames) {
      bos.write(0xff); bos.write(0xfb) // sync + MPEG1 + L3 + no CRC
      bos.write((brIdx << 4) | (srIdx << 2)) // padding 0, private 0
      bos.write(if (mono) 0xc0 else 0x00)
      var i = 4
      while (i < len) { bos.write((i * 31 + f * 17) & 0xff); i += 1 }
      f += 1
    }
    bos.toByteArray
  }

  /** `syntheticMp3` as a column function. */
  val syntheticMp3Udf = udf((brIdx: Int, srIdx: Int, mono: Boolean,
    frames: Int, id3Pad: Int) =>
    syntheticMp3(brIdx, srIdx, mono, frames, id3Pad))

  // ---- JPEG container metadata (decode-free) ----------------------------

  /** Parsed JPEG metadata from the marker-segment structure (ITU T.81):
    * SOF frame geometry, sample precision, component count, whether the
    * scan is progressive (SOF2), the segment census up to SOS, and EXIF
    * presence (an APP1 segment opening with "Exif"). */
  case class JpegMeta(width: Int, height: Int, precision: Int,
    components: Int, progressive: Boolean, n_segments: Int,
    has_exif: Boolean)

  /** DECODE-FREE JPEG metadata — the [[pngMeta]] pattern for the other
    * dominant web image container: walk marker segments (FF xx + 2-byte
    * big-endian length) up to Start-of-Scan, reading geometry from the
    * first SOF0/1/2. Never inflates entropy-coded data. Bounds-checked:
    * a segment length past the buffer (or a truncated SOF payload) ends
    * the walk — with the metadata parsed so far if a SOF was seen,
    * null otherwise; non-JPEG payloads (no FF D8 SOI) are null. */
  def jpegMeta(bytes: Array[Byte]): JpegMeta = {
    if (bytes == null || bytes.length < 4) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    if (u8(0) != 0xff || u8(1) != 0xd8) return null
    var pos = 2
    var nSeg = 1 // SOI
    var w = 0; var h = 0; var prec = 0; var comps = 0
    var progressive = false; var exif = false; var sofSeen = false
    def done(): JpegMeta =
      if (sofSeen) JpegMeta(w, h, prec, comps, progressive, nSeg, exif)
      else null
    while (pos + 2 <= bytes.length) {
      // fill bytes: any number of FFs may pad before a marker code
      if (u8(pos) != 0xff) return done()
      var mp = pos + 1
      while (mp < bytes.length && u8(mp) == 0xff) mp += 1
      if (mp >= bytes.length) return done()
      val marker = u8(mp)
      if (marker == 0xd9) { nSeg += 1; return done() } // EOI
      else if ((marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        nSeg += 1; pos = mp + 1 // standalone markers: no length field
      } else {
        if (mp + 3 >= bytes.length) return done()
        val len = u16(mp + 1) // includes the 2 length bytes
        if (len < 2 || mp + 1 + len > bytes.length) return done()
        nSeg += 1
        if ((marker == 0xc0 || marker == 0xc1 || marker == 0xc2) &&
            !sofSeen && len >= 8) {
          prec = u8(mp + 3); h = u16(mp + 4); w = u16(mp + 6)
          comps = u8(mp + 8)
          progressive = marker == 0xc2
          sofSeen = true
        }
        if (marker == 0xe1 && len >= 6 &&
            new String(bytes, mp + 3, 4,
              java.nio.charset.StandardCharsets.US_ASCII) == "Exif")
          exif = true
        if (marker == 0xda) return done() // SOS: entropy data follows
        pos = mp + 1 + len
      }
    }
    done()
  }

  private val jpegSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[JpegMeta].dataType.asInstanceOf[StructType]

  /** [[jpegMeta]] over a blob column — appends a nullable `jpeg` struct. */
  def decodeJpegHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("jpeg", jpegSchema, nullable = true)) { bytes =>
      jpegMeta(bytes) match {
        case null => null
        case m => Row(m.width, m.height, m.precision, m.components,
          m.progressive, m.n_segments, m.has_exif)
      }
    }

  // ---- video container metadata (ISO BMFF / MP4) -----------------------

  /** Parsed MP4/ISO-BMFF container metadata. Real header data (brand,
    * movie timescale/duration, per-track dimensions and handler types) —
    * the video analogue of [[audioMeta]]: full FRAME decode stays out of
    * scope (the JDK ships no video codec), but the container structure is
    * public spec (ISO/IEC 14496-12) and pure-JVM parseable. */
  case class Mp4Meta(brand: String, timescale: Long, duration_ms: Long,
    tracks: Int, video_width: Int, video_height: Int, audio_tracks: Int,
    video_samples: Long, video_bytes: Long, video_avg_bitrate_bps: Long,
    has_chunk_offsets: Boolean)

  /** Parse ISO-BMFF box structure: `ftyp` → brand, `moov/mvhd` →
    * timescale + duration, each `moov/trak` → `tkhd` dimensions (16.16
    * fixed point), `mdia/hdlr` handler type ('vide'/'soun'), and — for
    * the first video track — the `mdia/minf/stbl` sample tables: `stts`
    * gives the frame/sample count (Σ entry counts), `stsz` the total
    * sample bytes (uniform-size shortcut or per-sample entries), and
    * `stco`/`co64` presence marks a playable chunk map. Average video
    * bitrate derives as bytes·8000 div duration_ms (integer — any
    * engine reproduces it from the same fields). Returns null for
    * payloads that are not ISO-BMFF (no valid ftyp/moov at the top
    * level) or that are truncated mid-box — corrupt-media rows to
    * filter, not failures. Bounds-checked throughout: a hostile size or
    * entry-count field cannot read outside the buffer (truncated sample
    * tables degrade to the entries that fit; an overflowing uniform
    * stsz multiply clamps to 0). */
  def mp4Meta(bytes: Array[Byte]): Mp4Meta = {
    if (bytes == null || bytes.length < 16) return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    def u32(at: Int): Long = bb.getInt(at) & 0xffffffffL
    def boxType(at: Int): String =
      new String(bytes, at + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    /** (payloadStart, payloadEnd, nextBox) or null when malformed. */
    def boxBounds(at: Int, limit: Int): (Int, Int, Int) = {
      if (at + 8 > limit) return null
      val sz = u32(at)
      if (sz == 0) (at + 8, limit, limit) // "to end of enclosing"
      else if (sz == 1) { // 64-bit largesize
        if (at + 16 > limit) return null
        val lsz = bb.getLong(at + 8)
        if (lsz < 16 || at + lsz > limit) return null
        (at + 16, at + lsz.toInt, at + lsz.toInt)
      } else {
        if (sz < 8 || at + sz > limit) return null
        (at + 8, at + sz.toInt, at + sz.toInt)
      }
    }
    var brand: String = null
    var timescale = 0L; var duration = 0L
    var tracks = 0; var vw = 0; var vh = 0; var audio = 0
    var vSamples = 0L; var vBytes = 0L; var vChunks = false
    var sawVideo = false
    /** Scan a box's direct children, calling `visit(type, ps, pe)`. */
    def walkChildren(start: Int, end: Int)(
        visit: (String, Int, Int) => Unit): Unit = {
      var at = start
      var continue = true
      while (continue && at < end) {
        val b = boxBounds(at, end)
        if (b == null) continue = false
        else {
          val (ps, pe, next) = b
          visit(boxType(at), ps, pe)
          at = next
        }
      }
    }
    def walkTrak(start: Int, end: Int): Unit = {
      tracks += 1
      var w = 0; var h = 0; var isVideo = false; var isAudio = false
      var samples = 0L; var sBytes = 0L; var chunks = false
      def walkStbl(ps: Int, pe: Int): Unit = walkChildren(ps, pe) {
        case ("stts", sps, spe) if spe - sps >= 8 =>
          // version/flags, entry_count, then (count, delta) pairs —
          // bounded by BOTH the declared count and the box end
          val declared = u32(sps + 4)
          var i = 0L
          var off = sps + 8
          while (i < declared && off + 8 <= spe) {
            samples += u32(off)
            i += 1; off += 8
          }
        case ("stsz", sps, spe) if spe - sps >= 12 =>
          val uniform = u32(sps + 4)
          val count = u32(sps + 8)
          if (uniform > 0) {
            val total = uniform * count // hostile u32·u32 can overflow
            sBytes = if (total < 0) 0L else total
          } else {
            var i = 0L
            var off = sps + 12
            while (i < count && off + 4 <= spe) {
              sBytes += u32(off)
              i += 1; off += 4
            }
          }
        case ("stco" | "co64", _, _) => chunks = true
        case _ =>
      }
      walkChildren(start, end) {
        case ("tkhd", ps, pe) if pe - ps >= 4 =>
          val v = bytes(ps) & 0xff
          // v0: 4+4+4+4+4+8+2+2+2+2+36 before width; v1: +8 on the
          // two timestamps and the duration
          val dimOff = if (v == 1) ps + 4 + 8 + 8 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
            else ps + 4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
          if (dimOff + 8 <= pe) {
            w = (u32(dimOff) >> 16).toInt  // 16.16 fixed → integer part
            h = (u32(dimOff + 4) >> 16).toInt
          }
        case ("mdia", ps, pe) => walkChildren(ps, pe) {
          case ("hdlr", mps, mpe) if mpe - mps >= 12 =>
            val handler = new String(bytes, mps + 8, 4,
              java.nio.charset.StandardCharsets.US_ASCII)
            if (handler == "vide") isVideo = true
            if (handler == "soun") isAudio = true
          case ("minf", mps, mpe) => walkChildren(mps, mpe) {
            case ("stbl", sps, spe) => walkStbl(sps, spe)
            case _ =>
          }
          case _ =>
        }
        case _ =>
      }
      if (isVideo && !sawVideo) {
        sawVideo = true
        vw = w; vh = h
        vSamples = samples; vBytes = sBytes; vChunks = chunks
      }
      if (isAudio) audio += 1
    }
    def walkMoov(start: Int, end: Int): Unit = {
      var at = start
      var continue = true
      while (continue && at < end) {
        val b = boxBounds(at, end)
        if (b == null) continue = false
        else {
          val (ps, pe, next) = b
          boxType(at) match {
            case "mvhd" if pe - ps >= 4 =>
              val v = bytes(ps) & 0xff
              if (v == 1 && ps + 4 + 8 + 8 + 4 + 8 <= pe) {
                timescale = u32(ps + 20)
                duration = bb.getLong(ps + 24)
              } else if (v == 0 && ps + 4 + 4 + 4 + 4 + 4 <= pe) {
                timescale = u32(ps + 12)
                duration = u32(ps + 16)
              }
            case "trak" => walkTrak(ps, pe)
            case _ =>
          }
          at = next
        }
      }
    }
    try {
      var at = 0
      var sawMoov = false
      var continue = true
      while (continue && at < bytes.length) {
        val b = boxBounds(at, bytes.length)
        if (b == null) continue = false
        else {
          val (ps, pe, next) = b
          boxType(at) match {
            case "ftyp" if pe - ps >= 4 =>
              brand = new String(bytes, ps, 4,
                java.nio.charset.StandardCharsets.US_ASCII)
            case "moov" => sawMoov = true; walkMoov(ps, pe)
            case _ =>
          }
          at = next
        }
      }
      if (brand == null || !sawMoov) null
      else {
        val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
        Mp4Meta(brand, timescale, durMs, tracks, vw, vh, audio,
          vSamples, vBytes,
          if (durMs > 0) vBytes * 8000L / durMs else 0L,
          vChunks)
      }
    } catch { case _: Exception => null }
  }

  private val mp4Schema = StructType(Seq(
    StructField("brand", StringType),
    StructField("timescale", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("tracks", IntegerType, nullable = false),
    StructField("video_width", IntegerType, nullable = false),
    StructField("video_height", IntegerType, nullable = false),
    StructField("audio_tracks", IntegerType, nullable = false),
    StructField("video_samples", LongType, nullable = false),
    StructField("video_bytes", LongType, nullable = false),
    StructField("video_avg_bitrate_bps", LongType, nullable = false),
    StructField("has_chunk_offsets", BooleanType, nullable = false)))

  /** Partition-batched MP4 container parse, appending a nullable `video`
    * metadata struct (null = not an ISO-BMFF payload). */
  def decodeVideoContainer(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol, StructField("video", mp4Schema)) { bytes =>
      val m = mp4Meta(bytes)
      if (m == null) null
      else Row(m.brand, m.timescale, m.duration_ms, m.tracks,
        m.video_width, m.video_height, m.audio_tracks,
        m.video_samples, m.video_bytes, m.video_avg_bitrate_bps,
        m.has_chunk_offsets)
    }

  /** Deterministic minimal-but-REAL ISO-BMFF file (test/fixture
    * payloads): ftyp + moov{mvhd, trak{tkhd, mdia{hdlr[, minf/stbl]}}…}
    * with the given movie duration and tracks — every byte
    * spec-conformant, so [[mp4Meta]] is exercised on genuine box
    * structure (the q80 synthetic-WAV pattern). Tracks: (trackId,
    * handler — "vide"/"soun", width, height). When `videoSamples > 0`,
    * each video track carries real sample tables: a 1-entry `stts`
    * (videoSamples × duration/videoSamples ticks), a uniform `stsz`
    * (videoSampleBytes per sample), and a 1-entry `stco`. */
  def syntheticMp4(timescale: Long, duration: Long,
      tracks: Seq[(Int, String, Int, Int)],
      videoSamples: Int = 0, videoSampleBytes: Int = 0): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      System.arraycopy(be32(8L + payload.length), 0, out, 0, 4)
      System.arraycopy(tpe.getBytes("US-ASCII"), 0, out, 4, 4)
      System.arraycopy(payload, 0, out, 8, payload.length)
      out
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512L) ++ "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      be32(0L) ++ be32(0L) ++ be32(0L) ++ be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ Array[Byte](0x01, 0x00, 0, 0) ++
        new Array[Byte](8) ++
        (be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++ be32(0L) ++
          be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++ be32(0L) ++
          be32(0x40000000L)) ++
        new Array[Byte](24) ++ be32(tracks.size + 1L))
    val trakBoxes = tracks.map { case (id, handler, w, h) =>
      val tkhd = box("tkhd",
        be32(7L) /* version 0, flags enabled|in-movie|in-preview */ ++
          be32(0L) ++ be32(0L) ++ be32(id.toLong) ++ be32(0L) ++
          be32(duration) ++ new Array[Byte](8) ++
          Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) /* layer, alt, volume, rsvd */ ++
          (be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++ be32(0L) ++
            be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++ be32(0L) ++
            be32(0x40000000L)) ++
          be32(w.toLong << 16) ++ be32(h.toLong << 16))
      val hdlr = box("hdlr",
        be32(0L) ++ be32(0L) ++ handler.getBytes("US-ASCII") ++
          new Array[Byte](12) ++ Array[Byte](0))
      val stbl =
        if (handler == "vide" && videoSamples > 0) {
          val stts = box("stts", be32(0L) ++ be32(1L) ++
            be32(videoSamples.toLong) ++
            be32(math.max(duration / videoSamples, 1L)))
          val stsz = box("stsz", be32(0L) ++ be32(videoSampleBytes.toLong) ++
            be32(videoSamples.toLong))
          val stco = box("stco", be32(0L) ++ be32(1L) ++ be32(0L))
          box("minf", box("stbl", stts ++ stsz ++ stco))
        } else Array.emptyByteArray
      box("trak", tkhd ++ box("mdia", hdlr ++ stbl))
    }
    bos.write(ftyp)
    bos.write(box("moov", mvhd ++ trakBoxes.flatten.toArray))
    bos.toByteArray
  }

  /** [[syntheticMp4]] as a column function: one video track at (w, h)
    * with `samples` uniform `sampleBytes`-sized samples, plus
    * `audioTracks` audio tracks. */
  val syntheticMp4Udf = udf((timescale: Long, duration: Long, w: Int,
      h: Int, audioTracks: Int, samples: Int, sampleBytes: Int) =>
    syntheticMp4(timescale, duration,
      (1, "vide", w, h) +: (1 to audioTracks).map(i => (i + 1, "soun", 0, 0)),
      videoSamples = samples, videoSampleBytes = sampleBytes))

  /** Frame sampling for "video" payloads: split the byte stream into
    * `frames` equal chunks, one output row per sampled frame with a
    * deterministic frame fingerprint (sha-256 of the frame bytes — a
    * content hash both this engine and any other can recompute, so frame
    * dedup sets are portable). Explode stays lazy/distributed — no driver
    * involvement. */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String, frames: Int): DataFrame =
    df.select(col(idCol), posexplode(expr(
      s"""transform(sequence(0, $frames - 1), f ->
         |  sha2(substring($blobCol,
         |    1 + f * (octet_length($blobCol) div $frames),
         |    greatest(octet_length($blobCol) div $frames, 1)), 256))""".stripMargin))
      .as(Seq("frame_no", "frame_hash")))

  // ---- GIF container metadata (decode-free) -----------------------------

  /** Parsed GIF metadata from the block structure (GIF89a spec): logical
    * screen geometry, global-color-table size, the frame census (one
    * image descriptor per frame — > 1 means animated), extension count,
    * and whether the trailer byte was reached (the truncation signal). */
  case class GifMeta(width: Int, height: Int, gct_entries: Int,
    n_frames: Int, n_extensions: Int, animated: Boolean,
    has_trailer: Boolean)

  /** DECODE-FREE GIF metadata — the [[pngMeta]] pattern for the animated
    * web image container: read the logical screen descriptor, then walk
    * blocks (0x21 extension, 0x2C image descriptor, 0x3B trailer),
    * skipping data sub-block chains by their own length bytes. Never
    * inflates LZW data. Bounds-checked: any read past the buffer ends
    * the walk with what was parsed (has_trailer stays false); payloads
    * without a GIF87a/GIF89a signature return null. */
  def gifMeta(bytes: Array[Byte]): GifMeta = {
    if (bytes == null || bytes.length < 13) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return null
    val width = u16le(6)
    val height = u16le(8)
    val packed = u8(10)
    val gct = if ((packed & 0x80) != 0) 1 << ((packed & 0x07) + 1) else 0
    var pos = 13 + 3 * gct
    var frames = 0
    var exts = 0
    var trailer = false
    // skip a {len, data}* sub-block chain; -1 on truncation
    def skipSubBlocks(at: Int): Int = {
      var p = at
      while (p < bytes.length && u8(p) != 0) p += 1 + u8(p)
      if (p < bytes.length) p + 1 else -1
    }
    var hostile = false
    while (!trailer && !hostile && pos < bytes.length) {
      u8(pos) match {
        case 0x3b => trailer = true
        case 0x21 => // extension: label byte + sub-blocks
          if (pos + 2 > bytes.length) hostile = true
          else skipSubBlocks(pos + 2) match {
            case -1 => hostile = true
            case p => exts += 1; pos = p
          }
        case 0x2c => // image descriptor + optional LCT + LZW min-code + data
          if (pos + 10 > bytes.length) hostile = true
          else {
            val ip = u8(pos + 9)
            val lct = if ((ip & 0x80) != 0) 1 << ((ip & 0x07) + 1) else 0
            val dataAt = pos + 10 + 3 * lct + 1
            if (dataAt > bytes.length) hostile = true
            else skipSubBlocks(dataAt) match {
              case -1 => hostile = true
              case p => frames += 1; pos = p
            }
          }
        case _ => hostile = true // unknown block type: stop, keep findings
      }
    }
    GifMeta(width, height, gct, frames, exts, frames > 1, trailer)
  }

  private val gifSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[GifMeta].dataType.asInstanceOf[StructType]

  /** [[gifMeta]] over a blob column — appends a nullable `gif` struct. */
  def decodeGifHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("gif", gifSchema, nullable = true)) { bytes =>
      gifMeta(bytes) match {
        case null => null
        case m => Row(m.width, m.height, m.gct_entries, m.n_frames,
          m.n_extensions, m.animated, m.has_trailer)
      }
    }

  /** Deterministic synthetic GIF (fixture payloads): real spec-shaped
    * logical screen descriptor / optional global color table / comment
    * extensions / image descriptors with deterministic filler sub-blocks
    * (not decodable LZW — a CONTAINER fixture, the [[syntheticMp3]]
    * contract) / trailer. */
  def syntheticGif(width: Int, height: Int, frames: Int, gctBits: Int,
      nExtensions: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && frames >= 1 && gctBits >= 0 &&
      gctBits <= 8 && nExtensions >= 0, "syntheticGif: invalid salt")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    bos.write(if (gctBits > 0) 0x80 | (gctBits - 1) else 0)
    bos.write(0); bos.write(0) // bg color, aspect
    if (gctBits > 0) {
      var i = 0
      while (i < 3 * (1 << gctBits)) { bos.write((i * 7) & 0xff); i += 1 }
    }
    var e = 0
    while (e < nExtensions) {
      bos.write(0x21); bos.write(0xfe) // comment extension
      bos.write(3); bos.write('g'); bos.write('f'); bos.write(('0' + e % 10))
      bos.write(0)
      e += 1
    }
    var f = 0
    while (f < frames) {
      bos.write(0x2c)
      le16(0); le16(0); le16(width); le16(height)
      bos.write(0) // no local color table
      bos.write(2) // LZW min code size
      bos.write(4) // one 4-byte filler sub-block
      bos.write((f * 31) & 0xff); bos.write((f * 31 + 1) & 0xff)
      bos.write((f * 31 + 2) & 0xff); bos.write((f * 31 + 3) & 0xff)
      bos.write(0) // sub-block terminator
      f += 1
    }
    bos.write(0x3b)
    bos.toByteArray
  }

  /** `syntheticGif` as a column function. */
  val syntheticGifUdf = udf((w: Int, h: Int, frames: Int, gctBits: Int,
    nExt: Int) => syntheticGif(w, h, frames, gctBits, nExt))

  // ---- FLAC container metadata (decode-free) ----------------------------

  /** Parsed FLAC STREAMINFO (the mandatory first metadata block, FLAC
    * format spec): sample rate / channels / bits-per-sample / exact
    * total-sample count, integer duration, and the metadata-block
    * census. */
  case class FlacMeta(sample_rate: Int, channels: Int, bits_per_sample: Int,
    total_samples: Long, duration_ms: Long, n_blocks: Int,
    saw_last_block: Boolean)

  /** DECODE-FREE FLAC metadata — the lossless-audio member of the
    * container-walker family: check the fLaC magic, unpack STREAMINFO's
    * bit-packed 64-bit tail (20-bit rate, 3-bit channels−1, 5-bit
    * bps−1, 36-bit total samples), then walk metadata block headers
    * (1-byte last-flag+type, 24-bit length) to the last-block flag.
    * Audio frames are never touched. Bounds-checked: a block length
    * past the buffer ends the walk (saw_last_block false); payloads
    * without the magic or a leading STREAMINFO return null. */
  def flacMeta(bytes: Array[Byte]): FlacMeta = {
    if (bytes == null || bytes.length < 8 + 34) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    if (u8(0) != 'f' || u8(1) != 'L' || u8(2) != 'a' || u8(3) != 'C')
      return null
    def u24(i: Int): Int = (u8(i) << 16) | (u8(i + 1) << 8) | u8(i + 2)
    // first block header must be STREAMINFO (type 0) of length 34
    val h0 = u8(4)
    if ((h0 & 0x7f) != 0 || u24(5) != 34) return null
    var last = (h0 & 0x80) != 0
    // STREAMINFO payload at 8; its packed tail is bytes 18..25
    var packed = 0L
    var i = 18
    while (i < 26) { packed = (packed << 8) | (u8(i).toLong & 0xffL); i += 1 }
    val rate = (packed >>> 44).toInt
    val channels = ((packed >>> 41) & 0x7L).toInt + 1
    val bps = ((packed >>> 36) & 0x1fL).toInt + 1
    val total = packed & 0xfffffffffL
    if (rate == 0) return null // spec: 0 is invalid
    var nBlocks = 1
    var pos = 8 + 34
    var hostile = false
    while (!last && !hostile && pos + 4 <= bytes.length) {
      val h = u8(pos)
      val len = u24(pos + 1)
      if (pos + 4 + len > bytes.length) hostile = true
      else {
        nBlocks += 1
        last = (h & 0x80) != 0
        pos += 4 + len
      }
    }
    FlacMeta(rate, channels, bps, total, total * 1000L / rate, nBlocks,
      last)
  }

  private val flacSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[FlacMeta].dataType.asInstanceOf[StructType]

  /** [[flacMeta]] over a blob column — appends a nullable `flac` struct. */
  def decodeFlacHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("flac", flacSchema, nullable = true)) { bytes =>
      flacMeta(bytes) match {
        case null => null
        case m => Row(m.sample_rate, m.channels, m.bits_per_sample,
          m.total_samples, m.duration_ms, m.n_blocks, m.saw_last_block)
      }
    }

  /** Deterministic synthetic FLAC (fixture payloads): real fLaC magic +
    * spec-shaped STREAMINFO + `padBlocks` PADDING blocks; no audio
    * frames (CONTAINER fixture). */
  def syntheticFlac(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, padBlocks: Int): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20) &&
      channels >= 1 && channels <= 8 &&
      bitsPerSample >= 4 && bitsPerSample <= 32 &&
      totalSamples >= 0 && totalSamples < (1L << 36) && padBlocks >= 0,
      "syntheticFlac: invalid salt")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("fLaC".getBytes("US-ASCII"))
    def u24(v: Int): Unit = {
      bos.write((v >> 16) & 0xff); bos.write((v >> 8) & 0xff)
      bos.write(v & 0xff)
    }
    bos.write(if (padBlocks == 0) 0x80 else 0x00) // STREAMINFO header
    u24(34)
    // min/max block size, min/max frame size
    bos.write(Array[Byte](0x10, 0x00, 0x10, 0x00))
    u24(0); u24(0)
    val packed = (sampleRate.toLong << 44) |
      ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) | totalSamples
    var s = 56
    while (s >= 0) { bos.write(((packed >>> s) & 0xffL).toInt); s -= 8 }
    bos.write(new Array[Byte](16)) // md5 of unencoded audio (zeroed)
    var p = 0
    while (p < padBlocks) {
      bos.write(if (p == padBlocks - 1) 0x81 else 0x01) // PADDING
      u24(4)
      bos.write(new Array[Byte](4))
      p += 1
    }
    bos.toByteArray
  }

  /** `syntheticFlac` as a column function. */
  val syntheticFlacUdf = udf((rate: Int, ch: Int, bps: Int, total: Long,
    pad: Int) => syntheticFlac(rate, ch, bps, total, pad))

  // ---- TIFF/EXIF container metadata (decode-free) ------------------------

  /** Parsed TIFF IFD0 metadata (TIFF 6.0 spec — also the EXIF carrier
    * inside JPEG APP1): byte order, IFD0 entry census, image geometry
    * (tags 256/257), orientation (tag 274), and whether an EXIF sub-IFD
    * pointer (tag 34665) is present. */
  case class TiffMeta(little_endian: Boolean, n_entries: Int, width: Long,
    height: Long, orientation: Int, has_exif_ifd: Boolean)

  /** DECODE-FREE TIFF metadata: validate the II*42/MM*42 header, follow
    * the IFD0 offset, and read its 12-byte entries (SHORT/LONG values
    * are inline in the value field, honoring the file's endianness).
    * Strips are never read. Bounds-checked: an IFD offset or entry past
    * the buffer returns what was parsed so far (entries before the
    * truncation point); payloads without a TIFF header return null. */
  def tiffMeta(bytes: Array[Byte]): TiffMeta = {
    if (bytes == null || bytes.length < 8) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    val le =
      if (u8(0) == 'I' && u8(1) == 'I') true
      else if (u8(0) == 'M' && u8(1) == 'M') false
      else return null
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) (u16(i).toLong) | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2).toLong
    if (u16(2) != 42) return null
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return null
    val at = ifd.toInt
    val declared = u16(at)
    var width = 0L; var height = 0L; var orient = 0; var exif = false
    var e = 0
    var parsed = 0
    while (e < declared && at + 2 + (e + 1) * 12 <= bytes.length) {
      val ep = at + 2 + e * 12
      val tag = u16(ep)
      val typ = u16(ep + 2)
      val v: Long =
        if (typ == 3) u16(ep + 8).toLong // SHORT: inline, left-justified
        else if (typ == 4) u32(ep + 8) // LONG: inline
        else -1L
      tag match {
        case 256 => if (v >= 0) width = v
        case 257 => if (v >= 0) height = v
        case 274 => if (v >= 0) orient = v.toInt
        case 34665 => exif = true
        case _ => ()
      }
      parsed += 1
      e += 1
    }
    TiffMeta(le, parsed, width, height, orient, exif)
  }

  private val tiffSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[TiffMeta].dataType.asInstanceOf[StructType]

  /** [[tiffMeta]] over a blob column — appends a nullable `tiff` struct. */
  def decodeTiffHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("tiff", tiffSchema, nullable = true)) { bytes =>
      tiffMeta(bytes) match {
        case null => null
        case m => Row(m.little_endian, m.n_entries, m.width, m.height,
          m.orientation, m.has_exif_ifd)
      }
    }

  /** Deterministic synthetic TIFF (fixture payloads): a real header +
    * one IFD0 with width/height (LONG), orientation (SHORT) and
    * optionally an EXIF sub-IFD pointer, in either byte order. No strip
    * data (CONTAINER fixture). */
  def syntheticTiff(littleEndian: Boolean, width: Long, height: Long,
      orientation: Int, withExif: Boolean): Array[Byte] = {
    require(width >= 0 && height >= 0 && orientation >= 0 &&
      orientation <= 8, "syntheticTiff: invalid salt")
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      else { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (littleEndian) { w16((v & 0xffffL).toInt); w16(((v >> 16) & 0xffffL).toInt) }
      else { w16(((v >> 16) & 0xffffL).toInt); w16((v & 0xffffL).toInt) }
    bos.write(if (littleEndian) 'I' else 'M')
    bos.write(if (littleEndian) 'I' else 'M')
    w16(42)
    w32(8L) // IFD0 immediately after the header
    val entries = Seq(
      (256, 4, width), (257, 4, height), (274, 3, orientation.toLong)) ++
      (if (withExif) Seq((34665, 4, 0L)) else Nil)
    w16(entries.size)
    entries.foreach { case (tag, typ, v) =>
      w16(tag); w16(typ); w32(1L)
      if (typ == 3) { w16(v.toInt); w16(0) } else w32(v)
    }
    w32(0L) // next-IFD pointer: none
    bos.toByteArray
  }

  /** `syntheticTiff` as a column function. */
  val syntheticTiffUdf = udf((le: Boolean, w: Long, h: Long, orient: Int,
    exif: Boolean) => syntheticTiff(le, w, h, orient, exif))

  // ---- WAV (RIFF) container metadata (decode-free) ----------------------

  /** Parsed WAV metadata from the RIFF chunk structure: fmt fields
    * (codec tag, channels, sample rate, bits), the data-chunk byte count
    * with the integer duration it implies, the chunk census, and whether
    * any declared chunk overran the buffer (the truncation signal). */
  case class WavMeta(audio_format: Int, channels: Int, sample_rate: Int,
    bits_per_sample: Int, byte_rate: Int, data_bytes: Long,
    duration_ms: Long, n_chunks: Int, truncated: Boolean)

  /** DECODE-FREE WAV metadata — the PCM member of the container-walker
    * family (RIFF spec): check 'RIFF'+size+'WAVE', then walk
    * fourcc+size chunks (word-aligned, as the spec demands — odd-sized
    * chunks pad one byte), reading fmt and data and skipping everything
    * else by its own declared size, bounds-checked against hostile size
    * fields. Sample data is never interpreted. duration_ms is exact
    * integer arithmetic (data_bytes·1000 div byte_rate). Returns null
    * for non-RIFF/WAVE payloads. */
  def wavMeta(bytes: Array[Byte]): WavMeta = {
    if (bytes == null || bytes.length < 12) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def fourcc(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return null
    var pos = 12
    var nChunks = 0
    var truncated = false
    var fmtTag = 0; var channels = 0; var rate = 0; var bits = 0
    var byteRate = 0L; var dataBytes = -1L
    while (!truncated && pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      val sz = u32(pos + 4)
      val body = pos + 8
      if (sz > Int.MaxValue || body + sz > bytes.length) truncated = true
      else {
        nChunks += 1
        if (id == "fmt " && sz >= 16) {
          fmtTag = u16(body); channels = u16(body + 2)
          rate = u32(body + 4).toInt; byteRate = u32(body + 8)
          bits = u16(body + 14)
        } else if (id == "data") dataBytes = sz
        pos = body + sz.toInt + (sz.toInt & 1) // word alignment
      }
    }
    val dur = if (dataBytes >= 0 && byteRate > 0)
      dataBytes * 1000L / byteRate else -1L
    WavMeta(fmtTag, channels, rate, bits, byteRate.toInt,
      dataBytes, dur, nChunks, truncated)
  }

  private val wavSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[WavMeta].dataType.asInstanceOf[StructType]

  /** [[wavMeta]] over a blob column — appends a nullable `wav` struct. */
  def decodeWavHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("wav", wavSchema, nullable = true)) { bytes =>
      wavMeta(bytes) match {
        case null => null
        case m => Row(m.audio_format, m.channels, m.sample_rate,
          m.bits_per_sample, m.byte_rate, m.data_bytes, m.duration_ms,
          m.n_chunks, m.truncated)
      }
    }

  /** Deterministic synthetic WAV (fixture payloads): real RIFF/WAVE
    * framing with a spec-complete fmt chunk, optional odd-sized filler
    * chunks (exercising word alignment), and a data chunk of
    * deterministic bytes — a CONTAINER fixture (the [[syntheticMp3]]
    * contract), not meaningful audio. */
  def syntheticRiffWav(channels: Int, sampleRate: Int, bits: Int,
      nSamples: Int, nFillerChunks: Int): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1 && bits % 8 == 0 &&
      bits >= 8 && nSamples >= 0 && nFillerChunks >= 0,
      "syntheticRiffWav: invalid salt")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    val blockAlign = channels * bits / 8
    val dataBytes = nSamples * blockAlign
    val fillerBytes = nFillerChunks * (8 + 3 + 1) // odd 3-byte body + pad
    bos.write("RIFF".getBytes("US-ASCII"))
    le32(4L + 24L + fillerBytes + 8L + dataBytes)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); le32(16L)
    le16(1); le16(channels); le32(sampleRate.toLong)
    le32(sampleRate.toLong * blockAlign); le16(blockAlign); le16(bits)
    var fc = 0
    while (fc < nFillerChunks) {
      bos.write("LIST".getBytes("US-ASCII")); le32(3L)
      bos.write('f'); bos.write('0' + fc % 10); bos.write('x')
      bos.write(0) // word-alignment pad
      fc += 1
    }
    bos.write("data".getBytes("US-ASCII")); le32(dataBytes.toLong)
    var i = 0
    while (i < dataBytes) { bos.write((i * 13) & 0xff); i += 1 }
    bos.toByteArray
  }

  /** `syntheticRiffWav` as a column function. */
  val syntheticRiffWavUdf = udf((ch: Int, rate: Int, bits: Int, ns: Int,
    filler: Int) => syntheticRiffWav(ch, rate, bits, ns, filler))

  // ---- WEBP (RIFF) container metadata (decode-free) ----------------------

  /** Parsed WEBP metadata from the RIFF structure: variant fourcc
    * (VP8 lossy / VP8L lossless / VP8X extended), canvas dimensions,
    * the VP8X feature flags (alpha / animation / EXIF / ICC), and the
    * chunk census. */
  case class WebpMeta(variant: String, width: Int, height: Int,
    has_alpha: Boolean, animated: Boolean, has_exif: Boolean,
    has_icc: Boolean, n_chunks: Int, truncated: Boolean)

  /** DECODE-FREE WEBP metadata — the modern-web sibling of [[wavMeta]]
    * on the same RIFF chassis (WebP container spec): 'RIFF'+size+'WEBP',
    * then chunks. VP8X carries the canvas as 24-bit little-endian
    * minus-one fields plus a feature-flag byte; VP8L packs width/height
    * as 14-bit fields after its one-byte signature; plain VP8 keeps
    * them as 14-bit values in the frame header behind the start code.
    * Bounds-checked like every walker here; sample/coefficient data is
    * never touched. Returns null for non-RIFF/WEBP payloads. */
  def webpMeta(bytes: Array[Byte]): WebpMeta = {
    if (bytes == null || bytes.length < 12) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
    def u32(i: Int): Long = (u24(i).toLong | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def fourcc(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "WEBP") return null
    var pos = 12
    var nChunks = 0
    var truncated = false
    var variant = ""
    var w = 0; var h = 0
    var alpha = false; var anim = false; var exif = false; var icc = false
    while (!truncated && pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      val sz = u32(pos + 4)
      val body = pos + 8
      if (sz > Int.MaxValue || body + sz > bytes.length) truncated = true
      else {
        nChunks += 1
        id match {
          case "VP8X" if sz >= 10 =>
            if (variant.isEmpty) variant = "VP8X"
            val flags = u8(body)
            icc = (flags & 0x20) != 0; alpha = (flags & 0x10) != 0
            exif = (flags & 0x08) != 0; anim = (flags & 0x02) != 0
            w = u24(body + 4) + 1; h = u24(body + 7) + 1
          case "VP8 " if sz >= 10 =>
            if (variant.isEmpty) { variant = "VP8"
              // frame tag (3B) + start code 9D 01 2A + 14-bit w/h
              if (u8(body + 3) == 0x9d && u8(body + 4) == 0x01 &&
                  u8(body + 5) == 0x2a) {
                w = (u8(body + 6) | (u8(body + 7) << 8)) & 0x3fff
                h = (u8(body + 8) | (u8(body + 9) << 8)) & 0x3fff
              }
            }
          case "VP8L" if sz >= 5 =>
            if (variant.isEmpty) { variant = "VP8L"
              if (u8(body) == 0x2f) { // signature byte
                val b = u32(body + 1)
                w = ((b & 0x3fff) + 1).toInt
                h = (((b >> 14) & 0x3fff) + 1).toInt
              }
            }
          case "ALPH" => alpha = true
          case "ANIM" | "ANMF" => anim = true
          case "EXIF" => exif = true
          case "ICCP" => icc = true
          case _ => ()
        }
        pos = body + sz.toInt + (sz.toInt & 1)
      }
    }
    if (variant.isEmpty) variant = "unknown"
    WebpMeta(variant, w, h, alpha, anim, exif, icc, nChunks, truncated)
  }

  private val webpSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[WebpMeta].dataType.asInstanceOf[StructType]

  /** [[webpMeta]] over a blob column — appends a nullable `webp` struct. */
  def decodeWebpHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("webp", webpSchema, nullable = true)) { bytes =>
      webpMeta(bytes) match {
        case null => null
        case m => Row(m.variant, m.width, m.height, m.has_alpha,
          m.animated, m.has_exif, m.has_icc, m.n_chunks, m.truncated)
      }
    }

  /** Deterministic synthetic WEBP (fixture payloads): a VP8X extended
    * header with the requested canvas and feature flags, followed by
    * flagged auxiliary chunks (ICCP/ALPH/EXIF/ANIM) with filler bodies
    * and a VP8 chunk whose frame header carries the same dimensions —
    * container-real, not decodable (the [[syntheticMp3]] contract). */
  def syntheticWebp(width: Int, height: Int, alpha: Boolean,
      animated: Boolean, exif: Boolean): Array[Byte] = {
    require(width >= 1 && width <= 0x3fff && height >= 1 &&
      height <= 0x3fff, "syntheticWebp: canvas must fit 14-bit VP8 fields")
    val bos = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le24(v: Int): Unit = { bos.write(v & 0xff)
      bos.write((v >> 8) & 0xff); bos.write((v >> 16) & 0xff) }
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    val vp8x = new java.io.ByteArrayOutputStream()
    val flags = (if (alpha) 0x10 else 0) | (if (animated) 0x02 else 0) |
      (if (exif) 0x08 else 0)
    vp8x.write(flags); vp8x.write(0); vp8x.write(0); vp8x.write(0)
    val wb = width - 1; val hb = height - 1
    vp8x.write(wb & 0xff); vp8x.write((wb >> 8) & 0xff)
    vp8x.write((wb >> 16) & 0xff)
    vp8x.write(hb & 0xff); vp8x.write((hb >> 8) & 0xff)
    vp8x.write((hb >> 16) & 0xff)
    val vp8 = new java.io.ByteArrayOutputStream()
    vp8.write(0); vp8.write(0); vp8.write(0) // frame tag filler
    vp8.write(0x9d); vp8.write(0x01); vp8.write(0x2a)
    vp8.write(width & 0xff); vp8.write((width >> 8) & 0x3f)
    vp8.write(height & 0xff); vp8.write((height >> 8) & 0x3f)
    vp8.write(7) // one filler byte -> odd body exercises padding
    val innerChunks = new java.io.ByteArrayOutputStream()
    def subChunk(id: String, body: Array[Byte]): Unit = {
      innerChunks.write(id.getBytes("US-ASCII"))
      var i = 0
      val sz = body.length.toLong
      while (i < 4) { innerChunks.write(((sz >> (8 * i)) & 0xff).toInt); i += 1 }
      innerChunks.write(body)
      if (body.length % 2 == 1) innerChunks.write(0)
    }
    subChunk("VP8X", vp8x.toByteArray)
    if (alpha) subChunk("ALPH", Array[Byte](1, 2, 3))
    if (exif) subChunk("EXIF", Array[Byte](4, 5, 6, 7))
    if (animated) subChunk("ANIM", Array[Byte](8, 9, 10, 11, 12, 13))
    subChunk("VP8 ", vp8.toByteArray)
    val payload = innerChunks.toByteArray
    cc("RIFF"); le32(4L + payload.length); cc("WEBP"); bos.write(payload)
    bos.toByteArray
  }

  /** `syntheticWebp` as a column function. */
  val syntheticWebpUdf = udf((w: Int, h: Int, alpha: Boolean,
    anim: Boolean, exif: Boolean) => syntheticWebp(w, h, alpha, anim, exif))

  // ---- BMP header metadata (decode-free) ---------------------------------

  /** Parsed BMP metadata from the file + DIB headers: dimensions (height
    * sign carries orientation), bit depth, compression code, declared
    * data offset, and whether the declared pixel offset/size overruns
    * the buffer (the truncation signal). */
  case class BmpMeta(width: Int, height: Int, top_down: Boolean,
    bits_per_pixel: Int, compression: Int, data_offset: Long,
    dib_header_size: Int, truncated: Boolean)

  /** DECODE-FREE BMP metadata (BITMAPINFOHEADER layout, the universal
    * on-disk form): 'BM' + file size + pixel-array offset, then the DIB
    * header — u32 size (>= 40 for INFOHEADER and its V4/V5 extensions),
    * s32 width, s32 height (NEGATIVE height = top-down row order — the
    * classic parser trap, surfaced as `top_down` with the magnitude in
    * `height`), u16 planes, u16 bpp, u32 compression. Pixel data is
    * never touched; a declared offset past the buffer flags
    * `truncated`. Returns null for non-BM payloads. */
  def bmpMeta(bytes: Array[Byte]): BmpMeta = {
    if (bytes == null || bytes.length < 26) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      | (u8(i + 3).toLong << 24)) & 0xffffffffL
    if (bytes(0) != 'B' || bytes(1) != 'M') return null
    val dataOffset = u32(10)
    val dibSize = u32(14)
    if (dibSize < 40 || bytes.length < 14 + 40) return null
    val w = u32(18).toInt // s32; fixture widths stay positive
    val hRaw = u32(22).toInt
    val topDown = hRaw < 0
    val h = if (topDown) -hRaw else hRaw
    BmpMeta(w, h, topDown, u16(28), u32(30).toInt, dataOffset,
      dibSize.toInt, dataOffset > bytes.length)
  }

  private val bmpSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[BmpMeta].dataType.asInstanceOf[StructType]

  /** [[bmpMeta]] over a blob column — appends a nullable `bmp` struct. */
  def decodeBmpHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("bmp", bmpSchema, nullable = true)) { bytes =>
      bmpMeta(bytes) match {
        case null => null
        case m => Row(m.width, m.height, m.top_down, m.bits_per_pixel,
          m.compression, m.data_offset, m.dib_header_size, m.truncated)
      }
    }

  /** Deterministic synthetic BMP (fixture payloads): real
    * BITMAPINFOHEADER framing over a deterministic pixel array —
    * a CONTAINER fixture, not a meaningful image. Negative-height
    * (top-down) form when `topDown`. */
  def syntheticBmp(width: Int, height: Int, bpp: Int,
      topDown: Boolean): Array[Byte] = {
    require(width >= 1 && height >= 1 && (bpp == 8 || bpp == 24 ||
      bpp == 32), "syntheticBmp: invalid salt")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    val rowBytes = ((width * bpp / 8) + 3) / 4 * 4 // 4-byte row padding
    val dataBytes = rowBytes.toLong * height
    bos.write('B'); bos.write('M')
    le32(54L + dataBytes); le16(0); le16(0); le32(54L)
    le32(40L); le32(width.toLong)
    le32((if (topDown) -height else height).toLong & 0xffffffffL)
    le16(1); le16(bpp); le32(0L); le32(dataBytes)
    le32(2835L); le32(2835L); le32(0L); le32(0L)
    var i = 0L
    while (i < dataBytes) { bos.write(((i * 31) & 0xff).toInt); i += 1 }
    bos.toByteArray
  }

  /** `syntheticBmp` as a column function. */
  val syntheticBmpUdf = udf((w: Int, h: Int, bpp: Int, td: Boolean) =>
    syntheticBmp(w, h, bpp, td))

  // ---- AVI (RIFF) container metadata (decode-free) -----------------------

  /** Parsed AVI metadata from the RIFF/LIST structure: the avih main
    * header's timing (µs/frame → exact fps permille and duration),
    * frame count, declared stream count, frame dimensions, the
    * top-level chunk census, and the movi payload size. */
  case class AviMeta(us_per_frame: Long, total_frames: Long,
    n_streams: Int, width: Int, height: Int, fps_permille: Long,
    duration_ms: Long, movi_bytes: Long, n_chunks: Int,
    truncated: Boolean)

  /** DECODE-FREE AVI metadata — the video member of the RIFF walker
    * family ([[wavMeta]]'s chassis, one LIST level deeper, per the
    * AVI 1.0 spec): 'RIFF'+size+'AVI ', then top-level chunks where
    * LIST carries a subtype fourcc before its children — `hdrl` holds
    * the 56-byte `avih` main header (µs/frame, total frames, stream
    * count, width, height at fixed offsets), `movi` holds the
    * interleaved A/V payload (never interpreted, only sized). fps is
    * exact integer permille (10⁹ div µs/frame); duration_ms =
    * frames·µs/frame div 1000. Bounds-checked against hostile size
    * fields. Returns null for non-RIFF/AVI payloads. */
  def aviMeta(bytes: Array[Byte]): AviMeta = {
    if (bytes == null || bytes.length < 12) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def fourcc(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
    var pos = 12
    var nChunks = 0
    var truncated = false
    var usPerFrame = 0L; var totalFrames = 0L; var nStreams = 0
    var w = 0; var h = 0; var moviBytes = -1L
    while (!truncated && pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      val sz = u32(pos + 4)
      val body = pos + 8
      if (sz > Int.MaxValue || body + sz > bytes.length) truncated = true
      else {
        nChunks += 1
        if (id == "LIST" && sz >= 4) {
          val subtype = fourcc(body)
          if (subtype == "movi") moviBytes = sz - 4
          else if (subtype == "hdrl") {
            // children: expect 'avih' + size + 56-byte main header
            var p = body + 4
            val end = body + sz.toInt
            while (p + 8 <= end) {
              val cid = fourcc(p)
              val csz = u32(p + 4)
              if (cid == "avih" && csz >= 40 && p + 8 + 40 <= end) {
                val b = p + 8
                usPerFrame = u32(b); totalFrames = u32(b + 16)
                nStreams = u32(b + 24).toInt
                w = u32(b + 32).toInt; h = u32(b + 36).toInt
              }
              p = p + 8 + csz.toInt + (csz.toInt & 1)
            }
          }
        }
        pos = body + sz.toInt + (sz.toInt & 1) // word alignment
      }
    }
    val fps = if (usPerFrame > 0) 1000000000L / usPerFrame else -1L
    val dur = if (usPerFrame > 0) totalFrames * usPerFrame / 1000L else -1L
    AviMeta(usPerFrame, totalFrames, nStreams, w, h, fps, dur,
      moviBytes, nChunks, truncated)
  }

  private val aviSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[AviMeta].dataType.asInstanceOf[StructType]

  /** [[aviMeta]] over a blob column — appends a nullable `avi` struct. */
  def decodeAviHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("avi", aviSchema, nullable = true)) { bytes =>
      aviMeta(bytes) match {
        case null => null
        case m => Row(m.us_per_frame, m.total_frames, m.n_streams,
          m.width, m.height, m.fps_permille, m.duration_ms, m.movi_bytes,
          m.n_chunks, m.truncated)
      }
    }

  /** Deterministic synthetic AVI (fixture payloads): real
    * RIFF/LIST-hdrl-avih/LIST-movi framing with deterministic movi
    * bytes — a CONTAINER fixture (the [[syntheticRiffWav]] contract),
    * not playable video. */
  def syntheticAvi(usPerFrame: Int, totalFrames: Int, nStreams: Int,
      width: Int, height: Int, moviBytes: Int): Array[Byte] = {
    require(usPerFrame >= 1 && totalFrames >= 0 && nStreams >= 1 &&
      width >= 1 && height >= 1 && moviBytes >= 0,
      "syntheticAvi: invalid salt")
    val bos = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    val avihBody = 56
    val hdrlBody = 4 + 8 + avihBody
    val moviBody = 4 + moviBytes
    val pad = moviBytes & 1
    cc("RIFF"); le32(4L + 8 + hdrlBody + 8 + moviBody + pad); cc("AVI ")
    cc("LIST"); le32(hdrlBody.toLong); cc("hdrl")
    cc("avih"); le32(avihBody.toLong)
    le32(usPerFrame.toLong) // dwMicroSecPerFrame
    le32(0L); le32(0L); le32(0x10L) // maxbytes, padding, flags(HASINDEX)
    le32(totalFrames.toLong); le32(0L) // dwTotalFrames, dwInitialFrames
    le32(nStreams.toLong); le32(0L) // dwStreams, dwSuggestedBufferSize
    le32(width.toLong); le32(height.toLong)
    le32(0L); le32(0L); le32(0L); le32(0L) // dwReserved[4]
    cc("LIST"); le32(moviBody.toLong); cc("movi")
    var i = 0
    while (i < moviBytes) { bos.write((i * 7) & 0xff); i += 1 }
    if (pad == 1) bos.write(0)
    bos.toByteArray
  }

  /** `syntheticAvi` as a column function. */
  val syntheticAviUdf = udf((us: Int, tf: Int, ns: Int, w: Int, h: Int,
    mb: Int) => syntheticAvi(us, tf, ns, w, h, mb))

  // ---- OGG (Vorbis) container metadata (decode-free) ---------------------

  /** Parsed OGG metadata from the page structure + the Vorbis
    * identification header: channels/rate/nominal bitrate from the
    * ident packet, the page census, the final granule position (PCM
    * sample count for Vorbis) with the exact duration it implies, and
    * the EOS flag. */
  case class OggMeta(channels: Int, sample_rate: Int,
    bitrate_nominal: Int, n_pages: Int, last_granule: Long,
    duration_ms: Long, has_eos: Boolean, truncated: Boolean)

  /** DECODE-FREE OGG/Vorbis metadata (RFC 3533 framing + Vorbis I
    * spec §4.2.2): walk 'OggS' pages — header-type flags, u64 granule
    * position, segment table sizing the page body — and parse the
    * \x01vorbis identification header when the first page carries it
    * (u8 version≠/u32 vorbis-version, u8 channels, u32 rate, three s32
    * bitrate fields). The granule position of the final page is the
    * total PCM sample count, so duration_ms = granule·1000 div rate is
    * exact. Audio packets are never decoded. Bounds-checked; returns
    * null for non-OggS payloads. */
  def oggMeta(bytes: Array[Byte]): OggMeta = {
    if (bytes == null || bytes.length < 27) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def u64(i: Int): Long = u32(i) | (u32(i + 4) << 32)
    def magic(i: Int): Boolean = bytes(i) == 'O' && bytes(i + 1) == 'g' &&
      bytes(i + 2) == 'g' && bytes(i + 3) == 'S'
    if (!magic(0)) return null
    var pos = 0
    var nPages = 0
    var truncated = false
    var channels = 0; var rate = 0; var bitrate = 0
    var lastGranule = -1L; var hasEos = false
    while (!truncated && pos + 27 <= bytes.length && magic(pos)) {
      val flags = u8(pos + 5)
      val granule = u64(pos + 6)
      val nSegs = u8(pos + 26)
      val tableEnd = pos + 27 + nSegs
      if (tableEnd > bytes.length) { truncated = true }
      else {
        var bodyLen = 0
        var s = 0
        while (s < nSegs) { bodyLen += u8(pos + 27 + s); s += 1 }
        if (tableEnd + bodyLen > bytes.length) truncated = true
        else {
          nPages += 1
          if ((flags & 0x04) != 0) hasEos = true
          if (granule != -1L) lastGranule = granule
          // Vorbis identification header: \x01 'vorbis' at body start
          if (nPages == 1 && bodyLen >= 30 && u8(tableEnd) == 1 &&
              fourAscii(bytes, tableEnd + 1) == "vorb") {
            val b = tableEnd + 7 // skip \x01vorbis
            channels = u8(b + 4)
            rate = u32(b + 5).toInt
            bitrate = u32(b + 13).toInt // nominal (middle of the three)
          }
          pos = tableEnd + bodyLen
        }
      }
    }
    // leftover bytes that don't form a complete page header are a cut
    // stream (a body-only cut is caught inside the loop)
    if (pos < bytes.length) truncated = true
    val dur = if (lastGranule >= 0 && rate > 0)
      lastGranule * 1000L / rate else -1L
    OggMeta(channels, rate, bitrate, nPages, lastGranule, dur, hasEos,
      truncated)
  }

  private def fourAscii(bytes: Array[Byte], i: Int): String =
    new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private val oggSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[OggMeta].dataType.asInstanceOf[StructType]

  /** [[oggMeta]] over a blob column — appends a nullable `ogg` struct. */
  def decodeOggHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("ogg", oggSchema, nullable = true)) { bytes =>
      oggMeta(bytes) match {
        case null => null
        case m => Row(m.channels, m.sample_rate, m.bitrate_nominal,
          m.n_pages, m.last_granule, m.duration_ms, m.has_eos,
          m.truncated)
      }
    }

  /** Deterministic synthetic OGG/Vorbis (fixture payloads): a real
    * first page carrying the identification header, `nAudioPages`
    * deterministic audio pages, and a final EOS page whose granule
    * position is `totalSamples` — a CONTAINER fixture, not decodable
    * audio. */
  def syntheticOgg(channels: Int, sampleRate: Int, bitrateNominal: Int,
      nAudioPages: Int, totalSamples: Long): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1 && nAudioPages >= 0 &&
      totalSamples >= 0, "syntheticOgg: invalid salt")
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    def le64(v: Long): Unit = { var i = 0
      while (i < 8) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    def page(flags: Int, granule: Long, seq: Int,
        body: Array[Byte]): Unit = {
      require(body.length <= 255, "single-segment fixture pages")
      bos.write("OggS".getBytes("US-ASCII")); bos.write(0)
      bos.write(flags); le64(granule); le32(12345L); le32(seq.toLong)
      le32(0L) // crc: fixture leaves 0 (walker never checks)
      bos.write(1); bos.write(body.length)
      bos.write(body)
    }
    val ident = new java.io.ByteArrayOutputStream()
    ident.write(1); ident.write("vorbis".getBytes("US-ASCII"))
    var i = 0
    while (i < 4) { ident.write(0); i += 1 } // vorbis version 0
    ident.write(channels)
    var r = 0
    while (r < 4) { ident.write((sampleRate >> (8 * r)) & 0xff); r += 1 }
    var b = 0
    while (b < 4) { ident.write(0); b += 1 } // bitrate max
    var n = 0
    while (n < 4) { ident.write((bitrateNominal >> (8 * n)) & 0xff); n += 1 }
    var m = 0
    while (m < 4) { ident.write(0); m += 1 } // bitrate min
    ident.write(0xb8); ident.write(1) // blocksizes + framing bit
    page(0x02, 0L, 0, ident.toByteArray) // BOS page
    var p = 0
    while (p < nAudioPages) {
      val body = Array.tabulate[Byte](16)(j => ((p * 16 + j * 3) & 0xff).toByte)
      page(0, (p + 1).toLong * 1000L, p + 1, body)
      p += 1
    }
    page(0x04, totalSamples, nAudioPages + 1, Array[Byte](0)) // EOS
    bos.toByteArray
  }

  /** `syntheticOgg` as a column function. */
  val syntheticOggUdf = udf((ch: Int, rate: Int, br: Int, np: Int,
    ts: Long) => syntheticOgg(ch, rate, br, np, ts))

  // ---- TAR (ustar) archive metadata (decode-free) -------------------------

  /** Parsed TAR metadata from the 512-byte header blocks: entry census
    * by type, declared payload volume, the largest member, and whether
    * a declared size overran the buffer. */
  case class TarMeta(n_entries: Int, n_files: Int, n_dirs: Int,
    total_size: Long, max_size: Long, truncated: Boolean)

  /** DECODE-FREE TAR walker (POSIX ustar): each member is a 512-byte
    * header — name[100], then octal mode/uid/gid, size[12 OCTAL at
    * offset 124], mtime, checksum, typeflag[156] — followed by
    * ceil(size/512) payload blocks, with two zero blocks terminating
    * the archive. Payloads are skipped by declared size,
    * bounds-checked against hostile fields; the octal parse stops at
    * NUL/space per spec. The tarball is data engineering's hostile
    * doorstep — this is the census you run before extraction. Returns
    * null for payloads that don't start with a plausible header
    * (ustar magic at 257). */
  def tarMeta(bytes: Array[Byte]): TarMeta = {
    if (bytes == null || bytes.length < 512) return null
    def ascii(off: Int, len: Int): String = {
      var end = off
      val max = off + len
      while (end < max && bytes(end) != 0) end += 1
      new String(bytes, off, end - off,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    def octal(off: Int, len: Int): Long = {
      val s = ascii(off, len).trim
      if (s.isEmpty) 0L
      else try java.lang.Long.parseLong(s, 8) catch { case _: Exception => -1L }
    }
    if (ascii(257, 6) != "ustar") return null
    var pos = 0
    var nEntries = 0; var nFiles = 0; var nDirs = 0
    var total = 0L; var mx = 0L
    var truncated = false
    var done = false
    while (!done && !truncated && pos + 512 <= bytes.length) {
      if (bytes(pos) == 0) { done = true } // zero block: terminator
      else {
        val size = octal(pos + 124, 12)
        val tf = bytes(pos + 156)
        if (size < 0) truncated = true
        else {
          val blocks = (size + 511L) / 512L
          if (pos + 512 + blocks * 512 > bytes.length + 511) {
            // allow the final member's padding to be cut, not its data
            if (pos + 512 + size > bytes.length) truncated = true
          }
          if (!truncated) {
            nEntries += 1
            if (tf == '5') nDirs += 1 else nFiles += 1
            total += size
            if (size > mx) mx = size
            pos += 512 + (blocks * 512L).toInt
          }
        }
      }
    }
    TarMeta(nEntries, nFiles, nDirs, total, mx, truncated)
  }

  private val tarSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[TarMeta].dataType.asInstanceOf[StructType]

  /** [[tarMeta]] over a blob column — appends a nullable `tar` struct. */
  def decodeTarHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("tar", tarSchema, nullable = true)) { bytes =>
      tarMeta(bytes) match {
        case null => null
        case m => Row(m.n_entries, m.n_files, m.n_dirs, m.total_size,
          m.max_size, m.truncated)
      }
    }

  /** Deterministic synthetic ustar archive: `nFiles` members named
    * `f<i>` with sizes `base + i·step` of deterministic bytes, one
    * optional directory entry, correct checksums, double-zero-block
    * terminated — a CONTAINER fixture. */
  def syntheticTar(nFiles: Int, base: Int, step: Int,
      withDir: Boolean): Array[Byte] = {
    require(nFiles >= 0 && base >= 0 && step >= 0, "syntheticTar salt")
    val bos = new java.io.ByteArrayOutputStream()
    def header(name: String, size: Long, typeflag: Char): Unit = {
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII")
        System.arraycopy(b, 0, h, off, math.min(b.length, 99))
      }
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"$size%011o"); put(136, "00000000000")
      h(156) = typeflag.toByte
      put(257, "ustar"); h(263) = '0'; h(264) = '0'
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      put(148, f"$sum%06o")
      h(154) = 0; h(155) = ' '
      bos.write(h)
    }
    if (withDir) header("d0/", 0L, '5')
    var f = 0
    while (f < nFiles) {
      val size = base + f * step
      header(s"f$f", size.toLong, '0')
      var i = 0
      while (i < size) { bos.write((i * 17 + f) & 0xff); i += 1 }
      val pad = (512 - size % 512) % 512
      var p = 0
      while (p < pad) { bos.write(0); p += 1 }
      f += 1
    }
    bos.write(new Array[Byte](1024)) // two terminator blocks
    bos.toByteArray
  }

  /** `syntheticTar` as a column function. */
  val syntheticTarUdf = udf((n: Int, base: Int, step: Int, d: Boolean) =>
    syntheticTar(n, base, step, d))

  // ---- ZIP central-directory metadata (decode-free) -----------------------

  /** Parsed ZIP metadata from the end-of-central-directory record and
    * the central directory: entry count, declared compressed/
    * uncompressed volumes, the overall ratio, and the truncation flag. */
  case class ZipMeta(n_entries: Int, total_uncompressed: Long,
    total_compressed: Long, ratio_permille: Long, truncated: Boolean)

  /** DECODE-FREE ZIP walker (PKWARE APPNOTE): find the EOCD signature
    * PK\x05\x06 scanning back from the tail (comments make it
    * non-fixed), read the central-directory offset/count, then walk
    * PK\x01\x02 entries — compressed size u32@20, uncompressed u32@24,
    * variable name/extra/comment lengths @28..32. Payloads are never
    * inflated; the ratio is exact integer permille. A central
    * directory pointing past the buffer flags `truncated`. Returns
    * null when no EOCD exists. */
  def zipMeta(bytes: Array[Byte]): ZipMeta = {
    if (bytes == null || bytes.length < 22) return null
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
    var eocd = -1
    var i = bytes.length - 22
    val floor = math.max(0, bytes.length - 22 - 65535)
    while (eocd < 0 && i >= floor) {
      if (bytes(i) == 'P' && bytes(i + 1) == 'K' && bytes(i + 2) == 5 &&
        bytes(i + 3) == 6) eocd = i
      i -= 1
    }
    if (eocd < 0) return null
    val n = u16(eocd + 10)
    val cdOff = u32(eocd + 16)
    var pos = cdOff
    var count = 0
    var unc = 0L; var comp = 0L
    var truncated = false
    while (count < n && !truncated) {
      if (pos + 46 > bytes.length ||
        !(bytes(pos.toInt) == 'P' && bytes(pos.toInt + 1) == 'K' &&
          bytes(pos.toInt + 2) == 1 && bytes(pos.toInt + 3) == 2)) {
        truncated = true
      } else {
        val p = pos.toInt
        comp += u32(p + 20)
        unc += u32(p + 24)
        val varLen = u16(p + 28) + u16(p + 30) + u16(p + 32)
        pos += 46L + varLen
        count += 1
      }
    }
    val ratio = if (unc > 0) comp * 1000L / unc else -1L
    ZipMeta(count, unc, comp, ratio, truncated)
  }

  private val zipSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[ZipMeta].dataType.asInstanceOf[StructType]

  /** [[zipMeta]] over a blob column — appends a nullable `zip` struct. */
  def decodeZipHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("zip", zipSchema, nullable = true)) { bytes =>
      zipMeta(bytes) match {
        case null => null
        case m => Row(m.n_entries, m.total_uncompressed,
          m.total_compressed, m.ratio_permille, m.truncated)
      }
    }

  /** Deterministic synthetic ZIP of STORED (method-0) members — real
    * local headers, central directory, and EOCD, fake CRCs (the walker
    * never checks them). Member i is `m<i>` with `base + i·step`
    * deterministic bytes. */
  def syntheticZip(nEntries: Int, base: Int, step: Int): Array[Byte] = {
    require(nEntries >= 0 && base >= 0 && step >= 0, "syntheticZip salt")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    val offsets = new Array[Long](nEntries)
    var e = 0
    while (e < nEntries) {
      offsets(e) = bos.size().toLong
      val name = s"m$e"
      val size = base + e * step
      bos.write('P'); bos.write('K'); bos.write(3); bos.write(4)
      le16(20); le16(0); le16(0); le16(0); le16(0) // ver/flags/method/time/date
      le32(0xabcd1234L); le32(size.toLong); le32(size.toLong)
      le16(name.length); le16(0)
      bos.write(name.getBytes("US-ASCII"))
      var i = 0
      while (i < size) { bos.write((i * 29 + e) & 0xff); i += 1 }
      e += 1
    }
    val cdStart = bos.size().toLong
    e = 0
    while (e < nEntries) {
      val name = s"m$e"
      val size = base + e * step
      bos.write('P'); bos.write('K'); bos.write(1); bos.write(2)
      le16(20); le16(20); le16(0); le16(0); le16(0); le16(0)
      le32(0xabcd1234L); le32(size.toLong); le32(size.toLong)
      le16(name.length); le16(0); le16(0)
      le16(0); le16(0); le32(0L); le32(offsets(e))
      bos.write(name.getBytes("US-ASCII"))
      e += 1
    }
    val cdSize = bos.size().toLong - cdStart
    bos.write('P'); bos.write('K'); bos.write(5); bos.write(6)
    le16(0); le16(0); le16(nEntries); le16(nEntries)
    le32(cdSize); le32(cdStart); le16(0)
    bos.toByteArray
  }

  /** `syntheticZip` as a column function. */
  val syntheticZipUdf = udf((n: Int, base: Int, step: Int) =>
    syntheticZip(n, base, step))

  // ---- GZIP member metadata (decode-free) ---------------------------------

  /** Parsed GZIP metadata from the RFC 1952 header and trailer: the
    * original-name field when present, header mtime, OS code, and the
    * declared uncompressed size (ISIZE, the last 4 bytes) with the
    * implied compression ratio — the payload is never inflated. */
  case class GzipMeta(has_name: Boolean, name: String, mtime: Long,
    os: Int, compressed_len: Long, isize: Long, ratio_permille: Long,
    truncated: Boolean)

  /** DECODE-FREE GZIP walker (RFC 1952): magic 1f 8b, CM=8, FLG bits
    * (FEXTRA/FNAME/FCOMMENT/FHCRC all handled by skipping their
    * declared/NUL-terminated spans), MTIME u32, OS byte; the trailer's
    * last 4 bytes are ISIZE (uncompressed length mod 2³²). Returns
    * null for non-gzip payloads; a header whose variable fields run
    * past the buffer flags `truncated`. */
  def gzipMeta(bytes: Array[Byte]): GzipMeta = {
    if (bytes == null || bytes.length < 18) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      | (u8(i + 3).toLong << 24)) & 0xffffffffL
    if (u8(0) != 0x1f || u8(1) != 0x8b || u8(2) != 8) return null
    val flg = u8(3)
    val mtime = u32(4)
    val os = u8(9)
    var pos = 10
    var truncated = false
    if ((flg & 4) != 0) { // FEXTRA
      if (pos + 2 > bytes.length) truncated = true
      else {
        val xlen = u8(pos) | (u8(pos + 1) << 8)
        pos += 2 + xlen
        if (pos > bytes.length) truncated = true
      }
    }
    var name: String = null
    if (!truncated && (flg & 8) != 0) { // FNAME
      val start = pos
      while (pos < bytes.length && bytes(pos) != 0) pos += 1
      if (pos >= bytes.length) truncated = true
      else {
        name = new String(bytes, start, pos - start,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        pos += 1
      }
    }
    if (!truncated && (flg & 16) != 0) { // FCOMMENT
      while (pos < bytes.length && bytes(pos) != 0) pos += 1
      if (pos >= bytes.length) truncated = true else pos += 1
    }
    if (!truncated && (flg & 2) != 0) { // FHCRC
      pos += 2
      if (pos > bytes.length) truncated = true
    }
    if (!truncated && pos + 8 > bytes.length) truncated = true
    val isize = if (truncated) -1L else u32(bytes.length - 4)
    val ratio = if (!truncated && isize > 0)
      bytes.length.toLong * 1000L / isize else -1L
    GzipMeta(name != null, name, mtime, os, bytes.length.toLong, isize,
      ratio, truncated)
  }

  private val gzipSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[GzipMeta].dataType.asInstanceOf[StructType]

  /** [[gzipMeta]] over a blob column — appends a nullable `gzip`
    * struct. */
  def decodeGzipHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("gzip", gzipSchema, nullable = true)) { bytes =>
      gzipMeta(bytes) match {
        case null => null
        case m => Row(m.has_name, m.name, m.mtime, m.os,
          m.compressed_len, m.isize, m.ratio_permille, m.truncated)
      }
    }

  /** Deterministic synthetic gzip member: real RFC 1952 framing with an
    * FNAME field, deterministic non-decodable deflate bytes (the walker
    * never inflates), fake CRC, declared ISIZE — a CONTAINER fixture. */
  def syntheticGzip(name: String, mtime: Long, deflateLen: Int,
      isize: Long): Array[Byte] = {
    require(deflateLen >= 0 && isize >= 0 && mtime >= 0,
      "syntheticGzip salt")
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    bos.write(0x1f); bos.write(0x8b); bos.write(8)
    bos.write(8) // FLG: FNAME
    le32(mtime); bos.write(0); bos.write(3) // XFL, OS=unix
    bos.write(name.getBytes("ISO-8859-1")); bos.write(0)
    var i = 0
    while (i < deflateLen) { bos.write((i * 41 + 7) & 0xff); i += 1 }
    le32(0x12345678L) // fake CRC32
    le32(isize)
    bos.toByteArray
  }

  /** `syntheticGzip` as a column function. */
  val syntheticGzipUdf = udf((name: String, mtime: Long, dl: Int,
    is: Long) => syntheticGzip(name, mtime, dl, is))

  // ---- Parquet footer metadata (decode-free) ------------------------------

  /** Parsed Parquet footer metadata: format version, schema-element
    * count, row-group count, leaf-column count (of the first row
    * group), total rows, declared total byte size across row groups,
    * and created_by — everything a manifest/planner needs, read from
    * the FOOTER ONLY (no page, no column chunk is touched). */
  case class ParquetMeta(version: Int, n_schema: Int, n_row_groups: Int,
    n_columns: Int, num_rows: Long, total_byte_size: Long,
    created_by: String, truncated: Boolean)

  /** Bounds-checked Thrift COMPACT-protocol cursor — the real wire
    * format of the Parquet footer (parquet.thrift FileMetaData). Reads
    * varints/zigzags/strings and can SKIP any field type (nested
    * structs/lists included, depth-capped) so unknown or hostile fields
    * never derail the walk; every read validates against the buffer
    * end and a poisoned cursor reports `bad` instead of throwing. */
  private final class TCompactCursor(bytes: Array[Byte], start: Int,
      end: Int) {
    var pos: Int = start
    var bad: Boolean = false
    def u8(): Int =
      if (bad || pos >= end) { bad = true; 0 }
      else { val v = bytes(pos) & 0xff; pos += 1; v }
    /** Unsigned LEB128, capped at 10 bytes (hostile-input guard). */
    def varint(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more && !bad) {
        if (shift > 63) { bad = true; return 0L }
        val b = u8()
        v |= (b & 0x7fL) << shift
        more = (b & 0x80) != 0
        shift += 7
      }
      v
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1L) }
    def skipBytes(n: Long): Unit =
      if (n < 0 || pos + n > end) bad = true else pos += n.toInt
    def string(): String = {
      val len = varint()
      if (len < 0 || pos + len > end) { bad = true; "" }
      else { val s = new String(bytes, pos, len.toInt, "UTF-8")
        pos += len.toInt; s }
    }
    /** (size, elemType) of a list header. */
    def listHeader(): (Long, Int) = {
      val h = u8()
      val t = h & 0x0f
      val sz = if ((h >>> 4) == 15) varint() else (h >>> 4).toLong
      // a declared size beyond the remaining bytes is hostile: every
      // element costs >= 1 byte
      if (sz < 0 || sz > (end - pos).toLong + 1) bad = true
      (sz, t)
    }
    def skipValue(tpe: Int, depth: Int): Unit = {
      if (bad || depth > 16) { bad = true; return }
      tpe match {
        case 1 | 2 => // bool true/false carried in the field header
        case 3 => u8()
        case 4 | 5 | 6 => zigzag()
        case 7 => skipBytes(8)
        case 8 => skipBytes(varint())
        case 9 | 10 =>
          val (sz, et) = listHeader()
          var i = 0L
          while (i < sz && !bad) { skipValue(et, depth + 1); i += 1 }
        case 11 =>
          val sz = varint()
          if (sz > 0) {
            val kv = u8()
            var i = 0L
            while (i < sz && !bad) {
              skipValue(kv >>> 4, depth + 1)
              skipValue(kv & 0x0f, depth + 1)
              i += 1
            }
          }
        case 12 => skipStruct(depth + 1)
        case _ => bad = true
      }
    }
    def skipStruct(depth: Int): Unit = {
      if (bad || depth > 16) { bad = true; return }
      var lastId = 0
      var stop = false
      while (!stop && !bad) {
        val h = u8()
        if (h == 0) stop = true
        else {
          val delta = h >>> 4
          val t = h & 0x0f
          lastId = if (delta == 0) zigzag().toInt else lastId + delta
          skipValue(t, depth)
        }
      }
    }
  }

  /** DECODE-FREE Parquet footer walker: validates the PAR1 magic at
    * both ends, reads the little-endian footer length, then parses the
    * Thrift compact FileMetaData — version (1), schema list size (2),
    * num_rows (3), row_groups (4: per group the columns-list size and
    * the total_byte_size/num_rows i64s), created_by (6). Unknown
    * fields (encryption, key-value metadata, column orders) skip
    * generically; a footer whose length field or thrift structure runs
    * past the buffer reports `truncated` with whatever parsed cleanly.
    * Returns null when the magic is absent (not a parquet file). */
  def parquetFooterMeta(bytes: Array[Byte]): ParquetMeta = {
    if (bytes == null || bytes.length < 12) return null
    def m(i: Int) = bytes(i) == 'P' && bytes(i + 1) == 'A' &&
      bytes(i + 2) == 'R' && bytes(i + 3) == '1'
    if (!m(0) || !m(bytes.length - 4)) return null
    val lenPos = bytes.length - 8
    val footerLen = ((bytes(lenPos) & 0xff) | ((bytes(lenPos + 1) & 0xff) << 8)
      | ((bytes(lenPos + 2) & 0xff) << 16)
      | ((bytes(lenPos + 3) & 0xffL) << 24)).toLong
    val footerStart = lenPos.toLong - footerLen
    if (footerLen <= 0 || footerStart < 4)
      return ParquetMeta(0, 0, 0, 0, 0L, 0L, null, truncated = true)
    val c = new TCompactCursor(bytes, footerStart.toInt, lenPos)
    var version = 0; var nSchema = 0; var nRowGroups = 0; var nCols = 0
    var numRows = 0L; var totalBytes = 0L; var createdBy: String = null
    var lastId = 0
    var stop = false
    while (!stop && !c.bad) {
      val h = c.u8()
      if (h == 0) stop = true
      else {
        val delta = h >>> 4
        val t = h & 0x0f
        lastId = if (delta == 0) c.zigzag().toInt else lastId + delta
        (lastId, t) match {
          case (1, 5) => version = c.zigzag().toInt
          case (2, 9) =>
            val (sz, et) = c.listHeader()
            nSchema = sz.toInt
            var i = 0L
            while (i < sz && !c.bad) { c.skipValue(et, 1); i += 1 }
          case (3, 6) => numRows = c.zigzag()
          case (4, 9) =>
            val (sz, _) = c.listHeader()
            nRowGroups = sz.toInt
            var g = 0L
            while (g < sz && !c.bad) {
              // RowGroup struct: 1 columns list, 2 total_byte_size,
              // 3 num_rows; anything else skips
              var rgLast = 0
              var rgStop = false
              while (!rgStop && !c.bad) {
                val rh = c.u8()
                if (rh == 0) rgStop = true
                else {
                  val rd = rh >>> 4
                  val rt = rh & 0x0f
                  rgLast = if (rd == 0) c.zigzag().toInt else rgLast + rd
                  (rgLast, rt) match {
                    case (1, 9) =>
                      val (csz, cet) = c.listHeader()
                      if (g == 0) nCols = csz.toInt
                      var ci = 0L
                      while (ci < csz && !c.bad) {
                        c.skipValue(cet, 2); ci += 1
                      }
                    case (2, 6) => totalBytes += c.zigzag()
                    case (3, 6) => // per-group rows: informational only
                      c.zigzag()
                    case _ => c.skipValue(rt, 2)
                  }
                }
              }
              g += 1
            }
          case (6, 8) => createdBy = c.string()
          case _ => c.skipValue(t, 1)
        }
      }
    }
    ParquetMeta(version, nSchema, nRowGroups, nCols, numRows, totalBytes,
      createdBy, truncated = c.bad)
  }

  private val parquetSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[ParquetMeta].dataType.asInstanceOf[StructType]

  /** [[parquetFooterMeta]] over a blob column — appends a nullable
    * `pq` struct. */
  def decodeParquetFooters(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("pq", parquetSchema, nullable = true)) { bytes =>
      parquetFooterMeta(bytes) match {
        case null => null
        case m => Row(m.version, m.n_schema, m.n_row_groups, m.n_columns,
          m.num_rows, m.total_byte_size, m.created_by, m.truncated)
      }
    }

  /** Deterministic synthetic Parquet file: PAR1 magic, an opaque
    * filler "data" region, and a REAL Thrift compact FileMetaData
    * footer — version 2, a root schema element with `nCols` leaf
    * children, `nGroups` row groups of `rowsPer` rows whose
    * total_byte_size is `base + g·step`, and created_by
    * "graft-synth 1.0". Every varint/zigzag/list header is the real
    * wire encoding, so the walker is exercised end to end. */
  def syntheticParquet(nCols: Int, nGroups: Int, rowsPer: Long,
      base: Long, step: Long): Array[Byte] = {
    require(nCols >= 1 && nCols <= 1000 && nGroups >= 0 &&
      nGroups <= 10000 && rowsPer >= 0 && base >= 0 && step >= 0,
      "syntheticParquet salt")
    val bos = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7 }
      bos.write(v.toInt)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def fieldHeader(delta: Int, tpe: Int): Unit =
      bos.write((delta << 4) | tpe)
    def listHeader(size: Int, elemType: Int): Unit =
      if (size < 15) bos.write((size << 4) | elemType)
      else { bos.write(0xf0 | elemType); varint(size.toLong) }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); varint(b.length.toLong); bos.write(b)
    }
    bos.write("PAR1".getBytes("US-ASCII"))
    // opaque filler standing in for the column chunks
    var f = 0
    val fill = (base % 64L).toInt + 8
    while (f < fill) { bos.write((f * 31 + nCols) & 0xff); f += 1 }
    val footerStart = bos.size()
    fieldHeader(1, 5); zigzag(2L) // 1: version = 2
    fieldHeader(1, 9) // 2: schema
    listHeader(nCols + 1, 12)
    // root element: 4 name, 5 num_children
    fieldHeader(4, 8); str("schema")
    fieldHeader(1, 5); zigzag(nCols.toLong)
    bos.write(0)
    var cIdx = 0
    while (cIdx < nCols) { // leaves: 1 type, 3 repetition, 4 name
      fieldHeader(1, 5); zigzag(6L) // Type.BYTE_ARRAY
      fieldHeader(2, 5); zigzag(1L) // OPTIONAL
      fieldHeader(1, 8); str(s"c$cIdx")
      bos.write(0)
      cIdx += 1
    }
    fieldHeader(1, 6); zigzag(nGroups.toLong * rowsPer) // 3: num_rows
    fieldHeader(1, 9) // 4: row_groups
    listHeader(nGroups, 12)
    var g = 0
    while (g < nGroups) {
      fieldHeader(1, 9) // 1: columns
      listHeader(nCols, 12)
      var cc = 0
      while (cc < nCols) { // ColumnChunk: 2 file_offset
        fieldHeader(2, 6); zigzag(4L + g.toLong * 100 + cc)
        bos.write(0)
        cc += 1
      }
      fieldHeader(1, 6); zigzag(base + g.toLong * step) // 2: total_byte_size
      fieldHeader(1, 6); zigzag(rowsPer) // 3: num_rows
      bos.write(0)
      g += 1
    }
    fieldHeader(2, 8); str("graft-synth 1.0") // 6: created_by
    bos.write(0)
    val footerLen = bos.size() - footerStart
    var i = 0
    while (i < 4) { bos.write((footerLen >> (8 * i)) & 0xff); i += 1 }
    bos.write("PAR1".getBytes("US-ASCII"))
    bos.toByteArray
  }

  /** `syntheticParquet` as a column function. */
  val syntheticParquetUdf = udf((nCols: Int, nGroups: Int, rowsPer: Long,
    base: Long, step: Long) =>
    syntheticParquet(nCols, nGroups, rowsPer, base, step))

  // ---- PDF document metadata (decode-free) --------------------------------

  /** Parsed PDF metadata from the header, the startxref → xref-table →
    * trailer walk (following the /Prev incremental-update chain,
    * newest-wins), and a bounded two-hop object lookup to the page-tree
    * root: spec version, total page count (/Type /Pages /Count at the
    * catalog's /Pages target), object count (trailer /Size − 1, the
    * free object 0 excluded), /Encrypt presence, the /Linearized
    * first-object marker, the number of incremental updates walked,
    * whether the file uses a cross-reference STREAM (PDF 1.5+ xref
    * object — its entries live inside a possibly-Flate stream, which a
    * decode-free walker honestly reports instead of inflating), and the
    * truncation flag for any out-of-bounds/hostile offset. */
  case class PdfMeta(version_major: Int, version_minor: Int, n_pages: Int,
    n_objects: Int, encrypted: Boolean, linearized: Boolean,
    n_updates: Int, xref_stream: Boolean, truncated: Boolean)

  /** DECODE-FREE PDF walker (ISO 32000-1 §7.5): `%PDF-M.N` header,
    * `startxref` scanned back from the tail, classic xref subsection
    * tables (20-byte entries) walked newest→oldest over the /Prev
    * chain (capped at 16 revisions), trailer dict mined for
    * /Size /Root /Encrypt /Prev, then Root→/Pages→/Count resolved via
    * the xref offsets themselves. Every offset is bounds-checked
    * against the buffer; malformed or hostile structures flag
    * `truncated` rather than throw; a non-PDF returns null. */
  def pdfMeta(bytes: Array[Byte]): PdfMeta = {
    if (bytes == null || bytes.length < 32) return null
    def str(off: Long, len: Int): String = {
      val a = math.max(0L, off).toInt
      val b = math.min(bytes.length.toLong, off + len).toInt
      if (b <= a) ""
      else new String(bytes, a, b - a,
        java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val head = str(0, 16)
    val ver = """%PDF-(\d)\.(\d)""".r.findPrefixMatchOf(head).orNull
    if (ver == null) return null
    val vMaj = ver.group(1).toInt
    val vMin = ver.group(2).toInt
    val linearized = str(0, 2048).contains("/Linearized")
    def failed(enc: Boolean, upd: Int, xs: Boolean): PdfMeta =
      PdfMeta(vMaj, vMin, 0, 0, enc, linearized, math.max(upd, 0), xs,
        truncated = true)
    val tail = str(bytes.length - 2048L, 2048)
    val sxi = tail.lastIndexOf("startxref")
    if (sxi < 0) return failed(enc = false, upd = 0, xs = false)
    val sx = """\s+(\d{1,15})""".r
      .findPrefixMatchOf(tail.substring(sxi + 9))
      .map(_.group(1).toLong).getOrElse(-1L)
    if (sx < 0 || sx >= bytes.length)
      return failed(enc = false, upd = 0, xs = false)
    // newest-wins object offsets across the /Prev revision chain
    val offsets = scala.collection.mutable.HashMap.empty[Int, Long]
    var size = -1; var rootObj = -1; var encrypted = false
    var updates = -1; var truncated = false; var xrefStream = false
    var prev = sx
    val sizeRe = """(?s)/Size\s+(\d{1,9})""".r
    val rootRe = """(?s)/Root\s+(\d{1,9})\s+\d+\s+R""".r
    val prevRe = """(?s)/Prev\s+(\d{1,15})""".r
    val subRe = """(\d{1,9})\s+(\d{1,9})""".r
    while (prev >= 0 && updates < 16 && !truncated && !xrefStream) {
      updates += 1
      val sec = str(prev, 1 << 20)
      prev = -1L
      val trimmed = sec.dropWhile(_.isWhitespace)
      if (trimmed.startsWith("xref")) {
        var p = sec.indexOf("xref") + 4
        var parsing = true
        while (parsing && !truncated) {
          while (p < sec.length && sec.charAt(p).isWhitespace) p += 1
          if (p >= sec.length) { truncated = true }
          else if (sec.startsWith("trailer", p)) {
            parsing = false
            val tdict = sec.substring(p, math.min(sec.length, p + 8192))
            if (size < 0) size = sizeRe.findFirstMatchIn(tdict)
              .map(_.group(1).toInt).getOrElse(-1)
            if (rootObj < 0) rootObj = rootRe.findFirstMatchIn(tdict)
              .map(_.group(1).toInt).getOrElse(-1)
            if (tdict.contains("/Encrypt")) encrypted = true
            prev = prevRe.findFirstMatchIn(tdict)
              .map(_.group(1).toLong).getOrElse(-1L)
            if (prev >= bytes.length) truncated = true
          } else subRe.findPrefixMatchOf(sec.substring(p)) match {
            case Some(m) =>
              val start = m.group(1).toInt
              val count = m.group(2).toInt
              if (count > 100000) truncated = true
              else {
                p += m.matched.length
                while (p < sec.length &&
                  (sec.charAt(p) == '\r' || sec.charAt(p) == '\n')) p += 1
                var i = 0
                while (i < count && !truncated) {
                  if (p + 18 > sec.length) truncated = true
                  else {
                    val off = try sec.substring(p, p + 10).toLong
                      catch { case _: NumberFormatException => -1L }
                    val typ = sec.charAt(p + 17)
                    if (off < 0 || (typ != 'n' && typ != 'f'))
                      truncated = true
                    else if (typ == 'n' && !offsets.contains(start + i))
                      offsets(start + i) = off
                    p += 20
                  }
                  i += 1
                }
              }
            case None => truncated = true
          }
        }
      } else if ("""(?s)\A\d+\s+\d+\s+obj""".r
          .findPrefixMatchOf(trimmed).isDefined) {
        xrefStream = true // 1.5+ xref object: honest report, no inflate
      } else truncated = true
    }
    if (truncated || xrefStream)
      return PdfMeta(vMaj, vMin, 0, math.max(size - 1, 0), encrypted,
        linearized, math.max(updates, 0), xrefStream, truncated)
    // Root -> /Pages -> /Count, each hop via the xref offsets
    var nPages = -1
    offsets.get(rootObj).filter(_ < bytes.length).foreach { roff =>
      val cat = str(roff, 4096)
      val pagesObj = """(?s)/Pages\s+(\d{1,9})\s+\d+\s+R""".r
        .findFirstMatchIn(cat).map(_.group(1).toInt)
      pagesObj.flatMap(offsets.get).filter(_ < bytes.length)
        .foreach { poff =>
          nPages = """(?s)/Count\s+(\d{1,9})""".r
            .findFirstMatchIn(str(poff, 4096))
            .map(_.group(1).toInt).getOrElse(-1)
        }
    }
    if (nPages < 0 || size < 1) truncated = true
    PdfMeta(vMaj, vMin, math.max(nPages, 0), math.max(size - 1, 0),
      encrypted, linearized, updates, false, truncated)
  }

  private val pdfSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[PdfMeta].dataType.asInstanceOf[StructType]

  /** [[pdfMeta]] over a blob column — appends a nullable `pdf` struct. */
  def decodePdfHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("pdf", pdfSchema, nullable = true)) { bytes =>
      pdfMeta(bytes) match {
        case null => null
        case m => Row(m.version_major, m.version_minor, m.n_pages,
          m.n_objects, m.encrypted, m.linearized, m.n_updates,
          m.xref_stream, m.truncated)
      }
    }

  /** Deterministic synthetic single-revision PDF: a classic xref-table
    * file with `nPages` empty pages under one /Pages tree, an optional
    * standard-security /Encrypt dict, and an optional /Linearized
    * marker object (the marker only — real linearization adds hint
    * streams this walker never reads). Correct byte offsets in the
    * xref, trailer /Size /Root, startxref, %%EOF — a CONTAINER
    * fixture. */
  def syntheticPdf(nPages: Int, encrypted: Boolean,
      linearized: Boolean): Array[Byte] = {
    require(nPages >= 1 && nPages <= 10000, "syntheticPdf salt")
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val sb = new StringBuilder
    sb.append("%PDF-1.7\n%âãÏÓ\n")
    val offsets = scala.collection.mutable.TreeMap.empty[Int, Int]
    def obj(num: Int, body: String): Unit = {
      offsets(num) = sb.length
      sb.append(num).append(" 0 obj\n").append(body).append("\nendobj\n")
    }
    var next = nPages + 3
    if (linearized) {
      obj(next, s"<< /Linearized 1 /N $nPages >>"); next += 1
    }
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    val kids = (0 until nPages).map(i => s"${i + 3} 0 R").mkString(" ")
    obj(2, s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    (0 until nPages).foreach(i => obj(i + 3,
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>"))
    val encObj = if (encrypted) {
      obj(next, "<< /Filter /Standard /V 1 /R 2 /O <00> /U <00> /P -44 >>")
      val e = next; next += 1; e
    } else -1
    val xrefAt = sb.length
    sb.append("xref\n0 ").append(next).append('\n')
    sb.append("0000000000 65535 f \n")
    (1 until next).foreach(n =>
      sb.append(f"${offsets(n)}%010d 00000 n \n"))
    sb.append("trailer\n<< /Size ").append(next)
      .append(" /Root 1 0 R")
    if (encObj > 0) sb.append(" /Encrypt ").append(encObj).append(" 0 R")
    sb.append(" >>\nstartxref\n").append(xrefAt).append("\n%%EOF\n")
    sb.toString.getBytes(iso)
  }

  /** `syntheticPdf` as a column function. */
  val syntheticPdfUdf = udf((nPages: Int, enc: Boolean, lin: Boolean) =>
    syntheticPdf(nPages, enc, lin))

  // ---- Avro object-container metadata (decode-free) -----------------------

  /** Parsed Avro OCF metadata: file-metadata entry count, declared
    * codec, the schema's top-level type and record name (sniffed from
    * the embedded schema JSON without a JSON library), and the block
    * census — counts/rows/bytes from the varint block headers, payloads
    * never decoded. */
  case class AvroMeta(n_meta_entries: Int, codec: String,
    schema_type: String, record_name: String, n_blocks: Int,
    total_rows: Long, total_block_bytes: Long, max_block_rows: Long,
    truncated: Boolean)

  /** DECODE-FREE Avro object-container walker (Avro 1.11 spec "Object
    * Container Files"): magic `Obj\x01`, then the file-metadata map
    * (zigzag-varint block counts; negative counts carry a byte-size
    * long per spec; string keys, bytes values), a 16-byte sync marker,
    * then data blocks — each a varint (rowCount, byteSize) pair, the
    * opaque payload, and a repeated sync marker that must equal the
    * header's. Payloads are skipped by declared size and never
    * decompressed; the codec is reported from `avro.codec` (default
    * "null" per spec) and the schema's top-level `type`/record `name`
    * are sniffed from the `avro.schema` JSON text. Hostile varints
    * (overlong, negative lengths, sizes past the buffer) and sync
    * mismatches flag `truncated` instead of reading out of bounds.
    * Returns null for payloads without the 4-byte magic. */
  def avroMeta(bytes: Array[Byte]): AvroMeta = {
    if (bytes == null || bytes.length < 20) return null
    if (!(bytes(0) == 'O' && bytes(1) == 'b' && bytes(2) == 'j' &&
      bytes(3) == 1)) return null
    var pos = 4
    var truncated = false
    // zigzag varint long; overruns and overlong encodings flag truncated
    def varlong(): Long = {
      var shift = 0
      var acc = 0L
      while (true) {
        if (pos >= bytes.length || shift > 63) { truncated = true; return 0L }
        val b = bytes(pos) & 0xff
        pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return (acc >>> 1) ^ -(acc & 1L)
        shift += 7
      }
      0L // unreachable
    }
    var nMeta = 0
    var schemaJson: String = null
    var codec = "null"
    var loop = true
    while (loop && !truncated) {
      var cnt = varlong()
      if (truncated || cnt == 0L) loop = false
      else {
        if (cnt < 0L) { varlong(); cnt = -cnt } // block byteSize, unused
        var i = 0L
        while (i < cnt && !truncated) {
          val klen = varlong()
          // subtraction form: `pos + klen` overflows for a 10-byte varint
          // decoding to ~Long.MaxValue (wraps negative, passes the check)
          if (truncated || klen < 0L || klen > bytes.length - pos)
            truncated = true
          else {
            val key = new String(bytes, pos, klen.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
            pos += klen.toInt
            val vlen = varlong()
            if (truncated || vlen < 0L || vlen > bytes.length - pos)
              truncated = true
            else {
              if (key == "avro.schema" || key == "avro.codec") {
                val v = new String(bytes, pos, vlen.toInt,
                  java.nio.charset.StandardCharsets.UTF_8)
                if (key == "avro.schema") schemaJson = v else codec = v
              }
              pos += vlen.toInt
              nMeta += 1
            }
          }
          i += 1
        }
      }
    }
    // schema sniff: a bare primitive ("long") or the first top-level
    // "type"/"name" string values — enough for a census, no JSON parser
    def jstr(key: String): String =
      if (schemaJson == null) null
      else ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r
        .findFirstMatchIn(schemaJson).map(_.group(1)).orNull
    val sTrim = if (schemaJson == null) null else schemaJson.trim
    val schemaType =
      if (sTrim == null) null
      else if (sTrim.startsWith("\"")) sTrim.stripPrefix("\"").stripSuffix("\"")
      else jstr("type")
    val recordName = if (sTrim == null) null else jstr("name")
    if (truncated || pos + 16 > bytes.length)
      return AvroMeta(nMeta, codec, schemaType, recordName, 0, 0L, 0L, 0L,
        truncated = true)
    val syncAt = pos
    pos += 16
    var nBlocks = 0
    var rows = 0L
    var blockBytes = 0L
    var maxRows = 0L
    while (!truncated && pos < bytes.length) {
      val rc = varlong()
      val bs = varlong()
      if (!truncated) {
        if (rc < 0L || bs < 0L || bs > bytes.length - pos - 16L)
          truncated = true
        else {
          pos += bs.toInt
          var ok = true
          var k = 0
          while (k < 16) {
            if (bytes(pos + k) != bytes(syncAt + k)) ok = false
            k += 1
          }
          if (!ok) truncated = true
          else {
            pos += 16
            nBlocks += 1
            rows += rc
            blockBytes += bs
            if (rc > maxRows) maxRows = rc
          }
        }
      }
    }
    AvroMeta(nMeta, codec, schemaType, recordName, nBlocks, rows,
      blockBytes, maxRows, truncated)
  }

  private val avroSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[AvroMeta].dataType.asInstanceOf[StructType]

  /** [[avroMeta]] over a blob column — appends a nullable `avro` struct. */
  def decodeAvroHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("avro", avroSchema, nullable = true)) { bytes =>
      avroMeta(bytes) match {
        case null => null
        case m => Row(m.n_meta_entries, m.codec, m.schema_type,
          m.record_name, m.n_blocks, m.total_rows, m.total_block_bytes,
          m.max_block_rows, m.truncated)
      }
    }

  /** Deterministic synthetic Avro OCF: real magic, a 2-entry metadata
    * map (`avro.schema` = a one-field record named `recordName`,
    * `avro.codec`), a seed-derived sync marker, and `nBlocks` blocks
    * where block i declares `baseRows + i·stepRows` rows over a
    * 3-bytes-per-row opaque payload. */
  def syntheticAvro(nBlocks: Int, baseRows: Int, stepRows: Int,
      deflate: Boolean, recordName: String): Array[Byte] = {
    require(nBlocks >= 0 && baseRows >= 0 && stepRows >= 0,
      "syntheticAvro salt")
    val bos = new java.io.ByteArrayOutputStream()
    def wv(n: Long): Unit = {
      var z = (n << 1) ^ (n >> 63)
      var go = true
      while (go) {
        var b = (z & 0x7fL).toInt
        z = z >>> 7
        if (z != 0L) b |= 0x80 else go = false
        bos.write(b)
      }
    }
    def wstr(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      wv(b.length.toLong); bos.write(b)
    }
    bos.write('O'); bos.write('b'); bos.write('j'); bos.write(1)
    wv(2L) // one metadata block of two entries
    wstr("avro.schema")
    wstr(s"""{"type":"record","name":"$recordName","fields":""" +
      """[{"name":"v","type":"long"}]}""")
    wstr("avro.codec")
    wstr(if (deflate) "deflate" else "null")
    wv(0L) // map terminator
    val sync = Array.tabulate(16)(i =>
      ((i * 31 + nBlocks * 7 + baseRows) & 0xff).toByte)
    bos.write(sync)
    var i = 0
    while (i < nBlocks) {
      val rows = baseRows + i * stepRows
      val size = rows * 3
      wv(rows.toLong); wv(size.toLong)
      var j = 0
      while (j < size) { bos.write((j * 13 + i) & 0xff); j += 1 }
      bos.write(sync)
      i += 1
    }
    bos.toByteArray
  }

  /** `syntheticAvro` as a column function. */
  val syntheticAvroUdf = udf((n: Int, base: Int, step: Int, d: Boolean,
    name: String) => syntheticAvro(n, base, step, d, name))

  // ---- Office / eBook document containers (DOCX, EPUB — decode-free) ------

  /** Parsed office/eBook container metadata: the sniffed kind, part
    * censuses from the ZIP central directory (names + declared
    * uncompressed sizes), the main content volume, and the EPUB
    * `mimetype` string when the entry is STORED (readable without
    * inflating — the EPUB OCF spec requires stored-first `mimetype`). */
  case class DocContainerMeta(kind: String, n_parts: Int,
    n_xml_parts: Int, content_bytes: Long, total_uncompressed: Long,
    mimetype: String, truncated: Boolean)

  /** DECODE-FREE DOCX/EPUB walker atop the ZIP central directory (the
    * [[zipMeta]] chassis with entry names): EOCD scan from the tail,
    * then PK\x01\x02 entries carrying name, uncompressed size, and
    * local-header offset. Kind sniff per the public specs — EPUB when
    * the STORED `mimetype` entry reads `application/epub+zip` (read
    * from its local header, method 0 = raw bytes, nothing inflated);
    * DOCX when `[Content_Types].xml` is present alongside `word/`
    * parts; `zip` otherwise. Content volume is `word/document.xml`'s
    * declared size for DOCX and the `.xhtml`/`.html` sum for EPUB.
    * Hostile offsets/lengths flag `truncated`; returns null when no
    * EOCD exists. */
  def docContainerMeta(bytes: Array[Byte]): DocContainerMeta = {
    if (bytes == null || bytes.length < 22) return null
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
    var eocd = -1
    var i = bytes.length - 22
    val floor = math.max(0, bytes.length - 22 - 65535)
    while (eocd < 0 && i >= floor) {
      if (bytes(i) == 'P' && bytes(i + 1) == 'K' && bytes(i + 2) == 5 &&
        bytes(i + 3) == 6) eocd = i
      i -= 1
    }
    if (eocd < 0) return null
    val n = u16(eocd + 10)
    var pos = u32(eocd + 16)
    var count = 0
    var truncated = false
    var total = 0L
    var nXml = 0
    var mainDocx = 0L
    var epubContent = 0L
    var hasContentTypes = false
    var hasWordPart = false
    var hasSheetPart = false
    var hasSlidePart = false
    var sheetContent = 0L
    var slideContent = 0L
    var mimetype: String = null
    while (count < n && !truncated) {
      if (pos + 46 > bytes.length ||
        !(bytes(pos.toInt) == 'P' && bytes(pos.toInt + 1) == 'K' &&
          bytes(pos.toInt + 2) == 1 && bytes(pos.toInt + 3) == 2)) {
        truncated = true
      } else {
        val p = pos.toInt
        val method = u16(p + 10)
        val unc = u32(p + 24)
        val nameLen = u16(p + 28)
        val varLen = nameLen + u16(p + 30) + u16(p + 32)
        val localOff = u32(p + 42)
        if (p + 46 + nameLen > bytes.length) truncated = true
        else {
          val name = new String(bytes, p + 46, nameLen,
            java.nio.charset.StandardCharsets.US_ASCII)
          total += unc
          val lower = name.toLowerCase
          if (lower.endsWith(".xml") || lower.endsWith(".xhtml") ||
            lower.endsWith(".opf") || lower.endsWith(".rels")) nXml += 1
          if (name == "[Content_Types].xml") hasContentTypes = true
          if (name.startsWith("word/")) hasWordPart = true
          if (name.startsWith("xl/")) hasSheetPart = true
          if (name.startsWith("ppt/")) hasSlidePart = true
          if (name == "word/document.xml") mainDocx = unc
          if (name.startsWith("xl/worksheets/") && lower.endsWith(".xml"))
            sheetContent += unc
          if (name.startsWith("ppt/slides/") && lower.endsWith(".xml"))
            slideContent += unc
          if (lower.endsWith(".xhtml") || lower.endsWith(".html"))
            epubContent += unc
          if (name == "mimetype" && method == 0) {
            // STORED: the payload is raw bytes behind the local header
            val lo = localOff.toInt
            if (localOff + 30 > bytes.length ||
              !(bytes(lo) == 'P' && bytes(lo + 1) == 'K' &&
                bytes(lo + 2) == 3 && bytes(lo + 3) == 4)) truncated = true
            else {
              val dataAt = lo + 30 + u16(lo + 26) + u16(lo + 28)
              val len = math.min(unc, 64L).toInt
              if (dataAt + len > bytes.length) truncated = true
              else mimetype = new String(bytes, dataAt, len,
                java.nio.charset.StandardCharsets.US_ASCII)
            }
          }
          pos += 46L + varLen
          count += 1
        }
      }
    }
    val kind =
      if (mimetype == "application/epub+zip") "epub"
      else if (hasContentTypes && hasWordPart) "docx"
      else if (hasContentTypes && hasSheetPart) "xlsx"
      else if (hasContentTypes && hasSlidePart) "pptx"
      else "zip"
    val content = kind match {
      case "docx" => mainDocx
      case "epub" => epubContent
      case "xlsx" => sheetContent
      case "pptx" => slideContent
      case _ => 0L
    }
    DocContainerMeta(kind, count, nXml, content, total, mimetype,
      truncated)
  }

  private val docContainerSchema = org.apache.spark.sql.catalyst
    .ScalaReflection.schemaFor[DocContainerMeta].dataType
    .asInstanceOf[StructType]

  /** [[docContainerMeta]] over a blob column — appends a nullable
    * `doc` struct. */
  def decodeDocContainers(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("doc", docContainerSchema, nullable = true)) { bytes =>
      docContainerMeta(bytes) match {
        case null => null
        case m => Row(m.kind, m.n_parts, m.n_xml_parts, m.content_bytes,
          m.total_uncompressed, m.mimetype, m.truncated)
      }
    }

  /** STORED-member ZIP with caller-chosen names and payloads — the
    * shared fixture builder behind [[syntheticDocx]]/[[syntheticEpub]]
    * (real local headers, central directory, EOCD; fake CRCs — the
    * walkers never check them). */
  def storedZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    val offsets = new Array[Long](entries.size)
    entries.zipWithIndex.foreach { case ((name, data), e) =>
      offsets(e) = bos.size().toLong
      bos.write('P'); bos.write('K'); bos.write(3); bos.write(4)
      le16(20); le16(0); le16(0); le16(0); le16(0)
      le32(0xabcd1234L); le32(data.length.toLong); le32(data.length.toLong)
      le16(name.length); le16(0)
      bos.write(name.getBytes("US-ASCII"))
      bos.write(data)
    }
    val cdStart = bos.size().toLong
    entries.zipWithIndex.foreach { case ((name, data), e) =>
      bos.write('P'); bos.write('K'); bos.write(1); bos.write(2)
      le16(20); le16(20); le16(0); le16(0); le16(0); le16(0)
      le32(0xabcd1234L); le32(data.length.toLong); le32(data.length.toLong)
      le16(name.length); le16(0); le16(0)
      le16(0); le16(0); le32(0L); le32(offsets(e))
      bos.write(name.getBytes("US-ASCII"))
    }
    val cdSize = bos.size().toLong - cdStart
    bos.write('P'); bos.write('K'); bos.write(5); bos.write(6)
    le16(0); le16(0); le16(entries.size); le16(entries.size)
    le32(cdSize); le32(cdStart); le16(0)
    bos.toByteArray
  }

  private def fillerBytes(n: Int, salt: Int): Array[Byte] =
    Array.tabulate(n)(j => ('a' + (j * 7 + salt) % 26).toByte)

  /** Deterministic minimal DOCX: `[Content_Types].xml` (100 B),
    * `_rels/.rels` (80 B), `word/document.xml` (`docBytes`),
    * `word/styles.xml` (90 B), and `nMedia` binary media parts of
    * `mediaBase + 11·i` bytes. */
  def syntheticDocx(nMedia: Int, mediaBase: Int, docBytes: Int): Array[Byte] = {
    require(nMedia >= 0 && mediaBase >= 0 && docBytes >= 0,
      "syntheticDocx salt")
    storedZip(
      Seq(
        "[Content_Types].xml" -> fillerBytes(100, 1),
        "_rels/.rels" -> fillerBytes(80, 2),
        "word/document.xml" -> fillerBytes(docBytes, 3),
        "word/styles.xml" -> fillerBytes(90, 4)) ++
      (0 until nMedia).map(i =>
        s"word/media/image$i.bin" -> fillerBytes(mediaBase + 11 * i, 5 + i)))
  }

  /** Deterministic minimal EPUB: STORED `mimetype`
    * (`application/epub+zip`), `META-INF/container.xml` (120 B),
    * `OEBPS/content.opf` (150 B), and `nChapters` XHTML chapters of
    * `chBase + 17·i` bytes. */
  def syntheticEpub(nChapters: Int, chBase: Int): Array[Byte] = {
    require(nChapters >= 0 && chBase >= 0, "syntheticEpub salt")
    storedZip(
      Seq(
        "mimetype" ->
          "application/epub+zip".getBytes("US-ASCII"),
        "META-INF/container.xml" -> fillerBytes(120, 1),
        "OEBPS/content.opf" -> fillerBytes(150, 2)) ++
      (0 until nChapters).map(i =>
        s"OEBPS/ch$i.xhtml" -> fillerBytes(chBase + 17 * i, 3 + i)))
  }

  /** `syntheticDocx` / `syntheticEpub` as column functions. */
  val syntheticDocxUdf = udf((n: Int, base: Int, doc: Int) =>
    syntheticDocx(n, base, doc))
  val syntheticEpubUdf = udf((n: Int, base: Int) =>
    syntheticEpub(n, base))

  /** Deterministic minimal XLSX: `[Content_Types].xml` (100 B),
    * `xl/workbook.xml` (110 B), `xl/sharedStrings.xml` (70 B), and
    * `nSheets` worksheets of `shBase + 13·i` bytes. */
  def syntheticXlsx(nSheets: Int, shBase: Int): Array[Byte] = {
    require(nSheets >= 0 && shBase >= 0, "syntheticXlsx salt")
    storedZip(
      Seq(
        "[Content_Types].xml" -> fillerBytes(100, 1),
        "xl/workbook.xml" -> fillerBytes(110, 2),
        "xl/sharedStrings.xml" -> fillerBytes(70, 3)) ++
      (0 until nSheets).map(i =>
        s"xl/worksheets/sheet${i + 1}.xml" -> fillerBytes(shBase + 13 * i,
          4 + i)))
  }

  /** Deterministic minimal PPTX: `[Content_Types].xml` (100 B),
    * `ppt/presentation.xml` (130 B), and `nSlides` slides of
    * `slBase + 19·i` bytes. */
  def syntheticPptx(nSlides: Int, slBase: Int): Array[Byte] = {
    require(nSlides >= 0 && slBase >= 0, "syntheticPptx salt")
    storedZip(
      Seq(
        "[Content_Types].xml" -> fillerBytes(100, 1),
        "ppt/presentation.xml" -> fillerBytes(130, 2)) ++
      (0 until nSlides).map(i =>
        s"ppt/slides/slide${i + 1}.xml" -> fillerBytes(slBase + 19 * i,
          3 + i)))
  }

  /** `syntheticXlsx` / `syntheticPptx` as column functions. */
  val syntheticXlsxUdf = udf((n: Int, base: Int) => syntheticXlsx(n, base))
  val syntheticPptxUdf = udf((n: Int, base: Int) => syntheticPptx(n, base))

  // ---- Zstandard frames (decode-free) -------------------------------------

  /** Parsed zstd stream metadata: frame/skippable-frame census, block
    * census by type, the declared (frame-header) content size summed
    * across frames (-1 when any frame omits it), the largest window
    * any frame requests, checksum/dictionary flags, and the payload
    * volume walked past — everything a corpus census needs from a
    * `.jsonl.zst` shard without inflating a byte. */
  case class ZstdMeta(n_frames: Int, n_skippable: Int,
    skippable_bytes: Long, n_blocks: Int, n_compressed_blocks: Int,
    n_rle_blocks: Int, n_raw_blocks: Int, content_size: Long,
    window_max: Long, has_checksum: Boolean, dict_id: Long,
    max_block_size: Long, total_payload_bytes: Long, truncated: Boolean)

  /** DECODE-FREE Zstandard walker (RFC 8878) — the dominant shipping
    * container for public LLM corpora (`.jsonl.zst`). Walks every
    * frame in the stream: magic `28 B5 2F FD`, the frame-header
    * descriptor (content-size field width 0/1/2/4/8 by flag +
    * single-segment, dictionary-ID width 0/1/2/4, checksum flag,
    * reserved bit must be zero), the window descriptor
    * (`2^(10+exp) + mantissa·2^(10+exp)/8`), then the block chain by
    * 3-byte little-endian block headers — bit 0 last-block, bits 1-2
    * type (raw/RLE/compressed; reserved flags corrupt), bits 3-23
    * size; raw/compressed payloads are SKIPPED by declared size, an
    * RLE block carries exactly one byte. Skippable frames
    * (`5? 2A 4D 18`) are skipped by their 4-byte declared size and
    * censused separately. All bounds checks are subtraction-form (a
    * hostile size cannot overflow past the guard); any overrun,
    * reserved bit/type, or trailing garbage flags `truncated` instead
    * of reading out of bounds. Returns null when the stream does not
    * open with a zstd or skippable magic. */
  def zstdMeta(bytes: Array[Byte]): ZstdMeta = {
    if (bytes == null || bytes.length < 4) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def u32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def isZstdMagic(i: Int): Boolean =
      u8(i) == 0x28 && u8(i + 1) == 0xb5 && u8(i + 2) == 0x2f &&
        u8(i + 3) == 0xfd
    def isSkippableMagic(i: Int): Boolean =
      (u8(i) & 0xf0) == 0x50 && u8(i + 1) == 0x2a && u8(i + 2) == 0x4d &&
        u8(i + 3) == 0x18
    if (!isZstdMagic(0) && !isSkippableMagic(0)) return null
    var pos = 0
    var truncated = false
    var nFrames = 0; var nSkip = 0; var skipBytes = 0L
    var nBlocks = 0; var nComp = 0; var nRle = 0; var nRaw = 0
    var contentKnown = true; var content = 0L
    var windowMax = 0L; var checksum = false; var dictId = 0L
    var maxBlock = 0L; var payload = 0L
    while (!truncated && pos < bytes.length) {
      if (bytes.length - pos < 4) { truncated = true }
      else if (isSkippableMagic(pos)) {
        if (bytes.length - pos < 8) truncated = true
        else {
          val sz = u32(pos + 4)
          if (sz > bytes.length - pos - 8L) truncated = true
          else { nSkip += 1; skipBytes += sz; pos += 8 + sz.toInt }
        }
      } else if (!isZstdMagic(pos)) {
        truncated = true // trailing garbage between frames
      } else {
        pos += 4
        if (pos >= bytes.length) { truncated = true }
        else {
          val fhd = u8(pos); pos += 1
          val fcsFlag = fhd >>> 6
          val singleSegment = (fhd & 0x20) != 0
          val reserved = (fhd & 0x08) != 0
          val hasChecksum = (fhd & 0x04) != 0
          val didFlag = fhd & 0x03
          if (reserved) truncated = true
          else {
            if (!singleSegment) {
              if (pos >= bytes.length) truncated = true
              else {
                val wd = u8(pos); pos += 1
                val base = 1L << (10 + (wd >>> 3))
                val win = base + (base / 8) * (wd & 7)
                if (win > windowMax) windowMax = win
              }
            }
            val didLen = didFlag match {
              case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
            }
            if (!truncated && didLen > bytes.length - pos) truncated = true
            else if (!truncated) {
              var d = 0L
              var i = 0
              while (i < didLen) { d |= (u8(pos + i).toLong << (8 * i)); i += 1 }
              pos += didLen
              if (d != 0L) dictId = d
              val fcsLen = fcsFlag match {
                case 0 => if (singleSegment) 1 else 0
                case 1 => 2; case 2 => 4; case _ => 8
              }
              if (fcsLen > bytes.length - pos) truncated = true
              else {
                if (fcsLen == 0) contentKnown = false
                else {
                  var c = 0L
                  var j = 0
                  while (j < fcsLen) { c |= (u8(pos + j).toLong << (8 * j)); j += 1 }
                  if (fcsLen == 2) c += 256L // RFC 8878: 2-byte field is value-256
                  pos += fcsLen
                  if (c < 0L) truncated = true else content += c
                  if (singleSegment && c > windowMax) windowMax = c
                }
                // block chain
                var last = false
                while (!truncated && !last) {
                  if (bytes.length - pos < 3) truncated = true
                  else {
                    val h = u8(pos) | (u8(pos + 1) << 8) | (u8(pos + 2) << 16)
                    pos += 3
                    last = (h & 1) != 0
                    val btype = (h >>> 1) & 3
                    val bsize = (h >>> 3).toLong
                    if (btype == 3) truncated = true // reserved type
                    else {
                      val consumed = if (btype == 1) 1L else bsize
                      if (consumed > bytes.length - pos) truncated = true
                      else {
                        pos += consumed.toInt
                        nBlocks += 1
                        btype match {
                          case 0 => nRaw += 1
                          case 1 => nRle += 1
                          case _ => nComp += 1
                        }
                        payload += consumed
                        if (bsize > maxBlock) maxBlock = bsize
                      }
                    }
                  }
                }
                if (!truncated) {
                  if (hasChecksum) {
                    checksum = true
                    if (bytes.length - pos < 4) truncated = true
                    else pos += 4
                  }
                  nFrames += 1
                }
              }
            }
          }
        }
      }
    }
    ZstdMeta(nFrames, nSkip, skipBytes, nBlocks, nComp, nRle, nRaw,
      if (contentKnown) content else -1L, windowMax, checksum, dictId,
      maxBlock, payload, truncated)
  }

  private val zstdSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[ZstdMeta].dataType.asInstanceOf[StructType]

  /** [[zstdMeta]] over a blob column — appends a nullable `zstd`
    * struct. */
  def decodeZstdFrames(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("zstd", zstdSchema, nullable = true)) { bytes =>
      zstdMeta(bytes) match {
        case null => null
        case m => Row(m.n_frames, m.n_skippable, m.skippable_bytes,
          m.n_blocks, m.n_compressed_blocks, m.n_rle_blocks,
          m.n_raw_blocks, m.content_size, m.window_max, m.has_checksum,
          m.dict_id, m.max_block_size, m.total_payload_bytes,
          m.truncated)
      }
    }

  /** Deterministic synthetic zstd stream: an optional leading
    * skippable frame (8 payload bytes), then `nFrames` frames — each
    * with a 4-byte declared content size of `1000 + 31·f`, a window
    * descriptor of 8 KiB, and `nBlocks` blocks where block b is RLE
    * (1 payload byte, declared regenerated size `baseLen`) when
    * `b % 3 == 2` and otherwise a compressed block of `baseLen + 7·b`
    * non-decodable payload bytes; an optional 4-byte checksum. A
    * CONTAINER fixture — nothing in it decompresses. */
  def syntheticZstd(nFrames: Int, nBlocks: Int, baseLen: Int,
      withChecksum: Boolean, withSkippable: Boolean): Array[Byte] = {
    require(nFrames >= 1 && nBlocks >= 1 && baseLen >= 1,
      "syntheticZstd salt")
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    if (withSkippable) {
      bos.write(0x50); bos.write(0x2a); bos.write(0x4d); bos.write(0x18)
      le32(8L)
      var i = 0
      while (i < 8) { bos.write((i * 5 + 1) & 0xff); i += 1 }
    }
    var f = 0
    while (f < nFrames) {
      bos.write(0x28); bos.write(0xb5); bos.write(0x2f); bos.write(0xfd)
      // FHD: fcsFlag=2 (4-byte), no single-segment, checksum per arg
      bos.write(0x80 | (if (withChecksum) 0x04 else 0))
      bos.write(0x18) // window descriptor: exp=3 -> 8 KiB, mantissa 0
      le32(1000L + 31L * f)
      var b = 0
      while (b < nBlocks) {
        val lastBit = if (b == nBlocks - 1) 1 else 0
        if (b % 3 == 2) { // RLE: declared size baseLen, 1 payload byte
          val h = lastBit | (1 << 1) | (baseLen << 3)
          bos.write(h & 0xff); bos.write((h >> 8) & 0xff)
          bos.write((h >> 16) & 0xff)
          bos.write((b * 3 + f) & 0xff)
        } else { // compressed: baseLen + 7*b payload bytes
          val sz = baseLen + 7 * b
          val h = lastBit | (2 << 1) | (sz << 3)
          bos.write(h & 0xff); bos.write((h >> 8) & 0xff)
          bos.write((h >> 16) & 0xff)
          var j = 0
          while (j < sz) { bos.write((j * 11 + b + f) & 0xff); j += 1 }
        }
        b += 1
      }
      if (withChecksum) le32(0xcafef00dL)
      f += 1
    }
    bos.toByteArray
  }

  /** `syntheticZstd` as a column function. */
  val syntheticZstdUdf = udf((nf: Int, nb: Int, base: Int, ck: Boolean,
    sk: Boolean) => syntheticZstd(nf, nb, base, ck, sk))

  // ---- ORC footer/postscript (decode-free) --------------------------------

  /** Bounds-checked protobuf wire cursor (the [[TCompactCursor]]
    * discipline for the OTHER tail format): varints are capped at 10
    * bytes AND at `Int.MaxValue` for any value used as a length, every
    * length-delimited span is checked subtraction-form, and unknown
    * fields of any wire type can be skipped. Overruns set `bad` —
    * callers flag truncated instead of reading out of bounds. */
  private final class PBCursor(bytes: Array[Byte], start: Int,
      val end: Int) {
    var pos: Int = start
    var bad: Boolean = false
    def hasMore: Boolean = !bad && pos < end
    def varint(): Long = {
      var shift = 0
      var acc = 0L
      while (true) {
        if (pos >= end || shift > 63) { bad = true; return 0L }
        val b = bytes(pos) & 0xff
        pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      0L // unreachable
    }
    /** varint that will be used as a byte length: also rejects values
      * past Int.MaxValue (no 2 GB spans inside a blob). */
    def lenVarint(): Int = {
      val v = varint()
      if (bad || v < 0L || v > Int.MaxValue) { bad = true; 0 }
      else v.toInt
    }
    /** Reads a field key; returns (fieldNumber, wireType) or null at
      * a clean end of the message. */
    def key(): (Int, Int) = {
      if (!hasMore) return null
      val k = varint()
      if (bad || k < 0L || (k >>> 3) > Int.MaxValue) { bad = true; null }
      else ((k >>> 3).toInt, (k & 7L).toInt)
    }
    /** Skips a field of the given wire type. */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => if (8 > end - pos) bad = true else pos += 8
      case 2 =>
        val l = lenVarint()
        if (!bad && l > end - pos) bad = true else if (!bad) pos += l
      case 5 => if (4 > end - pos) bad = true else pos += 4
      case _ => bad = true // groups/reserved — never in ORC
    }
    /** Enters a length-delimited field: returns (start, end) of the
      * nested span and advances past it. */
    def nested(): (Int, Int) = {
      val l = lenVarint()
      if (bad || l > end - pos) { bad = true; null }
      else { val s = pos; pos += l; (s, s + l) }
    }
    def str(s: Int, e: Int): String =
      new String(bytes, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Parsed ORC tail metadata: postscript fields (footer/metadata
    * lengths, compression kind + block size, writer version), the
    * footer's stripe census (count, declared row/data/index sums,
    * max stripe rows), type census (total type nodes + root struct
    * field count), declared total rows, content length, and row-index
    * stride. `footer_parsed` is false when the footer is compressed
    * with a real codec chunk (decode-free means we only read
    * uncompressed or original-chunk footers). */
  case class OrcMeta(postscript_len: Int, compression: String,
    compression_block_size: Long, footer_length: Long,
    metadata_length: Long, writer_version: Long, footer_parsed: Boolean,
    n_stripes: Int, total_rows: Long, stripe_rows: Long,
    max_stripe_rows: Long, data_bytes: Long, index_bytes: Long,
    n_types: Int, n_root_fields: Int, content_length: Long,
    row_index_stride: Long, truncated: Boolean)

  /** DECODE-FREE ORC walker (Apache ORC spec v1): the file's last
    * byte gives the postscript length; the postscript is an
    * UNCOMPRESSED protobuf carrying footerLength, compression kind,
    * compressionBlockSize, metadataLength, writerVersion and the
    * trailing magic field "ORC". The footer protobuf (stripe census:
    * offset/index/data/footer lengths + row counts per stripe; the
    * type tree; numberOfRows; rowIndexStride) sits immediately before
    * the postscript. When compression != NONE the footer is chunked
    * with 3-byte headers — a chunk whose original bit is set is
    * readable as-is (the common case for small footers); a genuinely
    * compressed chunk leaves `footer_parsed` false with the
    * postscript-level census intact. Returns null when the leading
    * magic is not `ORC` or the postscript lacks its magic field.
    * Hostile lengths flag `truncated` (subtraction-form checks
    * throughout, the Avro-walker lesson). */
  def orcMeta(bytes: Array[Byte]): OrcMeta = {
    if (bytes == null || bytes.length < 8) return null
    if (!(bytes(0) == 'O' && bytes(1) == 'R' && bytes(2) == 'C'))
      return null
    val psLen = bytes(bytes.length - 1) & 0xff
    if (psLen < 1 || psLen > bytes.length - 2) return null
    val psStart = bytes.length - 1 - psLen
    val ps = new PBCursor(bytes, psStart, bytes.length - 1)
    var footerLen = 0L; var compression = 0L; var blockSize = 0L
    var metaLen = 0L; var writerVer = 0L; var magic: String = null
    var psLoop = true
    while (psLoop && ps.hasMore) {
      val k = ps.key()
      if (k == null) psLoop = false
      else k match {
        case (1, 0) => footerLen = ps.varint()
        case (2, 0) => compression = ps.varint()
        case (3, 0) => blockSize = ps.varint()
        case (5, 0) => metaLen = ps.varint()
        case (6, 0) => writerVer = ps.varint()
        case (8000, 2) =>
          val n = ps.nested()
          if (n != null) magic = ps.str(n._1, n._2)
        case (_, w) => ps.skip(w)
      }
    }
    if (magic != "ORC") return null // not an ORC postscript
    val compName = compression match {
      case 0 => "none"; case 1 => "zlib"; case 2 => "snappy"
      case 3 => "lzo"; case 4 => "lz4"; case 5 => "zstd"
      case c => s"unknown($c)"
    }
    var truncated = ps.bad
    if (footerLen < 0L || footerLen > psStart) truncated = true
    var footerParsed = false
    var nStripes = 0; var totalRows = 0L; var stripeRows = 0L
    var maxStripeRows = 0L; var dataBytes = 0L; var indexBytes = 0L
    var nTypes = 0; var rootFields = 0; var contentLen = 0L
    var stride = 0L
    if (!truncated) {
      var fs = psStart - footerLen.toInt
      var fe = psStart
      var readable = true
      if (compression != 0L) {
        // chunked: 3-byte LE header, LSB = "original" (uncompressed)
        if (fe - fs < 3) { truncated = true; readable = false }
        else {
          val h = (bytes(fs) & 0xff) | ((bytes(fs + 1) & 0xff) << 8) |
            ((bytes(fs + 2) & 0xff) << 16)
          val original = (h & 1) == 1
          val chunkLen = h >>> 1
          if (!original || chunkLen > fe - fs - 3) readable = false
          else { fs += 3; fe = fs + chunkLen }
        }
      }
      if (readable && !truncated) {
        val f = new PBCursor(bytes, fs, fe)
        var loop = true
        while (loop && f.hasMore) {
          val k = f.key()
          if (k == null) loop = false
          else k match {
            case (2, 0) => contentLen = f.varint()
            case (3, 2) => // StripeInformation
              val n = f.nested()
              if (n != null) {
                val s = new PBCursor(bytes, n._1, n._2)
                var rows = 0L
                var sl = true
                while (sl && s.hasMore) {
                  val sk = s.key()
                  if (sk == null) sl = false
                  else sk match {
                    case (2, 0) => indexBytes += s.varint()
                    case (3, 0) => dataBytes += s.varint()
                    case (5, 0) => rows = s.varint()
                    case (_, w) => s.skip(w)
                  }
                }
                if (s.bad) truncated = true
                else {
                  nStripes += 1
                  stripeRows += rows
                  if (rows > maxStripeRows) maxStripeRows = rows
                }
              }
            case (4, 2) => // Type node
              val n = f.nested()
              if (n != null) {
                nTypes += 1
                if (nTypes == 1) { // root struct: count its subtype refs
                  val t = new PBCursor(bytes, n._1, n._2)
                  var tl = true
                  while (tl && t.hasMore) {
                    val tk = t.key()
                    if (tk == null) tl = false
                    else tk match {
                      case (2, 0) => rootFields += 1; t.varint()
                      case (2, 2) => // packed subtypes
                        val p = t.nested()
                        if (p != null) {
                          val pc = new PBCursor(bytes, p._1, p._2)
                          while (pc.hasMore) { pc.varint(); rootFields += 1 }
                        }
                      case (_, w) => t.skip(w)
                    }
                  }
                }
              }
            case (6, 0) => totalRows = f.varint()
            case (8, 0) => stride = f.varint()
            case (_, w) => f.skip(w)
          }
        }
        if (f.bad) truncated = true else footerParsed = true
      }
    }
    OrcMeta(psLen, compName, blockSize, footerLen, metaLen, writerVer,
      footerParsed && !truncated, nStripes, totalRows, stripeRows,
      maxStripeRows, dataBytes, indexBytes, nTypes, rootFields,
      contentLen, stride, truncated)
  }

  private val orcSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[OrcMeta].dataType.asInstanceOf[StructType]

  /** [[orcMeta]] over a blob column — appends a nullable `orc`
    * struct. */
  def decodeOrcFooters(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("orc", orcSchema, nullable = true)) { bytes =>
      orcMeta(bytes) match {
        case null => null
        case m => Row(m.postscript_len, m.compression,
          m.compression_block_size, m.footer_length, m.metadata_length,
          m.writer_version, m.footer_parsed, m.n_stripes, m.total_rows,
          m.stripe_rows, m.max_stripe_rows, m.data_bytes, m.index_bytes,
          m.n_types, m.n_root_fields, m.content_length,
          m.row_index_stride, m.truncated)
      }
    }

  /** Deterministic synthetic ORC tail: `ORC` magic, no stripe bodies
    * (the walker reads only declared footer values), a footer whose
    * stripe i declares `baseRows + 17·i` rows / `100 + 13·i` data
    * bytes / `20 + i` index bytes, a 3-type schema (root struct with
    * two primitive children), numberOfRows = Σ stripe rows,
    * rowIndexStride 10000 — and, when `zlib`, the footer wrapped in
    * one ORIGINAL (uncompressed) chunk behind a ZLIB postscript, the
    * real layout small footers ship with. */
  def syntheticOrc(nStripes: Int, baseRows: Int,
      zlib: Boolean): Array[Byte] = {
    require(nStripes >= 0 && baseRows >= 0, "syntheticOrc salt")
    def pb(build: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); build(b); b.toByteArray
    }
    def wv(bos: java.io.ByteArrayOutputStream, n: Long): Unit = {
      var z = n
      var go = true
      while (go) {
        var b = (z & 0x7fL).toInt
        z = z >>> 7
        if (z != 0L) b |= 0x80 else go = false
        bos.write(b)
      }
    }
    def field(bos: java.io.ByteArrayOutputStream, num: Int, wire: Int): Unit =
      wv(bos, (num.toLong << 3) | wire)
    def sub(bos: java.io.ByteArrayOutputStream, num: Int,
        payload: Array[Byte]): Unit = {
      field(bos, num, 2); wv(bos, payload.length.toLong); bos.write(payload)
    }
    var rowSum = 0L
    val footer = pb { fo =>
      field(fo, 1, 0); wv(fo, 3L) // headerLength = magic
      field(fo, 2, 0); wv(fo, 3L + 128L * nStripes) // contentLength
      var off = 3L
      var i = 0
      while (i < nStripes) {
        val rows = baseRows + 17L * i
        val dl = 100L + 13L * i
        val il = 20L + i
        rowSum += rows
        sub(fo, 3, pb { st =>
          field(st, 1, 0); wv(st, off)
          field(st, 2, 0); wv(st, il)
          field(st, 3, 0); wv(st, dl)
          field(st, 4, 0); wv(st, 30L)
          field(st, 5, 0); wv(st, rows)
        })
        off += il + dl + 30L
        i += 1
      }
      // type tree: root struct(2 children), long, string
      sub(fo, 4, pb { t =>
        field(t, 1, 0); wv(t, 12L) // STRUCT
        field(t, 2, 0); wv(t, 1L)  // subtype refs (unpacked)
        field(t, 2, 0); wv(t, 2L)
      })
      sub(fo, 4, pb { t => field(t, 1, 0); wv(t, 4L) })  // LONG
      sub(fo, 4, pb { t => field(t, 1, 0); wv(t, 7L) })  // STRING
      field(fo, 6, 0); wv(fo, rowSum)
      field(fo, 8, 0); wv(fo, 10000L)
    }
    val footerOut =
      if (!zlib) footer
      else { // one ORIGINAL chunk: 3-byte LE header, LSB set
        val h = (footer.length << 1) | 1
        Array[Byte]((h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
          ((h >> 16) & 0xff).toByte) ++ footer
      }
    val postscript = pb { p =>
      field(p, 1, 0); wv(p, footerOut.length.toLong)
      field(p, 2, 0); wv(p, if (zlib) 1L else 0L)
      if (zlib) { field(p, 3, 0); wv(p, 262144L) }
      field(p, 5, 0); wv(p, 0L) // metadataLength
      field(p, 6, 0); wv(p, 9L) // writerVersion
      sub(p, 8000, "ORC".getBytes("US-ASCII"))
    }
    require(postscript.length <= 255, "postscript fits one length byte")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write('O'); bos.write('R'); bos.write('C')
    bos.write(footerOut); bos.write(postscript)
    bos.write(postscript.length)
    bos.toByteArray
  }

  /** `syntheticOrc` as a column function. */
  val syntheticOrcUdf = udf((n: Int, base: Int, z: Boolean) =>
    syntheticOrc(n, base, z))

  // ---- HEIF / HEIC / AVIF still images (decode-free) ----------------------

  /** Parsed HEIF-family metadata: the `ftyp` brand + compatible-brand
    * count, the item count from `iinf`, the primary image dimensions
    * (first `ispe` in `iprp/ipco` — property order matches item order
    * in practice and exactly in our fixtures), the max dimensions over
    * all `ispe` boxes (the tile/thumbnail census), and the `ispe`
    * count. */
  case class HeifMeta(brand: String, n_compat_brands: Int,
    n_items: Long, width: Long, height: Long, max_width: Long,
    max_height: Long, n_ispe: Int, truncated: Boolean)

  /** DECODE-FREE HEIF/HEIC/AVIF walker — the [[mp4Meta]] ISO-BMFF box
    * discipline pointed at the still-image brands modern crawls carry.
    * Walks `ftyp` (brand must be one of heic/heix/hevc/mif1/msf1/
    * avif/avis), then `meta` — a FULLBOX (4 bytes version/flags before
    * children) — for `iinf` (item count: u16 at version 0, u32 later)
    * and `iprp`/`ipco`, whose `ispe` children each carry a u32
    * width/height pair behind their own fullbox header. Box sizes are
    * bounds-checked exactly as in [[mp4Meta]] (64-bit largesize
    * honored, hostile sizes stop the walk); a `meta` box that runs out
    * mid-walk flags `truncated`. Returns null for non-ISO-BMFF bytes
    * or brands outside the HEIF family (a plain MP4 is [[mp4Meta]]'s
    * business, not a corrupt image). */
  def heifMeta(bytes: Array[Byte]): HeifMeta = {
    if (bytes == null || bytes.length < 16) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def u32(at: Int): Long = bb.getInt(at) & 0xffffffffL
    def boxType(at: Int): String =
      new String(bytes, at + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def boxBounds(at: Int, limit: Int): (Int, Int, Int) = {
      if (at + 8 > limit) return null
      val sz = u32(at)
      if (sz == 0) (at + 8, limit, limit)
      else if (sz == 1) {
        if (at + 16 > limit) return null
        val lsz = bb.getLong(at + 8)
        if (lsz < 16 || lsz > limit - at) return null
        (at + 16, at + lsz.toInt, at + lsz.toInt)
      } else {
        if (sz < 8 || sz > limit - at) return null
        (at + 8, at + sz.toInt, at + sz.toInt)
      }
    }
    val heifBrands = Set("heic", "heix", "hevc", "mif1", "msf1",
      "avif", "avis")
    var brand: String = null
    var nCompat = 0
    var nItems = -1L
    var w = 0L; var h = 0L; var maxW = 0L; var maxH = 0L; var nIspe = 0
    var truncated = false
    def walkChildren(start: Int, end: Int)(
        visit: (String, Int, Int) => Unit): Unit = {
      var at = start
      var continue = true
      while (continue && at < end) {
        val b = boxBounds(at, end)
        if (b == null) { truncated = true; continue = false }
        else { visit(boxType(at), b._1, b._2); at = b._3 }
      }
    }
    def walkIpco(start: Int, end: Int): Unit = walkChildren(start, end) {
      case ("ispe", ps, pe) if pe - ps >= 12 =>
        // fullbox: version/flags, then u32 width, u32 height
        val iw = u32(ps + 4); val ih = u32(ps + 8)
        nIspe += 1
        if (nIspe == 1) { w = iw; h = ih }
        if (iw > maxW) maxW = iw
        if (ih > maxH) maxH = ih
      case _ =>
    }
    def walkMeta(start: Int, end: Int): Unit = {
      if (end - start < 4) { truncated = true; return }
      walkChildren(start + 4, end) { // skip fullbox version/flags
        case ("iinf", ps, pe) if pe - ps >= 6 =>
          val ver = bytes(ps) & 0xff
          if (ver == 0) nItems = ((bytes(ps + 4) & 0xff) << 8 |
            (bytes(ps + 5) & 0xff)).toLong
          else if (pe - ps >= 8) nItems = u32(ps + 4)
        case ("iprp", ps, pe) => walkChildren(ps, pe) {
          case ("ipco", ips, ipe) => walkIpco(ips, ipe)
          case _ =>
        }
        case _ =>
      }
    }
    var at = 0
    var sawMeta = false
    var continue = true
    while (continue && at < bytes.length) {
      val b = boxBounds(at, bytes.length)
      if (b == null) continue = false
      else {
        val (ps, pe, next) = b
        boxType(at) match {
          case "ftyp" if pe - ps >= 8 =>
            brand = new String(bytes, ps, 4,
              java.nio.charset.StandardCharsets.US_ASCII)
            nCompat = (pe - ps - 8) / 4 // after brand + minor version
          case "meta" => sawMeta = true; walkMeta(ps, pe)
          case _ =>
        }
        at = next
      }
    }
    if (brand == null || !heifBrands.contains(brand)) null
    else HeifMeta(brand, nCompat, nItems, w, h, maxW, maxH, nIspe,
      truncated || !sawMeta)
  }

  private val heifSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[HeifMeta].dataType.asInstanceOf[StructType]

  /** [[heifMeta]] over a blob column — appends a nullable `heif`
    * struct. */
  def decodeHeifHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("heif", heifSchema, nullable = true)) { bytes =>
      heifMeta(bytes) match {
        case null => null
        case m => Row(m.brand, m.n_compat_brands, m.n_items, m.width,
          m.height, m.max_width, m.max_height, m.n_ispe, m.truncated)
      }
    }

  /** Deterministic synthetic HEIF/AVIF: `ftyp` (brand `heic` or
    * `avif`, compat brands mif1+miaf), `meta` fullbox with `hdlr`
    * (pict), `iinf` (version 0, u16 count = nItems), and
    * `iprp`/`ipco` holding one `ispe` per item — item i is
    * `(baseW + 4·i) × (baseH + 3·i)`; item 0 is primary. */
  def syntheticHeif(nItems: Int, baseW: Int, baseH: Int,
      avif: Boolean): Array[Byte] = {
    require(nItems >= 1 && baseW >= 1 && baseH >= 1, "syntheticHeif salt")
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    def box(tp: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tp.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp",
      (if (avif) "avif" else "heic").getBytes("US-ASCII") ++
        be32(0L) ++ "mif1".getBytes("US-ASCII") ++
        "miaf".getBytes("US-ASCII"))
    val hdlr = box("hdlr", be32(0L) ++ be32(0L) ++
      "pict".getBytes("US-ASCII") ++ Array.fill[Byte](13)(0))
    val iinf = box("iinf", Array[Byte](0, 0, 0, 0,
      ((nItems >> 8) & 0xff).toByte, (nItems & 0xff).toByte))
    val ispes = (0 until nItems).map { i =>
      box("ispe", be32(0L) ++ be32(baseW + 4L * i) ++ be32(baseH + 3L * i))
    }.reduce(_ ++ _)
    val iprp = box("iprp", box("ipco", ispes))
    val meta = box("meta", be32(0L) ++ hdlr ++ iinf ++ iprp)
    ftyp ++ meta
  }

  /** `syntheticHeif` as a column function. */
  val syntheticHeifUdf = udf((n: Int, w: Int, h: Int, a: Boolean) =>
    syntheticHeif(n, w, h, a))

  // ---- WARC web-archive records (decode-free) -----------------------------

  /** Parsed WARC stream metadata: record census by WARC-Type, declared
    * content volume, URI census — what a crawl-curation pipeline reads
    * off a CommonCrawl WARC/WET/WAT shard before deciding what to
    * fetch, without touching a payload byte. */
  case class WarcMeta(version: String, n_records: Int, n_warcinfo: Int,
    n_response: Int, n_request: Int, n_metadata: Int, n_conversion: Int,
    n_other: Int, content_bytes: Long, max_content_length: Long,
    n_with_uri: Int, uri_bytes: Long, truncated: Boolean)

  /** DECODE-FREE WARC walker (ISO 28500 / WARC 1.1 — the CommonCrawl
    * shipping container; WET and WAT files are WARC too): each record
    * is a `WARC/x.y` version line, named headers to an empty CRLF
    * line, `Content-Length` octets of payload (SKIPPED, never
    * inspected), and a CRLF CRLF record boundary. Censuses records by
    * `WARC-Type` (warcinfo/response/request/metadata/conversion/
    * other), sums declared content lengths, and counts+sizes
    * `WARC-Target-URI` headers. Header names match case-insensitively
    * per spec; headers are latin-1. A record whose declared
    * Content-Length runs past the buffer, a missing blank-line
    * terminator, or a malformed version line flags `truncated`
    * (subtraction-form bounds checks; nothing reads out of range).
    * Returns null when the payload does not open with `WARC/`.
    * NOTE real CC shards arrive as per-record gzip members —
    * [[gzipMeta]] walks that layer; this walker reads the records
    * themselves (WET/WAT after gunzip, or uncompressed archives). */
  def warcMeta(bytes: Array[Byte]): WarcMeta = {
    if (bytes == null || bytes.length < 10) return null
    if (!(bytes(0) == 'W' && bytes(1) == 'A' && bytes(2) == 'R' &&
      bytes(3) == 'C' && bytes(4) == '/')) return null
    var pos = 0
    var truncated = false
    var version: String = null
    var nRec = 0; var nInfo = 0; var nResp = 0; var nReq = 0
    var nMeta = 0; var nConv = 0; var nOther = 0
    var contentBytes = 0L; var maxLen = 0L
    var nUri = 0; var uriBytes = 0L
    /** Reads one CRLF-terminated line; returns null (and flags) when
      * no terminator exists before the end of the buffer. */
    def line(): String = {
      var i = pos
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) { truncated = true; null }
      else {
        val s = new String(bytes, pos, i - pos,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        pos = i + 2
        s
      }
    }
    while (!truncated && pos < bytes.length) {
      val ver = line()
      if (ver == null) {} // flagged
      else if (!ver.startsWith("WARC/") || ver.length < 6) truncated = true
      else {
        if (version == null) version = ver.substring(5)
        var wtype: String = null
        var clen = -1L
        var uri: String = null
        var headerLoop = true
        while (headerLoop && !truncated) {
          val h = line()
          if (h == null) headerLoop = false
          else if (h.isEmpty) headerLoop = false
          else {
            val colon = h.indexOf(':')
            if (colon > 0) {
              val name = h.substring(0, colon).trim
                .toLowerCase(java.util.Locale.ROOT)
              val value = h.substring(colon + 1).trim
              name match {
                case "warc-type" => wtype =
                  value.toLowerCase(java.util.Locale.ROOT)
                case "content-length" =>
                  if (value.nonEmpty && value.length <= 18 &&
                    value.forall(c => c >= '0' && c <= '9'))
                    clen = value.toLong
                  else truncated = true // hostile/absent length
                case "warc-target-uri" => uri = value
                case _ =>
              }
            }
          }
        }
        if (!truncated) {
          if (clen < 0L || clen > bytes.length - pos) truncated = true
          else {
            pos += clen.toInt
            // record boundary: CRLF CRLF after the block
            if (4 > bytes.length - pos) truncated = true
            else if (!(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
              bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n'))
              truncated = true
            else {
              pos += 4
              nRec += 1
              contentBytes += clen
              if (clen > maxLen) maxLen = clen
              if (uri != null) { nUri += 1; uriBytes += uri.length }
              wtype match {
                case "warcinfo" => nInfo += 1
                case "response" => nResp += 1
                case "request" => nReq += 1
                case "metadata" => nMeta += 1
                case "conversion" => nConv += 1
                case _ => nOther += 1
              }
            }
          }
        }
      }
    }
    WarcMeta(version, nRec, nInfo, nResp, nReq, nMeta, nConv, nOther,
      contentBytes, maxLen, nUri, uriBytes, truncated)
  }

  private val warcSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[WarcMeta].dataType.asInstanceOf[StructType]

  /** [[warcMeta]] over a blob column — appends a nullable `warc`
    * struct. */
  def decodeWarcRecords(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("warc", warcSchema, nullable = true)) { bytes =>
      warcMeta(bytes) match {
        case null => null
        case m => Row(m.version, m.n_records, m.n_warcinfo, m.n_response,
          m.n_request, m.n_metadata, m.n_conversion, m.n_other,
          m.content_bytes, m.max_content_length, m.n_with_uri,
          m.uri_bytes, m.truncated)
      }
    }

  /** Deterministic synthetic WARC: an optional warcinfo record
    * (40 payload bytes, no URI), then `nPairs` request+response record
    * pairs for URI `http://h<i%5>.example.com/p<i>` with declared
    * content lengths `20 + 3·i` (request) and `baseLen + 9·i`
    * (response). Spec-shaped CRLF framing; payloads are filler. */
  def syntheticWarc(nPairs: Int, baseLen: Int,
      withInfo: Boolean): Array[Byte] = {
    require(nPairs >= 0 && baseLen >= 0, "syntheticWarc salt")
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      sb.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    def record(wtype: String, uri: String, clen: Int, salt: Int): Unit = {
      w("WARC/1.0\r\n")
      w(s"WARC-Type: $wtype\r\n")
      w(s"WARC-Date: 2026-01-01T00:00:00Z\r\n")
      if (uri != null) w(s"WARC-Target-URI: $uri\r\n")
      w(s"Content-Length: $clen\r\n")
      w("\r\n")
      var j = 0
      while (j < clen) { sb.write((j * 7 + salt) & 0xff); j += 1 }
      w("\r\n\r\n")
    }
    if (withInfo) record("warcinfo", null, 40, 1)
    var i = 0
    while (i < nPairs) {
      val uri = s"http://h${i % 5}.example.com/p$i"
      record("request", uri, 20 + 3 * i, 2 + i)
      record("response", uri, baseLen + 9 * i, 3 + i)
      i += 1
    }
    sb.toByteArray
  }

  /** `syntheticWarc` as a column function. */
  val syntheticWarcUdf = udf((n: Int, base: Int, info: Boolean) =>
    syntheticWarc(n, base, info))

  // ---- ICO / CUR favicons (decode-free) -----------------------------------

  /** Parsed ICO/CUR metadata: kind, image-entry census (dimensions
    * with the 0 → 256 encoding resolved, bit depth, declared byte
    * volume), and how many entries carry embedded PNG payloads (the
    * modern favicon layout) — sniffed by magic at each declared
    * offset, payloads never decoded. */
  case class IcoMeta(kind: String, n_images: Int, max_width: Int,
    max_height: Int, max_bpp: Int, n_png_entries: Int,
    total_image_bytes: Long, truncated: Boolean)

  /** DECODE-FREE ICO/CUR walker (the favicon format every crawl
    * collects): ICONDIR (reserved 0, type 1=icon / 2=cursor, count),
    * then 16-byte ICONDIRENTRY records — width/height bytes (0 means
    * 256), bit depth, declared payload size and offset. An entry whose
    * declared offset+8 lies inside the buffer is sniffed for the PNG
    * magic (embedded-PNG favicons); entries pointing outside flag
    * `truncated` but the census of in-bounds entries survives.
    * Returns null when the 6-byte header is not ICO/CUR. */
  def icoMeta(bytes: Array[Byte]): IcoMeta = {
    if (bytes == null || bytes.length < 6) return null
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
    if (u16(0) != 0) return null
    val tpe = u16(2)
    if (tpe != 1 && tpe != 2) return null
    val n = u16(4)
    var truncated = false
    var maxW = 0; var maxH = 0; var maxBpp = 0
    var nPng = 0; var total = 0L; var seen = 0
    var i = 0
    while (i < n) {
      val e = 6 + 16 * i
      if (16 > bytes.length - e) { truncated = true; i = n }
      else {
        val w = { val b = bytes(e) & 0xff; if (b == 0) 256 else b }
        val h = { val b = bytes(e + 1) & 0xff; if (b == 0) 256 else b }
        val bpp = u16(e + 6)
        val sz = u32(e + 8)
        val off = u32(e + 12)
        seen += 1
        if (w > maxW) maxW = w
        if (h > maxH) maxH = h
        if (bpp > maxBpp) maxBpp = bpp
        total += sz
        if (off >= 0 && off <= bytes.length - 8 && sz >= 8) {
          val o = off.toInt
          if ((bytes(o) & 0xff) == 0x89 && bytes(o + 1) == 'P' &&
            bytes(o + 2) == 'N' && bytes(o + 3) == 'G') nPng += 1
        } else if (off > bytes.length - 8 || sz > bytes.length - off)
          truncated = true
        i += 1
      }
    }
    IcoMeta(if (tpe == 1) "icon" else "cursor", seen, maxW, maxH,
      maxBpp, nPng, total, truncated)
  }

  private val icoSchema = org.apache.spark.sql.catalyst.ScalaReflection
    .schemaFor[IcoMeta].dataType.asInstanceOf[StructType]

  /** [[icoMeta]] over a blob column — appends a nullable `ico`
    * struct. */
  def decodeIcoHeaders(df: DataFrame, blobCol: String): DataFrame =
    appendMapped(df, blobCol,
      StructField("ico", icoSchema, nullable = true)) { bytes =>
      icoMeta(bytes) match {
        case null => null
        case m => Row(m.kind, m.n_images, m.max_width, m.max_height,
          m.max_bpp, m.n_png_entries, m.total_image_bytes, m.truncated)
      }
    }

  /** Deterministic synthetic ICO: `nImages` entries — entry 0 is
    * 256×256 (the 0-byte encoding), entry i is (16+8i)×(16+8i);
    * 32 bpp; payload i declares `base + 40·i` bytes, even entries
    * carry a real PNG magic (the embedded-PNG favicon layout), odd
    * entries opaque filler. */
  def syntheticIco(nImages: Int, base: Int): Array[Byte] = {
    require(nImages >= 1 && base >= 8, "syntheticIco salt")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { var i = 0
      while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    le16(0); le16(1); le16(nImages)
    var off = 6L + 16L * nImages
    var i = 0
    while (i < nImages) {
      val wh = if (i == 0) 0 else (16 + 8 * i) & 0xff
      bos.write(wh); bos.write(wh); bos.write(0); bos.write(0)
      le16(1); le16(32)
      val sz = base + 40 * i
      le32(sz.toLong); le32(off)
      off += sz
      i += 1
    }
    i = 0
    while (i < nImages) {
      val sz = base + 40 * i
      if (i % 2 == 0) {
        bos.write(0x89); bos.write('P'); bos.write('N'); bos.write('G')
        bos.write(0x0d); bos.write(0x0a); bos.write(0x1a); bos.write(0x0a)
        var j = 8
        while (j < sz) { bos.write((j * 3 + i) & 0xff); j += 1 }
      } else {
        var j = 0
        while (j < sz) { bos.write((j * 5 + i) & 0xff); j += 1 }
      }
      i += 1
    }
    bos.toByteArray
  }

  /** `syntheticIco` as a column function. */
  val syntheticIcoUdf = udf((n: Int, base: Int) => syntheticIco(n, base))
}
