package graft.sql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater}

import javax.imageio.ImageIO
import javax.imageio.ImageReader
import java.awt.image.BufferedImage

/** Real multimodal image kernels (replaces the round-≤7 FakeCodec stub).
  *
  * Synthesis: the testdata has no image files, so image payloads are
  * deterministic PNGs synthesized from a source byte-length `len` — a real
  * PNG bitstream (IHDR/IDAT/IEND, zlib-deflated scanlines, CRC32 chunk
  * checksums) written by [[encodePng]]. Dimensions, channel count, and every
  * pixel sample are closed-form functions of `len`, so the DuckDB oracle can
  * recompute the *decoded* values independently without ever seeing the
  * bytes.
  *
  * Decode: genuine `javax.imageio` PNG decoding (the JDK's ImageIO works
  * headless in this build). The kernels read the decoded
  * [[java.awt.image.BufferedImage]] raster — width/height/band-count and
  * pixel sums come from real decoded samples, not from the payload length.
  *
  * Reference analog: dask-geopandas' map_partitions batch-UDF surface
  * (SURVEY §2.10/§2.11); the mapInPandas-style batched path lives in
  * [[graft.ops.Multimodal.extractImageMetaBatched]].
  */
object ImageCodec {

  // In-memory payloads never benefit from ImageIO's default DISK-backed
  // stream cache — with useCache=true every decode writes a temp file
  // (r10 profile: 1.50 s vs 0.37 s warm for 20k small PNGs single-thread).
  // Library-global and safe: this engine only ever decodes byte arrays.
  javax.imageio.ImageIO.setUseCache(false)

  /** Synthesis formulas — single source of truth mirrored by the DuckDB
    * oracle (m01/m02/m03): width 4..32, height 4..28, channels in {1,3,4}.
    */
  def synthDims(len: Int): (Int, Int, Int) = {
    val w = 4 + len % 29
    val h = 4 + (len * 31) % 25
    val c = (len % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
    (w, h, c)
  }

  /** Sample value of band `b` at (x, y) for source length `len`. */
  def sample(x: Int, y: Int, b: Int, len: Int): Int = (x * 31 + y * 17 + b * 7 + len) % 256

  /** Deterministic PNG payload for a source byte-length. */
  def synthPng(len: Int): Array[Byte] = {
    val (w, h, c) = synthDims(len)
    encodePng(w, h, c, (x, y, b) => sample(x, y, b, len))
  }

  /** Minimal PNG encoder: 8-bit samples, color type 0 (gray) / 2 (RGB) /
    * 6 (RGBA), filter 0 scanlines, one zlib IDAT. Public format per the PNG
    * spec (RFC 2083); ~60 lines so no codec dependency is needed to write.
    */
  def encodePng(w: Int, h: Int, channels: Int, px: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val colorType = channels match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case n => throw new IllegalArgumentException(s"unsupported channel count $n")
    }
    // raw scanlines, each prefixed with filter byte 0 (None)
    val raw = new Array[Byte](h * (1 + w * channels))
    var p = 0
    var y = 0
    while (y < h) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < w) {
        var b = 0
        while (b < channels) { raw(p) = px(x, y, b).toByte; p += 1; b += 1 }
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      val len = ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len, 0, 4)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(tb)
      crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    chunk("IHDR", ihdr)
    // zlib stream (zlib wrapper); BEST_SPEED — the payload only needs to
    // be a valid PNG. The Deflater and its scratch output buffer are
    // per-thread reused (reset(), not re-created): allocating a native
    // zlib context per row showed up in the r10 m03 encode profile
    val defl = tlDeflater.get()
    defl.reset()
    defl.setInput(raw)
    defl.finish()
    val zbuf = new ByteArrayOutputStream(raw.length / 2 + 32)
    val tmp = tlDeflateBuf.get()
    while (!defl.finished()) {
      val n = defl.deflate(tmp)
      zbuf.write(tmp, 0, n)
    }
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // per-thread native zlib context + scratch buffer for encodePng — Spark
  // runs one task per thread, so ThreadLocal reuse amortizes across a
  // partition's rows (never call end(): reset() returns it to fresh state)
  private val tlDeflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Deflater.BEST_SPEED)
  }
  private val tlDeflateBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Real ImageIO decode (one-shot; the batched path reuses a reader). */
  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException(
      s"undecodable image payload (${bytes.length} bytes)")
    img
  }

  /** A PNG reader for per-partition reuse — creating the reader once and
    * re-pointing its input amortizes plugin lookup + reader construction
    * across a partition's rows (the batched-decode analog of reusing a
    * codec context).
    */
  def newPngReader(): ImageReader = {
    val it = ImageIO.getImageReadersByFormatName("png")
    if (!it.hasNext) throw new IllegalStateException("no PNG ImageReader in this JVM")
    it.next()
  }

  /** Decode with a reused reader (setInput resets per-image state). The
    * stream is constructed directly as a [[MemoryCacheImageInputStream]] —
    * `ImageIO.createImageInputStream` consults the service registry per
    * call and (with the default useCache) backs the stream with a TEMP
    * FILE, which dominated the m03 decode profile (r10: 4x on warm runs).
    */
  def decodeWith(reader: ImageReader, bytes: Array[Byte]): BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally iis.close()
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

  // per-thread cached PNG reader for the EXPRESSION decode path: Spark
  // evaluates a codegen'd expression on one task thread at a time, so a
  // ThreadLocal amortizes plugin lookup + reader construction across a
  // partition's rows exactly like the batched decodeWith path does
  private val tlPngReader = new ThreadLocal[ImageReader] {
    override def initialValue(): ImageReader = newPngReader()
  }

  /** Decode with the per-thread cached reader when the payload is PNG
    * (the only format this engine synthesizes); any other format falls
    * back to one-shot ImageIO dispatch so the contract stays general.
    */
  def decodeCached(bytes: Array[Byte]): BufferedImage = {
    val isPng = bytes.length >= 4 &&
      bytes(0) == PngMagic(0) && bytes(1) == PngMagic(1) &&
      bytes(2) == PngMagic(2) && bytes(3) == PngMagic(3)
    if (isPng) decodeWith(tlPngReader.get(), bytes) else decode(bytes)
  }

  /** 64-bit average hash (aHash) over the DECODED raster — the standard
    * perceptual image-dedup fingerprint: nearest-neighbor downsample the
    * channel-sum gray image to 8x8 (source index `x*w/8, y*h/8`, the
    * same integer map `resizeNN` and the oracle use), then set bit
    * `y*8+x` when `cell*64 > total` (strictly above the mean, expressed
    * without division so every engine computes the identical bit).
    */
  def aHash(img: BufferedImage): Long = {
    val r = img.getRaster
    val w = img.getWidth; val h = img.getHeight; val bands = r.getNumBands
    val cells = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 8) {
        val sx = x * w / 8
        var g = 0L
        var b = 0
        while (b < bands) { g += r.getSample(sx, sy, b); b += 1 }
        cells(y * 8 + x) = g; total += g
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) { if (cells(i) * 64 > total) hash |= (1L << i); i += 1 }
    hash
  }

  /** 64-bit difference hash (dHash) over the DECODED raster — the
    * gradient-based perceptual fingerprint (more robust than aHash to
    * global brightness shifts, the standard second opinion in an image
    * dedup pipeline): nearest-neighbor downsample the channel-sum gray
    * image to 9×8 (source index `x*w/9, y*h/8` — same integer map as
    * [[aHash]]/resizeNN) and set bit `y*8+x` when the right neighbor is
    * strictly brighter. Integer comparisons only, so external engines
    * recompute the identical bits.
    */
  def dHash(img: BufferedImage): Long = {
    val r = img.getRaster
    val w = img.getWidth; val h = img.getHeight; val bands = r.getNumBands
    val cells = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 9) {
        val sx = x * w / 9
        var g = 0L
        var b = 0
        while (b < bands) { g += r.getSample(sx, sy, b); b += 1 }
        cells(y)(x) = g
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      val yy = i / 8; val xx = i % 8
      if (cells(yy)(xx + 1) > cells(yy)(xx)) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** (width, height, bands, pixelSum) from the DECODED raster — every value
    * read back from real ImageIO output.
    */
  def metaOf(img: BufferedImage): (Int, Int, Int, Long) = {
    val r = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    val bands = r.getNumBands
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { sum += r.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    (w, h, bands, sum)
  }

  /** Nearest-neighbor fit-into-target resize over the decoded raster:
    * out dims = (w,h) * target / max(w,h); source pixel of out (i,j) is
    * (i*w/ow, j*h/oh) (floor). Returns (out_w, out_h, out_bytes, out_sum)
    * where out_bytes = ow*oh*bands and out_sum sums every resized sample —
    * integer math only, so the oracle mirrors it exactly.
    */
  def resizeNN(img: BufferedImage, target: Int): (Int, Int, Long, Long) = {
    val r = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    val bands = r.getNumBands
    val m = math.max(w, h)
    val ow = w * target / m
    val oh = h * target / m
    require(ow > 0 && oh > 0, s"resize target $target collapses ${w}x$h to ${ow}x$oh")
    var sum = 0L
    var j = 0
    while (j < oh) {
      val sy = j * h / oh
      var i = 0
      while (i < ow) {
        val sx = i * w / ow
        var b = 0
        while (b < bands) { sum += r.getSample(sx, sy, b); b += 1 }
        i += 1
      }
      j += 1
    }
    (ow, oh, ow.toLong * oh * bands, sum)
  }
}

/** Real audio kernels: synthesize a genuine RIFF/WAVE PCM bitstream from a
  * source byte-length (sample rate, length, and every 16-bit sample are
  * closed-form in `len`, so the DuckDB oracle recomputes the decoded
  * values), then decode it with `javax.sound.sampled.AudioSystem` — the
  * JDK's real WAV decoder. Sample-rate/channel/sample values all come from
  * the decoded AudioInputStream, not from the payload length.
  */
object AudioCodec {
  private val Rates = Array(8000, 16000, 22050, 44100)

  /** (sampleRate, nSamples) for a source length. */
  def synthParams(len: Int): (Int, Int) = (Rates(len % 4), 500 + (len * 13) % 2000)

  /** 16-bit sample i for source length `len` (mono PCM). */
  def sample(i: Int, len: Int): Int = (((i.toLong * 2654435761L + len) % 65536L) - 32768L).toInt

  /** Deterministic mono 16-bit PCM WAV payload. */
  def synthWav(len: Int): Array[Byte] = {
    val (rate, n) = synthParams(len)
    val dataBytes = n * 2
    val bb = ByteBuffer.allocate(44 + dataBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) { bb.putShort(sample(i, len).toShort); i += 1 }
    bb.array()
  }

  /** REAL javax.sound decode: (sampleRate, channels, nSamples, sampleSum)
    * all read from the decoded AudioInputStream.
    */
  def decodeMeta(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got $fmt")
      val channels = fmt.getChannels
      val frames = in.getFrameLength.toInt
      val data = in.readAllBytes()
      val bb = ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var sum = 0L
      var i = 0
      val n = frames * channels
      while (i < n) { sum += bb.getShort(i * 2); i += 1 }
      (fmt.getSampleRate.toInt, channels, frames, sum)
    } finally in.close()
  }

  /** Per-window energy profile from a REAL javax.sound decode: window `w`
    * of `nWindows` covers frames `[w*n/W, (w+1)*n/W)` (frame w of sample
    * i is `i*W/n` — the same integer map the oracle uses) and its energy
    * is the sum of |sample| over all channels — integer-exact, so the
    * DuckDB oracle recomputes it closed-form from the synth formula.
    */
  def energyWindows(bytes: Array[Byte], nWindows: Int): Array[Long] = {
    require(nWindows > 0, "energyWindows: nWindows must be positive")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got $fmt")
      val channels = fmt.getChannels
      val frames = in.getFrameLength.toInt
      val data = in.readAllBytes()
      val bb = ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Long](nWindows)
      var i = 0
      while (i < frames) {
        val w = ((i.toLong * nWindows) / math.max(frames, 1)).toInt
        var c = 0
        while (c < channels) {
          out(w) += math.abs(bb.getShort((i * channels + c) * 2).toLong)
          c += 1
        }
        i += 1
      }
      out
    } finally in.close()
  }
}

/** A tiny real binary video-container format ("GRV0"): big-endian magic +
  * i32 frame count + i16 fps. The frame-sample kernel PARSES these bytes
  * (magic check + header reads) rather than recomputing from the payload
  * length — the synthesis formulas (mirrored by the m04 oracle) are:
  * durMs = 1000 + 7*len mod 59000, fps = 12 + len mod 19,
  * frames = durMs*fps/1000.
  */
object VideoContainer {
  private val Magic = Array[Byte]('G', 'R', 'V', '0')

  def synthParams(len: Int): (Int, Int) = {
    val durMs = 1000 + (len * 7) % 59000
    val fps = 12 + len % 19
    (durMs * fps / 1000, fps)
  }

  def synth(len: Int): Array[Byte] = {
    val (frames, fps) = synthParams(len)
    ByteBuffer.allocate(10)
      .put(Magic)
      .putInt(frames)
      .putShort(fps.toShort)
      .array()
  }

  /** Parse (frames, fps) from container bytes; fails loud on bad magic. */
  def parse(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length >= 10 &&
      bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3),
      "not a GRV0 container")
    val bb = ByteBuffer.wrap(bytes, 4, 6)
    val frames = bb.getInt
    val fps = bb.getShort.toInt
    (frames, fps)
  }

  /** Uniform-stride sample toward targetFrames: indices 0, step, 2*step, …
    * with step = max(1, frames/target).
    */
  def sampleIndices(frames: Int, target: Int): Array[Int] = {
    val step = math.max(1, frames / math.max(1, target))
    (0 until frames by step).toArray
  }
}
