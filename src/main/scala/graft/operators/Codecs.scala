package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal decode plug-point
  * ([[Multimodal.decodeFrames]]).
  *
  * The container ships no native image/audio libraries, but two
  * container formats need none: RIFF/WAVE PCM and uncompressed 24-bit
  * BMP are plain headers over raw samples/pixels, decodable with a
  * `ByteBuffer`. These give the `decodeFrames` contract a REAL exercised
  * decoder (not just the md5 fake): bytes in, `Array[Float]` features
  * out, running inside the scan partition. A production codec (JPEG,
  * FLAC, video via JNI/`mapInPandas`) replaces the function, not the
  * plan.
  *
  * Decoders throw `IllegalArgumentException` on malformed payloads —
  * at 100 TB a corrupt blob must fail the row loudly (or be caught by
  * the caller into a quarantine column), never silently skew features.
  */
object Codecs {

  // ---------------------------------------------------------------
  // WAV (RIFF) — PCM 16-bit little-endian
  // ---------------------------------------------------------------

  /** Decode a complete RIFF/WAVE payload with PCM 16-bit samples to
    * floats normalized to [-1, 1). Channels come back interleaved,
    * exactly as stored — channel split is a feature-side concern.
    */
  def wavPcm16(bytes: Array[Byte]): Array[Float] = {
    require(bytes.length >= 12, s"WAV too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(tag(buf, 0) == "RIFF" && tag(buf, 8) == "WAVE",
      "not a RIFF/WAVE payload")
    var pos = 12
    var fmtOk = false
    var data: Array[Float] = null
    // chunk walk: id(4) size(4le) body(size, padded to even)
    while (pos + 8 <= bytes.length && data == null) {
      val id = tag(buf, pos)
      val size = buf.getInt(pos + 4)
      // bounds math in Long: a corrupt size near Int.MaxValue must hit
      // this require, not wrap negative and escape into an IOOBE/OOM
      require(size >= 0 && pos.toLong + 8L + size <= bytes.length,
        s"chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val audioFormat = buf.getShort(pos + 8) & 0xffff
          val bits = buf.getShort(pos + 22) & 0xffff
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          require(bits == 16, s"not 16-bit ($bits)")
          fmtOk = true
        case "data" =>
          require(fmtOk, "data chunk before fmt chunk")
          // odd size is malformed 16-bit PCM — fail loudly, never
          // silently drop the trailing byte into skewed features
          require((size & 1) == 0, s"odd data chunk size $size")
          val n = size / 2
          val out = new Array[Float](n)
          var i = 0
          while (i < n) {
            out(i) = buf.getShort(pos + 8 + i * 2) / 32768.0f
            i += 1
          }
          data = out
        case _ => // LIST/INFO/etc — skip
      }
      pos += 8 + size + (size & 1)
    }
    require(data != null, "no data chunk")
    data
  }

  /** Minimal PCM16 mono-or-interleaved WAV writer — the fixture and
    * payload-synthesis side of [[wavPcm16]].
    */
  def wavPcm16Encode(
      samples: Array[Short],
      sampleRate: Int = 16000,
      channels: Int = 1): Array[Byte] = {
    require(channels > 0, "channels must be positive")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                      // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)        // byte rate
      .putShort((channels * 2).toShort)         // block align
      .putShort(16.toShort)                     // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  // ---------------------------------------------------------------
  // BMP — uncompressed 24-bit
  // ---------------------------------------------------------------

  /** Decode a complete uncompressed 24-bit BMP to per-pixel grayscale
    * luminance in [0, 1], row-major TOP-DOWN regardless of the file's
    * stored row order (BMPs are bottom-up when height > 0).
    */
  def bmpGray(bytes: Array[Byte]): Array[Float] = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP payload")
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val heightRaw = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    require(width > 0 && heightRaw != 0, s"bad dimensions ${width}x$heightRaw")
    require(bpp == 24, s"not 24-bit ($bpp)")
    require(compression == 0, s"compressed BMP unsupported ($compression)")
    val height = math.abs(heightRaw)
    // Int.MinValue survives math.abs negative and would slip every
    // Long-side bound below into a NegativeArraySizeException
    require(height > 0, s"bad height $heightRaw")
    val bottomUp = heightRaw > 0
    // geometry in Long: a corrupt width near Int.MaxValue must fail
    // these requires, not wrap negative and escape the bounds check
    val rowSize = ((width.toLong * 3 + 3) / 4) * 4 // rows pad to 4 bytes
    require(dataOffset >= 54 &&
      dataOffset.toLong + rowSize * height <= bytes.length,
      "pixel data overruns payload")
    require(width.toLong * height <= Int.MaxValue, "pixel count overflows")
    val out = new Array[Float](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val base = (dataOffset + srcRow * rowSize).toInt // bounds-checked above
      var x = 0
      while (x < width) {
        val b = bytes(base + x * 3) & 0xff      // stored order is BGR
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        out(y * width + x) =
          ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a complete uncompressed 24-bit BMP to raw channel values —
    * `[r, g, b, r, g, b, ...]` per pixel, row-major TOP-DOWN, each
    * channel an exact integer 0..255 (as Float, per the decoder
    * contract). The lossless face of [[bmpGray]]: features derived
    * from these are integer-exact, so a cross-engine oracle can
    * recompute them bit-for-bit (m3).
    */
  def bmpChannels(bytes: Array[Byte]): Array[Float] = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP payload")
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val heightRaw = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    require(width > 0 && heightRaw != 0, s"bad dimensions ${width}x$heightRaw")
    require(bpp == 24, s"not 24-bit ($bpp)")
    require(compression == 0, s"compressed BMP unsupported ($compression)")
    val height = math.abs(heightRaw)
    // Int.MinValue survives math.abs negative and would slip every
    // Long-side bound below into a NegativeArraySizeException
    require(height > 0, s"bad height $heightRaw")
    val bottomUp = heightRaw > 0
    val rowSize = ((width.toLong * 3 + 3) / 4) * 4
    require(dataOffset >= 54 &&
      dataOffset.toLong + rowSize * height <= bytes.length,
      "pixel data overruns payload")
    require(width.toLong * height * 3 <= Int.MaxValue, "pixel count overflows")
    val out = new Array[Float](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val base = (dataOffset + srcRow * rowSize).toInt
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        out(o) = (bytes(base + x * 3 + 2) & 0xff).toFloat     // R (stored BGR)
        out(o + 1) = (bytes(base + x * 3 + 1) & 0xff).toFloat // G
        out(o + 2) = (bytes(base + x * 3) & 0xff).toFloat     // B
        x += 1
      }
      y += 1
    }
    out
  }

  /** Minimal 24-bit BMP writer (bottom-up, padded rows) — the fixture
    * side of [[bmpGray]]. `rgbTopDown` is packed 0xRRGGBB, row-major
    * top-down.
    */
  def bmp24Encode(width: Int, height: Int, rgbTopDown: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && rgbTopDown.length == width * height,
      "pixel array must be width*height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)                     // reserved, data offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, bottom-up
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(dataSize)               // BI_RGB, image size
      .putInt(2835).putInt(2835)                // 72 DPI
      .putInt(0).putInt(0)                      // palette
    var y = height - 1                          // write bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = rgbTopDown(y * width + x)
        buf.put((p & 0xff).toByte)              // B
          .put(((p >> 8) & 0xff).toByte)        // G
          .put(((p >> 16) & 0xff).toByte)       // R
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  private def tag(buf: ByteBuffer, pos: Int): String =
    new String(Array(buf.get(pos), buf.get(pos + 1),
      buf.get(pos + 2), buf.get(pos + 3)), "US-ASCII")

  // ---------------------------------------------------------------
  // JPEG (grayscale) via javax.imageio — the first LOSSY codec at
  // the plug-point (r11)
  // ---------------------------------------------------------------

  /** Encode grayscale pixels (row-major, values 0–255) as a JPEG via
    * the pure-JDK `javax.imageio` writer at an explicit quality.
    * Deterministic for a given JDK: the same pixels encode to the same
    * bytes (CodecsSpec pins it) — but unlike the WAV/BMP round-trips
    * the DECODED pixels are only close to the originals, not equal;
    * oracle-gated queries over JPEG therefore gate on decode-path
    * INVARIANTS (dimensions, pixel counts) and the fidelity bound
    * lives in the spec.
    */
  def jpegGrayEncode(
      width: Int, height: Int, gray: Array[Int],
      quality: Float = 0.95f): Array[Byte] = {
    require(gray.length == width * height,
      s"jpegGrayEncode: ${gray.length} pixels for ${width}x$height")
    require(width <= 65535 && height <= 65535,
      s"jpegGrayEncode: ${width}x$height exceeds JPEG's 65535 dimension cap")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < gray.length) {
      raster.setSample(i % width, i / width, 0, gray(i))
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    // ImageWriter is not thread-safe but IS reusable: one per thread,
    // reset between images — the ImageIO registry scan and writer
    // construction otherwise dominate per-doc encode cost in a
    // mapPartitions loop
    val writer = jpegWriter.get()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.reset(); ios.close() }
    out.toByteArray
  }

  private val jpegWriter =
    new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    }

  private val jpegReader =
    new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("jpg").next()
    }

  /** Decode a grayscale JPEG to `[width, height, px...]` — dimensions
    * lead the feature array so a `decodeFrames` consumer can gate on
    * the decoder-REPORTED geometry (the lossy-codec oracle surface;
    * m5 does). Pixels are the decoded 0–255 samples in row-major
    * order. Throws on undecodable payloads and on non-grayscale
    * images (this decoder's contract is the gray channel; RGB JPEGs
    * belong to a channel-stats sibling).
    */
  def jpegGrayWithDims(bytes: Array[Byte]): Array[Float] = {
    // same per-thread reuse as the encode side: ImageIO.read's
    // per-call reader lookup dominates small-image decode cost
    val reader = jpegReader.get()
    val img =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis, true, true)
          reader.read(0)
        } finally { reader.reset(); iis.close() }
      } catch {
        // ImageIO JPEG readers throw RuntimeExceptions too on corrupt
        // markers (IllegalArgumentException, index errors) — everything
        // non-fatal is the same "not a decodable image" contract
        case scala.util.control.NonFatal(_) => null
      }
    require(img != null, "jpegGrayWithDims: payload is not a decodable image")
    val raster = img.getRaster
    require(raster.getNumBands == 1,
      s"jpegGrayWithDims: expected 1 gray band, got ${raster.getNumBands}")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](2 + w * h)
    out(0) = w.toFloat
    out(1) = h.toFloat
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(2 + y * w + x) = raster.getSample(x, y, 0).toFloat
        x += 1
      }
      y += 1
    }
    out
  }
}
