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
    // MemoryCache explicitly: ImageIO.createImageOutputStream honors
    // ImageIO.getUseCache (default TRUE) and returns a
    // FileCacheImageOutputStream — a temp file created, written and
    // deleted per encoded image. At one frame per document that is a
    // disk round-trip per row on the hot decode path; the memory-cached
    // stream is pure heap and byte-identical output.
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
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
        // MemoryCache explicitly (the encode-side rationale): the
        // ImageIO factory's default is a FileCache stream — one temp
        // file per decoded image.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
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

  // ---------------------------------------------------------------
  // PNG (grayscale 8-bit, non-interlaced) — hand-rolled: the first
  // COMPRESSED LOSSLESS codec at the plug-point (r12). WAV/BMP are
  // raw samples behind a header; JPEG is lossy via the platform
  // codec; PNG closes the remaining class — a real compression
  // layer (zlib, `java.util.zip` — standard JVM, no new deps) plus
  // per-row predictive filters, decoded by hand so the whole
  // inflate → unfilter path is ours and LOSSLESS: an oracle can gate
  // the decoded pixel VALUES byte-exactly, not just the geometry.
  // Citation: PNG spec (RFC 2083 / W3C PNG) §4 chunk layout, §6
  // filter types.
  // ---------------------------------------------------------------

  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(p => c.update(p, 0, p.length))
    c.getValue.toInt
  }

  private def chunk(
      out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    val t = typ.getBytes("US-ASCII")
    out.write(len); out.write(t); out.write(data)
    out.write(ByteBuffer.allocate(4).putInt(crc32(t, data)).array())
  }

  /** a + b + c Paeth predictor (PNG filter 4) — shared by the encode
    * and decode sides so they can never disagree on the prediction.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode grayscale pixels (row-major, values 0–255) as an 8-bit
    * non-interlaced grayscale PNG. `filterType` 0–4 applies that PNG
    * row filter to EVERY row before deflate — the fixture knob that
    * lets specs (and the oracle-gated m6) drive each of the five
    * unfilter paths through a real encode; production encoders pick
    * per-row, which the decoder handles regardless (the filter byte
    * is per-row in the format).
    */
  def pngGrayEncode(
      width: Int, height: Int, gray: Array[Int],
      filterType: Int = 0): Array[Byte] = {
    require(gray.length == width * height,
      s"pngGrayEncode: ${gray.length} pixels for ${width}x$height")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(filterType >= 0 && filterType <= 4,
      s"pngGrayEncode: unknown filter type $filterType")
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array()
    // scanlines: per-row filter byte + filtered bytes (bpp = 1)
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = filterType.toByte
      var x = 0
      while (x < width) {
        val cur = gray(y * width + x) & 0xff
        val left = if (x > 0) gray(y * width + x - 1) & 0xff else 0
        val up = if (y > 0) gray((y - 1) * width + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) gray((y - 1) * width + x - 1) & 0xff
          else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (width + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater() // zlib-wrapped, per spec
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished())
      zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSig)
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zbuf.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit non-interlaced grayscale PNG by hand — chunk
    * walk with CRC verification, all IDAT chunks concatenated into
    * one zlib stream (the format allows any split), inflate, then the
    * five per-row unfilters. Returns `[width, height, px...]`, pixels
    * exact integers 0–255 as Floats (the [[bmpChannels]] lossless
    * contract: cross-engine oracles recompute features bit-for-bit).
    * Throws `IllegalArgumentException` on anything undecodable —
    * wrong signature, CRC mismatch, truncated/overlong pixel data,
    * unsupported color type/bit depth/interlace — per the Codecs
    * loud-failure contract.
    */
  def pngGrayWithDims(bytes: Array[Byte]): Array[Float] = {
    require(bytes.length >= pngSig.length + 12, "PNG too short")
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), pngSig), "not a PNG payload")
    val buf = ByteBuffer.wrap(bytes) // PNG ints are big-endian
    var pos = 8
    var width = -1; var height = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= bytes.length && !seenIend) {
      val len = buf.getInt(pos)
      require(len >= 0 && pos.toLong + 12L + len <= bytes.length,
        s"chunk at $pos overruns payload")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val c = new java.util.zip.CRC32
      c.update(bytes, pos + 4, 4 + len)
      require(c.getValue.toInt == buf.getInt(pos + 8 + len),
        s"CRC mismatch on $typ chunk")
      typ match {
        case "IHDR" =>
          require(!seenIhdr && len == 13, "bad IHDR")
          width = buf.getInt(pos + 8)
          height = buf.getInt(pos + 12)
          require(width > 0 && height > 0,
            s"bad dimensions ${width}x$height")
          require(width.toLong * height <= Int.MaxValue,
            "pixel count overflows")
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          require(colorType == 0, s"not grayscale (color type $colorType)")
          require(interlace == 0, "interlaced PNG unsupported")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skip (CRC already verified)
      }
      pos += 12 + len
    }
    require(seenIhdr && seenIend, "missing IHDR/IEND")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte]((width + 1) * height)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        require(n > 0 || inflater.finished(),
          "truncated or corrupt IDAT stream")
        got += n
      }
      require(got == raw.length, s"pixel data short: $got of ${raw.length}")
      // a stream with MORE scanlines than IHDR declares is malformed
      require(inflater.inflate(new Array[Byte](1)) == 0 &&
        inflater.finished(), "IDAT stream longer than the declared image")
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"corrupt zlib stream: ${e.getMessage}")
    } finally inflater.end()
    val out = new Array[Float](2 + width * height)
    out(0) = width.toFloat
    out(1) = height.toFloat
    // unfilter in place over a previous-row byte view
    val cur = new Array[Int](width)
    val prev = new Array[Int](width)
    var y = 0
    while (y < height) {
      val ft = raw(y * (width + 1)) & 0xff
      require(ft <= 4, s"unknown filter type $ft on row $y")
      var x = 0
      while (x < width) {
        val v = raw(y * (width + 1) + 1 + x) & 0xff
        val left = if (x > 0) cur(x - 1) else 0
        val up = if (y > 0) prev(x) else 0
        val ul = if (x > 0 && y > 0) prev(x - 1) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        cur(x) = (v + pred) & 0xff
        out(2 + y * width + x) = cur(x).toFloat
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, width)
      y += 1
    }
    out
  }

  // ===========================================================
  // GIF87a (LZW) — the DICTIONARY-codec class (PNG covered the
  // predictive-filter + deflate class, JPEG the lossy-transform
  // class). Grayscale via a 256-entry gray global color table;
  // pixel index = gray value, so the codec is LOSSLESS and
  // cross-engine oracles recompute features from the synthesis
  // rule bit-for-bit (the bmp/png contract). Both sides are
  // hand-rolled and the SPEC cross-validates each against the
  // JDK's independent GIF implementation (javax.imageio ships a
  // reader AND writer): myDecode∘myEncode, imageioDecode∘myEncode,
  // and myDecode∘imageioEncode must all be identity — any LZW
  // bit-width off-by-one desyncs one of the three.
  // ===========================================================

  private val gifHeader = "GIF87a".getBytes("US-ASCII")

  /** Encode grayscale pixels (row-major, 0–255) as a single-image
    * non-interlaced GIF87a with a 256-gray global color table and
    * REAL LZW compression (variable code width 9→12, dictionary
    * reset via CLEAR when the 12-bit space fills — the uncompressed-
    * GIF trick is not used, so decoders exercise real dict growth).
    */
  def gifGrayEncode(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == width * height,
      s"gifGrayEncode: ${gray.length} pixels for ${width}x$height")
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad dimensions ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    out.write(gifHeader)
    // logical screen descriptor: GCT present, 8 bits, 256 entries
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0xf7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // image descriptor at (0,0), no local table, not interlaced
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0)
    out.write(8) // LZW minimum code size
    // LZW: clear=256, eoi=257; bit-packed LSB-first into 255-byte
    // sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    def flushByte(): Unit =
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    var codeSize = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize; flushByte()
    }
    val Clear = 256; val Eoi = 257
    var dict = new java.util.HashMap[Long, Integer]()
    var nextFree = 258
    emit(Clear)
    var prefix = gray(0) & 0xff
    i = 1
    while (i < gray.length) {
      val b = gray(i) & 0xff
      val key = (prefix.toLong << 8) | b
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        emit(prefix)
        dict.put(key, Integer.valueOf(nextFree))
        nextFree += 1
        // widen AFTER the add the decoder will mirror one step later
        if (nextFree == (1 << codeSize) + 1) {
          if (codeSize < 12) codeSize += 1
          else { emit(Clear); dict = new java.util.HashMap(); nextFree = 258; codeSize = 9 }
        }
        prefix = b
      }
      i += 1
    }
    emit(prefix)
    emit(Eoi)
    if (bitCnt > 0) { data.write((bitBuf & 0xff).toInt) }
    // sub-blocks
    val payload = data.toByteArray
    var off = 0
    while (off < payload.length) {
      val n = math.min(255, payload.length - off)
      out.write(n)
      out.write(payload, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode a single-image non-interlaced 8-bit GIF (87a or 89a; 89a
    * extension blocks are skipped) whose image uses the global color
    * table. Returns `[width, height, px...]` where px is the PALETTE
    * INDEX as an exact Float — for the gray fixtures index = gray, and
    * index-level decode keeps the contract engine-recomputable for
    * ANY palette. Throws `IllegalArgumentException` on anything
    * undecodable — wrong signature, missing color table, interlace,
    * truncated data, bad LZW codes — per the Codecs loud-failure
    * contract.
    */
  def gifGrayWithDims(bytes: Array[Byte]): Array[Float] = {
    require(bytes.length > 13 + 10, "GIF too short")
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    require(hdr == "GIF87a" || hdr == "GIF89a", s"not a GIF payload: $hdr")
    def u16(p: Int) = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "GIF without a global color table")
    val gctSize = 2 << (packed & 7)
    var pos = 13 + 3 * gctSize
    // skip 89a extension blocks (0x21 label, sub-blocks to 0)
    // every positional read below must be bounds-checked: the
    // loud-failure contract is IllegalArgumentException, never an
    // index error escaping from a truncated/crafted payload
    def at(p: Int): Int = {
      require(p < bytes.length, s"GIF truncated at offset $p")
      bytes(p) & 0xff
    }
    while (pos < bytes.length && at(pos) == 0x21) {
      pos += 2
      while (at(pos) != 0) pos += 1 + at(pos)
      pos += 1
    }
    require(pos + 9 < bytes.length && (bytes(pos) & 0xff) == 0x2c,
      s"expected image descriptor at $pos")
    val width = u16(pos + 5); val height = u16(pos + 7)
    val ipacked = bytes(pos + 9) & 0xff
    val interlaced = (ipacked & 0x40) != 0
    require((ipacked & 0x80) == 0, "local color table unsupported")
    pos += 10
    val minCode = at(pos)
    require(minCode >= 2 && minCode <= 8, s"bad LZW min code size $minCode")
    pos += 1
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (at(pos) != 0) {
      val n = at(pos)
      require(pos + 1 + n <= bytes.length, "sub-block overruns payload")
      data.write(bytes, pos + 1, n)
      pos += 1 + n
    }
    val lzw = data.toByteArray
    val Clear = 1 << minCode; val Eoi = Clear + 1
    val maxEntries = 4096
    val prefixOf = new Array[Int](maxEntries)
    val suffixOf = new Array[Int](maxEntries)
    val out = new Array[Float](2 + width * height)
    out(0) = width.toFloat; out(1) = height.toFloat
    var outPos = 2
    var bitPos = 0
    def read(n: Int): Int = {
      require(bitPos + n <= lzw.length * 8, "LZW stream truncated")
      var v = 0; var got = 0
      while (got < n) {
        val byte = lzw(bitPos >> 3) & 0xff
        v |= ((byte >> (bitPos & 7)) & 1) << got
        got += 1; bitPos += 1
      }
      v
    }
    def emitStr(code: Int): Int = { // writes string of `code`, returns first index
      var stack = List.empty[Int]
      var c = code
      while (c >= Clear + 2) { stack ::= suffixOf(c); c = prefixOf(c) }
      stack ::= c
      val first = stack.head
      stack.foreach { px =>
        require(outPos < out.length, "LZW decodes past the pixel count")
        require(px < gctSize, s"palette index $px outside the color table")
        out(outPos) = px.toFloat; outPos += 1
      }
      first
    }
    var codeSize = minCode + 1
    var nextFree = Clear + 2
    var prev = -1
    var done = false
    while (!done) {
      val code = read(codeSize)
      if (code == Clear) {
        codeSize = minCode + 1; nextFree = Clear + 2; prev = -1
      } else if (code == Eoi) {
        done = true
      } else if (prev == -1) {
        require(code < Clear, s"first code after clear must be a root, got $code")
        emitStr(code)
        prev = code
      } else {
        // code == nextFree is the KwKwK case and is only well-defined
        // while the dictionary can still GROW — a full-dict stream
        // sending its next-free slot is malformed, and letting it
        // through would index prefixOf(4096)
        require(code < nextFree || (code == nextFree && nextFree < maxEntries),
          s"LZW code $code beyond dictionary (nextFree=$nextFree)")
        val first =
          if (code < nextFree) emitStr(code)
          else { // KwKwK: str(prev) + first(str(prev))
            var c = prev
            while (c >= Clear + 2) c = prefixOf(c)
            emitStr(prev)
            require(outPos < out.length, "LZW decodes past the pixel count")
            out(outPos) = c.toFloat; outPos += 1
            c
          }
        if (nextFree < maxEntries) {
          prefixOf(nextFree) = prev; suffixOf(nextFree) = first
          nextFree += 1
          if (nextFree == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(outPos == out.length,
      s"decoded ${outPos - 2} pixels for ${width}x$height")
    if (!interlaced) out
    else {
      // GIF 4-pass interlace: decoded row order is 0,8,16… / 4,12… /
      // 2,6,10… / 1,3,5… — permute back to top-down
      val fixed = new Array[Float](out.length)
      fixed(0) = out(0); fixed(1) = out(1)
      var src = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var row = start
        while (row < height) {
          System.arraycopy(out, 2 + src * width, fixed, 2 + row * width, width)
          src += 1
          row += step
        }
      }
      fixed
    }
  }

  // ---------------------------------------------------------------
  // GFL1 — FLAC-style lossless audio: fixed predictors + Rice coding
  // ---------------------------------------------------------------
  // The PREDICTIVE-AUDIO + ENTROPY-CODING class, hand-rolled both
  // directions (PNG's deflate rode java.util.zip; here the entropy
  // coder itself is in-repo): FLAC's SUBFRAME_FIXED family — the five
  // fixed linear predictors of orders 0–4 (the binomial-coefficient
  // difference filters of the FLAC format spec) — with the residuals
  // Rice/Golomb-coded (zigzag → unary quotient + k low bits). The
  // encoder picks the order minimizing Σ|residual| and the Rice
  // parameter minimizing the exact bit count — both standard FLAC
  // encoder heuristics. Container (not FLAC framing): "GFL1", sample
  // count (int32 LE), order (byte), rice k (byte), `order` warmup
  // samples verbatim (int16 LE), then the MSB-first Rice bitstream.

  /** prediction coefficients: x̂[n] = Σ coef(j) · x[n−1−j] */
  private val FixedCoefs: Array[Array[Long]] = Array(
    Array.empty[Long],
    Array(1L),
    Array(2L, -1L),
    Array(3L, -3L, 1L),
    Array(4L, -6L, 4L, -1L))

  private def fixedResiduals(x: Array[Short], order: Int): Array[Long] = {
    val coefs = FixedCoefs(order)
    val out = new Array[Long](x.length - order)
    var i = order
    while (i < x.length) {
      var pred = 0L
      var j = 0
      while (j < order) { pred += coefs(j) * x(i - 1 - j); j += 1 }
      out(i - order) = x(i).toLong - pred
      i += 1
    }
    out
  }

  private def zigzag(r: Long): Long = if (r >= 0) 2 * r else -2 * r - 1
  private def unzigzag(u: Long): Long =
    if ((u & 1L) == 0L) u >>> 1 else -((u >>> 1) + 1)

  private final class BitWriter {
    private val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0
    private var nBits = 0
    def putBit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { bytes += acc.toByte; acc = 0; nBits = 0 }
    }
    def putBits(v: Long, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) { putBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def result(): Array[Byte] = {
      val out = bytes.clone()
      if (nBits > 0) out += (acc << (8 - nBits)).toByte // zero-padded tail
      out.toArray
    }
  }

  private final class BitReader(bytes: Array[Byte], offset: Int) {
    private var pos = offset * 8L
    private val end = bytes.length * 8L
    def getBit(): Int = {
      require(pos < end, "GFL1 truncated: bitstream ended mid-read")
      val b = (bytes((pos >>> 3).toInt) >> (7 - (pos & 7L).toInt)) & 1
      pos += 1
      b
    }
    def getBits(width: Int): Long = {
      var v = 0L
      var i = 0
      while (i < width) { v = (v << 1) | getBit(); i += 1 }
      v
    }
    def bitsLeft: Long = end - pos
  }

  /** Encode 16-bit PCM losslessly: best fixed predictor + Rice. */
  def gflEncode(samples: Array[Short]): Array[Byte] = {
    val n = samples.length
    val maxOrder = math.min(4, n)
    var bestOrder = 0
    var bestSum = Long.MaxValue
    var bestRes: Array[Long] = null
    var o = 0
    while (o <= maxOrder) {
      val res = fixedResiduals(samples, o)
      var s = 0L
      res.foreach(r => s += math.abs(r))
      if (s < bestSum) { bestSum = s; bestOrder = o; bestRes = res }
      o += 1
    }
    val us = bestRes.map(zigzag)
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 20) {
      var bits = 0L
      us.foreach(u => bits += (u >>> k) + 1 + k)
      if (bits < bestBits) { bestBits = bits; bestK = k }
      k += 1
    }
    val head = ByteBuffer.allocate(10 + 2 * bestOrder)
      .order(ByteOrder.LITTLE_ENDIAN)
    head.put('G'.toByte).put('F'.toByte).put('L'.toByte).put('1'.toByte)
    head.putInt(n)
    head.put(bestOrder.toByte)
    head.put(bestK.toByte)
    var w = 0
    while (w < bestOrder) { head.putShort(samples(w)); w += 1 }
    val bw = new BitWriter
    us.foreach { u =>
      var q = u >>> bestK
      while (q > 0) { bw.putBit(0); q -= 1 } // unary quotient: q zeros…
      bw.putBit(1)                           // …then the 1 terminator
      bw.putBits(u, bestK)
    }
    head.array() ++ bw.result()
  }

  /** Decode a GFL1 payload back to the exact PCM samples (as floats —
    * int16 values are float-exact). Loud failure on wrong magic, a
    * corrupt order/k, or truncation anywhere in the bitstream.
    */
  def gflDecode(bytes: Array[Byte]): Array[Float] = {
    require(bytes.length >= 10, s"GFL1 too short: ${bytes.length} bytes")
    require(bytes(0) == 'G' && bytes(1) == 'F' && bytes(2) == 'L' &&
      bytes(3) == '1', "not a GFL1 payload")
    val head = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = head.getInt(4)
    val order = bytes(8).toInt
    val k = bytes(9).toInt
    require(n >= 0 && n <= (1 << 26), s"bad sample count $n")
    require(order >= 0 && order <= 4 && order <= n, s"bad order $order")
    require(k >= 0 && k <= 30, s"bad rice parameter $k")
    require(bytes.length >= 10 + 2 * order, "GFL1 truncated: warmup")
    val x = new Array[Long](n)
    var i = 0
    while (i < order) { x(i) = head.getShort(10 + 2 * i).toLong; i += 1 }
    val br = new BitReader(bytes, 10 + 2 * order)
    val coefs = FixedCoefs(order)
    i = order
    while (i < n) {
      var q = 0L
      while (br.getBit() == 0) {
        q += 1
        require(q <= (1L << 32), "GFL1 corrupt: runaway unary quotient")
      }
      val u = (q << k) | br.getBits(k)
      var pred = 0L
      var j = 0
      while (j < order) { pred += coefs(j) * x(i - 1 - j); j += 1 }
      x(i) = pred + unzigzag(u)
      require(x(i) >= Short.MinValue && x(i) <= Short.MaxValue,
        s"GFL1 corrupt: sample $i out of int16 range (${x(i)})")
      i += 1
    }
    require(br.bitsLeft < 8,
      s"GFL1 corrupt: ${br.bitsLeft} bits of trailing data")
    x.map(_.toFloat)
  }
}
