package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Codecs, Multimodal}

/** Specs for the pure-JVM codecs and the multimodal decode plug-point:
  * encode→decode round-trips are exact, malformed payloads fail loudly,
  * and the real WAV decoder runs end-to-end through
  * `Multimodal.decodeFrames` (the mapPartitions contract production
  * codecs plug into).
  */
class CodecsSpec extends AnyFunSuite {

  // ---------------------------------------------------------------
  // WAV
  // ---------------------------------------------------------------

  private val samples =
    Array[Short](0, 1, -1, 1000, -1000, 32767, -32768, 12345)

  test("WAV PCM16 encode→decode round-trips samples exactly") {
    val decoded = Codecs.wavPcm16(Codecs.wavPcm16Encode(samples))
    // k/32768 is exactly representable in float32 for |k| <= 32768
    assert(decoded.toSeq == samples.map(_ / 32768.0f).toSeq)
  }

  test("WAV decode skips unknown chunks before data") {
    val base = Codecs.wavPcm16Encode(samples)
    // splice a LIST chunk (odd size → padded) between fmt and data
    val listBody = Array[Byte]('I', 'N', 'F', 'O', 7)
    val buf = ByteBuffer.allocate(base.length + 8 + listBody.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(base, 0, 36) // RIFF header + fmt chunk
    buf.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
      .put(listBody).put(0.toByte) // pad to even
    buf.put(base, 36, base.length - 36) // data chunk
    val bytes = buf.array()
    // patch the RIFF size (total - 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, bytes.length - 8)
    val decoded = Codecs.wavPcm16(bytes)
    assert(decoded.toSeq == samples.map(_ / 32768.0f).toSeq)
  }

  test("WAV decode rejects malformed payloads") {
    assertThrows[IllegalArgumentException](Codecs.wavPcm16(Array[Byte]()))
    assertThrows[IllegalArgumentException](
      Codecs.wavPcm16("not a wave file at all".getBytes("US-ASCII")))
    // truncated data chunk: claim more bytes than the payload holds
    val bad = Codecs.wavPcm16Encode(samples)
    ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN).putInt(40, 9999)
    assertThrows[IllegalArgumentException](Codecs.wavPcm16(bad))
    // odd data size is malformed 16-bit PCM — loud failure, not a
    // silently dropped trailing byte
    val odd = Codecs.wavPcm16Encode(samples)
    ByteBuffer.wrap(odd).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40, samples.length * 2 - 1)
    assertThrows[IllegalArgumentException](Codecs.wavPcm16(odd))
  }

  test("WAV decode returns interleaved stereo as stored") {
    val stereo = Array[Short](100, -100, 200, -200)
    val decoded = Codecs.wavPcm16(Codecs.wavPcm16Encode(stereo, channels = 2))
    assert(decoded.toSeq == stereo.map(_ / 32768.0f).toSeq)
  }

  // ---------------------------------------------------------------
  // BMP
  // ---------------------------------------------------------------

  private def lum(rgb: Int): Float = {
    val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
  }

  test("BMP 24-bit encode→decode yields top-down luminance, padded width") {
    // width 3 → row stride 12 with 3 pad bytes; 2 rows
    val px = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000, 0x808080)
    val decoded = Codecs.bmpGray(Codecs.bmp24Encode(3, 2, px))
    assert(decoded.toSeq == px.map(lum).toSeq)
  }

  test("BMP decode handles unpadded width and single row") {
    val px = Array(0x123456, 0x654321, 0x0a0b0c, 0xf0e0d0)
    // width 4 → row stride exactly 12, no padding
    assert(Codecs.bmpGray(Codecs.bmp24Encode(4, 1, px)).toSeq ==
      px.map(lum).toSeq)
  }

  test("BMP channel decode round-trips raw RGB exactly, top-down") {
    val px = Array(0x010203, 0x112233, 0xfffefd, 0x000000,
      0x0a0b0c, 0x606162, 0x7f8081, 0xc0c1c2)
    val decoded = Codecs.bmpChannels(Codecs.bmp24Encode(4, 2, px))
    val expected = px.flatMap(p => Seq(
      ((p >> 16) & 0xff).toFloat, ((p >> 8) & 0xff).toFloat,
      (p & 0xff).toFloat))
    assert(decoded.toSeq == expected.toSeq)
    // padded width too (3 px/row → 3 pad bytes/row)
    val px3 = Array(0x123456, 0x789abc, 0xdef012, 0x345678, 0x9abcde, 0xf01234)
    assert(Codecs.bmpChannels(Codecs.bmp24Encode(3, 2, px3)).toSeq ==
      px3.flatMap(p => Seq(((p >> 16) & 0xff).toFloat,
        ((p >> 8) & 0xff).toFloat, (p & 0xff).toFloat)).toSeq)
  }

  test("m3 matches an independent reference on live testdata") {
    import SparkTestSession._
    // straight from the text bytes — no BMP/codec path
    val expected = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("US-ASCII")))
      .filter(_._2.length >= 12)
      .map { case (id, b) =>
        val n = (b.length / 12) * 4
        val ch = (0 until n).map(i =>
          ((b(3 * i) & 0xff).toLong, (b(3 * i + 1) & 0xff).toLong,
            (b(3 * i + 2) & 0xff).toLong))
        id -> ((n.toLong, ch.map(_._1).sum, ch.map(_._2).sum, ch.map(_._3).sum))
      }.toMap
    val got = PipelineQueries.m3ImageFeatures(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("BMP decode rejects malformed payloads") {
    assertThrows[IllegalArgumentException](Codecs.bmpGray(Array[Byte]()))
    val bad = Codecs.bmp24Encode(2, 2, Array(1, 2, 3, 4))
    bad(0) = 'X' // break the magic
    assertThrows[IllegalArgumentException](Codecs.bmpGray(bad))
    val bpp = Codecs.bmp24Encode(2, 2, Array(1, 2, 3, 4))
    ByteBuffer.wrap(bpp).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 8.toShort) // claim 8-bit
    assertThrows[IllegalArgumentException](Codecs.bmpGray(bpp))
    // height = Int.MinValue survives math.abs negative — must hit the
    // require, not a NegativeArraySizeException
    val minH = Codecs.bmp24Encode(1, 1, Array(0x123456))
    ByteBuffer.wrap(minH).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    assertThrows[IllegalArgumentException](Codecs.bmpGray(minH))
    assertThrows[IllegalArgumentException](Codecs.bmpChannels(minH))
  }

  // ---------------------------------------------------------------
  // End-to-end through the decode plug-point
  // ---------------------------------------------------------------

  test("decodeFrames runs the real WAV decoder distributed, end-to-end") {
    import SparkTestSession._
    import spark.implicits._
    val fixtures = Seq(
      Multimodal.Frame(1L, 0L, Codecs.wavPcm16Encode(samples)),
      Multimodal.Frame(2L, 0L, Codecs.wavPcm16Encode(Array[Short](7, -7))))
    val out = Multimodal.decodeFrames(fixtures.toDS())(Codecs.wavPcm16)
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(out(1L) == samples.map(_ / 32768.0f).toSeq)
    assert(out(2L) == Seq(7 / 32768.0f, -7 / 32768.0f))
  }

  // ---------------------------------------------------------------
  // JPEG (lossy — r11): determinism, geometry, bounded fidelity
  // ---------------------------------------------------------------

  test("JPEG gray encode is deterministic and decode reports true geometry") {
    val px = Array.tabulate(8 * 5)(i => (i * 37) % 256)
    val a = Codecs.jpegGrayEncode(8, 5, px)
    val b = Codecs.jpegGrayEncode(8, 5, px)
    assert(a.toSeq == b.toSeq, "same pixels must encode to same bytes")
    val dec = Codecs.jpegGrayWithDims(a)
    assert(dec(0) == 8.0f && dec(1) == 5.0f)
    assert(dec.length == 2 + 8 * 5)
  }

  test("JPEG decode of a flat image is exact; textured image is near") {
    // a constant block survives DCT quantization exactly
    val flat = Array.fill(16 * 16)(128)
    val decFlat = Codecs.jpegGrayWithDims(Codecs.jpegGrayEncode(16, 16, flat))
    assert(decFlat.drop(2).forall(_ == 128.0f))
    // a textured image at q=0.95 stays within a loose per-pixel bound —
    // the LOSSY-codec contract: near, not equal
    val tex = Array.tabulate(16 * 16)(i => 64 + ((i * 13) % 128))
    val decTex = Codecs.jpegGrayWithDims(Codecs.jpegGrayEncode(16, 16, tex))
    val maxErr = decTex.drop(2).zip(tex).map {
      case (d, o) => math.abs(d - o.toFloat)
    }.max
    assert(maxErr > 0.0f, "textured q=0.95 JPEG should not be lossless")
    assert(maxErr <= 48.0f, s"per-pixel error $maxErr exceeds sanity bound")
  }

  test("JPEG decode rejects malformed and non-gray payloads") {
    intercept[IllegalArgumentException] {
      Codecs.jpegGrayWithDims(Array[Byte](1, 2, 3, 4))
    }
    // RGB JPEG violates the gray-band contract
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    intercept[IllegalArgumentException] {
      Codecs.jpegGrayWithDims(out.toByteArray)
    }
    // r12: a CORRUPTED marker stream makes ImageIO throw
    // RuntimeExceptions, not just IOException — still the same
    // "not a decodable image" contract, never an escaping crash
    val good = Codecs.jpegGrayEncode(8, 8, Array.fill(64)(128))
    val corrupt = good.clone()
    var i = 2
    while (i < corrupt.length - 2) { corrupt(i) = 0xff.toByte; i += 3 }
    val e = intercept[IllegalArgumentException] {
      Codecs.jpegGrayWithDims(corrupt)
    }
    assert(e.getMessage.contains("not a decodable image"))
    // r12: the JPEG dimension cap is a loud contract, not a crash
    // deep inside imageio — m5 clamps synthesized frames to it
    intercept[IllegalArgumentException] {
      Codecs.jpegGrayEncode(8, 65536, new Array[Int](8 * 65536))
    }
  }

  // ---------------------------------------------------------------
  // PNG (r12: hand-rolled inflate + unfilter — lossless, so every
  // round-trip below is EXACT equality)
  // ---------------------------------------------------------------

  private def pngChunk(t: String, d: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(java.nio.ByteBuffer.allocate(4).putInt(d.length).array())
    val tb = t.getBytes("US-ASCII")
    o.write(tb); o.write(d)
    val c = new java.util.zip.CRC32
    c.update(tb); c.update(d)
    o.write(java.nio.ByteBuffer.allocate(4).putInt(c.getValue.toInt)
      .array())
    o.toByteArray
  }

  /** (signature+IHDR prefix, raw zlib stream) of an encoded PNG —
    * the pieces the malformed-payload fixtures reassemble. */
  private def pngParts(whole: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val buf = java.nio.ByteBuffer.wrap(whole)
    val ihdrLen = buf.getInt(8)
    val idatPos = 8 + 12 + ihdrLen
    val idatLen = buf.getInt(idatPos)
    (java.util.Arrays.copyOfRange(whole, 0, idatPos),
      java.util.Arrays.copyOfRange(whole, idatPos + 8,
        idatPos + 8 + idatLen))
  }

  test("PNG encode→decode round-trips exactly under every filter type") {
    val rnd = new scala.util.Random(42)
    val w = 7; val h = 5 // odd width: exercises the x=0 edges per row
    val px = Array.fill(w * h)(rnd.nextInt(256))
    for (ft <- 0 to 4) {
      val out = Codecs.pngGrayWithDims(Codecs.pngGrayEncode(w, h, px, ft))
      assert(out(0) == w.toFloat && out(1) == h.toFloat, s"filter $ft")
      assert(out.drop(2).map(_.toInt).sameElements(px),
        s"filter $ft must reconstruct exactly")
    }
    // degenerate geometries: 1x1 and a single row/column
    for ((ww, hh) <- Seq((1, 1), (4, 1), (1, 4))) {
      val p2 = Array.tabulate(ww * hh)(i => (i * 37) % 256)
      for (ft <- 0 to 4)
        assert(Codecs.pngGrayWithDims(Codecs.pngGrayEncode(ww, hh, p2, ft))
          .drop(2).map(_.toInt).sameElements(p2), s"${ww}x$hh filter $ft")
    }
  }

  test("PNG decode concatenates split IDAT chunks and skips ancillary chunks") {
    val px = Array.tabulate(32)(i => (i * 11) % 256)
    val whole = Codecs.pngGrayEncode(8, 4, px, filterType = 2)
    // rebuild the file with the zlib stream split across two IDATs and
    // a tEXt ancillary chunk between them (any split is legal PNG)
    val (head, z) = pngParts(whole)
    assert(z.length > 2, "fixture needs a splittable stream")
    val o = new java.io.ByteArrayOutputStream()
    o.write(head) // signature + IHDR
    o.write(pngChunk("IDAT", java.util.Arrays.copyOfRange(z, 0, 2)))
    o.write(pngChunk("tEXt", "comment fixture".getBytes("US-ASCII")))
    o.write(pngChunk("IDAT", java.util.Arrays.copyOfRange(z, 2, z.length)))
    o.write(pngChunk("IEND", Array.emptyByteArray))
    val out = Codecs.pngGrayWithDims(o.toByteArray)
    assert(out.drop(2).map(_.toInt).sameElements(px))
  }

  test("PNG decode rejects malformed payloads loudly") {
    val good = Codecs.pngGrayEncode(8, 4,
      Array.tabulate(32)(i => (i * 7) % 256), filterType = 4)
    // wrong signature
    intercept[IllegalArgumentException] {
      Codecs.pngGrayWithDims("nota png at all....".getBytes)
    }
    // flipped stream byte → CRC mismatch (the check that catches rot)
    val rot = good.clone()
    rot(good.length - 15) = (rot(good.length - 15) ^ 0x40).toByte
    intercept[IllegalArgumentException] { Codecs.pngGrayWithDims(rot) }
    // truncated zlib stream: IDAT tail dropped, chunk shape kept valid
    val (head, z) = pngParts(good)
    val trunc = new java.io.ByteArrayOutputStream()
    trunc.write(head)
    trunc.write(pngChunk("IDAT",
      java.util.Arrays.copyOfRange(z, 0, z.length / 2)))
    trunc.write(pngChunk("IEND", Array.emptyByteArray))
    intercept[IllegalArgumentException] {
      Codecs.pngGrayWithDims(trunc.toByteArray)
    }
    // an RGB PNG (real platform encoder) violates the gray contract
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(1, 1, 0x00ff00)
    val rgb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", rgb)
    val e = intercept[IllegalArgumentException] {
      Codecs.pngGrayWithDims(rgb.toByteArray)
    }
    assert(e.getMessage.contains("not grayscale"))
    // missing IEND
    intercept[IllegalArgumentException] {
      Codecs.pngGrayWithDims(
        java.util.Arrays.copyOfRange(good, 0, good.length - 12))
    }
  }

  test("PNG decode agrees with the platform decoder on gray images") {
    // the independent-reference check: javax.imageio reads our
    // encoder's output to the identical pixels the hand decoder emits
    val rnd = new scala.util.Random(7)
    val px = Array.fill(16 * 9)(rnd.nextInt(256))
    for (ft <- 0 to 4) {
      val bytes = Codecs.pngGrayEncode(16, 9, px, ft)
      val ours = Codecs.pngGrayWithDims(bytes).drop(2).map(_.toInt)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 16 && img.getHeight == 9)
      val ref = Array.tabulate(16 * 9)(i =>
        img.getRaster.getSample(i % 16, i / 16, 0))
      assert(ours.sameElements(ref), s"filter $ft vs platform decoder")
    }
  }

  test("m5 matches its geometry model on live testdata") {
    import SparkTestSession._
    val expected = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).length))
      .filter(_._2 >= 8)
      .map { case (id, n) =>
        id -> ((8L, (n / 8).toLong, 8L * (n / 8)))
      }.toMap
    val got = PipelineQueries.m5JpegDecode(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected && got.nonEmpty)
  }

  test("m2b matches an independent reference on live testdata") {
    import SparkTestSession._
    // reference model: straight from the text bytes, no WAV/codec path
    val expected = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("US-ASCII")))
      .filter(_._2.length >= 2)
      .map { case (id, b) =>
        val ks = (0 until b.length / 2).map(i =>
          (b(2 * i) & 0xff) + 256 * (b(2 * i + 1) & 0xff))
        // ASCII corpus → hi byte < 128 → k is the non-negative s16le value
        id -> ((ks.size.toLong, ks.map(k => k.toLong * k).sum,
          if (ks.isEmpty) 0L else ks.max.toLong))
      }.toMap
    val got = PipelineQueries.m2bFrameDecode(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("GIF codec: LZW round-trip ≡ identity, cross-validated against the JDK's GIF both ways") {
    val rnd = new scala.util.Random(3)
    // sizes chosen to cross LZW code-width boundaries (12k random →
    // widths 9..12 + a mid-stream CLEAR) and to force the KwKwK case
    // (strict alternation); full 0–255 index range
    for ((px, w) <- Seq(
        (Array.fill(1)(rnd.nextInt(256)), 1),
        (Array.fill(7)(rnd.nextInt(256)), 1),
        (Array.fill(300)(rnd.nextInt(256)), 4),
        (Array.fill(12000)(rnd.nextInt(256)), 4),
        (Array.tabulate(9000)(i => i % 2 * 255), 4))) {
      val h = px.length / w
      val enc = Codecs.gifGrayEncode(w, h, px.take(w * h))
      val dec = Codecs.gifGrayWithDims(enc)
      assert(dec(0) == w && dec(1) == h)
      assert((0 until w * h).forall(i => dec(2 + i) == px(i).toFloat),
        s"own round-trip at ${px.length}px")
      // the JDK's INDEPENDENT LZW implementation must agree on our
      // bytes — any code-width off-by-one desyncs here
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(enc))
      assert(img.getWidth == w && img.getHeight == h)
      assert((0 until w * h).forall(i =>
        (img.getRGB(i % w, i / w) & 0xff) == px(i)),
        s"imageio cross-decode at ${px.length}px")
    }
    // reverse arm: our decoder reads the JDK WRITER's output — which
    // is INTERLACED, driving the 4-pass de-interlace path
    val w = 16; val h = 20
    val px = Array.fill(w * h)(rnd.nextInt(256))
    val cm = new java.awt.image.IndexColorModel(8, 256,
      Array.tabulate(256)(_.toByte), Array.tabulate(256)(_.toByte),
      Array.tabulate(256)(_.toByte))
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (i <- 0 until w * h) bi.getRaster.setSample(i % w, i / w, 0, px(i))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "gif", bos)
    val dec = Codecs.gifGrayWithDims(bos.toByteArray)
    assert(dec(0) == w && dec(1) == h &&
      (0 until w * h).forall(i => dec(2 + i) == px(i).toFloat),
      "jdk-writer (interlaced) cross-decode")
    // loud-failure contract: every malformed shape must surface as
    // IllegalArgumentException, never an index error
    assertThrows[IllegalArgumentException] {
      Codecs.gifGrayWithDims("not a gif at all".getBytes)
    }
    val small = Codecs.gifGrayEncode(4, 4, Array.fill(16)(7))
    assertThrows[IllegalArgumentException] {
      Codecs.gifGrayWithDims(small.take(small.length - 9)) // truncated tail
    }
    // truncation INSIDE the structures the walkers scan byte-by-byte:
    // cut right after the LZW min-code byte (a sub-block length byte
    // is the next read), and inside the header/descriptor region
    val lzwStart = 13 + 3 * 256 + 10 + 1
    for (cut <- Seq(lzwStart, lzwStart + 1, 14, 13 + 3 * 256 + 3))
      assertThrows[IllegalArgumentException] {
        Codecs.gifGrayWithDims(small.take(cut))
      }
  }

  test("m8 dHash: brightness-shift invariant, local-edit flips few bits, short frame refuses") {
    import SparkTestSession._
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // 80 pixels of random channel values in [20, 200)
    val base = Array.fill(80)(Array.fill(3)(20 + rnd.nextInt(180)))
    def bmpOf(px: Array[Array[Int]]): Array[Byte] =
      Codecs.bmp24Encode(4, px.length / 4,
        px.map(c => (c(0) << 16) | (c(1) << 8) | c(2)))
    def hashOf(id: Long, px: Array[Array[Int]]): Long =
      Multimodal.imageDhash(
        Seq(Multimodal.Frame(id, 0L, bmpOf(px))).toDS())(Codecs.bmpChannels)
        .collect()(0).getLong(2)
    val h0 = hashOf(1L, base)
    // +40 on every channel: every gray shifts by the same amount →
    // every comparison is unchanged → IDENTICAL hash (the perceptual
    // property that separates dHash from a content hash)
    val brighter = base.map(_.map(_ + 40))
    assert(hashOf(2L, brighter) == h0, "uniform brightness must not move dHash")
    // one pixel edited inside the hashed window flips at most its two
    // adjacent comparisons
    val edited = base.map(_.clone())
    edited(30) = Array(255, 255, 255)
    val flips = java.lang.Long.bitCount(hashOf(3L, edited) ^ h0)
    assert(flips >= 1 && flips <= 2, s"local edit flipped $flips bits")
    // an edit PAST the 61-pixel hash window changes nothing
    val tail = base.map(_.clone())
    tail(70) = Array(0, 0, 0)
    assert(hashOf(4L, tail) == h0, "edit outside the hashed window")
    // a frame under 61 pixels refuses loudly instead of hashing garbage
    val tiny = intercept[org.apache.spark.SparkException] {
      Multimodal.imageDhash(
        Seq(Multimodal.Frame(5L, 0L, bmpOf(base.take(40)))).toDS())(
        Codecs.bmpChannels).collect()
    }
    assert(tiny.getMessage != null)
  }

  // ---- GFL1: FLAC-style fixed predictors + Rice (m10) ----

  test("GFL1: exact round-trip on randomized PCM, every predictor order exercised") {
    val rnd = new scala.util.Random(10)
    val orders = scala.collection.mutable.Set.empty[Int]
    // signal families steering the order heuristic to each predictor:
    // white noise → 0, near-constant → 1, ramp → 2, quadratic → 3,
    // cubic → 4 — plus fully random lengths/values
    def roundTrip(s: Array[Short]): Unit = {
      val enc = Codecs.gflEncode(s)
      orders += enc(8).toInt
      val dec = Codecs.gflDecode(enc)
      assert(dec.length == s.length)
      assert(dec.map(_.toInt.toShort).sameElements(s),
        s"lossless round-trip failed at n=${s.length}, order=${enc(8)}")
    }
    roundTrip((0 until 400).map(_ => (rnd.nextInt(65536) - 32768).toShort).toArray)
    roundTrip(Array.fill(300)(1234.toShort))
    roundTrip((0 until 300).map(i => (i * 7 - 1000).toShort).toArray)
    roundTrip((0 until 200).map(i => (i * i / 40).toShort).toArray)
    roundTrip((0 until 150).map(i => (i * i * i / 3000).toShort).toArray)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(40)
      roundTrip(Array.fill(n)((rnd.nextInt(65536) - 32768).toShort))
    }
    assert(orders == Set(0, 1, 2, 3, 4),
      s"signal families must exercise all five predictors: $orders")
    // edges: empty and single-sample streams
    assert(Codecs.gflDecode(Codecs.gflEncode(Array.empty[Short])).isEmpty)
    assert(Codecs.gflDecode(Codecs.gflEncode(Array(42.toShort)))
      .sameElements(Array(42f)))
  }

  test("GFL1: compression wins on smooth signals; corruption refuses loudly") {
    // a smooth ramp must compress well below the 2-bytes/sample raw
    // form — the reason a predictive codec exists
    val ramp = (0 until 2000).map(i => (i % 8000).toShort).toArray
    val enc = Codecs.gflEncode(ramp)
    assert(enc.length < ramp.length, // < 1 byte/sample vs 2 raw
      s"ramp must compress: ${enc.length} bytes for ${2 * ramp.length} raw")
    // refusals: magic, truncation (header / warmup / mid-bitstream),
    // corrupt order/k, out-of-range reconstruction, trailing garbage
    intercept[IllegalArgumentException](Codecs.gflDecode("GIF89a____".getBytes))
    intercept[IllegalArgumentException](Codecs.gflDecode(enc.take(6)))
    intercept[IllegalArgumentException](Codecs.gflDecode(enc.take(11)))
    intercept[IllegalArgumentException](Codecs.gflDecode(enc.dropRight(8)))
    val badOrder = enc.clone(); badOrder(8) = 9
    intercept[IllegalArgumentException](Codecs.gflDecode(badOrder))
    val badK = enc.clone(); badK(9) = 77
    intercept[IllegalArgumentException](Codecs.gflDecode(badK))
    intercept[IllegalArgumentException](
      Codecs.gflDecode(enc ++ Array.fill(4)(0x5a.toByte)))
  }
}
