package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the pipeline
  * as opaque `binary` columns with typed metadata beside them.
  *
  * The container has no native image/audio codec libraries, so m2's
  * frame "decode" is a deterministic fake (the frame's md5) to keep its
  * oracle exact. The extension point itself ([[decodeFrames]]) is NOT a
  * stub: [[Codecs]] ships real pure-JVM WAV-PCM and BMP decoders that
  * run through it (exercised by m2b and CodecsSpec). Production codecs
  * (JPEG/FLAC/video) plug in the same way — a Pandas-UDF
  * (`mapInPandas`) or JNI decoder with the SAME (doc_id, frame_idx,
  * frame_bytes) → feature row contract — without touching the plan.
  */
object Multimodal {

  /** m1 — binary metadata extraction: payload length, content hash and
    * a hex head — the cheap typed metadata a pipeline keeps next to an
    * opaque media column. Input text is cast to binary to model the
    * payload (testdata ships no real media).
    */
  def binaryMeta(documents: DataFrame): DataFrame = {
    val bin = col("text").cast("binary")
    documents.select(
      col("doc_id"),
      col("source").as("media_type"),
      octet_length(bin).cast("long").as("n_bytes"),
      md5(bin).as("content_hash"),
      lower(hex(substring(bin, 1, 8))).as("head_hex"))
  }

  /** m2 — deterministic frame sampling: the payload splits into
    * fixed-size chunks ("frames"), every `stride`-th frame is kept, and
    * each kept frame yields (frame_idx, frame_bytes, fake-decode
    * features). The explode happens inside the scan partition — frames
    * of one payload never shuffle.
    */
  def frameSample(
      documents: DataFrame,
      frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    val bin = col("text").cast("binary")
    val nFrames = ceil(octet_length(bin).cast("double") / frameBytes)
      .cast("int")
    documents
      .select(col("doc_id"), bin.as("payload"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        // step the sequence by `stride` directly — never materializes
        // the skipped frame indices
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        // STUB decode: a real pipeline maps frame -> features via
        // mapInPandas/JNI; here the "feature" is the frame's md5.
        md5(col("frame")).as("frame_feature"))
  }

  final case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])
  final case class FrameFeature(
      doc_id: Long, frame_idx: Long, feature: Array[Float])

  /** The decoder extension point: batch-iterator over frames inside
    * each partition — the exact contract a `mapInPandas` decoder or a
    * JNI codec binding plugs into ((doc_id, frame_idx, bytes) batches
    * in, feature rows out; frames of one payload never leave their
    * partition). `decoder` is the STUB — the container ships no codecs;
    * production swaps in the real decode without touching the plan.
    */
  def decodeFrames(frames: org.apache.spark.sql.Dataset[Frame])(
      decoder: Array[Byte] => Array[Float]):
      org.apache.spark.sql.Dataset[FrameFeature] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions(it =>
      it.map(f => FrameFeature(f.doc_id, f.frame_idx, decoder(f.frame))))
  }

  /** Integer luma of decoded pixel `i` (channels interleaved r,g,b as
    * exact small ints): (299r + 587g + 114b) / 1000, floor — the
    * BT.601 weights in exact integer arithmetic so both engines and
    * every partitioning agree bit-for-bit.
    */
  private def gray(f: Array[Float], i: Int): Int =
    (f(3 * i).toInt * 299 + f(3 * i + 1).toInt * 587 +
      f(3 * i + 2).toInt * 114) / 1000

  /** 60-bit difference hash (dHash, the Krawetz aHash/dHash family)
    * over DECODED frames: bit i = gray(i) > gray(i+1) for the first
    * 61 pixels — invariant to uniform brightness shifts (every
    * comparison shifts both sides), one bit-flip per local pixel
    * edit. 60 bits keeps the sum of powers BIGINT-safe in any engine
    * (the house 60-bit convention). Frames must decode to ≥ 61 pixels
    * (the m8 length filter guarantees it; a shorter frame throws
    * rather than hashing garbage).
    */
  def imageDhash(frames: org.apache.spark.sql.Dataset[Frame])(
      decoder: Array[Byte] => Array[Float]):
      org.apache.spark.sql.DataFrame = {
    import frames.sparkSession.implicits._
    decodeFrames(frames)(decoder)
      .map { f =>
        require(f.feature.length >= 3 * 61,
          s"imageDhash needs >= 61 decoded pixels, got ${f.feature.length / 3}")
        var hash = 0L
        var prev = gray(f.feature, 0)
        var i = 1
        while (i <= 60) {
          val g = gray(f.feature, i)
          if (prev > g) hash |= 1L << (i - 1)
          prev = g
          i += 1
        }
        (f.doc_id, (f.feature.length / 3).toLong, hash)
      }
      .toDF("doc_id", "n_pixels", "dhash")
  }
}
