package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed per-partition the way a real
  * decoder library would be driven on a cluster.
  *
  * Decoding is pluggable ([[MediaCodec]]). The default
  * [[ImageIoCodec]] is a REAL decoder for the formats the JDK ships
  * (`javax.imageio`: PNG/BMP/GIF/JPEG — no external deps); payloads it
  * cannot parse fall back to [[DecodeStub]]'s deterministic fake
  * features, which also stand in for the audio/video codecs this
  * container cannot ship. The Spark-side plumbing is real and
  * load-bearing:
  *  - binary + metadata schema that parquet stores efficiently (binary
  *    stays columnar, metadata prunable without touching payloads);
  *  - per-partition batched processing (`mapPartitions`) — one decoder
  *    instance per task, amortized across the partition, the same shape
  *    a JNI/FFI codec binding needs;
  *  - frame sampling producing an exploded (media_id, frame_idx, frame)
  *    table — fan-out happens in the executor, never on the driver.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                           width: Int, height: Int, checksum: String)
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Stand-in for a real decoder binding. Deterministic in the payload
    * bytes so tests and re-runs are stable. A production build replaces
    * the body with the codec call (e.g. via a JNI binding loaded once
    * per executor in the `mapPartitions` closure below).
    */
  object DecodeStub {
    def decode(r: MediaRow): MediaFeatures = {
      val len = r.payload.length.toLong
      // fake-but-deterministic "dimensions" from a rolling byte hash
      val h = r.payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
      MediaFeatures(r.media_id, r.kind, len,
        width = (math.abs(h) % 1920).toInt + 1,
        height = (math.abs(h / 1920) % 1080).toInt + 1,
        checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(r.payload).map("%02x".format(_)).mkString)
    }

    /** Sample up to k evenly spaced "frames" (byte slices — a video
      * codec would return decoded images here).
      */
    def sampleFrames(r: MediaRow, k: Int, frameBytes: Int): Iterator[Frame] = {
      val n = math.min(k, math.max(1, r.payload.length / math.max(1, frameBytes)))
      (0 until n).iterator.map { i =>
        val off = (r.payload.length.toLong * i / n).toInt
        Frame(r.media_id, i,
          r.payload.slice(off, math.min(off + frameBytes, r.payload.length)))
      }
    }
  }

  /** A per-row decoder. Implementations must be deterministic in the
    * payload bytes (tests and the driver's hash compare re-run plans)
    * and cheap to serialize — one instance ships in the task closure.
    */
  trait MediaCodec extends Serializable {
    /** Called once per task before rows stream through — the place for
      * codec/JNI context setup a real binding needs.
      */
    def initPerTask(): Unit = ()
    def decode(r: MediaRow): MediaFeatures
    /** Sample up to `k` evenly spaced frames. The default is the
      * deterministic byte-slice stub (audio/video payloads this
      * container has no codec for); [[ImageIoCodec]] overrides it with
      * real multi-image decode.
      */
    def sampleFrames(r: MediaRow, k: Int, frameBytes: Int): Iterator[Frame] =
      DecodeStub.sampleFrames(r, k, frameBytes)
  }

  /** Real image decode on the JDK's own `javax.imageio` readers
    * (PNG/BMP/GIF/JPEG): actual pixel-header dimensions, no external
    * deps. Non-image payloads (and the audio/video kinds this container
    * has no codec for) fall back to [[DecodeStub]] so the operator
    * stays total over arbitrary bytes — a corrupt blob yields a row,
    * not a task failure (reference per-file error isolation, O1).
    */
  object ImageIoCodec extends MediaCodec {
    override def initPerTask(): Unit =
      // never spill decode scratch to executor-local disk temp files
      javax.imageio.ImageIO.setUseCache(false)
    def decode(r: MediaRow): MediaFeatures =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null) DecodeStub.decode(r)
        else MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          width = img.getWidth, height = img.getHeight,
          checksum = java.security.MessageDigest.getInstance("MD5")
            .digest(r.payload).map("%02x".format(_)).mkString)
      } catch { case _: Exception => DecodeStub.decode(r) }

    /** PNG-encode `img`, downscaling until the encoded size fits
      * `frameBytes` (PNG size tracks pixel count, so each pass scales
      * by ~sqrt(bound/size), clamped so the loop always makes
      * progress). Returns None when even a minimal image cannot fit —
      * PNG container overhead alone is ~70 bytes, so tiny bounds are
      * unsatisfiable by ANY real encode.
      */
    private def encodePngWithin(img0: java.awt.image.BufferedImage,
                                frameBytes: Int): Option[Array[Byte]] = {
      def encode(i: java.awt.image.BufferedImage): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(i, "png", bos)
        bos.toByteArray
      }
      var img = img0
      var bytes = encode(img)
      var attempts = 0
      while (bytes.length > frameBytes && attempts < 8 &&
             (img.getWidth > 1 || img.getHeight > 1)) {
        val s = math.min(0.9, math.sqrt(frameBytes.toDouble / bytes.length))
        val w = math.max(1, (img.getWidth * s).toInt)
        val h = math.max(1, (img.getHeight * s).toInt)
        val scaled = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        img = scaled
        bytes = encode(img)
        attempts += 1
      }
      if (bytes.length <= frameBytes) Some(bytes) else None
    }

    /** Real multi-frame sampling: payloads the JDK has an `ImageReader`
      * for (animated GIF being the multi-image case it ships) are
      * scanned for their frame count, `min(k, frames)` evenly spaced
      * frames are DECODED (`ImageReader.read(i)`) and re-emitted as PNG
      * bytes — actual pixels, not byte slices. Frames are the raw
      * stored rects; compositing partial-frame GIF disposal is codec
      * work out of scope here. Unparseable payloads fall back to
      * [[DecodeStub]] so the operator stays total (O1) and byte-payload
      * corpora (m02) keep their stub-deterministic output.
      *
      * `frameBytes` is a HARD per-frame bound on every path — it is the
      * caller's executor-memory-safety knob for the fan-out (a frame
      * table from multi-MB animations must not carry multi-MB rows).
      * Decoded frames that exceed it are downscaled to fit
      * ([[encodePngWithin]]); if the bound is unsatisfiable by any real
      * encode (smaller than PNG container overhead), the whole row
      * falls back to the stub's byte slices, which respect the bound by
      * construction and keep the per-row output deterministic.
      */
    override def sampleFrames(r: MediaRow, k: Int, frameBytes: Int): Iterator[Frame] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) DecodeStub.sampleFrames(r, k, frameBytes)
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, false, true)
              // allowSearch=true: counts frames by scanning the (in-
              // memory) stream — exact, and cheap at payload scale
              val total = reader.getNumImages(true)
              if (total < 1) DecodeStub.sampleFrames(r, k, frameBytes)
              else {
                val n = math.min(k, total)
                // strict Vector: frames must be read before the reader
                // is disposed below
                val fit = (0 until n).map { i =>
                  val src = (total.toLong * i / n).toInt
                  encodePngWithin(reader.read(src), frameBytes)
                    .map(Frame(r.media_id, i, _))
                }.toVector
                // all-or-nothing: one unsatisfiable frame drops the row
                // to the stub so the emitted frame set stays a single
                // deterministic family, never a decoded/stub mix
                if (fit.forall(_.isDefined)) fit.flatten.iterator
                else DecodeStub.sampleFrames(r, k, frameBytes)
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => DecodeStub.sampleFrames(r, k, frameBytes) }
  }

  /** Decode features per partition — decoder state initialized once per
    * task, rows streamed through it (never materialize a partition).
    */
  def extractFeatures(media: Dataset[MediaRow],
                      codec: MediaCodec = ImageIoCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      codec.initPerTask()
      rows.map(codec.decode)
    }
  }

  /** Frame sampling with executor-side fan-out — one codec instance per
    * task. The default [[ImageIoCodec]] really decodes multi-image
    * payloads (animated GIF) and falls back to the byte-slice stub for
    * everything else, so non-image corpora (m02) are bit-stable.
    */
  def sampleFrames(media: Dataset[MediaRow], k: Int, frameBytes: Int,
                   codec: MediaCodec = ImageIoCodec): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      codec.initPerTask()
      rows.flatMap(codec.sampleFrames(_, k, frameBytes))
    }
  }

  /** Expression-only metadata pass (no decode): byte length, magic-
    * prefix sniff, checksum. Stays in whole-stage codegen — use this
    * for partition pruning before the expensive decode stage.
    */
  def binaryStats(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("byte_len"),
      md5(col(binCol)).as("checksum"),
      upper(hex(substring(col(binCol), 1, 4))).as("magic"))
}
