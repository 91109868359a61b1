package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  def media(n: Int): Seq[MediaRow] =
    (1 to n).map { i =>
      MediaRow(i.toLong, if (i % 2 == 0) "image" else "audio",
        Array.tabulate(100 + i * 13)(j => ((i * 31 + j) % 256).toByte))
    }

  test("feature extraction is deterministic and partition-parallel") {
    import spark.implicits._
    val ds = spark.createDataset(media(20)).repartition(4)
    val f1 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)              // stub decode is deterministic
    assert(f1.length == 20)
    assert(f1.forall(f => f.width >= 1 && f.width <= 1920))
    assert(f1.forall(f => f.byte_len > 100))
  }

  test("ImageIoCodec decodes real PNG/BMP dimensions, falls back for opaque bytes") {
    import spark.implicits._
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
      baos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "image", imageBytes("png", 37, 23)),
      MediaRow(2L, "image", imageBytes("bmp", 64, 8)),
      MediaRow(3L, "audio", Array.tabulate(257)(i => (i * 7 % 256).toByte)))
    val ds = spark.createDataset(rows).repartition(2)
    val got = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    // real pixel-header dimensions, decoded in executors
    assert(got(0).width == 37 && got(0).height == 23)
    assert(got(1).width == 64 && got(1).height == 8)
    // non-image payload: deterministic stub fallback, not a task failure
    assert(got(2) == Multimodal.DecodeStub.decode(rows(2)))
    // checksum covers the raw payload on both paths
    assert(got(0).checksum == java.security.MessageDigest.getInstance("MD5")
      .digest(rows(0).payload).map("%02x".format(_)).mkString)
  }

  test("frame sampling fans out on executors with bounded k") {
    import spark.implicits._
    val ds = spark.createDataset(media(6))
    val frames = Multimodal.sampleFrames(ds, k = 4, frameBytes = 50).collect()
    assert(frames.nonEmpty)
    assert(frames.groupBy(_.media_id).values.forall(_.length <= 4))
    assert(frames.forall(_.frame_bytes.length <= 50))
  }

  test("multi-frame GIF payloads are REALLY decoded: sampled frames carry exact per-frame pixels") {
    import spark.implicits._
    // in-test animated GIF: 5 full-size frames, solid primary colors
    // (exact under GIF palette quantization), written with the JDK's
    // own sequence writer — no external deps, like ImageIoCodec itself
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val (w, h) = (12, 7)
    def frame(rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    assert(writer.canWriteSequence, "JDK GIF writer must support sequences")
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach(c => writer.writeToSequence(
      new javax.imageio.IIOImage(frame(c), null, null), null))
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = bos.toByteArray

    // frameBytes generous enough that 12x7 PNGs fit un-downscaled (the
    // bound is HARD on the decoded path; a bound no PNG can satisfy
    // drops the row to the stub — covered by the dedicated bound test)
    val ds = spark.createDataset(Seq(MediaRow(7L, "video", gif)))
    val got = Multimodal.sampleFrames(ds, k = 3, frameBytes = 4096)
      .collect().sortBy(_.frame_idx)
    // min(k=3, 5 frames) evenly spaced: source frames 0, 1, 3
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    val expected = Seq(0, 1, 3).map(colors)
    got.zip(expected).foreach { case (f, rgb) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame_bytes))
      assert(img != null, "sampled frame must be a decodable image")
      assert(img.getWidth == w && img.getHeight == h,
        s"frame ${f.frame_idx}: got ${img.getWidth}x${img.getHeight}")
      assert((img.getRGB(0, 0) & 0xffffff) == rgb,
        f"frame ${f.frame_idx}: pixel 0x${img.getRGB(0, 0) & 0xffffff}%06x != 0x$rgb%06x")
    }
    // non-image payloads keep the deterministic stub path bit-for-bit
    // (m02's oracle hash depends on it)
    val opaque = MediaRow(8L, "audio", Array.tabulate(300)(i => (i % 251).toByte))
    val viaCodec = Multimodal.sampleFrames(
      spark.createDataset(Seq(opaque)), k = 4, frameBytes = 64)
      .collect().sortBy(_.frame_idx)
    val viaStub = Multimodal.DecodeStub.sampleFrames(opaque, 4, 64).toSeq
    assert(viaCodec.map(f => (f.frame_idx, f.frame_bytes.toSeq)).toSeq ==
      viaStub.map(f => (f.frame_idx, f.frame_bytes.toSeq)))
  }

  test("frameBytes is a HARD per-frame bound on the real-decode path") {
    import spark.implicits._
    // noisy 180x110 frame: per-pixel varying colors so the PNG encodes
    // to well over the bound and the codec must downscale to comply
    val (w, h) = (180, 110)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 9973 + y * 131071) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    assert(png.length > 2048, s"test image must exceed the bound (${png.length})")

    val ds = spark.createDataset(Seq(MediaRow(9L, "image", png)))
    val bound = 2048
    val frames = Multimodal.sampleFrames(ds, k = 2, frameBytes = bound).collect()
    assert(frames.length == 1) // single-image payload: one frame
    val f = frames.head
    assert(f.frame_bytes.length <= bound,
      s"decoded frame ${f.frame_bytes.length} bytes exceeds frameBytes=$bound")
    // still a REAL image after downscale-to-fit, just smaller
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(f.frame_bytes))
    assert(back != null, "bounded frame must still decode as an image")
    assert(back.getWidth >= 1 && back.getWidth < w)
    assert(back.getHeight >= 1 && back.getHeight < h)

    // a bound no PNG can satisfy (below container overhead): the whole
    // row falls back to the stub's byte slices, which respect the bound
    // by construction and stay deterministic
    val tiny = Multimodal.sampleFrames(ds, k = 2, frameBytes = 40)
      .collect().sortBy(_.frame_idx)
    val stub = Multimodal.DecodeStub
      .sampleFrames(MediaRow(9L, "image", png), 2, 40).toSeq
    assert(tiny.map(f => (f.frame_idx, f.frame_bytes.toSeq)).toSeq ==
      stub.map(f => (f.frame_idx, f.frame_bytes.toSeq)))
    assert(tiny.forall(_.frame_bytes.length <= 40))
  }

  test("binaryStats exposes magic prefix without decoding") {
    import spark.implicits._
    val df = spark.createDataset(media(3)).toDF()
    val stats = Multimodal.binaryStats(df, "media_id", "payload").collect()
    assert(stats.length == 3)
    assert(stats.forall(_.getAs[String]("magic").length == 8)) // 4 bytes hex
  }
}
