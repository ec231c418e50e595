package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage

/** Binary-column plumbing + REAL codec tests with hand-computed
  * expectations (the BMPs here are encoded by javax.imageio itself, so
  * the decode path is exercised against an independent encoder, not
  * just the fixture generator's byte layout).
  */
class MultimodalSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def payloadDf(bytes: Array[Byte], kind: String = "audio",
                        w: Int = 0, h: Int = 0) =
    Seq((1L, bytes, kind, w, h, 3, 8000)).toDF(
      "media_id", "payload", "kind", "width", "height", "channels",
      "sample_rate")

  private def bmpBytes(img: BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  test("audio sample stats (u8 PCM) on a known payload") {
    val r = Multimodal.withSampleStats(
      payloadDf(Array[Byte](0x00, 0x7F, -1))) // 0, 127, 255
      .collect()(0)
    assert(r.getAs[Long]("n_vals") == 3)
    assert(r.getAs[Long]("val_sum") == 0 + 127 + 255)
    assert(r.getAs[Int]("val_min") == 0)
    assert(r.getAs[Int]("val_max") == 255)
  }

  test("real BMP decode: imageio stats match hand-set pixels") {
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) // r = 10x, g = 20y, b = 5
      img.setRGB(x, y, (x * 10 << 16) | (y * 20 << 8) | 5)
    val r = Multimodal.withSampleStats(
      payloadDf(bmpBytes(img), kind = "image", w = 4, h = 2)).collect()(0)
    assert(r.getAs[Int]("dec_width") == 4 && r.getAs[Int]("dec_height") == 2)
    assert(r.getAs[Long]("n_vals") == 24)
    val expected = (for (y <- 0 until 2; x <- 0 until 4)
      yield x * 10 + y * 20 + 5).sum
    assert(r.getAs[Long]("val_sum") == expected)
    assert(r.getAs[Int]("val_min") == 0)  // r of x=0 / g of y=0
    assert(r.getAs[Int]("val_max") == 30) // r of x=3
  }

  test("fixture BMPs decode with dims matching their metadata") {
    Multimodal.ensure(spark)
    val m = spark.read.parquet(s"${Multimodal.root}/media")
      .filter(col("kind") === "image")
    val st = Multimodal.withSampleStats(m)
    assert(st.filter(col("dec_width").isNull).count() == 0,
      "a fixture image failed to decode")
    assert(st.filter(col("dec_width") =!= col("width") ||
      col("dec_height") =!= col("height")).count() == 0,
      "decoded dims diverge from metadata")
  }

  test("nearest-neighbor resample to 8x8: quadrant duplication, exact sums") {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    val px = Seq( // (x, y, r, g, b)
      (0, 0, 1, 2, 3), (1, 0, 4, 5, 6), (0, 1, 7, 8, 9), (1, 1, 10, 11, 12))
    px.foreach { case (x, y, r, g, b) => img.setRGB(x, y, (r << 16) | (g << 8) | b) }
    val row = Multimodal.resampled(
      payloadDf(bmpBytes(img), kind = "image", w = 2, h = 2), 8, 8).collect()(0)
    // each source pixel fills a 4x4 quadrant: sum = 16 * Σ(r+g+b)
    assert(row.getAs[Long]("out_sum") == 16L * px.map(p => p._3 + p._4 + p._5).sum)
    // fingerprint: replay the (y, x, BGR) traversal
    var i = 0L; var fp = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val (_, _, r, g, b) = px.find(p => p._1 == x / 4 && p._2 == y / 4).get
      for (v <- Seq(b, g, r)) { i += 1; fp += v.toLong * i }
    }
    assert(row.getAs[Long]("out_fp") == fp)
  }

  test("audio windows tile the payload exactly, ragged tail included") {
    val p = Array.tabulate[Byte](600)(i => i.toByte)
    val w = Multimodal.audioWindows(payloadDf(p), 256)
      .orderBy("win_idx").collect()
    assert(w.length == 3) // 256 + 256 + 88
    assert(w.map(_.getAs[Long]("win_bytes")).toSeq == Seq(256L, 256L, 88L))
    assert(w.map(_.getAs[Int]("win_idx")).toSeq == Seq(0, 1, 2))
  }

  test("content embedding, audio: strided sums of PCM bytes") {
    // stream = payload bytes; feature k sums positions ≡ k (mod 16)
    val p = Array.tabulate[Byte](20)(i => (i + 1).toByte) // 1..20
    val iv = Multimodal.withEmbedding(payloadDf(p)).select("iv")
      .as[Seq[Long]].collect()(0)
    assert(iv.length == 16)
    // k=0..3 see positions {k, k+16}: (k+1) + (k+17); k=4..15 just k+1
    val expected = (0 until 16).map(k => if (k < 4) 2L * k + 18 else k + 1L)
    assert(iv == expected)
  }

  test("content embedding, image: strided sums over the decoded (y,x,BGR) stream") {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    val px = Seq( // (x, y, r, g, b)
      (0, 0, 1, 2, 3), (1, 0, 4, 5, 6), (0, 1, 7, 8, 9), (1, 1, 10, 11, 12))
    px.foreach { case (x, y, r, g, b) => img.setRGB(x, y, (r << 16) | (g << 8) | b) }
    val iv = Multimodal.withEmbedding(
      payloadDf(bmpBytes(img), kind = "image", w = 2, h = 2)).select("iv")
      .as[Seq[Long]].collect()(0)
    val acc = new Array[Long](16)
    var i = 0
    for (y <- 0 until 2; x <- 0 until 2) {
      val (_, _, r, g, b) = px.find(p => p._1 == x && p._2 == y).get
      for (v <- Seq(b, g, r)) { acc(i % 16) += v; i += 1 }
    }
    assert(iv == acc.toSeq)
  }

  test("frame sampling keeps every Nth frame with exact per-frame stats") {
    // 10 bytes, 4-byte frames -> windows [0,10,20,30] [40..70] [80,90];
    // stride 2 keeps indices 0 and 2
    val bytes = Array.tabulate(10)(i => (i * 10).toByte)
    val r = Multimodal.frameSample(payloadDf(bytes), 4, 2)
      .orderBy("win_idx")
      .select("win_idx", "frame_bytes", "frame_sum", "frame_min", "frame_max")
      .collect()
    assert(r.length == 2)
    assert(r(0).getInt(0) == 0 && r(0).getLong(1) == 4 &&
      r(0).getLong(2) == 60 && r(0).getInt(3) == 0 && r(0).getInt(4) == 30)
    assert(r(1).getInt(0) == 2 && r(1).getLong(1) == 2 &&
      r(1).getLong(2) == 170 && r(1).getInt(3) == 80 && r(1).getInt(4) == 90)
  }

  test("content embedding is content-SENSITIVE: one byte moves a feature") {
    val a = Multimodal.withEmbedding(payloadDf(Array[Byte](1, 2, 3)))
      .select("iv").as[Seq[Long]].collect()(0)
    val b = Multimodal.withEmbedding(payloadDf(Array[Byte](1, 9, 3)))
      .select("iv").as[Seq[Long]].collect()(0)
    assert(a != b)
    assert(a.zip(b).count { case (x, y) => x != y } == 1) // only k=1 moved
  }
}
