package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-column plumbing tests with hand-computed expectations. */
class MultimodalSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def payloadDf(bytes: Array[Byte]) =
    Seq((1L, bytes, "audio", 3, 8000)).toDF(
      "media_id", "payload", "kind", "channels", "sample_rate")

  test("byteValues + decode stats on a known payload") {
    val r = Multimodal.withDecodeStats(
      payloadDf(Array[Byte](0x00, 0x7F, -1))) // 0, 127, 255
      .collect()(0)
    assert(r.getAs[Long]("n_bytes") == 3)
    assert(r.getAs[Long]("byte_sum") == 0 + 127 + 255)
    assert(r.getAs[Int]("byte_min") == 0)
    assert(r.getAs[Int]("byte_max") == 255)
  }

  test("resize clamps to the pixel budget and re-checksums the prefix") {
    val big = Array.tabulate[Byte](500)(i => (i % 251).toByte)
    val r = Multimodal.resized(payloadDf(big), 8, 8).collect()(0)
    assert(r.getAs[Long]("out_bytes") == 8 * 8 * 3) // 192 < 500
    assert(r.getAs[Array[Byte]]("out_payload").length == 192)
    // small payloads pass through whole
    val small = Array.tabulate[Byte](10)(_.toByte)
    val r2 = Multimodal.resized(payloadDf(small), 8, 8).collect()(0)
    assert(r2.getAs[Long]("out_bytes") == 10)
  }

  test("audio windows tile the payload exactly, ragged tail included") {
    val p = Array.tabulate[Byte](600)(i => i.toByte)
    val w = Multimodal.audioWindows(payloadDf(p), 256)
      .orderBy("win_idx").collect()
    assert(w.length == 3) // 256 + 256 + 88
    assert(w.map(_.getAs[Long]("win_bytes")).toSeq == Seq(256L, 256L, 88L))
    assert(w.map(_.getAs[Int]("win_idx")).toSeq == Seq(0, 1, 2))
  }

  test("embedding stub: deterministic, dim 16, bounded coefficients") {
    val df = payloadDf(Array[Byte](1, 2, 3))
    val iv1 = Multimodal.withEmbedding(df).select("iv")
      .as[Seq[Long]].collect()(0)
    val iv2 = Multimodal.withEmbedding(df).select("iv")
      .as[Seq[Long]].collect()(0)
    assert(iv1 == iv2)
    assert(iv1.length == 16)
    assert(iv1.forall(v => v >= -10000 && v <= 10000))
  }
}
