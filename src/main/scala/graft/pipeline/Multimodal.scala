package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Multimodal (binary) column operators for training-data pipelines:
  * opaque image/audio payloads as `binary` columns with typed metadata,
  * plus decode / feature-extract / resize / frame-sample / embed stages.
  *
  * STUB NOTICE: this container ships no image/audio codecs, so the
  * decode step is a clearly-marked DETERMINISTIC FAKE — "pixel"
  * statistics are computed over the raw payload bytes and "embeddings"
  * are hash-derived. Everything else — the binary fixture, schemas,
  * partitioning, slicing, window explosion, join shapes — is the real
  * pipeline a codec-backed decoder would drop into (swap [[byteValues]]
  * for the codec call).
  *
  * Everything is native Catalyst (hex/substring/transform folds — no
  * UDFs): per-row projections run at scan speed inside whole-stage
  * codegen, so at 100 TB decode-stat extraction is embarrassingly
  * parallel and shuffle-free; only the ANN stage shuffles (top-k
  * window over broadcast-joined probes).
  */
object Multimodal {

  val root = "/root/repo/fixtures/media"

  /** Deterministic synthetic media fixture: 400 rows, variable-length
    * md5-chain payloads (200–999 bytes), image/audio metadata.
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (!Files.exists(Paths.get(s"$root/media/_SUCCESS"))) generate(spark)
  }

  def generate(spark: SparkSession): Unit = {
    import spark.implicits._
    val ids = (0 until 400).toDF("media_id")
    val h = xxhash64(lit("media"), col("media_id"))
    val len = (pmod(h, lit(800L)) + 200L).cast("int")
    // payload = first `len` bytes of an md5 chain keyed by (id, block)
    val nBlocks = 63 // 63 * 16 bytes = 1008 >= 999
    val hexChain = concat_ws("",
      (0 until nBlocks).map(j => md5(concat(col("media_id"), lit(s"|$j")))): _*)
    val media = ids
      .withColumn("kind",
        when(pmod(h, lit(3L)) < 2, "image").otherwise("audio"))
      .withColumn("payload", unhex(hexChain.substr(lit(1), len * 2)))
      .withColumn("width", (pmod(xxhash64(lit("w"), col("media_id")), lit(56L)) + 8L).cast("int"))
      .withColumn("height", (pmod(xxhash64(lit("h"), col("media_id")), lit(56L)) + 8L).cast("int"))
      .withColumn("channels", lit(3))
      .withColumn("sample_rate",
        when(pmod(xxhash64(lit("sr"), col("media_id")), lit(2L)) === 0, 8000)
          .otherwise(16000))
      .withColumn("n_samples", length(col("payload")))
    media.repartition(4).write.mode("overwrite").parquet(s"$root/media")
  }

  /** Raw payload bytes as an INT array (0–255) via the hex projection —
    * the swap-point for a real codec. Native expressions only.
    */
  def byteValues(payload: Column): Column = {
    val hexc = hex(payload)
    transform(sequence(lit(0), length(payload) - 1),
      i => conv(hexc.substr(i * 2 + 1, lit(2)), 16, 10).cast("int"))
  }

  /** Decode-stub statistics: byte count/sum/min/max + content checksum.
    * Checksums hash the UPPERCASE hex encoding (not the raw blob) so the
    * DuckDB oracle — whose md5 is varchar-only — mirrors them exactly.
    */
  def withDecodeStats(df: DataFrame): DataFrame = {
    val bv = byteValues(col("payload"))
    df.withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("byte_sum",
        aggregate(bv, lit(0L), (a, x) => a + x))
      .withColumn("byte_min", array_min(bv))
      .withColumn("byte_max", array_max(bv))
      .withColumn("checksum", md5(hex(col("payload"))))
  }

  /** Resize-stub: clamp the payload to the target pixel budget and
    * rewrite the metadata (a real resample keeps this exact shape).
    */
  def resized(df: DataFrame, w: Int, h: Int): DataFrame = {
    val budget = lit(w * h) * col("channels")
    df.withColumn("out_width", lit(w))
      .withColumn("out_height", lit(h))
      .withColumn("out_bytes", least(length(col("payload")).cast("long"), budget.cast("long")))
      .withColumn("out_payload",
        unhex(hex(col("payload")).substr(lit(1), budget * 2)))
      .withColumn("out_checksum", md5(hex(col("payload")).substr(lit(1), col("out_bytes") * 2)))
  }

  /** Frame/window sampling: explode audio payloads into fixed-size
    * windows (UDTF shape — one row per window, batch-friendly).
    */
  def audioWindows(df: DataFrame, windowBytes: Int): DataFrame =
    df.filter(col("kind") === "audio")
      .select(col("media_id"), col("sample_rate"), col("payload"),
        posexplode(sequence(lit(0),
          ceil(length(col("payload")) / lit(windowBytes.toDouble)).cast("int") - 1))
          .as(Seq("win_idx", "_w")))
      .withColumn("win_payload", unhex(hex(col("payload"))
        .substr(col("win_idx") * (2 * windowBytes) + 1, lit(2 * windowBytes))))
      .withColumn("win_bytes", length(col("win_payload")).cast("long"))
      .drop("_w", "payload")

  /** Embedding-stub: hash-derived integer vector keyed by the payload
    * checksum — plugs multimodal rows straight into the ANN operators.
    */
  def withEmbedding(df: DataFrame, dim: Int = 16): DataFrame =
    df.withColumn("iv", transform(sequence(lit(0), lit(dim - 1)),
      k => TextOps.hash60(concat(md5(hex(col("payload"))), lit("|"), k)) % 20001L - 10000L))
}
