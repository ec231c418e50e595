package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.Multimodal

/** Multimodal (binary-column) operators over the deterministic media
  * fixture, each with an exact DuckDB oracle. The oracle reads the SAME
  * parquet payloads and mirrors the byte-level projections (hex-string
  * folds), so blob handling is verified end-to-end: lengths, byte
  * statistics, slicing, window explosion, checksums, hash embeddings.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  private val mediaPq = s"read_parquet('${Multimodal.root}/media/*.parquet')"

  private def media(s: SparkSession): DataFrame = {
    Multimodal.ensure(s)
    s.read.parquet(s"${Multimodal.root}/media")
  }

  val queries: Map[String, Q] = Map(
    // M1: REAL decode feature extraction — image rows run javax.imageio
    // over the fixture's true BMP payloads (pixel sums/min/max + decoded
    // dims vs metadata), audio rows decode as u8 PCM. The oracle
    // recomputes the same statistics from the generator's known byte
    // layout (BMP pixel array at offset 54), so a codec/header bug on
    // either side breaks the hash.
    "mm_m1_decode_stats" -> ((s, _) =>
      Multimodal.withSampleStats(media(s))
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("n_vals")).as("n_vals_total"),
          sum(col("val_sum")).as("val_sum_total"),
          min(col("val_min")).as("val_min"),
          max(col("val_max")).as("val_max"),
          sum(when(col("dec_width") === col("width") &&
                   col("dec_height") === col("height"), 1L).otherwise(0L))
            .as("n_dims_match"))),

    // M2: REAL resize — imageio decode + nearest-neighbor resample to
    // 8x8, exact value sum + order-sensitive fingerprint; the oracle
    // replays the same source-pixel indexing over the raw BMP bytes
    // (bottom-up rows, BGR order).
    "mm_m2_resize" -> ((s, _) =>
      Multimodal.resampled(media(s).filter(col("kind") === "image"), 8, 8)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("out_sum")).as("out_sum_total"),
          sum(col("out_fp")).as("out_fp_total"))),

    // M3: frame/window sampling — audio payloads exploded into 256-byte
    // windows (the UDTF shape of video frame-sampling).
    "mm_m3_audio_windows" -> ((s, _) =>
      Multimodal.audioWindows(media(s), 256)
        .groupBy("sample_rate")
        .agg(
          count(lit(1)).as("n_windows"),
          sum(col("win_bytes")).as("win_bytes_total"),
          countDistinct(col("media_id")).as("n_media"),
          max(col("win_idx")).as("max_win_idx"))),

    // M5: temporal frame sampling — every 4th 256-byte frame with
    // exact per-frame stats (the video-decimation shape; see
    // Multimodal.frameSample).
    "mm_m5_frame_sample" -> ((s, _) =>
      Multimodal.frameSample(media(s), 256, 4)),

    // M4: content-derived embeddings (strided sample sums over the REAL
    // decode — see Multimodal.withEmbedding) + exact top-k by integer
    // dot product — binary rows flowing into the similarity-search
    // operators with features the oracle recomputes from the raw bytes.
    "mm_m4_media_ann" -> ((s, _) => {
      // corpus restricted to the first 400 media ids: the DuckDB oracle
      // replays the embedding per byte PER FEATURE (16x the stream), so
      // the full 2000-row decode-scale fixture would put the ORACLE, not
      // the operator, at quadratic cost; 400 rows keeps the oracle exact
      // and cheap while m1/m2/m3 exercise the full corpus
      val v = Multimodal.withEmbedding(media(s).filter(col("media_id") < 400))
        .select(col("media_id"), col("iv"))
      val probes = v.filter(col("media_id") < 5)
        .select(col("media_id").as("probe_id"), col("iv").as("p_iv"))
      // native codegen dot (same integer as the zip_with fold): the
      // per-PAIR work must never be an interpreted HOF — with `iv`
      // a derived expression, CollapseProject can inline the whole
      // embedding derivation into each pair evaluation (the r15
      // expression-shape rule from the AnnProbe grid, DESIGN.md)
      val scored = v.join(broadcast(probes), col("media_id") =!= col("probe_id"))
        .withColumn("dot",
          graft.expressions.DotProductL(col("iv"), col("p_iv")))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("dot").desc, col("media_id").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("probe_id"), col("rank"),
          col("media_id").as("neighbor_id"), col("dot"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Image sample values = BMP pixel-array bytes at offset 54 (24bpp,
    // width % 4 == 0 => no row padding); audio sample values = payload
    // bytes. n_dims_match is count(*) here BY CONSTRUCTION (the header
    // encodes the metadata dims) — the Spark side derives it from the
    // actual imageio decode, which is the check.
    "mm_m1_decode_stats" ->
      s"""WITH d AS (
            SELECT kind, width, height, payload,
                   CASE WHEN kind = 'image' THEN 54 ELSE 0 END AS off
            FROM $mediaPq),
          v AS (
            SELECT kind,
                   CAST(octet_length(payload) - off AS BIGINT) AS n_vals,
                   list_transform(range(octet_length(payload) - off),
                     i -> CAST('0x' || substr(hex(payload),
                            CAST(2*(i+off)+1 AS INT), 2) AS INT)) AS vals
            FROM d)
          SELECT kind, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(n_vals) AS BIGINT) AS n_vals_total,
                 CAST(sum(list_sum(vals)) AS BIGINT) AS val_sum_total,
                 min(list_min(vals)) AS val_min,
                 max(list_max(vals)) AS val_max,
                 CAST(count(*) AS BIGINT) AS n_dims_match
          FROM v GROUP BY 1""",

    // Nearest-neighbor indexing replayed over the raw BMP layout:
    // output (y, x) [y top-down] samples source (x*W//8, y*H//8);
    // BMP rows are stored bottom-up, 3 bytes/pixel in BGR order, so the
    // byte offset of channel c is 54 + ((H-1-sy)*W + sx)*3 + c.
    "mm_m2_resize" ->
      s"""WITH r AS (
            SELECT media_id,
                   list_transform(range(192), i ->
                     CAST('0x' || substr(hex(payload),
                       CAST(2*(54 + ((height - 1 - (((i//3)//8) * height) // 8)
                                       * width
                                     + (((i//3)%8) * width) // 8) * 3
                               + (i%3)) + 1 AS INT), 2) AS INT)) AS vals
            FROM $mediaPq WHERE kind = 'image')
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(list_sum(vals)) AS BIGINT) AS out_sum_total,
                 CAST(sum(list_sum(list_transform(range(192),
                   i -> CAST(vals[i+1] AS BIGINT) * (i+1)))) AS BIGINT)
                   AS out_fp_total
          FROM r""",

    "mm_m3_audio_windows" ->
      s"""WITH w AS (
            SELECT media_id, sample_rate, CAST(wi.i AS INTEGER) AS win_idx,
                   CAST(len(substring(hex(payload), CAST(wi.i * 512 + 1 AS INT), 512)) // 2 AS BIGINT) AS win_bytes
            FROM $mediaPq,
                 LATERAL (SELECT unnest(range(CAST(ceil(octet_length(payload) / 256.0) AS INT))) AS i) wi
            WHERE kind = 'audio')
          SELECT sample_rate, CAST(count(*) AS BIGINT) AS n_windows,
                 CAST(sum(win_bytes) AS BIGINT) AS win_bytes_total,
                 CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
                 max(win_idx) AS max_win_idx
          FROM w GROUP BY 1""",

    // Frame-sampling mirror: same window arithmetic as m3, stride
    // filter on the window index, per-frame byte folds from the hex
    // encoding.
    "mm_m5_frame_sample" ->
      s"""WITH w AS (
            SELECT media_id, sample_rate, CAST(wi.i AS INTEGER) AS win_idx,
                   substring(hex(payload), CAST(wi.i * 512 + 1 AS INT), 512)
                     AS hx
            FROM $mediaPq,
                 LATERAL (SELECT unnest(range(CAST(
                   ceil(octet_length(payload) / 256.0) AS INT))) AS i) wi
            WHERE kind = 'audio' AND wi.i % 4 = 0),
          v AS (
            SELECT media_id, sample_rate, win_idx,
                   list_transform(range(len(hx) // 2), j ->
                     CAST('0x' || substr(hx, CAST(2*j + 1 AS INT), 2)
                       AS INT)) AS vals
            FROM w)
          SELECT media_id, sample_rate, win_idx,
                 CAST(len(vals) AS BIGINT) AS frame_bytes,
                 CAST(list_sum(vals) AS BIGINT) AS frame_sum,
                 list_min(vals) AS frame_min,
                 list_max(vals) AS frame_max
          FROM v""",

    // Embedding replayed from the generator byte layout: image sample
    // stream position i maps to pixel (i//3) in (y top-down, x) order
    // with channel i%3 (BGR) — BMP rows stored bottom-up, pixel array at
    // offset 54 — audio stream = payload bytes; feature k sums stream
    // positions ≡ k (mod 16).
    "mm_m4_media_ann" ->
      s"""WITH v AS (
            SELECT media_id,
                   CASE WHEN kind = 'image' THEN
                     list_transform(range(16), k ->
                       CAST(list_sum(list_transform(range(3*width*height), i ->
                         CASE WHEN i % 16 = k THEN
                           CAST('0x' || substr(hex(payload),
                             CAST(2*(54 + ((height - 1 - (i//3)//width) * width
                                           + (i//3)%width) * 3 + (i%3)) + 1
                                  AS INT), 2) AS BIGINT)
                         ELSE 0 END)) AS BIGINT))
                   ELSE
                     list_transform(range(16), k ->
                       CAST(list_sum(list_transform(range(octet_length(payload)), i ->
                         CASE WHEN i % 16 = k THEN
                           CAST('0x' || substr(hex(payload),
                             CAST(2*i + 1 AS INT), 2) AS BIGINT)
                         ELSE 0 END)) AS BIGINT))
                   END AS iv
            FROM $mediaPq WHERE media_id < 400),
          scored AS (
            SELECT p.media_id AS probe_id, c.media_id AS neighbor_id,
                   CAST(list_sum(list_transform(list_zip(c.iv, p.iv),
                     z -> z[1] * z[2])) AS BIGINT) AS dot
            FROM v c JOIN v p ON p.media_id < 5 AND c.media_id <> p.media_id),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY probe_id
                                         ORDER BY dot DESC, neighbor_id ASC) AS rank
            FROM scored)
          SELECT probe_id, CAST(rank AS BIGINT) AS rank, neighbor_id, dot
          FROM ranked WHERE rank <= 3"""
  )
}
