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

  /** DuckDB: payload bytes as an INT list (mirror of
    * Multimodal.byteValues).
    */
  private val bytesSql =
    """list_transform(range(octet_length(payload)),
         i -> CAST('0x' || substr(hex(payload), CAST(2*i+1 AS INT), 2) AS INT))"""

  val queries: Map[String, Q] = Map(
    // M1: decode-stub feature extraction — byte statistics + checksum
    // per media kind (scan-speed projection, no shuffle).
    "mm_m1_decode_stats" -> ((s, _) =>
      Multimodal.withDecodeStats(media(s))
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("n_bytes")).as("bytes_total"),
          sum(col("byte_sum")).as("byte_sum_total"),
          min(col("byte_min")).as("byte_min"),
          max(col("byte_max")).as("byte_max"),
          countDistinct(col("checksum")).as("n_distinct"))),

    // M2: resize-stub — payload clamped to an 8x8xC budget, metadata
    // rewritten, content re-checksummed.
    "mm_m2_resize" -> ((s, _) =>
      Multimodal.resized(media(s).filter(col("kind") === "image"), 8, 8)
        .groupBy("channels")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("out_bytes")).as("out_bytes_total"),
          sum(when(col("out_bytes") < col("n_samples"), 1L).otherwise(0L))
            .as("n_truncated"),
          countDistinct(col("out_checksum")).as("n_distinct"))),

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

    // M4: embedding-stub + exact top-k by integer dot product — binary
    // rows flowing into the similarity-search operators.
    "mm_m4_media_ann" -> ((s, _) => {
      val v = Multimodal.withEmbedding(media(s))
        .select(col("media_id"), col("iv"))
      val probes = v.filter(col("media_id") < 5)
        .select(col("media_id").as("probe_id"), col("iv").as("p_iv"))
      val scored = v.join(broadcast(probes), col("media_id") =!= col("probe_id"))
        .withColumn("dot", aggregate(zip_with(col("iv"), col("p_iv"),
          (x, y) => x * y), lit(0L), (a, t) => a + t))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("dot").desc, col("media_id").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("probe_id"), col("rank"),
          col("media_id").as("neighbor_id"), col("dot"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "mm_m1_decode_stats" ->
      s"""WITH d AS (
            SELECT kind, octet_length(payload) AS n_bytes,
                   CAST(list_sum($bytesSql) AS BIGINT) AS byte_sum,
                   list_min($bytesSql) AS byte_min,
                   list_max($bytesSql) AS byte_max,
                   md5(hex(payload)) AS checksum
            FROM $mediaPq)
          SELECT kind, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(n_bytes) AS BIGINT) AS bytes_total,
                 CAST(sum(byte_sum) AS BIGINT) AS byte_sum_total,
                 min(byte_min) AS byte_min, max(byte_max) AS byte_max,
                 CAST(count(DISTINCT checksum) AS BIGINT) AS n_distinct
          FROM d GROUP BY 1""",

    "mm_m2_resize" ->
      s"""WITH r AS (
            SELECT channels, octet_length(payload) AS n_samples,
                   least(CAST(octet_length(payload) AS BIGINT),
                         CAST(64 * channels AS BIGINT)) AS out_bytes,
                   md5(substring(hex(payload), 1,
                     CAST(least(CAST(octet_length(payload) AS BIGINT),
                                CAST(64 * channels AS BIGINT)) * 2 AS INT)))
                     AS out_checksum
            FROM $mediaPq WHERE kind = 'image')
          SELECT channels, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(out_bytes) AS BIGINT) AS out_bytes_total,
                 CAST(count(*) FILTER (out_bytes < n_samples) AS BIGINT) AS n_truncated,
                 CAST(count(DISTINCT out_checksum) AS BIGINT) AS n_distinct
          FROM r GROUP BY 1""",

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

    "mm_m4_media_ann" ->
      s"""WITH v AS (
            SELECT media_id,
                   [CAST('0x' || substring(md5(md5(hex(payload)) || '|' || i), 1, 15) AS BIGINT)
                      % 20001 - 10000 for i in range(16)] AS iv
            FROM $mediaPq),
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
