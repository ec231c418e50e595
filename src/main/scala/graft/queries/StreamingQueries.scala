package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming entries (extension beyond reference parity —
  * SURVEY §2.9/§7.4): the SAME tumbling-window aggregation the batch
  * engine grades, executed by the streaming engine end-to-end (file
  * stream source → event-time window → memory sink), then hash-checked
  * against a batch DuckDB oracle. Proves the streaming path computes
  * identical answers, not just that it runs.
  *
  * Exactness: `value` lives on a 1/100 grid → integer-lifted sums;
  * event timestamps are parquet micros (TIMESTAMP_NTZ, UTC-pinned
  * session) → window assignment is exact micro-grain arithmetic on
  * both engines.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Probe-sink dirs (data + checkpoint) registered for JVM-exit
    * cleanup: the returned frame lazily reads `$dir/out`, so the dir
    * must outlive the entry — but unlike every other streaming temp
    * dir it has no in-entry rm() point. Probe runs are
    * one-entry-per-JVM (the probe discipline), so a shutdown hook
    * bounds the residue at one corpus-sized dir per process instead of
    * accumulating across suite runs under /tmp.
    */
  private val probeSinkDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val probeSinkHookInstalled: Boolean = {
    def rmRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmRec)); f.delete(); ()
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var f = probeSinkDirs.poll()
      while (f != null) { rmRec(f); f = probeSinkDirs.poll() }
    }))
    true
  }

  /** Run `stream` to completion into a memory sink and return the sink
    * table MATERIALIZED as a local frame (the temp view dies when the
    * entry re-runs) — the tail every streaming entry shares.
    */
  private def sinkToLocal(s: SparkSession, name: String,
      stream: DataFrame, mode: String): DataFrame = {
    // PROBE-ONLY file sink (GRAFT_STREAM_PROBE_SINK=parquet, append
    // mode only): the memory sink accumulates every emitted row on the
    // driver, so at the 100× st10 probe the HARNESS heap (~12.9 M
    // boxed rows into 8 GB) becomes the wall long before the engine's
    // horizon-bounded state does — measured: old-gen pinned at 100%
    // while state held steady at 216 MB. A parquet sink streams output
    // straight to disk, which is also what a production deployment of
    // the append-mode kernel would do.
    if (sys.env.get("GRAFT_STREAM_PROBE_SINK").contains("parquet")
        && mode == "append") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_probe_sink").toFile
      require(probeSinkHookInstalled); probeSinkDirs.add(dir)
      val q = stream.writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(mode).start()
      try q.processAllAvailable()
      finally q.stop()
      return s.read.parquet(s"$dir/out")
    }
    s.catalog.dropTempView(name)
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable()
    finally q.stop()
    if (sys.env.contains("GRAFT_STREAM_PROBE_SINK"))
      // PROBE-ONLY override (scale probes, never the graded/oracle
      // path): hand back the sink-backed view itself — the caller's
      // same-pass action (Bench's noop write) runs over it in-engine,
      // so the probe measures the state machinery, not a driver-side
      // collect + re-createDataFrame of the full sink (1.29 M boxed
      // rows for st2 at 10×, 5–7 s of GC per pass billed to the state
      // measurement). The graded path keeps the materializing collect
      // because the temp view dies when the entry re-runs.
      s.table(name)
    else {
      val out = s.table(name).collect()
      s.createDataFrame(
        java.util.Arrays.asList(out: _*), s.table(name).schema)
    }
  }

  /** Stage `df` as `nFiles` parquet files in a fresh temp dir and open
    * a one-file-per-micro-batch stream over them; returns the stream
    * and a cleanup thunk. The multi-batch split is the point: state
    * must MERGE across triggers, not just aggregate within one.
    */
  private def stagedFileStream(s: SparkSession, df: DataFrame,
      nFiles: Int): (DataFrame, () => Unit) = {
    import java.io.File
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_stream").toFile
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    // callers' try/finally only covers the post-return path — if the
    // staging write or the file moves throw, delete tmp here first
    try {
      val streamDir = new File(tmp, "stream"); streamDir.mkdirs()
      val staging = new File(tmp, "staging")
      // 2 MB row groups: a staged slice is ONE file per micro-batch,
      // and parquet can't split below a row group — with the default
      // 128 MB group every batch scanned on a single task at probe
      // scale (st13 100x: cpu/wall 1.3 before, saturated after)
      df.repartition(nFiles).write
        .option("parquet.block.size", 2L * 1024 * 1024)
        .parquet(staging.getAbsolutePath)
      staging.listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          Files.move(f.toPath,
            new File(streamDir, f"$i%03d_part.parquet").toPath)
        }
      val src = s.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.getAbsolutePath)
      (src, () => rm(tmp))
    } catch { case e: Throwable => rm(tmp); throw e }
  }

  /** Stage the events table as `n` TIME-ORDERED parquet slices plus a
    * trailing per-user `__flush` sentinel file (far-future ts, so it
    * sorts last within its group) under `tmp`/stream, mtime-ordered so
    * the file source streams them in time order. The global sort is
    * harness staging only — the streamed plan never sorts across
    * users. Shared by the flush-sentinel stateful entries (st8/st9).
    */
  private def stageTimeOrderedSlices(s: SparkSession, ev: DataFrame,
      tmp: java.io.File, n: Int): java.io.File = {
    import java.io.File
    import java.nio.file.Files
    val streamDir = new File(tmp, "stream"); streamDir.mkdirs()
    val nWritten = stageSlicedByTs(ev, tmp, n, streamDir)
    val sentinel = ev.select(col("user_id")).distinct()
      .select(
        lit(-1L).as("event_id"),
        lit(java.time.LocalDateTime.of(9000, 1, 1, 0, 0)).as("ts"),
        col("user_id"),
        lit("__flush").as("event_type"),
        lit(0.0).as("value"),
        lit(null).cast("string").as("props"))
    val fstage = new File(tmp, "staging_flush")
    sentinel.coalesce(1).write.parquet(fstage.getAbsolutePath)
    val ff = fstage.listFiles().filter(_.getName.endsWith(".parquet")).head
    val fdst = new File(streamDir, f"${nWritten + 1}%03d_flush.parquet")
    Files.move(ff.toPath, fdst.toPath)
    fdst.setLastModified(1000000L * (nWritten + 1))
    streamDir
  }

  /** Boundary-CASE slice staging (the st10 shape, DESIGN.md): slice
    * assignment is a CASE on distributed ts-quantile bounds, and ALL
    * slices land in one scan + one partitioned write (repartition on
    * gslice ⇒ one file per slice; 2 MB row groups so staged slices
    * stay splittable, the r11 rule). The ntile-over-one-Window staging
    * this replaces pushed the whole table through a single sort task —
    * the exact shape st10's comment condemns — and then re-scanned it
    * once per slice for the filtered writes. Slices stay
    * TIME-CONTIGUOUS (slice i holds bound(i-1) < ts <= bound(i), so a
    * later file never carries an earlier timestamp — the arrival-order
    * contract); within-slice row order is free because every stateful
    * consumer sorts its per-batch group rows (EventStream contract).
    * Returns the number of slice files written (== n unless a quantile
    * bound degenerated on tiny input).
    */
  private def stageSlicedByTs(ev: DataFrame, tmp: java.io.File, n: Int,
      streamDir: java.io.File): Int =
    // exact epoch micros as double (micros << 2^53, exact)
    stageSlicedByCol(ev,
      graft.ops.EventOps.epochUs(col("ts")).cast("double"), tmp, n, streamDir)

  /** The generic form of [[stageSlicedByTs]]: slice by ANY exact
    * numeric order column (draw values for the quota stream, epoch
    * micros for the event streams) — slices stay ORDER-CONTIGUOUS in
    * that column, which is the cross-batch arrival contract every
    * ordered stateful twin relies on. Rows with EQUAL order values
    * never straddle a slice boundary (the CASE is `<= bound`), so
    * within-value ties are always co-batched and the consumer's
    * in-batch sort settles them.
    */
  private def stageSlicedByCol(ev: DataFrame, ord: Column,
      tmp: java.io.File, n: Int, streamDir: java.io.File): Int = {
    import java.io.File
    import java.nio.file.Files
    val tsd = ord
    val bounds =
      if (n <= 1) Array.empty[Double]
      else ev.select(tsd.as("_tsd")).stat
        .approxQuantile("_tsd", (1 until n).map(_.toDouble / n).toArray, 1e-4)
        .distinct
    val sliceOf =
      if (bounds.isEmpty) lit(1)
      else bounds.drop(1).zipWithIndex
        .foldLeft(when(tsd <= bounds.head, 1)) {
          case (acc, (hi, i)) => acc.when(tsd <= hi, i + 2)
        }.otherwise(bounds.length + 1)
    val staging = new File(tmp, "staging_slices")
    ev.withColumn("gslice", sliceOf)
      .repartition(col("gslice"))
      .write.option("parquet.block.size", 2L * 1024 * 1024)
      .partitionBy("gslice").parquet(staging.getAbsolutePath)
    val present = (1 to bounds.length + 1)
      .filter(i => new File(staging, s"gslice=$i").exists())
    present.zipWithIndex.foreach { case (g, idx) =>
      val fs = new File(staging, s"gslice=$g").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      // a slice MUST be one file: consumers read maxFilesPerTrigger=1,
      // so a config that splits task output (e.g. maxRecordsPerFile)
      // would smear one slice across micro-batches — and the old
      // `.head` would silently DROP the extra rows (ADVICE r12).
      // Fail loudly instead of either.
      require(fs.length == 1,
        s"slice gslice=$g wrote ${fs.length} parquet files (expected 1) — " +
          "a file-splitting conf (maxRecordsPerFile?) breaks the " +
          "one-slice-one-micro-batch staging contract")
      val dst = new File(streamDir, f"${idx + 1}%03d_slice.parquet")
      Files.move(fs.head.toPath, dst.toPath)
      dst.setLastModified(1000000L * (idx + 1)); ()
    }
    present.length
  }

  /** Run `body` with shuffle partitions (= state-store partitions for
    * any stream started inside) scoped to `n`, restoring after. `n`
    * comes from [[graft.streaming.StateSizing]] at every call site —
    * derived from an estimate of live state bytes, not pinned: the
    * bench-scale floor of 8 (a micro-batch commits every store
    * instance, so 32 partitions for KB-sized state is commit overhead,
    * not parallelism — measured r10) and a production-scale 2048 fall
    * out of the same rule.
    */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  val queries: Map[String, Q] = Map(
    // W2+A1 streaming-shape: 1-hour event-time tumbling windows per
    // user over the events table, run through the streaming engine
    // (complete mode; the memory sink holds the final window table).
    "st1_stream_window" -> ((s, d) => {
      val name = "graft_st1_sink"
      val schema = Tables.events(s, d).schema
      // the file stream source wants a directory: stream the sf dir,
      // glob-filtered to the events table
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        // ts is TIMESTAMP_NTZ micros; EventOps.eventTs carries the
        // UTC-pinned exactness contract
        .withColumn("TS", graft.ops.EventOps.eventTs(col("ts")))
      val windowed = src
        .withWatermark("TS", "1 hour")
        .groupBy(window(col("TS"), "3600 seconds"), col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_sum_c"))
        .select(unix_timestamp(col("window.start")).as("win_start_epoch"),
          col("user_id"), col("n_events"),
          col("value_sum_c").cast("long").as("value_sum_c"))
      // complete-mode window agg: live keys <= one (window,user) pair
      // per event row, ~128 B state each
      val nParts = graft.streaming.StateSizing.forFrame(
        Tables.events(s, d), keysPerRow = 1, bytesPerKey = 128)
      withStatePartitions(s, nParts)(sinkToLocal(s, name, windowed, "complete"))
    }),

    // The engine's CORE kernel — flag-aware dual-population visibility
    // averaging (A1+A2, chan_bin=4) — executed by the STREAMING engine:
    // file-stream the MS main table one parquet file per micro-batch, so
    // baselines' samples arrive split across batches and the state store
    // carries half-filled bins between triggers. Grid binning needs the
    // per-group T0, a global min the streaming engine can't take before
    // its one allowed aggregation — so T0 comes from a STATIC pre-pass
    // joined onto the stream (stream-static broadcast join), exactly the
    // reference's eager chunking pre-scan before the lazy main graph
    // (xova/apps/xova/app.py:74-75 eager, then 170-195 lazy).
    // Oracle: the SAME DuckDB SQL as the batch ms_a2_chan_avg entry —
    // streaming must reproduce the batch kernel bit-for-bit.
    "st2_stream_visavg" -> ((s, _) => {
      import graft.ops.Flags
      val name = "graft_st2_sink"
      val main = graft.ms.MsTables.main(s) // ensures the fixture exists
      val groupKey = Seq("FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER")
      // persist the static side (st12's rule, applied here in r18): a
      // stream-static join re-executes the static plan EVERY micro-batch
      // — unpersisted, each trigger re-scans the full MS main table and
      // re-aggregates T0 (group-count rows; the scan is the cost)
      val t0 = Flags.filterAutocorr(main)
        .groupBy(groupKey.map(col): _*).agg(min("TIME").as("T0"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val src = s.readStream.schema(main.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"${graft.ms.SyntheticMs.root}/main")
      val prep = Flags.filterAutocorr(src)
        .withColumn("FROW", Flags.derivedFlagRow)
        .join(broadcast(t0), groupKey)
        .withColumn("BIN",
          floor((col("TIME") - col("T0")) / 60000.0).cast("int"))
      val avg = MsQueries.visFlatFrom(prep, "DATA", 4)
      // complete-mode cell agg: live keys <= exploded cells (<= 16 per
      // main row at the fixture shapes), window-keyed buffers ~256 B
      val nParts = graft.streaming.StateSizing.forFrame(
        main, keysPerRow = 16, bytesPerKey = 256)
      try withStatePartitions(s, nParts)(
        sinkToLocal(s, name, avg, "complete"))
      finally t0.unpersist(blocking = false)
    }),

    // Stateful sessionization via flatMapGroupsWithState: the real
    // streaming engine carries ONE open session per user in the state
    // store across micro-batches and emits each session the moment the
    // gap rule closes it (Append mode). Two-phase file stream: batch 1
    // is the events table, batch 2 per-user `__flush` sentinels that
    // force the final open sessions out (a finite file stream never
    // fires an event-time timeout for the last session otherwise).
    // Oracle: the SAME gap-and-island SQL as the batch ev1 entry — the
    // streaming path must reproduce the batch sessionizer bit-for-bit.
    "st3_stream_sessions" -> ((s, d) => {
      import s.implicits._
      import java.nio.file.Files
      val name = "graft_st3_sink"
      val ev = Tables.events(s, d)
      val tmp = Files.createTempDirectory("graft_st3").toFile
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      try {
        // shared flush-sentinel staging (st8/st9's helper, r10 #8):
        // time-ordered slices + trailing per-user __flush file — open
        // sessions must survive micro-batch boundaries in the state
        // store and the sentinels emit the final ones in Append mode
        val streamDir = stageTimeOrderedSlices(s, ev, tmp, 3)
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(streamDir.getAbsolutePath)
        val evs = src.select(
            col("user_id"),
            graft.ops.EventOps.epochUs(col("ts")).as("tu"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
            (col("event_type") === "__flush").as("flush"))
          .as[graft.streaming.EventStream.SessEvent]
        val sessions =
          graft.streaming.EventStream.sessionize(evs, 14400L * 1000000L)
        sinkToLocal(s, name, sessions.toDF(), "append")
      } finally rm(tmp)
    }),

    // Streaming exact-dedup: the pl_d1 keeper rule run by the streaming
    // engine. The corpus is split into 4 files streamed one per
    // micro-batch, so copies of the same content arrive in different
    // batches and the dedup state (count + min-keeper per content hash)
    // must merge in the state store — the continuous-ingest form of the
    // one-shuffle batch dedup. Oracle: the SAME SQL as
    // pl_d1_exact_clusters — streaming must reproduce batch exactly.
    "st4_stream_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (src, cleanup) = stagedFileStream(s, docs, 4)
      // dedup state: one (md5, count, keeper) record per distinct doc
      val nParts = graft.streaming.StateSizing.forFrame(
        docs, keysPerRow = 1, bytesPerKey = 160)
      try withStatePartitions(s, nParts)(sinkToLocal(s, "graft_st4_sink",
        graft.streaming.EventStream.exactClusters(src), "complete"))
      finally cleanup()
    }),

    // Streaming count-min sketch: the pl_k2 sketch built by the
    // streaming engine over a 4-micro-batch token stream. The CMS merge
    // property (cell-wise addition) IS the state-store update — each
    // batch's partial (seed, cell) counts add into the carried sketch,
    // so a continuously-ingesting frequency sketch falls out of the
    // same groupBy that builds the batch one. State is bounded by
    // d·w cells regardless of stream length — the sketch's whole point.
    // Oracle: the SAME sketch SQL as the batch pl_k2 CTE — streaming
    // must land on the identical d×w count matrix.
    "st5_stream_cms" -> ((s, d) => {
      val (src, cleanup) = stagedFileStream(s, Tables.documents(s, d), 4)
      val toks = src.select(explode(split(col("text"), " ")).as("tok"))
        .where(col("tok") =!= "")
      // CMS state is bounded by the sketch itself: d×w cells, ~24 B
      // each, regardless of stream length — no frame count needed
      val nParts = graft.streaming.StateSizing.partitions(3L * 1024 * 24)
      try withStatePartitions(s, nParts)(sinkToLocal(s, "graft_st5_sink",
        graft.pipeline.Sketches.cmsSketch(toks, col("tok")), "complete"))
      finally cleanup()
    }),

    // Watermark/late-data semantics, proven in APPEND mode — the one
    // streaming behavior st1-st5 (complete mode / explicit flush) never
    // exercise: `withWatermark` must actually DROP late rows and must
    // hold back windows the watermark hasn't passed. Two-phase stream:
    // batch 1 is the events table (advancing the watermark to
    // max(TS) - 2h), batch 2 is a PLANTED late batch — year-old copies
    // of every 97th event — arriving entirely behind the watermark.
    // Append mode then emits exactly the hour windows whose end <= the
    // final watermark, with ZERO contribution from the planted copies.
    // Oracle: the same window aggregate over the ORIGINAL events only,
    // cut by the same watermark rule (window_end <= max_event_ms - 2h,
    // at Spark's millisecond watermark grain). If the engine failed to
    // drop the late batch, its year-old windows (long past the
    // watermark) would be emitted and the hash would diverge — the
    // drop is what the gate checks, not an incidental row count.
    "st6_stream_watermark" -> ((s, d) => {
      import java.io.File
      import java.nio.file.Files
      val name = "graft_st6_sink"
      val ev = Tables.events(s, d)
      val tmp = Files.createTempDirectory("graft_st6").toFile
      val streamDir = new File(tmp, "stream"); streamDir.mkdirs()
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      def stage(df: DataFrame, prefix: String): Unit = {
        val staging = new File(tmp, s"staging_$prefix")
        df.coalesce(1).write.parquet(staging.getAbsolutePath)
        staging.listFiles().filter(_.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (f, i) =>
            Files.move(f.toPath,
              new File(streamDir, f"${prefix}_$i%03d.parquet").toPath)
          }
      }
      try {
        stage(ev, "000")
        val src = s.readStream.schema(ev.schema)
          .parquet(streamDir.getAbsolutePath)
          .withColumn("TS", graft.ops.EventOps.eventTs(col("ts")))
        val windowed = src
          .withWatermark("TS", "2 hours")
          .groupBy(window(col("TS"), "3600 seconds"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_sum_c"))
          .select(unix_timestamp(col("window.start")).as("win_start_epoch"),
            col("user_id"), col("n_events"),
            col("value_sum_c").cast("long").as("value_sum_c"))
        s.catalog.dropTempView(name)
        // append-mode window agg: open-window state <= one key per
        // event row until the watermark passes it
        val nParts = graft.streaming.StateSizing.forFrame(
          ev, keysPerRow = 1, bytesPerKey = 128)
        withStatePartitions(s, nParts) {
          val q = windowed.writeStream.format("memory").queryName(name)
            .outputMode("append").start()
          try {
            q.processAllAvailable() // batch 1: watermark -> max(TS) - 2h
            // the planted late batch: year-old copies, all behind the
            // watermark — the engine must drop every one of them
            stage(ev.filter(pmod(col("event_id"), lit(97)) === 0)
              .withColumn("ts", col("ts") - expr("INTERVAL 365 DAYS")), "001")
            q.processAllAvailable() // batch 2: drop late, emit closed windows
          } finally q.stop()
        }
        val out = s.table(name).collect()
        s.createDataFrame(
          java.util.Arrays.asList(out: _*), s.table(name).schema)
      } finally rm(tmp)
    }),

    // Stream-STREAM interval join — the last streaming surface st1-st6
    // don't touch: two live streams (clicks, purchases over the same
    // staged event files) joined on user within a 1-hour event-time
    // window, in append mode with BOTH sides watermarked. Cross-batch
    // matching is the proof point: a click buffered in the join state
    // store must match a purchase arriving micro-batches later, and
    // the watermark must evict buffered rows once they can no longer
    // match (state bounded by the 2h delay + 1h window horizon, not
    // stream length). Files are staged in EVENT-TIME order (quartile
    // slices, strictly increasing mtimes) so arrival is in-order and
    // the 2h delay strictly dominates the 1h join window — every
    // batch-side match provably emits (a purchase at P meets its
    // click at T >= P - 1h while the global watermark is still at
    // ~P - 2h < T), making the batch inner join the exact oracle.
    "st7_stream_join" -> ((s, d) => {
      import java.io.File
      import java.nio.file.Files
      val name = "graft_st7_sink"
      val ev = Tables.events(s, d)
      val tmp = Files.createTempDirectory("graft_st7").toFile
      val streamDir = new File(tmp, "stream"); streamDir.mkdirs()
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      // A stream-stream join maintains FOUR state stores per partition
      // per side; the state-partition count is frozen from
      // spark.sql.shuffle.partitions at stream start. At 32 partitions
      // that is ~256 store instances snapshotting per micro-batch for a
      // state bounded at a few hundred buffered rows (the 3h horizon) —
      // measured 14-17s of pure store overhead, data-size-independent.
      // Size the state layout to the state (StateSizing rule): buffered
      // rows are bounded by the event count, ~128 B each per side.
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      val st7Parts = graft.streaming.StateSizing.forFrame(
        ev, keysPerRow = 1, bytesPerKey = 128)
      s.conf.set("spark.sql.shuffle.partitions", st7Parts.toString)
      // No-data micro-batches only perform state EVICTION here — an
      // inner join emits matches at match time, so the sink is
      // complete without them; skipping them halves the store-commit
      // count. (Eviction semantics are spec-asserted separately in
      // EventStreamSpec under default settings.)
      val prevNoData =
        s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      try {
        // boundary-CASE staging (stageSlicedByTs) — one scan, one
        // partitioned write; the streamed plan below never sorts
        stageSlicedByTs(ev, tmp, 4, streamDir)
        def src() = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(streamDir.getAbsolutePath)
        val clicks = src().filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            graft.ops.EventOps.eventTs(col("ts")).as("CTS"))
          .withWatermark("CTS", "2 hours")
        val purchases = src().filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user_id"),
            graft.ops.EventOps.eventTs(col("ts")).as("PTS"))
          .withWatermark("PTS", "2 hours")
        val joined = clicks.join(purchases,
            col("user_id") === col("p_user_id") &&
              col("PTS") >= col("CTS") &&
              col("PTS") <= col("CTS") + expr("INTERVAL 1 HOUR"))
          .select(col("click_id"), col("purchase_id"), col("user_id"),
            expr("unix_micros(CTS)").as("click_us"),
            expr("unix_micros(PTS)").as("purchase_us"))
        sinkToLocal(s, name, joined, "append")
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
        rm(tmp)
      }
    }),

    // Streaming ordered-step funnel: the ev3 first-completion chain run
    // by the streaming engine with ONE fixed-width reach vector per
    // user in the state store — O(steps) state per user regardless of
    // history, vs buffering the event log. The corpus streams as three
    // time-ordered slices (st7-style mtime staging) so the chain must
    // survive micro-batch boundaries in the state store; per-user
    // flush sentinels (far-future ts, sorting last) emit the final
    // vectors in Append mode. Oracle: the SAME SQL as batch ev3 — the
    // stateful stream must reproduce the window composition exactly.
    "st8_stream_funnel" -> ((s, d) => {
      import s.implicits._
      import java.io.File
      import java.nio.file.Files
      val name = "graft_st8_sink"
      val steps = Seq("signup", "click", "purchase")
      val ev = Tables.events(s, d)
      val tmp = Files.createTempDirectory("graft_st8").toFile
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      try {
        val streamDir = stageTimeOrderedSlices(s, ev, tmp, 3)
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(streamDir.getAbsolutePath)
        val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) {
          case (acc, (st, i)) =>
            when(col("event_type") === st, lit(i)).otherwise(acc)
        }
        val fev = src
          .filter(col("event_type").isin((steps :+ "__flush"): _*))
          .select(col("user_id"), col("event_id"),
            graft.ops.EventOps.epochUs(col("ts")).as("tu"),
            stepIdx.as("step"),
            (col("event_type") === "__flush").as("flush"))
          .as[graft.streaming.EventStream.FunnelEvent]
        val collected = sinkToLocal(s, name,
          graft.streaming.EventStream.funnel(fev, steps.size).toDF(), "append")
        // reach vector -> the batch ev3 column shape (-1 = unreached)
        val stepCols = steps.indices.map { k =>
          when(element_at(col("reach"), k + 1) >= 0L,
            element_at(col("reach"), k + 1)).as(s"s${k + 1}_us")
        }
        val stage = steps.indices.map(k =>
          when(element_at(col("reach"), k + 1) >= 0L, 1L).otherwise(0L))
          .reduce(_ + _)
        collected.select(
          (col("user_id") +: stepCols) :+ stage.as("funnel_stage"): _*)
      } finally rm(tmp)
    }),

    // Streaming cohort retention: the ev5 matrix built incrementally —
    // per-user state is (cohort day, active-bucket set), bounded by the
    // observation span over bucketDays, never by event count; flush
    // sentinels emit each user's final row and the batch tail (explode
    // + cell-keyed count) assembles the matrix, exact because each user
    // emits each bucket once. Oracle: the SAME SQL as batch ev5 — the
    // last event-operator family without a streaming proof (VERDICT r9
    // #5).
    // The A1/A2 kernel in its SCALE form: event-time windows + watermark
    // in APPEND mode — state holds only OPEN windows and each bin is
    // emitted exactly once when the watermark passes it, vs st2's
    // complete-mode twin whose state == the whole output re-emitted per
    // trigger (measured output-bound linear at 10×, DESIGN.md "streaming
    // 10× probes"). Differences from st2, both deliberate: the time grid
    // is ABSOLUTE (epoch-aligned windows — what window() computes with
    // no per-group T0 pre-pass, so the stream needs NO static join at
    // all: one watermarked shuffle is the whole plan), and arrival is
    // TIME-ordered (st7-style staged slices), so windows close and
    // evict MID-STREAM, not just at the end; a far-future flush slice
    // (one cross-corr row) closes the last real windows while its own
    // window stays past the watermark and is never emitted. Oracle: the
    // batch cells/dual-population SQL on the same absolute grid.
    "st10_stream_visavg_update" -> ((s, _) => {
      import java.io.File
      import java.nio.file.Files
      import graft.ops.Flags
      val name = "graft_st10_sink"
      val main = graft.ms.MsTables.main(s)
      val tmp = Files.createTempDirectory("graft_st10").toFile
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      // NOTE: no-data micro-batches must stay ENABLED here (unlike
      // st7's scoped disable): the watermark a batch RUNS WITH is
      // computed from the previous batch's data, so the windows the
      // flush row closes are emitted by the no-data batch AFTER it —
      // an inner join emits at match time, an append aggregation
      // emits a batch later (verified: disabling drops the final
      // window generation, 64 512 of 129 024 rows).
      // State partitions sized to the state (StateSizing rule):
      // append-mode state holds only OPEN windows (bounded by the
      // arrival horizon — measured 3.3× under st2's complete mode at
      // 10×), but the same conservative cells-per-row bound keeps one
      // rule across the kernel twins; the floor reproduces bench-scale
      // behavior (6 batches × 32 stores is commit overhead, not
      // parallelism).
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      val st10Parts = graft.streaming.StateSizing.forFrame(
        main, keysPerRow = 16, bytesPerKey = 256)
      s.conf.set("spark.sql.shuffle.partitions", st10Parts.toString)
      try {
        val streamDir = new File(tmp, "stream"); streamDir.mkdirs()
        def place(f: File, idx: Int): Unit = {
          val dst = new File(streamDir, f"$idx%03d_slice.parquet")
          Files.move(f.toPath, dst.toPath)
          dst.setLastModified(1000000L * idx); ()
        }
        // time-ordered slices WITHOUT a global sort: the distinct TIME
        // grid is O(nTime) (the same tiny-dimension collect as the BDA
        // channelisation set), so slice assignment is a literal CASE on
        // TIME boundaries and ALL slices land in one scan + one
        // partitioned write (repartition on _slice ⇒ one file per
        // slice) — an ntile-over-one-window staging here pushed the
        // whole array-heavy table through one sort task, and per-slice
        // filtered writes re-scanned the table once per slice
        val times = main.select("TIME").distinct()
          .collect().map(_.getDouble(0)).sorted
        // Arrival granularity IS the state bound for an append-mode
        // window agg (state = windows spanned by one slice), so the
        // slice count scales with the time grid instead of staying a
        // constant: a fixed 4 slices means the horizon — and the state
        // — grows with the corpus (measured: 3.29 M state rows at the
        // 100× probe). ~20 time steps per slice keeps the open-window
        // generations per batch constant at any scale; the committed
        // fixture (4 steps) still stages exactly the 4 slices the
        // bands were pinned on.
        val nSlices = math.max(4, times.length / 20)
        val per = math.max(1, math.ceil(times.length.toDouble / nSlices).toInt)
        val bounds = times.grouped(per).map(_.last).toSeq
        // ascending CASE chain: first matching bound wins
        val sliceOf = bounds.init.zipWithIndex.drop(1)
          .foldLeft(when(col("TIME") <= bounds.head, 1)) {
            case (acc, (hi, i)) => acc.when(col("TIME") <= hi, i + 1)
          }.otherwise(bounds.size)
        val staging = new File(tmp, "staging")
        main.withColumn("gslice", sliceOf)
          .repartition(col("gslice"))
          .write.option("parquet.block.size", 2L * 1024 * 1024)
          .partitionBy("gslice").parquet(staging.getAbsolutePath)
        (1 to bounds.size).foreach { i =>
          val f = new File(staging, s"gslice=$i").listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          place(f, i)
        }
        // flush: one far-future cross-corr row advances the watermark
        // past every real window; its own window never closes. The
        // flush timestamp is DERIVED from the data (max TIME + two
        // window widths — `times` is already on the driver from the
        // slice-boundary grid above), not a constant: a fixed value
        // sits BEHIND the watermark at larger GRAFT_MS_NTIME fixtures
        // and is silently dropped as late data, so the final window
        // generation never emits (ADVICE r10).
        val flushTime = times.last + 2 * 60000.0
        val fstage = new File(tmp, "staging_flush")
        Flags.filterAutocorr(main).limit(1)
          .withColumn("TIME", lit(flushTime))
          .coalesce(1).write.parquet(fstage.getAbsolutePath)
        place(fstage.listFiles()
          .filter(_.getName.endsWith(".parquet")).head, bounds.size + 1)
        val src = s.readStream.schema(main.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(streamDir.getAbsolutePath)
        val prep = Flags.filterAutocorr(src)
          .withColumn("FROW", Flags.derivedFlagRow)
          // TIME is exact-grid seconds; micros lift is exact
          .withColumn("TS", timestamp_micros((col("TIME") * 1e6).cast("long")))
        val groupCols =
          Seq("FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER", "ANTENNA1", "ANTENNA2")
        val outKeys = groupCols :+ "CHAN_BIN" :+ "CORR"
        val cells = MsQueries.visCells(prep, "DATA", 4, "TS" +: groupCols)
        val agged = cells
          .withWatermark("TS", "0 seconds")
          .groupBy(window(col("TS"), "60000 seconds") +:
            outKeys.map(col): _*)
          .agg(MsQueries.visAggExprs.head, MsQueries.visAggExprs.tail: _*)
          .select(unix_timestamp(col("window.start")).as("WIN_START") +:
            outKeys.map(col) ++: MsQueries.visOutExprs: _*)
        sinkToLocal(s, name, agged, "append")
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        rm(tmp)
      }
    }),

    // Streaming embedding-LSH bucket dedup: the EMBEDDING-side dedup
    // shuffle shape (pl_d5's SRP-LSH banding) executed by the
    // streaming engine — st4's exact-dedup contract lifted from md5
    // keys to LSH bucket keys. The corpus streams as 4 files; the
    // signature+banding is a pure projection on the stream
    // (Ann.withScaled + withLshBuckets, hyperplanes are literals), and
    // each (band, bucket)'s membership state (count + min-keeper)
    // merges across micro-batches in the state store. State is
    // bounded by the LIVE BUCKET cardinality (≤ bands × 2^bits plus
    // nothing per extra copy), not stream length — the sketch-like
    // bound that makes continuous embedding-dedup ingestion viable.
    // Oracle: the batch band-rows aggregation over the SAME shared
    // planes/buckets CTE chain as pl_a2 (structure cannot drift).
    "st11_stream_embed_lsh" -> ((s, d) => {
      import graft.pipeline.Ann
      val emb = Tables.embeddings(s, d)
      val (src, cleanup) = stagedFileStream(s, emb, 4)
      val nBands = Ann.Planes / Ann.BitsPerBand
      val rows = Ann.withLshBuckets(Ann.withScaled(src))
        .select(col("vec_id"),
          explode(array((0 until nBands).map(i =>
            struct(lit(i).as("band_id"),
              col(s"bucket$i").as("bucket"))): _*)).as("bb"))
        .select(col("vec_id"), col("bb.band_id"), col("bb.bucket"))
      val agged = rows.groupBy("band_id", "bucket")
        .agg(count(lit(1)).as("n_members"), min("vec_id").as("keeper"))
      // state = live buckets, hard-capped by the band structure
      val nParts = graft.streaming.StateSizing.partitions(
        nBands.toLong * (1L << Ann.BitsPerBand) * 64)
      try withStatePartitions(s, nParts)(
        sinkToLocal(s, "graft_st11_sink", agged, "complete"))
      finally cleanup()
    }),

    // Streaming benchmark decontamination: the ingestion-time form of
    // pl_d10's train-test overlap guard — corpus documents STREAM in
    // while the held-out benchmark's distinct gram keys sit as a
    // static broadcast table. Each micro-batch inner-joins its docs'
    // distinct grams against the benchmark (stream-static broadcast
    // join — the one streaming join shape st1–st11 didn't exercise;
    // st7 is stream-stream) and the per-doc shared-gram counts land
    // in the state store. A doc arrives in exactly one batch with
    // array_distinct grams, so its count is complete when first seen
    // — state is one fixed-width record per CONTAMINATED doc, never
    // per gram. At 100 TB: the benchmark gram table is ≪ corpus,
    // broadcast once, and the corpus streams through exactly as the
    // batch operator scans it — the gate a continuous training-data
    // ingest runs on every arriving shard.
    "st12_stream_decontam" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(pmod(col("doc_id"), lit(37)) =!= 0)
      // persist the static side: a stream-static join re-executes the
      // static plan EVERY micro-batch — without this, each trigger
      // re-scans and re-distincts the benchmark (4× here; every
      // trigger forever on a production stream)
      val benchGrams = docs.filter(pmod(col("doc_id"), lit(37)) === 0)
        .select(explode(array_distinct(
          graft.expressions.TokenGramHash(col("text"), 4))).as("gram"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (src, cleanup) = stagedFileStream(s, corpus, 4)
      val contaminated = src.select(col("doc_id"), explode(array_distinct(
          graft.expressions.TokenGramHash(col("text"), 4))).as("gram"))
        .join(broadcast(benchGrams), Seq("gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared_grams"))
      val nParts = graft.streaming.StateSizing.forFrame(
        corpus, keysPerRow = 1, bytesPerKey = 24)
      try withStatePartitions(s, nParts)(
        sinkToLocal(s, "graft_st12_sink", contaminated, "complete"))
      finally {
        benchGrams.unpersist(blocking = false); cleanup()
      }
    }),

    // Streaming HLL: the pl_k4 register table built by the streaming
    // engine — max(rho) per register IS the HLL merge, so the state
    // store's per-key max-combine gives continuous cardinality
    // tracking for free. State is exactly 2^p = 256 registers no
    // matter how long the stream runs — with st5 (CMS) this completes
    // the bounded-state sketch pair: frequency AND cardinality over
    // an unbounded token stream in O(sketch) memory.
    // Oracle: the SAME tok/h/r CTE chain as pl_k4 (shared SQL).
    "st13_stream_hll" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (src, cleanup) = stagedFileStream(s, docs, 4)
      val toks = src.select(explode(split(col("text"), " ")).as("tok"))
        .where(col("tok") =!= "")
      val regs = graft.pipeline.Sketches.hllRegisters(toks, col("tok"), 8)
        .select(col("reg"), col("max_rho").cast("bigint").as("max_rho"))
      val nParts = graft.streaming.StateSizing.partitions(256L * 64)
      try withStatePartitions(s, nParts)(
        sinkToLocal(s, "graft_st13_sink", regs, "complete"))
      finally cleanup()
    }),

    "st9_stream_retention" -> ((s, d) => {
      import s.implicits._
      import java.io.File
      import java.nio.file.Files
      val name = "graft_st9_sink"
      val ev = Tables.events(s, d)
      val tmp = Files.createTempDirectory("graft_st9").toFile
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      try {
        val streamDir = stageTimeOrderedSlices(s, ev, tmp, 3)
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(streamDir.getAbsolutePath)
        val rev = src.select(
            col("user_id"),
            graft.ops.EventOps.epochUs(col("ts")).as("tu"),
            (col("event_type") === "__flush").as("flush"))
          .as[graft.streaming.EventStream.RetEvent]
        val collected = sinkToLocal(s, name,
          graft.streaming.EventStream.retention(rev, 7).toDF(), "append")
        collected
          .select(col("cohort_day"), col("user_id"),
            explode(col("buckets")).as("bucket_offset"))
          .groupBy("cohort_day", "bucket_offset")
          .agg(countDistinct("user_id").as("n_active"))
      } finally rm(tmp)
    }),

    // Streaming token-budget mixture (pl_s7's twin): per-source quota
    // fill over a document stream via flatMapGroupsWithState. State =
    // ONE token counter per source — bounded by the declared source
    // enum, NOT stream length: the constant-state point of the design
    // space (st13 is constant-by-sketch, st4 linear-by-contract, this
    // is constant-by-enum). Slices are staged in global draw order
    // (stageSlicedByCol), so each source's arrival order equals the
    // batch window's (draw, doc_id) order and every admitted row's
    // cum_before is bit-identical to the batch operator's.
    // Oracle: the SAME SQL as pl_s7 (shared string — the two cannot
    // drift).
    "st14_stream_quota" -> ((s, d) => {
      import s.implicits._
      import java.io.File
      import java.nio.file.Files
      val name = "graft_st14_sink"
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          graft.pipeline.Sampling.draw("mix", col("doc_id")).as("drw"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val tmp = Files.createTempDirectory("graft_st14").toFile
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      try {
        val streamDir = new File(tmp, "stream"); streamDir.mkdirs()
        // draw values are integers < 1e6 — exact in double
        stageSlicedByCol(docs, col("drw").cast("double"), tmp, 3, streamDir)
        val src = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(streamDir.getAbsolutePath)
        val quota = graft.streaming.EventStream.tokenQuota(
          src.as[graft.streaming.EventStream.QuotaDoc],
          PipelineQueries.MixBudgets, PipelineQueries.MixDefaultBudget)
        // state: one 8-byte counter per source (~20 sources)
        val nParts = graft.streaming.StateSizing.partitions(20L * 64)
        withStatePartitions(s, nParts)(
          sinkToLocal(s, name, quota.toDF(), "append"))
      } finally rm(tmp)
    }),

    // Streaming ANN (pl_a2's twin): a probe-vector stream served
    // against the static corpus LSH index — stream-static bucket join,
    // per-probe dedup + rerank + top-k inside the group fold, ZERO
    // cross-batch state (each query answered in its arrival batch; the
    // stateless point of the streaming design space). Oracle: the SAME
    // SQL as pl_a2 — streamed answers must equal the batch index's.
    "st15_stream_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (src, cleanup) = stagedFileStream(s, emb.filter(col("vec_id") < 8), 3)
      val nParts = graft.streaming.StateSizing.partitions(8L * 64)
      val (served, index) =
        graft.pipeline.Ann.annLshStreamedIndexed(src, emb, 5)
      try withStatePartitions(s, nParts)(
        sinkToLocal(s, "graft_st15_sink", served, "append"))
      finally {
        cleanup()
        // the serve index outlives the query only in a real serving
        // deployment; the entry stops the query, so release it
        graft.pipeline.Caches.release(index)
      }
    }),

    // Streaming hier-IVF-SQ8 serve (pl_a12's twin): the quantized
    // index builds once from the static corpus; probes route to their
    // lists as a pure stream-side projection and candidates come from
    // a stream-static EQUI-join on the list key — the serve shape
    // that stays bounded when the corpus doesn't broadcast. Zero
    // cross-batch state; oracle: pl_a12's SQL verbatim.
    "st16_stream_ann_sq8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (src, cleanup) = stagedFileStream(s, emb.filter(col("vec_id") < 8), 3)
      val nParts = graft.streaming.StateSizing.partitions(8L * 64)
      val (served, index) = graft.pipeline.Ann.annIvfSq8HierStreamedIndexed(
        src, emb, 5, 8, 3, 2, 600000L, 2, trainedCoarse = true,
        listProbes = 2)
      try withStatePartitions(s, nParts)(
        sinkToLocal(s, "graft_st16_sink", served, "append"))
      finally {
        cleanup()
        graft.pipeline.Caches.release(index)
      }
    }),

    // Streaming personalized PageRank (pl_g2's twin, r16 VERDICT #5):
    // decontamination hits arrive as a stream; the near-dup EDGE
    // INDEX is static and built ONCE (the st16 build-once-serve-many
    // pattern), and each micro-batch re-scores TRANSITIVE risk for
    // the accumulated seed set with the exact batch operator —
    // iterative rank joins are not expressible inside one streaming
    // plan, so the serve loop is foreachBatch over the static index:
    // the production shape for "new benchmark hits landed, refresh
    // the risk scores". Cross-batch state = the seed set only
    // (node-sized, held as a materialized frame — the external
    // equivalent of a state store keyed by doc_id); the edge index
    // never re-derives. The LAST re-score (all seeds arrived) is the
    // entry's output; oracle: pl_g2's SQL verbatim.
    "st17_stream_ppr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = graft.pipeline.Dedup.nearDupPairs(docs)
      val ix =
        try graft.pipeline.Graph.buildIndex(pairs.select("doc1", "doc2"))
        finally graft.pipeline.Caches.release(pairs)
      try {
        val seeds = docs
          .filter(pmod(col("doc_id"), lit(37L)) === 0L).select("doc_id")
        val (src, cleanup) = stagedFileStream(s, seeds, 3)
        try {
          val accSeeds =
            new java.util.concurrent.atomic.AtomicReference[DataFrame]
          val latest =
            new java.util.concurrent.atomic.AtomicReference[DataFrame]
          val q = src.writeStream.foreachBatch {
            (batch: DataFrame, _: Long) =>
              val prev = accSeeds.get()
              val merged = graft.pipeline.Caches.materialize(
                Option(prev).map(_.union(batch)).getOrElse(batch)
                  .select("doc_id").distinct())
              Option(prev).foreach(graft.pipeline.Caches.release)
              accSeeds.set(merged)
              val scored = graft.pipeline.Graph.pprOnIndex(
                ix, merged, 3, 1000000000L)
              Option(latest.getAndSet(scored))
                .foreach(graft.pipeline.Caches.release)
              ()
          }.outputMode("append").start()
          try q.processAllAvailable() finally q.stop()
          Option(accSeeds.get()).foreach(graft.pipeline.Caches.release)
          require(latest.get() != null, "seed stream produced no batches")
          latest.get()
        } finally cleanup()
      } finally ix.release()
    }),

    // Incremental streaming PPR (st17 v2 — VERDICT r17 #7): same
    // static edge index, same 3 staged seed batches, but each batch
    // folds its NEW seeds into standing per-iteration rank layers by
    // exact DELTA propagation (Graph.pprAddSeeds) instead of st17's
    // full re-score — per-batch cost drops from O(edges·iters) to the
    // delta-REACHABLE frontier's out-edges. The floor-divided
    // recurrence is not naively linear, so the delta carries the
    // exact per-edge floor DIFFERENCE at the standing value (see
    // pprAddSeeds' exactness argument); the final standing scores
    // equal the one-shot full re-score integer for integer, which is
    // why this entry shares pl_g2's oracle verbatim. Cross-batch
    // state = ONE node-sized layers frame (iterations+1 int64 columns
    // + the seed flag), materialized and released per batch.
    "st18_stream_ppr_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = graft.pipeline.Dedup.nearDupPairs(docs)
      val ix =
        try graft.pipeline.Graph.buildIndex(pairs.select("doc1", "doc2"))
        finally graft.pipeline.Caches.release(pairs)
      try {
        val seeds = docs
          .filter(pmod(col("doc_id"), lit(37L)) === 0L).select("doc_id")
        val (src, cleanup) = stagedFileStream(s, seeds, 3)
        try {
          val state = new java.util.concurrent.atomic.AtomicReference(
            graft.pipeline.Graph.pprInit(ix, 3, 1000000000L))
          try {
            val q = src.writeStream.foreachBatch {
              (batch: DataFrame, _: Long) =>
                val prev = state.get()
                state.set(graft.pipeline.Graph.pprAddSeeds(ix, prev, batch))
                prev.release()
                ()
            }.outputMode("append").start()
            try q.processAllAvailable() finally q.stop()
            graft.pipeline.Caches.materialize(
              graft.pipeline.Graph.pprScores(state.get()))
          } finally state.get().release()
        } finally cleanup()
      } finally ix.release()
    })
  )

  val oracleSql: Map[String, String] = Map(
    "st1_stream_window" ->
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start_epoch,
                user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_sum_c
         FROM events GROUP BY 1, 2""",

    // Identical to the batch A2 oracle — the streaming engine must
    // reproduce the batch kernel exactly.
    "st2_stream_visavg" -> MsQueries.visFlatSql("DATA", 4),

    // Identical to the batch ev1 oracle — the stateful streaming
    // sessionizer must reproduce the batch session_window plan exactly.
    "st3_stream_sessions" -> EventQueries.sessionizeOracleSql,

    // Identical to the batch pl_d1 oracle — the streaming dedup state
    // must merge to the same clusters the batch shuffle produces.
    "st4_stream_dedup" ->
      """SELECT md5(text) AS md5_fp, CAST(count(*) AS BIGINT) AS n_copies,
                min(doc_id) AS keeper
         FROM documents GROUP BY 1""",

    // The st1 window aggregate over the ORIGINAL events, cut by the
    // watermark rule at Spark's millisecond grain: a window is emitted
    // iff window_end <= floor(max_event_us/1000) - 2h (the planted
    // year-old late batch contributes nothing — that's the semantics
    // under test). Integer arithmetic throughout; the data's max event
    // is not ms-hour-aligned, so <=-vs-< at the boundary cannot bite.
    "st6_stream_watermark" ->
      """WITH e AS (SELECT epoch_us(ts) AS tu, user_id,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         mx AS (SELECT max(tu) AS mxu FROM e),
         w AS (SELECT CAST(floor(tu / 3600000000) * 3600 AS BIGINT)
                        AS win_start_epoch,
                      user_id,
                      CAST(count(*) AS BIGINT) AS n_events,
                      CAST(sum(cents) AS BIGINT) AS value_sum_c
               FROM e GROUP BY 1, 2)
         SELECT w.* FROM w, mx
         WHERE (win_start_epoch + 3600) * 1000000
               <= (mxu // 1000 - 7200000) * 1000""",

    // The plain batch inner interval join — the staged in-order
    // arrival guarantees the streaming join emits every batch match
    // (see the entry comment), so the oracle is exact, not a subset.
    "st7_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
                c.user_id,
                epoch_us(c.ts) AS click_us,
                epoch_us(p.ts) AS purchase_us
         FROM events c JOIN events p
           ON p.user_id = c.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND epoch_us(p.ts) BETWEEN epoch_us(c.ts)
                                 AND epoch_us(c.ts) + 3600000000""",

    // Identical to the batch ev3 oracle — the stateful streaming
    // funnel must reproduce the window-composition chain exactly.
    "st8_stream_funnel" -> EventQueries.oracleSql("ev3_funnel"),

    // Identical to the batch ev5 oracle — the incremental cohort state
    // must assemble the same retention matrix cell for cell.
    "st9_stream_retention" -> EventQueries.oracleSql("ev5_retention"),

    // The batch kernel on the absolute event-time grid — append-mode
    // watermark emission must reproduce every closed window exactly
    // (and emit nothing for the flush row's own still-open window).
    "st10_stream_visavg_update" -> MsQueries.visFlatAbsSql("DATA", 4),

    // The batch band-rows aggregation over the same shared
    // planes/buckets CTE chain as pl_a2 — the streamed LSH-bucket
    // membership state must merge to the batch banding exactly.
    "st11_stream_embed_lsh" ->
      s"""WITH ${PipelineQueries.lshBandRowsSql}
          SELECT band_id, bucket,
                 CAST(count(*) AS BIGINT) AS n_members,
                 min(vec_id) AS keeper
          FROM bandrows GROUP BY 1, 2""",

    // Identical to the batch pl_d10 oracle — the stream-static gram
    // join must flag exactly the docs the batch overlap guard flags,
    // with the same shared-gram evidence counts.
    "st12_stream_decontam" ->
      PipelineQueries.oracleSql("pl_d10_decontam"),

    // The pl_k4 register CTE chain (shared SQL) — the streamed HLL's
    // register table must equal the batch build register for register.
    "st13_stream_hll" ->
      s"""WITH ${PipelineQueries.hllRegCtesSql}
          SELECT reg, CAST(max(rho) AS BIGINT) AS max_rho
          FROM r GROUP BY 1""",

    // Identical to the batch pl_k2 sketch CTE — the streamed sketch's
    // d×w count matrix must equal the batch build cell for cell.
    "st5_stream_cms" ->
      """WITH tok AS (
           SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok
                            FROM documents)
           WHERE tok <> ''),
         seeds AS (SELECT unnest(range(3)) AS s)
         SELECT CAST(s AS INTEGER) AS seed,
                CAST('0x' || substring(md5('cms' || s || '|' || tok), 1, 15)
                  AS BIGINT) % 1024 AS cell,
                CAST(count(*) AS BIGINT) AS cnt
         FROM tok, seeds GROUP BY 1, 2""",

    // Identical to the batch pl_s7 oracle (shared SQL) — the streamed
    // quota fill must admit the same rows with the same cum_before.
    "st14_stream_quota" ->
      PipelineQueries.tokenBudgetMixSql,

    // Identical to the batch pl_a2 oracle — the streamed index serve
    // must return the batch index's exact top-k per probe.
    "st15_stream_ann" ->
      PipelineQueries.oracleSql("pl_a2_ann_lsh"),

    // Identical to the batch pl_a12 oracle — the streamed quantized
    // index serve must return the batch composition's exact rows.
    "st16_stream_ann_sq8" ->
      PipelineQueries.oracleSql("pl_a12_ann_ivf_sq8_hier"),

    // Identical to the batch pl_g2 oracle — the final streamed
    // re-score (all seed batches arrived) must equal the one-shot
    // personalized PageRank on the full seed set, integer for integer.
    "st17_stream_ppr" ->
      PipelineQueries.oracleSql("pl_g2_ppr_decontam"),

    // Identical to the batch pl_g2 oracle — the delta-composed
    // standing scores must equal the one-shot personalized PageRank
    // on the full seed set, integer for integer (the linear-identity
    // claim pprAddSeeds makes, gated end to end).
    "st18_stream_ppr_delta" ->
      PipelineQueries.oracleSql("pl_g2_ppr_decontam")
  )
}
