package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming slice: the declarative upgrade of the
  * reference's pull-based micro-batch loop (executor.go:184-274 —
  * repeated Execute() calls each covering one executionWindowSize of
  * event time). Here the micro-batching, state, and resume bookkeeping
  * (pendingCompletionNodes, Position/Seek checkpoints) all collapse
  * into the engine: `readStream` + event-time window + watermark.
  *
  * Scale stance: file-source streams list and batch input files
  * incrementally (maxFilesPerTrigger), state lives in the state store
  * keyed by (window, event_type) — both bounded; watermark caps state
  * growth under late data.
  */
object StreamingOps {

  /** Temp roots for the replay topologies (family stores + checkpoints
    * the replays write). `deleteOnExit` cannot remove non-empty trees,
    * so every bench/verify invocation would otherwise leak a family
    * copy per stateful replay (measured: gigabytes per full sweep on a
    * long-lived host). Deletion happens at JVM exit, not per replay —
    * several replays RETURN lazily-evaluated frames over the files
    * they wrote (e.g. the INSERT read-back), so an eager cleanup would
    * pull the data out from under the caller's DataFrame.
    */
  private val tempRoots = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[java.nio.file.Path, java.lang.Boolean]())
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      tempRoots.asScala.foreach { root =>
        try {
          Files.walk(root).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { try Files.deleteIfExists(p) catch { case _: Throwable => () } })
        } catch { case _: Throwable => () }
      }
    }, "graft-stream-temp-cleanup"))
  }
  private def tempRoot(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    tempRoots.add(dir)
    dir.toString
  }

  /** The file stream source requires a *directory* of plain files; the
    * testdata is a single parquet file, and generated scale corpora are
    * parquet DIRECTORIES of part files (the production layout). Stage a
    * temp dir of symlinks: one link for a file source, one link per
    * part file for a directory source — the file stream source does
    * not recurse into subdirectories, so a symlink to a directory
    * would silently stream ZERO files (measured: the 10x streaming
    * scale run completed in 0.3 s on an empty stream).
    * One staged dir per sfDir for the JVM's lifetime (cleaned on exit);
    * repeated calls must not leak a dir + symlink each.
    */
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageDir(sfDir: String, table: String = "events"): String =
    staged.computeIfAbsent(s"$sfDir#$table", { _ =>
      val dir = Files.createTempDirectory("graft-stream")
      dir.toFile.deleteOnExit()
      val src = Paths.get(s"$sfDir/$table.parquet")
      val parts: Seq[(String, java.nio.file.Path)] =
        if (Files.isDirectory(src)) {
          import scala.jdk.CollectionConverters._
          Files.list(src).iterator().asScala.toSeq
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .sortBy(_.getFileName.toString)
            .zipWithIndex
            .map { case (p, i) => (f"part-$i%05d.parquet", p) }
        } else Seq((s"$table.parquet", src))
      parts.foreach { case (name, target) =>
        val link = dir.resolve(name)
        Files.createSymbolicLink(link, target)
        link.toFile.deleteOnExit()
      }
      dir.toString
    })

  /** Run `body` (which must start AND await a streaming query) with
    * `spark.sql.shuffle.partitions` = n, restoring the old value after.
    * A stateful streaming query creates one state-store instance per
    * shuffle partition PER micro-batch, so the partition count should
    * track state size, not core count — and it is pinned into the
    * checkpoint at first start, which is why it's an explicit knob here
    * rather than whatever the session happened to be configured with.
    * At 100 TB state you'd raise it; for these replays 4 is plenty
    * (measured: 32 → 4 cuts the dedup replay ~1.5x at sf0.1).
    *
    * The state store is pinned to ROCKSDB for the same stateful starts:
    * the default HDFS-backed provider holds every live state row as JVM
    * heap objects, which is the measured 100×-scale ceiling
    * (`stream_session` at the 100× corpus needed a 32 GiB driver heap
    * in local mode purely for session state); RocksDB keeps state in
    * native memory + local disk with bounded block caches, so state
    * capacity stops being a heap concern on both local replays and real
    * executors. Provider choice is also pinned into the checkpoint at
    * first start — set here, not session-wide, so batch work in the
    * same session is untouched.
    *
    * Measured trade at toy scale: RocksDB store open/commit per
    * (partition × micro-batch) costs the sf0.1 replays ~1.7× wall
    * (stream_sql_window 2.9 s → 5.0 s) — a fixed floor, not per-row
    * cost — and removes the measured 32 GiB driver-heap requirement of
    * the 100× session replay. At production state sizes the floor
    * amortizes to nothing; the heap ceiling did not.
    */
  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val keys = Seq(
      "spark.sql.shuffle.partitions" -> n.toString,
      "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
      // changelog checkpointing uploads per-batch DELTAS instead of
      // re-snapshotting the whole store every commit — the snapshot
      // cost is what a many-micro-batch replay pays over and over
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    val old = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** SLIDING event-time windows as a stream: a 1-day window every 12
    * hours, so each event lands in window_duration / slide = 2
    * overlapping windows. The engine's `window(ts, w, slide)` expands
    * each row into its windows MAP-SIDE (one Expand, no self-join) and
    * the state store keys on (window, event_type) — state is bounded by
    * watermark eviction exactly as in the tumbling case, just with
    * w / slide times the live keys. The overlap factor is the scale
    * knob: a 1-day/1-minute slide would hold 1440x the state, which is
    * why the slide is an explicit parameter of the topology and not a
    * sink-side concern.
    */
  def slidingWindowReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val agg = spark.readStream.schema(schema).parquet(stageDir(sfDir))
      .transform(graft.tables.Tables.normalizeEventsTs)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val sink = "graft_stream_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink)
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start_us", "event_type")
  }

  /** Batch-append the events corpus into a family store — the FIXTURE
    * seed for replays whose pinned property is the READ half (an
    * openStream tail + stateful dialect transform). The write-half
    * streaming topology is pinned by stream_family_roundtrip and
    * stream_sql_insert, which keep [[streamIntoFamily]]; every other
    * replay was paying a second streaming query (checkpoint WAL,
    * file-source listing, query start/stop — ~1.5-2 s of fixed floor
    * per replay at sf0.1, StreamProbe-measured) purely to stage the
    * same rows [[graft.sources.TimeSeriesTable.append]] lands in one
    * batch write with the identical layout (date-partitioned,
    * (series, ts)-sorted). Guide §1.2 step 1: remove passes that
    * compute nothing the measured property needs. The outer-join/
    * flush-row replays already seeded this way (the sink log would
    * hide flush rows from the tail); this makes the batch seed the
    * uniform fixture path.
    */
  private def batchSeedFamily(spark: SparkSession, sfDir: String,
      root: String): Unit =
    graft.sources.TimeSeriesTable.append(
      graft.sources.TimeSeriesTable.fromEventsFanned(
        graft.tables.Tables.events(spark, sfDir)), root, "dom", "events")

  /** Run a daily tumbling-window aggregate over the events table *as a
    * stream* (AvailableNow trigger: process all existing data in
    * micro-batches, then stop), materializing into an in-memory sink.
    * Returns the final batch DataFrame — semantically identical to the
    * batch GROUP BY, which is exactly what the DuckDB oracle checks.
    */
  def windowedAggReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    // file streams need an explicit schema; take it from the batch reader
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val agg = spark.readStream.schema(schema).parquet(stageDir(sfDir))
      .transform(graft.tables.Tables.normalizeEventsTs)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val sink = "graft_stream_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink)
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start_us", "event_type")
  }

  /** Streaming heavy hitters: per daily event-time window, the top-k
    * property values by count via the mergeable Misra-Gries summary
    * ([[graft.functions.FreqSketchAgg]]) as a watermarked streaming
    * aggregate. The summary IS the aggregation state, so each
    * (window, series) group holds at most `cap` counters in the state
    * store however many events the window sees — the bounded-state
    * property that makes continuous top-k viable at ingest rates where
    * a per-value count state would grow without limit. Below capacity
    * (this corpus: ≤100 distinct per window) the counts are exact, so
    * the replay equals the batch GROUP BY — what the DuckDB oracle
    * checks; the rendered output is the same portable "item:n,…"
    * string as the dialect's approx_top_k.
    */
  def streamingTopK(spark: SparkSession, sfDir: String, k: Int = 16,
      statePartitions: Int = 4): DataFrame = {
    val cap = math.max(64, 8 * k)
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val agg = spark.readStream.schema(schema).parquet(stageDir(sfDir))
      .transform(graft.tables.Tables.normalizeEventsTs)
      .withColumn("item", get_json_object(col("props"), "$.k"))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(graft.functions.GraftFunctions
        .freqSketch(col("item"), cap).as("sk"))
    val sink = "graft_stream_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink)
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"),
        array_join(transform(slice(col("sk"), 1, k),
          e => concat(e.getField("item"), lit(":"),
            e.getField("n").cast("string"))), ",").as("top"))
      .orderBy("w_start_us", "event_type")
  }

  /** Stream the events table INTO a series-family parquet table — the
    * full `readStream → transform → writeStream` chain with a durable
    * sink: date-partitioned parquet + checkpointing, exactly the shape
    * a production ingest job runs forever with a real trigger. Returns
    * after the AvailableNow replay completes; read the family back with
    * [[graft.sources.TimeSeriesTable.open]].
    */
  def streamIntoFamily(spark: SparkSession, sfDir: String, root: String,
      domain: String, family: String): Unit = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // Repartition by event date + sort by (series, ts) BEFORE the sink —
    // the exact [[graft.sources.TimeSeriesTable.append]] layout
    // discipline, which the streaming ingest previously skipped. Two
    // effects (guide §6 file layout, §2.6 idle capacity): each
    // micro-batch writes ONE file per date instead of (source tasks ×
    // dates) fragments — at production batch sizes that is the
    // difference between rollup-sized files and a small-files explosion
    // the tail consumer then pays to list and open — and the per-date
    // write work spreads over the cluster instead of riding the source
    // split count (measured at sf0.1: the ingest micro-batch's addBatch
    // ran as ONE task on a 32-core host, 1.5–3.5 s of the ~2–3 s replay
    // floor; after the repartition the parse+write fans out per date).
    // The shuffle key is deterministic (to_date(ts) — guide §2.5's
    // retry-safety requirement); row-set and downstream results are
    // unchanged, only file layout and parallelism move. The batch
    // layout's OTHER half — sortWithinPartitions(series, ts) for
    // row-group clustering — is NOT streamable (the analyzer refuses
    // any sort on a streaming frame outside complete-mode aggregates);
    // a family that needs the clustered layout gets it from compact().
    // fromEvents applies AFTER the exchange so the per-row
    // from_json(props) parse fans out with the dates instead of
    // running inside the source split.
    val fam = spark.readStream.schema(schema).parquet(stageDir(sfDir))
      .transform(graft.tables.Tables.normalizeEventsTs)
      .withColumn("dt", to_date(col("ts")))
      .repartition(col("dt"))
      .transform(df => graft.sources.TimeSeriesTable.fromEvents(
        df.drop("dt")).withColumn("dt", to_date(col("ts"))))
    val query = fam.writeStream
      .format("parquet")
      .option("path", s"$root/$domain/$family")
      .option("checkpointLocation", s"$root/.checkpoints/$domain.$family")
      .partitionBy("dt")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** The full streaming family topology end to end: [[streamIntoFamily]]
    * ingests the events table into a date-partitioned family (the write
    * half), [[graft.sources.TimeSeriesTable.openStream]] TAILS that same
    * warehouse path as a file-stream source (the read half), and a
    * watermarked daily tumbling aggregate materializes into a memory
    * sink — ingest job and downstream consumer, exactly the production
    * topology, collapsed into one AvailableNow replay. The result is
    * semantically the batch GROUP BY over the same rows, which is what
    * the DuckDB oracle checks (the `boost_roundtrip` pattern, one layer
    * up the stack).
    *
    * Returns (result, per-micro-batch progress of the TAIL query) — the
    * progress trail lets specs pin that `maxFilesPerTrigger` actually
    * bounds per-batch work instead of one batch swallowing the backlog.
    */
  def familyRoundtripWithProgress(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4, maxFilesPerTrigger: Int = 8)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    val root = tempRoot("graft-famstream")
    streamIntoFamily(spark, sfDir, root, "dom", "events")
    val agg = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events", maxFilesPerTrigger)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("series"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val sink = "graft_stream_" + UUID.randomUUID.toString.replace("-", "")
    val progress = withStatePartitions(spark, statePartitions) {
      val query = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
      query.recentProgress.toSeq
    }
    val out = spark.table(sink)
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("series"), col("n"), col("sum_value"))
      .orderBy("w_start_us", "series")
    (out, progress)
  }

  /** Driver-contract face of [[familyRoundtripWithProgress]]. */
  def streamFamilyRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    familyRoundtripWithProgress(spark, sfDir)._1

  /** The SQL front driving a STREAM end to end: ingest the events into
    * a family store, tail it with [[graft.sources.TimeSeriesTable
    * .openStream]], and run a DIALECT query over the stream via
    * [[graft.boostql.BoostQL.sqlStream]] — stateless
    * projection+filter, so the replay appends with no state store and
    * the result must equal the same dialect query run in batch
    * (the oracle's batch SQL). The reference's north star reaching a
    * continuous query.
    */
  def streamSqlFilterReplay(spark: SparkSession, sfDir: String): DataFrame = {
    val root = tempRoot("graft-sqlstream")
    batchSeedFamily(spark, sfDir, root)
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT purchase.event_id, purchase.user, purchase " +
        "FROM dom.events WHERE purchase > 250.0",
      _ => stream)
    val sink = "graft_sqlstream_" + UUID.randomUUID.toString.replace("-", "")
    val query = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    spark.table(sink).orderBy("purchase_event_id")
  }

  /** The SQL front driving a STATEFUL stream: the watermarked
    * bucket()-keyed continuous aggregate through
    * [[graft.boostql.BoostQL.sqlStream(query:String,families:((String,String))=>org\.apache\.spark\.sql\.DataFrame,watermarkDelay:String)*
    * the 3-arg sqlStream]] — ingest the events into a family store,
    * tail it, and run `GROUP BY bucket(ts, '1 day'), user` over the
    * stream. The dialect compiles the projection/filter half exactly
    * as batch and assembles the aggregation as a watermarked
    * event-time window, so the replay's complete-mode materialization
    * must equal the same dialect query run batch (the oracle's SQL) —
    * the reference's north star (ts functions on the SQL front,
    * README.md:8) reaching live data with REAL state semantics.
    */
  def streamSqlWindowReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlwstream")
    batchSeedFamily(spark, sfDir, root)
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT CAST(bucket(ts, '1 day') AS int) AS d, purchase.user AS u, " +
        "count(*) AS n, sum(CAST(purchase * 100.0 AS int)) AS cents, " +
        "min(purchase) AS lo, max(purchase) AS hi " +
        "FROM dom.events WHERE purchase > 50.0 GROUP BY d, u",
      _ => stream, watermarkDelay = "1 day")
    val sink = "graft_sqlwin_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("d", "u")
  }

  /** Continuous per-window distributions: histogram(x, lo, hi, nbins)
    * inside sqlStream's watermarked bucket()-keyed aggregate. The
    * fixed bin counts are plain sums, so the state per (window, dims)
    * entry is CONSTANT however many events arrive — the streaming twin
    * of the batch histogram, emitting the same portable count string
    * (histogram_quantile reads percentiles off the emitted windows
    * downstream, and histogram_merge rolls daily windows up to months
    * without touching raw points). AvailableNow replay equals the
    * batch bins exactly.
    */
  def streamSqlHistReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlhist")
    batchSeedFamily(spark, sfDir, root)
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT CAST(bucket(ts, '1 day') AS int) AS d, " +
        "histogram(CAST(purchase * 100.0 AS int), 0, 25000, 8) AS h, " +
        "count(*) AS n " +
        "FROM dom.events WHERE purchase IS NOT NULL GROUP BY d",
      _ => stream, watermarkDelay = "1 day")
    val sink = "graft_sqlhist_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("d")
  }

  /** Continuous drift detection: an OLS slope and a correlation —
    * aggregate EXPRESSIONS, the corr/regr parse-time desugar trees —
    * inside sqlStream's watermarked bucket()-keyed aggregate. Every
    * contained pair sum is ordinary watermarked streaming state; the
    * surrounding fixed IEEE arithmetic applies statelessly to each
    * FINALIZED window row, so "is this metric drifting, per user, per
    * day, on live data" runs through the SQL front with no new state
    * kinds. AvailableNow replay equals the batch oracle exactly (the
    * sums are exact integers; the tail is the same fixed sequence).
    */
  def streamSqlRegrReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlregr")
    batchSeedFamily(spark, sfDir, root)
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT CAST(bucket(ts, '1 day') AS int) AS d, purchase.user AS u, " +
        "regr_slope(CAST(purchase * 100.0 AS int), " +
        "           CAST(purchase.event_id AS int)) AS sl, " +
        "corr(CAST(purchase.event_id AS int), " +
        "     CAST(purchase * 100.0 AS int)) AS r, " +
        "count(*) AS n " +
        "FROM dom.events WHERE purchase > 50.0 GROUP BY d, u",
      _ => stream, watermarkDelay = "1 day")
    val sink = "graft_sqlregr_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("d", "u")
  }

  /** The watermarked streaming-SQL aggregate WITH a HAVING tail: the
    * dialect compiles HAVING to a stateless filter on the finalized
    * window rows (extra aggregates named only in the condition are
    * computed hidden and dropped — here max(purchase)). Complete-mode
    * AvailableNow replay, so the result equals the batch oracle with
    * the same HAVING.
    */
  def streamSqlHavingReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlhav")
    batchSeedFamily(spark, sfDir, root)
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT CAST(bucket(ts, '1 day') AS int) AS d, purchase.user AS u, " +
        "count(*) AS n, sum(CAST(purchase * 100.0 AS int)) AS cents " +
        "FROM dom.events WHERE purchase > 50.0 GROUP BY d, u " +
        "HAVING count(*) >= 2 AND max(purchase) < 370.0",
      _ => stream, watermarkDelay = "1 day")
    val sink = "graft_sqlhav_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("d", "u")
  }

  /** Continuous heavy hitters THROUGH THE SQL FRONT: the dialect's
    * `approx_top_k(x, k)` inside the watermarked `bucket()`-keyed
    * streaming aggregate — `BoostQL.sqlStream` compiles it to the
    * Misra-Gries summary as event-time window state (capacity-bounded
    * per (window, dims) entry however many events arrive). Exact below
    * capacity, so the AvailableNow replay hash-matches the batch
    * count+rank oracle.
    */
  def streamSqlTopKReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqltopk")
    batchSeedFamily(spark, sfDir, root)
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT CAST(bucket(ts, '1 day') AS int) AS d, " +
        "approx_top_k(click.k, 16) AS top, count(*) AS n " +
        "FROM dom.events GROUP BY d",
      _ => stream, watermarkDelay = "1 day")
    val sink = "graft_sqltopk_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("d")
  }

  /** The SLIDING form of the dialect-over-stream aggregate:
    * `bucket(ts, '1 day', '12 hours')` through `BoostQL.sqlStream`
    * compiles to the engine's `window(ts, w, slide)` — map-side Expand
    * into width/slide windows, watermark-evicted state keyed on
    * (window, dims). Complete-mode AvailableNow replay; the batch
    * oracle replays the expansion with an explicit 2-row cross join.
    */
  def streamSqlSlidingReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlslstream")
    batchSeedFamily(spark, sfDir, root)
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT CAST(bucket(ts, '1 day', '12 hours') AS int) AS d, " +
        "count(*) AS n, sum(CAST(view * 100.0 AS int)) AS cents " +
        "FROM dom.events WHERE view > 50.0 GROUP BY d",
      _ => stream, watermarkDelay = "1 day")
    val sink = "graft_sqlslide_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("d")
  }

  /** Continuous SQL ingest end to end: ingest the events into a family
    * store, tail it, and run [[graft.boostql.BoostQL.sqlStreamInsert]]
    * — the same INSERT text that runs in batch — to keep a DERIVED
    * family continuously fed (stateless transform tier). Read the
    * derived family back with a batch dialect query; must equal the
    * batch [[graft.boostql.BoostQL.sqlInsert]] of the same statement.
    */
  def streamSqlInsertReplay(spark: SparkSession, sfDir: String): DataFrame = {
    val root = tempRoot("graft-sqlinsert")
    streamIntoFamily(spark, sfDir, root, "dom", "events")
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    graft.boostql.BoostQL.sqlStreamInsert(
      "INSERT INTO dom.derived SELECT ts, purchase AS p, " +
        "purchase * 2.0 AS p2 FROM dom.events",
      _ => stream, root)
    val reread = graft.sources.TimeSeriesTable.open(spark, root, "dom", "derived")
    graft.boostql.BoostQL.sql("SELECT p, p2, ts FROM dom.derived WHERE p > 250.0",
        _ => reread)
      .orderBy("ts")
  }

  /** SESSION windows through the SQL FRONT: `GROUP BY session(ts,
    * '<gap>')` inside `BoostQL.sqlStream` compiles to the engine's
    * `session_window` — open sessions per (user) key held in the state
    * store, merged/extended as events arrive, finalized when the
    * watermark passes last-event + gap. The batch dialect's `session()`
    * window function computes per-key session IDS over a static frame;
    * this is the same sessionization running CONTINUOUSLY, the shape a
    * static gaps-and-islands window cannot express incrementally.
    * Complete-mode AvailableNow replay equals the batch
    * gaps-and-islands oracle (session start = first event ts on both
    * sides).
    */
  def streamSqlSessionReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlsess")
    batchSeedFamily(spark, sfDir, root)
    val stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT session(ts, '6 hours') AS w, click.user AS u, " +
        "count(*) AS n, sum(CAST(click * 100.0 AS int)) AS cents " +
        "FROM dom.events GROUP BY w, u",
      _ => stream, watermarkDelay = "1 day")
    val sink = "graft_sqlsess_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("u", "w")
  }

  /** Stream-stream JOIN through the SQL FRONT: the dialect's
    * two-family interval-bounded equi-join — `BoostQL.sqlStream`
    * compiles `ON a.click.user = b.purchase.user AND b.ts BETWEEN a.ts
    * AND a.ts + INTERVAL '1 hour'` into a watermarked stream-stream
    * inner join (per-side `withWatermark` at the sources; the interval
    * arithmetic is native ts ± day-time-interval, the shape the
    * engine's state-eviction analysis recognizes, so join state is
    * bounded by watermark + bound). Append-mode AvailableNow replay
    * must equal the same join run batch (the DuckDB oracle). The
    * watermark delay covers the within-day disorder of the family
    * files (rows sort series-major inside a partition), the honest
    * "max expected lateness" dial of a production deployment.
    */
  def streamSqlJoinReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqljoin")
    batchSeedFamily(spark, sfDir, root)
    def stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT a.click.event_id AS click_id, a.click.user AS u, " +
        "b.purchase.event_id AS purchase_id " +
        "FROM dom.events AS a JOIN dom.events AS b " +
        "ON a.click.user = b.purchase.user " +
        "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '1 hour'",
      _ => stream, watermarkDelay = "2 days")
    val sink = "graft_sqljoin_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("click_id", "purchase_id")
  }

  /** Append two far-future FLUSH rows to a family — one per series so
    * each survives that side's series filter (predicates push below
    * the watermark node, so a row filtered out never advances the
    * watermark). An AvailableNow replay of a watermark-gated topology
    * (outer join's null-extension, window finalize over a join)
    * otherwise WITHHOLDS the final `delay + bound` of results: the
    * watermark only trails data. Production streams don't need this —
    * new data keeps arriving — it is the replay-determinism analogue of
    * "close the books at end of day". The two rows use distinct marker
    * users and a week between them so they can never join each other.
    */
  private def appendFlushRows(spark: SparkSession, sfDir: String,
      root: String, domain: String, family: String,
      series: Seq[String]): Unit = {
    import spark.implicits._
    val maxTs = graft.tables.Tables.events(spark, sfDir)
      .agg(max(col("ts"))).head.getTimestamp(0)
    val rows = series.zipWithIndex.map { case (s, i) =>
      (s, new java.sql.Timestamp(maxTs.getTime + (4L + 7L * i) * 86400000L),
        0.0, Map.empty[String, String],
        Map("user" -> s"__flush_$i", "event_id" -> "0"))
    }
    graft.sources.TimeSeriesTable.append(
      rows.toDF("series", "ts", "value", "tags", "attributes"),
      root, domain, family)
  }

  /** Streaming LEFT OUTER join through the SQL FRONT: the dialect's
    * interval-bounded two-family equi-join with LEFT JOIN — unmatched
    * clicks emit null-extended once the purchase side's watermark has
    * passed their match window (the engine's outer stream-stream join;
    * state bounded exactly as the inner form). The AvailableNow replay
    * appends flush rows first ([[appendFlushRows]]) so the watermark
    * passes all real data and the tail's unmatched rows actually emit;
    * the flush markers are dropped from the returned frame. Must equal
    * the same LEFT JOIN run batch (the DuckDB oracle).
    */
  def streamSqlLeftJoinReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlljoin")
    // BATCH-append the family (not streamIntoFamily): a streaming-sink
    // directory carries a _spark_metadata log, and the file-stream tail
    // then honors ONLY the files that log committed — the flush rows
    // appended after ingest would be invisible and the watermark would
    // never pass the real data (measured: the tail's unmatched rows
    // simply missing). The write-half streaming topology is pinned by
    // stream_family_roundtrip / stream_sql_insert; this replay pins the
    // outer-join semantics.
    batchSeedFamily(spark, sfDir, root)
    appendFlushRows(spark, sfDir, root, "dom", "events",
      Seq("click", "purchase"))
    def stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT a.click.event_id AS click_id, a.click.user AS u, " +
        "b.purchase.event_id AS purchase_id " +
        "FROM dom.events AS a LEFT JOIN dom.events AS b " +
        "ON a.click.user = b.purchase.user " +
        "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '1 hour'",
      _ => stream, watermarkDelay = "2 days")
    val sink = "graft_sqlljoin_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    // coalesce(…, true): a null-keyed click survives the flush filter
    // (startsWith on NULL is NULL, which a bare filter would drop) —
    // the batch LEFT JOIN oracle preserves null-key clicks null-extended
    spark.table(sink)
      .filter(coalesce(!col("u").startsWith("__flush_"), lit(true)))
      .orderBy("click_id", "purchase_id")
  }

  /** FULL OUTER stream-stream join through the SQL FRONT — both sides
    * null-extend: unmatched clicks AND unmatched purchases emit once
    * the opposite watermark passes their match window. Both join keys
    * are selected (`u` from the click side, `pu` from the purchase
    * side) so the flush markers are identifiable on whichever side
    * carries them — a null-extended row has a null key on the OTHER
    * side, which a naive one-sided `u != flush` filter would
    * null-drop. Must equal the batch FULL JOIN (the DuckDB oracle).
    */
  def streamSqlFullJoinReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlfjoin")
    batchSeedFamily(spark, sfDir, root)
    appendFlushRows(spark, sfDir, root, "dom", "events",
      Seq("click", "purchase"))
    def stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT a.click.event_id AS click_id, a.click.user AS u, " +
        "b.purchase.event_id AS purchase_id, b.purchase.user AS pu " +
        "FROM dom.events AS a FULL JOIN dom.events AS b " +
        "ON a.click.user = b.purchase.user " +
        "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '1 hour'",
      _ => stream, watermarkDelay = "2 days")
    val sink = "graft_sqlfjoin_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink)
      .filter(coalesce(!col("u").startsWith("__flush_"), lit(true)) &&
        coalesce(!col("pu").startsWith("__flush_"), lit(true)))
      .orderBy("click_id", "purchase_id")
  }

  /** Windowed aggregation OVER the joined stream through the SQL FRONT
    * — the enrich-then-rollup pipeline: the interval-bounded
    * click⋈purchase join chained into a per-(day, user) continuous
    * rollup, compiled by `BoostQL.sqlStream` as two stateful operators
    * in append mode (join state evicted behind the watermarks + ON
    * bound; window state evicted as the watermark finalizes windows —
    * the time axis carries its watermark THROUGH the join, no second
    * `withWatermark`). Flush rows advance the watermark past all real
    * data so every window finalizes in the replay; they match no real
    * user, so no joined row (and no window) contains them. Must equal
    * the same join+GROUP BY run batch (the DuckDB oracle).
    */
  def streamSqlJoinAggReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqljagg")
    // batch append, same reason as streamSqlLeftJoinReplay: the flush
    // rows must be visible to the file-stream tail
    batchSeedFamily(spark, sfDir, root)
    appendFlushRows(spark, sfDir, root, "dom", "events",
      Seq("click", "purchase"))
    def stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val out = graft.boostql.BoostQL.sqlStream(
      "SELECT CAST(bucket(a.ts, '1 day') AS int) AS d, " +
        "a.click.user AS u, count(*) AS n, " +
        "sum(CAST(b.purchase * 100.0 AS int)) AS cents " +
        "FROM dom.events AS a JOIN dom.events AS b " +
        "ON a.click.user = b.purchase.user " +
        "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '1 hour' " +
        "GROUP BY d, u",
      _ => stream, watermarkDelay = "2 days")
    val sink = "graft_sqljagg_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("d", "u")
  }

  /** HOT-KEY-PROOF stream-stream interval equi-join — the bucketed
    * decomposition of `l JOIN r ON keys AND r.ts − l.ts ∈ [lo, hi]`.
    *
    * Why it exists: the engine's symmetric hash join keeps per-KEY
    * state and, for every arriving row, probes EVERY stored row of
    * that key, filtering the time bound afterwards. Under a hot key
    * (one user holding a large share of both sides) that probe is
    * quadratic in the key's row count even when the time bound keeps
    * the true match set tiny — measured on this host: the joined-
    * stream rollup read 92× its uniform-key time at a 3× corpus with a
    * 33% hot user (BENCH_scale_skew.json's stream tier), pure state-
    * probe cost. No shuffle/AQE knob helps: the skew is within one
    * key, not across partitions.
    *
    * The decomposition: both sides get a derived TIME-BUCKET equi key
    * of width w = max(hi − lo, 1) µs. A right row lives in bucket
    * ⌊r.ts / w⌋; a left row's match window [l.ts+lo, l.ts+hi] spans at
    * most TWO buckets (its width is ≤ w), so the left side EXPLODES
    * into those 1–2 buckets and the join adds `l.bucket = r.bucket`.
    * Every true pair matches exactly once (the right row's bucket is
    * one of the left row's ≤2 distinct buckets), the exact time bounds
    * still apply (native ts ± interval terms, so the engine's state-
    * eviction analysis keeps both sides' state bounded by watermark +
    * bound), and a probe now fetches only the hot key's rows in ONE
    * w-wide bucket — O(rows per bound window), not O(rows in the
    * watermark horizon). Left-side state doubles (≤2 buckets per row);
    * that is the entire price.
    *
    * INNER joins only: an outer join would null-extend each unmatched
    * exploded copy, duplicating the null-extension — refuse rather
    * than emit duplicates. Works identically on batch frames (the
    * bucket key is then just a redundant conjunct), which is how the
    * spec pins pair-exactness incl. bucket-boundary ties.
    *
    * `keys` pairs left/right key column names; caller projects the two
    * sides to distinct column names and (for streams) sets
    * `withWatermark` on each side's ts column first.
    */
  def bucketedIntervalJoin(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], tsLoUs: Long, tsHiUs: Long,
      leftTs: String = "ts", rightTs: String = "ts"): DataFrame = {
    require(keys.nonEmpty, "bucketedIntervalJoin needs at least one equi key")
    require(tsHiUs >= tsLoUs,
      s"empty interval [$tsLoUs, $tsHiUs] — no row can ever match")
    val w = math.max(tsHiUs - tsLoUs, 1L)
    // floorDiv as an expression (pmod is non-negative, so this floors
    // toward -inf — integer-exact, unlike a double division)
    def floorDiv(c: org.apache.spark.sql.Column, d: Long) =
      ((c - pmod(c, lit(d))) / lit(d)).cast("long")
    val lUs = unix_micros(col(leftTs))
    val lExploded = left
      .withColumn("__gbkt", explode(array_distinct(array(
        floorDiv(lUs + lit(tsLoUs), w), floorDiv(lUs + lit(tsHiUs), w)))))
    val rBucketed = right
      .withColumn("__gbkt_r", floorDiv(unix_micros(col(rightTs)), w))
    def iv(us: Long) =
      lit(java.time.Duration.ofNanos(math.multiplyExact(us, 1000L)))
    val cond = keys.map { case (lk, rk) => col(lk) === col(rk) }
      .reduce(_ && _) &&
      col("__gbkt") === col("__gbkt_r") &&
      col(rightTs) >= col(leftTs) + iv(tsLoUs) &&
      col(rightTs) <= col(leftTs) + iv(tsHiUs)
    lExploded.join(rBucketed, cond, "inner")
      .drop("__gbkt", "__gbkt_r")
  }

  /** The joined-stream rollup ([[streamSqlJoinAggReplay]]'s topology)
    * over [[bucketedIntervalJoin]] — the HOT-KEY path: same output
    * contract (per day-of-click, per user: pair count + exact integer
    * cents), hash-matched against the same DuckDB oracle, but the join
    * state probes stay bounded per (user, hour-bucket) however hot one
    * user runs. The skew artifact benches this against the raw SQL
    * form on the hot-user corpus.
    */
  def streamJoinAggBucketedReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-bjagg")
    batchSeedFamily(spark, sfDir, root)
    appendFlushRows(spark, sfDir, root, "dom", "events",
      Seq("click", "purchase"))
    def stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    val clicks = stream.filter(col("series") === "click")
      .select(element_at(col("attributes"), "user").as("u"),
        col("ts").as("cts"))
      .withWatermark("cts", "2 days")
    val purchases = stream.filter(col("series") === "purchase")
      .select(element_at(col("attributes"), "user").as("pu"),
        col("ts").as("pts"), col("value").as("pv"))
      .withWatermark("pts", "2 days")
    val joined = bucketedIntervalJoin(clicks, purchases,
      Seq("u" -> "pu"), 0L, 3600L * 1000000L, "cts", "pts")
    val agged = joined
      .groupBy(window(col("cts"), "86400000000 microseconds"), col("u"))
      .agg(count(lit(1)).as("n"),
        sum((col("pv") * 100.0).cast("long")).as("cents"))
      .select(col("window.start").cast("long").as("d"), col("u"),
        col("n"), col("cents"))
    val sink = "graft_bjagg_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = agged.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).orderBy("d", "u")
  }

  /** Continuous materialization OVER the joined stream: the
    * enrich-then-rollup pipeline (stream-stream interval join +
    * windowed aggregation — [[streamSqlJoinAggReplay]]'s topology)
    * piped STRAIGHT into a derived family via
    * [[graft.boostql.BoostQL.sqlStreamInsert]] — the INSERT face now
    * accepts the joined-stream aggregate, with the dimension key
    * (user) landing as a per-point ATTRIBUTE on every rollup row. The
    * derived family is read back with ordinary batch dialect queries
    * (`n.u` = the user attribute of the `n` rollup series) and must
    * equal the batch join+GROUP BY oracle — write path adds and loses
    * nothing. Flush rows close the books (their users never join each
    * other, so they contaminate no rollup rows).
    */
  def streamSqlJoinInsertReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqljins")
    batchSeedFamily(spark, sfDir, root)
    appendFlushRows(spark, sfDir, root, "dom", "events",
      Seq("click", "purchase"))
    def stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    withStatePartitions(spark, statePartitions) {
      graft.boostql.BoostQL.sqlStreamInsert(
        "INSERT INTO dom.jagg SELECT bucket(a.ts, '1 day') AS ts, " +
          "a.click.user AS u, count(*) AS n, " +
          "sum(CAST(b.purchase * 100.0 AS int)) AS cents " +
          "FROM dom.events AS a JOIN dom.events AS b " +
          "ON a.click.user = b.purchase.user " +
          "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '1 hour' " +
          "GROUP BY ts, u",
        _ => stream, root, watermark = Some("2 days"))
    }
    val reread = graft.sources.TimeSeriesTable.open(spark, root, "dom", "jagg")
    graft.boostql.BoostQL.sql(
      "SELECT ts, n.u AS u, n AS v FROM dom.jagg " +
        "UNION ALL SELECT ts, cents.u AS u, cents AS v FROM dom.jagg " +
        "ORDER BY ts, u, v", _ => reread)
  }

  /** Continuous SESSION materialization: the session-window aggregate
    * ([[streamSqlSessionReplay]]'s topology) piped into a derived
    * family via sqlStreamInsert — per-user activity sessions land as
    * family rows keyed by session START (the new time axis), user as a
    * per-point attribute. Append-mode parquet sinks emit FINALIZED
    * sessions only, so the replay needs the flush row to advance the
    * watermark past the tail sessions (the complete-mode memory sink
    * of the query-only replay sidesteps this; a file sink cannot) —
    * the flush user's own one-row session is filtered from the
    * read-back.
    */
  def streamSqlSessionInsertReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val root = tempRoot("graft-sqlsessins")
    batchSeedFamily(spark, sfDir, root)
    appendFlushRows(spark, sfDir, root, "dom", "events", Seq("click"))
    def stream = graft.sources.TimeSeriesTable
      .openStream(spark, root, "dom", "events")
    withStatePartitions(spark, statePartitions) {
      graft.boostql.BoostQL.sqlStreamInsert(
        "INSERT INTO dom.sess SELECT session(ts, '6 hours') AS ts, " +
          "click.user AS u, count(*) AS n, " +
          "sum(CAST(click * 100.0 AS int)) AS cents " +
          "FROM dom.events GROUP BY ts, u",
        _ => stream, root, watermark = Some("1 day"))
    }
    val reread = graft.sources.TimeSeriesTable.open(spark, root, "dom", "sess")
    graft.boostql.BoostQL.sql(
      "SELECT ts, n.u AS u, n AS v FROM dom.sess " +
        "WHERE NOT n.u LIKE '__flush%' " +
        "UNION ALL SELECT ts, cents.u AS u, cents AS v FROM dom.sess " +
        "WHERE NOT cents.u LIKE '__flush%' " +
        "ORDER BY ts, u, v", _ => reread)
  }

  /** Streaming sessionization: merge each user's events into activity
    * sessions separated by more than `gap` of event-time silence —
    * `session_window` keeps per-key open sessions in the state store and
    * merges/extends them as events arrive, the genuinely-stateful
    * streaming operator the batch gaps-and-islands window
    * ([[graft.operators.TimeSeriesOps.sessionize]]) cannot express
    * incrementally. Session end is last-event + gap (Spark's session
    * contract), which the oracle reproduces as `max(ts) + gap`.
    *
    * Scale stance: state is one open session per (user, session) — the
    * watermark closes sessions `gap` behind the max event time, so state
    * is bounded by concurrently-active users, not history. Replay uses
    * complete mode (memory sink at test scale); a production job would
    * run append mode and emit sessions as the watermark finalizes them.
    */
  def sessionWindowReplay(spark: SparkSession, sfDir: String,
      gap: String = "6 hours", statePartitions: Int = 4): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val agg = spark.readStream.schema(schema).parquet(stageDir(sfDir))
      .transform(graft.tables.Tables.normalizeEventsTs)
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val sink = "graft_session_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink)
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("w_start_us"),
        unix_micros(col("session_window.end")).as("w_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "w_start_us")
  }

  /** Stream-stream interval join: for every click, the purchases by the
    * same user within the following hour — the canonical funnel/
    * attribution join. Both sides are unbounded streams; the watermarks
    * plus the time-bound join condition let the engine expire join state
    * (a click older than watermark + 1 hour can never match again), so
    * state is bounded by the interval, not history. Inner-join matches
    * emit as soon as both rows arrive (append mode — no
    * watermark-withholding at end of replay).
    */
  def streamIntervalJoinReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    def src = spark.readStream.schema(schema).parquet(stageDir(sfDir))
      .transform(graft.tables.Tables.normalizeEventsTs)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
    val sink = "graft_sjoin_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("delay_us"))
      .orderBy("click_id", "purchase_id")
  }

  /** Stream-STATIC enrichment join + rollup: the event stream joined to
    * a batch dimension table (customers) and aggregated per
    * (market segment, event type) — the other canonical streaming join
    * topology, complementing the stream-stream interval join: telemetry
    * enriched with a slowly-changing dimension. No watermark and NO
    * JOIN STATE at all — the static side is planned into every
    * micro-batch as a fresh broadcast (dimension updates between
    * batches are picked up; at 100 TB/day stream rates the dimension
    * re-scan per trigger is why production dims are compact parquet —
    * or the join key is pre-bucketed on both sides). The explicit
    * `broadcast()` pins the no-shuffle plan: the stream side never
    * repartitions for the join, only for the downstream aggregation.
    */
  def streamStaticJoinReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val events = spark.readStream.schema(schema).parquet(stageDir(sfDir))
      .transform(graft.tables.Tables.normalizeEventsTs)
    val dim = graft.tables.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = events
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val sink = "graft_ssj_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink)
      .select("c_mktsegment", "event_type", "n", "sum_value")
      .orderBy("c_mktsegment", "event_type")
  }

  /** Continuous MERGE into a family: the stream lands through
    * per-micro-batch UPSERT ([[graft.sources.TimeSeriesTable.upsertRows]])
    * instead of blind append, so an at-least-once upstream — or a
    * restarted query replaying a committed batch — never duplicates
    * points. This is the `foreachBatch` + idempotent-verb pattern, the
    * standard way to get effectively-once file sinks without a
    * transactional store: the checkpoint makes batch REPLAY possible,
    * the merge key (series, ts) makes replay HARMLESS.
    *
    * The replay proves exactly that property the hard way: the SAME
    * staged stream is run TWICE (separate checkpoints — a full
    * re-delivery, the worst case a restart can produce). Through
    * append-based ingest the family would double; through UPSERT the
    * second delivery replaces the first and the family equals the batch
    * source exactly — which is what the DuckDB oracle checks. A
    * duplicate (series, ts) key inside one delivery would REFUSE
    * loudly rather than resolve arbitrarily (upsertRows' contract), so
    * the parity claim cannot silently depend on arrival order.
    */
  def streamUpsertReplay(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val root = tempRoot("graft-supsert")
    def deliver(tag: String): Unit = {
      val fam = spark.readStream.schema(schema).parquet(stageDir(sfDir))
        .transform(graft.tables.Tables.normalizeEventsTs)
        .select(col("event_type").as("series"), col("ts"), col("value"),
          map().cast("map<string,string>").as("tags"),
          map(lit("user"), col("user_id").cast("string")).as("attributes"))
      withStatePartitions(spark, statePartitions) {
        val q = fam.writeStream
          .option("checkpointLocation", s"$root/ckpt_$tag")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            graft.sources.TimeSeriesTable.upsertRows(
              spark, root.toString, "dom", "events", batch)
            ()
          }
          .start()
        q.awaitTermination()
      }
    }
    deliver("first")
    deliver("redelivery")
    graft.sources.TimeSeriesTable.open(spark, root.toString, "dom", "events")
      .select(col("series"), col("ts"), col("value"),
        element_at(col("attributes"), "user").as("user"))
      .orderBy("series", "ts")
  }

  /** Streaming corpus curation: run the (narrow) model-scoring tier
    * over a DOCUMENT stream and keep a running per-language keep/drop
    * ledger — the shape of a live ingest filter in front of a training
    * pipeline. [[graft.operators.TextAnalysisOps.classifierScore]] is
    * applied to the stream UNCHANGED: the whole curation map tier is
    * partitioning- and mode-agnostic (no shuffle, no state), so batch
    * and streaming replays are bit-identical — which is exactly what
    * the batch DuckDB oracle checks. State is one ledger row per
    * (lang, keep): O(languages), watermark-free.
    */
  def streamingCurationReplay(spark: SparkSession, sfDir: String,
      weights: Array[Double], bias: Double,
      statePartitions: Int = 4): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val docs = spark.readStream.schema(schema)
      .parquet(stageDir(sfDir, "documents"))
    val scored = graft.operators.TextAnalysisOps
      .classifierScore(docs, "doc_id", "text", weights, bias)
    val ledger = scored.groupBy(col("lang"), col("keep"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    val sink = "graft_curate_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = ledger.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).select("lang", "keep", "n_docs", "sum_tokens")
      .orderBy("lang", "keep")
  }

  /** Streaming exact-dedup: drop duplicate event_ids within the
    * watermark horizon — the streaming face of the dedup tier. Returns
    * the deduplicated count per event_type after full replay.
    */
  def streamingDedupCounts(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val deduped = spark.readStream.schema(schema).parquet(stageDir(sfDir))
      .transform(graft.tables.Tables.normalizeEventsTs)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val sink = "graft_dedup_" + UUID.randomUUID.toString.replace("-", "")
    withStatePartitions(spark, statePartitions) {
      val query = deduped.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
    }
    spark.table(sink).select(col("event_type"), col("n"))
      .orderBy("event_type")
  }

  /** Near-dup candidate detection over a DOCUMENT STREAM, fully
    * CONTINUOUS: word-3-gram shingles per document (distinct within a
    * doc), one stateful aggregation keyed by shingle counting the docs
    * that carry it (level 1), and a per-micro-batch `foreachBatch`
    * rollup of those counts into the 3-number candidate summary
    * (level 2) — shingles shared by >= 2 docs are the near-dup
    * candidate generators, Σ n(n-1)/2 the candidate-pair volume. The
    * engine cannot chain two streaming aggregations in one plan, but
    * the rollup needs no cross-batch state of its own: complete mode
    * re-emits the LEVEL-1 state table each micro-batch, and the
    * `foreachBatch` body aggregates it batch-side — so after EVERY
    * micro-batch the current candidate counts exist as a summary row,
    * not only after a post-hoc batch pass over a sink. Returns the
    * last (fully-drained) summary; [[streamingShingleRollups]] exposes
    * the whole per-batch trajectory (pinned monotone non-decreasing in
    * StreamingSpec — counts only grow as documents arrive).
    *
    * Shingles here are plain strings (SQL-replicable, hence the DuckDB
    * oracle); the batch tier's hashed-shingle kernels are the scale
    * path, and at 100 TB the streaming state would key on LSH band
    * buckets rather than raw shingles — same topology, bounded keys,
    * and the level-2 rollup stays a narrow aggregate of the bounded
    * state table.
    */
  def streamingShingleCandidates(spark: SparkSession, sfDir: String,
      statePartitions: Int = 4): DataFrame = {
    import spark.implicits._
    val rollups = streamingShingleRollups(spark,
      stageDir(sfDir, "documents"), statePartitions)
    require(rollups.nonEmpty, "the replay produced no micro-batches")
    Seq(rollups.maxBy(_._1)).map { case (_, ns, cs, cp) => (ns, cs, cp) }
      .toDF("n_shingles", "cand_shingles", "cand_pairs")
  }

  /** The continuous topology behind [[streamingShingleCandidates]],
    * returning one (batchId, n_shingles, cand_shingles, cand_pairs)
    * row PER MICRO-BATCH — the live candidate-count trajectory a
    * monitoring job would chart. `maxFilesPerTrigger` splits a
    * multi-file stage into several micro-batches so the trajectory is
    * observable in tests.
    */
  def streamingShingleRollups(spark: SparkSession, docsDir: String,
      statePartitions: Int = 4, maxFilesPerTrigger: Int = 0)
      : Seq[(Long, Long, Long, Long)] = {
    val schema = spark.read.parquet(docsDir).schema
    val reader = spark.readStream.schema(schema)
    if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val docs = reader.parquet(docsDir)
    val words = split(col("text"), " ")
    val n = greatest(size(words) - lit(2), lit(1))
    val shingles = array_distinct(transform(sequence(lit(1), n),
      i => concat_ws(" ", slice(words, i, lit(3)))))
    val perShingle = docs.select(explode(shingles).as("g"))
      .groupBy("g").agg(count(lit(1)).as("n"))
    val rollups =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    withStatePartitions(spark, statePartitions) {
      val query = perShingle.writeStream
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batchDf: DataFrame, batchId: Long) =>
          // level 2: a narrow batch aggregate of the level-1 state
          // table this micro-batch emitted — no sink, no second
          // stateful operator, no post-hoc pass
          val r = batchDf.agg(
            count(lit(1)).as("n_shingles"),
            coalesce(sum(when(col("n") >= 2, 1L).otherwise(0L)), lit(0L))
              .as("cand_shingles"),
            coalesce(sum((col("n") * (col("n") - lit(1)) / lit(2))
              .cast("long")), lit(0L)).as("cand_pairs")).head()
          rollups.synchronized {
            rollups += ((batchId, r.getLong(0), r.getLong(1), r.getLong(2)))
          }
          ()
        }
        .start()
      query.awaitTermination()
    }
    rollups.toSeq.sortBy(_._1)
  }
}
