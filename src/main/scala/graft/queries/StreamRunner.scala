package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Shared plumbing for the streaming driver entries (qp60/qp64/qp72):
  * stage the single-file fixture into a temp directory (the file stream
  * source requires a directory basePath), scope the shuffle-partition
  * setting to the query start, drain with AvailableNow, and clean up
  * the staging copy afterwards — the previous per-entry copies leaked
  * one fixture copy per invocation and hand-rolled the conf dance
  * three times. */
object StreamRunner {

  /** Stateful streaming ops keep state stores per shuffle partition
    * (a stream-stream join keeps FOUR); at fixture scale the per-store
    * commit is pure overhead, so entries start their query under a
    * smaller setting. Captured at START — restoring after start() is
    * safe. A real deployment sizes partitions to state volume. */
  private def startWithPartitions[T](s: SparkSession, n: Int)(
      start: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try { s.conf.set("spark.sql.shuffle.partitions", n.toString); start }
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Replay `dir/events.parquet` as a bounded stream through `build`,
    * drain it into a memory sink with AvailableNow, and return the sink
    * table. The staged copy is deleted before returning. */
  def replayEvents(s: SparkSession, dir: String, sinkName: String,
      outputMode: String, statePartitions: Int = 8)(
      build: DataFrame => DataFrame): DataFrame =
    // same layout-adaptive ts normalization as the batch loaders
    replayParquet(s, s"$dir/events.parquet", sinkName, outputMode,
      statePartitions)(raw => build(graft.Tables.normalizeEventTs(raw)))

  /** Replay any single parquet file as a bounded stream — the
    * ingest-time shape of the batch curation operators (filter/score at
    * read time instead of in a later batch pass). */
  /** Stage a single parquet file into a fresh temp directory (the file
    * stream source requires a directory basePath) and run `body` with
    * the batch-read frame (for its schema / empty fallback) and the
    * staged directory path; the staging copy is deleted afterwards.
    * Cleanup is best-effort: a stray file in the staging dir would
    * otherwise throw DirectoryNotEmptyException from finally and MASK
    * the query's own failure (ADVICE r5). Shared by both replay
    * runners — the scaffolding was previously hand-rolled per runner,
    * the exact drift this object exists to prevent. */
  private def withStagedFile[T](s: SparkSession, path: String,
      prefix: String)(body: (DataFrame, String) => T): T = {
    val raw = s.read.parquet(path)
    val fileName = java.nio.file.Paths.get(path).getFileName.toString
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    val staged = tmp.resolve(fileName)
    java.nio.file.Files.copy(java.nio.file.Paths.get(path), staged)
    try body(raw, tmp.toString)
    finally {
      try {
        java.nio.file.Files.deleteIfExists(staged)
        java.nio.file.Files.deleteIfExists(tmp)
      } catch { case _: java.io.IOException => () }
    }
  }

  def replayParquet(s: SparkSession, path: String, sinkName: String,
      outputMode: String, statePartitions: Int = 8)(
      build: DataFrame => DataFrame): DataFrame =
    withStagedFile(s, path, s"${sinkName}_replay") { (raw, dir) =>
      val stream = s.readStream.schema(raw.schema).parquet(dir)
      val q = startWithPartitions(s, statePartitions) {
        build(stream)
          .writeStream.format("memory").queryName(sinkName)
          .outputMode(outputMode).trigger(Trigger.AvailableNow())
          .start()
      }
      try q.awaitTermination() finally q.stop()
      // Localize the sink and DROP its temp view before returning: the
      // memory sink already holds the replayed rows on the driver, so
      // the copy is reference-sized — and without the drop every
      // bench/verify invocation leaked one uniquely-named sink table
      // (and its rows) for the life of the session (ADVICE r5).
      val sink = s.table(sinkName)
      val rows = sink.collect()
      s.catalog.dropTempView(sinkName)
      s.createDataFrame(
        java.util.Arrays.asList(rows: _*), sink.schema)
    }

  /** Replay a single parquet file as a bounded stream processed
    * per-micro-batch with `foreachBatch` — the runner for ingest
    * operators whose per-batch logic needs full batch DataFrame
    * semantics (windows, multi-join verdict assembly) that Spark's
    * continuous operators disallow on an unbounded stream. Inside
    * foreachBatch each micro-batch is a plain bounded DataFrame, so the
    * SAME batch operator (e.g.
    * [[graft.pipeline.Dedup.incrementalNearDupIndexed]]) runs unchanged
    * against each arriving batch — one code path for backfill and
    * ingest, the production pattern for stream-static enrichment that
    * outgrows a single equijoin.
    *
    * The streaming query itself holds NO state (foreachBatch is a
    * stateless sink; all cross-batch context lives in the static side —
    * a prebuilt index). `assertStateless = true` makes the runner VERIFY
    * that from the query's own progress events, so an accidental
    * stateful op in `classify`'s surroundings fails loudly instead of
    * silently accreting a state store.
    *
    * Results accumulate on the driver (reference-sized per the memory
    * sink's own contract here — verdict rows, not documents). */
  def replayParquetBatches(s: SparkSession, path: String,
      statePartitions: Int = 8, assertStateless: Boolean = false)(
      classify: DataFrame => DataFrame): DataFrame =
    withStagedFile(s, path, "graft_batches_replay") { (raw, dir) =>
      val rows = java.util.Collections.synchronizedList(
        new java.util.ArrayList[Row]())
      @volatile var outSchema: org.apache.spark.sql.types.StructType = null
      val stream = s.readStream.schema(raw.schema).parquet(dir)
      // each micro-batch's classifier working set (persisted frames the
      // classifier tracks in PipelineCaches — e.g. the indexed dedup's
      // ranked/fingerprint batch caches) is dead once the verdicts are
      // collected; release it per batch instead of accumulating two dead
      // cached frames per micro-batch until the global releaseAll
      // (ADVICE r13 #3). Frames tracked BEFORE the stream started — the
      // static index — are outside the scope and stay cached.
      val step: (DataFrame, Long) => Unit = (batch, _) =>
        graft.pipeline.PipelineCaches.releasingBatchScope {
          val out = classify(batch)
          outSchema = out.schema
          out.collect().foreach(rows.add)
        }
      val q = startWithPartitions(s, statePartitions) {
        stream.writeStream.foreachBatch(step)
          .trigger(Trigger.AvailableNow()).start()
      }
      try q.awaitTermination() finally q.stop()
      if (assertStateless) {
        val stateful = q.recentProgress.flatMap(p =>
          Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        require(stateful.isEmpty,
          s"stream was expected stateless but ran ${stateful.length} stateful operator update(s)")
      }
      // empty source → no micro-batch ran; take the schema from the
      // classifier over an empty bounded frame
      val schema = if (outSchema != null) outSchema else classify(raw.limit(0)).schema
      s.createDataFrame(rows, schema)
    }
}
