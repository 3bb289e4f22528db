package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The foreachBatch replay runner (round 13): per-micro-batch classify
  * with full batch DataFrame semantics, statelessness asserted from the
  * query's own progress, and the empty-source schema fallback — the
  * seams qp101 relies on but its oracle cannot see. */
class BatchReplaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("batch-replay-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def writeFixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("batch_replay_fix")
    val path = dir.resolve("docs.parquet").toString
    // single parquet FILE (the runner stages one file): write then move
    val tmpOut = dir.resolve("out").toString
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmpOut)
    val part = new java.io.File(tmpOut).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(path))
    path
  }

  test("replayParquetBatches: per-batch windows work; all rows pass through") {
    val path = writeFixture((1L to 20L).map(i => (i, s"doc $i text ${i % 3}")))
    val out = graft.queries.StreamRunner.replayParquetBatches(
        spark, path, assertStateless = true) { b =>
      // a window over the micro-batch — exactly what an unbounded
      // stream would reject and the runner exists to allow
      import org.apache.spark.sql.expressions.Window
      b.withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id") % 2).orderBy(col("doc_id"))))
        .select(col("doc_id"), col("rk"))
    }
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet == (1L to 20L).toSet)
    // ranks are dense within each parity class
    assert(got.filter(_._1 % 2 == 0).values.toSeq.sorted == (1 to 10))
  }

  test("replayParquetBatches: empty source yields the classifier schema") {
    val path = writeFixture(Seq((1L, "only row")))
    val out = graft.queries.StreamRunner.replayParquetBatches(
        spark, path) { b =>
      b.filter(col("doc_id") < 0) // classifier runs; emits nothing
        .select(col("doc_id"), lit("x").as("tag"))
    }
    assert(out.columns.toSeq == Seq("doc_id", "tag"))
    assert(out.count() == 0)
  }

  test("pipeline caches: session-scoped release leaves the other session") {
    import org.apache.spark.storage.StorageLevel
    val s2 = spark.newSession()
    import spark.implicits._
    val a = graft.pipeline.PipelineCaches.track(
      Seq(1, 2, 3).toDF("x").persist(StorageLevel.MEMORY_AND_DISK))
    val b = {
      import s2.implicits._
      graft.pipeline.PipelineCaches.track(
        Seq(4, 5).toDF("y").persist(StorageLevel.MEMORY_AND_DISK))
    }
    a.count(); b.count()
    graft.pipeline.PipelineCaches.release(spark, blocking = true)
    assert(a.storageLevel == StorageLevel.NONE,
      "own-session frame should be released")
    assert(b.storageLevel != StorageLevel.NONE,
      "other session's frame must survive a scoped release")
    graft.pipeline.PipelineCaches.releaseAll(blocking = true)
    assert(b.storageLevel == StorageLevel.NONE)
  }
}
