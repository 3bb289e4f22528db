package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-defined chunking specs: the properties that justify CDC as a
  * dedup primitive — boundary stability under edits elsewhere in the
  * document (shift resilience), shared-passage detection, and
  * determinism. The chunk hashes are engine-native (rolling + FNV), so
  * the driver entry qp61 is rows-only and THESE tests carry the
  * correctness burden. */
class CdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("cdc-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  // long enough that several whole chunks fall strictly INSIDE the
  // passage — only interior chunks are shared when the passage is
  // embedded in different surroundings (edge chunks mix foreign bytes)
  private val passage = (1 to 12).map(i =>
    s"it was the best of times $i it was the worst of times it was the age " +
      s"of wisdom it was the age of foolishness it was the epoch of belief").mkString(" ")

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("insertion re-synchronizes: shifted copy keeps most chunk hashes") {
    val shifted = "COMPLETELY NEW PREFIX INSERTED HERE >> " + passage
    val d = df(0L -> passage, 1L -> shifted)
    val chunks = Dedup.chunkStream(d, "doc_id", "text")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val shared = chunks(0L).intersect(chunks(1L)).size
    // a fixed-size chunker (or whole-doc hash) shares ZERO blocks after a
    // shift; CDC boundaries re-sync within ~one window so most survive
    assert(chunks(0L).size >= 3, s"passage produced only ${chunks(0L).size} chunks")
    assert(shared * 2 >= chunks(0L).size,
      s"only $shared of ${chunks(0L).size} chunks survived the shift")
  }

  test("shared passage across otherwise-different documents is detected") {
    val a = "totally unrelated preamble about spark catalyst optimizer internals. " +
      passage + " trailing content that only document a has, nothing alike."
    val b = "different opening paragraph discussing parquet encodings at length. " +
      passage + " and a completely distinct conclusion section here."
    val c = "this third document shares no passage with the others at all; it " +
      "rambles about watermarks, state stores, and shuffle partitions instead."
    val pairs = Dedup.sharedChunkPairs(df(0L -> a, 1L -> b, 2L -> c),
        "doc_id", "text", maskBits = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"shared passage missed: $pairs")
    assert(!pairs.exists { case (x, y) => x == 2L || y == 2L },
      s"unrelated doc paired: $pairs")
  }

  test("chunking is deterministic across runs on the documents fixture") {
    val d = graft.Tables.load(spark, dir, "documents").limit(50)
    val a = Dedup.chunkStream(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Dedup.chunkStream(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("shared-chunk pairs run on the documents fixture without cross join") {
    val d = graft.Tables.load(spark, dir, "documents")
    val plan = Dedup.sharedChunkPairs(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"all-pairs join in CDC plan:\n$plan")
  }

  // ---- portable (oracle-replayable) chunker -----------------------------

  test("portable chunker keeps the shift-resilience property") {
    val shifted = "COMPLETELY NEW PREFIX INSERTED HERE >> " + passage
    val d = df(0L -> passage, 1L -> shifted)
    val chunks = Dedup.chunkStream(d, "doc_id", "text", portable = true)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val shared = chunks(0L).intersect(chunks(1L)).size
    assert(chunks(0L).size >= 3, s"passage produced only ${chunks(0L).size} chunks")
    assert(shared * 2 >= chunks(0L).size,
      s"only $shared of ${chunks(0L).size} chunks survived the shift")
  }

  test("portable chunker matches a driver-side prefix-hash replay") {
    // the exact algebra the DuckDB oracle uses: prefix hashes P_i,
    // powers of 257, window hash P_i - P_{i-min(i,W)}*257^min(i,W),
    // cuts where it's 0 mod 2^6, chunk hash P_b - P_a*257^(b-a)
    val P = 1000000007L
    val text = passage.take(200)
    val bytes = text.getBytes("UTF-8").map(_ & 0xFF)
    val pre = bytes.scanLeft(0L)((a, b) => (a * 257 + b) % P)
    val pow = Iterator.iterate(1L)(v => v * 257 % P).take(bytes.length + 1).toArray
    def seg(a: Int, b: Int) = ((pre(b) - pre(a) * pow(b - a)) % P + P) % P
    val cuts = (1 to bytes.length).filter { i =>
      val w = math.min(i, 32)
      seg(i - w, i) % 64 == 0
    }
    val edges = 0 +: (cuts ++ (if (cuts.lastOption.contains(bytes.length)) Nil
                               else Seq(bytes.length)))
    val expect = edges.sliding(2).map { case Seq(a, b) => seg(a, b) }.toSeq.distinct.sorted
    val got = Dedup.chunkStream(df(0L -> text), "doc_id", "text", portable = true)
      .collect().map(_.getLong(1)).toSeq.sorted
    assert(got == expect)
  }
}
