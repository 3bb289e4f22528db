package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class DotProductSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("dot-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("codegen'd dot product equals the interpreted zip_with/aggregate path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.limit(20).alias("a")
      .crossJoin(emb.limit(20).alias("b"))
      .select(
        VectorOps.dot(col("a.embedding"), col("b.embedding")).as("native"),
        aggregate(
          zip_with(
            transform(col("a.embedding"), _.cast("double")),
            transform(col("b.embedding"), _.cast("double")),
            (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v).as("lambda"))
      .collect()
    pairs.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null inputs produce null, mismatched lengths error") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Option(Seq(3.0f, 4.0f))), (Seq(1.0f), None))
      .toDF("a", "b")
    val rs = df.select(VectorOps.dot(col("a"), col("b")).as("d")).collect()
    assert(rs(0).getDouble(0) == 11.0)
    assert(rs(1).isNullAt(0))
    val bad = Seq((Seq(1.0f, 2.0f), Seq(3.0f))).toDF("a", "b")
    assertThrows[Exception](
      bad.select(VectorOps.dot(col("a"), col("b"))).collect())
  }

  test("microbench: native vs lambda dot (informational)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val pairs = emb.alias("a").crossJoin(emb.alias("b"))
      .select(col("a.v").as("x"), col("b.v").as("y")) // 250k pairs × dim 128
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tn = time(pairs.select(sum(VectorOps.dot(col("x"), col("y")))).collect())
    val tl = time(pairs.select(sum(
      aggregate(zip_with(col("x"), col("y"), (a, b) => a * b),
        lit(0.0d), (acc, v) => acc + v))).collect())
    info(f"native $tn%.2fs vs lambda $tl%.2fs (${tl / tn}%.1fx)")
    assert(tn < tl, s"expected codegen dot to beat interpreted ($tn vs $tl)")
  }
}
