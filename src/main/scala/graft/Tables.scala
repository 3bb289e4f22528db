package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loaders for the driver's test data
  * (`/root/testdata/sf*`; see TESTDATA.md). Column pruning and filter
  * pushdown reach the scan because these are plain `spark.read.parquet`
  * relations — no RDD detours.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects; spark.sql.legacy.parquet.nanosAsLong (set at session
      // build — Sessions.build) reads it as a long. Floor-divide ns → us
      // (pmod keeps floor semantics for pre-epoch timestamps, matching
      // DuckDB's narrowing; plain `div` truncates toward zero).
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for the SQL route / NutQL engine). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
