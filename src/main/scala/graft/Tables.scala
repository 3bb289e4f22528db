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
    if (name == "events") normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The driver has shipped events.parquet with two ts layouts:
    * TIMESTAMP(NANOS) (readable only as a long via
    * spark.sql.legacy.parquet.nanosAsLong — set at session build,
    * Sessions.build) and TIMESTAMP(MICROS) (plain TIMESTAMP_NTZ to
    * Spark). Normalize both to a session-TZ (UTC) TimestampType column
    * at micros precision — the type every downstream query and the
    * DuckDB oracle already agree on. For the nanos layout, floor-divide
    * ns → us (pmod keeps floor semantics for pre-epoch timestamps,
    * matching DuckDB's narrowing; plain `div` truncates toward zero). */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros, col}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Register every table as a temp view (for the SQL route / NutQL engine). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
