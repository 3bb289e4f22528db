package graft

import org.apache.spark.sql.SparkSession

/** One place to build the local SparkSession with the configs every
  * entry point (Verify, Bench, tests) needs — shuffle partitions sized
  * to the core count (not the 200 default), UTC, AQE on, and the
  * parquet nanos→long legacy flag needed by events.parquet (set here at
  * session build, not as a side effect of loading a table).
  */
object Sessions {
  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
