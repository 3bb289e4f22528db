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
      // allow the planner to pick a SHUFFLED HASH join when one side's
      // per-partition build fits (optimization guide §3.1/§9): sort-merge
      // pays two full sorts that a hash build skips; at 100 TB the same
      // condition holds per partition (AQE's skew split keeps build
      // sides bounded), and SMJ remains the fallback whenever the size
      // conditions fail — a strategy choice, never a semantics change.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
