package graft.pipeline

import org.apache.spark.sql.functions._
import graft.Sessions

/** Ad-hoc stage profiler — local iteration only, not part of the
  * driver contract. Current target: the banded-theta stats action vs
  * the main job for qe146. */
object QuickProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-quickprof")
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    li.count() // warm
    val ivd = col("l_extendedprice").cast("double")
    time("minmaxcount only") {
      li.agg(min(ivd), max(ivd), count(lit(1))).head()
    }
    val probes = (1 until 64).map(_.toDouble / 64)
    val sampled = when(pmod(xxhash64(lit(42), ivd), lit(16)) === 0, ivd)
    time("minmaxcount+sampled percentile") {
      li.agg(min(ivd), max(ivd), count(lit(1)),
        percentile_approx(sampled, array(probes.map(lit(_)): _*), lit(1000))).head()
    }
    time("minmaxcount+sampled percentile (2nd)") {
      li.agg(min(ivd), max(ivd), count(lit(1)),
        percentile_approx(sampled, array(probes.map(lit(_)): _*), lit(1000))).head()
    }
    val engine = graft.engine.Engine.forTestdata(spark, sfDir)
    val q =
      """select o_orderkey,
           (select l_suppkey from lineitem
            where l_extendedprice > o_totalprice / 4
            group by l_suppkey
            order by count(1) desc, l_suppkey limit 1) as busiest_supp
         from orders where o_orderkey < 300 order by o_orderkey"""
    time("qe146 plan build")(engine.execute(q))
    time("qe146 full (noop)") {
      engine.execute(q).write.format("noop").mode("overwrite").save()
    }
    time("qe146 full (2nd)") {
      engine.execute(q).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
