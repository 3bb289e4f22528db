package graft.tools
import graft.Sessions
object NestProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-nestprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.queries.Engines.get(spark, "/root/testdata/sf0.001")
    def sql(s: String) = eng.execute(s)
    sql("DROP TABLE IF EXISTS r11n_o"); sql("DROP TABLE IF EXISTS r11n_m")
    sql("DROP TABLE IF EXISTS r11n_m2"); sql("DROP TABLE IF EXISTS r11n_t")
    sql("CREATE TABLE r11n_o (ok Int64)")
    sql("INSERT INTO r11n_o VALUES (1), (2), (3), (4)")
    sql("CREATE TABLE r11n_m (g Int64, lhs Int64)")
    sql("INSERT INTO r11n_m VALUES (1, 100), (2, 600), (3, 100), (4, 300)")
    sql("CREATE TABLE r11n_m2 (h Int64)")
    sql("INSERT INTO r11n_m2 VALUES (1), (2), (3), (4)")
    sql("CREATE TABLE r11n_t (oc Int64, q Int64, v Int64, ord Int64)")
    sql("""INSERT INTO r11n_t VALUES
           (1, 35, 100, 1), (1, 15, 200, 2), (1, 45, 300, 3),
           (2, 25, 500, 1), (2, 50, 600, 2),
           (3, null, 700, 1), (3, 60, 800, 2),
           (4, 70, null, 1)""")
    try {
      val got = sql(
        """SELECT ok FROM r11n_o
           WHERE EXISTS (
             SELECT 1 FROM r11n_m WHERE g = ok AND EXISTS (
               SELECT 1 FROM r11n_m2 WHERE h = g AND
                 lhs IN (SELECT DISTINCT ON (oc) v FROM r11n_t
                         WHERE q > ok * 10 ORDER BY oc, ord)))
           ORDER BY ok""").collect().map(_.getLong(0)).toSeq
      println(s"GOT: $got")
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
