package graft.tools

import graft.nutql.Parser

/** Parser micro-bench mirroring the reference's only performance artifact
  * (benches/parser_bench.rs: "short sql" + "long sql" parse latency).
  * The reference publishes no numbers and its criterion deps cannot be
  * built offline, so ours are the recorded side of the comparison.
  * Prints one JSON line with ns/op after JIT warmup.
  */
object ParserBench {

  val shortSql = "SELECT * FROM table WHERE 1 = 1" // verbatim reference input

  val longSql: String = """SELECT
    e.employee_id AS `Employee #`,
    e.first_name + ' ' + e.last_name AS Name,
    e.email AS Email,
    e.phone_number AS Phone,
    toYYYYMMDD(e.hire_date) AS `Hire Date`,
    e.commission_pct AS `Comission %`,
    jh.job_id AS `History Job ID`,
    case jh.level >> jh.offset -- right shift
        when 0x1 then 'A'
        when 0x2 then 'B'
        when 0x3 then 'C'
        when 0x4 then 'D'
        when 0x5 then 'F'
        else jh.n * (jh.k + 1 * 3 % 4)
    end AS level
FROM employees AS e
/* some comment */
JOIN jobs AS j
  ON e.job_id = j.job_id
LEFT JOIN employees AS m
  ON e.manager_id = m.employee_id
LEFT JOIN departments AS d
  ON d.department_id = e.department_id
LEFT JOIN employees AS dm
  ON d.manager_id = dm.employee_id
LEFT JOIN locations AS l
  ON d.location_id = l.location_id
LEFT JOIN countries AS c
  ON l.country_id = c.country_id
LEFT JOIN regions AS r
  ON c.region_id = r.region_id
LEFT JOIN job_history AS jh
  ON e.employee_id = jh.employee_id
LEFT JOIN jobs AS jj
  ON jj.job_id = jh.job_id
LEFT JOIN departments AS dd
  ON dd.department_id = jh.department_id
ORDER BY
  e.employee_id"""

  private def bench(sql: String, warmup: Int, iters: Int): Double = {
    var i = 0
    while (i < warmup) { Parser.parse(sql); i += 1 }
    val t0 = System.nanoTime()
    i = 0
    while (i < iters) { Parser.parse(sql); i += 1 }
    (System.nanoTime() - t0).toDouble / iters
  }

  def main(args: Array[String]): Unit = {
    val shortNs = bench(shortSql, warmup = 50000, iters = 200000)
    val longNs = bench(longSql, warmup = 5000, iters = 20000)
    println(f"""{"short_sql_ns":$shortNs%.0f,"long_sql_ns":$longNs%.0f,"short_per_sec":${1e9 / shortNs}%.0f,"long_per_sec":${1e9 / longNs}%.0f}""")
  }
}
