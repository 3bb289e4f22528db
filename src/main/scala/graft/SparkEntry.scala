package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CurationQueries, EngineQueries, ExtraQueries, PipelineQueries, Round4Queries, Round5Queries, Round6Queries, Round7Queries, Round8Queries, Round9Queries, Round10Queries, Round11Queries, Round12Queries, Round13Queries, Round14Queries, Round15Queries, Round16Queries, StatementQueries, QueryDef}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All operator-coverage queries, name → definition. Since round 2
    * these run end-to-end through the NutQL engine (text → parse → bind →
    * DataFrame); the oracle SQL is unchanged from round 1. */
  def allDefs: Seq[QueryDef] =
    EngineQueries.defs ++ StatementQueries.defs ++ PipelineQueries.defs ++
      ExtraQueries.defs ++ Round4Queries.defs ++ Round5Queries.defs ++
      CurationQueries.defs ++ Round6Queries.defs ++ Round7Queries.defs ++
      Round8Queries.defs ++ Round9Queries.defs ++ Round10Queries.defs ++
      Round11Queries.defs ++ Round12Queries.defs ++ Round13Queries.defs ++
      Round14Queries.defs ++ Round15Queries.defs ++ Round16Queries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val def14 = allDefs.find(_.name == "q14_multi_join").get
    def14.run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, Some(sql), _) => n -> sql }.toMap
}
