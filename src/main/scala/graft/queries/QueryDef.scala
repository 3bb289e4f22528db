package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark DataFrame program plus (when the
  * semantics are SQL-expressible) an equivalent ANSI SQL text the driver
  * runs in DuckDB over the same parquet tables. Column names MUST match
  * between the two — the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
