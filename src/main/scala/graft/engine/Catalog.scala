package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.nutql.Ast
import scala.collection.mutable

/** Engine catalog: name → table or view.
  *
  * Tables are parquet-backed under a per-catalog warehouse directory —
  * CREATE TABLE writes an empty dataset, INSERT appends parquet files,
  * TRUNCATE rewrites empty, OPTIMIZE compacts. That is the same
  * files-on-distributed-storage model a 100 TB deployment uses (swap the
  * local dir for an object-store path); nothing is held on the driver.
  * Base tables (the driver's testdata) are registered read-only.
  *
  * Views store their defining AST and re-bind on read; a `Summing` view
  * wraps the definition in groupBy(keys).agg(sum(...)) (reference
  * ViewDefinition, ast/item.rs:219-228, corpus 12.sql).
  */
final class Catalog(val spark: SparkSession) {

  sealed trait Entry
  /** `nutColumns` is present for engine-created tables (drives DESCRIBE
    * and insert-time coercion); base tables derive schema from parquet. */
  final case class TableEntry(
      df: () => DataFrame,
      nutColumns: Option[Seq[Ast.ColumnDef]],
      path: Option[String],
      schema: StructType,
      constraints: Seq[Ast.ConstraintDef] = Nil,
      indexes: Seq[Ast.IndexDef] = Nil,
      primaryKey: Seq[Ast.Expr] = Nil,
      orderBy: Seq[Ast.Expr] = Nil,
      partitionBy: Option[Ast.Expr] = None,
      comment: Option[String] = None,
      serialCols: Seq[String] = Nil) extends Entry
  final case class ViewEntry(
      query: Ast.Query,
      strategy: String,
      primaryKey: Seq[Ast.Expr],
      orderBy: Seq[Ast.Expr],
      comment: Option[String],
      materialized: Option[ViewMaterialization] = None) extends Entry

  private val entries = mutable.LinkedHashMap.empty[String, Entry]
  private def key(name: String): String = name.toLowerCase

  /** Per-table mutation counters: bumped by INSERT/TRUNCATE/ALTER/DROP.
    * A view materialization records the counters of every table it read;
    * reads serve the materialized parquet only while they still match
    * (base tables are read-only — their counter stays 0 forever). */
  private val mutations = mutable.Map.empty[String, Long].withDefaultValue(0L)
  def bumpMutation(name: String): Unit = mutations(key(name)) += 1
  def mutationOf(name: String): Long = mutations(key(name))

  val warehouseDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-warehouse-").toString
    d
  }

  def registerBase(df: DataFrame, name: String): Unit =
    entries(key(name)) = TableEntry(() => df, None, None, df.schema)

  def putTable(name: String, e: TableEntry): Unit = entries(key(name)) = e
  def putView(name: String, e: ViewEntry): Unit = entries(key(name)) = e

  def get(name: String): Option[Entry] = entries.get(key(name))
  def contains(name: String): Boolean = entries.contains(key(name))
  def drop(name: String): Boolean = entries.remove(key(name)).isDefined
  def names: Seq[String] = entries.keys.toSeq

  def tablePath(name: String): String = s"$warehouseDir/${key(name)}"
}

/** A refreshed-on-OPTIMIZE view materialization: the aggregated result
  * written to parquet plus the mutation counters of its source tables at
  * refresh time (staleness check). */
final case class ViewMaterialization(
    path: String,
    schema: StructType,
    deps: Map[String, Long])

object Catalog {
  /** Catalog over the driver's testdata directory. */
  def forTestdata(spark: SparkSession, dir: String): Catalog = {
    val c = new Catalog(spark)
    graft.Tables.names.foreach { n =>
      c.registerBase(graft.Tables.load(spark, dir, n), n)
    }
    c
  }
}
