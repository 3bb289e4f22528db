package graft.nutql

import graft.nutql.Ast._
import graft.nutql.{TokenType => TT}

/** Hand-written TDOP (Pratt) parser for NutQL.
  *
  * Grammar spec is the reference parser (src/parser/mod.rs). The
  * expression precedence ladder replicates TokenPower (mod.rs:1950-1966):
  * Or < Xor < And < Not < Comparison < Between < BitOr < BitXor < BitAnd
  * < BitShift < PlusMinus < MulDivMod < Access — note bitwise binds
  * TIGHTER than comparison, unlike ANSI SQL. Set-operator precedence
  * (mod.rs:1968-1974): Except < Union < Intersect, left-associative.
  *
  * Two documented superset fixes over the reference: `ASC` is accepted in
  * ORDER BY (mod.rs:494 rejects it) and `Map(K,V)` keeps declared order
  * (mod.rs:1780 swaps). Parse-time constant folding of boolean/equality
  * ops mirrors src/parser/simplify.rs.
  */
final class Parser(tokens: Vector[Token]) {
  private var pos = 0

  private def peek: Token = tokens(pos)
  private def next(): Token = { val t = tokens(pos); if (t.t != TT.EOF) pos += 1; t }
  private def err(msg: String, tok: Token): Nothing =
    throw ParseException(msg, tok.line, tok.col)

  private def nextExpect(tt: TT.TokenType): Token = {
    val t = next()
    if (t.t != tt) err(s"expected $tt, got ${t.t} '${t.text}'", t)
    t
  }
  private def nextIf(tt: TT.TokenType): Boolean =
    if (peek.t == tt) { pos += 1; true } else false

  private def tryKw(kw: String): Boolean =
    if (peek.isKw(kw)) { pos += 1; true } else false
  private def mustKw(kw: String): Unit = {
    val t = next()
    if (!(t.maybeKeyword && t.text.equalsIgnoreCase(kw)))
      err(s"expected keyword '$kw', got '${t.text}'", t)
  }
  private def mustOneOfKw(kws: String*): Int = {
    val t = next()
    if (t.maybeKeyword) {
      val i = kws.indexWhere(t.text.equalsIgnoreCase)
      if (i >= 0) return i
    }
    err(s"expected one of ${kws.mkString("/")}, got '${t.text}'", t)
  }
  private def mustIdentString(): String = {
    val t = next()
    if (t.t != TT.KeywordOrIdentifier && t.t != TT.DelimitedIdentifier)
      err(s"expected identifier, got ${t.t} '${t.text}'", t)
    t.text
  }
  private def mustStringLit(): String = {
    val t = next()
    if (t.t != TT.StringLiteral) err(s"expected string literal, got ${t.t}", t)
    t.text
  }
  private def mustIntLit(): Long = {
    val t = next()
    t.t match {
      case TT.IntegerLiteral => t.text.toLong
      case TT.HexLiteral => java.lang.Long.parseLong(t.text, 16)
      case _ => err(s"expected integer literal, got ${t.t} '${t.text}'", t)
    }
  }

  private def commaSeparated[A](one: => A): Seq[A] = {
    val buf = Vector.newBuilder[A]
    var more = true
    while (more) { buf += one; more = nextIf(TT.Comma) }
    buf.result()
  }

  // ================== statement entry ==================

  /** Single public entry point (reference Parser::parse, mod.rs:27-29). */
  def parseStatement(): Statement = {
    val t = peek
    if (t.isTerminator) err("empty query", t)
    if (!t.maybeKeyword) err("statements should start with a keyword", t)
    val kw = t.text
    val stmt =
      if (kw.equalsIgnoreCase("select") || kw.equalsIgnoreCase("with")) parseSelectStmt()
      else if (kw.equalsIgnoreCase("insert")) parseInsertStmt()
      else if (kw.equalsIgnoreCase("explain")) parseExplainStmt()
      else if (kw.equalsIgnoreCase("alter")) parseAlterStmt()
      else if (kw.equalsIgnoreCase("create")) parseCreateStmt()
      else if (kw.equalsIgnoreCase("describe")) parseDescribeStmt()
      else if (kw.equalsIgnoreCase("drop")) parseDropStmt()
      else if (kw.equalsIgnoreCase("truncate")) parseTruncateStmt()
      else if (kw.equalsIgnoreCase("optimize")) parseOptimizeStmt()
      else if (kw.equalsIgnoreCase("set")) parseSetStmt()
      else err("cannot recognize statement", t)
    // single-statement terminator check (`;` or EOF)
    if (nextIf(TT.SemiColon)) ()
    val end = peek
    if (end.t != TT.EOF) err("more than one statement", end)
    stmt
  }

  // ================== queries ==================

  // set-operator binding powers (UnionTypePower, mod.rs:1968-1974)
  private val PowTerm = 0; private val PowExcept = 1; private val PowUnion = 2
  private val PowIntersect = 3

  private def unionPower(t: Token): Int =
    if (!t.maybeKeyword) PowTerm
    else if (t.isKw("union")) PowUnion
    else if (t.isKw("intersect")) PowIntersect
    else if (t.isKw("except")) PowExcept
    else PowTerm

  private def parseSelectStmt(): Statement = {
    val startKw = next() // SELECT or WITH
    SelectStmt(parseQueryTdop(startKw.isKw("with"), PowTerm))
  }

  /** Subquery: requires SELECT/WITH keyword, optionally parenthesized
    * (paren resets the set-op binding power — mod.rs:218-241). */
  private def parseSubquery(power: Int = PowTerm): Query = {
    val hasParen = nextIf(TT.LParen)
    val startsWith = mustOneOfKw("with", "select") == 0
    val q = parseQueryTdop(startsWith, if (hasParen) PowTerm else power)
    if (hasParen) nextExpect(TT.RParen)
    q
  }

  private def parseQueryTdop(startsWith: Boolean, power: Int): Query = {
    var query: Query = parseQueryBody(startsWith)
    var done = false
    while (!done) {
      val nextPower = unionPower(peek)
      if (nextPower <= power) done = true
      else {
        next() // the set-op keyword
        val op = nextPower match {
          case PowIntersect => "intersect"
          case PowExcept => "except"
          case PowUnion =>
            // UNION requires ALL|DISTINCT (mod.rs:258-264)
            if (mustOneOfKw("all", "distinct") == 0) "union_all" else "union_distinct"
          case _ => err("unreachable set-op", peek)
        }
        query = SetOpQuery(op, query, parseSubquery(nextPower))
      }
    }
    query
  }

  /** Clauses have strict order: WITH, DISTINCT, select-list, FROM, JOIN*,
    * WHERE, GROUP BY, HAVING, ORDER BY, LIMIT (mod.rs:279-325). Assumes
    * the leading SELECT/WITH keyword is consumed. */
  private def parseQueryBody(startsWith: Boolean): QueryBody = {
    val ctes: Seq[(String, Query)] = if (startsWith) {
      val list = commaSeparated {
        val alias = mustIdentString()
        mustKw("as")
        val reportTok = peek
        parseExpr() match {
          case SubqueryExpr(q) => alias -> q
          case _ => err("not a subquery", reportTok)
        }
      }
      mustKw("select")
      list
    } else Nil

    val distinct: Option[Seq[Expr]] =
      if (tryKw("distinct")) {
        if (tryKw("on")) {
          nextExpect(TT.LParen)
          val exprs = commaSeparated(parseQueryExpr()).map(_.expr)
          nextExpect(TT.RParen)
          Some(exprs)
        } else Some(Nil)
      } else None

    val selectList = commaSeparated(parseQueryExpr())

    val from: Option[DataSource] =
      if (peek.isKw("from")) { next(); Some(parseQuerySource()) } else None

    val joins = Vector.newBuilder[JoinClause]
    var j = tryParseJoin()
    while (j.isDefined) { joins += j.get; j = tryParseJoin() }

    val where = if (peek.isKw("where")) { next(); Some(parseExpr()) } else None

    val groupBy: Seq[Expr] =
      if (peek.isKw("group")) {
        next(); mustKw("by")
        commaSeparated(parseQueryExpr()).map(_.expr)
      } else Nil

    val having = if (peek.isKw("having")) { next(); Some(parseExpr()) } else None

    val orderBy: Seq[OrderKey] =
      if (peek.isKw("order")) {
        next(); mustKw("by")
        commaSeparated {
          val qe = parseQueryExpr()
          // reference only accepts DESC (its ASC branch is a bug,
          // mod.rs:491-495); we accept ASC as a documented superset
          val desc = if (tryKw("desc")) true else { tryKw("asc"); false }
          OrderKey(qe.expr, desc)
        }
      } else Nil

    val limit: Option[LimitClause] =
      if (peek.isKw("limit")) {
        next()
        // operands are integer literals or `$n` parameters (superset: the
        // reference only accepts literals; params resolve at bind time)
        def operand(): Expr =
          if (peek.t == TT.QueryParameter) Param(next().text.toInt)
          else IntLit(BigInt(mustIntLit()))
        val first = operand()
        val (size, offset) =
          if (nextIf(TT.Comma)) (operand(), Some(first)) // LIMIT o, n
          else if (peek.isKw("offset")) { next(); (first, Some(operand())) }
          else (first, None)
        val withTies = if (tryKw("with")) { mustKw("ties"); true } else false
        val off = offset.filter { case IntLit(v) => v != 0; case _ => true }
        Some(LimitClause(size, off, withTies))
      } else None

    QueryBody(ctes, distinct, selectList, from, joins.result(), where,
      groupBy, having, orderBy, limit)
  }

  private case class QueryExprA(expr: Expr, alias: Option[String])
  private def parseQueryExpr(): SelectItem = {
    val e = parseExpr()
    val alias = if (tryKw("as")) Some(mustIdentString()) else None
    SelectItem(e, alias)
  }

  /** FROM/JOIN source: parsed as a full expression, then narrowed to a
    * table name, table function, or subquery (mod.rs:546-569). */
  private def parseQuerySource(): DataSource = {
    val reportTok = peek
    val e = parseExpr()
    val alias = if (tryKw("as")) Some(mustIdentString()) else None
    e match {
      case SubqueryExpr(q) => SubquerySource(q, alias)
      case f: FnCall => TableFnSource(f, alias)
      case Ident(None, name) => TableSource(name, alias)
      case _ => err("query source must be a subquery, a table function or a table", reportTok)
    }
  }

  private def tryParseJoin(): Option[JoinClause] = {
    val t = peek
    if (t.isTerminator || !t.maybeKeyword) return None
    val joinType: String =
      if (t.isKw("inner")) { next(); "inner" }
      else if (t.isKw("full")) { next(); tryKw("outer"); "full" }
      else if (t.isKw("left")) {
        next()
        if (tryKw("semi")) "left_semi"
        else if (tryKw("anti")) "left_anti"
        else if (tryKw("asof")) "asof_left" // LEFT ASOF JOIN (superset)
        else { tryKw("outer"); "left" }
      } else if (t.isKw("right")) {
        next()
        if (tryKw("semi")) "right_semi"
        else if (tryKw("anti")) "right_anti"
        else { tryKw("outer"); "right" }
      } else if (t.isKw("asof")) {
        // superset: reference AST has AsOf but its parser never emits it;
        // we also accept the ClickHouse ASOF LEFT variant
        next()
        if (tryKw("left")) "asof_left" else "asof"
      }
      else if (t.isKw("join")) "inner"
      else return None
    mustKw("join")
    val source = parseQuerySource()
    val cond = mustOneOfKw("on", "using") match {
      case 0 => OnCondition(parseExpr())
      case _ =>
        nextExpect(TT.LParen)
        val cols = commaSeparated(mustIdentString())
        nextExpect(TT.RParen)
        UsingCondition(cols)
    }
    Some(JoinClause(joinType, source, cond))
  }

  // ================== other statements ==================

  private def parseInsertStmt(): Statement = {
    next() // INSERT
    mustKw("into")
    val table = mustIdentString()
    val columns: Seq[String] =
      if (nextIf(TT.LParen)) {
        val cols = commaSeparated(mustIdentString())
        nextExpect(TT.RParen)
        cols
      } else Nil
    val reportTok = peek
    val source = mustOneOfKw("values", "from", "select", "with") match {
      case 0 => parseInsertRows()
      case 1 =>
        parseExpr() match {
          case f: FnCall => InsertFn(f)
          case _ => err("insert source must be a subquery, values, or a function call", reportTok)
        }
      case 2 => InsertQuery(parseQueryTdop(startsWith = false, PowTerm))
      case _ => InsertQuery(parseQueryTdop(startsWith = true, PowTerm))
    }
    InsertStmt(table, columns, source)
  }

  private def parseInsertRows(): InsertSource = {
    def oneRow(): Seq[Expr] = {
      nextExpect(TT.LParen)
      val row = commaSeparated(parseExpr())
      nextExpect(TT.RParen)
      row
    }
    val first = oneRow()
    val rows = Vector.newBuilder[Seq[Expr]]
    rows += first
    if (nextIf(TT.Comma)) {
      var more = true
      while (more) {
        val r = oneRow()
        if (r.size != first.size)
          err(s"row has ${r.size} column(s) but previous rows have ${first.size}", peek)
        rows += r
        more = nextIf(TT.Comma)
      }
    }
    InsertValues(rows.result())
  }

  private def parseExplainStmt(): Statement = {
    next() // EXPLAIN
    ExplainStmt(SelectStmt(parseSubquery()))
  }

  private def parseCreateStmt(): Statement = {
    next() // CREATE
    val isTable = mustOneOfKw("table", "view") == 0
    val ifNotExists = if (tryKw("if")) { mustKw("not"); mustKw("exists"); true } else false
    if (isTable) parseTableDefinition(ifNotExists) else parseViewDefinition(ifNotExists)
  }

  private def parseTableDefinition(ifNotExists: Boolean): CreateTableStmt = {
    val name = mustIdentString()
    nextExpect(TT.LParen)
    val columns = Vector.newBuilder[ColumnDef]
    val indexes = Vector.newBuilder[IndexDef]
    val constraints = Vector.newBuilder[ConstraintDef]
    commaSeparated[Unit] {
      if (tryKw("index")) indexes += parseIndexDef()
      else if (tryKw("constraint")) constraints += parseConstraintDef()
      else columns += parseColumnDef()
    }
    nextExpect(TT.RParen)

    // unordered trailing attrs with duplicate detection (mod.rs:747-802)
    var primaryKey: Option[Seq[Expr]] = None
    var orderBy: Option[Seq[Expr]] = None
    var partitionBy: Option[Expr] = None
    var comment: Option[String] = None
    while (peek.maybeKeyword) {
      val tok = peek
      mustOneOfKw("primary", "order", "partition", "comment") match {
        case 0 =>
          if (primaryKey.isDefined) err("duplicate primary key", tok)
          mustKw("key"); primaryKey = Some(commaSeparated(parseExpr()))
        case 1 =>
          if (orderBy.isDefined) err("duplicate order by", tok)
          mustKw("by"); orderBy = Some(commaSeparated(parseExpr()))
        case 2 =>
          if (partitionBy.isDefined) err("duplicate partition by", tok)
          mustKw("by"); partitionBy = Some(parseExpr())
        case _ =>
          if (comment.isDefined) err("duplicate comment", tok)
          comment = Some(mustStringLit())
      }
    }
    CreateTableStmt(name, ifNotExists, columns.result(), indexes.result(),
      constraints.result(), primaryKey.getOrElse(Nil), orderBy.getOrElse(Nil),
      partitionBy, comment)
  }

  private def parseViewDefinition(ifNotExists: Boolean): CreateViewStmt = {
    val name = mustIdentString()
    var strategy: Option[String] = None
    var primaryKey: Option[Seq[Expr]] = None
    var orderBy: Option[Seq[Expr]] = None
    var partitionBy: Option[Expr] = None
    var comment: Option[String] = None
    var done = false
    while (!done) {
      val tok = peek
      mustOneOfKw("as", "update", "primary", "order", "partition", "comment") match {
        case 0 =>
          // strategy is mandatory before AS (mod.rs:823-833)
          if (strategy.isEmpty) err("view requires UPDATE BY <strategy> before AS", tok)
          done = true
        case 1 =>
          if (strategy.isDefined) err("duplicate update by", tok)
          mustKw("by"); strategy = Some(mustIdentString())
        case 2 =>
          if (primaryKey.isDefined) err("duplicate primary key", tok)
          mustKw("key"); primaryKey = Some(commaSeparated(parseExpr()))
        case 3 =>
          if (orderBy.isDefined) err("duplicate order by", tok)
          mustKw("by"); orderBy = Some(commaSeparated(parseExpr()))
        case 4 =>
          if (partitionBy.isDefined) err("duplicate partition by", tok)
          mustKw("by"); partitionBy = Some(parseExpr())
        case _ =>
          if (comment.isDefined) err("duplicate comment", tok)
          comment = Some(mustStringLit())
      }
    }
    val query = parseSubquery()
    CreateViewStmt(name, ifNotExists, strategy.get, primaryKey.getOrElse(Nil),
      orderBy.getOrElse(Nil), partitionBy, comment, query)
  }

  private def parseConstraintDef(): ConstraintDef = {
    val name = mustIdentString()
    mustKw("check")
    ConstraintDef(name, parseExpr())
  }

  private def parseIndexDef(): IndexDef = {
    val name = mustIdentString()
    val reportTok = peek
    parseExpr() match {
      case f: FnCall => IndexDef(name, f)
      case _ => err("indexer must be a function call", reportTok)
    }
  }

  private def parseColumnDef(): ColumnDef = {
    val name = mustIdentString()
    val dt = parseDataType()
    var default: Option[Expr] = None
    var comment: Option[String] = None
    // superset fix: the reference's greedy keyword loop here chokes on the
    // FIRST/AFTER position keywords of ALTER TABLE ADD COLUMN — only
    // consume the attrs we know
    while (peek.isKw("default") || peek.isKw("comment")) {
      val tok = peek
      mustOneOfKw("default", "comment") match {
        case 0 =>
          if (default.isDefined) err("duplicate default", tok)
          default = Some(parseExpr())
        case _ =>
          if (comment.isDefined) err("duplicate comment", tok)
          comment = Some(mustStringLit())
      }
    }
    ColumnDef(name, dt, default, comment)
  }

  private def parseAlterStmt(): Statement = {
    next() // ALTER
    mustKw("table")
    val table = mustIdentString()
    val action: AlterAction = mustOneOfKw("add", "drop", "rename") match {
      case 0 =>
        val ifNotExists = if (tryKw("if")) { mustKw("not"); mustKw("exists"); true } else false
        val base = mustOneOfKw("column", "index", "constraint") match {
          case 0 => AddColumn(parseColumnDef(), ifNotExists, None)
          case 1 => AddIndex(parseIndexDef(), ifNotExists)
          case _ => AddConstraint(parseConstraintDef(), ifNotExists)
        }
        val position: Option[ColumnPosition] =
          if (tryKw("first")) Some(PositionFirst)
          else if (tryKw("after")) Some(PositionAfter(mustIdentString()))
          else None
        base match {
          case ac: AddColumn => ac.copy(position = position)
          case other => other
        }
      case 1 =>
        val ifExists = if (tryKw("if")) { mustKw("exists"); true } else false
        mustOneOfKw("column", "index", "constraint", "partition") match {
          case 0 => DropColumn(mustIdentString(), ifExists)
          case 1 => DropIndex(mustIdentString(), ifExists)
          case 2 => DropConstraint(mustIdentString(), ifExists)
          case _ => DropPartition(mustStringLit())
        }
      case _ =>
        mustOneOfKw("column", "index", "constraint", "table") match {
          case 0 => RenameColumn(mustIdentString(), mustIdentString())
          case 1 => RenameIndex(mustIdentString(), mustIdentString())
          case 2 => RenameConstraint(mustIdentString(), mustIdentString())
          case _ => RenameTable(mustIdentString())
        }
    }
    AlterTableStmt(table, action)
  }

  private def parseDescribeStmt(): Statement = {
    next() // DESCRIBE
    mustOneOfKw("table", "view", "database") match {
      case 0 => DescribeStmt(TableEntity, Some(mustIdentString()))
      case 1 => DescribeStmt(ViewEntity, Some(mustIdentString()))
      case _ => DescribeStmt(DatabaseEntity, None)
    }
  }

  private def parseDropStmt(): Statement = {
    next() // DROP
    val entity = if (mustOneOfKw("table", "view") == 0) TableEntity else ViewEntity
    val ifExists = if (tryKw("if")) { mustKw("exists"); true } else false
    DropStmt(entity, mustIdentString(), ifExists)
  }

  private def parseTruncateStmt(): Statement = {
    next() // TRUNCATE
    val entity = if (mustOneOfKw("table", "view") == 0) TableEntity else ViewEntity
    val ifExists = if (tryKw("if")) { mustKw("exists"); true } else false
    TruncateStmt(entity, mustIdentString(), ifExists)
  }

  private def parseOptimizeStmt(): Statement = {
    next() // OPTIMIZE
    mustKw("table")
    val table = mustIdentString()
    if (peek.isTerminator) OptimizeStmt(table, None)
    else {
      mustKw("on"); mustKw("partition")
      OptimizeStmt(table, Some(parseExpr()))
    }
  }

  private def parseSetStmt(): Statement = {
    next() // SET
    val t = nextExpect(TT.ConfigIdentifier)
    nextExpect(TT.Eq)
    SetStmt(t.text, parseExpr())
  }

  // ================== expressions (TDOP) ==================

  // TokenPower ladder (mod.rs:1950-1966), as ints
  private val POr = 1; private val PXor = 2; private val PAnd = 3
  private val PNot = 4; private val PComparison = 5; private val PBetween = 6
  private val PBitOr = 7; private val PBitXor = 8; private val PBitAnd = 9
  private val PBitShift = 10; private val PPlusMinus = 11; private val PMulDivMod = 12
  private val PAccess = 13

  private def tokenPower(t: Token): Int = t.t match {
    case TT.Eq | TT.NotEq | TT.Lt | TT.LtEq | TT.GtEq | TT.Gt => PComparison
    case TT.BitOr => PBitOr
    case TT.BitXor => PBitXor
    case TT.BitAnd => PBitAnd
    case TT.BitLShift | TT.BitRShift => PBitShift
    case TT.Plus | TT.Minus => PPlusMinus
    case TT.Mul | TT.Div | TT.Mod => PMulDivMod
    case TT.LBracket => PAccess
    case TT.KeywordOrIdentifier =>
      val s = t.text
      if (s.equalsIgnoreCase("or")) POr
      else if (s.equalsIgnoreCase("xor")) PXor
      else if (s.equalsIgnoreCase("and")) PAnd
      else if (s.equalsIgnoreCase("not")) PNot
      else if (s.equalsIgnoreCase("is") || s.equalsIgnoreCase("in") ||
               s.equalsIgnoreCase("like") || s.equalsIgnoreCase("ilike")) PComparison
      else if (s.equalsIgnoreCase("between")) PBetween
      else PowTerm
    case _ => PowTerm
  }

  def parseExpr(): Expr = parseExprTdop(PowTerm)

  private def parseExprTdop(power: Int): Expr = {
    var e = parsePrefix()
    var done = false
    while (!done) {
      val nextPower = tokenPower(peek)
      if (nextPower <= power) done = true
      else e = parseInfix(e, nextPower)
    }
    e
  }

  private def parsePrefix(): Expr = {
    val t = next()
    t.t match {
      case TT.LParen =>
        // tuple, subquery, or plain wrapper
        val e =
          if (peek.maybeKeyword &&
              (peek.isKw("select") || peek.isKw("with"))) {
            val startsWith = mustOneOfKw("with", "select") == 0
            SubqueryExpr(parseQueryTdop(startsWith, PowTerm))
          } else {
            val exprs = commaSeparated(parseExpr())
            if (exprs.size == 1) exprs.head else TupleLit(exprs)
          }
        nextExpect(TT.RParen)
        e
      case TT.LBracket =>
        val e = ArrayLit(commaSeparated(parseExpr()))
        nextExpect(TT.RBracket)
        e
      case TT.LBrace =>
        val entries = commaSeparated {
          val k = parseExpr()
          nextExpect(TT.Colon)
          k -> parseExpr()
        }
        nextExpect(TT.RBrace)
        MapLit(entries)
      case TT.Minus =>
        // negative only directly before a numeric literal (mod.rs:1259-1269)
        val lt = next()
        lt.t match {
          case TT.IntegerLiteral => IntLit(-BigInt(lt.text))
          case TT.HexLiteral => IntLit(-BigInt(lt.text, 16))
          case TT.FloatLiteral => FloatLit(-BigDecimal(lt.text))
          case _ => err("expected numeric literal after unary '-'", lt)
        }
      case TT.Plus => parsePrefix() // unary + is a no-op
      case TT.Mul => Wildcard(None)
      case TT.BitNot => Unary("~", parsePrefix())
      case TT.StringLiteral => StringLit(t.text)
      case TT.FloatLiteral => FloatLit(BigDecimal(t.text))
      case TT.HexLiteral => IntLit(BigInt(t.text, 16))
      case TT.IntegerLiteral => IntLit(BigInt(t.text))
      case TT.QueryParameter => Param(t.text.toInt)
      case TT.ConfigIdentifier => ConfigId(t.text) // superset: reference lexes but never parses @ids in exprs
      case TT.KeywordOrIdentifier =>
        val s = t.text
        if (s.equalsIgnoreCase("true")) BoolLit(true)
        else if (s.equalsIgnoreCase("false")) BoolLit(false)
        else if (s.equalsIgnoreCase("null")) NullLit
        else if (s.equalsIgnoreCase("not")) Simplify.not(parsePrefix())
        else if (s.equalsIgnoreCase("interval")) {
          val n = mustIntLit()
          val unit = Seq("second", "minute", "hour", "day", "month", "year")(
            mustOneOfKw("second", "minute", "hour", "day", "month", "year"))
          IntervalLit(n, unit)
        } else if (s.equalsIgnoreCase("if")) {
          // IF c THEN a ELSE b END → FnCall("if") sugar (mod.rs:1571-1582)
          val c = parseExpr(); mustKw("then")
          val a = parseExpr(); mustKw("else")
          val b = parseExpr(); mustKw("end")
          FnCall("if", Seq(c, a, b))
        } else if (s.equalsIgnoreCase("case")) parseCaseBody()
        else tryParseFnCallArgs() match {
          case Some(args) => FnCall(s, args)
          case None => parseIdentifierBasedPrefix(s)
        }
      case TT.DelimitedIdentifier => parseIdentifierBasedPrefix(t.text)
      case _ => err(s"unexpected token ${t.t} '${t.text}' in expression", t)
    }
  }

  /** CASE [x] WHEN c THEN v ... [ELSE e] END; missing ELSE ⇒ NULL. */
  private def parseCaseBody(): Expr = {
    val scrutinee = if (tryKw("when")) None else {
      val e = parseExpr(); mustKw("when"); Some(e)
    }
    val branches = Vector.newBuilder[(Expr, Expr)]
    var elseExpr: Option[Expr] = None
    var done = false
    while (!done) {
      val c = parseExpr(); mustKw("then"); val v = parseExpr()
      branches += (c -> v)
      mustOneOfKw("when", "else", "end") match {
        case 0 => ()
        case 1 => elseExpr = Some(parseExpr()); mustKw("end"); done = true
        case _ => done = true
      }
    }
    CaseExpr(scrutinee, branches.result(), elseExpr)
  }

  private def parseIdentifierBasedPrefix(prefix: String): Expr =
    if (nextIf(TT.Dot)) {
      val t = next()
      t.t match {
        case TT.Mul => Wildcard(Some(prefix))
        case TT.KeywordOrIdentifier | TT.DelimitedIdentifier => Ident(Some(prefix), t.text)
        case _ => err(s"expected identifier or '*' after '.', got ${t.t}", t)
      }
    } else Ident(None, prefix)

  /** `(args)` after a name; a lone subquery arg is allowed
    * (mod.rs:1534-1556). Returns None when no paren follows. */
  private def tryParseFnCallArgs(): Option[Seq[Expr]] = {
    if (!nextIf(TT.LParen)) return None
    if (nextIf(TT.RParen)) return Some(Nil)
    if (peek.maybeKeyword && (peek.isKw("select") || peek.isKw("with"))) {
      val startsWith = mustOneOfKw("with", "select") == 0
      val q = parseQueryTdop(startsWith, PowTerm)
      nextExpect(TT.RParen)
      return Some(Seq(SubqueryExpr(q)))
    }
    val args = commaSeparated(parseExpr())
    nextExpect(TT.RParen)
    Some(args)
  }

  private def parseInfix(left: Expr, thisPower: Int): Expr = {
    val t = next()
    t.t match {
      case TT.Plus => Binary("+", left, parseExprTdop(thisPower))
      case TT.Minus => Binary("-", left, parseExprTdop(thisPower))
      case TT.Mul => Binary("*", left, parseExprTdop(thisPower))
      case TT.Div => Binary("/", left, parseExprTdop(thisPower))
      case TT.Mod => Binary("%", left, parseExprTdop(thisPower))
      case TT.Gt => Binary(">", left, parseExprTdop(thisPower))
      case TT.Lt => Binary("<", left, parseExprTdop(thisPower))
      case TT.GtEq => Binary(">=", left, parseExprTdop(thisPower))
      case TT.LtEq => Binary("<=", left, parseExprTdop(thisPower))
      case TT.Eq => Simplify.eq(left, parseExprTdop(thisPower))
      case TT.NotEq => Simplify.neq(left, parseExprTdop(thisPower))
      case TT.BitOr => Binary("|", left, parseExprTdop(thisPower))
      case TT.BitAnd => Binary("&", left, parseExprTdop(thisPower))
      case TT.BitXor => Binary("^", left, parseExprTdop(thisPower))
      case TT.BitLShift => Binary("<<", left, parseExprTdop(thisPower))
      case TT.BitRShift => Binary(">>", left, parseExprTdop(thisPower))
      case TT.LBracket =>
        val idx = parseExpr()
        nextExpect(TT.RBracket)
        Binary("[]", left, idx)
      case TT.KeywordOrIdentifier =>
        thisPower match {
          case PAnd => Simplify.and(left, parseExprTdop(thisPower))
          case POr => Simplify.or(left, parseExprTdop(thisPower))
          case PXor => Simplify.xor(left, parseExprTdop(thisPower))
          case PNot =>
            // `x NOT IN/LIKE/ILIKE/BETWEEN/EXISTS ...` (mod.rs:1399-1427)
            mustOneOfKw("in", "like", "ilike", "between", "exists") match {
              case 0 => normalizeIn(left, parseExprTdop(PComparison), negated = true)
              case 1 => Binary("not_like", left, parseExprTdop(PComparison))
              case 2 => Binary("not_ilike", left, parseExprTdop(PComparison))
              case 3 =>
                val lo = parseExprTdop(PBetween); mustKw("and")
                val hi = parseExprTdop(PBetween)
                BetweenExpr(left, lo, hi, negated = true)
              case _ =>
                tryParseFnCallArgs() match {
                  case Some(Seq(SubqueryExpr(q))) => ExistsExpr(q, negated = true)
                  case _ => err("`not exists` should have a subquery argument", t)
                }
            }
          case _ =>
            val s = t.text
            if (s.equalsIgnoreCase("is")) {
              mustOneOfKw("not", "null") match {
                case 0 => mustKw("null"); Simplify.isNotNull(left)
                case _ => Simplify.isNull(left)
              }
            } else if (s.equalsIgnoreCase("in"))
              normalizeIn(left, parseExprTdop(thisPower), negated = false)
            else if (s.equalsIgnoreCase("like")) Binary("like", left, parseExprTdop(thisPower))
            else if (s.equalsIgnoreCase("ilike")) Binary("ilike", left, parseExprTdop(thisPower))
            else if (s.equalsIgnoreCase("between")) {
              val lo = parseExprTdop(PBetween); mustKw("and")
              val hi = parseExprTdop(PBetween)
              BetweenExpr(left, lo, hi, negated = false)
            } else if (s.equalsIgnoreCase("exists")) {
              tryParseFnCallArgs() match {
                case Some(Seq(SubqueryExpr(q))) => ExistsExpr(q, negated = false)
                case _ => err("`exists` should have a subquery argument", t)
              }
            } else err(s"unexpected keyword '$s' in expression", t)
        }
      case _ => err(s"unexpected token in infix position: ${t.t}", t)
    }
  }

  /** `x IN rhs`: paren list parses as TupleLit, subquery as SubqueryExpr —
    * normalize to InList/InSubquery at parse time. */
  private def normalizeIn(left: Expr, rhs: Expr, negated: Boolean): Expr = rhs match {
    case SubqueryExpr(q) => InSubquery(left, q, negated)
    case TupleLit(items) => InList(left, items, negated)
    case single => InList(left, Seq(single), negated)
  }

  // ================== types ==================

  private def parseDataType(): NutType = {
    val names = Seq(
      "int8", "int16", "int32", "int64", "int128",
      "uint8", "uint16", "uint32", "uint64", "uint128",
      "serial32", "serial64", "serial128",
      "userial32", "userial64", "userial128",
      "decimal32", "decimal64", "float32", "float64", "boolean",
      "chars", "string", "uuid", "date", "datetime",
      "array", "enum", "tuple", "map", "dictionary", "nullable")
    val idx = mustOneOfKw(names: _*)
    val name = names(idx)
    name match {
      case "decimal32" | "decimal64" | "chars" =>
        nextExpect(TT.LParen)
        val p = mustIntLit().toInt
        nextExpect(TT.RParen)
        ScalarType(name, Seq(p))
      case "string" =>
        if (peek.t == TT.LParen) {
          next()
          val p = mustIntLit().toInt
          nextExpect(TT.RParen)
          ScalarType(name, Seq(p))
        } else ScalarType(name, Nil)
      case "array" =>
        nextExpect(TT.LParen); val t = parseDataType(); nextExpect(TT.RParen)
        ArrayType(t)
      case "enum" =>
        nextExpect(TT.LParen)
        // ids auto-increment from the last explicit id (mod.rs:1799-1813)
        var id = 0
        val binds = commaSeparated {
          val label = mustStringLit()
          if (nextIf(TT.Eq)) id = mustIntLit().toInt
          val bind = (label, id)
          id += 1
          bind
        }
        nextExpect(TT.RParen)
        EnumType(binds)
      case "tuple" =>
        nextExpect(TT.LParen)
        val ts = commaSeparated(parseDataType())
        nextExpect(TT.RParen)
        TupleType(ts)
      case "map" =>
        // declared order (K, V) is kept — the reference constructor swaps
        // them (mod.rs:1780), a documented upstream bug
        nextExpect(TT.LParen)
        val k = parseDataType(); nextExpect(TT.Comma); val v = parseDataType()
        nextExpect(TT.RParen)
        MapType(k, v)
      case "dictionary" =>
        nextExpect(TT.LParen); val t = parseDataType(); nextExpect(TT.RParen)
        DictionaryType(t)
      case "nullable" =>
        nextExpect(TT.LParen); val t = parseDataType(); nextExpect(TT.RParen)
        NullableType(t)
      case _ => ScalarType(name, Nil)
    }
  }
}

object Parser {
  /** Parse one NutQL statement from text. */
  def parse(sql: String): Statement =
    new Parser(new Lexer(sql).tokenize()).parseStatement()

  /** Parse a standalone expression (testing / config values). */
  def parseExpression(sql: String): Expr =
    new Parser(new Lexer(sql).tokenize()).parseExpr()
}

/** Parse-time constant folding, mirroring src/parser/simplify.rs —
  * corpus file 14.sql exists specifically to exercise these. */
object Simplify {
  import Ast._

  private def isLit(e: Expr): Boolean = e match {
    case _: IntLit | _: FloatLit | _: StringLit | _: BoolLit | NullLit | _: IntervalLit => true
    case _ => false
  }

  def eq(l: Expr, r: Expr): Expr =
    if (isLit(l) && isLit(r)) BoolLit(l == r) else Binary("=", l, r)

  def neq(l: Expr, r: Expr): Expr =
    if (isLit(l) && isLit(r)) BoolLit(l != r) else Binary("!=", l, r)

  def and(l: Expr, r: Expr): Expr = (l, r) match {
    case (BoolLit(true), _) => r
    case (BoolLit(false), _) => BoolLit(false)
    case (_, BoolLit(true)) => l
    case (_, BoolLit(false)) => BoolLit(false)
    case _ => Binary("and", l, r)
  }

  def or(l: Expr, r: Expr): Expr = (l, r) match {
    case (BoolLit(true), _) => BoolLit(true)
    case (BoolLit(false), _) => r
    case (_, BoolLit(true)) => BoolLit(true)
    case (_, BoolLit(false)) => l
    case _ => Binary("or", l, r)
  }

  def xor(l: Expr, r: Expr): Expr = (l, r) match {
    case (BoolLit(b), _) => if (b) not(r) else r
    case (_, BoolLit(b)) => if (b) not(l) else l
    case _ => Binary("xor", l, r)
  }

  def not(e: Expr): Expr = e match {
    case BoolLit(b) => BoolLit(!b)
    case _ => Unary("not", e)
  }

  def isNull(e: Expr): Expr =
    if (isLit(e)) BoolLit(e == NullLit) else Unary("isnull", e)

  def isNotNull(e: Expr): Expr =
    if (isLit(e)) BoolLit(e != NullLit) else Unary("isnotnull", e)
}
