package graft.nutql

import org.scalatest.funsuite.AnyFunSuite
import graft.nutql.Ast._

/** Parser tests: the reference's 14-file corpus (tests/parser_test.rs:3-34
  * asserts parse-ok over tests/sql/1.sql…14.sql), plus structural and
  * precedence assertions the reference lacks. */
class ParserSpec extends AnyFunSuite {

  private val corpusDir = new java.io.File("/root/reference/tests/sql")

  (1 to 14).foreach { n =>
    test(s"corpus $n.sql parses") {
      val sql = new String(
        java.nio.file.Files.readAllBytes(new java.io.File(corpusDir, s"$n.sql").toPath),
        "UTF-8")
      val stmt = Parser.parse(sql)
      assert(stmt != null)
    }
  }

  private def expr(s: String): Expr = Parser.parseExpression(s)
  private def query(s: String): QueryBody =
    Parser.parse(s).asInstanceOf[SelectStmt].query.asInstanceOf[QueryBody]

  test("bitwise binds tighter than comparison (NutQL ladder)") {
    // a & 3 = 1  parses as  (a & 3) = 1
    assert(expr("a & 3 = 1") ==
      Binary("=", Binary("&", Ident(None, "a"), IntLit(3)), IntLit(1)))
    // a << 1 + 2 parses as a << (1 + 2): PlusMinus binds tighter than shift
    assert(expr("a << 1 + 2") ==
      Binary("<<", Ident(None, "a"), Binary("+", IntLit(1), IntLit(2))))
  }

  test("boolean ladder: or < xor < and < not < comparison") {
    assert(expr("a or b and c") ==
      Binary("or", Ident(None, "a"), Binary("and", Ident(None, "b"), Ident(None, "c"))))
    assert(expr("a xor b or c") ==
      Binary("or", Binary("xor", Ident(None, "a"), Ident(None, "b")), Ident(None, "c")))
    // prefix NOT binds only the following prefix expr (reference
    // mod.rs:1294-1296 recurses into must_parse_expr_prefix, not the full
    // TDOP loop): `not a = b` is `(not a) = b`
    assert(expr("not a = b") ==
      Binary("=", Unary("not", Ident(None, "a")), Ident(None, "b")))
  }

  test("arithmetic precedence and left associativity") {
    assert(expr("1 + 2 * 3") == Binary("+", IntLit(1), Binary("*", IntLit(2), IntLit(3))))
    assert(expr("a - b - c") ==
      Binary("-", Binary("-", Ident(None, "a"), Ident(None, "b")), Ident(None, "c")))
  }

  test("parse-time constant folding (simplify.rs semantics)") {
    assert(expr("1 = 1") == BoolLit(true))
    assert(expr("'a' = 'b'") == BoolLit(false))
    assert(expr("1 != 'a'") == BoolLit(true))
    assert(expr("1 IS NULL") == BoolLit(false))
    assert(expr("null IS NULL") == BoolLit(true))
    assert(expr("NOT true") == BoolLit(false))
    assert(expr("true AND false OR false AND true") == BoolLit(false))
    assert(expr("col IS NULL") == Unary("isnull", Ident(None, "col")))
    // x XOR true folds to NOT x
    assert(expr("random() XOR true") == Unary("not", FnCall("random", Nil)))
  }

  test("IN list / IN subquery normalization") {
    assert(expr("x in (1, 2, 3)") == InList(Ident(None, "x"), Seq(IntLit(1), IntLit(2), IntLit(3)), negated = false))
    assert(expr("x not in (1)") == InList(Ident(None, "x"), Seq(IntLit(1)), negated = true))
    expr("x in (select a from t)") match {
      case InSubquery(Ident(None, "x"), _, false) => ()
      case other => fail(s"got $other")
    }
  }

  test("EXISTS prefix and infix forms both normalize") {
    // prefix position: `exists(...)` lexes as a plain fn call in the
    // reference (mod.rs:1304-1307); we keep FnCall and normalize in binder
    expr("exists(select a from t)") match {
      case FnCall("exists", Seq(SubqueryExpr(_))) => ()
      case other => fail(s"got $other")
    }
    // `not exists(...)` in prefix position: NOT wraps the plain fn call
    // (reference parses prefix-not over a prefix expr); the binder
    // normalizes Unary(not, FnCall(exists)) → anti join
    expr("a = 1 and not exists (select a from t)") match {
      case Binary("and", _, Unary("not", FnCall("exists", Seq(SubqueryExpr(_))))) => ()
      case other => fail(s"got $other")
    }
    // infix form after a left operand: `x not exists(...)` → ExistsExpr
    expr("x not exists(select a from t)") match {
      case ExistsExpr(_, true) => ()
      case other => fail(s"got $other")
    }
  }

  test("BETWEEN sugar") {
    assert(expr("x between 1 and 5") ==
      BetweenExpr(Ident(None, "x"), IntLit(1), IntLit(5), negated = false))
    assert(expr("x not between 1 and 5") ==
      BetweenExpr(Ident(None, "x"), IntLit(1), IntLit(5), negated = true))
  }

  test("CASE searched and simple forms; missing ELSE is None") {
    expr("case when a then 1 else 2 end") match {
      case CaseExpr(None, Seq((Ident(None, "a"), IntLit(one))), Some(IntLit(two))) =>
        assert(one == 1 && two == 2)
      case other => fail(s"got $other")
    }
    expr("case x when 1 then 'a' end") match {
      case CaseExpr(Some(Ident(None, "x")), Seq((IntLit(_), StringLit("a"))), None) => ()
      case other => fail(s"got $other")
    }
  }

  test("IF THEN ELSE END sugar") {
    assert(expr("if a then 1 else 2 end") ==
      FnCall("if", Seq(Ident(None, "a"), IntLit(1), IntLit(2))))
  }

  test("collection literals") {
    assert(expr("(1, 2)") == TupleLit(Seq(IntLit(1), IntLit(2))))
    assert(expr("[1, 2]") == ArrayLit(Seq(IntLit(1), IntLit(2))))
    assert(expr("{'k': 1}") == MapLit(Seq(StringLit("k") -> IntLit(1))))
    // single paren expr is a wrapper, not a 1-tuple
    assert(expr("(1)") == IntLit(1))
  }

  test("interval literals") {
    assert(expr("interval 10 day") == IntervalLit(10, "day"))
    assert(expr("d - interval 3 month") ==
      Binary("-", Ident(None, "d"), IntervalLit(3, "month")))
  }

  test("index access and qualified identifiers") {
    assert(expr("arr[1]") == Binary("[]", Ident(None, "arr"), IntLit(1)))
    assert(expr("t.c") == Ident(Some("t"), "c"))
    assert(expr("t.*") == Wildcard(Some("t")))
    assert(expr("`weird name`.c") == Ident(Some("weird name"), "c"))
  }

  test("negative literals only directly before numerics") {
    assert(expr("-5") == IntLit(-5))
    assert(expr("-0x10") == IntLit(-16))
    assert(expr("-1.5") == FloatLit(BigDecimal("-1.5")))
    assertThrows[ParseException](expr("-a"))
  }

  test("set-op precedence: intersect > union > except, left-assoc") {
    // a UNION ALL b INTERSECT c  ⇒  a UNION ALL (b INTERSECT c)
    Parser.parse("select 1 union all select 2 intersect select 3") match {
      case SelectStmt(SetOpQuery("union_all", _: QueryBody, SetOpQuery("intersect", _, _))) => ()
      case other => fail(s"got $other")
    }
    // a EXCEPT b UNION ALL c  ⇒  a EXCEPT (b UNION ALL c)
    Parser.parse("select 1 except select 2 union all select 3") match {
      case SelectStmt(SetOpQuery("except", _: QueryBody, SetOpQuery("union_all", _, _))) => ()
      case other => fail(s"got $other")
    }
    // without parens, EXCEPT binds looser than INTERSECT:
    // a INTERSECT b EXCEPT c ⇒ (a INTERSECT b) EXCEPT c
    Parser.parse("select 1 intersect select 2 except select 3") match {
      case SelectStmt(SetOpQuery("except", SetOpQuery("intersect", _, _), _: QueryBody)) => ()
      case other => fail(s"got $other")
    }
    // parens on the right side reset the binding power:
    // a INTERSECT (b EXCEPT c)
    Parser.parse("select 1 intersect (select 2 except select 3)") match {
      case SelectStmt(SetOpQuery("intersect", _: QueryBody, SetOpQuery("except", _, _))) => ()
      case other => fail(s"got $other")
    }
    // bare UNION (no ALL|DISTINCT) is an error
    assertThrows[ParseException](Parser.parse("select 1 union select 2"))
  }

  test("query clause structure") {
    val q = query(
      """with x as (select a from t)
        select distinct on (a) a, b as bb from x as y
        inner join z on a = c
        where a > 1 group by a, b having count(*) > 0
        order by a desc, b limit 10 offset 5 with ties""")
    assert(q.ctes.map(_._1) == Seq("x"))
    assert(q.distinct == Some(Seq(Ident(None, "a"))))
    assert(q.selectList.size == 2 && q.selectList(1).alias == Some("bb"))
    assert(q.from == Some(TableSource("x", Some("y"))))
    assert(q.joins.head.joinType == "inner")
    assert(q.where.isDefined && q.groupBy.size == 2 && q.having.isDefined)
    assert(q.orderBy == Seq(OrderKey(Ident(None, "a"), desc = true), OrderKey(Ident(None, "b"), desc = false)))
    assert(q.limit == Some(LimitClause(IntLit(10), Some(IntLit(5)), withTies = true)))
  }

  test("limit o,n form") {
    val q = query("select a from t limit 5, 10")
    assert(q.limit == Some(LimitClause(IntLit(10), Some(IntLit(5)), withTies = false)))
  }

  test("join type full surface") {
    def jt(s: String): String =
      query(s"select a from t $s join u on a = b").joins.head.joinType
    assert(jt("") == "inner")
    assert(jt("inner") == "inner")
    assert(jt("left") == "left")
    assert(jt("left outer") == "left")
    assert(jt("right") == "right")
    assert(jt("full") == "full")
    assert(jt("full outer") == "full")
    assert(jt("left semi") == "left_semi")
    assert(jt("left anti") == "left_anti")
    assert(jt("right semi") == "right_semi")
    assert(jt("right anti") == "right_anti")
    assert(jt("asof") == "asof")
    assert(jt("asof left") == "asof_left")
    assert(jt("left asof") == "asof_left")
  }

  test("USING join condition") {
    query("select a from t join u using (a, b)").joins.head.condition match {
      case UsingCondition(Seq("a", "b")) => ()
      case other => fail(s"got $other")
    }
  }

  test("CREATE TABLE with indexes, constraints, trailing attrs") {
    val stmt = Parser.parse(
      """create table if not exists t (
           a Int32 default 1 comment 'col a',
           b Nullable(String),
           c Decimal64(4),
           index ix minmax(a),
           constraint ck check a > 0
         ) primary key a order by a, b partition by b comment 'tbl'""")
      .asInstanceOf[CreateTableStmt]
    assert(stmt.ifNotExists)
    assert(stmt.columns.map(_.name) == Seq("a", "b", "c"))
    assert(stmt.columns(0).default == Some(IntLit(1)))
    assert(stmt.columns(1).dataType == NullableType(ScalarType("string", Nil)))
    assert(stmt.columns(2).dataType == ScalarType("decimal64", Seq(4)))
    assert(stmt.indexes.map(_.name) == Seq("ix"))
    assert(stmt.constraints.map(_.name) == Seq("ck"))
    assert(stmt.primaryKey == Seq(Ident(None, "a")))
    assert(stmt.orderBy.size == 2 && stmt.partitionBy.isDefined && stmt.comment == Some("tbl"))
    // duplicate attr is an error
    assertThrows[ParseException](
      Parser.parse("create table t (a Int32) order by a order by a"))
  }

  test("enum binds auto-increment from last explicit id") {
    val stmt = Parser.parse(
      "create table t (e Enum('a' = 5, 'b', 'c' = 1, 'd'))").asInstanceOf[CreateTableStmt]
    assert(stmt.columns.head.dataType ==
      EnumType(Seq("a" -> 5, "b" -> 6, "c" -> 1, "d" -> 2)))
  }

  test("Map type keeps declared (K,V) order — superset fix") {
    val stmt = Parser.parse("create table t (m Map(String, Int64))").asInstanceOf[CreateTableStmt]
    assert(stmt.columns.head.dataType ==
      MapType(ScalarType("string", Nil), ScalarType("int64", Nil)))
  }

  test("CREATE VIEW requires UPDATE BY strategy") {
    val v = Parser.parse(
      "create view v update by Summing order by k as select k, n from t")
      .asInstanceOf[CreateViewStmt]
    assert(v.strategy == "Summing")
    assertThrows[ParseException](Parser.parse("create view v as select 1"))
  }

  test("INSERT forms") {
    Parser.parse("insert into t (a, b) values (1, 2), (3, 4)") match {
      case InsertStmt("t", Seq("a", "b"), InsertValues(rows)) => assert(rows.size == 2)
      case other => fail(s"got $other")
    }
    Parser.parse("insert into t select a from u") match {
      case InsertStmt("t", Nil, InsertQuery(_)) => ()
      case other => fail(s"got $other")
    }
    Parser.parse("insert into t from file('x.parquet')") match {
      case InsertStmt("t", Nil, InsertFn(FnCall("file", _))) => ()
      case other => fail(s"got $other")
    }
    // row arity mismatch is an error
    assertThrows[ParseException](Parser.parse("insert into t values (1, 2), (3)"))
  }

  test("utility statements") {
    assert(Parser.parse("explain select 1") ==
      ExplainStmt(SelectStmt(QueryBody(Nil, None, Seq(SelectItem(IntLit(1), None)), None, Nil, None, Nil, None, Nil, None))))
    assert(Parser.parse("describe table t") == DescribeStmt(TableEntity, Some("t")))
    assert(Parser.parse("describe database") == DescribeStmt(DatabaseEntity, None))
    assert(Parser.parse("drop table if exists t") == DropStmt(TableEntity, "t", ifExists = true))
    assert(Parser.parse("truncate view v") == TruncateStmt(ViewEntity, "v", ifExists = false))
    assert(Parser.parse("optimize table t") == OptimizeStmt("t", None))
    Parser.parse("optimize table t on partition 'p'") match {
      case OptimizeStmt("t", Some(StringLit("p"))) => ()
      case other => fail(s"got $other")
    }
    Parser.parse("alter table t add column c Int32 after b") match {
      case AlterTableStmt("t", AddColumn(cd, false, Some(PositionAfter("b")))) =>
        assert(cd.name == "c")
      case other => fail(s"got $other")
    }
    assert(Parser.parse("alter table t rename table t2") ==
      AlterTableStmt("t", RenameTable("t2")))
    assert(Parser.parse("set @max_rows = 1000") == SetStmt("max_rows", IntLit(1000)))
  }

  test("statement terminator rules") {
    assert(Parser.parse("select 1;") != null)
    assertThrows[ParseException](Parser.parse("select 1; select 2"))
    assertThrows[ParseException](Parser.parse(""))
    assertThrows[ParseException](Parser.parse("1 + 1"))
  }

  test("query parameters and config identifiers in expressions") {
    assert(expr("$0") == Param(0))
    val q = query("select a from t where event_type = $1")
    assert(q.where == Some(Binary("=", Ident(None, "event_type"), Param(1))))
  }

  test("string + string concat parse shape (type-directed lowering later)") {
    assert(expr("a + ' ' + b") ==
      Binary("+", Binary("+", Ident(None, "a"), StringLit(" ")), Ident(None, "b")))
  }
}
