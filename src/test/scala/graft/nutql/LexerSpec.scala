package graft.nutql

import org.scalatest.funsuite.AnyFunSuite
import graft.nutql.{TokenType => TT}

/** Tokenizer unit tests ported from the reference suite
  * (src/parser/tokenizer/mod.rs:545-783). */
class LexerSpec extends AnyFunSuite {

  private def toks(s: String): Vector[Token] = new Lexer(s).tokenize().dropRight(1)
  private def one(s: String): Token = toks(s).head
  private def fails(s: String): Unit =
    assertThrows[ParseException](new Lexer(s).tokenize())

  test("whitespace folding yields no tokens") {
    assert(toks(Seq("    ", "\t\t", "\n", "\r\n", "\r").mkString(" ")).isEmpty)
  }

  test("numerics") {
    assert(one("510").t == TT.IntegerLiteral)
    assert(one("0.123").t == TT.FloatLiteral)
    assert(one(".123").t == TT.FloatLiteral)
    assert(one("1.").t == TT.FloatLiteral)
    assert(one("0x123").t == TT.HexLiteral)
    assert(one("0x123").text == "123")
  }

  test("numeric failures") {
    fails("1d")
    fails("1好")
    fails("1.d")
  }

  test("strings with self-escape and backslash escapes") {
    assert(one("\"hello\"").text == "hello")
    assert(one("'hello'").text == "hello")
    assert(one("'he''llo'").text == "he'llo")
    assert(one("\"he\"\"llo\"").text == "he\"llo")
    assert(one("'h\\t i\\r\\n'").text == "h\t i\r\n")
    assert(one("'\\u{48}i'").text == "Hi")
  }

  test("string failures") {
    fails("\"hello'")
    fails("\"\n\"")
    fails("\"\r\"")
    fails("'\\u{}'")   // empty \u braces
    fails("'\\u{zz}'") // non-hex
    fails("'\\u{110000}'") // beyond max code point
  }

  test("identifiers") {
    val t1 = one("hello_world")
    assert(t1.t == TT.KeywordOrIdentifier && t1.text == "hello_world")
    val t2 = one("`select`")
    assert(t2.t == TT.DelimitedIdentifier && t2.text == "select")
    val t3 = one("`你 好`")
    assert(t3.t == TT.DelimitedIdentifier && t3.text == "你 好")
    val t4 = one("@a")
    assert(t4.t == TT.ConfigIdentifier && t4.text == "a")
  }

  test("identifier failures") {
    fails("``")
    fails("@")
    fails("你好")
    fails("@你好")
    fails("hello_你好")
  }

  test("query parameters") {
    assert(one("$0").text == "0")
    assert(one("$01").text == "01")
    assert(one("$9").text == "9")
    fails("$")
    fails("$a")
    fails("$0a")
    fails("$_0")
  }

  test("comments are skipped") {
    assert(toks("hello -- world").map(_.text) == Vector("hello"))
    assert(toks("/* hello */").isEmpty)
    assert(toks("hello /* \n */world").map(_.text) == Vector("hello", "world"))
    fails("/*")
    fails("/* /")
  }

  test("symbols") {
    val cases = Seq(
      "." -> TT.Dot, "+" -> TT.Plus, "-" -> TT.Minus, "*" -> TT.Mul,
      "/" -> TT.Div, "%" -> TT.Mod, "&" -> TT.BitAnd, "|" -> TT.BitOr,
      "^" -> TT.BitXor, ">>" -> TT.BitRShift, "<<" -> TT.BitLShift,
      "=" -> TT.Eq, "==" -> TT.Eq, "!=" -> TT.NotEq, "<>" -> TT.NotEq,
      ">" -> TT.Gt, ">=" -> TT.GtEq, "<" -> TT.Lt, "<=" -> TT.LtEq,
      ":" -> TT.Colon, "," -> TT.Comma, ";" -> TT.SemiColon,
      "[" -> TT.LBracket, "]" -> TT.RBracket, "{" -> TT.LBrace,
      "}" -> TT.RBrace, "(" -> TT.LParen, ")" -> TT.RParen)
    cases.foreach { case (s, tt) => assert(one(s).t == tt, s"for '$s'") }
    fails("!")
  }

  test("full query token stream") {
    val ts = toks(
      """
SELECT *
FROM
(
    SELECT count() AS `c`
    FROM events
    WHERE event_type = $0
    GROUP BY name
)""")
    val expected = Vector(
      TT.KeywordOrIdentifier, TT.Mul, TT.KeywordOrIdentifier, TT.LParen,
      TT.KeywordOrIdentifier, TT.KeywordOrIdentifier, TT.LParen, TT.RParen,
      TT.KeywordOrIdentifier, TT.DelimitedIdentifier, TT.KeywordOrIdentifier,
      TT.KeywordOrIdentifier, TT.KeywordOrIdentifier, TT.KeywordOrIdentifier,
      TT.Eq, TT.QueryParameter, TT.KeywordOrIdentifier, TT.KeywordOrIdentifier,
      TT.KeywordOrIdentifier, TT.RParen)
    assert(ts.map(_.t) == expected)
  }
}
