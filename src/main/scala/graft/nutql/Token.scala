package graft.nutql

/** Token model for the NutQL dialect.
  *
  * Mirrors the reference token surface (src/parser/tokenizer/token.rs:6-92):
  * keyword-or-identifier tokens (keywords are matched case-insensitively at
  * parse time, not lex time), backtick-delimited identifiers, `@config`
  * identifiers, `$n` query parameters, raw/escaped string literals,
  * int/float/hex numerics, and the operator/symbol set. `=` and `==` both
  * lex to Eq; `!=` and `<>` both to NotEq; `--` and C-style block comments
  * count as whitespace.
  */
object TokenType extends Enumeration {
  type TokenType = Value
  val KeywordOrIdentifier, DelimitedIdentifier, ConfigIdentifier,
      QueryParameter, StringLiteral, IntegerLiteral, FloatLiteral, HexLiteral,
      Comma, Dot, Colon, SemiColon,
      Plus, Minus, Mul, Div, Mod,
      Eq, NotEq, Lt, Gt, LtEq, GtEq,
      LParen, RParen, LBracket, RBracket, LBrace, RBrace,
      BitAnd, BitOr, BitXor, BitNot, BitLShift, BitRShift,
      EOF = Value
}

final case class Token(t: TokenType.TokenType, text: String, line: Int, col: Int) {
  def isTerminator: Boolean =
    t == TokenType.EOF || t == TokenType.SemiColon
  def maybeKeyword: Boolean = t == TokenType.KeywordOrIdentifier
  /** Case-insensitive keyword test (reference test_keyword!, mod.rs:53-57). */
  def isKw(kw: String): Boolean = maybeKeyword && text.equalsIgnoreCase(kw)
}

final case class ParseException(message: String, line: Int, col: Int)
    extends RuntimeException(s"$message at line $line col $col")
