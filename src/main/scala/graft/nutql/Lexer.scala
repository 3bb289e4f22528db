package graft.nutql

import scala.collection.mutable.ArrayBuffer

/** Hand-written lexer for NutQL.
  *
  * Behavior spec is the reference tokenizer
  * (src/parser/tokenizer/mod.rs:66-543):
  *  - whitespace + `--` line comments + `/* */` block comments are skipped
  *  - bare identifiers are ASCII `[A-Za-z_][A-Za-z0-9_]*`
  *  - backtick identifiers may contain anything but a backtick (non-empty)
  *  - `@name` config identifiers, `$<uint>` query parameters
  *  - strings: single- OR double-quoted ('' / "" self-escape,
  *    `\n \r \t \\ \' \" \u{XXXX}` escapes; a raw newline inside is an error)
  *  - numerics: `123`, `0xff`, `0.12`, `.12`, `12.` (exponents are not in
  *    the dialect)
  *  - `=`/`==` → Eq, `!=`/`<>` → NotEq, `<<`/`>>` shifts
  */
final class Lexer(src: String) {
  private var i = 0
  private var line = 1
  private var col = 1

  private def peekCh: Int = if (i < src.length) src.charAt(i) else -1
  private def peekCh2: Int = if (i + 1 < src.length) src.charAt(i + 1) else -1

  private def advance(): Char = {
    val c = src.charAt(i)
    i += 1
    if (c == '\n') { line += 1; col = 1 } else col += 1
    c
  }

  private def err(msg: String): Nothing = throw ParseException(msg, line, col)

  def tokenize(): Vector[Token] = {
    val out = ArrayBuffer.empty[Token]
    while (true) {
      skipWhitespaceAndComments()
      val (l, c) = (line, col)
      if (i >= src.length) {
        out += Token(TokenType.EOF, "", l, c)
        return out.toVector
      }
      val ch = src.charAt(i)
      ch match {
        case '(' => advance(); out += Token(TokenType.LParen, "(", l, c)
        case ')' => advance(); out += Token(TokenType.RParen, ")", l, c)
        case '[' => advance(); out += Token(TokenType.LBracket, "[", l, c)
        case ']' => advance(); out += Token(TokenType.RBracket, "]", l, c)
        case '{' => advance(); out += Token(TokenType.LBrace, "{", l, c)
        case '}' => advance(); out += Token(TokenType.RBrace, "}", l, c)
        case ',' => advance(); out += Token(TokenType.Comma, ",", l, c)
        case ':' => advance(); out += Token(TokenType.Colon, ":", l, c)
        case ';' => advance(); out += Token(TokenType.SemiColon, ";", l, c)
        case '+' => advance(); out += Token(TokenType.Plus, "+", l, c)
        case '-' => advance(); out += Token(TokenType.Minus, "-", l, c)
        case '*' => advance(); out += Token(TokenType.Mul, "*", l, c)
        case '/' => advance(); out += Token(TokenType.Div, "/", l, c)
        case '%' => advance(); out += Token(TokenType.Mod, "%", l, c)
        case '&' => advance(); out += Token(TokenType.BitAnd, "&", l, c)
        case '|' => advance(); out += Token(TokenType.BitOr, "|", l, c)
        case '^' => advance(); out += Token(TokenType.BitXor, "^", l, c)
        case '~' => advance(); out += Token(TokenType.BitNot, "~", l, c)
        case '=' =>
          advance()
          if (peekCh == '=') advance()
          out += Token(TokenType.Eq, "=", l, c)
        case '!' =>
          advance()
          if (peekCh == '=') { advance(); out += Token(TokenType.NotEq, "!=", l, c) }
          else err("expected '=' after '!'")
        case '<' =>
          advance()
          peekCh match {
            case '=' => advance(); out += Token(TokenType.LtEq, "<=", l, c)
            case '>' => advance(); out += Token(TokenType.NotEq, "<>", l, c)
            case '<' => advance(); out += Token(TokenType.BitLShift, "<<", l, c)
            case _ => out += Token(TokenType.Lt, "<", l, c)
          }
        case '>' =>
          advance()
          peekCh match {
            case '=' => advance(); out += Token(TokenType.GtEq, ">=", l, c)
            case '>' => advance(); out += Token(TokenType.BitRShift, ">>", l, c)
            case _ => out += Token(TokenType.Gt, ">", l, c)
          }
        case '`' => out += lexDelimitedIdent(l, c)
        case '@' => out += lexConfigIdent(l, c)
        case '$' => out += lexQueryParam(l, c)
        case '\'' => out += lexString('\'', l, c)
        case '"' => out += lexString('"', l, c)
        case d if d == '.' || (d >= '0' && d <= '9') => out += lexDotOrNumeric(l, c)
        case a if a == '_' || a.isLetter && a < 128 => out += lexIdent(l, c)
        case other => err(s"'$other' is invalid outside string literal")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def skipWhitespaceAndComments(): Unit = {
    var more = true
    while (more) {
      more = false
      while (i < src.length && src.charAt(i).isWhitespace) { advance(); more = true }
      if (i + 1 < src.length && src.charAt(i) == '-' && src.charAt(i + 1) == '-') {
        while (i < src.length && src.charAt(i) != '\n') advance()
        more = true
      } else if (i + 1 < src.length && src.charAt(i) == '/' && src.charAt(i + 1) == '*') {
        advance(); advance()
        var closed = false
        while (i < src.length && !closed) {
          if (src.charAt(i) == '*' && peekCh2 == '/') { advance(); advance(); closed = true }
          else advance()
        }
        if (!closed) err("unterminated block comment")
        more = true
      }
    }
  }

  private def lexIdent(l: Int, c: Int): Token = {
    val start = i
    while (i < src.length && {
        val ch = src.charAt(i)
        ch == '_' || (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9')
      }) advance()
    Token(TokenType.KeywordOrIdentifier, src.substring(start, i), l, c)
  }

  private def lexDelimitedIdent(l: Int, c: Int): Token = {
    advance() // `
    val start = i
    while (i < src.length && src.charAt(i) != '`') advance()
    if (i >= src.length) err("unterminated delimited identifier")
    val text = src.substring(start, i)
    advance() // `
    if (text.isEmpty) err("empty delimited identifier")
    Token(TokenType.DelimitedIdentifier, text, l, c)
  }

  private def lexConfigIdent(l: Int, c: Int): Token = {
    advance() // @
    if (i >= src.length || !(src.charAt(i) == '_' || src.charAt(i).isLetter))
      err("expected identifier after '@'")
    val t = lexIdent(l, c)
    Token(TokenType.ConfigIdentifier, t.text, l, c)
  }

  private def lexQueryParam(l: Int, c: Int): Token = {
    advance() // $
    val start = i
    while (i < src.length && src.charAt(i).isDigit) advance()
    if (i == start) err("expected digits after '$'")
    // `$0a` is an error, not two tokens (reference tokenizer)
    if (i < src.length && (src.charAt(i) == '_' || src.charAt(i).isLetter))
      err(s"invalid char '${src.charAt(i)}' in query parameter")
    Token(TokenType.QueryParameter, src.substring(start, i), l, c)
  }

  private def lexString(quote: Char, l: Int, c: Int): Token = {
    advance() // opening quote
    val sb = new StringBuilder
    var done = false
    while (!done) {
      if (i >= src.length) err("unterminated string literal")
      val ch = src.charAt(i)
      if (ch == '\n' || ch == '\r') err("raw newline in string literal (use \\n)")
      else if (ch == quote) {
        advance()
        if (peekCh == quote) { sb += quote; advance() } // '' self-escape
        else done = true
      } else if (ch == '\\') {
        advance()
        if (i >= src.length) err("dangling escape")
        advance() match {
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case 't' => sb += '\t'
          case '\\' => sb += '\\'
          case '\'' => sb += '\''
          case '"' => sb += '"'
          case 'u' =>
            if (peekCh != '{') err("expected '{' in \\u escape")
            advance()
            val hs = new StringBuilder
            while (i < src.length && src.charAt(i) != '}') hs += advance()
            if (i >= src.length) err("unterminated \\u escape")
            advance() // }
            if (hs.isEmpty || !hs.forall(isHexDigit)) err("\\u escape needs 1+ hex digits")
            val cp =
              try Integer.parseInt(hs.toString, 16)
              catch { case _: NumberFormatException => err("\\u escape out of range") }
            if (!Character.isValidCodePoint(cp)) err(s"invalid Unicode code point in \\u escape")
            sb.appendAll(Character.toChars(cp))
          case other => err(s"unknown escape '\\$other'")
        }
      } else { sb += ch; advance() }
    }
    Token(TokenType.StringLiteral, sb.toString, l, c)
  }

  private def lexDotOrNumeric(l: Int, c: Int): Token = {
    // `.` not followed by a digit is a Dot token (member access)
    if (src.charAt(i) == '.' && !(peekCh2 >= '0' && peekCh2 <= '9')) {
      advance()
      return Token(TokenType.Dot, ".", l, c)
    }
    // hex
    if (src.charAt(i) == '0' && (peekCh2 == 'x' || peekCh2 == 'X')) {
      advance(); advance()
      val start = i
      while (i < src.length && isHexDigit(src.charAt(i))) advance()
      if (i == start) err("expected hex digits after 0x")
      return Token(TokenType.HexLiteral, src.substring(start, i), l, c)
    }
    val start = i
    var isFloat = false
    while (i < src.length && src.charAt(i).isDigit) advance()
    if (i < src.length && src.charAt(i) == '.') {
      isFloat = true
      advance()
      while (i < src.length && src.charAt(i).isDigit) advance()
    }
    val text = src.substring(start, i)
    // reference tokenizer: a numeric immediately followed by an identifier
    // char is an error (`1d`, `1.d`), not two tokens
    if (i < src.length && (src.charAt(i) == '_' || src.charAt(i).isLetter))
      err(s"invalid char '${src.charAt(i)}' after numeric literal")
    if (isFloat) Token(TokenType.FloatLiteral, text, l, c)
    else Token(TokenType.IntegerLiteral, text, l, c)
  }

  private def isHexDigit(ch: Char): Boolean =
    ch.isDigit || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')
}
