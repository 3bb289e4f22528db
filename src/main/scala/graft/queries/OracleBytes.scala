package graft.queries

/** The shared BLOB-byte-extraction idiom of the byte-indexed oracles
  * (round 14, VERDICT r13 #7): byte j (0-based) of a document's UTF-8
  * encoding, read from `hx = hex(encode(text))` as two hex digits via
  * `strpos('123456789ABCDEF', …)` — a missing digit is '0', whose
  * strpos is 0, exactly its value. Indexing wraps modulo `len`
  * (`octet_length(encode(text))`); empty documents read the space fill
  * byte. One definition expanded into every consumer (qp61/qp90/qp98/
  * qp104/qp107) so the five oracles cannot drift (review r14 #5 — the
  * idiom was previously five hand-maintained copies).
  *
  * Consumers keep plain (non-interpolated) SQL strings — backslash
  * regexes stay literal — and mark byte reads as `BYTEAT{<j expr>}`,
  * expanded by [[OracleBytes.expand]]. The surrounding CTE must expose
  * columns named `len` and `hx`.
  */
object OracleBytes {

  /** The SQL for byte `j` of the cycled document bytes. */
  def byteAt(j: String): String =
    s"""(CASE WHEN len = 0 THEN 32 ELSE
       strpos('123456789ABCDEF', substr(hx, CAST(2 * (($j) % len) + 1 AS INTEGER), 1)) * 16 +
       strpos('123456789ABCDEF', substr(hx, CAST(2 * (($j) % len) + 2 AS INTEGER), 1)) END)"""

  private val marker = "BYTEAT\\{([^}]*)\\}".r

  /** Expand every `BYTEAT{expr}` placeholder in `sql` to [[byteAt]]. */
  def expand(sql: String): String =
    marker.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(byteAt(m.group(1))))
}
