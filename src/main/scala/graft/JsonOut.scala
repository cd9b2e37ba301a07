package graft

/** The ONE JSON string escaper behind both driver-contract artifacts
  * (Verify's oracle_sql.json and Bench's one-line bench.json). Verify
  * and Bench each carried a hand-rolled copy that had already drifted
  * (named vs \\uXXXX control escapes) — one implementation means an
  * edge-case fix cannot reach one artifact and miss the other. Escapes
  * quote, backslash, and ALL control chars (< 0x20), which is exactly
  * the set RFC 8259 requires for a valid JSON string. */
private[graft] object JsonOut {
  /** escape CONTENT only (no surrounding quotes) */
  def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** a complete JSON string literal */
  def quote(s: String): String = "\"" + esc(s) + "\""
}
