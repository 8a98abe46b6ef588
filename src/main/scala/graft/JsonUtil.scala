package graft

/** Shared JSON string escaping for the two driver-facing mains — one
  * malformed character in a hand-built JSON line loses the round's
  * verify or bench data, so both use the same escaper. */
private[graft] object JsonUtil {
  /** Quote + escape: backslash, quote, and ALL control chars (<0x20). */
  def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
