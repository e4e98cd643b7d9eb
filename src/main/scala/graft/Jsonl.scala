package graft

/** The one JSON string escaper both artifact writers (Verify, Bench)
  * share — backslash, quote, and ALL control chars (< 0x20), so a tab
  * or CR in builder-authored SQL or an exception message can't corrupt
  * the driver's json.load. */
private[graft] object Jsonl {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
