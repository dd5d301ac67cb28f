package graft.io.pg

/** PostgreSQL COPY TEXT-format row codec, shared by both wire ends:
  * fields tab-delimited, rows newline-terminated, `\N` for SQL NULL,
  * backslash escapes for the delimiter/terminator/backslash — the
  * published `COPY … FROM/TO` text rules. The client uses [[encodeRow]]
  * for COPY FROM STDIN framing and [[decodeRow]] for COPY TO STDOUT;
  * the server uses the mirror pair, so one codec (not two private
  * copies) defines the dialect. */
object PgTextCopy {

  /** One field: null → `\N`, else escape `\ \t \n \r`. */
  def esc(v: Option[String]): String = v match {
    case None => "\\N"
    case Some(s) => s.flatMap {
      case '\\' => "\\\\"
      case '\t' => "\\t"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    }
  }

  /** One row WITHOUT the trailing newline. */
  def encodeRow(row: Seq[Option[String]]): String =
    row.map(esc).mkString("\t")

  /** One text-format COPY line → field values (null for `\N`). */
  def decodeRow(line: String): Seq[String] = {
    val fields = Seq.newBuilder[String]
    val cur = new StringBuilder
    var escaped = false
    var isNull = false
    def flush(): Unit = {
      fields += (if (isNull && cur.isEmpty) null else cur.toString)
      cur.clear(); isNull = false
    }
    line.foreach { c =>
      if (escaped) {
        c match {
          case 'N' => isNull = true
          case 't' => cur.append('\t')
          case 'n' => cur.append('\n')
          case 'r' => cur.append('\r')
          case '\\' => cur.append('\\')
          case other => cur.append(other)
        }
        escaped = false
      } else c match {
        case '\\' => escaped = true
        case '\t' => flush()
        case other => cur.append(other)
      }
    }
    flush()
    fields.result()
  }

  /** Split a complete text COPY payload into lines, keeping interior
    * empties (a single-column table's empty line IS a valid row) and
    * dropping only the final empty element from the trailing \n. */
  def splitLines(text: String): Seq[String] = {
    val parts = text.split("\n", -1)
    if (parts.nonEmpty && parts.last.isEmpty) parts.toSeq.dropRight(1)
    else parts.toSeq
  }
}
