package graft.io.pg

import scala.collection.mutable

/** PostgreSQL COPY CSV-format row codec (`COPY … WITH (FORMAT CSV)`,
  * default options: delimiter `,`, quote `"`, escape `"` (doubling),
  * NULL = unquoted empty string) — the third published COPY format
  * beside text and binary. The semantics worth pinning:
  *
  *   - an UNQUOTED empty field is SQL NULL; a QUOTED `""` is the empty
  *     string — the distinction text format draws with `\N`, drawn here
  *     by quoting (PG's CSV output quotes empty strings for exactly
  *     this reason);
  *   - a quoted field may contain the delimiter, the quote (doubled),
  *     CR and LF — so row framing must be QUOTE-AWARE; naive
  *     split-on-newline corrupts any field with an embedded newline;
  *   - output quotes only when needed (delimiter/quote/CR/LF present,
  *     or the value is empty or equals the null string's spelling).
  *
  * Like [[PgTextCopy]], one codec defines the dialect for both wire
  * ends. On-wire the overall CopyInResponse/CopyOutResponse format
  * byte is 0 (CSV is a flavor of the text format in the protocol) —
  * the STATEMENT, not the wire, decides the framing, exactly as in
  * real PostgreSQL. */
object PgCsvCopy {

  /** One field: null → unquoted empty; quoted (with `""` doubling)
    * when the value needs it. */
  def esc(v: Option[String]): String = v match {
    case None => ""
    case Some(s) =>
      val needsQuote = s.isEmpty ||
        s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r')
      if (needsQuote) "\"" + s.replace("\"", "\"\"") + "\""
      else s
  }

  /** One row WITHOUT the trailing newline. */
  def encodeRow(row: Seq[Option[String]]): String =
    row.map(esc).mkString(",")

  /** Decode a COMPLETE CSV COPY payload into rows (null = SQL NULL).
    * Quote-aware: embedded delimiters/quotes/newlines inside quoted
    * fields never split a row. A lone trailing newline terminates the
    * last row (PG emits one per row). */
  def decodeRows(payload: String): Seq[Seq[String]] = {
    val rows = mutable.ArrayBuffer[Seq[String]]()
    val fields = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var quoted = false    // inside a quoted section
    var wasQuoted = false // this field had quotes → never NULL
    var i = 0
    val n = payload.length
    def endField(): Unit = {
      fields += (if (!wasQuoted && cur.isEmpty) null else cur.toString)
      cur.clear(); wasQuoted = false
    }
    def endRow(): Unit = {
      endField()
      rows += fields.toSeq
      fields.clear()
    }
    while (i < n) {
      val c = payload(i)
      if (quoted) {
        if (c == '"') {
          if (i + 1 < n && payload(i + 1) == '"') { cur.append('"'); i += 1 }
          else quoted = false
        } else cur.append(c)
      } else c match {
        case '"' => quoted = true; wasQuoted = true
        case ',' => endField()
        case '\n' => endRow()
        case '\r' => // CRLF tolerated: swallow, the \n ends the row
          if (i + 1 >= n || payload(i + 1) != '\n') cur.append('\r')
        case other => cur.append(other)
      }
      i += 1
    }
    if (quoted)
      throw PgLiteEngine.PgError("22P04", "unterminated CSV quoted field")
    // payload without a final newline still carries a last row
    if (cur.nonEmpty || wasQuoted || fields.nonEmpty) endRow()
    rows.toSeq
  }
}
