package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import java.time.{Instant, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatterBuilder
import java.time.temporal.ChronoField

/** PostgreSQL COPY-text-format reader/writer (SURVEY §2.1 S1, §7.5 item
  * 9): the reference loads its 15 tables from ~47k lines of inline
  * `COPY ... FROM stdin` data — tab-separated, `\N` nulls, backslash
  * escapes, and `{...}` array literals (film.special_features).
  *
  * Distributed by construction: `spark.read.textFile` splits the input
  * across executors and the line parser is a pure map — a 100 TB COPY
  * extract parses with zero shuffles. (Header/footer `\.` lines are
  * filtered, so files may be concatenated or split arbitrarily.)
  */
object PgCopy {

  /** Read a COPY-text extract into a typed DataFrame. Supported column
    * types: string, int/long/short, double, decimal, boolean, date,
    * timestamp (with or without PG's offset suffix), array<string>.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fields = schema.fields
    val n = fields.length
    val rows = spark.read
      .textFile(path)
      .filter((l: String) => l.nonEmpty && l != "\\.")
      .map { line =>
        val raw = splitLine(line)
        require(raw.length == n, s"expected $n columns, got ${raw.length}: $line")
        Row.fromSeq(raw.toIndexedSeq.zip(fields).map { case (v, f) => convert(v, f.dataType) })
      }(Encoders.row(schema))
    rows.toDF(fields.map(_.name).toIndexedSeq: _*)
  }

  /** Write a DataFrame as COPY-text lines (all columns stringified with
    * PG escaping; arrays as `{...}` literals). Round-trips through
    * `read` with the same schema.
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields
    df.map { row =>
      fields.indices.map { i =>
        if (row.isNullAt(i)) "\\N"
        else
          fields(i).dataType match {
            case ArrayType(StringType, _) =>
              // field-level COPY escaping applies ON TOP of array-literal
              // quoting, exactly as PG emits it
              escape(row.getSeq[String](i).map(quoteArrayElem).mkString("{", ",", "}"))
            case StringType => escape(row.getString(i))
            case _          => escape(row.get(i).toString)
          }
      }.mkString("\t")
    }.write.mode("overwrite").text(path)
  }

  /** Raw tabs are delimiters — tabs INSIDE values arrive escaped as \t. */
  private[graft] def splitLine(line: String): Array[String] = line.split("\t", -1)

  /** PG COPY text-format backslash escapes. */
  private[graft] def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        i += 1
        sb.append(s.charAt(i) match {
          case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
          case 'b' => '\b'; case 'f' => '\f'; case 'v' => ''
          case other => other
        })
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private[graft] def escape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c    => c.toString
    }

  /** Parse a PG array literal `{a,"b c",NULL,"he said \"hi\""}`. */
  private[graft] def parseArray(s: String): Seq[String] = {
    require(s.length >= 2 && s.head == '{' && s.last == '}', s"not an array literal: $s")
    val body = s.substring(1, s.length - 1)
    if (body.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var quoted = false
    var i = 0
    def flush(): Unit = {
      val v = cur.toString
      out += (if (!quoted && v == "NULL") null else v)
      cur.clear(); quoted = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (inQuotes) {
        if (c == '\\' && i + 1 < body.length) { cur.append(body.charAt(i + 1)); i += 1 }
        else if (c == '"') inQuotes = false
        else cur.append(c)
      } else c match {
        case '"' => inQuotes = true; quoted = true
        case ',' => flush()
        case other => cur.append(other)
      }
      i += 1
    }
    flush()
    out.toSeq
  }

  private[graft] def quoteArrayElem(s: String): String =
    if (s == null) "NULL"
    else if (s.isEmpty || s.exists(c => c == ',' || c == '"' || c == '\\' || c == '{' || c == '}' || c == ' ') || s == "NULL")
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    else s

  private val tsFmt = new DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .optionalStart()
    .appendFraction(ChronoField.MICRO_OF_SECOND, 1, 6, true)
    .optionalEnd()
    .optionalStart()
    .appendPattern("X")
    .optionalEnd()
    .toFormatter()

  private[graft] def parseTimestamp(raw: String): java.sql.Timestamp = {
    val parsed = tsFmt.parseBest(raw, OffsetDateTime.from(_), LocalDateTime.from(_))
    val instant: Instant = parsed match {
      case o: OffsetDateTime => o.toInstant
      case l: LocalDateTime  => l.toInstant(ZoneOffset.UTC)
    }
    java.sql.Timestamp.from(instant)
  }

  private def convert(raw: String, dt: DataType): Any =
    if (raw == "\\N") null
    else dt match {
      case StringType => unescape(raw)
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case ShortType => raw.toShort
      case DoubleType => raw.toDouble
      case FloatType => raw.toFloat
      case BooleanType => raw == "t" || raw == "true"
      case _: DecimalType => new java.math.BigDecimal(raw)
      case DateType => java.sql.Date.valueOf(raw)
      case TimestampType => parseTimestamp(unescape(raw))
      case ArrayType(StringType, _) => parseArray(unescape(raw))
      case BinaryType =>
        val u = unescape(raw)
        require(u.startsWith("\\x"), s"expected PG hex bytea, got: ${u.take(8)}")
        u.drop(2).grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
      case other => throw new IllegalArgumentException(s"unsupported COPY type: $other")
    }
}
