package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-format timestamp parsing (SURVEY §2.8): the reference tries its
  * declared formats in order, then falls back to `dateparser`'s fuzzy
  * parser (reference `datapump.py:439-444`). The fuzzy tier is
  * re-expressed here as a BOUNDED, DETERMINISTIC extended-format chain —
  * the common concrete layouts dateparser recognizes — because a
  * heuristic natural-language parser is a non-deterministic surface a
  * distributed engine should not reproduce (same input must parse the
  * same way on every executor, every version). Remaining documented
  * deviation: natural-language dates only ("3 days ago", "last tuesday").
  *
  * Everything stays a codegen'd `coalesce(try_to_timestamp…)` chain —
  * no UDF, fully pushdown-safe, and each (Spark, DuckDB) pattern pair
  * lives in ONE table so the oracle chain is order-identical by
  * construction (ambiguous strings resolve the same on both engines).
  */
object Timestamps {

  /** Shape guard for a datetime pattern: an anchored regex that is a
    * NECESSARY condition for `try_to_timestamp(c, fmt)` to succeed —
    * deliberately LOOSE (digit fields accept 1–2/3–4 digits, month
    * names any letters), so it can never reject a string the format
    * would parse; a false positive just costs the one parse attempt it
    * would have cost anyway.
    *
    * Why: `try_to_timestamp` failure is exception-based control flow
    * inside the formatter, ~100× the cost of a regex miss. A 17-format
    * coalesce chain ran EVERY format on every row — 4.6 s for a 10k-row
    * map-only query (bench, round 6); shape-gating each attempt makes
    * the chain cost ~one regex scan per non-matching format plus the
    * single real parse. */
  private[ops] def shapeRegex(fmt: String): String = {
    val sb = new StringBuilder("^\\s*")
    var i = 0
    while (i < fmt.length) {
      fmt.charAt(i) match {
        case '\'' => // quoted literal section ('T')
          val j = fmt.indexOf('\'', i + 1)
          sb ++= java.util.regex.Pattern.quote(fmt.substring(i + 1, j))
          i = j
        case ch @ ('y' | 'M' | 'd' | 'H' | 'm' | 's' | 'S') =>
          var n = 0
          while (i < fmt.length && fmt.charAt(i) == ch) { n += 1; i += 1 }
          i -= 1
          sb ++= (ch match {
            case 'M' if n >= 3 => "[A-Za-z]+"   // MMM / MMMM month names
            case _ if n >= 3 => s"\\d{$n,}"     // yyyy, SSS: at least n
            case _ => "\\d{1,2}"                // MM/dd/HH/mm/ss
          })
        case c => sb ++= java.util.regex.Pattern.quote(c.toString)
      }
      i += 1
    }
    sb.append("\\s*$").toString
  }

  /** One shape-gated parse attempt (see [[shapeRegex]]). */
  def guardedTryTs(c: Column, fmt: String): Column =
    when(c.rlike(shapeRegex(fmt)), try_to_timestamp(c, lit(fmt)))

  /** The reference's 4 declared default formats (datapump.py:89-92), in
    * try order, as (spark-pattern, duckdb-strptime-pattern). */
  val DeclaredFormats: Seq[(String, String)] = Seq(
    "yyyy-MM-dd HH:mm:ss" -> "%Y-%m-%d %H:%M:%S",
    "MM/dd/yyyy HH:mm:ss" -> "%m/%d/%Y %H:%M:%S",
    "dd.MM.yyyy HH:mm:ss" -> "%d.%m.%Y %H:%M:%S",
    "yyyy-MM-dd'T'HH:mm:ss" -> "%Y-%m-%dT%H:%M:%S")

  /** The fuzzy-fallback tier: a fixed list of concrete layouts covering
    * dateparser's common non-ambiguous hits — ISO with fraction, date-only
    * forms (parsed to midnight, as dateparser does), US month-first
    * (dateparser's MDY default for the en locale, hence before DMY),
    * English month-name forms (%b/%B are locale-stable English in both
    * engines under the UTC/US session), compact basic format, and
    * RFC-2822-ish. Order is precedence. */
  val FuzzyFormats: Seq[(String, String)] = Seq(
    "yyyy-MM-dd HH:mm:ss.SSS" -> "%Y-%m-%d %H:%M:%S.%g",
    "yyyy-MM-dd'T'HH:mm:ss.SSS" -> "%Y-%m-%dT%H:%M:%S.%g",
    "yyyy/MM/dd HH:mm:ss" -> "%Y/%m/%d %H:%M:%S",
    "yyyy-MM-dd HH:mm" -> "%Y-%m-%d %H:%M",
    "yyyy-MM-dd" -> "%Y-%m-%d",
    "MM/dd/yyyy" -> "%m/%d/%Y",
    "dd.MM.yyyy" -> "%d.%m.%Y",
    "yyyy/MM/dd" -> "%Y/%m/%d",
    "yyyyMMdd" -> "%Y%m%d",
    "dd MMM yyyy HH:mm:ss" -> "%d %b %Y %H:%M:%S",
    "dd MMM yyyy" -> "%d %b %Y",
    "MMM dd, yyyy" -> "%b %d, %Y",
    "MMMM dd, yyyy" -> "%B %d, %Y")
  // NOT included: RFC-2822 "EEE, dd MMM yyyy …" — Spark ≥ 3.0 refuses
  // day-of-week fields in PARSE patterns (SparkUpgradeException), and a
  // weekday prefix adds no date information anyway.

  /** The natural-language tier (datapump.py:439-444 — dateparser's last
    * resort), as a BOUNDED deterministic subset behind an explicit flag:
    * relative-day words resolved against a caller-PINNED anchor date
    * (dateparser uses wall-clock "now"; a distributed engine must pin the
    * reference instant or the same row parses differently per executor,
    * per retry, per day), plus full-month-name layouts not already in the
    * fuzzy tier. One (word → day-offset) table drives both engines. */
  val RelativeDays: Seq[(String, Int)] =
    Seq("yesterday" -> -1, "today" -> 0, "tomorrow" -> 1)

  /** NL month-name layouts beyond [[FuzzyFormats]]. */
  val NlFormats: Seq[(String, String)] = Seq(
    "dd MMMM yyyy" -> "%d %B %Y")

  /** [[parseTs]] with the NL tier in front: relative-day words parse to
    * `anchor + offset` at midnight, then the NL month layouts, then the
    * standard declared→fuzzy chain. Existing behavior is unchanged unless
    * callers opt in to this entry point (the flag is the function). */
  def parseTsNl(c: Column, anchor: Column,
      declared: Seq[String] = DeclaredFormats.map(_._1),
      fuzzy: Boolean = true): Column = {
    val norm = lower(trim(c))
    val rel = RelativeDays.tail.foldLeft(
      when(norm === RelativeDays.head._1,
        date_add(anchor, RelativeDays.head._2).cast("timestamp"))) {
      case (acc, (w, off)) =>
        acc.when(norm === w, date_add(anchor, off).cast("timestamp"))
    }
    coalesce(
      (rel +: NlFormats.map(f => guardedTryTs(c, f._1))) :+
        parseTs(c, declared, fuzzy): _*)
  }

  /** The identical NL chain as DuckDB SQL (anchor passed as a SQL date
    * expression, e.g. `DATE '2024-06-15'`) — generated from the SAME
    * tables as [[parseTsNl]]. */
  def parseTsNlOracleSql(expr: String, anchorSql: String,
      declared: Seq[(String, String)] = DeclaredFormats,
      fuzzy: Boolean = true): String = {
    val rel = RelativeDays.map { case (w, off) =>
      val d = if (off == 0) anchorSql
        else s"$anchorSql ${if (off > 0) "+" else "-"} INTERVAL ${off.abs} DAY"
      s"WHEN '$w' THEN CAST($d AS TIMESTAMP)"
    }.mkString(s"CASE lower(trim($expr)) ", " ", " END")
    val nl = NlFormats.map(f => s"try_strptime($expr, '${f._2}')")
    (rel +: nl).mkString("coalesce(\n    ", ",\n    ", ",\n    ") +
      parseTsOracleSql(expr, declared, fuzzy) + ")"
  }

  /** Ordered try-parse: declared formats first, then (optionally) the
    * fuzzy tier. Null when nothing matches — the reference's all-or-
    * nothing inference bug is NOT reproduced here (SURVEY §2.10). */
  def parseTs(c: Column, declared: Seq[String] = DeclaredFormats.map(_._1),
      fuzzy: Boolean = true): Column = {
    val chain = declared ++
      (if (fuzzy) FuzzyFormats.map(_._1).filterNot(declared.contains)
       else Nil)
    coalesce(chain.map(f => guardedTryTs(c, f)): _*)
  }

  /** The identical chain as DuckDB SQL over column expression `expr` —
    * generated from the same tables so order parity cannot drift. */
  def parseTsOracleSql(expr: String,
      declared: Seq[(String, String)] = DeclaredFormats,
      fuzzy: Boolean = true): String = {
    val chain = declared ++
      (if (fuzzy) FuzzyFormats.filterNot(f => declared.exists(_._1 == f._1))
       else Nil)
    chain.map { case (_, duck) => s"try_strptime($expr, '$duck')" }
      .mkString("coalesce(\n    ", ",\n    ", ")")
  }
}
