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

  /** Ordered try-parse: declared formats first, then (optionally) the
    * fuzzy tier. Null when nothing matches — the reference's all-or-
    * nothing inference bug is NOT reproduced here (SURVEY §2.10). */
  def parseTs(c: Column, declared: Seq[String] = DeclaredFormats.map(_._1),
      fuzzy: Boolean = true): Column = {
    val chain = declared ++
      (if (fuzzy) FuzzyFormats.map(_._1).filterNot(declared.contains)
       else Nil)
    coalesce(chain.map(f => try_to_timestamp(c, lit(f))): _*)
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
