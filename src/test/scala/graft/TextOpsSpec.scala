package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("scrubPii redacts emails and phones and counts them") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@mail.example.org today"),
      (2L, "call +1-555-0199 or 44-555-0000 now"),
      (3L, "no pii here at all"),
      (4L, "a@b.io and +1-555-1234 both")).toDF("doc_id", "text")
    val got = TextOps.scrubPii(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(got(1L) == (("reach me at <EMAIL> today", 1)))
    assert(got(2L) == (("call <PHONE> or <PHONE> now", 2)))
    assert(got(3L) == (("no pii here at all", 0)))
    assert(got(4L) == (("<EMAIL> and <PHONE> both", 2)))
  }

  test("normalizeUnicode: NFC composition, zero-width strip, NBSP, " +
      "whitespace collapse — and clean text is returned unchanged") {
    val df = Seq(
      (1L, "Cafe\u0301 au lait"),            // decomposed acute -> \u00E9
      (2L, "a\u200Bb c\u200C\u200Dd\uFEFFe"),  // all four zero-widths vanish
      (3L, "x\u00A0y"),                       // NBSP -> space
      (4L, "  a \t b\n\nc  "),                // runs collapse + trim
      (5L, "already clean"),
      (6L, "Who\u0308le co\u0308o\u0301rdinate")  // multiple marks compose
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextOps.normalizeUnicode(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "Caf\u00E9 au lait")
    assert(got(2L) == "ab cde")
    assert(got(3L) == "x y")
    assert(got(4L) == "a b c")
    assert(got(5L) == "already clean")
    assert(got(6L) == "Wh\u00F6le c\u00F6\u00F3rdinate")
    // interpreted path (null-safe eval outside codegen) agrees
    val e = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("Cafe\u0301")))
    assert(e.eval(null).toString == "Caf\u00E9")
  }

  test("canonicalizeUrl: fragment, utm params, case, default ports, " +
      "trailing slashes — non-utm params survive in order") {
    val cases = Seq(
      ("HTTPS://Ex.COM:443/A/b/?utm_source=x&id=7&utm_medium=y#frag",
        "https://ex.com/A/b?id=7"),
      ("http://ex.com:80/path/", "http://ex.com/path"),
      ("http://ex.com:8080/path", "http://ex.com:8080/path"), // kept
      ("https://ex.com/?utm_campaign=z", "https://ex.com"),
      ("https://ex.com/a?ref=home&utm_medium=s&page=2",
        "https://ex.com/a?ref=home&page=2"),
      ("https://ex.com/a//", "https://ex.com/a"),
      ("https://ex.com", "https://ex.com"),
      // a second '?' belongs to a param VALUE — split at the first one
      ("https://ex.com/a?q=x?y&utm_x=1", "https://ex.com/a?q=x?y"))
    val df = cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }
      .toDF("i", "u")
    val got = df.select(col("i"), TextOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i) == want, s"url $u")
    }
  }

  test("curate: every rule fires, in precedence order, and dups keep " +
      "the min id") {
    val en = "the quick brown fox jumps over one lazy dog and a cat " +
      "sitting near the old barn watching birds fly south for winter"
    val docs = Seq(
      (1L, en),                        // keep
      (2L, "xyzzy plugh foo"),         // lang (und) — also too_short, lang wins
      (3L, "the and of"),              // en but 3 tokens -> too_short
      (4L, ("the of " + Seq.fill(60)("and").mkString(" "))), // low diversity -> quality
      (5L, en.toUpperCase),            // normalizes differently? no — uppercase: lang regex misses lowercase stopwords -> lang
      (6L, "  " + en + "  "),          // whitespace-normalized dup of 1 -> duplicate
      (7L, ("the of and " + (1 to 95).map("w" + _).mkString(" ")))  // 98 tokens > 90 -> too_long
    ).toDF("doc_id", "text")
    val got = TextOps.curate(docs, "doc_id", "text",
      minTokens = 5, maxTokens = 90, minQuality = 0.58)
      .as[(Long, Option[String], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((None, true)))
    assert(got(2L) == ((Some("lang"), false)))   // lang precedes too_short
    assert(got(3L) == ((Some("too_short"), false)))
    assert(got(4L) == ((Some("quality"), false)))
    assert(got(5L) == ((Some("lang"), false)))
    assert(got(6L) == ((Some("duplicate"), false))) // 1 keeps, 6 rejects
    assert(got(7L) == ((Some("too_long"), false)))
  }

  test("htmlMainText: drops script/style/comments with contents, strips " +
      "tags, decodes entities, and removes high-link-density chrome " +
      "wherever it sits — keeps low-density prose with inline links") {
    val pages = Seq(
      // chrome + content + mid-article link box + footer
      (1L, "<html><head><title> My  Title </title><style>p{a:1}</style>" +
        "<script>if (a < b && c > d) { x(\"<p>\"); }</script></head>" +
        "<body><nav><a href='/'>Home</a> <a href='/x'>About</a></nav>" +
        "<div><p>Alpha beta   gamma.</p>" +
        "<ul><li><a href='/r'>Rel one</a></li><li><a>Rel two</a></li></ul>" +
        "<p>Delta ends.</p></div>" +
        "<footer><a>Terms</a> | <a>Privacy</a></footer></body></html>"),
      // entities round-trip; inline anchor INSIDE prose is kept (low density)
      (2L, "<body><p>x &lt;tag&gt; &amp;&amp; y &quot;q&quot; &#39;s&#39; " +
        "see <a href='/d'>docs</a> for more words here</p></body>"),
      // comment spanning lines; empty blocks produce nothing
      (3L, "<body><!-- hidden\n<p>ghost</p> --><div></div><p>Solo.</p></body>"),
      // no body/blocks at all
      (4L, "plain text, no markup"),
      (5L, ""))
      .toDF("id", "html")
    val got = pages.select(col("id"),
        TextOps.htmlTitle(col("html")).as("t"),
        TextOps.htmlMainText(col("html")).as("m"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got(1L) == (("My Title", "Alpha beta gamma. Delta ends.")))
    assert(got(2L) ==
      (("", "x <tag> && y \"q\" 's' see docs for more words here")))
    assert(got(3L) == (("", "Solo.")))
    assert(got(4L) == (("", "plain text, no markup")))
    assert(got(5L) == (("", "")))
  }

  test("escapeHtml -> wrap -> htmlMainText round-trips hostile text " +
      "(the text_html_extract entry's closed-form oracle law)") {
    val hostile = Seq(
      (1L, "a < b && b > c"),
      (2L, "tags like <script>alert('x')</script> stay TEXT"),
      (3L, "amp & lt &lt; already-escaped &amp; mix"))
      .toDF("id", "text")
    val wrapped = hostile.select(col("id"),
      concat(lit("<body><nav><a href='/'>Home</a> <a>About</a></nav><p>"),
        TextOps.escapeHtml(col("text")),
        lit("</p><footer><a>Terms</a> | <a>Privacy</a></footer></body>"))
        .as("html"))
    val got = wrapped.select(col("id"),
        TextOps.htmlMainText(col("html")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a < b && b > c")
    assert(got(2L) == "tags like <script>alert('x')</script> stay TEXT")
    assert(got(3L) == "amp & lt &lt; already-escaped &amp; mix")
  }

  test("cascade composition: htmlMainText feeding curate equals curate " +
      "on the plain normalized text (the front door composes)") {
    val docs = Tables.documents(spark, sfDir("0.001"))
      .select("doc_id", "text", "lang")
    val html = docs.select(col("doc_id"), col("lang"),
      concat(lit("<body><nav><a href='/'>Home</a> <a>About</a></nav><p>"),
        TextOps.escapeHtml(col("text")),
        lit("</p><footer><a>Terms</a> | <a>Privacy</a></footer></body>"))
        .as("html"))
    val extracted = html.select(col("doc_id"), col("lang"),
      TextOps.htmlMainText(col("html")).as("text"))
    def runCurate(d: org.apache.spark.sql.DataFrame) =
      TextOps.curate(d, "doc_id", "text",
          minTokens = 5, maxTokens = 100000, minQuality = 0.3)
        .select("doc_id", "keep", "reject_reason")
        .collect().map(r => (r.getLong(0), r.getBoolean(1),
          Option(r.getString(2)))).toSet
    val viaHtml = runCurate(extracted)
    val direct = runCurate(docs.select(col("doc_id"), col("lang"),
      regexp_replace(trim(col("text")), "\\s+", " ").as("text")))
    assert(viaHtml == direct,
      "curation verdicts diverge between extracted and plain text")
  }

  test("bm25 matches the hand-computed Okapi/Lucene formula on a " +
      "closed-form corpus; non-matching docs are absent") {
    // corpus: d1 = "a a b c" (tf_a=2, tf_b=1, dl=4),
    //         d2 = "c c c a" (tf_a=1, dl=4), d3 = "d d" (no query term)
    val corpus = Seq((1L, "a a b c"), (2L, "c c c a"), (3L, "d d"))
      .toDF("doc_id", "text")
    val qtok = Seq((0L, "a"), (0L, "b")).toDF("query_id", "token")
    val got = TextOps.bm25(corpus, "doc_id", "text", qtok)
      .select("query_id", "doc_id", "score6", "n_terms")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    // replicate the op's arithmetic exactly: N=3, avgdl=10/3,
    // idf = ln(1 + (N-df+0.5)/(df+0.5)), tfnorm = tf*2.2/(tf+1.2*
    // (0.25+0.75*dl/avgdl)), per-term snap to round6 micro-units
    val n = 3L; val avgdl = 10.0 / 3.0
    def term6(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val tfn = (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
      // mirror StableRound.round6 exactly: decimal(…,12) bridge, then 6
      val r6 = BigDecimal(idf * tfn)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.floor(r6 * 1e6 + 0.5).toLong
    }
    val d1 = term6(2, 2, 4) + term6(1, 1, 4) // a: df=2; b: df=1
    val d2 = term6(1, 2, 4)
    assert(got == Seq((0L, 1L, d1, 2L), (0L, 2L, d2, 1L)),
      s"got $got, expected scores d1=$d1 d2=$d2; d3 must be absent")
  }

  test("bm25Fit/bm25Apply split: scoring a partition of the corpus " +
      "against frozen stats reproduces the whole-corpus scores " +
      "(the streaming-face contract)") {
    val docs = spark.read.parquet(s"${sfDir("0.001")}/documents.parquet")
    val corpus = docs.filter(col("doc_id") >= 3)
    val qtok = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(TextOps.tokens(col("text"))).as("token")).distinct()
      .localCheckpoint()
    val (dfreq, stats) = TextOps.bm25Fit(corpus, "doc_id", "text", qtok)
    val df2 = dfreq.localCheckpoint(); val st2 = stats.localCheckpoint()
    val whole = TextOps
      .bm25Apply(corpus, "doc_id", "text", qtok, df2, st2)
      .select("query_id", "doc_id", "score6")
      .as[(Long, Long, Long)].collect().toSet
    val halves = (0 to 1).flatMap { p =>
      TextOps.bm25Apply(corpus.filter(pmod(col("doc_id"), lit(2)) === p),
          "doc_id", "text", qtok, df2, st2)
        .select("query_id", "doc_id", "score6")
        .as[(Long, Long, Long)].collect()
    }.toSet
    assert(whole == halves, "per-batch scoring diverges from batch")
    assert(whole.nonEmpty)
  }
}
