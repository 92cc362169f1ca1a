package graft

import org.apache.spark.sql.functions._
import graft.functions.GramMask
import graft.functions.GramMask.{gramMaskLo, gramMaskHi}

/** GramMask: 128-bucket bigram signature used as the lossless
  * edit-distance prefilter in dedupe_fuzzy_pairs. The spec pins
  * (a) eval/codegen agreement, (b) the filter theorem — the gate never
  * rejects a pair with banded levenshtein ≤ 5 — exercised over random
  * edit-mutated strings, and (c) gate selectivity on unrelated strings
  * (the property that makes it worth running).
  */
class GramMaskSpec extends SparkSpec {
  import sqlImplicits._

  private def refMask(s: String, part: Int): Long = {
    // independent reference: gram set via String bigrams (BMP inputs),
    // murmur fmix64 to a bucket, bucket half selected by part
    var mask = 0L
    val lo = part * 64
    (0 until s.length - 1).foreach { i =>
      var h = (s.charAt(i).toLong << 32) | (s.charAt(i + 1).toLong & 0xffffffffL)
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      val b = (h & 127L).toInt
      if (b >= lo && b < lo + 64) mask |= 1L << (b - lo)
    }
    mask
  }

  test("gramMask matches scala reference; eval == codegen") {
    val rnd = new scala.util.Random(11)
    val strs = Seq("", "a", "ab", "the quick brown fox",
      "aaaaaaaaaaaaaaaaaaaa") ++
      Seq.fill(50)(rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString)
    val df = strs.toDF("s")
      .withColumn("lo", gramMaskLo(col("s")))
      .withColumn("hi", gramMaskHi(col("s")))
    df.collect().foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == refMask(s, 0), s"lo mismatch on '$s'")
      assert(r.getLong(2) == refMask(s, 1), s"hi mismatch on '$s'")
    }
    // interpreted eval path (no codegen) agrees: direct expression eval
    strs.foreach { s =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(GramMask(lit, 0).eval(null) == refMask(s, 0))
      assert(GramMask(lit, 1).eval(null) == refMask(s, 1))
    }
  }

  test("gate is lossless for lev <= 5 on edit-mutated strings") {
    val rnd = new scala.util.Random(42)
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        if (cur.nonEmpty) {
          val i = rnd.nextInt(cur.length)
          rnd.nextInt(3) match {
            case 0 => cur = cur.updated(i, ('a' + rnd.nextInt(26)).toChar)
            case 1 => cur = cur.take(i) + ('a' + rnd.nextInt(26)).toChar +
              cur.drop(i)
            case 2 => cur = cur.take(i) + cur.drop(i + 1)
          }
        }
      }
      cur
    }
    val base = Seq.fill(200)(rnd.alphanumeric.take(20 + rnd.nextInt(20))
      .mkString)
    val pairs = base.map(s => (s, mutate(s, 1 + rnd.nextInt(5))))
    val df = pairs.toDF("a", "b")
      .withColumn("lev", levenshtein(col("a"), col("b"), 5))
      .filter(col("lev").between(0, 5))
      .withColumn("gate",
        bit_count(gramMaskLo(col("a")).bitwiseAND(
          bitwise_not(gramMaskLo(col("b"))))) +
        bit_count(gramMaskHi(col("a")).bitwiseAND(
          bitwise_not(gramMaskHi(col("b"))))) <= 10 &&
        bit_count(gramMaskLo(col("b")).bitwiseAND(
          bitwise_not(gramMaskLo(col("a"))))) +
        bit_count(gramMaskHi(col("b")).bitwiseAND(
          bitwise_not(gramMaskHi(col("a"))))) <= 10)
    val kept = df.count()
    assert(kept > 50, s"mutation fixture degenerated: only $kept pairs at lev<=5")
    assert(df.filter(!col("gate")).count() == 0,
      "gate rejected a true lev<=5 pair — filter theorem violated")
  }

  test("gate rejects most unrelated same-prefix heads") {
    val rnd = new scala.util.Random(7)
    val heads = Seq.fill(300)("th" + rnd.alphanumeric.take(38).mkString)
    val df = heads.toDF("a").crossJoin(heads.take(30).toDF("b"))
      .filter(col("a") =!= col("b"))
      .withColumn("gate",
        bit_count(gramMaskLo(col("a")).bitwiseAND(
          bitwise_not(gramMaskLo(col("b"))))) +
        bit_count(gramMaskHi(col("a")).bitwiseAND(
          bitwise_not(gramMaskHi(col("b"))))) <= 10)
    val total = df.count()
    val passed = df.filter(col("gate")).count()
    assert(passed.toDouble / total < 0.05,
      s"gate passed $passed/$total unrelated pairs — selectivity lost")
  }
}
