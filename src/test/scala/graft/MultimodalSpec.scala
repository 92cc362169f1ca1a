package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import sqlImplicits._

  test("decodeImage decodes real PNG bytes: dims and channel sums match " +
      "the generator's closed form") {
    val fixture = Multimodal.imageFixture(spark,
      Seq(0L, 1L, 250L, 251L).toDF("doc_id"), "doc_id",
      w = 16, h = 16, constant = false)
    val got = Multimodal.decodeImage(spark, fixture).collect()
      .map(m => m.doc_id -> m).toMap
    got.values.foreach { m =>
      assert(m.is_image && m.width == 16 && m.height == 16)
      assert(m.n_bytes > 0) // real compressed PNG payload
    }
    // closed form: sum over i in 0..255 of (id + i) % 251 etc.
    def sums(id: Long) = (
      (0L until 256L).map(i => (id + i) % 251).sum,
      (0L until 256L).map(i => (id * 7 + i * 3) % 251).sum,
      (0L until 256L).map(i => (id * 13 + i * 5) % 239).sum)
    Seq(0L, 1L, 250L, 251L).foreach { id =>
      val (r, g, b) = sums(id)
      assert((got(id).sum_r, got(id).sum_g, got(id).sum_b) == ((r, g, b)))
    }
  }

  test("resizeImage is a real decode→scale→re-encode: constant image " +
      "resizes to the same color, output is a decodable PNG") {
    val fixture = Multimodal.imageFixture(spark,
      Seq(5L, 300L).toDF("doc_id"), "doc_id", w = 16, h = 16,
      constant = true)
    val resized = Multimodal.resizeImage(spark, fixture,
      targetW = 8, targetH = 8, targetBytes = 96).toDF()
    val decoded = Multimodal.decodeImage(spark, resized).collect()
      .map(m => m.doc_id -> m).toMap
    Seq(5L, 300L).foreach { id =>
      val m = decoded(id)
      assert(m.is_image && m.width == 8 && m.height == 8)
      assert(m.sum_r == 64 * (id % 251))
      assert(m.sum_g == 64 * ((id * 7) % 251))
      assert(m.sum_b == 64 * ((id * 13) % 239))
    }
  }

  test("non-image payloads take the deterministic fallback branch") {
    val bin = Seq((1L, "hello world!")).toDF("doc_id", "text")
    val withBin = Multimodal.withBinary(bin, "doc_id", "text")
    val dec = Multimodal.decodeImage(spark, withBin).collect().head
    assert(!dec.is_image && dec.width == 0 && dec.n_bytes == 12L)
    assert(dec.sum_r == "hello wo".getBytes("UTF-8").map(_ & 0xff).sum)
    val res = Multimodal.resizeImage(spark, withBin, 8, 8,
      targetBytes = 5).collect().head
    assert(res.n_bytes == 5L && new String(res.payload, "UTF-8") == "hello")
  }

  test("dHash: identical under lossless re-encode, differs across images, " +
      "fallback for non-images and too-small images") {
    // the near-dup property the hash exists for: PNG→decode→PNG
    // re-encode is pixel-identical, so the hash must be EQUAL
    val png = Multimodal.syntheticPng(42L, 16, 16, constant = false)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val reenc = bos.toByteArray
    assert(!java.util.Arrays.equals(png, reenc) ||
      png.length == reenc.length) // bytes may differ; pixels cannot
    val bin = Seq((1L, png), (2L, reenc),
      (3L, Multimodal.syntheticPng(43L, 16, 16, constant = false)),
      (4L, "not an image".getBytes("UTF-8")),
      (5L, Multimodal.syntheticPng(42L, 4, 4, constant = false)))
      .toDF("doc_id", "payload")
    val got = Multimodal.dHash(spark, bin).collect()
      .map(h => h.doc_id -> ((h.is_image, h.dhash_hi, h.dhash_lo))).toMap
    assert(got(1L) == got(2L), "re-encode must hash identically")
    assert(got(1L)._1 && got(3L)._1)
    assert((got(1L)._2, got(1L)._3) != ((got(3L)._2, got(3L)._3)),
      "different gradients must differ")
    assert(got(4L) == ((false, 0L, 0L)))
    assert(got(5L) == ((false, 0L, 0L)), "below the 9x8 window: fallback")
    // halves are non-negative 32-bit values (engine-neutral layout)
    got.values.foreach { case (_, hi, lo) =>
      assert(hi >= 0 && hi <= 0xffffffffL && lo >= 0 && lo <= 0xffffffffL)
    }
  }

  test("dHashPairs: banding finds every pair at the hamming bound and " +
      "excludes beyond it; non-images never pair") {
    // base hash; 3 bits flipped across DIFFERENT chunks (still found —
    // pigeonhole leaves chunk 0 equal); 4 bits spread over all 4 chunks
    // (correctly excluded: distance 4 > bound 3)
    val base = (0xABCDL, 0x1234L)
    val flip3 = (base._1 ^ (1L << 16) ^ 1L, base._2 ^ 1L)   // hi chunks 0,1 + lo chunk 1
    val flip4 = (base._1 ^ (1L << 16) ^ 1L, base._2 ^ (1L << 16) ^ 1L)
    val hashes = Seq(
      (1L, true, base._1, base._2),
      (2L, true, flip3._1, flip3._2),
      (3L, true, flip4._1, flip4._2),
      (4L, false, base._1, base._2)) // same hash but not an image
      .toDF("doc_id", "is_image", "dhash_hi", "dhash_lo")
    val got = Multimodal.dHashPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((1L, 2L, 3L)), "distance-3 pair must be found")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L), "non-image excluded")
    assert(!got.contains((1L, 3L, 4L)) &&
      !got.exists(p => p._1 == 1L && p._2 == 3L), "distance 4 excluded")
  }

  test("decodeAudio parses real PCM16-LE bytes: hand-built waveform, " +
      "negative samples, odd trailing byte ignored") {
    // hand-assemble -300, 5, 32767, -32768 as little-endian int16 plus a
    // dangling byte that asShortBuffer must floor away
    val bb = java.nio.ByteBuffer.allocate(9)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(-300, 5, 32767, -32768).foreach(s => bb.putShort(s.toShort))
    bb.put(0x7f.toByte)
    val bin = Seq((9L, bb.array())).toDF("doc_id", "payload")
    val got = Multimodal.decodeAudio(spark, bin).collect().head
    assert(got.n_samples == 4L)
    assert(got.sum_amp == -300L + 5 + 32767 - 32768)
    assert(got.sum_sq == 300L * 300 + 25 + 32767L * 32767 + 32768L * 32768)
    assert(got.peak == 32768)
    // the fixture's closed form round-trips through real bytes
    val fx = Multimodal.decodeAudio(spark,
      Multimodal.audioFixture(spark, Seq(3L).toDF("doc_id"), "doc_id"))
      .collect().head
    val samples = (0 until (64 + 3 % 64)).map(i => ((3 * 7 + i * 13) % 199) - 99)
    assert(fx.n_samples == samples.length.toLong)
    assert(fx.sum_amp == samples.map(_.toLong).sum)
    assert(fx.sum_sq == samples.map(s => s.toLong * s).sum)
    assert(fx.peak == samples.map(math.abs).max)
  }
}
