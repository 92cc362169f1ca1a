package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction at the partition boundary.
  *
  * Image decode and resize are REAL: `decodeImage` decodes PNG/JPEG/GIF/
  * BMP payloads with the JDK's `javax.imageio.ImageIO` (no external
  * dependency) and emits true width/height/per-channel pixel sums;
  * `resizeImage` decodes, rescales with `Graphics2D`
  * (nearest-neighbor — deterministic), and re-encodes PNG. Payloads no
  * JDK reader recognizes (e.g. the text stand-ins, or audio/video whose
  * codecs this container lacks) fall back to the deterministic fake path
  * (length + head-byte sum / truncation) so the pipeline shape stays
  * total. The mapPartitions boundary is where a per-partition codec
  * context would init; ImageIO's reader registry is JVM-wide so nothing
  * extra is needed for images.
  */
object Multimodal {

  // java.awt must never try to touch a display in an executor
  System.setProperty("java.awt.headless", "true")

  case class BinRecord(doc_id: Long, payload: Array[Byte])

  /** Attach an opaque binary payload + typed metadata struct to documents
    * (here the payload is the utf-8 text itself — a stand-in for image
    * bytes with the same pipeline shape). */
  def withBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(textCol).cast("binary").as("payload"),
      struct(
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        lit("text/plain").as("mime")).as("meta"))


  case class ImageMeta(doc_id: Long, n_bytes: Long, is_image: Boolean,
      width: Int, height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image decode at the partition boundary: `ImageIO.read` over the
    * binary payload, emitting true dimensions and per-channel pixel sums
    * (the feature-extraction shape: decode → reduce to fixed-width
    * features; a model-input pipeline would emit the tensor instead).
    * Non-image payloads take the deterministic fallback (is_image=false,
    * width/height 0, sum_r = sum of the first 8 unsigned bytes) so the
    * operator is total over mixed corpora. */
  def decodeImage(spark: SparkSession, bin: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("payload")).as[BinRecord]
      .mapPartitions { it =>
        it.map { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            catch { case _: Exception => null }
          if (img == null) {
            val head = r.payload.take(8).map(b => (b & 0xff).toLong).sum
            ImageMeta(r.doc_id, r.payload.length.toLong, is_image = false,
              0, 0, head, 0L, 0L)
          } else {
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            ImageMeta(r.doc_id, r.payload.length.toLong, is_image = true,
              img.getWidth, img.getHeight, sr, sg, sb)
          }
        }
      }
  }

  /** REAL binary→binary image resize: ImageIO decode → Graphics2D scale
    * (NEAREST_NEIGHBOR interpolation: picks source pixels, no blended
    * fractional arithmetic — bit-deterministic across JVMs) → lossless
    * PNG re-encode. Non-image payloads fall back to truncation at
    * `targetBytes` (the previous stub behavior), keeping the operator
    * total. */
  def resizeImage(spark: SparkSession, bin: DataFrame,
      targetW: Int, targetH: Int, targetBytes: Int): Dataset[Resized] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("payload")).as[BinRecord]
      .mapPartitions { it =>
        it.map { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            catch { case _: Exception => null }
          if (img == null) {
            val p = if (r.payload.length > targetBytes)
              r.payload.take(targetBytes) else r.payload
            Resized(r.doc_id, p, p.length.toLong)
          } else {
            val dst = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            val p = bos.toByteArray
            Resized(r.doc_id, p, p.length.toLong)
          }
        }
      }
  }

  /** Deterministic synthetic PNG: pixel i = y·w+x gets channel values
    * `r=(id+i) mod 251, g=(7id+3i) mod 251, b=(13id+5i) mod 239` — primes
    * below 256, so the channel sums are closed-form in doc_id and a SQL
    * oracle can predict the decoded statistics without any codec. With
    * `constant=true` every pixel is the i=0 color, making the image
    * invariant under ANY resampling kernel — the resize oracle needs no
    * model of the interpolator. PNG is lossless, so decode recovers these
    * exact values. */
  def syntheticPng(docId: Long, w: Int, h: Int,
      constant: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = if (constant) 0L else (y.toLong * w + x)
        val r = ((docId + i) % 251).toInt
        val g = ((docId * 7 + i * 3) % 251).toInt
        val b = ((docId * 13 + i * 5) % 239).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** An image-bytes corpus derived from document ids: one synthetic PNG
    * per doc (distributed generation — the encode runs inside
    * mapPartitions, no driver materialization). */
  def imageFixture(spark: SparkSession, docs: DataFrame, idCol: String,
      w: Int, h: Int, constant: Boolean): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticPng(id, w, h, constant))))
      .toDF("doc_id", "payload")
  }

  case class Resized(doc_id: Long, payload: Array[Byte], n_bytes: Long)

  case class DHash(doc_id: Long, is_image: Boolean,
      dhash_hi: Long, dhash_lo: Long)

  /** Image PERCEPTUAL HASH (difference hash) — the image twin of the
    * text near-dup fingerprints: decode, reduce to integer luma
    * (`(299r + 587g + 114b) / 1000`, integer division — the BT.601
    * weights without float drift), and set bit `y·8+x` when
    * `luma(x+1, y) > luma(x, y)` over the top-left 9×8 luma window.
    * Near-identical images (re-encodes, light edits) agree on most
    * bits; bucketing or banded hamming joins on the hash give image
    * near-dup dedup with the same shuffle shape as `dedupe_simhash`.
    * Production pipelines resize to 9×8 first so the window IS the
    * image; the fixture corpus is already thumbnail-sized, and the
    * resize composes from [[resizeImage]] when needed.
    *
    * The 64 bits come back as two NON-NEGATIVE 32-bit halves
    * (`dhash_hi` = bits 32–63, `dhash_lo` = bits 0–31): an engine-
    * neutral layout — no two's-complement edge at bit 63 for the SQL
    * oracle to reproduce. Non-image payloads: `is_image = false`,
    * zero hash (grouped apart by the flag). */
  def dHash(spark: SparkSession, bin: DataFrame): Dataset[DHash] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("payload")).as[BinRecord]
      .mapPartitions { it =>
        it.map { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            catch { case _: Exception => null }
          if (img == null || img.getWidth < 9 || img.getHeight < 8)
            DHash(r.doc_id, is_image = false, 0L, 0L)
          else {
            def luma(x: Int, y: Int): Int = {
              val rgb = img.getRGB(x, y)
              (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
            }
            var hi = 0L; var lo = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (luma(x + 1, y) > luma(x, y)) {
                  val b = y * 8 + x
                  if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
                }
                x += 1
              }
              y += 1
            }
            DHash(r.doc_id, is_image = true, hi, lo)
          }
        }
      }
  }

  /** Frame-sampling fan-out: split the payload into fixed-width frames and
    * fingerprint each — the dataflow shape of video frame extraction
    * (explode multiplies rows; downstream repartitions by (doc, frame)). */
  def frameSample(docs: DataFrame, idCol: String, textCol: String,
      frameChars: Int): DataFrame =
    docs.select(col(idCol),
      posexplode(expr(
        s"transform(sequence(0, cast(ceil(length($textCol) / " +
          s"cast($frameChars as double)) as int) - 1), " +
          s"i -> substring($textCol, i * $frameChars + 1, $frameChars))"))
        .as(Seq("frame_idx", "frame")))
      .select(col(idCol), col("frame_idx").cast("long").as("frame_idx"),
        TextOps.fingerprint(col("frame")).as("frame_fp"))

  /** Image near-dup PAIRS by dHash hamming distance ≤ `maxHamming` —
    * the same 16-bit chunk banding as `TextDedupe.simhashPairs`
    * (pigeonhole: hamming ≤ 3 over 64 bits ⇒ at least one of the four
    * 16-bit chunks equal, so candidate generation is EXACT for the
    * default bound, never all-pairs). Takes [[dHash]] output; only
    * (id, hash, chunk) rows shuffle — never image bytes. */
  def dHashPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunked = hashes.filter(col("is_image"))
      .select(col("doc_id"), col("dhash_hi"), col("dhash_lo"),
        posexplode(array(
          shiftrightunsigned(col("dhash_hi"), 16),
          col("dhash_hi").bitwiseAND(lit(0xFFFFL)),
          shiftrightunsigned(col("dhash_lo"), 16),
          col("dhash_lo").bitwiseAND(lit(0xFFFFL))))
          .as(Seq("chunk_idx", "chunk")))
      .repartition(col("chunk_idx"), col("chunk"))
    val a = chunked.select(col("doc_id").as("d1"),
      col("dhash_hi").as("h1"), col("dhash_lo").as("l1"),
      col("chunk_idx"), col("chunk"))
    val b = chunked.select(col("doc_id").as("d2"),
      col("dhash_hi").as("h2"), col("dhash_lo").as("l2"),
      col("chunk_idx"), col("chunk"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        (bit_count(col("h1").bitwiseXOR(col("h2"))) +
          bit_count(col("l1").bitwiseXOR(col("l2"))))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  case class AudioStats(doc_id: Long, n_samples: Long, sum_amp: Long,
      sum_sq: Long, peak: Int)

  /** Synthetic PCM16-LE audio fixture: per doc, 64 + id%64 samples with
    * the closed form s_i = ((id·7 + i·13) mod 199) − 99, assembled as
    * real little-endian 16-bit bytes — so the decode below does genuine
    * byte-level work while the oracle predicts the stats from the
    * formula without any codec (the mm_decode_image fixture convention). */
  def audioFixture(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (64 + id % 64).toInt
        val bb = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          bb.putShort((((id * 7 + i * 13L) % 199) - 99).toShort); i += 1
        }
        (id, bb.array())
      }
    }.toDF("doc_id", "payload")
  }

  /** REAL PCM16-LE decode at the partition boundary: wrap the payload as
    * a little-endian short buffer and reduce to fixed-width waveform
    * features (sample count, amplitude sum, energy, peak |amplitude|) —
    * the audio analog of decodeImage's decode→features shape. Total over
    * arbitrary bytes by construction: any even-length payload IS a PCM16
    * stream; a trailing odd byte is ignored (asShortBuffer floor). All
    * outputs are exact integers — no float drift across engines. */
  def decodeAudio(spark: SparkSession, bin: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("payload")).as[BinRecord]
      .mapPartitions { it =>
        it.map { r =>
          val sb = java.nio.ByteBuffer.wrap(r.payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
          val n = sb.remaining()
          var sum = 0L; var sq = 0L; var peak = 0
          var i = 0
          while (i < n) {
            val s = sb.get(i).toInt
            sum += s; sq += s.toLong * s
            val a = math.abs(s); if (a > peak) peak = a
            i += 1
          }
          AudioStats(r.doc_id, n.toLong, sum, sq, peak)
        }
      }
  }
}
