package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction at the partition boundary.
  *
  * The decode itself is a STUB — this container has no image/audio codecs,
  * so `decodeStub` computes a deterministic fake feature (length + sum of
  * the first 8 bytes). Everything AROUND the stub is real and load-bearing:
  * the binary column + metadata schema, the typed Dataset boundary, the
  * mapPartitions batch shape (one iterator per partition ⇒ amortized codec
  * init, the same shape a real decoder needs), and the frame-sampling
  * fan-out. Swapping in a real codec changes only the function body.
  */
object Multimodal {

  case class BinRecord(doc_id: Long, payload: Array[Byte])
  case class Decoded(doc_id: Long, n_bytes: Long, feat: Long)

  /** Attach an opaque binary payload + typed metadata struct to documents
    * (here the payload is the utf-8 text itself — a stand-in for image
    * bytes with the same pipeline shape). */
  def withBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(textCol).cast("binary").as("payload"),
      struct(
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        lit("text/plain").as("mime")).as("meta"))

  /** Partition-boundary decode: one iterator per partition so a real codec
    * would init once per partition, not per row. The fake feature is the
    * sum of the first 8 unsigned byte values. */
  def decodeStub(spark: SparkSession, bin: DataFrame): Dataset[Decoded] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("payload")).as[BinRecord]
      .mapPartitions { it =>
        // real pipeline: val codec = Codec.open() once, here — STUB:
        it.map { r =>
          val head = r.payload.take(8).map(b => (b & 0xff).toLong).sum
          Decoded(r.doc_id, r.payload.length.toLong, head)
        }
      }
  }

  case class Resized(doc_id: Long, payload: Array[Byte], n_bytes: Long)

  /** Binary→binary resize at the partition boundary (the dataflow shape of
    * image downscaling: payload in, smaller payload + updated metadata
    * out). STUB body: truncate to `targetBytes`; a real resizer would
    * decode-scale-encode here with the codec opened once per partition. */
  def resizeStub(spark: SparkSession, bin: DataFrame,
      targetBytes: Int): Dataset[Resized] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("payload")).as[BinRecord]
      .mapPartitions { it =>
        it.map { r =>
          val p = if (r.payload.length > targetBytes) r.payload.take(targetBytes)
                  else r.payload
          Resized(r.doc_id, p, p.length.toLong)
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
}
