package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction — the standing maintenance op of any file-based
  * landing zone: streaming/per-batch ingest (e.g. `stream_ingest_files`,
  * one file per micro-batch) accumulates thousands of KB-scale files whose
  * per-file open/footer cost eventually dominates scans. Compaction
  * rewrites a directory into ⌈bytes / targetBytes⌉ files.
  *
  * Scale notes: the byte size comes from the filesystem LISTING (no data
  * read); the rewrite is one `repartition(n)` pass — a single round-robin
  * shuffle that also heals skewed input file sizes. Row-level content is
  * preserved exactly; file-level layout is not (that is the point).
  * For partitioned layouts run per-partition-directory so pruning columns
  * survive.
  */
object Compaction {

  /** Total byte size of the parquet files under `dir` via FS listing. */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile)
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  /** Number of parquet part-files under `dir`. */
  def fileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite `srcDir` into `outDir` with ⌈bytes/targetBytes⌉ files
    * (minimum 1). Returns the chosen file count. */
  def compact(spark: SparkSession, srcDir: String, outDir: String,
      targetBytes: Long): Int = {
    val n = math.max(1,
      math.ceil(dataBytes(spark, srcDir).toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
