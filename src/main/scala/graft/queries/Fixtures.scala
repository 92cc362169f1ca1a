package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Runtime-fixture cache keys for queries that materialize derived layouts
  * (CSV round-trip fixtures, hive-partitioned layouts, IVF cell layouts).
  *
  * The key is a fingerprint of the SOURCE file's identity + length + mtime,
  * resolved through the Hadoop FileSystem API (works on HDFS/object stores,
  * not just local disk). Regenerating the dataset at the same path changes
  * mtime, so stale fixtures are never reused; distinct paths never collide
  * on a 128-bit digest (the previous abs(path.hashCode) key had both
  * failure modes).
  */
object Fixtures {

  /** 16-hex-char fingerprint of `srcPath`'s (uri, length, mtime). */
  def key(spark: SparkSession, srcPath: String): String = {
    val p = new Path(srcPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val id = s"${p.toUri}:${st.getLen}:${st.getModificationTime}"
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** True iff the fixture at `dir` is already written (_SUCCESS present),
    * checked through the Hadoop FS. */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(s"$dir/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Recursively delete `/tmp/<name>` if present and return its path —
    * the streaming entries' per-run scratch discipline (fixed root, so
    * bench passes never accumulate tmp dirs), with the Files.walk
    * stream properly closed. */
  def freshDir(name: String): java.nio.file.Path = {
    val base = java.nio.file.Paths.get(s"/tmp/$name")
    if (java.nio.file.Files.exists(base)) {
      val walk = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      } finally walk.close()
    }
    base
  }
}
