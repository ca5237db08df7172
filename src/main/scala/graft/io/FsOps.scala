package graft.io

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small filesystem commit primitives shared by the io layer.
  *
  * Every durable state transition in this package commits via a
  * directory/file rename. HDFS-compatible filesystems make that rename
  * atomic but signal failure with a FALSE RETURN, not an exception —
  * swallowing it turns "commit failed" into "commit silently skipped"
  * (the streaming checkpoint then advances past a lost batch, the one
  * failure mode the exactly-once wrappers exist to prevent). Everything
  * here throws on a failed rename so the caller's batch fails and
  * Spark replays it.
  */
object FsOps {

  def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Rename as a commit point; throws when the rename did not happen. */
  def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new IllegalStateException(
        s"atomic commit failed: rename $src -> $dst (target exists or parent missing)")

  def readTextOpt(spark: SparkSession, path: Path): Option[String] = {
    val f = fs(spark, path)
    if (!f.exists(path)) None
    else {
      val in = f.open(path)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Write a small text file via stage-and-rename. */
  def writeTextAtomic(spark: SparkSession, path: Path, content: String): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(path.getParent, "." + path.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(path)) f.delete(path, false)
    renameOrThrow(f, tmp, path)
  }
}
