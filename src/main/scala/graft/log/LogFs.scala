package graft.log

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Thin Hadoop-FileSystem helpers for the store's control-plane file
  * operations (markers, manifests, staged-file publishes).
  *
  * Everything the log does to files goes through the Hadoop FS API, so
  * the store runs unchanged on any Hadoop-compatible filesystem —
  * `file://` locally, `hdfs://`, `abfs://`, `s3a://` on a cluster (the
  * reference's Azure blob tier, server/azure/, falls out of the same
  * abstraction). Atomicity caveat: `rename` is atomic on local/HDFS/ABFS
  * but copy+delete on S3A — on S3, front the data dir with a
  * manifest-committing layer or use a table format; the marker-based
  * recovery protocols here stay correct either way (they only require
  * that a rename eventually lands, not that it is instant).
  */
private[graft] object LogFs {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(fs: FileSystem, p: String): Boolean = fs.exists(new Path(p))

  /** Non-recursive list of the .parquet files directly under `dir`. */
  def listParquet(fs: FileSystem, dir: String): Seq[Path] =
    if (!fs.exists(new Path(dir))) Seq.empty
    else
      fs.listStatus(new Path(dir))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
        .toSeq
        .sortBy(_.getName)

  /** All .parquet files under `dir`, any depth. */
  def walkParquet(fs: FileSystem, dir: String): Seq[Path] = {
    val out = Seq.newBuilder[Path]
    val it = fs.listFiles(new Path(dir), true)
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet")) out += s.getPath
    }
    out.result().sortBy(_.toString)
  }

  def totalBytes(fs: FileSystem, dir: String): Long =
    fs.getContentSummary(new Path(dir)).getLength

  def move(fs: FileSystem, src: Path, dst: Path): Unit = {
    fs.mkdirs(dst.getParent)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }

  def deleteRecursive(fs: FileSystem, p: String): Unit =
    fs.delete(new Path(p), true)

  def deleteFile(fs: FileSystem, p: Path): Unit = fs.delete(p, false)

  /** Create an empty marker file (parents included). */
  def touch(fs: FileSystem, p: String): Unit = {
    val path = new Path(p)
    fs.mkdirs(path.getParent)
    fs.create(path, true).close()
  }

  /** Torn-write-safe text write: write to a `.tmp` sibling, then rename
    * into place — a crash mid-write never leaves a truncated file at
    * `p` (recovery protocols read these files and act on their
    * contents, so a partial manifest must be impossible to observe).
    * NOT an atomic replace: overwriting an existing `p` deletes it
    * first (plain HDFS rename won't clobber), so a crash between the
    * delete and the rename leaves NO file — every current caller
    * writes fresh control files whose absence reads as "no operation
    * in progress", the safe direction. A caller that needs
    * replace-atomicity must use FileContext rename with OVERWRITE. */
  def writeText(fs: FileSystem, p: String, text: String): Unit = {
    val target = new Path(p)
    val tmp = new Path(p + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8"))
    finally out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"rename failed: $tmp -> $target")
  }

  def readLines(fs: FileSystem, p: String): List[String] = {
    val in = fs.open(new Path(p))
    try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }
}
