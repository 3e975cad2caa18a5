package graft.store

import org.apache.spark.sql.SparkSession

/** Filesystem probe through the Hadoop FileSystem API, so lineage /
  * snapshot reads work against ANY Spark-supported filesystem (hdfs://,
  * s3a://, file:) — a `java.io.File` probe silently reports false on a
  * DFS and would make resume reprocess everything (correct but
  * catastrophic at 100 TB).
  */
object Fs {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The java.nio path when `path` is plain-local (no scheme or file:),
    * None for any real DFS. Hadoop's RawLocalFileSystem materializes
    * permission info per listed file by SPAWNING a process (`ls`-style
    * DeprecatedRawLocalFileStatus) — a recursive listing of a few
    * hundred store files costs ~0.7 s, and the lookup path lists per
    * call. Local listings walk java.nio instead (pure syscalls);
    * DFS paths keep the Hadoop API unchanged.
    */
  private def localDir(path: String): Option[java.nio.file.Path] = {
    val uri = new org.apache.hadoop.fs.Path(path).toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      Some(java.nio.file.Paths.get(uri.getPath))
    else None
  }

  private def walkLocal(dir: java.nio.file.Path)
      : Seq[(String, Long, Long)] = {
    if (!java.nio.file.Files.isDirectory(dir)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val stream = java.nio.file.Files.walk(dir)
    try {
      stream.forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) {
          val rel = dir.relativize(p).toString
          out += ((rel, java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
        }
      }
    } finally stream.close()
    out.toSeq
  }

  /** Recursive listing of paths RELATIVE to `path` (e.g.
    * "bucket=3/part-…parquet") — DFS-safe. Base names ALONE are not
    * unique across partition dirs: one task writing several partitions
    * reuses its part-file name in every partition dir it touches, so
    * set comparisons must include the partition path.
    */
  def listFilesRelative(spark: SparkSession, path: String): Seq[String] = {
    localDir(path) match {
      case Some(d) => return walkLocal(d).map(_._1)
      case None =>
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val base = fs.makeQualified(p).toString
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val fp = fs.makeQualified(it.next().getPath).toString
      out += fp.stripPrefix(base).stripPrefix("/")
    }
    out.toSeq
  }

  /** Content signature of a directory: relative path + length + mtime
    * of every file, sorted — pure namenode metadata, no Spark job; it
    * changes whenever any file under `path` is rewritten. Keys the
    * manifest memoization in [[LineageStore]].
    */
  def signature(spark: SparkSession, path: String): String = {
    localDir(path) match {
      case Some(d) =>
        return walkLocal(d).map { case (rel, len, mtime) =>
          s"$rel:$len:$mtime"
        }.sorted.mkString("|")
      case None =>
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return ""
    val base = fs.makeQualified(p).toString
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      val rel = fs.makeQualified(s.getPath).toString
        .stripPrefix(base).stripPrefix("/")
      out += s"$rel:${s.getLen}:${s.getModificationTime}"
    }
    out.sorted.mkString("|")
  }

  /** Recursive file listing (names only) — DFS-safe like [[exists]]. */
  def listFiles(spark: SparkSession, path: String): Seq[String] = {
    localDir(path) match {
      case Some(d) =>
        return walkLocal(d).map { case (rel, _, _) =>
          rel.substring(rel.lastIndexOf('/') + 1)
        }
      case None =>
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) out += it.next().getPath.getName
    out.toSeq
  }
}
