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

  /** Recursive listing of paths RELATIVE to `path` (e.g.
    * "bucket=3/part-…parquet") — DFS-safe. Base names ALONE are not
    * unique across partition dirs: one task writing several partitions
    * reuses its part-file name in every partition dir it touches, so
    * set comparisons must include the partition path.
    */
  def listFilesRelative(spark: SparkSession, path: String): Seq[String] = {
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
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) out += it.next().getPath.getName
    out.toSeq
  }
}
