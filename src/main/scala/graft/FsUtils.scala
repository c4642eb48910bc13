package graft

import org.apache.spark.sql.SparkSession

/** Filesystem helpers shared by the batch builders and streaming sinks.
  * Everything resolves through the session's Hadoop conf, not a bare
  * Configuration — FS settings/credentials injected via spark.hadoop.*
  * (s3a etc.) must apply. */
object FsUtils {

  /** True only if `path` holds at least one committed (non-hidden)
    * entry — `_temporary`/`_SUCCESS` residue from a crashed write does
    * not count, so an append that died before committing leaves a
    * "fresh" target the retry can write into instead of an unreadable
    * dir that fails schema inference forever. */
  def committedExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Write a small text file through the Hadoop FileSystem (works for
    * s3a/hdfs/file URIs alike — java.nio would treat a URI outDir as a
    * relative local path and fail after the build did all its work). */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Read a small text file written by [[writeString]]; None if the
    * file does not exist. */
  def readString(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }
}
