package graft.core

import org.apache.spark.sql.SparkSession

/** Shared plumbing for persisted index stores (the ANN vector index,
  * the MinHash dedup index, and whatever store comes next): a
  * deterministic per-corpus scratch location, a cheap source-content
  * fingerprint, and the build-if-missing-or-stale marker protocol.
  * Nothing here is vector- or dedup-specific — it lives in core so the
  * stores don't have to reach across feature packages for it.
  */
object IndexScratch {

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Versioned per-corpus scratch location for query-entry indexes.
    * v2: quantizer training moved to exact integer-quantized Lloyd
    * arithmetic — artifacts trained by the v1 float path are no longer
    * bit-compatible with the training-replay oracles, so the version
    * bump forces a rebuild rather than trusting a stale cache.
    */
  def scratchBase(dir: String, kind: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-index-v2-$kind-${md5hex(dir).take(10)}"

  /** Hadoop-FS existence probe (works for any configured filesystem,
    * not just local paths — the stores' artifacts live wherever the
    * cluster's default FS puts them).
    */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** True when `path` holds at least one actual DATA file (recursive,
    * skipping `_SUCCESS`/dot markers). `pathExists` is NOT enough for
    * a partitioned parquet sink: a committed write whose transform
    * produced zero rows leaves the directory with `_SUCCESS` and no
    * part files, and `spark.read.parquet` on that THROWS ("unable to
    * infer schema") instead of returning zero rows — so empty-state
    * guards must probe for data files, not the directory.
    */
  def hasDataFiles(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) return true
    }
    false
  }

  /** Cheap content fingerprint of a source table directory: relative
    * paths, sizes, and mtimes of its data files, recursively
    * (hive-partitioned sources keep data in subdirectories — a
    * top-level listing would fingerprint as empty). Filesystem metadata
    * only — no Spark job, no data read. Catches in-place regeneration
    * of the source corpus, which a path-keyed marker alone cannot; a
    * touched-but-equal source costs one spurious rebuild — the safe
    * direction. Limitation (accepted): a rewrite that preserves every
    * file's name, length, AND mtime is indistinguishable — closing that
    * would mean reading data, which at index-store scale is the build.
    */
  def sourceFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val it = fs.listFiles(p, true)
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val base = p.toUri.getPath
      while (it.hasNext) {
        val f = it.next()
        val rel = f.getPath.toUri.getPath.stripPrefix(base)
        entries += s"$rel:${f.getLen}:${f.getModificationTime}"
      }
      md5hex(entries.sorted.mkString("\n"))
    }
  }

  /** Build-if-missing-or-stale: the completion marker is stamped with
    * the SOURCE fingerprint, so a crashed half-written build (no
    * marker) and an in-place source regeneration (fingerprint mismatch)
    * both rebuild; Overwrite semantics make the rebuild safe.
    */
  def ensureBuilt(basePath: String, fingerprint: String)(
      build: => Unit): Unit = {
    val marker = java.nio.file.Paths.get(basePath, "_INDEX_OK")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == fingerprint
    if (!fresh) {
      build
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.write(marker, fingerprint.getBytes("UTF-8"))
    }
  }
}
