package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Attempt-private temp + rename for task-side file writers (KML / GPX /
  * MIF / DXF / shapefile part writers — everything that emits one file per
  * partition OUTSIDE Spark's committer). A deterministic final name written
  * directly is corruptible under SPECULATIVE execution: two live attempts
  * of the same task open the same path and interleave. Each attempt writes
  * `.name.<taskAttemptId>.inprogress` instead and renames on success —
  * the rename is last-wins idempotent (same contract as the FlatGeobuf
  * DSv2 writer's commit), and a failed attempt leaves only a dot-prefixed
  * temp every reader here already ignores.
  */
private[io] object AtomicTaskFile {
  def withOutput(fs: FileSystem, finalPath: Path)
      (write: java.io.OutputStream => Unit): Unit = {
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(0L)
    val tmp = new Path(finalPath.getParent,
      s".${finalPath.getName}.$attempt.inprogress")
    val out = fs.create(tmp, true)
    var ok = false
    try { write(out); ok = true }
    finally {
      out.close()
      if (!ok) { try fs.delete(tmp, false) catch { case _: Throwable => () } }
    }
    fs.delete(finalPath, false)
    if (!fs.rename(tmp, finalPath))
      throw new java.io.IOException(s"atomic write: rename $tmp -> $finalPath failed")
  }
}
