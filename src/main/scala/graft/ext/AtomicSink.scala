package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}

/** Temp-file + rename-on-commit for the RAW-FILE sinks
  * ([[Warc.writeRecords]]/[[Warc.writeRecordsIndexed]]/[[Warc.writeWet]],
  * [[WebDataset.writeShards]]) — the FileCommitProtocol shape, sized to
  * one file per task. Without it a retried or SPECULATIVE duplicate
  * attempt opens the same final path a still-running winner holds and
  * the two streams interleave on filesystems without single-writer
  * leases (local FS, most object stores). With it every attempt writes
  * its own `.inprogress-<attemptId>` file and the final name only ever
  * receives COMPLETE bytes via rename:
  *
  *   - rename is atomic per the HDFS/POSIX contract, so readers never
  *     observe a partial final file;
  *   - a duplicate attempt re-produces byte-identical content (every
  *     sink here is deterministic per partition), so whichever attempt
  *     commits last leaves the same complete file — double-commit is
  *     benign, interleaving is impossible;
  *   - a failed attempt deletes its temp file (abort), leaving no
  *     `.inprogress` litter for downstream globs (which skip dotfiles
  *     anyway, the Hadoop hidden-file convention).
  *
  * Reference: rearview delegates all persistence to Rails/Graphite
  * (`app/models/job.rb`); this is the Spark-side durability the
  * extension sinks need at cluster scale. */
object AtomicSink {

  /** Hidden, attempt-unique sibling of `dest` — two attempts of the
    * same task can never collide on it. */
  def tempFor(dest: Path, attemptId: Long): Path =
    new Path(dest.getParent, s".${dest.getName}.inprogress-$attemptId")

  /** Publish `tmp` as `dest`. A pre-existing `dest` (a stale file from
    * a prior job over the same outDir, or an already-committed
    * duplicate attempt) is replaced — both carry complete bytes, and
    * per-partition determinism makes the replacement byte-identical in
    * the duplicate-attempt case.
    *
    * Replacement is ATOMIC where the filesystem can express it: the
    * FileContext rename with OVERWRITE (HDFS and the local FS both
    * implement it as a single atomic replace), so concurrent readers
    * never observe a window where `dest` is absent. Only when that API
    * is unavailable does the delete-then-rename fallback run — and in
    * the fallback, `tmp` (possibly the only complete copy at that
    * point) is deleted ONLY after `dest` verifiably exists again (a
    * racer's complete commit); any other second-rename failure
    * propagates instead of silently discarding the data. */
  def commit(fs: FileSystem, tmp: Path, dest: Path): Unit = {
    if (!fs.rename(tmp, dest)) { // plain FS rename refuses an existing dest
      // tmp's length, captured while it still exists: "a racer's
      // complete commit sits at dest" is checkable — deterministic
      // bytes make the racer's copy EXACTLY this long, while a stale
      // dest left by a prior job over the same outDir generally is
      // not. None = tmp already gone (can't strengthen the check).
      val tmpLen =
        try Some(fs.getFileStatus(tmp).getLen)
        catch { case _: java.io.FileNotFoundException => None }
      def racerCommitted(): Boolean =
        try tmpLen.forall(_ == fs.getFileStatus(dest).getLen)
        catch { case _: java.io.FileNotFoundException => false }
      val qTmp = fs.makeQualified(tmp)
      val qDest = fs.makeQualified(dest)
      val atomic =
        try {
          org.apache.hadoop.fs.FileContext
            .getFileContext(qDest.toUri, fs.getConf)
            .rename(qTmp, qDest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          true
        } catch {
          // tmp vanished: success only if a racer's complete commit
          // (length-verified) sits at dest — otherwise fall through
          case _: java.io.FileNotFoundException => racerCommitted()
          case _: UnsupportedOperationException => false
          case _: java.io.IOException => false
        }
      if (!atomic) {
        fs.delete(dest, false)
        if (!fs.rename(tmp, dest)) {
          if (racerCommitted()) fs.delete(tmp, false)
          else throw new java.io.IOException(
            s"atomic commit failed: could not publish $tmp as $dest " +
              "and no complete committed copy exists")
        }
      }
    }
  }

  /** Drop a failed attempt's temp file. */
  def abort(fs: FileSystem, tmp: Path): Unit = {
    try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
  }

  /** Run `write(tmpPath)` then commit tmp → dest; abort on failure.
    * The write function receives the TEMP path to create. */
  def writeCommitted(fs: FileSystem, dest: Path, attemptId: Long)
      (write: Path => Unit): Unit = {
    val tmp = tempFor(dest, attemptId)
    try { write(tmp); commit(fs, tmp, dest) }
    catch { case t: Throwable => abort(fs, tmp); throw t }
  }
}
