package graft

import org.apache.hadoop.fs.{Path => HPath}

/** The ONE checked-rename directory swap shared by every copy-on-write
  * maintenance path — `InvertedIndex.compact`, `IvfIndex`/`IvfPqIndex
  * .retrain`, and the mapper facade's `rewriteInPlace`/`deleteWhere` — so
  * the crash-window contract cannot drift between them:
  *
  *  1. `<live>.old` (stale leftover) is dropped;
  *  2. live renames to `<live>.old`;
  *  3. the fully-written `tmp` renames to live;
  *  4. `<live>.old` is dropped.
  *
  * Renames are CHECKED — HDFS-style FileSystems report failure by
  * returning false, not throwing, and an unchecked rename would leave a
  * stale directory live and then delete its only backup. A failure between
  * steps 2 and 3 (the no-live-directory window) triggers a best-effort
  * ROLLBACK of `.old` back to live, so a same-process failure leaves the
  * old snapshot fully live; a hard kill in that window leaves it fully
  * intact at `<live>.old` (recovery: rename it back). Either way the
  * target is never half-swapped. Single-maintainer contract, same as the
  * index compaction it generalizes; multi-reader deployments front this
  * with a manifest pointer (Iceberg/Delta-style). */
object AtomicSwap {
  /** Replace the directory at `live` with the fully-written `tmp`.
    * `onBetweenRenames` is a fault-injection point for crash-window specs
    * — production callers leave the default no-op. */
  def replace(conf: org.apache.hadoop.conf.Configuration, live: String,
      tmp: String, opName: String,
      onBetweenRenames: () => Unit = () => ()): Unit = {
    val p = new HPath(live)
    val old = new HPath(live + ".old")
    val fs = p.getFileSystem(conf)
    def renameOrThrow(from: HPath, to: HPath): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(
          s"$opName: rename $from -> $to failed; target left unswapped")
    fs.delete(old, true)
    renameOrThrow(p, old)
    try {
      onBetweenRenames()
      renameOrThrow(new HPath(tmp), p)
    } catch {
      case e: Throwable =>
        // the no-live-dir window: restore the old snapshot if we still can
        if (!fs.exists(p)) fs.rename(old, p)
        throw e
    }
    fs.delete(old, true)
  }
}
