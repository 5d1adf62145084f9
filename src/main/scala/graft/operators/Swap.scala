package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory publication for the maintenance ops that swap a
  * rewritten store generation over a live one (Pack.finalizeSliceLog's
  * log trim, AnnIndex.republish/compact). The naive
  * delete(live)-then-rename(tmp, live) has a window where the live dir
  * does not exist: a crash inside it makes readers silently see an
  * EMPTY store (Pack.recoveredOffset would fall back to a lower
  * watermark and drop the open tail — silent data loss).
  *
  * Protocol ([[publish]]): the caller fully writes `tmp` (a Spark write
  * ACTION, so content is complete before we are called), then
  *   1. a `_SWAP_COMMIT` flag file is created INSIDE tmp — from here on
  *      tmp is a certified-complete generation (underscore-prefixed, so
  *      parquet readers ignore it if observed mid-swap);
  *   2. rename(live, live__swap_old)   — live is never deleted first;
  *   3. rename(tmp, live);
  *   4. delete flag, delete old.
  * A crash can leave live MISSING only between 2 and 3, and [[recover]]
  * — which read/maintenance paths call before touching the store —
  * repairs exactly that state:
  *   - live missing + tmp carrying the flag  → promote tmp (it is
  *     complete by the flag's presence);
  *   - live missing + old present            → no certified tmp:
  *     restore old (the generation that was live before).
  *
  * [[recover]] is deliberately NON-DESTRUCTIVE while live exists: it is
  * called from hot read paths (AnnIndex.readModel/codes/version,
  * Pack.recoveredOffset), and any cleanup it did there would race a
  * concurrent in-progress publish — deleting the tmp a maintenance op
  * is mid-writing (aborting it), or deleting a just-certified tmp so
  * the publisher's rename fails. Cleanup of stragglers (stale tmp, a
  * post-swap `__swap_old`, an in-live flag) belongs to the WRITERS:
  * [[publish]] clears the old aside up front, every publishing call
  * site rewrites its tmp from scratch, and the post-rename flag delete
  * sweeps a stale in-live flag into the discarded old generation.
  *
  * A crash between flag creation (1) and rename (2) leaves a FULLY
  * CERTIFIED tmp beside a healthy live. Recover must not promote it
  * (live is the serving truth; all-or-nothing says the caller re-runs
  * the maintenance op), but silently ignoring it would make the re-run
  * indistinguishable from a first run — so recover SURFACES the state
  * as [[Swap.CertifiedTmpPending]] (and a warn log) while touching
  * nothing.
  */
object Swap {
  private val CommitFlag = "_SWAP_COMMIT"
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** What [[recover]] found (and did). Promote/Restore are the two
    * live-missing repairs; CertifiedTmpPending is the surfaced
    * crash-after-certification state (nothing touched); Clean is the
    * no-op.
    */
  sealed trait RecoverOutcome
  case object Clean extends RecoverOutcome
  case object PromotedTmp extends RecoverOutcome
  case object RestoredOld extends RecoverOutcome
  case object CertifiedTmpPending extends RecoverOutcome

  /** The aside path the previous live generation moves to during a swap. */
  def oldPath(live: Path): Path = new Path(live.toString + "__swap_old")

  /** Atomically (two renames, no delete-first) publish the fully-written
    * `tmp` dir as `live`. Caller must have finished writing `tmp`.
    */
  def publish(fs: FileSystem, tmp: Path, live: Path): Unit = {
    require(fs.exists(tmp), s"swap: tmp generation $tmp does not exist")
    val old = oldPath(live)
    fs.delete(old, true) // straggler from a prior completed swap
    fs.create(new Path(tmp, CommitFlag), true).close()
    if (fs.exists(live))
      require(fs.rename(live, old), s"swap: rename $live -> $old failed")
    require(fs.rename(tmp, live), s"swap: rename $tmp -> $live failed")
    fs.delete(new Path(live, CommitFlag), false)
    fs.delete(old, true)
  }

  /** Repair a crashed [[publish]] that left `live` missing — call before
    * reading `live`. Non-destructive otherwise (see class doc): with a
    * healthy live it only REPORTS what it sees, so hot read paths can
    * never abort a concurrent maintenance write.
    */
  def recover(fs: FileSystem, tmp: Path, live: Path): RecoverOutcome = {
    val old = oldPath(live)
    if (!fs.exists(live)) {
      if (fs.exists(new Path(tmp, CommitFlag))) {
        require(fs.rename(tmp, live), s"swap recovery: rename $tmp -> $live failed")
        fs.delete(new Path(live, CommitFlag), false)
        fs.delete(old, true)
        log.warn(s"swap recovery: promoted certified generation $tmp -> $live")
        return PromotedTmp
      } else if (fs.exists(old)) {
        require(fs.rename(old, live), s"swap recovery: rename $old -> $live failed")
        log.warn(s"swap recovery: restored previous generation $old -> $live")
        return RestoredOld
      }
      return Clean // first generation not yet published — nothing to repair
    }
    if (fs.exists(new Path(tmp, CommitFlag))) {
      // a publish crashed after certifying tmp but before moving live
      // aside: live is still the serving truth, tmp is a COMPLETE
      // generation that never went live. All-or-nothing says the caller
      // re-runs the maintenance op (which rewrites tmp) — but surface
      // the state so that re-run is not mistaken for a first run.
      log.warn(s"swap recovery: certified-but-unpublished generation at $tmp " +
        s"(live $live intact) — a publish crashed before its renames; " +
        "the next maintenance pass will rewrite and re-publish it")
      return CertifiedTmpPending
    }
    Clean
  }
}
