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
  * Every state a crash can leave is repaired by [[recover]], which
  * read/maintenance paths call before touching the store:
  *   - live missing + tmp carrying the flag  → crash between 2 and 3:
  *     promote tmp (it is complete by the flag's presence);
  *   - live missing + old present            → crash with no certified
  *     tmp: restore old (the generation that was live before);
  *   - live present                          → any leftover tmp is an
  *     UNcertified partial write and any old is a post-swap straggler:
  *     drop both, clear a leftover in-live flag.
  * Recovery is idempotent and costs a handful of fs metadata calls.
  */
object Swap {
  private val CommitFlag = "_SWAP_COMMIT"

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

  /** Repair any crashed [[publish]] state — call before reading `live`. */
  def recover(fs: FileSystem, tmp: Path, live: Path): Unit = {
    val old = oldPath(live)
    if (!fs.exists(live)) {
      if (fs.exists(new Path(tmp, CommitFlag))) {
        require(fs.rename(tmp, live), s"swap recovery: rename $tmp -> $live failed")
        fs.delete(new Path(live, CommitFlag), false)
      } else if (fs.exists(old)) {
        require(fs.rename(old, live), s"swap recovery: rename $old -> $live failed")
      }
    }
    if (fs.exists(live)) {
      fs.delete(new Path(live, CommitFlag), false)
      fs.delete(tmp, true)
      fs.delete(old, true)
    }
  }
}
