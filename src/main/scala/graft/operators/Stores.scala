package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** Metadata-weight directory duplication for immutable parquet stores —
  * the staged-store restores (io09/io10/e12/e13/p09's re-run parity
  * convention) and the generation fold's packed-store carry
  * (RefreshPipeline.compactGen: "conserve docs keep their PUBLISHED
  * positions bit-for-bit").
  *
  * Every one of those sites byte-copied the whole store
  * (FileUtil.copy), but the engine's write discipline makes the data
  * files immutable by construction: parquet `part-*` files are only
  * ever created fresh, renamed (Swap), or deleted — never opened for
  * in-place write. So on a filesystem that supports it, the copy can be
  * a HARD LINK per data file: O(files) metadata operations instead of
  * O(bytes) read+write, and — just as important on a loaded box — zero
  * new dirty pages for the kernel to write back (guide §6: every byte
  * not written is a byte the shared disk does not owe). At production
  * scale the same idea is the object-store manifest copy: a fold that
  * re-points the packed store costs metadata, not a store rewrite.
  *
  * Marker files (`_WATERMARK_SEQS`, `_REPACK_VERSION`,
  * `_APPENDS_SINCE_COMPACT`, `_SUCCESS`, thresholds…) are BYTE-COPIED:
  * they are legitimately rewritten in place via `fs.create(p,
  * overwrite=true)`, which truncates the shared inode — a linked marker
  * would corrupt the staged copy the instant the live one is bumped.
  * The name rule is exactly Spark's own data/metadata split: `part-*`
  * is task-committed immutable data, everything else is mutable
  * bookkeeping.
  *
  * Non-local filesystems (no hard-link API on the Hadoop FileSystem
  * abstraction) and any per-file link failure (cross-device, exotic
  * mounts) fall back to the byte copy — semantics identical either way.
  */
object Stores {

  /** Duplicate `src` as `dst` (dst must not exist — callers delete
    * first, the FileUtil.copy contract this replaces).
    */
  def duplicate(fs: FileSystem, src: Path, dst: Path, conf: Configuration): Unit =
    if (fs.getScheme == "file") linkTree(fs, src, dst, conf)
    else FileUtil.copy(fs, src, fs, dst, false, true, conf)

  private def localFile(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  private def linkTree(fs: FileSystem, src: Path, dst: Path, conf: Configuration): Unit = {
    fs.mkdirs(dst)
    fs.listStatus(src).foreach { st =>
      val d = new Path(dst, st.getPath.getName)
      if (st.isDirectory) linkTree(fs, st.getPath, d, conf)
      else if (st.getPath.getName.startsWith("part-"))
        try java.nio.file.Files.createLink(localFile(d), localFile(st.getPath))
        catch {
          case _: Exception =>
            FileUtil.copy(fs, st.getPath, fs, d, false, true, conf)
        }
      else FileUtil.copy(fs, st.getPath, fs, d, false, true, conf)
    }
  }
}
