package graft

import graft.operators.Stores
import org.apache.hadoop.fs.Path

/** The safety contract of [[graft.operators.Stores.duplicate]] — the
  * metadata-weight store duplication behind every staged-store restore
  * and the generation fold's packed-store carry. Data files (`part-*`)
  * may be hard-linked (they are immutable by the engine's write
  * discipline: created fresh, renamed, deleted — never opened for
  * in-place write), but marker files are legitimately rewritten in
  * place via `fs.create(p, overwrite = true)`, which TRUNCATES the
  * inode — so a linked marker would corrupt the staged copy the moment
  * the live one is bumped. The spec pins exactly that split.
  */
class StoresSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def conf = spark.sparkContext.hadoopConfiguration

  private def write(p: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  private def read(p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toByteArray
    } finally in.close()
  }

  private def withWd(f: Path => Unit): Unit = {
    val wd = new Path(java.nio.file.Files.createTempDirectory("graft_stores_").toString)
    try f(wd) finally fs.delete(wd, true)
  }

  test("duplicate reproduces the tree byte-for-byte, nested dirs included") {
    withWd { wd =>
      val src = new Path(wd, "src")
      fs.mkdirs(new Path(src, "shard_id=3"))
      write(new Path(src, "shard_id=3/part-00000.parquet"), "data-a".getBytes)
      write(new Path(src, "part-00001.parquet"), "data-b".getBytes)
      write(new Path(src, "_WATERMARK_SEQS"), "wm-1".getBytes)
      write(new Path(src, "_SUCCESS"), Array.emptyByteArray)
      val dst = new Path(wd, "dst")
      Stores.duplicate(fs, src, dst, conf)
      assert(new String(read(new Path(dst, "shard_id=3/part-00000.parquet"))) == "data-a")
      assert(new String(read(new Path(dst, "part-00001.parquet"))) == "data-b")
      assert(new String(read(new Path(dst, "_WATERMARK_SEQS"))) == "wm-1")
      assert(fs.exists(new Path(dst, "_SUCCESS")))
    }
  }

  test("rewriting a live marker in place never mutates the duplicate (markers are copies)") {
    withWd { wd =>
      val src = new Path(wd, "staged")
      fs.mkdirs(src)
      write(new Path(src, "_REPACK_VERSION"), "v1".getBytes)
      write(new Path(src, "part-00000.parquet"), "tokens".getBytes)
      val live = new Path(wd, "live")
      Stores.duplicate(fs, src, live, conf)
      // the maintenance path bumps the LIVE marker with create(overwrite)
      // — the truncate-in-place pattern that must not reach the staged copy
      write(new Path(live, "_REPACK_VERSION"), "v2-bumped".getBytes)
      assert(new String(read(new Path(src, "_REPACK_VERSION"))) == "v1")
      assert(new String(read(new Path(live, "_REPACK_VERSION"))) == "v2-bumped")
    }
  }

  test("deleting or replacing live data files leaves the staged copy intact (link-or-copy either way)") {
    withWd { wd =>
      val src = new Path(wd, "staged")
      fs.mkdirs(src)
      write(new Path(src, "part-00000.parquet"), "gen1-data".getBytes)
      val live = new Path(wd, "live")
      Stores.duplicate(fs, src, live, conf)
      // a repack swaps a fresh generation over live: old files unlink
      fs.delete(new Path(live, "part-00000.parquet"), false)
      write(new Path(live, "part-00000.parquet"), "gen2-data".getBytes)
      assert(new String(read(new Path(src, "part-00000.parquet"))) == "gen1-data")
      assert(new String(read(new Path(live, "part-00000.parquet"))) == "gen2-data")
    }
  }
}
