package graft

import graft.operators.Swap
import org.apache.hadoop.fs.Path

/** The crash-state machine of [[graft.operators.Swap]]: every state an
  * interrupted publish can leave must repair to a live, complete
  * generation — never an absent or partial one. (The old
  * delete-then-rename had a live-dir-missing window; a crash there made
  * Pack.recoveredOffset silently drop the open tail.)
  */
class SwapSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkGen(dir: Path, tag: String): Unit = {
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, "part-00000"), true)
    try out.writeBytes(tag) finally out.close()
  }

  private def genTag(dir: Path): String = {
    val in = fs.open(new Path(dir, "part-00000"))
    try in.readLine() finally in.close()
  }

  private def withWd(f: Path => Unit): Unit = {
    val wd = new Path(java.nio.file.Files.createTempDirectory("graft_swap_").toString)
    try f(wd) finally fs.delete(wd, true)
  }

  test("completed publish: tmp becomes live, old generation and aside dirs gone") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(live, "gen1"); mkGen(tmp, "gen2")
      Swap.publish(fs, tmp, live)
      assert(genTag(live) == "gen2")
      assert(!fs.exists(tmp) && !fs.exists(Swap.oldPath(live)))
      assert(!fs.exists(new Path(live, "_SWAP_COMMIT")))
    }
  }

  test("publish onto a not-yet-existing live dir (first generation)") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(tmp, "gen1")
      Swap.publish(fs, tmp, live)
      assert(genTag(live) == "gen1" && !fs.exists(tmp))
    }
  }

  test("crash between the two renames (live aside, certified tmp): recover promotes the new generation") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(tmp, "gen2")
      fs.create(new Path(tmp, "_SWAP_COMMIT"), true).close() // certification flag
      mkGen(Swap.oldPath(live), "gen1") // live was renamed aside
      Swap.recover(fs, tmp, live)
      assert(genTag(live) == "gen2", "a certified tmp is a complete generation — promote it")
      assert(!fs.exists(tmp) && !fs.exists(Swap.oldPath(live)))
      assert(!fs.exists(new Path(live, "_SWAP_COMMIT")))
    }
  }

  test("crash with live aside and NO certified tmp: recover restores the previous generation") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(Swap.oldPath(live), "gen1")
      mkGen(tmp, "gen2-partial") // no _SWAP_COMMIT: the tmp write never finished
      Swap.recover(fs, tmp, live)
      assert(genTag(live) == "gen1", "without certification the old generation is the truth")
      assert(!fs.exists(Swap.oldPath(live)))
      // the uncertified tmp is LEFT: it may be a re-running maintenance
      // op mid-write; the writer rewrites it from scratch anyway
      assert(fs.exists(tmp))
    }
  }

  test("crash after the swap, before cleanup (live + flag + old): live serves; next publish sweeps the stragglers") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(live, "gen2")
      fs.create(new Path(live, "_SWAP_COMMIT"), true).close()
      mkGen(Swap.oldPath(live), "gen1")
      // read-path recover is non-destructive with a healthy live: it
      // must not delete ANYTHING a concurrent maintenance op might own
      assert(Swap.recover(fs, tmp, live) == Swap.Clean)
      assert(genTag(live) == "gen2")
      // the stragglers heal at the next publish (writer-side cleanup)
      mkGen(tmp, "gen3")
      Swap.publish(fs, tmp, live)
      assert(genTag(live) == "gen3")
      assert(!fs.exists(Swap.oldPath(live)) && !fs.exists(new Path(live, "_SWAP_COMMIT")))
    }
  }

  test("leftover uncertified tmp beside a healthy live: recover LEAVES it (it may be a write in progress)") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(live, "gen1"); mkGen(tmp, "gen2-partial")
      // an uncertified tmp beside a healthy live is indistinguishable
      // from a concurrent republish/compact mid-write: a read path that
      // deleted it would abort the maintenance op (the r15 advice race)
      assert(Swap.recover(fs, tmp, live) == Swap.Clean)
      assert(genTag(live) == "gen1" && fs.exists(tmp))
      assert(genTag(tmp) == "gen2-partial")
    }
  }

  test("crash after certification, before the renames: recover surfaces CertifiedTmpPending and touches nothing") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(live, "gen1")
      mkGen(tmp, "gen2")
      fs.create(new Path(tmp, "_SWAP_COMMIT"), true).close()
      // live is still the serving truth; the certified tmp is a complete
      // generation that never went live — surfaced, never silently
      // discarded (and never promoted: all-or-nothing, caller re-runs)
      assert(Swap.recover(fs, tmp, live) == Swap.CertifiedTmpPending)
      assert(genTag(live) == "gen1")
      assert(fs.exists(new Path(tmp, "_SWAP_COMMIT")) && genTag(tmp) == "gen2")
      // idempotent: the signal repeats until a writer republishes
      assert(Swap.recover(fs, tmp, live) == Swap.CertifiedTmpPending)
      // the re-run maintenance op rewrites tmp and publishes cleanly
      fs.delete(tmp, true); mkGen(tmp, "gen2b")
      Swap.publish(fs, tmp, live)
      assert(genTag(live) == "gen2b" && !fs.exists(tmp))
    }
  }

  test("recover reports its live-missing repairs: PromotedTmp / RestoredOld") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(tmp, "gen2")
      fs.create(new Path(tmp, "_SWAP_COMMIT"), true).close()
      assert(Swap.recover(fs, tmp, live) == Swap.PromotedTmp)
      fs.delete(live, true)
      mkGen(Swap.oldPath(live), "gen1")
      assert(Swap.recover(fs, tmp, live) == Swap.RestoredOld)
    }
  }

  test("recover is idempotent and a no-op on a clean store") {
    withWd { wd =>
      val live = new Path(wd, "store"); val tmp = new Path(wd, "store_tmp")
      mkGen(live, "gen1")
      assert(Swap.recover(fs, tmp, live) == Swap.Clean)
      assert(Swap.recover(fs, tmp, live) == Swap.Clean)
      assert(genTag(live) == "gen1")
    }
  }
}
