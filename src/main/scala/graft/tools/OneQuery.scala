package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single catalog query in isolation — the per-query iteration
  * loop (Bench runs the whole catalog; this answers "did MY query get
  * faster" without the other 77).
  *
  * Usage: runMain graft.tools.OneQuery <queryName> [sfDir] [reps]
  *        runMain graft.tools.OneQuery <queryName> [sfDir] explain
  * (`explain` prints the formatted physical plan instead of timing —
  * the .explain-and-iterate loop for plan work and PLANS.md.)
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explainOnly = args.length > 2 && args(2) == "explain"
    val reps = if (args.length > 2 && !explainOnly) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // the exact session ScaleStress uses (AQE, 4g maxResultSize) — an
    // adjudication must reproduce the stress run's environment, not a
    // differently-tuned one
    val spark = graft.engine.Session.local(cpus.toInt)
    // same dedup-broadcast operating knob as ScaleStress: adjudicating a
    // heavy tier (x1000's 2.7 GB sig table) needs the budget the stress
    // run used, or d06 exercises the fallback instead of the plan under
    // adjudication (driver heap must be raised too: SPARK_DRIVER_MEM)
    sys.env.get("SPARK_GRAFT_SIG_BUDGET").foreach { b =>
      spark.conf.set("spark.graft.dedup.sigBroadcastBytes", b)
    }
    // streaming-tier adjudication knobs, same defaults-if-unset as the
    // stress harness: the noop drain and per-tier state sizing must
    // match the run whose cell is being re-measured
    sys.env.get("SPARK_GRAFT_STREAM_SINK").foreach { v =>
      spark.conf.set("spark.graft.stream.sink", v)
    }
    sys.env.get("SPARK_GRAFT_STATE_PARTITIONS").foreach { v =>
      spark.conf.set("spark.graft.stream.statePartitions", v)
    }
    val fn = graft.SparkEntry.queries(name)
    if (explainOnly) {
      fn(spark, sfDir).explain("formatted")
      spark.stop()
      return
    }
    // same warmup convention as Bench
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      // harness parity with ScaleStress.run: drop blocks pinned by the
      // PREVIOUS rep (cached relations, localCheckpoint RDDs) — without
      // this, reps of checkpoint-carrying queries accumulate block-
      // manager state until the heap GC-freezes (d10 at the 1000× tier
      // went 482 s → 733 s across reps from exactly this)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      // shuffle bytes metered per rep (box-independent, the SCALE.md
      // byte-column unit) — rep-stable, so rep1's cold-cache caveat
      // applies to the seconds only
      val (_, shr, shw) = org.apache.spark.graft.ShuffleMeter.measure(spark.sparkContext) {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      }
      println(f"ONEQUERY $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"shr=${shr / 1e6}%.1f MB shw=${shw / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
