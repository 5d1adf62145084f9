package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

/** Driver-side sequential read of a TINY parquet directory — the model
  * stores (ANN centroids/codebooks, classifier weights, BPE merge
  * tables, LM grams): KB-scale, written `coalesce(1)`, read back whole
  * into driver arrays on every serve/append/maintain path.
  *
  * Reading them through `spark.read.parquet(...).collect()` pays a full
  * plan → optimize → schedule → task → collect round trip PER read —
  * measured at ~100-200 ms of almost pure driver overhead for a 1-task
  * job over a few KB (the per-ACTION floor; guide §1.2/§5: driver work,
  * not task work, dominates metadata-weight reads). A composed
  * maintenance window reads models several times, so those round trips
  * were a visible slice of its wall cost — and on a real cluster each
  * is a scheduler round trip. This helper reads the same bytes with the
  * parquet-hadoop reader directly on the driver: listing + footer + one
  * sequential scan, no Spark job at all.
  *
  * NOT a cache: every call re-lists and re-reads the files (a model
  * re-published mid-session is picked up exactly as the job-based read
  * would). Only for bounded stores — callers hold the result in memory
  * anyway, so anything safe to `.collect()` is safe here.
  */
object DriverParquet {

  /** All rows of every non-empty `part-*` file under `dir`, eagerly
    * materialized (files are bounded by the caller's contract). Files
    * are read in name order — the same order Spark's scan would list
    * them — for callers that care about row order within a
    * `coalesce(1)` store.
    */
  def rows(conf: Configuration, dir: String): Seq[Group] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    val parts = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-") && f.getLen > 0)
      .sortBy(_.getPath.getName)
    val out = Seq.newBuilder[Group]
    parts.foreach { st =>
      val reader: ParquetReader[Group] =
        ParquetReader.builder(new GroupReadSupport(), st.getPath).withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) { out += g; g = reader.read() }
      } finally reader.close()
    }
    out.result()
  }

  /** A `array<double>` field of a row (Spark's standard 3-level list
    * encoding: field → repeated `list` → `element`).
    */
  def doubleArray(g: Group, field: String): Array[Double] = {
    val lst = g.getGroup(field, 0)
    val n = lst.getFieldRepetitionCount(0)
    Array.tabulate(n)(i => lst.getGroup(0, i).getDouble(0, 0))
  }

  def int(g: Group, field: String): Int = g.getInteger(field, 0)
  def long(g: Group, field: String): Long = g.getLong(field, 0)
  def double(g: Group, field: String): Double = g.getDouble(field, 0)
  def string(g: Group, field: String): String = g.getString(field, 0)
}
