package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project, SubqueryAlias, Union}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import scala.util.control.NonFatal

/** Driver-side exact row counts with NO Spark job.
  *
  * Operators that size themselves from corpus cardinality (e.g. the
  * hyperplane-LSH bucket width in `Dedup.embeddingNearDup`) must not run
  * a hidden action at DataFrame-construction time: on a shared cluster
  * that is a surprise scan of the caller's (possibly expensive) input
  * plan. For the common shapes — a bare parquet scan, a local relation,
  * projections and unions over those — the count is already sitting in
  * metadata Spark reads at planning time anyway: parquet footers carry
  * the exact record count per file, and a LocalRelation knows its rows.
  */
object ScanStats {

  /** Parquet footers per leaf beyond this are declared "not cheap":
    * footer reads are driver-side RPCs, fine for thousands of files,
    * wrong for a 100 TB table with millions — there the caller should
    * size once and pass the knob explicitly.
    */
  private val MaxFooterReads = 16384

  /** Exact row count derived purely from plan structure + scan metadata
    * (parquet footers, local-relation sizes). Returns None when the plan
    * contains anything row-count-changing (filters, joins, aggregates)
    * or a non-parquet source — callers should then require an explicit
    * size rather than silently running a job.
    */
  def exactRowCountNoJob(df: DataFrame): Option[Long] = {
    val plan = df.queryExecution.optimizedPlan
    // CBO / ANALYZE'd tables carry an exact row count in catalyst stats
    plan.stats.rowCount.map(_.toLong).orElse(structuralCount(plan, df))
  }

  private def structuralCount(plan: LogicalPlan, df: DataFrame): Option[Long] = plan match {
    case p: Project       => structuralCount(p.child, df)
    case s: SubqueryAlias => structuralCount(s.child, df)
    case u: Union =>
      val counts = u.children.map(structuralCount(_, df))
      if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
    case l: LocalRelation => Some(l.data.length.toLong)
    case r: LogicalRelation =>
      r.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          parquetRowCount(fs, df)
        case _ => None
      }
    case _ => None
  }

  private def parquetRowCount(fs: HadoopFsRelation, df: DataFrame): Option[Long] = {
    val files = fs.location.inputFiles
    if (files.isEmpty) return Some(0L)
    if (files.length > MaxFooterReads) return None
    val conf = df.sparkSession.sessionState.newHadoopConf()
    try {
      Some(files.iterator.map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        try reader.getRecordCount
        finally reader.close()
      }.sum)
    } catch { case NonFatal(_) => None }
  }
}
