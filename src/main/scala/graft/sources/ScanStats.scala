package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project, SubqueryAlias, Union}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import scala.jdk.CollectionConverters._
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
  def exactRowCountNoJob(df: DataFrame): Option[Long] =
    exactRowCountNoJobOrReason(df).toOption

  /** Like [[exactRowCountNoJob]] but Left carries WHY the count is not
    * derivable, so callers can distinguish "plan shape not derivable"
    * from "footer read failed" in their error messages.
    */
  def exactRowCountNoJobOrReason(df: DataFrame): Either[String, Long] = {
    val plan = df.queryExecution.optimizedPlan
    // Catalyst stats rowCount is EXACT only on a bare leaf relation (an
    // ANALYZE'd table). Under spark.sql.cbo.enabled it is also populated
    // on Filter/Join/Aggregate nodes as an ESTIMATE — trusting it there
    // would silently undersize callers (e.g. LSH bucket bits) and
    // reintroduce the quadratic candidate blowup this gate prevents.
    val leafExact = plan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode =>
        plan.stats.rowCount.map(_.toLong)
      case _ => None
    }
    leafExact.map(Right(_)).getOrElse(structuralCount(plan, df))
  }

  private def structuralCount(plan: LogicalPlan, df: DataFrame): Either[String, Long] = plan match {
    case p: Project       => structuralCount(p.child, df)
    case s: SubqueryAlias => structuralCount(s.child, df)
    case u: Union =>
      u.children.foldLeft(Right(0L): Either[String, Long]) { (acc, c) =>
        acc.flatMap(sum => structuralCount(c, df).map(_ + sum))
      }
    case l: LocalRelation => Right(l.data.length.toLong)
    case r: LogicalRelation =>
      r.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          parquetRowCount(fs, df)
        case other => Left(s"non-parquet source ${other.getClass.getSimpleName}")
      }
    case other => Left(s"plan node ${other.nodeName} is not metadata-countable " +
      "(filters/joins/aggregates change cardinality)")
  }

  /** MAX of a top-level BIGINT column from parquet footer statistics
    * alone — no Spark job. Same derivability contract as
    * [[exactRowCountNoJob]]: the plan must be a bare parquet scan
    * (Project/SubqueryAlias allowed — a projection never changes a
    * column's max), EVERY row group must carry non-empty statistics for
    * the column, and the column must be INT64. Returns None otherwise —
    * callers fall back to the aggregate job. At warehouse scale this
    * turns "what is the current high id" (batch splitting, surrogate
    * continuation) from a full column scan into a footer read — the
    * min/max-pruning machinery queried directly (guide §6).
    */
  def maxLongNoJob(df: DataFrame, colName: String): Option[Long] = {
    // Resolve the REQUESTED column down to its PHYSICAL source column:
    // a Project may rename (select(col("x").as("doc_id"))), and looking
    // the output name up in the footer directly would read the wrong
    // column's stats whenever the file also holds a physical column of
    // that name (the r21 verdict's latent-hazard finding). Follow alias
    // chains through each Project — a bare attribute or a simple
    // attribute alias maps to the child's name; anything computed, and
    // any ambiguity (duplicate output names), declines to the aggregate
    // fallback (the exactRowCountNoJob conservatism).
    def resolve(plan: LogicalPlan, name: String): Option[(HadoopFsRelation, String)] =
      plan match {
        case p: Project =>
          p.projectList.filter(_.name == name) match {
            case Seq(a: org.apache.spark.sql.catalyst.expressions.AttributeReference) =>
              resolve(p.child, a.name)
            case Seq(al: org.apache.spark.sql.catalyst.expressions.Alias) =>
              al.child match {
                case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
                  resolve(p.child, ar.name)
                case _ => None // computed column — footer stats cannot answer it
              }
            case _ => None // absent or ambiguous in this projection
          }
        case s: SubqueryAlias => resolve(s.child, name)
        case r: LogicalRelation =>
          r.relation match {
            case fs: HadoopFsRelation
                if fs.fileFormat.isInstanceOf[ParquetFileFormat] &&
                  r.output.count(_.name == name) == 1 => Some((fs, name))
            case _ => None
          }
        case _ => None
      }
    resolve(df.queryExecution.optimizedPlan, colName).flatMap { case (fs, physName) =>
      val colName = physName // shadow: everything below reads the PHYSICAL column
      val files = fs.location.inputFiles
      if (files.isEmpty || files.length > MaxFooterReads) return None
      val conf = df.sparkSession.sessionState.newHadoopConf()
      try {
        var mx = Long.MinValue
        var any = false
        files.foreach { f =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
          try {
            val footer = reader.getFooter
            val schema = footer.getFileMetaData.getSchema
            val idx = schema.getFields.asScala.indexWhere(_.getName == colName)
            if (idx < 0) return None
            val field = schema.getFields.get(idx)
            if (field.isPrimitive &&
                field.asPrimitiveType().getPrimitiveTypeName !=
                  org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
              return None
            footer.getBlocks.asScala.foreach { b =>
              if (b.getRowCount > 0) {
                val col = b.getColumns.asScala
                  .find(_.getPath.toDotString == colName).getOrElse(return None)
                val st = col.getStatistics
                if (st == null || st.isEmpty || !st.hasNonNullValue) return None
                st.genericGetMax match {
                  case l: java.lang.Long => if (l > mx) { mx = l; any = true }
                  case _ => return None
                }
              }
            }
          } finally reader.close()
        }
        if (any) Some(mx) else None
      } catch { case NonFatal(_) => None }
    }
  }

  private def parquetRowCount(fs: HadoopFsRelation, df: DataFrame): Either[String, Long] = {
    val files = fs.location.inputFiles
    if (files.isEmpty) return Right(0L)
    if (files.length > MaxFooterReads)
      return Left(s"${files.length} parquet files exceeds the $MaxFooterReads driver-side " +
        "footer-read cap")
    val conf = df.sparkSession.sessionState.newHadoopConf()
    try {
      Right(files.iterator.map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        try reader.getRecordCount
        finally reader.close()
      }.sum)
    } catch {
      // An IO failure here is an infrastructure error, not a plan-shape
      // problem — say so instead of letting callers misdiagnose.
      case NonFatal(e) => Left(s"parquet footer read failed: ${e.getClass.getName}: ${e.getMessage}")
    }
  }
}
