package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

/** Spark-native SQL surface for [[LakeTable]] snapshots:
  *
  * {{{
  *   spark.read.format("graft-lake").load(root)
  *   spark.read.format("graft-lake").option("versionAsOf", 3).load(root)
  *   CREATE TEMPORARY VIEW t USING `graft-lake` OPTIONS (path '<root>')
  * }}}
  *
  * Implemented the way Delta/Iceberg expose their V1 read path: a
  * [[HadoopFsRelation]] over a custom [[FileIndex]], NOT a row-producing
  * custom reader. Spark's own FileSourceStrategy plans the scan, so the
  * vectorized parquet reader, whole-stage codegen, column pruning and
  * parquet predicate pushdown (row-group stats/dictionary/bloom) all
  * apply unchanged; the lake's contribution is [[LakeFileIndex]], which
  * answers `listFiles(dataFilters)` from manifest metadata — snapshot
  * isolation (only committed files are listed) plus StatsPruner
  * file skipping driven by the SAME catalyst predicates the scan
  * pushes down. At 10^10 rows the planner never touches the
  * filesystem: one manifest read + in-memory stats evaluation replaces
  * directory listing, and a time-windowed query plans only the files
  * whose range overlaps.
  *
  * The relation serves the READ-OPTIMIZED layout (every bucket
  * compacted): merge-on-read reconstruction is a shuffle+aggregate
  * plan, which a file scan cannot express, so a snapshot with
  * outstanding deltas is rejected with the remediation
  * (`compact()` — or `LakeTable.read`, which plans the
  * reconstruction). This mirrors Hive/Hudi's read-optimized vs
  * real-time view split.
  */
class LakeDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    def opt(name: String): Option[String] =
      parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    val root = opt("path").getOrElse(
      sys.error("graft-lake: 'path' option is required (the table root)"))
    val spark = ctx.sparkSession
    val table = new LakeTable(spark, root)
    val version = opt("versionAsOf").map(_.toInt)
    val index = new LakeFileIndex(spark, table, version)
    HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = index.schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
  }
}

/** Manifest-backed [[FileIndex]]: lists a committed snapshot's data
  * files (never the filesystem — orphans from failed commits are
  * invisible by construction) and prunes them against the scan's
  * pushed-down data filters via [[StatsPruner]]. */
class LakeFileIndex(spark: SparkSession, table: LakeTable,
    version: Option[Int]) extends FileIndex {

  private val snap = version.map(table.snapshot).orElse(table.currentSnapshot)
    .getOrElse(sys.error(s"graft-lake: no table at ${table.root}"))
  require(!snap.files.exists(_.delta),
    s"graft-lake: v${snap.version} at ${table.root} has outstanding " +
      "merge-on-read deltas; the SQL relation serves the read-optimized " +
      "layout — run LakeTable.compact() first, or read the real-time view " +
      "via LakeTable.read()")

  def schema: StructType = snap.schema

  /** FileStatus per data file, resolved once at index construction (the
    * planner may call listFiles repeatedly). */
  private val statuses: Map[String, FileStatus] = {
    val fs = new Path(table.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    snap.files.map(f => f.path -> fs.getFileStatus(new Path(table.root, f.path))).toMap
  }

  override def rootPaths: Seq[Path] = Seq(new Path(table.root))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = dataFilters.reduceOption(And) match {
      case None => snap.files
      case Some(pred) =>
        val (base, mor, total) = table.pruneForPredicate(snap, pred)
        val k = base ++ mor // mor is empty: delta-free by construction
        System.err.println(s"[lake-sql] kept=${k.size}/$total files")
        k
    }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(f => statuses(f.path)).toArray))
  }

  override def inputFiles: Array[String] =
    snap.files.map(f => s"${table.root}/${f.path}").toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.values.map(_.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)
}
