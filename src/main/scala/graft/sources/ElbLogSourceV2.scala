package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for (gzip) access-log files: the custom-SOURCE
  * rung of the extension ladder, below expressions and above
  * mapPartitions. `spark.read.format("elb-log").load(glob)` yields
  * `(value string, log_source_file string)` — the same contract the
  * text-reader path feeds [[graft.operators.ElbParser.parse]], with the
  * reference's per-file lineage column (elb_logs.py tags each frame
  * with its S3 key) built into the source instead of bolted on.
  *
  * Scale design:
  *   - one InputPartition per FILE — gzip is stream-compressed and
  *     non-splittable, so per-file is the correct (and maximal)
  *     parallelism; at 100 TB keep individual objects ~1 GB (same note
  *     as SCALE.md's ingest section).
  *   - column pruning is pushed into the reader
  *     (SupportsPushDownRequiredColumns): `select(value)` plans a scan
  *     that never materializes the file-name column and vice versa —
  *     visible in the scan's `readSchema`.
  *   - the driver's Hadoop conf ships to executors
  *     (GraftBridge.serializableConf), so s3a/hdfs credentials and
  *     tuning apply on the reader side exactly as Spark's built-in
  *     file sources do.
  */
class ElbLogSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "elb-log"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ElbLogSourceV2.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "elb-log source needs a path")
    new ElbLogTable(path)
  }
}

object ElbLogSourceV2 {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("log_source_file", StringType, nullable = false)))
}

private[sources] class ElbLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"elb_log($path)"
  override def schema(): StructType = ElbLogSourceV2.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ElbLogScanBuilder(path)
}

private[sources] class ElbLogScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = ElbLogSourceV2.Schema
  private var fileFilters: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark hands back a subset of our schema (possibly empty for
    // count(*) — the reader then just ticks rows).
    required = requiredSchema
  }

  /** PARTITION pruning: predicates on the lineage column eliminate
    * whole FILES before any partition is planned — the DSv2 analogue
    * of Hive-partition pruning ("reprocess one S3 object" never lists,
    * opens, or schedules the rest). Accepted filters are still
    * re-applied by Spark above the scan (we return them as residuals),
    * so partial support is always correct.
    */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    fileFilters = filters.filter(ElbLogScan.prunable)
    filters // all residual: Spark re-checks above the scan
  }
  override def pushedFilters(): Array[sources.Filter] = fileFilters

  override def build(): Scan = new ElbLogScan(path, required, fileFilters)
}

private[sources] object ElbLogScan {
  /** File-prunable predicate shapes over the lineage column. */
  def prunable(f: sources.Filter): Boolean = f match {
    case sources.EqualTo("log_source_file", _: String) => true
    case sources.StringEndsWith("log_source_file", _) => true
    case sources.StringContains("log_source_file", _) => true
    case sources.In("log_source_file", vs) => vs.forall(_.isInstanceOf[String])
    case _ => false
  }

  def keeps(f: sources.Filter, file: String): Boolean = f match {
    case sources.EqualTo("log_source_file", v: String) => file == v
    case sources.StringEndsWith("log_source_file", s) => file.endsWith(s)
    case sources.StringContains("log_source_file", s) => file.contains(s)
    case sources.In("log_source_file", vs) => vs.contains(file)
    case _ => true
  }
}

private[sources] class ElbLogScan(
    path: String,
    required: StructType,
    fileFilters: Array[sources.Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val statuses = Option(fs.globStatus(p)) match {
      case Some(matches) if matches.nonEmpty =>
        matches.flatMap { st =>
          if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
          else Array(st)
        }
      case _ => Array.empty[org.apache.hadoop.fs.FileStatus]
    }
    statuses.filterNot(st => isHiddenFile(st.getPath.getName))
      .map(_.getPath.toString)
      .filter(f => fileFilters.forall(ElbLogScan.keeps(_, f)))
      .sorted
      .map(f => ElbLogPartition(f): InputPartition)
  }

  private def isHiddenFile(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val wrapped = GraftBridge.serializableConf(
      spark.sparkContext.hadoopConfiguration)
    // field names in the REQUIRED order — the reader emits exactly this
    // projection, whatever order Spark asked for
    new ElbLogReaderFactory(wrapped, required.fieldNames)
  }
}

private[sources] case class ElbLogPartition(file: String) extends InputPartition

private[sources] class ElbLogReaderFactory(
    conf: java.io.Serializable, fields: Array[String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ElbLogPartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val fs = p.getFileSystem(GraftBridge.confOf(conf))
      private val raw = fs.open(p)
      private val reader = new BufferedReader(new InputStreamReader(
        if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw,
        StandardCharsets.UTF_8))
      private val fileName = UTF8String.fromString(file)
      private var line: String = _

      override def next(): Boolean = {
        line = reader.readLine()
        line != null
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toIndexedSeq.map {
          case "value" => UTF8String.fromString(line)
          case "log_source_file" => fileName
        })

      override def close(): Unit = reader.close()
    }
  }
}
