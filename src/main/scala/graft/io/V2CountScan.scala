package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.{LongType, StructType}

/** The Scan a connector substitutes when a `COUNT(*)` aggregation was
  * completely pushed down and the answer is already known from format
  * metadata (shapefile .shx file sizes, FlatGeobuf header features_count):
  * one partition, one row, ZERO feature-data reads. `SELECT count(*) FROM
  * ... USING shapefile` costs a file listing at any corpus size.
  */
private[graft] final case class V2CountScan(count: Long, source: String)
  extends Scan with Batch {
  override def readSchema(): StructType =
    new StructType().add("count", LongType, nullable = false)
  override def toBatch: Batch = this
  override def description(): String = s"$source metadata count(*) = $count"
  override def planInputPartitions(): Array[InputPartition] =
    Array(V2CountPartition(count))
  override def createReaderFactory(): PartitionReaderFactory =
    V2CountReaderFactory()
}

/** The shared COUNT(*) pushdown plumbing for the three connectors: a
  * builder mixes this in and supplies `metadataCount` (None = decline) and
  * `buildDataScan` (the ordinary scan). Pushdown is offered only for an
  * ungrouped single CountStar with no `bbox` window option — a windowed
  * read returns a subset, so its count must come from the real scan.
  */
private[graft] trait MetadataCountPushdown
  extends org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}

  protected def countOptions: java.util.Map[String, String]
  protected def metadataCount: Option[Long]
  protected def countSourceName: String
  protected def buildDataScan(): Scan

  private var countPushed = false

  private def canPushCount(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar] &&
      Option(countOptions.get("bbox")).isEmpty && metadataCount.isDefined

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canPushCount(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (canPushCount(agg)) { countPushed = true; true } else false
  }

  def buildScan(): Scan =
    if (countPushed) V2CountScan(metadataCount.get, countSourceName)
    else buildDataScan()
}

/** Shared option parsing for the DSv2 connectors (one bbox grammar, one
  * path contract — a parsing fix lands once).
  */
private[io] object V2Options {
  def pathOf(options: java.util.Map[String, String], source: String): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, s"$source: a single 'path' is required")
    p
  }
  def bboxOf(options: java.util.Map[String, String], source: String)
      : Option[(Double, Double, Double, Double)] =
    Option(options.get("bbox")).map { s =>
      val a = s.split(",").map(_.trim.toDouble)
      require(a.length == 4, s"$source: bbox needs 4 numbers, got '$s'")
      (a(0), a(1), a(2), a(3))
    }
}

private[graft] final case class V2CountPartition(count: Long) extends InputPartition

private[graft] final case class V2CountReaderFactory() extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      private val c = p.asInstanceOf[V2CountPartition].count
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = InternalRow(c)
      override def close(): Unit = ()
    }
}
