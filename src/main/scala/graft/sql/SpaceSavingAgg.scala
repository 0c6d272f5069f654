package graft.sql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftInterop.AbsType
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** SpaceSaving summary (Metwally, Agrawal, El Abbadi 2005): at most
  * `capacity` (item, count, error) counters whatever the stream length or
  * cardinality. A counted item's true frequency f satisfies
  * `est - err <= f <= est`, and any item with f > N/capacity is guaranteed
  * to be present — the frequent-items contract that makes a bounded sketch
  * usable as a heavy-hitter report at corpus scale.
  *
  * The count-indexed bucket structure (TreeMap count -> keys) keeps both
  * the increment and the evict-min paths O(log capacity) — the naive
  * scan-for-min variant is O(capacity) per eviction, which a
  * high-cardinality stream hits on almost every row.
  *
  * Merging follows the mergeable-summaries construction (Agarwal et al.,
  * PODS 2012): shared items add counts and errors; a new item entering a
  * full summary evicts the current minimum m and enters at (c + m, e + m).
  * Counts stay upper bounds and the error certificate stays valid through
  * any merge tree, so partial aggregation (map-side combine) is sound.
  * When `capacity` >= the true distinct count no eviction ever fires and
  * every count is exact with error 0.
  */
final class SpaceSavingSummary(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  val errors: mutable.HashMap[String, Long] = mutable.HashMap.empty
  // count -> insertion-ordered keys at that count (the eviction index)
  val buckets: java.util.TreeMap[Long, mutable.LinkedHashSet[String]] =
    new java.util.TreeMap[Long, mutable.LinkedHashSet[String]]()

  private def bucketRemove(count: Long, key: String): Unit = {
    val set = buckets.get(count)
    set.remove(key)
    if (set.isEmpty) buckets.remove(count)
  }

  private def bucketAdd(count: Long, key: String): Unit = {
    var set = buckets.get(count)
    if (set == null) { set = mutable.LinkedHashSet.empty; buckets.put(count, set) }
    set.add(key)
  }

  /** Observe `item` with weight `w` (w = its count in a merged-in summary). */
  def add(item: String, w: Long, err: Long = 0L): Unit = {
    counts.get(item) match {
      case Some(c) =>
        bucketRemove(c, item)
        counts(item) = c + w
        if (err != 0) errors(item) = errors.getOrElse(item, 0L) + err
        bucketAdd(c + w, item)
      case None if counts.size < capacity =>
        counts(item) = w
        if (err != 0) errors(item) = err
        bucketAdd(w, item)
      case None =>
        // evict the minimum counter; the newcomer inherits its count as error
        val minEntry = buckets.firstEntry()
        val m = minEntry.getKey
        val victim = minEntry.getValue.head
        bucketRemove(m, victim)
        counts.remove(victim)
        errors.remove(victim)
        counts(item) = m + w
        errors(item) = m + err
        bucketAdd(m + w, item)
    }
  }

  def merge(o: SpaceSavingSummary): Unit =
    o.counts.foreach { case (k, c) => add(k, c, o.errors.getOrElse(k, 0L)) }

  /** Counters sorted best-first: count desc, ties by item asc (a total,
    * deterministic order so downstream top-k slicing is reproducible).
    */
  def sorted: Array[(String, Long, Long)] =
    counts.iterator
      .map { case (k, c) => (k, c, errors.getOrElse(k, 0L)) }
      .toArray
      .sortBy { case (k, c, _) => (-c, k) }
}

/** Heavy-hitter aggregate over a string column: O(capacity) state per
  * group however large the group, partial aggregation composes, and only
  * summaries — never the item stream — cross the shuffle. The bounded
  * answer to "top tokens / URLs / n-grams per key" at 100 TB, where an
  * exact groupBy-count would shuffle the full item universe.
  *
  * Returns `array<struct<item, est, err>>` sorted count-desc (ties item
  * asc); `est - err <= true count <= est`, and err = 0 everywhere when the
  * group's distinct-item count never exceeded `capacity`.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(capacity > 0, s"capacity must be positive: $capacity")

  override def inputTypes: Seq[AbsType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType),
    StructField("err", LongType))))
  override def prettyName: String = "gr_heavy_hitters"

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(buf: SpaceSavingSummary, input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: SpaceSavingSummary, other: SpaceSavingSummary): SpaceSavingSummary = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingSummary): Any = {
    val s = buf.sorted
    val out = new Array[Any](s.length)
    var i = 0
    while (i < s.length) {
      out(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(s(i)._1), s(i)._2, s(i)._3))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: SpaceSavingSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val s = buf.sorted
    out.writeInt(s.length)
    s.foreach { case (k, c, e) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val k = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong()
      val e = in.readLong()
      buf.add(k, c, e)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): SpaceSavingAgg =
    copy(child = c)
}
