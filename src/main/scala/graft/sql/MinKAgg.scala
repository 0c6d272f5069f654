package graft.sql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftInterop.AbsType

import scala.collection.mutable

/** Bounded buffer for [[MinKSigAgg]]: keeps the `k` lowest-id (id,
  * signature) rows seen so far, sorted ascending by id. Insertion is
  * binary-search + shift, so the buffer NEVER exceeds k entries — a
  * mass-duplicate LSH bucket costs O(k) state, not O(bucket).
  */
final class MinKBuffer(val k: Int) {
  val ids: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty
  val sigs: mutable.ArrayBuffer[Array[Long]] = mutable.ArrayBuffer.empty

  def add(id: Long, sig: Array[Long]): Unit = {
    if (ids.length >= k && id >= ids.last) return
    var lo = 0
    var hi = ids.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ids(mid) < id) lo = mid + 1 else hi = mid
    }
    // ignore duplicate ids (at-least-once upstream retries)
    if (lo < ids.length && ids(lo) == id) return
    ids.insert(lo, id)
    sigs.insert(lo, sig)
    if (ids.length > k) { ids.remove(ids.length - 1); sigs.remove(sigs.length - 1) }
  }

  def merge(o: MinKBuffer): Unit = {
    var i = 0
    while (i < o.ids.length) { add(o.ids(i), o.sigs(i)); i += 1 }
  }
}

/** Collects the `k` lowest-id (id, minhash-signature) rows of a group —
  * the bounded representative set for LSH bucket chaining. Unlike
  * `collect_list`, the aggregation buffer is capped at k entries however
  * large the group is, and partial aggregation (map-side combine) composes
  * through [[MinKBuffer.merge]]. Used as a RUNNING window aggregate
  * (unboundedPreceding..currentRow ordered by id) it yields, per row, the
  * first-k representatives of the row's bucket prefix — Spark's
  * UnboundedPreceding frame updates the buffer incrementally, one add per
  * row.
  */
case class MinKSigAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] with BinaryLike[Expression]
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbsType] = Seq(LongType, ArrayType(LongType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_id", LongType), StructField("_sig", ArrayType(LongType)))))
  override def prettyName: String = "gr_min_k_sigs"

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val id = left.eval(input)
    val sig = right.eval(input)
    if (id != null && sig != null)
      buf.add(id.asInstanceOf[Long], sig.asInstanceOf[ArrayData].toLongArray())
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MinKBuffer): Any = {
    val out = new Array[Any](buf.ids.length)
    var i = 0
    while (i < buf.ids.length) {
      out(i) = new GenericInternalRow(Array[Any](buf.ids(i),
        new GenericArrayData(buf.sigs(i).map(Long.box(_): Any))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MinKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.ids.length)
    var i = 0
    while (i < buf.ids.length) {
      out.writeLong(buf.ids(i))
      out.writeInt(buf.sigs(i).length)
      buf.sigs(i).foreach(out.writeLong)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val id = in.readLong()
      val m = in.readInt()
      val sig = new Array[Long](m)
      var j = 0
      while (j < m) { sig(j) = in.readLong(); j += 1 }
      buf.add(id, sig)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): MinKSigAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinKSigAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinKSigAgg =
    copy(left = newLeft, right = newRight)
}

/** Buffer for [[ChainPairsAgg]]: the bounded representative set plus the
  * most recent row of the running frame (the "current row" a window's
  * UnboundedPreceding..currentRow frame just added).
  */
final class ChainBuffer(k: Int) {
  val reps = new MinKBuffer(k)
  var lastId: Long = 0L
  var lastSk: Array[Long] = null
  var band: Int = 0
}

/** FUSED running-window form of gr_minKSigs + gr_chainPairs (r18
  * optimization): per row of an (ordered-by-id) LSH bucket, emit the
  * verified pairs of THAT row against the bucket prefix's k lowest-id
  * representatives directly, without materializing the representative
  * array per row. The unfused pipeline's window agg rebuilt, for EVERY
  * row, an array of up to k structs each holding a boxed copy of an
  * 80-long packed signature (k=128: ~10k boxed longs per row), which the
  * chain kernel then immediately unboxed — the dominant cost of
  * minhashLsh at dup-heavy corpora. Semantics are identical by
  * construction: the frame's last update IS the current row, reps are
  * the same MinKBuffer, and the pair rule is the same
  * [[TextKernel.chainPairs]] logic over the same inputs.
  *
  * WINDOW-ONLY aggregate: the running frame never merges partials, and
  * `eval` is only meaningful after at least one `update` (merge throws —
  * any future groupBy caller fails loudly rather than silently pairing
  * against a wrong "last row").
  */
case class ChainPairsAgg(
    idExpr: Expression,
    skExpr: Expression,
    bandExpr: Expression,
    k: Int,
    bands: Int,
    threshold: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ChainBuffer]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression]
  with ExpectsInputTypes {

  override def first: Expression = idExpr
  override def second: Expression = skExpr
  override def third: Expression = bandExpr
  override def inputTypes: Seq[AbsType] =
    Seq(LongType, ArrayType(LongType), IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("est_jaccard", DoubleType))))
  override def prettyName: String = "gr_chain_pairs_win"

  override def createAggregationBuffer(): ChainBuffer = new ChainBuffer(k)

  override def update(buf: ChainBuffer, input: InternalRow): ChainBuffer = {
    val id = idExpr.eval(input)
    val sk = skExpr.eval(input)
    val band = bandExpr.eval(input)
    if (id != null && sk != null && band != null) {
      buf.lastId = id.asInstanceOf[Long]
      buf.lastSk = sk.asInstanceOf[ArrayData].toLongArray()
      buf.band = band.asInstanceOf[Int]
      buf.reps.add(buf.lastId, buf.lastSk)
    }
    buf
  }

  override def merge(buf: ChainBuffer, other: ChainBuffer): ChainBuffer =
    throw new UnsupportedOperationException(
      "gr_chain_pairs_win is a running-window aggregate; partial-merge " +
        "(groupBy) execution would lose the current-row identity")

  override def eval(buf: ChainBuffer): Any = {
    if (buf.lastSk == null) return new GenericArrayData(Array.empty[Any])
    val ids = buf.reps.ids
    val sigs = buf.reps.sigs
    val myPacked = buf.lastSk
    val id = buf.lastId
    val n = myPacked.length - bands
    val out = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < ids.length && ids(i) < id) {
      val packed = sigs(i)
      var mb = 0
      while (mb < bands && packed(n + mb) != myPacked(n + mb)) mb += 1
      if (mb == buf.band) {
        var same = 0
        var kk = 0
        while (kk < n) { if (packed(kk) == myPacked(kk)) same += 1; kk += 1 }
        val est = same.toDouble / n
        if (est >= threshold)
          out += new GenericInternalRow(Array[Any](ids(i), id, est))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: ChainBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.lastId)
    out.writeInt(buf.band)
    out.writeBoolean(buf.lastSk != null)
    if (buf.lastSk != null) {
      out.writeInt(buf.lastSk.length)
      buf.lastSk.foreach(out.writeLong)
    }
    out.writeInt(buf.reps.ids.length)
    var i = 0
    while (i < buf.reps.ids.length) {
      out.writeLong(buf.reps.ids(i))
      out.writeInt(buf.reps.sigs(i).length)
      buf.reps.sigs(i).foreach(out.writeLong)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ChainBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.lastId = in.readLong()
    buf.band = in.readInt()
    if (in.readBoolean()) {
      val m = in.readInt()
      val sk = new Array[Long](m)
      var j = 0
      while (j < m) { sk(j) = in.readLong(); j += 1 }
      buf.lastSk = sk
    }
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val id = in.readLong()
      val m = in.readInt()
      val sig = new Array[Long](m)
      var j = 0
      while (j < m) { sig(j) = in.readLong(); j += 1 }
      buf.reps.add(id, sig)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): ChainPairsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ChainPairsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ChainPairsAgg =
    copy(idExpr = newFirst, skExpr = newSecond, bandExpr = newThird)
}

/** Bounded buffer for [[TopKByScoreAgg]]: the k highest-score (score, id)
  * rows seen so far, sorted score-descending with id-ascending tie order.
  * Insertion is binary-search + shift — O(k) state however large the
  * group, the property that makes per-query top-k a safe STREAMING
  * aggregate (state per query key is k entries, not candidate count).
  */
final class TopKBuffer(val k: Int) {
  val scores: mutable.ArrayBuffer[Double] = mutable.ArrayBuffer.empty
  val ids: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty

  def add(score: Double, id: Long): Unit = {
    // a NaN score would pass both the rejection test and every binary-
    // search comparison (all false) and squat at rank 1 forever — one NaN
    // embedding would displace a real top-1 for its whole bucket. Skip it.
    if (score.isNaN) return
    if (ids.length >= k) {
      val ws = scores.last; val wi = ids.last
      if (score < ws || (score == ws && id >= wi)) return
    }
    var lo = 0
    var hi = ids.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val ranksBefore = scores(mid) > score ||
        (scores(mid) == score && ids(mid) < id)
      if (ranksBefore) lo = mid + 1 else hi = mid
    }
    // ignore exact duplicates (at-least-once upstream replays)
    if (lo < ids.length && ids(lo) == id && scores(lo) == score) return
    scores.insert(lo, score)
    ids.insert(lo, id)
    if (ids.length > k) { ids.remove(ids.length - 1); scores.remove(scores.length - 1) }
  }

  def merge(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.ids.length) { add(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Top-k rows of a group by score (ties by lower id), as
  * `array<struct<neighbor_id, score>>` ordered best-first. The bounded
  * (O(k)) alternative to `collect_list` + sort + slice: partial
  * aggregation composes through [[TopKBuffer.merge]], and as a streaming
  * update-mode aggregate the per-key state is k entries — the aggregation
  * shape of streaming ANN ([[graft.ops.Similarity.streamingAnnTopK]]).
  */
case class TopKByScoreAgg(
    left: Expression,  // score
    right: Expression, // id
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression]
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbsType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType), StructField("score", DoubleType))))
  override def prettyName: String = "gr_top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buf.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.ids.length)
    var i = 0
    while (i < buf.ids.length) {
      out(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.ids.length)
    var i = 0
    while (i < buf.ids.length) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScoreAgg =
    copy(left = newLeft, right = newRight)
}
