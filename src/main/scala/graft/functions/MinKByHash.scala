package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer for a DETERMINISTIC bottom-k-by-hash sample: the k
  * (hash, value) pairs smallest under (h, v) lexicographic order, plus
  * the total number of observed values. A size-k binary MAX-heap over
  * two primitive arrays (no boxing — the round-11 flat-kernel rule):
  * offer is O(log k) against the current worst kept pair.
  *
  * Determinism: the "randomness" is the caller's hash column (md5-prefix
  * of a unique row id — the engine-portable 32-bit hash parity trick),
  * so the kept MULTISET is a pure function of the data; hash ties break
  * by value, and duplicate (h, v) pairs are kept as a multiset, so any
  * tie resolution yields the same multiset. Bottom-k is a SEMILATTICE
  * (merge = offer everything, keep k smallest): sketch(A ∪ B) ==
  * merge(sketch(A), sketch(B)) exactly, which is what makes the sketch
  * a storable per-shard column mergeable at read time.
  */
final class MinKHeap(val k: Int) extends Serializable {
  var totalN: Long = 0L
  var size: Int = 0
  val hs = new Array[Long](k)
  val vs = new Array[Double](k)

  // (h1,v1) < (h2,v2) lexicographically
  @inline private def lt(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    h1 < h2 || (h1 == h2 && java.lang.Double.compare(v1, v2) < 0)

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && lt(hs(m), vs(m), hs(l), vs(l))) m = l
      if (r < size && lt(hs(m), vs(m), hs(r), vs(r))) m = r
      if (m == i) return
      val th = hs(i); val tv = vs(i)
      hs(i) = hs(m); vs(i) = vs(m); hs(m) = th; vs(m) = tv
      i = m
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (lt(hs(p), vs(p), hs(i), vs(i))) {
        val th = hs(i); val tv = vs(i)
        hs(i) = hs(p); vs(i) = vs(p); hs(p) = th; vs(p) = tv
        i = p
      } else return
    }
  }

  /** Observe one (h, v); counts toward totalN, kept iff among k smallest. */
  def offer(h: Long, v: Double): Unit = {
    totalN += 1L
    offerPair(h, v)
  }

  /** Offer a pair WITHOUT counting (merge path adds counts separately). */
  def offerPair(h: Long, v: Double): Unit = {
    if (size < k) {
      hs(size) = h; vs(size) = v; size += 1
      siftUp(size - 1)
    } else if (lt(h, v, hs(0), vs(0))) {
      hs(0) = h; vs(0) = v
      siftDown(0)
    }
  }

  /** Kept pairs sorted ascending by (h, v) — the canonical serialized and
    * output order (heap order is layout-dependent; output must not be). */
  def sortedPairs(): (Array[Long], Array[Double]) = {
    val idx = Array.range(0, size).sortWith { (a, b) =>
      lt(hs(a), vs(a), hs(b), vs(b))
    }
    (idx.map(hs), idx.map(vs))
  }
}

/** Aggregate `min_k_by_hash(h, v, k)`: per group, the total value count
  * and the k (h, v) pairs smallest under (h, v) — i.e. a deterministic
  * uniform-by-hash bottom-k sample of the group's values (Cohen &
  * Kaplan's bottom-k sketch), as one bounded-state hash aggregate.
  * Output: STRUCT<n BIGINT, hs ARRAY<BIGINT>, vs ARRAY<DOUBLE>> with the
  * pairs in ascending (h, v) order. NULL values (or NULL hashes) are
  * ignored, matching `percentile`'s null handling. State is EXACTLY k
  * pairs + one counter per group however many rows stream through —
  * the storable/mergeable twin of the exact-quantile machinery. */
case class MinKByHash(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKHeap] with BinaryLike[Expression] {
  require(k >= 1 && k <= (1 << 20), s"k out of [1, 2^20]: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"min_k_by_hash requires (bigint, double), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = MinKByHash.outType
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_by_hash"

  override def createAggregationBuffer(): MinKHeap = new MinKHeap(k)

  override def update(b: MinKHeap, input: InternalRow): MinKHeap = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      b.offer(h.asInstanceOf[Long], v.asInstanceOf[Double])
    b
  }

  override def merge(b: MinKHeap, o: MinKHeap): MinKHeap = {
    b.totalN += o.totalN
    var i = 0
    while (i < o.size) { b.offerPair(o.hs(i), o.vs(i)); i += 1 }
    b
  }

  override def eval(b: MinKHeap): Any = {
    val (hs, vs) = b.sortedPairs()
    InternalRow(b.totalN, new GenericArrayData(hs), new GenericArrayData(vs))
  }

  override def serialize(b: MinKHeap): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + 16 * b.size)
    buf.putLong(b.totalN).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putLong(b.hs(i)).putDouble(b.vs(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new MinKHeap(k)
    b.totalN = buf.getLong()
    val n = buf.getInt()
    var i = 0
    while (i < n) { b.offerPair(buf.getLong(), buf.getDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKByHash =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKByHash =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinKByHash =
    copy(left = newLeft, right = newRight)
}

object MinKByHash {
  val outType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("vs", ArrayType(DoubleType, containsNull = false), nullable = false)))
}

/** Aggregate `min_k_merge(sketch, k)`: union of STORED bottom-k sketches
  * (the read-time half of the per-shard sketch column): counts add, pairs
  * re-compete for the k smallest. Because bottom-k is a semilattice,
  * merging per-shard sketches equals sketching the concatenated shards
  * EXACTLY (spec-pinned) — the property that makes the column safe to
  * persist in shard manifests and fold at any grouping. */
case class MinKMerge(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKHeap]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(k >= 1 && k <= (1 << 20), s"k out of [1, 2^20]: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // nullability-insensitive: a parquet/sink round-trip relaxes struct
    // fields and array elements to nullable
    case s: StructType if s.length == 3 &&
        s(0).dataType == LongType &&
        (s(1).dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
        (s(2).dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_k_merge requires struct<n bigint, hs array<bigint>, vs array<double>>, got ${other.sql}")
  }

  override def dataType: DataType = MinKByHash.outType
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_merge"

  override def createAggregationBuffer(): MinKHeap = new MinKHeap(k)

  override def update(b: MinKHeap, input: InternalRow): MinKHeap = {
    val s = child.eval(input)
    if (s != null) {
      val row = s.asInstanceOf[InternalRow]
      b.totalN += row.getLong(0)
      val hs = row.getArray(1)
      val vs = row.getArray(2)
      var i = 0
      val n = hs.numElements()
      while (i < n) { b.offerPair(hs.getLong(i), vs.getDouble(i)); i += 1 }
    }
    b
  }

  override def merge(b: MinKHeap, o: MinKHeap): MinKHeap = {
    b.totalN += o.totalN
    var i = 0
    while (i < o.size) { b.offerPair(o.hs(i), o.vs(i)); i += 1 }
    b
  }

  override def eval(b: MinKHeap): Any = {
    val (hs, vs) = b.sortedPairs()
    InternalRow(b.totalN, new GenericArrayData(hs), new GenericArrayData(vs))
  }

  override def serialize(b: MinKHeap): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + 16 * b.size)
    buf.putLong(b.totalN).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putLong(b.hs(i)).putDouble(b.vs(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new MinKHeap(k)
    b.totalN = buf.getLong()
    val n = buf.getInt()
    var i = 0
    while (i < n) { b.offerPair(buf.getLong(), buf.getDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MinKMerge =
    copy(child = newChild)
}
