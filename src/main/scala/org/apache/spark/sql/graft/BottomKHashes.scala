// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bottom-k-by-hash aggregate — the collection step of the KMV ("k minimum
  * values") sketch, and the custom-operator ladder's AGGREGATE tier (a
  * `TypedImperativeAggregate` with partial/merge support, alongside the
  * scalar-expression tier (b) and the whole-operator tier (c) of
  * [[AsOfJoinNative]]).
  *
  * Keeps the k smallest `(hash, id)` pairs per group in a bounded max-heap:
  * update is O(log k), merge concatenates two ≤k heaps, and the state
  * serializes as 16k+4 bytes — so a deterministic per-group sample (and the
  * KMV distinct estimate derived from the k-th smallest hash) costs ONE
  * map-side-partial aggregation with constant memory per group. The
  * equivalent window formulation (`row_number() OVER (PARTITION BY g ORDER
  * BY h)` then `rk <= k`, the `source_cap` shape) must shuffle EVERY row to
  * its group's reducer and sort; this aggregate ships at most k rows per
  * group per map task. Exact same output, spec-asserted — and the driver
  * oracle IS the window formulation in DuckDB.
  *
  * Determinism: ties break on the full (hash, id) pair; duplicate pairs
  * count once (KMV needs distinct hashes; re-inserting an already-held
  * pair is a no-op). No RNG — the "sample" is the md5 order, so any
  * re-run, any partitioning, any merge order yields identical output.
  */
case class BottomKHashes(
    hash: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKHashes.State] {

  require(k > 0, s"bottom_k: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(hash, id)
  override def nullable: Boolean = false
  override def dataType: DataType = BottomKHashes.ResultType
  override def prettyName: String = "bottom_k"

  override def createAggregationBuffer(): BottomKHashes.State =
    new BottomKHashes.State(k)

  override def update(
      state: BottomKHashes.State, input: InternalRow): BottomKHashes.State = {
    val h = hash.eval(input)
    val i = id.eval(input)
    if (h != null && i != null)
      state.insert(h.asInstanceOf[Long], i.asInstanceOf[Long])
    state
  }

  override def merge(
      state: BottomKHashes.State,
      other: BottomKHashes.State): BottomKHashes.State = {
    other.foreach((h, i) => state.insert(h, i))
    state
  }

  override def eval(state: BottomKHashes.State): Any =
    new GenericArrayData(
      state.sortedPairs.map { case (h, i) => InternalRow(h, i) })

  override def serialize(state: BottomKHashes.State): Array[Byte] = {
    val pairs = state.sortedPairs
    val buf = java.nio.ByteBuffer.allocate(4 + 16 * pairs.length)
    buf.putInt(pairs.length)
    pairs.foreach { case (h, i) => buf.putLong(h); buf.putLong(i) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKHashes.State = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val s = new BottomKHashes.State(k)
    var j = 0
    while (j < n) { s.insert(buf.getLong, buf.getLong); j += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKHashes =
    copy(hash = newChildren(0), id = newChildren(1))
}

object BottomKHashes {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Bounded distinct max-heap of (hash, id) pairs: holds the k smallest
    * seen so far. `java.util.TreeSet` gives O(log k) insert/largest/
    * contains in one structure (the heap alone can't dedup). */
  private[graft] class State(k: Int) {
    private val set = new java.util.TreeSet[(Long, Long)](
      implicitly[Ordering[(Long, Long)]])
    def insert(h: Long, i: Long): Unit = {
      val p = (h, i)
      if (set.size < k) { set.add(p); () }
      else if (implicitly[Ordering[(Long, Long)]].lt(p, set.last)
          && !set.contains(p)) {
        set.add(p)
        set.remove(set.last)
        ()
      }
    }
    def foreach(f: (Long, Long) => Unit): Unit = {
      val it = set.iterator()
      while (it.hasNext) { val (h, i) = it.next(); f(h, i) }
    }
    def sortedPairs: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](set.size)
      var j = 0
      val it = set.iterator()
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** DataFrame-side column: `bottom_k(hash, id)` with the given k. */
  def column(hash: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(BottomKHashes(
      ExpressionUtils.expression(hash),
      ExpressionUtils.expression(id), k).toAggregateExpression())
}
