// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency sketch — bounded-memory heavy-hitter candidates
  * over an unbounded key stream, as a mergeable `TypedImperativeAggregate`.
  *
  * Holds at most `capacity` (key → count) entries. `update` is the classic
  * MG step (present → +1; room → insert; full → decrement-all, drop zeros);
  * `merge` is the mergeable-summaries form (sum counts, then subtract the
  * (capacity+1)-th largest count from all and drop non-positives), so
  * map-side partial states combine without losing the guarantee: after any
  * sequence of updates and merges over N total keys, every key with true
  * frequency > N/(capacity+1) is present, and each retained count is an
  * underestimate by at most N/(capacity+1).
  *
  * That guarantee is exactly what a two-pass heavy-hitters query needs at
  * 100 TB: pass 1 aggregates THIS sketch (constant memory per group, at
  * most `capacity` rows shipped per map task — the full `GROUP BY key`
  * alternative shuffles every distinct key); pass 2 re-scans and exact-
  * counts ONLY the ≤capacity candidates, so the final counts are exact and
  * oracle-checkable while the shuffle stays bounded by the candidate set.
  *
  * Deterministic: no RNG, counts are integers, and `eval` orders entries
  * by (count DESC, key ASC) — identical output for any partitioning and
  * merge order over the same multiset of keys whenever no decrement ever
  * fires (capacity ≥ distinct keys: the sketch IS the exact count table).
  * Under decrements the retained counts may depend on arrival order — the
  * guarantee above is order-free, which is why consumers treat the sketch
  * as CANDIDATES and re-count exactly.
  */
case class FreqSketch(
    key: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.State]
  with ImplicitCastInputTypes {

  require(capacity > 0, s"freq_sketch: capacity must be positive, got $capacity")

  // declare the string input so a non-string key (freq_sketch(user_id, 8))
  // is coerced or rejected at ANALYSIS, not as a per-task ClassCastException
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = FreqSketch.ResultType
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): FreqSketch.State =
    new FreqSketch.State(capacity)

  override def update(
      state: FreqSketch.State, input: InternalRow): FreqSketch.State = {
    val k = key.eval(input)
    if (k != null) state.offer(k.asInstanceOf[UTF8String].toString)
    state
  }

  override def merge(
      state: FreqSketch.State, other: FreqSketch.State): FreqSketch.State = {
    state.mergeFrom(other)
    state
  }

  override def eval(state: FreqSketch.State): Any =
    new GenericArrayData(state.sortedEntries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })

  override def serialize(state: FreqSketch.State): Array[Byte] = {
    val entries = state.sortedEntries
    var bytes = 4
    val encoded = entries.map { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      bytes += 4 + b.length + 8
      (b, c)
    }
    val buf = java.nio.ByteBuffer.allocate(bytes)
    buf.putInt(encoded.length)
    encoded.foreach { case (b, c) =>
      buf.putInt(b.length); buf.put(b); buf.putLong(c)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.State = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val s = new FreqSketch.State(capacity)
    var j = 0
    while (j < n) {
      val len = buf.getInt
      val b = new Array[Byte](len)
      buf.get(b)
      s.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), buf.getLong)
      j += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(key = newChildren(0))
}

object FreqSketch {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("lb", LongType, nullable = false))), containsNull = false)

  private[graft] class State(capacity: Int) {
    private val counts = new java.util.HashMap[String, Long]()

    /** Raw insert used by deserialize — no MG step, the serialized state
      * already satisfies the size bound. */
    def put(k: String, c: Long): Unit = { counts.put(k, c); () }

    def offer(k: String): Unit = {
      val cur = counts.get(k)
      if (cur != 0L) counts.put(k, cur + 1L)
      else if (counts.size < capacity) counts.put(k, 1L)
      else decrementAll(1L)
      ()
    }

    def mergeFrom(other: State): Unit = {
      other.counts.forEach { (k, c) =>
        val cur = counts.get(k)
        counts.put(k, cur + c)
      }
      if (counts.size > capacity) {
        // subtract the (capacity+1)-th largest count from everything and
        // drop non-positives: at most `capacity` entries survive (entries
        // at or below the pivot go to ≤0) and total decrement stays within
        // the MG error budget (mergeable-summaries argument).
        val vals = new Array[Long](counts.size)
        var i = 0
        val it = counts.values().iterator()
        while (it.hasNext) { vals(i) = it.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val pivot = vals(vals.length - capacity - 1)
        if (pivot > 0L) decrementAll(pivot)
      }
    }

    private def decrementAll(by: Long): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - by
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }

    def sortedEntries: Array[(String, Long)] = {
      val out = new Array[(String, Long)](counts.size)
      var i = 0
      counts.forEach { (k, c) => out(i) = (k, c); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (String, Long), b: (String, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      out
    }
  }

  /** DataFrame-side column: `freq_sketch(key)` with the given capacity. */
  def column(key: Column, capacity: Int): Column =
    ExpressionUtils.column(
      FreqSketch(ExpressionUtils.expression(key), capacity)
        .toAggregateExpression())
}
