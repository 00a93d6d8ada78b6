package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k LARGEST input structs (natural
  * struct ordering — field 1, then field 2, …) and returns them as an array
  * sorted descending.
  *
  * The scale story (the reason this exists instead of
  * `row_number().over(Window.partitionBy(...)) <= k`): as a
  * TypedImperativeAggregate it participates in partial aggregation, so each
  * map partition reduces its slice to ≤ k rows per group BEFORE the
  * exchange, with O(n log k) heap maintenance and no per-partition sort —
  * the full corpus is never sorted and never shuffled. The window
  * formulation (even with Spark's WindowGroupLimit pushdown) still fully
  * sorts every map partition by (group, order) first.
  *
  * Callers encode the desired order into the struct: for "cos DESC, id ASC"
  * pass `struct(cos, -id, …payload)` — the largest struct is then max-cos
  * with min-id tie-break. For non-negatable fields (strings), flag them in
  * `reversed` instead: `reversed(i) = true` makes SMALLER values of field i
  * rank better (e.g. "tfidf DESC, token ASC" = struct(tfidf, token) with
  * reversed = Seq(false, true)). Ties beyond the key fields are broken by
  * the remaining fields, so include a unique field to keep results
  * deterministic.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    reversed: Seq[Boolean] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  require(k > 0, s"topK requires k > 0, got $k")

  // resolved lazily: child is unresolved when the Column is first built
  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** Ranking order: compare(a, b) > 0 ⇔ a ranks better. Natural struct
    * ordering unless a field is flagged in [[reversed]]; nulls rank worst.
    *
    * NULL PLACEMENT: null handling sits OUTSIDE the reversal, so nulls rank
    * worst on every field — reversal flips value order, never null
    * placement. On a reversed field that is NULLS LAST, which matches the
    * DuckDB oracle's ASC default but is the OPPOSITE of Spark's ASC sort
    * (NULLS FIRST). No current caller ranks on a nullable field; a future
    * caller with nullable keys must not assume Spark window-sort null
    * semantics. */
  @transient private lazy val ordering: Ordering[InternalRow] =
    if (reversed.forall(r => !r))
      TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]
    else {
      // `rev`: the anonymous Ordering inherits java.util.Comparator.reversed()
      val rev = reversed
      new Ordering[InternalRow] {
        private val fields = structType.fields
        private val fieldOrds =
          fields.map(f => TypeUtils.getInterpretedOrdering(f.dataType).asInstanceOf[Ordering[Any]])
        override def compare(a: InternalRow, b: InternalRow): Int = {
          var i = 0
          while (i < fields.length) {
            val dt = fields(i).dataType
            val va = a.get(i, dt)
            val vb = b.get(i, dt)
            // null handling stays OUTSIDE the reversal so nulls rank worst
            // on reversed fields too (reversal flips value order, not
            // null placement)
            val adj =
              if (va == null && vb == null) 0
              else if (va == null) -1
              else if (vb == null) 1
              else {
                val c = fieldOrds(i).compare(va, vb)
                if (i < rev.length && rev(i)) -c else c
              }
            if (adj != 0) return adj
            i += 1
          }
          0
        }
      }
    }

  @transient private lazy val toUnsafe: UnsafeProjection = UnsafeProjection.create(structType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def dataType: DataType        = ArrayType(structType, containsNull = false)

  /** Min-heap of the current top-k: head = smallest kept, evicted first. */
  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k + 1, ordering)

  private def offer(heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (heap.size < k) heap.add(row)
    else if (ordering.compare(row, heap.peek()) > 0) { heap.poll(); heap.add(row) }
  }

  override def update(
      heap: java.util.PriorityQueue[InternalRow],
      input: InternalRow
  ): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // copy only when the row is actually kept (rows are reused by the scan)
      if (heap.size < k || ordering.compare(row, heap.peek()) > 0)
        offer(heap, toUnsafe(row).copy())
    }
    heap
  }

  override def merge(
      a: java.util.PriorityQueue[InternalRow],
      b: java.util.PriorityQueue[InternalRow]
  ): java.util.PriorityQueue[InternalRow] = {
    b.forEach(r => offer(a, r))
    a
  }

  override def eval(heap: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](heap.size)
    var i   = heap.size - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // polls ascending → fill back-to-front
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(heap: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.forEach { r =>
      val u     = toUnsafe(r)
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val buf  = ByteBuffer.wrap(bytes)
    val n    = buf.getInt
    val heap = createAggregationBuffer()
    var i    = 0
    while (i < n) {
      val len = buf.getInt
      val b   = new Array[Byte](len)
      buf.get(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      heap.add(row)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k_structs"
}

object TopKAggregate {
  /** `topK(struct(...), k)` as an aggregate Column. `reversed(i) = true`
    * flips field i to smaller-ranks-better (ASC in the emitted order). */
  def topK(structCol: Column, k: Int, reversed: Seq[Boolean] = Nil): Column =
    GraftBridge.column(TopKStructs(GraftBridge.expression(structCol), k, reversed).toAggregateExpression())
}
