package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving (Misra-Gries family) heavy-hitters sketch as a
  * TypedImperativeAggregate: approximate top items over an unbounded key
  * space in O(capacity) memory per partition, with map-side partials and an
  * order-insensitive merge.
  *
  * This is the SCALE answer to exact top-k over a corpus-growing vocabulary
  * (the q48 shape): the exact formulation must shuffle every distinct key to
  * count it, while this sketch shuffles ≤ capacity entries per partition —
  * the exchange stops growing with the vocabulary.
  *
  * Guarantees (maintained by update AND merge, any merge order):
  *  - estimate ≥ true count ≥ estimate − err (the "sandwich");
  *  - every item with true count > N / capacity is tracked (coverage).
  * Both are verified against the exact counts by q67's oracle flags.
  *
  * Eviction does a linear scan for the min entry — O(capacity) per evicted
  * item, fine for capacities in the hundreds-to-thousands this is meant
  * for; a production variant pairs the map with a min-heap.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, SpaceSavingTopK.Entry]] {
  import SpaceSavingTopK.Entry

  require(capacity > 0, s"spaceSaving requires capacity > 0, got $capacity")

  private val itemType = StructType(
    Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false)
    )
  )

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def dataType: DataType        = ArrayType(itemType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Entry] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Entry],
      input: InternalRow
  ): mutable.HashMap[String, Entry] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(e) => e.cnt += 1
        case None if buf.size < capacity => buf(item) = Entry(1L, 0L)
        case None =>
          // evict the min-count entry; the newcomer inherits its count as
          // the classic Space-Saving overestimate (err = evicted count)
          val (minItem, minE) = buf.minBy { case (k, e) => (e.cnt, k) }
          buf.remove(minItem)
          buf(item) = Entry(minE.cnt + 1, minE.cnt)
      }
    }
    buf
  }

  /** Order-insensitive merge: an item absent from a FULL summary may have
    * been evicted with count up to that summary's min — that min is both
    * the count contribution and the error contribution of the absent side.
    * An absent side that never filled tracked everything, so contributes 0.
    */
  override def merge(
      a: mutable.HashMap[String, Entry],
      b: mutable.HashMap[String, Entry]
  ): mutable.HashMap[String, Entry] = {
    def bound(m: mutable.HashMap[String, Entry]): Long =
      if (m.size >= capacity) m.values.map(_.cnt).min else 0L
    val boundA = bound(a)
    val boundB = bound(b)
    val merged = mutable.HashMap.empty[String, Entry]
    (a.keySet ++ b.keySet).foreach { k =>
      val (ca, ea) = a.get(k).map(e => (e.cnt, e.err)).getOrElse((boundA, boundA))
      val (cb, eb) = b.get(k).map(e => (e.cnt, e.err)).getOrElse((boundB, boundB))
      merged(k) = Entry(ca + cb, ea + eb)
    }
    if (merged.size <= capacity) merged
    else {
      val kept = mutable.HashMap.empty[String, Entry]
      merged.toSeq
        .sortBy { case (k, e) => (-e.cnt, k) }
        .take(capacity)
        .foreach { case (k, e) => kept(k) = e }
      kept
    }
  }

  override def eval(buf: mutable.HashMap[String, Entry]): Any = {
    val rows = buf.toSeq
      .sortBy { case (k, e) => (-e.cnt, k) }
      .map { case (k, e) =>
        InternalRow(UTF8String.fromString(k), e.cnt, e.err): InternalRow
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, e) =>
      val bytes = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.cnt)
      out.writeLong(e.err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Entry] = {
    val buf = ByteBuffer.wrap(bytes)
    val n   = buf.getInt
    val m   = createAggregationBuffer()
    var i   = 0
    while (i < n) {
      val len = buf.getInt
      val b   = new Array[Byte](len)
      buf.get(b)
      m(new String(b, StandardCharsets.UTF_8)) = Entry(buf.getLong, buf.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "space_saving_top_k"
}

object SpaceSavingTopK {
  final case class Entry(var cnt: Long, var err: Long)
}

object HeavyHitters {
  /** `spaceSaving(item, capacity)` as an aggregate Column returning
    * ARRAY<STRUCT<item, cnt, err>> sorted by estimate descending. */
  def spaceSaving(itemCol: Column, capacity: Int): Column =
    GraftBridge.column(SpaceSavingTopK(GraftBridge.expression(itemCol), capacity).toAggregateExpression())
}
