package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** 64-bit SimHash as a single TypedImperativeAggregate: the buffer holds the
  * running ±1 vote sum per bit over the group's word hashes; eval assembles
  * the sign bits into one long.
  *
  * Replaces 64 separate `sum(when(bit,1,-1))` aggregate slots with one
  * long[64] buffer and a single update loop per row — the map-side partial
  * and the shuffle both carry one 512-byte sketch per (partition, doc)
  * instead of 64 boxed sums, and the merge is elementwise add.
  */
case class SimHashSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val Bits = 64

  override def prettyName: String = "simhash_sketch"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < Bits) {
        buf(b) += (((h >>> b) & 1L) * 2L) - 1L
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (buf(b) > 0L) out |= (1L << b)
      b += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Bits * 8)
    var i = 0
    while (i < Bits) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](Bits)
    var i = 0
    while (i < Bits) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object SimHashSketch {
  /** Column API: aggregate a group's word hashes into a 64-bit simhash. */
  def apply(hashCol: Column): Column =
    Shim.column(SimHashSketch(Shim.expression(hashCol)).toAggregateExpression())
}
