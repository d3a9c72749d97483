package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** MinHash signature as a single TypedImperativeAggregate: the buffer is
  * the running elementwise minimum over `numHashes` permutations
  * `(a_i·x + b_i) mod p` of the input 32-bit shingle hashes.
  *
  * One mutable long[] buffer per group replaces `numHashes` separate
  * `min(...)` aggregate columns — one buffer update loop per row instead
  * of 64 aggregate-slot updates, and the merge (map-side partial → final)
  * is an elementwise min, so the shuffle carries exactly one sketch per
  * (partition, doc).
  */
case class MinHashSketch(
    child: Expression,
    coefA: Seq[Long],
    coefB: Seq[Long],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // Overflow contract, enforced here rather than assumed from callers:
  // x < 2^32 and a,b < 2^31 keep x*a + b < 2^63 in long arithmetic.
  require(coefA.length == coefB.length, "coefA/coefB length mismatch")
  require(coefA.forall(a => a > 0 && a < Int.MaxValue),
    "coefA must lie in (0, 2^31) to keep x*a overflow-free")
  require(coefB.forall(b => b >= 0 && b < Int.MaxValue),
    "coefB must lie in [0, 2^31)")

  private val n = coefA.length
  @transient private lazy val as = coefA.toArray
  @transient private lazy val bs = coefB.toArray

  override def prettyName: String = "minhash_sketch"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // mask to the documented 32-bit input domain (a full-64-bit hash
      // here would silently overflow x*a) — ShingleHashes values are
      // already < 2^31, so this is a no-op on the supported path
      val x = v.asInstanceOf[Long] & 0xFFFFFFFFL
      var i = 0
      while (i < n) {
        val h = (x * as(i) + bs(i)) % prime
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * 8)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashSketch {
  /** Column API: aggregate a group's shingle hashes into an array<long>
    * signature. */
  def apply(hashCol: Column, coefA: Seq[Long], coefB: Seq[Long], prime: Long): Column =
    Shim.column(
      MinHashSketch(Shim.expression(hashCol), coefA, coefB, prime)
        .toAggregateExpression())
}
