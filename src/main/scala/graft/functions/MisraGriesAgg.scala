package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a mergeable
  * TypedImperativeAggregate: at most `budget` counters summarize a string
  * stream with the classic deterministic guarantee
  * `c(x) − n/(budget+1) ≤ ĉ(x) ≤ c(x)` — every item more frequent than
  * n/(budget+1) is GUARANTEED present in the sketch, regardless of
  * stream order or partitioning (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Update: increment a tracked item, adopt an untracked one while below
  * budget, else decrement all (dropping zeros). Merge: sum counters, then
  * if over budget subtract the (budget+1)-th largest count from all and
  * drop non-positives — the error bounds ADD across merges, so map-side
  * partials combine into a shuffle of exactly one `budget`-sized sketch
  * per partition instead of a corpus-sized term shuffle. ESTIMATES are
  * order-dependent (any MG sketch is); downstream consumers use the
  * sketch as a CANDIDATE set and verify counts exactly — see
  * TfIdfQueries.qHeavyHitters, which is hash-deterministic through the
  * guarantee.
  */
case class MisraGriesSketch(
    child: Expression,
    budget: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(budget > 0, s"budget must be positive, got $budget")

  override def prettyName: String = "misra_gries_sketch"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
                      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(t)
      if (cur != null) buf.put(t, cur.longValue() + 1L)
      else if (buf.size < budget) buf.put(t, 1L)
      else {
        // decrement-all step: drains one "vote" from every tracked item
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[String, java.lang.Long],
                     b2: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] =
    MisraGries.mergeInto(b1, b2, budget)

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    // deterministic output order: estimate desc, term asc
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(entries,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps a
      // term at 65535 bytes and one unbroken token (base64 blob in dirty
      // web text) would crash the shuffle serialize
      val tb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(tb.length); out.write(tb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len)
      in.readFully(tb)
      buf.put(new String(tb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MisraGries {
  /** Column API: aggregate a string column into an array<struct<term,est>>
    * heavy-hitters sketch of at most `budget` counters. */
  def apply(termCol: Column, budget: Int): Column =
    Shim.column(
      MisraGriesSketch(Shim.expression(termCol), budget).toAggregateExpression())

  /** The Agarwal-et-al mergeable-summaries rule, shared by the aggregate's
    * shuffle merge and driver-side cross-batch folds (q_hh_stream): sum
    * counters, then if over budget subtract the (budget+1)-th largest from
    * all and drop non-positives. The c − n_total/(budget+1) guarantee
    * survives any merge tree. Mutates and returns `b1`. */
  private[graft] def mergeInto(
      b1: java.util.HashMap[String, java.lang.Long],
      b2: java.util.HashMap[String, java.lang.Long],
      budget: Int): java.util.HashMap[String, java.lang.Long] = {
    val mit = b2.entrySet().iterator()
    while (mit.hasNext) {
      val e = mit.next()
      val old = b1.get(e.getKey)
      b1.put(e.getKey, (if (old == null) 0L else old.longValue()) + e.getValue.longValue())
    }
    if (b1.size > budget) {
      // subtract the (budget+1)-th largest count from every counter
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - budget - 1) // (budget+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
    }
    b1
  }
}
