package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `counter_merge(map<string,bigint>)` — native SQL aggregate merging
  * token-counter maps (A3: the reference's `aggregate_counter +=
  * Counter(...)` rollup, `scrc/preprocessors/abstract_preprocessor
  * .py:343-352`).
  *
  * TypedImperativeAggregate with a mutable HashMap buffer: partial
  * merges happen map-side, the shuffle carries ONE serialized map per
  * (group × partition) — the same partial/final shape Postgres never
  * gave the reference. The typed `operators.CounterAggregator` is the
  * Dataset-API sibling; this one works from pure SQL via
  * GraftExtensions.
  */
case class CounterMerge(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "counter_merge"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val m = child.eval(input).asInstanceOf[MapData]
    if (m != null) {
      val keys = m.keyArray()
      val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        val k = keys.getUTF8String(i).toString
        buf.update(k, buf.getOrElse(k, 0L) + vals.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    for ((k, v) <- b) a.update(k, a.getOrElse(k, 0L) + v)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic key order so downstream map comparisons are stable
    val sorted = buf.toSeq.sortBy(_._1)
    ArrayBasedMapData(
      sorted.map(kv => UTF8String.fromString(kv._1)).toArray,
      sorted.map(_._2).toArray)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    for ((k, v) <- buf) { out.writeUTF(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CounterMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CounterMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CounterMerge =
    copy(child = newChildren.head)
}

object CounterMerge {
  val info: ExpressionInfo = new ExpressionInfo(classOf[CounterMerge].getName, "counter_merge")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "counter_merge takes exactly one map argument")
    CounterMerge(args.head).toAggregateExpression()
  }
}
