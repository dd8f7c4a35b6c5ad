package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: the k best (score, id) pairs under the ranking
  * `score DESC, id ASC` — a min-heap whose head is the WORST retained pair,
  * so admission is one O(log k) compare-and-swap per row. */
private[functions] final class TopKHeapBuffer(val k: Int) {
  // worst-first ordering: smaller score first; on ties, LARGER id first
  // (so the head is always the pair the ranking would evict first)
  private val worstFirst = new java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(1, k), worstFirst)

  def offer(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.add((score, id))
    else if (worstFirst.compare((score, id), heap.peek()) > 0) {
      heap.poll(); heap.add((score, id))
    }
  }

  /** Best-first (score DESC, id ASC) — the exact row_number order. */
  def sorted: Array[(Double, Long)] = {
    val a = heap.toArray(Array.empty[(Double, Long)])
    scala.util.Sorting.stableSort(a,
      (x: (Double, Long), y: (Double, Long)) =>
        worstFirst.compare(x, y) > 0)
    a
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    val it = heap.iterator()
    while (it.hasNext) { val p = it.next(); f(p._1, p._2) }
  }
}

/** Native top-k-by-score aggregate (SURVEY §7.4's "optional
  * `TypedImperativeAggregate` for top-k by cosine"): per group, the k best
  * (score, id) pairs under `score DESC, id ASC`, returned as an array of
  * structs in rank order.
  *
  * Why it exists: the window formulation
  * (`row_number() OVER (PARTITION BY q ORDER BY score DESC, id) <= k`)
  * must SHUFFLE AND SORT every scored row — O(|pairs| log |pairs|) through
  * an exchange sized by the candidate set. This aggregate keeps a k-entry
  * min-heap per group with map-side partial aggregation
  * (`ObjectHashAggregate`), so each input row costs O(log k) locally and
  * only k-row heaps cross the wire — at a 100 TB candidate volume the
  * exchange shrinks from the pair count to |groups|·k.
  *
  * Ranking ties are broken by id ascending — bit-identical to the
  * `topK` window contract, so the two formulations are interchangeable
  * (and `emb_knn_brute_heap` shares `emb_knn_brute`'s oracle verbatim). */
case class TopKByScore(score: Expression, id: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeapBuffer] {

  require(k > 0, s"top_k_by_score: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("c_id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeapBuffer =
    new TopKHeapBuffer(k)

  override def update(buffer: TopKHeapBuffer,
                      input: InternalRow): TopKHeapBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeapBuffer,
                     other: TopKHeapBuffer): TopKHeapBuffer = {
    other.foreach((s, i) => buffer.offer(s, i))
    buffer
  }

  override def eval(buffer: TopKHeapBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buffer: TopKHeapBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buffer.sorted
    out.writeInt(entries.length)
    entries.foreach { case (s, i) =>
      out.writeDouble(s); out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeapBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKHeapBuffer(k)
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.offer(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKFunctions {
  /** Per-group k best (score DESC, id ASC) pairs as an ordered
    * array<struct<score,c_id>> — the heap-aggregate replacement for the
    * `row_number` window top-k. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftShims.column(TopKByScore(
      GraftShims.expression(score),
      GraftShims.expression(id), k).toAggregateExpression())
}
