package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD 2003): per document, the DISTINCT set of sliding-window minima
  * over the md5 digests of all character `gram`-grams, window width
  * `window` — `array<string>` of lowercase hex digests, order
  * unspecified (callers explode + treat as a set).
  *
  * Semantics are EXACTLY `md5(substr(text, i, gram))` window-min: the
  * digest of gram position j (1-based i = j+1) hashes the UTF-8 bytes of
  * the CODE-POINT substring [j, j+gram) (shortening past the end), m =
  * max(numChars − gram + 1, 1) gram positions, complete windows only,
  * and m ≤ window degenerates to the one truncated whole-sequence
  * window — so the selected set is bit-identical to the textbook
  * explode + per-doc sliding ROWS-window formulation (spec-proven
  * set-equal across gram/window dials in NorthStarSpec) and the DuckDB
  * oracle is unchanged.
  *
  * Why an expression and not the declarative form: this op's history is
  * the suite's perf cautionary tale. The r1–r12 formulation exploded
  * every gram digest and ran WindowExec per doc — a corpus-sized
  * shuffle+sort that crossed into the spill regime at ×100 scale (the
  * r12 verdict's one above-floor cell). The r13 block-pair HOF rewrite
  * removed the shuffle but doubled the md5 work and paid interpreted
  * higher-order-function dispatch per element — measured SLOWER (17 s vs
  * 12 s warm at sf0.1). This expression is the [[DotProduct]] lesson
  * applied to the whole selection: one JVM pass per document, one md5
  * per gram, an O(window) monotonic deque for the sliding minima, and
  * per-doc dedup in-row — so the enclosing operator is a pure map
  * (explode of the returned set) with NO exchange at all, and the ×100
  * scale shape is the map floor by construction.
  *
  * Digest comparisons run on the raw 16-byte digests (unsigned
  * lexicographic — identical ordering to the lowercase-hex strings,
  * same length, same byte order); only SELECTED digests pay hex
  * encoding. Per-row memory is O(selected + window): a window-sized
  * digest ring plus the output set — the same output the operator must
  * materialize anyway. CodegenFallback: the per-document loop is
  * already compiled JVM code; fusing it into whole-stage codegen would
  * buy only the row-copy glue. */
case class WinnowSelect(child: Expression, gram: Int, window: Int)
    extends UnaryExpression with CodegenFallback {
  require(gram >= 1 && window >= 1, s"bad gram=$gram window=$window")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_select needs a string column, got ${t.catalogString}")
    }

  /** Unsigned lexicographic compare of two 16-byte digests — the hex
    * string order. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // byte offset of each code point (offs(n) = total bytes): substr()
    // counts characters, md5 hashes the substring's UTF-8 bytes — this
    // one O(bytes) scan gives both without quadratic re-scans
    var nChars = 0
    var p = 0
    while (p < bytes.length) {
      p += (if ((bytes(p) & 0x80) == 0) 1
            else if ((bytes(p) & 0xe0) == 0xc0) 2
            else if ((bytes(p) & 0xf0) == 0xe0) 3
            else 4)
      nChars += 1
    }
    val offs = new Array[Int](nChars + 1)
    p = 0
    var c = 0
    while (p < bytes.length) {
      offs(c) = p
      p += (if ((bytes(p) & 0x80) == 0) 1
            else if ((bytes(p) & 0xe0) == 0xc0) 2
            else if ((bytes(p) & 0xf0) == 0xe0) 3
            else 4)
      c += 1
    }
    offs(nChars) = bytes.length

    val m = math.max(nChars - gram + 1, 1)
    val md = MessageDigest.getInstance("MD5")
    def digest(j: Int): Array[Byte] = {
      val from = offs(j)
      val until = offs(math.min(j + gram, nChars))
      md.update(bytes, from, until - from)
      md.digest()
    }

    val out = new java.util.LinkedHashSet[UTF8String]()
    if (m <= window) {
      // one truncated window over all grams: the whole-sequence min
      var best = digest(0)
      var j = 1
      while (j < m) {
        val d = digest(j)
        if (cmp(d, best) < 0) best = d
        j += 1
      }
      out.add(hex(best))
    } else {
      // monotonic deque of gram indices with increasing digests; the
      // front is the min of the current window [j-window+1, j]. head and
      // tail are absolute counters into a (window+1)-slot ring (the
      // deque never holds more than `window` in-window indices); the
      // digest ring keeps the last `window` digests, which covers every
      // index the deque can reference.
      val cap = window + 1
      val ring = new Array[Array[Byte]](window) // digest at idx % window
      val dq = new Array[Int](cap)
      var head = 0
      var tail = 0 // exclusive
      var j = 0
      while (j < m) {
        val d = digest(j)
        ring(j % window) = d
        // pop ties too (>= keeps the newest equal digest — the min VALUE
        // is identical, and the newer index survives longer)
        while (tail > head && cmp(ring(dq((tail - 1) % cap) % window), d) >= 0)
          tail -= 1
        dq(tail % cap) = j
        tail += 1
        if (dq(head % cap) <= j - window) head += 1
        if (j >= window - 1) out.add(hex(ring(dq(head % cap) % window)))
        j += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowSelect = copy(child = newChild)
}

object WinnowFunctions {
  /** Per-doc distinct winnowing-selected fingerprint set; explode to get
    * the (doc_id, fp) relation. */
  def winnowSelect(text: Column, gram: Int, window: Int): Column =
    GraftShims.column(WinnowSelect(GraftShims.expression(text), gram, window))
}
