package graft.sketch

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Misra-Gries "frequent items" sketch with purge-offset error tracking.
  *
  * Capability match for the reference's heavy-hitters sketch
  * (/root/reference/src/wrapper/hh.rs:40-74,127-201 and the patched
  * datasketches-cpp `frequent_items_sketch`). We reproduce its guarantees
  * — lb <= true <= ub for every tracked item, error bounded by the total
  * purge offset (epsilon ~ 3.5/2^lg_max_k per
  * frequent_items_sketch.hpp:282), EXACT counts while under capacity —
  * not its bitwise state (its merge is order-dependent; SURVEY A11).
  *
  * Purge policy mirrors the reverse-purge map: when the map exceeds
  * capacity, subtract the median count from everything, drop <= 0, and
  * add the median to `offset` (fi/include/reverse_purge_hash_map_impl.hpp).
  *
  * lb(item) = count; ub(item) = count + offset. Reported estimate = ub
  * (the "no false negatives" view used by the CLI's top-k,
  * /root/reference/src/counters.rs:188-195).
  */
final class FreqSketch(val lgMaxK: Int) extends Serializable {
  require(lgMaxK >= 2 && lgMaxK <= 26, s"lgMaxK out of range: $lgMaxK")
  val maxMapSize: Int = (1 << lgMaxK) * 3 / 4 // LOAD_FACTOR 0.75 as in the C++ map

  private[sketch] val counts = mutable.HashMap.empty[String, Long]
  private[sketch] var offset: Long = 0L
  private[sketch] var _streamWeight: Long = 0L
  def streamWeight: Long = _streamWeight

  def update(item: String, weight: Long = 1L): Unit = {
    require(weight >= 0, "negative weight")
    if (weight == 0) return
    _streamWeight += weight
    counts.updateWith(item) {
      case Some(c) => Some(c + weight)
      case None    => Some(weight)
    }
    if (counts.size > maxMapSize) purge()
  }

  private def purge(): Unit = {
    val vals = counts.values.toArray
    java.util.Arrays.sort(vals)
    val median = vals(vals.length / 2)
    offset += median
    counts.filterInPlace((_, c) => c > median)
    counts.mapValuesInPlace((_, c) => c - median)
  }

  /** Monoid merge: counts add, offsets add; bounds stay valid. */
  def merge(other: FreqSketch): Unit = {
    _streamWeight += other.streamWeight
    offset += other.offset
    other.counts.foreach { case (item, c) =>
      counts.updateWith(item) {
        case Some(mine) => Some(mine + c)
        case None       => Some(c)
      }
    }
    while (counts.size > maxMapSize) purge()
  }

  def lowerBound(item: String): Long = counts.getOrElse(item, 0L)
  def upperBound(item: String): Long = counts.get(item).map(_ + offset).getOrElse(offset)
  def isExact: Boolean = offset == 0L

  /** Rows (item, est=ub, lb, ub) sorted by ub desc then item asc
    * (deterministic tie-break; reference sorts by ub desc,
    * src/counters.rs:188-195). This is the NO-FALSE-NEGATIVES view: every
    * item whose true count exceeds the error bound is present. */
  def rows: Seq[(String, Long, Long, Long)] =
    counts.toSeq
      .map { case (item, c) => (item, c + offset, c, c + offset) }
      .sortBy { case (item, _, _, ub) => (-ub, item) }

  /** NO-FALSE-POSITIVES view (reference `estimate_no_fp`,
    * /root/reference/src/wrapper/hh.rs:153-165): only items whose LOWER
    * bound exceeds the maximum error (= purge offset) are reported, so
    * every reported item is a true frequent item. A subset of `rows`;
    * identical to it while the sketch is exact (offset == 0). */
  def rowsNoFp: Seq[(String, Long, Long, Long)] =
    rows.filter { case (_, _, lb, _) => lb > offset }

  def topK(k: Int): Seq[(String, Long, Long, Long)] = rows.take(k)

  def topKNoFp(k: Int): Seq[(String, Long, Long, Long)] = rowsNoFp.take(k)

  def serialize(): Array[Byte] = {
    val items = counts.toArray
    val byteItems = items.map { case (s, c) => (s.getBytes(StandardCharsets.UTF_8), c) }
    val payload = byteItems.map(_._1.length + 12).sum
    val bb = ByteBuffer.allocate(1 + 4 + 8 + 8 + 4 + payload).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(lgMaxK).putLong(offset).putLong(_streamWeight).putInt(items.length)
    byteItems.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }
}

object FreqSketch {
  /** The CLI sizing rule: lg2_k = max(floor(log2 k), 1) + 2
    * (/root/reference/src/counters.rs:166-175). */
  def lgSizeForTopK(k: Int): Int = {
    require(k >= 1)
    math.max(63 - java.lang.Long.numberOfLeadingZeros(k.toLong).toInt, 1) + 2
  }

  def forTopK(k: Int): FreqSketch = new FreqSketch(lgSizeForTopK(k))

  def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val v = bb.get()
    require(v == 1, s"unsupported FreqSketch codec version $v")
    val sk = new FreqSketch(bb.getInt())
    sk.offset = bb.getLong()
    sk._streamWeight = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      require(len >= 0 && len <= bb.remaining() - 8, "corrupt FreqSketch payload")
      val b = new Array[Byte](len)
      bb.get(b)
      sk.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    sk
  }
}
