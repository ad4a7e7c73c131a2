package graft.sketch

import java.io.{ByteArrayOutputStream, DataOutputStream, DataInputStream, ByteArrayInputStream}
import scala.collection.mutable

/** Space-saving heavy-hitters summary over string terms — the mergeable
  * frequency sketch that replaces an exact term-count aggregation when
  * the vocabulary no longer fits anywhere (100-TB corpora carry billions
  * of distinct n-grams; the exact `topTerms` aggregation shuffles all of
  * them).
  *
  * Offset-based formulation (the public Apache DataSketches
  * frequent-items design): alongside the (estimate, maxError) entries the
  * sketch tracks `offset`, an upper bound on the count of ANY absent
  * term. Invariants maintained through update, merge, and eviction:
  *
  *  - present term: `est − err ≤ true ≤ est`;
  *  - absent term: `true ≤ offset`;
  *  - eviction (at capacity) removes the minimum-estimate entry and
  *    raises `offset` to it; a newcomer enters at (offset+1, offset);
  *  - merge: offsets add; shared entries sum pointwise; one-sided
  *    entries are inflated by the other side's offset (the mass that
  *    side may have dropped for them), then the smallest entries are
  *    evicted back down to capacity.
  *
  * These give the classic space-saving behavior — heavy terms
  * (true > N/(capacity+1)) survive arbitrary partial/merge orders — and
  * the per-entry bounds are exactly what FreqSketchSpec verifies on
  * adversarial multi-partition streams. When capacity exceeds the
  * number of distinct terms, no eviction fires and counts are EXACT
  * regardless of partitioning (offset stays 0) — the property the
  * driver gate query exploits.
  *
  * The eviction index is an ordered set, so updates stay O(log capacity)
  * even on all-distinct streams.
  */
final class FreqSketch(val capacity: Int) {
  require(capacity >= 1, "capacity must be >= 1")

  // term -> (estimate = upper bound, maxError)
  private[sketch] val counts = mutable.HashMap.empty[String, (Long, Long)]
  // ordered (estimate, term) index for O(log k) min eviction
  private val order = new java.util.TreeSet[(Long, String)](
    new java.util.Comparator[(Long, String)] {
      def compare(a: (Long, String), b: (Long, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    })
  private[sketch] var total: Long = 0L
  private[sketch] var offsetVar: Long = 0L

  def totalSeen: Long = total
  /** Upper bound on the true count of any term ABSENT from the sketch. */
  def offset: Long = offsetVar
  def size: Int = counts.size
  def isEmpty: Boolean = total == 0

  private[sketch] def put(term: String, est: Long, err: Long): Unit = {
    counts.get(term).foreach { case (c, _) => order.remove((c, term)) }
    counts(term) = (est, err)
    order.add((est, term))
  }

  private def evictDownTo(n: Int): Unit =
    while (counts.size > n) {
      val min = order.first()
      order.remove(min)
      counts.remove(min._2)
      if (min._1 > offsetVar) offsetVar = min._1 // absent-term bound
    }

  def update(term: String): Unit = {
    total += 1
    counts.get(term) match {
      case Some((c, e)) => put(term, c + 1, e)
      case None =>
        if (counts.size >= capacity) evictDownTo(capacity - 1)
        // true count of the newcomer <= offset (while absent) + 1
        put(term, offsetVar + 1, offsetVar)
    }
  }

  def merge(other: FreqSketch): FreqSketch = {
    total += other.total
    val oOff = other.offsetVar
    // one-sided entries of THIS side: the other side may have dropped up
    // to its offset of their mass
    if (oOff > 0) counts.keysIterator.toSeq.foreach { t =>
      if (!other.counts.contains(t)) {
        val (c, e) = counts(t); put(t, c + oOff, e + oOff)
      }
    }
    other.counts.foreach { case (t, (c, e)) =>
      counts.get(t) match {
        case Some((c0, e0)) => put(t, c0 + c, e0 + e)
        case None => put(t, c + offsetVar, e + offsetVar)
      }
    }
    offsetVar += oOff
    evictDownTo(capacity)
    this
  }

  /** Top-n entries as (term, estimate, maxError), by (estimate desc,
    * term asc) — a total order, so the cut is deterministic. */
  def topK(n: Int): Seq[(String, Long, Long)] =
    counts.toSeq.map { case (t, (c, e)) => (t, c, e) }
      .sortBy { case (t, c, _) => (-c, t) }.take(n)

  def estimate(term: String): Long = counts.get(term).map(_._1).getOrElse(offsetVar)
  def maxError(term: String): Long = counts.get(term).map(_._2).getOrElse(offsetVar)
  /** Estimate if the term survives in the sketch, else None (unlike
    * [[estimate]], which reports the absent-term upper bound). */
  def countIfPresent(term: String): Option[Long] = counts.get(term).map(_._1)

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(FreqSketch.Magic) // format tag + version (see deserialize)
    out.writeInt(capacity)
    out.writeLong(total)
    out.writeLong(offsetVar)
    out.writeInt(counts.size)
    counts.foreach { case (t, (c, e)) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }
}

object FreqSketch {
  /** "FQS1" — format tag + version. Bump the last byte on any layout
    * change so persisted profiles are format-versioned instead of
    * surfacing as executor EOF/NegativeArraySize errors. */
  private[sketch] val Magic = 0x46515331
  val DefaultCapacity = 1024

  def empty(capacity: Int = DefaultCapacity) = new FreqSketch(capacity)

  /** Inverse of [[FreqSketch.serialize]]. Rejects foreign or corrupt
    * blobs with a descriptive IllegalArgumentException: the magic/version
    * word is checked first, and every blob-encoded length is validated
    * against the remaining byte budget before allocation. Blobs written
    * before the magic word existed (legacy layout: capacity first) are
    * still readable — a capacity field can never collide with the magic
    * (0x46515331 ≈ 1.18e9, far above any sane capacity), so detection is
    * unambiguous; legacy parsing runs the same bounds validation. */
  def deserialize(bytes: Array[Byte]): FreqSketch = {
    def bad(msg: String) =
      throw new IllegalArgumentException(s"not a FreqSketch v1 blob: $msg")
    if (bytes.length < 24) bad(s"${bytes.length} bytes is shorter than the header")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val first = in.readInt()
    if (first == Magic) {
      if (bytes.length < 28) bad(s"${bytes.length} bytes is shorter than the v1 header")
      deserializeBody(bytes, in, headerBytes = 28, capacity = in.readInt())
    } else if (first >= 1 && first <= (1 << 27)) {
      // legacy (pre-magic) layout: capacity first. A plausible capacity
      // can never collide with the magic constant (~1.18e9).
      deserializeBody(bytes, in, headerBytes = 24, capacity = first)
    } else {
      bad(f"magic word 0x$first%08x != 0x$Magic%08x ('FQS1')")
    }
  }

  /** Shared body parse: `in` positioned just after the capacity field;
    * `headerBytes` = total fixed-header size for the remaining-byte
    * budget. Validates every length before allocating. */
  private def deserializeBody(bytes: Array[Byte], in: DataInputStream,
                              headerBytes: Int, capacity: Int): FreqSketch = {
    def bad(msg: String) =
      throw new IllegalArgumentException(s"not a FreqSketch v1 blob: $msg")
    if (capacity < 1) bad(s"capacity $capacity < 1")
    val sk = new FreqSketch(capacity)
    val total = in.readLong()
    val off = in.readLong()
    if (total < 0 || off < 0) bad(s"negative total ($total) or offset ($off)")
    val n = in.readInt()
    if (n < 0 || n > capacity) bad(s"entry count $n outside [0, capacity=$capacity]")
    // each entry needs >= 4 (len) + 16 (counts) bytes
    var remaining = bytes.length - headerBytes
    (0 until n).foreach { _ =>
      val len = in.readInt(); remaining -= 4
      if (len < 0 || len > remaining - 16)
        bad(s"term length $len exceeds the $remaining bytes left in the blob")
      val b = new Array[Byte](len); in.readFully(b)
      remaining -= len + 16
      val term = new String(b, "UTF-8")
      val c = in.readLong(); val e = in.readLong()
      sk.put(term, c, e) // keeps the eviction index consistent
    }
    sk.total = total // stream total is not derivable from the entries
    sk.offsetVar = off
    sk
  }
}
