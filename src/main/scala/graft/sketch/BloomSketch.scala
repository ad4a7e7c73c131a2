package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Bloom filter over string keys — the referential-check companion for
  * dimension tables too large to broadcast as ROWS: the filter is built
  * by one partial-combined aggregation over the dimension (each task a
  * local filter, the shuffle carries one bit-array blob per task, OR on
  * the reducer) and then travels as a compact literal into the fact
  * scan, where `contains` is a per-row hash probe with zero joins.
  *
  * Contract: NO FALSE NEGATIVES — a key inserted is always contained,
  * so `!contains(fk)` flags DEFINITE referential violations; a false
  * positive (prob ≈ fpp at the sized capacity) lets a violation escape
  * the screen. This is a screening check: exact confirmation, when
  * needed, runs [[graft.checks.ReferentialCheck]]'s anti-join on the
  * (much smaller) screened remainder.
  *
  * Hashing: FNV-1a over the key bytes finalized with the Murmur3 fmix64
  * avalanche, double-hashed into k probes (h1 + i·h2, h2 forced odd) —
  * the standard Kirsch-Mitzenmacher construction. Deterministic across
  * JVMs and runs (no per-instance seeds), so persisted filters
  * ([[graft.pipeline.IndexStore]] kind "bloom") keep probing
  * identically. */
final class BloomSketch(val numBits: Int, val numHashes: Int) {
  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits ($numBits) must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 32, s"numHashes ($numHashes) not in [1,32]")

  private[sketch] val words = new Array[Long](numBits / 64)
  var itemsAdded: Long = 0L // informational (approximate after merge overlap)

  def isEmpty: Boolean = itemsAdded == 0

  private def set(bit: Long): Unit = {
    val b = (bit % numBits).toInt
    words(b >>> 6) |= (1L << (b & 63))
  }
  private def get(bit: Long): Boolean = {
    val b = (bit % numBits).toInt
    (words(b >>> 6) & (1L << (b & 63))) != 0
  }

  def add(keyBytes: Array[Byte]): Unit = {
    val h1 = BloomSketch.hash64(keyBytes)
    val h2 = BloomSketch.fmix64(h1 ^ BloomSketch.Golden) | 1L
    var i = 0
    while (i < numHashes) {
      set((h1 + i.toLong * h2) & Long.MaxValue) // non-negative
      i += 1
    }
    itemsAdded += 1
  }

  def contains(keyBytes: Array[Byte]): Boolean = {
    val h1 = BloomSketch.hash64(keyBytes)
    val h2 = BloomSketch.fmix64(h1 ^ BloomSketch.Golden) | 1L
    var i = 0
    while (i < numHashes) {
      if (!get((h1 + i.toLong * h2) & Long.MaxValue)) return false
      i += 1
    }
    true
  }

  def merge(other: BloomSketch): BloomSketch = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"cannot merge bloom filters of different geometry " +
      s"($numBits/$numHashes vs ${other.numBits}/${other.numHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    itemsAdded += other.itemsAdded
    this
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(BloomSketch.Magic)
    out.writeInt(numBits)
    out.writeInt(numHashes)
    out.writeLong(itemsAdded)
    words.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }
}

object BloomSketch {
  /** "BLM1" — format tag + version (same discipline as [[FreqSketch]]). */
  private[sketch] val Magic = 0x424C4D31
  private[sketch] val Golden = 0x9E3779B97F4A7C15L

  /** Size a filter for `expectedItems` keys at false-positive rate
    * `fpp`: m = -n·ln p / (ln 2)², k = (m/n)·ln 2 — rounded up to whole
    * 64-bit words.
    *
    * The bit array is Int-indexed, so one filter tops out at 2^31 bits
    * (~256 MB blob — already at the broadcast-size ceiling). That is
    * ~150M keys at 1% fpp or ~300M at 10%; REFUSES a geometry that
    * cannot honor the requested fpp rather than silently degrading it
    * (the no-surprise rule for a screen whose contract is "misses ≈
    * fpp"). Beyond that, shard by key range into several filters and OR
    * the probes. */
  def sized(expectedItems: Long, fpp: Double): BloomSketch = {
    require(expectedItems >= 1, "expectedItems must be >= 1")
    require(fpp > 0 && fpp < 1, s"fpp ($fpp) must be in (0, 1)")
    val ln2 = math.log(2)
    val m0 = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val cap = Int.MaxValue.toLong / 64 * 64
    require(m0 <= cap,
      f"a single Bloom filter cannot hold $expectedItems%d keys at fpp=$fpp%g " +
      f"($m0%d bits > $cap%d max): raise fpp or shard the key space into " +
      "several filters and OR the probes")
    val m = ((m0 + 63) / 64) * 64
    val k = math.max(1, math.min(32, math.round(m.toDouble / expectedItems * ln2).toInt))
    new BloomSketch(m.toInt, k)
  }

  def deserialize(bytes: Array[Byte]): BloomSketch = {
    def bad(msg: String) =
      throw new IllegalArgumentException(s"not a BloomSketch v1 blob: $msg")
    if (bytes.length < 20) bad(s"${bytes.length} bytes is shorter than the header")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val magic = in.readInt()
    if (magic != Magic) bad(f"magic word 0x$magic%08x != 0x$Magic%08x ('BLM1')")
    val bits = in.readInt()
    if (bits < 64 || bits % 64 != 0) bad(s"numBits $bits not a positive multiple of 64")
    val k = in.readInt()
    if (k < 1 || k > 32) bad(s"numHashes $k outside [1,32]")
    if (bytes.length != 20 + bits / 8)
      bad(s"${bytes.length} bytes does not match numBits $bits (want ${20 + bits / 8})")
    val sk = new BloomSketch(bits, k)
    sk.itemsAdded = in.readLong()
    var i = 0
    while (i < sk.words.length) { sk.words(i) = in.readLong(); i += 1 }
    sk
  }

  /** FNV-1a over the bytes, avalanched with fmix64. */
  private[sketch] def hash64(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    fmix64(h)
  }

  private[sketch] def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }
}
