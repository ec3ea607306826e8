package graft.spark

/** KMV (k-minimum-values) distinct-count sketch for bounded streaming
  * state: keeps the k smallest 64-bit item hashes in unsigned order.
  *
  * Exact while fewer than k distinct items have been seen (every hash is
  * retained), and a constant-size O(k) estimate afterwards — replacing an
  * unbounded `Set[String]` whose state would grow with key cardinality in
  * a long-running streaming job.
  */
object Kmv {

  /** Sketch size: 256 longs = 2 KB of state per key, ~6% relative error
    * beyond 256 distinct items, exact below. */
  val K = 256

  /** FNV-1a 64-bit over UTF-16 code units, then a 64-bit avalanche
    * finalizer (the standard fmix64 constants) so short, similar keys
    * spread uniformly across the full unsigned range — KMV's estimate
    * depends on that uniformity. Deterministic across JVMs. */
  def hash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  private def search(a: Array[Long], h: Long): Int = {
    var lo = 0
    var hi = a.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(a(mid), h)
      if (c == 0) return mid
      if (c < 0) lo = mid + 1 else hi = mid - 1
    }
    -(lo + 1)
  }

  /** Insert a hash, keeping the array sorted (unsigned) and capped at K. */
  def add(kmv: Array[Long], h: Long): Array[Long] = {
    val idx = search(kmv, h)
    if (idx >= 0) kmv // already present
    else {
      val ins = -idx - 1
      if (kmv.length < K) {
        val out = new Array[Long](kmv.length + 1)
        System.arraycopy(kmv, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(kmv, ins, out, ins + 1, kmv.length - ins)
        out
      } else if (ins >= K) kmv // not among the k smallest
      else {
        val out = new Array[Long](K)
        System.arraycopy(kmv, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(kmv, ins, out, ins + 1, K - ins - 1)
        out
      }
    }
  }

  def addItem(kmv: Array[Long], item: String): Array[Long] = add(kmv, hash(item))

  /** Bulk insert: one unsigned sort of the batch + one merge pass instead
    * of a copy-on-insert per item (the per-event O(K) alloc was the hot
    * cost of the streaming session state pre-saturation). MUTATES `hs`
    * (scratch buffer). Result stays sorted-unsigned and capped at K. */
  def bulkAdd(kmv: Array[Long], hs: Array[Long]): Array[Long] = {
    if (hs.length == 0) return kmv
    // unsigned ascending == signed ascending of (x ^ Long.MinValue)
    var i = 0
    while (i < hs.length) { hs(i) ^= Long.MinValue; i += 1 }
    java.util.Arrays.sort(hs)
    val out = new Array[Long](math.min(K, kmv.length + hs.length))
    var a = 0
    var b = 0
    var o = 0
    var prev = 0L
    var has = false
    while (o < out.length && (a < kmv.length || b < hs.length)) {
      val takeA = b >= hs.length || (a < kmv.length &&
        java.lang.Long.compareUnsigned(kmv(a), hs(b) ^ Long.MinValue) <= 0)
      val v = if (takeA) { val x = kmv(a); a += 1; x }
              else { val x = hs(b) ^ Long.MinValue; b += 1; x }
      if (!has || v != prev) { out(o) = v; o += 1; prev = v; has = true }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** Distinct-count estimate: exact size below K; (K-1)/frac(kth) above. */
  def estimate(kmv: Array[Long]): Int =
    if (kmv.length < K) kmv.length
    else {
      val kth = kmv(K - 1)
      val twoTo64 = math.pow(2.0, 64)
      val frac = kth.toDouble / twoTo64 + (if (kth < 0) 1.0 else 0.0)
      math.max(K, math.round((K - 1).toDouble / frac).toInt)
    }
}
