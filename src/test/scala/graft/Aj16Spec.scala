package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.CharMaps

/** Entry-for-entry regression of the embedded Adobe-Japan1-6 CID table
  * against the reference's own data file (data/map/Adobe-Japan1-6.map, a
  * gzip'd Haskell Data.Binary `Map Int ByteString`): Int64-BE entry count,
  * then ascending (Int64-BE key, Int64-BE length + UTF-8 bytes) pairs.
  * Skipped (via `assume`) when the reference checkout is absent, so the
  * suite stays runnable standalone; on this machine it pins all 17,960
  * CIDs — the run-length resource can never silently drift. */
class Aj16Spec extends AnyFunSuite {

  private val mapPath = java.nio.file.Paths.get("/root/reference/data/map/Adobe-Japan1-6.map")

  private def decodeReferenceMap(): Map[Int, String] = {
    val gz = new java.util.zip.GZIPInputStream(java.nio.file.Files.newInputStream(mapPath))
    val raw = try gz.readAllBytes() finally gz.close()
    val buf = java.nio.ByteBuffer.wrap(raw) // big-endian by default
    val n = buf.getLong.toInt
    val b = Map.newBuilder[Int, String]
    var i = 0
    while (i < n) {
      val k = buf.getLong.toInt
      val len = buf.getLong.toInt
      val bytes = new Array[Byte](len)
      buf.get(bytes)
      b += k -> new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    b.result()
  }

  test("embedded Adobe-Japan1-6 table matches the reference map entry for entry") {
    assume(java.nio.file.Files.isReadable(mapPath), "reference checkout absent")
    val ref = decodeReferenceMap()
    val ours = CharMaps.adobeJapan16Map
    assert(ref.size == 17960, s"reference map has ${ref.size} entries")
    assert(ours.size == ref.size,
      s"embedded table has ${ours.size} entries, reference ${ref.size}")
    val missing = ref.keysIterator.filterNot(ours.contains).take(5).toList
    assert(missing.isEmpty, s"CIDs missing from embedded table: $missing")
    val diffs = ref.iterator
      .filter { case (cid, v) => ours(cid) != v }
      .take(5)
      .map { case (cid, v) => s"cid=$cid ref=${v} ours=${ours(cid)}" }
      .toList
    assert(diffs.isEmpty, s"value mismatches: $diffs")
  }
}
