package graft.core

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec
import scala.collection.immutable.TreeMap
import PObj._

/** Standard security handler state (reference src/PDF/Encrypt.hs:43-49).
  * `strEncrypted`/`stmEncrypted` carry the V>=4 crypt-filter selection: a
  * document declaring /StrF /Identity (or /StmF /Identity) leaves that
  * surface in PLAINTEXT — running it through AES/RC4 "decryption" would
  * yield garbage. */
final case class Security(
    revision: Int,
    version: Int,
    key: Array[Byte],
    keyLength: Int,
    aes: Boolean,
    strEncrypted: Boolean = true,
    stmEncrypted: Boolean = true)

/** PDF Standard security handler: file/object keys, RC4, AES-128-CBC.
  * Re-expression of /root/reference/src/PDF/Encrypt.hs. */
object Crypt {
  private val padString: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(bs: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(bs)

  private def padPassword(pw: Array[Byte]): Array[Byte] =
    (pw ++ padString).take(32)

  private def int32LE(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte, ((n >> 16) & 0xff).toByte, ((n >>> 24) & 0xff).toByte)
  private def int24LE(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte, ((n >> 16) & 0xff).toByte)
  private def int16LE(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte)

  private def dictInt(d: TreeMap[String, PObj], k: String): Option[Int] =
    d.get(k).collect { case PNum(n) => Util.hsTruncate(n) }
  private def dictBytes(d: TreeMap[String, PObj], k: String): Option[Array[Byte]] =
    d.get(k).flatMap {
      // crypto values are BINARY: prefer the lexer's pre-decoding bytes
      // (the text form is lossy when the value happens to start FE FF)
      case t @ PText(s) =>
        Option(t.rawBytes).orElse(Some(s.toCharArray.map(c => (c & 0xff).toByte)))
      case h @ PHex(x) => Option(h.rawBytes).orElse(hexToBytes(x))
      case _ => None
    }

  /** securityFromEncryptDict (Encrypt.hs:51-66); V5 (AES-256, R5/R6) is
    * beyond reference parity — the reference handles R<=4 only
    * (Encrypt.hs:51-66, no SHA-256 anywhere). */
  def securityFromEncryptDict(encDict: TreeMap[String, PObj], trailer: TreeMap[String, PObj],
                              password: Option[String]): Option[Security] = {
    if (dictInt(encDict, "/V").exists(_ >= 5)) return securityV5(encDict, password)
    for {
      r <- dictInt(encDict, "/R")
      v <- dictInt(encDict, "/V")
      o <- dictBytes(encDict, "/O")
      u <- dictBytes(encDict, "/U")
      p <- dictInt(encDict, "/P")
      fileId <- firstId(trailer)
      pw = password.map(s => s.toCharArray.map(c => (c & 0xff).toByte)).getOrElse(Array.emptyByteArray)
      aes = v >= 4 || usesAes(encDict)
      metaEnc = encDict.get("/EncryptMetadata") match {
        case Some(PBool(false)) => false
        case _ => true
      }
      keyLen = dictInt(encDict, "/Length") match {
        case Some(n) => math.max(5, n / 8)
        case None => if (r >= 3 || v >= 2) 16 else 5
      }
      key <- authenticateFileKey(pw, o, u, p, fileId, r, v, aes, metaEnc, keyLen)
    } yield Security(r, v, key, keyLen, aes,
      strEncrypted = v < 4 || !filterIsIdentity(encDict, "/StrF"),
      stmEncrypted = v < 4 || !filterIsIdentity(encDict, "/StmF"))
  }

  /** Crypt-filter selection at V>=4: an EXPLICIT /Identity disables
    * decryption for that surface. An ABSENT /StmF//StrF defaults to
    * /Identity per ISO 32000-1 7.6.5 — but ONLY at V=4 and ONLY when /CF
    * is also absent (no named crypt filters declared anywhere): the
    * leniency rationale is pre-V4-style dicts that never declared crypt
    * filters, which cannot apply to V5 (AES-256 exists only in the
    * crypt-filter model, so a V5 dict omitting /CF is malformed — keep
    * attempting decryption rather than passing ciphertext through). */
  private def filterIsIdentity(d: TreeMap[String, PObj], key: String,
      allowAbsentDefault: Boolean = true): Boolean =
    d.get(key) match {
      case Some(PName("/Identity")) => true
      case None => allowAbsentDefault && !d.contains("/CF") // V4 spec default when no filters declared
      case _ => false
    }

  // ---------- V5: AES-256, revisions 5/6 (ISO 32000-2 7.6.4) ----------

  private def sha(alg: String, bs: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance(alg).digest(bs)

  /** R6 Algorithm 2.B / R5 plain SHA-256 password hash. */
  def hash2B(r: Int, pw: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pw ++ salt ++ udata)
    if (r == 5) return k
    var i = 0
    var continue = true
    while (continue) {
      val k1 = pw ++ k ++ udata
      val rep = new Array[Byte](k1.length * 64)
      var t = 0
      while (t < 64) { System.arraycopy(k1, 0, rep, t * k1.length, k1.length); t += 1 }
      val e = aesCbcEncrypt(k.take(16), k.slice(16, 32), rep)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = mod match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case 2 => sha("SHA-512", e)
      }
      i += 1
      continue = i < 64 || (e(e.length - 1) & 0xff) > i - 32
    }
    k.take(32)
  }

  def aesCbcEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  def aesCbcDecrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data.take(data.length / 16 * 16))
  }

  /** V5 authentication (Algorithms 2.A / 8 / 9): /O and /U are
    * hash(32) ++ validationSalt(8) ++ keySalt(8); the file key comes from
    * AES-256-CBC(iv=0) decryption of /UE or /OE with the intermediate key.
    * No /ID involvement and no per-object keys at V5. */
  private def securityV5(encDict: TreeMap[String, PObj], password: Option[String]): Option[Security] = {
    for {
      r <- dictInt(encDict, "/R")
      o <- dictBytes(encDict, "/O") if o.length >= 48
      u <- dictBytes(encDict, "/U") if u.length >= 48
      oe <- dictBytes(encDict, "/OE")
      ue <- dictBytes(encDict, "/UE")
      pw = password.map(_.getBytes("UTF-8").take(127)).getOrElse(Array.emptyByteArray)
      key <- {
        val none = Array.emptyByteArray
        if (java.util.Arrays.equals(hash2B(r, pw, u.slice(32, 40), none), u.take(32)))
          Some(aesCbcDecrypt(hash2B(r, pw, u.slice(40, 48), none), new Array[Byte](16), ue).take(32))
        else if (java.util.Arrays.equals(hash2B(r, pw, o.slice(32, 40), u.take(48)), o.take(32)))
          Some(aesCbcDecrypt(hash2B(r, pw, o.slice(40, 48), u.take(48)), new Array[Byte](16), oe).take(32))
        else None
      }
    } yield Security(r, 5, key, 32, aes = true,
      strEncrypted = !filterIsIdentity(encDict, "/StrF", allowAbsentDefault = false),
      stmEncrypted = !filterIsIdentity(encDict, "/StmF", allowAbsentDefault = false))
  }

  private def usesAes(d: TreeMap[String, PObj]): Boolean =
    d.get("/CF") match {
      case Some(PDict(cf)) => cf.get("/StdCF") match {
        case Some(PDict(std)) => std.get("/CFM") match {
          case Some(PName("/AESV2")) | Some(PName("/AESV3")) => true
          case _ => false
        }
        case _ => false
      }
      case _ => false
    }

  private def firstId(trailer: TreeMap[String, PObj]): Option[Array[Byte]] =
    trailer.get("/ID") match {
      case Some(PArray(entry +: _)) => entry match {
        case h @ PHex(x) => Option(h.rawBytes).orElse(hexToBytes(x))
        // keep the hex-digits-first reading for literal IDs (existing
        // behavior); rawBytes only rescues the lossy BOM-decoded case
        case t @ PText(s) => hexToBytes(s)
          .orElse(Option(t.rawBytes)).orElse(Some(s.toCharArray.map(c => (c & 0xff).toByte)))
        case _ => None
      }
      case _ => None
    }

  def hexToBytes(h: String): Option[Array[Byte]] = {
    if (h.isEmpty) return Some(Array.emptyByteArray)
    val out = new Array[Byte]((h.length + 1) / 2)
    var i = 0
    while (i < h.length) {
      val a = Character.digit(h.charAt(i), 16)
      if (a < 0) return None
      val b = if (i + 1 < h.length) Character.digit(h.charAt(i + 1), 16) else 0
      if (i + 1 < h.length && b < 0) return None
      out(i / 2) = ((a << 4) | b).toByte
      i += 2
    }
    Some(out)
  }

  private def authenticateFileKey(pw: Array[Byte], o: Array[Byte], u: Array[Byte], p: Int,
      fileId: Array[Byte], r: Int, v: Int, aes: Boolean, metaEnc: Boolean, keyLen: Int): Option[Array[Byte]] =
    ownerPasswordKey(pw, o, u, p, fileId, r, aes, metaEnc, keyLen)
      .orElse(userPasswordKey(pw, o, u, p, fileId, r, aes, metaEnc, keyLen))

  private def userPasswordKey(pw: Array[Byte], o: Array[Byte], u: Array[Byte], p: Int,
      fileId: Array[Byte], r: Int, aes: Boolean, metaEnc: Boolean, keyLen: Int): Option[Array[Byte]] = {
    val key = if (r >= 4 || aes) computeFileKeyAes(pw, o, p, fileId, r, metaEnc)
              else computeFileKey(pw, o, p, fileId, r, keyLen, metaEnc)
    if (verifyUserPassword(r, fileId, key, u)) Some(key) else None
  }

  private def ownerPasswordKey(ownerPw: Array[Byte], o: Array[Byte], u: Array[Byte], p: Int,
      fileId: Array[Byte], r: Int, aes: Boolean, metaEnc: Boolean, keyLen: Int): Option[Array[Byte]] = {
    val oKey = computeOwnerValueKey(ownerPw, r, keyLen)
    val userPw = decryptOToUserPassword(oKey, r, o)
    userPasswordKey(userPw, o, u, p, fileId, r, aes, metaEnc, keyLen)
  }

  /** Algorithm 3 (a-d) (Encrypt.hs:96-100). */
  private def computeOwnerValueKey(ownerPw: Array[Byte], r: Int, keyLen: Int): Array[Byte] = {
    var h = md5(padPassword(ownerPw))
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
    h.take(keyLen)
  }

  /** Algorithm 7 (b) (Encrypt.hs:103-106). */
  private def decryptOToUserPassword(oKey: Array[Byte], r: Int, o: Array[Byte]): Array[Byte] = {
    if (r <= 2) rc4(oKey, o)
    else {
      var ct = o
      var m = 19
      while (m >= 0) { ct = rc4(xorKey(oKey, m), ct); m -= 1 }
      ct
    }
  }

  /** Algorithm 2 (Encrypt.hs:168-182). */
  private def computeFileKey(pw: Array[Byte], o: Array[Byte], p: Int, fileId: Array[Byte],
      r: Int, keyLen: Int, metaEnc: Boolean): Array[Byte] = {
    val suffix = if (r >= 4 && !metaEnc) Array(0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte) else Array.emptyByteArray
    val base = padPassword(pw) ++ o ++ int32LE(p) ++ fileId ++ suffix
    var h = md5(base)
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h.take(keyLen)); i += 1 } }
    h.take(keyLen)
  }

  private def computeFileKeyAes(pw: Array[Byte], o: Array[Byte], p: Int, fileId: Array[Byte],
      r: Int, metaEnc: Boolean): Array[Byte] = {
    val suffix = if (r >= 4 && !metaEnc) Array(0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte) else Array.emptyByteArray
    val base = padPassword(pw) ++ o ++ int32LE(p) ++ fileId ++ suffix
    var h = md5(base)
    var i = 0
    while (i < 50) { h = md5(h.take(16)); i += 1 }
    h.take(16)
  }

  private def verifyUserPassword(r: Int, fileId: Array[Byte], key: Array[Byte], u: Array[Byte]): Boolean = {
    val computed = computeU(r, fileId, key)
    if (r >= 3) java.util.Arrays.equals(computed.take(16), u.take(16))
    else java.util.Arrays.equals(computed.take(32), u.take(32))
  }

  private def computeU(r: Int, fileId: Array[Byte], key: Array[Byte]): Array[Byte] = {
    if (r <= 2) rc4(key, padString)
    else {
      val hashed = md5(padString ++ fileId)
      var ct = rc4(key, hashed)
      var i = 1
      while (i <= 19) { ct = rc4(xorKey(key, i), ct); i += 1 }
      ct.take(16) ++ new Array[Byte](16)
    }
  }

  private def xorKey(key: Array[Byte], i: Int): Array[Byte] =
    key.map(b => (b ^ i).toByte)

  /** Per-object key (Encrypt.hs:216-224). */
  def objectKey(sec: Security, objNum: Int, genNum: Int): Array[Byte] = {
    val n = sec.keyLength
    val ext = sec.key.take(n) ++ int24LE(objNum) ++ int16LE(genNum)
    val digest = if (sec.aes) md5(ext ++ "sAlT".getBytes("ISO-8859-1")) else md5(ext)
    digest.take(math.min(n + 5, 16))
  }

  /** Linear-time RC4 keystream XOR (Encrypt.hs:254-292). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.isEmpty || key.isEmpty) return data.clone()
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var n = 0
    while (n < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(n) = (data(n) ^ s((s(x) + s(y)) & 0xff)).toByte
      n += 1
    }
    out
  }

  def rc4KeyStream(key: Array[Byte], n: Int): Array[Byte] =
    rc4(key, new Array[Byte](math.max(0, n)))

  def decryptString(sec: Security, objNum: Int, genNum: Int, bs: Array[Byte]): Array[Byte] =
    if (!sec.strEncrypted) bs else decryptBody(sec, objNum, genNum, bs)

  def decryptStream(sec: Security, objNum: Int, genNum: Int, bs: Array[Byte]): Array[Byte] =
    if (!sec.stmEncrypted) bs else decryptBody(sec, objNum, genNum, bs)

  private def decryptBody(sec: Security, objNum: Int, genNum: Int, bs: Array[Byte]): Array[Byte] = {
    if (sec.version >= 5) return stripPkcs7(aesDecrypt(sec.key, bs)) // V5: file key direct
    val ok = objectKey(sec, objNum, genNum)
    if (sec.aes) stripPkcs7(aesDecrypt(ok, bs)) else rc4(ok, bs)
  }

  private def stripPkcs7(bs: Array[Byte]): Array[Byte] = {
    if (bs.isEmpty) return bs
    val pad = bs(bs.length - 1) & 0xff
    if (pad >= 1 && pad <= 16 && bs.length >= pad &&
        bs.slice(bs.length - pad, bs.length).forall(_ == bs(bs.length - 1)))
      bs.take(bs.length - pad)
    else bs
  }

  /** AES-128-CBC: first 16 bytes are the IV; trailing partial block dropped
    * (Encrypt.hs:321-338). */
  private def aesDecrypt(key: Array[Byte], bs: Array[Byte]): Array[Byte] = {
    if (bs.length < 16) return bs
    try {
      val cipher = Cipher.getInstance("AES/ECB/NoPadding")
      cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"))
      val body = bs.drop(16)
      val nBlocks = body.length / 16
      val out = new Array[Byte](nBlocks * 16)
      var prev = bs.take(16)
      var b = 0
      while (b < nBlocks) {
        val block = body.slice(b * 16, b * 16 + 16)
        val plain = cipher.doFinal(block)
        var k = 0
        while (k < 16) { out(b * 16 + k) = (plain(k) ^ prev(k)).toByte; k += 1 }
        prev = block
        b += 1
      }
      out
    } catch { case _: Exception => bs }
  }
}
