package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Binary codecs for the `compress`/`decompress` processors and Bloblang
  * methods (`lib/processor/compress.go:138-146`, `decompress.go`) and the
  * `hash(hmac_*)` method family (`methods_strings.go:683`).
  *
  * compress/decompress route through [[CodecExpr]] — a native Expression
  * with per-task pooled Deflater/Inflater (the per-row native-stream
  * allocation of the earlier UDF pair dominated the q44 roundtrip). The
  * rarely-hot base85/aes/hmac helpers below remain UDFs.
  */
object Codecs {

  def compress(c: Column, alg: String): Column = CodecExpr.compress(c, alg)

  def decompress(c: Column, alg: String): Column = CodecExpr.decompress(c, alg)

  /** ASCII85 (Go encoding/ascii85 flavor, no <~ ~> frame, 'z' shorthand
    * on encode like Go's Encode). */
  def ascii85Encode(b: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < b.length) {
      val n = math.min(4, b.length - i)
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (if (j < n) b(i + j) & 0xffL else 0L); j += 1 }
      if (v == 0 && n == 4) sb.append('z')
      else {
        val chunk = new Array[Char](5)
        var k = 4
        var rem = v
        while (k >= 0) { chunk(k) = ((rem % 85) + 33).toChar; rem /= 85; k -= 1 }
        sb.appendAll(chunk, 0, n + 1)
      }
      i += 4
    }
    sb.toString
  }

  def ascii85Decode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == 'z') { out.write(Array[Byte](0, 0, 0, 0)); i += 1 }
      else {
        val n = math.min(5, s.length - i)
        var v = 0L
        var j = 0
        while (j < 5) {
          val c = if (j < n) s.charAt(i + j) - 33 else 84
          v = v * 85 + c
          j += 1
        }
        val bytes = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        out.write(bytes, 0, n - 1)
        i += 5
      }
    }
    out.toByteArray
  }

  /** Z85 (ZeroMQ base85, RFC-32/Z85 alphabet; input must be a multiple of
    * 4 bytes, as the spec requires). */
  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decoder: Array[Int] = {
    val d = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, idx) => d(c.toInt) = idx }
    d
  }

  def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, "z85: input length must be a multiple of 4")
    val sb = new StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (b(i + j) & 0xffL); j += 1 }
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) { chunk(k) = z85Alphabet(((v % 85).toInt)); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, "z85: input length must be a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = z85Decoder(s.charAt(i + j).toInt)
        require(d >= 0, s"z85: invalid character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >> 24) & 0xff).toByte
      out(o + 1) = ((v >> 16) & 0xff).toByte
      out(o + 2) = ((v >> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      i += 5; o += 4
    }
    out
  }

  def z85EncodeCol(c: Column): Column =
    udf((b: Array[Byte]) => if (b == null) null
      else try z85Encode(b) catch { case _: Exception => null }).apply(c)
  def z85DecodeCol(c: Column): Column =
    udf((s: String) => if (s == null) null
      else try z85Decode(s) catch { case _: Exception => null }).apply(c)

  def ascii85EncodeCol(c: Column): Column =
    udf((b: Array[Byte]) => if (b == null) null else ascii85Encode(b)).apply(c)
  def ascii85DecodeCol(c: Column): Column =
    udf((s: String) => if (s == null) null
      else try ascii85Decode(s) catch { case _: Exception => null }).apply(c)

  /** AES with an explicit IV — the reference's encrypt_aes(scheme, key,
    * iv) contract (methods_strings.go:263): deterministic output (no
    * random-IV envelope), schemes ctr / ofb / cbc. ctr and ofb are
    * stream modes (encrypt ≡ decrypt); cbc mirrors Go's block mode
    * (input must be a multiple of 16 bytes — no implicit padding). */
  def aesIv(data: Column, scheme: String, key: Column, iv: Column,
      encrypting: Boolean): Column = {
    val (transformation, modeConst) = scheme match {
      case "ctr" => ("AES/CTR/NoPadding", 0)
      case "ofb" => ("AES/OFB/NoPadding", 0)
      case "cbc" => ("AES/CBC/NoPadding",
        if (encrypting) javax.crypto.Cipher.ENCRYPT_MODE
        else javax.crypto.Cipher.DECRYPT_MODE)
      case o => throw new IllegalArgumentException(
        s"encrypt_aes: unknown scheme $o (ctr/ofb/cbc)")
    }
    val enc = encrypting
    udf((b: Array[Byte], k: Array[Byte], v: Array[Byte]) =>
      if (b == null || k == null || v == null) null
      else try {
        val c = javax.crypto.Cipher.getInstance(transformation)
        val mode =
          if (modeConst != 0) modeConst
          else if (enc) javax.crypto.Cipher.ENCRYPT_MODE
          else javax.crypto.Cipher.DECRYPT_MODE // same keystream for ctr/ofb
        c.init(mode, new javax.crypto.spec.SecretKeySpec(k, "AES"),
          new javax.crypto.spec.IvParameterSpec(v))
        c.doFinal(b)
      } catch { case _: Exception => null }).apply(data, key, iv)
  }

  /** HMAC (hex output) — hmac_sha1/hmac_sha256/hmac_sha512. */
  def hmacHex(c: Column, alg: String, key: String): Column = {
    val jAlg = alg match {
      case "hmac_sha1" => "HmacSHA1"
      case "hmac_sha256" => "HmacSHA256"
      case "hmac_sha512" => "HmacSHA512"
      case o => throw new IllegalArgumentException(s"unknown hmac algorithm $o")
    }
    val keyBytes = key.getBytes("UTF-8")
    udf((b: Array[Byte]) => if (b == null) null else {
      val mac = javax.crypto.Mac.getInstance(jAlg)
      mac.init(new javax.crypto.spec.SecretKeySpec(keyBytes, jAlg))
      mac.doFinal(b).map("%02x".format(_)).mkString
    }).apply(c)
  }
}
