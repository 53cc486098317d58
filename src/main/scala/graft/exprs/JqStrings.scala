package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** String helpers for the jq builtin tail (`lib/processor/jq.go` embeds
  * gojq, whose standard library includes `match`, `indices`, `explode`,
  * `implode` and the `@base32`/`@base32d` format strings). Like the
  * base85/aes/hmac helpers in [[Codecs]], these are rarely-hot
  * correctness surface — plain UDFs, not native expressions; the hot
  * paths (dedup kernels, signatures) keep their hand-written codegen.
  *
  * All offsets/lengths are in CODEPOINTS, matching jq's spec ("offset" /
  * "length" count Unicode codepoints, not UTF-16 units or bytes).
  */
object JqStrings {

  /** jq match object: one per regex match. `captures` has one entry per
    * group in the pattern; a non-participating group reports offset -1,
    * length 0 and a null string (gojq's shape). */
  final case class JqCapture(offset: Long, length: Long, string: String,
      name: String)
  final case class JqMatch(offset: Long, length: Long, string: String,
      captures: Seq[JqCapture])

  private def cp(s: String, utf16: Int): Long =
    s.codePointCount(0, utf16).toLong

  def matchAll(s: String, pattern: String, names: Seq[Option[String]],
      global: Boolean): Seq[JqMatch] = {
    val m = java.util.regex.Pattern.compile(pattern).matcher(s)
    val out = scala.collection.mutable.ListBuffer[JqMatch]()
    var go = true
    while (go && m.find()) {
      val caps = (1 to m.groupCount()).map { g =>
        if (m.start(g) < 0) JqCapture(-1L, 0L, null,
          names.lift(g - 1).flatten.orNull)
        else JqCapture(cp(s, m.start(g)),
          cp(s, m.end(g)) - cp(s, m.start(g)), m.group(g),
          names.lift(g - 1).flatten.orNull)
      }
      out += JqMatch(cp(s, m.start), cp(s, m.end) - cp(s, m.start),
        m.group(), caps)
      go = global
      // zero-width matches can't loop: Java's Matcher.find() advances
      // one position past an empty previous match on its own
    }
    out.toSeq
  }

  def matchAllCol(c: Column, pattern: String, names: Seq[Option[String]],
      global: Boolean): Column =
    udf((s: String) => if (s == null) null
      else try matchAll(s, pattern, names, global)
      catch { case _: Exception => null }).apply(c)

  /** jq `indices(sub)` on a string: every (possibly overlapping)
    * codepoint index where `sub` begins — gojq scans forward one
    * character at a time. */
  def strIndices(s: String, sub: String): Seq[Long] = {
    if (sub.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ListBuffer[Long]()
    var from = 0
    var at = s.indexOf(sub, from)
    while (at >= 0) {
      out += cp(s, at)
      from = at + 1
      at = s.indexOf(sub, from)
    }
    out.toSeq
  }

  def strIndicesCol(c: Column, sub: Column): Column =
    udf((s: String, n: String) => if (s == null || n == null) null
      else strIndices(s, n)).apply(c, sub)

  /** jq `explode`: string to array of codepoints. */
  def explodeCol(c: Column): Column =
    udf((s: String) => if (s == null) null
      else s.codePoints().toArray.map(_.toLong).toSeq).apply(c)

  /** jq `implode`: array of codepoints to string. */
  def implodeCol(c: Column): Column =
    udf((cps: Seq[Long]) => if (cps == null) null
      else {
        val sb = new java.lang.StringBuilder
        cps.foreach(p => sb.appendCodePoint(p.toInt))
        sb.toString
      }).apply(c)

  // ----- base32 (RFC 4648, standard alphabet with padding — what
  // gojq's @base32/@base32d produce/consume via Go encoding/base32) -----
  private val b32Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val b32Decoder: Array[Int] = {
    val d = Array.fill(128)(-1)
    b32Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  def base32Encode(b: Array[Byte]): String = {
    val sb = new StringBuilder((b.length + 4) / 5 * 8)
    var i = 0
    while (i < b.length) {
      val n = math.min(5, b.length - i)
      var v = 0L
      var j = 0
      while (j < 5) { v = (v << 8) | (if (j < n) b(i + j) & 0xffL else 0L); j += 1 }
      // ceil(n*8/5) output chars, rest '='
      val chars = n match {
        case 1 => 2; case 2 => 4; case 3 => 5; case 4 => 7; case _ => 8
      }
      var k = 0
      while (k < 8) {
        sb.append(
          if (k < chars) b32Alphabet(((v >> (35 - 5 * k)) & 31).toInt)
          else '=')
        k += 1
      }
      i += 5
    }
    sb.toString
  }

  def base32Decode(s: String): Array[Byte] = {
    val clean = s.filter(_ != '=')
    val out = new java.io.ByteArrayOutputStream(clean.length * 5 / 8)
    var i = 0
    while (i < clean.length) {
      val n = math.min(8, clean.length - i)
      var v = 0L
      var j = 0
      while (j < 8) {
        val d = if (j < n) b32Decoder(clean.charAt(i + j).toInt) else 0
        require(d >= 0, s"base32: invalid character '${clean.charAt(i + j)}'")
        v = (v << 5) | d
        j += 1
      }
      val bytes = n match {
        case 2 => 1; case 4 => 2; case 5 => 3; case 7 => 4; case _ => 5
      }
      var k = 0
      while (k < bytes) { out.write(((v >> (32 - 8 * k)) & 0xff).toInt); k += 1 }
      i += 8
    }
    out.toByteArray
  }

  def base32EncodeCol(c: Column): Column =
    udf((b: Array[Byte]) => if (b == null) null else base32Encode(b)).apply(c)
  def base32DecodeCol(c: Column): Column =
    udf((s: String) => if (s == null) null
      else try base32Decode(s) catch { case _: Exception => null }).apply(c)
}
