package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native compress/decompress kernel for the `compress`/`decompress`
  * processors (`lib/processor/compress.go:138-146`, `decompress.go`).
  *
  * The round-2/3 implementation was a pair of scalar UDFs; profiling the
  * q44 roundtrip showed the cost is dominated not by zlib itself but by
  * per-row allocation: a fresh `Deflater`/`Inflater` (a native zlib
  * stream each) plus two `ByteArrayOutputStream` copies per value. This
  * Expression keeps ONE pooled Deflater+Inflater and ONE growable buffer
  * per task (expressions are instantiated per task, single-threaded), so
  * the steady-state cost per row is the zlib call plus a single
  * exact-size copy of the output.
  *
  * gzip is framed by hand around the raw (nowrap) deflate stream —
  * 10-byte header, CRC32 + ISIZE trailer, exactly the fixed frame Go's
  * gzip writer emits with no name/mtime — so the pooled nowrap codec
  * serves gzip, zlib and flate alike. Decode tolerates the optional
  * FEXTRA/FNAME/FCOMMENT/FHCRC header fields.
  */
case class CodecExpr(child: Expression, alg: String, compressing: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  @transient private lazy val deflaterRaw =
    new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  @transient private lazy val deflaterZlib =
    new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
  @transient private lazy val inflaterRaw = new java.util.zip.Inflater(true)
  @transient private lazy val inflaterZlib = new java.util.zip.Inflater(false)
  @transient private lazy val crc = new java.util.zip.CRC32
  // growable scratch output; sized once per task to the running maximum
  @transient private var buf: Array[Byte] = _

  private def ensure(n: Int): Unit =
    if (buf == null) buf = new Array[Byte](math.max(n, 1 << 16))
    else if (buf.length < n)
      // grow preserving contents — deflate/inflate write incrementally
      buf = java.util.Arrays.copyOf(buf, math.max(n, buf.length * 2))

  private def deflateAll(d: java.util.zip.Deflater, b: Array[Byte],
      off: Int): Int = {
    d.reset()
    d.setInput(b)
    d.finish()
    var pos = off
    while (!d.finished()) {
      ensure(pos + 8192)
      pos += d.deflate(buf, pos, buf.length - pos)
    }
    pos
  }

  private def inflateAll(i: java.util.zip.Inflater, b: Array[Byte],
      off: Int, len: Int): Int = {
    i.reset()
    i.setInput(b, off, len)
    var pos = 0
    while (!i.finished()) {
      ensure(pos + 8192)
      val n = i.inflate(buf, pos, buf.length - pos)
      pos += n
      // order matters: a stream can finish on a 0-byte return (empty
      // payload) with needsInput() already true — that's success
      if (n == 0 && !i.finished() && (i.needsInput() || i.needsDictionary()))
        throw new java.util.zip.DataFormatException("truncated stream")
    }
    pos
  }

  private def gzipCompress(b: Array[Byte]): Array[Byte] = {
    ensure(b.length / 2 + 64)
    // fixed header: magic, CM=deflate, no flags, mtime 0, XFL 0, OS 255
    buf(0) = 0x1f; buf(1) = 0x8b.toByte; buf(2) = 8
    java.util.Arrays.fill(buf, 3, 9, 0.toByte)
    buf(9) = 255.toByte
    var pos = deflateAll(deflaterRaw, b, 10)
    crc.reset(); crc.update(b)
    val c = crc.getValue
    ensure(pos + 8)
    var v = c
    var k = 0
    while (k < 4) { buf(pos) = (v & 0xff).toByte; v >>= 8; pos += 1; k += 1 }
    var sz = b.length.toLong
    k = 0
    while (k < 4) { buf(pos) = (sz & 0xff).toByte; sz >>= 8; pos += 1; k += 1 }
    java.util.Arrays.copyOf(buf, pos)
  }

  private def gzipDecompress(b: Array[Byte]): Array[Byte] = {
    if (b.length < 18 || b(0) != 0x1f || b(1) != 0x8b.toByte || b(2) != 8)
      throw new java.util.zip.DataFormatException("not a gzip stream")
    val flg = b(3) & 0xff
    var off = 10
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      off += 2 + xlen
    }
    if ((flg & 8) != 0) { while (b(off) != 0) off += 1; off += 1 }  // FNAME
    if ((flg & 16) != 0) { while (b(off) != 0) off += 1; off += 1 } // FCOMMENT
    if ((flg & 2) != 0) off += 2                                    // FHCRC
    val n = inflateAll(inflaterRaw, b, off, b.length - off - 8)
    java.util.Arrays.copyOf(buf, n)
  }

  private def run(b: Array[Byte]): Array[Byte] = (alg, compressing) match {
    case ("gzip", true) => gzipCompress(b)
    case ("gzip", false) => gzipDecompress(b)
    // bind the length BEFORE touching buf: deflate/inflate may reallocate
    // the scratch buffer, and copyOf(buf, f(...)) would capture the old one
    case ("zlib", true) =>
      val n = deflateAll(deflaterZlib, b, 0); java.util.Arrays.copyOf(buf, n)
    case ("zlib", false) =>
      val n = inflateAll(inflaterZlib, b, 0, b.length)
      java.util.Arrays.copyOf(buf, n)
    case ("flate", true) =>
      val n = deflateAll(deflaterRaw, b, 0); java.util.Arrays.copyOf(buf, n)
    case ("flate", false) =>
      val n = inflateAll(inflaterRaw, b, 0, b.length)
      java.util.Arrays.copyOf(buf, n)
    case ("snappy", true) => org.xerial.snappy.Snappy.compress(b)
    case ("snappy", false) => org.xerial.snappy.Snappy.uncompress(b)
    case ("lz4", true) =>
      val out = new java.io.ByteArrayOutputStream()
      val s = new net.jpountz.lz4.LZ4FrameOutputStream(out)
      s.write(b); s.close(); out.toByteArray
    case ("lz4", false) =>
      val in = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { out.write(tmp, 0, n); n = in.read(tmp) }
      out.toByteArray
    case (o, _) =>
      throw new IllegalArgumentException(s"unknown compression algorithm $o")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (compressing) run(b)
    // decompress is permissive (reference error-flag contract): bad
    // streams yield null, never a query-killing exception
    else try run(b) catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): CodecExpr =
    copy(child = newChild)
}

object CodecExpr {
  private def wrap(c: Column, alg: String, compressing: Boolean): Column = {
    // validate the algorithm eagerly (construction-time error, matching
    // the previous UDF contract), not per-row inside eval
    require(scala.Seq("gzip", "zlib", "flate", "snappy", "lz4").contains(alg),
      s"unknown compression algorithm $alg")
    org.apache.spark.sql.GraftBridge.column(
      CodecExpr(org.apache.spark.sql.GraftBridge.expression(c), alg, compressing))
  }
  def compress(c: Column, alg: String): Column = wrap(c, alg, compressing = true)
  def decompress(c: Column, alg: String): Column = wrap(c, alg, compressing = false)
}
