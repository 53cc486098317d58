package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Protobuf ↔ JSON (the `protobuf` processor, `lib/processor/protobuf.go`:
  * operators to_json / from_json, `message` + `import_paths` pointing at
  * .proto sources). No protobuf runtime ships in this build image (only
  * Spark-internal shaded relocations), so this is a self-contained
  * implementation of the pieces the processor needs, all public wire
  * knowledge:
  *
  *  - the proto wire format (varint / zigzag / fixed / length-delimited,
  *    packed repeated scalars),
  *  - a .proto source subset parser (proto2/proto3: package, message,
  *    nested message/enum, repeated/optional/required, map<,>, oneof,
  *    imports resolved against import_paths; no services/extensions),
  *  - proto3 canonical JSON: lowerCamelCase names (original names
  *    accepted on input), defaults omitted, int64/uint64 as strings,
  *    bytes as base64, enums by name, maps as objects.
  *
  * Execution shape matches the avro processor: a scalar UDF per
  * direction — per-row byte work with no data-dependent plan, so it
  * parallelizes trivially; the parsed schema registry is built once on
  * the driver and serialized into the closure. */
object Protobuf {

  // ---------------- schema model ----------------

  sealed trait PType
  final case class Scalar(kind: String) extends PType // double,float,int32,...
  final case class MessageRef(fq: String) extends PType
  final case class EnumRef(fq: String) extends PType
  final case class MapT(key: Scalar, value: PType) extends PType

  final case class PField(name: String, number: Int, tpe: PType,
      repeated: Boolean) {
    val jsonName: String = PField.camel(name)
  }
  object PField {
    def camel(s: String): String = {
      val parts = s.split("_").toList
      (parts.head :: parts.tail.map(p =>
        if (p.isEmpty) p else p.head.toUpper +: p.tail)).mkString
    }
  }
  final case class PMessage(fq: String, fields: List[PField]) {
    val byNumber: Map[Int, PField] = fields.map(f => f.number -> f).toMap
  }
  final case class PEnum(fq: String, values: List[(String, Int)]) {
    val byNumber: Map[Int, String] = values.map(v => v._2 -> v._1).toMap
    val byName: Map[String, Int] = values.map(v => v._1 -> v._2).toMap
  }
  final case class Registry(messages: Map[String, PMessage],
      enums: Map[String, PEnum]) extends Serializable

  // ---------------- .proto source parser (subset) ----------------

  private final class Lexer(src: String) {
    private var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go) {
        go = false
        while (i < src.length && src.charAt(i).isWhitespace) { i += 1; go = true }
        if (i + 1 < src.length && src.charAt(i) == '/' && src.charAt(i + 1) == '/') {
          while (i < src.length && src.charAt(i) != '\n') i += 1
          go = true
        }
        if (i + 1 < src.length && src.charAt(i) == '/' && src.charAt(i + 1) == '*') {
          i += 2
          while (i + 1 < src.length && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
          i = math.min(i + 2, src.length); go = true
        }
      }
    }
    def eof: Boolean = { skipWs(); i >= src.length }
    def peek: Char = { skipWs(); src.charAt(i) }
    def next(): String = {
      skipWs()
      val c = src.charAt(i)
      if (c == '"' || c == '\'') {
        val quote = c; val sb = new StringBuilder; i += 1
        while (i < src.length && src.charAt(i) != quote) { sb += src.charAt(i); i += 1 }
        i += 1
        "\"" + sb.result() + "\""
      } else if (c.isLetterOrDigit || c == '_' || c == '.' || c == '-') {
        val start = i
        while (i < src.length && (src.charAt(i).isLetterOrDigit ||
          src.charAt(i) == '_' || src.charAt(i) == '.' || src.charAt(i) == '-')) i += 1
        src.substring(start, i)
      } else { i += 1; c.toString }
    }
    def expect(tok: String): Unit = {
      val got = next()
      require(got == tok, s"protobuf: expected '$tok', got '$got'")
    }
    /** Consume tokens up to and including the matching end of a bracketed
      * option annotation `[...]`. */
    def skipOptions(): Unit = {
      var depth = 1
      while (depth > 0) next() match {
        case "[" => depth += 1
        case "]" => depth -= 1
        case _ => ()
      }
    }
  }

  private val scalarKinds = Set("double", "float", "int32", "int64", "uint32",
    "uint64", "sint32", "sint64", "fixed32", "fixed64", "sfixed32",
    "sfixed64", "bool", "string", "bytes")

  /** Parse .proto sources. `sources` maps file name → content; `roots` are
    * the entry files (all of `sources` if empty). Returns a registry keyed
    * by fully-qualified names (no leading dot). */
  def parseSources(sources: Map[String, String]): Registry = {
    val messages = scala.collection.mutable.Map[String, PMessage]()
    val enums = scala.collection.mutable.Map[String, PEnum]()

    def parseEnum(lx: Lexer, scope: String): Unit = {
      val name = lx.next()
      val fq = if (scope.isEmpty) name else s"$scope.$name"
      lx.expect("{")
      val vals = scala.collection.mutable.ListBuffer[(String, Int)]()
      var tok = lx.next()
      while (tok != "}") {
        tok match {
          case "option" | "reserved" =>
            while (lx.peek != ';') lx.next()
            lx.expect(";")
          case vname =>
            lx.expect("=")
            val num = lx.next().toInt
            if (lx.peek == '[') { lx.expect("["); lx.skipOptions() }
            lx.expect(";")
            vals += ((vname, num))
        }
        tok = lx.next()
      }
      enums(fq) = PEnum(fq, vals.toList)
    }

    def parseMessage(lx: Lexer, scope: String): Unit = {
      val name = lx.next()
      val fq = if (scope.isEmpty) name else s"$scope.$name"
      lx.expect("{")
      val fields = scala.collection.mutable.ListBuffer[PField]()

      def parseField(first: String, repeated: Boolean): Unit = {
        // first = type token (possibly map); then name = number [opts] ;
        val tpe: PType =
          if (first == "map") {
            lx.expect("<")
            val k = lx.next(); lx.expect(",")
            val v = lx.next(); lx.expect(">")
            MapT(Scalar(k),
              if (scalarKinds(v)) Scalar(v) else MessageRef(resolvePlaceholder(v, fq)))
          } else if (scalarKinds(first)) Scalar(first)
          else MessageRef(resolvePlaceholder(first, fq)) // enum vs msg resolved later
        val fname = lx.next()
        lx.expect("=")
        val num = lx.next().toInt
        if (lx.peek == '[') { lx.expect("["); lx.skipOptions() }
        lx.expect(";")
        fields += PField(fname, num, tpe, repeated)
      }

      var tok = lx.next()
      while (tok != "}") {
        tok match {
          case "message" => parseMessage(lx, fq)
          case "enum" => parseEnum(lx, fq)
          case "option" | "reserved" =>
            while (lx.peek != ';') lx.next()
            lx.expect(";")
          case "oneof" =>
            lx.next(); lx.expect("{") // name
            var t2 = lx.next()
            while (t2 != "}") { parseField(t2, repeated = false); t2 = lx.next() }
          case "repeated" => parseField(lx.next(), repeated = true)
          case "optional" | "required" => parseField(lx.next(), repeated = false)
          case t => parseField(t, repeated = false)
        }
        tok = lx.next()
      }
      messages(fq) = PMessage(fq, fields.toList)
    }

    // type references are recorded scope-qualified ("<scope>%<name>") and
    // resolved once all declarations are known (C++-style scope walk)
    def resolvePlaceholder(name: String, scope: String): String = s"$scope%$name"

    sources.foreach { case (_, content) =>
      val lx = new Lexer(content)
      var pkg = ""
      while (!lx.eof) {
        lx.next() match {
          case "syntax" | "edition" =>
            lx.expect("="); lx.next(); lx.expect(";")
          case "package" => pkg = lx.next(); lx.expect(";")
          case "import" =>
            // files are pre-gathered from import_paths; token is the name
            var t = lx.next()
            if (t == "public" || t == "weak") t = lx.next()
            lx.expect(";")
          case "option" =>
            while (lx.peek != ';') lx.next()
            lx.expect(";")
          case "message" => parseMessage(lx, pkg)
          case "enum" => parseEnum(lx, pkg)
          case "" => ()
          case other =>
            throw new IllegalArgumentException(s"protobuf: unexpected '$other'")
        }
      }
    }

    // resolve scoped type references
    def resolve(ref: String): Either[String, String] = {
      val Array(scope, name) = ref.split("%", 2)
      val candidates =
        (scope.split('.').inits.map(p => (p :+ name).mkString(".")).toList :+ name)
          .distinct
      candidates.find(messages.contains).map(Left(_))
        .orElse(candidates.find(enums.contains).map(Right(_)))
        .getOrElse(throw new IllegalArgumentException(
          s"protobuf: unresolved type '$name' (scope $scope)"))
        match { case Left(m) => Left(m); case Right(e) => Right(e) }
    }
    def fixType(t: PType): PType = t match {
      case MessageRef(ref) if ref.contains("%") => resolve(ref) match {
        case Left(m) => MessageRef(m)
        case Right(e) => EnumRef(e)
      }
      case MapT(k, v) => MapT(k, fixType(v))
      case o => o
    }
    val fixed = messages.map { case (fq, m) =>
      fq -> m.copy(fields = m.fields.map(f => f.copy(tpe = fixType(f.tpe))))
    }.toMap
    Registry(fixed, enums.toMap)
  }

  /** Load .proto files from import path directories (the reference's
    * `import_paths`): every *.proto under each root is parsed. */
  def parseImportPaths(paths: scala.Seq[String]): Registry = {
    import java.nio.file._
    val sources = paths.flatMap { root =>
      val r = Paths.get(root)
      if (!Files.exists(r)) Nil
      else {
        val it = Files.walk(r).iterator()
        val buf = scala.collection.mutable.ListBuffer[(String, String)]()
        while (it.hasNext) {
          val p = it.next()
          if (p.toString.endsWith(".proto") && Files.isRegularFile(p))
            buf += (r.relativize(p).toString -> new String(
              Files.readAllBytes(p), "UTF-8"))
        }
        buf.toList
      }
    }.toMap
    parseSources(sources)
  }

  // ---------------- wire format ----------------

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    def varint(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      acc
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
  }

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def fixed32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def fixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def lengthDelim(b: Array[Byte]): Unit = { varint(b.length); raw(b) }
    def result(): Array[Byte] = out.toByteArray
  }

  private def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1)
  private def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  private def wireTypeOf(t: PType): Int = t match {
    case Scalar("double" | "fixed64" | "sfixed64") => 1
    case Scalar("float" | "fixed32" | "sfixed32") => 5
    case Scalar("string" | "bytes") => 2
    case Scalar(_) => 0 // varint family
    case EnumRef(_) => 0
    case _ => 2
  }

  // ---------------- decode → JSON ----------------

  private val mapper = new ObjectMapper()

  /** Decode one message; returns a Jackson ObjectNode (proto3 JSON). */
  private def decodeMessage(buf: Array[Byte], msg: PMessage,
      reg: Registry): ObjectNode = {
    val node = mapper.createObjectNode()
    val rd = new Reader(buf)
    def scalarJson(kind: String, rd: Reader, wire: Int): JsonNode = kind match {
      case "double" => node.numberNode(java.lang.Double.longBitsToDouble(rd.fixed64()))
      case "float" => node.numberNode(java.lang.Float.intBitsToFloat(rd.fixed32()))
      case "int32" | "int64" =>
        val v = rd.varint()
        if (kind == "int32") node.numberNode(v.toInt) else node.textNode(v.toString)
      case "uint32" => node.numberNode(rd.varint().toInt & 0xffffffffL)
      case "uint64" => node.textNode(java.lang.Long.toUnsignedString(rd.varint()))
      case "sint32" => node.numberNode(zigzagDecode(rd.varint()).toInt)
      case "sint64" => node.textNode(zigzagDecode(rd.varint()).toString)
      case "fixed32" => node.numberNode(rd.fixed32() & 0xffffffffL)
      case "fixed64" => node.textNode(java.lang.Long.toUnsignedString(rd.fixed64()))
      case "sfixed32" => node.numberNode(rd.fixed32())
      case "sfixed64" => node.textNode(rd.fixed64().toString)
      case "bool" => node.booleanNode(rd.varint() != 0)
      case "string" => node.textNode(new String(rd.bytes(rd.varint().toInt), "UTF-8"))
      case "bytes" => node.textNode(java.util.Base64.getEncoder
        .encodeToString(rd.bytes(rd.varint().toInt)))
      case o => throw new IllegalArgumentException(s"protobuf: bad scalar $o")
    }
    while (rd.hasMore) {
      val key = rd.varint()
      val fieldNum = (key >>> 3).toInt
      val wire = (key & 7).toInt
      msg.byNumber.get(fieldNum) match {
        case None => // unknown field: skip by wire type
          wire match {
            case 0 => rd.varint()
            case 1 => rd.fixed64()
            case 2 => rd.bytes(rd.varint().toInt)
            case 5 => rd.fixed32()
            case o => throw new IllegalArgumentException(s"protobuf: wire $o")
          }
        case Some(f) =>
          def add(v: JsonNode): Unit =
            if (f.repeated) {
              val arr = Option(node.get(f.jsonName)) match {
                case Some(a: ArrayNode) => a
                case _ => val a = node.putArray(f.jsonName); a
              }
              arr.add(v)
            } else node.set[JsonNode](f.jsonName, v)
          f.tpe match {
            case Scalar(kind) =>
              if (f.repeated && wire == 2 && kind != "string" && kind != "bytes") {
                // packed
                val end = { val len = rd.varint().toInt; rd.pos + len }
                while (rd.pos < end) add(scalarJson(kind, rd, 0))
              } else add(scalarJson(kind, rd, wire))
            case EnumRef(fq) =>
              val num = rd.varint().toInt
              val en = reg.enums(fq)
              add(en.byNumber.get(num).map(node.textNode)
                .getOrElse(node.numberNode(num)))
            case MessageRef(fq) =>
              val sub = rd.bytes(rd.varint().toInt)
              add(decodeMessage(sub, reg.messages(fq), reg))
            case MapT(k, v) =>
              // map entry = message {1: key, 2: value}
              val sub = rd.bytes(rd.varint().toInt)
              val er = new Reader(sub)
              var keyStr = ""
              var valNode: JsonNode = node.nullNode()
              while (er.hasMore) {
                val ekey = er.varint()
                ((ekey >>> 3).toInt: @unchecked) match {
                  case 1 => keyStr = k.kind match {
                    case "string" => new String(er.bytes(er.varint().toInt), "UTF-8")
                    case "bool" => (er.varint() != 0).toString
                    case "sint32" | "sint64" => zigzagDecode(er.varint()).toString
                    case "fixed32" => (er.fixed32() & 0xffffffffL).toString
                    case "sfixed32" => er.fixed32().toString
                    case "fixed64" | "sfixed64" => er.fixed64().toString
                    case _ => er.varint().toString
                  }
                  case 2 => valNode = v match {
                    case Scalar(kind) => scalarJson(kind, er, wireTypeOf(v))
                    case EnumRef(fq) =>
                      val num = er.varint().toInt
                      reg.enums(fq).byNumber.get(num).map(node.textNode)
                        .getOrElse(node.numberNode(num))
                    case MessageRef(fq) =>
                      decodeMessage(er.bytes(er.varint().toInt),
                        reg.messages(fq), reg)
                    case MapT(_, _) =>
                      throw new IllegalArgumentException("protobuf: nested map")
                  }
                }
              }
              val obj = Option(node.get(f.jsonName)) match {
                case Some(o: ObjectNode) => o
                case _ => val o = node.putObject(f.jsonName); o
              }
              obj.set[JsonNode](keyStr, valNode)
          }
      }
    }
    node
  }

  // ---------------- JSON → encode ----------------

  private def encodeMessage(json: JsonNode, msg: PMessage,
      reg: Registry): Array[Byte] = {
    val w = new Writer()
    def isDefault(kind: String, n: JsonNode): Boolean = kind match {
      case "string" => n.asText("").isEmpty
      case "bytes" => n.asText("").isEmpty
      case "bool" => !n.asBoolean(false)
      case "double" | "float" => n.asDouble(0) == 0.0
      case _ => n.asText("0") == "0" && n.asLong(0) == 0L
    }
    def writeScalar(kind: String, n: JsonNode, field: Int,
        packedInto: Option[Writer]): Unit = {
      val target = packedInto.getOrElse(w)
      def tagged(wire: Int): Unit =
        if (packedInto.isEmpty) w.tag(field, wire)
      kind match {
        case "double" => tagged(1); target.fixed64(
          java.lang.Double.doubleToLongBits(n.asDouble()))
        case "float" => tagged(5); target.fixed32(
          java.lang.Float.floatToIntBits(n.asDouble().toFloat))
        case "int32" | "int64" | "uint32" =>
          tagged(0); target.varint(n.asLong())
        case "uint64" =>
          tagged(0); target.varint(java.lang.Long.parseUnsignedLong(n.asText()))
        case "sint32" | "sint64" =>
          tagged(0); target.varint(zigzagEncode(n.asLong()))
        case "fixed32" | "sfixed32" => tagged(5); target.fixed32(n.asLong().toInt)
        case "fixed64" | "sfixed64" => tagged(1); target.fixed64(
          if (n.isTextual) java.lang.Long.parseUnsignedLong(n.asText()) else n.asLong())
        case "bool" => tagged(0); target.varint(if (n.asBoolean()) 1 else 0)
        case "string" =>
          tagged(2); target.lengthDelim(n.asText().getBytes("UTF-8"))
        case "bytes" =>
          tagged(2); target.lengthDelim(
            java.util.Base64.getDecoder.decode(n.asText()))
        case o => throw new IllegalArgumentException(s"protobuf: bad scalar $o")
      }
    }
    msg.fields.foreach { f =>
      val value = Option(json.get(f.jsonName)).orElse(Option(json.get(f.name)))
      value.filterNot(_.isNull).foreach { n =>
        f.tpe match {
          case Scalar(kind) =>
            if (f.repeated) {
              val items = n.elements()
              if (kind == "string" || kind == "bytes") {
                while (items.hasNext) writeScalar(kind, items.next(), f.number, None)
              } else {
                val packed = new Writer()
                while (items.hasNext) writeScalar(kind, items.next(), f.number, Some(packed))
                val body = packed.result()
                if (body.nonEmpty) { w.tag(f.number, 2); w.lengthDelim(body) }
              }
            } else if (!isDefault(kind, n)) writeScalar(kind, n, f.number, None)
          case EnumRef(fq) =>
            val en = reg.enums(fq)
            def numOf(x: JsonNode): Long =
              if (x.isTextual) en.byName(x.asText()).toLong else x.asLong()
            if (f.repeated) {
              val packed = new Writer()
              n.elements().forEachRemaining(x => packed.varint(numOf(x)))
              val body = packed.result()
              if (body.nonEmpty) { w.tag(f.number, 2); w.lengthDelim(body) }
            } else if (numOf(n) != 0L) { w.tag(f.number, 0); w.varint(numOf(n)) }
          case MessageRef(fq) =>
            val sub = reg.messages(fq)
            if (f.repeated) n.elements().forEachRemaining { x =>
              w.tag(f.number, 2); w.lengthDelim(encodeMessage(x, sub, reg))
            } else { w.tag(f.number, 2); w.lengthDelim(encodeMessage(n, sub, reg)) }
          case MapT(k, v) =>
            n.fields().forEachRemaining { e =>
              val ew = new Writer()
              // key (field 1)
              k.kind match {
                case "string" => ew.tag(1, 2); ew.lengthDelim(e.getKey.getBytes("UTF-8"))
                case "bool" => ew.tag(1, 0); ew.varint(if (e.getKey == "true") 1 else 0)
                case "sint32" | "sint64" =>
                  ew.tag(1, 0); ew.varint(zigzagEncode(e.getKey.toLong))
                case "fixed32" | "sfixed32" => ew.tag(1, 5); ew.fixed32(e.getKey.toInt)
                case "fixed64" | "sfixed64" =>
                  ew.tag(1, 1); ew.fixed64(java.lang.Long.parseUnsignedLong(e.getKey))
                case _ => ew.tag(1, 0); ew.varint(e.getKey.toLong)
              }
              // value (field 2)
              v match {
                case Scalar(kind) =>
                  val vw = new Writer()
                  vw.tag(2, wireTypeOf(v))
                  // writeScalar writes the tag through `w`; write inline:
                  val saved = vw
                  kind match {
                    case "double" => saved.fixed64(java.lang.Double.doubleToLongBits(e.getValue.asDouble()))
                    case "float" => saved.fixed32(java.lang.Float.floatToIntBits(e.getValue.asDouble().toFloat))
                    case "string" => saved.lengthDelim(e.getValue.asText().getBytes("UTF-8"))
                    case "bytes" => saved.lengthDelim(java.util.Base64.getDecoder.decode(e.getValue.asText()))
                    case "bool" => saved.varint(if (e.getValue.asBoolean()) 1 else 0)
                    case "sint32" | "sint64" => saved.varint(zigzagEncode(e.getValue.asLong()))
                    case "fixed32" | "sfixed32" => saved.fixed32(e.getValue.asLong().toInt)
                    case "fixed64" | "sfixed64" => saved.fixed64(e.getValue.asLong())
                    case _ => saved.varint(e.getValue.asLong())
                  }
                  ew.raw(saved.result())
                case EnumRef(fq) =>
                  val en = reg.enums(fq)
                  ew.tag(2, 0)
                  ew.varint(if (e.getValue.isTextual) en.byName(e.getValue.asText()).toLong
                    else e.getValue.asLong())
                case MessageRef(fq) =>
                  ew.tag(2, 2)
                  ew.lengthDelim(encodeMessage(e.getValue, reg.messages(fq), reg))
                case MapT(_, _) =>
                  throw new IllegalArgumentException("protobuf: nested map")
              }
              w.tag(f.number, 2); w.lengthDelim(ew.result())
            }
        }
      }
    }
    w.result()
  }

  // ---------------- public API ----------------

  def toJson(bytes: Array[Byte], message: String, reg: Registry): String =
    mapper.writeValueAsString(decodeMessage(bytes, reg.messages(message), reg))

  def fromJson(json: String, message: String, reg: Registry): Array[Byte] =
    encodeMessage(mapper.readTree(json), reg.messages(message), reg)

  /** `protobuf` processor columns. */
  def protoToJsonCol(c: Column, message: String, reg: Registry): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null
      else try toJson(b, message, reg) catch { case _: Exception => null })
    f(c)
  }

  def jsonToProtoCol(c: Column, message: String, reg: Registry): Column = {
    val f = udf((s: String) => if (s == null) null
      else try fromJson(s, message, reg) catch { case _: Exception => null })
    f(c)
  }
}
