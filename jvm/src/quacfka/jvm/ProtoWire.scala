package quacfka.jvm

/* JVM-side protobuf wire-format codec — the fast path for reference D7.
 *
 * The reference's payloads are protobuf (/root/reference/README.md:6;
 * proto.go:78-172 decodes them with generated Go code). Spark's own
 * `from_protobuf` lives in the spark-protobuf connector jar, which is not
 * distributable into this offline environment — so this file implements
 * the public protobuf wire format (developers.google.com/protocol-buffers/
 * docs/encoding) directly against the Spark Java UDF API and is compiled
 * locally with the Scala 2.13 compiler (tools/build_jvm.sh). It is the
 * JVM twin of quacfka_spark/sources/proto_wire.py: same spec model, same
 * permissive bad-record semantics (D8: undecodable payload -> NULL row,
 * callers filter), same output shape, verified equivalent by
 * tests/test_proto_jvm.py.
 *
 * Wire format essentials: a message is a sequence of (key, value) pairs;
 * key = varint `(field_number << 3) | wire_type`; wire types 0=varint,
 * 1=fixed64, 2=length-delimited (strings, bytes, nested messages, packed
 * repeated scalars), 5=fixed32. Unknown fields are skipped, and — per
 * standard proto parser semantics — a known field arriving with a
 * mismatched wire type is treated as unknown (value consumed and
 * discarded, row kept), matching the Python twin exactly. Truncated or
 * structurally malformed input raises and the row is dropped.
 *
 * The message schema arrives as a compact spec string (one per query,
 * parsed once and cached), e.g.
 *   "1:site:msg{1:id:int64;2:name:string};2:user_id:int64;4:deals:msg{1:id:int64}*"
 * Grammar: fields `number:name:type` separated by `;`, `*` suffix marks
 * repeated, `msg{...}` nests. quacfka_spark/sources/proto_jvm.py renders
 * this from the Python MessageSpec, so both decoders share one schema
 * source of truth.
 */

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.api.java.UDF2

object ProtoWire {
  // scalar type ids (dense ints so match compiles to a tableswitch)
  final val INT64 = 0; final val INT32 = 1; final val UINT64 = 2
  final val SINT64 = 3; final val SINT32 = 4; final val BOOL = 5; final val ENUM = 6
  final val DOUBLE = 7; final val FLOAT = 8
  final val FIXED64 = 9; final val SFIXED64 = 10; final val FIXED32 = 11; final val SFIXED32 = 12
  final val STRING = 13; final val BYTES = 14; final val MESSAGE = 15

  private val typeNames: Map[String, Int] = Map(
    "int64" -> INT64, "int32" -> INT32, "uint64" -> UINT64, "sint64" -> SINT64,
    "sint32" -> SINT32, "bool" -> BOOL, "enum" -> ENUM, "double" -> DOUBLE,
    "float" -> FLOAT, "fixed64" -> FIXED64, "sfixed64" -> SFIXED64,
    "fixed32" -> FIXED32, "sfixed32" -> SFIXED32, "string" -> STRING, "bytes" -> BYTES)

  private def isVarint(t: Int): Boolean = t <= ENUM
  private def isFixed64(t: Int): Boolean = t == DOUBLE || t == FIXED64 || t == SFIXED64
  private def isFixed32(t: Int): Boolean = t == FLOAT || t == FIXED32 || t == SFIXED32

  final class FieldSpec(val number: Int, val name: String, val tpe: Int,
                        val repeated: Boolean, val msg: MessageSpec, val index: Int)

  final class MessageSpec(val fields: Array[FieldSpec]) {
    // dense field-number -> spec lookup; field numbers here are small
    private val byNumber: Array[FieldSpec] = {
      val max = fields.iterator.map(_.number).max
      require(max <= 4096, s"field number $max unsupported (>4096)")
      val arr = new Array[FieldSpec](max + 1)
      fields.foreach(f => arr(f.number) = f)
      arr
    }
    def lookup(no: Int): FieldSpec =
      if (no > 0 && no < byNumber.length) byNumber(no) else null
  }

  // ---------------------------------------------------------------------
  // spec string parsing (once per distinct spec; cached)

  private val specCache = new ConcurrentHashMap[String, MessageSpec]()

  def specFor(s: String): MessageSpec =
    specCache.computeIfAbsent(s, parseSpec(_))

  def parseSpec(s: String): MessageSpec = {
    val c = new Cursor(s)
    val m = parseMessage(c)
    require(c.i == s.length, s"trailing input in spec at offset ${c.i}")
    m
  }

  private final class Cursor(val s: String) { var i = 0 }

  private def parseMessage(c: Cursor): MessageSpec = {
    val fields = ArrayBuffer.empty[FieldSpec]
    while (c.i < c.s.length && c.s.charAt(c.i) != '}') {
      if (c.s.charAt(c.i) == ';') c.i += 1
      else { fields += parseField(c, fields.length) }
    }
    require(fields.nonEmpty, "empty message spec")
    new MessageSpec(fields.toArray)
  }

  private def parseField(c: Cursor, idx: Int): FieldSpec = {
    val number = parseInt(c); expect(c, ':')
    val name = parseName(c); expect(c, ':')
    var tpe = -1; var msg: MessageSpec = null
    if (c.s.startsWith("msg{", c.i)) {
      c.i += 4; tpe = MESSAGE; msg = parseMessage(c); expect(c, '}')
    } else {
      val t = parseName(c)
      tpe = typeNames.getOrElse(t, throw new IllegalArgumentException(s"unknown type '$t'"))
    }
    var repeated = false
    if (c.i < c.s.length && c.s.charAt(c.i) == '*') { repeated = true; c.i += 1 }
    new FieldSpec(number, name, tpe, repeated, msg, idx)
  }

  private def parseInt(c: Cursor): Int = {
    val start = c.i
    while (c.i < c.s.length && c.s.charAt(c.i).isDigit) c.i += 1
    require(c.i > start, s"expected number at ${c.i}")
    c.s.substring(start, c.i).toInt
  }

  private def parseName(c: Cursor): String = {
    val start = c.i
    while (c.i < c.s.length && { val ch = c.s.charAt(c.i); ch.isLetterOrDigit || ch == '_' }) c.i += 1
    require(c.i > start, s"expected name at ${c.i}")
    c.s.substring(start, c.i)
  }

  private def expect(c: Cursor, ch: Char): Unit = {
    require(c.i < c.s.length && c.s.charAt(c.i) == ch, s"expected '$ch' at ${c.i}")
    c.i += 1
  }

  // ---------------------------------------------------------------------
  // decoding

  private final class Malformed(msg: String) extends RuntimeException(msg, null, false, false)

  private final class Reader(val buf: Array[Byte], var i: Int, val end: Int) {
    def hasMore: Boolean = i < end

    def readVarint(): Long = {
      var shift = 0; var res = 0L
      while (true) {
        if (i >= end) throw new Malformed("truncated varint")
        val b = buf(i); i += 1
        res |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return res
        shift += 7
        if (shift > 63) throw new Malformed("varint too long")
      }
      res // unreachable
    }

    def readLongLE(): Long = {
      if (i + 8 > end) throw new Malformed("truncated fixed64")
      var v = 0L; var k = 7
      while (k >= 0) { v = (v << 8) | (buf(i + k) & 0xffL); k -= 1 }
      i += 8
      v
    }

    def readIntLE(): Int = {
      if (i + 4 > end) throw new Malformed("truncated fixed32")
      val v = (buf(i) & 0xff) | ((buf(i + 1) & 0xff) << 8) |
        ((buf(i + 2) & 0xff) << 16) | ((buf(i + 3) & 0xff) << 24)
      i += 4
      v
    }
  }

  private def zigzag64(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def convertVarint(v: Long, tpe: Int): Any = (tpe: @annotation.switch) match {
    case INT64 | UINT64 => v // uint64 carried as signed long (Spark has no u64)
    case SINT64 => zigzag64(v)
    case INT32 | ENUM => v.toInt
    case SINT32 => zigzag64(v).toInt
    case BOOL => v != 0L
    case _ => throw new Malformed(s"wire type 0 for type $tpe")
  }

  // strict UTF-8 (Java's String(bytes) silently replaces invalid input;
  // the Python twin raises UnicodeDecodeError and the row drops — D8)
  private def utf8Strict(buf: Array[Byte], off: Int, len: Int): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
    try dec.decode(java.nio.ByteBuffer.wrap(buf, off, len)).toString
    catch { case _: java.nio.charset.CharacterCodingException => throw new Malformed("invalid utf-8") }
  }

  def decode(buf: Array[Byte], spec: MessageSpec): Row =
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      decodeMessage(new Reader(buf, 0, buf.length), spec)))

  private def put(vals: Array[Any], f: FieldSpec, v: Any): Unit =
    if (f.repeated) { vals(f.index).asInstanceOf[ArrayBuffer[Any]] += v; () }
    else vals(f.index) = v

  private def decodeMessage(r: Reader, spec: MessageSpec): Array[Any] = {
    val fields = spec.fields
    val vals = new Array[Any](fields.length)
    var k = 0
    while (k < fields.length) {
      if (fields(k).repeated) vals(k) = ArrayBuffer.empty[Any]
      k += 1
    }
    while (r.hasMore) {
      val key = r.readVarint()
      val wt = (key & 7L).toInt
      // field numbers are <= 2^29-1 on the wire; keeping the shifted key
      // as Long before the range check prevents .toInt truncation from
      // colliding a garbage number onto a real field (the Python twin's
      // unbounded-int dict lookup simply misses — same net behavior)
      val fnoL = key >>> 3
      val f = if (fnoL > 0x1fffffffL) null else spec.lookup(fnoL.toInt)
      (wt: @annotation.switch) match {
        case 0 =>
          val v = r.readVarint()
          if (f != null && isVarint(f.tpe)) put(vals, f, convertVarint(v, f.tpe))
        case 1 =>
          val raw = r.readLongLE()
          if (f != null && isFixed64(f.tpe))
            put(vals, f, if (f.tpe == DOUBLE) java.lang.Double.longBitsToDouble(raw) else raw)
        case 5 =>
          val raw = r.readIntLE()
          if (f != null && isFixed32(f.tpe))
            put(vals, f, if (f.tpe == FLOAT) java.lang.Float.intBitsToFloat(raw) else raw)
        case 2 =>
          val len = r.readVarint()
          // compare against remaining bytes as Long: r.i + len.toInt can
          // wrap negative for len near Int.MaxValue and pass a <= check
          if (len < 0L || len > (r.end - r.i).toLong)
            throw new Malformed("truncated length-delimited")
          val s = r.i
          val n = len.toInt
          r.i += n
          if (f != null) (f.tpe: @annotation.switch) match {
            case MESSAGE =>
              put(vals, f, Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
                decodeMessage(new Reader(r.buf, s, s + n), f.msg))))
            case STRING => put(vals, f, utf8Strict(r.buf, s, n))
            case BYTES => put(vals, f, java.util.Arrays.copyOfRange(r.buf, s, s + n))
            case t =>
              // packed repeated scalars (custom.go:61 IsPacked); a
              // non-repeated scalar with wire type 2 is a mismatch ->
              // treated as unknown (skip, bytes already consumed)
              if (f.repeated) {
                val sub = new Reader(r.buf, s, s + n)
                val out = vals(f.index).asInstanceOf[ArrayBuffer[Any]]
                if (isVarint(t)) while (sub.hasMore) out += convertVarint(sub.readVarint(), t)
                else if (t == DOUBLE) while (sub.hasMore) out += java.lang.Double.longBitsToDouble(sub.readLongLE())
                else if (isFixed64(t)) while (sub.hasMore) out += sub.readLongLE()
                else if (t == FLOAT) while (sub.hasMore) out += java.lang.Float.intBitsToFloat(sub.readIntLE())
                else while (sub.hasMore) out += sub.readIntLE()
              }
          }
        case _ => throw new Malformed(s"unsupported wire type $wt")
      }
    }
    vals
  }

  // ---------------------------------------------------------------------
  // encoding (the to_protobuf analog; also the test-data generator —
  // byte-compatible with proto_wire.py's encode_message: unpacked
  // repeated scalars, fields in spec order)

  def encode(row: Row, spec: MessageSpec): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    writeMessage(out, row, spec)
    out.toByteArray
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7fL) | 0x80L).toInt); v >>>= 7 }
    out.write((v & 0x7fL).toInt)
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case n: java.lang.Number => n.longValue()
    case other => throw new IllegalArgumentException(s"not an integral value: $other")
  }

  private def writeMessage(out: java.io.ByteArrayOutputStream, row: Row, spec: MessageSpec): Unit = {
    var k = 0
    val fields = spec.fields
    while (k < fields.length) {
      val f = fields(k)
      val value = row.get(f.index)
      if (value != null) {
        val vals: Iterator[Any] =
          if (f.repeated) value.asInstanceOf[scala.collection.Seq[Any]].iterator
          else Iterator.single(value)
        vals.foreach { v =>
          if (v != null) (f.tpe: @annotation.switch) match {
            case INT64 | INT32 | UINT64 | ENUM =>
              writeVarint(out, (f.number.toLong << 3) | 0L)
              writeVarint(out, asLong(v))
            case SINT64 | SINT32 =>
              writeVarint(out, (f.number.toLong << 3) | 0L)
              val x = asLong(v)
              writeVarint(out, (x << 1) ^ (x >> 63))
            case BOOL =>
              writeVarint(out, (f.number.toLong << 3) | 0L)
              writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
            case DOUBLE | FIXED64 | SFIXED64 =>
              writeVarint(out, (f.number.toLong << 3) | 1L)
              val bits =
                if (f.tpe == DOUBLE) java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
                else asLong(v)
              var j = 0
              while (j < 8) { out.write(((bits >>> (8 * j)) & 0xffL).toInt); j += 1 }
            case FLOAT | FIXED32 | SFIXED32 =>
              writeVarint(out, (f.number.toLong << 3) | 5L)
              val bits =
                if (f.tpe == FLOAT) java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
                else asLong(v).toInt
              var j = 0
              while (j < 4) { out.write((bits >>> (8 * j)) & 0xff); j += 1 }
            case STRING =>
              val data = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
              writeVarint(out, (f.number.toLong << 3) | 2L)
              writeVarint(out, data.length.toLong)
              out.write(data, 0, data.length)
            case BYTES =>
              val data = v.asInstanceOf[Array[Byte]]
              writeVarint(out, (f.number.toLong << 3) | 2L)
              writeVarint(out, data.length.toLong)
              out.write(data, 0, data.length)
            case MESSAGE =>
              val nested = new java.io.ByteArrayOutputStream(64)
              writeMessage(nested, v.asInstanceOf[Row], f.msg)
              writeVarint(out, (f.number.toLong << 3) | 2L)
              writeVarint(out, nested.size().toLong)
              nested.writeTo(out)
            case other => throw new IllegalArgumentException(s"unsupported type id $other")
          }
        }
      }
      k += 1
    }
  }
}

/** bytes -> struct, permissive: malformed payloads return NULL (D8). */
class ProtoDecodeUDF extends UDF2[Array[Byte], String, Row] {
  override def call(value: Array[Byte], spec: String): Row = {
    if (value == null) return null
    val m = ProtoWire.specFor(spec)
    try ProtoWire.decode(value, m)
    catch { case scala.util.control.NonFatal(_) => null }
  }
}

/** struct -> protobuf bytes (spec field order == struct field order). */
class ProtoEncodeUDF extends UDF2[Row, String, Array[Byte]] {
  override def call(row: Row, spec: String): Array[Byte] = {
    if (row == null) return null
    ProtoWire.encode(row, ProtoWire.specFor(spec))
  }
}
