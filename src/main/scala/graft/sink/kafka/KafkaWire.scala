package graft.sink.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/** Minimal Kafka wire-protocol codec — the produce path only, written from
  * the PUBLIC protocol spec (kafka.apache.org/protocol): size-framed
  * requests, header v1, ApiVersions v0, Metadata v0, Produce v3 carrying
  * message-format-v2 RecordBatches (CRC32C over the post-crc region,
  * zigzag-varint record fields). The same codec encodes on the producer
  * side and decodes in the scripted test broker, so every byte round-trips
  * under test including the checksum.
  *
  * This is the FakeWalsender move applied to the sink boundary (reference
  * contract: src/sink/kafka/producer.zig:331-399 — send with queue-full
  * backpressure, flush as the delivery barrier, fail-fast on permanent
  * delivery failure): the container ships no kafka jars and resolution is
  * offline, so the produce path is exercised against a scripted broker
  * speaking the real wire format rather than left at a seam.
  */
object KafkaWire {

  // ApiKeys (public protocol)
  val ApiProduce: Short = 0
  val ApiMetadata: Short = 3
  val ApiVersions: Short = 18

  // Error codes (public protocol); retriability per the protocol tables
  val ErrNone: Short = 0
  val ErrNotLeader: Short = 6              // retriable
  val ErrRequestTimedOut: Short = 7        // retriable
  val ErrNotEnoughReplicas: Short = 19     // retriable
  val ErrTopicAuthorizationFailed: Short = 29 // NOT retriable
  def isRetriable(code: Short): Boolean = code match {
    case ErrNotLeader | ErrRequestTimedOut | ErrNotEnoughReplicas => true
    case _ => false
  }

  // ---- primitive writers over a growable buffer ----
  final class Out {
    private var buf = new Array[Byte](256)
    private var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, n + k))
      }
    def i8(v: Int): Out = { ensure(1); buf(n) = v.toByte; n += 1; this }
    def i16(v: Int): Out = { ensure(2); buf(n) = (v >> 8).toByte
      buf(n + 1) = v.toByte; n += 2; this }
    def i32(v: Int): Out = { ensure(4)
      buf(n) = (v >> 24).toByte; buf(n + 1) = (v >> 16).toByte
      buf(n + 2) = (v >> 8).toByte; buf(n + 3) = v.toByte; n += 4; this }
    def i64(v: Long): Out = { i32((v >> 32).toInt); i32(v.toInt); this }
    def raw(b: Array[Byte]): Out = { ensure(b.length)
      System.arraycopy(b, 0, buf, n, b.length); n += b.length; this }
    /** Kafka STRING: i16 length + utf8 (−1 = null). */
    def str(s: String): Out =
      if (s == null) i16(-1)
      else { val b = s.getBytes(UTF_8); i16(b.length); raw(b) }
    /** Kafka BYTES: i32 length + raw (−1 = null). */
    def bytes(b: Array[Byte]): Out =
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    /** Protobuf-style zigzag varint / varlong (record fields). */
    def varint(v: Int): Out = uvarlong(((v << 1) ^ (v >> 31)).toLong & 0xffffffffL)
    def varlong(v: Long): Out = uvarlong((v << 1) ^ (v >> 63))
    private def uvarlong(v0: Long): Out = {
      var v = v0
      while ((v & ~0x7fL) != 0) { i8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      i8(v.toInt); this
    }
    def size: Int = n
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, n)
    /** Patch a previously written i32 at absolute offset. */
    def patchI32(at: Int, v: Int): Unit = {
      buf(at) = (v >> 24).toByte; buf(at + 1) = (v >> 16).toByte
      buf(at + 2) = (v >> 8).toByte; buf(at + 3) = v.toByte
    }
  }

  // ---- primitive readers ----
  final class In(b: ByteBuffer) {
    def this(a: Array[Byte]) = this(ByteBuffer.wrap(a))
    def i8(): Byte = b.get()
    def i16(): Short = b.getShort()
    def i32(): Int = b.getInt()
    def i64(): Long = b.getLong()
    def str(): String = {
      val n = i16()
      if (n < 0) null
      else { val a = new Array[Byte](n); b.get(a); new String(a, UTF_8) }
    }
    def bytes(): Array[Byte] = {
      val n = i32()
      if (n < 0) null else { val a = new Array[Byte](n); b.get(a); a }
    }
    def varint(): Int = { val v = uvarlong(); ((v >>> 1) ^ -(v & 1)).toInt }
    def varlong(): Long = { val v = uvarlong(); (v >>> 1) ^ -(v & 1) }
    private def uvarlong(): Long = {
      var v = 0L; var shift = 0; var cur = 0
      while ({ cur = b.get() & 0xff; (cur & 0x80) != 0 }) {
        v |= (cur & 0x7fL) << shift; shift += 7
      }
      v | (cur.toLong << shift)
    }
    def remaining: Int = b.remaining()
    def raw(n: Int): Array[Byte] = { val a = new Array[Byte](n); b.get(a); a }
    def position: Int = b.position()
  }

  final case class Record(key: Array[Byte], value: Array[Byte])

  /** One message-format-v2 RecordBatch (no compression, no txn, producer
    * fields −1: idempotence on the wire needs an InitProducerId round-trip
    * the scripted broker does not model — dedup is the consumer's
    * meta.lsn contract here, same as the reference's at-least-once story). */
  def encodeRecordBatch(baseTimestamp: Long, records: Seq[Record]): Array[Byte] = {
    // records region first (it is both crc'd and length-counted)
    val recs = new Out
    records.zipWithIndex.foreach { case (r, i) =>
      val body = new Out
      body.i8(0) // record attributes
      body.varlong(0L) // timestampDelta
      body.varint(i) // offsetDelta
      if (r.key == null) body.varint(-1)
      else { body.varint(r.key.length); body.raw(r.key) }
      if (r.value == null) body.varint(-1)
      else { body.varint(r.value.length); body.raw(r.value) }
      body.varint(0) // headers
      recs.varint(body.size); recs.raw(body.toBytes)
    }
    // post-crc region: attributes .. records
    val post = new Out
    post.i16(0) // attributes: no compression, CreateTime
    post.i32(records.size - 1) // lastOffsetDelta
    post.i64(baseTimestamp)
    post.i64(baseTimestamp) // maxTimestamp (all deltas 0)
    post.i64(-1L) // producerId
    post.i16(-1)  // producerEpoch
    post.i32(-1)  // baseSequence
    post.i32(records.size)
    post.raw(recs.toBytes)
    val postBytes = post.toBytes
    val crc = new CRC32C; crc.update(postBytes)
    val out = new Out
    out.i64(0L) // baseOffset
    out.i32(4 + 1 + 4 + postBytes.length) // batchLength: partitionLeaderEpoch..end
    out.i32(-1) // partitionLeaderEpoch
    out.i8(2)   // magic
    out.i32(crc.getValue.toInt)
    out.raw(postBytes)
    out.toBytes
  }

  /** Broker/test-side decode; verifies magic and CRC32C. */
  def decodeRecordBatch(batch: Array[Byte]): Seq[Record] = {
    val in = new In(batch)
    in.i64(); in.i32(); in.i32()
    val magic = in.i8()
    require(magic == 2, s"unsupported magic $magic")
    val crcStored = in.i32()
    val postStart = in.position
    val post = java.util.Arrays.copyOfRange(batch, postStart, batch.length)
    val crc = new CRC32C; crc.update(post)
    require(crc.getValue.toInt == crcStored,
      "RecordBatch CRC32C mismatch — corrupt frame")
    in.i16() // attributes
    in.i32() // lastOffsetDelta
    in.i64(); in.i64() // timestamps
    in.i64(); in.i16(); in.i32() // producer id/epoch/baseSeq
    val n = in.i32()
    (0 until n).map { _ =>
      val len = in.varint()
      val end = in.position + len
      in.i8() // attributes
      in.varlong() // timestampDelta
      in.varint()  // offsetDelta
      val kLen = in.varint()
      val k = if (kLen < 0) null else in.raw(kLen)
      val vLen = in.varint()
      val v = if (vLen < 0) null else in.raw(vLen)
      val h = in.varint()
      require(h == 0 && in.position == end, "record trailer mismatch")
      Record(k, v)
    }
  }

  // ---- framing: i32 size + header v1 (api_key, version, corrId, clientId)
  def writeFrame(out: DataOutputStream, apiKey: Short, version: Short,
      corrId: Int, clientId: String, body: Out): Unit = {
    val h = new Out
    h.i16(apiKey); h.i16(version); h.i32(corrId); h.str(clientId)
    h.raw(body.toBytes)
    val b = h.toBytes
    out.writeInt(b.length); out.write(b); out.flush()
  }

  def readFrame(in: DataInputStream): Array[Byte] = {
    val size = in.readInt()
    require(size >= 0 && size <= 64 * 1024 * 1024, s"bad frame size $size")
    val b = new Array[Byte](size)
    in.readFully(b)
    b
  }

  /** Kafka's default partitioner hash — murmur2 (public algorithm, the
    * DefaultPartitioner contract: murmur2(key) & 0x7fffffff % numPartitions),
    * so keyed messages land on the same partition as any stock client. */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val n4 = data.length / 4 * 4
    var i = 0
    while (i < n4) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    val rem = data.length - n4
    if (rem == 3) h ^= (data(n4 + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(n4 + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(n4) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  def partitionFor(key: Array[Byte], numPartitions: Int): Int =
    if (key == null) 0
    else (murmur2(key) & 0x7fffffff) % numPartitions
}
