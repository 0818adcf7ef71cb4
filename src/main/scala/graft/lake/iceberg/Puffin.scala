package graft.lake.iceberg

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.lake.delta.RoaringBitmapArray

/** Puffin file format (the published Iceberg "puffin-spec"): the sidecar
  * container Iceberg v3 stores DELETION VECTORS in (and v2 engines store
  * theta sketches in).
  *
  * Layout, transcribed from the spec:
  *
  * {{{
  *   Magic  Blob₁ Blob₂ …  Footer
  *   Footer = Magic | FooterPayload(JSON) | payloadSize(i32 LE) |
  *            flags(i32 LE) | Magic
  * }}}
  *
  * FooterPayload is UTF-8 JSON `{"blobs":[…],"properties":{…}}`; each
  * blob entry carries `type`, `fields`, `snapshot-id`,
  * `sequence-number`, `offset`, `length`, optional `compression-codec`
  * and `properties`. Flag bit 0 of byte 0 marks a LZ4-compressed footer
  * payload — rejected loudly here (misreading a compressed footer as
  * JSON fails anyway, but the error should name the cause).
  *
  * The `deletion-vector-v1` blob (Iceberg v3 spec "Deletion vectors"):
  *
  * {{{
  *   combined length of vector+magic (i32 BE)
  *   magic D1 D3 39 64
  *   64-bit RoaringBitmap "portable" serialization
  *   CRC-32 of magic+vector (i32 BE)
  * }}}
  *
  * which is byte-identical to Delta's DV payload framing (the formats
  * were deliberately converged) — so [[RoaringBitmapArray]], whose
  * serialize() emits exactly magic+portable, is reused as-is. A blob's
  * `offset/length` (and the manifest's `content_offset` /
  * `content_size_in_bytes`) cover the whole frame including the length
  * prefix and CRC.
  */
object Puffin {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
  private val mapper = new ObjectMapper()

  /** One blob's footer metadata. `offset`/`length` frame the blob bytes
    * in the file. */
  final case class BlobMeta(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String])

  val DvBlobType = "deletion-vector-v1"

  // ---- write ---------------------------------------------------------------

  /** Serialize one deletion-vector blob frame (length + magic+vector +
    * CRC) from a bitmap. */
  def dvBlobBytes(bitmap: RoaringBitmapArray): Array[Byte] = {
    val payload = bitmap.serialize() // magic + portable vector
    val bb = ByteBuffer.allocate(4 + payload.length + 4) // BIG_ENDIAN default
    bb.putInt(payload.length)
    bb.put(payload)
    val c = new CRC32(); c.update(payload)
    bb.putInt(c.getValue.toInt)
    bb.array()
  }

  /** Write a puffin file of `blobs` = (type, fields, snapshotId, seq,
    * properties, frame bytes); returns the final BlobMetas (with offsets)
    * in order. */
  def write(conf: Configuration, path: Path,
      blobs: Seq[(String, Seq[Int], Long, Long, Map[String, String], Array[Byte])],
      fileProperties: Map[String, String] = Map.empty): Seq[BlobMeta] = {
    val bos = new ByteArrayOutputStream()
    bos.write(Magic)
    val metas = blobs.map { case (tpe, fields, snapId, seq, props, bytes) =>
      val off = bos.size().toLong
      bos.write(bytes)
      BlobMeta(tpe, fields, snapId, seq, off, bytes.length.toLong, props)
    }
    // footer
    val payload = {
      val rootN = mapper.createObjectNode()
      val arr = rootN.putArray("blobs")
      metas.foreach { m =>
        val b = arr.addObject()
        b.put("type", m.blobType)
        val f = b.putArray("fields"); m.fields.foreach(f.add)
        b.put("snapshot-id", m.snapshotId)
        b.put("sequence-number", m.sequenceNumber)
        b.put("offset", m.offset)
        b.put("length", m.length)
        if (m.properties.nonEmpty) {
          val p = b.putObject("properties")
          m.properties.foreach { case (k, v) => p.put(k, v) }
        }
      }
      if (fileProperties.nonEmpty) {
        val p = rootN.putObject("properties")
        fileProperties.foreach { case (k, v) => p.put(k, v) }
      }
      mapper.writeValueAsString(rootN).getBytes(StandardCharsets.UTF_8)
    }
    bos.write(Magic)
    bos.write(payload)
    val trail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    trail.putInt(payload.length)
    trail.putInt(0) // flags: footer payload NOT compressed
    bos.write(trail.array())
    bos.write(Magic)
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, false)
    try out.write(bos.toByteArray) finally out.close()
    metas
  }

  // ---- read ----------------------------------------------------------------

  /** Parse the footer's blob list. */
  def readFooter(conf: Configuration, path: Path): Seq[BlobMeta] = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      require(len >= 4L + 4 + 8 + 4 + 4, s"puffin: $path too short ($len bytes)")
      val head = new Array[Byte](4)
      in.readFully(0L, head)
      require(head.sameElements(Magic), s"puffin: bad header magic in $path")
      val trail = new Array[Byte](12)
      in.readFully(len - 12, trail)
      val bb = ByteBuffer.wrap(trail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt
      val flags = bb.getInt
      val tailMagic = new Array[Byte](4)
      bb.get(tailMagic)
      require(tailMagic.sameElements(Magic), s"puffin: bad trailing magic in $path")
      require((flags & 1) == 0,
        s"puffin: compressed footer payload not supported ($path)")
      val payloadStart = len - 12 - payloadSize
      val preMagic = new Array[Byte](4)
      in.readFully(payloadStart - 4, preMagic)
      require(preMagic.sameElements(Magic), s"puffin: bad footer magic in $path")
      val payload = new Array[Byte](payloadSize)
      in.readFully(payloadStart, payload)
      val rootN = mapper.readTree(new String(payload, StandardCharsets.UTF_8))
      val blobs = rootN.path("blobs")
      require(blobs.isArray, s"puffin: footer of $path has no blobs array")
      val out = Seq.newBuilder[BlobMeta]
      val it = blobs.elements()
      while (it.hasNext) {
        val b = it.next()
        val codec = b.path("compression-codec")
        require(codec.isMissingNode || codec.isNull,
          s"puffin: blob compression ${codec.asText()} not supported ($path)")
        val fieldsB = Seq.newBuilder[Int]
        val fit = b.path("fields").elements()
        while (fit.hasNext) fieldsB += fit.next().asInt()
        val propsB = Map.newBuilder[String, String]
        val pit = b.path("properties").fields()
        while (pit.hasNext) { val e = pit.next(); propsB += e.getKey -> e.getValue.asText() }
        out += BlobMeta(
          b.path("type").asText(),
          fieldsB.result(),
          b.path("snapshot-id").asLong(),
          b.path("sequence-number").asLong(),
          b.path("offset").asLong(),
          b.path("length").asLong(),
          propsB.result())
      }
      out.result()
    } finally in.close()
  }

  /** Read + verify one deletion-vector blob frame at (offset, length). */
  def readDv(conf: Configuration, path: Path, offset: Long,
      length: Long): RoaringBitmapArray = {
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      in.seek(offset)
      val payloadLen = in.readInt() // big-endian
      require(payloadLen == length - 8,
        s"puffin dv: framed length $payloadLen != blob length $length - 8 ($path)")
      val payload = new Array[Byte](payloadLen)
      in.readFully(payload)
      val crc = in.readInt()
      val c = new CRC32(); c.update(payload)
      require(crc == c.getValue.toInt, s"puffin dv: checksum mismatch at $path")
      RoaringBitmapArray.deserialize(payload) // checks the D1 D3 39 64 magic
    } finally in.close()
  }
}
