package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, Inflater}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Minimal pure-JVM HDF5 reader + NetCDF-4-style writer (SURVEY S1 —
  * the reference opens NC4 via xarray's netcdf4 engine,
  * context.py:243-246; NC4 is an HDF5 container). Everything here
  * follows the public HDF5 File Format Specification; no native
  * library is involved.
  *
  * Reader subset (covers what netcdf-c/h5py actually emit for cubes;
  * everything else fails loudly with the feature name):
  *  - superblock versions 0/1 (symbol-table root) and 2/3;
  *  - object headers v1 and v2 (OHDR), with continuation blocks;
  *  - groups via symbol tables (B-tree v1 + local heap + SNOD) and
  *    via compact link messages; dense (fractal-heap) groups rejected;
  *  - data layout message v3: contiguous and chunked (B-tree v1 chunk
  *    index); layout v4 contiguous; v4 chunk indexes rejected;
  *  - datatypes: fixed-point 1/2/4/8 (signed/unsigned) and IEEE float
  *    4/8, either endianness — all surfaced as double (the cube
  *    contract, same as the classic reader);
  *  - filters: shuffle (2), deflate (1), fletcher32 (3, checksum
  *    stripped); missing chunks read as the fill value.
  *
  * The writer emits the classic NC4 shape — superblock v0, v1 object
  * headers, symbol-table root group, contiguous coordinate variables,
  * chunked shuffle+deflate data variables indexed by a B-tree v1 —
  * which is exactly the profile the reader's "common path" exercises
  * and what the netcdf-c library produces for a fresh cube file.
  */
object Hdf5 {

  private val Magic =
    Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val Undef = -1L // 0xFFFF... as a signed long

  /** HDF5 files start with the 8-byte signature at offset 0 or at a
    * power-of-two userblock boundary (512, 1024, ...) — the same probe
    * sequence [[findSuperblock]] uses, so detection and parsing agree. */
  def isHdf5(path: String): Boolean = {
    val p = Paths.get(path)
    if (!Files.isRegularFile(p) || Files.size(p) < 8) return false
    try { withRaf(path)(findSuperblock); true }
    catch { case _: Exception => false }
  }

  // ----------------------------------------------------------- model

  final case class Dtype(clazz: Int, size: Int, littleEndian: Boolean,
                         signed: Boolean)
  final case class Filter(id: Int, values: Seq[Int])
  /** one dataset; layoutClass 1 = contiguous, 2 = chunked */
  final case class Dataset(name: String, shape: Seq[Int], dtype: Dtype,
                           layoutClass: Int, dataAddr: Long, chunkDims: Seq[Int],
                           btreeAddr: Long, filters: Seq[Filter], fill: Double)
  final case class Hdf5File(datasets: Map[String, Dataset])

  private val fileCache = TrieMap.empty[String, Hdf5File]
  private val chunkCache =
    TrieMap.empty[(String, String), Map[Seq[Long], (Long, Int)]]

  def open(path: String): Hdf5File =
    fileCache.getOrElseUpdate(path, withRaf(path)(r => parse(r)))

  private[sources] def invalidate(path: String): Unit = {
    fileCache.remove(path)
    baseCache.remove(path)
    chunkCache.keys.filter(_._1 == path).foreach(chunkCache.remove)
  }

  private def withRaf[A](path: String)(f: R => A): A = {
    val raf = new RandomAccessFile(path, "r")
    try f(new R(raf)) finally raf.close()
  }

  /** positioned little-endian reads (ALL HDF5 metadata is LE) */
  private final class R(val raf: RandomAccessFile) {
    var base: Long = 0L // superblock base address; file addrs add it
    def bytes(addr: Long, n: Int): ByteBuffer = {
      val b = new Array[Byte](n)
      raf.seek(base + addr); raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }
    def raw(addr: Long, n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      raf.seek(base + addr); raf.readFully(b)
      b
    }
    def cstring(addr: Long): String = {
      val out = new ArrayBuffer[Byte]()
      var a = addr
      var done = false
      while (!done) {
        val take = math.min(64L, raf.length() - base - a).toInt
        if (take <= 0) throw new IllegalArgumentException(
          "unterminated heap string runs past end of file")
        val chunk = raw(a, take)
        val z = chunk.indexOf(0.toByte)
        if (z >= 0) { out ++= chunk.take(z); done = true }
        else { out ++= chunk; a += chunk.length }
      }
      new String(out.toArray, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  // ----------------------------------------------------------- parse

  private def parse(r: R): Hdf5File = {
    val sbAddr = findSuperblock(r)
    r.base = 0L
    val head = r.bytes(sbAddr, 16)
    head.position(8)
    val version = head.get() & 0xFF
    val rootAddr = version match {
      case 0 | 1 =>
        val b = r.bytes(sbAddr, if (version == 0) 96 else 100)
        b.position(9)
        b.get(); b.get(); b.get() // free-space / root-group / reserved
        b.get() // shared header version
        val offSize = b.get() & 0xFF
        val lenSize = b.get() & 0xFF
        require(offSize == 8 && lenSize == 8,
          s"HDF5 offset/length size $offSize/$lenSize unsupported (8/8 only)")
        b.get() // reserved
        b.getShort(); b.getShort(); b.getInt() // leaf K, internal K, flags
        if (version == 1) { b.getShort(); b.getShort() } // indexed K + res
        val base = b.getLong()
        b.getLong(); b.getLong(); b.getLong() // free space, EOF, driver
        // root symbol table entry: name offset, OBJECT HEADER ADDRESS
        b.getLong()
        val hdr = b.getLong()
        r.base = base
        hdr
      case 2 | 3 =>
        val b = r.bytes(sbAddr, 9 + 3 + 4 * 8 + 4)
        b.position(9)
        val offSize = b.get() & 0xFF
        val lenSize = b.get() & 0xFF
        require(offSize == 8 && lenSize == 8,
          s"HDF5 offset/length size $offSize/$lenSize unsupported (8/8 only)")
        b.get() // consistency flags
        val base = b.getLong()
        b.getLong(); b.getLong() // extension, EOF
        val hdr = b.getLong()
        r.base = base
        hdr
      case v => throw new IllegalArgumentException(
        s"HDF5 superblock version $v unsupported")
    }
    val rootMsgs = messages(r, rootAddr)
    val ds = links(r, rootMsgs).toSeq.sortBy(_._1).flatMap {
      case (name, addr) => parseDataset(r, name, addr)
    }
    Hdf5File(ds.map(d => d.name -> d).toMap)
  }

  private def findSuperblock(r: R): Long = {
    val len = r.raf.length()
    var off = 0L
    while (off + 8 <= len) {
      if (r.raw(off, 8).sameElements(Magic)) return off
      off = if (off == 0) 512 else off * 2
    }
    throw new IllegalArgumentException("no HDF5 superblock signature found")
  }

  /** all header messages of the object at `addr` (v1 or v2 headers,
    * continuations followed) as (type, body) pairs */
  private def messages(r: R, addr: Long): Seq[(Int, ByteBuffer)] = {
    val sig = r.raw(addr, 4)
    if (sig.sameElements("OHDR".getBytes)) messagesV2(r, addr)
    else messagesV1(r, addr)
  }

  private def messagesV1(r: R, addr: Long): Seq[(Int, ByteBuffer)] = {
    val pre = r.bytes(addr, 16)
    val ver = pre.get() & 0xFF
    require(ver == 1, s"object header version $ver at $addr (1 expected)")
    pre.get()
    var remaining = pre.getShort() & 0xFFFF
    pre.getInt() // reference count
    val hdrSize = pre.getInt()
    val out = ArrayBuffer.empty[(Int, ByteBuffer)]
    var blocks = List((addr + 16, hdrSize.toLong))
    while (remaining > 0 && blocks.nonEmpty) {
      val (ba, bl) = blocks.head
      blocks = blocks.tail
      val b = r.bytes(ba, bl.toInt)
      while (remaining > 0 && b.remaining() >= 8) {
        val t = b.getShort() & 0xFFFF
        val sz = b.getShort() & 0xFFFF
        b.get(); b.get(); b.get(); b.get() // flags + reserved
        require(b.remaining() >= sz, s"truncated message type $t")
        val body = b.slice(); body.limit(sz)
        body.order(ByteOrder.LITTLE_ENDIAN)
        b.position(b.position() + sz)
        remaining -= 1
        if (t == 0x10) blocks ::= ((body.getLong(0), body.getLong(8)))
        else out += ((t, body))
      }
    }
    out.toSeq
  }

  private def messagesV2(r: R, addr: Long): Seq[(Int, ByteBuffer)] = {
    // prefix is at most 4+1+1+16+4+8 bytes; clamp to EOF for tiny files
    val pre = r.bytes(addr,
      math.min(64L, r.raf.length() - r.base - addr).toInt)
    pre.position(4)
    val ver = pre.get() & 0xFF
    require(ver == 2, s"OHDR version $ver")
    val flags = pre.get() & 0xFF
    if ((flags & 0x20) != 0) pre.position(pre.position() + 16) // times
    if ((flags & 0x10) != 0) pre.position(pre.position() + 4) // phase change
    val size0 = (flags & 3) match {
      case 0 => pre.get() & 0xFFL
      case 1 => pre.getShort() & 0xFFFFL
      case 2 => pre.getInt() & 0xFFFFFFFFL
      case _ => pre.getLong()
    }
    val tracked = (flags & 0x04) != 0
    val out = ArrayBuffer.empty[(Int, ByteBuffer)]
    // (block payload address, payload length)
    var blocks = List((addr + pre.position(), size0))
    while (blocks.nonEmpty) {
      val (ba, bl) = blocks.head
      blocks = blocks.tail
      val b = r.bytes(ba, bl.toInt)
      val minHdr = if (tracked) 6 else 4
      var go = true
      while (go && b.remaining() >= minHdr) {
        val t = b.get() & 0xFF
        val sz = b.getShort() & 0xFFFF
        b.get() // message flags
        if (tracked) b.getShort()
        if (b.remaining() < sz) go = false // trailing gap
        else {
          val body = b.slice(); body.limit(sz)
          body.order(ByteOrder.LITTLE_ENDIAN)
          b.position(b.position() + sz)
          if (t == 0x10) {
            // continuation block: OCHK signature + messages + checksum
            val off = body.getLong(0); val len = body.getLong(8)
            blocks ::= ((off + 4, len - 8))
          } else out += ((t, body))
        }
      }
    }
    out.toSeq
  }

  /** child links of a group: symbol-table message or link messages */
  private def links(r: R, msgs: Seq[(Int, ByteBuffer)]): Map[String, Long] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    msgs.foreach {
      case (0x11, b) => // symbol table: B-tree v1 + local heap
        val btree = b.getLong(0); val heap = b.getLong(8)
        walkGroupBtree(r, btree, heapDataAddr(r, heap), out)
      case (0x06, b) => // link message (compact "new-style" group)
        b.position(0)
        val ver = b.get() & 0xFF
        require(ver == 1, s"link message version $ver")
        val flags = b.get() & 0xFF
        val linkType = if ((flags & 0x08) != 0) b.get() & 0xFF else 0
        if ((flags & 0x04) != 0) b.getLong() // creation order
        if ((flags & 0x10) != 0) b.get() // charset
        val nameLen = (flags & 3) match {
          case 0 => b.get() & 0xFFL
          case 1 => b.getShort() & 0xFFFFL
          case 2 => b.getInt() & 0xFFFFFFFFL
          case _ => b.getLong()
        }
        val nb = new Array[Byte](nameLen.toInt); b.get(nb)
        val name = new String(nb, java.nio.charset.StandardCharsets.UTF_8)
        if (linkType == 0) out(name) = b.getLong() // hard link
      case (0x02, b) => // link info: dense storage unsupported
        b.position(0)
        b.get()
        val flags = b.get() & 0xFF
        if ((flags & 1) != 0) b.getLong()
        val fheap = b.getLong()
        require(fheap == Undef,
          "dense (fractal-heap) group storage unsupported")
      case _ => ()
    }
    out.toMap
  }

  private def heapDataAddr(r: R, heapAddr: Long): Long = {
    val b = r.bytes(heapAddr, 32)
    require(r.raw(heapAddr, 4).sameElements("HEAP".getBytes),
      "local heap signature expected")
    b.position(8)
    b.getLong() // data segment size
    b.getLong() // free list head
    b.getLong() // data segment address
  }

  private def walkGroupBtree(
      r: R, nodeAddr: Long, heapData: Long,
      out: scala.collection.mutable.Map[String, Long]): Unit = {
    val sig = r.raw(nodeAddr, 4)
    if (sig.sameElements("SNOD".getBytes)) {
      val head = r.bytes(nodeAddr, 8)
      head.position(6)
      val n = head.getShort() & 0xFFFF
      val b = r.bytes(nodeAddr + 8, n * 40)
      (0 until n).foreach { _ =>
        val nameOff = b.getLong()
        val hdr = b.getLong()
        b.position(b.position() + 24) // cache type + reserved + scratch
        out(r.cstring(heapData + nameOff)) = hdr
      }
      return
    }
    require(sig.sameElements("TREE".getBytes), "B-tree v1 signature expected")
    val head = r.bytes(nodeAddr, 24)
    head.position(4)
    val nodeType = head.get() & 0xFF
    require(nodeType == 0, s"group B-tree node type $nodeType")
    head.get() // level (children may be subtrees or SNODs; sniffed)
    val n = head.getShort() & 0xFFFF
    val b = r.bytes(nodeAddr + 24, n * 16 + 8)
    (0 until n).foreach { _ =>
      b.getLong() // key (heap offset)
      walkGroupBtree(r, b.getLong(), heapData, out)
    }
  }

  private def parseDataset(r: R, name: String, addr: Long): Option[Dataset] = {
    val msgs = messages(r, addr)
    var shape: Seq[Int] = null
    var dtype: Dtype = null
    var fillRaw: Array[Byte] = null
    var layoutClass = -1
    var dataAddr = Undef
    var chunkDims: Seq[Int] = Nil
    var btreeAddr = Undef
    var filters: Seq[Filter] = Nil
    msgs.foreach {
      case (0x01, b) => // dataspace
        b.position(0)
        val ver = b.get() & 0xFF
        val rank = b.get() & 0xFF
        val flags = b.get() & 0xFF
        if (ver == 1) b.position(b.position() + 5)
        else b.get() // v2: dataspace type
        shape = (0 until rank).map(_ => b.getLong().toInt)
        if ((flags & 1) != 0) (0 until rank).foreach(_ => b.getLong())
      case (0x03, b) => // datatype
        b.position(0)
        val cv = b.get() & 0xFF
        val clazz = cv & 0x0F
        val bits0 = b.get() & 0xFF
        b.get(); b.get()
        val size = b.getInt()
        dtype = Dtype(clazz, size, littleEndian = (bits0 & 1) == 0,
          signed = clazz == 0 && (bits0 & 8) != 0)
      case (0x04, b) => // fill value (old)
        b.position(0)
        val sz = b.getInt()
        fillRaw = new Array[Byte](sz); b.get(fillRaw)
      case (0x05, b) => // fill value
        b.position(0)
        val ver = b.get() & 0xFF
        val defined = ver match {
          case 1 | 2 => b.get(); b.get(); (b.get() & 0xFF) == 1
          case _ =>
            val flags = b.get() & 0xFF
            (flags & 0x20) != 0
        }
        if (defined && b.remaining() >= 4) {
          val sz = b.getInt()
          if (sz > 0 && b.remaining() >= sz) {
            fillRaw = new Array[Byte](sz); b.get(fillRaw)
          }
        }
      case (0x08, b) => // data layout
        b.position(0)
        val ver = b.get() & 0xFF
        ver match {
          case 3 =>
            layoutClass = b.get() & 0xFF
            layoutClass match {
              case 0 => // compact: size + data inline — small; keep addr
                throw new IllegalArgumentException(
                  "compact dataset layout unsupported")
              case 1 =>
                dataAddr = b.getLong(); b.getLong()
              case 2 =>
                val dims = b.get() & 0xFF // rank + 1
                btreeAddr = b.getLong()
                val cd = (0 until dims).map(_ => b.getInt())
                chunkDims = cd.dropRight(1) // last entry = element size
              case c => throw new IllegalArgumentException(
                s"layout class $c unsupported")
            }
          case 4 =>
            layoutClass = b.get() & 0xFF
            require(layoutClass == 1,
              "layout v4 supported for contiguous only (chunk indexes " +
                "fixed-array/extensible-array/v2-btree not implemented)")
            dataAddr = b.getLong(); b.getLong()
          case v => throw new IllegalArgumentException(
            s"data layout message version $v unsupported")
        }
      case (0x0B, b) => // filter pipeline
        b.position(0)
        val ver = b.get() & 0xFF
        val nf = b.get() & 0xFF
        if (ver == 1) b.position(b.position() + 6)
        filters = (0 until nf).map { _ =>
          val id = b.getShort() & 0xFFFF
          val nameLen =
            if (ver == 1 || id >= 256) b.getShort() & 0xFFFF else 0
          b.getShort() // flags
          val nvals = b.getShort() & 0xFFFF
          if (nameLen > 0) {
            val pad = if (ver == 1) (8 - nameLen % 8) % 8 else 0
            b.position(b.position() + nameLen + pad)
          }
          val vals = (0 until nvals).map(_ => b.getInt())
          if (ver == 1 && nvals % 2 == 1) b.getInt() // v1 pads odd counts
          Filter(id, vals)
        }
      case _ => ()
    }
    if (shape == null || dtype == null) return None // not a dataset (group)
    val fill =
      if (fillRaw == null || fillRaw.length != dtype.size) Double.NaN
      else toDoubles(dtype, fillRaw, 1)(0)
    Some(Dataset(name, shape, dtype, layoutClass, dataAddr, chunkDims,
      btreeAddr, filters, fill))
  }

  // ------------------------------------------------------------ read

  private def chunkIndex(path: String,
                         ds: Dataset): Map[Seq[Long], (Long, Int)] =
    chunkCache.getOrElseUpdate((path, ds.name), {
      val out = scala.collection.mutable.HashMap.empty[Seq[Long], (Long, Int)]
      if (ds.btreeAddr != Undef) withRaf(path) { r =>
        r.base = baseOf(path)
        walkChunkBtree(r, ds.btreeAddr, ds.shape.length, out)
      }
      out.toMap
    })

  // base addresses are nearly always 0; re-derive (once per path) for
  // the rare userblock case so fresh RAFs match parse-time addressing
  private val baseCache = TrieMap.empty[String, Long]
  private def baseOf(path: String): Long =
    baseCache.getOrElseUpdate(path, withRaf(path)(findSuperblock))

  private def walkChunkBtree(
      r: R, nodeAddr: Long, rank: Int,
      out: scala.collection.mutable.Map[Seq[Long], (Long, Int)]): Unit = {
    require(r.raw(nodeAddr, 4).sameElements("TREE".getBytes),
      "chunk B-tree v1 signature expected")
    val head = r.bytes(nodeAddr, 24)
    head.position(4)
    val nodeType = head.get() & 0xFF
    require(nodeType == 1, s"chunk B-tree node type $nodeType")
    val level = head.get() & 0xFF
    val n = head.getShort() & 0xFFFF
    val keySize = 8 + (rank + 1) * 8
    val b = r.bytes(nodeAddr + 24, n * (keySize + 8) + keySize)
    (0 until n).foreach { _ =>
      val sz = b.getInt()
      b.getInt() // filter mask
      val offs = (0 to rank).map(_ => b.getLong()).dropRight(1)
      val child = b.getLong()
      if (level == 0) out(offs) = (child, sz)
      else walkChunkBtree(r, child, rank, out)
    }
  }

  /** one chunk of a 3-D variable as double[chunk elements]; missing
    * chunks read as the fill value (same contract as zarr) */
  def readChunk(path: String, ds: Dataset, idx: Seq[Int]): Array[Double] = {
    val chunks =
      if (ds.layoutClass == 2) ds.chunkDims
      else Seq(1) ++ ds.shape.drop(1) // contiguous = one slice per chunk
    val n = chunks.product
    if (ds.layoutClass == 1) {
      if (ds.dataAddr == Undef) return Array.fill(n)(ds.fill)
      val sliceBytes = n.toLong * ds.dtype.size
      val raw = withRaf(path) { r =>
        r.base = baseOf(path)
        r.raw(ds.dataAddr + idx.head * sliceBytes, n * ds.dtype.size)
      }
      return toDoubles(ds.dtype, raw, n)
    }
    val key = idx.zip(chunks).map { case (i, c) => i.toLong * c }
    chunkIndex(path, ds).get(key) match {
      case None => Array.fill(n)(ds.fill)
      case Some((addr, sz)) =>
        var bytes = withRaf(path) { r =>
          r.base = baseOf(path); r.raw(addr, sz)
        }
        ds.filters.reverse.foreach(f => bytes = unfilter(f, bytes, ds.dtype))
        toDoubles(ds.dtype, bytes, n)
    }
  }

  /** whole 1-D dataset (coordinate axes) */
  def read1d(path: String, ds: Dataset): Array[Double] = {
    require(ds.shape.length == 1, s"${ds.name} is not 1-D")
    val n = ds.shape.head
    if (ds.layoutClass == 1) {
      if (ds.dataAddr == Undef) return Array.fill(n)(ds.fill) // unallocated
      val raw = withRaf(path) { r =>
        r.base = baseOf(path); r.raw(ds.dataAddr, n * ds.dtype.size)
      }
      return toDoubles(ds.dtype, raw, n)
    }
    val c = ds.chunkDims.head
    val out = new Array[Double](n)
    (0 until (n + c - 1) / c).foreach { ci =>
      val chunk = readChunk(path, ds, Seq(ci))
      val len = math.min(c, n - ci * c)
      System.arraycopy(chunk, 0, out, ci * c, len)
    }
    out
  }

  private def unfilter(f: Filter, bytes: Array[Byte],
                       dt: Dtype): Array[Byte] = f.id match {
    case 1 => // deflate
      val inf = new Inflater()
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput())
          throw new IllegalArgumentException("truncated deflate chunk")
        out.write(buf, 0, k)
      }
      inf.end()
      out.toByteArray
    case 2 => // shuffle: s byte planes of n elements -> interleaved
      val s = f.values.headOption.getOrElse(dt.size)
      if (s <= 1) bytes
      else {
        val n = bytes.length / s
        val out = new Array[Byte](bytes.length)
        var j = 0
        while (j < s) {
          var i = 0
          while (i < n) { out(i * s + j) = bytes(j * n + i); i += 1 }
          j += 1
        }
        // trailing bytes (length not divisible by s) pass through
        System.arraycopy(bytes, n * s, out, n * s, bytes.length - n * s)
        out
      }
    case 3 => bytes.dropRight(4) // fletcher32: strip stored checksum
    case id => throw new IllegalArgumentException(
      s"HDF5 filter id $id unsupported (deflate/shuffle/fletcher32 only)")
  }

  private def toDoubles(dt: Dtype, bytes: Array[Byte],
                        n: Int): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes).order(
      if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    (dt.clazz, dt.size) match {
      case (1, 8) => while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
      case (1, 4) =>
        while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
      case (0, 1) =>
        if (dt.signed) while (i < n) { out(i) = bb.get(i).toDouble; i += 1 }
        else while (i < n) { out(i) = (bb.get(i) & 0xFF).toDouble; i += 1 }
      case (0, 2) =>
        if (dt.signed)
          while (i < n) { out(i) = bb.getShort(i * 2).toDouble; i += 1 }
        else
          while (i < n) { out(i) = (bb.getShort(i * 2) & 0xFFFF).toDouble; i += 1 }
      case (0, 4) =>
        if (dt.signed)
          while (i < n) { out(i) = bb.getInt(i * 4).toDouble; i += 1 }
        else
          while (i < n) { out(i) = (bb.getInt(i * 4) & 0xFFFFFFFFL).toDouble; i += 1 }
      case (0, 8) => while (i < n) { out(i) = bb.getLong(i * 8).toDouble; i += 1 }
      case (c, s) => throw new IllegalArgumentException(
        s"HDF5 datatype class $c size $s unsupported")
    }
    out
  }

  // ----------------------------------------------------------- write

  /** little-endian growable buffer with address patching */
  private final class W {
    private var buf = new Array[Byte](1 << 16)
    private var len = 0
    def pos: Long = len.toLong
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def u8(v: Int): Unit = { ensure(1); buf(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit = { u8(v & 0xFF); u8((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = { u16((v & 0xFFFF).toInt); u16(((v >> 16) & 0xFFFF).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xFFFFFFFFL); u32(v >>> 32) }
    def f64(v: Double): Unit = u64(java.lang.Double.doubleToRawLongBits(v))
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, buf, len, b.length); len += b.length }
    def zeros(n: Int): Unit = { ensure(n); len += n }
    def patch64(at: Long, v: Long): Unit = {
      var i = 0
      while (i < 8) { buf(at.toInt + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Export a cube as an NC4-style HDF5 file: contiguous f8 coordinate
    * variables (time = epoch microseconds), chunked shuffle+deflate f8
    * data variables. Same driver-side caveat as
    * [[NetcdfStore.writeNetcdf]] (collects the cube; fixtures/export). */
  def writeHdf5(cube: graft.cube.CubeFrame, path: String, chunkY: Int,
                chunkX: Int, deflateLevel: Int = 6): Unit = {
    import org.apache.spark.sql.functions.col
    val g = cube.grid
    val times = cube.df.select(col("time")).distinct().orderBy(col("time"))
      .collect().map(_.getTimestamp(0))
    val (nt, nh, nw) = (times.length, g.height, g.width)
    val tIdx = times.zipWithIndex.toMap
    val cy = math.min(chunkY, nh)
    val cx = math.min(chunkX, nw)

    val timeUs = times.map(t =>
      (t.getTime * 1000L + (t.getNanos / 1000) % 1000).toDouble)
    val latArr = (0 until nh).map(g.latOfY).toArray
    val lonArr = (0 until nw).map(g.lonOfX).toArray
    val varData: Map[String, Array[Double]] = cube.variables.map { v =>
      val arr = Array.fill(nt * nh * nw)(Double.NaN)
      cube.df.select(col("time"), col("y_idx"), col("x_idx"),
          col(v).cast("double")).collect().foreach { r =>
        val t = tIdx(r.getTimestamp(0))
        arr((t * nh + r.getInt(1)) * nw + r.getInt(2)) =
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)
      }
      v -> arr
    }.toMap

    // symbol tables are sorted by name — a B-tree format invariant:
    // external readers do binary search over SNOD entries, so an
    // unsorted table reads as silently missing variables
    val names = (cube.variables ++ Seq("lat", "lon", "time")).sorted
    require(names.distinct == names, "dataset names must be unique")
    // K and the SNOD symbol count are u16 fields; past this they would
    // wrap silently into a structurally corrupt file
    require(names.length <= 65000,
      s"writeHdf5 supports at most 65000 datasets, got ${names.length}")
    // one SNOD holds at most 2 * leafK symbols; the HDF5 library reads
    // a node at its FULL K-implied allocation, so K is sized to the
    // actual name count and the SNOD padded to exactly 2K entries
    val GroupLeafK = math.max(4, (names.length + 1) / 2)
    val w = new W

    // ---- superblock v0 (96 bytes)
    w.bytes(Magic)
    w.u8(0); w.u8(0); w.u8(0); w.u8(0); w.u8(0) // versions + reserved
    w.u8(8); w.u8(8); w.u8(0) // offset size, length size, reserved
    w.u16(GroupLeafK); w.u16(16) // group leaf K, group internal K
    w.u32(0) // consistency flags
    w.u64(0) // base address
    w.u64(Undef) // free-space info
    val eofPatch = w.pos; w.u64(0) // end of file (patched)
    w.u64(Undef) // driver info
    w.u64(0) // root STE: link name offset
    val rootHdrPatch = w.pos; w.u64(0) // root object header (patched)
    w.u32(0); w.u32(0) // cache type + reserved
    w.zeros(16) // scratch

    // ---- root group object header v1: one symbol-table message
    w.patch64(rootHdrPatch, w.pos)
    w.u8(1); w.u8(0); w.u16(1); w.u32(1); w.u32(24); w.zeros(4)
    w.u16(0x11); w.u16(16); w.u8(0); w.zeros(3)
    val btreePatch = w.pos; w.u64(0)
    val heapPatch = w.pos; w.u64(0)

    // ---- local heap: 8 reserved zero bytes (the empty-string key at
    // offset 0 sorts before every name), then NUL-terminated names
    val nameOffsets = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var heapOff = 8L
    names.foreach { n =>
      nameOffsets(n) = heapOff
      val nb = n.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      heapOff += (nb.length + 1 + 7) / 8 * 8
    }
    w.patch64(heapPatch, w.pos)
    w.bytes("HEAP".getBytes); w.u8(0); w.zeros(3)
    w.u64(heapOff) // data segment size
    w.u64(Undef) // free list head (none)
    w.u64(w.pos + 8) // data segment address (directly after)
    w.zeros(8)
    names.foreach { n =>
      val nb = n.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      w.bytes(nb); w.zeros(((nb.length + 1 + 7) / 8 * 8) - nb.length)
    }

    // ---- group B-tree v1: single level-0 node over one SNOD, padded
    // to the full internal-K=16 allocation (24 + 2K*16 + 8 bytes) the
    // library reads per node
    w.patch64(btreePatch, w.pos)
    val btreeStart = w.pos
    w.bytes("TREE".getBytes); w.u8(0); w.u8(0); w.u16(1)
    w.u64(Undef); w.u64(Undef)
    w.u64(0) // key 0: empty string (before all names)
    val snodPatch = w.pos; w.u64(0)
    w.u64(nameOffsets(names.last)) // key 1: last name in the child
    w.zeros(((24 + 2 * 16 * 16 + 8) - (w.pos - btreeStart)).toInt)

    // ---- SNOD with every dataset, sorted; padded to 2K entries
    w.patch64(snodPatch, w.pos)
    w.bytes("SNOD".getBytes); w.u8(1); w.u8(0); w.u16(names.length)
    val hdrPatches = names.map { n =>
      w.u64(nameOffsets(n))
      val p = w.pos; w.u64(0) // object header (patched)
      w.u32(0); w.u32(0); w.zeros(16)
      n -> p
    }.toMap
    w.zeros((2 * GroupLeafK - names.length) * 40)

    def msg(t: Int, bodySize: Int)(body: => Unit): Unit = {
      val padded = (bodySize + 7) / 8 * 8
      w.u16(t); w.u16(padded); w.u8(0); w.zeros(3)
      val before = w.pos
      body
      w.zeros((padded - (w.pos - before)).toInt)
    }
    def dtypeF64Msg(): Unit = msg(0x03, 20) {
      w.u8(0x11) // version 1, class 1 (float)
      w.u8(0x20); w.u8(0x3F); w.u8(0) // LE, IEEE mantissa norm, sign bit 63
      w.u32(8)
      w.u16(0); w.u16(64) // bit offset, precision
      w.u8(52); w.u8(11); w.u8(0); w.u8(52) // exp loc/size, mant loc/size
      w.u32(1023) // exponent bias
    }
    def fillMsg(): Unit = msg(0x05, 16) {
      w.u8(2); w.u8(2); w.u8(0); w.u8(1) // v2, alloc late, write alloc, defined
      w.u32(8); w.f64(Double.NaN)
    }
    def spaceMsg(dims: Seq[Int]): Unit = msg(0x01, 8 + dims.length * 8) {
      w.u8(1); w.u8(dims.length); w.u8(0); w.zeros(5)
      dims.foreach(d => w.u64(d.toLong))
    }

    // ---- contiguous coordinate dataset: header + raw doubles
    def writeCoord(name: String, data: Array[Double]): Unit = {
      w.patch64(hdrPatches(name), w.pos)
      // dataspace 24 | datatype 32 | fill 24 | layout 32 (with headers)
      w.u8(1); w.u8(0); w.u16(4); w.u32(1); w.u32(24 + 32 + 24 + 32); w.zeros(4)
      spaceMsg(Seq(data.length))
      dtypeF64Msg()
      fillMsg()
      var dataPatch = 0L
      msg(0x08, 18) {
        w.u8(3); w.u8(1) // layout v3, contiguous
        dataPatch = w.pos; w.u64(0)
        w.u64(data.length * 8L)
      }
      w.patch64(dataPatch, w.pos)
      data.foreach(w.f64)
    }
    writeCoord("lat", latArr)
    writeCoord("lon", lonArr)
    writeCoord("time", timeUs)

    // ---- chunked shuffle+deflate data variables + chunk B-tree v1
    val nyc = (nh + cy - 1) / cy
    val nxc = (nw + cx - 1) / cx
    cube.variables.foreach { v =>
      w.patch64(hdrPatches(v), w.pos)
      // dataspace 8+32 | datatype 8+24 | fill 8+16 | filters 8+40 | layout 8+32
      w.u8(1); w.u8(0); w.u16(5); w.u32(1)
      w.u32(40 + 32 + 24 + 48 + 40); w.zeros(4)
      spaceMsg(Seq(nt, nh, nw))
      dtypeF64Msg()
      fillMsg()
      msg(0x0B, 40) {
        w.u8(1); w.u8(2); w.zeros(6) // pipeline v1, two filters
        w.u16(2); w.u16(0); w.u16(0); w.u16(1); w.u32(8); w.u32(0) // shuffle
        w.u16(1); w.u16(0); w.u16(0); w.u16(1) // deflate
        w.u32(deflateLevel.toLong); w.u32(0)
      }
      var btPatch = 0L
      msg(0x08, 27) {
        w.u8(3); w.u8(2); w.u8(4) // layout v3, chunked, rank+1 dims
        btPatch = w.pos; w.u64(0)
        w.u32(1); w.u32(cy.toLong); w.u32(cx.toLong); w.u32(8)
      }
      // chunks first, then the level-0 B-tree node pointing at them
      val arr = varData(v)
      val entries = for {
        t <- 0 until nt; yc0 <- 0 until nyc; xc0 <- 0 until nxc
      } yield {
        val slab = Array.fill(cy * cx)(Double.NaN)
        val yLen = math.min(cy, nh - yc0 * cy)
        val xLen = math.min(cx, nw - xc0 * cx)
        var y = 0
        while (y < yLen) {
          var x = 0
          while (x < xLen) {
            slab(y * cx + x) =
              arr((t * nh + yc0 * cy + y) * nw + xc0 * cx + x)
            x += 1
          }
          y += 1
        }
        val raw = new Array[Byte](slab.length * 8)
        val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        slab.foreach(bb.putDouble)
        val shuffled = shuffleBytes(raw, 8)
        val packed = deflate(shuffled, deflateLevel)
        val addr = w.pos
        w.bytes(packed)
        (Seq(t.toLong, yc0.toLong * cy, xc0.toLong * cx, 0L), addr,
          packed.length)
      }
      // ---- chunk-index B-tree v1. Nodes hold at most 2*K entries
      // (K = 32, the HDF5 library's istore default for a v0
      // superblock — it rejects oversized nodes on read), so levels
      // stack until a single root spans every chunk. A node's final
      // key is its right sibling's first key (search invariant); the
      // rightmost final key is the dataset shape.
      val maxPerNode = 64
      val shapeKey = Seq(nt.toLong, nh.toLong, nw.toLong, 0L)
      val keyBytes = 8 + shapeKey.length * 8
      // the library reads every node at its full K-implied allocation
      // (24 + 2K entries + one key), so short nodes are zero-padded to
      // the same size — otherwise the last node could sit too close to
      // EOF for an external reader's node-sized read
      val nodeBytes: Long = 24L + maxPerNode * (keyBytes + 8) + keyBytes
      require(entries.nonEmpty, "cube has no chunks to index")
      // (first key offsets, key size field, child address)
      var cur = entries.map { case (offs, addr, sz) =>
        (offs, sz.toLong, addr) }.toVector
      var lvl = 0
      var done = false
      while (!done) {
        val groups = cur.grouped(maxPerNode).toVector
        val addrs = groups.scanLeft(w.pos)((a, _) => a + nodeBytes).toVector
        groups.zipWithIndex.foreach { case (g, i) =>
          val start = w.pos
          w.bytes("TREE".getBytes); w.u8(1); w.u8(lvl); w.u16(g.length)
          w.u64(if (i == 0) Undef else addrs(i - 1))
          w.u64(if (i + 1 < groups.length) addrs(i + 1) else Undef)
          g.foreach { case (offs, szf, child) =>
            w.u32(szf); w.u32(0); offs.foreach(w.u64); w.u64(child)
          }
          val (fOffs, fSz) =
            if (i + 1 < groups.length)
              (groups(i + 1).head._1, groups(i + 1).head._2)
            else (shapeKey, 0L)
          w.u32(fSz); w.u32(0); fOffs.foreach(w.u64)
          w.zeros((nodeBytes - (w.pos - start)).toInt)
        }
        if (groups.length == 1) { w.patch64(btPatch, addrs(0)); done = true }
        else {
          cur = groups.indices.map(i =>
            (groups(i).head._1, groups(i).head._2, addrs(i))).toVector
          lvl += 1
        }
      }
    }

    w.patch64(eofPatch, w.pos)
    Files.write(Paths.get(path), w.toArray)
    invalidate(path)
  }

  private def shuffleBytes(bytes: Array[Byte], s: Int): Array[Byte] = {
    val n = bytes.length / s
    val out = new Array[Byte](bytes.length)
    var j = 0
    while (j < s) {
      var i = 0
      while (i < n) { out(j * n + i) = bytes(i * s + j); i += 1 }
      j += 1
    }
    out
  }

  private def deflate(bytes: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val buf = new Array[Byte](65536)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
