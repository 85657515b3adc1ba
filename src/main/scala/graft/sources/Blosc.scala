package graft.sources

/** Pure-JVM blosc v1 frame codec (decode + a test/export encoder).
  *
  * Blosc is the zarr-python default compressor (numcodecs `Blosc`,
  * cname defaulting to lz4 with byte-shuffle), so real-world zarr
  * stores are overwhelmingly blosc-framed — the reference reads them
  * through xr.open_zarr (xcube_server/context.py:247-250), and without
  * this decoder every such store needed offline conversion. The frame
  * layout is the public c-blosc 1.x format:
  *
  *   byte 0    format version
  *   byte 1    inner-codec version
  *   byte 2    flags: bit0 byte-shuffle, bit1 memcpy'ed (stored raw),
  *             bit2 bit-shuffle, bits 5-7 inner codec id
  *             (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd)
  *   byte 3    typesize
  *   int32 LE  nbytes   (uncompressed size)
  *   int32 LE  blocksize
  *   int32 LE  cbytes   (whole-frame size, header included)
  *
  * then, unless memcpy'ed, one int32 LE start offset per block
  * (absolute within the frame), and per block a sequence of "splits":
  * int32 LE compressed size + payload, where a split whose compressed
  * size equals its uncompressed size is stored raw. A block is
  * byte-shuffled before splitting, so each split is one byte-plane.
  *
  * Supported here: memcpy frames; blosclz (c-blosc's own default,
  * FastLZ-derived — decoder below mirrors public blosclz.c), lz4/lz4hc
  * and zlib inner codecs (pure JVM) plus zstd and snappy (via the
  * zstd-jni / snappy-java libraries Spark itself ships for shuffle
  * compression); byte-shuffle, BIT-shuffle (the bitshuffle library's
  * trans_byte_elem + trans_bit_byte + trans_bitrow_eight layout) and
  * no shuffle. c-blosc decides the split count from a compile-time
  * rule that changed across versions; instead of replicating one
  * version's rule we try both possible counts (`typesize`, then 1) —
  * the strict size bookkeeping makes the wrong hypothesis fail fast
  * and the right one is unambiguous.
  */
object Blosc {

  private val FlagShuffle = 0x1
  private val FlagMemcpy = 0x2
  private val FlagBitShuffle = 0x4
  private val CodecBloscLz = 0
  private val CodecLz4 = 1
  private val CodecSnappy = 2
  private val CodecZlib = 3
  private val CodecZstd = 4

  /** shuffle-mode constants for [[encode]] (numcodecs' values) */
  val ShuffleNone = 0
  val ShuffleByte = 1
  val ShuffleBit = 2

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  // ------------------------------------------------------------ decode

  def decode(frame: Array[Byte]): Array[Byte] = {
    require(frame.length >= 16,
      s"blosc frame is ${frame.length} bytes — shorter than its header")
    val flags = frame(2) & 0xFF
    val typesize = frame(3) & 0xFF
    val nbytes = le32(frame, 4)
    val blocksize = le32(frame, 8)
    val cbytes = le32(frame, 12)
    require(nbytes >= 0 && cbytes >= 16 && cbytes <= frame.length,
      s"corrupt blosc header: nbytes=$nbytes cbytes=$cbytes " +
        s"frame=${frame.length}")
    if (nbytes == 0) return Array.emptyByteArray
    if ((flags & FlagMemcpy) != 0) {
      require(frame.length >= 16 + nbytes, "truncated memcpy blosc frame")
      return java.util.Arrays.copyOfRange(frame, 16, 16 + nbytes)
    }
    val codec = (flags >>> 5) & 0x7
    require(codec == CodecBloscLz || codec == CodecLz4 ||
      codec == CodecZlib || codec == CodecZstd || codec == CodecSnappy,
      s"unsupported blosc inner codec id $codec " +
        "(blosclz, lz4/lz4hc, zlib, zstd and snappy are supported)")
    require(blocksize > 0, s"corrupt blosc blocksize $blocksize")
    val doShuffle = (flags & FlagShuffle) != 0 && typesize > 1
    val doBitShuffle = (flags & FlagBitShuffle) != 0
    val nblocks = ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    require(frame.length >= 16 + 4 * nblocks, "truncated blosc block index")
    val out = new Array[Byte](nbytes)
    var b = 0
    while (b < nblocks) {
      val bstart = le32(frame, 16 + 4 * b)
      require(bstart >= 16 && bstart < frame.length,
        s"blosc block $b offset $bstart out of frame")
      val bsize = math.min(blocksize, nbytes - b * blocksize)
      val block = decodeBlock(frame, bstart, bsize, typesize, codec)
      val plain =
        if (doShuffle) unshuffle(block, typesize)
        else if (doBitShuffle) bitUnshuffle(block, typesize)
        else block
      System.arraycopy(plain, 0, out, b * blocksize, bsize)
      b += 1
    }
    out
  }

  private def decodeBlock(frame: Array[Byte], off: Int, bsize: Int,
                          typesize: Int, codec: Int): Array[Byte] = {
    val candidates =
      if (typesize > 1 && typesize <= 255 && bsize % typesize == 0)
        Seq(typesize, 1)
      else Seq(1)
    candidates.view.flatMap(tryDecodeBlock(frame, off, bsize, _, codec))
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"undecodable blosc block at offset $off (bsize=$bsize, " +
          s"tried split counts ${candidates.mkString("/")})"))
  }

  /** One split-count hypothesis; None = the sizes didn't add up. */
  private def tryDecodeBlock(frame: Array[Byte], off0: Int, bsize: Int,
                             nsplits: Int, codec: Int): Option[Array[Byte]] = {
    val neblock = bsize / nsplits
    val out = new Array[Byte](bsize)
    var off = off0
    var j = 0
    while (j < nsplits) {
      if (off + 4 > frame.length) return None
      val cb = le32(frame, off); off += 4
      if (cb <= 0 || cb > neblock || off + cb > frame.length) return None
      if (cb == neblock) {
        System.arraycopy(frame, off, out, j * neblock, neblock)
      } else codec match {
        case CodecBloscLz =>
          if (!blosclzDecompress(frame, off, cb, out, j * neblock, neblock))
            return None
        case CodecLz4 =>
          if (!lz4Decompress(frame, off, cb, out, j * neblock, neblock))
            return None
        case CodecZlib =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(frame, off, cb)
          try {
            val k = inf.inflate(out, j * neblock, neblock)
            if (k != neblock || !inf.finished()) return None
          } catch { case _: java.util.zip.DataFormatException => return None }
          finally inf.end()
        case CodecZstd => // zstd-jni ships with Spark (shuffle codec)
          try {
            val k = com.github.luben.zstd.Zstd.decompressByteArray(
              out, j * neblock, neblock, frame, off, cb)
            if (k != neblock) return None
          } catch { case _: com.github.luben.zstd.ZstdException => return None }
        case CodecSnappy => // snappy-java ships with Spark
          try {
            val k = org.xerial.snappy.Snappy.uncompress(
              frame, off, cb, out, j * neblock)
            if (k != neblock) return None
          } catch { case _: java.io.IOException => return None }
      }
      off += cb
      j += 1
    }
    Some(out)
  }

  /** Byte transpose: shuffled layout keeps all 1st bytes of the
    * elements, then all 2nd bytes, … Trailing `len % typesize` bytes
    * are stored unshuffled (c-blosc shuffle.c semantics). */
  private[graft] def unshuffle(data: Array[Byte], typesize: Int): Array[Byte] = {
    if (typesize <= 1) return data
    val n = data.length / typesize
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < typesize) {
      val base = j * n
      var i = 0
      while (i < n) { out(i * typesize + j) = data(base + i); i += 1 }
      j += 1
    }
    var k = n * typesize
    while (k < data.length) { out(k) = data(k); k += 1 }
    out
  }

  private[graft] def shuffle(data: Array[Byte], typesize: Int): Array[Byte] = {
    if (typesize <= 1) return data
    val n = data.length / typesize
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < typesize) {
      val base = j * n
      var i = 0
      while (i < n) { out(base + i) = data(i * typesize + j); i += 1 }
      j += 1
    }
    var k = n * typesize
    while (k < data.length) { out(k) = data(k); k += 1 }
    out
  }

  // ------------------------------------------------------- bit-shuffle

  /** Bit transpose (the bitshuffle library's layout, as c-blosc applies
    * it per block: bshuf_trans_byte_elem → trans_bit_byte →
    * trans_bitrow_eight composed). Elements are processed in groups of
    * 8: output plane `j*8 + k` (length n/8 bytes) holds bit `k` of byte
    * `j` of every element, packed LSB-first — the byte at index i of a
    * plane carries elements 8i..8i+7, element 8i+t at bit t. Only
    * `floor(nelem/8)*8` elements participate; trailing elements and
    * trailing `len % typesize` bytes are stored as-is (c-blosc
    * bitshuffle() copies the leftovers verbatim). */
  private[graft] def bitShuffle(data: Array[Byte], typesize: Int): Array[Byte] = {
    val ts = math.max(typesize, 1)
    val n = (data.length / ts) & ~7
    if (n == 0) return data.clone()
    val out = new Array[Byte](data.length)
    val plane = n / 8
    var j = 0
    while (j < ts) {
      var k = 0
      while (k < 8) {
        val base = (j * 8 + k) * plane
        var i = 0
        while (i < plane) {
          var b = 0
          var t = 0
          while (t < 8) {
            b |= ((data((8 * i + t) * ts + j) >> k) & 1) << t
            t += 1
          }
          out(base + i) = b.toByte
          i += 1
        }
        k += 1
      }
      j += 1
    }
    var r = n * ts
    while (r < data.length) { out(r) = data(r); r += 1 }
    out
  }

  private[graft] def bitUnshuffle(data: Array[Byte], typesize: Int): Array[Byte] = {
    val ts = math.max(typesize, 1)
    val n = (data.length / ts) & ~7
    if (n == 0) return data.clone()
    val out = new Array[Byte](data.length) // zero-filled; bits OR in
    val plane = n / 8
    var j = 0
    while (j < ts) {
      var k = 0
      while (k < 8) {
        val base = (j * 8 + k) * plane
        var i = 0
        while (i < plane) {
          val b = data(base + i) & 0xFF
          var t = 0
          while (t < 8) {
            if (((b >>> t) & 1) != 0) {
              val idx = (8 * i + t) * ts + j
              out(idx) = (out(idx) | (1 << k)).toByte
            }
            t += 1
          }
          i += 1
        }
        k += 1
      }
      j += 1
    }
    var r = n * ts
    while (r < data.length) { out(r) = data(r); r += 1 }
    out
  }

  // ----------------------------------------------------------- blosclz

  private val MaxDistance = 8191 // blosclz.c MAX_DISTANCE

  /** BloscLZ block decode (public blosclz.c stream format — FastLZ
    * descendant). Ops: ctrl < 32 is a literal run of ctrl+1 bytes;
    * ctrl >= 32 is a match of (ctrl>>5)+2 bytes (field 7 extends by
    * 255-looped bytes to (9 + Σcodes)) at distance ((ctrl&31)<<8) +
    * code + 1; code 255 with offset field 31 switches to a 16-bit
    * far distance biased by MAX_DISTANCE+1. Distance 1 doubles as an
    * RLE run of the previous byte. The FIRST control byte is masked
    * to its low 5 bits (streams necessarily open with literals).
    * Returns false on any malformed sequence or size mismatch. */
  private[graft] def blosclzDecompress(src: Array[Byte], soff: Int, slen: Int,
                                       dst: Array[Byte], doff: Int,
                                       dlen: Int): Boolean = {
    var ip = soff
    val ipLim = soff + slen
    var op = doff
    val opLim = doff + dlen
    if (slen <= 0) return dlen == 0
    var ctrl = src(ip) & 31; ip += 1
    var loop = true
    while (loop) {
      if (ctrl >= 32) {
        var len = (ctrl >>> 5) - 1
        val ofs = (ctrl & 31) << 8
        var ref = op - ofs
        if (len == 6) { // field 7: extended length
          var code = 255
          while (code == 255) {
            if (ip >= ipLim) return false
            code = src(ip) & 0xFF; ip += 1
            len += code
          }
        }
        if (ip >= ipLim) return false
        val code = src(ip) & 0xFF; ip += 1
        len += 3
        ref -= code
        if (code == 255 && ofs == (31 << 8)) { // far match, 16-bit distance
          if (ip + 1 >= ipLim) return false
          var o2 = (src(ip) & 0xFF) << 8; ip += 1
          o2 += src(ip) & 0xFF; ip += 1
          ref = op - o2 - MaxDistance
        }
        if (op + len > opLim) return false
        if (ref - 1 < doff) return false
        if (ip < ipLim) { ctrl = src(ip) & 0xFF; ip += 1 } else loop = false
        if (ref == op) {
          // distance-1 run: memset of the previous byte
          java.util.Arrays.fill(dst, op, op + len, dst(op - 1))
          op += len
        } else {
          ref -= 1
          var l = len
          while (l > 0) { dst(op) = dst(ref); op += 1; ref += 1; l -= 1 }
        }
      } else {
        val run = ctrl + 1
        if (op + run > opLim || ip + run > ipLim) return false
        System.arraycopy(src, ip, dst, op, run); ip += run; op += run
        if (ip < ipLim) { ctrl = src(ip) & 0xFF; ip += 1 } else loop = false
      }
    }
    op == opLim
  }

  /** Greedy hash-table BloscLZ encoder emitting the public stream
    * format ([[blosclzDecompress]] is the spec): literal runs ≤ 32
    * bytes, near matches to distance 8191, far matches (biased 16-bit)
    * beyond. The read path never needs this — it exists for the frame
    * writer and fixtures. */
  private[graft] def blosclzCompress(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    val out = new java.io.ByteArrayOutputStream(n + n / 32 + 16)
    def emitLiterals(from: Int, until: Int): Unit = {
      var i = from
      while (i < until) {
        val run = math.min(32, until - i)
        out.write(run - 1)
        out.write(src, i, run)
        i += run
      }
    }
    def emitMatch(len: Int, distance: Int): Unit = {
      val far = distance > MaxDistance
      val d = if (far) distance - (MaxDistance + 1) else distance - 1
      val field = math.min(len - 2, 7)
      out.write((field << 5) | (if (far) 31 else d >>> 8))
      if (field == 7) {
        var e = len - 9 // decode: len = 6 + Σcodes + 3
        while (e >= 255) { out.write(255); e -= 255 }
        out.write(e)
      }
      if (far) { out.write(255); out.write((d >>> 8) & 0xFF) }
      out.write(d & 0xFF)
    }
    def read32(i: Int): Int =
      (src(i) & 0xFF) | ((src(i + 1) & 0xFF) << 8) |
        ((src(i + 2) & 0xFF) << 16) | ((src(i + 3) & 0xFF) << 24)
    val table = Array.fill(1 << 14)(-1)
    def hash(v: Int): Int = (v * -1640531535) >>> 18
    var anchor = 0
    var i = 0
    val limit = n - 4 // hashing reads 4 bytes; matches may run to n
    while (i < limit) {
      val v = read32(i)
      val h = hash(v)
      val ref = table(h)
      table(h) = i
      // near d field 8191 collides with the far escape — stay below it
      if (ref >= 0 && i - ref <= 0xFFFF + MaxDistance &&
          (i - ref) - 1 != MaxDistance && read32(ref) == v) {
        var ml = 4
        while (i + ml < n && src(ref + ml) == src(i + ml)) ml += 1
        emitLiterals(anchor, i)
        emitMatch(ml, i - ref)
        i += ml
        anchor = i
      } else i += 1
    }
    emitLiterals(anchor, n)
    out.toByteArray
  }

  // --------------------------------------------------------------- lz4

  /** LZ4 block decode, driven to input exhaustion; returns false on any
    * malformed sequence or output-size mismatch (callers treat that as
    * a failed split-count hypothesis, not an error). */
  private[graft] def lz4Decompress(src: Array[Byte], soff: Int, slen: Int,
                                     dst: Array[Byte], doff: Int,
                                     dlen: Int): Boolean = {
    var p = soff
    val end = soff + slen
    var o = doff
    val olim = doff + dlen
    while (p < end) {
      val token = src(p) & 0xFF; p += 1
      var lit = token >>> 4
      if (lit == 15) {
        var b = 255
        while (b == 255) {
          if (p >= end) return false
          b = src(p) & 0xFF; p += 1; lit += b
        }
      }
      if (p + lit > end || o + lit > olim) return false
      System.arraycopy(src, p, dst, o, lit); p += lit; o += lit
      if (p == end) return o == olim // final literal-only sequence
      if (p + 2 > end) return false
      val offset = (src(p) & 0xFF) | ((src(p + 1) & 0xFF) << 8); p += 2
      if (offset == 0 || o - offset < doff) return false
      var mlen = (token & 0xF) + 4
      if ((token & 0xF) == 15) {
        var b = 255
        while (b == 255) {
          if (p >= end) return false
          b = src(p) & 0xFF; p += 1; mlen += b
        }
      }
      if (o + mlen > olim) return false
      var m = o - offset
      while (mlen > 0) { dst(o) = dst(m); o += 1; m += 1; mlen -= 1 }
    }
    o == olim
  }

  /** Greedy hash-table LZ4 block encoder (the standard public format:
    * token, literal run, LE16 offset, match run; matches stop 5 bytes
    * short of the end and never start within the last 12). Used by the
    * blosc frame writer below — the read path never needs it. */
  private[graft] def lz4Compress(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    val out = new java.io.ByteArrayOutputStream(n + n / 128 + 16)
    def emit(litFrom: Int, litUntil: Int, matchLen: Int, offset: Int): Unit = {
      val lits = litUntil - litFrom
      val ml = if (matchLen > 0) matchLen - 4 else 0
      out.write((math.min(lits, 15) << 4) | math.min(ml, 15))
      if (lits >= 15) {
        var r = lits - 15
        while (r >= 255) { out.write(255); r -= 255 }
        out.write(r)
      }
      out.write(src, litFrom, lits)
      if (matchLen > 0) {
        out.write(offset & 0xFF); out.write((offset >>> 8) & 0xFF)
        if (ml >= 15) {
          var r = ml - 15
          while (r >= 255) { out.write(255); r -= 255 }
          out.write(r)
        }
      }
    }
    def read32(i: Int): Int =
      (src(i) & 0xFF) | ((src(i + 1) & 0xFF) << 8) |
        ((src(i + 2) & 0xFF) << 16) | ((src(i + 3) & 0xFF) << 24)
    val table = Array.fill(1 << 13)(-1)
    def hash(v: Int): Int = (v * -1640531535) >>> 19 // Knuth multiplicative
    var anchor = 0
    var i = 0
    val mfLimit = n - 12 // no match may START at or past here
    val matchLimit = n - 5 // nor extend into the last 5 bytes
    while (i < mfLimit) {
      val v = read32(i)
      val h = hash(v)
      val ref = table(h)
      table(h) = i
      if (ref >= 0 && i - ref <= 0xFFFF && read32(ref) == v) {
        var ml = 4
        while (i + ml < matchLimit && src(ref + ml) == src(i + ml)) ml += 1
        emit(anchor, i, ml, i - ref)
        i += ml
        anchor = i
      } else i += 1
    }
    emit(anchor, n, 0, 0)
    out.toByteArray
  }

  // -------------------------------------------------------------- encode

  /** Encode a blosc-lz4 frame (byte-shuffled) — see [[encode]]. */
  def encodeLz4(data: Array[Byte], typesize: Int,
                doShuffle: Boolean = true, blocksizeHint: Int = 0): Array[Byte] =
    encode(data, typesize, "lz4",
      if (doShuffle) ShuffleByte else ShuffleNone, blocksizeHint)

  /** Encode a blosc frame with a chosen inner codec (`lz4`/`lz4hc` or
    * `blosclz`) and shuffle mode (none / byte / bit). Split layout
    * follows the c-blosc forward-compat rule (split into `typesize`
    * byte-planes when the block is a multiple of typesize and planes
    * are ≥ 128 bytes); falls back to a memcpy frame if compression
    * doesn't pay. */
  def encode(data: Array[Byte], typesize: Int, cname: String = "lz4",
             shuffleMode: Int = ShuffleByte, blocksizeHint: Int = 0): Array[Byte] = {
    val codecId = cname match {
      case "lz4" | "lz4hc" => CodecLz4
      case "blosclz" => CodecBloscLz
      case other => throw new IllegalArgumentException(
        s"unsupported encode codec $other (lz4, lz4hc, blosclz)")
    }
    val compress: Array[Byte] => Array[Byte] =
      if (codecId == CodecLz4) lz4Compress else blosclzCompress
    val ts = if (typesize >= 1 && typesize <= 255) typesize else 1
    val nbytes = data.length
    val shuf = shuffleMode == ShuffleByte && ts > 1
    val bshuf = shuffleMode == ShuffleBit
    val blocksize = {
      val want = if (blocksizeHint > 0) blocksizeHint else 64 * 1024
      val aligned = math.max(ts, want - want % ts)
      math.min(aligned, math.max(ts, nbytes + ((ts - nbytes % ts) % ts)))
    }
    if (nbytes == 0) return header(FlagMemcpy, ts, 0, blocksize, 16)

    val nblocks = (nbytes + blocksize - 1) / blocksize
    val blockPayloads = (0 until nblocks).map { b =>
      val bsize = math.min(blocksize, nbytes - b * blocksize)
      val raw = java.util.Arrays.copyOfRange(data,
        b * blocksize, b * blocksize + bsize)
      val block =
        if (shuf) shuffle(raw, ts)
        else if (bshuf) bitShuffle(raw, ts)
        else raw
      val nsplits =
        if ((shuf || bshuf) && ts <= 16 && bsize % ts == 0 &&
          bsize / ts >= 128) ts
        else 1
      val neblock = bsize / nsplits
      val bo = new java.io.ByteArrayOutputStream(bsize + 4 * nsplits)
      (0 until nsplits).foreach { j =>
        val split = java.util.Arrays.copyOfRange(block,
          j * neblock, (j + 1) * neblock)
        val comp = compress(split)
        val (cb, payload) =
          if (comp.length >= neblock) (neblock, split) else (comp.length, comp)
        bo.write(cb & 0xFF); bo.write((cb >>> 8) & 0xFF)
        bo.write((cb >>> 16) & 0xFF); bo.write((cb >>> 24) & 0xFF)
        bo.write(payload)
      }
      bo.toByteArray
    }
    val indexBytes = 4 * nblocks
    val total = 16 + indexBytes + blockPayloads.map(_.length).sum
    if (total >= 16 + nbytes) {
      // compression doesn't pay: store raw, exactly like c-blosc
      val frame = header(FlagMemcpy, ts, nbytes, blocksize, 16 + nbytes)
      val out = java.util.Arrays.copyOf(frame, 16 + nbytes)
      System.arraycopy(data, 0, out, 16, nbytes)
      return out
    }
    val flags = (if (shuf) FlagShuffle else 0) |
      (if (bshuf) FlagBitShuffle else 0) | (codecId << 5)
    val out = java.util.Arrays.copyOf(
      header(flags, ts, nbytes, blocksize, total), total)
    var off = 16 + indexBytes
    blockPayloads.zipWithIndex.foreach { case (payload, b) =>
      out(16 + 4 * b) = (off & 0xFF).toByte
      out(16 + 4 * b + 1) = ((off >>> 8) & 0xFF).toByte
      out(16 + 4 * b + 2) = ((off >>> 16) & 0xFF).toByte
      out(16 + 4 * b + 3) = ((off >>> 24) & 0xFF).toByte
      System.arraycopy(payload, 0, out, off, payload.length)
      off += payload.length
    }
    out
  }

  private def header(flags: Int, typesize: Int, nbytes: Int,
                     blocksize: Int, cbytes: Int): Array[Byte] = {
    val h = new Array[Byte](16)
    h(0) = 2 // format version
    h(1) = 1 // inner-codec version
    h(2) = flags.toByte
    h(3) = typesize.toByte
    def put(off: Int, v: Int): Unit = {
      h(off) = (v & 0xFF).toByte
      h(off + 1) = ((v >>> 8) & 0xFF).toByte
      h(off + 2) = ((v >>> 16) & 0xFF).toByte
      h(off + 3) = ((v >>> 24) & 0xFF).toByte
    }
    put(4, nbytes); put(8, blocksize); put(12, cbytes)
    h
  }
}
