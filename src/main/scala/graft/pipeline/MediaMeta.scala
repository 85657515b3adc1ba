package graft.pipeline

/** Header-level metadata extraction for COMPRESSED media — the part of
  * the compressed-codec surface that needs no codec library, only the
  * public bitstream specs, so it is REAL here (contrast the sample/
  * pixel decode for these formats, which stays behind
  * [[Multimodal.decodeStub]] — no H.264/MP3 decoder ships in a bare
  * JVM).
  *
  * A training-data pipeline over mixed media mostly needs exactly this
  * layer: duration / sample-rate / channel layout for audio, geometry /
  * profile / frame-rate for video — to filter, bucket and cost-model
  * items BEFORE deciding what to ship to a GPU decode stage.
  *
  *  - MP3 (MPEG-1/2/2.5 audio, ISO/IEC 11172-3 / 13818-3): frame-header
  *    walk — sync scan, ID3v2 skip, per-frame bitrate/sample-rate
  *    tables, frame-length arithmetic; yields duration, frame count,
  *    average bitrate and a VBR flag.
  *  - H.264 (ITU-T H.264 §7.3.2.1): Annex-B NAL scan, RBSP unescape,
  *    Exp-Golomb SPS parse through the cropping window and VUI timing;
  *    yields width/height (crop-exact), profile/level, fps when the
  *    stream declares it, and IDR/non-IDR slice counts.
  *
  * Parsers return None on anything that does not parse cleanly —
  * garbage, truncation mid-frame, reserved field values — never throw.
  */
object MediaMeta {

  // ------------------------------------------------------------- MP3
  /** Parsed MPEG-audio stream summary. `version` is 1.0/2.0/2.5 ×10 to
    * stay integral (10, 20, 25). */
  final case class Mp3Meta(version: Int, layer: Int, sampleRateHz: Int,
                           channels: Int, frameCount: Int,
                           avgBitrateKbps: Double, durationMs: Long,
                           vbr: Boolean)

  // bitrate tables in kbps, indexed [bitrateIdx 1..14]; idx 0 = "free"
  // and 15 = invalid, both rejected (ISO 11172-3 table B.2)
  private val BrMpeg1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256,
    288, 320, 352, 384, 416, 448)
  private val BrMpeg1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, 384)
  private val BrMpeg1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)
  private val BrMpeg2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128,
    144, 160, 176, 192, 224, 256)
  private val BrMpeg2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 144, 160)
  private val SrMpeg1 = Array(44100, 48000, 32000)
  private val SrMpeg2 = Array(22050, 24000, 16000)
  private val SrMpeg25 = Array(11025, 12000, 8000)

  private final case class Mp3Frame(version: Int, layer: Int,
                                    sampleRate: Int, channels: Int,
                                    bitrateKbps: Int, samples: Int,
                                    frameBytes: Int)

  /** Decode one 4-byte frame header at `off`; None if not a valid
    * header (bad sync, reserved version/layer/bitrate/sample-rate). */
  private def mp3Header(b: Array[Byte], off: Int): Option[Mp3Frame] = {
    if (off + 4 > b.length) return None
    val b0 = b(off) & 0xFF; val b1 = b(off + 1) & 0xFF
    val b2 = b(off + 2) & 0xFF; val b3 = b(off + 3) & 0xFF
    if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return None
    val verBits = (b1 >> 3) & 3      // 0=2.5, 1=reserved, 2=2, 3=1
    val layerBits = (b1 >> 1) & 3    // 0=reserved, 1=III, 2=II, 3=I
    val brIdx = (b2 >> 4) & 0xF
    val srIdx = (b2 >> 2) & 3
    val padding = (b2 >> 1) & 1
    val chMode = (b3 >> 6) & 3       // 3 = mono
    if (verBits == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 ||
      srIdx == 3) return None
    val version = verBits match { case 3 => 10; case 2 => 20; case _ => 25 }
    val layer = 4 - layerBits        // 1, 2, 3
    val sr = (version match {
      case 10 => SrMpeg1; case 20 => SrMpeg2; case _ => SrMpeg25
    })(srIdx)
    val br = ((version, layer) match {
      case (10, 1) => BrMpeg1L1
      case (10, 2) => BrMpeg1L2
      case (10, 3) => BrMpeg1L3
      case (_, 1)  => BrMpeg2L1
      case _       => BrMpeg2L23
    })(brIdx)
    val (samples, frameBytes) = layer match {
      case 1 => (384, (12 * br * 1000 / sr + padding) * 4)
      case 2 => (1152, 144 * br * 1000 / sr + padding)
      case _ =>
        if (version == 10) (1152, 144 * br * 1000 / sr + padding)
        else (576, 72 * br * 1000 / sr + padding)
    }
    Some(Mp3Frame(version, layer, sr, if (chMode == 3) 1 else 2, br,
      samples, frameBytes))
  }

  /** Find the first header that chains to a second spec-consistent
    * one (one 0xFF sync byte in random data is common; two chained
    * frames are not). Skips a leading ID3v2 tag. −1 when none. */
  private def mp3ChainStart(bytes: Array[Byte]): Int = {
    var off = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      off = 10 + sz
    }
    var start = -1
    var scan = off
    while (start < 0 && scan + 4 <= bytes.length) {
      mp3Header(bytes, scan) match {
        case Some(f) if f.frameBytes > 0 &&
          mp3Header(bytes, scan + f.frameBytes).exists(g =>
            g.version == f.version && g.layer == f.layer &&
              g.sampleRate == f.sampleRate) => start = scan
        case _ => scan += 1
      }
    }
    start
  }

  /** Walk the MPEG-audio frame chain. Accepts only a run of ≥2
    * CONSECUTIVE valid frames agreeing on version/layer/sample-rate. */
  def parseMp3(bytes: Array[Byte]): Option[Mp3Meta] = {
    val start = mp3ChainStart(bytes)
    if (start < 0) return None
    val first = mp3Header(bytes, start).get
    var pos = start
    var frames = 0
    var samples = 0L
    var brSum = 0L
    var vbr = false
    var ok = true
    while (ok && pos + 4 <= bytes.length) {
      mp3Header(bytes, pos) match {
        case Some(f) if f.version == first.version &&
            f.layer == first.layer && f.sampleRate == first.sampleRate &&
            pos + f.frameBytes <= bytes.length =>
          frames += 1
          samples += f.samples
          brSum += f.bitrateKbps
          if (f.bitrateKbps != first.bitrateKbps) vbr = true
          pos += f.frameBytes
        case _ => ok = false // end of chain (trailing tag/garbage)
      }
    }
    if (frames < 2) None
    else Some(Mp3Meta(first.version, first.layer, first.sampleRate,
      first.channels, frames, brSum.toDouble / frames,
      samples * 1000L / first.sampleRate, vbr))
  }

  /** Minimal MPEG-audio writer (fixture/export path, the compressed
    * twin of [[Multimodal.writeMjpegAvi]]): emits the given per-frame
    * bitrate-index sequence as spec-exact headers with zeroed payload —
    * header-parseable, not sample-decodable (there is no encoder here).
    * `verBits`/`layerBits`/`srIdx` as in the header bit layout. */
  def writeMp3(frameBitrateIdx: Seq[Int], verBits: Int = 3,
               layerBits: Int = 1, srIdx: Int = 0, mono: Boolean = false,
               id3Bytes: Int = 0): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      bos.write(Array('I', 'D', '3', 4, 0, 0).map(_.toByte))
      bos.write(Array(((id3Bytes >> 21) & 0x7F), ((id3Bytes >> 14) & 0x7F),
        ((id3Bytes >> 7) & 0x7F), (id3Bytes & 0x7F)).map(_.toByte))
      bos.write(new Array[Byte](id3Bytes))
    }
    frameBitrateIdx.foreach { brIdx =>
      val b1 = 0xE0 | (verBits << 3) | (layerBits << 1) | 1
      val b2 = (brIdx << 4) | (srIdx << 2)
      val b3 = if (mono) 0xC0 else 0x00
      bos.write(Array(0xFF, b1, b2, b3).map(_.toByte))
      val f = mp3Header(bos.toByteArray,
        bos.size() - 4).getOrElse(sys.error(s"invalid header args: " +
        s"brIdx=$brIdx ver=$verBits layer=$layerBits sr=$srIdx"))
      bos.write(new Array[Byte](f.frameBytes - 4))
    }
    bos.toByteArray
  }

  // ------------------------------------------------------- ADTS (AAC)
  /** Parsed ADTS (the MPEG-2/4 AAC transport framing, ISO/IEC 13818-7
    * §6.2) stream summary. `objectType` = profile+1 (1 Main, 2 LC,
    * 3 SSR, 4 LTP); `avgBitrateKbps` is measured from the actual frame
    * bytes over the decoded duration (ADTS carries no per-frame
    * bitrate field); `variableRate` when frame lengths differ. Raw
    * AAC payload decode needs the codec's Huffman tables (spec tables,
    * no generating formula) — this is deliberately the header layer,
    * like [[parseMp3]]. */
  final case class AdtsMeta(objectType: Int, sampleRateHz: Int,
                            channels: Int, frameCount: Int,
                            avgBitrateKbps: Double, durationMs: Long,
                            variableRate: Boolean)

  /** MPEG-4 audio sampling-frequency-index table (indices 13/14
    * reserved, 15 = escape — all rejected). */
  private val AdtsSampleRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  private final case class AdtsFrame(objectType: Int, sampleRate: Int,
                                     channels: Int, frameBytes: Int,
                                     samples: Int)

  /** Decode one ADTS header at `off`: 12-bit sync, layer must be 00,
    * sampling index in range, channel config present (0 = in-band PCE,
    * unsupported), frame length covering at least its own header. */
  private def adtsHeader(b: Array[Byte], off: Int): Option[AdtsFrame] = {
    if (off + 7 > b.length) return None
    if ((b(off) & 0xFF) != 0xFF || ((b(off + 1) & 0xF6) != 0xF0))
      return None
    val protAbsent = b(off + 1) & 1
    val profile = (b(off + 2) >> 6) & 3
    val srIdx = (b(off + 2) >> 2) & 0xF
    if (srIdx >= AdtsSampleRates.length) return None
    val chanCfg = ((b(off + 2) & 1) << 2) | ((b(off + 3) >> 6) & 3)
    if (chanCfg == 0) return None
    val frameLen = ((b(off + 3) & 3) << 11) | ((b(off + 4) & 0xFF) << 3) |
      ((b(off + 5) >> 5) & 7)
    val blocks = (b(off + 6) & 3) + 1
    val hdr = if (protAbsent == 1) 7 else 9
    if (frameLen < hdr) return None
    val channels = if (chanCfg == 7) 8 else chanCfg
    Some(AdtsFrame(profile + 1, AdtsSampleRates(srIdx), channels,
      frameLen, blocks * 1024))
  }

  /** Walk the ADTS frame chain — same ≥2-consecutive-consistent-frames
    * acceptance rule as [[parseMp3]] (a lone 0xFFFx sync in random
    * bytes is common; two chained spec-consistent headers are not). */
  def parseAdts(bytes: Array[Byte]): Option[AdtsMeta] = {
    var start = -1
    var scan = 0
    while (start < 0 && scan + 7 <= bytes.length) {
      adtsHeader(bytes, scan) match {
        case Some(f) if adtsHeader(bytes, scan + f.frameBytes).exists(g =>
          g.objectType == f.objectType && g.sampleRate == f.sampleRate &&
            g.channels == f.channels) => start = scan
        case _ => scan += 1
      }
    }
    if (start < 0) return None
    val first = adtsHeader(bytes, start).get
    var pos = start
    var frames = 0
    var samples = 0L
    var payloadBytes = 0L
    var variable = false
    var ok = true
    while (ok && pos + 7 <= bytes.length) {
      adtsHeader(bytes, pos) match {
        case Some(f) if f.objectType == first.objectType &&
            f.sampleRate == first.sampleRate &&
            f.channels == first.channels &&
            pos + f.frameBytes <= bytes.length =>
          frames += 1
          samples += f.samples
          payloadBytes += f.frameBytes
          if (f.frameBytes != first.frameBytes) variable = true
          pos += f.frameBytes
        case _ => ok = false
      }
    }
    if (frames < 2) None
    else {
      // bitrate over the EXACT duration samples/sampleRate — dividing
      // by the millisecond-truncated durMs skews short or
      // odd-sample-rate streams by up to ~0.5%; durMs stays the
      // reported integer field only
      val durMs = samples * 1000L / first.sampleRate
      val kbps = payloadBytes * 8.0 * first.sampleRate / (samples * 1000.0)
      Some(AdtsMeta(first.objectType, first.sampleRate, first.channels,
        frames, kbps, durMs, variable))
    }
  }

  /** ADTS fixture writer (the AAC twin of [[writeMp3]]): spec-exact
    * headers with zeroed payloads of the given lengths —
    * header-parseable, not sample-decodable. */
  def writeAdts(frameLens: Seq[Int], profile: Int = 1, srIdx: Int = 3,
                chanCfg: Int = 2): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    frameLens.foreach { len =>
      require(len >= 7 && len < (1 << 13))
      bos.write(0xFF)
      bos.write(0xF1) // MPEG-4, layer 00, protection absent
      bos.write((profile << 6) | (srIdx << 2) | ((chanCfg >> 2) & 1))
      bos.write(((chanCfg & 3) << 6) | ((len >> 11) & 3))
      bos.write((len >> 3) & 0xFF)
      bos.write(((len & 7) << 5) | 0x1F) // + buffer fullness high bits
      bos.write(0xFC)                    // fullness low, 1 raw block
      bos.write(new Array[Byte](len - 7))
    }
    bos.toByteArray
  }

  // ---------------------------------------- MP3 Layer I subband decode
  /** Layer-I SUBBAND-sample decode result. `sub` holds the
    * requantized, rescaled subband samples s′ in stream order —
    * index ((frame·12 + s)·32 + sb)·channels + ch — with silent
    * (unallocated) subbands as exact 0f. `nbMax` is the largest
    * per-sample code width seen. */
  final case class Mp3L1Subbands(sampleRateHz: Int, channels: Int,
                                 frames: Int, nbMax: Int,
                                 sub: Array[Float])

  /** MSB-first bounded bit reader for the Layer-I payload walk. */
  private final class L1BitReader(b: Array[Byte], start: Long,
                                  val end: Long) {
    private var bp = start
    def ok(n: Int): Boolean = bp + n <= end
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bi = (bp >> 3).toInt
        v = (v << 1) | ((b(bi) >> (7 - (bp & 7).toInt)) & 1)
        bp += 1
        i += 1
      }
      v
    }
  }

  /** MPEG-1 Layer I sample decode to the SUBBAND domain (ISO 11172-3
    * §2.4.3.3): the 4-bit allocations, 6-bit scalefactor indices
    * (sf = 2·2^(−idx/3) — a closed-form geometric table), and the
    * midrise requantization
    * s″ = 2^nb/(2^nb−1) · (s‴ + 2^(1−nb)), s‴ = code/2^(nb−1) − 1
    * are all FORMULA-exact from the public spec, no tables. What this
    * deliberately does not do is §2.4.3.4's synthesis to time-domain
    * PCM: the polyphase matrixing is a closed-form cosine, but its
    * 512-coefficient prototype window is a spec TABLE (Annex 3-B.3)
    * with no generating formula, and fabricating those constants
    * offline would be fake precision — so PCM stays behind the
    * documented stub. The filterbank is power-complementary, so
    * energy statistics computed in the subband domain ARE the
    * time-domain statistics up to window ripple; that is the layer
    * [[Multimodal.mp3L1Features]] reports and the decode-stats
    * fixture row pins. Mono and independent stereo; None for
    * joint-stereo (intensity coding), Layer II/III (their allocation
    * tables are spec tables), truncation, or any reserved field. */
  def decodeMp3L1(bytes: Array[Byte]): Option[Mp3L1Subbands] = {
    val start = mp3ChainStart(bytes)
    if (start < 0) return None
    val first = mp3Header(bytes, start).get
    if (first.version != 10 || first.layer != 1) return None
    val out = new scala.collection.mutable.ArrayBuffer[Float]()
    var frames = 0
    var nbMax = 0
    var pos = start
    var ok = true
    while (ok && pos + 4 <= bytes.length) {
      mp3Header(bytes, pos) match {
        case Some(f) if f.version == 10 && f.layer == 1 &&
            f.sampleRate == first.sampleRate &&
            pos + f.frameBytes <= bytes.length =>
          val chMode = (bytes(pos + 3) >> 6) & 3
          if (chMode == 1) return None // intensity stereo unsupported
          val nch = if (chMode == 3) 1 else 2
          val crc = (bytes(pos + 1) & 1) == 0
          val br = new L1BitReader(bytes,
            (pos + 4).toLong * 8 + (if (crc) 16 else 0),
            (pos + f.frameBytes).toLong * 8)
          val alloc = Array.ofDim[Int](32, nch)
          var sb = 0
          while (sb < 32) {
            var ch = 0
            while (ch < nch) {
              if (!br.ok(4)) return None
              val a = br.read(4)
              if (a == 15) return None // forbidden allocation
              alloc(sb)(ch) = a
              ch += 1
            }
            sb += 1
          }
          val sf = Array.ofDim[Double](32, nch)
          sb = 0
          while (sb < 32) {
            var ch = 0
            while (ch < nch) {
              if (alloc(sb)(ch) > 0) {
                if (!br.ok(6)) return None
                sf(sb)(ch) = 2.0 * math.pow(2.0, -br.read(6) / 3.0)
              }
              ch += 1
            }
            sb += 1
          }
          var s = 0
          while (s < 12) {
            sb = 0
            while (sb < 32) {
              var ch = 0
              while (ch < nch) {
                if (alloc(sb)(ch) > 0) {
                  val nb = alloc(sb)(ch) + 1
                  if (nb > nbMax) nbMax = nb
                  if (!br.ok(nb)) return None
                  val code = br.read(nb)
                  val s3 = code.toDouble / (1 << (nb - 1)) - 1.0
                  val s2 = (s3 + math.pow(2.0, 1 - nb)) *
                    (1L << nb).toDouble / ((1L << nb) - 1)
                  out += (sf(sb)(ch) * s2).toFloat
                } else out += 0f
                ch += 1
              }
              sb += 1
            }
            s += 1
          }
          frames += 1
          pos += f.frameBytes
        case _ => ok = false
      }
    }
    if (frames < 2) None
    else Some(Mp3L1Subbands(first.sampleRate, first.channels, frames,
      nbMax, out.toArray))
  }

  /** Layer-I fixture writer (the Layer-I twin of [[writeMp3]]'s
    * zero-payload frames): a mono constant tone in ONE subband,
    * quantized through the exact inverse of [[decodeMp3L1]]'s
    * requantization, so decode recovers `amplitude` to within the
    * nb-bit quantization step — the physics the decode-stats row
    * pins. 32 kHz MPEG-1 Layer I at 32 kbps → 48-byte frames, which
    * fit the mono 1-subband payload (346 bits) with zero padding. */
  def writeMp3L1Tone(nFrames: Int, subband: Int, amplitude: Double,
                     sfIdx: Int = 0, nb: Int = 15): Array[Byte] = {
    require(nFrames >= 2 && subband >= 0 && subband < 32 &&
      nb >= 2 && nb <= 15 && sfIdx >= 0 && sfIdx < 63)
    val sf = 2.0 * math.pow(2.0, -sfIdx / 3.0)
    // invert: s″ = A/sf; s‴ = s″·(2^nb−1)/2^nb − 2^(1−nb);
    // code = round((s‴+1)·2^(nb−1)), clamped to the nb-bit range
    val s2 = amplitude / sf
    val s3 = s2 * ((1L << nb) - 1).toDouble / (1L << nb) -
      math.pow(2.0, 1 - nb)
    val code = math.max(0L, math.min((1L << nb) - 1,
      math.round((s3 + 1.0) * (1L << (nb - 1))))).toInt
    val frame = new Array[Byte](48)
    // header: MPEG-1 (11), Layer I (11), no CRC (1) → 0xFF 0xFF;
    // bitrate idx 1 (32 kbps), sr idx 2 (32 kHz), mono
    frame(0) = 0xFF.toByte; frame(1) = 0xFF.toByte
    frame(2) = ((1 << 4) | (2 << 2)).toByte; frame(3) = 0xC0.toByte
    var bp = 32L
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        val bi = (bp >> 3).toInt
        frame(bi) = (frame(bi) | (((v >> i) & 1) <<
          (7 - (bp & 7).toInt))).toByte
        bp += 1
        i -= 1
      }
    }
    var sb = 0
    while (sb < 32) { put(if (sb == subband) nb - 1 else 0, 4); sb += 1 }
    put(sfIdx, 6)
    var s = 0
    while (s < 12) { put(code, nb); s += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    var fI = 0
    while (fI < nFrames) { bos.write(frame); fI += 1 }
    bos.toByteArray
  }

  // ------------------------------------------------------------ H.264
  /** Parsed H.264 stream summary: geometry is crop-exact; `fps` is 0.0
    * when the SPS carries no VUI timing info. */
  final case class H264Meta(profileIdc: Int, levelIdc: Int, width: Int,
                            height: Int, fps: Double, nIdrSlices: Int,
                            nNonIdrSlices: Int)

  /** MSB-first bit reader over an RBSP with ue(v)/se(v) Exp-Golomb. */
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= b.length * 8) throw new IndexOutOfBoundsException
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 31) throw new IndexOutOfBoundsException
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    /** pcm_alignment_zero_bit run: skip to the next byte boundary,
      * requiring the padding bits to be 0 (§7.3.5 I_PCM). */
    def alignZero(): Unit =
      while ((pos & 7) != 0)
        if (u(1) != 0) throw new IllegalStateException("pcm align bit")
  }

  /** Strip emulation-prevention bytes: 00 00 03 → 00 00 (§7.4.1.1). */
  private def unescapeRbsp(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      if (i + 2 < b.length && b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 3) {
        out.write(0); out.write(0); i += 3
      } else { out.write(b(i)); i += 1 }
    }
    out.toByteArray
  }

  /** Split an Annex-B byte stream into NAL units (payload excludes the
    * one-byte NAL header; type returned separately). Handles both
    * 3- and 4-byte start codes: a following code's leading 00s are
    * stripped from the PREVIOUS unit's tail (a legitimate RBSP cannot
    * end in 00 — the stop bit is 1 — and emulation prevention keeps
    * zero runs out of the body). */
  private def nalUnits(b: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 3 <= b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) {
        starts += i + 3; i += 3
      } else i += 1
    }
    starts.toSeq.zipWithIndex.collect {
      case (s, idx) if s < b.length =>
        var e =
          if (idx + 1 < starts.length) {
            var x = starts(idx + 1) - 3
            while (x > s + 1 && b(x - 1) == 0) x -= 1
            x
          } else b.length
        if (e <= s) e = s
        ((b(s) & 0x1F), java.util.Arrays.copyOfRange(b, s + 1, math.max(s + 1, e)))
    }
  }

  private val HighProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** Every SPS field the metadata layer or the I_PCM decoder needs. */
  private final case class SpsInfo(profileIdc: Int, levelIdc: Int,
      width: Int, height: Int, fps: Double, widthMbs: Int,
      heightMapUnits: Int, frameMbsOnly: Boolean, log2MaxFrameNum: Int,
      pocType: Int, cropped: Boolean)

  /** Parse one SPS RBSP → (profile, level, width, height, fps). */
  private def parseSpsRbsp(rbsp: Array[Byte]): (Int, Int, Int, Int, Double) = {
    val i = parseSpsInfo(rbsp)
    (i.profileIdc, i.levelIdc, i.width, i.height, i.fps)
  }

  private def parseSpsInfo(rbsp: Array[Byte]): SpsInfo = {
    val r = new BitReader(rbsp)
    val profileIdc = r.u(8)
    r.u(8) // constraint_set flags + reserved
    val levelIdc = r.u(8)
    r.ue() // seq_parameter_set_id
    var chromaFormatIdc = 1
    var separateColourPlane = 0
    if (HighProfiles(profileIdc)) {
      chromaFormatIdc = r.ue()
      if (chromaFormatIdc == 3) separateColourPlane = r.u(1)
      r.ue(); r.ue() // bit_depth_luma/chroma_minus8
      r.u(1)         // qpprime_y_zero_transform_bypass_flag
      if (r.u(1) == 1) { // seq_scaling_matrix_present_flag
        val nLists = if (chromaFormatIdc == 3) 12 else 8
        var li = 0
        while (li < nLists) {
          if (r.u(1) == 1) { // seq_scaling_list_present_flag[li]
            val size = if (li < 6) 16 else 64
            var lastScale = 8; var nextScale = 8; var j = 0
            while (j < size) {
              if (nextScale != 0) nextScale = (lastScale + r.se() + 256) % 256
              lastScale = if (nextScale == 0) lastScale else nextScale
              j += 1
            }
          }
          li += 1
        }
      }
    }
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    if (pocType == 0) r.ue()
    else if (pocType == 1) {
      r.u(1); r.se(); r.se()
      val n = r.ue()
      var i = 0
      while (i < n) { r.se(); i += 1 }
    }
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val picWidthInMbs = r.ue() + 1
    val picHeightInMapUnits = r.ue() + 1
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field_flag
    r.u(1) // direct_8x8_inference_flag
    var (cropL, cropR, cropT, cropB) = (0, 0, 0, 0)
    if (r.u(1) == 1) { // frame_cropping_flag
      cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue()
    }
    // crop units (§7.4.2.1.1): ChromaArrayType 0 → 1; 4:2:0 → (2, 2);
    // 4:2:2 → (2, 1); 4:4:4 → (1, 1); vertical also ×(2 − frame_mbs_only)
    val chromaArrayType = if (separateColourPlane == 1) 0 else chromaFormatIdc
    val (subW, subH) = chromaArrayType match {
      case 1 => (2, 2); case 2 => (2, 1); case _ => (1, 1)
    }
    val cropUnitX = if (chromaArrayType == 0) 1 else subW
    val cropUnitY =
      (if (chromaArrayType == 0) 1 else subH) * (2 - frameMbsOnly)
    val width = picWidthInMbs * 16 - cropUnitX * (cropL + cropR)
    val height =
      (2 - frameMbsOnly) * picHeightInMapUnits * 16 - cropUnitY * (cropT + cropB)
    var fps = 0.0
    if (r.u(1) == 1) { // vui_parameters_present_flag
      if (r.u(1) == 1) { // aspect_ratio_info_present_flag
        val idc = r.u(8)
        if (idc == 255) { r.u(16); r.u(16) } // Extended_SAR
      }
      if (r.u(1) == 1) r.u(1) // overscan
      if (r.u(1) == 1) { // video_signal_type_present_flag
        r.u(3); r.u(1)
        if (r.u(1) == 1) { r.u(8); r.u(8); r.u(8) }
      }
      if (r.u(1) == 1) { r.ue(); r.ue() } // chroma_loc_info
      if (r.u(1) == 1) { // timing_info_present_flag
        val numUnitsInTick = (r.u(16).toLong << 16) | r.u(16)
        val timeScale = (r.u(16).toLong << 16) | r.u(16)
        r.u(1) // fixed_frame_rate_flag
        // field-based clock: two ticks per frame (§E.2.1)
        if (numUnitsInTick > 0)
          fps = timeScale.toDouble / (2.0 * numUnitsInTick)
      }
    }
    SpsInfo(profileIdc, levelIdc, width, height, fps, picWidthInMbs,
      picHeightInMapUnits, frameMbsOnly == 1, log2MaxFrameNum, pocType,
      cropL + cropR + cropT + cropB > 0)
  }

  /** Parse an Annex-B H.264 elementary stream: SPS geometry + slice
    * counts. None when no SPS parses. Slice counts assume one slice
    * per picture (a frame COUNT needs first_mb_in_slice==0 checks the
    * metadata layer does not attempt). */
  def parseH264(bytes: Array[Byte]): Option[H264Meta] =
    try {
      val nals = nalUnits(bytes)
      val sps = nals.collectFirst { case (7, payload) =>
        parseSpsRbsp(unescapeRbsp(payload))
      }
      sps.collect { case (p, l, w, h, fps) if w > 0 && h > 0 =>
        H264Meta(p, l, w, h, fps,
          nals.count(_._1 == 5), nals.count(_._1 == 1))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** MSB-first bit writer with ue(v)/se(v) — the SPS fixture/export
    * path (inverse of the parser, used to build test streams; a real
    * encoder is out of scope). Adds emulation prevention on `toNal`. */
  final class BitWriter {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) { bits += ((v >> i) & 1); i -= 1 }
      this
    }
    def ue(v: Int): this.type = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(0, len - 1); u(k, len)
    }
    def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** pcm_alignment_zero_bit run to the next byte boundary. */
    def alignZero(): this.type = {
      while (bits.size % 8 != 0) u(0, 1)
      this
    }
    /** rbsp_trailing_bits + byte align, then emulation-prevent. */
    def toRbsp: Array[Byte] = {
      val all = bits :+ 1
      val padded = all ++ Seq.fill((8 - all.size % 8) % 8)(0)
      val raw = padded.grouped(8)
        .map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
      val out = new java.io.ByteArrayOutputStream()
      var zeros = 0
      raw.foreach { b =>
        if (zeros >= 2 && (b & 0xFC) == 0) { out.write(3); zeros = 0 }
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      out.toByteArray
    }
  }

  // ------------------------------------------------- MP4 / ISO-BMFF
  /** One parsed MP4 track. `kind` is the hdlr handler ("vide"/"soun"),
    * `codec` the stsd sample-entry fourcc; width/height from the
    * sample entry for video tracks; `durationMs` from mdhd;
    * `sampleCount` summed from stts. */
  final case class Mp4Track(kind: String, codec: String, width: Int,
                            height: Int, durationMs: Long,
                            sampleCount: Long)

  /** Parsed MP4 container: brand, movie duration (mvhd), tracks, and —
    * when a video track carries an avcC configuration — the embedded
    * SPS parsed with the same machinery as Annex-B streams. */
  final case class Mp4Meta(majorBrand: String, durationMs: Long,
                           tracks: Seq[Mp4Track],
                           sps: Option[H264Meta])

  /** ISO-BMFF box walk (ISO/IEC 14496-12): size(4) fourcc(4) [size==1
    * → 64-bit largesize]; container boxes (moov/trak/mdia/minf/stbl)
    * recurse. Returns None unless the payload leads with a well-formed
    * `ftyp` and contains a `moov` with at least one track. Truncated
    * box trees stop cleanly at the damage. */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      def fourcc(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 16 || fourcc(4) != "ftyp") return None
      val majorBrand = fourcc(8)
      var movieDurMs = 0L
      val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
      var sps: Option[H264Meta] = None
      // per-trak state, committed when the trak box closes
      final class Trak {
        var kind = ""; var codec = ""; var width = 0; var height = 0
        var timescale = 1L; var duration = 0L; var samples = 0L
      }
      val containers = Set("moov", "trak", "mdia", "minf", "stbl")
      def fullBoxBody(off: Int): (Int, Int) = // (version, bodyOff)
        ((bytes(off) & 0xFF), off + 4)
      def parseStsd(off: Int, end: Int, t: Trak): Unit = {
        val (_, b0) = fullBoxBody(off)
        val n = bb.getInt(b0)
        var off2 = b0 + 4
        var i = 0
        while (i < n && off2 + 8 <= end) {
          val sz = bb.getInt(off2)
          if (sz < 16 || off2 + sz > end) return
          t.codec = fourcc(off2 + 4)
          if (t.kind == "vide" && sz >= 86) {
            // VisualSampleEntry: 6 reserved + dri(2) + 16 pre_defined/
            // reserved → width(2) height(2) at offset 32 from entry
            t.width = bb.getShort(off2 + 32) & 0xFFFF
            t.height = bb.getShort(off2 + 34) & 0xFFFF
            // child boxes start after the 86-byte VisualSampleEntry
            var c = off2 + 86
            while (c + 8 <= off2 + sz) {
              val csz = bb.getInt(c)
              if (csz < 8 || c + csz > off2 + sz) return
              if (fourcc(c + 4) == "avcC" && csz >= 15) {
                // avcC: ver(1) profile(1) compat(1) level(1)
                // lengthSizeMinusOne(1) numSps(1,&0x1F) [len(2) sps...]
                val nSps = bytes(c + 13) & 0x1F
                if (nSps > 0) {
                  val len = bb.getShort(c + 14) & 0xFFFF
                  if (c + 16 + len <= c + csz && len > 1) {
                    val nal = java.util.Arrays
                      .copyOfRange(bytes, c + 16, c + 16 + len)
                    if ((nal(0) & 0x1F) == 7) {
                      val (p, lv, w, h, f) =
                        parseSpsRbsp(unescapeRbsp(nal.drop(1)))
                      if (w > 0 && h > 0)
                        sps = Some(H264Meta(p, lv, w, h, f, 0, 0))
                    }
                  }
                }
              }
              c += csz
            }
          }
          off2 += sz; i += 1
        }
      }
      def walk(off0: Int, end: Int, trak: Trak): Unit = {
        var off = off0
        while (off + 8 <= end) {
          var sz: Long = bb.getInt(off) & 0xFFFFFFFFL
          var body = off + 8
          if (sz == 1) { sz = bb.getLong(off + 8); body = off + 16 }
          // `sz > end - off` (not `off + sz > end`): a corrupt 64-bit
          // largesize near Long.MaxValue would overflow the addition
          // and sneak past the truncation guard
          if (sz < 8 || sz > (end - off).toLong) return // truncated: stop
          val id = fourcc(off + 4)
          id match {
            case "trak" =>
              val t = new Trak
              walk(body, (off + sz).toInt, t)
              tracks += Mp4Track(t.kind, t.codec, t.width, t.height,
                if (t.timescale > 0) t.duration * 1000 / t.timescale else 0,
                t.samples)
            case c if containers(c) => walk(body, (off + sz).toInt, trak)
            case "mvhd" =>
              val (v, b0) = fullBoxBody(body)
              if (v == 1) {
                val ts = bb.getInt(b0 + 16) & 0xFFFFFFFFL
                val dur = bb.getLong(b0 + 20)
                if (ts > 0) movieDurMs = dur * 1000 / ts
              } else {
                val ts = bb.getInt(b0 + 8) & 0xFFFFFFFFL
                val dur = bb.getInt(b0 + 12) & 0xFFFFFFFFL
                if (ts > 0) movieDurMs = dur * 1000 / ts
              }
            case "mdhd" =>
              val (v, b0) = fullBoxBody(body)
              if (v == 1) {
                trak.timescale = bb.getInt(b0 + 16) & 0xFFFFFFFFL
                trak.duration = bb.getLong(b0 + 20)
              } else {
                trak.timescale = bb.getInt(b0 + 8) & 0xFFFFFFFFL
                trak.duration = bb.getInt(b0 + 12) & 0xFFFFFFFFL
              }
            case "hdlr" =>
              val (_, b0) = fullBoxBody(body)
              trak.kind = fourcc(b0 + 4)
            case "stsd" => parseStsd(body, (off + sz).toInt, trak)
            case "stts" =>
              val (_, b0) = fullBoxBody(body)
              val n = bb.getInt(b0)
              var i = 0
              while (i < n && b0 + 4 + (i + 1) * 8 <= (off + sz).toInt) {
                trak.samples += bb.getInt(b0 + 4 + i * 8) & 0xFFFFFFFFL
                i += 1
              }
            case _ => ()
          }
          off = (off + sz).toInt
        }
      }
      walk(0, bytes.length, new Trak)
      if (tracks.isEmpty) None
      else Some(Mp4Meta(majorBrand, movieDurMs, tracks.toSeq, sps))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Minimal MP4 writer (fixture/export path): ftyp + moov[mvhd +
    * trak[tkhd, mdia[mdhd, hdlr, minf[stbl[stsd(avc1+avcC | mp4a),
    * stts]]]]] — structurally valid, no mdat (header metadata only,
    * symmetric with [[writeMp3]]). */
  def writeMp4(videoWidth: Int, videoHeight: Int, spsNal: Array[Byte],
               durationMs: Long, timescale: Long = 1000,
               videoSamples: Long = 0, audio: Boolean = false,
               audioSamples: Long = 0): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array((v >> 24).toByte,
      (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def box(id: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ id.getBytes ++ body
    def fullBox(id: String, body: Array[Byte], version: Int = 0)
      : Array[Byte] =
      box(id, Array(version.toByte, 0.toByte, 0.toByte, 0.toByte) ++ body)
    val dur = durationMs * timescale / 1000
    val mvhd = fullBox("mvhd", be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(dur) ++ new Array[Byte](80))
    def trak(kind: String, stsdEntry: Array[Byte], samples: Long)
      : Array[Byte] = {
      val tkhd = fullBox("tkhd", new Array[Byte](84))
      val mdhd = fullBox("mdhd", be32(0) ++ be32(0) ++ be32(timescale) ++
        be32(dur) ++ be16(0x55C4) ++ be16(0))
      val hdlr = fullBox("hdlr", be32(0) ++ kind.getBytes ++
        new Array[Byte](13))
      val stsd = fullBox("stsd", be32(1) ++ stsdEntry)
      val stts = fullBox("stts", be32(1) ++ be32(samples) ++
        be32(if (samples > 0) dur / samples else 0))
      box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++
        box("minf", box("stbl", stsd ++ stts))))
    }
    val avcC = box("avcC", Array[Byte](1, spsNal(1), spsNal(2), spsNal(3),
      0xFF.toByte, 0xE1.toByte) ++ be16(spsNal.length) ++ spsNal)
    val avc1 = box("avc1", new Array[Byte](24) ++ // 6+2 dri + 16 pre
      be16(videoWidth) ++ be16(videoHeight) ++
      new Array[Byte](50) ++ avcC) // res(8) rsv(4) fc(2) name(32) d(2) pd(2)
    val vTrak = trak("vide", avc1, videoSamples)
    val aTrak = if (audio)
      trak("soun", box("mp4a", new Array[Byte](28)), audioSamples)
    else Array.emptyByteArray
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++
      "isomavc1".getBytes)
    ftyp ++ box("moov", mvhd ++ vTrak ++ aTrak)
  }

  /** SPS NAL bytes (header + escaped RBSP) for the given geometry —
    * what [[writeMp4]] embeds in avcC. */
  // ------------------------------------------ H.264 I_PCM pixel decode
  /** Decoded I_PCM video: per-frame LUMA planes (row-major w×h bytes);
    * chroma is parsed and discarded (the stats layer is luma-only,
    * like the MJPEG path's mean-luma features). */
  final case class H264IPcm(width: Int, height: Int, fps: Double,
                            frames: Seq[Array[Byte]])

  /** The PPS fields the I_PCM decoder must honor. */
  private final case class PpsInfo(cavlc: Boolean, sliceGroups: Int,
                                   deblockCtl: Boolean,
                                   redundantCnt: Boolean)

  private def parsePpsRbsp(b: Array[Byte]): PpsInfo = {
    val r = new BitReader(b)
    r.ue(); r.ue()              // pps id, sps id
    val cavlc = r.u(1) == 0     // entropy_coding_mode_flag
    r.u(1)                      // bottom_field_pic_order_in_frame
    val groups = r.ue() + 1     // num_slice_groups
    r.ue(); r.ue()              // num_ref_idx_l0/l1 defaults
    r.u(1); r.u(2)              // weighted_pred / weighted_bipred_idc
    r.se(); r.se(); r.se()      // pic_init_qp/qs, chroma_qp_offset
    val deblock = r.u(1) == 1   // deblocking_filter_control_present
    r.u(1)                      // constrained_intra_pred
    val redundant = r.u(1) == 1 // redundant_pic_cnt_present
    PpsInfo(cavlc, groups, deblock, redundant)
  }

  /** H.264 PIXEL decode for the I_PCM subset (ITU-T H.264 §7.3.5
    * mb_type 25): raw uncompressed macroblocks every conformant
    * decoder must support, and the one slice of the codec whose
    * bitstream is entirely FORMULA-defined — Exp-Golomb headers,
    * alignment bits, then literal samples. Full residual decode
    * (CAVLC/CABAC + intra prediction + IDCT) needs the spec's VLC
    * tables, which have no generating formula and no offline source
    * here — so any slice containing a non-I_PCM macroblock honestly
    * returns None rather than half-decoding. Supported shape: CAVLC
    * PPS, one slice group, poc_type 2, frame_mbs_only, uncropped,
    * one slice per picture, 4:2:0 8-bit (baseline defaults). */
  def decodeH264IPcm(bytes: Array[Byte]): Option[H264IPcm] =
    try {
      val nals = nalUnits(bytes)
      val sps = nals.collectFirst { case (7, p) =>
        parseSpsInfo(unescapeRbsp(p))
      }.getOrElse(return None)
      if (sps.pocType != 2 || !sps.frameMbsOnly || sps.cropped ||
        HighProfiles(sps.profileIdc)) return None
      val pps = nals.collectFirst { case (8, p) =>
        parsePpsRbsp(unescapeRbsp(p))
      }.getOrElse(return None)
      if (!pps.cavlc || pps.sliceGroups != 1) return None
      val (mbW, mbH) = (sps.widthMbs, sps.heightMapUnits)
      val (w, h) = (mbW * 16, mbH * 16)
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      nals.foreach {
        case (t, p) if t == 5 || t == 1 =>
          val r = new BitReader(unescapeRbsp(p))
          if (r.ue() != 0) return None // one slice per picture only
          val sliceType = r.ue()
          if (sliceType % 5 != 2) return None // I slices only
          r.ue()                    // pps id
          r.u(sps.log2MaxFrameNum)  // frame_num
          if (t == 5) r.ue()        // idr_pic_id
          // poc_type 2 → no poc fields
          if (pps.redundantCnt) r.ue()
          r.se()                    // slice_qp_delta
          if (pps.deblockCtl) {
            val idc = r.ue()
            if (idc != 1) { r.se(); r.se() }
          }
          val luma = new Array[Byte](w * h)
          var mb = 0
          while (mb < mbW * mbH) {
            if (r.ue() != 25) return None // I_PCM or nothing
            r.alignZero()
            val mx = (mb % mbW) * 16
            val my = (mb / mbW) * 16
            var i = 0
            while (i < 256) {
              luma((my + i / 16) * w + mx + (i % 16)) = r.u(8).toByte
              i += 1
            }
            var c = 0
            while (c < 128) { r.u(8); c += 1 } // Cb + Cr 8×8, discarded
            mb += 1
          }
          frames += luma
        case _ => ()
      }
      if (frames.isEmpty) None
      else Some(H264IPcm(w, h, sps.fps, frames.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** I_PCM fixture writer (the pixel twin of [[writeMp3L1Tone]]): each
    * frame's luma plane goes out verbatim as I_PCM macroblocks inside
    * one IDR slice (chroma written as neutral 128), behind a real
    * SPS/PPS pair — spec-exact headers, emulation prevention included,
    * so [[decodeH264IPcm]] must return the planted planes
    * byte-for-byte. */
  def writeH264IPcm(frames: Seq[Array[Byte]], widthMbs: Int,
                    heightMbs: Int, fps: Double = 10.0): Array[Byte] = {
    val (w, h) = (widthMbs * 16, heightMbs * 16)
    require(frames.nonEmpty && frames.forall(_.length == w * h))
    val bos = new java.io.ByteArrayOutputStream()
    def nal(header: Int, rbsp: Array[Byte]): Unit = {
      bos.write(Array[Byte](0, 0, 0, 1))
      bos.write(header)
      bos.write(rbsp)
    }
    nal(0x67, spsRbsp(widthMbs, heightMbs, fps = fps))
    val ppsW = new BitWriter
    ppsW.ue(0).ue(0)        // pps id, sps id
      .u(0, 1)              // CAVLC
      .u(0, 1)              // bottom_field_pic_order
      .ue(0)                // one slice group
      .ue(0).ue(0)          // num_ref_idx defaults
      .u(0, 1).u(0, 2)      // weighted pred / bipred
      .se(0).se(0).se(0)    // qp / qs / chroma offset
      .u(0, 1)              // deblocking ctl absent
      .u(0, 1)              // constrained intra
      .u(0, 1)              // redundant cnt absent
    nal(0x68, ppsW.toRbsp)
    frames.zipWithIndex.foreach { case (luma, fi) =>
      val sw = new BitWriter
      sw.ue(0)       // first_mb_in_slice
        .ue(7)       // slice_type: I (all slices I)
        .ue(0)       // pps id
        .u(0, 4)     // frame_num (log2_max_frame_num = 4)
        .ue(fi % 64) // idr_pic_id
        .se(0)       // slice_qp_delta
      var mb = 0
      while (mb < widthMbs * heightMbs) {
        sw.ue(25)    // I_PCM
        sw.alignZero()
        val mx = (mb % widthMbs) * 16
        val my = (mb / widthMbs) * 16
        var i = 0
        while (i < 256) {
          sw.u(luma((my + i / 16) * w + mx + (i % 16)) & 0xFF, 8)
          i += 1
        }
        var c = 0
        while (c < 128) { sw.u(128, 8); c += 1 } // neutral chroma
        mb += 1
      }
      nal(0x65, sw.toRbsp) // IDR, nal_ref_idc 3
    }
    bos.toByteArray
  }

  def spsNal(widthMbs: Int, heightMapUnits: Int, cropRight: Int = 0,
             cropBottom: Int = 0, highProfile: Boolean = false,
             fps: Double = 0.0): Array[Byte] =
    Array(0x67.toByte) ++ spsRbsp(widthMbs, heightMapUnits, cropRight,
      cropBottom, highProfile, fps)

  /** SPS RBSP bytes (escaped) for the given geometry — shared by
    * [[writeH264]] (Annex-B) and [[writeMp4]] (avcC). */
  def spsRbsp(widthMbs: Int, heightMapUnits: Int,
              cropRight: Int = 0, cropBottom: Int = 0,
              highProfile: Boolean = false, fps: Double = 0.0): Array[Byte] = {
    val w = new BitWriter
    w.u(if (highProfile) 100 else 66, 8) // profile_idc
    w.u(0, 8)                            // constraint flags
    w.u(31, 8)                           // level_idc 3.1
    w.ue(0)                              // sps id
    if (highProfile) {
      w.ue(1)      // chroma_format_idc 4:2:0
      w.ue(0).ue(0) // bit depths
      w.u(0, 1)    // transform bypass
      w.u(0, 1)    // no scaling matrix
    }
    w.ue(0)   // log2_max_frame_num_minus4
    w.ue(2)   // pic_order_cnt_type (2: no extra fields)
    w.ue(1)   // max_num_ref_frames
    w.u(0, 1) // gaps allowed
    w.ue(widthMbs - 1)
    w.ue(heightMapUnits - 1)
    w.u(1, 1) // frame_mbs_only
    w.u(1, 1) // direct_8x8
    if (cropRight > 0 || cropBottom > 0)
      w.u(1, 1).ue(0).ue(cropRight).ue(0).ue(cropBottom)
    else w.u(0, 1)
    if (fps > 0) {
      w.u(1, 1) // vui present
      w.u(0, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1) // aspect/overscan/signal/chroma-loc
      w.u(1, 1) // timing_info_present
      val num = 1000
      val scale = math.round(fps * 2 * num).toInt
      w.u(num >> 16, 16).u(num & 0xFFFF, 16)
      w.u(scale >> 16, 16).u(scale & 0xFFFF, 16)
      w.u(1, 1) // fixed_frame_rate
      // remaining VUI flags: nal_hrd, vcl_hrd, pic_struct, bitstream_restriction
      w.u(0, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
    } else w.u(0, 1)
    w.toRbsp
  }

  /** Build a minimal Annex-B stream: SPS (+ fake PPS and slice NAL
    * headers so the stream has countable pictures). Baseline profile
    * unless `highProfile`; geometry via mbs + crop; optional fps via
    * VUI timing. */
  def writeH264(widthMbs: Int, heightMapUnits: Int,
                cropRight: Int = 0, cropBottom: Int = 0,
                highProfile: Boolean = false, fps: Double = 0.0,
                nIdr: Int = 1, nNonIdr: Int = 2): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def nal(refIdc: Int, t: Int, payload: Array[Byte]): Unit = {
      bos.write(Array(0, 0, 0, 1).map(_.toByte))
      bos.write((refIdc << 5) | t)
      bos.write(payload)
    }
    nal(3, 7, spsRbsp(widthMbs, heightMapUnits, cropRight, cropBottom,
      highProfile, fps))
    nal(3, 8, Array(0xE8, 0x43, 0x8F).map(_.toByte)) // opaque PPS payload
    (0 until nIdr).foreach(_ =>
      nal(3, 5, Array(0x88, 0x84, 0x21).map(_.toByte)))
    (0 until nNonIdr).foreach(_ =>
      nal(2, 1, Array(0x9A, 0x21, 0x04).map(_.toByte)))
    bos.toByteArray
  }

  // ------------------------------------------------- PCM-in-MP4 decode
  /** Leads with an ISO-BMFF `ftyp` box? */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  /** PCM sample-entry fourccs this decoder handles: QuickTime's
    * uncompressed-audio codecs ('sowt' little-endian / 'twos'
    * big-endian signed 16-bit, 'raw ' 8-bit offset-binary). */
  private val PcmCodecs = Set("sowt", "twos", "raw ")

  /** REAL sample decode for UNCOMPRESSED-PCM audio tracks in an
    * MP4/QuickTime container (ISO/IEC 14496-12 sample tables): walks
    * stsd for the audio sample entry, maps samples to byte ranges via
    * stsc × stsz × stco/co64, reads the PCM out of mdat, and re-emits
    * it as canonical little-endian WAV so it enters the SAME shared
    * javax.sound feature path as every other audio container (the
    * Flac.decodeToWav pattern). None when the container has no PCM
    * audio track (compressed codecs like real `mp4a`/AAC stay
    * header-metadata-only — that stub is documented, this closes the
    * uncompressed-in-MP4 notch). Truncated sample tables fail to None,
    * never throw. */
  def mp4PcmToWav(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      if (!isMp4(bytes)) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      def fourcc(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val containers = Set("moov", "trak", "mdia", "minf", "stbl")
      final class Trak {
        var kind = ""; var codec = ""; var channels = 0
        var sampleBits = 0; var rate = 0
        var stco: Array[Long] = Array.empty
        var stscFirst: Array[Long] = Array.empty // 1-based first chunk
        var stscSpc: Array[Long] = Array.empty
        var szConst = 0L
        var szTable: Array[Long] = Array.empty
      }
      var pcm: Option[Trak] = None
      def walk(off0: Int, end: Int, trak: Trak): Unit = {
        var off = off0
        while (off + 8 <= end) {
          var sz: Long = bb.getInt(off) & 0xFFFFFFFFL
          var body = off + 8
          if (sz == 1) { sz = bb.getLong(off + 8); body = off + 16 }
          if (sz < 8 || sz > (end - off).toLong) return
          val id = fourcc(off + 4)
          id match {
            case "trak" =>
              val t = new Trak
              walk(body, (off + sz).toInt, t)
              if (t.kind == "soun" && PcmCodecs(t.codec) && pcm.isEmpty &&
                  t.channels > 0 && t.stco.nonEmpty) pcm = Some(t)
            case c if containers(c) => walk(body, (off + sz).toInt, trak)
            case "hdlr" => trak.kind = fourcc(body + 8)
            case "stsd" =>
              val n = bb.getInt(body + 4)
              var e = body + 8
              var i = 0
              while (i < n && e + 36 <= (off + sz).toInt) {
                val esz = bb.getInt(e)
                if (esz < 36 || e + esz > (off + sz).toInt) return
                trak.codec = fourcc(e + 4)
                // AudioSampleEntry: 6 reserved + dri(2), version(2)
                // revision(2) vendor(4), channelcount(2) samplesize(2),
                // pre_defined(2) reserved(2), samplerate(16.16)
                trak.channels = bb.getShort(e + 24) & 0xFFFF
                trak.sampleBits = bb.getShort(e + 26) & 0xFFFF
                trak.rate = bb.getInt(e + 32) >>> 16
                e += esz; i += 1
              }
            case "stco" | "co64" =>
              val n = bb.getInt(body + 4)
              trak.stco = Array.tabulate(n)(i =>
                if (id == "stco") bb.getInt(body + 8 + 4 * i) & 0xFFFFFFFFL
                else bb.getLong(body + 8 + 8 * i))
            case "stsc" =>
              val n = bb.getInt(body + 4)
              trak.stscFirst = Array.tabulate(n)(i =>
                bb.getInt(body + 8 + 12 * i) & 0xFFFFFFFFL)
              trak.stscSpc = Array.tabulate(n)(i =>
                bb.getInt(body + 12 + 12 * i) & 0xFFFFFFFFL)
            case "stsz" =>
              trak.szConst = bb.getInt(body + 4) & 0xFFFFFFFFL
              val n = bb.getInt(body + 8)
              if (trak.szConst == 0)
                trak.szTable = Array.tabulate(n)(i =>
                  bb.getInt(body + 12 + 4 * i) & 0xFFFFFFFFL)
              else trak.szTable = Array.fill(n)(trak.szConst)
            case _ => ()
          }
          off = (off + sz).toInt
        }
      }
      walk(0, bytes.length, new Trak)
      pcm.flatMap { t =>
        // chunk c (1-based) holds spc(c) samples per the stsc run table
        def spcOf(chunk1: Long): Long = {
          var i = t.stscFirst.length - 1
          while (i > 0 && t.stscFirst(i) > chunk1) i -= 1
          if (t.stscSpc.isEmpty) 0L else t.stscSpc(i)
        }
        val out = new java.io.ByteArrayOutputStream()
        var sample = 0
        var chunk = 0
        while (chunk < t.stco.length && sample < t.szTable.length) {
          var byteOff = t.stco(chunk)
          var k = 0L
          val spc = spcOf(chunk + 1L)
          while (k < spc && sample < t.szTable.length) {
            val len = t.szTable(sample).toInt
            if (byteOff < 0 || byteOff + len > bytes.length) return None
            out.write(bytes, byteOff.toInt, len)
            byteOff += len; sample += 1; k += 1
          }
          chunk += 1
        }
        val data0 = out.toByteArray
        if (data0.isEmpty) return None
        // canonicalize byte order: WAV is little-endian
        val (data, bits) = t.codec match {
          case "twos" =>
            val d = data0.clone()
            var i = 0
            while (i + 1 < d.length) {
              val tmp = d(i); d(i) = d(i + 1); d(i + 1) = tmp; i += 2
            }
            (d, 16)
          case "sowt" => (data0, 16)
          case _ => (data0, 8) // 'raw ': 8-bit offset-binary == WAV u8
        }
        Some(wavOf(data, t.channels, if (t.rate > 0) t.rate else 8000, bits))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Minimal canonical WAV container around raw PCM bytes. */
  private def wavOf(data: Array[Byte], channels: Int, rate: Int,
                    bits: Int): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte)
    val block = channels * bits / 8
    "RIFF".getBytes ++ le32(36L + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate.toLong) ++ le32(rate.toLong * block) ++ le16(block) ++
      le16(bits) ++ "data".getBytes ++ le32(data.length.toLong) ++ data
  }

  /** Fixture/export writer for a PCM audio MP4: ftyp + mdat + moov
    * with full sample tables (stsd PCM entry, stts, stsc, stsz, stco).
    * mdat precedes moov so the single stco chunk offset is a constant
    * (ftyp length + 8) — no post-hoc patching. Round-tripped against
    * [[mp4PcmToWav]] in Mp4PcmSpec. */
  def writePcmMp4(pcm: Array[Short], rate: Int, codec: String = "sowt")
      : Array[Byte] = {
    require(PcmCodecs(codec) && codec != "raw ", s"unsupported $codec")
    def be32(v: Long): Array[Byte] = Array((v >> 24).toByte,
      (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def box(id: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ id.getBytes ++ body
    def fullBox(id: String, body: Array[Byte]): Array[Byte] =
      box(id, new Array[Byte](4) ++ body)
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++
      "isomqt  ".getBytes)
    val data = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      val v = pcm(i)
      if (codec == "sowt") {
        data(2 * i) = (v & 0xFF).toByte; data(2 * i + 1) = (v >> 8).toByte
      } else {
        data(2 * i) = (v >> 8).toByte; data(2 * i + 1) = (v & 0xFF).toByte
      }
      i += 1
    }
    val mdat = box("mdat", data)
    val n = pcm.length.toLong
    val mvhd = fullBox("mvhd", be32(0) ++ be32(0) ++ be32(rate.toLong) ++
      be32(n) ++ new Array[Byte](80))
    val tkhd = fullBox("tkhd", new Array[Byte](84))
    val mdhd = fullBox("mdhd", be32(0) ++ be32(0) ++ be32(rate.toLong) ++
      be32(n) ++ be16(0x55C4) ++ be16(0))
    val hdlr = fullBox("hdlr", be32(0) ++ "soun".getBytes ++
      new Array[Byte](13))
    val entry = box(codec, new Array[Byte](8) ++ // 6 reserved + dri
      be16(0) ++ be16(0) ++ be32(0) ++            // version/revision/vendor
      be16(1) ++ be16(16) ++ be16(0) ++ be16(0) ++ // ch, bits, pre, res
      be32(rate.toLong << 16))                     // 16.16 sample rate
    val stsd = fullBox("stsd", be32(1) ++ entry)
    val stts = fullBox("stts", be32(1) ++ be32(n) ++ be32(1))
    val stsc = fullBox("stsc", be32(1) ++ be32(1) ++ be32(n) ++ be32(1))
    val stsz = fullBox("stsz", be32(2) ++ be32(n))
    val stco = fullBox("stco", be32(1) ++ be32(ftyp.length + 8L))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val smhd = fullBox("smhd", be32(0))
    val trak = box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++
      box("minf", smhd ++ stbl)))
    ftyp ++ mdat ++ box("moov", mvhd ++ trak)
  }
}
