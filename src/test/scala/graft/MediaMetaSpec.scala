package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MediaMeta

class MediaMetaSpec extends AnyFunSuite {

  // ------------------------------------------------------------- MP3
  test("MP3: hand-pinned header 0xFF 0xFB 0x90 0x00 is MPEG-1 Layer " +
      "III, 128 kbps, 44100 Hz, stereo, 417-byte frame") {
    // The canonical textbook header: FF=sync, FB = 111 11 01 1
    // (sync|MPEG1|LayerIII|no-crc), 90 = 1001 00 0 0 (128 kbps, 44.1
    // kHz, no pad). Frame = 144*128000/44100 = 417 bytes (floor).
    val frame = Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte) ++
      new Array[Byte](413)
    val m = MediaMeta.parseMp3(frame ++ frame ++ frame).get
    assert(m.version == 10 && m.layer == 3)
    assert(m.sampleRateHz == 44100 && m.channels == 2)
    assert(m.frameCount == 3 && !m.vbr)
    assert(m.avgBitrateKbps == 128.0)
    // 3 frames * 1152 samples / 44100 Hz = 78.37 ms
    assert(m.durationMs == 3 * 1152 * 1000L / 44100)
  }

  test("MP3: writer/parser round-trip across versions, layers, " +
      "sample rates and channel modes") {
    for {
      (verBits, ver) <- Seq((3, 10), (2, 20), (0, 25))
      (layerBits, layer) <- Seq((1, 3), (2, 2), (3, 1))
      srIdx <- 0 to 2
      mono <- Seq(true, false)
    } {
      val bytes = MediaMeta.writeMp3(Seq.fill(5)(9), verBits, layerBits,
        srIdx, mono)
      val m = MediaMeta.parseMp3(bytes).getOrElse(
        fail(s"no parse: ver=$verBits layer=$layerBits sr=$srIdx"))
      assert(m.version == ver && m.layer == layer, s"$verBits/$layerBits")
      assert(m.channels == (if (mono) 1 else 2))
      assert(m.frameCount == 5 && !m.vbr)
    }
  }

  test("MP3: VBR detection, ID3v2 skip, and duration arithmetic") {
    val vbr = MediaMeta.writeMp3(Seq(5, 9, 12, 9, 5), id3Bytes = 200)
    val m = MediaMeta.parseMp3(vbr).get
    assert(m.vbr && m.frameCount == 5)
    // MPEG-1 L3 indexes 5/9/12 = 64/128/224 kbps
    assert(m.avgBitrateKbps == (64 + 128 + 224 + 128 + 64) / 5.0)
    assert(m.durationMs == 5 * 1152 * 1000L / 44100)
  }

  test("MP3: garbage, lone false sync, and truncation do not parse") {
    assert(MediaMeta.parseMp3(Array.fill(64)(0xFF.toByte)).isEmpty)
    assert(MediaMeta.parseMp3("not audio at all".getBytes).isEmpty)
    assert(MediaMeta.parseMp3(Array[Byte]()).isEmpty)
    // a single valid header with no chained second frame = false sync
    val one = Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte) ++
      new Array[Byte](100)
    assert(MediaMeta.parseMp3(one).isEmpty)
  }

  // ------------------------------------------------------------ H.264
  test("H.264: baseline SPS 320x240 (20x15 macroblocks, no crop)") {
    val s = MediaMeta.writeH264(widthMbs = 20, heightMapUnits = 15)
    val m = MediaMeta.parseH264(s).get
    assert(m.profileIdc == 66 && m.levelIdc == 31)
    assert(m.width == 320 && m.height == 240)
    assert(m.fps == 0.0)
    assert(m.nIdrSlices == 1 && m.nNonIdrSlices == 2)
  }

  test("H.264: 1920x1080 high profile needs the 1088->1080 bottom crop " +
      "(cropBottom=4 in 2-pixel 4:2:0 units) and carries VUI fps") {
    val s = MediaMeta.writeH264(widthMbs = 120, heightMapUnits = 68,
      cropBottom = 4, highProfile = true, fps = 25.0, nIdr = 2, nNonIdr = 5)
    val m = MediaMeta.parseH264(s).get
    assert(m.profileIdc == 100)
    assert(m.width == 1920 && m.height == 1080)
    assert(m.fps == 25.0)
    assert(m.nIdrSlices == 2 && m.nNonIdrSlices == 5)
  }

  test("H.264: odd geometry via right crop (854x480 from 54 mbs)") {
    // 54*16 = 864; 854 needs 10 pixels = 5 crop units of 2 (4:2:0)
    val s = MediaMeta.writeH264(widthMbs = 54, heightMapUnits = 30,
      cropRight = 5)
    val m = MediaMeta.parseH264(s).get
    assert(m.width == 854 && m.height == 480)
  }

  test("H.264: emulation-prevention bytes round-trip through the " +
      "escape/unescape pair") {
    // heightMapUnits chosen so the ue() bit pattern forces zero bytes
    // into the RBSP; the writer must escape them, the parser unescape
    for (hm <- Seq(16, 32, 64, 128, 256)) {
      val s = MediaMeta.writeH264(widthMbs = 256, heightMapUnits = hm)
      val m = MediaMeta.parseH264(s).getOrElse(fail(s"hm=$hm"))
      assert(m.width == 4096 && m.height == hm * 16, s"hm=$hm")
    }
  }

  test("MP4: box walk finds brand, movie duration, video track " +
      "geometry, stts sample count, and the avcC-embedded SPS") {
    val sps = MediaMeta.spsNal(widthMbs = 80, heightMapUnits = 45,
      highProfile = true, fps = 30.0) // 1280x720
    val mp4 = MediaMeta.writeMp4(videoWidth = 1280, videoHeight = 720,
      spsNal = sps, durationMs = 2000, videoSamples = 60,
      audio = true, audioSamples = 96)
    val m = MediaMeta.parseMp4(mp4).get
    assert(m.majorBrand == "isom")
    assert(m.durationMs == 2000)
    assert(m.tracks.size == 2)
    val vt = m.tracks.find(_.kind == "vide").get
    assert(vt.codec == "avc1" && vt.width == 1280 && vt.height == 720)
    assert(vt.sampleCount == 60 && vt.durationMs == 2000)
    val at = m.tracks.find(_.kind == "soun").get
    assert(at.codec == "mp4a" && at.sampleCount == 96)
    val sm = m.sps.get
    assert(sm.profileIdc == 100 && sm.width == 1280 && sm.height == 720)
    assert(sm.fps == 30.0)
  }

  test("MP4: SPS geometry (crop-exact) wins over the integer sample-" +
      "entry fields in compressedMeta, and fps falls back to " +
      "stts/mdhd when the SPS has no VUI") {
    // SPS says 1920x1080 (cropped); the sample entry lies (1920x1088)
    val sps = MediaMeta.spsNal(widthMbs = 120, heightMapUnits = 68,
      cropBottom = 4, highProfile = true)
    val mp4 = MediaMeta.writeMp4(1920, 1088, sps, durationMs = 4000,
      videoSamples = 100)
    val f = graft.pipeline.Multimodal.compressedMeta("video", mp4).get
    assert(f(0) == 1920f && f(1) == 1080f)
    assert(f(4) == 25.0f) // 100 samples / 4 s from stts+mdhd
    assert(f(7) == 1f)    // container flag: MP4
  }

  test("MP4: garbage, AVI payloads, and truncated boxes do not parse") {
    assert(MediaMeta.parseMp4("no boxes here".getBytes).isEmpty)
    assert(MediaMeta.parseMp4(Array[Byte]()).isEmpty)
    // an MJPEG AVI is RIFF, not BMFF
    val avi = graft.pipeline.Multimodal.writeMjpegAvi(Seq(), 8, 8, 10)
    assert(MediaMeta.parseMp4(avi).isEmpty)
    val good = MediaMeta.writeMp4(320, 240, MediaMeta.spsNal(20, 15), 1000)
    assert(MediaMeta.parseMp4(good.take(40)).isEmpty) // cut inside moov
  }

  test("fuzz: every truncation prefix and single-byte corruption of " +
      "valid payloads parses cleanly or returns None — never throws") {
    // Recursive binary parsers over untrusted corpus bytes: at 100 TB
    // a throw on malformed input kills the task. Truncation sweeps and
    // deterministic byte-flips of VALID payloads reach far deeper
    // parser states than random bytes.
    val payloads: Seq[(String, Array[Byte])] = Seq(
      "mp3" -> MediaMeta.writeMp3(Seq(5, 9, 12), id3Bytes = 16),
      "h264" -> MediaMeta.writeH264(54, 30, cropRight = 5,
        highProfile = true, fps = 25.0),
      "mp4" -> MediaMeta.writeMp4(320, 240, MediaMeta.spsNal(20, 15),
        1000, videoSamples = 30, audio = true, audioSamples = 40))
    def all(b: Array[Byte]): Unit = {
      MediaMeta.parseMp3(b); MediaMeta.parseH264(b); MediaMeta.parseMp4(b)
      ()
    }
    payloads.foreach { case (name, full) =>
      (0 to full.length).foreach { n =>
        try all(full.take(n))
        catch { case e: Throwable =>
          fail(s"$name truncated at $n threw: $e") }
      }
      full.indices.foreach { i =>
        val mut = full.clone()
        // flip all bits of one byte — corrupts sizes, fourccs, syncs
        mut(i) = (~mut(i)).toByte
        try all(mut)
        catch { case e: Throwable => fail(s"$name flip@$i threw: $e") }
      }
    }
    // a 64-bit largesize near Long.MaxValue must not overflow the
    // bounds check (off + sz wraps negative and passes `> end`)
    val good = MediaMeta.writeMp4(320, 240, MediaMeta.spsNal(20, 15), 1000)
    val evil = good.take(24) ++ // keep the valid ftyp
      Array[Byte](0, 0, 0, 1) ++ "moov".getBytes ++ // size==1 → largesize
      Array[Byte](0x7F, -1, -1, -1, -1, -1, -1, -1) ++ // 2^63-1
      new Array[Byte](32)
    try { MediaMeta.parseMp4(evil); () }
    catch { case e: Throwable => fail(s"largesize overflow threw: $e") }
    // and plain random bytes at several lengths (fixed seed)
    val rnd = new scala.util.Random(42)
    Seq(0, 1, 7, 64, 1024, 65536).foreach { n =>
      val b = new Array[Byte](n); rnd.nextBytes(b)
      try all(b) catch { case e: Throwable => fail(s"random[$n] threw: $e") }
    }
  }

  test("dHash: brightness-invariant, shift-tolerant, decode-safe") {
    import java.awt.image.BufferedImage
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = f(x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def g(x: Int, y: Int): Int = {
      val v = 96 + (48 * math.sin(x * 0.35) + 40 * math.cos(y * 0.27) +
        30 * math.sin((x + y) * 0.15)).toInt
      math.max(0, math.min(255, v))
    }
    val base = graft.pipeline.Multimodal.dhash64(png(g)).get
    // dHash compares ADJACENT cells: a uniform brightness shift
    // preserves every gradient sign → identical hash
    val bright = graft.pipeline.Multimodal
      .dhash64(png((x, y) => math.min(255, g(x, y) + 6))).get
    assert(base == bright)
    // 1-pixel translation flips only a few comparisons
    val shift = graft.pipeline.Multimodal
      .dhash64(png((x, y) => g(math.min(x + 1, 31), y))).get
    assert(java.lang.Long.bitCount(base ^ shift) <= 10)
    // unrelated structure lands near 32 bits
    val checker = graft.pipeline.Multimodal
      .dhash64(png((x, y) => if (((x / 4) + (y / 4)) % 2 == 0) 230 else 25))
      .get
    assert(java.lang.Long.bitCount(base ^ checker) >= 20)
    // non-images decode to None, never throw
    assert(graft.pipeline.Multimodal.dhash64("not a png".getBytes).isEmpty)
  }

  test("audio fingerprint: volume/channel-invariant, decode-safe") {
    def res(n: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/fixtures/$n")
      try in.readAllBytes() finally in.close()
    }
    val m = graft.pipeline.Multimodal.audioFingerprint64(
      res("wav_melody.wav")).get
    assert(graft.pipeline.Multimodal.audioFingerprint64(
      res("wav_melody_quiet.wav")).get == m)
    assert(graft.pipeline.Multimodal.audioFingerprint64(
      res("wav_melody_stereo.wav")).get == m)
    val shift = graft.pipeline.Multimodal.audioFingerprint64(
      res("wav_melody_shift.wav")).get
    assert(java.lang.Long.bitCount(m ^ shift) > 8) // trims are NOT caught
    val noise = graft.pipeline.Multimodal.audioFingerprint64(
      res("wav_noise.wav")).get
    assert(java.lang.Long.bitCount(m ^ noise) >= 20)
    assert(graft.pipeline.Multimodal
      .audioFingerprint64("nope".getBytes).isEmpty)
  }

  test("H.264: garbage and truncated streams do not parse") {
    assert(MediaMeta.parseH264("random text".getBytes).isEmpty)
    assert(MediaMeta.parseH264(Array[Byte]()).isEmpty)
    val good = MediaMeta.writeH264(20, 15)
    // cut inside the SPS payload: clean None, no throw
    assert(MediaMeta.parseH264(good.take(8)).isEmpty)
    // stream with only a PPS (no SPS): None
    assert(MediaMeta.parseH264(
      Array(0, 0, 1, 0x68, 0xE8, 0x43).map(_.toByte)).isEmpty)
  }

  test("ADTS: writer/parser round-trip, measured bitrate, VBR flag") {
    // CBR: 10 × 256-byte AAC-LC frames, 44100 Hz (srIdx 4), mono
    val cbr = MediaMeta.writeAdts(Seq.fill(10)(256), profile = 1,
      srIdx = 4, chanCfg = 1)
    val m = MediaMeta.parseAdts(cbr).get
    assert(m.objectType == 2 && m.sampleRateHz == 44100 &&
      m.channels == 1 && m.frameCount == 10 && !m.variableRate)
    assert(m.durationMs == 10 * 1024 * 1000L / 44100) // 232 ms
    // variable frame lengths flip the flag and the measured bitrate
    // follows the byte count exactly
    val vbr = MediaMeta.writeAdts((0 until 12).map(i =>
      if (i % 2 == 0) 200 else 300))
    val v = MediaMeta.parseAdts(vbr).get
    assert(v.variableRate && v.frameCount == 12 && v.durationMs == 256)
    assert(math.abs(v.avgBitrateKbps - 93.75) < 1e-9)
    // 8-channel config maps through (7 → 7.1 layout = 8 channels)
    val eight = MediaMeta.writeAdts(Seq(64, 64), chanCfg = 7)
    assert(MediaMeta.parseAdts(eight).get.channels == 8)
  }

  test("ADTS: garbage, lone sync, reserved index and truncation " +
      "do not parse") {
    assert(MediaMeta.parseAdts("random bytes here".getBytes).isEmpty)
    // a single valid frame never qualifies (chain rule)
    assert(MediaMeta.parseAdts(MediaMeta.writeAdts(Seq(64))).isEmpty)
    // truncation mid-frame: clean prefix
    val ok = MediaMeta.writeAdts(Seq.fill(4)(100))
    val t = MediaMeta.parseAdts(java.util.Arrays.copyOf(ok, 350))
    assert(t.exists(_.frameCount == 3))
    // reserved sampling index (13) rejected at the header level
    val bad = MediaMeta.writeAdts(Seq(64, 64)).clone()
    bad(2) = ((1 << 6) | (13 << 2)).toByte // srIdx 13
    assert(MediaMeta.parseAdts(bad).isEmpty ||
      MediaMeta.parseAdts(bad).get.frameCount < 2)
  }
}
