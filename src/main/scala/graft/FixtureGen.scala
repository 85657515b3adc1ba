package graft

/** Regenerates the committed `avi_scenes.avi` fixture — a 12-frame
  * MJPEG AVI with two planted scene cuts (dark 0-4 → bright 5-8 →
  * mid 9-11; ±3-gray in-scene jitter so within-scene deltas are small
  * but nonzero). Deterministic: same bytes every run, so the fixture's
  * luma physics (pinned in `multimodal_scene_cuts`' oracle) are
  * reproducible from source. Prints the decoded per-frame lumas for
  * every committed AVI so the oracle constants can be re-derived.
  *
  * Usage: runMain graft.FixtureGen [outDir]
  */
object FixtureGen {

  def jpegGray(w: Int, h: Int, base: Int, jitter: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.min(255, math.max(0, base + ((x + y) % 3) + jitter))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  def sceneAvi(): Array[Byte] = {
    val stills = (0 until 12).map { f =>
      if (f < 5) jpegGray(32, 16, 0x20, f)
      else if (f < 9) jpegGray(32, 16, 0xC0, f - 5)
      else jpegGray(32, 16, 0x60, f - 9)
    }
    graft.pipeline.Multimodal.writeMjpegAvi(stills, 32, 16, fps = 10)
  }

  /** The wav_sine PCM (440 Hz, 8 kHz, 0.25 s, half amplitude,
    * truncating conversion) wrapped in a QuickTime 'sowt' PCM MP4 —
    * its decoded feature row must equal wav_sine's exactly, so the
    * decode-stats oracle pins the MP4 sample-table walk to the same
    * physics. */
  def pcmMp4(): Array[Byte] = {
    val pcm = Array.tabulate(2000)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / 8000) * 32767).toShort)
    graft.pipeline.MediaMeta.writePcmMp4(pcm, 8000, "sowt")
  }

  /** A 0.25 s-ish mono Layer-I tone: constant amplitude 0.5 planted in
    * subband 4 (scalefactor 2.0, 15-bit codes), quantized through the
    * exact inverse of the §2.4.3.3 requantization — so the decoded
    * subband stats are closed-form physics: peak ≈ 0.5 (within the
    * 15-bit step), RMS = peak/√32, mean|s| = peak/32, dominant-subband
    * energy share exactly 1.0. */
  def mp3L1Tone(): Array[Byte] =
    graft.pipeline.MediaMeta.writeMp3L1Tone(nFrames = 21, subband = 4,
      amplitude = 0.5)

  /** Three 32×16 I_PCM frames at constant lumas 40/120/200 (10 fps):
    * decoded physics are closed-form — per-frame means exactly
    * 40/120/200, overall mean 120, std √(12800/3) = 65.3197,
    * duration 0.3 s. */
  def h264IPcm(): Array[Byte] = {
    val frames = Seq(40, 120, 200).map { v =>
      Array.fill[Byte](32 * 16)(v.toByte)
    }
    graft.pipeline.MediaMeta.writeH264IPcm(frames, widthMbs = 2,
      heightMbs = 1, fps = 10.0)
  }

  /** 12 ADTS AAC-LC frames at 48 kHz stereo, alternating 200/300-byte
    * frames: duration 12·1024/48000 = 256 ms, measured bitrate
    * (6·200+6·300)·8/256 = 93.75 kbps, variable-rate flag set. */
  def aacAdts(): Array[Byte] =
    graft.pipeline.MediaMeta.writeAdts(
      (0 until 12).map(i => if (i % 2 == 0) 200 else 300))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse("src/main/resources/graft/fixtures")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/avi_scenes.avi"), sceneAvi())
    val mp4 = pcmMp4()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/mp4_pcm_sine.mp4"), mp4)
    println(s"PHYSICS mp4_pcm_sine.mp4 n_bytes=${mp4.length} features=" +
      graft.pipeline.Multimodal.audioFeatures(mp4).get.mkString(","))
    val l1 = mp3L1Tone()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/mp3_l1_tone.mp3"), l1)
    println(s"PHYSICS mp3_l1_tone.mp3 n_bytes=${l1.length} features=" +
      graft.pipeline.Multimodal.mp3L1Features(l1).get.mkString(","))
    val ipcm = h264IPcm()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/h264_ipcm.264"), ipcm)
    println(s"PHYSICS h264_ipcm.264 n_bytes=${ipcm.length} features=" +
      graft.pipeline.Multimodal.h264IPcmFeatures(ipcm).get.mkString(","))
    val aac = aacAdts()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/aac_lc.aac"), aac)
    println(s"PHYSICS aac_lc.aac n_bytes=${aac.length} meta=" +
      graft.pipeline.MediaMeta.parseAdts(aac))
    for (name <- Seq("avi_scenes.avi", "avi_clip.avi")) {
      val p = java.nio.file.Paths.get(s"$dir/$name")
      if (java.nio.file.Files.exists(p)) {
        val v = graft.pipeline.Multimodal
          .parseAvi(java.nio.file.Files.readAllBytes(p)).get
        val lumas = v.frames
          .flatMap(graft.pipeline.Multimodal.decodeImage)
          .map(img => graft.pipeline.Multimodal.imageFeatures(img)(5))
        println(s"PHYSICS $name lumas=" +
          lumas.map(l => f"$l%.3f").mkString(","))
      }
    }
  }
}
