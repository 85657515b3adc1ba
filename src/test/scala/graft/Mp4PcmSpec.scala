package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{MediaMeta, Multimodal}

/** PCM-in-MP4 sample decode: writer → box-walk decoder round trip,
  * byte-order variants, the shared-feature-path contract against the
  * identical PCM as WAV, and graceful failure on damage. */
class Mp4PcmSpec extends AnyFunSuite {

  private def sine(n: Int, rate: Double): Array[Short] =
    Array.tabulate(n)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort)

  private def wavOf(pcm: Array[Short], rate: Int): Array[Byte] = {
    val data = new Array[Byte](pcm.length * 2)
    pcm.zipWithIndex.foreach { case (v, i) =>
      data(2 * i) = (v & 0xFF).toByte; data(2 * i + 1) = (v >> 8).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long) = (0 until 4).foreach(k => bos.write(((v >> (8 * k)) & 0xFF).toInt))
    def le16(v: Int) = (0 until 2).foreach(k => bos.write((v >> (8 * k)) & 0xFF))
    bos.write("RIFF".getBytes); le32(36L + data.length)
    bos.write("WAVE".getBytes); bos.write("fmt ".getBytes); le32(16)
    le16(1); le16(1); le32(rate.toLong); le32(rate.toLong * 2); le16(2); le16(16)
    bos.write("data".getBytes); le32(data.length.toLong); bos.write(data)
    bos.toByteArray
  }

  test("sowt and twos round-trip to identical features as the same PCM in WAV") {
    val pcm = sine(2000, 8000)
    val ref = Multimodal.audioFeatures(wavOf(pcm, 8000)).get.toSeq
    for (codec <- Seq("sowt", "twos")) {
      val mp4 = MediaMeta.writePcmMp4(pcm, 8000, codec)
      val wav = MediaMeta.mp4PcmToWav(mp4)
      assert(wav.isDefined, s"$codec track did not decode")
      val got = Multimodal.audioFeatures(mp4).get.toSeq
      assert(got == ref, s"$codec features diverge from the WAV path")
    }
  }

  test("compressed mp4 audio (mp4a) stays header-metadata-only") {
    val sps = MediaMeta.spsNal(4, 3)
    val mp4 = MediaMeta.writeMp4(64, 48, sps, 1000, audio = true,
      audioSamples = 10)
    assert(MediaMeta.mp4PcmToWav(mp4).isEmpty)
  }

  test("truncated sample tables fail to None, never throw") {
    val mp4 = MediaMeta.writePcmMp4(sine(500, 8000), 8000)
    for (cut <- Seq(20, mp4.length / 2, mp4.length - 5)) {
      val t = java.util.Arrays.copyOf(mp4, cut)
      // either decodes nothing or decodes a clean prefix — no throw
      MediaMeta.mp4PcmToWav(t)
    }
    assert(MediaMeta.mp4PcmToWav("garbagegarbagegarbage".getBytes).isEmpty)
  }
}
