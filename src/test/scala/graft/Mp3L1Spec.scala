package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{MediaMeta, Multimodal}

/** MPEG-1 Layer-I subband decode (MediaMeta.decodeMp3L1): writer →
  * decoder round trip against the closed-form requantization physics,
  * silent-subband exactness, rejection of everything the decoder does
  * not claim (other layers, joint stereo, truncation, garbage). */
class Mp3L1Spec extends AnyFunSuite {

  test("planted tone round-trips within the quantization step") {
    for ((sb, a, sfIdx, nb) <- Seq((4, 0.5, 0, 15), (0, 0.25, 3, 12),
        (31, 0.9, 0, 8), (17, 0.1, 6, 4))) {
      val bytes = MediaMeta.writeMp3L1Tone(8, sb, a, sfIdx, nb)
      val d = MediaMeta.decodeMp3L1(bytes).get
      assert(d.sampleRateHz == 32000 && d.channels == 1 && d.frames == 8)
      assert(d.nbMax == nb)
      // quantization step of the midrise quantizer, rescaled
      val sf = 2.0 * math.pow(2.0, -sfIdx / 3.0)
      val step = sf * math.pow(2.0, 1 - nb) *
        (1L << nb).toDouble / ((1L << nb) - 1)
      var i = 0
      while (i < d.sub.length) {
        val v = d.sub(i)
        if (i % 32 == sb) assert(math.abs(v - a) <= step,
          s"subband $sb sample $v vs planted $a (step $step)")
        else assert(v == 0f, s"silent subband ${i % 32} leaked $v")
        i += 1
      }
    }
  }

  test("feature row matches closed-form physics") {
    val f = Multimodal.mp3L1Features(
      MediaMeta.writeMp3L1Tone(21, 4, 0.5)).get
    assert(f(0) == 32000f && f(1) == 1f)
    assert(math.abs(f(2) - 21 * 384.0 / 32000) < 1e-6) // duration
    assert(math.abs(f(3) - 0.5 / math.sqrt(32)) < 1e-4) // RMS
    assert(f(4) == 1f)                                  // dominant share
    assert(math.abs(f(5) - 0.5) < 1e-4)                 // peak
    assert(math.abs(f(6) - 0.5 / 32) < 1e-5)            // mean |s|
    assert(f(7) == 15f)                                 // nbMax
  }

  test("Layer III / joint stereo / damage all decode to None") {
    // Layer III zero-payload frames (writeMp3 default): header-only
    val l3 = MediaMeta.writeMp3(Seq(5, 5, 5))
    assert(MediaMeta.parseMp3(l3).isDefined)
    assert(MediaMeta.decodeMp3L1(l3).isEmpty)
    // joint-stereo Layer I: flip the channel-mode bits to 01
    val js = MediaMeta.writeMp3L1Tone(4, 4, 0.5)
    var i = 0
    while (i + 48 <= js.length) { js(i + 3) = 0x40.toByte; i += 48 }
    assert(MediaMeta.decodeMp3L1(js).isEmpty)
    // truncation mid-frame: clean prefix decode (3 of 4 frames), no throw
    val ok = MediaMeta.writeMp3L1Tone(4, 4, 0.5)
    val trunc = MediaMeta.decodeMp3L1(
      java.util.Arrays.copyOf(ok, ok.length - 20))
    assert(trunc.exists(_.frames == 3))
    assert(MediaMeta.decodeMp3L1(
      "not an mpeg stream at all, definitely".getBytes).isEmpty)
    // a single frame never qualifies (chain rule)
    assert(MediaMeta.decodeMp3L1(
      java.util.Arrays.copyOf(ok, 48)).isEmpty)
  }

  test("committed fixture bytes reproduce from source") {
    val in = getClass.getResourceAsStream("/graft/fixtures/mp3_l1_tone.mp3")
    val committed = try in.readAllBytes() finally in.close()
    assert(java.util.Arrays.equals(committed, FixtureGen.mp3L1Tone()))
  }
}
