package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Adpcm, G711, Multimodal}

/** IMA ADPCM codec + G.711 encoder behavior. The decode-correctness
  * oracle for the COMMITTED fixtures lives in `multimodal_decode_stats`
  * (pinned physics, hash-gated); this suite covers the codec's
  * internal contracts: reconstruction accuracy bounds, block/state
  * handling, container detection, and the G.711 companding curve
  * against the JDK's own decoders. */
class AdpcmSpec extends AnyFunSuite {

  private def sine(n: Int, rate: Double, hz: Double,
                   amp: Double): Array[Int] =
    Array.tabulate(n)(i =>
      math.round(amp * 32767 * math.sin(2 * math.Pi * hz * i / rate)).toInt)

  private def rndWalk(n: Int, seed: Int, amp: Int = 300): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    var v = 0
    Array.fill(n) {
      v = math.max(-32768, math.min(32767, v + rnd.nextInt(2 * amp) - amp))
      v
    }
  }

  private def rmse(a: Array[Int], b: Array[Int]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s / a.length)
  }

  private def decodeSamples(wav: Array[Byte]): Array[Array[Int]] =
    Adpcm.readPcmWav(Adpcm.decodeToWav(wav).get).get._1

  test("mono round-trip stays within quantization noise; 4:1 size") {
    val pcm = sine(4000, 8000, 440, 0.5)
    val adpcm = Adpcm.encodeImaWav(Adpcm.wrapPcmWav(Array(pcm), 8000,
      pcm.length)).get
    assert(Adpcm.isImaAdpcmWav(adpcm))
    // ~4 bits/sample vs 16: payload about a quarter of the PCM bytes
    assert(adpcm.length < pcm.length * 2 * 0.3 + 200)
    val back = decodeSamples(adpcm)
    assert(back.length == 1 && back(0).length == pcm.length)
    // IMA's 4-bit quantizer gives ~25 dB SNR on a half-scale 440 Hz
    // sine (per-sample slope ~5.7k against an adapting step) — bound
    // the noise at 2.2% full scale and, separately, require the
    // SIGNAL ENERGY to survive: decoded RMS within 0.5% of source
    def rms(a: Array[Int]): Double =
      math.sqrt(a.map(v => v.toDouble * v).sum / a.length)
    assert(rmse(pcm, back(0)) < 700.0, s"rmse=${rmse(pcm, back(0))}")
    assert(math.abs(rms(back(0)) / rms(pcm) - 1.0) < 0.005)
  }

  test("stereo round-trip: independent channel state, exact length") {
    val l = sine(2500, 16000, 440, 0.5)
    val r = rndWalk(2500, seed = 11)
    val adpcm = Adpcm.encodeImaWav(Adpcm.wrapPcmWav(Array(l, r), 16000,
      l.length)).get
    val back = decodeSamples(adpcm)
    assert(back.length == 2 && back(0).length == 2500)
    // each channel tracks ITS OWN signal (interleave not crossed);
    // the sine sees quantization noise, the small-step walk tracks
    // tightly
    assert(rmse(l, back(0)) < 700.0)
    assert(rmse(r, back(1)) < 330.0)
    // a swapped interleave would make channel 0 track the random walk
    assert(rmse(r, back(0)) > 2000.0)
  }

  test("block predictor restart: first sample of each block is verbatim") {
    val pcm = rndWalk(1200, seed = 3) // 3 blocks at 505 samples/block
    val adpcm = Adpcm.encodeImaWav(Adpcm.wrapPcmWav(Array(pcm), 8000,
      pcm.length)).get
    val back = decodeSamples(adpcm)(0)
    assert(back(0) == pcm(0))
    assert(back(505) == pcm(505))
    assert(back(1010) == pcm(1010))
  }

  test("fact chunk trims the final partial block exactly") {
    val pcm = sine(777, 8000, 200, 0.3) // 505 + 272: partial 2nd block
    val adpcm = Adpcm.encodeImaWav(Adpcm.wrapPcmWav(Array(pcm), 8000,
      pcm.length)).get
    assert(decodeSamples(adpcm)(0).length == 777)
  }

  test("container detection: PCM and G.711 WAVs are NOT IMA; garbage " +
      "and truncation decode to None, not throw") {
    val pcm = Adpcm.wrapPcmWav(Array(sine(100, 8000, 440, 0.5)), 8000, 100)
    assert(!Adpcm.isImaAdpcmWav(pcm))
    assert(!Adpcm.isImaAdpcmWav(G711.encodeMuLawWav(pcm).get))
    assert(Adpcm.decodeToWav(Array.fill(64)(0x42.toByte)).isEmpty)
    val adpcm = Adpcm.encodeImaWav(pcm).get
    assert(Adpcm.decodeToWav(adpcm.take(20)).isEmpty)
  }

  test("G.711 companding curve: JDK decode of graft encode is " +
      "monotone, near-identity at segment scale, sign-symmetric") {
    // build a WAV of probe amplitudes, decode via the shared
    // javax.sound path (audioFeatures canonicalizes to PCM16)
    val probes = Array(-32000, -8000, -500, -16, 0, 16, 500, 8000, 32000)
    def decodedPeakOf(enc: Array[Byte] => Option[Array[Byte]],
                      v: Int): Double = {
      val pcm = Array.fill(400)(v)
      val wav = enc(Adpcm.wrapPcmWav(Array(pcm), 8000, pcm.length)).get
      Multimodal.audioFeatures(wav).get(5) // peak, |x|/32768
    }
    for (enc <- Seq[Array[Byte] => Option[Array[Byte]]](
        G711.encodeMuLawWav _, G711.encodeALawWav _)) {
      val mags = probes.map(v => decodedPeakOf(enc, v))
      // sign symmetry: |decode(x)| == |decode(-x)| within one step
      assert(math.abs(mags(0) - mags(8)) < 0.02)
      assert(math.abs(mags(1) - mags(7)) < 0.01)
      // companding is within ~6% of identity at every probe amplitude
      for ((v, m) <- probes.zip(mags) if v != 0)
        assert(math.abs(m - math.abs(v) / 32768.0) <
          math.max(0.002, 0.06 * math.abs(v) / 32768.0),
          s"probe $v decoded to ${m * 32768}")
    }
  }
}
