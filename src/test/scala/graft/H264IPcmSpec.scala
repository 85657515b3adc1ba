package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{MediaMeta, Multimodal}

/** H.264 I_PCM pixel decode: writer → decoder byte-exact round trip
  * (including patterns that force emulation-prevention bytes),
  * rejection of residual-coded streams and damage, feature physics,
  * and byte-reproducibility of the committed fixture. */
class H264IPcmSpec extends AnyFunSuite {

  test("planted luma planes round-trip byte-for-byte") {
    // 2×2 MBs; gradient + stripes force a mix of values incl. long
    // zero runs (emulation-prevention territory)
    val (wm, hm) = (2, 2)
    val (w, h) = (wm * 16, hm * 16)
    val f0 = Array.tabulate(w * h)(i => ((i % w) * 255 / (w - 1)).toByte)
    val f1 = Array.tabulate(w * h)(i => (if ((i / w) % 2 == 0) 0 else 255).toByte)
    val f2 = new Array[Byte](w * h) // all zeros: worst case for escaping
    val bytes = MediaMeta.writeH264IPcm(Seq(f0, f1, f2), wm, hm, fps = 25.0)
    val d = MediaMeta.decodeH264IPcm(bytes).get
    assert(d.width == w && d.height == h && d.frames.size == 3)
    assert(math.abs(d.fps - 25.0) < 1e-9)
    for ((want, got) <- Seq(f0, f1, f2).zip(d.frames))
      assert(java.util.Arrays.equals(want, got), "luma plane diverged")
  }

  test("the header-metadata layer agrees with the decode on geometry") {
    val bytes = MediaMeta.writeH264IPcm(
      Seq(Array.fill[Byte](32 * 16)(7)), 2, 1)
    val meta = MediaMeta.parseH264(bytes).get
    assert(meta.width == 32 && meta.height == 16 && meta.nIdrSlices == 1)
  }

  test("residual-coded streams and damage decode to None, never throw") {
    // writeH264's fake slices are NOT I_PCM payloads
    val residual = MediaMeta.writeH264(4, 3)
    assert(MediaMeta.decodeH264IPcm(residual).isEmpty)
    val ok = MediaMeta.writeH264IPcm(
      Seq(Array.fill[Byte](32 * 16)(50)), 2, 1)
    for (cut <- Seq(10, ok.length / 2, ok.length - 3))
      MediaMeta.decodeH264IPcm(java.util.Arrays.copyOf(ok, cut)) // no throw
    assert(MediaMeta.decodeH264IPcm("not a NAL stream".getBytes).isEmpty)
  }

  test("feature row matches closed-form physics") {
    val f = Multimodal.h264IPcmFeatures(FixtureGen.h264IPcm()).get
    assert(f(0) == 32f && f(1) == 16f && f(2) == 3f)
    assert(math.abs(f(3) - 0.3) < 1e-6)   // duration at 10 fps
    assert(f(4) == 10f)
    assert(f(5) == 120f)                  // mean of 40/120/200
    assert(math.abs(f(6) - math.sqrt(12800.0 / 3)) < 1e-4)
    assert(f(7) == 2f)                    // aspect
  }

  test("committed fixture bytes reproduce from source") {
    val in = getClass.getResourceAsStream("/graft/fixtures/h264_ipcm.264")
    val committed = try in.readAllBytes() finally in.close()
    assert(java.util.Arrays.equals(committed, FixtureGen.h264IPcm()))
  }
}
