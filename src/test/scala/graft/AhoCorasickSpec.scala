package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AhoCorasick

/** Automaton correctness vs naive contains, including the overlap and
  * multi-byte cases that break hand-rolled matchers. */
class AhoCorasickSpec extends SparkSpec {

  private def naive(patterns: Seq[String], text: String): Int =
    patterns.count(text.contains(_))

  test("matches == naive contains over adversarial pattern overlaps") {
    val pats = Seq("a", "aa", "aaa", "ab", "ba", "aba", "bab", "abab")
    val ac = new AhoCorasick(pats)
    val texts = Seq("", "a", "b", "aa", "ab", "ba", "aaa", "abab",
      "ababab", "baba", "xyz", "aabbaaabab", "b" * 50 + "abab")
    texts.foreach { t =>
      assert(ac.hits(UTF8String.fromString(t)) == naive(pats, t),
        s"text='$t'")
    }
  }

  test("pseudo-random texts agree with naive matching") {
    val pats = Seq("spark", "spa", "ark", "par", "arks", "kss", "s s")
    val ac = new AhoCorasick(pats)
    var seed = 12345L
    def next(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 4).toInt }
    val alphabet = "spark "
    (1 to 200).foreach { _ =>
      val len = 1 + next() * 7 + next()
      val t = (0 until len).map(_ => alphabet(
        (next() * 2 + next()) % alphabet.length)).mkString
      assert(ac.hits(UTF8String.fromString(t)) == naive(pats, t),
        s"text='$t'")
    }
  }

  test("multi-byte UTF-8 patterns match exactly, never partially") {
    val pats = Seq("é", "éé", "é", "日本", "本語", "ascii")
    val ac = new AhoCorasick(pats)
    val cases = Seq("café" -> 1, "caféé" -> 2, "日本語" -> 2,
      "éclair" -> 1, "plain ascii here" -> 1, "日 本" -> 0)
    cases.foreach { case (t, want) =>
      assert(ac.hits(UTF8String.fromString(t)) == want, s"text='$t'")
    }
  }

  test("64-pattern mask uses every bit; 65 patterns refuse") {
    val pats = (0 until 64).map(i => f"p$i%02d!")
    val ac = new AhoCorasick(pats)
    val all = pats.mkString(" ")
    assert(ac.hits(UTF8String.fromString(all)) == 64)
    assert(ac.mask(UTF8String.fromString(all)) == -1L)
    intercept[IllegalArgumentException] {
      new AhoCorasick((0 until 65).map(i => s"q$i"))
    }
  }
}
