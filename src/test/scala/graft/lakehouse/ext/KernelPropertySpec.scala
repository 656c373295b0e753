package graft.lakehouse.ext

import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants for the compiled per-row kernels — these run
  * millions of times per second in production, so they get seeded
  * generator-driven coverage beyond the golden vectors. Driver-side only
  * (no SparkSession). */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)
  private val chars = "abcdefghij XYZ.,\n\t 0123"

  private def randomText(maxLen: Int = 120): String =
    (0 until rnd.nextInt(maxLen)).map(_ => chars(rnd.nextInt(chars.length))).mkString

  private def randomVec(maxDim: Int = 48): List[Double] =
    List.fill(1 + rnd.nextInt(maxDim))((rnd.nextDouble() - 0.5) * 2e3)

  private val Trials = 300

  test("l2Kernel output is unit-norm (or all-zero) and direction-preserving") {
    for (_ <- 1 to Trials) {
      val v = randomVec()
      val out = Embeddings.l2Kernel(v)
      val n2 = out.map(x => x * x).sum
      if (v.exists(_ != 0.0)) {
        assert(math.abs(n2 - 1.0) < 1e-9, v)
        assert(v.zip(out).forall { case (a, b) => a.sign == b.sign || b == 0.0 })
      } else assert(out.forall(_ == 0.0))
    }
  }

  test("quantizeKernel stays in [-127,127] and dequantizes within scale/2") {
    for (_ <- 1 to Trials) {
      val v = randomVec()
      val (scale, q) = Embeddings.quantizeKernel(v)
      assert(q.forall(x => x >= -127 && x <= 127), v)
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi * scale) <= scale / 2 + 1e-9, s"$x vs ${qi * scale}")
      }
    }
  }

  test("minhash: appending the same text never raises a signature minimum") {
    val as = Array(3L, 5L, 7L); val bs = Array(11L, 13L, 17L)
    for (_ <- 1 to Trials) {
      val t = randomText()
      val norm = t.toLowerCase.replaceAll("\\s+", " ").trim
      // the rolling path only; the short-string fallback hashes the whole
      // text, where t vs t+t are unrelated by construction
      if (norm.length >= 5) {
        val sig = Dedup.minHashSigKernel(t, 5, as, bs)
        val sig2 = Dedup.minHashSigKernel(t + " " + t, 5, as, bs)
        sig.zip(sig2).foreach { case (a, b) =>
          assert(b <= a, s"'$norm': $a -> $b") }
      }
    }
  }

  test("shingleJaccardKernel is symmetric, bounded, and 1.0 on self") {
    for (_ <- 1 to Trials) {
      val a = randomText(); val b = randomText()
      val ab = Dedup.shingleJaccardKernel(a, b, 3)
      assert(ab == Dedup.shingleJaccardKernel(b, a, 3))
      assert(ab >= 0.0 && ab <= 1.0)
      assert(Dedup.shingleJaccardKernel(a, a, 3) == 1.0)
    }
  }

  test("wordNgramKernel grams are distinct and at most n words long") {
    for (_ <- 1 to Trials) {
      val grams = Dedup.wordNgramKernel(randomText(), 3)
      assert(grams.toSet.size == grams.length)
      grams.foreach(g => assert(g.split(" ", -1).length <= 3, g))
    }
  }

  test("winnowing fingerprint: deterministic and sorted") {
    for (_ <- 1 to Trials) {
      val t = randomText()
      val fp = TextStats.winnowingFingerprint(t)
      assert(fp.toSeq == TextStats.winnowingFingerprint(t).toSeq)
      assert(fp.toSeq == fp.toSeq.sorted)
    }
  }

  test("simHash64 is deterministic and depends only on the token multiset") {
    for (_ <- 1 to Trials) {
      val t = randomText()
      assert(Dedup.simHash64(t) == Dedup.simHash64(t))
      val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.nonEmpty)
        assert(Dedup.simHash64(toks.reverse.mkString(" ")) == Dedup.simHash64(t))
    }
  }

}
