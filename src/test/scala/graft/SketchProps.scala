package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Sketches.MisraGries

/** ScalaCheck properties for the Misra–Gries summary: the textbook
  * bounds (Misra & Gries 1982; merge rule per Agarwal et al. 2012)
  * checked directly on the aggregator's reduce/merge over generated
  * streams and arbitrary partition splits. */
object SketchProps extends Properties("graft.sketches") {

  private def trueCounts(xs: List[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private val streamGen: Gen[List[String]] =
    Gen.listOfN(400, Gen.frequency(
      5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      2 -> Gen.oneOf((1 to 40).map("t" + _))))

  property("guarantee: heavy items survive, estimates never overshoot") =
    Prop.forAll(streamGen) { xs =>
      val k = 8
      val mg = MisraGries(k)
      val sketch = xs.foldLeft(mg.zero)(mg.reduce)
      val truth = trueCounts(xs)
      val n = xs.length.toLong
      sketch.size <= k && truth.forall { case (t, c) =>
        val est = sketch.getOrElse(t, 0L)
        est <= c &&
          (c - est) <= n / (k + 1) + 1 &&
          (c <= n.toDouble / (k + 1) || sketch.contains(t))
      }
    }

  property("merge keeps the guarantee across arbitrary partition splits") =
    Prop.forAll(for {
      xs <- Gen.listOfN(300, Gen.frequency(
        4 -> Gen.const("hot"), 2 -> Gen.oneOf((1 to 25).map("t" + _))))
      cut <- Gen.choose(0, 300)
    } yield (xs, cut)) { case (xs, cut) =>
      val k = 8
      val mg = MisraGries(k)
      val (l, r) = xs.splitAt(cut)
      val merged = mg.merge(
        l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))
      val truth = trueCounts(xs)
      val n = xs.length.toLong
      merged.size <= k && truth.forall { case (t, c) =>
        merged.getOrElse(t, 0L) <= c &&
          (c <= n.toDouble / (k + 1) || merged.contains(t))
      }
    }
}
