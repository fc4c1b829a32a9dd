package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Sketches.{MisraGries, QuantileSketch}

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

  // ---- QuantileSketch (deterministic compactor stack) ----

  private val QS = Seq(0.01, 0.25, 0.5, 0.9, 0.99)

  /** Data + an arbitrary chunking + an arbitrary merge order — the three
    * degrees of freedom a distributed partial aggregation actually has. */
  private val qsketchGen: Gen[(Vector[Double], List[Int], Long)] = for {
    n <- Gen.choose(50, 2500)
    // heavy ties on purpose: rank intervals, not unique ranks
    data <- Gen.listOfN(n, Gen.choose(0, n / 3 + 1)).map(_.map(_.toDouble).toVector)
    cuts <- Gen.listOfN(6, Gen.choose(0, n))
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (data, cuts, seed)

  /** Rank error of estimate `e` for target quantile q over `sorted`:
    * distance from ⌈q·n⌉ to e's true rank interval (0 if inside). */
  private def rankErr(sorted: Vector[Double], q: Double, e: Double): Long = {
    val n = sorted.length
    val lo = sorted.count(_ < e).toLong
    val hi = sorted.count(_ <= e).toLong
    val t = math.max(1L, math.ceil(q * n).toLong)
    if (t < lo + 1) lo + 1 - t else if (t > hi) t - hi else 0L
  }

  property("quantile sketch: rank error bounded over arbitrary splits and merge orders") =
    Prop.forAll(qsketchGen) { case (data, cuts, seed) =>
      val k = 32
      val agg = QuantileSketch(k, QS)
      val n = data.length
      val bounds = (cuts.map(_ % (n + 1)).sorted :+ n).distinct
      val chunks = (0 +: bounds).zip(bounds).collect {
        case (a, b) if b > a => data.slice(a, b)
      }
      val sketches = chunks.map(_.foldLeft(agg.zero)((st, v) => agg.reduce(st, v)))
      val merged = new scala.util.Random(seed).shuffle(sketches)
        .foldLeft(agg.zero)(agg.merge)
      val est = agg.finish(merged)
      val sorted = data.sorted
      val levels = merged.levels.length.toDouble
      // calibrated envelope: observed worst error stays under L/(2k)·n
      // with >=2x margin (see commit); 1.5x that is the regression fence
      val fence = math.max(1L, math.ceil(1.5 * n * levels / (2 * k)).toLong)
      QS.zip(est).forall { case (q, e) => rankErr(sorted, q, e) <= fence }
    }

  property("quantile sketch: total weight is preserved exactly") =
    Prop.forAll(qsketchGen) { case (data, cuts, seed) =>
      val agg = QuantileSketch(16, Seq(0.5))
      val n = data.length
      val bounds = (cuts.map(_ % (n + 1)).sorted :+ n).distinct
      val chunks = (0 +: bounds).zip(bounds).collect {
        case (a, b) if b > a => data.slice(a, b)
      }
      val merged = new scala.util.Random(seed)
        .shuffle(chunks.map(_.foldLeft(agg.zero)((st, v) => agg.reduce(st, v))))
        .foldLeft(agg.zero)(agg.merge)
      val weight = merged.levels.zipWithIndex
        .map { case (lvl, i) => lvl.length.toLong << i }.sum
      weight == n.toLong
    }

  property("quantile sketch: exact below the first compaction") =
    Prop.forAll(Gen.listOfN(30, Gen.choose(-1000, 1000).map(_.toDouble))) { xs =>
      val agg = QuantileSketch(16, QS) // cap 32 > 30 items -> never compacts
      val est = agg.finish(xs.foldLeft(agg.zero)((st, v) => agg.reduce(st, v)))
      val sorted = xs.toVector.sorted
      xs.isEmpty || QS.zip(est).forall { case (q, e) =>
        e == sorted(math.max(1, math.ceil(q * xs.length).toInt) - 1)
      }
    }
}
