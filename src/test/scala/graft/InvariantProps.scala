package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Msgpack

/** ScalaCheck properties for the engine's core invariants — the
  * mathematical facts the optimized operators rely on, checked over
  * generated inputs rather than fixtures (sbt runs `Properties` suites
  * natively alongside ScalaTest).
  */
object InvariantProps extends Properties("graft.invariants") {

  // ---- msgpack codec: encode→decode roundtrips for the payload shapes
  // the ingest path carries (flat maps of small ints / strings).
  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(-31, 127).map(_.asInstanceOf[Any]),
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(_.asInstanceOf[Any]),
    Gen.alphaNumStr.map(s => s.take(40).asInstanceOf[Any]),
    Gen.oneOf(true, false).map(_.asInstanceOf[Any]))

  property("msgpack roundtrip: flat maps") = Prop.forAll(
    Gen.mapOfN(5, Gen.zip(Gen.identifier.map(_.take(8)), scalarGen))) { m =>
    val json = Msgpack.toJson(Msgpack.encode(m))
    // every key and scalar value survives the roundtrip verbatim
    json != null && m.forall { case (k, v) =>
      json.contains("\"" + k + "\"") && json.contains(v match {
        case s: String => "\"" + s + "\""
        case other     => other.toString
      })
    }
  }

  property("msgpack roundtrip: scalar lists") = Prop.forAll(
    Gen.listOfN(8, Gen.chooseNum(-31, 127))) { xs =>
    Msgpack.toJson(Msgpack.encode(xs)) == xs.mkString("[", ",", "]")
  }

  // ---- Prefix-filter lemma (the correctness core of the q_dedup_ngram
  // rewrite): for ANY total order and t = 0.5, two sets with
  // jac ≥ t share an element within the first |X| − ⌈t·|X|⌉ + 1
  // elements of both sorted sets.
  private val setGen = Gen.chooseNum(1, 40).flatMap(n =>
    Gen.listOfN(n, Gen.chooseNum(0, 60)).map(_.toSet))

  property("prefix filter is lossless at jac >= 0.5") =
    Prop.forAll(setGen, setGen) { (a, b) =>
      val inter = (a intersect b).size
      val jac = inter.toDouble / (a.size + b.size - inter)
      def prefix(s: Set[Int]) =
        s.toSeq.sorted.take(s.size - math.ceil(0.5 * s.size).toInt + 1).toSet
      // only the implication matters: high-similarity pairs MUST collide
      jac < 0.5 || (prefix(a) intersect prefix(b)).nonEmpty
    }

  // ---- SimHash pigeonhole blocking (q_dedup_simhash rewrite): pairs at
  // hamming ≤ 1 always agree on at least one 32-bit half.
  private val fpGen = Gen.listOfN(64, Gen.oneOf('0', '1')).map(_.mkString)

  property("hamming<=1 pairs collide on a half") =
    Prop.forAll(fpGen, Gen.chooseNum(0, 63), Gen.oneOf(true, false)) { (fp, flipAt, flip) =>
      val other = if (flip) fp.updated(flipAt, if (fp(flipAt) == '0') '1' else '0') else fp
      fp.substring(0, 32) == other.substring(0, 32) ||
        fp.substring(32) == other.substring(32)
    }

  // ---- Exact decimal accumulation (the Exact.* contract): any double
  // with ≤2 decimal digits converts to DECIMAL(18,3) and back without
  // loss, so decimal sums are exact and engine-independent.
  property("2-decimal doubles survive DECIMAL(18,3)") = Prop.forAll(
    Gen.chooseNum(-99999999L, 99999999L)) { cents =>
    val x = cents / 100.0
    BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble == x
  }

  // ---- MinHash affine family stays in range and is deterministic.
  property("minhash affine slots in [0, p)") = Prop.forAll(
    Gen.listOfN(20, Gen.chooseNum(0L, (1L << 32) - 1)), Gen.chooseNum(1, 16)) { (bases, i) =>
    bases.isEmpty || {
      val p = 2147483647L
      val h = bases.map(b => ((2L * i + 1L) * b + 1000003L * i) % p)
      h.forall(v => v >= 0 && v < p)
    }
  }

  // ---- Waterfill allocation (q_token_waterfill's core): the sequential
  // reference must satisfy the max-min fairness contract on ANY
  // instance — the Spark plan is pinned ≡ reference in WaterfillSpec,
  // so these properties transfer to the gated query.
  private val availsGen: Gen[List[(String, Long)]] = for {
    n  <- Gen.chooseNum(1, 12)
    as <- Gen.listOfN(n, Gen.chooseNum(1L, 5000L))
  } yield as.zipWithIndex.map { case (a, i) => (f"s$i%02d", a) }

  property("waterfill: sums to target, caps, bounded spread, fairness") =
    Prop.forAll(availsGen, Gen.chooseNum(0, 9)) { (avails, num) =>
      val total = avails.map(_._2).sum
      val target = total * num / 10
      val alloc = graft.functions.Waterfill.reference(avails, num, 10)
      val byKey = avails.toMap
      val sumsToTarget = alloc.values.sum == target
      val withinAvail = alloc.forall { case (k, a) => a >= 0 && a <= byKey(k) }
      // STRICTLY-uncapped groups (alloc < avail) all drink at the level
      // or level+1 — a remainder-boosted group can coincidentally land
      // exactly on its avail, so alloc == avail does NOT identify a
      // capped group (the {2,3,3}@9/10 instance boosts the middle group
      // to its own avail); the strict set sidesteps the ambiguity
      val strictUncapped = alloc.filter { case (k, a) => a < byKey(k) }.values
      val spread1 = strictUncapped.isEmpty ||
        (strictUncapped.max - strictUncapped.min) <= 1
      // max-min fairness: nobody — capped (avail ≤ level) or boosted
      // (level+1) — exceeds the lowest uncapped drink by more than the
      // integer remainder grain
      val fair = strictUncapped.isEmpty ||
        alloc.values.forall(_ <= strictUncapped.min + 1)
      sumsToTarget && withinAvail && spread1 && fair
    }
}
