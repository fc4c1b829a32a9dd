package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalacheck.{Gen, Prop, Properties}

import graft.streaming.IdBloom

/** ScalaCheck properties for the shared id-bloom guard's load-bearing
  * arithmetic: the shard mapping must be EXACT floor division for every
  * long (the scala-side `shardOf` and the plan-side `shiftright` both
  * reduce to an arithmetic right shift — any divergence would route a
  * probe to the wrong shard and silently void the no-false-negative
  * contract), and the sizing ledger must round-trip including the
  * legacy 3-field form. */
object IdBloomProps extends Properties("graft.idbloom") {

  private val widthGen: Gen[Long] = Gen.chooseNum(0, 62).map(1L << _)
  private val idGen: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue, Long.MaxValue),
    Gen.chooseNum(-1000000L, 1000000L),
    Gen.oneOf(0L, -1L, 1L, Long.MinValue, Long.MaxValue))

  property("shardOf == exact floor division for every long and power-of-two width") =
    Prop.forAll(idGen, widthGen) { (id, width) =>
      val expected = BigInt(id) / width match {
        // BigInt division truncates toward zero; floor rounds toward -∞
        case q if BigInt(id) - q * width < 0 => q - 1
        case q => q
      }
      BigInt(IdBloom.shardOf(id, width)) == expected
    }

  property("shardOf is monotone in id (range sharding preserves id order)") =
    Prop.forAll(idGen, idGen, widthGen) { (a, b, width) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      IdBloom.shardOf(lo, width) <= IdBloom.shardOf(hi, width)
    }

  property("width 0 (unsharded) maps every id to shard 0") =
    Prop.forAll(idGen) { id => IdBloom.shardOf(id, 0L) == 0L }

  private lazy val fs =
    FileSystem.get(new org.apache.hadoop.conf.Configuration())

  property("sizing ledger round-trips, including count/width extremes") =
    Prop.forAll(
      Gen.chooseNum(1L, Long.MaxValue / 8),
      Gen.chooseNum(1, 6).map(math.pow(10, _)).map(1.0 / _),
      Gen.chooseNum(0L, Long.MaxValue / 8),
      Gen.oneOf(Gen.const(0L), Gen.chooseNum(0, 62).map(b => 1L << b))) {
      (items, fpp, count, width) =>
      val dir = Files.createTempDirectory("idbloomprops").toString
      val s = IdBloom.Sizing(items, fpp, count, width)
      IdBloom.writeSizing(fs, dir, s)
      IdBloom.readSizing(fs, dir).contains(s)
    }

  property("legacy 3-field sizing parses as unsharded (width 0)") =
    Prop.forAll(Gen.chooseNum(1L, 1L << 40), Gen.chooseNum(0L, 1L << 40)) {
      (items, count) =>
        val dir = Files.createTempDirectory("idbloomlegacy").toString
        IdBloom.atomicWrite(fs, new Path(s"$dir/_idbloom/_sizing"),
          s"$items 0.001 $count".getBytes("UTF-8"))
        IdBloom.readSizing(fs, dir).contains(
          IdBloom.Sizing(items, 0.001, count, 0L))
    }
}
