package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Msgpack

class MsgpackSpec extends AnyFunSuite {

  test("scalar roundtrips") {
    assert(Msgpack.toJson(Msgpack.encode(null)) == "null")
    assert(Msgpack.toJson(Msgpack.encode(true)) == "true")
    assert(Msgpack.toJson(Msgpack.encode(false)) == "false")
    assert(Msgpack.toJson(Msgpack.encode(0)) == "0")
    assert(Msgpack.toJson(Msgpack.encode(127)) == "127")
    assert(Msgpack.toJson(Msgpack.encode(-32)) == "-32")
    assert(Msgpack.toJson(Msgpack.encode(123456789L)) == "123456789")
    assert(Msgpack.toJson(Msgpack.encode(-987654321L)) == "-987654321")
    assert(Msgpack.toJson(Msgpack.encode("hi")) == "\"hi\"")
    assert(Msgpack.toJson(Msgpack.encode(1.5)) == "1.5")
  }

  test("nested map/array") {
    val v = Map("a" -> 1, "b" -> Seq(1, 2, 3), "c" -> Map("d" -> "x"))
    assert(Msgpack.toJson(Msgpack.encode(v)) == """{"a":1,"b":[1,2,3],"c":{"d":"x"}}""")
  }

  test("string escaping") {
    assert(Msgpack.toJson(Msgpack.encode("a\"b\\c\nd")) == "\"a\\\"b\\\\c\\nd\"")
  }

  test("malformed input returns null") {
    assert(Msgpack.toJson(Array[Byte](0xc1.toByte)) == null)       // reserved type
    assert(Msgpack.toJson(Array[Byte](0x91.toByte)) == null)       // truncated array
    assert(Msgpack.toJson("not msgpack json".getBytes) == null)    // trailing junk
  }

  test("format detection") {
    val mp = (1 to 20).map(i => Msgpack.encode(Map("k" -> i)))
    val js = (1 to 20).map(i => s"""{"k": $i}""".getBytes("UTF-8"))
    assert(Msgpack.detectFormat(mp) == "msgpack")
    assert(Msgpack.detectFormat(js) == "json")
    assert(Msgpack.detectFormat(Nil) == "json")
  }

  test("property: long roundtrip (seeded random + boundaries)") {
    val rnd = new scala.util.Random(42)
    val edges = Seq(0L, 1L, -1L, 127L, 128L, -32L, -33L, 255L, 256L,
      65535L, 65536L, Int.MaxValue.toLong, Int.MinValue.toLong,
      Long.MaxValue, Long.MinValue + 1)
    (edges ++ Seq.fill(500)(rnd.nextLong())).foreach { l =>
      assert(Msgpack.toJson(Msgpack.encode(l)) == l.toString, s"for $l")
    }
  }

  test("property: string roundtrip (seeded random ascii)") {
    val rnd = new scala.util.Random(7)
    Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(120)).mkString).foreach { s =>
      assert(Msgpack.toJson(Msgpack.encode(s)) == "\"" + s + "\"")
    }
  }

  test("flat json re-encode matches original semantics") {
    val j = """{"k": 42, "name": "abc", "ok": true, "x": 1.25}"""
    assert(Msgpack.toJson(Msgpack.encodeFlatJson(j)) ==
      """{"k":42,"name":"abc","ok":true,"x":1.25}""")
  }
}
