package graft

import java.util.Base64

import graft.functions.Compression

/** Byte-exact golden gate for the deflate quality signal: a COMMITTED
  * corpus slice (40 sf0.001 documents, base64'd into
  * `src/test/resources/compress_golden.tsv` alongside their expected
  * raw/deflate byte counts, generated through this JDK's own
  * `java.util.zip.Deflater` at level 6). `q_compress_ratio` has no
  * DuckDB oracle BY DESIGN — the DEFLATE stream is unspecified across
  * zlib builds — so the driver's rows-only check rides on this local
  * byte-exact fixture instead: any change to the level, strategy,
  * buffering or accounting in [[Compression.deflateStats]] breaks it
  * loudly. The texts live IN the fixture (not read from testdata), so
  * the gate survives testdata regeneration; a JDK swap that changes
  * zlib output would also fail loudly, which is the documented
  * determinism contract ("reproducible within a deployment") doing its
  * job. */
class CompressionGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("deflateStats reproduces the committed golden byte counts exactly") {
    val lines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/compress_golden.tsv"), "UTF-8")
      .getLines().toSeq
    assert(lines.size == 40, s"fixture carries ${lines.size} rows")
    val rows = lines.map { l =>
      val p = l.split("\t")
      (p(0).toLong, new String(Base64.getDecoder.decode(p(1)), "UTF-8"),
        p(2).toLong, p(3).toLong)
    }
    val df = rows.map { case (id, text, _, _) => (id, text) }.toDF("doc_id", "text")
    val got = Compression.deflateStats(df, "doc_id", "text")
      .collect().map(s => s.doc_id -> s).toMap
    assert(got.size == rows.size)
    rows.foreach { case (id, _, raw, defl) =>
      val s = got(id)
      assert(s.raw_bytes == raw, s"doc $id raw: ${s.raw_bytes} != golden $raw")
      assert(s.deflate_bytes == defl,
        s"doc $id deflate: ${s.deflate_bytes} != golden $defl — the deflate " +
          "settings or stream handling changed (or the JDK zlib did)")
      assert(s.ratio == defl.toDouble / raw)
    }
  }
}
