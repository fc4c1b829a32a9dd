package graft

import java.nio.file.Files

/** The throughput harness at toy scale: every phase runs, every internal
  * correctness `require` holds (the harness refuses to report a number for
  * a wrong drain), and the relative claims point the direction the
  * reference publishes (zstd smaller than snappy, level 6 ≤ level 3). */
class IngestBenchSpec extends SparkSpec {

  test("all IngestBench phases run and verify at toy scale") {
    val work = Files.createTempDirectory("ingestbench").toString
    val fields = IngestBench.run(spark, work, 20000L,
      Set("oneshot", "keeper", "incremental", "compression", "decode",
        "envelope", "envelope_keeper")).toMap

    for (k <- Seq("oneshot_msgs_per_sec", "keeper_msgs_per_sec",
        "incremental_msgs_per_sec", "decode_native_msgs_per_sec",
        "decode_udf_msgs_per_sec", "envelope_msgs_per_sec",
        "envelope_keeper_msgs_per_sec"))
      assert(fields(k).asInstanceOf[Long] > 0L, k)

    // the codec ordering the reference's size claims rest on
    val none = fields("bytes_none").asInstanceOf[Long]
    val snappy = fields("bytes_snappy").asInstanceOf[Long]
    val z3 = fields("bytes_zstd3").asInstanceOf[Long]
    val z6 = fields("bytes_zstd6").asInstanceOf[Long]
    assert(snappy < none, s"snappy $snappy !< none $none")
    assert(z3 < snappy, s"zstd3 $z3 !< snappy $snappy")
    assert(z6 <= z3, s"zstd6 $z6 > zstd3 $z3")
  }
}
