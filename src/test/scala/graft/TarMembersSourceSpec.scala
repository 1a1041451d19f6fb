package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._

class TarMembersSourceSpec extends SparkSpec {

  test("batch format('tar') equals TarSource.members verbatim " +
      "(names, byte payloads, archive provenance)") {
    val shard = graft.sources.TarFixture.ensureWds()
    // archive provenance: the v2 path resolves to a file: URI while
    // the object API echoes the caller's raw path — compare basenames
    val v2 = spark.read.format("tar").load(shard)
      .collect().map(r => (r.getString(0).split('/').last, r.getString(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    val obj = graft.sources.TarSource.members(spark, Seq(shard))
      .collect().map(r => (r.getString(0).split('/').last, r.getString(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(v2.nonEmpty && v2 == obj)
  }

  test("gzip shards decode identically through the v2 reader") {
    graft.sources.TarFixture.ensure()
    val gz = graft.sources.TarFixture.tarGzPath
    // the line fixture's members are UTF-16 text; here we only check
    // the v2 walk frames the same members as the object API
    val v2 = spark.read.format("tar").load(gz)
      .select(col("name")).collect().map(_.getString(0)).sorted.toSeq
    val obj = graft.sources.TarSource.members(spark, Seq(gz))
      .select(col("name")).collect().map(_.getString(0)).sorted.toSeq
    assert(v2 == Seq("vr_part1.txt", "vr_part2.txt") && v2 == obj)
  }

  test("directory and glob loads resolve shard files in sorted order " +
      "and ignore non-tar neighbors") {
    val shards = graft.sources.TarFixture.ensureWdsShards()
    val dir = Files.createTempDirectory("graft_tar_resolve")
    Files.copy(java.nio.file.Paths.get(shards(0)), dir.resolve("b_shard.tar"))
    Files.copy(java.nio.file.Paths.get(shards(1)), dir.resolve("a_shard.tar"))
    Files.write(dir.resolve("notes.txt"), "not a shard".getBytes)
    val viaDir = spark.read.format("tar").load(dir.toString)
      .select(col("archive"), col("name")).collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1)))
    // both shards read, the .txt neighbor ignored
    assert(viaDir.map(_._1).distinct.sorted.toSeq ==
      Seq("a_shard.tar", "b_shard.tar"))
    val viaGlob = spark.read.format("tar")
      .load(dir.toString + "/*.tar").count()
    assert(viaGlob == viaDir.length.toLong)
  }

  test("oversized member fails loudly through the option, and an " +
      "over-Int.MaxValue cap is refused at plan time") {
    val shard = graft.sources.TarFixture.ensureWds()
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("tar").option("maxMemberBytes", "10").load(shard)
        .count()
    }
    assert(e.getMessage.contains("maxMemberBytes") ||
      Option(e.getCause).exists(_.getMessage.contains("maxMemberBytes")))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("tar")
        .option("maxMemberBytes", (Int.MaxValue.toLong + 1).toString)
        .load(shard).count()
    }
    assert(e2.getMessage.contains("maxMemberBytes"))
  }

  test("streaming tails the landing directory: each shard exactly " +
      "once; a landing at or below the watermark is ignored") {
    val shards = graft.sources.TarFixture.ensureWdsShards()
    val landing = Files.createTempDirectory("graft_tar_stream_spec")
    def land(src: String, as: String): Unit = {
      val tmp = landing.resolve("." + as + ".tmp")
      Files.copy(java.nio.file.Paths.get(src), tmp)
      Files.move(tmp, landing.resolve(as), StandardCopyOption.ATOMIC_MOVE)
    }
    spark.catalog.dropTempView("tar_stream_spec")
    val q = spark.readStream.format("tar").load(landing.toString)
      .groupBy(col("archive")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("tar_stream_spec")
      .outputMode("complete").start()
    try {
      land(shards(1), "shard_111.tar") // lands FIRST despite later name
      q.processAllAvailable()
      val first = spark.table("tar_stream_spec").collect()
        .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
      assert(first.keySet == Set("shard_111.tar"))
      // a shard landing BELOW the watermark is ignored by construction
      // (the documented trade for O(1) offset state)
      land(shards(0), "shard_000.tar")
      q.processAllAvailable()
      val second = spark.table("tar_stream_spec").collect()
        .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
      assert(second.keySet == Set("shard_111.tar"),
        s"below-watermark shard must be ignored, got ${second.keySet}")
      // a shard ABOVE the watermark lands exactly once
      land(shards(0), "shard_222.tar")
      q.processAllAvailable()
      val third = spark.table("tar_stream_spec").collect()
        .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
      assert(third.keySet == Set("shard_111.tar", "shard_222.tar"))
      // member counts: shard_111 carries the second half, shard_222
      // the first half of the PNG corpus
      val batch = graft.sources.TarSource.members(spark,
        Seq(shards(0), shards(1))).count()
      assert(third.values.sum == batch)
    } finally q.stop()
  }
}
