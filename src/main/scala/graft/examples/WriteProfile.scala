package graft.examples

/** Write-path micro-profiler (not part of the query surface): times a
  * tiny DataFrame through the noop sink (pure job overhead), a raw
  * parquet write, and parquet writes under candidate configs — to
  * localize the per-commit constant every versioned-lifecycle gate
  * pays (~140 ms per 10-row write measured r18). */
object WriteProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.get("graft-write-profile")
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-write-profile").toString
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
    df.count() // warm scan machinery
    def time(label: String, reps: Int = 8)(body: Int => Any): Unit = {
      body(-1) // warmup
      val t = System.nanoTime()
      (0 until reps).foreach(body)
      println(f"WRITE_PROFILE $label: ${(System.nanoTime() - t) / 1e6 / reps}%.1f ms/op")
    }
    time("noop")(i => df.write.mode("overwrite").format("noop").save())
    time("parquet")(i =>
      df.write.mode("overwrite").parquet(s"$dir/p$i"))
    time("parquet-1part")(i =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/q$i"))
    time("json")(i => df.write.mode("overwrite").json(s"$dir/j$i"))
    time("csv")(i => df.write.mode("overwrite").csv(s"$dir/c$i"))
    // candidate configs
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    time("parquet-nocomp")(i =>
      df.write.mode("overwrite").parquet(s"$dir/n$i"))
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    spark.conf.set("parquet.memory.pool.ratio", "0.1")
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.page.size.row.check.min", 10)
    time("parquet-again")(i =>
      df.write.mode("overwrite").parquet(s"$dir/a$i"))
    // committer v2
    spark.sparkContext.hadoopConfiguration.setInt(
      "mapreduce.fileoutputcommitter.algorithm.version", 2)
    time("parquet-committerv2")(i =>
      df.write.mode("overwrite").parquet(s"$dir/v$i"))
    // no success marker
    spark.sparkContext.hadoopConfiguration.set(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    time("parquet-nosuccess")(i =>
      df.write.mode("overwrite").parquet(s"$dir/s$i"))
    // raw checksums off
    spark.sparkContext.hadoopConfiguration.set(
      "file.bytes-per-checksum", "1048576")
    time("parquet-bigchunk")(i =>
      df.write.mode("overwrite").parquet(s"$dir/b$i"))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
    spark.stop()
  }
}
