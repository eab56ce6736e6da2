package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.sources.StaticGeoProvider

/** End-to-end batch run over real gzip log files through every sink
  * (reference main(), elb_logs.py:398-437).
  */
class ElbPipelineSpec extends SparkSpec {

  def writeGz(dir: File, name: String, lines: Seq[String]): Unit = {
    val out = new GZIPOutputStream(new FileOutputStream(new File(dir, name)))
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  def line(ts: String, ip: String, status: Int, ua: String, url: String): String =
    s"""https ${ts} app/test/1 ${ip}:443 172.31.0.1:80 0.001 0.042 0.000 $status $status 100 2000 "GET $url HTTP/1.1" "$ua" TLS TLSv1.3 arn "Root=1" "example.com" "cert" 1 ${ts} "forward" "-" "-" "172.31.0.1:80" "$status" "-" "-""""

  test("full pipeline: gz extract, enrich, sessionize, all four sinks") {
    val tmp = Files.createTempDirectory("graft-e2e").toFile
    val logsDir = new File(tmp, "logs"); logsDir.mkdirs()
    writeGz(logsDir, "a.log.gz", Seq(
      line("2025-05-26T14:00:00.000000Z", "10.1.2.3", 200,
        "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0.0 Safari/537.36", "https://x.com/a/b"),
      line("2025-05-26T14:10:00.000000Z", "10.1.2.3", 404,
        "curl/8.0.1", "https://x.com/a"),
      line("2025-05-26T15:10:00.000000Z", "10.1.2.3", 500,
        "Googlebot/2.1 (+http://www.google.com/bot.html)", "https://x.com/"),
      "garbage line that should be dropped"))
    writeGz(logsDir, "b.log.gz", Seq(
      line("2025-05-26T14:05:00.000000Z", "10.9.9.9", 200,
        "Datadog Agent/7.54.0", "https://x.com/health")))

    val out = new File(tmp, "out").toString
    val cachePath = new File(tmp, "cache.parquet").toString
    val featured = ElbPipeline.run(spark, logsDir.toString + "/*.gz",
      cachePath, out, StaticGeoProvider(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))

    // datadog row filtered (health check), garbage dropped → 3 rows
    assert(featured.count() === 3)
    // lineage column points at the right gz file
    assert(featured.select("log_source_file").distinct().collect()
      .forall(_.getString(0).endsWith("a.log.gz")))
    // sessionization: 10-min gap same session, 60-min gap new session
    val sess = featured.orderBy("time").select("session_id")
      .collect().map(_.getString(0))
    assert(sess.toSeq === Seq("10.1.2.3_s0", "10.1.2.3_s0", "10.1.2.3_s1"))
    // geo enrichment happened (static provider: d=3 → C3)
    assert(featured.select("countryCode").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("C3"))

    // cache persisted with both IPs (incl. the filtered datadog row's —
    // refresh runs on parsed, pre-filter, like the reference)
    val cache = spark.read.parquet(cachePath)
    assert(cache.count() === 2)

    // sinks exist and have content
    val cleaned = spark.read.parquet(s"$out/cleaned_logs")
    assert(cleaned.count() === 3)
    assert(cleaned.columns.contains("rolling_5min_request_count"))
    val agg = spark.read.parquet(s"$out/aggregated_stats/hourly_traffic_by_geo.parquet")
    assert(agg.count() === 2) // hours 10 and 11 Eastern
    val err = spark.read.option("header", "true").csv(s"$out/reports/error_summary_geo.csv")
    assert(err.count() === 2) // 404 + 500
    val bots = spark.read.parquet(s"$out/reports/bot_traffic_details.parquet")
    assert(bots.count() === 1) // googlebot
    val botSum = spark.read.option("header", "true")
      .csv(s"$out/reports/bot_traffic_by_origin_summary.csv")
    assert(botSum.count() === 1)

    // second run over the same input: cache upsert keeps one row per IP
    ElbPipeline.run(spark, logsDir.toString + "/*.gz", cachePath,
      new File(tmp, "out2").toString,
      StaticGeoProvider(java.sql.Timestamp.valueOf("2026-02-01 00:00:00")))
    assert(spark.read.parquet(cachePath).count() === 2)
  }

  test("parse observes one drop count per malformed-row class") {
    import spark.implicits._
    val good = line("2025-05-26T14:00:00.000000Z", "10.1.2.3", 200,
      "curl/8.0.1", "https://x.com/a")
    val lines = Seq(
      good,
      "way too few tokens",                                     // arity drop
      good.replaceFirst("2025-05-26T14:00:00\\.000000Z", "not-a-time"), // time drop
      good.replaceFirst("0\\.042", "not-a-float"))              // float drop
    val parsed = graft.operators.ElbParser.parse(lines.toDF("value"))
    // collect(), not count(): metrics land on the executed dataset's own
    // queryExecution (count() runs a separate aggregate plan)
    val kept = parsed.collect().length
    val drops = graft.operators.ElbParser.dropCounts(parsed)
    assert(kept === 1)
    assert(drops(graft.operators.ElbParser.DropsArity) === 1)
    assert(drops(graft.operators.ElbParser.DropsTime) === 1)
    assert(drops(graft.operators.ElbParser.DropsFloat) === 1)
  }
}
