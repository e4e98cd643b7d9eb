package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Fetcher, Harvest}

/** Harvest planner (S1) + incremental window (X28) + last-write-wins
  * upsert (S6). */
class HarvestSpec extends AnyFunSuite {

  test("striped page plan covers [0, total) exactly once, stride w*limit") {
    val pages = Harvest.planPages(total = 1000, limit = 100, workers = 3)
    val offsets = pages.map(_.offset).sorted
    assert(offsets == (0 until 1000 by 100).toList)
    // worker stripes: 0 -> 0,300,600,900; 1 -> 100,400,700; 2 -> 200,500,800
    assert(pages.filter(_.worker == 0).map(_.offset) == Seq(0, 300, 600, 900))
    assert(pages.filter(_.worker == 1).map(_.offset) == Seq(100, 400, 700))
    // total smaller than one stripe
    assert(Harvest.planPages(50, 100, 3).map(_.offset) == Seq(0))
    assert(Harvest.planPages(0, 100, 3).isEmpty)
  }

  test("distributed planDf equals the driver-side planPages stripe-for-stripe") {
    // planDf generates the plan via spark.range (no driver Seq, Long
    // offsets — survives a >2³¹-document corpus); its (worker, offset)
    // assignment must be EXACTLY planPages' stripe rule
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    for ((total, limit, workers) <- Seq((1000, 100, 3), (537, 37, 5), (50, 100, 3), (0, 100, 3))) {
      val viaSeq = Harvest.planPages(total, limit, workers)
        .map(p => (p.worker, p.offset.toLong)).toSet
      val viaDf = Harvest.planDf(spark, total.toLong, limit, workers)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(viaDf == viaSeq, s"plan diverged at total=$total limit=$limit workers=$workers")
    }
  }

  test("incremental window is the 10-day code behavior, not the 5-day doc") {
    assert(Harvest.incrementalParams(LocalDate.of(2026, 7, 15)) ==
      Map("updated_time__gte" -> "2026-07-05"))
  }

  test("DATE_PARAM mode: full-day-inclusive bounds, exactly as the reference sends them") {
    // tasks_for_01.py:120-123 — start_date + "T00:00:00", end_date + "T23:59:59"
    assert(Harvest.dateParamParams(
      LocalDate.of(2024, 1, 10), LocalDate.of(2024, 1, 12)) ==
      Map("updated_time__gte" -> "2024-01-10T00:00:00",
        "updated_time__lte" -> "2024-01-12T23:59:59"))
    // single-day backfill: both bounds on the same date
    assert(Harvest.dateParamParams(
      LocalDate.of(2026, 2, 1), LocalDate.of(2026, 2, 1)) ==
      Map("updated_time__gte" -> "2026-02-01T00:00:00",
        "updated_time__lte" -> "2026-02-01T23:59:59"))
  }

  test("DATE_PARAM window semantics: inclusive endpoints, sub-second after lte excluded") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "2024-01-09 23:59:59.999"), // before gte — out
      (2L, "2024-01-10 00:00:00"),     // exactly gte — IN (inclusive)
      (3L, "2024-01-11 12:00:00"),     // interior — in
      (4L, "2024-01-12 23:59:59"),     // exactly lte — IN (inclusive)
      (5L, "2024-01-12 23:59:59.500")  // sub-second past lte — out
    ).toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    val params = Harvest.dateParamParams(
      LocalDate.of(2024, 1, 10), LocalDate.of(2024, 1, 12))
    val kept = Harvest.applyDateWindow(rows, "ts", params)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L, 4L))
    // gte-only param map (the INCREMENTAL mode) applies only the lower bound
    val gteOnly = Harvest.applyDateWindow(rows,
      "ts", Map("updated_time__gte" -> "2024-01-12T00:00:00"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(gteOnly == Seq(4L, 5L))
  }

  test("S2 retry: backoff on retryable statuses, dead-letter on exhaustion") {
    // flaky transport: fails twice with 503, then succeeds
    var calls = 0
    val flaky: Fetcher.Transport = { _ =>
      calls += 1
      if (calls < 3) Left(503) else Right("BODY")
    }
    var delays = Vector[Long]()
    val ok = Fetcher.fetchWithRetry(flaky, "u", sleeper = d => delays :+= d)
    assert(ok == Right(("BODY", 3)))
    assert(delays == Vector(100L, 200L)) // backoff x2
    // non-retryable: fail immediately
    assert(Fetcher.fetchWithRetry(_ => Left(404), "u") == Left((404, 1)))
    // retryable but exhausted after 5 attempts
    assert(Fetcher.fetchWithRetry(_ => Left(429), "u") == Left((429, 5)))
  }

  test("S1+S2+S3: distributed fetch splits successes from dead letters") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    // offsets >= 300 fail hard (e.g. upstream 500 loop)
    val transport: Fetcher.Transport = url =>
      if (url.contains("offset=3") || url.contains("offset=4")) Left(500)
      else Right(s"body:$url")
    val plan = Harvest.planDf(spark, total = 500, limit = 100, workers = 2)
    val (fetched, dead) = Fetcher.fetchPages(spark, plan, "http://api", transport)
    assert(fetched.count() == 3) // offsets 0,100,200
    assert(dead.count() == 2)    // offsets 300,400
    import spark.implicits._
    assert(dead.select("error_type").as[String].collect().forall(_ == "SKIP"))

    // S3 replay refetches the STORED urls verbatim (original limit intact,
    // not a rebuilt limit=100 url) once the upstream recovers
    val recovered: Fetcher.Transport = url => Right(s"ok:$url")
    val (refetched, stillDead) = Fetcher.replay(spark, dead, recovered)
    assert(stillDead.count() == 0)
    val urls = refetched.select("url").as[String].collect().toSet
    assert(urls == Set("http://api?limit=100&offset=300&format=json",
      "http://api?limit=100&offset=400&format=json"))
    // a plan with a non-default page size replays that same page size
    val plan50 = Harvest.planDf(spark, total = 100, limit = 50, workers = 1)
    val (_, dead50) = Fetcher.fetchPages(spark, plan50, "http://api", _ => Left(500))
    val (re50, _) = Fetcher.replay(spark, dead50, recovered)
    assert(re50.select("url").as[String].collect().toSet ==
      Set("http://api?limit=50&offset=0&format=json",
        "http://api?limit=50&offset=50&format=json"))
  }

  test("S1 real transport is serializable and maps I/O failure to retryable 503") {
    val t = ingest.HttpTransport()
    // ships inside mapPartitions closures — java-serialization roundtrip
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(t)
    val t2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Fetcher.Transport]
    // connection refused (nothing listens on port 1) -> retryable 503,
    // same contract the retry policy tests with the fake transport
    assert(t2("http://127.0.0.1:1/x") == Left(503))
  }

  test("S4 id-list plan stripes ids across workers") {
    val plan = Harvest.planIds(Seq(10L, 20L, 30L, 40L), workers = 3)
    assert(plan == Seq((0, 10L), (1, 20L), (2, 30L), (0, 40L)))
  }

  test("upsert keeps latest version per id, new batch wins ties") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val old = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("id", "v", "updated")
    val neu = Seq((2L, "b2", "2024-01-03"), (2L, "b-tie", "2024-01-02"),
      (3L, "c", "2024-01-01")).toDF("id", "v", "updated")
    val merged = Harvest.upsert(old, neu, "id", "updated")
      .orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(merged == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }
}
