package graft.ingest

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1/S2/S3 — the distributed REST fetch skeleton: the page plan
  * (Harvest.planDf) repartitions across fetch workers, each partition
  * runs the HTTP loop via `mapPartitions`, successes land as JSONL-ready
  * bodies and failures as dead-letter rows (the reference's
  * `01_fiadmin_error_tracking` shape — tasks_for_01.py:66-91).
  *
  * The transport is injected (`(url) => Either[status, body]`) so the
  * retry policy — 5 attempts, backoff ×2, retry on {429,500,503,504}
  * (tasks_for_01.py:53-63) — is engine logic testable without a network
  * (this container has zero egress; at deploy time the transport is a
  * `java.net.http.HttpClient` call).
  */
object Fetcher {

  /** url → Left(http status) on failure, Right(body) on success. Must be
    * serializable — it ships inside the fetch task closure. */
  type Transport = String => Either[Int, String]

  /** (url, attempt) → response: a transport that also sees the 1-based
    * attempt number. Real transports ignore it; test doubles use it to
    * stay STATELESS — a per-instance call counter resets when a Spark
    * task retry deserializes a fresh closure copy, so a fail-twice page
    * could succeed on the wrong attempt under speculation. */
  type AttemptTransport = (String, Int) => Either[Int, String]

  case class Fetched(worker: Int, offset: Int, url: String, body: String,
      attempts: Int)
  /** Dead-letter row (reference: {error, url, params, error_type:"SKIP"}). */
  case class DeadLetter(worker: Int, offset: Int, url: String, error: String,
      error_type: String, attempts: Int)

  val RetryStatuses: Set[Int] = Set(429, 500, 503, 504)
  val MaxRetries = 5
  val BackoffFactor = 2

  /** One fetch with the reference's retry policy. `sleeper` injected for
    * determinism in tests (real: Thread.sleep of backoff millis). */
  def fetchWithRetry(transport: Transport, url: String,
      maxRetries: Int = MaxRetries,
      retryOn: Set[Int] = RetryStatuses,
      baseDelayMs: Long = 100L,
      sleeper: Long => Unit = _ => ()): Either[(Int, Int), (String, Int)] =
    fetchWithRetryAware((u, _) => transport(u), url, maxRetries, retryOn,
      baseDelayMs, sleeper)

  /** Attempt-aware variant of [[fetchWithRetry]]: the transport receives
    * the 1-based attempt number alongside the url. */
  def fetchWithRetryAware(transport: AttemptTransport, url: String,
      maxRetries: Int = MaxRetries,
      retryOn: Set[Int] = RetryStatuses,
      baseDelayMs: Long = 100L,
      sleeper: Long => Unit = _ => ()): Either[(Int, Int), (String, Int)] = {
    @tailrec
    def go(attempt: Int, delay: Long): Either[(Int, Int), (String, Int)] =
      transport(url, attempt) match {
        case Right(body) => Right((body, attempt))
        case Left(status) if retryOn(status) && attempt < maxRetries =>
          sleeper(delay)
          go(attempt + 1, delay * BackoffFactor)
        case Left(status) => Left((status, attempt))
      }
    go(1, baseDelayMs)
  }

  /** Fetch pre-built (worker, offset, url) rows through the transport;
    * each partition is one fetch worker — the Airflow task fan-out
    * becomes partition parallelism. */
  private def fetchUrls(spark: SparkSession,
      rows: org.apache.spark.sql.Dataset[(Int, Int, String)],
      transport: AttemptTransport): (DataFrame, DataFrame) = {
    import spark.implicits._
    val fetched = rows.mapPartitions { it =>
      it.map { case (w, off, url) =>
        fetchWithRetryAware(transport, url) match {
          case Right((body, n)) =>
            (Some(Fetched(w, off, url, body, n)), Option.empty[DeadLetter])
          case Left((status, n)) =>
            (Option.empty[Fetched],
              Some(DeadLetter(w, off, url, s"HTTP $status", "SKIP", n)))
        }
      }
    }.cache()
    (fetched.flatMap(_._1).toDF(), fetched.flatMap(_._2).toDF())
  }

  /** Run the striped plan through the transport; returns (fetched,
    * dead-letter). */
  def fetchPages(spark: SparkSession, plan: DataFrame, baseUrl: String,
      transport: Transport): (DataFrame, DataFrame) =
    fetchPagesAware(spark, plan, baseUrl, (u, _) => transport(u))

  /** [[fetchPages]] with an attempt-aware transport. */
  def fetchPagesAware(spark: SparkSession, plan: DataFrame, baseUrl: String,
      transport: AttemptTransport): (DataFrame, DataFrame) = {
    import spark.implicits._
    fetchUrls(spark,
      plan.select("worker", "offset", "limit").as[(Int, Int, Int)]
        .map { case (w, off, lim) =>
          (w, off, s"$baseUrl?limit=$lim&offset=$off&format=json")
        },
      transport)
  }

  /** S3 replay: re-fetch each dead-letter page via its STORED url — the
    * reference replays the exact failed params (tasks_for_01.py:137-151);
    * rebuilding the url with a fixed page size would fetch the wrong
    * window whenever the original plan used a different limit. Successes
    * merge back via Harvest.upsert at the landing layer. */
  def replay(spark: SparkSession, deadLetter: DataFrame,
      transport: Transport): (DataFrame, DataFrame) = {
    import spark.implicits._
    fetchUrls(spark,
      deadLetter.select("worker", "offset", "url").as[(Int, Int, String)],
      (u, _) => transport(u))
  }
}
