package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** The real [[Fetcher.Transport]]: a `java.net.http.HttpClient` GET.
  * Deploy wiring for the S1/S4 harvest (reference
  * tasks_for_01.py:96-176 uses `requests.get` with the same
  * status-driven retry contract, which lives in [[Fetcher]]).
  *
  * Serializable by construction — it ships inside `mapPartitions` fetch
  * closures — with the client itself `@transient lazy`, so each executor
  * builds its own connection pool on first use instead of shipping one.
  * I/O failures (DNS, refused connection, timeouts) surface as a
  * retryable 503 so the retry policy treats network flap like a flaky
  * upstream; non-2xx statuses pass through as-is.
  */
object HttpTransport {

  val DefaultTimeout: Duration = Duration.ofSeconds(30)

  /** A transport with per-request timeout; pass extra headers for
    * authenticated sources (the reference sends an apikey header). */
  def apply(timeout: Duration = DefaultTimeout,
      headers: Map[String, String] = Map.empty): Fetcher.Transport =
    new JdkTransport(timeout.toMillis, headers)

  private final class JdkTransport(timeoutMs: Long,
      headers: Map[String, String])
      extends (String => Either[Int, String]) with Serializable {

    @transient private lazy val client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

    override def apply(url: String): Either[Int, String] =
      try {
        val b = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(timeoutMs)).GET()
        headers.foreach { case (k, v) => b.header(k, v) }
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) Right(resp.body())
        else Left(resp.statusCode())
      } catch {
        case _: java.io.IOException => Left(503)
        case _: InterruptedException =>
          // task cancellation, not upstream flakiness: restore the
          // interrupt flag and return a NON-retryable status so the
          // retry loop exits instead of re-issuing requests through the
          // whole backoff schedule on a thread Spark is trying to kill
          Thread.currentThread().interrupt()
          Left(499)
      }
  }
}
