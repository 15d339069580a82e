package graft

import graft.sources.Fetcher
import graft.sources.Fetcher._
import org.scalatest.funsuite.AnyFunSuite

/** The async-source state machine (request → poll → download) covering
  * the reference's github/mend/wiz control flows with stub transports.
  */
class FetcherSpec extends AnyFunSuite {

  private class Stub(
    requestResults: Iterator[Either[String, String]],
    pollResults: Iterator[PollStatus],
    downloadResult: Either[String, String] = Right("{\"bomFormat\":\"CycloneDX\"}"))
    extends Transport {
    var requests = 0
    var polls = 0
    override def request(): Either[String, String] = { requests += 1; requestResults.next() }
    override def poll(token: String): PollStatus = { polls += 1; pollResults.next() }
    override def download(token: String): Either[String, String] = downloadResult
  }

  private val noSleep: Long => Unit = _ => ()
  private def sleeps: (collection.mutable.ArrayBuffer[Long], Long => Unit) = {
    val buf = collection.mutable.ArrayBuffer.empty[Long]
    (buf, buf += _)
  }

  test("happy path: one request, report ready on first poll") {
    val t = new Stub(Iterator(Right("tok-1")), Iterator(Ready))
    val r = Fetcher.fetch(t, sleep = noSleep)
    assert(r === Fetched("{\"bomFormat\":\"CycloneDX\"}", requestAttempts = 1, polls = 1))
  }

  test("transient request failures retry with backoff, then succeed (github.sh retry loop)") {
    val (slept, sleeper) = sleeps
    val t = new Stub(
      Iterator(Left("503"), Left("502"), Right("tok-2")),
      Iterator(Ready))
    val r = Fetcher.fetch(t, Policy(maxRequestAttempts = 3, backoffMs = Seq(10L, 20L)), sleeper)
    assert(r === Fetched("{\"bomFormat\":\"CycloneDX\"}", requestAttempts = 3, polls = 1))
    assert(slept.toSeq === Seq(10L, 20L)) // backoff escalates per attempt
  }

  test("request gives up after the attempt budget") {
    val t = new Stub(Iterator.continually(Left("401 unauthorized")), Iterator.empty)
    val r = Fetcher.fetch(t, Policy(maxRequestAttempts = 3), noSleep)
    assert(r === GaveUp("request", "401 unauthorized (after 3 attempts)"))
    assert(t.requests === 3 && t.polls === 0)
  }

  test("poll-until-ready: IN_PROGRESS cycles then COMPLETED (wiz.sh report rerun loop)") {
    val t = new Stub(Iterator(Right("rerun-7")),
      Iterator(InProgress, InProgress, InProgress, Ready))
    val r = Fetcher.fetch(t, Policy(maxPolls = 10), noSleep)
    assert(r === Fetched("{\"bomFormat\":\"CycloneDX\"}", requestAttempts = 1, polls = 4))
  }

  test("poll budget exhausted → give up, never downloads") {
    val t = new Stub(Iterator(Right("tok")), Iterator.continually(InProgress))
    val r = Fetcher.fetch(t, Policy(maxPolls = 5), noSleep)
    assert(r === GaveUp("poll", "not ready after 5 polls"))
    assert(t.polls === 5)
  }

  test("report FAILED status aborts immediately") {
    val t = new Stub(Iterator(Right("tok")), Iterator(InProgress, Aborted("report FAILED")))
    val r = Fetcher.fetch(t, Policy(maxPolls = 10), noSleep)
    assert(r === GaveUp("poll", "report FAILED"))
  }

  test("download failure after a ready report retries, then reports the download stage") {
    val t = new Stub(Iterator(Right("tok")), Iterator(Ready), Left("404 expired url"))
    val r = Fetcher.fetch(t, Policy(maxDownloadAttempts = 3), sleep = noSleep)
    assert(r === GaveUp("download", "404 expired url (after 3 attempts)"))
  }

  test("non-retryable request error aborts immediately (github.sh non-timeout API error)") {
    val t = new Stub(Iterator.continually(Left("Bad credentials")), Iterator.empty)
    val r = Fetcher.fetch(t, Policy(maxRequestAttempts = 3), noSleep,
      retryable = Fetcher.githubRetryable)
    assert(r === GaveUp("request", "fatal: Bad credentials"))
    assert(t.requests === 1) // no budget burned on a response that cannot change
  }

  test("githubRetryable classifies the reference's three retryable patterns (github.sh:77)") {
    assert(Fetcher.githubRetryable("Request timed out processing dependency snapshot"))
    assert(Fetcher.githubRetryable("Failed to generate SBOM for this repository"))
    assert(Fetcher.githubRetryable("upstream timeout while rendering"))
    assert(!Fetcher.githubRetryable("Bad credentials"))
    assert(!Fetcher.githubRetryable("Not Found"))
    assert(!Fetcher.githubRetryable("Dependency graph is disabled for this repository"))
  }

  test("timeout errors retry through the full budget, fatal ones do not") {
    val t = new Stub(
      Iterator(Left("Request timed out"), Left("Request timed out"), Right("tok")),
      Iterator(Ready))
    val r = Fetcher.fetch(t, Policy(maxRequestAttempts = 3), noSleep,
      retryable = Fetcher.githubRetryable)
    assert(r === Fetched("{\"bomFormat\":\"CycloneDX\"}", requestAttempts = 3, polls = 1))
  }

  test("invalid-JSON download retries with backoff then succeeds (github.sh:56-69)") {
    val docs = Iterator(Left("<html>502</html>"): Either[String, String],
      Right("<html>Bad Gateway</html>"), Right("{\"spdxVersion\":\"SPDX-2.3\"}"))
    val t = new Stub(Iterator(Right("tok")), Iterator(Ready)) {
      override def download(token: String): Either[String, String] = docs.next()
    }
    val (slept, sleeper) = sleeps
    val r = Fetcher.fetch(t, Policy(maxDownloadAttempts = 3, backoffMs = Seq(5L, 7L)),
      sleeper, validate = Fetcher.jsonProbe)
    assert(r === Fetched("{\"spdxVersion\":\"SPDX-2.3\"}", 1, 1, downloads = 3))
    assert(slept.toSeq === Seq(5L, 7L))
  }

  test("persistently invalid download gives up after the download budget") {
    val t = new Stub(Iterator(Right("tok")), Iterator(Ready), Right("not json at all"))
    val r = Fetcher.fetch(t, Policy(maxDownloadAttempts = 2), noSleep,
      validate = Fetcher.jsonProbe)
    assert(r === GaveUp("download",
      "downloaded document is not valid JSON (after 2 attempts)"))
  }

  test("non-retryable download error aborts without retries") {
    var downloads = 0
    val t = new Stub(Iterator(Right("tok")), Iterator(Ready)) {
      override def download(token: String): Either[String, String] = {
        downloads += 1; Left("Not Found")
      }
    }
    val r = Fetcher.fetch(t, Policy(maxDownloadAttempts = 3), noSleep,
      retryable = Fetcher.githubRetryable)
    assert(r === GaveUp("download", "fatal: Not Found"))
    assert(downloads === 1)
  }

  test("credentials refresh on the poll cadence during a long wait (mend.sh JWT re-login)") {
    var refreshes = 0
    val t = new Stub(Iterator(Right("export-uuid")),
      Iterator.fill(9)(InProgress) ++ Iterator(Ready)) {
      override def refresh(): Unit = refreshes += 1
    }
    val r = Fetcher.fetch(t, Policy(maxPolls = 20, refreshEveryPolls = Some(3)), noSleep)
    assert(r.isInstanceOf[Fetched])
    // polls 3, 6, 9 trigger a refresh before the next status check
    assert(refreshes === 3)
  }

  test("direct transports (github.sh) skip real polling") {
    class Direct extends DirectTransport {
      override def request(): Either[String, String] = Right("direct")
      override def download(token: String): Either[String, String] = Right("doc")
    }
    assert(Fetcher.fetch(new Direct, sleep = noSleep) ===
      Fetched("doc", requestAttempts = 1, polls = 1))
  }

  test("jsonProbe is a real parse: broken structure fails, scalars fail, docs pass") {
    assert(Fetcher.jsonProbe("""{"a": ]""").isLeft) // bracket sniff would pass this
    assert(Fetcher.jsonProbe("""{"a": [1, 2}""").isLeft)
    assert(Fetcher.jsonProbe("""{"a": 1} trailing""").isLeft)
    assert(Fetcher.jsonProbe("42").isLeft) // valid JSON, never a valid SBOM
    assert(Fetcher.jsonProbe("").isLeft)
    assert(Fetcher.jsonProbe("""{"bomFormat": "CycloneDX", "components": []}""").isRight)
    assert(Fetcher.jsonProbe("""[{"name": "a"}]""").isRight)
    assert(Fetcher.jsonProbe("  {\"spdxVersion\": \"SPDX-2.3\"}\n").isRight)
  }

  test("githubRateLimited classifies quota errors and reads the reset window") {
    assert(Fetcher.githubRateLimited("HTTP 429 Too Many Requests, retry-after: 7")
      === Some(7000L))
    assert(Fetcher.githubRateLimited("403: API rate limit exceeded for installation")
      === Some(60000L)) // no window in the message → default 60 s
    assert(Fetcher.githubRateLimited(
      "API rate limit exceeded, x-ratelimit-reset-in: 120") === Some(120000L))
    assert(Fetcher.githubRateLimited("Bad credentials") === None)
    assert(Fetcher.githubRateLimited("Request timed out") === None)
  }

  test("rate-limited request waits out the window without consuming the retry budget") {
    val (slept, sleeper) = sleeps
    val t = new Stub(
      Iterator(Left("429, retry-after: 2"), Left("429, retry-after: 3"), Right("tok")),
      Iterator(Ready))
    // budget of ONE attempt: any consumption by the two 429s would fail
    val r = Fetcher.fetch(t, Policy(maxRequestAttempts = 1), sleeper,
      retryable = Fetcher.githubRetryable, rateLimited = Fetcher.githubRateLimited)
    assert(r === Fetched("{\"bomFormat\":\"CycloneDX\"}", requestAttempts = 1, polls = 1))
    assert(slept.toSeq === Seq(2000L, 3000L)) // quota waits, not backoff
  }

  test("permanently throttled request gives up after maxRateLimitWaits windows") {
    val t = new Stub(Iterator.continually(Left("429, retry-after: 1")), Iterator.empty)
    val r = Fetcher.fetch(t, Policy(maxRequestAttempts = 3, maxRateLimitWaits = 2),
      noSleep, rateLimited = Fetcher.githubRateLimited)
    assert(r === GaveUp("request",
      "fatal: rate limited after 2 waited windows: 429, retry-after: 1"))
    assert(t.requests === 3) // 2 waited windows + the final classifying call
  }

  test("rate-limited download waits, then bounded retries still apply to real errors") {
    val docs = Iterator(Left("429, retry-after: 1"): Either[String, String],
      Left("Request timed out"), Right("{\"ok\": true}"))
    val t = new Stub(Iterator(Right("tok")), Iterator(Ready)) {
      override def download(token: String): Either[String, String] = docs.next()
    }
    val (slept, sleeper) = sleeps
    val r = Fetcher.fetch(t, Policy(maxDownloadAttempts = 2, backoffMs = Seq(5L)),
      sleeper, retryable = Fetcher.githubRetryable,
      rateLimited = Fetcher.githubRateLimited)
    // quota wait didn't consume the 2-attempt budget; the timeout did
    assert(r === Fetched("{\"ok\": true}", 1, 1, downloads = 2))
    assert(slept.toSeq === Seq(1000L, 5L))
  }

  /** Scripted two-step signed-URL transport (wiz.sh:47-170,
    * mend.sh:250): auth results, URL exchanges, and per-URL download
    * outcomes are all injectable.
    */
  private class UrlStub(
    authResults: Iterator[Either[String, Unit]],
    urlResults: Iterator[Either[String, String]],
    downloadFor: String => Either[String, String]) extends UrlTransport {
    var auths = 0
    var urlCalls = 0
    var downloadCalls = 0
    override def authenticate(): Either[String, Unit] = { auths += 1; authResults.next() }
    override def fetchUrl(): Either[String, String] = { urlCalls += 1; urlResults.next() }
    override def download(url: String): Either[String, String] = {
      downloadCalls += 1; downloadFor(url)
    }
  }

  test("signed-URL happy path: auth → URL exchange → download (wiz.sh:47-170)") {
    val t = new UrlStub(Iterator(Right(())), Iterator(Right("https://s3/r1?sig=a")),
      url => Right(s"""{"from": "$url"}"""))
    val r = Fetcher.fetchViaSignedUrl(t, sleep = noSleep)
    assert(r === UrlFetched("""{"from": "https://s3/r1?sig=a"}""",
      urlFetches = 1, reauths = 0, downloads = 1))
    assert(t.auths === 1)
  }

  test("expired signed URL mid-download: re-auth, fresh URL, resume — no download budget burned") {
    // first URL dies with the object store's expiry complaint; the
    // choreography must re-login (wiz.sh:7 / mend.sh:7), exchange a
    // FRESH URL (wiz.sh:107 'Report URL has expired'), and succeed
    val t = new UrlStub(
      Iterator(Right(()), Right(())),
      Iterator(Right("https://s3/r1?sig=old"), Right("https://s3/r1?sig=new")),
      url => if (url.endsWith("old"))
        Left("403 Forbidden: request signature expired")
      else Right("{\"ok\": true}"))
    val r = Fetcher.fetchViaSignedUrl(t,
      Policy(maxDownloadAttempts = 1), sleep = noSleep)
    // maxDownloadAttempts=1 proves the expiry consumed NO download budget
    assert(r === UrlFetched("{\"ok\": true}", urlFetches = 2, reauths = 1,
      downloads = 1))
    assert(t.auths === 2 && t.urlCalls === 2 && t.downloadCalls === 2)
  }

  test("bad credentials are fatal at auth — first login and re-auth alike (wiz.sh:40)") {
    val t1 = new UrlStub(Iterator(Left("invalid client secret")),
      Iterator.empty, _ => fail("must not reach the URL exchange"))
    assert(Fetcher.fetchViaSignedUrl(t1, sleep = noSleep) ===
      GaveUp("auth", "fatal: invalid client secret"))

    val t2 = new UrlStub(
      Iterator(Right(()), Left("refresh token revoked")),
      Iterator(Right("u1")),
      _ => Left("401 Unauthorized: token expired"))
    assert(Fetcher.fetchViaSignedUrl(t2, sleep = noSleep) ===
      GaveUp("auth", "fatal on re-auth: refresh token revoked"))
  }

  test("a URL that expires every time gives up after maxUrlRefreshes, loudly") {
    val t = new UrlStub(
      Iterator.continually(Right(())),
      Iterator.continually(Right("u")),
      _ => Left("presigned URL expired"))
    val r = Fetcher.fetchViaSignedUrl(t, sleep = noSleep, maxUrlRefreshes = 2)
    assert(r === GaveUp("download",
      "signed URL expired after 2 refreshes: presigned URL expired"))
    assert(t.auths === 3 && t.urlCalls === 3) // initial + 2 refresh rounds
  }

  test("URL exchange retries transient errors, aborts on GraphQL errors (wiz.sh:104-119)") {
    val (slept, sleeper) = sleeps
    val ok = new UrlStub(Iterator(Right(())),
      Iterator(Left("502 Bad Gateway"), Right("u2")), _ => Right("{}"))
    val r = Fetcher.fetchViaSignedUrl(ok, Policy(backoffMs = Seq(7L)), sleeper,
      retryable = e => !e.contains("GraphQL"))
    assert(r === UrlFetched("{}", urlFetches = 2, reauths = 0, downloads = 1))
    assert(slept.toSeq === Seq(7L))

    val bad = new UrlStub(Iterator(Right(())),
      Iterator(Left("Wiz GraphQL error: report not found")),
      _ => fail("must not download"))
    assert(Fetcher.fetchViaSignedUrl(bad, sleep = noSleep,
      retryable = e => !e.contains("GraphQL")) ===
      GaveUp("url", "fatal: Wiz GraphQL error: report not found"))
  }

  test("signedUrlExpired classifies 401s, explicit expiry, and 403 signature complaints") {
    assert(Fetcher.signedUrlExpired("401 Unauthorized"))
    assert(Fetcher.signedUrlExpired("Report URL has expired"))
    assert(Fetcher.signedUrlExpired("403 Forbidden: SignatureDoesNotMatch"))
    assert(!Fetcher.signedUrlExpired("403 Forbidden: rate limit exceeded"))
    assert(!Fetcher.signedUrlExpired("503 Service Unavailable"))
  }
}
