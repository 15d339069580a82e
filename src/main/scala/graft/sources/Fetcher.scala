package graft.sources

/** Pluggable SBOM fetcher modeling the reference's async source control
  * flow: request a report/export → poll until ready → download.
  *
  *   - lib/github.sh:1-136 — direct download with bounded retry+backoff
  *   - lib/mend.sh:1-391 — request an export, poll the status endpoint,
  *     then download the generated document
  *   - lib/wiz.sh:1-326 — rerun a report, poll rerun status until
  *     COMPLETED/FAILED, then fetch the download URL
  *
  * The transport is abstract: the reference talks HTTPS; the zero-egress
  * sandbox (and the specs) plug in a stub. Backoff sleeps are injected so
  * specs run instantly. A fetched document lands wherever the caller
  * writes it — SbomSources' readers take over from there, so this trait
  * is exactly the missing front of that pipeline.
  */
object Fetcher {

  sealed trait PollStatus
  case object InProgress extends PollStatus
  case object Ready extends PollStatus
  final case class Aborted(reason: String) extends PollStatus

  /** One async SBOM source. Implementations are expected to be effectful
    * (network); specs use in-memory stubs.
    */
  trait Transport {
    /** Start an async report/export; returns a token (wiz rerun id, mend
      * export uuid, or a direct download token) or a transient error. */
    def request(): Either[String, String]
    /** Report generation status for a token. */
    def poll(token: String): PollStatus
    /** Download the completed document. */
    def download(token: String): Either[String, String]
  }

  /** Sources whose documents are immediately ready (github.sh): polling
    * degenerates to a single Ready. */
  trait DirectTransport extends Transport {
    final override def poll(token: String): PollStatus = Ready
  }

  final case class Policy(
    maxRequestAttempts: Int = 3,
    maxPolls: Int = 10,
    backoffMs: Seq[Long] = Seq(1000L, 2000L, 4000L)) {
    require(backoffMs.nonEmpty, "Policy.backoffMs must not be empty")
    require(maxRequestAttempts >= 1 && maxPolls >= 1,
      "Policy budgets must be at least 1")
  }

  sealed trait Result
  final case class Fetched(document: String, requestAttempts: Int, polls: Int) extends Result
  final case class GaveUp(stage: String, detail: String) extends Result

  /** Run the request → poll → download state machine under `policy`. */
  def fetch(transport: Transport, policy: Policy = Policy(),
    sleep: Long => Unit = Thread.sleep): Result = {
    def backoff(i: Int): Long =
      policy.backoffMs(math.min(i, policy.backoffMs.size - 1))

    // 1. request with bounded retry + exponential-ish backoff
    var attempt = 0
    var token: Option[String] = None
    var lastErr = ""
    while (token.isEmpty && attempt < policy.maxRequestAttempts) {
      transport.request() match {
        case Right(tk) => token = Some(tk)
        case Left(err) =>
          lastErr = err
          attempt += 1
          if (attempt < policy.maxRequestAttempts) sleep(backoff(attempt - 1))
      }
    }
    token match {
      case None => GaveUp("request", s"$lastErr (after $attempt attempts)")
      case Some(tk) =>
        // 2. poll until ready / aborted / poll budget exhausted
        var polls = 1
        var status = transport.poll(tk)
        while (status == InProgress && polls < policy.maxPolls) {
          sleep(backoff(0))
          status = transport.poll(tk)
          polls += 1
        }
        status match {
          case Ready =>
            // 3. download
            transport.download(tk) match {
              case Right(doc) => Fetched(doc, attempt + 1, polls)
              case Left(err)  => GaveUp("download", err)
            }
          case InProgress  => GaveUp("poll", s"not ready after $polls polls")
          case Aborted(r)  => GaveUp("poll", r)
        }
    }
  }
}
