package graft.streaming

/** S6: the collector's operational endpoints as pure response functions —
  * the engine side of `/health`, `/sink-health`, `/crossdomain.xml`,
  * `/robots.txt`, and the configurable root response (reference
  * `CollectorRoute.scala:158-236`, `CollectorService.scala:222-246`).
  * These produce the exact status/body the reference's routes emit,
  * driven by [[PipelineMonitor]] / sink health for the dynamic ones;
  * [[HttpEdgeServer]] serves them over real sockets (r9). Golden-pinned
  * against the reference's CollectorServiceSpec strings.
  */
object OpsEndpoints {

  /** (status, body). */
  type Response = (Int, String)

  def health(healthy: Boolean): Response =
    if (healthy) (200, "OK") else (503, "Service Unavailable")

  def sinkHealth(sinksHealthy: Boolean): Response = health(sinksHealthy)

  /** Reference `CollectorService.flashCrossDomainPolicy`
    * (`CollectorService.scala:222-238`): exact string incl. the
    * empty-domain-list newline shape. */
  def flashCrossDomainPolicy(
      enabled: Boolean, domains: Seq[String], secure: Boolean): Response =
    if (!enabled) (404, "404 not found")
    else (200,
      "<?xml version=\"1.0\"?>\n<cross-domain-policy>\n" +
        domains
          .map(d => s"""  <allow-access-from domain="$d" secure="$secure" />""")
          .mkString("\n") +
        "\n</cross-domain-policy>")

  def robots: Response = (200, "User-agent: *\nDisallow: /")

  /** Reference `rootResponse` (`CollectorService.scala:240-246`):
    * configured status + body, else 404. Headers carried separately by
    * the HTTP tier. */
  def rootResponse(enabled: Boolean, status: Int, body: String = ""): Response =
    if (enabled) (status, body) else (404, "404 not found")

  /** Config-driven spellings: the same endpoints resolved straight from a
    * loaded [[graft.operators.CollectorConfig]] (r5 — the crossDomain /
    * rootResponse / p3p blocks now parse from the reference's own config
    * files, so the served bytes are a pure function of that file). */
  def flashCrossDomainPolicy(cfg: graft.operators.CollectorConfig): Response =
    flashCrossDomainPolicy(
      cfg.crossDomainEnabled, cfg.crossDomainDomains, cfg.crossDomainSecure)

  def rootResponse(cfg: graft.operators.CollectorConfig): Response =
    rootResponse(cfg.rootResponseEnabled, cfg.rootResponseStatus, cfg.rootResponseBody)
}
