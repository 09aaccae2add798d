"""robots.txt semantics, reference-faithful.

The reference parses robots.txt once per origin with stdlib
``urllib.robotparser.RobotFileParser`` and caches the parser
(/root/reference/Cloud/scripts/crawler_worker.py:134-145).  The crawl
gate is ``rp.can_fetch("*", url)`` and the politeness delay is
``rp.crawl_delay("*") or DEFAULT_DELAY`` — note the ``or``: an
explicit ``Crawl-delay: 0`` falls back to the 1.0 s default
(/root/reference/Cloud/scripts/crawler_worker.py:41,146-149).

What a NULL body models, precisely: a host with NO robots.txt — the
HTTP 404 case, where ``RobotFileParser.read()`` sets
``allow_all=True`` and the Local pipeline's ``None`` parser allows
everything (/root/reference/Local/crawler.py:33-40).  Both reference
pipelines ALLOW in that case, and so does this table.  The distinct
network-failure case (connection error: ``rp.read()`` raises, the
Cloud worker caches a never-parsed parser whose ``can_fetch`` returns
False because ``last_checked`` is unset — i.e. Cloud DENIES the host,
Local allows it) is NOT modeled: there is no network in the
pages-table world, so fetches don't fail at the transport layer.  A
deny-all host is expressible directly as ``robots_txt='User-agent:
*\\nDisallow: /'`` if a test wants the Cloud failure behavior.

Here there is no network: the robots corpus is a table
``(host, robots_txt)`` where a NULL/absent body means "no robots.txt
published" (the 404 / allow-all case).
Parsers are built once per distinct host (the robots dim is tiny
relative to the frontier) and consulted through a per-batch cache in
the Arrow UDF (functions/udfs.py).
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

__all__ = ["RobotsRules", "parse_robots", "DEFAULT_DELAY", "AGENT"]

DEFAULT_DELAY = 1.0  # seconds, reference DELAY env default
AGENT = "*"  # Cloud path checks can_fetch("*", url)


class RobotsRules:
    """Parsed rules for one host.

    ``crawl_delay`` is the RAW robots value (None when absent — or
    explicitly 0, preserving the reference's ``or`` quirk); the
    configured default (CrawlConfig.default_delay, the reference DELAY
    env) is applied by the caller so the knob is honored uniformly by
    oracle and engine.  ``delay`` keeps the module-default fallback
    for callers without a config."""

    __slots__ = ("_rp", "delay", "crawl_delay")

    def __init__(self, robots_txt: str | None):
        if robots_txt is None:
            # no robots.txt published (HTTP 404 -> allow_all=True in
            # RobotFileParser.read; see module docstring for why the
            # transport-failure deny case is out of the data model)
            self._rp = None
            self.crawl_delay = None
        else:
            rp = RobotFileParser()
            rp.parse(robots_txt.splitlines())
            self._rp = rp
            self.crawl_delay = rp.crawl_delay(AGENT) or None
        self.delay = self.crawl_delay or DEFAULT_DELAY

    def can_fetch(self, url: str) -> bool:
        if self._rp is None:
            return True
        try:
            return self._rp.can_fetch(AGENT, url)
        except Exception:
            return True


def parse_robots(robots_txt: str | None) -> RobotsRules:
    return RobotsRules(robots_txt)
