"""robots.txt semantics, matching the reference's use of stdlib
``urllib.robotparser`` (crawler-node/src/crawler/worker.py:596-632,97-101).

The reference fetches and parses robots.txt live per domain. The rebuild
materializes a per-host robots corpus (robots.txt text per host) and applies
the *same stdlib parser* offline — maximum fidelity at zero porting risk.
Parsed matchers are cached per host; at cluster scale the (tiny) robots
corpus is broadcast and each executor parses lazily.
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

DOWNLOAD_DELAY = 5.0  # reference default (crawler-node/src/crawler/conf.py:17)
USER_AGENT = "disco_crawl"  # worker.py:98

# Deterministic politeness budget: the reference enforces politeness with
# per-request sleeps (worker.py:450-461) and processes the frontier in chunks
# of 50 (worker.py:692). The rebuild replaces wall-clock sleeps with a
# computed per-round page budget: ROUND_SECONDS of simulated crawl time at
# the host's effective delay, capped at the reference chunk size. At the
# default 5 s delay this yields exactly the reference's 50-URL chunk.
ROUND_SECONDS = 250.0
CHUNK = 50  # worker.py:692
MAX_RESULTS_PER_DOMAIN = 500  # conf.py:16


def parse_robots(robots_txt: "str | None") -> "RobotFileParser | None":
    """Parse robots.txt text; returns None when the file is absent or has no
    ``User-agent: *`` entry — the reference then disables robots filtering
    entirely (worker.py:641-643: ``if not robots or not robots.default_entry:
    robots = None``)."""
    if robots_txt is None:
        return None
    rp = RobotFileParser()
    rp.parse(robots_txt.splitlines())
    if not rp.default_entry:
        return None
    return rp


def robots_allow(rp: "RobotFileParser | None", url: str) -> bool:
    """worker.py:97-101: allowed unless a parsed robots denies the
    disco_crawl agent."""
    return rp is None or rp.can_fetch(USER_AGENT, url)


def effective_delay(rp: "RobotFileParser | None") -> float:
    """The per-request delay the reference would sleep.

    The reference computes an rrate-derived ``sleep_seconds``
    (worker.py:620-626) but then DISCARDS it whenever robots parsed with a
    default entry: the per-URL delay is ``robots.crawl_delay(url) if robots
    else sleep_seconds`` (worker.py:720) — a URL passed where an agent is
    expected, so the *default-entry* Crawl-delay applies — and do_work
    floors the result at DOWNLOAD_DELAY (worker.py:445-449). A robots file
    with Request-rate but no Crawl-delay therefore sleeps DOWNLOAD_DELAY,
    not the request-rate interval; and when robots is None the rrate block
    never ran (request_rate needs the same default entry whose absence
    nulls the parser), so the fallback is DOWNLOAD_DELAY there too.
    """
    if rp is None:
        return DOWNLOAD_DELAY
    delay = rp.crawl_delay(USER_AGENT)  # default-entry delay ('*')
    if delay is not None:
        return max(float(delay), DOWNLOAD_DELAY)
    return DOWNLOAD_DELAY


def page_budget(rp: "RobotFileParser | None") -> int:
    """Pages a host may fetch per crawl round (deterministic politeness
    token budget; see module docstring)."""
    delay = max(effective_delay(rp), 1.0)
    return max(1, min(CHUNK, int(ROUND_SECONDS // delay)))


class RobotsCache:
    """Host → parsed matcher cache over a {host: robots_txt|None} dict.
    Used identically by the simulator (driver-side) and the engine's
    pandas UDFs (executor-side, over a broadcast corpus)."""

    def __init__(self, corpus: dict):
        self.corpus = corpus
        self._cache: dict = {}

    def get(self, host: str) -> "RobotFileParser | None":
        if host not in self._cache:
            self._cache[host] = parse_robots(self.corpus.get(host))
        return self._cache[host]

    def allow(self, host: str, url: str) -> bool:
        return robots_allow(self.get(host), url)

    def budget(self, host: str) -> int:
        return page_budget(self.get(host))
