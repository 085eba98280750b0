"""Deterministic reference-semantics simulator — the crawl oracle.

Single-process Python implementing the reference crawler's full loop
(crawler-node/src/crawler/worker.py:550-755 do_main_futures +
crawler-steward/src/steward.py:92-182) with every nondeterminism replaced
per SURVEY.md §8.4:

- steward ``random.shuffle`` → order by md5(host|round) (seeded hash order);
- thread-completion order → chunk order = frontier order;
- set iteration → sorted emission;
- wall-clock politeness sleeps → per-round page budgets (robots.page_budget).

The **round structure** is the determinized unit of progress: one global
round = every active domain processes one chunk (≤ its politeness budget) of
its current link generation, exactly like the reference's chunks-of-50 loop
(worker.py:685-693) run in lock-step across domains. The Spark engine
implements the identical spec over DataFrames; tests assert equal
(round, host, seq, url) crawl order, equal cumulative URL-seen key sets, and
byte-identical extracted text per url.

Faithfully reproduced reference quirks (documented, deliberate):
- seen-at-schedule-time: links are blacklisted when scheduled, not when
  fetched (worker.py:739-746, SURVEY.md §8.3);
- links beyond the 500-per-generation cap are blacklisted yet never crawled
  (worker.py:753 truncates after the blacklist inserts);
- hitting MAX_RESULTS_PER_DOMAIN exits WITHOUT marking the domain finished
  (worker.py:734-737) — the domain is re-eligible and later resumes from the
  crawl log (worker.py:244-280), re-seeding its blacklist from crawled URLs;
- the resume kickstart list is NOT blacklisted (worker.py:677-680), so
  kickstart URLs rediscovered later can be scheduled twice.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import lifecycle, refsem, robots as robots_mod
from .corpus import Corpus

steward_rank = lifecycle.steward_rank  # shared deterministic order


@dataclass
class SimConfig:
    max_pages: int = robots_mod.MAX_RESULTS_PER_DOMAIN  # conf.py:16
    steward_batch: int = 50                             # steward.py:20
    max_rounds: int = 500


@dataclass
class DomainCrawl:
    host: str
    scheme: str
    rp: object                      # parsed robots or None
    budget: int
    generation: int = 0
    gen_list: list = field(default_factory=list)   # prepared (normalized+allowed)
    pos: int = 0
    last_chunk: list = field(default_factory=list)
    collected: set = field(default_factory=set)    # raw internal links this gen
    blacklist: set = field(default_factory=set)    # md5 url keys
    crawled: int = 0


@dataclass
class SimResult:
    crawl_log: list = field(default_factory=list)  # full per-fetch rows
    url_seen: dict = field(default_factory=dict)   # host_group -> set(md5 keys)
    events: list = field(default_factory=list)     # (round, host, event)
    domains: dict = field(default_factory=dict)    # host -> final state
    texts: dict = field(default_factory=dict)      # url -> extracted text

    @property
    def order(self) -> list:
        return [(r["round"], r["host"], r["seq"], r["url"])
                for r in self.crawl_log]


class Simulator:
    def __init__(self, corpus: Corpus, config: SimConfig = None):
        self.c = corpus
        self.cfg = config or SimConfig()
        self.robots = robots_mod.RobotsCache(corpus.robots)
        # index-probe table (worker.py:283-353 dual HEADs + :636 index HEAD)
        # answered from the page corpus — dual-ness is computed from data
        self.probes = refsem.root_probes(
            (u, row.get("redirect_to")) for u, row in corpus.pages.items())
        self.domains: dict = {}      # host -> state str
        self.first_seen: dict = {}
        self.groups: dict = {}       # host -> politeness group
        self.active: dict = {}       # host -> DomainCrawl
        self.res = SimResult()
        self.crawled_urls: dict = {}  # host -> list of (url, links) for resume

    # -- helpers ------------------------------------------------------
    def _group(self, host: str) -> str:
        return lifecycle.politeness_group(host, self.c.hosts.get(host))

    def _seen(self, host: str, round_no: int):
        if host not in self.domains:
            self.domains[host] = "seen"
            self.first_seen[host] = round_no
            self.groups[host] = self._group(host)

    def _event(self, round_no: int, host: str, msg: str):
        self.res.events.append((round_no, host, msg))

    def _mark_key(self, host: str, key: str, dc: DomainCrawl):
        dc.blacklist.add(key)
        self.res.url_seen.setdefault(refsem.host_group(host), set()).add(key)

    # -- domain lifecycle (worker.py:550-680) -------------------------
    def _start_domain(self, host: str, round_no: int) -> "DomainCrawl | None":
        d = lifecycle.start_decision(host, self.c.hosts.get(host), self.robots,
                                     probes=self.probes)
        if d.action == "dual-skip":
            # dual-domain: skip bare name, SEEN the www variant
            self._seen("www." + host, round_no)
            self._event(round_no, host, "dual-domain")
            self._event(round_no, host, "finished")
            self.domains[host] = "finished"
            return None
        if d.action == "broken":
            self._event(round_no, host, "broken")
            self.domains[host] = "finished"
            return None
        self._event(round_no, host, "started")
        dc = DomainCrawl(host=host, scheme=d.scheme, rp=d.rp, budget=d.budget)
        # resume from crawl log (worker.py:244-280,668-680)
        crawled = self.crawled_urls.get(host, [])
        kick: list = []
        if crawled:
            bl = set()
            for url, _links in crawled:
                bl.add(refsem.url_seen_key(url))
            sub = set()
            for _url, links in crawled:
                for l in links:
                    if refsem.url_seen_key(l) not in bl:
                        sub.add(l)
            kick = sorted(sub)[: self.cfg.max_pages]
            for k in bl:
                self._mark_key(host, k, dc)
        if not kick:
            kick = [f"{d.scheme}://{host}/"]
        self._prepare_generation(dc, kick)
        return dc

    def _prepare_generation(self, dc: DomainCrawl, raw_links: list):
        # worker.py:685-693: normalize + robots filter at generation start
        dc.gen_list = [
            refsem.normalize_href(l)
            for l in raw_links
            if robots_mod.robots_allow(dc.rp, l)
        ]
        dc.pos = 0
        dc.collected = set()
        dc.generation += 1

    # -- one chunk of one domain (worker.py:694-733 + do_work) --------
    def _crawl_chunk(self, dc: DomainCrawl, round_no: int):
        chunk = dc.gen_list[dc.pos: dc.pos + dc.budget]
        dc.pos += len(chunk)
        dc.last_chunk = chunk
        for seq, link in enumerate(chunk):
            url = refsem.domainize_link(dc.host, link, scheme=dc.scheme)
            page = self.c.pages.get(url)
            row = {"round": round_no, "host": dc.host, "seq": seq, "url": url,
                   "url_sha256": refsem.es_doc_id(url),
                   "host_group": refsem.host_group(dc.host),
                   "jurisdiction": refsem.jurisdiction(dc.host)}
            if page is None:
                row.update({"status": 404, "is_html": False, "links": [],
                            "external_links": [], "content_hash": None,
                            "content_size": 0, "title": None, "keywords": [],
                            "mime_type": None, "mime_group": None,
                            "redirect_to": None, "text": None})
            else:
                # HEAD-redirect semantics (worker.py:468-494): record the
                # Location, SEEN external .gov.au targets; the 3xx body is
                # still GET-fetched and parsed like any html response
                redirect_to = page.get("redirect_to")
                _local, extra = refsem.redirect_info(dc.host, redirect_to)
                if extra:
                    self._seen(extra, round_no)
                html_b = page["html"]
                html = html_b.decode("utf-8")
                links = refsem.extract_links(html, url)
                internal, external, discovered = refsem.classify_links(
                    links, dc.host, dc.scheme)
                text = refsem.extract_text(html_b)
                mime = refsem.mime_split("text/html; charset=utf-8")
                row.update({
                    "status": 302 if redirect_to else 200,
                    "is_html": True, "links": internal,
                    "external_links": external,
                    "content_hash": refsem.content_hash(html_b),
                    "content_size": len(html_b),
                    "title": refsem.page_title(html) or None,
                    "keywords": refsem.keywords(html),
                    "mime_type": mime.get("MIMEType"),
                    "mime_group": mime.get("MIMEGroup"),
                    "redirect_to": redirect_to,
                    "text": text,
                })
                self.res.texts[url] = text
                dc.collected.update(internal)
                for d in discovered:
                    self._seen(d, round_no)
            # every fetch is indexed (parser.put_to_es runs for 404/error
            # too), so resume sees all attempted URLs
            self.crawled_urls.setdefault(dc.host, []).append(
                (url, row["links"]))
            self.res.crawl_log.append(row)
        dc.crawled += len(chunk)

    # -- generation end (worker.py:734-753, SURVEY.md §8.3) -----------
    def _end_generation(self, dc: DomainCrawl, round_no: int) -> bool:
        """Returns True if the domain remains active."""
        if dc.crawled >= self.cfg.max_pages:
            # cap exit: NOT finished; re-eligible for a later resume
            self.domains[dc.host] = "seen"
            return False
        chunk = set(dc.last_chunk)
        next_raw = []
        for link in sorted(dc.collected):
            if refsem.url_seen_key(link) not in dc.blacklist and link not in chunk:
                self._mark_key(dc.host, refsem.url_seen_key(link), dc)
                dom = refsem.domainize_link(dc.host, link, scheme=dc.scheme)
                if dom not in chunk:
                    next_raw.append(dom)
        next_raw = next_raw[: self.cfg.max_pages]
        if not next_raw:
            self._event(round_no, dc.host, "finished")
            self.domains[dc.host] = "finished"
            return False
        self._prepare_generation(dc, next_raw)
        return True

    # -- steward (steward.py:92-182) ----------------------------------
    def _steward(self, round_no: int) -> list:
        locked_groups = {self.groups[h] for h in self.active}
        return lifecycle.pick_domains(self.domains, self.groups, locked_groups,
                                      round_no, self.cfg.steward_batch)

    # -- main loop ----------------------------------------------------
    def run(self, seeds: "list | None" = None) -> SimResult:
        for s in seeds if seeds is not None else self.c.seeds:
            self._seen(s, 0)
        for round_no in range(self.cfg.max_rounds):
            for host in self._steward(round_no):
                self.domains[host] = "started"
                dc = self._start_domain(host, round_no)
                if dc is not None:
                    self.active[host] = dc
            if not self.active:
                break
            for host in sorted(self.active):
                dc = self.active[host]
                self._crawl_chunk(dc, round_no)
                if dc.pos >= len(dc.gen_list):
                    if not self._end_generation(dc, round_no):
                        del self.active[host]
        self.res.domains = dict(self.domains)
        return self.res
