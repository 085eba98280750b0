"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-4).

Generates the ``pages(url, warc_ts, html, text, lang)`` table plus per-host
attributes (https/dual/robots/govcms), a robots.txt corpus, and seed URLs.
All content is *hash-derived from the URL + seed* (no generation-order RNG
dependence), so any scale regenerates identically and in parallel.

The host universe exercises every reference behavior: dual www/non-www pairs
(worker.py:283-353), state-domain chaff the steward must filter
(steward.py:25-36), a govCMS politeness cluster (worker.py:657-664), hot
hosts with multiplied page counts (skew), broken/missing robots
(worker.py:596-632), and messy hrefs (``..``, ``.``, ``//``, mailto/tel/
javascript/#frag/nofollow) for normalize_href (worker.py:152-181).

The golden ``text`` column is DEFINED as refsem.extract_text(html) — the
reference bs4-chain equivalent — which pins the byte-identical invariant.
"""

from __future__ import annotations

import datetime
import hashlib
from dataclasses import dataclass, field

from . import refsem

EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

_WORDS = (
    "government services department strategic priorities accessibility "
    "information publication framework compliance infrastructure policy "
    "digital transformation agency citizens portal report annual budget "
    "grants procurement standards guidelines legislation consultation"
).split()


def _h(s: str, seed: int) -> int:
    return int.from_bytes(
        hashlib.md5(f"{seed}:{s}".encode()).digest()[:8], "big"
    )


@dataclass
class HostAttrs:
    host: str
    https: bool = True
    dual: bool = False            # both www./bare serve content
    is_govcms: bool = False
    robots_txt: "str | None" = None
    robots_broken: bool = False   # fetch timeout -> domain broken
    index_ok: bool = True         # index HEAD fails -> domain broken
    n_sections: int = 3
    pages_per_section: int = 4


@dataclass
class Corpus:
    seed: int
    pages: dict = field(default_factory=dict)        # url -> row dict
    hosts: dict = field(default_factory=dict)        # host -> HostAttrs
    seeds: list = field(default_factory=list)        # seed host names
    robots: dict = field(default_factory=dict)       # host -> robots_txt|None

    def page_rows(self) -> list:
        """Rows for the pages table, sorted by url (stable)."""
        return [self.pages[u] for u in sorted(self.pages)]


def _robots_txt(host: str, seed: int) -> "str | None":
    """Every host gets one of: standard robots (disallow /private/, maybe a
    crawl-delay), an agent-specific-only file (no ``*`` entry → the reference
    treats it as no robots at all), or none."""
    r = _h("robots:" + host, seed) % 10
    if r < 5:
        delay = ""
        if r == 0:
            delay = "Crawl-delay: 10\n"
        elif r == 1:
            delay = "Request-rate: 1/20\n"
        return f"User-agent: *\n{delay}Disallow: /private/\n"
    if r == 5:
        # no default entry: reference nulls the parser (worker.py:641-643)
        return "User-agent: othercrawler\nDisallow: /\n"
    return None


def _page_html(host: str, path: str, cfg: HostAttrs, links: list, seed: int) -> bytes:
    hv = _h(host + path, seed)
    words = [_WORDS[(hv >> (4 * i)) % len(_WORDS)] for i in range(6)]
    title = f"{words[0].title()} {words[1]} — {host}{path}"
    govcms_head = ""
    if cfg.is_govcms:
        govcms_head = (
            '<meta name="generator" content="Drupal 7 (http://drupal.org)'
            ' + govCMS (http://govcms.gov.au)"/>\n'
            "<script>ga('create','UA-54970022-1','auto');</script>\n"
        )
    anchors = "\n".join(f'<a href="{href}">{i}</a>' for i, href in enumerate(links))
    noise_variants = [
        '<a href="#top">top</a>',
        '<a href="mailto:info@{h}">mail</a>'.format(h=host),
        '<a href="tel:+61261234567">call</a>',
        '<a href="javascript:void(0)">js</a>',
        '<a rel="nofollow" href="/do-not-follow">nf</a>',
    ]
    noise = "\n".join(noise_variants[: (hv % 5) + 1])
    # occasional backslash / non-ascii payloads exercise the escape chain
    quirk = ""
    if hv % 7 == 0:
        quirk = "<p>archive at C:\\data\\files\\2024 — résumé of naïve café.</p>"
    paras = "\n".join(
        f"<p>The {words[i]} {words[(i + 1) % 6]} delivers {words[(i + 2) % 6]} "
        f"outcomes for {words[(i + 3) % 6]} stakeholders across the "
        f"{words[(i + 4) % 6]} program {hv % 1000}.</p>"
        for i in range(3)
    )
    html = f"""<html><head><title>{title}</title>
{govcms_head}<script>var s = 'analytics-{hv % 97}';</script>
<style>.m{{margin:0}}</style>
</head><body>
<h1>{words[0].title()} {words[1]} statement</h1>
<h2>{words[2]} overview, {words[3]}.</h2>
<ul><li><a href="/">home</a></li><li>{words[4]}</li></ul>
{anchors}
{noise}
{paras}
{quirk}
<table><tr><td>ignored {words[5]}</td></tr></table>
<form><input name="q"/></form>
</body></html>"""
    return html.encode("utf-8")


def _page_row(url: str, html: bytes, seed: int,
              redirect_to: "str | None" = None) -> dict:
    """The one place a pages-table row is shaped: every column derives from
    (url, html, seed) so any generation path produces identical rows."""
    return {
        "url": url,
        "warc_ts": EPOCH + datetime.timedelta(seconds=_h(url, seed) % 10_000_000),
        "html": html,
        "text": refsem.extract_text(html),
        "lang": "en-us" if _h("lang" + url, seed) % 20 else "en-au",
        "redirect_to": redirect_to,
    }


def _section_path(j: int) -> str:
    return f"/s{j}/"


def _host_pages(cfg: HostAttrs, all_hosts: list, seed: int,
                hub: "str | None" = None, redirects: bool = True) -> dict:
    """Build the page tree for one host: root → sections → leaf pages, with
    messy href forms and deterministic cross-host external links. ``hub``
    (the hot portal host) is linked from every root — a realistic hub that
    guarantees the skew host joins every crawl."""
    host, pages = cfg.host, {}
    hv = _h("x:" + host, seed)
    ext_targets = [all_hosts[(hv + k) % len(all_hosts)] for k in (1, 3)]
    if hub:
        ext_targets.append(hub)
    ext_links = [f"https://{t}/" for t in ext_targets if t != host]

    def add(path: str, links: list, redirect_to: "str | None" = None):
        url = f"https://{host}{path}"
        if redirect_to is None:
            html = _page_html(host, path, cfg, links, seed)
        else:
            # the 3xx body the reference GETs with allow_redirects=False
            # (worker.py:508-513): small html, no anchors
            html = (f"<html><head><title>Redirecting</title></head>"
                    f"<body><p>Moved to {redirect_to}.</p></body>"
                    f"</html>").encode("utf-8")
        pages[url] = _page_row(url, html, seed, redirect_to)

    ns, pps = cfg.n_sections, cfg.pages_per_section
    # redirect trio (worker.py:468-494): internal (path-only Location),
    # external .gov.au (domain-SEEN discovery — targets a host nothing
    # links to, so redirect discovery is the only way it joins the crawl),
    # and external non-gov (counted only)
    redirect_links: list = []
    if redirects:
        redirect_links = ["/go/section", "/go/gov", "/go/away"]
        add("/go/section", [], redirect_to="/s0/")
        add("/go/gov", [], redirect_to="https://via-redirect.gov.au/")
        add("/go/away", [], redirect_to="https://www.example.com/")
    # root links each section, one messy double-slash, externals
    add("/", [_section_path(j) for j in range(ns)]
        + [f"//{host}/s0/"] + ext_links + redirect_links)
    for j in range(ns):
        sp = _section_path(j)
        links = [f"p{k}.html" for k in range(pps)]          # relative
        links += [f"../s{(j + 1) % ns}/", "./", "/private/doc.html"]
        add(sp, links)
        for k in range(pps):
            leaf_links = ["./", f"../s{(j + 1) % ns}/p{(k + 1) % pps}.html",
                          f"p{k}.html?v=2"]
            if k == 0:
                leaf_links += ext_links
            add(f"{sp}p{k}.html", leaf_links)
    # disallowed-by-robots page (exists; crawled only when robots absent)
    add("/private/doc.html", ["/"])
    return pages


def generate(
    seed: int = 42,
    n_agencies: int = 8,
    n_govcms: int = 3,
    n_state: int = 3,
    n_sections: int = 3,
    pages_per_section: int = 4,
    hot_hosts: int = 1,
    hot_multiplier: int = 5,
    n_seeds: int = 3,
    redirects: bool = True,
) -> Corpus:
    """``redirects=False`` reproduces the round-1 corpus shape (no per-host
    redirect trio, no redirect-only host) — kept as a first-class knob so
    throughput regressions can be bisected input-shape vs code (VERDICT r2
    'What's wrong' #1)."""
    c = Corpus(seed=seed)

    def reg(attrs: HostAttrs):
        c.hosts[attrs.host] = attrs

    for i in range(n_agencies):
        dual = i % 3 == 0
        canonical = (f"www.agency{i:02d}.gov.au" if dual
                     else f"agency{i:02d}.gov.au")
        reg(HostAttrs(host=canonical, dual=dual,
                      https=_h("https:" + canonical, seed) % 10 != 0,
                      robots_txt=_robots_txt(canonical, seed),
                      n_sections=n_sections,
                      pages_per_section=pages_per_section))
        if dual:
            # the bare alias of a dual site serves too (that is what makes
            # it dual — worker.py:283-353); it gets a root page below so
            # the lifecycle's index probes discover dual-ness FROM DATA
            reg(HostAttrs(host=canonical[4:], dual=True, index_ok=True,
                          robots_txt=None, n_sections=0, pages_per_section=0))
    for i in range(n_govcms):
        h = f"govcms{i:02d}.gov.au"
        reg(HostAttrs(host=h, is_govcms=True, robots_txt=_robots_txt(h, seed),
                      n_sections=n_sections, pages_per_section=pages_per_section))
    for i in range(hot_hosts):
        h = f"portal{i:02d}.gov.au"
        reg(HostAttrs(host=h, robots_txt=_robots_txt(h, seed),
                      n_sections=n_sections * hot_multiplier,
                      pages_per_section=pages_per_section * 2))
    for i in range(n_state):
        st = ("qld", "nsw", "vic")[i % 3]
        reg(HostAttrs(host=f"svc{i:02d}.{st}.gov.au", robots_txt=None,
                      n_sections=1, pages_per_section=2))
    reg(HostAttrs(host="broken-robots.gov.au", robots_broken=True,
                  n_sections=1, pages_per_section=1))
    reg(HostAttrs(host="deadsite.gov.au", index_ok=False,
                  n_sections=0, pages_per_section=0))
    reg(HostAttrs(host="partner00.example.com", robots_txt=None,
                  n_sections=1, pages_per_section=1))
    if redirects:
        # reachable ONLY via every host's /go/gov redirect
        # (worker.py:480-482): proves the redirect-discovery path
        # end-to-end — no <a> links here
        reg(HostAttrs(host="via-redirect.gov.au", robots_txt=None,
                      n_sections=1, pages_per_section=2))

    content_hosts = sorted(h for h, a in c.hosts.items()
                           if a.n_sections > 0 and a.index_ok)
    # the redirect-only host stays out of the <a>-link target pool
    link_pool = [h for h in content_hosts if h != "via-redirect.gov.au"]
    hub = "portal00.gov.au" if "portal00.gov.au" in c.hosts else None
    for h in content_hosts:
        c.pages.update(_host_pages(c.hosts[h], link_pool, seed, hub=hub,
                                   redirects=redirects))
    # dual bare aliases answer their index probe with a content page (no
    # links — the www side is the crawled canonical): dual-ness is therefore
    # discoverable ONLY from the pages table, never from a flag
    for h, a in c.hosts.items():
        if a.dual and not h.startswith("www.") and a.n_sections == 0:
            url = f"https://{h}/"
            c.pages[url] = _page_row(url, _page_html(h, "/", a, [], seed),
                                     seed)

    c.robots = {h: (None if a.robots_broken else a.robots_txt)
                for h, a in c.hosts.items()}
    # seeds: first agencies by hash order — includes a bare dual alias so the
    # dual-skip path runs from round 0
    crawlable = sorted(
        (h for h, a in c.hosts.items()
         if refsem.should_be_crawled(h) and h != "via-redirect.gov.au"),
        key=lambda h: _h("seed:" + h, seed),
    )
    c.seeds = sorted(crawlable[:n_seeds])
    if not any(c.hosts[s].dual and not s.startswith("www.") for s in c.seeds):
        bare_duals = sorted(h for h, a in c.hosts.items()
                            if a.dual and not h.startswith("www."))
        if bare_duals:
            c.seeds = sorted(c.seeds + [bare_duals[0]])
    return c
