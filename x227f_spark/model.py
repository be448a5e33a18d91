"""Executable golden model of the crawl engine.

A ~300-line sequential, pure-Python implementation of the *canonical round
semantics* that the Spark engine reproduces distributedly. Golden traces for
the parity tests (crawl ordering, URL-seen set, span sequences — the
BASELINE.json correctness gate) are generated from this model, never from the
Spark engine itself.

Canonical model = the reference's semantics (file:line cites inline) with the
three deliberate, documented replacements that make a distributed engine
deterministic (SURVEY.md §4):

1. virtual clock — wall time is replaced by round numbers; one round = the
   reference's 15 s save/refresh cadence (main.rs:151-153).
2. batch politeness — the sequential pop-first-unthrottled scan
   (data.rs:418-439) becomes per-round per-host budgets
   floor(round_seconds/delay); selection order stays queue order.
3. pinned tie-breaks — score sorting is (score desc, node_id asc); the
   reference's unstable f32 sort (pagerank.rs:131) leaves ties unspecified.

Plus two micro-divergences, invisible to any downstream read, documented in
ROUND_SEMANTICS.md: round-start button-cache snapshot and end-of-round pages
view for discovered-URL bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

from .constants import EngineConfig, internal_link_weight
from .extract_logic import ButtonData, extract_spans, scrape_images
from .urlutil import Url, hosts_list_contains, page_id_of

VIRTUAL_EPOCH = datetime.fromisoformat("2026-01-01T00:00:00+00:00")


@dataclass
class PageRecord:
    """data.rs:442-462."""

    url: str
    last_visited: datetime
    failed: int = 0
    buttons: list[ButtonData] = field(default_factory=list)
    internal_links: list[str] = field(default_factory=list)
    redirects_to: str | None = None


@dataclass
class TraceEvent:
    round: int
    seq: int
    page_id: str
    host: str
    action: str  # admitted | fetched | failed | skipped_redirect


class GoldenModel:
    def __init__(self, corpus, config: EngineConfig | None = None):
        self.corpus = corpus
        self.cfg = config or EngineConfig()
        # CrawlerState (data.rs:38-78)
        self.pages: dict[str, PageRecord] = {}
        self.known: dict[str, int] = {}  # page_id -> node_id (IndexSet)
        self.discovered: dict[int, str] = {}  # node_id -> url
        self.links_by_src: dict[int, list[tuple[int, float]]] = {}  # raw links incl self
        self.scores: list[float] = []
        self.queue: list[str] = []
        self.in_flight: set[str] = set()
        self.button_cache: dict[str, tuple[str, str, datetime]] = {}
        self.media: dict[str, tuple[bytes, str]] = {}  # S8 content store
        self.trace: list[TraceEvent] = []
        self.metrics: list[dict] = []
        self.round = 0
        self._bootstrapped = False

    # ---- helpers --------------------------------------------------------
    def now(self) -> datetime:
        return VIRTUAL_EPOCH + timedelta(seconds=self.round * self.cfg.round_seconds)

    def node_id(self, page_id: str) -> int:
        """IndexSet::insert_full (data.rs:61)."""
        if page_id not in self.known:
            self.known[page_id] = len(self.known)
            self.scores.append(1.0)
        return self.known[page_id]

    def _admission_blocked(self, url: str) -> bool:
        """Banned host (data.rs:196-198) or robots Disallow prefix (the
        robots-table generalization; no rules → reference behavior)."""
        u = Url.parse(url)
        host = u.host if u else ""
        path = u.path if u else ""
        return self.cfg.effective_banned(host) or \
            self.cfg.disallowed(host, path)

    def add_to_queue(self, url: str) -> bool:
        """data.rs:195-208."""
        if self._admission_blocked(url):
            return False
        pid = page_id_of(url)
        if pid in self.in_flight:
            return False
        self.queue.append(url)
        self.in_flight.add(pid)
        self.node_id(pid)
        return True

    # ---- G2: PageRank (pagerank.rs:103-120) ------------------------------
    def pagerank_iterations(self, k: int) -> None:
        n = len(self.known)
        outdeg = [0] * n
        inbound: list[list[tuple[int, float]]] = [[] for _ in range(n)]
        for src, links in self.links_by_src.items():
            outdeg[src] = len(links)  # counts self + dups (pagerank.rs:50,78)
            for dst, w in links:
                if dst != src:  # self links excluded (pagerank.rs:52-55)
                    inbound[dst].append((src, w))
        for _ in range(k):
            new = [0.0] * n
            for to in range(n):
                s = 0.0
                for frm, w in inbound[to]:
                    if outdeg[frm] > 0:
                        s += self.scores[frm] / outdeg[frm] * w
                new[to] = 0.15 + 0.85 * s
            self.scores[:n] = new

    # ---- T1/T2/F11/F12: refresh_queue (data.rs:210-292) ------------------
    def refresh_queue(self) -> None:
        iters = (self.cfg.bootstrap_pr_iters if not self._bootstrapped
                 else self.cfg.round_pr_iters)
        self._bootstrapped = True
        self.pagerank_iterations(iters)

        order = sorted(range(len(self.scores)), key=lambda i: (-self.scores[i], i))
        ids = list(self.known)  # insertion order
        now = self.now()
        adding: list[str] = []
        for idx in order:
            score = self.scores[idx]
            if score < self.cfg.required_score:
                break
            pid = ids[idx]
            if pid in self.in_flight:
                continue
            page = self.pages.get(pid)
            if page is not None:
                if page.failed > 0:
                    wait = timedelta(seconds=3600 * 2 ** (page.failed - 1))
                    if page.last_visited + wait < now:
                        adding.append(page.url)
                else:
                    hours = (self.cfg.recrawl_popular_hours
                             if score > self.cfg.popular_score
                             else self.cfg.recrawl_hours)
                    if page.last_visited + timedelta(hours=hours) < now:
                        adding.append(page.url)
            else:
                url = self.discovered.pop(idx, None)  # consume (data.rs:262-268)
                if url is None:
                    continue
                adding.append(url)
            if len(adding) + len(self.queue) > self.cfg.queue_cap:
                break
        for url in adding:
            self.add_to_queue(url)

    # ---- T3/P1: schedule (data.rs:418-439 + ratelimiter.rs) ---------------
    def schedule(self) -> list[str]:
        budgets: dict[str, int] = {}
        selected: list[str] = []
        remaining: list[str] = []
        for url in self.queue:
            if len(selected) >= self.cfg.fetch_cap:
                remaining.append(url)
                continue
            u = Url.parse(url)
            host = u.host if u else ""
            if host not in budgets:
                budgets[host] = self.cfg.host_budget(host)
            if budgets[host] > 0:
                budgets[host] -= 1
                selected.append(url)
            else:
                remaining.append(url)
        self.queue = remaining
        return selected

    # ---- fetch one URL (main.rs:192-298, page.rs:23-141) ------------------
    def fetch(self, url: str):
        """Returns (kind, res_url, page_or_none); kind in
        {'page','discard','error'}."""
        doc = self.corpus.http_get(url)
        res_url = url
        # P6 basic redirect (page.rs:128-137), at most once
        if doc is not None and doc.redirect_to is not None and 300 <= doc.status < 400:
            base = Url.parse(res_url)
            target = base.join(doc.redirect_to) if base else None
            if target is not None:
                t_str = target.to_string()
                if t_str != res_url and page_id_of(t_str) == page_id_of(res_url):
                    res_url = t_str
                    doc = self.corpus.http_get(t_str)
        if doc is None:
            return ("error", res_url, None)

        # J3 redirect-dedup (main.rs:209-217)
        original_pid = page_id_of(url)
        new_pid = page_id_of(res_url)
        if new_pid != original_pid and new_pid in self.in_flight:
            return ("discard", res_url, None)

        now = self.now()
        # redirect page (page.rs:28-39)
        if doc.redirect_to is not None and 300 <= doc.status < 400:
            base = Url.parse(res_url)
            target = base.join(doc.redirect_to) if base else None
            if target is not None and target.to_string() != res_url:
                return ("page", res_url, PageRecord(
                    url=res_url, last_visited=now, redirects_to=target.to_string()))
        # error page (page.rs:40-50)
        if not (200 <= doc.status < 300):
            return ("page", res_url, PageRecord(url=res_url, last_visited=now))
        ct = doc.content_type if doc.content_type is not None else "text/html"
        if not (ct.startswith("text/html") or ct.startswith("application/xhtml")):
            return ("error", res_url, None)  # bail (page.rs:64-66)
        if doc.body_len > 10 * 1024 * 1024:
            return ("page", res_url, PageRecord(url=res_url, last_visited=now))

        ext = extract_spans(doc.spans, res_url, self.cfg.tracking_params,
                            self.cfg.max_internal_links)
        buttons = [b for b in scrape_images(
            ext.candidates, self.corpus.images_get, self._cache_snapshot.get,
            now, self.cfg.button_ttl_hours) if b is not None]
        return ("page", res_url, PageRecord(
            url=res_url, last_visited=now, buttons=buttons,
            internal_links=ext.internal_links))

    # ---- E4: edge derivation (data.rs:354-416) ----------------------------
    def derive_links(self, page: PageRecord, end_of_round_pages: set[str]):
        u = Url.parse(page.url)
        if self.cfg.effective_no_follow(u.host if u else ""):
            return []
        host, path = page_id_of(page.url).split("/", 1) if "/" in page_id_of(page.url) \
            else (page_id_of(page.url), "")
        w_int = internal_link_weight(host, path)
        links: list[tuple[int, float, str]] = []
        for link in page.internal_links:
            links.append((self.node_id(page_id_of(link)), w_int, link))
        for b in page.buttons:
            if b.target is not None:
                links.append((self.node_id(page_id_of(b.target)), 1.0, b.target))
        if page.redirects_to is not None:
            t = Url.parse(page.redirects_to)
            if t is not None and t.scheme in ("http", "https"):
                links.append((self.node_id(page_id_of(page.redirects_to)), 0.1,
                              page.redirects_to))
        ids = list(self.known)
        for idx, _w, url in links:
            if ids[idx] not in end_of_round_pages:
                self.discovered[idx] = url  # upsert, last wins (data.rs:389)
        return [(idx, w) for idx, w, _ in links]

    # ---- one crawl round (P3) ---------------------------------------------
    def run_round(self) -> dict:
        self.round += 1
        self.refresh_queue()
        selected = self.schedule()
        seq = 0
        for url in selected:
            self.trace.append(TraceEvent(self.round, seq, page_id_of(url),
                                         Url.parse(url).host if Url.parse(url) else "",
                                         "admitted"))
            seq += 1

        self._cache_snapshot = dict(self.button_cache)
        results = [self.fetch(url) for url in selected]

        end_of_round_pages = set(self.pages)
        for url, (kind, res_url, page) in zip(selected, results):
            if kind == "page":
                end_of_round_pages.add(page_id_of(res_url))
            elif kind == "error":
                end_of_round_pages.add(page_id_of(url))

        fetched = failed = 0
        now = self.now()
        for url, (kind, res_url, page) in zip(selected, results):
            original_pid = page_id_of(url)
            host = Url.parse(url).host if Url.parse(url) else ""
            if kind == "discard":
                self.trace.append(TraceEvent(self.round, seq, original_pid, host,
                                             "skipped_redirect"))
                seq += 1
            elif kind == "error":
                failed += 1
                self.trace.append(TraceEvent(self.round, seq, original_pid, host,
                                             "failed"))
                seq += 1
                existing = self.pages.get(original_pid)
                if existing is not None:  # main.rs:274-276
                    existing.last_visited = now
                    existing.failed += 1
                else:  # main.rs:277-286 — stub page
                    self.pages[original_pid] = PageRecord(
                        url=url, last_visited=now, failed=1)
                    self.node_id(original_pid)
            else:
                fetched += 1
                self.trace.append(TraceEvent(self.round, seq, original_pid, host,
                                             "fetched"))
                seq += 1
                pid = page_id_of(page.url)
                # insert_page (data.rs:298-326): cache update + upsert
                for b in page.buttons:
                    if b.fresh_bytes is not None and b.hash not in self.media:
                        self.media[b.hash] = (b.fresh_bytes, b.file_ext)
                    if b.source is not None:
                        self.button_cache[b.source] = (b.hash, b.file_ext,
                                                       b.last_visited)
                existing = self.pages.get(pid)
                if existing is not None:
                    existing.buttons = page.buttons
                    existing.internal_links = page.internal_links
                    existing.last_visited = page.last_visited
                    existing.failed = page.failed
                    # QUIRK: redirects_to NOT updated (data.rs:317-322)
                else:
                    self.pages[pid] = page
                    self.node_id(pid)
                # E4 + set_new_links (replace-on-recrawl: canonical
                # rebuild-from-state semantics, SURVEY §2 G3)
                raw = self.derive_links(page, end_of_round_pages)
                self.links_by_src[self.known[pid]] = raw
            self.in_flight.discard(original_pid)  # finish_crawling

        m = {"round": self.round, "admitted": len(selected), "fetched": fetched,
             "failed": failed, "queue_size": len(self.queue),
             "seen_size": len(self.known)}
        self.metrics.append(m)
        return m

    def bootstrap(self) -> None:
        """data.rs:117-178 — empty db: enqueue the starting point."""
        if not self.pages:
            self.add_to_queue(self.cfg.starting_point)

    def run(self, rounds: int) -> None:
        self.bootstrap()
        for _ in range(rounds):
            self.run_round()

    # ---- exports for parity assertions -----------------------------------
    def seen_set(self) -> dict[str, int]:
        return dict(self.known)

    def page_spans(self) -> dict[str, list[tuple]]:
        """Per-page output span sequence: (kind, text, media_ref, offset) —
        the per-row invariant of BASELINE.json."""
        out = {}
        for pid, page in sorted(self.pages.items()):
            spans = []
            for i, b in enumerate(page.buttons):
                spans.append(("button", b.target, b.hash, i))
            off = len(spans)
            for j, l in enumerate(page.internal_links):
                spans.append(("anchor", l, None, off + j))
            if page.redirects_to is not None:
                spans.append(("redirect", page.redirects_to, None, len(spans)))
            out[pid] = spans
        return out
