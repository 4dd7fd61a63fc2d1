"""Single-threaded Python reference oracle for the crawl semantics.

Implements, literally and sequentially, the semantics the Spark engine must
reproduce (SURVEY.md §1.3 invariants + §3.3 level-synchronous
reconstruction of the reference's queue mode, queue/queue.go:108-208):

  * seeds at depth 1; children at depth+1; paging (rel="next") at the SAME
    depth (request.go:94-105); reject iff max_depth>0 and depth>max_depth
  * admission-filter order: depth → request budget → deny regexes → allow
    regexes → domain deny → domain allow → robots (north-rule addition) →
    visited (roddy.go:250-268, 270-290)
  * visited marked AT ADMISSION, before fetch; failed fetches stay visited
    and are never retried (roddy.go:292-310)
  * first-occurrence-wins dedup in candidate order; candidate order within
    a batch is (priority, parent_seq, link_pos); admitted rows get a global
    monotonically increasing ``seq`` — the crawl ordering the engine must
    match exactly
  * per-host politeness budget with DEFERRAL: within a batch, only the
    first ``per_host_budget`` admitted rows per host (by priority, seq)
    fetch; the rest carry over to the next batch, keeping their seq —
    deferred rows are already visited-marked so they must NOT be re-deduped
    (SURVEY.md §7.4.3)
  * redirects (3xx) carry their target as their only link (synthweb.py's
    documented model); non-HTML content types and failed fetches (status
    ≥ 400 or missing page) produce no links
  * budgets: max_requests caps ADMISSIONS (reference: fetch starts,
    1:1 in roddy since it has no deferral, roddy.go:255-257); max_responses
    caps successful fetches, checked at batch granularity (documented
    deviation from roddy's racy mid-level atomic — SURVEY.md §7.4.4)

The oracle is intentionally simple (plain dicts/lists, no Spark) so it can
be audited line-by-line against the reference semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from roddy_spark.config import CrawlConfig
from roddy_spark.functions.urlkernel import (canonicalize_url, resolve_url,
                                             url_hash, url_host)
from roddy_spark.robots import (build_robots_map, robots_allowed,
                                robots_path_of)

PRIORITY_PAGING = 0   # rel="next" links — scheduled before children (D8)
PRIORITY_CHILD = 1


@dataclass
class OracleResult:
    # (url_norm, depth, seq, host) in admission order — THE crawl ordering
    admitted: list[tuple[str, int, int, str]] = field(default_factory=list)
    # url_norm → fetch outcome
    fetches: list[dict] = field(default_factory=list)
    visited_hashes: set[int] = field(default_factory=set)
    rejected: dict[str, int] = field(default_factory=dict)
    batches: list[dict] = field(default_factory=list)
    # url_norm → inherited Context map at admission (context.go:8-52)
    ctx_by_url: dict = field(default_factory=dict)
    paging_count: int = 0
    # hook channels: rows that flow to OnError / OnScraped, in fetch order
    errors: list[dict] = field(default_factory=list)
    scraped: list[dict] = field(default_factory=list)

    @property
    def visited_urls(self) -> set[str]:
        return {a[0] for a in self.admitted}

    @property
    def order(self) -> list[str]:
        return [a[0] for a in sorted(self.admitted, key=lambda a: a[2])]


def crawl_oracle(pages: dict[str, dict], seeds: list,
                 config: CrawlConfig,
                 robots_rows: list[tuple[str, str]] | None = None,
                 max_batches: int = 200, on_request=None,
                 on_response=None) -> OracleResult:
    """pages: url_norm → {status:int, content_type:str, base_href:str|None,
    links:[{href,text,pos,rel}]} (the synthetic-web table, collected)."""
    res = OracleResult()
    robots = build_robots_map(robots_rows or [])
    deny_re = [re.compile(p) for p in config.disallowed_url_filters]
    allow_re = [re.compile(p) for p in config.url_filters]
    admitted_count = 0
    success_count = 0
    seq_counter = 0

    def reject(reason: str) -> None:
        res.rejected[reason] = res.rejected.get(reason, 0) + 1

    # candidates: (priority, parent_seq, pos, url_norm, depth, ctx)
    candidates = []
    for i, s in enumerate(seeds):
        raw, ctx = (s, None) if isinstance(s, str) else (s[0], s[1])
        u = canonicalize_url(raw)
        if u is None:
            reject("unparseable")
            continue
        candidates.append((PRIORITY_CHILD, i, 0, u, 1, ctx))
    # (url, depth, prio, seq, ctx)
    deferred: list[tuple[str, int, int, int, dict | None]] = []

    batch_id = 0
    while (candidates or deferred) and batch_id < max_batches:
        batch_id += 1
        # --- admission (sequential, in candidate order) -------------------
        candidates.sort(key=lambda c: (c[0], c[1], c[2]))
        newly_admitted: list[tuple[str, int, int, int, dict | None]] = []
        for prio, _parent_seq, _pos, url, depth, ctx in candidates:
            if config.max_depth and depth > config.max_depth:
                reject("max_depth")
                continue
            if config.max_requests and admitted_count >= config.max_requests:
                reject("max_requests")
                continue
            if any(r.search(url) for r in deny_re):
                reject("disallowed_url_filter")
                continue
            if allow_re and not any(r.search(url) for r in allow_re):
                reject("url_filter")
                continue
            host = url_host(url) or ""
            if host in config.disallowed_domains:
                reject("domain_deny")
                continue
            if config.allowed_domains and host not in config.allowed_domains:
                reject("domain_allow")
                continue
            if config.respect_robots and host in robots:
                if not robots_allowed(robots[host], robots_path_of(url)):
                    reject("robots")
                    continue
            h = url_hash(url)
            if not config.allow_url_revisit and h in res.visited_hashes:
                reject("visited")
                continue
            res.visited_hashes.add(h)       # mark AT admission
            res.ctx_by_url[url] = ctx
            admitted_count += 1
            seq = seq_counter
            seq_counter += 1
            res.admitted.append((url, depth, seq, host))
            newly_admitted.append((url, depth, prio, seq, ctx))
        candidates = []

        # --- politeness: per-host budget, deferral carries over -----------
        pool = deferred + newly_admitted
        pool.sort(key=lambda r: (r[2], r[3]))  # (priority, seq)
        to_fetch: list[tuple[str, int, int, int, dict | None]] = []
        deferred = []
        per_host: dict[str, int] = {}
        for url, depth, prio, seq, ctx in pool:
            host = url_host(url) or ""
            n = per_host.get(host, 0)
            if config.per_host_budget and n >= config.per_host_budget:
                deferred.append((url, depth, prio, seq, ctx))
            else:
                per_host[host] = n + 1
                to_fetch.append((url, depth, prio, seq, ctx))

        # --- OnRequest hook: abort between admission and fetch ------------
        n_aborted = 0
        if on_request is not None:
            kept = []
            for row in to_fetch:
                if on_request(row[0], row[1], row[4]):
                    kept.append(row)
                else:
                    n_aborted += 1
            to_fetch = kept

        # --- fetch (extraction deferred so the paging gate sees the whole
        # batch's paging successes, matching the engine's batch semantics) --
        n_success = n_failure = 0
        to_extract = []
        for url, depth, prio, seq, ctx in sorted(to_fetch,
                                                 key=lambda r: r[3]):
            page = pages.get(url)
            status = page["status"] if page else 404
            ok = page is not None and status < 400
            # OnResponse: a dropped successful response is suppressed —
            # not recorded, not counted, never extracted (engine parity)
            if ok and on_response is not None and \
                    not on_response(url, depth, ctx):
                continue
            res.fetches.append({"url_norm": url, "depth": depth, "seq": seq,
                                "status": status, "success": ok,
                                "batch": batch_id})
            if ok:
                n_success += 1
                success_count += 1
                if prio == PRIORITY_PAGING:
                    res.paging_count += 1
                res.scraped.append({"url_norm": url, "depth": depth,
                                    "seq": seq, "batch": batch_id})
            else:
                n_failure += 1
                res.errors.append({"url_norm": url, "depth": depth,
                                   "seq": seq, "status": status,
                                   "batch": batch_id})
                continue
            if page["content_type"] != "text/html" and not (
                    300 <= status < 400):
                continue
            to_extract.append((url, depth, seq, ctx, page))

        # --- extract: children inherit ctx; paging gated by F11 -----------
        allow_paging = not (config.max_page_num
                            and res.paging_count >= config.max_page_num)
        for url, depth, seq, ctx, page in to_extract:
            # <base href> may itself be relative → resolve against page URL
            base = url
            if page.get("base_href"):
                base = resolve_url(url, page["base_href"]) or url
            for link in page["links"]:
                child = resolve_url(base, link["href"])
                if child is None:
                    continue
                if link.get("rel") == "next":
                    if allow_paging:
                        candidates.append((PRIORITY_PAGING, seq, link["pos"],
                                           child, depth, ctx))
                else:
                    candidates.append((PRIORITY_CHILD, seq, link["pos"],
                                       child, depth + 1, ctx))

        res.batches.append({"batch": batch_id, "fetched": len(to_fetch),
                            "success": n_success, "failure": n_failure,
                            "deferred": len(deferred),
                            "admitted": len(newly_admitted)})
        if config.max_responses and success_count >= config.max_responses:
            break
    return res


def pages_dict_from_pandas(pdf) -> dict[str, dict]:
    """synthweb_pandas() → the oracle's pages mapping."""
    out = {}
    for _, row in pdf.iterrows():
        out[row["url"]] = {
            "status": int(row["status"]),
            "content_type": row["content_type"],
            "base_href": row["base_href"],
            "links": list(row["links"]),
        }
    return out


def dfs_oracle(pages: dict[str, dict], seeds: list[str],
               config: CrawlConfig,
               robots_rows: list[tuple[str, str]] | None = None
               ) -> list[tuple[str, int]]:
    """The reference's SYNC mode (roddy.go:142-154, SURVEY §3.1): literal
    recursive depth-first visit in document order — visit a page, then
    recurse into each of its links before the next sibling. Returns the
    preorder [(url_norm, depth)]; the Spark fixpoint in plans/dfs.py must
    reproduce it exactly."""
    import sys
    robots = build_robots_map(robots_rows or [])
    deny_re = [re.compile(p) for p in config.disallowed_url_filters]
    allow_re = [re.compile(p) for p in config.url_filters]
    visited: set[int] = set()
    order: list[tuple[str, int]] = []
    sys.setrecursionlimit(100_000)

    def admissible(url: str, depth: int) -> bool:
        if config.max_depth and depth > config.max_depth:
            return False
        if any(r.search(url) for r in deny_re):
            return False
        if allow_re and not any(r.search(url) for r in allow_re):
            return False
        host = url_host(url) or ""
        if host in config.disallowed_domains:
            return False
        if config.allowed_domains and host not in config.allowed_domains:
            return False
        if config.respect_robots and host in robots:
            if not robots_allowed(robots[host], robots_path_of(url)):
                return False
        return True

    def visit(url: str | None, depth: int) -> None:
        if url is None or not admissible(url, depth):
            return
        h = url_hash(url)
        if h in visited:
            return
        visited.add(h)
        order.append((url, depth))
        page = pages.get(url)
        if page is None or page["status"] >= 400:
            return
        if page["content_type"] != "text/html" and not (
                300 <= page["status"] < 400):
            return
        base = url
        if page.get("base_href"):
            base = resolve_url(url, page["base_href"]) or url
        for link in page["links"]:
            visit(resolve_url(base, link["href"]), depth + 1)

    for s in seeds:
        visit(canonicalize_url(s), 1)
    return order
