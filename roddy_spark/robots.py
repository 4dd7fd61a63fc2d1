"""robots.txt handling (north-rule addition; the reference engine does NOT
implement robots — it appears only as a test fixture,
roddy_httptestserver.go:13-18 — so the grammar honored here is that
fixture's format: ``User-agent`` / ``Allow`` / ``Disallow`` lines).

Standard longest-prefix-match semantics (Google REP / RFC 9309): the most
specific (longest) matching rule wins; on a length tie Allow wins; no match
→ allowed. Only ``User-agent: *`` groups are honored (the engine sends one
UA). The parsed form is a plain list of (allow, prefix) tuples so it
broadcasts cheaply as a ``map<host, rules>`` and evaluates identically in
the driver-side oracle and inside executor-side pandas UDFs.
"""

from __future__ import annotations


def parse_robots(robots_txt: str | None) -> list[tuple[bool, str]]:
    """robots.txt → [(allow, path_prefix), ...] for User-agent: * groups."""
    if not robots_txt:
        return []
    rules: list[tuple[bool, str]] = []
    applies = False
    seen_ua = False
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if seen_ua and rules:
                # a later UA group; only honor '*' groups
                applies = False
            applies = applies or val == "*"
            seen_ua = True
        elif key in ("allow", "disallow") and applies:
            if val == "" and key == "disallow":
                continue  # empty Disallow = allow everything
            rules.append((key == "allow", val))
    return rules


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Longest-prefix match; tie → allow; no match → allowed."""
    best_len, best_allow = -1, True
    for allow, prefix in rules:
        if path.startswith(prefix):
            ln = len(prefix)
            if ln > best_len or (ln == best_len and allow):
                best_len, best_allow = ln, allow
    return best_allow


def build_robots_map(rows) -> dict[str, list[tuple[bool, str]]]:
    """[(host, robots_txt)] → broadcastable {host: rules}."""
    return {host: parse_robots(txt) for host, txt in rows}


def robots_path_of(url: str) -> str:
    """The path(+query) robots rules match against. Proper URL parsing —
    splitting the string on the hostname would keep the port in the path
    for non-default-port URLs (rules would see ':8080/x') and misparse
    URLs whose host substring also appears in userinfo."""
    from urllib.parse import urlsplit
    try:
        parts = urlsplit(url)
    except ValueError:
        return "/"
    path = parts.path or "/"
    return f"{path}?{parts.query}" if parts.query else path


# ---------------------------------------------------------------------------
# Vectorized gate — the admission hot path (VERDICT r2 item 5).
#
# The per-row zip(host, url) loop cost ~the whole robots stage; rule maps
# are tiny but candidate batches are not. Shape: split each URL with ONE
# C-speed str.extract using the RFC 3986 generic grammar (the same split
# urlsplit performs — scheme://authority stops at the first of / ? #), then
# evaluate longest-prefix rules per HOST GROUP with vectorized
# str.startswith, one pass per rule (rule lists are a handful of entries).
# Only rows of hosts that HAVE rules are split at all (a batch where one
# host in a million carries robots rules pays for that host's rows only).
# Rows whose URL the regex could split differently from urlsplit — no
# scheme://authority shape, embedded whitespace/control chars (urlsplit
# strips \t\r\n anywhere), or '[' bracket hosts (urlsplit may raise on
# malformed ones) — fall back to the scalar path; none of these occur in
# canonicalizer output. Row-for-row parity with
# robots_allowed(rules, robots_path_of(url)) is property-pinned in
# tests/test_robots_vec.py.
# ---------------------------------------------------------------------------

import re as _re

_URL_SCHEME_RE = _re.compile(r"(?is)^[a-z][a-z0-9+.\-]*://")
_URL_PARTS_RE = _re.compile(
    r"(?is)^[a-z][a-z0-9+.\-]*://[^/?#]*(/[^?#]*)?(\?[^#]*)?(?:#.*)?\Z")
# anything urlsplit normalizes away (C0 controls, space) or parses with
# host-validation (brackets) → scalar fallback
_URL_ODD_RE = _re.compile(r"[\x00-\x20\[\]]")


def robots_gate_series(host, url, rules_map: dict):
    """True/False per row: is ``url`` allowed by ``rules_map[host]``?
    pandas-Series-in/Series-out; hosts without rules are allowed."""
    import numpy as np
    import pandas as pd

    out = pd.Series(True, index=host.index)
    if not rules_map:
        return out
    groups = host.groupby(host).indices  # host → int positions
    active = [h for h in groups if rules_map.get(h)]
    if not active:
        return out

    # compute match paths ONLY for rows whose host has rules
    pos_all = np.concatenate([np.asarray(groups[h]) for h in active])
    sub_url = url.iloc[pos_all]
    parts = sub_url.str.extract(_URL_PARTS_RE)
    fast = (sub_url.str.match(_URL_SCHEME_RE).fillna(False).astype(bool)
            & ~sub_url.str.contains(_URL_ODD_RE, na=True))
    paths = (parts[0].fillna("/")
             + parts[1].fillna("").replace("?", ""))  # '?' alone = no query
    if not fast.all():
        slow = sub_url.index[~fast & sub_url.notna()]
        paths.loc[slow] = [robots_path_of(u) for u in sub_url.loc[slow]]

    offset = 0
    for h in active:
        n = len(groups[h])
        p = paths.iloc[offset:offset + n]
        offset += n
        best_len = np.full(len(p), -1)
        best_allow = np.ones(len(p), dtype=bool)
        for allow, prefix in rules_map[h]:
            m = p.str.startswith(prefix).to_numpy()
            ln = len(prefix)
            upd = m & ((ln > best_len) | ((best_len == ln) & allow))
            best_len[upd] = ln
            best_allow[upd] = allow
        out.iloc[groups[h]] = best_allow
    return out
