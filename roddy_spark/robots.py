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
