"""Property-based tests (hypothesis) for the URL kernel — the invariants
that must hold for EVERY input, not just the golden table."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from roddy_spark.functions.urlkernel import (canonicalize_url, resolve_url,
                                             url_hash, url_host)

# URL-ish raw material: hosts, paths with percent signs / unicode /
# whitespace, queries, fragments
_host = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.\-]{0,20}", fullmatch=True)
_path = st.text(
    alphabet=string.ascii_letters + string.digits + "/%._~ -\t\nü√#?&=",
    max_size=40)
_urls = st.builds(lambda h, p, s: f"{s}://{h}/{p}",
                  _host, _path, st.sampled_from(["http", "https", "HTTP"]))
_garbage = st.text(max_size=30)


@given(st.one_of(_urls, _garbage))
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_and_total(raw):
    c = canonicalize_url(raw)
    if c is None:
        return  # rejected input — fine, but must never raise
    # idempotence: canonical form is a fixed point
    assert canonicalize_url(c) == c
    # canonical shape invariants
    assert c.startswith("http://") or c.startswith("https://")
    host = url_host(c)
    assert host and host == host.lower()
    assert "\t" not in c and "\n" not in c and "\r" not in c and " " not in c
    # hashable
    assert isinstance(url_hash(c), int)


@given(_urls, st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_resolve_total_and_canonical(base, href):
    r = resolve_url(base, href)
    if r is None:
        return  # dropped (fragment-only, bad scheme, unparseable) — no raise
    # resolution output is always canonical
    assert canonicalize_url(r) == r


@given(st.one_of(_urls, _garbage), st.one_of(_urls, _garbage))
@settings(max_examples=200, deadline=None)
def test_hash_injective_on_distinct_canonicals(a, b):
    ca, cb = canonicalize_url(a), canonicalize_url(b)
    if ca is None or cb is None:
        return
    if ca == cb:
        assert url_hash(ca) == url_hash(cb)
