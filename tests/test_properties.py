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


# ---------------------------------------------------------------------------
# vectorized fast path ≡ scalar kernel (the invariant that makes the regex
# fast path safe: a false positive there would be a wrong answer, so the
# Series versions must match the scalar kernel ELEMENTWISE on any input)
# ---------------------------------------------------------------------------

import pandas as pd

from roddy_spark.functions.urlkernel import (canonicalize_series,
                                             resolve_series)

# extra adversarial material aimed at the fast-path regex boundaries:
# default/odd ports, dot segments, empty query/fragment, stray %, case
_edgey = st.one_of(
    st.from_regex(
        r"https?://[a-z0-9.\-]{1,12}(:[0-9]{1,5})?/[A-Za-z0-9./%?#=&_~-]{0,24}",
        fullmatch=True),
    st.sampled_from([
        "http://a.test/x?", "http://a.test/x#", "http://a.test:80/x",
        "https://a.test:443/x", "http://a.test:08080/", "http://a.test./",
        "http://a.test/a/../b", "http://a.test/a/./b", "http://a.test/..",
        "http://a.test/%7Euser", "http://a.test/a%2fb", "http://a.test/a%b",
        "http://user@a.test/", "http://a.test:99999/", "http://a..test/x",
        # the r7 semi-fast layer's boundaries: case folding, default and
        # zero-padded ports, cross-scheme defaults, empty path, '.' host
        "HTTP://UPPER.TEST:80/Part/9", "HTTPS://X.TEST:443", "Http://A.b/",
        "HTTP://H0.TEST", "http://H.TEST:080/", "HTTP://H.TEST:443/x",
        "https://H.TEST:80/x", "HTTP://h.test?q=1", "HTTP://h.test#f",
        "HTTP://h.test.:8080/p", "HTTP://H.TEST/a?b?c#d#e",
    ]),
    st.from_regex(
        r"(HTTP|http|Http|HTTPS|https)://[A-Za-z0-9.\-]{1,12}"
        r"(:[0-9]{1,5})?(/[A-Za-z0-9./?#=&_~-]{0,24})?",
        fullmatch=True))


@given(st.lists(st.one_of(_urls, _garbage, _edgey, st.none()), max_size=12))
@settings(max_examples=300, deadline=None)
def test_canonicalize_series_matches_scalar(vals):
    got = canonicalize_series(pd.Series(vals, dtype="object"))
    want = [canonicalize_url(v) for v in vals]
    assert list(got) == want


_hrefs = st.one_of(
    _urls, _garbage, st.none(),
    st.from_regex(r"(/|//|\.\./|\./)?[A-Za-z0-9._\-/]{0,20}(\?[a-z=&]{0,8})?"
                  r"(#[a-z]{0,6})?", fullmatch=True),
    st.sampled_from(["#frag", "?q=1", "mailto:x@y.z", "javascript:void(0)",
                     "//other.test/p", ".", "..", "p/1", "\t/p/2\n"]))


@given(st.lists(st.tuples(st.one_of(_urls, _edgey, st.none()), _hrefs),
                max_size=12))
@settings(max_examples=300, deadline=None)
def test_resolve_series_matches_scalar(pairs):
    base = pd.Series([p[0] for p in pairs], dtype="object")
    href = pd.Series([p[1] for p in pairs], dtype="object")
    got = resolve_series(base, href)
    want = [resolve_url(b, h) for b, h in pairs]
    assert list(got) == want
