"""WARC source (sources/warc.py): writer/parser round-trips, gzip member
handling, corruption resync, and the Spark binaryFile reader."""

from __future__ import annotations

import gzip

import pytest

from roddy_spark.sources import warc as W


def _resp(url, body: bytes, status=200, ctype="text/html", seq=0):
    return W.build_record(
        "response", url, W.build_http_response(body, status, ctype),
        seq=seq)


def test_round_trip_plain():
    recs = [_resp("http://a.test/1", b"<html>one</html>"),
            _resp("http://a.test/2", b"two", status=404,
                  ctype="text/plain", seq=1)]
    got = list(W.parse_warc(W.build_warc(recs)))
    assert [r["error"] for r in got] == [None, None]
    assert [r["url"] for r in got] == ["http://a.test/1", "http://a.test/2"]
    assert [r["http_status"] for r in got] == [200, 404]
    assert [r["content_type"] for r in got] == ["text/html", "text/plain"]
    assert got[0]["payload"] == b"<html>one</html>"
    assert got[1]["payload"] == b"two"
    assert got[0]["warc_type"] == "response"


def test_round_trip_gzip_members():
    recs = [_resp(f"http://g.test/{i}", f"body {i}".encode(), seq=i)
            for i in range(5)]
    data = W.build_warc(recs, gzip_per_record=True)
    assert data[:2] == b"\x1f\x8b"
    got = list(W.parse_warc(data))
    assert len(got) == 5 and all(r["error"] is None for r in got)
    assert [r["payload"] for r in got] == [f"body {i}".encode()
                                          for i in range(5)]
    # single-member gzip of the whole archive also parses
    whole = gzip.compress(W.build_warc(recs), mtime=0)
    assert [r["url"] for r in W.parse_warc(whole)] == [
        f"http://g.test/{i}" for i in range(5)]


def test_determinism_and_record_ids():
    a = W.build_warc([_resp("http://d.test/x", b"abc")],
                     gzip_per_record=True)
    b = W.build_warc([_resp("http://d.test/x", b"abc")],
                     gzip_per_record=True)
    assert a == b  # no clock, no RNG
    (rec,) = W.parse_warc(a)
    assert rec["warc_headers"]["warc-record-id"].startswith("<urn:uuid:")


def test_non_http_record_payload_raw():
    rec = W.build_record("warcinfo", "http://m.test/", b"k: v\r\n",
                         content_type="application/warc-fields")
    (got,) = W.parse_warc(rec)
    assert got["warc_type"] == "warcinfo"
    assert got["content_type"] == "application/warc-fields"
    assert got["http_status"] is None
    assert got["payload"] == b"k: v\r\n"


def test_corrupt_record_resyncs():
    good1 = _resp("http://c.test/1", b"first")
    bad = b"WARC/1.1\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
    good2 = _resp("http://c.test/2", b"second", seq=1)
    got = list(W.parse_warc(good1 + bad + good2))
    assert len(got) == 3
    assert got[0]["error"] is None and got[0]["payload"] == b"first"
    assert got[1]["error"] is not None
    assert got[2]["error"] is None and got[2]["payload"] == b"second"
    # garbage prefix also resyncs to the first real record
    got2 = list(W.parse_warc(b"not a warc\r\n" + good1))
    assert got2[0]["error"] is not None
    assert got2[1]["url"] == "http://c.test/1"


def test_truncated_archive_errors():
    rec = _resp("http://t.test/1", b"0123456789")
    got = list(W.parse_warc(rec[:len(rec) - 16]))
    assert got[-1]["error"] == "truncated block"


def test_spark_read_warc(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    for f in range(3):
        recs = [W.build_record("warcinfo", f"file:{f}", b"v\r\n",
                               content_type="application/warc-fields")]
        recs += [_resp(f"http://s{f}.test/p{i}",
                       f"<html>doc {f}-{i}</html>".encode(), seq=i + 1)
                 for i in range(4)]
        ext = ".warc.gz" if f % 2 == 0 else ".warc"
        (d / f"part{f}{ext}").write_bytes(
            W.build_warc(recs, gzip_per_record=(f % 2 == 0)))
    df = W.read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 15 and all(r["error"] is None for r in rows)
    resp = W.read_warc(spark, str(d), types=("response",)).collect()
    assert len(resp) == 12
    assert {r["http_status"] for r in resp} == {200}
    by_url = {r["url"]: r for r in resp}
    assert bytes(by_url["http://s1.test/p2"]["payload"]) == \
        b"<html>doc 1-2</html>"
    # record_no is per-file parse order
    assert {r["record_no"] for r in resp} == {1, 2, 3, 4}


def test_parse_never_crashes_on_corruption():
    """Property: arbitrary byte corruption of a valid archive never
    raises — every outcome is parsed records and/or error rows."""
    from hypothesis import given, settings, strategies as st

    recs = [_resp(f"http://z.test/{i}", f"payload {i}".encode(), seq=i)
            for i in range(3)]
    base = W.build_warc(recs)

    @settings(max_examples=150, deadline=None)
    @given(st.integers(0, len(base) - 1), st.binary(min_size=0,
                                                    max_size=24))
    def check(pos, junk):
        data = base[:pos] + junk + base[pos + len(junk):]
        out = list(W.parse_warc(data))
        assert all(("error" in r) for r in out)
        for r in out:
            if r["error"] is None:
                assert r["warc_type"] is not None

    check()


def test_parse_never_crashes_on_random_bytes():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=100, deadline=None)
    @given(st.binary(min_size=0, max_size=400))
    def check(data):
        for r in W.parse_warc(data):
            assert "error" in r

    check()


def test_corrupt_gzip_member_keeps_good_prefix():
    recs = [_resp(f"http://gz.test/{i}", f"ok {i}".encode(), seq=i)
            for i in range(3)]
    data = W.build_warc(recs, gzip_per_record=True)
    # chop the final member mid-way; also flip bytes inside it
    cut = data[:len(data) - 9]
    got = list(W.parse_warc(cut))
    good = [r["url"] for r in got if r["error"] is None]
    # every decodable record parses (cutting only the gzip trailer still
    # yields all three) and the truncation is reported as an error row
    assert good == [f"http://gz.test/{i}" for i in range(len(good))]
    assert len(good) >= 2
    assert got[-1]["error"] is not None
    # pure garbage behind a gzip magic never raises either
    got2 = list(W.parse_warc(b"\x1f\x8bgarbage here"))
    assert got2 and got2[-1]["error"] is not None


def test_wet_round_trip(spark, tmp_path):
    rows = [(f"http://wet.test/p{i}", f"extracted text {i} é✓")
            for i in range(40)]
    df = spark.createDataFrame(rows, ["url", "text"]).repartition(4)
    out = str(tmp_path / "wet")
    W.write_wet(df, out)
    import os
    files = sorted(os.listdir(out))
    assert 1 <= len(files) <= 4
    assert all(f.endswith(".warc.wet.gz") for f in files)
    back = W.read_wet(spark, out).collect()
    assert len(back) == 40 and all(r["error"] is None for r in back)
    assert {(r["url"], r["text"]) for r in back} == set(rows)
