"""Shared example scaffolding: session + a small seeded synthetic web."""

from __future__ import annotations

import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor python workers must also import roddy_spark (UDF closures are
# pickled by reference) — export BEFORE the JVM starts
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from roddy_spark.session import build_session  # noqa: E402
from roddy_spark.sources.synthweb import WebConfig, synthweb_df  # noqa: E402

WEB = WebConfig(n_hosts=3, n_pages=120, n_corpus=40)


def setup(app: str):
    spark = build_session(app_name=app, cores=4, shuffle_partitions=4)
    pages = synthweb_df(spark, WEB, partitions=2)
    pages.persist().count()
    ckpt = tempfile.mkdtemp(prefix=f"roddy_example_{app}_")
    return spark, pages, ckpt
