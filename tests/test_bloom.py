"""Bloom filter unit + distributed-build tests."""

from __future__ import annotations

import numpy as np

from roddy_spark.operators.dedup import Bloom, ShardedBloom, bloom_from_hashes_df


def test_bloom_no_false_negatives_low_fp():
    rng = np.random.default_rng(42)
    added = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    other = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    b = Bloom(capacity=20_000, fpp=0.01)
    b.add(added)
    assert b.might_contain(added).all()           # zero false negatives
    fp = b.might_contain(other).mean()
    assert fp < 0.03, f"false-positive rate {fp}"


def test_bloom_delta_merge():
    a = Bloom(1000, 0.01)
    b = Bloom(1000, 0.01)
    xs = np.arange(100, dtype=np.int64)
    ys = np.arange(100, 200, dtype=np.int64)
    a.add(xs)
    b.add(ys)
    a.merge(b)
    assert a.might_contain(xs).all() and a.might_contain(ys).all()


def test_sharded_bloom():
    sb = ShardedBloom(capacity=10_000, fpp=0.01, n_shards=4)
    xs = np.random.default_rng(1).integers(-(2**62), 2**62, size=5_000,
                                           dtype=np.int64)
    sb.add(xs)
    assert sb.might_contain(xs).all()


def test_distributed_build_equals_local(spark):
    hashes = list(range(-500, 500, 3))
    df = spark.createDataFrame([(h,) for h in hashes], ["url_hash"]) \
              .repartition(6)
    dist = bloom_from_hashes_df(df, capacity=4096, fpp=0.01)
    local = Bloom(4096, 0.01)
    local.add(np.asarray(hashes, dtype=np.int64))
    assert np.array_equal(dist.bits, local.bits)  # bit-identical
