"""Bloom/cuckoo filter properties: ZERO false negatives (the correctness
contract — the filter is only a pre-filter), bounded false positives,
delete support on cuckoo, distributed build == serial build."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_web_scrapper_and_crawler_spark.operators.bloom import (
    CuckooFilter,
    NumpyBloom,
    ShardedBloom,
    add_df_to_filter,
    build_bloom,
)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=500))
@settings(max_examples=50, deadline=None)
def test_bloom_zero_false_negatives(keys):
    bf = NumpyBloom.sized(len(keys), 0.01)
    arr = np.array(keys, dtype=np.int64)
    bf.add(arr)
    assert bf.contains(arr).all()


def test_bloom_fpp_bounded():
    rng = np.random.RandomState(7)
    members = rng.randint(-(2**62), 2**62, size=50_000).astype(np.int64)
    others = rng.randint(-(2**62), 2**62, size=50_000).astype(np.int64)
    others = np.setdiff1d(others, members)
    bf = NumpyBloom.sized(len(members), 0.01)
    bf.add(members)
    fpp = bf.contains(others).mean()
    assert fpp < 0.03  # sized for 1%, power-of-two rounding gives slack


def test_bloom_merge_equals_union():
    rng = np.random.RandomState(1)
    a = rng.randint(-(2**62), 2**62, size=1000).astype(np.int64)
    b = rng.randint(-(2**62), 2**62, size=1000).astype(np.int64)
    m = NumpyBloom.sized(4000, 0.01)
    m.add(a)
    other = NumpyBloom(m.n_bits, m.k)
    other.add(b)
    m.merge(other)
    assert m.contains(a).all() and m.contains(b).all()


def test_sharded_bloom_no_false_negatives():
    rng = np.random.RandomState(2)
    keys = rng.randint(-(2**62), 2**62, size=20_000).astype(np.int64)
    sb = ShardedBloom(n_shards=8, expected_n=20_000)
    sb.add(keys)
    assert sb.contains(keys).all()


def test_distributed_build_equals_serial(spark):
    rng = np.random.RandomState(3)
    keys = rng.randint(-(2**62), 2**62, size=5_000).astype(np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], "url_hash long").repartition(7)
    dist = build_bloom(df, "url_hash", expected_n=5_000)
    serial = NumpyBloom.sized(5_000, 0.01)
    serial.add(keys)
    assert (dist.words == serial.words).all()


def test_cuckoo_insert_contains_delete():
    rng = np.random.RandomState(4)
    keys = rng.randint(-(2**62), 2**62, size=2_000).astype(np.int64)
    cf = CuckooFilter(capacity=4_000)
    assert cf.insert(keys)
    assert cf.contains(keys).all()
    removed = cf.delete(keys[:500])
    assert removed.all()
    # the deleted keys' slots are gone; remaining keys still present
    assert cf.contains(keys[500:]).all()


def test_sharded_distributed_fold_equals_serial(spark):
    """add_df_to_filter on a ShardedBloom must equal the serial build
    bit-for-bit — the distributed per-shard partial fold is the 10^10
    engine path (VERDICT r1 #1)."""
    rng = np.random.RandomState(6)
    keys = rng.randint(-(2**62), 2**62, size=8_000).astype(np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], "url_hash long").repartition(7)
    dist = ShardedBloom(n_shards=8, expected_n=8_000)
    add_df_to_filter(dist, df, "url_hash")
    serial = ShardedBloom(n_shards=8, expected_n=8_000)
    serial.add(keys)
    for a, b in zip(dist.shards, serial.shards):
        assert (a.words == b.words).all()
    assert dist.contains(keys).all()


def test_cuckoo_degrades_on_overflow_and_delete():
    """False-negative events must set .degraded so the engine stops
    trusting definite-new answers (ADVICE r1 #3)."""
    cf = CuckooFilter(capacity=64)
    rng = np.random.RandomState(8)
    small = rng.randint(-(2**62), 2**62, size=10).astype(np.int64)
    assert cf.insert(small)
    assert not cf.degraded
    # overflow: way past capacity => some insert fails
    big = rng.randint(-(2**62), 2**62, size=5_000).astype(np.int64)
    cf.insert(big)
    assert cf.degraded
    # delete flags too (a removed fp may have belonged to another key)
    cf2 = CuckooFilter(capacity=64)
    cf2.insert(small)
    cf2.delete(small[:2])
    assert cf2.degraded


@pytest.mark.parametrize("n", [10, 1000])
def test_cuckoo_fpp_sane(n):
    rng = np.random.RandomState(5)
    members = rng.randint(-(2**62), 2**62, size=n).astype(np.int64)
    others = rng.randint(-(2**62), 2**62, size=10_000).astype(np.int64)
    cf = CuckooFilter(capacity=2 * n)
    cf.insert(members)
    assert cf.contains(others).mean() < 0.05


def test_sharded_probe_matches_direct_contains(spark):
    """The shard-local probe (per-shard lazy broadcasts + pmod
    repartition) must agree exactly with ShardedBloom.contains."""
    from distributed_web_scrapper_and_crawler_spark.operators.bloom import sharded_probe_maybe

    rng = np.random.RandomState(9)
    members = rng.randint(-(2**62), 2**62, size=4_000).astype(np.int64)
    probes = np.concatenate([members[:2_000], rng.randint(-(2**62), 2**62, size=2_000)]).astype(np.int64)
    sb = ShardedBloom(n_shards=8, expected_n=4_000)
    sb.add(members)
    df = spark.createDataFrame([(int(h),) for h in probes], "url_hash long").repartition(5)
    got = {r["url_hash"]: r["_maybe"] for r in sharded_probe_maybe(spark, sb, df).collect()}
    want = dict(zip((int(x) for x in probes), (bool(b) for b in sb.contains(probes))))
    assert got == want
    assert all(got[int(h)] for h in members[:2000])  # zero false negatives


def test_sharded_bloom_requires_power_of_two_shards():
    """ADVICE r3: signed pmod partitioning and the unsigned per-row shard
    id agree for negative hashes only when n_shards | 2^64 — enforce the
    power-of-two contract instead of silently degrading task locality."""
    import pytest

    for bad in (3, 6, 12, 100):
        with pytest.raises(ValueError, match="power of two"):
            ShardedBloom(n_shards=bad, expected_n=10_000)
    # the agreement the contract buys: uint64 % 2^k == pmod(int64, 2^k)
    rng = np.random.RandomState(11)
    h = rng.randint(-(2**62), 2**62, size=10_000).astype(np.int64)
    for k in (1, 8, 16):
        unsigned = (h.view(np.uint64) % np.uint64(k)).astype(np.int64)
        signed_pmod = np.mod(h, k)  # numpy mod is pmod for positive modulus
        assert (unsigned == signed_pmod).all()
