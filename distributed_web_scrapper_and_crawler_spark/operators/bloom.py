"""Partitioned Bloom filter (+ cuckoo fallback) for the URL-seen set.

The reference's seen-set is a Mongo unique index probed twice per
discovered link (``server.py:440-449``). At 10^10 URLs the engine's
ground truth is an anti-join against the ``enqueued`` keys table; the
Bloom filter is a *pre-filter* that lets definite-negatives (the vast
majority of links in steady state are new) skip the shuffle entirely.
Zero false negatives => correctness is untouched; false positives only
pay the anti-join they would have paid anyway.

Design (north rule, BASELINE.json:6):

- bits live in a numpy ``uint64`` array; membership/insert are fully
  vectorized (double hashing: idx_i = h1 + i*h2 mod m);
- **build is partitioned**: each Spark partition folds its ``url_hash``
  column into a local bitmap via ``mapInPandas``; bitmaps are OR-merged
  on the driver and broadcast (SURVEY.md §2.11). The wire cost is
  ``m/8`` bytes per partition — for 10^10 keys a single 12 GB filter
  is impossible, hence ``ShardedBloom``: keys shard by
  ``pmod(url_hash, n_shards)``, each shard sized for n/n_shards keys,
  and an executor task only faults in the shards its partition's keys
  hash to (in local mode all shards ride one broadcast).
- deletable entries (``cancelled`` URL re-admission) can't come out of a
  Bloom filter — ``CuckooFilter`` (bucketized cuckoo hashing, 2 buckets
  x 4 slots, 16-bit fingerprints) is the drop-in with ``delete``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — full-avalanche 64-bit mix, vectorized."""
    z = z.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(33)
    z *= np.uint64(0xFF51AFD7ED558CCD)
    z ^= z >> np.uint64(33)
    z *= np.uint64(0xC4CEB9FE1A85EC53)
    z ^= z >> np.uint64(33)
    return z


def _as_u64(h: pd.Series | np.ndarray) -> np.ndarray:
    a = np.asarray(h, dtype=np.int64)
    return a.view(np.uint64)


class NumpyBloom:
    """Vectorized Bloom filter over pre-hashed 64-bit keys."""

    def __init__(self, n_bits: int, n_hashes: int):
        # power-of-two bit count => mask instead of modulo
        self.n_bits = 1 << max(6, int(math.ceil(math.log2(max(n_bits, 64)))))
        self.k = n_hashes
        self.words = np.zeros(self.n_bits // 64, dtype=np.uint64)

    @classmethod
    def sized(cls, expected_n: int, fpp: float = 0.01) -> "NumpyBloom":
        n_bits = max(64, int(-expected_n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(math.log(2) * n_bits / max(expected_n, 1)))
        return cls(n_bits, k)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        # Kirsch-Mitzenmacher double hashing needs h1, h2 with independent
        # low bits (the power-of-two mask only reads low bits). Raw keys +
        # a multiply fail that — low bits of h*c depend only on low bits
        # of h — so run a splitmix64-style avalanche first.
        h1 = _mix64(h)
        h2 = _mix64(h + _GOLDEN) | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        mask = np.uint64(self.n_bits - 1)
        return (h1[None, :] + ks * h2[None, :]) & mask  # (k, n)

    def add(self, h) -> None:
        idx = self._indices(_as_u64(h)).ravel()
        np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63)))

    def contains(self, h) -> np.ndarray:
        u = _as_u64(h)
        idx = self._indices(u)
        word = self.words[(idx >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (idx & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0).astype(bool)

    def merge(self, other: "NumpyBloom") -> "NumpyBloom":
        assert self.n_bits == other.n_bits and self.k == other.k
        self.words |= other.words
        return self

    def set_indices(self, idx: np.ndarray) -> None:
        np.bitwise_or.at(
            self.words, (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63))
        )

    def indices_for(self, h) -> np.ndarray:
        """All k bit indices for the given hashes (the sparse partial)."""
        return self._indices(_as_u64(h)).ravel()

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int, k: int, writable: bool = True) -> "NumpyBloom":
        bf = cls(n_bits, k)
        arr = np.frombuffer(data, dtype=np.uint64)
        bf.words = arr.copy() if writable else arr  # read-only probes skip the copy
        return bf


def build_bloom(df: DataFrame, hash_col: str = "url_hash", expected_n: int | None = None, fpp: float = 0.01) -> NumpyBloom:
    """Partitioned build: one narrow pass over the table, no shuffle;
    per-partition partials (adaptive bitmap/indices) OR-merged on the
    driver."""
    if expected_n is None:
        expected_n = df.count()
    out = NumpyBloom.sized(max(expected_n, 1024), fpp)
    return add_df_to_bloom(out, df, hash_col)


def add_df_to_bloom(bloom: NumpyBloom, df: DataFrame, hash_col: str = "url_hash") -> NumpyBloom:
    """Fold a DataFrame's hashes into an existing filter *distributedly*
    — never collects raw keys (the 10^10-safe incremental path).

    Each partition ships the SMALLER of (a) its local OR'd bitmap
    (m/8 bytes) or (b) the sparse list of set bit-indices (8*k*rows
    bytes). Small round deltas therefore cost KBs of driver traffic, not
    partitions x full-bitmap — the adaptive trick that keeps per-round
    fixed cost flat."""
    n_bits, k = bloom.n_bits, bloom.k
    bitmap_bytes = n_bits // 8

    def per_partition(it):
        hashes = []
        for pdf in it:
            if len(pdf):
                hashes.append(np.asarray(pdf[hash_col], dtype=np.int64))
        if not hashes:
            return
        h = np.concatenate(hashes)
        if h.size * k * 8 < bitmap_bytes:
            proto = NumpyBloom(n_bits, k)
            idx = np.unique(proto.indices_for(h))
            yield pd.DataFrame({"mode": ["idx"], "payload": [idx.tobytes()]})
        else:
            part = NumpyBloom(n_bits, k)
            part.add(h)
            yield pd.DataFrame({"mode": ["bitmap"], "payload": [part.to_bytes()]})

    rows = df.select(hash_col).mapInPandas(per_partition, "mode string, payload binary").collect()
    for row in rows:
        if row["mode"] == "idx":
            bloom.set_indices(np.frombuffer(row["payload"], dtype=np.uint64))
        else:
            bloom.merge(NumpyBloom.from_bytes(row["payload"], n_bits, k))
    return bloom


def bloom_maybe_contains_udf(spark, bloom: NumpyBloom):
    """Broadcast the bitmap once; return a vectorized membership pandas UDF."""
    bc = spark.sparkContext.broadcast((bloom.to_bytes(), bloom.n_bits, bloom.k))

    @F.pandas_udf("boolean")
    def _maybe(h: pd.Series) -> pd.Series:
        data, n_bits, k = bc.value
        bf = NumpyBloom.from_bytes(data, n_bits, k, writable=False)  # zero-copy probe
        return pd.Series(bf.contains(h))

    return _maybe


def filter_maybe_contains_udf(spark, filt):
    """Generic membership probe for any filter with ``contains(int64[])``
    (NumpyBloom uses the specialized zero-copy path above; CuckooFilter
    broadcasts as a pickled object; ShardedBloom must go through
    ``sharded_probe_maybe`` instead — a monolithic broadcast of all
    shards is exactly what sharding exists to avoid)."""
    if isinstance(filt, NumpyBloom):
        return bloom_maybe_contains_udf(spark, filt)
    bc = spark.sparkContext.broadcast(filt)

    @F.pandas_udf("boolean")
    def _maybe(h: pd.Series) -> pd.Series:
        return pd.Series(bc.value.contains(np.asarray(h, dtype=np.int64)))

    return _maybe


def sharded_probe_maybe(
    spark,
    sb: "ShardedBloom",
    df: DataFrame,
    hash_col: str = "url_hash",
    out_broadcasts: list | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Shard-LOCAL membership probe — the 10^10 read path.

    Each shard's bitmap ships as its OWN broadcast; PySpark broadcasts
    fetch lazily on first ``.value`` access, so a task pulls only the
    shards whose keys land in its partition. The input is repartitioned
    by ``pmod(hash, m)`` where m is a MULTIPLE of n_shards (default: the
    session's shuffle partitions rounded up) — n_shards | m guarantees
    each pmod-group still addresses exactly one shard, so parallelism is
    not capped at n_shards while tasks keep seeing ~1 shard. This holds
    for NEGATIVE int64 hashes because ShardedBloom enforces power-of-two
    n_shards (so uint64(hash) % n_shards == pmod(hash, n_shards) ==
    pmod-group % n_shards); with an arbitrary n_shards the unsigned and
    signed mappings disagree by 2^64 mod n_shards and a group would mix
    two shards. (Locality note: ``repartition(m, col)`` hash-partitions
    the GROUP VALUE, so a task may still receive ~Poisson(1) groups —
    each group is whole and single-shard, bounding shards/task at a few.) At 10^10
    keys that is ~tens of MB of bits per task instead of the impossible
    12 GB all-shards broadcast. Returns ``df`` plus a ``_maybe`` boolean
    column. Cost: one extra (round-delta-sized) shuffle, traded for
    O(total-bits / n_shards) memory per task.

    The per-round broadcasts are appended to ``out_broadcasts`` when
    given — the caller MUST unpersist them once the probe's consumers
    are materialized, or a long crawl accumulates one bitmap set per
    round on the driver and executors.
    """
    import pyspark.sql.types as T

    bcs = [spark.sparkContext.broadcast(sh.to_bytes()) for sh in sb.shards]
    if out_broadcasts is not None:
        out_broadcasts.extend(bcs)
    n_bits, k, n_shards = sb.shards[0].n_bits, sb.shards[0].k, sb.n_shards
    if n_partitions is None:
        base = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        n_partitions = max(n_shards, ((base + n_shards - 1) // n_shards) * n_shards)

    def per_partition(it):
        loaded: dict[int, NumpyBloom] = {}
        for pdf in it:
            h = np.asarray(pdf[hash_col], dtype=np.int64)
            u = h.view(np.uint64)
            sid = (u % np.uint64(n_shards)).astype(np.int64)
            out = np.zeros(len(h), dtype=bool)
            for s in np.unique(sid):
                s = int(s)
                if s not in loaded:  # lazy fetch: only this task's shards
                    loaded[s] = NumpyBloom.from_bytes(bcs[s].value, n_bits, k, writable=False)
                m = sid == s
                out[m] = loaded[s].contains(h[m])
            pdf = pdf.copy()
            pdf["_maybe"] = out
            yield pdf

    out_schema = T.StructType(df.schema.fields + [T.StructField("_maybe", T.BooleanType())])
    part = df.repartition(n_partitions, F.pmod(F.col(hash_col), F.lit(n_partitions)))
    return part.mapInPandas(per_partition, out_schema)


def add_df_to_filter(filt, df: DataFrame, hash_col: str = "url_hash"):
    """Fold a DataFrame's hashes into a seen-filter.

    Bloom and ShardedBloom use mergeable per-partition partials
    (10^10-safe — driver traffic is bitmaps/sparse indices, never raw
    keys). Cuckoo tables don't merge (kick-out chains), so the cuckoo
    path ships raw hash arrays per partition to the driver — fine at the
    deletable-entry scale it exists for (cancelled-URL re-admission),
    documented as NOT the 10^10 path; the stream is drained through
    ``toLocalIterator`` in per-partition chunks so the driver never
    materializes the whole key set at once, and partitions are capped at
    ~1M keys each so no single chunk can OOM the driver either."""
    if isinstance(filt, NumpyBloom):
        return add_df_to_bloom(filt, df, hash_col)
    if isinstance(filt, ShardedBloom):
        return add_df_to_sharded(filt, df, hash_col)

    _CHUNK = 1 << 20  # keys per emitted row — bounds driver memory per chunk

    def per_partition(it):
        for pdf in it:
            h = np.asarray(pdf[hash_col], dtype=np.int64)
            for lo in range(0, len(h), _CHUNK):
                yield pd.DataFrame({"hashes": [h[lo : lo + _CHUNK].tobytes()]})

    rows = df.select(hash_col).mapInPandas(per_partition, "hashes binary")
    for row in rows.toLocalIterator():  # chunked fold — one partition in flight
        filt.insert(np.frombuffer(row["hashes"], dtype=np.int64))
    return filt


def add_df_to_sharded(sb: "ShardedBloom", df: DataFrame, hash_col: str = "url_hash") -> "ShardedBloom":
    """Distributed mergeable fold into a ShardedBloom — the 10^10 path.

    Each partition groups its keys by shard id and emits ONE adaptive
    partial per (shard, partition): the smaller of the shard's OR'd
    bitmap or the sparse set-bit index list. The driver merges per shard.
    On a real cluster this becomes a groupBy(shard) so each reducer
    builds exactly its own shard; in local mode the driver-side merge is
    the same O(bits) work without the extra shuffle."""
    n_shards = sb.n_shards
    n_bits, k = sb.shards[0].n_bits, sb.shards[0].k
    bitmap_bytes = n_bits // 8

    def per_partition(it):
        hashes = []
        for pdf in it:
            if len(pdf):
                hashes.append(np.asarray(pdf[hash_col], dtype=np.int64))
        if not hashes:
            return
        u = np.concatenate(hashes).view(np.uint64)
        sid = (u % np.uint64(n_shards)).astype(np.int64)
        out_shard, out_mode, out_payload = [], [], []
        for s in np.unique(sid):
            h = u[sid == s].view(np.int64)
            if h.size * k * 8 < bitmap_bytes:
                proto = NumpyBloom(n_bits, k)
                idx = np.unique(proto.indices_for(h))
                out_shard.append(int(s)); out_mode.append("idx"); out_payload.append(idx.tobytes())
            else:
                part = NumpyBloom(n_bits, k)
                part.add(h)
                out_shard.append(int(s)); out_mode.append("bitmap"); out_payload.append(part.to_bytes())
        yield pd.DataFrame({"shard": out_shard, "mode": out_mode, "payload": out_payload})

    rows = df.select(hash_col).mapInPandas(per_partition, "shard int, mode string, payload binary")
    for row in rows.toLocalIterator():
        shard = sb.shards[row["shard"]]
        if row["mode"] == "idx":
            shard.set_indices(np.frombuffer(row["payload"], dtype=np.uint64))
        else:
            shard.merge(NumpyBloom.from_bytes(row["payload"], n_bits, k))
    return sb


class ShardedBloom:
    """Bloom bits sharded by ``pmod(hash, n_shards)`` — the 10^10 design.

    Each shard is an independent NumpyBloom sized for n/n_shards keys, so
    no single broadcast exceeds executor memory; on a real cluster shards
    are distributed via a keyed table and each task loads only the shards
    its partition addresses (shard id == pmod of the shuffle key => one
    shard per task). Local mode carries all shards in one broadcast.
    """

    def __init__(self, n_shards: int, expected_n: int, fpp: float = 0.01):
        # POWER OF TWO required: the per-row shard id is uint64(hash) %
        # n_shards while sharded_probe_maybe partitions rows by signed
        # pmod(hash, m). For negative int64 hashes the two mappings agree
        # only when n_shards divides 2^64 — i.e. n_shards is a power of
        # two — otherwise a pmod-group mixes two shards and the
        # one-shard-per-task locality guarantee silently degrades.
        if n_shards < 1 or (n_shards & (n_shards - 1)):
            raise ValueError(
                f"ShardedBloom: n_shards must be a power of two (got {n_shards}); "
                "signed-pmod partitioning and the unsigned per-row shard id only "
                "address the same shard per group when n_shards divides 2^64"
            )
        self.n_shards = n_shards
        per = max(1024, expected_n // n_shards)
        self.shards = [NumpyBloom.sized(per, fpp) for _ in range(n_shards)]

    def _shard_of(self, u: np.ndarray) -> np.ndarray:
        return (u % np.uint64(self.n_shards)).astype(np.int64)

    def add(self, h) -> None:
        u = _as_u64(h)
        sid = self._shard_of(u)
        for s in np.unique(sid):
            self.shards[int(s)].add(u[sid == s].view(np.int64))

    # generic-filter interface parity: the engine's fold path calls
    # insert(); for a sharded bloom that's just add (no kick-out chains)
    insert = add

    def contains(self, h) -> np.ndarray:
        u = _as_u64(h)
        sid = self._shard_of(u)
        out = np.zeros(len(u), dtype=bool)
        for s in np.unique(sid):
            m = sid == s
            out[m] = self.shards[int(s)].contains(u[m].view(np.int64))
        return out


class CuckooFilter:
    """Bucketized cuckoo filter with deletion (4-slot buckets, 16-bit fp).

    Used where Bloom can't go: the ``cancelled -> re-admissible`` path
    (app.py:611-633 stop-crawl analog) needs membership *removal*.
    Pure numpy; vectorized lookups, per-key kickout loop on insert.

    Unlike a Bloom filter, a cuckoo table CAN produce false negatives:
    (a) a full table drops keys on failed insert; (b) ``delete`` may
    evict a colliding 16-bit fingerprint belonging to a *different* key.
    Either event sets ``degraded`` — the engine then stops trusting
    "definitely new" answers and routes every link through the
    ground-truth anti-join (plans/round.py), so a degraded filter costs
    performance, never correctness.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = 1 << max(4, int(math.ceil(math.log2(max(capacity, 16) / self.SLOTS / 0.84))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)  # 0 = empty
        self.degraded = False  # True once false negatives are possible

    def _fp(self, u: np.ndarray) -> np.ndarray:
        fp = ((_mix64(u) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, u: np.ndarray) -> np.ndarray:
        return (_mix64(u) & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        fh = fp.astype(np.uint64) * _GOLDEN
        return ((i1.astype(np.uint64) ^ fh) & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def insert(self, h) -> bool:
        u = _as_u64(h)
        fps, i1s = self._fp(u), self._i1(u)
        i2s = self._i2(i1s, fps)
        ok = True
        rng = np.random.RandomState(0xC0FFEE)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            if not self._insert_one(int(fp), int(i1), int(i2), rng):
                ok = False
        if not ok:
            # overflow dropped keys => membership may now false-negative;
            # flag it so probes degrade to "always maybe" downstream
            self.degraded = True
        return ok

    def _insert_one(self, fp: int, i1: int, i2: int, rng) -> bool:
        for i in (i1, i2):
            empt = np.where(self.table[i] == 0)[0]
            if len(empt):
                self.table[i, empt[0]] = fp
                return True
        i = i1 if rng.rand() < 0.5 else i2
        for _ in range(self.MAX_KICKS):
            s = rng.randint(self.SLOTS)
            fp, self.table[i, s] = int(self.table[i, s]), fp
            i = int(self._i2(np.array([i]), np.array([fp], dtype=np.uint16))[0])
            empt = np.where(self.table[i] == 0)[0]
            if len(empt):
                self.table[i, empt[0]] = fp
                return True
        return False

    def contains(self, h) -> np.ndarray:
        u = _as_u64(h)
        fps, i1s = self._fp(u), self._i1(u)
        i2s = self._i2(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, h) -> np.ndarray:
        u = _as_u64(h)
        fps, i1s = self._fp(u), self._i1(u)
        i2s = self._i2(i1s, fps)
        removed = np.zeros(len(u), dtype=bool)
        for j, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            for i in (int(i1), int(i2)):
                slot = np.where(self.table[i] == fp)[0]
                if len(slot):
                    self.table[i, slot[0]] = 0
                    removed[j] = True
                    break
        if removed.any():
            # a removed fingerprint may have belonged to a DIFFERENT key
            # (16-bit collision) — that key would now false-negative
            self.degraded = True
        return removed
