"""Partitioned Bloom + exact-table URL-seen kernel (D1, SURVEY §2.3).

The reference's seen-set is an atomic check-insert on a SQLite hash PK
(``url_deduplication.py:91-129`` add_if_new). At 10^10 URLs neither SQLite
nor a single Bloom filter fits; the mandated rebuild design (BASELINE.json,
SURVEY §7.3.6) is two-tier and *partitioned*:

1. **Bloom tier** — one filter per hash shard (``pmod(url_hash, N_SHARDS)``),
   stored as binary rows in a ``bloom`` table, appended per generation and
   OR-merged at read. A Bloom "no" is definitive (no false negatives), so
   most candidates skip the exact join entirely; only "maybe" rows proceed.
2. **Exact tier** — left_anti join against the ``url_seen`` table, which is
   laid out cuckoo-style: bucketed by the same shard key so each membership
   probe touches exactly one bucket (a storage-partitioned join on a real
   cluster; deletes = bucket-local rewrites).

Positions are derived from the already-computed xxhash64 key with a
splitmix64 remix — vectorized in numpy over Arrow batches (no per-row Python
hashing).

Sizing at the 10^10 design point: N_SHARDS scales to ~2^16 shards × 2^27 bits
(16 MiB) per shard ≈ 1 false positive in ~2^10 per probe at 10 bits/key —
each executor holds only the shards of its buckets. Here N_SHARDS=64 keeps
tests fast; the layout is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import SnapshotCatalog

N_SHARDS = 64
M_BITS = 1 << 17  # bits per shard filter (tunable; 16 KiB each)
K_HASHES = 5

_SPLITMIX = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _positions(hashes: np.ndarray) -> np.ndarray:
    """(n,) int64 xxhash keys -> (K_HASHES, n) uint64 bit positions."""
    x = hashes.astype(np.uint64)
    out = np.empty((K_HASHES, x.shape[0]), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(K_HASHES):
            z = x + np.uint64(i + 1) * _SPLITMIX
            z = (z ^ (z >> np.uint64(30))) * _MIX1
            z = (z ^ (z >> np.uint64(27))) * _MIX2
            z = z ^ (z >> np.uint64(31))
            out[i] = z % np.uint64(M_BITS)
    return out


def _build_bitmap(hashes: np.ndarray) -> bytes:
    words = np.zeros(M_BITS // 64, dtype=np.uint64)
    pos = _positions(hashes)
    np.bitwise_or.at(words, (pos // 64).ravel(), np.uint64(1) << (pos % np.uint64(64)).ravel())
    return words.tobytes()


def _check_bitmap(words: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """True where ALL k bits set (maybe-seen); False = definitely new."""
    pos = _positions(hashes)
    hit = (words[pos // 64] >> (pos % np.uint64(64))) & np.uint64(1)
    return hit.all(axis=0).astype(bool)


def stage_bloom_delta(
    spark: SparkSession, catalog: SnapshotCatalog, selected: DataFrame, gen: int
) -> list[str]:
    """Build per-shard Bloom rows for this generation's newly-seen keys."""

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        return pd.DataFrame(
            [{"shard": shard, "bits": _build_bitmap(pdf["url_hash"].to_numpy(np.int64))}]
        )

    delta = (
        selected.select(
            "url_hash", F.pmod(F.col("url_hash"), F.lit(N_SHARDS)).alias("shard")
        )
        .groupBy("shard")
        .applyInPandas(per_shard, schema="shard int, bits binary")
    )
    return catalog.stage(delta, "bloom", gen)


def _merged_blooms(spark: SparkSession, catalog: SnapshotCatalog) -> dict[int, np.ndarray] | None:
    """OR-merge all committed per-generation shard filters (driver-side; the
    table is N_SHARDS × n_generations small binary rows)."""
    df = catalog.read(spark, "bloom")
    if df is None:
        return None
    merged: dict[int, np.ndarray] = {}
    for row in df.collect():
        w = np.frombuffer(row["bits"], dtype=np.uint64)
        if row["shard"] in merged:
            merged[row["shard"]] = merged[row["shard"]] | w
        else:
            merged[row["shard"]] = w.copy()
    return merged


def bloom_anti_join(
    spark: SparkSession,
    cands: DataFrame,
    seen: DataFrame,
    catalog: SnapshotCatalog,
) -> DataFrame:
    """candidates − seen, Bloom-prefiltered: only maybe-seen rows hit the
    exact anti-join; Bloom-negative rows pass straight through."""
    merged = _merged_blooms(spark, catalog)
    if merged is None:
        return cands.join(seen.select("url_hash"), "url_hash", "left_anti")
    bc = spark.sparkContext.broadcast({k: v.tobytes() for k, v in merged.items()})
    cols = cands.columns

    def flag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        filters = {k: np.frombuffer(v, dtype=np.uint64) for k, v in bc.value.items()}
        empty = np.zeros(M_BITS // 64, dtype=np.uint64)
        for pdf in batches:
            if pdf.empty:
                continue
            h = pdf["url_hash"].to_numpy(np.int64)
            shards = np.mod(h, N_SHARDS)
            maybe = np.zeros(len(pdf), dtype=bool)
            for s in np.unique(shards):
                m = shards == s
                maybe[m] = _check_bitmap(filters.get(int(s), empty), h[m])
            yield pdf.assign(_maybe=maybe)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in cands.schema.fields)
    flagged = cands.mapInPandas(flag, schema=schema + ", _maybe boolean")
    definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = (
        flagged.filter(F.col("_maybe"))
        .drop("_maybe")
        .join(seen.select("url_hash"), "url_hash", "left_anti")
    )
    return definite_new.select(cols).unionByName(maybe.select(cols))
