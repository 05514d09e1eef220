"""Perceptual-hash near-dup: band recall vs brute force, exact hamming,
verified-pair components, synth-images e2e."""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql.types import LongType, StringType, StructField, StructType

from scrapy_spark.operators.imageops import (
    phash_components,
    phash_neardup_pairs,
)

MASK = (1 << 64) - 1


def _signed(v: int) -> int:
    v &= MASK
    return v - (1 << 64) if v >= 1 << 63 else v


def _h64(tag: str) -> int:
    return _signed(int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "big"))


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & MASK).count("1")


def _flip(v: int, *bits: int) -> int:
    for b in bits:
        v = _signed(v ^ (1 << b))
    return v


SCHEMA = StructType(
    [StructField("image_id", StringType()), StructField("phash", LongType())]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_pairs_match_bruteforce(spark):
    """Operator output == O(n^2) python twin on a corpus with planted
    near-dups at hamming 1, 2, 3 (kept) and 4 (dropped by the exact
    filter), including flips in the sign bit (63) and across band
    boundaries (15/16, 47/48)."""
    rows = [(f"bg{i}", _h64(f"bg{i}")) for i in range(40)]
    base = _h64("dup-base")
    rows += [
        ("d0", base),
        ("d1", _flip(base, 63)),              # sign-bit flip, hamming 1
        ("d2", _flip(base, 15, 16)),          # band-boundary, hamming 2
        ("d3", _flip(base, 0, 31, 47)),       # three bands touched, hamming 3
        ("d4", _flip(base, 1, 17, 33, 49)),   # all four bands, hamming 4 -> out
    ]
    got = {
        (r["image_a"], r["image_b"]): r["hamming"]
        for r in phash_neardup_pairs(_df(spark, rows), max_hamming=3).collect()
    }
    want = {}
    for i, (ia, pa) in enumerate(rows):
        for ib, pb in rows[i + 1 :]:
            a, b = sorted((ia, ib))
            pa2, pb2 = (pa, pb) if (a, b) == (ia, ib) else (pb, pa)
            h = _hamming(pa2, pb2)
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    assert ("d0", "d3") in got and got[("d0", "d3")] == 3
    assert all("d4" not in k for k in got)  # hamming 4 never survives


def test_pigeonhole_recall_is_complete(spark):
    """Every hamming<=3 pair is found no matter WHERE the flipped bits sit:
    sweep single/double/triple flips across all band positions."""
    base = _h64("recall-base")
    rows = [("base", base)]
    expect = set()
    for bits in [(0,), (16,), (32,), (48,), (63,), (5, 21), (37, 53),
                 (15, 16, 17), (0, 63, 32), (47, 48, 49)]:
        iid = "f" + "_".join(map(str, bits))
        rows.append((iid, _flip(base, *bits)))
        expect.add(tuple(sorted(("base", iid))))
    got = {
        (r["image_a"], r["image_b"])
        for r in phash_neardup_pairs(_df(spark, rows), max_hamming=3).collect()
    }
    assert expect <= got  # complete recall for radius < n_bands


def test_components_chain_and_singleton(spark):
    """A~B and B~C are pairs but A and C are NOT (hamming 4): components
    still merge the chain; D is a singleton via all_ids."""
    a = _h64("chain")
    b = _flip(a, 3, 20)          # hamming(a,b)=2
    c = _flip(b, 40, 60)         # hamming(b,c)=2, hamming(a,c)=4
    rows = [("ia", a), ("ib", b), ("ic", c), ("id", _h64("lone"))]
    df = _df(spark, rows)
    pairs = phash_neardup_pairs(df, max_hamming=3)
    got_pairs = {(r["image_a"], r["image_b"]) for r in pairs.collect()}
    assert got_pairs == {("ia", "ib"), ("ib", "ic")}
    comp = {
        r["image_id"]: r["component_id"]
        for r in phash_components(pairs, all_ids=df).collect()
    }
    assert comp["ia"] == comp["ib"] == comp["ic"] == "ia"  # min label
    assert comp["id"] == "id"  # singleton keeps its own id


def test_synth_images_e2e(spark, tmp_path):
    """Over the real synth images table (input_hint shape): random phashes
    produce no accidental pairs, and a planted 1-bit near-dup of a real
    image is found with hamming 1."""
    from scrapy_spark.sources import synth
    from scrapy_spark.sources.synth import SynthConfig

    paths = synth.generate(SynthConfig(seed=5, n_hosts=4, n_pages=40,
                                       n_images=25), str(tmp_path))
    images = spark.read.parquet(paths["images"]).select("image_id", "phash")
    assert phash_neardup_pairs(images, max_hamming=3).count() == 0
    first = images.orderBy("image_id").first()
    planted = images.unionByName(
        _df(spark, [("zz-neardup", _flip(first["phash"], 42))])
    )
    got = phash_neardup_pairs(planted, max_hamming=3).collect()
    assert len(got) == 1
    assert got[0]["image_a"] == first["image_id"]
    assert got[0]["image_b"] == "zz-neardup" and got[0]["hamming"] == 1


def test_hot_band_cap_bounds_candidates(spark):
    """max_band_freq drops a hot band bucket before the self-join: 30
    images sharing band 0 (low 16 bits) but hamming-distant elsewhere
    produce 435 candidate pairs uncapped and ZERO with the cap (no other
    band agrees); a genuine near-dup pair still survives via its other
    shared bands."""
    lo = 0x1234
    rows = []
    for i in range(30):
        # same low band, distinct random high 48 bits
        hi = _h64(f"hot{i}") & ~MASK | (_h64(f"hot{i}") & ((1 << 48) - 1) << 16)
        rows.append((f"h{i:02d}", _signed((hi & ~0xFFFF) | lo)))
    base = _h64("pair-base")
    rows += [("pa", base), ("pb", _flip(base, 2))]  # share bands 1,2,3
    df = _df(spark, rows)
    uncapped = phash_neardup_pairs(df, max_hamming=3)
    capped = phash_neardup_pairs(df, max_hamming=3, max_band_freq=10)
    got_capped = {(r["image_a"], r["image_b"]) for r in capped.collect()}
    # the hot-band images are pairwise hamming-distant -> the exact filter
    # already rejects them, but the cap removes them BEFORE the join:
    assert ("pa", "pb") in got_capped  # survives via bands 1..3
    assert {(r["image_a"], r["image_b"]) for r in uncapped.collect()} == got_capped


def test_imagedup_cli_images_mode(spark, tmp_path, capsys):
    """main.py imagedup --images: the CLI surface end-to-end on an
    input_hint-shaped parquet with a planted near-dup; JSON line parsed."""
    import json

    from main import main as cli_main

    base = _h64("cli-base")
    pdf = pd.DataFrame(
        {
            "image_id": ["a", "b", "c", "d"],
            "phash": [base, _flip(base, 7), _h64("cli-x"), _h64("cli-y")],
        }
    )
    path = str(tmp_path / "images.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    rc = cli_main(["imagedup", "--images", path])
    out = capsys.readouterr().out
    assert rc in (0, None)
    stats = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert stats == {
        "images": 4,
        "neardup_pairs": 1,
        "multi_image_clusters": 1,
        "max_hamming": 3,
    }
    # the guard: out-of-range radius fails fast with rc 2
    assert cli_main(["imagedup", "--images", path, "--max-hamming", "9"]) == 2
