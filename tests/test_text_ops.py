"""Model-based checks for the text/patch operators added on top of the
fixture-parity gate: a pure-Python reimplementation of each algorithm
runs against Spark's HOF expressions on randomized inputs (seeded —
deterministic failures), all cases in ONE Spark job per test.
"""

from __future__ import annotations

import random
import string

import numpy as np
from pyspark.sql import functions as F

from ome_arrow_spark.functions import text as TX

SEED = 20260813


def _rand_texts(n=25, alphabet=string.ascii_lowercase + "  .,!'", lo=0, hi=200):
    rng = random.Random(SEED)
    out = []
    for _ in range(n):
        k = rng.randint(lo, hi)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    # edge cases
    out += ["", "a" * 7, "a" * 11, "abcdefgh", "x y " * 40, "the the the"]
    return out


def _py_winnow(text: str, k=TX.KGRAM_K, w=TX.WINNOW_W, base=257, mod=2147483647):
    if len(text) < k:
        return []
    hs = []
    for i in range(len(text) - k + 1):
        h = ord(text[i]) % mod
        for j in range(1, k):
            h = (h * base + ord(text[i + j])) % mod
        hs.append(h)
    wins = [min(hs[t : t + w]) for t in range(len(hs) - w + 1)]
    seen = set()
    out = []
    for v in wins:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def test_winnow_fingerprints_match_python_model(spark):
    texts = [t for t in _rand_texts() if len(t) >= TX.KGRAM_K + TX.WINNOW_W - 1]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select("i", TX.winnow_fingerprints("text").alias("fps")).collect()
    got = {r["i"]: sorted(r["fps"]) for r in rows}
    for i, t in enumerate(texts):
        assert got[i] == sorted(_py_winnow(t)), f"case {i}: {t!r}"


def test_max_run_length_matches_python_model(spark):
    rng = random.Random(SEED)
    arrs = [
        sorted(rng.choice("abcde") for _ in range(rng.randint(2, 60)))
        for _ in range(30)
    ]
    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrs)], "i long, arr array<string>")
    rows = df.select(
        "i", TX.max_run_length(F.col("arr")).alias("mr")
    ).collect()
    got = {r["i"]: r["mr"] for r in rows}
    for i, a in enumerate(arrs):
        best = max(a.count(x) for x in set(a))
        assert got[i] == best, f"case {i}: {a}"


def test_bigrams_match_python_model(spark):
    rng = random.Random(SEED)
    arrs = [
        [rng.choice(["aa", "bb", "cc"]) for _ in range(rng.randint(2, 12))]
        for _ in range(20)
    ]
    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrs)], "i long, arr array<string>")
    rows = df.select("i", TX.bigrams(F.col("arr")).alias("bg")).collect()
    got = {r["i"]: r["bg"] for r in rows}
    for i, a in enumerate(arrs):
        expect = [f"{a[j]} {a[j+1]}" for j in range(len(a) - 1)]
        assert got[i] == expect


def test_extract_patches_match_numpy_model(spark):
    """Patch tiles must equal numpy 2D slicing of the same plane."""
    from ome_arrow_spark import synth
    from ome_arrow_spark.operators.view_ops import extract_patches

    imgs = synth.golden_images_df(
        spark, ids=["nviz-2ch-stack"], include_conftest=False
    )
    # 128×128 plane, 64-patches → 2×2 grid per plane
    patches = extract_patches(imgs, patch=64)
    rows = patches.collect()
    assert len(rows) == 2 * 22 * 4  # C=2, Z=22, 4 tiles
    for r in rows[:40]:
        plane = synth.pixel_plane(r["t"], r["c"], r["z"], 128, 128).reshape(128, 128)
        tile = plane[
            r["gy"] * 64 : (r["gy"] + 1) * 64, r["gx"] * 64 : (r["gx"] + 1) * 64
        ]
        assert list(r["patch_pixels"]) == tile.ravel().tolist()


def test_focus_metric_matches_numpy_model(spark):
    from ome_arrow_spark import synth
    from ome_arrow_spark.operators.view_ops import focus_metric

    imgs = synth.golden_images_df(spark, ids=["z-series"], include_conftest=False)
    rows = focus_metric(imgs).collect()
    assert len(rows) == 5
    for r in rows:
        plane = synth.pixel_plane(r["t"], r["c"], r["z"], 167, 439).reshape(167, 439).astype(np.int64)
        d = np.diff(plane, axis=1)
        assert r["focus"] == int((d * d).sum())
