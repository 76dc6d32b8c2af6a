"""Exhaustive-grid semantics tests for the expression library.

Each test generates a large case grid driver-side, evaluates the Column
expression in ONE Spark pass, and compares against a plain-Python model of
the reference semantics (youtube_api_handler.py helpers). This pins the
expression semantics far beyond the reference's smoke-only test suite
(SURVEY.md §5) without per-example Spark round-trips.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.functions.text import (
    classify_video_type,
    extract_video_id,
    iso8601_duration_seconds,
    normalize_handle,
)


def _eval(spark, cases, expr_builder, out_type="string"):
    df = spark.createDataFrame([(c,) for c in cases], ["x"])
    rows = (
        df.select("x", expr_builder(F.col("x")).alias("y"))
        .collect()
    )
    return {r["x"]: r["y"] for r in rows}


def test_iso8601_duration_grid(spark):
    """Every D/H/M/S presence combination × boundary values, in one pass."""
    cases = {}
    for d in (None, 0, 1, 3):
        for h in (None, 0, 2, 23, 30):
            for m in (None, 0, 1, 59, 90):
                for s in (None, 0, 9, 59, 61):
                    if d is None and h is None and m is None and s is None:
                        continue
                    t = "".join(
                        f"{v}{u}" for v, u in ((h, "H"), (m, "M"), (s, "S"))
                        if v is not None
                    )
                    text = "P" + (f"{d}D" if d is not None else "") + (
                        f"T{t}" if t else ""
                    )
                    expected = (
                        (d or 0) * 86400
                        + (h or 0) * 3600
                        + (m or 0) * 60
                        + (s or 0)
                    )
                    cases[text] = expected
    got = _eval(spark, list(cases), iso8601_duration_seconds)
    bad = {k: (got[k], v) for k, v in cases.items() if got[k] != v}
    assert not bad, f"mismatches (got, want): {bad}"


def test_normalize_handle_grid(spark):
    """0–3 leading '@', inner '@', dots/digits/case — matches lstrip('@')
    then '@'-prefix (youtube_api_handler.py:437-441)."""
    bases = ["ch1", "Name.Tag", "a@b", "UPPER", "x_9-z", "@", ""]
    cases = [p + b for b in bases for p in ("", "@", "@@", "@@@")]
    got = _eval(spark, cases, normalize_handle)
    for c in cases:
        want = "@" + c.lstrip("@")
        assert got[c] == want, f"{c!r}: got {got[c]!r} want {want!r}"


def test_extract_video_id_grid(spark):
    """Both URL shapes × query-string suffixes (youtube_api_handler.py:
    810-815)."""
    vids = ["dQw4w9WgXcQ", "a-b_c123", "X"]
    cases = {}
    for v in vids:
        for tpl, ok in (
            ("https://www.youtube.com/watch?v={v}", True),
            ("https://www.youtube.com/watch?v={v}&t=10s", True),
            ("https://youtube.com/shorts/{v}", True),
            ("https://youtube.com/shorts/{v}?feature=share", True),
            ("https://example.com/x/{v}", False),
        ):
            cases[tpl.format(v=v)] = v if ok else ""
    got = _eval(spark, list(cases), extract_video_id)
    for url, want in cases.items():
        assert (got[url] or "") == want, f"{url}: got {got[url]!r} want {want!r}"


def test_classify_video_type_grid(spark):
    """'/shorts/' beats '/watch?v=' order-independently; unknown otherwise
    (youtube_api_handler.py:879-889)."""
    cases = {
        "https://youtube.com/shorts/abc": "shorts",
        "https://youtube.com/watch?v=abc": "long",
        "https://youtube.com/watch?v=abc&next=/shorts/zzz": "shorts",
        "https://example.com/": "unknown",
        "": "unknown",
    }
    got = _eval(spark, list(cases), classify_video_type)
    for url, want in cases.items():
        assert got[url] == want, f"{url}: got {got[url]!r} want {want!r}"
