"""Round-14 additions: the BMP codec round-trip (second real byte-level
codec, pairing mm_decode_ppm — VERDICT r13 #7)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST
from tests.harness import compare


def _expected(text):
    """Independent recompute of the mm_decode_bmp contract (mirrors the
    DuckDB oracle, not the encoder: dims from byte length, weighted
    checksum over the first min(n, 3wh) real UTF-8 bytes)."""
    if text is None:
        return (None, None, None, None, None, None)
    tb = text.encode("utf-8")
    n = len(tb)
    w, h = 5 + n % 7, 4 + (n // 7) % 6
    stride = (w * 3 + 3) // 4 * 4
    lim = min(n, w * h * 3)
    wsum = sum((i + 1) * tb[i] for i in range(lim)) % 65536
    return (w, h, stride, 54 + stride * h, True, wsum)


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


CASES = [
    (1, ""),                      # 0 bytes: all-zero-pad image, wsum 0
    (2, "a"),                     # single byte
    (3, "héllo wörld"),           # multi-byte UTF-8 (per-BYTE weights)
    (4, "x" * 23),                # stride padding: w=5+23%7=7, 3w=21 -> pad 3
    (5, "y" * 500),               # longer than 3wh: truncation branch
    (6, None),                    # NULL text -> NULL metrics
    (7, "z" * 64),                # n%7==1 -> w=6, 3w=18 -> pad 2
]


def test_bmp_round_trip_matches_independent_contract(spark, tmp_path):
    from databricks_feature_store_poc_spark.llm.multimodal import (
        mm_decode_bmp,
    )

    sf = _write_documents(spark, tmp_path, CASES)
    out = {r["doc_id"]: r for r in mm_decode_bmp(spark, sf).collect()}
    assert len(out) == len(CASES)
    for doc_id, text in CASES:
        w, h, stride, nbytes, consistent, wsum = _expected(text)
        r = out[doc_id]
        got = (
            r["width"], r["height"], r["row_stride"], r["n_file_bytes"],
            r["header_consistent"], r["pixel_checksum_weighted"],
        )
        assert got == (w, h, stride, nbytes, consistent, wsum), (
            f"doc {doc_id!r} text {text!r}: {got}"
        )


def test_bmp_weighted_checksum_is_row_order_sensitive():
    """The reason the checksum is weighted: reading the stored
    (bottom-up) rows WITHOUT reversing must change the value whenever
    the image has >1 distinct row — the defect class an unweighted sum
    is blind to."""
    text = "abcdefghijklmnopqrstuvwxyz0123456789" * 4  # n=144: w=5,h=4
    tb = text.encode()
    n = len(tb)
    w, h = 5 + n % 7, 4 + (n // 7) % 6
    logical = tb[: w * h * 3].ljust(w * h * 3, b"\x00")
    row = w * 3
    rows = [logical[r * row:(r + 1) * row] for r in range(h)]
    top_down = b"".join(rows)
    bottom_up = b"".join(reversed(rows))
    wsum = lambda bs: sum((i + 1) * b for i, b in enumerate(bs)) % 65536
    assert wsum(top_down) != wsum(bottom_up)
    assert sum(top_down) == sum(bottom_up)  # the unweighted sum can't see it


@pytest.mark.parametrize("name", ["mm_decode_bmp"])
def test_oracle_match_r14(name, spark):
    r = compare(name, spark, SF_TEST, verbose=False)
    assert r["ok"], f"{name}: {r.get('issues')}"
