"""Round-15 additions: the PNG codec (fourth real byte-level codec —
VERDICT r14 #5: a genuinely COMPRESSED format, third-party-free), the
BFS per-hop checkpoint fix, and the zipf DECIMAL(38,0) slope columns."""

from __future__ import annotations

import struct
import zlib

import pandas as pd
import pytest

from tests.conftest import SF_TEST
from tests.harness import compare


# --- mm_decode_png: contract recompute (mirrors the DuckDB oracle) ----------


def _expected_png(text):
    if text is None:
        return (None, None, None, None, None, None)
    tb = text.encode("utf-8")
    n = len(tb)
    w, h = 4 + n % 8, 3 + (n // 5) % 7
    m = h * (1 + 3 * w)
    lim = min(n, w * h * 3)
    wsum = sum((i + 1) * tb[i] for i in range(lim)) % 65536
    return (w, h, 68 + m, min(h, 5), True, wsum)


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


PNG_CASES = [
    (1, ""),             # 0 bytes: w=4 h=3, all-zero image, wsum 0
    (2, "a"),            # single byte
    (3, "héllo wörld"),  # multi-byte UTF-8 (per-BYTE weights)
    (4, "q" * 12),       # w=8, h=5 -> all 5 filter types exercised
    (5, "z" * 500),      # longer than 3wh: truncation branch
    (6, None),           # NULL text -> all-NULL metrics
    (7, "The quick brown fox jumps over the lazy dog." * 3),
]


def test_png_round_trip_matches_contract(spark, tmp_path):
    from databricks_feature_store_poc_spark.llm.multimodal import (
        mm_decode_png,
    )

    sf = _write_documents(spark, tmp_path, PNG_CASES)
    got = {r["doc_id"]: r for r in mm_decode_png(spark, sf).collect()}
    assert len(got) == len(PNG_CASES)
    for doc_id, text in PNG_CASES:
        w, h, nb, fu, hc, ws = _expected_png(text)
        r = got[doc_id]
        assert (
            r["width"], r["height"], r["n_file_bytes"], r["filters_used"],
            r["header_consistent"], r["pixel_checksum_weighted"],
        ) == (w, h, nb, fu, hc, ws), f"doc {doc_id}"


def _ref_png(pixels: bytes, w: int, h: int, *, level: int = 9,
             filters=None, split_idat: int = 1) -> bytes:
    """Independent PNG writer (test-only): arbitrary zlib level, filter
    plan, and IDAT splitting — none of which the engine's level-0
    single-IDAT encoder produces, so a pass pins the DECODER's
    generality rather than a shared encode/decode bug."""
    row = w * 3
    assert len(pixels) == row * h
    filters = filters or [0] * h

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    prior = bytes(row)
    out = bytearray()
    for r in range(h):
        raw = pixels[r * row:(r + 1) * row]
        ft = filters[r]
        out.append(ft)
        for i in range(row):
            left = raw[i - 3] if i >= 3 else 0
            pleft = prior[i - 3] if i >= 3 else 0
            pred = {0: 0, 1: left, 2: prior[i],
                    3: (left + prior[i]) >> 1,
                    4: paeth(left, prior[i], pleft)}[ft]
            out.append((raw[i] - pred) & 0xFF)
        prior = raw
    idat = zlib.compress(bytes(out), level)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    )
    step = max(1, -(-len(idat) // split_idat))
    for i in range(0, len(idat), step):
        png += chunk(b"IDAT", idat[i:i + step])
    return png + chunk(b"IEND", b"")


def _decode_foreign(payload: bytes) -> tuple:
    """Drive the engine's decode stage (the exact mapInPandas kernel)
    with a foreign payload, driver-side."""
    from databricks_feature_store_poc_spark.llm.multimodal import (
        _make_png_decoder,
    )

    batches = iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])
    out = next(_make_png_decoder()(batches))
    r = out.iloc[0]

    def v(x):
        return None if pd.isna(x) else (
            bool(x) if isinstance(x, (bool,)) else int(x)
        )

    return (
        v(r["width"]), v(r["height"]), v(r["n_file_bytes"]),
        v(r["filters_used"]),
        None if pd.isna(r["header_consistent"])
        else bool(r["header_consistent"]),
        v(r["pixel_checksum_weighted"]),
    )


@pytest.mark.parametrize(
    "level,filters,split",
    [
        (9, [4, 4, 4, 4], 1),   # best compression, all-Paeth
        (6, [3, 3, 3, 3], 3),   # split IDATs, all-Average
        (1, [0, 1, 2, 4], 2),   # mixed filter plan, 2 IDATs
    ],
)
def test_png_decoder_general(level, filters, split):
    """The decoder must handle real-world PNGs the engine's fixtures
    never produce: high zlib levels, split IDATs, arbitrary filter
    plans. The reconstructed weighted checksum must match the known
    pixel stream exactly."""
    w, h = 6, 4
    pixels = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
    payload = _ref_png(pixels, w, h, level=level,
                       filters=filters, split_idat=split)
    want_sum = sum((i + 1) * pixels[i] for i in range(len(pixels))) % 65536
    got = _decode_foreign(payload)
    assert got == (
        w, h, len(payload), len(set(filters)), True, want_sum
    ), (level, filters, split)


def test_png_corruption_detected():
    """A stale CRC (flipped IHDR byte) must drop header_consistent; a
    corrupted IDAT byte must yield a diagnostic row (inflate/adler32
    failure), never a crash."""
    w, h = 5, 3
    pixels = bytes(range(45))
    good = _ref_png(pixels, w, h)
    bad_hdr = bytearray(good)
    bad_hdr[16] ^= 0x01  # width low byte; chunk CRC now stale
    got = _decode_foreign(bytes(bad_hdr))
    assert got[4] in (False, None)
    bad_idat = bytearray(good)
    bad_idat[8 + 25 + 8 + 3] ^= 0xFF  # inside zlib stream
    got2 = _decode_foreign(bytes(bad_idat))
    assert got2[4] in (False, None)
    # truncated file: signature only
    got3 = _decode_foreign(good[:8])
    assert got3[4] in (False, None)


@pytest.mark.parametrize("name", ["mm_decode_png"])
def test_oracle_match_r15_png(name, spark):
    r = compare(name, spark, SF_TEST, verbose=False)
    assert r["ok"], f"{name}: {r.get('issues')}"


# --- graph_bfs_reach: checkpointed hops still give exact frontiers ---------


def test_bfs_counts_unchanged_after_checkpoint(spark):
    """The r15 localCheckpoint is lineage-only: hop counts at SF_TEST
    must still equal the DuckDB oracle's (regression pin for the perf
    fix)."""
    r = compare("graph_bfs_reach", spark, SF_TEST, verbose=False)
    assert r["ok"], r.get("issues")


# --- text_zipf_fit: DECIMAL(38,0) slope columns -----------------------------


def test_zipf_slope_decimal_schema_and_value(spark):
    """r16: the DECIMAL(38,0) cross products stay INTERNAL (the int64
    wrap hazard the r14 advice fixed is real) but the emitted columns
    are DOUBLE — the driver's DECIMAL normalizer hash-red bit-identical
    values in CORRECTNESS_r15 (VERDICT r15 #1)."""
    from databricks_feature_store_poc_spark.llm.text import text_zipf_fit

    df = text_zipf_fit(spark, SF_TEST)
    dt = dict(df.dtypes)
    assert dt["slope_num"] == "double"
    assert dt["slope_den"] == "double"
    r = df.collect()[0]
    k, sx, sy, sxy, sx2 = (
        r["n_types"], r["sum_x"], r["sum_y"], r["sum_xy"], r["sum_x2"]
    )
    assert r["slope_num"] == float(k * sxy - sx * sy)
    assert r["slope_den"] == float(k * sx2 - sx * sx)
    if r["slope_den"] != 0:
        assert r["zipf_slope"] == pytest.approx(
            float(k * sxy - sx * sy) / float(k * sx2 - sx * sx)
        )


# --- agg_exact_quantile_2pass: exact selection without a global sort -------


def test_exact_quantile_matches_brute_force(spark, tmp_path):
    """Hand-built lineitem with known ranks incl. heavy value ties and a
    bucket boundary straddle; result must equal the k-th smallest."""
    import math

    from databricks_feature_store_poc_spark.operators.relational import (
        agg_exact_quantile_2pass,
        _EXACT_QUANTILES,
    )

    vals = (
        [100.00] * 7            # ties in one bucket
        + [199.99, 200.00]      # bucket boundary straddle (floor /100)
        + [float(v) for v in range(300, 391, 10)]
        + [None, None]          # excluded
    )
    rows = [(i + 1, 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber int, l_extendedprice double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = {
        r["q"]: (r["k"], r["value"])
        for r in agg_exact_quantile_2pass(spark, str(tmp_path)).collect()
    }
    nn = sorted(v for v in vals if v is not None)
    for q in _EXACT_QUANTILES:
        k = max(1, math.ceil(q * len(nn)))
        assert got[q] == (k, nn[k - 1]), q


def test_exact_quantile_plan_has_no_global_sort(spark):
    """The point of the operator: the full column never crosses a range
    (sort) exchange — only the bucket histogram and the selected
    buckets shuffle."""
    from databricks_feature_store_poc_spark.operators.relational import (
        agg_exact_quantile_2pass,
    )

    plan = agg_exact_quantile_2pass(
        spark, SF_TEST
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan[:2000]


def test_exact_quantile_all_null_empty(spark, tmp_path):
    from databricks_feature_store_poc_spark.operators.relational import (
        agg_exact_quantile_2pass,
    )

    df = spark.createDataFrame(
        [(1, 1, None)],
        "l_orderkey long, l_linenumber int, l_extendedprice double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    assert agg_exact_quantile_2pass(spark, str(tmp_path)).count() == 0


# --- sample_minhash_diverse: LSH-stratified corpus subsample ----------------


def test_minhash_diverse_covers_corpus(spark):
    """Every distinct doc_id is represented by exactly one bucket:
    sum(bucket_size) == n distinct docs, kept doc_ids are distinct, and
    near-dup clusters collapse (kept <= distinct docs, with strict
    inequality on data known to contain near-dups)."""
    from databricks_feature_store_poc_spark.registry import (
        QUERIES,
        load_all_queries,
    )
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    load_all_queries()
    out = QUERIES["sample_minhash_diverse"](spark, SF_TEST)
    rows = out.collect()
    n_docs = load_table(spark, SF_TEST, "documents").select(
        "doc_id"
    ).distinct().count()
    kept = [r["doc_id"] for r in rows]
    assert len(kept) == len(set(kept))
    assert sum(r["bucket_size"] for r in rows) == n_docs
    assert len(kept) < n_docs  # sf0.01 documents contain near-dups
    # every no-signature doc is a singleton
    assert all(
        r["bucket_size"] == 1 for r in rows if not r["has_signature"]
    )


def test_minhash_diverse_drops_near_dup_clones(spark, tmp_path):
    """Hand-built corpus: 3 verbatim clones of one long doc collapse to
    one representative (min doc_id) with bucket_size 3; a distinct doc
    survives; a 2-word doc has no signature and is kept as a
    singleton."""
    from databricks_feature_store_poc_spark.llm.dedup import (
        sample_minhash_diverse,
    )

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long_b = "one two three four five six seven eight nine ten eleven"
    sf = _write_documents(spark, tmp_path, [
        (10, long_a), (11, long_a), (12, long_a),
        (20, long_b),
        (30, "too short"),
        (31, None),
    ])
    got = {r["doc_id"]: r for r in sample_minhash_diverse(spark, sf).collect()}
    assert set(got) == {10, 20, 30, 31}
    assert got[10]["bucket_size"] == 3 and got[10]["has_signature"]
    assert got[20]["bucket_size"] == 1 and got[20]["has_signature"]
    assert got[30]["bucket_size"] == 1 and not got[30]["has_signature"]
    assert got[31]["bucket_size"] == 1 and not got[31]["has_signature"]


def test_grouped_quantile_matches_brute_force(spark, tmp_path):
    import math

    from databricks_feature_store_poc_spark.operators.relational import (
        agg_exact_quantile_grouped,
        _EXACT_QUANTILES,
    )

    data = {
        "A": [5.0] * 4 + [float(v) for v in range(100, 131, 10)],
        "B": [250.0, 250.0, 99.99, 100.00, 300.5],
    }
    rows, i = [], 0
    for g, vs in data.items():
        for v in vs:
            i += 1
            rows.append((i, 1, g, v))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_extendedprice double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = {
        (r["grp"], r["q"]): (r["k"], r["value"])
        for r in agg_exact_quantile_grouped(spark, str(tmp_path)).collect()
    }
    for g, vs in data.items():
        nn = sorted(vs)
        for q in _EXACT_QUANTILES:
            k = max(1, math.ceil(q * len(nn)))
            assert got[(g, q)] == (k, nn[k - 1]), (g, q)


def test_grouped_quantile_plan_has_no_global_sort(spark):
    from databricks_feature_store_poc_spark.operators.relational import (
        agg_exact_quantile_grouped,
    )

    plan = agg_exact_quantile_grouped(
        spark, SF_TEST
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan[:2000]


# --- text_url_canonicalize: surface variants collapse -----------------------


def test_url_canonicalize_collapses_variants(spark, tmp_path):
    """Docs picked so every mess axis fires (case, default vs kept port,
    double/trailing slash, param order, utm junk, fragment) must all
    canonicalize to the predictable form; the kept :8443 port and
    dropped-param count are asserted explicitly."""
    rows = [(i, "Body text", "en", "src1", 9) for i in range(1, 61)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from databricks_feature_store_poc_spark.llm.text import (
        text_url_canonicalize,
    )

    got = {r["doc_id"]: r for r in
           text_url_canonicalize(spark, str(tmp_path)).collect()}
    for i in range(1, 61):
        r = got[i]
        port = ":8443" if i % 5 == 1 else ""
        want = (f"https://www.src1.example.com{port}/docs/{i}"
                f"?a={i % 10}&b={i % 7}")
        assert r["url_canonical"] == want, (i, r["url_raw"])
        assert r["n_dropped_params"] == (1 if i % 3 == 1 else 0), i
        assert r["had_fragment"] == (i % 6 == 0), i
        # raw differs from canonical whenever any mess axis fired
        if i % 2 or i % 3 == 0 or i % 3 == 1 or i % 4 == 0 \
                or i % 5 == 0 or i % 6 == 0 or i % 7 == 0:
            assert r["url_raw"] != r["url_canonical"], i


def test_url_canonicalize_null_rows(spark, tmp_path):
    rows = [(1, None, None, None, None), (None, "t", "en", "src1", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from databricks_feature_store_poc_spark.llm.text import (
        text_url_canonicalize,
    )

    for r in text_url_canonicalize(spark, str(tmp_path)).collect():
        assert r["url_raw"] is None and r["url_canonical"] is None
        assert r["n_dropped_params"] is None and r["had_fragment"] is None


# --- mm_decode_gif: general LZW decode -------------------------------------


def _gif_expected(text):
    if text is None:
        return (None, None, None, None, None)
    tb = text.encode("utf-8")
    n = len(tb)
    w, h = 3 + n % 9, 2 + (n // 3) % 8
    m = w * h
    lzw = (9 * (1 + m + max(-(-m // 254) - 1, 0) + 1) + 7) // 8
    wsum = sum((i + 1) * tb[i] for i in range(min(n, m))) % 65536
    return (w, h, 794 + lzw + -(-lzw // 255), True, wsum)


def test_gif_round_trip_matches_contract(spark, tmp_path):
    from databricks_feature_store_poc_spark.llm.multimodal import (
        mm_decode_gif,
    )

    cases = [
        (1, ""), (2, "a"), (3, "héllo wörld"), (4, None),
        (5, "The quick brown fox jumps over the lazy dog. " * 6),
    ]
    sf = _write_documents(spark, tmp_path, cases)
    got = {r["doc_id"]: r for r in mm_decode_gif(spark, sf).collect()}
    for doc_id, text in cases:
        w, h, nb, hc, ws = _gif_expected(text)
        r = got[doc_id]
        assert (
            r["width"], r["height"], r["n_file_bytes"],
            r["header_consistent"], r["pixel_checksum_weighted"],
        ) == (w, h, nb, hc, ws), f"doc {doc_id}"


def _lzw_compress(pixels: bytes, min_size: int = 8) -> bytes:
    """REAL LZW compressor (test-only): string-table growth, variable
    width increasing at next_code == 2^width, cap 12 with a CLEAR —
    produces streams the engine's clear-per-chunk encoder never emits,
    so decoding them pins the decoder's generality."""
    clear, end = 1 << min_size, (1 << min_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code, width = end + 1, min_size + 1
    out_codes = [clear]
    wseq = [width]
    cur = b""
    for byte in pixels:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        out_codes.append(table[cur])
        wseq.append(width)
        table[nxt] = next_code
        next_code += 1
        # The DECODER builds its table one code behind the encoder (it
        # adds the entry for code j while processing code j+1), so the
        # encoder must widen one code later than its own counter
        # suggests: when next_code == 2^width + 1, the decoder has just
        # reached 2^width and reads the NEXT code at the wider width.
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        assert next_code < (1 << 12), "test stream too long for cap"
        cur = bytes([byte])
    if cur:
        out_codes.append(table[cur])
        wseq.append(width)
    out_codes.append(end)
    wseq.append(width)
    acc = bitlen = 0
    out = bytearray()
    for c, cw in zip(out_codes, wseq):
        acc |= c << bitlen
        bitlen += cw
        while bitlen >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8
    if bitlen:
        out.append(acc & 0xFF)
    return bytes(out)


def _ref_gif(pixels: bytes, w: int, h: int) -> bytes:
    import struct

    stream = _lzw_compress(pixels)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    parts = [
        b"GIF89a",
        struct.pack("<HHBBB", w, h, 0xF7, 0, 0),
        gct,
        # a graphic-control EXTENSION block the decoder must skip
        b"\x21\xf9\x04\x00\x00\x00\x00\x00",
        struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0),
        bytes([8]),
    ]
    for i in range(0, len(stream), 255):
        blk = stream[i:i + 255]
        parts.append(bytes([len(blk)]) + blk)
    parts.append(b"\x00\x3b")
    return b"".join(parts)


def _decode_gif_foreign(payload: bytes) -> tuple:
    from databricks_feature_store_poc_spark.llm.multimodal import (
        _make_gif_decoder,
    )

    out = next(_make_gif_decoder()(
        iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])
    ))
    r = out.iloc[0]

    def v(x):
        return None if pd.isna(x) else int(x)

    return (
        v(r["width"]), v(r["height"]), v(r["n_file_bytes"]),
        None if pd.isna(r["header_consistent"])
        else bool(r["header_consistent"]),
        v(r["pixel_checksum_weighted"]),
    )


def test_gif_decoder_general_compressed():
    """A genuinely LZW-COMPRESSED GIF89a (repetitive pixels force the
    string table past 512 entries -> width 9->10 growth; plus an
    extension block to skip) must decode to the exact pixel stream —
    the engine's own encoder never produces any of this."""
    w, h = 50, 40  # 2000 px, heavy repetition
    pixels = bytes((i // 7) % 5 for i in range(w * h))
    payload = _ref_gif(pixels, w, h)
    want_sum = sum((i + 1) * pixels[i] for i in range(len(pixels))) % 65536
    got = _decode_gif_foreign(payload)
    assert got == (w, h, len(payload), True, want_sum)
    # the compressed stream must actually be SMALLER than 9-bit literal
    # coding, i.e. the table-reference path really ran
    assert len(payload) < 794 + (9 * (w * h + 2) + 7) // 8


def test_gif_corruption_detected():
    w, h = 5, 4
    pixels = bytes(range(20))
    good = _ref_gif(pixels, w, h)
    # truncate: END code never reached -> diagnostic row, no crash
    got = _decode_gif_foreign(good[:len(good) - 10])
    assert got[3] in (False, None)
    # bad signature
    got2 = _decode_gif_foreign(b"NOTAGIF" + good[7:])
    assert got2[3] in (False, None)


@pytest.mark.parametrize("name", ["mm_decode_gif"])
def test_oracle_match_r15_gif(name, spark):
    r = compare(name, spark, SF_TEST, verbose=False)
    assert r["ok"], f"{name}: {r.get('issues')}"
