"""Adversarial oracle fixture generator (VERDICT r1 item #1).

Round-1 lesson: the driver's events data exercises NULL / NaN / precision /
tie edges the clean local testdata never does, so "green locally" did not
imply "green at the driver". This module derives an adversarial copy of the
sf0.01 fixture — same schema, same volume (thresholded queries still fire) —
with every edge class injected deterministically (seed 42):

- NULLs in every nullable events column (ts, user_id, event_type, value, props)
- NaN and ±inf in ``value``
- exact (user_id, ts) ties — full-timestamp duplicates with distinct event_id
- exact UTC-midnight timestamps and midnight-minus-1µs neighbours
  (day-bucket boundary rows)
- pre-1970 (negative-epoch) timestamps at day-bucket and µs-floor
  boundaries (-1µs, -1day, -1day-1µs, ...) — the floor-vs-trunc division
  hazard class behind the r1/r2 driver hash-fails (VERDICT r2 item #1)
- documents: NULL / empty / whitespace-only / single-token / unicode text,
  NULL lang/source (the text+dedup family's blind spots)
- embeddings: NULL embedding, all-zero vector (NaN cosine), NaN component,
  NULL label (blocking key)
- orders/lineitem/customer/supplier/part: NULLs in every non-key column
  (~1% per column — measures, dates, flags, segments), keys left intact

The events file is written in the driver's CURRENT physical layout —
TIMESTAMP(MICROS, isAdjustedToUTC=false), i.e. naive µs (round 1 was
TIMESTAMP_NANOS; `sources/readers.py` handles both).

``build_ns`` additionally derives a TIMESTAMP(NANOS)-layout variant of the
same fixture (`tests/_advdata_ns`) with sub-µs components on positive-epoch
rows — including ns-distinct duplicates that TIE at µs precision — so the
engine's ns→µs floor (`load_table`), the oracle's `_EVENTS_US_CTE` floor,
and every (ts, event_id) tiebreak are exercised under the r1 physical
layout. Negative-epoch rows stay whole-µs in this variant: DuckDB 1.0.0
truncates ns→µs toward zero AT SCAN (measured: -250ns → 0µs, information
destroyed before any CTE can floor it), so negative sub-µs values are
irreconcilable under 1.0.0 specifically; ns-preserving DuckDB (1.1+) floors
via the CTE and matches the engine for any sign.

Non-events tables are copied verbatim. Usage:

    BDRR_TEST_SF_DIR=$(python tests/advdata.py) \
        python -m pytest tests/test_catalog_oracle.py -q
    BDRR_TEST_SF_DIR=$(python tests/advdata.py ns) \
        python -m pytest tests/test_catalog_oracle.py -q
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
DST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_advdata")
DST_NS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_advdata_ns")

TABLES = ("region", "nation")

#: non-key columns to NULL-inject per TPC-H-ish table (~1% each, disjointly
#: picked per column so multi-column rows stay rare but exist)
TPCH_NULLABLE = {
    "orders": ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "customer": ["c_name", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_name", "s_acctbal"],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
}

DAY_US = 86_400_000_000


def _null_inject(
    src: str, dst: str, table: str, cols: list[str], *, rng, frac: float = 0.01
) -> None:
    """NULL ~frac of each listed (non-key) column, one independent row pick
    per column."""
    t = pq.read_table(f"{src}/{table}.parquet")
    n = t.num_rows
    arrays = {name: t[name] for name in t.column_names}
    for c in cols:
        vals = t[c].to_pylist()
        for i in rng.choice(n, size=max(1, int(n * frac)), replace=False):
            vals[i] = None
        arrays[c] = pa.array(vals, type=t[c].type)
    pq.write_table(pa.table(arrays), f"{dst}/{table}.parquet")


def _mutate_documents(src: str, dst: str) -> None:
    """Edge-text rows in the first ~20 documents (small fraction — the
    thresholded dedup/text queries still fire on the normal rest)."""
    t = pq.read_table(f"{src}/documents.parquet")
    text = t["text"].to_pylist()
    lang = t["lang"].to_pylist()
    source = t["source"].to_pylist()
    edges = [
        None,                     # NULL text
        "",                       # empty
        "   \t  \n ",             # whitespace-only
        "token",                  # single token (shorter than any shingle n)
        "naïve café 東京 данные",  # unicode tokens
        "a  b   c",               # repeated internal whitespace
        # PII-bearing rows: exercise redaction match+replace (regex must
        # fire identically in Java regex and RE2 — q_text_redact_pii)
        "contact a.b+c@ex-ample.org or x@y.io call +1 555-123-4567 now",
        "edge email@sub.domain.co at end 555-987-6543",
        # long doc: multiple overlapping token chunks incl. a clipped tail
        # (q_text_chunk stride-24 windows; 85 tokens → starts 1,25,49,73,
        # final chunk 73..85 = 13 tokens, exercising the slice clip)
        " ".join(f"w{i}" for i in range(85)),
        # boilerplate: one token >20% of the doc (q_text_repetition flag)
        "spam spam spam spam spam filler filler end",
    ]
    for j, e in enumerate(edges):
        text[j] = e
    lang[1] = None
    source[2] = None
    n_chars = [len(x) if x is not None else None for x in text]
    out = pa.table(
        {
            "doc_id": t["doc_id"],
            "text": pa.array(text, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            "source": pa.array(source, type=pa.string()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
        }
    )
    pq.write_table(out, f"{dst}/documents.parquet")


def _mutate_embeddings(src: str, dst: str) -> None:
    """Degenerate vectors in the first few embeddings rows."""
    t = pq.read_table(f"{src}/embeddings.parquet")
    emb = t["embedding"].to_pylist()
    label = t["label"].to_pylist()
    dim = len(emb[3])
    emb[0] = None                                  # NULL embedding
    emb[1] = [0.0] * dim                           # zero vector → NaN cosine
    emb[2] = [float("nan")] + [0.1] * (dim - 1)    # NaN component
    label[3] = None                                # NULL blocking key
    out = pa.table(
        {
            "vec_id": t["vec_id"],
            "embedding": pa.array(emb, type=pa.list_(pa.float32())),
            "label": pa.array(label, type=pa.int32()),
        }
    )
    pq.write_table(out, f"{dst}/embeddings.parquet")


def build(dst: str = DST, src: str = SRC, seed: int = 42) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    _mutate_documents(src, dst)
    _mutate_embeddings(src, dst)
    for t, cols in TPCH_NULLABLE.items():
        _null_inject(src, dst, t, cols, rng=np.random.RandomState(seed + 7))

    ev = pq.read_table(f"{src}/events.parquet")
    n = ev.num_rows
    rng = np.random.RandomState(seed)

    event_id = ev["event_id"].to_numpy().copy()
    # µs since epoch — ~1.7e15 fits float64's exact-integer range (2^53),
    # so the NaN-sentinel float view below is lossless
    ts_us = ev["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy().copy().astype("float64")
    user_id = ev["user_id"].to_numpy().copy().astype("float64")
    event_type = ev["event_type"].to_pylist()
    value = ev["value"].to_numpy().copy()
    props = ev["props"].to_pylist()

    def pick(frac: float) -> np.ndarray:
        return rng.choice(n, size=max(1, int(n * frac)), replace=False)

    # NULL injection (ts via NaN sentinel in the float64 view)
    ts_null = pick(0.02)
    user_null = pick(0.02)
    value_null = pick(0.05)
    for i in pick(0.02):
        event_type[i] = None
    for i in pick(0.03):
        props[i] = None

    # NaN / ±inf in value (disjoint from the null picks by overwrite order)
    value[pick(0.01)] = np.nan
    value[pick(0.003)] = np.inf
    value[pick(0.003)] = -np.inf
    value[value_null] = np.nan  # placeholder; nulled via mask below

    # exact UTC-midnight + midnight-1µs rows (day-bucket boundaries)
    mid = pick(0.01)
    base_day = 1_704_067_200_000_000  # 2024-01-01 UTC, µs
    for j, i in enumerate(mid):
        edge_us = base_day + (j % 30) * DAY_US - (j % 2)  # :00.000000 or -1µs
        ts_us[i] = float(edge_us)

    # pre-1970 rows: negative epochs at every boundary the floor-vs-trunc
    # hazard can flip — -1µs, -1day, -1day-1µs, -0.999999s, 1week-1µs back
    neg_edges = [
        -1,                      # 1969-12-31 23:59:59.999999
        -DAY_US,                 # 1969-12-31 00:00:00 exactly
        -DAY_US - 1,             # 1969-12-30 23:59:59.999999
        -999_999,                # sub-second negative
        -7 * DAY_US + 1,         # 1µs into a negative week bucket
    ]
    for j, i in enumerate(pick(0.005)):
        ts_us[i] = float(neg_edges[j % len(neg_edges)] - (j % 5) * DAY_US)

    # exact (user_id, ts) full ties: duplicate rows, fresh event_id
    tie_src = pick(0.01)
    dup_event_id = event_id.max() + 1 + np.arange(len(tie_src))

    mask_ts = np.zeros(n, dtype=bool)
    mask_ts[ts_null] = True
    mask_user = np.zeros(n, dtype=bool)
    mask_user[user_null] = True
    mask_val = np.zeros(n, dtype=bool)
    mask_val[value_null] = True

    def col_int64(vals: np.ndarray, mask: np.ndarray) -> pa.Array:
        return pa.array(
            [None if m else int(v) for v, m in zip(vals, mask)], type=pa.int64()
        )

    ts_all = col_int64(ts_us, mask_ts)
    user_all = col_int64(user_id, mask_user)
    val_all = pa.array(
        [None if m else float(v) for v, m in zip(value, mask_val)],
        type=pa.float64(),
    )

    base = pa.table(
        {
            "event_id": pa.array(event_id, type=pa.int64()),
            "ts": ts_all.cast(pa.timestamp("us")),
            "user_id": user_all,
            "event_type": pa.array(event_type, type=pa.string()),
            "value": val_all,
            "props": pa.array(props, type=pa.string()),
        }
    )
    dup = base.take(pa.array(tie_src)).set_column(
        0, "event_id", pa.array(dup_event_id, type=pa.int64())
    )
    out = pa.concat_tables([base, dup])
    pq.write_table(out, f"{dst}/events.parquet")
    return dst


def build_ns(dst: str = DST_NS, src: str = SRC, seed: int = 42) -> str:
    """TIMESTAMP(NANOS)-layout variant of the adversarial fixture (the r1
    driver physical layout). Positive-epoch rows get a deterministic sub-µs
    component (0/250/500/750 ns by row index) — µs-level ties (the dup rows)
    remain ties after the engine's ns→µs floor while being ns-distinct, so
    a ns-naive reader would order/compare them differently. Negative rows
    stay whole-µs (see module docstring: DuckDB 1.0.0 scan-truncates ns)."""
    build(dst, src, seed)
    t = pq.read_table(f"{dst}/events.parquet")
    us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
    ns_vals = []
    for k, v in enumerate(us):
        if v is None:
            ns_vals.append(None)
        elif v >= 0:
            ns_vals.append(v * 1000 + (k % 4) * 250)
        else:
            ns_vals.append(v * 1000)
    ts_ns = pa.array(ns_vals, type=pa.int64()).cast(pa.timestamp("ns"))
    out = t.set_column(t.column_names.index("ts"), "ts", ts_ns)
    # version >= 2.6 stores timestamp[ns] natively as TIMESTAMP(NANOS)
    pq.write_table(out, f"{dst}/events.parquet", version="2.6")
    unit = pq.ParquetFile(f"{dst}/events.parquet").schema_arrow.field("ts").type.unit
    assert unit == "ns", f"expected TIMESTAMP(NANOS) layout, got {unit}"
    return dst


if __name__ == "__main__":
    import sys

    print(build_ns() if "ns" in sys.argv[1:] else build())
