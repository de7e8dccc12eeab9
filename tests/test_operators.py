"""Micro-fixture unit tests for the SURVEY §4.4 semantics traps:
half-open windows, strict point-in-time predicates, tie determinism,
gap-boundary behavior, null discipline, pair dedup."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def ts(s: str):
    return datetime.fromisoformat(s)


def test_sessionize_gap_boundary(spark):
    """Exactly-1800s gap stays in the SAME session (rule is gap > 1800s,
    py:114); 1800.000001s starts a new one; single event → session 1."""
    from bigdata_retailrocket_recsys_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00")),
            (1, ts("2024-01-01 00:30:00")),  # gap exactly 1800s → same
            (1, ts("2024-01-01 01:00:00.000001")),  # 1800.000001s → new
            (2, ts("2024-01-01 00:00:00")),  # lone event
        ],
        "user_id bigint, ts timestamp",
    )
    out = {
        (r.user_id, r.ts.isoformat()): r.session_id
        for r in sessionize(df).collect()
    }
    assert out[(1, "2024-01-01T00:00:00")] == "1_1"
    assert out[(1, "2024-01-01T00:30:00")] == "1_1"
    assert out[(1, "2024-01-01T01:00:00.000001")] == "1_2"
    assert out[(2, "2024-01-01T00:00:00")] == "2_1"


def test_sessionize_tie_determinism(spark):
    """Events at the same timestamp get a deterministic order via the
    tiebreak column (the reference's bare orderBy(ts) does not — §4.4)."""
    from bigdata_retailrocket_recsys_spark.operators.sessionize import sessionize

    rows = [(1, ts("2024-01-01 00:00:00"), i) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, eid bigint")
    a = sessionize(df, tiebreak_cols=["eid"]).collect()
    b = sessionize(df, tiebreak_cols=["eid"]).collect()
    assert sorted((r.eid, r.session_id) for r in a) == sorted(
        (r.eid, r.session_id) for r in b
    )
    assert all(r.session_id == "1_1" for r in a)


def test_latest_per_key_tie(spark):
    """Same-timestamp snapshots resolve by tiebreak desc, deterministically
    (ref py:171-173 is arbitrary on ties)."""
    from bigdata_retailrocket_recsys_spark.operators.windows import latest_per_key

    df = spark.createDataFrame(
        [
            (10, ts("2024-01-01 00:00:00"), 100),
            (10, ts("2024-01-01 00:00:00"), 200),  # tie → higher cat wins
            (10, ts("2023-12-31 00:00:00"), 300),
        ],
        "item_id bigint, ts timestamp, category_id bigint",
    )
    out = latest_per_key(
        df, key_cols=["item_id"], ts_col="ts", tiebreak_cols=["category_id"]
    ).collect()
    assert len(out) == 1 and out[0].category_id == 200


def test_prefix_join_strictly_before(spark):
    """An event exactly AT the anchor timestamp is excluded (strict <,
    py:238,250,266,352)."""
    from bigdata_retailrocket_recsys_spark.operators.joins import prefix_agg_join

    anchors = spark.createDataFrame(
        [(1, ts("2024-01-01 01:00:00"))], "user_id bigint, ts timestamp"
    )
    events = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:59:59")),  # before → counted
            (1, ts("2024-01-01 01:00:00")),  # exactly at → excluded
            (1, ts("2024-01-01 01:00:01")),  # after → excluded
        ],
        "user_id bigint, ts timestamp",
    )
    out = prefix_agg_join(
        anchors,
        events,
        key_cols=["user_id"],
        anchor_ts="ts",
        event_ts="ts",
        aggs=[F.count(F.col("e.user_id")).alias("n")],
    ).collect()
    assert out[0].n == 1


def test_covis_pairs_dedup_and_threshold(spark):
    """(a,b)/(b,a) collapse to one pair, self-pairs drop, repeated views in
    one group count once, min_count filters (py:252-260)."""
    from bigdata_retailrocket_recsys_spark.operators.joins import covis_pairs

    rows = []
    for g in ["s1", "s2", "s3"]:
        rows += [(g, 1), (g, 2), (g, 1)]  # dup view of item 1 per session
    rows += [("s1", 3)]
    df = spark.createDataFrame(rows, "session_id string, item_id bigint")
    out = {
        (r.item_a, r.item_b): r.covis
        for r in covis_pairs(
            df, group_col="session_id", item_col="item_id", min_count=1
        ).collect()
    }
    assert out[(1, 2)] == 3  # once per session despite dup rows
    assert (2, 1) not in out and (1, 1) not in out
    assert out[(1, 3)] == 1 and out[(2, 3)] == 1
    filtered = covis_pairs(
        df, group_col="session_id", item_col="item_id", min_count=3
    ).collect()
    assert {(r.item_a, r.item_b) for r in filtered} == {(1, 2)}


def test_covis_pairs_cap(spark):
    """max_per_group keeps only the most recent N items before pairing —
    the quadratic-blowup guard (SURVEY §7.3)."""
    from bigdata_retailrocket_recsys_spark.operators.joins import covis_pairs

    rows = [("s1", i, ts(f"2024-01-01 00:0{i}:00")) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "session_id string, item_id bigint, ts timestamp")
    out = covis_pairs(
        df,
        group_col="session_id",
        item_col="item_id",
        max_per_group=2,
        ts_col="ts",
    ).collect()
    # only the 2 most recent items (4, 5) can pair
    assert {(r.item_a, r.item_b) for r in out} == {(4, 5)}


def test_collect_ordered_seq_deterministic(spark):
    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        collect_ordered_seq,
    )

    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:02:00"), 2, "b"),
            (1, ts("2024-01-01 00:01:00"), 1, "a"),
            (1, ts("2024-01-01 00:02:00"), 3, "c"),  # ts tie → eid breaks
        ],
        "g bigint, ts timestamp, eid bigint, v string",
    ).repartition(4)
    out = collect_ordered_seq(
        df, group_cols=["g"], order_cols=["ts", "eid"], value_col="v"
    ).collect()
    assert out[0].seq == ["a", "b", "c"]


def test_exact_dedup_keeper(spark):
    from bigdata_retailrocket_recsys_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y"), (4, None), (5, None)],
        "doc_id bigint, text string",
    )
    out = {r.keeper_id: r.n_dups for r in exact_dedup(
        df, key_cols=["text"], id_col="doc_id"
    ).collect()}
    # NULL-key rows are incomparable: each is its OWN group (never merged
    # with other NULL-key rows — ADVICE r2 #1).
    assert out == {1: 2, 2: 1, 4: 1, 5: 1}


def test_shingle_rows_matches_array_form(spark):
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        shingle_rows,
        shingles,
    )

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "solo")], "doc_id bigint, text string"
    )
    via_rows = {
        (r.doc, r.shingle)
        for r in shingle_rows(df, id_col="doc_id", text_col="text", n=3).collect()
    }
    via_array = set()
    for r in df.select(
        "doc_id", shingles(F.col("text"), 3).alias("sh")
    ).collect():
        via_array |= {(r.doc_id, s) for s in r.sh}
    assert via_rows == via_array
    assert (1, "a b c") in via_rows and (1, "b c d") in via_rows
    assert (3, "solo") in via_rows


def test_simhash_identical_and_near(spark):
    from bigdata_retailrocket_recsys_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumps over the lazy cat"),
            (4, "completely different words entirely unrelated content here"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc: r.simhash for r in simhash(df).collect()}
    assert out[1] == out[2]
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(out[1], out[3]) < ham(out[1], out[4])


def test_cosine_topk_hand_computed(spark):
    from bigdata_retailrocket_recsys_spark.operators.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [-1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id bigint, embedding array<float>"
    )
    out = cosine_topk(corpus, queries, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in out] == [1, 2, 3]
    assert abs(out[0].cosine - 1.0) < 1e-12


def test_prefix_counts_window_matches_theta_join(spark):
    """The one-shuffle window path must agree with the theta-join path on
    every row, including same-timestamp ties (both strictly-before)."""
    from pyspark.sql import functions as F

    from bigdata_retailrocket_recsys_spark.operators.joins import prefix_agg_join
    from bigdata_retailrocket_recsys_spark.operators.windows import (
        prefix_counts_window,
    )

    rows = [  # (user, ts_us, item) with a duplicate-ts tie for user 1
        (1, 1000, 10), (1, 2000, 11), (1, 2000, 12), (1, 3000, 10),
        (2, 1000, 20),
    ]
    df = spark.createDataFrame(
        [(u, t, i) for u, t, i in rows], "user_id bigint, ts_us bigint, item bigint"
    ).select("user_id", F.timestamp_micros("ts_us").alias("ts"), "item")

    win = {
        (r.user_id, r.ts, r.item): (r.n_prefix_events, r.n_prefix_items)
        for r in prefix_counts_window(
            df, group_col="user_id", ts_col="ts", item_col="item"
        ).collect()
    }
    theta = {
        (r.user_id, r.ts, r.item): (r.n, r.n_items)
        for r in prefix_agg_join(
            df.select("user_id", F.col("ts").alias("anchor_ts"), "item"),
            df.select("user_id", "ts", F.col("item").alias("e_item")),
            key_cols=["user_id"],
            anchor_ts="anchor_ts",
            event_ts="ts",
            aggs=[
                F.count(F.col("e.ts")).alias("n"),
                F.size(F.collect_set("e.e_item")).alias("n_items"),
            ],
        )
        .selectExpr("user_id", "anchor_ts as ts", "item", "n", "n_items")
        .collect()
    }
    assert win == theta
    # the tie rows (ts=2000µs) see only the strictly-earlier event
    import datetime

    tie_ts = datetime.datetime(1970, 1, 1, 0, 0, 0, 2000)
    assert win[(1, tie_ts, 11)][0] == 1
    assert win[(1, tie_ts, 12)][0] == 1


def test_salted_join_matches_plain_join(spark):
    from bigdata_retailrocket_recsys_spark.operators.joins import salted_join

    # one hot key (k=1) dominating the fact table
    facts = spark.createDataFrame(
        [(i, 1 if i % 10 else 2) for i in range(200)], "fid bigint, k bigint"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")],
                                "k bigint, name string")
    plain = {(r.fid, r.name) for r in facts.join(dim, "k").collect()}
    salted = [
        (r.fid, r.name)
        for r in salted_join(facts, dim, "k", buckets=4).collect()
    ]
    assert len(salted) == len(plain)  # no duplicate fan-out
    assert set(salted) == plain

    # left join keeps unmatched facts exactly once
    facts2 = facts.union(spark.createDataFrame([(999, 42)], facts.schema))
    left = salted_join(facts2, dim, "k", buckets=4, how="left").collect()
    assert len(left) == 201
    assert [r.name for r in left if r.fid == 999] == [None]


def test_cosine_topk_ivf_recall(spark):
    """IVF probe search must (a) return well-formed per-query top-k and
    (b) recover most of the exact brute-force neighbors on real testdata."""
    from bigdata_retailrocket_recsys_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 5").selectExpr(
        "vec_id as query_id", "embedding"
    )
    exact = cosine_topk(emb, queries, k=10).collect()
    approx = cosine_topk_ivf(emb, queries, k=10, n_cells=8, nprobe=4).collect()

    by_q_exact = {}
    for r in exact:
        by_q_exact.setdefault(r.query_id, set()).add(r.vec_id)
    by_q_approx = {}
    for r in approx:
        by_q_approx.setdefault(r.query_id, []).append(r)

    hits = total = 0
    for qid, rows in by_q_approx.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)), "ranks not 1..n"
        assert all(r.vec_id != qid for r in rows), "self returned"
        hits += len({r.vec_id for r in rows} & by_q_exact[qid])
        total += len(by_q_exact[qid])
    # nprobe=4 of 8 cells scans ~half the corpus; recall should be high
    assert total > 0 and hits / total >= 0.6, f"recall {hits}/{total}"


def test_lang_id_obvious(spark):
    from bigdata_retailrocket_recsys_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and the dog is a pet"),
            (2, "der hund ist nicht die katze und das ist gut"),
            (3, "zzz qqq xxx"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.lang_guess for r in lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_multimodal_stub_paths(spark):
    import pytest

    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "abc")], "doc_id bigint, text string"
    )
    assets = attach_fake_media(df, id_col="doc_id", payload_from="text")
    feats = {r.asset_id: r for r in extract_media_features(assets).collect()}
    assert feats[1].n_bytes == 11 and feats[2].n_bytes == 3
    assert feats[1].byte_entropy > 0
    with pytest.raises(Exception) as exc:
        extract_media_features(assets, decode_stub="error").collect()
    assert "NotImplementedError" in str(exc.value) or "media decode" in str(
        exc.value
    )


def test_pipeline_observation_metrics(spark):
    """Stage invariants ride the job as Observation metrics — the
    scale-friendly form of the reference's printed count() calls."""
    from pyspark.sql import Observation

    from bigdata_retailrocket_recsys_spark.pipelines.retailrocket import (
        run_events_pipeline,
    )

    obs = Observation("pipeline")
    out = run_events_pipeline(
        spark, "/root/testdata/sf0.001", with_embeddings=False, observe=obs
    )
    n_rows = out.count()  # the ONE action; metrics piggyback on it
    m = obs.get
    assert m["n_rows"] == n_rows > 0
    assert 0 < m["n_pos"] < m["n_rows"]
    assert m["n_sessions"] > 0


def test_multimodal_resize_and_frames(spark):
    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        attach_fake_media,
        resize_images,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "abc")], "doc_id bigint, text string"
    )
    assets = attach_fake_media(df, id_col="doc_id", payload_from="text")

    resized = {
        r.asset_id: r
        for r in resize_images(
            assets, width=64, height=64, decode_stub="fake"
        ).collect()
    }
    assert resized[1].width == 64 and resized[1].height == 64
    assert bytes(resized[2].payload) == b"abc"  # fake path: pass-through

    frames = sample_frames(assets, every_n=2).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    # 100 bytes / (16*2) stride → 4 frames; 3 bytes → 1 frame
    assert len(by_asset[1]) == 4 and len(by_asset[2]) == 1
    assert [r.frame_idx for r in sorted(by_asset[1], key=lambda x: x.frame_idx)] == [0, 1, 2, 3]
    assert bytes(by_asset[2][0].frame) == b"abc"


def test_asof_join_nearest_and_strict(spark):
    from pyspark.sql import functions as F

    from bigdata_retailrocket_recsys_spark.operators.joins import asof_join

    # user 1: events at t=10,20,30(null value); anchors at t=20 (strict →
    # only t=10 visible), t=25, t=40. user 2: no events → NULL match.
    events = spark.createDataFrame(
        [(1, 10, 100, 1.0), (1, 20, 101, 2.0), (1, 30, 102, None)],
        "user_id bigint, ts bigint, event_id bigint, value double",
    )
    anchors = spark.createDataFrame(
        [(1, 20, 900), (1, 25, 901), (1, 40, 902), (2, 15, 903)],
        "user_id bigint, ts bigint, anchor_id bigint",
    )
    out = {
        r.anchor_id: r
        for r in asof_join(
            anchors,
            events,
            key_cols=["user_id"],
            anchor_ts="ts",
            event_ts="ts",
            value_cols=["event_id", "value"],
            tiebreak_col="event_id",
        ).collect()
    }
    assert out[900].prev_event_id == 100  # strict: t=20 event excluded
    assert out[901].prev_event_id == 101 and out[901].prev_value == 2.0
    # a NULL field in the matched event must NOT fall through to older rows
    assert out[902].prev_event_id == 102 and out[902].prev_value is None
    assert out[903].prev_event_id is None

    # non-strict: anchor at t=20 sees the t=20 event
    lax = {
        r.anchor_id: r
        for r in asof_join(
            anchors,
            events,
            key_cols=["user_id"],
            anchor_ts="ts",
            event_ts="ts",
            value_cols=["event_id"],
            tiebreak_col="event_id",
            strict=False,
        ).collect()
    }
    assert lax[900].prev_event_id == 101

    # same-ts events: greatest tiebreak wins
    dup = spark.createDataFrame(
        [(1, 10, 100, 1.0), (1, 10, 105, 5.0)],
        "user_id bigint, ts bigint, event_id bigint, value double",
    )
    tie = asof_join(
        anchors.filter(F.col("anchor_id") == 900),
        dup,
        key_cols=["user_id"],
        anchor_ts="ts",
        event_ts="ts",
        value_cols=["event_id"],
        tiebreak_col="event_id",
    ).collect()
    assert tie[0].prev_event_id == 105


def test_band_join_matches_naive(spark):
    from pyspark.sql import functions as F

    from bigdata_retailrocket_recsys_spark.operators.joins import band_join

    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(
            [0.0, 0.019, 0.02, 0.041, 0.5, 0.52, 0.54, -0.01, None]
        )],
        "id bigint, grp string, v double",
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in band_join(
            df, df, left_val="v", right_val="v", eps=0.02,
            key_cols=["grp"],
            extra_cond=F.col("a_id") < F.col("b_id"),
        ).collect()
    )
    naive = sorted(
        (r.i, r.j)
        for r in df.alias("a").join(
            df.alias("b"),
            (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.v") - F.col("b.v")) <= 0.02),
        ).select(F.col("a.id").alias("i"), F.col("b.id").alias("j")).collect()
    )
    # note (4,5) is in NEITHER: 0.52-0.5 = 0.020000000000000018 in IEEE754 —
    # both forms apply the identical predicate, which is the contract
    assert got == naive and (0, 2) in got and (0, 7) in got


def test_hash_split_deterministic_fractions(spark):
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        hash_sample,
        hash_split,
    )

    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    splits = [("valid", 0.1), ("test", 0.1), ("train", 0.8)]
    out = hash_split(df, key_cols=["k"], splits=splits)
    counts = {r.split: r.cnt for r in out.groupBy("split").count()
              .withColumnRenamed("count", "cnt").collect()}
    assert abs(counts["valid"] / 20000 - 0.1) < 0.02
    assert abs(counts["test"] / 20000 - 0.1) < 0.02
    # stable under repartitioning (the property sample() lacks)
    again = hash_split(
        df.repartition(13), key_cols=["k"], splits=splits
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))

    n = hash_sample(df, key_cols=["k"], fraction=0.25).count()
    assert abs(n / 20000 - 0.25) < 0.02


def test_connected_components_chain_and_singleton(spark):
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node bigint")
    # chain 0-1-2-3, pair 4-5, singletons 6,7
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (4, 5)], "src bigint, dst bigint"
    )
    got = {
        r.node: r.cluster_id
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 7}


def test_connected_components_nodes_none_and_pinned(spark):
    """r14 modes: nodes=None returns endpoint-only labels (identical to
    the full run restricted to endpoints); edges_pinned=True on an
    already-checkpointed edge frame is value-identical to the default."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node bigint")
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (4, 5)], "src bigint, dst bigint"
    )
    full = {
        r.node: r.cluster_id
        for r in connected_components(nodes, edges).collect()
    }
    lab = {
        r.node: r.cluster_id
        for r in connected_components(None, edges).collect()
    }
    # endpoint-only: singletons 6,7 absent, labels identical on endpoints
    assert lab == {k: v for k, v in full.items() if k in {0, 1, 2, 3, 4, 5}}
    pinned = edges.localCheckpoint(eager=True)
    lab_pinned = {
        r.node: r.cluster_id
        for r in connected_components(
            None, pinned, edges_pinned=True
        ).collect()
    }
    assert lab_pinned == lab
    # empty edge set: nodes=None yields an empty labels frame
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert connected_components(None, empty).count() == 0


def test_tfidf_hand_computed(spark):
    import math

    from bigdata_retailrocket_recsys_spark.operators.text import tfidf

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c")],
        "doc_id bigint, text string",
    )
    rows = {(r.doc, r.term): r for r in tfidf(df).collect()}
    # 'a' appears in 2 docs, tf=2 in doc 1: 2 * (ln(4/3) + 1) * 1e6
    exp = math.floor(2 * (math.log(4 / 3) + 1) * 1e6)
    assert rows[(1, "a")].tfidf_u == exp and rows[(1, "a")].n_df == 2
    assert rows[(3, "c")].n_tf == 3 and rows[(3, "c")].n_df == 2


def test_hll_sketch_merge_equals_direct(spark):
    """HLL union over per-day sketches must equal one direct sketch (the
    merge is lossless at equal precision) and approximate exact counts."""
    from pyspark.sql import functions as F

    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    direct = {
        r.event_type: r.a
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("a"))
        .collect()
    }
    merged = {
        r.event_type: r.a
        for r in ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("a"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == direct
    for t, n in exact.items():
        assert abs(merged[t] - n) / n < 0.05, (t, merged[t], n)


def test_jaccard_prefix_filter_equals_plain(spark):
    """Prefix filtering must lose NO pairs vs the full self-join at the
    same threshold (the prefix theorem), across thresholds."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for t in (0.3, 0.5, 0.8):
        plain = sorted(
            (r.doc_a, r.doc_b, r.n_common)
            for r in ngram_jaccard_pairs(
                docs, block_cols=["lang", "source"], min_jaccard=t
            ).collect()
        )
        pref = sorted(
            (r.doc_a, r.doc_b, r.n_common)
            for r in ngram_jaccard_pairs_prefix(
                docs, block_cols=["lang", "source"], min_jaccard=t
            ).collect()
        )
        assert plain == pref, f"t={t}: {len(plain)} vs {len(pref)}"


def test_stratified_hash_sample_fractions_and_stability(spark):
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        stratified_hash_sample,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "event_type"
    )
    out = stratified_hash_sample(
        ev,
        key_cols=["event_id"],
        strata_col="event_type",
        fractions={"purchase": 1.0, "view": 0.1},
        default_fraction=0.5,
    )
    base = {r.event_type: r.n for r in ev.groupBy("event_type").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    got = {r.event_type: r.n for r in out.groupBy("event_type").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert got["purchase"] == base["purchase"]  # fraction 1.0 keeps all
    assert abs(got["view"] / base["view"] - 0.1) < 0.03
    assert abs(got["click"] / base["click"] - 0.5) < 0.05
    # repartitioning must not change membership
    again = stratified_hash_sample(
        ev.repartition(17),
        key_cols=["event_id"],
        strata_col="event_type",
        fractions={"purchase": 1.0, "view": 0.1},
        default_fraction=0.5,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_countmin_never_underestimates(spark):
    from pyspark.sql import functions as F

    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    ev = ev.filter(F.col("user_id").isNotNull())
    sk = ev.agg(
        F.count_min_sketch(F.col("user_id"), F.lit(0.005), F.lit(0.99), F.lit(7)).alias("cms")
    ).collect()[0].cms
    exact = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    # decode via the JVM round-trip (the q_agg_countmin graduation path):
    # CMS estimates NEVER under-count — assert the hard guarantee over
    # every user, plus byte determinism for a fixed seed
    decoded = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk)
    )
    assert decoded.totalCount() == sum(exact.values())
    assert all(decoded.estimateCount(u) >= n for u, n in exact.items())
    sk2 = ev.agg(
        F.count_min_sketch(F.col("user_id"), F.lit(0.005), F.lit(0.99), F.lit(7)).alias("cms")
    ).collect()[0].cms
    assert bytes(sk) == bytes(sk2)  # deterministic for a fixed seed


def test_resample_ffill_grid_and_fill(spark):
    from datetime import datetime as dt

    from bigdata_retailrocket_recsys_spark.operators.windows import (
        resample_ffill,
    )

    df = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 0, 10), 100, 1.0),
            (1, dt(2024, 1, 1, 0, 50), 101, 2.0),   # same hour, later → wins
            (1, dt(2024, 1, 1, 3, 0), 102, None),   # null obs: fill skips it
            (1, dt(2024, 1, 1, 4, 30), 103, 9.0),
            (2, dt(2024, 1, 1, 5, 0), 104, 7.0),    # single-bucket user
        ],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    out = {
        (r.user_id, r.bucket.hour): r.value_ffill
        for r in resample_ffill(
            df,
            key_cols=["user_id"],
            ts_col="ts",
            value_col="value",
            tiebreak_col="event_id",
        ).collect()
    }
    # user 1: hours 0..4 dense; hour 0 takes the LATER obs in the bucket;
    # hours 1-3 carry it forward (hour-3 null obs does not reset the fill)
    assert out[(1, 0)] == 2.0
    assert out[(1, 1)] == 2.0 and out[(1, 2)] == 2.0 and out[(1, 3)] == 2.0
    assert out[(1, 4)] == 9.0
    assert out[(2, 5)] == 7.0
    assert len(out) == 6  # 5 hourly buckets for user 1 + 1 for user 2


def test_transition_counts_directed_prob(spark):
    """lead pairs are directed, ordered by (ts, tiebreak); p sums to 1 per
    src over the post-filter counts."""
    from bigdata_retailrocket_recsys_spark.operators.sequences import (
        transition_counts,
    )

    t0 = datetime(2015, 5, 1)
    rows = [
        # u1: 1 -> 2 -> 1 -> 3 ; u2: 1 -> 2
        ("u1", t0, 0, 1),
        ("u1", t0, 1, 2),  # same ts — tiebreak on seq
        ("u2", datetime(2015, 5, 2), 0, 1),
        ("u1", datetime(2015, 5, 3), 2, 1),
        ("u1", datetime(2015, 5, 4), 3, 3),
        ("u2", datetime(2015, 5, 5), 1, 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, seq int, item bigint"
    )
    out = {
        (r.src, r.dst): (r.n, r.p)
        for r in transition_counts(
            df,
            group_col="user_id",
            order_col="ts",
            item_col="item",
            tiebreak_cols=["seq"],
        ).collect()
    }
    assert out[(1, 2)] == (2, 2 / 3)  # u1 and u2; p over src=1's 3 exits
    assert out[(2, 1)] == (1, 1.0)
    assert out[(1, 3)] == (1, 1 / 3)
    assert (3, 1) not in out  # directed: nothing follows u1's final 3


def test_association_rules_stats(spark):
    """support/confidence/lift on a 4-basket fixture, both directions."""
    from bigdata_retailrocket_recsys_spark.operators.sequences import (
        association_rules,
    )

    baskets = {
        "g1": [1, 2],
        "g2": [1, 2],
        "g3": [1, 3],
        "g4": [2, 2],  # dup row — item counted once per basket
    }
    rows = [(g, i) for g, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "basket string, item bigint")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            df, group_col="basket", item_col="item"
        ).collect()
    }
    r12 = out[(1, 2)]
    # pair {1,2} in 2 of 4 baskets; item1 in 3, item2 in 3
    assert (r12.n_pair, r12.support, r12.confidence) == (2, 0.5, 2 / 3)
    assert r12.lift == 2 * 4 / (3 * 3)
    r21 = out[(2, 1)]
    assert (r21.confidence, r21.lift) == (2 / 3, r12.lift)
    assert out[(1, 3)].n_pair == 1 and (3, 2) not in out


def test_key_skew_profile_buckets(spark):
    """digit buckets split a hot key from the long tail; shares sum to 1."""
    from bigdata_retailrocket_recsys_spark.operators.sequences import (
        key_skew_profile,
    )

    rows = [("hot",)] * 120 + [("warm",)] * 15 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = {r.magnitude: r for r in key_skew_profile(df, "k").collect()}
    assert set(out) == {1, 2, 3}
    assert out[3].n_keys == 1 and out[3].max_rows_per_key == 120
    assert out[2].n_keys == 1 and out[2].rows_total == 15
    assert out[1].n_keys == 3 and out[1].min_rows_per_key == 1
    assert sum(r.row_share for r in out.values()) == 1.0
    linear = {
        r.magnitude: r.n_keys
        for r in key_skew_profile(df, "k", bucket_width=50).collect()
    }
    assert linear == {100: 1, 0: 4}


def test_normalize_text_collapses(spark):
    from bigdata_retailrocket_recsys_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [("  Hello,   WORLD!! 42 ",), ("...",), ("",)], "t string"
    )
    out = [r.n for r in df.select(normalize_text("t").alias("n")).collect()]
    assert out == ["hello world 42", "", ""]


def test_ngram_counts_bigrams(spark):
    from bigdata_retailrocket_recsys_spark.operators.text import ngram_counts

    df = spark.createDataFrame(
        [("a b a b",), ("b a",), ("solo",), ("",)], "text string"
    )
    out = {
        r.ngram: r.n for r in ngram_counts(df, text_col="text").collect()
    }
    # "a b a b" → [a b, b a, a b]; "b a" → [b a]; 1-token and empty docs
    # contribute nothing
    assert out == {"a b": 2, "b a": 2}
    top1 = ngram_counts(df, text_col="text", top_k=1).collect()
    assert [(r.ngram, r.n) for r in top1] == [("a b", 2)]  # tie → lexical


def test_per_group_hash_sample_deterministic(spark):
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        per_group_hash_sample,
    )

    rows = [(g, i) for g in ("x", "y") for i in range(20)]
    df = spark.createDataFrame(rows, "g string, k bigint")
    out1 = sorted(
        (r.g, r.k)
        for r in per_group_hash_sample(
            df, group_cols=["g"], key_cols=["k"], k=3
        ).collect()
    )
    out2 = sorted(
        (r.g, r.k)
        for r in per_group_hash_sample(
            df.repartition(7), group_cols=["g"], key_cols=["k"], k=3
        ).collect()
    )
    assert out1 == out2  # membership survives repartitioning
    assert len(out1) == 6 and len({g for g, _ in out1}) == 2


def test_chunk_binary_reassembles(spark):
    """Chunks cover the payload exactly: stripping each non-first chunk's
    overlap prefix and concatenating reproduces the original bytes; the
    tail chunk is short, never padded."""
    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        attach_fake_media,
        chunk_binary,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xyz"), (3, "")], "doc_id bigint, text string"
    )
    assets = attach_fake_media(docs, id_col="doc_id", payload_from="text")
    chunks = chunk_binary(assets, chunk_bytes=4, overlap_bytes=1)
    by_id = {}
    for r in sorted(
        chunks.collect(), key=lambda r: (r.asset_id, r.chunk_idx)
    ):
        piece = bytes(r.chunk) if r.chunk_idx == 0 else bytes(r.chunk)[1:]
        by_id[r.asset_id] = by_id.get(r.asset_id, b"") + piece
        assert r.chunk_len == len(bytes(r.chunk))
        assert r.chunk_len <= 4
    assert by_id[1] == b"abcdefghij"  # starts 1,4,7,10 → 4+3+3+... re-cover
    assert by_id[2] == b"xyz"
    assert by_id[3] == b""
    # overlap: consecutive chunks share 1 byte
    c1 = {r.chunk_idx: bytes(r.chunk) for r in chunks.collect() if r.asset_id == 1}
    for i in range(1, len(c1)):
        assert c1[i - 1][-1:] == c1[i][:1] or len(c1[i - 1]) < 4


def test_chunk_binary_cdc_covers_and_survives_insert(spark):
    """Content-defined chunking (VERDICT r10 #4): chunks exactly tile
    the payload (byte-exact reassembly), NULL/empty payloads yield no
    chunks, and — the property fixed-offset chunking cannot have — a
    3-byte INSERT near the front leaves almost every chunk digest
    unchanged (only the chunks overlapping the edit window differ),
    while chunk_binary's fixed offsets shift every later digest."""
    import hashlib
    import random

    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        chunk_binary,
        chunk_binary_cdc,
    )

    random.seed(7)
    a = bytes(random.randrange(256) for _ in range(2000))
    b = a[:137] + b"XYZ" + a[137:]
    df = spark.createDataFrame(
        [
            (1, bytearray(a)),
            (2, bytearray(b)),
            (3, None),
            (4, bytearray(b"")),
            (5, bytearray(b"ab")),  # shorter than the 8-byte window
        ],
        "asset_id int, payload binary",
    )
    rows = chunk_binary_cdc(df, avg_chunk_bytes=64).collect()
    by = {}
    for r in sorted(rows, key=lambda r: (r.asset_id, r.chunk_idx)):
        by.setdefault(r.asset_id, []).append(r)
    # exact tiling + reassembly
    for aid, payload in ((1, a), (2, b), (5, b"ab")):
        off = 1
        for r in by[aid]:
            assert r.chunk_off == off, (aid, r)
            assert r.chunk_len == len(bytes(r.chunk)) >= 1
            off += r.chunk_len
        assert b"".join(bytes(r.chunk) for r in by[aid]) == payload
    assert 3 not in by and 4 not in by  # NULL and empty: no chunks
    assert len(by[5]) == 1  # sub-window payload = one chunk
    # insert-shift robustness: CDC shares all but the edited chunk
    da = [hashlib.md5(bytes(r.chunk)).hexdigest() for r in by[1]]
    db = [hashlib.md5(bytes(r.chunk)).hexdigest() for r in by[2]]
    shared_cdc = len(set(da) & set(db))
    assert shared_cdc >= len(da) - 2, (len(da), shared_cdc)
    # fixed-offset control: every chunk after the insert shifts
    fa = {
        hashlib.md5(bytes(r.chunk)).hexdigest()
        for r in chunk_binary(
            df.filter("asset_id = 1"), chunk_bytes=64
        ).collect()
    }
    fb = {
        hashlib.md5(bytes(r.chunk)).hexdigest()
        for r in chunk_binary(
            df.filter("asset_id = 2"), chunk_bytes=64
        ).collect()
    }
    assert len(fa & fb) <= 3 < shared_cdc
    # boundary determinism: same payload → identical chunking
    again = chunk_binary_cdc(
        df.filter("asset_id = 1"), avg_chunk_bytes=64
    ).collect()
    assert sorted(
        (r.chunk_idx, r.chunk_off, r.chunk_len) for r in again
    ) == [(r.chunk_idx, r.chunk_off, r.chunk_len) for r in by[1]]
    # xxhash64 SCALE tier: same tiling + insert-shift properties, its
    # own (different) boundary positions
    xa = sorted(
        chunk_binary_cdc(
            df.filter("asset_id = 1"), avg_chunk_bytes=64,
            hash_fn="xxhash64",
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    xb = sorted(
        chunk_binary_cdc(
            df.filter("asset_id = 2"), avg_chunk_bytes=64,
            hash_fn="xxhash64",
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert b"".join(bytes(r.chunk) for r in xa) == a
    assert b"".join(bytes(r.chunk) for r in xb) == b
    dxa = {hashlib.md5(bytes(r.chunk)).hexdigest() for r in xa}
    dxb = {hashlib.md5(bytes(r.chunk)).hexdigest() for r in xb}
    assert len(dxa & dxb) >= len(dxa) - 2


def test_interval_overlap_join_exact_once(spark):
    """A pair sharing MANY grid cells is still emitted exactly once
    (first-shared-cell rule); non-overlapping and wrong-key pairs drop;
    touching-at-boundary half-open intervals do NOT overlap."""
    from bigdata_retailrocket_recsys_spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [
        ("k1", 1, 0, 1000),     # spans 10 cells at cell=100
        ("k1", 2, 50, 950),     # overlaps 1 across many cells
        ("k1", 3, 1000, 1100),  # touches 1 at 1000 → no overlap (half-open)
        ("k2", 4, 0, 1000),     # different key
    ]
    df = spark.createDataFrame(
        rows, "key string, iid bigint, start_us bigint, end_us bigint"
    )
    out = interval_overlap_join(
        df,
        df,
        start_col="start_us",
        end_col="end_us",
        cell=100,
        key_cols=["key"],
        extra_cond=__import__("pyspark.sql.functions", fromlist=["col"]).col(
            "a_iid"
        )
        < __import__("pyspark.sql.functions", fromlist=["col"]).col("b_iid"),
    )
    pairs = sorted((r.a_iid, r.b_iid) for r in out.collect())
    assert pairs == [(1, 2)]


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    """Updates replace matching keys, new keys append, survivors carry
    over — and the target snapshot is untouched (copy-on-write)."""
    from bigdata_retailrocket_recsys_spark.sources.writers import (
        upsert_parquet,
    )

    t = str(tmp_path / "v1")
    o = str(tmp_path / "v2")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    ).write.parquet(t)
    updates = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k bigint, v string"
    )
    merged = {
        r.k: r.v
        for r in upsert_parquet(
            spark, t, updates, key_cols=["k"], out_path=o
        ).collect()
    }
    assert merged == {1: "a", 2: "B", 3: "c", 4: "D"}
    original = {r.k: r.v for r in spark.read.parquet(t).collect()}
    assert original == {1: "a", 2: "b", 3: "c"}


def test_minhash_estimates_jaccard(spark):
    """MinHash contract: identical docs share the full signature (always
    bucketed together); disjoint docs agree only by hash collision; and
    signature agreement ≈ Jaccard similarity for overlapping docs (the
    reason LSH banding finds near-dups). Deterministic (xxhash64 seeds,
    no RNG)."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " tail"  # high Jaccard
    far = "completely different tokens nothing shared at all here truly"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)],
        "doc_id bigint, text string",
    )
    sigs = {
        r.doc: r.sig
        for r in minhash_signatures(
            docs, id_col="doc_id", text_col="text", shingle_n=3, num_hashes=16
        ).collect()
    }
    assert sigs[1] == sigs[2]  # identical text → identical signature
    agree_near = sum(a == b for a, b in zip(sigs[1], sigs[3])) / 16
    agree_far = sum(a == b for a, b in zip(sigs[1], sigs[4])) / 16
    assert agree_near > agree_far
    assert agree_far == 0.0

    pairs = {
        (r.doc_a, r.doc_b): r.n_shared_bands
        for r in minhash_lsh_candidates(
            docs, id_col="doc_id", text_col="text", shingle_n=3,
            num_hashes=16, bands=4,
        ).collect()
    }
    assert pairs[(1, 2)] == 4  # identical docs share every band
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_persisted_signatures_identical(spark, tmp_path):
    """The persisted-signature path (write (doc, sig) parquet once, band+
    join the table — the warehouse-scale form) is value-identical to the
    in-flight df= path on the same corpus, and rejects ambiguous input."""
    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures_table,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kw = dict(id_col="doc_id", text_col="text", shingle_n=3, num_hashes=16)

    in_memory = sorted(
        tuple(r) for r in minhash_lsh_candidates(docs, bands=4, **kw).collect()
    )

    sig_path = str(tmp_path / "sigs")
    minhash_signatures_table(docs, sig_path, **kw)
    persisted = sorted(
        tuple(r)
        for r in minhash_lsh_candidates(
            signatures=spark.read.parquet(sig_path), num_hashes=16, bands=4
        ).collect()
    )
    assert persisted == in_memory
    assert len(persisted) > 0

    with _pytest.raises(ValueError):
        minhash_lsh_candidates(docs, signatures=docs)
    with _pytest.raises(ValueError):
        minhash_lsh_candidates()


def test_cosine_topk_lsh_bucket_containment(spark):
    """Sign-LSH search contract: well-formed per-query ranks, no self
    match, every returned neighbor shares the query's bucket (the
    candidate-pruning invariant), and a single-bucket (bits so few all
    collide) run degrades to exact brute-force — same neighbors."""
    from bigdata_retailrocket_recsys_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_lsh,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 5").selectExpr(
        "vec_id as query_id", "embedding"
    )
    approx = cosine_topk_lsh(emb, queries, k=10, dim=16, bits=4).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(r.vec_id != qid for r in rows)

    # bits=0 → one bucket → identical to exact brute force
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    degraded = {
        (r.query_id, r.rank): r.vec_id
        for r in cosine_topk_lsh(
            emb, queries, k=5, dim=16, bits=0
        ).collect()
    }
    assert degraded == exact


def test_corrupt_csv_quarantine_counts(spark):
    """PERMISSIVE parse: 2 fully-valid lines parse clean; 3 malformed
    lines land in the quarantine bucket with the raw line preserved —
    nothing dropped, nothing fatal (the 100 TB ingest policy)."""
    from bigdata_retailrocket_recsys_spark.plans import QUERIES

    out = {
        r.parsed_ok: (r.n_rows, r.n_event_id_present)
        for r in QUERIES["q_scan_csv_corrupt"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert out[1] == (2, 2)  # rows 1 and 3 parse clean
    assert out[0] == (3, 2)  # 3 quarantined; 2 still salvage event_id


def test_compact_parquet_file_counts(spark, tmp_path):
    """64 tiny files compact to exactly ceil(rows/target); row multiset
    survives the rewrite."""
    from bigdata_retailrocket_recsys_spark.sources.writers import (
        compact_parquet,
    )

    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    df = spark.range(1000).withColumnRenamed("id", "v")
    df.repartition(64).write.parquet(frag)
    stats = compact_parquet(
        spark, frag, out, target_rows_per_file=300
    ).first()
    assert stats.files_before == 64
    assert stats.files_after == 4  # ceil(1000/300)
    assert stats.n_rows == 1000
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == list(range(1000))


def test_load_table_normalizes_both_ts_layouts(spark, tmp_path):
    """events.ts physical layout has varied across driver rounds:
    TIMESTAMP(NANOS) (round 1, read as int64 under nanosAsLong) vs
    TIMESTAMP(MICROS, naive) (round 2+, read as TIMESTAMP_NTZ). load_table
    must land both on identical UTC-instant µs TimestampType values, and
    events_stream must agree with load_table on each layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_retailrocket_recsys_spark.sources.readers import (
        events_stream,
        load_table,
    )

    us = [1_704_067_200_000_000, 1_704_067_200_000_001, None]
    rows = {
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "user_id": pa.array([10, 10, 11], type=pa.int64()),
        "event_type": pa.array(["view", "view", "purchase"]),
        "value": pa.array([1.0, 2.0, None], type=pa.float64()),
        "props": pa.array([None, "{}", None]),
    }
    ns_vals = [v * 1000 + 999 if v is not None else None for v in us]  # sub-µs tail
    for unit, vals in (("ns", ns_vals), ("us", us)):
        d = tmp_path / unit
        d.mkdir()
        t = pa.table(
            {**rows, "ts": pa.array(vals, type=pa.timestamp(unit))}
        ).select(["event_id", "ts", "user_id", "event_type", "value", "props"])
        pq.write_table(t, str(d / "events.parquet"))

    batches = {}
    for unit in ("ns", "us"):
        df = load_table(spark, str(tmp_path / unit), "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        batches[unit] = sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect()
        )
    # ns floors to µs → identical instants across layouts
    assert batches["ns"] == batches["us"]

    for unit in ("ns", "us"):
        stream = events_stream(spark, str(tmp_path / unit))
        assert dict(stream.dtypes)["ts"] == "timestamp"
        sink = f"t_ts_layout_{unit}"
        q = (
            stream.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r["event_id"], r["ts"])
            for r in spark.table(sink).select("event_id", "ts").collect()
        )
        # Event-time domain contract (readers.events_stream): the STREAM
        # seam filters NULL/pre-epoch ts (Structured Streaming's initial
        # watermark is epoch 0, so such rows would be dropped
        # operator-dependently otherwise); batch load_table keeps them.
        expected = [(e, t) for (e, t) in batches[unit] if t is not None]
        assert got == expected


def test_embedding_cosine_lsh_recall_vs_exact(spark):
    """embedding_cosine_pairs_lsh is candidates(sign-LSH)→verify(exact
    cosine): every emitted pair must also be an exact pair (verify step ⇒
    precision 1.0), and recall vs the exact all-pairs operator must hold at
    the default 12×8 banding — planted near-dups at cosine ≈0.99 and
    mid-band pairs near the 0.8 threshold."""
    import numpy as np

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_lsh,
    )

    rng = np.random.RandomState(7)
    dim = 64
    base = rng.randn(120, dim)
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    nid = len(base)
    for i in range(0, 40):  # tight near-dups, cosine ≈ 0.99+
        rows.append((nid, (base[i] + 0.08 * rng.randn(dim)).tolist()))
        nid += 1
    for i in range(40, 70):  # looser copies, cosine scattered around 0.8
        rows.append((nid, (base[i] + 0.55 * rng.randn(dim)).tolist()))
        nid += 1
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(df, min_cosine=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs_lsh(df, dim=dim, min_cosine=0.8).collect()
    }
    assert len(exact) >= 40  # the plant worked
    assert lsh <= exact  # exact-cosine verify ⇒ no false positives
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(exact)} exact pairs"


def test_events_generator_source_parallel_deterministic(spark):
    """Python Data Source generator: one Spark task per declared partition,
    exact row count on uneven splits, and bit-identical output across reads
    (closed-form columns, no RNG state)."""
    from bigdata_retailrocket_recsys_spark.sources.generator import (
        register_events_generator,
    )

    register_events_generator(spark)

    def gen(rows, parts):
        return (
            spark.read.format("bdrr_events_gen")
            .option("rows", rows)
            .option("partitions", parts)
            .load()
        )

    df = gen(1003, 4)  # uneven: ceil split 251/251/251/250
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1003
    a = sorted(map(tuple, gen(1003, 4).collect()))
    b = sorted(map(tuple, gen(1003, 7).collect()))
    assert a == b  # partitioning is a parallelism knob, not a semantics knob


def test_events_generator_filter_pushdown(spark):
    """pushFilters: event_id range/point predicates clip the generated row
    range (never generated, not post-filtered); other predicates are
    returned as residuals for Spark. Semantics must equal post-filtering."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
    )

    from bigdata_retailrocket_recsys_spark.sources.generator import (
        EventsGenReader,
        register_events_generator,
    )

    r = EventsGenReader({"rows": "1000", "partitions": "4"})
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 100),
                LessThan(("event_id",), 260),
                EqualTo(("event_type",), "view"),  # not consumable
            ]
        )
    )
    assert [type(f).__name__ for f in residual] == ["EqualTo"]
    parts = r.partitions()
    assert parts[0].start == 100 and parts[-1].end == 260
    assert sum(p.end - p.start for p in parts) == 160

    register_events_generator(spark)
    base = (
        spark.read.format("bdrr_events_gen")
        .option("rows", 5000)
        .option("partitions", 4)
        .load()
    )
    from pyspark.sql import functions as F

    pred = (
        (F.col("event_id") >= 1200)
        & (F.col("event_id") < 1500)
        & (F.col("event_type") == "view")
    )
    pushed = sorted(map(tuple, base.filter(pred).collect()))
    # same source read fully, filtered in Spark only (fresh load, no pushdown
    # path shares state) — must be value-identical
    full = sorted(
        t for t in map(tuple, base.collect())
        if 1200 <= t[0] < 1500 and t[3] == "view"
    )
    assert pushed == full and len(pushed) == 60


def test_redact_patterns(spark):
    from bigdata_retailrocket_recsys_spark.operators.text import redact_patterns

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.org or x@y.io thanks"),
            (2, "call +1 555-123-4567 or 555-987-6543 now"),
            (3, "clean text"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in redact_patterns(df).collect()}
    assert out[1].n_email == 2 and "[REDACTED]" in out[1].redacted
    assert "@" not in out[1].redacted
    assert out[2].n_phone == 2 and "4567" not in out[2].redacted
    assert out[3].redacted == "clean text" and out[3].n_email == 0
    assert out[4].redacted is None and out[4].n_email is None


def test_chunk_tokens_overlap_and_clip(spark):
    from bigdata_retailrocket_recsys_spark.operators.text import chunk_tokens

    toks = " ".join(str(i) for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, toks), (2, "a b"), (3, None)], "doc_id bigint, text string"
    )
    rows = chunk_tokens(df, size=5, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 1,4,7 (stride 3, last start ≤ len-overlap=8)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in c1] == ["0 1 2 3 4", "3 4 5 6 7", "6 7 8 9"]
    assert [r.n_tokens for r in c1] == [5, 5, 4]  # final chunk clipped
    assert [r.chunk_idx for r in c1] == [0, 1, 2]
    # doc 2: shorter than size → single partial chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b"
    # NULL text dropped
    assert 3 not in by_doc
    # every token appears in ≥1 chunk
    covered = set(t for r in c1 for t in r.chunk_text.split())
    assert covered == set(toks.split())


def test_token_repetition_flag(spark):
    from bigdata_retailrocket_recsys_spark.operators.text import token_repetition

    df = spark.createDataFrame(
        [(1, "spam spam spam spam eggs"), (2, "all tokens here differ fully")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in token_repetition(df).collect()}
    assert out[1].n_tokens == 5 and out[1].n_distinct_tokens == 2
    assert out[1].top_token_count == 4 and out[1].is_repetitive == 1
    assert out[2].n_distinct_tokens == 5 and out[2].is_repetitive == 0


def test_contamination_check(spark):
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        contamination_check,
    )

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "lorem ipsum dolor sit amet")],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps high"),  # 3/4 shingles in train
            (11, "completely novel eval content here"),  # 0 matched
            (12, None),  # no shingles → absent from output
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in contamination_check(train, ev).collect()}
    assert out[10].n_shingles == 4 and out[10].n_matched == 3
    assert out[10].contaminated == 1
    assert out[11].n_matched == 0 and out[11].contaminated == 0
    assert 12 not in out


def test_w2v_embeddings_invariants(spark):
    """q_w2v_embed's rows-only invariants (VERDICT r2 #5 audit): one vector
    per observed category, constant dimensionality (cfg.embedding_dim),
    finite components — MLlib Word2Vec float values are seed/impl-specific
    so exact values are not asserted."""
    from pyspark.sql import functions as F2

    from bigdata_retailrocket_recsys_spark.pipelines.retailrocket import (
        PipelineConfig,
        sessionize_events,
        train_category_embeddings,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    raw = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id",
        "ts",
        F2.get_json_object("props", "$.k").cast("bigint").alias("item_id"),
        F2.col("event_type").alias("event"),
    )
    cfg = PipelineConfig()
    ev = sessionize_events(raw, cfg).withColumn(
        "category_id", F2.col("item_id") % 20
    )
    emb = train_category_embeddings(ev, cfg)
    rows = emb.collect()
    cats_in_corpus = {
        r.category_id
        for r in ev.filter(F2.col("category_id").isNotNull())
        .select("category_id")
        .distinct()
        .collect()
    }
    assert {r.category_id for r in rows} <= cats_in_corpus
    assert len(rows) > 0
    dims = {len(r.vector) for r in rows}
    assert dims == {cfg.embedding_dim}
    import math

    assert all(math.isfinite(x) for r in rows for x in r.vector)


def test_zorder_files_cover_small_hyperrectangles(spark, tmp_path):
    """Z-order layout invariant: each output file covers a small
    hyper-rectangle of the (a, b) key space, so the SUM of per-file
    hypervolumes is far below the full-space volume × #files that a
    key-agnostic layout would give — this is exactly why min/max stats can
    skip files on EITHER column's predicate."""
    from pyspark.sql import functions as F2

    from bigdata_retailrocket_recsys_spark.sources.writers import write_zordered

    n, side = 4096, 64  # 64×64 grid, one row per cell
    df = spark.range(n).select(
        (F2.col("id") % side).alias("a"),
        (F2.col("id") / side).cast("bigint").alias("b"),
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, zorder_by=["a", "b"], bits=6, num_files=16)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F2.input_file_name().alias("f"))
        .agg(
            (F2.max("a") - F2.min("a") + 1).alias("wa"),
            (F2.max("b") - F2.min("b") + 1).alias("wb"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    vol = sum(r.wa * r.wb for r in per_file)
    # ideal: 16 disjoint rectangles totalling 4096; random layout: every
    # file spans the full 64×64 space → 16×4096. Z-order must land within
    # 2× of ideal.
    assert vol <= 2 * n, f"hypervolume {vol} vs ideal {n}"
    # and every row survives the layout round-trip
    assert spark.read.parquet(out).count() == n


def test_ivf_at_rest_matches_in_memory(spark, tmp_path):
    """The persisted cell-partitioned IVF index (write once, probe with
    partition pruning) returns the SAME neighbors as the in-memory
    cosine_topk_ivf at the same seed/n_cells/nprobe — the layout changes
    where the bytes live, not the answer."""
    from bigdata_retailrocket_recsys_spark.operators.similarity import (
        cosine_topk_ivf,
        cosine_topk_ivf_at_rest,
        ivf_write_at_rest,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 5").selectExpr(
        "vec_id as query_id", "embedding"
    )
    in_memory = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in cosine_topk_ivf(
            emb, queries, k=10, n_cells=8, nprobe=3
        ).collect()
    )

    idx = str(tmp_path / "ivf")
    ivf_write_at_rest(emb, idx, n_cells=8)
    at_rest = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in cosine_topk_ivf_at_rest(
            spark, idx, queries, k=10, nprobe=3
        ).collect()
    )
    assert at_rest == in_memory
    assert len(at_rest) > 0


def test_embed_cosine_all_pairs_guard_trips(spark):
    """The calibration-tier all-pairs cosine must REFUSE a block larger
    than max_block_rows (quadratic blowup guard) — and still run when the
    guard is explicitly disabled or the blocks are under the limit."""
    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embedding_cosine_pairs,
    )

    rows = [(i, "hot" if i < 8 else "cold", [1.0, float(i)]) for i in range(10)]
    df = spark.createDataFrame(
        rows, "vec_id int, label string, embedding array<double>"
    )

    with _pytest.raises(ValueError, match="max_block_rows"):
        embedding_cosine_pairs(
            df, block_col="label", min_cosine=-1.0, max_block_rows=5
        )
    # ungrouped (single global block) must trip on total rows too
    with _pytest.raises(ValueError, match="max_block_rows"):
        embedding_cosine_pairs(df, min_cosine=-1.0, max_block_rows=5)

    ok = embedding_cosine_pairs(
        df, block_col="label", min_cosine=-1.0, max_block_rows=8
    )
    n_under = ok.count()
    assert n_under == 8 * 7 // 2 + 2 * 1 // 2
    disabled = embedding_cosine_pairs(
        df, block_col="label", min_cosine=-1.0, max_block_rows=None
    )
    assert disabled.count() == n_under


def test_kfold_assign_stable_balanced_exhaustive(spark):
    """Fold ids cover 0..k-1, depend only on the key (two computations
    agree), and are roughly balanced; k<2 is refused."""
    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.splits import kfold_assign

    df = spark.range(2000).selectExpr("id")
    a = {r.id: r.fold for r in kfold_assign(df, key_cols=["id"], k=5).collect()}
    b = {r.id: r.fold for r in kfold_assign(df, key_cols=["id"], k=5).collect()}
    assert a == b
    assert set(a.values()) == {0, 1, 2, 3, 4}
    from collections import Counter

    sizes = Counter(a.values())
    for fold, n in sizes.items():
        assert 300 <= n <= 500, (fold, n)  # ~400 expected per fold
    # membership is content-defined: a subset keeps identical assignments
    sub = {
        r.id: r.fold
        for r in kfold_assign(
            df.filter("id < 100"), key_cols=["id"], k=5
        ).collect()
    }
    assert all(a[i] == f for i, f in sub.items())
    with _pytest.raises(ValueError):
        kfold_assign(df, key_cols=["id"], k=1)


def test_feature_hash_index_range_null_salt(spark):
    """Indices land in [0, n); NULL category stays NULL (not bucket 0);
    salts decorrelate; values are deterministic."""
    from bigdata_retailrocket_recsys_spark.operators.features import (
        feature_hash_index,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(str(i),) for i in range(200)] + [(None,)], "v string"
    )
    out = df.select(
        "v",
        feature_hash_index("v", n_buckets=16).alias("i0"),
        feature_hash_index("v", n_buckets=16, salt="s1").alias("i1"),
    ).collect()
    nulls = [r for r in out if r.v is None]
    assert len(nulls) == 1 and nulls[0].i0 is None and nulls[0].i1 is None
    vals = [r for r in out if r.v is not None]
    assert all(0 <= r.i0 < 16 and 0 <= r.i1 < 16 for r in vals)
    assert len({r.i0 for r in vals}) == 16  # 200 values fill 16 buckets
    assert any(r.i0 != r.i1 for r in vals)  # salt changes the mapping


def test_target_encode_oof_excludes_own_fold(spark):
    """Every row's encoding equals the mean target of its category over
    the OTHER folds, recomputed independently in Python; categories seen
    in only one fold take the global out-of-fold mean."""
    from bigdata_retailrocket_recsys_spark.operators.features import (
        target_encode_oof,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = target_encode_oof(
        docs, cat_col="lang", target_col="n_chars", key_cols=["doc_id"], k=3
    ).select("doc_id", "lang", "n_chars", "fold", "te").collect()

    by_cat_fold: dict = {}
    by_fold: dict = {}
    for r in rows:
        by_cat_fold.setdefault((r.lang, r.fold), [0, 0])
        by_cat_fold[(r.lang, r.fold)][0] += r.n_chars
        by_cat_fold[(r.lang, r.fold)][1] += 1
        by_fold.setdefault(r.fold, [0, 0])
        by_fold[r.fold][0] += r.n_chars
        by_fold[r.fold][1] += 1
    tot = [sum(v[0] for v in by_fold.values()), sum(v[1] for v in by_fold.values())]
    for r in rows:
        cs = sum(v[0] for (c, _), v in by_cat_fold.items() if c == r.lang)
        cc = sum(v[1] for (c, _), v in by_cat_fold.items() if c == r.lang)
        fs, fc = by_cat_fold[(r.lang, r.fold)]
        if cc - fc > 0:
            expect = (cs - fs) / (cc - fc)
        else:
            gs, gc = by_fold[r.fold]
            expect = (tot[0] - gs) / (tot[1] - gc)
        assert r.te == expect, (r.doc_id, r.te, expect)


def test_jaccard_persisted_shingles_identical(spark, tmp_path):
    """The persisted-shingle path (shingle_table once, shingles= scan) is
    value-identical to the in-flight df= path, and ambiguous input is
    rejected."""
    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_table,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kw = dict(block_cols=["lang", "source"], min_jaccard=0.5)

    in_memory = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, id_col="doc_id", text_col="text", shingle_n=1, **kw
        ).collect()
    )
    sh_path = str(tmp_path / "shingles")
    shingle_table(
        docs, sh_path, id_col="doc_id", text_col="text", shingle_n=1,
        block_cols=["lang", "source"],
    )
    persisted = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            shingles=spark.read.parquet(sh_path), **kw
        ).collect()
    )
    assert persisted == in_memory
    assert len(persisted) > 0

    with _pytest.raises(ValueError):
        ngram_jaccard_pairs()
    with _pytest.raises(ValueError):
        ngram_jaccard_pairs(docs, shingles=spark.read.parquet(sh_path))


def test_negative_samples_match_python_recompute(spark):
    """The full draw pipeline — popularity intervals over item-ordered
    cumulative weights, md5-mod draws, strict positive filtering —
    reproduced independently in Python must give the exact same set."""
    import hashlib

    from bigdata_retailrocket_recsys_spark.operators.features import (
        popularity_negative_samples,
    )

    pairs = [(1, 10), (1, 11), (2, 10), (2, 12), (3, 13), (3, 10), (4, 11)]
    df = spark.createDataFrame(pairs + pairs[:2], "user bigint, item bigint")
    got = {
        (r.user, r.item, r.j, r.neg_item)
        for r in popularity_negative_samples(
            df, user_col="user", item_col="item", k=4
        ).collect()
    }

    pos = set(pairs)
    from collections import Counter

    wt = Counter(i for _, i in pos)
    items = sorted(wt)
    lo, acc = {}, 0
    for it in items:
        lo[it] = acc
        acc += wt[it]
    exp = set()
    for u, i in pos:
        for j in range(4):
            h = (
                int(
                    hashlib.md5(f"{u}\x1f{i}\x1f{j}".encode()).hexdigest()[:8],
                    16,
                )
                % acc
            )
            neg = next(it for it in items if lo[it] <= h < lo[it] + wt[it])
            if (u, neg) not in pos:
                exp.add((u, i, j, neg))
    assert got == exp
    assert len(got) > 0


def test_negative_samples_weights_and_strictness(spark):
    """Explicit weights= steer the draw distribution (a 998/1000-weight
    item dominates); negatives never collide with any of the user's
    positives; at most k draws per positive; k<1 refused."""
    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.features import (
        popularity_negative_samples,
    )

    pos = spark.createDataFrame(
        [(u, i) for u in range(1, 21) for i in (1, 2)],
        "user bigint, item bigint",
    )
    w = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 998)], "item bigint, weight bigint"
    )
    rows = popularity_negative_samples(
        pos, user_col="user", item_col="item", k=5, weights=w
    ).collect()
    assert rows
    pos_set = {(r[0], r[1]) for r in pos.collect()}
    per_pos: dict = {}
    for r in rows:
        assert 0 <= r.j < 5
        assert (r.user, r.neg_item) not in pos_set
        per_pos[(r.user, r.item)] = per_pos.get((r.user, r.item), 0) + 1
    assert all(n <= 5 for n in per_pos.values())
    frac_heavy = sum(1 for r in rows if r.neg_item == 3) / len(rows)
    assert frac_heavy > 0.9, frac_heavy
    with _pytest.raises(ValueError):
        popularity_negative_samples(pos, user_col="user", item_col="item", k=0)


def test_incremental_exact_dedup_python_recompute(spark, tmp_path):
    """Batch rows whose digest is in the corpus are dropped; survivors
    dedup within-batch (keeper=min id); NULL-key rows always survive as
    their own group."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        content_digest_table,
        incremental_exact_dedup,
    )

    cdf = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, None)], "doc_id bigint, text string"
    )
    bdf = spark.createDataFrame(
        [(10, "a"), (11, "c"), (12, "c"), (13, None), (14, None), (15, "b")],
        "doc_id bigint, text string",
    )
    p = str(tmp_path / "dig")
    content_digest_table(cdf, p, key_cols=["text"])
    out = incremental_exact_dedup(
        bdf,
        corpus_digests=spark.read.parquet(p),
        key_cols=["text"],
        id_col="doc_id",
    ).collect()
    # "a"/"b" exist in the corpus → dropped; "c" dedups to keeper 11 (n=2);
    # each NULL-text row is its own survivor (corpus NULL at id 4 is NOT in
    # the digest table and cannot collide).
    assert {(r.keeper_id, r.n_dups) for r in out} == {(11, 2), (13, 1), (14, 1)}


def test_incremental_minhash_vs_corpus_equiv_full_lsh(spark, tmp_path):
    """A batch doc that copies a corpus doc is flagged; a fresh doc is
    not; and the batch-vs-corpus candidates equal the cross-set subset of
    a full within-union LSH run with the same parameters."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_candidates_vs_corpus,
        minhash_signatures_table,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "pack my box with five dozen liquor jugs before the long voyage"),
        (3, "how vexingly quick daft zebras jump across the frozen canal ice"),
    ]
    batch_rows = [
        (101, corpus_rows[0][1]),  # exact copy → must be flagged
        (102, "completely different unrelated sentence about orbital mechanics and tidal forces"),
    ]
    kw = dict(id_col="doc_id", text_col="text", shingle_n=3, num_hashes=16)
    cdf = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    bdf = spark.createDataFrame(batch_rows, "doc_id bigint, text string")
    p = str(tmp_path / "sigs")
    minhash_signatures_table(cdf, p, **kw)
    cands = {
        (r.batch_doc, r.corpus_doc, r.n_shared_bands)
        for r in minhash_lsh_candidates_vs_corpus(
            bdf, corpus_signatures=spark.read.parquet(p), bands=4, **kw
        ).collect()
    }
    assert 101 in {b for b, _, _ in cands}
    assert 102 not in {b for b, _, _ in cands}

    full = minhash_lsh_candidates(
        cdf.unionByName(bdf), bands=4, **kw
    ).collect()
    corpus_ids = {r[0] for r in corpus_rows}
    cross = {
        (r.doc_b, r.doc_a, r.n_shared_bands)
        for r in full
        if r.doc_a in corpus_ids and r.doc_b not in corpus_ids
    }
    assert cands == cross


def test_pack_sequences_tiles_docs_and_sequences(spark):
    """Per (shard, seq_id) the segments tile [0, seq_len) exactly (the
    shard's last sequence may be short); per doc the segments tile
    [0, n_tokens) contiguously across consecutive sequences; zero/NULL-
    length docs are dropped; seq_len<1 refused."""
    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.features import (
        pack_sequences,
    )

    rows = [(i, (i * 37) % 90 + 1) for i in range(200)] + [(500, 0), (501, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, nt int")
    L = 64
    segs = pack_sequences(
        df, id_col="doc_id", n_tokens_col="nt", seq_len=L, n_shards=4
    ).collect()

    nt = {i: n for i, n in rows if n}
    assert {r.doc_id for r in segs} == set(nt)
    by_seq: dict = {}
    by_doc: dict = {}
    for r in segs:
        assert 0 <= r.seq_offset < L and 0 < r.seg_len <= L
        by_seq.setdefault((r.shard, r.seq_id), []).append(r)
        by_doc.setdefault(r.doc_id, []).append(r)
    for (shard, seq_id), ss in by_seq.items():
        ss.sort(key=lambda r: r.seq_offset)
        pos = 0
        for r in ss:
            assert r.seq_offset == pos, (shard, seq_id, r)
            pos += r.seg_len
        last_seq = max(s for sh, s in by_seq if sh == shard)
        if seq_id != last_seq:
            assert pos == L, (shard, seq_id, pos)
    for doc, ss in by_doc.items():
        ss.sort(key=lambda r: r.doc_offset)
        pos = 0
        for r in ss:
            assert r.doc_offset == pos, (doc, r)
            pos += r.seg_len
        assert pos == nt[doc], (doc, pos)
    with _pytest.raises(ValueError):
        pack_sequences(df, id_col="doc_id", n_tokens_col="nt", seq_len=0)


def test_mixture_temperature_sample_rebalances_and_is_stable(spark):
    from pyspark.sql import functions as F

    from bigdata_retailrocket_recsys_spark.operators.splits import (
        mixture_temperature_sample,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "lang"
    )
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(base.values())

    out = mixture_temperature_sample(
        docs, key_cols=["doc_id"], domain_col="lang", budget=200, alpha=0.5
    )
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = sum(got.values())
    # hits the budget up to binomial hash noise
    assert abs(kept - 200) < 40
    # alpha<1 upweights the rarest domain relative to its raw share
    rare = min(base, key=base.get)
    assert got[rare] / kept > base[rare] / total
    # membership is content-defined: repartitioning changes nothing
    again = mixture_temperature_sample(
        docs.repartition(13), key_cols=["doc_id"], domain_col="lang",
        budget=200, alpha=0.5,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))

    # budget >= corpus keeps every row (rate capped at 1.0)
    allkept = mixture_temperature_sample(
        docs, key_cols=["doc_id"], domain_col="lang", budget=10 * total,
        alpha=0.5,
    )
    assert allkept.count() == total

    # alpha=1 degenerates to uniform budget-proportional sampling: every
    # domain gets the same keep rate B/N
    rates = (
        mixture_temperature_sample(
            docs, key_cols=["doc_id"], domain_col="lang", budget=200,
            alpha=1.0, rate_col="rate",
        )
        .select("lang", "rate").distinct().collect()
    )
    vals = {round(r.rate, 9) for r in rates}
    assert len(vals) == 1
    assert abs(next(iter(vals)) - 200 / total) < 1e-6


def test_connected_components_bigstar_chain_rounds(spark):
    """Large-star/small-star must label a 64-deep chain correctly in
    O(log² n) rounds — min-label propagation needs 63 rounds here; the
    star algorithm must stay under 12. Also: pair + singletons, and
    bit-equality with the min-label operator on the same graph."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        connected_components,
        connected_components_bigstar,
    )

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n + 3)], "node bigint")
    # chain 0-1-...-63, pair 64-65, singleton 66
    chain = [(i, i + 1) for i in range(n - 1)] + [(64, 65)]
    edges = spark.createDataFrame(chain, "src bigint, dst bigint")
    stats: dict = {}
    got = {
        r.node: r.cluster_id
        for r in connected_components_bigstar(
            nodes, edges, stats=stats
        ).collect()
    }
    expect = {i: 0 for i in range(n)} | {64: 64, 65: 64, 66: 66}
    assert got == expect
    assert stats["rounds"] <= 12, stats["rounds"]
    ref = {
        r.node: r.cluster_id
        for r in connected_components(nodes, edges, max_iter=70).collect()
    }
    assert got == ref


def test_connected_components_bigstar_string_ids(spark):
    """Star hooking relies only on a total order — string doc ids (the
    documents-table case) must work identically."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        connected_components_bigstar,
    )

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "node string"
    )
    edges = spark.createDataFrame(
        [("c", "b"), ("b", "a")], "src string, dst string"
    )
    got = {
        r.node: r.cluster_id
        for r in connected_components_bigstar(nodes, edges).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_negative_samples_shard_invariance(spark):
    """The sharded cumulative-weight line must be BIT-identical to the
    single-shard (legacy single-reducer) line for any n_shards: shards
    are order-contiguous ranges, so per-item [lo,hi) intervals equal the
    global prefix sums regardless of sharding. Also: a partitioned window
    must appear in the plan (no global-sort single reducer)."""
    from bigdata_retailrocket_recsys_spark.operators.features import (
        popularity_negative_samples,
    )

    pos = spark.createDataFrame(
        [(u, i) for u in range(40) for i in range(u % 7 + 1)],
        "user bigint, item bigint",
    )
    outs = []
    for ns in (1, 4, 32):
        df = popularity_negative_samples(
            pos, user_col="user", item_col="item", k=3, n_shards=ns
        )
        outs.append(sorted(map(tuple, df.collect())))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0
    # plan: the catalog cumsum window is PARTITIONED by __shard (no
    # global-sort single reducer on the item catalog)
    df = popularity_negative_samples(
        pos, user_col="user", item_col="item", k=3, n_shards=4
    )
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "windowspecdefinition(__shard" in plan, plan


def test_mixture_temperature_sample_null_domain_policy(spark):
    """NULL-domain rows are excluded up front: none appear in the output,
    AND they do not consume budget — the realized sample over the real
    domains is identical whether or not NULL-domain rows are present
    (the r4 advisor finding: NULL mass must not deflate keep rates)."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        mixture_temperature_sample,
    )

    base = [(f"k{i}", "en" if i % 3 else "de") for i in range(300)]
    clean = spark.createDataFrame(base, "k string, dom string")
    dirty = spark.createDataFrame(
        base + [(f"n{i}", None) for i in range(200)], "k string, dom string"
    )
    kw = dict(key_cols=["k"], domain_col="dom", budget=100, alpha=0.5)
    out_clean = sorted(
        map(tuple, mixture_temperature_sample(clean, **kw).collect())
    )
    out_dirty = sorted(
        map(tuple, mixture_temperature_sample(dirty, **kw).collect())
    )
    assert out_clean == out_dirty
    assert all(dom is not None for _, dom in out_dirty)
    assert len(out_dirty) > 0


def test_pack_sequences_sharded_by_default(spark):
    """The default must be the sharded (scale) tier, not the global
    single-reducer sort: with no n_shards argument, output spreads over
    multiple shards; n_shards=None remains the explicit single-line
    opt-in (all rows shard 0)."""
    from bigdata_retailrocket_recsys_spark.operators.features import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, 10) for i in range(300)], "doc_id bigint, nt int"
    )
    default_shards = {
        r.shard
        for r in pack_sequences(
            df, id_col="doc_id", n_tokens_col="nt", seq_len=16
        ).collect()
    }
    assert len(default_shards) > 1
    single = {
        r.shard
        for r in pack_sequences(
            df, id_col="doc_id", n_tokens_col="nt", seq_len=16, n_shards=None
        ).collect()
    }
    assert single == {0}


def test_resize_images_pil_real_decode(spark):
    """Integration: a real generated PNG decoded, resized, and re-encoded
    through mapInPandas when Pillow is importable (skips where it isn't —
    the sandbox has no codecs; a cluster image with Pillow runs this)."""
    import io

    import pytest as _pytest

    PIL_Image = _pytest.importorskip("PIL.Image")
    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        resize_images,
    )

    buf = io.BytesIO()
    PIL_Image.new("RGB", (8, 4), color=(10, 20, 30)).save(buf, format="PNG")
    assets = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, None)],
        "asset_id bigint, payload binary",
    )
    out = {
        r.asset_id: r
        for r in resize_images(
            assets, width=16, height=16, decode_stub="pil"
        ).collect()
    }
    img = PIL_Image.open(io.BytesIO(bytes(out[1].payload)))
    assert img.size == (16, 16)
    assert out[2].payload is None  # NULL quarantine survives the pil tier


def test_time_decay_popularity_hand_computed(spark):
    """Weights are exact bigint shifts: ref date = max event date; an
    event a days old scores 2^(cap-a), floored at 1 beyond cap. NULL
    ts/item rows are dropped."""
    from datetime import datetime

    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        time_decay_popularity,
    )

    rows = [
        (1, datetime(2024, 3, 10, 5)),   # age 0 -> 2^30
        (1, datetime(2024, 3, 9, 23)),   # age 1 -> 2^29
        (2, datetime(2024, 2, 1, 0)),    # age 38 > cap -> 2^0 = 1
        (2, datetime(2024, 3, 8, 0)),    # age 2 -> 2^28
        (None, datetime(2024, 3, 10, 0)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "item bigint, ts timestamp")
    got = {
        r.item: (r.decay_score, r.n_events)
        for r in time_decay_popularity(
            df, item_col="item", ts_col="ts", cap_half_lives=30
        ).collect()
    }
    assert got == {
        1: (2**30 + 2**29, 2),
        2: (2**28 + 1, 2),
    }

    # half_life_days=2: ages 0,1 -> unit 0; age 2 -> unit 1
    got2 = {
        r.item: r.decay_score
        for r in time_decay_popularity(
            df, item_col="item", ts_col="ts", half_life_days=2,
            cap_half_lives=10,
        ).collect()
    }
    assert got2[1] == 2**10 + 2**10 and got2[2] == 2**9 + 1


def test_connected_components_strict_nonconvergence_raises(spark):
    """A chain deeper than max_iter must raise loudly (silent partial
    labels over-segment clusters); strict=False restores best-effort."""
    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        connected_components,
    )

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    with _pytest.raises(RuntimeError, match="bigstar"):
        connected_components(nodes, edges, max_iter=3)
    out = connected_components(nodes, edges, max_iter=3, strict=False)
    assert out.count() == n  # partial labels still produced on opt-out


def test_connected_components_fused_convergence_signal(spark):
    """Both directions of the r13 fused (Observation-based) convergence
    count: an edgeless graph converges on round 1 (changed=0 read
    correctly — an always-positive misread would raise under strict with
    max_iter=1), and a 3-chain under max_iter=1 must STILL raise (a
    changed>0 misread as 0 would silently return partial labels)."""
    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node bigint")
    no_edges = spark.createDataFrame([], "src bigint, dst bigint")
    got = {
        r.node: r.cluster_id
        for r in connected_components(nodes, no_edges, max_iter=1).collect()
    }
    assert got == {i: i for i in range(4)}

    chain = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    with _pytest.raises(RuntimeError, match="bigstar"):
        connected_components(nodes, chain, max_iter=1)
    # and with enough rounds the same chain fully converges
    got2 = {
        r.node: r.cluster_id
        for r in connected_components(nodes, chain, max_iter=5).collect()
    }
    assert got2 == {i: 0 for i in range(4)}


def test_connected_components_bigstar_large_random_graph(spark):
    """5k-node random graph (mixed chains + hubs + singletons): bigstar
    must agree with a driver-side union-find exactly, and converge well
    under max_iter. Deterministic generator (no RNG seed plumbing)."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        connected_components_bigstar,
    )

    n = 5000
    # deterministic edge mix: local chains, long-range hops, hub spokes
    edges = (
        [(i, i + 1) for i in range(0, n - 1, 3)]
        + [(i, (i * 7919) % n) for i in range(0, n, 11)]
        + [((i * 104729) % n, (i * 15485863) % n) for i in range(0, n, 17)]
    )
    edges = [(a, b) for a, b in edges if a != b]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    stats: dict = {}
    got = {
        r.node: r.cluster_id
        for r in connected_components_bigstar(
            nodes, edf, stats=stats
        ).collect()
    }
    assert stats["rounds"] <= 15, stats["rounds"]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in range(n)}
    assert got == expect


def test_mixture_temperature_resample_upsamples_rare_domains(spark):
    """Rare domains with rate > 1 get repeated rows (rep up to
    ceil(rate)); realized total tracks the budget in expectation; NULL
    domains are dropped; membership is repartition-stable."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        mixture_temperature_resample,
    )

    rows = (
        [(f"c{i}", "common") for i in range(900)]
        + [(f"r{i}", "rare") for i in range(100)]
        + [(f"x{i}", None) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "k string, dom string")
    kw = dict(key_cols=["k"], domain_col="dom", budget=1000, alpha=0.5)
    out = mixture_temperature_resample(df, **kw)
    rows_out = out.collect()
    # w_common = 30/(30+10); rate_common = 1000*0.75/900 = 0.833;
    # rate_rare = 1000*0.25/100 = 2.5 -> every rare row appears >= 2 times
    per_dom = {}
    for r in rows_out:
        per_dom.setdefault(r.dom, []).append(r)
    assert None not in per_dom
    assert max(r.rep for r in per_dom["rare"]) >= 2
    assert all(r.rep == 1 for r in per_dom["common"])
    n_rare = len(per_dom["rare"])
    assert abs(n_rare - 250) <= 30, n_rare        # 100 * 2.5
    n_common = len(per_dom["common"])
    assert abs(n_common - 750) <= 60, n_common    # 900 * 0.833
    again = sorted(
        map(tuple, mixture_temperature_resample(df.repartition(13), **kw).collect())
    )
    assert sorted(map(tuple, rows_out)) == again


def test_lm_bigram_score_hand_computed(spark):
    """Bigram LM on a 3-doc corpus, hand-checked: P(w2|w1) = c12/c1 over
    corpus bigrams; doc score = mean of floor(ln(p)*1e6). Docs with < 2
    tokens are absent."""
    import math

    from bigdata_retailrocket_recsys_spark.operators.text import (
        lm_bigram_score,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "a c"), (4, "x"), (5, None)],
        "doc_id bigint, text string",
    )
    # corpus bigrams: d1: (a,b),(b,a),(a,b); d2: (a,b); d3: (a,c)
    # c(a,b)=3 c(b,a)=1 c(a,c)=1; c(a,.)=4 c(b,.)=1
    q_ab = math.floor(math.log(3 / 4) * 1e6)
    q_ba = math.floor(math.log(1 / 1) * 1e6)  # = 0
    q_ac = math.floor(math.log(1 / 4) * 1e6)
    got = {
        r.doc_id: (r.n_bigrams, r.lm_logprob_u, r.lm_score)
        for r in lm_bigram_score(df).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (3, 2 * q_ab + q_ba, (2 * q_ab + q_ba) / 3)
    assert got[2] == (1, q_ab, float(q_ab))
    assert got[3] == (1, q_ac, float(q_ac))


def test_triangle_counts_hand_graphs(spark):
    """K4: 4 triangles, every vertex in 3. Chain: none. Input edges may be
    duplicated/reversed/self-looped — canonicalization must absorb them."""
    from bigdata_retailrocket_recsys_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    # add noise: duplicates + self loop
    edges = spark.createDataFrame(
        k4 + [(1, 2), (2, 1), (3, 3)], "src bigint, dst bigint"
    )
    got = {r.vtx: r.n_tri for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src bigint, dst bigint"
    )
    assert triangle_counts(chain).count() == 0


def test_triangle_counts_star_plus_one(spark):
    """Hub star + one rim edge = exactly 1 triangle; hub's high degree
    must not blow up wedge fan-out (degree-orientation points star edges
    INTO the hub, so the hub generates zero wedges)."""
    from bigdata_retailrocket_recsys_spark.operators.graph import (
        triangle_counts,
    )

    star = [(0, i) for i in range(1, 40)] + [(1, 2)]
    got = {
        r.vtx: r.n_tri
        for r in triangle_counts(
            spark.createDataFrame(star, "src bigint, dst bigint")
        ).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1}


def test_global_ntile_matches_sql_ntile(spark):
    """Sharded global_ntile must equal the single-reducer SQL NTILE for
    every k and any shard count — including n not divisible by k."""
    from pyspark.sql import Window

    from bigdata_retailrocket_recsys_spark.operators.windows import (
        global_ntile,
    )

    df = spark.range(0, 103).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("metric")
    )
    order = [F.col("metric").asc(), F.col("id").asc()]
    for k in (1, 2, 4, 7):
        for shards in (1, 5, 32):
            got = {
                r.id: r.ntile
                for r in global_ntile(df, order, k, n_shards=shards).collect()
            }
            want = {
                r.id: r.ntile
                for r in df.withColumn(
                    "ntile", F.ntile(k).over(Window.orderBy(*order))
                ).collect()
            }
            assert got == want, (k, shards)


def test_token_budget_sample_greedy_head(spark):
    """Budget cut is a strict prefix in md5 order: an oversized doc at
    the head consumes budget and blocks everything after it (greedy
    head, not knapsack — pinned semantics). NULL text = 0 tokens; NULL
    ids dropped."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "x"),
            (2, "d e", "x"),
            (3, " ".join(["w"] * 50), "x"),
            (4, None, "x"),
            (None, "q q q", "x"),
            (5, "z", "y"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = token_budget_sample(docs, 6).collect()
    by_id = {r.doc_id: r for r in out}
    assert None not in by_id
    assert by_id[5].n_tok == 1 and by_id[5].cum_tok == 1  # own domain
    # within domain x: order is md5-based; whatever the order, every kept
    # row's cum_tok <= 6 and the kept set is a prefix (cum monotone)
    xs = sorted(
        (r for r in out if r.domain == "x"), key=lambda r: r.cum_tok
    )
    assert all(r.cum_tok <= 6 for r in xs)
    assert 3 not in by_id  # 50-token doc can never fit a 6-token budget


def test_next_item_eval_hand_computed(spark):
    """3 test cases vs a 3-item candidate list: hits at ranks 1 and 3,
    one miss. DCG gains: rank1 → 1e6, rank3 → floor(1e6/log2(4)) = 5e5."""
    from bigdata_retailrocket_recsys_spark.operators.evaluation import (
        next_item_eval,
        popularity_topk,
    )

    train = spark.createDataFrame(
        [(i, "a") for i in range(5)]
        + [(i, "b") for i in range(3)]
        + [(i, "c") for i in range(2)]
        + [(0, None)],
        "u int, item string",
    )
    topk = popularity_topk(train, item_col="item", k=3)
    assert {(r.item, r.rank) for r in topk.collect()} == {
        ("a", 1), ("b", 2), ("c", 3)
    }
    test = spark.createDataFrame(
        [("t1", "a"), ("t1", "c"), ("t2", "zzz")], "event_type string, item string"
    )
    got = {r.event_type: r for r in next_item_eval(test, topk).collect()}
    assert (got["t1"].n_test, got["t1"].n_hits) == (2, 2)
    assert got["t1"].hitrate_e6 == 1000000
    assert got["t1"].dcg_u == 1000000 + 500000
    assert (got["t2"].n_test, got["t2"].n_hits, got["t2"].dcg_u) == (1, 0, 0)


def test_domain_divergence_nonneg_and_zero_for_identical(spark):
    """KL ≥ 0 (up to µ-floor slack) and ≈0 when a domain's distribution
    equals the corpus distribution (two identical domains)."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        domain_divergence,
    )

    same = spark.createDataFrame(
        [(1, "a a b", "x"), (2, "a a b", "y")], "doc_id bigint, text string, source string"
    )
    rows = domain_divergence(same).collect()
    # both domains identical to corpus → per-term ln(1)=0 → kl_u = 0
    assert {r.domain: r.kl_u for r in rows} == {"x": 0, "y": 0}
    skewed = spark.createDataFrame(
        [(1, "a a a a", "x"), (2, "b b b b", "y")],
        "doc_id bigint, text string, source string",
    )
    for r in domain_divergence(skewed).collect():
        # KL(domain‖corpus) = ln 2 per token here → floor(ln2·1e6) each
        assert r.kl_u == 693147, r


def test_skipgram_pairs_hand_computed(spark):
    """Doc 'a b c' window=2 → fwd (a,b),(a,c),(b,c); symmetric counts."""
    from bigdata_retailrocket_recsys_spark.operators.sequences import (
        skipgram_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "x")], "doc_id bigint, text string"
    )
    got = {
        (r.center, r.context): r.n for r in skipgram_pairs(docs).collect()
    }
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1,
        ("a", "c"): 1, ("c", "a"): 1,
        ("b", "c"): 1, ("c", "b"): 1,
    }


def test_binary_auc_known_values(spark):
    """Perfect separation → 1.0; all-tied scores → 0.5 exactly; NaN and
    NULL-label rows excluded."""
    from bigdata_retailrocket_recsys_spark.operators.evaluation import (
        binary_auc,
    )

    perfect = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1), (float("nan"), 1)],
        "score double, y int",
    )
    r = binary_auc(perfect).first()
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)

    tied = spark.createDataFrame(
        [(0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)], "score double, y int"
    )
    r = binary_auc(tied).first()
    assert r.auc == 0.5 and r.auc_num2 == 2 * r.n_pos * r.n_neg // 2 * 1


def test_check_expectations_hand_computed(spark):
    """NULL predicate results are violations; uniqueness counts every
    row of a duplicated key; NULL keys exempt from uniqueness."""
    from bigdata_retailrocket_recsys_spark.operators.quality import (
        check_expectations,
        expect_between,
        expect_not_null,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (1, None), (2, 50.0), (None, 3.0), (3, 7.0)],
        "k int, v double",
    )
    rep = {
        r.rule: (r.n_violations, r.n_rows, r.passed)
        for r in check_expectations(
            df,
            [expect_not_null("k"), expect_between("v", 0.0, 10.0)],
            unique_cols=["k"],
        ).collect()
    }
    assert rep["not_null_k"] == (1, 5, 0)
    # violations: NULL v (unevaluable) + 50.0 out of range = 2
    assert rep["between_v"] == (2, 5, 0)
    # k=1 duplicated → both rows count; NULL k exempt
    assert rep["unique_k"] == (2, 5, 0)


def test_global_rank_partitioned_matches_window(spark):
    """Grouped sharded rank ≡ ROW_NUMBER over a partitioned window, for
    any shard count — groups contiguous in the range order."""
    from pyspark.sql import Window

    from bigdata_retailrocket_recsys_spark.operators.windows import (
        global_rank,
    )

    df = spark.range(0, 211).select(
        "id", (F.col("id") % 3).alias("g"), (F.col("id") * 17 % 97).alias("m")
    )
    order = [F.col("m").asc(), F.col("id").asc()]
    want = {
        r.id: r.rank
        for r in df.withColumn(
            "rank",
            F.row_number()
            .over(Window.partitionBy("g").orderBy(*order))
            .cast("bigint"),
        ).collect()
    }
    for shards in (1, 4, 64):
        got = {
            r.id: r.rank
            for r in global_rank(
                df, order, partition_by=["g"], n_shards=shards
            ).collect()
        }
        assert got == want, shards


def test_binary_auc_excludes_non_binary_labels(spark):
    """-1/+1 encodings (or Spark's signed % emitting -1) must not corrupt
    the rank-sum: non-{0,1} labels are excluded, not netted."""
    from bigdata_retailrocket_recsys_spark.operators.evaluation import (
        binary_auc,
    )

    df = spark.createDataFrame(
        [(0.1, 0), (0.9, 1), (0.5, -1), (0.6, 2), (0.7, None)],
        "score double, y int",
    )
    r = binary_auc(df).first()
    assert (r.n_pos, r.n_neg, r.auc) == (1, 1, 1.0)


def test_pagerank_exact_hand_computed(spark):
    """Star 1-2, 1-3, two rounds, hand-computed integer masses; a single
    symmetric edge is a fixed point at unit mass."""
    from bigdata_retailrocket_recsys_spark.operators.graph import (
        pagerank_exact,
    )

    star = spark.createDataFrame(
        [(1, 2), (1, 3)], "src bigint, dst bigint"
    )
    got = {r.vtx: r.mass for r in pagerank_exact(star, iters=2).collect()}
    assert got == {1: 1127500, 2: 936250, 3: 936250}

    pair = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    got = {r.vtx: r.mass for r in pagerank_exact(pair, iters=3).collect()}
    assert got == {1: 1000000, 2: 1000000}


def test_edge_jaccard_triangle_with_pendant(spark):
    """Triangle 1-2-3 plus pendant edge 3-4: edge (1,2) shares neighbor 3
    (J = 1/(2+2-1)); the pendant edge has no common neighbor (J = 0)."""
    from bigdata_retailrocket_recsys_spark.operators.graph import edge_jaccard

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 3), (2, 1)],  # dup + reversed noise
        ["src", "dst"],
    )
    out = {(r["u"], r["v"]): r for r in edge_jaccard(edges).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3), (3, 4)}
    assert out[(1, 2)]["common"] == 1
    assert out[(1, 2)]["deg_u"] == 2 and out[(1, 2)]["deg_v"] == 2
    assert abs(out[(1, 2)]["jaccard"] - 1 / 3) < 1e-12
    assert out[(3, 4)]["common"] == 0
    assert out[(3, 4)]["deg_u"] == 3 and out[(3, 4)]["deg_v"] == 1
    assert out[(3, 4)]["jaccard"] == 0.0


def test_boilerplate_spans_row_grain_and_within_doc_dedup(spark):
    """A span repeated TWICE inside one row counts once for that row;
    duplicated rows count separately; min_rows gates the output."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        boilerplate_spans,
    )

    span = "all rights reserved by acme"
    docs = spark.createDataFrame(
        [
            (1, f"{span} intro words {span}"),     # within-row repeat → 1
            (2, f"prefix {span} suffix"),
            (2, f"prefix {span} suffix"),          # duplicated row → counts
            (3, "totally unrelated text with no shared span at all"),
            (4, None),                             # NULL text dropped
        ],
        ["doc_id", "text"],
    )
    out = {
        r["ngram"]: r
        for r in boilerplate_spans(
            docs, id_col="doc_id", text_col="text", n=5, min_rows=3
        ).collect()
    }
    assert span in out
    assert out[span]["n_rows"] == 3
    assert out[span]["example_doc"] == 1
    # nothing below the prevalence gate leaks through
    assert all(r["n_rows"] >= 3 for r in out.values())


def test_transform_with_state_gate_or_runs(spark):
    """transformWithStateInPandas (Spark ≥4 stateful API) needs protobuf
    for its streaming runner channel. Where available, the bounded run
    must equal the batch GROUP BY; where not (this sandbox), the
    capability gate raises the documented NotImplementedError instead of
    crashing the executor mid-query."""
    from bigdata_retailrocket_recsys_spark.streaming.transform_state import (
        run_transform_state,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        try:
            run_transform_state(spark, "/root/testdata/sf0.001")
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError as ex:
            assert "protobuf" in str(ex)
        return
    out = {
        r["user_id"]: r
        for r in run_transform_state(spark, "/root/testdata/sf0.001").collect()
    }
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table
    from pyspark.sql import functions as F2

    ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(
        F2.col("user_id").isNotNull()
        & F2.col("value").isNotNull()
        & ~F2.isnan("value")
        & (F2.abs("value") != float("inf"))
    )
    exp = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(F2.count(F2.lit(1)).alias("n_events"))
        .collect()
    }
    assert set(out) == set(exp)
    assert all(out[u]["n_events"] == exp[u]["n_events"] for u in exp)


def test_extract_features_arrow_matches_pandas(spark):
    """The mapInArrow twin must agree with the mapInPandas path: integer
    features bit-equal, entropy to float tolerance (vectorized numpy
    accumulation order vs the Python loop)."""
    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        extract_media_features,
        extract_media_features_arrow,
    )

    assets = spark.createDataFrame(
        [
            (1, bytes(range(256)) * 3),
            (2, b"\x00" * 1000),
            (3, b""),
            (4, None),
            (5, b"spark-graft"),
        ],
        ["asset_id", "payload"],
    )
    # all-NULL partition: the Arrow path must emit typed (not null-typed)
    # columns or the mapInArrow schema contract fails
    nulls = spark.createDataFrame(
        [(10, None), (11, None)], assets.schema
    ).repartition(1)
    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        extract_media_features_arrow as _efa,
    )
    null_rows = _efa(nulls).collect()
    assert {r["asset_id"] for r in null_rows} == {10, 11}
    assert all(r["n_bytes"] is None for r in null_rows)
    # batch_hint=2 forces the RecordBatch re-slicing path (ADVICE r6 #2):
    # 5 rows → ≥3 out-batches, results must be identical to unsliced
    a = {
        r["asset_id"]: r
        for r in extract_media_features_arrow(
            assets, batch_hint=2
        ).collect()
    }
    p = {r["asset_id"]: r for r in extract_media_features(assets).collect()}
    assert set(a) == set(p) == {1, 2, 3, 4, 5}
    for k in a:
        for col in ("n_bytes", "feat_0", "feat_1", "feat_2", "feat_3"):
            assert a[k][col] == p[k][col], (k, col, a[k][col], p[k][col])
        ea, ep = a[k]["byte_entropy"], p[k]["byte_entropy"]
        assert (ea is None and ep is None) or abs(ea - ep) < 1e-9


def test_frequent_sequences_hand_case(spark):
    """3 users; 'a>b' appears (in order) for users 1 and 2 only; user 3
    has b before a. minSupport 0.5 of 3 users -> threshold 2."""
    from datetime import datetime as DT

    from bigdata_retailrocket_recsys_spark.operators.sequences import (
        frequent_sequences,
    )

    rows = [
        (1, DT(2024, 1, 1, 0, 0), 1, "a"),
        (1, DT(2024, 1, 1, 0, 1), 2, "b"),
        (2, DT(2024, 1, 1, 0, 0), 3, "a"),
        (2, DT(2024, 1, 1, 0, 0), 4, "b"),   # same ts: event_id breaks tie
        (3, DT(2024, 1, 1, 0, 0), 5, "b"),
        (3, DT(2024, 1, 1, 0, 1), 6, "a"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    out = {
        r["pattern"]: r["freq"]
        for r in frequent_sequences(ev, min_support=0.5).collect()
    }
    assert out["a"] == 3 and out["b"] == 3
    assert out["a>b"] == 2
    assert out.get("b>a", 0) in (0, 1) and "b>a" not in out  # freq 1 < 2


def test_k_core_peels_to_fixpoint(spark):
    """Triangle+tail graph: 2-core keeps exactly the triangle (the tail
    peels off transitively); every survivor holds >= k in-core degree."""
    from bigdata_retailrocket_recsys_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)],
        ["src", "dst"],
    )
    out = {r["vtx"]: r["deg"] for r in k_core(edges, 2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # invariant on a bigger random graph: every vertex of the k-core has
    # >= k neighbors inside the core, and re-running on the core is a
    # fixpoint (same vertex set)
    from pyspark.sql import functions as F2

    rnd = spark.range(4000).select(
        F2.pmod(F2.xxhash64("id"), 300).alias("src"),
        F2.pmod(F2.xxhash64("id", F2.lit(3)), 300).alias("dst"),
    )
    core = k_core(rnd, 4)
    rows = core.collect()
    assert rows, "4-core unexpectedly empty"
    assert min(r["deg"] for r in rows) >= 4
    vtxs = {r["vtx"] for r in rows}
    und = rnd.select(
        F2.least("src", "dst").alias("u"), F2.greatest("src", "dst").alias("v")
    ).filter(F2.col("u") != F2.col("v")).distinct()
    core_edges = und.filter(
        F2.col("u").isin(vtxs) & F2.col("v").isin(vtxs)
    )
    again = {
        r["vtx"]
        for r in k_core(core_edges, 4, src_col="u", dst_col="v").collect()
    }
    assert again == vtxs


def test_jsonl_audit_sink_commit_protocol(spark, tmp_path):
    """The custom writer's two-phase commit: after save(), only committed
    part files + a _SUCCESS manifest exist (no _tmp_ leftovers), and the
    manifest row count equals the data."""
    import json
    import os

    from bigdata_retailrocket_recsys_spark.sources.audit_sink import (
        AuditJsonlDataSource,
    )

    try:
        spark.dataSource.register(AuditJsonlDataSource)
    except Exception:
        pass
    path = str(tmp_path / "audit")
    df = spark.range(1000).selectExpr(
        "id AS event_id", "CAST(id % 3 AS STRING) AS event_type"
    ).repartition(4)
    df.write.format("jsonl_audit").option("path", path).mode("append").save()
    names = sorted(os.listdir(path))
    assert "_SUCCESS" in names
    assert not any(n.startswith("_tmp_") for n in names)
    parts = [n for n in names if n.startswith("part-")]
    assert len(parts) == 4
    manifest = json.load(open(os.path.join(path, "_SUCCESS")))
    assert manifest["rows"] == 1000 and manifest["parts"] == 4
    n_lines = sum(
        1 for p in parts for _ in open(os.path.join(path, p))
    )
    assert n_lines == 1000
    # overwrite semantics: a smaller overwrite-write must CLEAR the stale
    # parts, not leave a mixed directory behind a fresh _SUCCESS
    df2 = spark.range(100).selectExpr(
        "id AS event_id", "CAST(id % 3 AS STRING) AS event_type"
    ).repartition(2)
    df2.write.format("jsonl_audit").option("path", path).mode(
        "overwrite"
    ).save()
    names2 = sorted(os.listdir(path))
    parts2 = [n for n in names2 if n.startswith("part-")]
    assert len(parts2) == 2, names2
    manifest2 = json.load(open(os.path.join(path, "_SUCCESS")))
    assert manifest2 == {"rows": 100, "parts": 2}
    # append semantics (ADVICE r6 #1): a second append must NOT clobber
    # prior parts — numbering continues after the existing max index and
    # the manifest sums both commits, so part-*.jsonl readers always see
    # exactly what _SUCCESS claims
    df3 = spark.range(50).selectExpr(
        "id + 1000 AS event_id", "CAST(id % 3 AS STRING) AS event_type"
    ).repartition(1)
    df3.write.format("jsonl_audit").option("path", path).mode(
        "append"
    ).save()
    names3 = sorted(os.listdir(path))
    parts3 = [n for n in names3 if n.startswith("part-")]
    assert parts3 == ["part-00000.jsonl", "part-00001.jsonl",
                      "part-00002.jsonl"], names3
    manifest3 = json.load(open(os.path.join(path, "_SUCCESS")))
    assert manifest3 == {"rows": 150, "parts": 3}
    n_lines3 = sum(
        1 for p in parts3 for _ in open(os.path.join(path, p))
    )
    assert n_lines3 == 150
    # orphan recovery (ADVICE r7 #2): a commit that crashed after
    # renaming part files but before writing _SUCCESS leaves orphan
    # parts numbered past the committed prefix; the next append must
    # remove them (their data was never committed) so _SUCCESS always
    # equals what a part-*.jsonl glob reader sees
    with open(os.path.join(path, "part-00003.jsonl"), "w") as f:
        f.write('{"event_id": 666, "event_type": "orphan"}\n')
    df4 = spark.range(10).selectExpr(
        "id + 2000 AS event_id", "CAST(id % 3 AS STRING) AS event_type"
    ).repartition(1)
    df4.write.format("jsonl_audit").option("path", path).mode(
        "append"
    ).save()
    parts4 = sorted(
        n for n in os.listdir(path) if n.startswith("part-")
    )
    assert parts4 == ["part-00000.jsonl", "part-00001.jsonl",
                      "part-00002.jsonl", "part-00003.jsonl"], parts4
    manifest4 = json.load(open(os.path.join(path, "_SUCCESS")))
    assert manifest4 == {"rows": 160, "parts": 4}
    n_lines4 = sum(
        1 for p in parts4 for _ in open(os.path.join(path, p))
    )
    assert n_lines4 == 160  # the orphan row is gone, not double-counted
    # foreign manifest (ADVICE r8 #4): a _SUCCESS lacking 'parts' (never
    # produced by this sink — e.g. hand-written) must treat every
    # existing part as COMMITTED, not orphaned: nothing is deleted and
    # numbering continues after the highest existing part
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write('{"rows": 160}')
    df5 = spark.range(5).selectExpr(
        "id + 3000 AS event_id", "CAST(id % 3 AS STRING) AS event_type"
    ).repartition(1)
    df5.write.format("jsonl_audit").option("path", path).mode(
        "append"
    ).save()
    parts5 = sorted(
        n for n in os.listdir(path) if n.startswith("part-")
    )
    assert parts5 == ["part-00000.jsonl", "part-00001.jsonl",
                      "part-00002.jsonl", "part-00003.jsonl",
                      "part-00004.jsonl"], parts5
    manifest5 = json.load(open(os.path.join(path, "_SUCCESS")))
    assert manifest5 == {"rows": 165, "parts": 5}
    n_lines5 = sum(
        1 for p in parts5 for _ in open(os.path.join(path, p))
    )
    assert n_lines5 == 165  # all four prior parts survived intact
    # foreign manifest with an INACCURATE rows count (ADVICE r9 #3):
    # 'rows' can't be trusted when 'parts' is absent — the sink must
    # RECOUNT by line-counting the kept parts, so the rewritten
    # manifest equals what a glob reader sees, not 1 + 7
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write('{"rows": 1}')
    df6 = spark.range(7).selectExpr(
        "id + 4000 AS event_id", "CAST(id % 3 AS STRING) AS event_type"
    ).repartition(1)
    df6.write.format("jsonl_audit").option("path", path).mode(
        "append"
    ).save()
    manifest6 = json.load(open(os.path.join(path, "_SUCCESS")))
    assert manifest6 == {"rows": 172, "parts": 6}
    parts6 = sorted(n for n in os.listdir(path) if n.startswith("part-"))
    n_lines6 = sum(
        1 for p in parts6 for _ in open(os.path.join(path, p))
    )
    assert n_lines6 == 172


def test_bfs_distances_chain_and_cutoff(spark):
    from bigdata_retailrocket_recsys_spark.operators.graph import (
        bfs_distances,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)],  # 7-8 unreachable
        ["src", "dst"],
    )
    out = {
        r["node"]: r["min_hop"] for r in bfs_distances(edges, 1).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    capped = {
        r["node"]: r["min_hop"]
        for r in bfs_distances(edges, 1, max_hops=2).collect()
    }
    assert capped == {1: 0, 2: 1, 3: 2}


def test_bpe_train_deterministic_and_encode_reconstructs():
    """train_bpe is run-to-run deterministic (the committed DEFAULT_MERGES
    contract) and greedy encoding always reconstructs the input's
    non-space pretokens on concat — merges never lose or invent bytes."""
    from bigdata_retailrocket_recsys_spark.operators.text_bpe import (
        _PRETOKEN_RE,
        _SEED_CORPUS,
        DEFAULT_MERGES,
        bpe_encode,
        train_bpe,
    )

    again = train_bpe(_SEED_CORPUS, 256)
    # the seed corpus saturates (every word fully merged) before the 256
    # cap — training stops at the fixpoint, deterministically
    assert again == DEFAULT_MERGES and 150 <= len(DEFAULT_MERGES) <= 256
    for text in (
        "the quick brown fox",
        "userX added 3 items to the cart!!",
        "def f(x):\n    return x + 1",
        "",
        "   ",
    ):
        toks = bpe_encode(text)
        pretoks = [
            m.group(0)
            for m in _PRETOKEN_RE.finditer(text)
            if not (m.group(0) == " " or m.group(0).isspace())
        ]
        assert "".join(toks) == "".join(pretoks), text
        # merging can only shorten: token count between n_pretokens and
        # total chars
        assert len(pretoks) <= len(toks) <= sum(len(w) for w in pretoks)
    # seed-corpus words actually merge (the table is doing work)
    assert len(bpe_encode("the sessions")) < len("the sessions".replace(" ", ""))


def test_bpe_token_counts_matches_reference_encoder(spark):
    """The distributed mapInPandas counter must agree exactly with the
    pure-Python reference encoder, including NULL/empty/whitespace-only
    docs and repeated words (the per-batch word cache path)."""
    from bigdata_retailrocket_recsys_spark.operators.text_bpe import (
        _PRETOKEN_RE,
        bpe_encode,
        bpe_token_counts,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the the the the the"),
        (3, "SELECT user_id, COUNT(*) FROM events GROUP BY 1"),
        (4, None),
        (5, ""),
        (6, "   \t\n "),
        (7, "zzzqqq unseen wordzz 12345 !!"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_pretokens"])
        for r in bpe_token_counts(df).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    for did, text in rows:
        if text is None:
            assert got[did] == (None, None)
            continue
        exp_tokens = bpe_encode(text)
        exp_pre = [
            m.group(0)
            for m in _PRETOKEN_RE.finditer(text)
            if not (m.group(0) == " " or m.group(0).isspace())
        ]
        assert got[did] == (len(exp_tokens), len(exp_pre)), (did, text)


def test_token_budget_sample_precomputed_counts(spark):
    """n_tokens_col tier: the budget is charged against the supplied
    column (BPE counts), same md5 order and running-total cut as the
    whitespace tier; rows with NULL counts are DROPPED (unknown cost
    must not be admitted budget-free)."""
    import hashlib

    from bigdata_retailrocket_recsys_spark.operators.splits import (
        token_budget_sample,
    )

    rows = [(i, "d", f"doc {i}", (i % 7) * 10) for i in range(1, 41)]
    rows.append((99, "d", None, None))  # NULL count → dropped, not free
    df = spark.createDataFrame(rows, ["doc_id", "source", "text", "n_bpe"])
    budget = 600
    kept = {
        r["doc_id"]: (r["n_tok"], r["cum_tok"])
        for r in token_budget_sample(
            df, budget, n_tokens_col="n_bpe"
        ).collect()
    }
    assert 99 not in kept  # unknown cost never admitted
    # replay the greedy head in plain Python under the identical order
    order = sorted(
        (r for r in rows if r[3] is not None),
        key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
    )
    # prefix cut (not skip-and-continue): the running total includes
    # every doc in order, keep iff it still fits — mirrors the window
    cum, exp = 0, {}
    for did, _, _, ntok in order:
        cum += ntok
        if cum <= budget:
            exp[did] = (ntok, cum)
    assert kept == exp
    assert max((c for _, c in kept.values()), default=0) <= budget


def test_simhash_md5_matches_python_replay(spark):
    """simhash_md5's nibble/bit/vote convention must match the documented
    formula exactly (hashlib md5 ≡ engine md5) — this locks the Spark
    side to the same convention the DuckDB oracle generates; banded md5
    pairs must equal brute-force pairs from the signatures."""
    import hashlib

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        simhash_md5,
        simhash_near_pairs,
    )

    docs = [
        (1, "a b c d"),
        (2, "a b c e"),
        (3, "x y z"),
        (4, ""),
        (5, "a b c d"),  # identical text to 1 → identical signature
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc"]: r["simhash"]
        for r in simhash_md5(df, shingle_n=1).collect()
    }

    def py_sig(text):
        toks = set(text.strip().split()) if text.strip() else {""}
        votes = [0] * 64
        for t in sorted(toks):
            hx = hashlib.md5(t.encode()).hexdigest()
            for j in range(64):
                nib = int(hx[j // 4], 16)
                votes[j] += 1 if (nib >> (j % 4)) & 1 else -1
        sig = 0
        for j in range(64):
            if votes[j] > 0:
                sig |= 1 << j
        # Spark builds the signature with signed bigint shifts: bit 63
        # wraps negative
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    for did, text in docs:
        assert got[did] == py_sig(text), (did, text)
    assert got[1] == got[5]

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(
            df, shingle_n=1, max_hamming=3, n_bands=4, hash_fn="md5"
        ).collect()
    }
    exp = {}
    ids = sorted(got)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(
                (got[ids[i]] ^ got[ids[j]]) & ((1 << 64) - 1)
            ).count("1")
            if h <= 3:
                exp[(ids[i], ids[j])] = h
    assert pairs == exp and (1, 5) in pairs and pairs[(1, 5)] == 0


def test_quality_filter_matches_score_thresholds(spark):
    """quality_filter (the narrow gate) must keep exactly the ids that
    quality_score's feature table says clear the same thresholds — the
    shared _quality_exprs tree guarantees it can't drift."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        quality_filter,
        quality_score,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    via_filter = {
        r.doc_id
        for r in quality_filter(
            docs, min_quality=0.5, min_tokens=5
        ).select("doc_id").collect()
    }
    scores = quality_score(docs)
    via_table = {
        r.doc_id
        for r in scores.filter(
            (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5)
        ).collect()
    }
    assert via_filter == via_table and via_filter


def test_strip_boilerplate_hand_case(spark):
    """Spans shared by >= min_rows docs are removed wherever they occur
    (overlapping coverage unions); unique content survives in order;
    fully-boilerplate docs come back empty rather than vanishing."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        strip_boilerplate,
    )

    bp = "c o p y r i g h t"  # 9 tokens; every 5-gram inside is shared
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {bp} gamma"),
            (2, f"{bp} delta epsilon"),
            (3, f"zeta {bp}"),
            (4, bp),                      # fully covered -> empty
            (5, "unique text with no shared spans at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in strip_boilerplate(docs, n=5, min_rows=3).collect()
    }
    assert out[1] == (12, 9, "alpha beta gamma")
    assert out[2] == (11, 9, "delta epsilon")
    assert out[3] == (10, 9, "zeta")
    assert out[4] == (9, 9, "")
    assert out[5] == (8, 0, "unique text with no shared spans at all")


def test_int8_topk_recall_vs_exact_cosine(spark):
    """Symmetric (zero-preserving) int8 codes must preserve neighbor
    ranks: recall@10 vs exact brute-force cosine >= 0.8 per query on the
    fixture corpus. (The per-dim MIN-MAX codes measure ~0 recall here —
    their additive shift ranks by component sums; that split is why
    dot_topk_int8 quantizes symmetrically.)"""
    from bigdata_retailrocket_recsys_spark.operators.similarity import (
        cosine_topk,
        dot_topk_int8,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact: dict = {}
    for r in cosine_topk(emb, qs, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    i8: dict = {}
    for r in dot_topk_int8(emb, [0, 1, 2], k=10, dim=64).collect():
        i8.setdefault(r.query_id, set()).add(r.vec_id)
    assert exact
    for qid, want in exact.items():
        got = i8.get(qid, set())
        assert len(want & got) >= 8, (qid, want, got)


def test_rrf_fuse_hand_case(spark):
    """RRF: an id ranked well by both towers beats an id ranked first by
    only one (1/61+1/62 > 1/60); single-tower ids still fuse (UNION
    semantics); ordering deterministic with id tiebreak."""
    from bigdata_retailrocket_recsys_spark.operators.similarity import (
        rrf_fuse,
    )

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id bigint, rank bigint"
    )
    vec = spark.createDataFrame(
        [(20, 1), (30, 2), (40, 3)], "doc_id bigint, rank bigint"
    )
    out = {r.doc_id: (r.n_towers, r.fused_rank)
           for r in rrf_fuse([lex, vec], top_k=4).collect()}
    # 20: 1/62+1/61 wins over 10: 1/61 and 40: 1/63
    assert out[20] == (2, 1)
    assert out[30] == (2, 2)  # 1/63 + 1/62
    assert out[10] == (1, 3)  # 1/61 single-tower
    assert out[40] == (1, 4)  # 1/63 single-tower


def test_snapshot_diff_null_injective(spark):
    """NULL vs '' vs a literal NUL byte in compare cols must NOT
    conflate (presence bits in the digest input); NULL-key rows drop;
    all four statuses come out right."""
    from bigdata_retailrocket_recsys_spark.operators.quality import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, ""), (4, "x"), (5, "gone"), (None, "k")],
        "id bigint, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, "\x00"), (4, "x"), (6, "fresh")],
        "id bigint, v string",
    )
    out = {
        r.id: r.status
        for r in snapshot_diff(
            old, new, key_cols=["id"], compare_cols=["v"]
        ).collect()
    }
    assert out == {
        1: "unchanged",
        2: "changed",   # NULL -> '' must register as a change
        3: "changed",   # '' -> NUL byte must register as a change
        4: "unchanged",
        5: "removed",
        6: "added",
    }


def test_snapshot_diff_separator_forge_injective(spark):
    """A value embedding the old \\x01 separator + 'false' presence-bit
    framing could reproduce adjacent-field boundaries and conflate two
    genuinely different rows (ADVICE r7 #3). Fixed-width per-column
    md5+presence fields have no separator to forge — this exact
    collision pair must now read 'changed'."""
    from bigdata_retailrocket_recsys_spark.operators.quality import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a\x01false\x01b", "c")], "id bigint, v1 string, v2 string"
    )
    new = spark.createDataFrame(
        [(1, "a", "b\x01false\x01c")], "id bigint, v1 string, v2 string"
    )
    out = snapshot_diff(
        old, new, key_cols=["id"], compare_cols=["v1", "v2"]
    ).collect()
    assert [(r.id, r.status) for r in out] == [(1, "changed")]


def test_k_anonymity_suppresses_small_groups(spark):
    from bigdata_retailrocket_recsys_spark.operators.quality import (
        enforce_k_anonymity,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None), (6, None), (7, None)],
        "id bigint, quasi string",
    )
    out = {r.id: r.k_group_n
           for r in enforce_k_anonymity(df, quasi_cols=["quasi"], k=3).collect()}
    # 'a' (3 rows) and the NULL group (3 rows) survive; 'b' (1) suppressed
    assert out == {1: 3, 2: 3, 3: 3, 5: 3, 6: 3, 7: 3}


def test_epoch_shuffle_reproducible_and_epoch_sensitive(spark):
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        epoch_shuffle,
    )

    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    e1a = [r.doc_id for r in epoch_shuffle(docs, 1, id_col="doc_id")
           .orderBy("shuffle_pos").collect()]
    e1b = [r.doc_id for r in epoch_shuffle(docs, 1, id_col="doc_id", n_shards=7)
           .orderBy("shuffle_pos").collect()]
    e2 = [r.doc_id for r in epoch_shuffle(docs, 2, id_col="doc_id")
          .orderBy("shuffle_pos").collect()]
    assert e1a == e1b                 # shard count never changes the order
    assert e1a != e2                  # epochs reshuffle
    assert sorted(e1a) == list(range(200)) == sorted(e2)  # permutations


def test_duplicated_spans_islands_merge(spark):
    """Adjacent duplicated n-gram starts merge into ONE maximal span;
    isolated duplicated n-grams report exactly n tokens; unique docs
    report nothing. Doc 1/2 share a 6-token run ('p q r s t u'), so each
    has starts {0,1} -> one island of span_len 6."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        duplicated_spans,
    )

    shared = "p q r s t u"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} one two three"),
            (2, f"zero {shared} four five"),
            (3, "nothing here repeats at all ever"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        (r.doc_id, r.span_start): r.span_len
        for r in duplicated_spans(docs, n=5, min_occurrences=2).collect()
    }
    # doc 1: starts 0 and 1 duplicated (both 5-grams of the shared run)
    assert out == {(1, 0): 6, (2, 1): 6}


def test_build_corpus_neardup_strip_stage_semantics(spark):
    """Stage-order geometry of the 7-stage pipeline: docs 1/2 have
    IDENTICAL 3-gram shingle SETS but different normalized text (the
    'a b a b ...' trick) -> identical MinHash signatures -> guaranteed
    band collision -> Jaccard 1.0 -> clustered, min-id keeper; the
    keeper is then FULLY self-duplicated at 5-gram grain -> stripped to
    '' -> dropped. Docs 3/4 share a 6-token run (Jaccard 1/3 < 0.5: LSH
    candidates must NOT survive verification) -> only the run is
    stripped. Doc 5 survives stripping untouched but is >=50%
    3-gram-contaminated by the eval split -> decontaminated out."""
    from bigdata_retailrocket_recsys_spark.pipelines.corpus import (
        build_corpus,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a", "srcA"),
            (2, "a b a b a", "srcA"),
            (3, "p q r s t u m1 m2 m3 m4", "srcA"),
            (4, "n1 n2 n3 n4 p q r s t u", "srcA"),
            (5, "w1 w2 w3 w4 w5 w6", "srcA"),
            (6, "w1 w2 w3 w4", "src0"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {
        r.doc_id: (r.domain, r.n_tok)
        for r in build_corpus(
            docs,
            eval_source="src0",
            budget_tokens=1000,
            min_quality=0.0,
            min_tokens=1,
            near_dup=True,
            strip_substrings=True,
        ).collect()
    }
    # 1: clustered keeper, then fully stripped -> dropped; 2: cluster
    # non-keeper; 5: contaminated; 6: eval split. 3/4 keep only their
    # non-shared tails (4 tokens each).
    assert out == {3: ("srcA", 4), 4: ("srcA", 4)}


def test_build_corpus_strip_lines_runs_before_gate(spark):
    """CCNet stage order: the line pass runs BEFORE the quality gate, so
    a junk doc padded with a prevalent boilerplate footer is gated on
    its CLEANED text (3 own tokens < min_tokens) and dropped — if the
    strip ran after the gate the footer's 6 tokens would have rescued
    it. Survivors' n_tok counts cleaned text only, docs stripped to
    nothing are dropped, and a sub-threshold shared line survives into
    the token count."""
    from bigdata_retailrocket_recsys_spark.pipelines.corpus import (
        build_corpus,
    )

    footer = "all rights reserved by the example corp"
    docs = spark.createDataFrame(
        [
            (1, "tiny junk doc\n" + footer, "srcA"),
            (2, "real body one with plenty of words here\n" + footer, "srcA"),
            (3, "real body two with plenty of words here too\n" + footer,
             "srcA"),
            (4, footer, "srcA"),  # stripped to nothing -> dropped
            (5, "real body three has enough words\nrare pair line", "srcA"),
            (6, "real body four has enough words\nrare pair line", "srcA"),
            (7, "eval reference text", "src0"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {
        r.doc_id: r.n_tok
        for r in build_corpus(
            docs,
            eval_source="src0",
            budget_tokens=1000,
            min_quality=0.0,
            min_tokens=5,
            strip_lines=True,
            line_min_docs=3,
        ).collect()
    }
    # 1: 3 own tokens after strip -> gated out; 4: emptied -> dropped;
    # 2/3: 8/9 own tokens; 5/6: body 6 + surviving pair line 3 = 9
    # ('rare pair line' is in only 2 docs < min_docs)
    assert out == {2: 8, 3: 9, 5: 9, 6: 9}


def test_corpus_commit_survives_refresh_invalidation(spark, tmp_path):
    """REGRESSION (r10): corpus_commit's accepted-rows frame depends on
    a READ of digest_path (the incremental anti-join). Spark's
    post-write refreshByPath invalidates any cache whose lineage
    touches the written path — with a .cache() pin, the digest append
    silently rebuilt `committed` against the just-appended digests,
    every doc self-collided, and the signature/corpus artifacts
    committed ZERO rows. The eager localCheckpoint pin must keep all
    three appends consistent."""
    import duckdb as _dd

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        content_digest_table,
        minhash_signatures_table,
    )
    from bigdata_retailrocket_recsys_spark.operators.text import (
        normalize_text,
    )
    from bigdata_retailrocket_recsys_spark.pipelines.corpus import (
        build_corpus_incremental,
        corpus_commit,
    )

    dig = str(tmp_path / "dig")
    sig = str(tmp_path / "sig")
    corp = str(tmp_path / "corp")
    day0 = spark.createDataFrame(
        [(100, "old corpus doc with plenty of words here", "srcA")],
        "doc_id bigint, text string, source string",
    ).withColumn("__norm", normalize_text("text"))
    content_digest_table(day0, dig, key_cols=["__norm"])
    minhash_signatures_table(day0, sig, hash_fn="md5")
    day1 = spark.createDataFrame(
        [
            (1, "brand new document with many unique tokens inside", "srcA"),
            (2, "old corpus doc with plenty of words here", "srcA"),  # dup
        ],
        "doc_id bigint, text string, source string",
    )
    eval_docs = day1.filter("1=0")
    acc1 = build_corpus_incremental(
        day1,
        spark.read.parquet(dig),
        eval_docs,
        min_quality=0.0,
        min_tokens=1,
        corpus_signatures=spark.read.parquet(sig),
        near_dup_hash_fn="md5",
    )
    corpus_commit(
        day1, acc1, digest_path=dig, signature_path=sig,
        corpus_path=corp, hash_fn="md5",
    )
    # doc 1 accepted; all three artifacts must see exactly it
    n_dig = _dd.sql(
        f"SELECT COUNT(*) FROM read_parquet('{dig}/*.parquet')"
    ).fetchone()[0]
    sig_docs = sorted(
        r[0] for r in _dd.sql(
            f"SELECT DISTINCT doc FROM read_parquet('{sig}/*.parquet')"
        ).fetchall()
    )
    corp_ids = sorted(
        r[0] for r in _dd.sql(
            f"SELECT doc_id FROM read_parquet('{corp}/*.parquet')"
        ).fetchall()
    )
    assert n_dig == 2
    assert sig_docs == [1, 100]
    assert corp_ids == [1]


def test_strip_repeated_lines_geometry(spark):
    """Prevalence is DISTINCT-document count: a footer in 3 docs is cut,
    a line shared by only 2 docs stays, a line repeated twice WITHIN one
    doc stays (1 distinct doc), normalization collapses case/whitespace,
    and blank lines are preserved verbatim."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        strip_repeated_lines,
    )

    docs = spark.createDataFrame(
        [
            (1, "unique alpha\ncookie  banner\n\nbody one"),
            (2, "COOKIE BANNER\nbody two\nshared pair"),
            (3, "body three\nCookie Banner\nshared pair"),
            (4, "solo\nsolo"),   # within-doc repeat: 1 distinct doc
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
        for r in strip_repeated_lines(docs, min_docs=3).collect()
    }
    assert out[1] == (3, 1, "unique alpha\n\nbody one")  # blank kept
    assert out[2] == (3, 1, "body two\nshared pair")     # pair: 2 docs
    assert out[3] == (3, 1, "body three\nshared pair")
    assert out[4] == (2, 0, "solo\nsolo")


def test_dedup_lines_within_geometry(spark):
    """Keep-FIRST semantics at within-doc grain: a line repeated inside
    one doc keeps only its first occurrence (later repeats dropped even
    when interleaved), normalization collapses case/whitespace, blank
    lines are ALL preserved (never deduped against each other), and
    cross-document repetition is invisible (no shared state)."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        dedup_lines_within,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nALPHA\n\n\nAlpha  \ngamma"),
            (2, "alpha\nalpha"),  # same line cross-doc: untouched in d1
            (3, ""),              # empty text: one blank line, kept
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
        for r in dedup_lines_within(docs).collect()
    }
    # d1: 5 non-blank lines, 'ALPHA'/'Alpha  ' normalize to 'alpha' and
    # drop; BOTH blank lines survive in place.
    assert out[1] == (5, 2, "alpha\nbeta\n\n\ngamma")
    assert out[2] == (2, 1, "alpha")
    assert out[3] == (0, 0, "")


def test_source_overlap_matrix(spark):
    """Pair grid is complete (zero-overlap pairs appear with n_shared=0),
    shared vocabulary is DISTINCT-shingle grain (within-source repeats
    collapse), NULL-source docs are excluded, and jaccard/overlap_coef
    come out exact."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        source_overlap_matrix,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b", "s1"),
            (2, "a b", "s1"),      # duplicate shingle within s1: collapses
            (3, "a b c d", "s2"),  # shares 'a b' with s1
            (4, "x y", "s3"),      # shares nothing
            (5, "zz", None),       # NULL source: dropped
        ],
        "doc_id bigint, text string, source string",
    )
    out = {
        (r.src_a, r.src_b): r
        for r in source_overlap_matrix(docs, shingle_n=2).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r12 = out[("s1", "s2")]
    # s1 = {'a b'}; s2 = {'a b','b c','c d'} -> shared 1
    assert (r12.n_a, r12.n_b, r12.n_shared) == (1, 3, 1)
    assert r12.jaccard == 1 / 3 and r12.overlap_coef == 1.0
    assert out[("s1", "s3")].n_shared == 0
    assert out[("s1", "s3")].jaccard == 0.0


def test_lsh_audit(spark):
    """Exact duplicates are truth AND candidates (a hit); an unrelated
    doc contributes nothing; an EMPTY corpus still yields one all-zero
    row (the coalesce guard — sum over an empty frame is NULL)."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import lsh_audit

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (3, "completely different words here now"),
        ],
        "doc_id bigint, text string",
    )
    r = lsh_audit(docs, shingle_n=3, hash_fn="md5").collect()[0]
    assert (r.n_truth, r.n_candidates, r.n_hits) == (1, 1, 1)
    assert (r.n_misses, r.n_false_alarms) == (0, 0)

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    z = lsh_audit(empty, hash_fn="md5").collect()
    assert len(z) == 1
    assert tuple(z[0]) == (0, 0, 0, 0, 0)


def test_leakage_safe_split(spark):
    """All members of a near-dup component share one split (a transitive
    A~B~C chain collapses to one cluster even if A and C are not
    directly similar), singletons are their own cluster, and fractions
    route through the same md5 thresholds as hash_split."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        leakage_safe_split,
    )

    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = a + " iota"      # near-dup of a
    c = b + " kappa"     # near-dup of b, farther from a
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, "totally unrelated words only here")],
        "doc_id bigint, text string",
    )
    rows = leakage_safe_split(
        docs,
        splits=[("train", 0.8), ("eval", 0.2)],
        shingle_n=2,
        min_jaccard=0.5,
        hash_fn="md5",
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert len(rows) == 4
    assert (
        by_id[1].cluster_id == by_id[2].cluster_id == by_id[3].cluster_id == 1
    )
    assert by_id[1].split == by_id[2].split == by_id[3].split
    assert by_id[4].cluster_id == 4
    assert all(r.split in ("train", "eval") for r in rows)


def test_c4_rules_geometry(spark):
    """Line rule needs BOTH terminal punctuation and >=3 words; sentence
    count runs over KEPT text only; brace/lorem probes run on the
    ORIGINAL page (a dropped code line still poisons the page); pass
    needs >=5 sentences and clean probes."""
    from bigdata_retailrocket_recsys_spark.operators.text import c4_rules

    five = "one two three. four five six. s seven eight. nine ten ok. end of page."
    docs = spark.createDataFrame(
        [
            (1, five),                          # 5 sentences, clean: pass
            (2, "no punct line here\nshort."),  # line1 no punct, line2 <3 words
            (3, five + "\nx = { 1 }"),          # brace on a DROPPED line
            (4, five.replace("end of page.", "Lorem Ipsum dolor sit.")),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in c4_rules(docs).collect()}
    assert (out[1].n_kept_lines, out[1].n_sentences, out[1].c4_pass) == (
        1, 5, 1,
    )
    assert (out[2].n_lines, out[2].n_kept_lines, out[2].c4_pass) == (2, 0, 0)
    assert out[2].text_clean == ""
    assert (out[3].has_brace, out[3].c4_pass) == (1, 0)
    assert out[3].n_sentences == 5  # kept text is clean, page is not
    assert (out[4].has_lorem, out[4].c4_pass) == (1, 0)


def test_length_outlier_gate(spark):
    """Quartiles are order statistics at rank ceil(q·n); the 1.5-IQR
    fence is integer cross-multiplication; a NULL group forms its OWN
    group (the _sharded_global_rank null-safe join-back regression —
    a name-list join silently dropped NULL-group rows)."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        length_outlier_gate,
    )

    mk = lambda n: " ".join(["w"] * n)
    rows = [(i, mk(n), "s1") for i, n in enumerate([10, 11, 12, 13, 100])]
    rows += [(100, mk(5), None), (101, mk(500), None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r.doc_id: r for r in length_outlier_gate(docs).collect()}
    assert len(out) == 7  # NULL-source docs survive as their own group
    # s1: sorted [10,11,12,13,100], n=5 -> q1 at rank 2 (=11), q3 at
    # rank ceil(3.75)=4 (=13); fence high = 13 + 1.5*2 = 16 -> 100 out
    assert (out[4].q1, out[4].q3, out[4].is_outlier) == (11, 13, 1)
    assert out[0].is_outlier == 0
    # NULL group: n=2 -> q1 at rank 1 (=5), q3 at rank ceil(1.5)=2 (=500)
    assert (out[100].q1, out[100].q3) == (5, 500)
    assert out[100].is_outlier == 0  # fence: [5-742.5, 500+742.5]


def test_epoch_shuffle_stratified(spark):
    """Round-robin interleave: the first k positions are one pick per
    domain (within_rank 1 block), exhausted domains drop out of later
    rounds, positions are a total permutation, and the order changes
    between epochs."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        epoch_shuffle_stratified,
    )

    rows = [(i, "d1") for i in range(4)] + [(10, "d2"), (11, "d2"), (20, "d3")]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = epoch_shuffle_stratified(
        docs, 1, id_col="doc_id", group_col="source"
    ).collect()
    assert sorted(r.shuffle_pos for r in out) == list(range(1, 8))
    by_pos = {r.shuffle_pos: r for r in out}
    # block 1 = one pick per domain; block 2 likewise; then d1 alone
    assert {by_pos[p].source for p in (1, 2, 3)} == {"d1", "d2", "d3"}
    assert {by_pos[p].source for p in (4, 5)} == {"d1", "d2"}
    assert [by_pos[p].source for p in (6, 7)] == ["d1", "d1"]
    out2 = epoch_shuffle_stratified(
        docs, 2, id_col="doc_id", group_col="source"
    ).collect()
    assert {(r.doc_id, r.shuffle_pos) for r in out2} != {
        (r.doc_id, r.shuffle_pos) for r in out
    }


def test_weighted_sample(spark):
    """Exactly k rows with the smallest u/w keys, rerun-identical; a row
    with overwhelming weight is effectively certain to be included;
    non-positive weights and NULL ids are dropped."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        weighted_sample,
    )

    rows = [(i, 10) for i in range(100)] + [
        (1000, 10**9),   # u/w shrunk 1e8-fold: certain inclusion
        (1001, 0),       # dropped: non-positive weight
        (None, 10),      # dropped: NULL id
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = weighted_sample(docs, 10, id_col="doc_id", weight_col="w")
    ids = sorted(r.doc_id for r in got.collect())
    assert len(ids) == 10
    assert 1000 in ids and 1001 not in ids
    again = sorted(
        r.doc_id
        for r in weighted_sample(
            docs, 10, id_col="doc_id", weight_col="w"
        ).collect()
    )
    assert again == ids
    keys = [r.sample_key for r in got.collect()]
    assert all(k > 0 for k in keys)


def test_rank_calibrate(spark):
    """Percentiles span [0,1] per domain, ties break by id (stable),
    a single-row domain pins to 0.5, and NULL domains form their own
    stratum."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        rank_calibrate,
    )

    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 30),
            (5, "b", 999), (6, None, 7), (7, None, 8)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, s bigint")
    out = {r.doc_id: r for r in rank_calibrate(
        docs, group_col="source", score_col="s", id_col="doc_id"
    ).collect()}
    assert len(out) == 7
    assert (out[1].pct, out[4].pct) == (0.0, 1.0)
    assert (out[2].rnk, out[3].rnk) == (2, 3)  # tie broken by id
    assert out[5].pct == 0.5                   # single-row domain
    assert (out[6].pct, out[7].pct) == (0.0, 1.0)  # NULL stratum


def test_containment_pairs(spark):
    """The asymmetric geometry Jaccard misses: a short doc fully inside
    a long one survives at containment 0.9 with tiny Jaccard; both
    directions are reported; unrelated pairs don't appear."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        containment_pairs,
    )

    small = "alpha beta gamma"
    big = small + " " + " ".join(f"x{i}" for i in range(57))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated stuff entirely")],
        "doc_id bigint, text string",
    )
    out = containment_pairs(
        docs, shingle_n=1, min_containment=0.9
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b, r.n_common, r.n_a, r.n_b) == (1, 2, 3, 3, 60)
    assert r.containment_a == 1.0 and r.containment_b == 0.05
    # Jaccard would be 3/60 = 0.05 — invisible to a 0.5 Jaccard gate


def test_weighted_median(spark):
    """Smallest value whose cumulative weight reaches half the total
    (2·cum >= W, lower median at the exact-half boundary); repeated
    values merge their weights first; NULL groups form a group."""
    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        weighted_median,
    )

    rows = [
        ("a", 1, 1), ("a", 2, 1), ("a", 3, 98),      # heavy tail wins
        ("b", 10, 5), ("b", 20, 5),                  # exact half: lower
        ("b", 10, 0),                                # merges, weight 0
        (None, 7, 1),
    ]
    docs = spark.createDataFrame(rows, "g string, v bigint, w bigint")
    out = {
        r.g: (r.w_median, r.total_w)
        for r in weighted_median(
            docs, group_col="g", value_col="v", weight_col="w"
        ).collect()
    }
    assert out["a"] == (3, 100)
    assert out["b"] == (10, 10)   # cum(10)=5, 2*5 >= 10 -> lower value
    assert out[None] == (7, 1)


def test_mojibake_gate(spark):
    """Replacement chars and C0 controls count; tab/newline/CR are
    structure and do NOT count; the 1% gate is integer
    cross-multiplication."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        mojibake_gate,
    )

    docs = spark.createDataFrame(
        [
            (1, "clean text\twith\nstructure\r ok"),
            (2, "bad �� decode"),
            (3, "x" * 1000 + "\x01"),  # 1 control in 1001 chars: 0.1%
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in mojibake_gate(docs).collect()}
    assert (out[1].n_replacement, out[1].n_control, out[1].is_mojibake) == (
        0, 0, 0,
    )
    assert (out[2].n_replacement, out[2].is_mojibake) == (2, 1)
    assert (out[3].n_control, out[3].is_mojibake) == (1, 0)


def test_fuzzy_pairs(spark):
    """One typo (1 edit) pairs; different blocks never pair even at
    distance 0; the length prune is a pure optimization (a pair at the
    exact length bound still survives)."""
    from bigdata_retailrocket_recsys_spark.operators.joins import (
        fuzzy_pairs,
    )

    rows = [
        (1, "chocolate lace", "b1"),
        (2, "chocolate lace", "b2"),   # identical, other block: no pair
        (3, "chocolate lacy", "b1"),   # 1 substitution
        (4, "chocolate lace xx", "b1"),  # +3 chars: pruned and >2 edits
        (5, "chocolate la", "b1"),     # -2 chars: exactly at bound, 2 edits
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, blk string")
    out = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_pairs(
            df, id_col="id", key_col="name", block_cols=["blk"],
            max_distance=2,
        ).collect()
    }
    assert out == {(1, 3): 1, (1, 5): 2, (3, 5): 2}


def test_multimodal_chunk_neardup_geometry(spark):
    """Chunk-digest Jaccard catches byte-identical and tail-modified
    blobs; a byte INSERTED at the front shifts every fixed-offset chunk
    and is invisible (the documented fixed-chunking limitation)."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        attach_fake_media,
        chunk_binary,
    )

    base = "A" * 256  # 4 chunks of 64
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base[:192] + "B" * 64),  # tail modified: 3/5 shared...
            (3, "Z" + base),             # 1 byte inserted at front
        ],
        "doc_id bigint, text string",
    )
    assets = attach_fake_media(docs, id_col="doc_id", payload_from="text")
    chunks = chunk_binary(assets, chunk_bytes=64, overlap_bytes=0)
    sh = chunks.select(
        F.col("asset_id").alias("doc"), F.md5(F.hex("chunk")).alias("shingle")
    ).distinct()
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(shingles=sh, min_jaccard=0.0)
        .filter(F.col("jaccard") > 0)
        .collect()
    }
    # doc1 digests: {AAAA} (all 4 chunks identical) -> n=1
    # doc2: {AAAA, BBBB} -> shared 1, union 2 -> 0.5
    assert pairs[(1, 2)] == 0.5
    # doc3's chunks all start with the shifted Z/A boundary: ZAAA.., AAAA?
    # 257 bytes -> chunks at 1,65,129,193,257: [Z+63A],[64A],[64A],[64A],[A]
    # distinct = {ZA..., AAAA(64), A(1)} — shares the 64A chunk with doc1
    assert (1, 3) in pairs  # front-insert still shares the aligned-64A run
    assert pairs[(1, 3)] < 1.0


def test_ccnet_tercile_arithmetic():
    """1 + (3·(rank−1)) div n splits any n into buckets of sizes
    ceil/floor within 1 of n/3, covers every rank, and is monotone."""
    for n in (1, 2, 3, 4, 5, 7, 10, 100):
        buckets = [1 + (3 * (r - 1)) // n for r in range(1, n + 1)]
        assert buckets[0] == 1 and buckets[-1] == 3 if n >= 3 else True
        assert all(b in (1, 2, 3) for b in buckets)
        assert buckets == sorted(buckets)
        from collections import Counter
        c = Counter(buckets)
        if n >= 3:
            assert max(c.values()) - min(c.values()) <= 1


def test_enforce_l_diversity(spark):
    """A big-but-homogeneous group is suppressed (the attack k-anonymity
    misses), a small diverse group survives, NULL quasi groups gate like
    any other, and NULL sensitive counts as one observable value."""
    from bigdata_retailrocket_recsys_spark.operators.quality import (
        enforce_l_diversity,
    )

    rows = (
        [(i, "zipA", 7) for i in range(10)]          # 10 rows, 1 user
        + [(100, "zipB", 1), (101, "zipB", 2), (102, "zipB", 3)]
        + [(200, None, 4), (201, None, None)]         # NULL quasi group
    )
    df = spark.createDataFrame(rows, "row_id bigint, zip string, u int")
    out = enforce_l_diversity(
        df, quasi_cols=["zip"], sensitive_col="u", l=2
    ).collect()
    got = {r.row_id: r.l_distinct for r in out}
    assert all(i not in got for i in range(10))   # homogeneous: gone
    assert got[100] == got[101] == got[102] == 3  # diverse: kept
    assert got[200] == got[201] == 2              # NULL quasi, NULL=value


def test_sessionize_capped(spark):
    """A sub-gap event stream longer than the cap splits at fixed
    multiples of the cap from the session start; a real gap restarts
    BOTH the run and the sub-session clock."""
    from datetime import datetime, timezone

    from bigdata_retailrocket_recsys_spark.operators.sessionize import (
        sessionize_capped,
    )

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp()
    mk = lambda m: datetime.fromtimestamp(t0 + m * 60, tz=timezone.utc)
    rows = [
        (1, 1, mk(0)), (2, 1, mk(20)), (3, 1, mk(40)),  # 40min run, 30cap
        (4, 1, mk(120)),                                # gap: new run
        (5, 2, mk(0)),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")
    out = {
        r.event_id: r.session_id
        for r in sessionize_capped(
            df, gap_minutes=30, max_minutes=30, tiebreak_cols=["event_id"]
        ).collect()
    }
    assert out[1] == "1_1_0" and out[2] == "1_1_0"
    assert out[3] == "1_1_1"      # 40 min from start: second sub-session
    assert out[4] == "1_2_0"      # real gap: run 2, clock reset
    assert out[5] == "2_1_0"


def test_scd2_build_intervals(spark):
    """Consecutive identical values collapse into one validity interval,
    a change closes the previous interval at the change time, the last
    interval is open (is_current, eff_to = -1), and intervals tile the
    key's timeline with no gaps."""
    import sys
    sys.path.insert(0, ".")
    from __spark_entry__ import queries

    # drive through the catalog entry on a staged micro-fixture by
    # reusing its logic via a direct window replay would duplicate it;
    # instead assert the interval algebra on the sf0.001 fixture output
    out = queries()["q_scd2_build"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert out and all(r.eff_from_us is not None for r in out)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.eff_from_us)
        cur = [r for r in rows if r.is_current == 1]
        assert len(cur) == 1 and cur[0] is rows[-1]
        assert cur[0].eff_to_us == -1
        for a, b in zip(rows, rows[1:]):
            assert a.eff_to_us == b.eff_from_us  # tiling, no gaps
            assert a.event_type != b.event_type or a.eff_from_us != b.eff_from_us


def test_corpus_profile_rollup(spark):
    """Per-domain report card: duplicate normalized texts collapse in
    n_distinct, Gopher passes are counted, zero-token docs contribute 0
    LM tokens (lm_avg NULL-guarded), and NULL domains form their row."""
    from bigdata_retailrocket_recsys_spark.pipelines.corpus import (
        corpus_profile,
    )

    good = " ".join(
        ["the quick brown fox jumps with energy and grace that counts"]
        * 6
    )
    docs = spark.createDataFrame(
        [
            (1, good, "srcA"),
            (2, good.upper() + "!", "srcA"),  # same normalized digest
            (3, "tiny doc", "srcA"),          # fails Gopher word count
            (4, "lone", None),                # NULL domain row
        ],
        "doc_id bigint, text string, source string",
    )
    ref = spark.createDataFrame(
        [(100, "the fox")], "doc_id bigint, text string"
    )
    out = {r.domain: r for r in corpus_profile(docs, ref).collect()}
    a = out["srcA"]
    assert (a.n_docs, a.n_distinct, a.n_gopher_pass) == (3, 2, 2)
    # 11-word sentence × 6 per doc; '!' glues to doc 2's last word
    assert a.n_words == 66 + 66 + 2
    assert a.lm_tokens == 66 + 66 + 2 and a.lm_avg is not None
    n = out[None]
    assert (n.n_docs, n.n_distinct, n.n_gopher_pass) == (1, 1, 0)


def test_streaming_corpus_intake_gates_and_dedups(spark, tmp_path):
    """The intake stream drops the low-quality doc, collapses exact
    normalized duplicates across micro-batches, excludes the eval
    source, and sums normalized token counts per domain."""
    from bigdata_retailrocket_recsys_spark.streaming.corpus_intake import (
        run_streaming_corpus_intake,
    )

    good = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, good, "srcA"),
            (2, good.upper() + "!!", "srcA"),   # same NORMALIZED text
            (3, "1 2 3 4 5 6 7 8 9 10 11 12", "srcA"),  # digit-heavy: gated
            (4, good, "src0"),                  # eval source: excluded
            (5, good + " tail", "srcB"),
        ],
        "doc_id bigint, text string, source string",
    )
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {
        r.domain: (r.n_docs, r.n_tokens)
        for r in run_streaming_corpus_intake(
            spark, sf, sink_table="bdrr_test_intake"
        ).collect()
    }
    assert out == {"srcA": (1, 12), "srcB": (1, 13)}


def test_dsir_importance_ranks_target_like_docs(spark):
    """A raw doc sharing the target's bigrams must get a higher
    importance weight than an unrelated doc; docs with no features
    (NULL/whitespace text) are absent."""
    from bigdata_retailrocket_recsys_spark.operators.features import (
        dsir_importance,
    )

    target = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "the cat ate the fish")],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "the cat sat quietly"),   # shares 'the cat' / 'cat sat'
            (2, "zz qq rr ss tt uu"),     # no target overlap
            (3, None),
            (4, "   "),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in dsir_importance(raw, target).collect()}
    # whitespace-only text still yields one '' token -> one partial
    # shingle -> doc 4 present; NULL text absent
    assert set(out) == {1, 2, 4}
    assert out[1].importance > out[2].importance
    assert out[1].n_feats == 3 and out[2].n_feats == 5


def test_gopher_quality_rules(spark):
    """Each Gopher rule fires on its crafted violation and the clean doc
    passes all seven; thresholds are integer cross-multiplications (the
    exactly-10%-symbols edge FAILS the strict < rule)."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        gopher_quality,
    )

    good = " ".join(
        ["the quick brown fox jumps with energy and grace that counts"]
        * 6
    )  # 60 words, stopwords {the, with, and, that}, all alpha
    short = "too few words here"  # word-count rule
    symbols = " ".join(["ok#tag"] * 30 + ["the words go with and that"] * 5)
    bullets = "\n".join(["- item one of the list"] * 10)  # 100% bullets
    digits = " ".join(["12345"] * 60)  # no alpha, no stops
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, bullets), (5, digits)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.asDict() for r in gopher_quality(docs).collect()}
    assert out[1]["gopher_pass"] == 1, out[1]
    assert out[2]["f_word_count"] == 0 and out[2]["gopher_pass"] == 0
    assert out[3]["f_symbol"] == 0 and out[3]["f_word_count"] == 1
    assert out[4]["f_bullet"] == 0
    assert out[5]["f_alpha"] == 0 and out[5]["f_stop"] == 0
    # exactly 10% symbolic words: 10*6 < 60 is FALSE -> flag fails
    edge = " ".join(
        ["w#x"] * 6 + ["with the and that more words go"] * 7 + ["pad"] * 5
    )
    e = gopher_quality(
        spark.createDataFrame([(9, edge)], "doc_id bigint, text string")
    ).collect()[0]
    assert e.n_words == 60 and e.f_symbol == 0


def test_lm_score_orders_by_reference_fit(spark):
    """A doc made of common reference words must outscore a doc of
    unseen words; unseen terms smooth to ln(1/(N+V)) instead of -inf;
    an EMPTY reference scores every token ln(1)=0 (GREATEST guard);
    zero-token docs are absent."""
    import math

    from bigdata_retailrocket_recsys_spark.operators.text import lm_score

    ref = spark.createDataFrame(
        [(100, "the cat sat"), (101, "the dog sat")],
        "doc_id bigint, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the the sat"), (2, "zz qq xx"), (3, "   "), (4, None)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in lm_score(docs, ref).collect()}
    assert set(out) == {1, 2}          # whitespace-only + NULL absent
    assert out[1].n_tokens == 3 and out[2].n_tokens == 3
    assert out[1].lm_score > out[2].lm_score
    # N=6 ref tokens, V=4 vocab: 'the' p=3/10, 'sat' p=3/10, unseen p=1/10
    exp1 = (2 * math.floor(math.log(3 / 10) * 1e6)
            + math.floor(math.log(3 / 10) * 1e6))
    exp2 = 3 * math.floor(math.log(1 / 10) * 1e6)
    assert out[1].logprob_u == exp1 and out[2].logprob_u == exp2
    empty_ref = ref.filter(F.col("doc_id") < 0)
    out0 = {r.doc_id: r.logprob_u
            for r in lm_score(docs, empty_ref).collect()}
    assert out0 == {1: 0, 2: 0}        # ln((0+1)/max(0,1)) = 0 per token


def test_jaccard_verify_filters_candidates(spark):
    """LSH candidates are only 'probably similar' — verification computes
    the true Jaccard over distinct shingle sets and drops pairs below the
    threshold; pairs with empty intersection vanish entirely."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        jaccard_verify,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "z")],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a bigint, doc_b bigint"
    )
    out = {
        (r.doc_a, r.doc_b): (r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in jaccard_verify(
            pairs, docs, shingle_n=1, min_jaccard=0.5
        ).collect()
    }
    # (1,2): |{a,b,c}| / |{a,b,c,d,x}| = 0.6 survives; (1,3): 0 dropped
    assert out == {(1, 2): (3, 4, 4, 0.6)}


def test_jaccard_verify_dedupes_candidate_pairs(spark):
    """A duplicated (doc_a, doc_b) candidate row must NOT double
    n_common through the intersection join (jaccard would exceed 1 and
    a sub-threshold pair would wrongly survive) — the operator
    distinct()s its pair input (ADVICE r9 #2)."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        jaccard_verify,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a x y z")],
        "doc_id bigint, text string",
    )
    # jaccard(1,2) = |{a}| / |{a,b,c,d,x,y,z}| = 1/7; tripled candidate
    # rows would make n_common=3 -> 3/5 = 0.6 and wrongly pass 0.5
    pairs = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2)], "doc_a bigint, doc_b bigint"
    )
    out = jaccard_verify(pairs, docs, shingle_n=1, min_jaccard=0.1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_common, r.n_a, r.n_b) == (1, 4, 4)
    assert abs(r.jaccard - 1 / 7) < 1e-12


def test_strip_duplicated_spans_geometry(spark):
    """Edge geometry for the REMOVAL half (ADVICE r8 #2): two islands
    whose start gap is < n have OVERLAPPING covered ranges (starts 0 and
    2 with n=5 cover [0,4] and [2,6] — the union [0,6] must cut 7
    tokens, not 10); a fully-duplicated doc survives with
    ``text_clean=''``; a single-token doc (no full shingle) passes
    through untouched; NULL id/text rows are dropped."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        duplicated_spans,
        strip_duplicated_spans,
    )

    docs = spark.createDataFrame(
        [
            # doc 1: 5-gram@0 ("a b c d e") duplicated with doc 2,
            # 5-gram@2 ("c d e f g") duplicated with doc 3, 5-gram@1
            # ("b c d e f") occurs only here -> two SEPARATE islands
            # {0} and {2} whose covered ranges overlap on [2,4]
            (1, "a b c d e f g h i j"),
            (2, "a b c d e"),        # entirely one duplicated 5-gram
            (3, "c d e f g"),        # entirely one duplicated 5-gram
            (4, "solo"),             # single token, no shingle
            (5, None),               # NULL text: dropped
            (None, "a b c d e"),     # NULL id: dropped
        ],
        "doc_id bigint, text string",
    )
    spans = {
        (r.doc_id, r.span_start): r.span_len
        for r in duplicated_spans(docs, n=5, min_occurrences=2).collect()
    }
    assert spans == {(1, 0): 5, (1, 2): 5, (2, 0): 5, (3, 0): 5}
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in strip_duplicated_spans(
            docs, n=5, min_occurrences=2
        ).collect()
    }
    assert out == {
        1: (10, 7, "h i j"),   # union of overlaps cut once, not twice
        2: (5, 5, ""),         # fully duplicated -> kept, emptied
        3: (5, 5, ""),
        4: (1, 0, "solo"),
    }


def test_gopher_repetition_geometry(spark):
    """Hand-computed Rae §A1.2 geometry: a one-token-spam doc fails the
    top-2-gram and dup-5-gram char rules; a repeated-line doc fails both
    line rules but passes dup-5-gram (all its 5-grams are distinct); a
    clean doc passes everything. All columns integer-exact."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        gopher_repetition,
    )

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "alpha beta\nalpha beta\nalpha beta\ngamma delta"),
            # long enough that one 2-gram is < 20% of total bytes (the
            # top-2-gram rule fails SHORT docs even without repetition)
            (3, " ".join(f"word{i}" for i in range(30))),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.asDict() for r in gopher_repetition(docs).collect()}
    r1 = out[1]
    # 5 occurrences of 'spam spam' (9 bytes) over 29 bytes; 2 of the
    # duplicated 5-gram (24 bytes)
    assert (r1["top2_chars"], r1["dup5_chars"], r1["tot_chars"]) == (45, 48, 29)
    assert (r1["f_top2"], r1["f_dup5"], r1["rep_pass"]) == (0, 0, 0)
    assert (r1["f_dup_line"], r1["f_dup_line_chars"]) == (1, 1)
    r2 = out[2]
    assert (r2["n_lines"], r2["dup_line_u"]) == (4, 2)
    assert (r2["tot_line_chars"], r2["dup_line_chars_u"]) == (41, 20)
    assert (r2["f_dup_line"], r2["f_dup_line_chars"]) == (0, 0)
    assert (r2["top2_chars"], r2["dup5_chars"]) == (30, 0)
    assert (r2["f_top2"], r2["f_dup5"], r2["rep_pass"]) == (0, 1, 0)
    r3 = out[3]
    assert r3["rep_pass"] == 1
    assert (r3["dup_line_u"], r3["dup5_chars"]) == (0, 0)


def test_token_entropy_extremes(spark):
    """Entropy geometry: one token repeated n times -> exactly 0 nats
    (low-entropy flag on); n all-distinct tokens -> entropy_u =
    n·⌊ln(n)·1e6⌋ (every c=1 contributes ⌊ln(1)·1e6⌋ = 0); a mixed doc
    lands strictly between; zero-token docs are absent."""
    import math

    from bigdata_retailrocket_recsys_spark.operators.text import (
        token_entropy,
    )

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "a b c d e f g h"),
            (3, "x x y"),
            (4, "   "),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.asDict() for r in token_entropy(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["entropy_u"], out[1]["is_low_entropy"]) == (0, 1)
    n = out[2]["n_tokens"]
    assert out[2]["entropy_u"] == n * math.floor(math.log(n) * 1e6)
    assert out[2]["is_low_entropy"] == 0  # ln(8) ≈ 2.08 nats
    # doc 3: 3·⌊ln3·1e6⌋ − 2·⌊ln2·1e6⌋ over 3e6 ≈ 0.637 nats
    assert 0 < out[3]["entropy"] < out[2]["entropy"]
    assert out[3]["is_low_entropy"] == 1


def test_strip_contaminated_spans_geometry(spark):
    """Surgical decontamination geometry: a doc quoting one eval 3-gram
    loses exactly the covered window (overlapping windows union); a doc
    equal to an eval doc is stripped to ''; a clean doc passes through;
    docs shorter than n can never be cut."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        strip_contaminated_spans,
    )

    train = spark.createDataFrame(
        [
            # 'q1 q2 q3' at positions 2-4; also 'q2 q3 q4'? no — q4 absent
            (1, "intro words q1 q2 q3 outro tail"),
            (2, "q1 q2 q3 q4"),        # covers [0,2] and [1,3] -> all 4
            (3, "totally unrelated body"),
            (4, "q1 q2"),              # shorter than n -> untouched
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [(100, "q1 q2 q3 q4 and more")], "doc_id bigint, text string"
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in strip_contaminated_spans(train, ev, n=3).collect()
    }
    assert out[1] == (7, 3, "intro words outro tail")
    assert out[2] == (4, 4, "")
    assert out[3] == (3, 0, "totally unrelated body")
    assert out[4] == (2, 0, "q1 q2")


def test_top_share_by_score_exact_rational(spark):
    """floor(share·n) rows survive per group: 10 rows at 1/4 -> 2;
    3 rows at 1/4 -> 0 (group vanishes); ties break content-defined
    (md5(id)) so equal scores pick a deterministic winner."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        top_share_by_score,
    )

    rows = [(i, "a", 100 - i) for i in range(10)]  # scores 100..91
    rows += [(100 + i, "b", 5) for i in range(3)]  # tiny group, all tied
    df = spark.createDataFrame(rows, "doc_id bigint, g string, s bigint")
    out = sorted(
        (r.g, r.doc_id)
        for r in top_share_by_score(
            df, group_col="g", score_col="s", share_num=1, share_den=4,
            id_col="doc_id",
        ).collect()
    )
    # group a: floor(10/4)=2 best scores -> ids 0,1; group b: floor(3/4)=0
    assert out == [("a", 0), ("a", 1)]


def test_t_closeness_gate_semantics(spark):
    """A group whose sensitive distribution EXACTLY matches the global
    one has EMD 0 (survives any t >= 0); a maximally skewed group is
    suppressed at small t. Hand-checked integers: global = {0: 6, 1: 6},
    g1 = {0: 3, 1: 3} (s = 3*12-6*6 = 0 -> emd 0), g2 = {0: 3} wait —
    see inline construction: g2 all in bucket 0 -> |s| = 3*12-6*3 = 18."""
    from bigdata_retailrocket_recsys_spark.operators.quality import (
        enforce_t_closeness,
    )

    rows = [("g1", 0)] * 3 + [("g1", 1)] * 3 + [("g2", 0)] * 3 + [("g2", 1)] * 3
    # skew g2: move its bucket-1 rows to bucket 0
    rows = [("g1", 0)] * 3 + [("g1", 1)] * 3 + [("g2", 0)] * 6
    df = spark.createDataFrame(rows, "q string, vb bigint")
    # global: bucket0 = 9, bucket1 = 3, N = 12, m = 2
    # g1 (n=6): s_0 = 3*12 - 9*6 = -18 -> emd_abs = 18
    #           gate at t=1/4: 4*18 <= 1*(2-1)*6*12=72 -> pass (equal)
    # g2 (n=6): s_0 = 6*12 - 9*6 = 18 -> emd_abs = 18 -> same gate, pass
    out = enforce_t_closeness(
        df, quasi_cols=["q"], bucket_col="vb", t_num=1, t_den=4
    )
    assert out.count() == 12
    # tighter t = 1/5: 5*18 = 90 > 72 -> both suppressed
    out2 = enforce_t_closeness(
        df, quasi_cols=["q"], bucket_col="vb", t_num=1, t_den=5
    )
    assert out2.count() == 0
    # a group matching the global mix exactly: emd 0, survives t=0
    rows3 = [("a", 0)] * 3 + [("a", 1)] * 1 + [("b", 0)] * 3 + [("b", 1)] * 1
    df3 = spark.createDataFrame(rows3, "q string, vb bigint")
    out3 = enforce_t_closeness(
        df3, quasi_cols=["q"], bucket_col="vb", t_num=0, t_den=1
    )
    assert out3.count() == 8
    assert {r.emd_abs for r in out3.collect()} == {0}


def test_temporal_embargo_split_boundaries(spark):
    """Exact boundary semantics: ts+h == cutoff is PURGED (strict <
    for train); ts == cutoff+e is TEST (strict < for embargo); NULL ts
    excluded."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        temporal_embargo_split,
    )
    import datetime as dt

    c = dt.datetime(2024, 1, 25)
    h, e = 3600, 7200
    rows = [
        (1, c - dt.timedelta(seconds=3601)),  # ts+h < cutoff -> train
        (2, c - dt.timedelta(seconds=3600)),  # ts+h == cutoff -> purged
        (3, c - dt.timedelta(seconds=1)),     # purged
        (4, c),                               # embargo
        (5, c + dt.timedelta(seconds=7199)),  # embargo
        (6, c + dt.timedelta(seconds=7200)),  # test
        (7, None),                            # excluded
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp")
    out = {
        r.id: r.split
        for r in temporal_embargo_split(
            df, ts_col="ts", cutoff="2024-01-25",
            horizon_seconds=h, embargo_seconds=e,
        ).collect()
    }
    assert out == {
        1: "train", 2: "purged", 3: "purged",
        4: "embargo", 5: "embargo", 6: "test",
    }


def test_ngram_diversity_exact_counts(spark):
    """Hand-checked grid: 'a b a b' -> 4 tokens, 2 distinct; bigrams
    [a b, b a, a b] -> 3 inst / 2 distinct; trigrams [a b a, b a b]
    -> 2 inst / 2 distinct. A one-token doc adds a unigram but no
    bigram/trigram instances."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        ngram_diversity,
    )

    df = spark.createDataFrame(
        [(1, "a b a b", "s1"), (2, "z", "s1"), (3, None, "s2")],
        "doc_id bigint, text string, source string",
    )
    out = {r.domain: r for r in ngram_diversity(df).collect()}
    r = out["s1"]
    assert (r.n_tokens, r.n_uni) == (5, 3)
    assert (r.n_big_inst, r.n_big) == (3, 2)
    assert (r.n_tri_inst, r.n_tri) == (2, 2)
    assert r.ttr_ppm == 3 * 1000000 // 5
    assert r.big_ppm == 2 * 1000000 // 3
    assert "s2" not in out  # NULL text contributes nothing -> no row


def test_reciprocal_rank_eval_scaling(spark):
    """2520 div rank is exact for rank 1..10; misses add 0; mrr is the
    one-division mean. ranks 1 and 4 -> 2520 + 630 = 3150 over n=3."""
    from bigdata_retailrocket_recsys_spark.operators.evaluation import (
        reciprocal_rank_eval,
    )

    test = spark.createDataFrame(
        [("g", 10), ("g", 40), ("g", 99)], "event_type string, item bigint"
    )
    topk = spark.createDataFrame(
        [(10, 1), (40, 4)], "item bigint, rank bigint"
    )
    r = reciprocal_rank_eval(test, topk, k=10).collect()[0]
    assert (r.n_test, r.n_hits, r.rr_scale, r.rr_sum_scaled) == (
        3, 2, 2520, 3150,
    )
    assert r.mrr == 3150 / (3 * 2520)


def test_bm25_hard_negatives_excludes_self_and_positives(spark):
    """The query doc never appears as its own negative; labeled
    positives are anti-joined out; ranking is (bm25_u DESC, id ASC)."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        bm25_hard_negatives,
    )

    corpus = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana cherry date"),   # closest to q=1
            (3, "apple banana"),
            (4, "apple"),
            (5, "unrelated words here"),
        ],
        "doc_id bigint, text string",
    )
    qd = corpus.filter("doc_id = 1").selectExpr(
        "doc_id AS q_id", "text AS q_text"
    )
    out = bm25_hard_negatives(corpus, qd, top_k=10).collect()
    ids = [r.neg_id for r in sorted(out, key=lambda r: r.rank)]
    assert 1 not in ids          # self excluded
    assert 5 not in ids          # no shared term
    assert set(ids) == {2, 3, 4}
    pos = spark.createDataFrame([(1, 2)], "q_id bigint, doc_id bigint")
    out2 = bm25_hard_negatives(corpus, qd, top_k=10, positives=pos).collect()
    assert {r.neg_id for r in out2} == {3, 4}


def test_touch_attribution_models(spark):
    """Hand-checked: conv at t=100 for user 1; touches click@10(view?),
    view@50, click@90 -> n=3, first=click@10, last=click@90, linear
    credit 333333 ppm each. A touch outside the lookback and a touch
    AT the conversion instant (not strictly before) are excluded."""
    from bigdata_retailrocket_recsys_spark.operators.sequences import (
        touch_attribution,
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 10)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        (1, 1, "click", s(10)),
        (2, 1, "view", s(50)),
        (3, 1, "click", s(90)),
        (4, 1, "purchase", s(100)),
        (5, 1, "click", s(100)),          # not strictly before -> excluded
        (6, 1, "click", s(-700000)),      # outside 604800s lookback
        (7, 2, "view", s(10)),            # other user, no conversion
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = {r.channel: r for r in touch_attribution(df).collect()}
    assert out["click"].n_touches == 2
    assert out["click"].n_first == 1 and out["click"].n_last == 1
    assert out["view"].n_first == 0 and out["view"].n_last == 0
    assert out["click"].credit_ppm == 2 * (1000000 // 3)
    assert out["view"].credit_ppm == 1000000 // 3
    assert out["click"].n_conversions == 1


def test_rolling_distinct_actives_window(spark):
    """Users u1 active day 0 and 3, u2 day 3: dau(0)=1, dau(3)=2;
    wau(3) counts both (day 0 within the trailing 7) -> 2;
    wau(0) = 1 (nothing before). Day 10 (beyond window of day 3)
    sees only its own activity."""
    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        rolling_distinct_actives,
    )
    import datetime as dt

    d = lambda n, h=0: dt.datetime(1970, 1, 1 + n, h)
    rows = [(1, d(0)), (1, d(0, 5)), (1, d(3)), (2, d(3)), (2, d(10))]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {r.epoch_day: (r.dau, r.wau) for r in
           rolling_distinct_actives(df).collect()}
    # day 10's trailing window is [4, 10] — day-3 activity is outside,
    # so wau(10) = {u2} alone
    assert out == {0: (1, 1), 3: (2, 2), 10: (1, 1)}


def test_curriculum_anneal_order_permutation(spark):
    """ord is a permutation of 1..n; phase 2 is exactly floor(share·n)
    rows and holds the TOP scores; every phase-2 ord comes after every
    phase-1 ord; the ordering is reproducible (two runs identical)."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        curriculum_anneal_order,
    )

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "doc_id bigint, s bigint"
    )
    out = curriculum_anneal_order(
        df, id_col="doc_id", score_col="s", anneal_num=1, anneal_den=4
    ).collect()
    assert sorted(r.ord for r in out) == list(range(1, 21))
    p2 = {r.doc_id for r in out if r.phase == 2}
    assert p2 == {15, 16, 17, 18, 19}          # top-5 scores
    max1 = max(r.ord for r in out if r.phase == 1)
    min2 = min(r.ord for r in out if r.phase == 2)
    assert max1 < min2
    out2 = curriculum_anneal_order(
        df, id_col="doc_id", score_col="s", anneal_num=1, anneal_den=4,
        n_shards=7,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # anneal share 1: every row is phase 2, offset from an EMPTY phase 1
    # must be 0 (the empty-frame crossJoin bug guard)
    out3 = curriculum_anneal_order(
        df, id_col="doc_id", score_col="s", anneal_num=1, anneal_den=1
    ).collect()
    assert sorted(r.ord for r in out3) == list(range(1, 21))
    assert {r.phase for r in out3} == {2}


def test_concurrency_sweep_overlaps(spark):
    """Three sessions: A [0,100], B [50,150] (overlap 50-100 -> 2),
    C [101,200] (starts AFTER A's end+1 boundary: at us=101 A's -1
    processes BEFORE C's +1 — max stays 2). Inclusive-end semantics:
    a session [x, x] still counts at x."""
    from bigdata_retailrocket_recsys_spark.operators.sessionize import (
        concurrency_sweep,
    )

    base = 1704067200_000_000  # 2024-01-01 UTC in us
    rows = [
        ("A", base + 0, base + 100),
        ("B", base + 50, base + 150),
        ("C", base + 101, base + 200),
    ]
    df = spark.createDataFrame(
        rows, "session_id string, start_us bigint, end_us bigint"
    )
    out = concurrency_sweep(df).collect()
    assert len(out) == 1
    assert out[0].day_str == "2024-01-01"
    assert out[0].max_concurrent == 2
    assert out[0].n_boundaries == 6


def test_exposure_coverage_gini_identities(spark):
    """Uniform exposure -> gini 0; all exposure on one item -> gini
    (n-1)/n over the recommended set; coverage counts distinct
    recommended over distinct catalog."""
    from bigdata_retailrocket_recsys_spark.operators.evaluation import (
        exposure_coverage_gini,
    )

    cat = spark.createDataFrame([(i,) for i in range(10)], "item bigint")
    uni = spark.createDataFrame(
        [(i % 5,) for i in range(10)], "item bigint"
    )  # items 0..4, 2 each
    r = exposure_coverage_gini(uni, cat).collect()[0]
    assert (r.n_recommended, r.catalog_n, r.coverage_ppm) == (5, 10, 500000)
    assert r.gini_num == 0 and r.gini == 0.0
    skew = spark.createDataFrame(
        [(0,)] * 96 + [(1,), (2,), (3,), (4,)], "item bigint"
    )
    r2 = exposure_coverage_gini(skew, cat).collect()[0]
    # x sorted asc = [1,1,1,1,96]; num = sum((2i-6)*x) = -4-2+0+2+4*96
    assert r2.gini_num == (-4 - 2 + 0 + 2 + 4 * 96)
    assert r2.gini_den == 5 * 100
    assert abs(r2.gini - 0.76) < 1e-12


def test_keeper_by_score_picks_quality_not_min_id(spark):
    """In a cluster {1,2,3} where doc 3 has the best score, keeper is 3
    (the min-id policy would pick 1); singletons are their own keeper;
    exactly one keeper per cluster."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        keeper_by_score,
    )

    cc = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id bigint, cluster_id bigint"
    )
    sc = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (9, 5)], "doc_id bigint, score bigint"
    )
    out = keeper_by_score(cc, sc).collect()
    keepers = {r.doc_id for r in out if r.is_keeper == 1}
    assert keepers == {3, 9}
    per_cluster = {}
    for r in out:
        per_cluster[r.cluster_id] = per_cluster.get(r.cluster_id, 0) + r.is_keeper
    assert all(v == 1 for v in per_cluster.values())


def test_cusum_changepoint_finds_level_shift(spark):
    """Series 10×[5] then 10×[15]: the mean-deviation cusum peaks at the
    last low step (step 10) — hand-checked: n=20, S=200, each low step
    adds 20*5-200 = -100, each high step +100, so |cusum| maxes at 1000
    on step 10. NULL group forms its own series (null-safe join-back)."""
    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        cusum_changepoint,
    )

    rows = [("a", i, 5) for i in range(1, 11)]
    rows += [("a", i, 15) for i in range(11, 21)]
    rows += [(None, 1, 7), (None, 2, 9)]
    df = spark.createDataFrame(rows, "g string, d bigint, c bigint")
    out = {r.g: r for r in cusum_changepoint(
        df, group_col="g", step_col="d", value_col="c"
    ).collect()}
    assert (out["a"].change_step, out["a"].cusum_abs_max) == (10, 1000)
    assert out["a"].n_steps == 20
    assert None in out  # NULL group not dropped


def test_forecast_mase_weekly_structure(spark):
    """A pure period-7 series: seasonal-naive error is 0, one-step error
    is not -> mase 0. A constant series: both errors 0 -> mase NULL
    (guarded division)."""
    from bigdata_retailrocket_recsys_spark.operators.evaluation import (
        forecast_mase,
    )

    weekly = [("w", d, 100 + (d % 7) * 10) for d in range(1, 22)]
    const = [("c", d, 50) for d in range(1, 22)]
    df = spark.createDataFrame(
        weekly + const, "g string, d bigint, v bigint"
    )
    out = {r.g: r for r in forecast_mase(
        df, group_col="g", step_col="d", value_col="v", season=7
    ).collect()}
    assert out["w"].saes == 0 and out["w"].sae1 > 0
    assert out["w"].mase == 0.0
    assert out["c"].mase is None
    assert out["w"].n_es == 21 - 7 and out["w"].n_e1 == 20


def test_balanced_class_sample_floor_and_stability(spark):
    """Classes {a:5, b:2, NULL:3} -> every class keeps exactly 2 rows
    (the floor), NULL class included (null-safe); membership is
    shard-count-invariant."""
    from bigdata_retailrocket_recsys_spark.operators.splits import (
        balanced_class_sample,
    )

    rows = [(i, "a") for i in range(5)] + [(10, "b"), (11, "b")]
    rows += [(20, None), (21, None), (22, None)]
    df = spark.createDataFrame(rows, "id bigint, cls string")
    out = balanced_class_sample(df, class_col="cls", id_col="id").collect()
    by = {}
    for r in out:
        by.setdefault(r.cls, set()).add(r.id)
    assert {k: len(v) for k, v in by.items()} == {"a": 2, "b": 2, None: 2}
    assert {r.class_n for r in out if r.cls == "a"} == {5}
    out2 = balanced_class_sample(
        df, class_col="cls", id_col="id", n_shards=5
    ).collect()
    key = lambda r: (r.cls or "", r.id)
    assert sorted(key(r) for r in out) == sorted(key(r) for r in out2)


def test_readability_scores_hand_checked(spark):
    """'the cat sat. it ran!' -> 5 words, 2 sentence runs, vowel runs:
    e,a,a,i,a = 5 -> wps 2.5 (2500000 ppm), spw 1.0."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        readability_scores,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat. it ran!"), (2, "")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in readability_scores(df).collect()}
    r = out[1]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 5)
    assert r.wps_ppm == 5 * 1000000 // 2
    assert r.spw_ppm == 1000000
    assert r.fk_u == 5 * 390000 // 2 + 5 * 11800000 // 5 - 15590000
    z = out[2]
    assert (z.n_words, z.n_sentences, z.n_syllables) == (0, 0, 0)
    assert z.fk_u == -15590000


def test_ks_two_sample_identical_and_shifted(spark):
    """Identical distributions -> D = 0; disjoint supports -> D = 1
    (d_scaled = n_a·n_b at the last a-value); shard count does not
    change the statistic."""
    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        ks_two_sample,
    )

    same = [(float(i % 10), "a") for i in range(50)]
    same += [(float(i % 10), "b") for i in range(50)]
    df = spark.createDataFrame(same, "v double, g string")
    r = ks_two_sample(
        df, value_col="v", group_col="g", group_a="a", group_b="b"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.d_scaled, r.ks_d) == (50, 50, 0, 0.0)
    dis = [(float(i), "a") for i in range(10)]
    dis += [(float(100 + i), "b") for i in range(20)]
    df2 = spark.createDataFrame(dis, "v double, g string")
    r2 = ks_two_sample(
        df2, value_col="v", group_col="g", group_a="a", group_b="b",
        n_shards=5,
    ).collect()[0]
    assert (r2.n_a, r2.n_b) == (10, 20)
    assert r2.d_scaled == 10 * 20 and r2.ks_d == 1.0
    assert r2.at_value == 9.0  # earliest value where the gap peaks


def test_psi_drift_identical_is_near_zero(spark):
    """Identical bucket distributions -> psi EXACTLY 0: the µ-floor can
    shave each mathematically-zero bucket's IEEE-noise contribution down
    to −1µ, and the output-level GREATEST clamp (ADVICE r10 — PSI is
    defined ≥ 0) brings the sum back to 0. A hard shift -> clearly
    positive psi. Laplace smoothing keeps one-sided buckets finite."""
    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        psi_drift,
    )

    same = [(i % 5, "a") for i in range(100)] + [
        (i % 5, "b") for i in range(100)
    ]
    df = spark.createDataFrame(same, "bk bigint, g string")
    r = psi_drift(
        df, bucket_col="bk", group_col="g", group_a="a", group_b="b"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.n_buckets) == (100, 100, 5)
    assert r.psi_u == 0 and r.psi == 0.0  # clamp: never negative
    shifted = [(0, "a")] * 100 + [(9, "b")] * 100
    df2 = spark.createDataFrame(shifted, "bk bigint, g string")
    r2 = psi_drift(
        df2, bucket_col="bk", group_col="g", group_a="a", group_b="b"
    ).collect()[0]
    assert r2.n_buckets == 2 and r2.psi > 5.0  # near-disjoint -> huge


def test_seasonal_dow_profile_weekday_math(spark):
    """dow = (epoch_day + 4) mod 7 anchors 1970-01-01 (a Thursday) at 4,
    i.e. 0 = Sunday-first-minus... the CONVENTION the query documents is
    simply a stable 0..6 cycle — lock its two invariants: 2024-01-01
    (epoch day 19723, a Monday) lands on 1, and 7 consecutive days hit
    every residue exactly once."""
    import datetime as dt
    from pyspark.sql import functions as F

    days = [(1, "t", dt.datetime(2024, 1, 1 + i)) for i in range(7)]
    df = spark.createDataFrame(
        days, "id bigint, event_type string, ts timestamp"
    )
    b = df.select(
        "event_type",
        F.pmod(
            F.unix_date(F.to_date("ts")).cast("bigint") + F.lit(4), F.lit(7)
        ).alias("dow"),
    )
    rows = b.orderBy("dow").collect()
    assert [r.dow for r in rows] == list(range(7))
    assert rows[1].dow == 1 and (19723 + 4) % 7 == 1  # Monday anchor


def test_duplicated_spans_vs_corpus_composition(spark, tmp_path):
    """Incremental substring dedup (VERDICT r10 #5) equals the
    batch-global pass over the union, restricted to the batch — and the
    append COMMIT keeps increment 2 exact w.r.t. increment 1's n-grams
    without ever re-reading corpus text."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        duplicated_spans,
        duplicated_spans_vs_corpus,
        ngram_count_table,
    )

    shared01 = "alpha beta gamma delta epsilon zeta"  # day0 ↔ day1 dup
    shared12 = "one two three four five six seven"    # day1 ↔ day2 dup
    day0 = [(1, f"intro {shared01} outro0"), (2, "plain old text here x y z w v")]
    day1 = [
        (10, f"lead {shared01} tail1"),          # dup vs CORPUS only
        (11, f"pre {shared12} post"),            # dup only after day2? no — within union day0∪day1 it is unique
        (12, "completely novel tokens q r s t u"),
    ]
    day2 = [
        (20, f"again {shared12} end"),           # dup vs COMMITTED day1
        (21, "fresh unseen words aa bb cc dd ee"),
    ]
    d0 = spark.createDataFrame(day0, ["doc_id", "text"])
    d1 = spark.createDataFrame(day1, ["doc_id", "text"])
    d2 = spark.createDataFrame(day2, ["doc_id", "text"])

    path = str(tmp_path / "ngrams")
    ngram_count_table(d0, path, n=5)
    t = spark.read.parquet(path)
    got1 = sorted(
        tuple(r) for r in duplicated_spans_vs_corpus(
            d1, corpus_ngrams=t, n=5, min_occurrences=2
        ).collect()
    )
    exp1 = sorted(
        tuple(r)
        for r in duplicated_spans(
            d0.unionByName(d1), n=5, min_occurrences=2
        ).collect()
        if r[0] >= 10
    )
    assert got1 == exp1 and len(got1) >= 1  # the shared01 span found
    assert all(did == 10 for did, *_ in got1)  # 11/12 have no union dup

    # WITHOUT the commit, day2's shared12 span is invisible (proves the
    # append is what carries day1 state forward) — checked BEFORE the
    # append so the pre-commit state is unambiguous
    got2_stale = duplicated_spans_vs_corpus(
        d2, corpus_ngrams=t, n=5, min_occurrences=2
    ).collect()
    assert got2_stale == []

    # COMMIT: append day1 counts; day2 must now see day1's n-grams
    ngram_count_table(d1, path, n=5, mode="append")
    t2 = spark.read.parquet(path)
    got2 = sorted(
        tuple(r) for r in duplicated_spans_vs_corpus(
            d2, corpus_ngrams=t2, n=5, min_occurrences=2
        ).collect()
    )
    exp2 = sorted(
        tuple(r)
        for r in duplicated_spans(
            d0.unionByName(d1).unionByName(d2), n=5, min_occurrences=2
        ).collect()
        if r[0] >= 20
    )
    assert got2 == exp2 and [did for did, *_ in got2] == [20]

    # APPLY half: strip vs corpus == batch-global strip over the union
    # restricted to the batch (cleaned text compared verbatim)
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        strip_duplicated_spans,
        strip_duplicated_spans_vs_corpus,
    )

    got_s = sorted(
        tuple(r) for r in strip_duplicated_spans_vs_corpus(
            d2, corpus_ngrams=t2, n=5, min_occurrences=2
        ).collect()
    )
    exp_s = sorted(
        tuple(r)
        for r in strip_duplicated_spans(
            d0.unionByName(d1).unionByName(d2), n=5, min_occurrences=2
        ).collect()
        if r[0] >= 20
    )
    assert got_s == exp_s
    by_s = {r[0]: r for r in got_s}
    assert by_s[20][2] >= 5 and "three four five" not in by_s[20][3]
    assert by_s[21][2] == 0


def test_strip_lines_vs_corpus_composition(spark, tmp_path):
    """Incremental CCNet line strip equals the batch-global pass over
    the union restricted to the batch; the append commit carries day-1
    prevalence into day-2 decisions without re-reading corpus text."""
    from bigdata_retailrocket_recsys_spark.operators.text import (
        line_prevalence_table,
        strip_repeated_lines,
        strip_repeated_lines_vs_corpus,
    )

    footer = "subscribe to our newsletter"
    day0 = [(1, f"alpha body one\n{footer}"), (2, f"beta body two\n{footer}")]
    day1 = [
        (10, f"gamma body three\n{footer}"),   # footer hits min_docs=3 via corpus
        (11, "delta unique content\n\nwith a blank line"),
    ]
    day2 = [(20, f"epsilon body four\n{footer}"), (21, "zeta fresh text")]
    d0 = spark.createDataFrame(day0, ["doc_id", "text"])
    d1 = spark.createDataFrame(day1, ["doc_id", "text"])
    d2 = spark.createDataFrame(day2, ["doc_id", "text"])

    path = str(tmp_path / "lines")
    line_prevalence_table(d0, path)
    t = spark.read.parquet(path)
    got1 = sorted(
        tuple(r) for r in strip_repeated_lines_vs_corpus(
            d1, corpus_lines=t, min_docs=3
        ).collect()
    )
    exp1 = sorted(
        tuple(r)
        for r in strip_repeated_lines(
            d0.unionByName(d1), min_docs=3
        ).collect()
        if r[0] >= 10
    )
    assert got1 == exp1
    by = {r[0]: r for r in got1}
    assert by[10][2] == 1 and footer not in by[10][3]  # footer stripped
    assert by[11][2] == 0 and "\n\n" in by[11][3]      # blank line kept

    # pre-commit: day2's footer sees only corpus(2) + batch(1) = 3 >= 3
    # via day0 alone — craft the assertion through the full union instead
    line_prevalence_table(d1, path, mode="append")
    t2 = spark.read.parquet(path)
    got2 = sorted(
        tuple(r) for r in strip_repeated_lines_vs_corpus(
            d2, corpus_lines=t2, min_docs=3
        ).collect()
    )
    exp2 = sorted(
        tuple(r)
        for r in strip_repeated_lines(
            d0.unionByName(d1).unionByName(d2), min_docs=3
        ).collect()
        if r[0] >= 20
    )
    assert got2 == exp2
    by2 = {r[0]: r for r in got2}
    assert by2[20][2] == 1 and by2[21][2] == 0


def test_chunk_binary_cdc_arrow_gear(spark):
    """Gear-hash Arrow CDC tier: exact tiling + byte-exact reassembly,
    NULL/empty yield nothing, determinism, and insert-shift robustness
    (the gear recurrence's implicit 64-byte window bounds the
    disturbance) — same contract as the relational md5 tier, different
    (but pinned) boundary positions."""
    import collections
    import hashlib
    import random

    from bigdata_retailrocket_recsys_spark.operators.multimodal import (
        chunk_binary_cdc_arrow,
    )

    random.seed(7)
    a = bytes(random.randrange(256) for _ in range(2000))
    b = a[:137] + b"XYZ" + a[137:]
    df = spark.createDataFrame(
        [
            (1, bytearray(a)),
            (2, bytearray(b)),
            (3, None),
            (4, bytearray(b"")),
            (5, bytearray(b"ab")),
        ],
        "asset_id int, payload binary",
    )
    rows = chunk_binary_cdc_arrow(df, avg_chunk_bytes=64).collect()
    by = collections.defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.asset_id, r.chunk_idx)):
        by[r.asset_id].append(r)
    for aid, want in ((1, a), (2, b), (5, b"ab")):
        off = 1
        for r in by[aid]:
            assert r.chunk_off == off, (aid, r)
            assert r.chunk_len == len(bytes(r.chunk)) >= 1
            off += r.chunk_len
        assert b"".join(bytes(r.chunk) for r in by[aid]) == want
    assert 3 not in by and 4 not in by
    da = {hashlib.md5(bytes(r.chunk)).hexdigest() for r in by[1]}
    db = {hashlib.md5(bytes(r.chunk)).hexdigest() for r in by[2]}
    assert len(da & db) >= len(da) - 3  # ≤64-byte disturbance window
    again = chunk_binary_cdc_arrow(
        df.filter("asset_id = 1"), avg_chunk_bytes=64
    ).collect()
    assert sorted(
        (r.chunk_idx, r.chunk_off, r.chunk_len) for r in again
    ) == [(r.chunk_idx, r.chunk_off, r.chunk_len) for r in by[1]]
    with pytest.raises(ValueError):
        chunk_binary_cdc_arrow(df, avg_chunk_bytes=48)  # not a power of 2
    # FastCDC clamps: every chunk in [min, max] except a short tail;
    # clamped chunking still tiles + reassembles and resyncs after an
    # insert at the next accepted boundary
    cl = sorted(
        chunk_binary_cdc_arrow(
            df.filter("asset_id in (1, 2)"),
            avg_chunk_bytes=64,
            min_chunk_bytes=32,
            max_chunk_bytes=128,
        ).collect(),
        key=lambda r: (r.asset_id, r.chunk_idx),
    )
    byc = collections.defaultdict(list)
    for r in cl:
        byc[r.asset_id].append(r)
    for aid, want in ((1, a), (2, b)):
        rs = byc[aid]
        assert b"".join(bytes(r.chunk) for r in rs) == want
        for r in rs[:-1]:
            assert 32 <= r.chunk_len <= 128, (aid, r)
        assert rs[-1].chunk_len <= 128
    ca = {hashlib.md5(bytes(r.chunk)).hexdigest() for r in byc[1]}
    cb = {hashlib.md5(bytes(r.chunk)).hexdigest() for r in byc[2]}
    assert len(ca & cb) >= len(ca) // 2  # resync after the edit region
    with pytest.raises(ValueError):
        chunk_binary_cdc_arrow(
            df, avg_chunk_bytes=64, min_chunk_bytes=9, max_chunk_bytes=8
        )


def test_psi_drift_quantile_identity_and_shift(spark):
    """Quantile-bin PSI: identical slices -> exactly 0 (clamped);
    a hard shift of the current slice -> clearly positive; baseline
    deciles put ~1/n of the BASELINE in every bin; a single-valued
    baseline degenerates to one observed bucket without error."""
    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        psi_drift_quantile,
    )

    same = [(float(i % 100), "a") for i in range(1000)]
    same += [(float(i % 100), "b") for i in range(1000)]
    df = spark.createDataFrame(same, "v double, g string")
    r = psi_drift_quantile(
        df, value_col="v", group_col="g", group_a="a", group_b="b"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.n_buckets) == (1000, 1000, 10)
    assert r.psi_u == 0 and r.psi == 0.0

    shifted = [(float(i % 100), "a") for i in range(1000)]
    shifted += [(float(500 + i % 100), "b") for i in range(1000)]
    df2 = spark.createDataFrame(shifted, "v double, g string")
    r2 = psi_drift_quantile(
        df2, value_col="v", group_col="g", group_a="a", group_b="b"
    ).collect()[0]
    assert r2.psi > 1.0  # total mass migration -> huge PSI

    one = [(5.0, "a")] * 50 + [(5.0, "b")] * 30 + [(7.0, "b")] * 20
    df3 = spark.createDataFrame(one, "v double, g string")
    r3 = psi_drift_quantile(
        df3, value_col="v", group_col="g", group_a="a", group_b="b"
    ).collect()[0]
    # baseline single-valued: all edges equal 5.0, values 5.0 tie LEFT
    # (bucket 0), 7.0 lands right of every edge
    assert r3.n_buckets == 2 and r3.psi > 0.0


def test_rolling_value_quantiles_exact(spark):
    """Trailing-window quantiles are exact order statistics: day D's row
    aggregates days [D-6, D] (observations flow FORWARD to their window
    ends); p50/p95 are the cross-multiplied rank values on hand-
    computable inputs; NaN/inf rows are excluded; only active days
    report."""
    from datetime import datetime as dt

    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        rolling_value_quantiles,
    )

    rows = [(dt(2024, 1, 10, 12), float(i)) for i in range(1, 101)]
    rows += [(dt(2024, 1, 12, 3), 1000.0), (dt(2024, 1, 12, 4), float("nan"))]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {
        r.end_day: r
        for r in rolling_value_quantiles(
            df, ts_col="ts", value_col="value", window_days=7
        ).collect()
    }
    d10 = (dt(2024, 1, 10) - dt(1970, 1, 1)).days
    # only the two ACTIVE days report (semi-join to real days)
    assert set(got) == {d10, d10 + 2}
    r1 = got[d10]
    assert (r1.n_obs, r1.min_c, r1.p50_c, r1.p95_c, r1.max_c) == (
        100, 100, 5000, 9500, 10000,
    )
    r2 = got[d10 + 2]  # trailing window includes day 10's 100 obs + 1000.0
    assert r2.n_obs == 101 and r2.max_c == 100000 and r2.p95_c == 9600


def test_collocations_pmi_planted(spark):
    """A planted always-adjacent pair tops PMI; a high-frequency but
    independent pair scores near zero; min_count suppresses the
    one-occurrence hapax pathology."""
    import random

    from bigdata_retailrocket_recsys_spark.operators.text import (
        collocations_pmi,
    )

    random.seed(11)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for d in range(60):
        toks = [random.choice(vocab) for _ in range(20)]
        toks[5:5] = ["new", "york"]  # planted collocation, every doc
        rows.append((d, " ".join(toks)))
    rows.append((999, "hapaxa hapaxb"))  # 1-occurrence pair
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = collocations_pmi(df, min_count=5, top_k=10).collect()
    assert (out[0].w1, out[0].w2) == ("new", "york")
    assert out[0].n_ab == 60 and out[0].pmi_u > 1_000_000  # PMI >> 1 nat
    names = {(r.w1, r.w2) for r in out}
    assert ("hapaxa", "hapaxb") not in names  # min_count suppression
    # random vocab pairs that slip in score far below the planted pair
    assert all(r.pmi_u <= out[0].pmi_u for r in out)


def test_embed_sign_buckets_guards_and_determinism(spark):
    """Incremental embedding tier (VERDICT r11 #3): unhashable vectors
    (NULL, wrong dim, NaN/inf component) are excluded; buckets are a
    pure function of the vector (repartitioning never changes them) and
    identical vectors always share every bucket."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embed_sign_buckets,
    )

    rows = [
        (1, [0.5, -0.25, 0.125, 1.0]),
        (2, [0.5, -0.25, 0.125, 1.0]),      # identical to 1
        (3, [-1.0, 2.0, -3.0, 0.0625]),
        (4, None),                          # NULL vector
        (5, [1.0, 2.0]),                    # wrong dim
        (6, [1.0, float("nan"), 0.0, 0.0]), # NaN component
        (7, [1.0, float("inf"), 0.0, 0.0]), # inf component
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = embed_sign_buckets(df, dim=4, tables=3, bits=6)
    got = {(r.vec_id, r.tbl): r.bucket for r in out.collect()}
    assert {v for v, _ in got} == {1, 2, 3}
    assert all((1, t) in got and got[(1, t)] == got[(2, t)] for t in range(3))
    again = {
        (r.vec_id, r.tbl): r.bucket
        for r in embed_sign_buckets(
            df.repartition(7), dim=4, tables=3, bits=6
        ).collect()
    }
    assert again == got


def test_embed_candidates_vs_corpus_composition_invariant(spark):
    """The vs-corpus bipartite candidates over a PERSISTED bucket table
    must equal the batch↔corpus pairs of a batch-global bucketing of
    corpus ∪ batch — the incremental-family composition invariant
    (same lock as q_dedup_incremental_spans' unit twin)."""
    import random

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embed_bucket_table,
        embed_candidates_vs_corpus,
        embed_sign_buckets,
    )

    random.seed(5)
    vecs = [
        (i, [random.gauss(0, 1) for _ in range(8)]) for i in range(120)
    ]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    corpus = df.filter(F.col("vec_id") % 3 != 0)
    batch = df.filter(F.col("vec_id") % 3 == 0)
    import tempfile

    path = tempfile.mkdtemp() + "/bk"
    embed_bucket_table(corpus, path, dim=8, tables=3, bits=4)
    inc = {
        (r.batch_vid, r.corpus_vid, r.n_shared_tables)
        for r in embed_candidates_vs_corpus(
            batch, spark.read.parquet(path), dim=8, tables=3, bits=4
        ).collect()
    }
    # batch-global pass over corpus ∪ batch, restricted to cross pairs
    allb = embed_sign_buckets(df, dim=8, tables=3, bits=4)
    a, b = allb.alias("a"), allb.alias("b")
    glob = {
        (r.bv, r.cv, r.n)
        for r in a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") % 3 == 0)
            & (F.col("b.vec_id") % 3 != 0),
        )
        .groupBy(
            F.col("a.vec_id").alias("bv"), F.col("b.vec_id").alias("cv")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert inc == glob and len(inc) > 0


def test_embed_candidates_vs_corpus_max_bucket(spark):
    """Corpus-side hot-bucket cap on the embedding vs-corpus join: a
    planted family of identical corpus vectors floods one cell per
    table; with max_bucket=m only the m smallest corpus ids join, the
    overflow is audited, and the batch doc's is-dup decision survives
    (it still meets m family representatives)."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embed_bucket_table,
        embed_candidates_vs_corpus,
    )

    fam = [(i, [1.0, 2.0, -0.5, 0.25]) for i in range(100)]
    df = spark.createDataFrame(fam, "vec_id int, embedding array<double>")
    batch = spark.createDataFrame(
        [(500, [1.0, 2.0, -0.5, 0.25])], "vec_id int, embedding array<double>"
    )
    import tempfile

    path = tempfile.mkdtemp() + "/bkcap"
    embed_bucket_table(df, path, dim=4, tables=2, bits=4)
    unc = embed_candidates_vs_corpus(
        batch, spark.read.parquet(path), dim=4, tables=2, bits=4
    ).collect()
    assert len(unc) == 100  # every family member pairs with the batch doc
    cap = embed_candidates_vs_corpus(
        batch, spark.read.parquet(path), dim=4, tables=2, bits=4,
        max_bucket=10,
    ).collect()
    assert len(cap) == 10  # the 10 smallest corpus ids per cell
    assert {r.corpus_vid for r in cap} == set(range(10))
    assert all(
        r.n_shared_tables == 2 and r.max_bucket_overflow == 90 for r in cap
    )


def test_semdedup_apply_vs_corpus(spark):
    """Incremental SemDeDup apply: exact copies of corpus vectors are
    dropped (cosine 1.0 ≥ threshold), dissimilar batch rows survive,
    and unhashable batch rows (NULL vector) always survive."""
    import random

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embed_bucket_table,
        semdedup_apply_vs_corpus,
    )

    random.seed(9)
    corpus_rows = [
        (i, [random.gauss(0, 1) for _ in range(8)]) for i in range(50)
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id int, embedding array<double>"
    )
    batch_rows = (
        [(1000 + i, corpus_rows[i][1]) for i in range(5)]  # copies
        + [(2000, [float(x) for x in [9, -9, 9, -9, 9, -9, 9, -9]])]
        + [(3000, None)]  # unhashable
    )
    batch = spark.createDataFrame(
        batch_rows, "vec_id int, embedding array<double>"
    )
    import tempfile

    path = tempfile.mkdtemp() + "/bksem"
    embed_bucket_table(corpus, path, dim=8, tables=4, bits=4)
    surv = {
        r.vec_id
        for r in semdedup_apply_vs_corpus(
            batch, spark.read.parquet(path), corpus, dim=8, tables=4,
            bits=4, min_cosine=0.95,
        ).collect()
    }
    assert surv == {2000, 3000}


def test_avro_roundtrip(spark):
    """Avro round-trip (VERDICT r11 #6): the 'avro' short name is the
    external connector's ServiceLoader alias (absent here), but Spark 4
    bundles the provider class in spark-sql — avro_format resolves the
    working tier and the write→read round-trip is value-identical
    (NULLs included). On a build with neither, the wrappers refuse
    loudly instead of failing mid-job with ClassNotFoundException."""
    import tempfile

    from bigdata_retailrocket_recsys_spark.sources.avro_io import (
        avro_available,
        avro_format,
        read_avro,
        write_avro,
    )

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None)], "id bigint, s string, v double"
    )
    path = tempfile.mkdtemp() + "/avro"
    if not avro_available(spark):
        with pytest.raises(NotImplementedError, match="spark-avro"):
            write_avro(df, path)
        return
    fmt = avro_format(spark)
    write_avro(df, path)
    back = read_avro(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    assert fmt == "avro" or fmt.endswith("AvroFileFormat")


def test_embed_lsh_pairs_twin(spark):
    """embed_lsh_pairs (r12 graduation twin): candidates are a SUBSET of
    exact cosine pairs (verify is exact), identical vectors always pair
    (they share every bucket), and the capped path is value-identical
    when the cap never fires."""
    import random

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embed_lsh_pairs,
        embedding_cosine_pairs,
    )

    random.seed(4)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    rows += [(100, rows[0][1]), (101, rows[1][1])]  # exact copies
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in embed_lsh_pairs(
            df, dim=8, tables=6, bits=4, min_cosine=0.9
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs(
            df, id_col="vec_id", vec_col="embedding", min_cosine=0.9
        ).collect()
    }
    assert got <= exact
    assert (0, 100) in got and (1, 101) in got  # identical → every bucket
    hi = {
        (r.id_a, r.id_b)
        for r in embed_lsh_pairs(
            df, dim=8, tables=6, bits=4, min_cosine=0.9, max_bucket=10**6
        ).collect()
    }
    assert hi == got


def test_stream_embed_commit_equals_batch_chain(spark):
    """q_stream_embed_commit composition invariant: the foreachBatch
    decide+commit loop over two pinned-order staged files must equal
    the sequential BATCH chain (bucket table → batch1 survivors →
    append → batch2 survivors) exactly — the commit round-trip and the
    eager pre-append checkpoint are what keep them identical."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embed_bucket_table,
        embed_candidates_vs_corpus,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table
    from bigdata_retailrocket_recsys_spark.streaming.embed_intake import (
        run_streaming_embed_commit,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.vec_id, r.label)
        for r in run_streaming_embed_commit(spark, sf_dir).collect()
    }

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
    )
    m = F.pmod(F.col("vec_id"), F.lit(4))
    import tempfile

    path = tempfile.mkdtemp() + "/bk"
    embed_bucket_table(emb.filter(m.isin(2, 3)), path, dim=64, bits=12)
    surv = []
    for sel in (m == 1, m == 0):
        batch = emb.filter(sel)
        dup = (
            embed_candidates_vs_corpus(
                batch, spark.read.parquet(path), dim=64, bits=12
            )
            .select(F.col("batch_vid").alias("vec_id"))
            .distinct()
        )
        s = (
            batch.join(dup, "vec_id", "left_anti")
            .select("vec_id", "embedding", "label")
            .localCheckpoint(eager=True)
        )
        embed_bucket_table(s, path, dim=64, bits=12, mode="append")
        surv.extend((r.vec_id, r.label) for r in s.collect())
    assert got == set(surv) and len(got) > 0

def test_embed_sign_buckets_literal_vs_join_form(spark):
    """r13 array-grain rewrite (VERDICT r12 #2): the literal-planes
    single-projection form is value-identical to the broadcast-join
    fallback, and its optimized plan has ZERO Exchange and exactly ONE
    quantization site (fused into the dot lambda — a separate q alias
    is inlined by CollapseProject and would re-quantize per bit)."""
    import random

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        _embed_sign_buckets_join_form,
        _hashable_vectors,
        embed_sign_buckets,
    )

    random.seed(11)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    lit_form = embed_sign_buckets(df, dim=8, tables=3, bits=5)
    join_form = _embed_sign_buckets_join_form(
        _hashable_vectors(df, dim=8, id_col="vec_id", vec_col="embedding"),
        spark, tables=3, bits=5, dim=8, id_col="vec_id",
    )
    a = sorted((r.vec_id, r.tbl, r.bucket) for r in lit_form.collect())
    b = sorted((r.vec_id, r.tbl, r.bucket) for r in join_form.collect())
    assert a == b and len(a) == 80 * 3
    plan = lit_form._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("FLOOR(") == 1


def test_embed_sign_buckets_multiprobe(spark):
    """Multi-probe (VERDICT r12 #8): n_probes emits exactly 1+n_probes
    buckets per (vector, table); the main bucket is always among them;
    every probe is Hamming distance 1 from the main bucket; n_probes=0
    is unchanged; out-of-range n_probes raises."""
    import collections
    import random

    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embed_sign_buckets,
    )

    random.seed(12)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    main = {
        (r.vec_id, r.tbl): r.bucket
        for r in embed_sign_buckets(df, dim=8, tables=3, bits=6).collect()
    }
    probed = [
        (r.vec_id, r.tbl, r.bucket)
        for r in embed_sign_buckets(
            df, dim=8, tables=3, bits=6, n_probes=2
        ).collect()
    ]
    per_cell = collections.Counter((v, t) for v, t, _ in probed)
    assert set(per_cell.values()) == {3}
    got = collections.defaultdict(set)
    for v, t, bk in probed:
        got[(v, t)].add(bk)
    for key, bks in got.items():
        assert main[key] in bks
        assert all(
            bin(bk ^ main[key]).count("1") <= 1 for bk in bks
        )
    with _pytest.raises(ValueError, match="n_probes"):
        embed_sign_buckets(df, dim=8, tables=3, bits=6, n_probes=7)


def test_embed_bits_contract(spark):
    """bits contract (VERDICT r12 #1): embed_sign_buckets derives
    bits ≈ log2(N)+4 from a count when not passed; the artifact writer
    and both vs-corpus consumers RAISE without an explicit bits (a
    silently-defaulted plane family cannot be matched later)."""
    import tempfile

    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        _auto_bits,
        embed_bucket_table,
        embed_candidates_vs_corpus,
        embed_sign_buckets,
        semdedup_apply_vs_corpus,
    )

    assert _auto_bits(1) == 8
    assert _auto_bits(500) == 13
    assert _auto_bits(1_000_000) == 24
    assert _auto_bits(2**62) == 62

    rows = [(i, [float(i % 7) - 3.0] * 4) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # auto-derived bits: 20 vectors -> ceil(log2(20))+4 = 9 -> buckets < 2^9
    auto = embed_sign_buckets(df, dim=4, tables=2)
    assert all(0 <= r.bucket < 2**9 for r in auto.collect())

    path = tempfile.mkdtemp() + "/bk"
    with _pytest.raises(ValueError, match="bits"):
        embed_bucket_table(df, path, dim=4)
    embed_bucket_table(df, path, dim=4, bits=8)
    bt = spark.read.parquet(path)
    with _pytest.raises(ValueError, match="bits"):
        embed_candidates_vs_corpus(df, bt, dim=4)
    with _pytest.raises(ValueError, match="bits"):
        semdedup_apply_vs_corpus(df, bt, df, dim=4)


def test_embed_lsh_audit_planted_recall(spark):
    """embed_lsh_audit (VERDICT r12 #1): planted exact copies are
    always HITS (identical vectors share every bucket), so n_misses
    counts only genuine near-threshold recall failures; the confusion
    row is internally consistent; truth excludes unhashable vectors."""
    import random

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        embed_lsh_audit,
    )

    random.seed(13)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # exact copies
    rows += [(200, None), (201, [float("nan")] * 8)]   # unhashable
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    r = embed_lsh_audit(
        df, dim=8, tables=4, bits=6, min_cosine=0.95
    ).collect()[0]
    assert r.n_hits + r.n_misses == r.n_truth
    assert r.n_hits + r.n_false_alarms == r.n_candidates
    assert r.n_truth >= 5          # the 5 planted pairs are truth
    # planted copies always collide -> at most the non-planted
    # near-threshold pairs can be misses
    assert r.n_hits >= 5

def test_delta_io_gate(spark):
    """Delta/Iceberg packaging decision (VERDICT r12 #7, the avro_io
    precedent): resolver works to its gate — on this sandbox neither
    connector is deployed, so availability is False and every entry
    point raises the LOUD NotImplementedError with the deployment
    recipe (never a silent parquet fallback); the builder confs are the
    documented extension pair. If a connector IS deployed, the gate
    opens and a write/read round-trip must work."""
    import tempfile

    import pytest as _pytest

    from bigdata_retailrocket_recsys_spark.sources.delta_io import (
        delta_available,
        delta_format,
        delta_session_confs,
        iceberg_available,
        read_delta,
        write_delta,
    )

    confs = delta_session_confs()
    assert confs["spark.sql.extensions"].endswith("DeltaSparkSessionExtension")
    assert confs["spark.sql.catalog.spark_catalog"].endswith("DeltaCatalog")
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    path = tempfile.mkdtemp() + "/delta"
    if not delta_available(spark):
        with _pytest.raises(NotImplementedError, match="delta-spark"):
            delta_format(spark)
        with _pytest.raises(NotImplementedError, match="q_sink_upsert"):
            write_delta(df, path)
        assert iceberg_available(spark) in (False, True)  # classpath probe runs
        return
    write_delta(df, path)
    got = sorted((r.id, r.v) for r in read_delta(spark, path).collect())
    assert got == [(i, 2 * i) for i in range(5)]

def test_ivf_pinned_exact_int(spark):
    """Pinned-centroid exact-integer IVF (r13 graduation twin): a
    centroid's own vector lands in its cell at distance 0; probe
    results equal a brute-force integer-dot top-k over the probed
    cells' members; out-of-domain vectors (|v| >= 100) are excluded
    like unhashable ones; the probe scan is partition-pruned."""
    import random
    import tempfile

    from bigdata_retailrocket_recsys_spark.operators.similarity import (
        dot_topk_ivf_pinned_at_rest,
        ivf_pinned_write_at_rest,
    )

    random.seed(17)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(90)]
    rows.append((500, [250.0] * 8))  # out of quantization domain
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    path = tempfile.mkdtemp() + "/ivf"
    ivf_pinned_write_at_rest(df, path, dim=8, n_cells=4)
    vecs = spark.read.parquet(path + "/vectors")
    stored = {r.vec_id for r in vecs.select("vec_id").collect()}
    assert 500 not in stored and len(stored) == 90
    # centroids are vectors of ids 0..3 -> each assigned to its own cell
    own = {
        r.vec_id: r.cell
        for r in vecs.filter(F.col("vec_id") < 4).collect()
    }
    cent = {
        r.cell: r.cent
        for r in spark.read.parquet(path + "/centroids").collect()
    }
    qv = {r.vec_id: r.qv for r in vecs.collect()}
    for vid, cell in own.items():
        assert list(cent[cell]) == list(qv[vid])

    queries = df.filter(F.col("vec_id").isin(10, 20)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = dot_topk_ivf_pinned_at_rest(
        spark, path, queries, dim=8, k=3, nprobe=2
    )
    got = [(r.query_id, r.vec_id, r.dot, r.rank) for r in out.collect()]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # brute-force replay in python over the stored quantized vectors
    cells = {r.vec_id: r.cell for r in vecs.collect()}
    for qid in (10, 20):
        d2 = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv[qid], cv)), c)
            for c, cv in cent.items()
        )
        probed = {c for _, c in d2[:2]}
        cand = [
            v for v in stored if cells[v] in probed and v != qid
        ]
        exp = sorted(
            (
                (-sum(a * b for a, b in zip(qv[v], qv[qid])), v)
                for v in cand
            )
        )[:3]
        want = [
            (qid, v, -negdot, i + 1)
            for i, (negdot, v) in enumerate(exp)
        ]
        assert sorted(
            (g for g in got if g[0] == qid), key=lambda g: g[3]
        ) == want

def test_winnowing_matches_naive_reference(spark):
    """Winnowing (Schleimer et al. 2003): the relational window-explode
    selection must equal a naive pure-python robust-winnowing reference
    EXACTLY (positions and hashes), the ≥ w+k-1 shared-passage
    guarantee must hold on a planted passage, the density must sit near
    2/(w+1), and max_fp_docs must drop too-common fingerprints from
    pairing (the MOSS ignore rule)."""
    import hashlib
    import random

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_pairs,
    )

    K, W = 3, 4
    random.seed(3)

    def mk(n):
        return " ".join("w%d" % random.randrange(40) for _ in range(n))

    docs = [(i, mk(random.choice([1, 2, 3, 5, 8, 30, 60]))) for i in range(50)]
    shared = mk(10)  # > w+k-1 = 6 tokens -> must share a fingerprint
    docs += [
        (100, mk(20) + " " + shared + " " + mk(5)),
        (101, shared + " " + mk(25)),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")

    def naive(text):
        toks = text.strip().split()
        grams = (
            [" ".join(toks)]
            if len(toks) < K
            else [" ".join(toks[i:i + K]) for i in range(len(toks) - K + 1)]
        )
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        n = len(hs)
        sel = set()
        for j in range(max(n - W + 1, 1)):
            wnd = hs[j:j + W]
            m = min(wnd)
            p = max(i for i in range(j, min(j + W, n)) if hs[i] == m)
            sel.add((p, hs[p]))
        return sel

    exp = {d: naive(t) for d, t in docs}
    got = {}
    for r in winnowing_fingerprints(df, k=K, w=W, hash_fn="md5").collect():
        got.setdefault(r.doc, set()).add((r.pos, r.fp))
    assert got == exp
    f100 = {h for _, h in got[100]}
    f101 = {h for _, h in got[101]}
    assert f100 & f101  # the winnowing guarantee
    tot = sum(len(v) for v in got.values())
    grams = sum(max(len(t.split()) - K + 1, 1) for _, t in docs)
    assert 0.25 <= tot / grams <= 0.55  # density ~ 2/(w+1) = 0.4

    pairs = {
        (r.doc_a, r.doc_b): r.n_common
        for r in winnowing_pairs(
            df, k=K, w=W, hash_fn="md5", min_common=1
        ).collect()
    }
    assert (100, 101) in pairs
    # xxhash64 scale tier: same selection geometry, different hashes —
    # the planted pair must still be found
    x = {
        (r.doc_a, r.doc_b)
        for r in winnowing_pairs(
            df, k=K, w=W, hash_fn="xxhash64", min_common=1
        ).collect()
    }
    assert (100, 101) in x
    # MOSS ignore rule: capping at 1 doc per fingerprint kills ALL pairs
    none = winnowing_pairs(
        df, k=K, w=W, hash_fn="md5", min_common=1, max_fp_docs=1
    ).count()
    assert none == 0

def test_winnowing_fingerprint_table_roundtrip(spark):
    """The persisted winnowing artifact equals the direct fingerprint
    set exactly (write→read is lossless), and an append commits a
    doc-disjoint increment so the at-rest table equals the global pass
    over corpus ∪ batch — the incremental-family composition rule."""
    import random
    import tempfile

    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        winnowing_fingerprint_table,
        winnowing_fingerprints,
    )

    random.seed(23)

    def mk(n):
        return " ".join("w%d" % random.randrange(30) for _ in range(n))

    docs = [(i, mk(random.choice([2, 6, 20, 40]))) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    day0 = df.filter(F.col("doc_id") % 2 == 0)
    day1 = df.filter(F.col("doc_id") % 2 == 1)
    path = tempfile.mkdtemp() + "/wfp"
    winnowing_fingerprint_table(day0, path, k=3, w=4, hash_fn="md5")
    winnowing_fingerprint_table(
        day1, path, k=3, w=4, hash_fn="md5", mode="append"
    )
    at_rest = {
        (r.doc, r.pos, r.fp) for r in spark.read.parquet(path).collect()
    }
    direct = {
        (r.doc, r.pos, r.fp)
        for r in winnowing_fingerprints(df, k=3, w=4, hash_fn="md5").collect()
    }
    assert at_rest == direct and len(at_rest) > 0

def test_survival_life_table(spark):
    """Life table semantics on a constructed cohort: durations and the
    churn-vs-censored split follow the horizon minus churn_gap rule;
    n_at_risk is the reverse cumulative count; totals reconcile."""
    import datetime as dt

    from bigdata_retailrocket_recsys_spark.operators.aggregates import (
        survival_life_table,
    )

    def t(day):
        return dt.datetime(2024, 1, 1 + day, 12, 0, 0)

    rows = [
        # u1: days 0..2 (dur 2), last day 2, horizon 30 -> churned
        (1, t(0)), (1, t(2)),
        # u2: days 0..2 (dur 2), churned
        (2, t(0)), (2, t(2)),
        # u3: days 5..25 (dur 20), last day 25 >= 30-14 -> censored
        (3, t(5)), (3, t(25)),
        # u4: day 30 only (dur 0), defines the horizon, censored
        (4, t(30)),
        # u5: days 0..10 (dur 10), last day 10 < 16 -> churned
        (5, t(0)), (5, t(10)),
        (None, t(1)),  # NULL user dropped
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        r.t_days: (r.n_at_risk, r.n_churned, r.n_censored)
        for r in survival_life_table(df, churn_gap_days=14).collect()
    }
    assert got == {
        0: (5, 0, 1),   # all 5 at risk; u4 censored at 0
        2: (4, 2, 0),   # u1, u2 churn at 2
        10: (2, 1, 0),  # u5 churns at 10
        20: (1, 0, 1),  # u3 censored at 20
    }
    tot = sum(c + s for _, c, s in got.values())
    assert tot == 5

def test_stream_winnowing_commit_equals_batch_chain(spark):
    """q_stream_winnowing_commit composition invariant: the foreachBatch
    decide+commit loop over two pinned-order staged files must equal
    the sequential BATCH chain (fingerprint table → batch1 survivors →
    append → batch2 survivors) exactly."""
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        winnowing_fingerprint_table,
        winnowing_fingerprints,
    )
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table
    from bigdata_retailrocket_recsys_spark.streaming.winnow_intake import (
        run_streaming_winnowing_commit,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.doc_id, r.source)
        for r in run_streaming_winnowing_commit(spark, sf_dir).collect()
    }

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    m = F.pmod(F.col("doc_id"), F.lit(4))
    import tempfile

    path = tempfile.mkdtemp() + "/wfp"
    winnowing_fingerprint_table(
        docs.filter(m.isin(2, 3)), path, k=3, w=4, hash_fn="md5"
    )
    surv = []
    for sel in (m == 1, m == 0):
        batch = docs.filter(sel)
        bfp = (
            winnowing_fingerprints(batch, k=3, w=4, hash_fn="md5")
            .select("doc", "fp")
            .distinct()
        )
        cfp = (
            spark.read.parquet(path)
            .select(F.col("doc").alias("cdoc"), "fp")
            .distinct()
        )
        dup = (
            bfp.join(cfp, "fp")
            .groupBy("doc", "cdoc")
            .agg(F.count(F.lit(1)).alias("nc"))
            .filter(F.col("nc") >= 2)
            .select(F.col("doc").alias("doc_id"))
            .distinct()
        )
        s = (
            batch.join(dup, "doc_id", "left_anti")
            .select("doc_id", "text", "source")
            .localCheckpoint(eager=True)
        )
        winnowing_fingerprint_table(
            s, path, k=3, w=4, hash_fn="md5", mode="append"
        )
        surv.extend((r.doc_id, r.source) for r in s.collect())
    assert got == set(surv) and len(got) > 0
