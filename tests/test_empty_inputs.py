"""r08 audit class: every public operator over EMPTY inputs.

At 100 TB an empty frame is routine — any filter, any partition prune, any
first micro-batch can produce one — and driver-side operator code (winner
counts, centroid seeds, threshold folds) is where an implicit "at least
one row" assumption turns into an opaque IndexError or a hung job. This
sweep pins the contract: an operator fed an empty (but correctly-typed)
frame returns an empty frame of its normal schema, or raises its own
documented fail-fast error — never an uncaught driver-side exception.

Probed r08: all clean on first run (the one raise is mixture_sample's
designed fail-fast on absent weighted sources). Kept as a standing test so
a future operator with a hidden first-row assumption fails here by name.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineering_londonhousingmap_spark.operators import (
    dedup,
    joins,
    quantiles,
    sampling,
    similarity,
)


@pytest.fixture()
def frames(spark):
    return {
        "docs": spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string, n_chars long"
        ),
        "emb": spark.createDataFrame(
            [], "vec_id long, embedding array<double>, label string"
        ),
        "one_emb": spark.createDataFrame(
            [(1, [1.0] * 8, "a")], "vec_id long, embedding array<double>, label string"
        ),
        "pts": spark.createDataFrame([], "id long, latitude double, longitude double"),
        "one_pt": spark.createDataFrame(
            [(1, 0.0, 0.0)], "id long, latitude double, longitude double"
        ),
        "rpts": spark.createDataFrame(
            [(9, 1.0, 1.0)], "rid long, r_latitude double, r_longitude double"
        ),
        "empty_rpts": spark.createDataFrame(
            [], "rid long, r_latitude double, r_longitude double"
        ),
        "ev": spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, event_type string, value double"
        ),
    }


def test_dedup_family_on_empty(frames):
    docs = frames["docs"]
    assert dedup.dedup_by_fingerprint(docs, "doc_id", "text").count() == 0
    assert dedup.dedup_first_seen(docs, "text", ["doc_id"]).count() == 0
    sh = dedup.char_shingles(docs, "doc_id", "text")
    assert sh.count() == 0
    sig = dedup.minhash_signatures(sh, "doc_id")
    assert sig.count() == 0
    assert dedup.lsh_candidate_pairs(sig, "doc_id").count() == 0
    assert dedup.ngram_jaccard_pairs(sh, "doc_id").count() == 0
    assert dedup.simhash(docs, "doc_id", "text").count() == 0
    assert dedup.simhash64(docs, "doc_id", "text").count() == 0
    assert dedup.selected_windows(docs, "doc_id", "text").count() == 0
    assert dedup.substring_dedup_pairs(docs, "doc_id", "text").count() == 0
    assert dedup.excise_spans(docs, "doc_id", "text").count() == 0


def test_vocab_family_on_empty(spark):
    from dataengineering_londonhousingmap_spark.operators.vocab import (
        bpe_encode_words,
        bpe_merge_steps,
    )

    words = spark.createDataFrame([], "word string, freq long")
    out = bpe_merge_steps(words, "word", "freq", n_merges=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "iter", "pair_a", "pair_b", "merged", "cnt",
    ]
    enc = bpe_encode_words(words, "word", "freq", n_merges=2)
    assert enc.count() == 0
    assert [f.name for f in enc.schema.fields] == ["word", "seq"]
    from dataengineering_londonhousingmap_spark.operators.vocab import bpe_apply_merges

    merges = spark.createDataFrame([], "iter int, pair_a string, pair_b string")
    ap = bpe_apply_merges(words.select("word"), "word", merges)
    assert ap.count() == 0
    assert [f.name for f in ap.schema.fields] == ["word", "seq"]


def test_similarity_family_on_empty(frames):
    emb, one = frames["emb"], frames["one_emb"]
    # empty corpus × real query, real corpus × empty query — both sides
    assert similarity.ann_topk_bruteforce(emb, one, k=3).count() == 0
    assert similarity.ann_topk_bruteforce(one, emb, k=3).count() == 0
    assert similarity.embedding_near_dup(emb, threshold=0.5).count() == 0
    assert (
        similarity.lsh_near_dup_candidates(
            emb, num_tables=2, planes_per_table=2, dim=8
        ).count()
        == 0
    )


def test_join_family_on_empty(frames, spark):
    pts, one_pt = frames["pts"], frames["one_pt"]
    rpts, empty_rpts = frames["rpts"], frames["empty_rpts"]
    dist = lambda l, r: F.abs(l["latitude"] - r["r_latitude"])  # noqa: E731
    assert joins.nearest_join(pts, rpts, dist, "id", tiebreak=["rid"]).count() == 0
    # empty RIGHT: no winner exists — empty result (never a crash)
    assert joins.nearest_join(one_pt, empty_rpts, dist, "id", tiebreak=["rid"]).count() == 0
    assert joins.nearest_join_gridded(
        pts, rpts, left_key="id", cell_deg=1.0, tiebreak=["rid"]
    ).count() == 0
    assert joins.nearest_join_gridded(
        one_pt, empty_rpts, left_key="id", cell_deg=1.0, tiebreak=["rid"]
    ).count() == 0
    # asof: empty right keeps every left row, NULL payload (left-outer)
    left = one_pt.select("id", F.current_timestamp().alias("ts"), F.lit(1).alias("k"))
    right = spark.createDataFrame([], "k long, rts timestamp, v string")
    out = joins.asof_join(left, right, key="k", left_ts="ts", right_ts="rts")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v is None
    assert joins.salted_join(
        pts, rpts.select(F.col("rid").alias("id"), "r_latitude"), "id"
    ).count() == 0
    assert joins.zip_join(pts, empty_rpts, ["id"], ["rid"]).count() == 0


def test_sampling_and_quantiles_on_empty(frames):
    docs, ev = frames["docs"], frames["ev"]
    assert sampling.hash_sample(docs, "doc_id", 0.5).count() == 0
    assert sampling.stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.5}).count() == 0
    assert sampling.pack_sequences(
        docs.withColumn("n_tokens", F.lit(1)), "doc_id", "n_tokens", 512
    ).count() == 0
    assert sampling.stratified_kfold(docs, "doc_id", "lang", 3).count() == 0
    assert sampling.train_test_split(docs, "doc_id").count() == 0
    # mixture_sample fail-fast on absent weighted sources is the designed
    # behavior (T = min(N_s/w_s) = 0 would silently keep nothing)
    with pytest.raises(ValueError, match="absent"):
        sampling.mixture_sample(docs, "doc_id", "source", {"s": 1.0})
    assert quantiles.exact_percentiles_scalable(ev, "event_type", "value", [0.5]).count() == 0
