"""Corpus-trained BPE tokenizer (pipeline/bpe.py)."""

import random

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.bpe import (
    _encode_piece,
    bpe_encode,
    bpe_token_count,
    piece_counts,
    train_bpe,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _word_corpus(spark, word_counts):
    """One single-word document per occurrence (no spaces → pieces are
    the bare words, which keeps hand-computation tractable)."""
    rows, i = [], 0
    for w, n in word_counts:
        for _ in range(n):
            rows.append((i, w))
            i += 1
    return _docs(spark, rows)


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_piece_counts_and_cut(spark):
    df = _docs(spark, [(1, "ab ab cd"), (2, "ab x1"), (3, None), (None, "ab")])
    got = {r["piece"]: r["cnt"] for r in
           piece_counts(df, "doc_id", "text").collect()}
    # GPT-2-style pattern: pieces after the first carry their leading space
    assert got == {"ab": 2, " ab": 1, " cd": 1, " x": 1, "1": 1}
    top = piece_counts(df, "doc_id", "text", max_pieces=2).collect()
    # cnt desc, then piece asc: "ab"(2), then " ab"(1) before " cd"/" x"/"1"
    assert [(r["piece"], r["cnt"]) for r in top] == [("ab", 2), (" ab", 1)]
    assert piece_counts(df, "doc_id", "text", min_count=2).count() == 1


def test_train_bpe_hand_computed_sennrich(spark):
    """The classic Sennrich corpus (low x5, lower x2, newest x6,
    widest x3), merges derived by hand with the documented tiebreak
    (count desc, then lexicographically smaller (left, right))."""
    df = _word_corpus(spark, SENNRICH)
    merges = train_bpe(df, "doc_id", "text", num_merges=10)
    got = [(r["rank"], r["left"], r["right"])
           for r in merges.orderBy("rank").collect()]
    assert got == [
        (0, "e", "s"),    # e,s = 9 ties s,t = 9 → ('e','s') < ('s','t')
        (1, "es", "t"),   # 9
        (2, "l", "o"),    # 7 ties o,w → ('l','o') wins
        (3, "lo", "w"),   # 7
        (4, "e", "w"),    # 6-way tie: ('e','w') < ('n','e') < ('w','est')
        (5, "ew", "est"), # ('ew','est') < ('n','ew')
        (6, "n", "ewest"),
        (7, "d", "est"),  # 3-way tie: ('d','est') < ('i','d') < ('w','i')
        (8, "i", "dest"),
        (9, "w", "idest"),
    ]


def test_train_partitioning_invariance(spark):
    df = _word_corpus(spark, SENNRICH)
    a = train_bpe(df.repartition(7), "doc_id", "text", num_merges=10)
    b = train_bpe(df.coalesce(1), "doc_id", "text", num_merges=10)
    assert ([tuple(r) for r in a.orderBy("rank").collect()]
            == [tuple(r) for r in b.orderBy("rank").collect()])


def test_train_early_stop_and_num_merges_bound(spark):
    df = _word_corpus(spark, SENNRICH)
    assert train_bpe(df, "doc_id", "text", num_merges=3).count() == 3
    # every pair unique → best count 1 < min_pair_count → zero merges
    one = _docs(spark, [(1, "abcd")])
    assert train_bpe(one, "doc_id", "text", num_merges=10).count() == 0
    assert train_bpe(one, "doc_id", "text", num_merges=10,
                     min_pair_count=1).count() > 0
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(df, "doc_id", "text", num_merges=-1)
    with pytest.raises(ValueError, match="min_pair_count"):
        train_bpe(df, "doc_id", "text", min_pair_count=0)


def test_encode_hand_computed(spark):
    df = _word_corpus(spark, SENNRICH)
    merges = train_bpe(df, "doc_id", "text", num_merges=10)
    probe = _docs(spark, [
        (1, "low"), (2, "lower"), (3, "newest"), (4, "widest"),
        (5, "lowest"),   # unseen word: low + est from learned merges
        (6, "xyz"),      # fully OOV chars stay single-char tokens
        (7, "low low"),  # second piece carries its space: no trained merge
    ])
    got = {r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe"])
           for r in bpe_encode(probe, merges, "doc_id", "text").collect()}
    assert got[1] == (["low"], 1)
    assert got[2] == (["low", "e", "r"], 3)
    assert got[3] == (["newest"], 1)
    assert got[4] == (["widest"], 1)
    assert got[5] == (["low", "est"], 2)
    assert got[6] == (["x", "y", "z"], 3)
    assert got[7] == (["low", " ", "low"], 3)


def test_encode_lossless_roundtrip_and_null_passthrough(spark):
    df = _docs(spark, [
        (1, "the quick brown fox -- it's 42!"),
        (2, "aaaa...   bbbb"),
        (3, ""),
        (4, None),
        (None, "dropped id"),
    ])
    merges = train_bpe(df, "doc_id", "text", num_merges=20, min_pair_count=1)
    out = bpe_encode(df, merges, "doc_id", "text")
    joined = out.join(df, "doc_id").select(
        "doc_id", "text", "n_bpe",
        F.concat_ws("", F.col("bpe_tokens")).alias("rebuilt"))
    for r in joined.collect():
        if r["text"] is None:
            assert r["n_bpe"] is None
        else:
            assert r["rebuilt"] == r["text"]
    null_id = [r for r in out.collect() if r["doc_id"] is None]
    assert null_id and null_id[0]["bpe_tokens"] is None
    empty = {r["doc_id"]: r for r in out.collect()}[3]
    assert empty["bpe_tokens"] == [] and empty["n_bpe"] == 0


def test_zero_merges_encodes_chars(spark):
    df = _docs(spark, [(1, "abc ab")])
    empty = train_bpe(df, "doc_id", "text", num_merges=0)
    got = bpe_encode(df, empty, "doc_id", "text").collect()[0]
    assert list(got["bpe_tokens"]) == ["a", "b", "c", " ", "a", "b"]


def test_token_count_bounds(spark):
    """pieces <= bpe tokens <= chars for every document (merges never
    cross piece boundaries, each merge strictly shrinks a piece)."""
    df = _docs(spark, [(i, t) for i, t in enumerate(
        ["the cat sat on the mat", "it's a test, isn't it?", "12 34 xy!"])])
    merges = train_bpe(df, "doc_id", "text", num_merges=30, min_pair_count=1)
    counts = bpe_token_count(df, merges, "doc_id", "text")
    from great_expectations_spark.pipeline.textstats import token_count_bpe
    chk = df.join(counts, "doc_id").select(
        "doc_id", "n_bpe",
        token_count_bpe(F.col("text")).alias("n_pieces"),
        F.length("text").alias("n_chars")).collect()
    assert len(chk) == 3
    for r in chk:
        assert r["n_pieces"] <= r["n_bpe"] <= r["n_chars"]


def _encode_merge_all(piece, ranks):
    """Reference GPT-2 encode loop: merge ALL occurrences (greedy LTR)
    of the lowest-rank present pair, then re-select."""
    sym = list(piece)
    while len(sym) > 1:
        pairs = {(sym[i], sym[i + 1]) for i in range(len(sym) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (l, r) = min(ranked)
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_rank_order_rule_agrees_with_gpt2_variant(spark):
    """The engine's rank-order (Sennrich apply_bpe) loop agrees with
    the re-selecting merge-all GPT-2 loop on randomized corpora (they
    can only diverge in the multi-split pathological case documented in
    the module docstring)."""
    rng = random.Random(7)
    alphabet = "abcd"
    words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
             for _ in range(60)]
    df = _docs(spark, [(i, w) for i, w in enumerate(words)])
    merges = train_bpe(df, "doc_id", "text", num_merges=40, min_pair_count=1)
    ranks = {(r["left"], r["right"]): r["rank"] for r in merges.collect()}
    probes = words + ["aaaaaa", "abababab", "ddddcccc", "dcba" * 5]
    for w in probes:
        assert _encode_piece(w, ranks) == _encode_merge_all(w, ranks), w


def _learn_merges_bruteforce(words, num_merges, min_pair_count):
    """Reference trainer: full pair recount + full scan per merge (the
    obviously-correct O(dict x merges) loop the incremental/heap
    implementation must replicate exactly)."""
    from collections import Counter

    from great_expectations_spark.pipeline.bpe import _merge_all

    words = [(list(sym), cnt) for sym, cnt in words]
    merges = []
    for rank in range(num_merges):
        counts = Counter()
        for sym, cnt in words:
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += cnt
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < min_pair_count:
            break
        merges.append((rank, best[0], best[1]))
        words = [(_merge_all(sym, best[0], best[1]), cnt)
                 for sym, cnt in words]
    return merges


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(
        word_counts=st.lists(
            st.tuples(st.text(alphabet="abcd", min_size=1, max_size=10),
                      st.integers(1, 9)),
            min_size=1, max_size=25, unique_by=lambda wc: wc[0]),
        num_merges=st.integers(0, 30),
        min_pair_count=st.integers(1, 3),
    )
    def test_incremental_trainer_matches_bruteforce(
            word_counts, num_merges, min_pair_count):
        """The heap + incremental-pair-stats trainer produces the exact
        merge sequence of the brute-force recount-everything reference,
        including overlap-heavy words (aaaa), tiebreaks, and early
        stop."""
        from great_expectations_spark.pipeline.bpe import _learn_merges

        words = [(list(w), c) for w, c in word_counts]
        got = _learn_merges([(list(s), c) for s, c in words],
                            num_merges, min_pair_count)
        want = _learn_merges_bruteforce(words, num_merges, min_pair_count)
        assert got == want
except ImportError:  # pragma: no cover - hypothesis is in the image
    pass


def test_merges_table_persist_roundtrip(spark, tmp_path):
    df = _word_corpus(spark, SENNRICH)
    merges = train_bpe(df, "doc_id", "text", num_merges=10)
    path = str(tmp_path / "merges.parquet")
    merges.write.parquet(path)
    reloaded = spark.read.parquet(path)
    probe = _docs(spark, [(1, "lowest newest")])
    a = bpe_encode(probe, merges, "doc_id", "text").collect()[0]
    b = bpe_encode(probe, reloaded, "doc_id", "text").collect()[0]
    assert list(a["bpe_tokens"]) == list(b["bpe_tokens"])
