"""BPE trainer/encoder (operators/bpe.py): hand-checked merge learning,
batched-vs-sequential equivalence, disjoint-admission rule, encoder
consistency."""

import pytest

from geoparquet_io_spark.operators.bpe import (
    _select_disjoint,
    encode_bpe,
    train_bpe,
)


def _corpus(spark):
    # engineered so the top pairs are symbol-disjoint: "aa" dominates,
    # then "bc", then "dd" — no shared symbols between them
    rows = [("aabc ddaa bcdd aabc",), ("ddaa aabc bcdd",), ("aa bc dd",)]
    return spark.createDataFrame(rows, "text string")


def test_train_bpe_sequential_hand_checked(spark):
    m = train_bpe(_corpus(spark), num_merges=3).collect()
    got = [(r.rank, r.pair, r.merged) for r in m]
    assert got[0][1:] == ("a a", "aa")
    assert {g[1] for g in got} == {"a a", "b c", "d d"}
    assert [g[0] for g in got] == [1, 2, 3]


def test_train_bpe_batched_equals_sequential_on_disjoint_corpus(spark):
    seq = [(r.rank, r.pair, r.merged, r.pair_count)
           for r in train_bpe(_corpus(spark), num_merges=3,
                              batch_size=1).collect()]
    bat = [(r.rank, r.pair, r.merged, r.pair_count)
           for r in train_bpe(_corpus(spark), num_merges=3,
                              batch_size=3).collect()]
    assert seq == bat


def test_select_disjoint_skips_shared_symbols():
    # no chaining between c/d/f/g/a/b beyond the listed pairs, and
    # counts strictly above the pool minimum: a b chains onto a a
    # (a == P.b) and cd e collides with a merged symbol; f g passes
    # the outranking guard (no pool pair chains into c d or f g)
    ranked = [("c d", 100), ("a b", 90), ("cd e", 70), ("f g", 60),
              ("z z", 10)]
    chosen = _select_disjoint(ranked, 4)
    assert [c[0] for c in chosen] == ["c d", "a b", "f g"]


def test_select_disjoint_outranking_guard_refuses_chained_creation():
    # merging "a b" can create pairs bounded by count("x a") = 95;
    # admitting "c d" (80 <= 95) could deviate from sequential order,
    # so it must be refused in this batch
    ranked = [("a b", 100), ("x a", 95), ("c d", 80)]
    chosen = _select_disjoint(ranked, 3)
    assert [c[0] for c in chosen] == ["a b"]


def test_select_disjoint_self_chaining_pair_batches_alone():
    # "a a" chains into itself (merging it creates (aa, a)-style pairs
    # bounded by its own count), so nothing may join its batch
    ranked = [("a a", 100), ("c d", 80), ("f g", 60)]
    chosen = _select_disjoint(ranked, 3)
    assert [c[0] for c in chosen] == ["a a"]


def test_local_route_equals_distributed_route(spark):
    """The r8 driver-local merge loop (vocab fits LOCAL_VOCAB_ROWS) must
    be row-identical to the distributed loop on a corpus exercising
    ties, repeated-symbol runs (the documented replace deviation),
    batching, and the min-count filter interacting with the pool
    LIMIT — byte-parity across routes is the whole contract."""
    rows = [("a a a a aaab",), ("the the the cat cat",),
            ("xy xy yz yz zz",), ("solo",), ("",)]
    df = spark.createDataFrame(rows, "text string")
    for bs in (1, 3):
        local = [tuple(r) for r in train_bpe(
            df, num_merges=6, batch_size=bs).collect()]
        dist = [tuple(r) for r in train_bpe(
            df, num_merges=6, batch_size=bs,
            local_vocab_rows=None).collect()]
        assert local == dist, bs
    # min_pair_count filter applies AFTER the pool limit on both routes
    lo = [tuple(r) for r in train_bpe(df, num_merges=4,
                                      min_pair_count=3).collect()]
    di = [tuple(r) for r in train_bpe(df, num_merges=4, min_pair_count=3,
                                      local_vocab_rows=None).collect()]
    assert lo == di


def test_batched_respects_num_merges_budget(spark):
    m = train_bpe(_corpus(spark), num_merges=2, batch_size=8).collect()
    assert len(m) == 2
    assert [r.rank for r in m] == [1, 2]


def test_encode_bpe_applies_merges_in_order(spark):
    df = spark.createDataFrame([("aabc xyz",)], "text string")
    merges = [("a a", "aa"), ("b c", "bc"), ("aa bc", "aabc")]
    out = encode_bpe(df, merges).collect()[0]["bpe_tokens"]
    assert out == ["aabc", "x", "y", "z"]


def test_train_bpe_batch_size_validation(spark):
    with pytest.raises(ValueError, match="batch_size"):
        train_bpe(_corpus(spark), batch_size=0)
