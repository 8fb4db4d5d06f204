"""Distributed BPE training: merge table exactly matches a pure-Python
reference (Sennrich learn_bpe with the same deterministic tie-break),
encoding replays training, and the vocabulary-sized work contract."""

import pytest
from pyspark.sql import functions as F

from honas_spark.operators.bpetrain import (
    EOW,
    bpe_encode_docs,
    bpe_encode_words,
    bpe_pair_counts,
    bpe_train,
    word_frequencies,
)


# ------------------------------------------------- local reference BPE


def _ref_merge_seq(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_learn(word_freqs, num_merges, min_count=2):
    vocab = [[list(w) + [EOW], f] for w, f in word_freqs.items()]
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for syms, f in vocab:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        vocab = [[_ref_merge_seq(s, left, right), f] for s, f in vocab]
    return merges, vocab


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest widest"),
    (3, "widest widest low newest"),
]


def _word_freqs(corpus):
    wf = {}
    for _, text in corpus:
        for w in text.split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_pair_counts_match_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in bpe_pair_counts(df, "text").collect()
    }
    want = {}
    for w, f in _word_freqs(CORPUS).items():
        syms = list(w) + [EOW]
        for a, b in zip(syms, syms[1:]):
            want[(a, b)] = want.get((a, b), 0) + f
    assert got == want


@pytest.mark.parametrize("num_merges,min_count", [(10, 2), (50, 1)])
def test_train_matches_reference(spark, num_merges, min_count):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = [
        (
            r["rank"], r["left_sym"], r["right_sym"], r["merged"],
            r["pair_count"],
        )
        for r in bpe_train(
            df, "text", num_merges, min_count=min_count
        ).orderBy("rank").collect()
    ]
    want, _ = _ref_learn(_word_freqs(CORPUS), num_merges, min_count)
    assert got == want


def test_train_early_stop_on_min_count(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe_train(df, "text", 500, min_count=2)
    n = merges.count()
    assert 0 < n < 500  # stopped when every pair count fell below 2


def test_encode_words_replays_training(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe_train(df, "text", 8)
    vocab = word_frequencies(df, "text")
    got = {
        r["word"]: list(r["pieces"])
        for r in bpe_encode_words(vocab, merges).collect()
    }
    ref_merges, ref_vocab = _ref_learn(_word_freqs(CORPUS), 8)
    want = {"".join(s).replace(EOW, ""): s for s, _ in ref_vocab}
    assert got == want


def test_encode_docs_orders_pieces_by_token_position(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe_train(df, "text", 8)
    out = {
        r["doc_id"]: (list(r["pieces"]), r["n_pieces"])
        for r in bpe_encode_docs(df, "doc_id", "text", merges).collect()
    }
    vocab = word_frequencies(df, "text")
    word_pieces = {
        r["word"]: list(r["pieces"])
        for r in bpe_encode_words(vocab, merges).collect()
    }
    for doc_id, text in CORPUS:
        want = [p for w in text.split() for p in word_pieces[w]]
        assert out[doc_id][0] == want
        assert out[doc_id][1] == len(want)


def test_train_validation(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bpe_train(df, "text", 0)
    with pytest.raises(ValueError):
        bpe_train(df, "text", 5, min_count=0)


def test_train_resume_reproduces_full_run(spark):
    """Resumability: train(10) == train(5) -> resume(+5), row for row
    — the determinism that makes a persisted merge table a checkpoint."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    full = [
        tuple(r)
        for r in bpe_train(df, "text", 10).orderBy("rank").collect()
    ]
    first5 = bpe_train(df, "text", 5)
    resumed = [
        tuple(r)
        for r in bpe_train(
            df, "text", 10, init_merges=first5
        ).orderBy("rank").collect()
    ]
    assert resumed == full
    with pytest.raises(ValueError):  # gap in ranks
        bad = first5.filter("rank <> 2")
        bpe_train(df, "text", 10, init_merges=bad)
    with pytest.raises(ValueError):  # more prior merges than requested
        bpe_train(df, "text", 3, init_merges=first5)
