"""BPE vocabulary training + application (textops/bpe.py) vs a
pure-Python reference implementation of the same algorithm."""

import pytest

from meresco_rdf_spark.textops.bpe import apply_bpe, train_bpe

SCHEMA = "doc_id long, text string"


def docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


# --- pure-Python reference (greedy left-to-right fold semantics) -----------

def _pysyms(word):
    cs = list(word)
    cs[-1] = cs[-1] + "</w>"
    return cs


def _pymerge(syms, left, right):
    out = []
    for t in syms:
        if out and out[-1] == left and t == right:
            out[-1] = left + right
        else:
            out.append(t)
    return out


def _pytrain(rows, n_merges, min_count=2):
    corpus = [_pysyms(w) for _, text in rows for w in text.lower().split()]
    merges = []
    for rank in range(n_merges):
        counts = {}
        for syms in corpus:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, l, r, n))
        corpus = [_pymerge(s, l, r) for s in corpus]
    return merges


def _pyapply(text, merges):
    out = []
    for w in text.lower().split():
        syms = _pysyms(w)
        for _, l, r, _n in merges:
            syms = _pymerge(syms, l, r)
        out.extend(syms)
    return out


ROWS = [
    (1, "low lower lowest low"),
    (2, "new newer newest new new"),
    (3, "low new lower newer"),
]


@pytest.mark.parametrize("k", [1, 5, 12])
def test_training_matches_reference(spark, k):
    assert train_bpe(docs(spark, ROWS), k) == _pytrain(ROWS, k)


def test_apply_matches_reference(spark):
    merges = train_bpe(docs(spark, ROWS), 8)
    got = {r.doc_id: list(r.bpe_tokens)
           for r in apply_bpe(docs(spark, ROWS), merges).collect()}
    assert got == {d: _pyapply(t, merges) for d, t in ROWS}


def test_merges_never_cross_words(spark):
    rows = [(1, "ab ab ab")]
    merges = train_bpe(docs(spark, rows), 3, min_count=2)
    # 'b</w> a' is never a pair: the end-of-word marker fences words
    assert all(not l.endswith("</w>") for _, l, _r, _n in merges)


def test_greedy_overlap_semantics(spark):
    # "aaaa" merging (a,a): greedy left-to-right folds [a,a,a,a</w>]
    # into [aa, a, a</w>] — the third 'a' cannot fuse into the already-
    # merged tail, and 'a</w>' is a distinct symbol
    rows = [(1, "aaaa aaaa")]
    merges = train_bpe(docs(spark, rows), 1, min_count=2)
    assert [(m[1], m[2]) for m in merges] == [("a", "a")]
    got = apply_bpe(docs(spark, rows), merges).collect()[0].bpe_tokens
    assert list(got) == ["aa", "a", "a</w>", "aa", "a", "a</w>"]
    assert _pyapply("aaaa aaaa", merges) == list(got)


def test_min_count_stops_training(spark):
    rows = [(1, "xy")]
    assert train_bpe(docs(spark, rows), 10, min_count=2) == []


def test_sample_training_applies_corpus_wide(spark):
    sample = docs(spark, ROWS[:1])
    merges = train_bpe(docs(spark, ROWS), 4, train_on=sample)
    assert merges == _pytrain(ROWS[:1], 4)
    out = apply_bpe(docs(spark, ROWS), merges)
    assert out.count() == 3


def test_bad_k_raises(spark):
    with pytest.raises(ValueError):
        train_bpe(docs(spark, ROWS), 0)
