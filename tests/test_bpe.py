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


# --- Arrow (mapInPandas) production-vocab apply path -----------------------

def test_arrow_apply_matches_fold_and_reference(spark):
    merges = train_bpe(docs(spark, ROWS), 8)
    fold = {r.doc_id: list(r.bpe_tokens)
            for r in apply_bpe(docs(spark, ROWS), merges,
                               strategy="fold").collect()}
    arrow = {r.doc_id: list(r.bpe_tokens)
             for r in apply_bpe(docs(spark, ROWS), merges,
                                strategy="arrow").collect()}
    assert arrow == fold == {d: _pyapply(t, merges) for d, t in ROWS}


def test_arrow_apply_greedy_overlap(spark):
    rows = [(1, "aaaa aaaa")]
    merges = train_bpe(docs(spark, rows), 1, min_count=2)
    got = apply_bpe(docs(spark, rows), merges,
                    strategy="arrow").collect()[0].bpe_tokens
    assert list(got) == ["aa", "a", "a</w>", "aa", "a", "a</w>"]


def test_arrow_apply_drops_empty_docs_like_fold(spark):
    rows = [(1, "low low"), (2, "   "), (3, None), (4, "")]
    merges = train_bpe(docs(spark, [(1, "low low")]), 2, min_count=2)
    for strategy in ("fold", "arrow"):
        got = apply_bpe(docs(spark, rows), merges,
                        strategy=strategy).collect()
        assert [r.doc_id for r in got] == [1], strategy


def test_auto_strategy_switches_on_merge_count(spark):
    from meresco_rdf_spark.textops.bpe import ARROW_MERGE_THRESHOLD
    few = [(i, "x", "y", 2) for i in range(2)]
    many = [(i, "x", "y", 2) for i in range(ARROW_MERGE_THRESHOLD + 1)]
    d = docs(spark, ROWS)
    plan_few = apply_bpe(d, few)._jdf.queryExecution().toString()
    plan_many = apply_bpe(d, many)._jdf.queryExecution().toString()
    assert "MapInPandas" not in plan_few
    assert "MapInPandas" in plan_many


def test_production_vocab_compiles_and_runs(spark):
    # 1,000 chained merges: the fold path's expression tree would blow
    # Catalyst analysis long before data size matters; the arrow path
    # must stay O(1) in plan depth and actually tokenize.  Merge list
    # built in trained form (each left is the product of the previous
    # merge), over a 1,001-char word of distinct non-ascii letters.
    chars = [chr(0x4E00 + i) for i in range(1001)]  # caseless, distinct
    word = "".join(chars)
    merges, acc = [], chars[0]
    for i in range(1, 1001):
        right = chars[i] + ("</w>" if i == 1000 else "")
        merges.append((i - 1, acc, right, 2))
        acc = acc + right
    d = docs(spark, [(1, word), (2, word + " " + word)])
    out = {r.doc_id: list(r.bpe_tokens)
           for r in apply_bpe(d, merges).collect()}
    assert out[1] == [word + "</w>"]
    assert out[2] == [word + "</w>", word + "</w>"]
    # guard: auto really chose the flat-plan path
    plan = apply_bpe(d, merges)._jdf.queryExecution().toString()
    assert "MapInPandas" in plan


def test_bad_strategy_raises(spark):
    with pytest.raises(ValueError, match="strategy"):
        apply_bpe(docs(spark, ROWS), [], strategy="nope")
