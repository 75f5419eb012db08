"""Distributed BPE training gated against a pure-Python reference
implementation (Sennrich et al. 2016 learn_bpe semantics)."""

import re
from collections import Counter

from pyspark.sql import functions as F

from auto_vectordb_spark.operators import tokenizer as TK


def _python_bpe(word_counts: dict[str, int], num_merges: int, min_freq: int = 2):
    """Reference BPE: literal transcription of the textbook algorithm."""
    vocab = {" ".join(list(w) + [TK.END_OF_WORD]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            s = sym.split(" ")
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        # same tie-break as the Spark argmax: freq desc, then pair asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_freq:
            break
        merges.append((rank, best[0], best[1], pairs[best]))
        pat = re.compile(
            r"(?<!\S)" + re.escape(best[0]) + " " + re.escape(best[1]) + r"(?!\S)"
        )
        vocab = {pat.sub(best[0] + best[1], sym): c for sym, c in vocab.items()}
    return merges, vocab


def _corpus(spark):
    rows = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new wider wide"),
        (2, "low new wide wider lowest"),
        (3, "the lower the wider the newer"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bpe_train_matches_python_reference(spark):
    docs = _corpus(spark)
    merges_df, vocab_df = TK.bpe_train(docs, num_merges=12, min_freq=2)

    wc = {
        r["word"]: r["count"] for r in TK.word_counts(docs).collect()
    }
    want_merges, want_vocab = _python_bpe(wc, num_merges=12, min_freq=2)

    got_merges = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got_merges == want_merges and len(got_merges) > 3

    got_vocab = {r["sym"]: r["count"] for r in vocab_df.collect()}
    assert got_vocab == want_vocab
    # merges actually compress: some multi-char subword exists
    assert any(len(s) > 1 and s != TK.END_OF_WORD for sym in got_vocab for s in sym.split(" "))


def test_bpe_encode_matches_training_segmentation(spark):
    """Encoding the training words with the learned merges must reproduce
    the exact segmentation training ended with (the classic BPE replay
    equivalence), including for an UNSEEN word built from seen characters."""
    docs = _corpus(spark)
    merges_df, vocab_df = TK.bpe_train(docs, num_merges=12, min_freq=2)

    words = vocab_df.select("word")
    enc = {r["word"]: r["sym"] for r in TK.bpe_encode_words(words, merges_df).collect()}
    train_sym = {r["word"]: r["sym"] for r in vocab_df.collect()}
    assert enc == train_sym

    unseen = spark.createDataFrame([("lowwide",), ("zzz",)], ["word"])
    out = {r["word"]: r for r in TK.bpe_encode_words(unseen, merges_df).collect()}
    # unseen words segment deterministically; unknown chars stay singletons
    assert out["lowwide"]["n_subwords"] >= 2
    assert out["zzz"]["sym"].split(" ")[-1] == TK.END_OF_WORD


def test_bpe_min_freq_stops_early(spark):
    docs = spark.createDataFrame([(0, "aa bb aa")], ["doc_id", "text"])
    merges_df, _ = TK.bpe_train(docs, num_merges=50, min_freq=2)
    # only pairs with corpus frequency >= 2 may merge: 'a a' (freq 2,
    # from 2×'aa') and the resulting 'aa </w>' (freq 2); 'b b' has freq 1
    ranks = merges_df.collect()
    assert 0 < len(ranks) < 50
    assert all(r["freq"] >= 2 for r in ranks)


def test_bpe_batched_matches_sequential(spark):
    """merge_batch is a scheduling optimization, not an approximation: the
    merge table and final vocab must be IDENTICAL to single-merge training
    (the _select_merge_batch safety rule guarantees it)."""
    docs = _corpus(spark)
    seq_merges, seq_vocab = TK.bpe_train(docs, num_merges=12, min_freq=2)
    want = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in seq_merges.orderBy("rank").collect()
    ]
    want_vocab = {r["sym"]: r["count"] for r in seq_vocab.collect()}
    for batch in (2, 4, 8):
        merges_df, vocab_df = TK.bpe_train(
            docs, num_merges=12, min_freq=2, merge_batch=batch
        )
        got = [
            (r["rank"], r["left"], r["right"], r["freq"])
            for r in merges_df.orderBy("rank").collect()
        ]
        assert got == want, (batch, got, want)
        assert {r["sym"]: r["count"] for r in vocab_df.collect()} == want_vocab


def test_bpe_batched_matches_python_reference_wikitextish(spark):
    """Batched training on a larger, messier corpus (repeated natural-ish
    sentences with skewed word frequencies) still reproduces the textbook
    sequential reference exactly."""
    base = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "a journey of a thousand miles begins with a single step",
        "to be or not to be that is the question",
        "all that glitters is not gold but gold glitters",
    ]
    rows = [(i, base[i % len(base)]) for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges_df, _ = TK.bpe_train(docs, num_merges=40, min_freq=2, merge_batch=8)
    wc = {r["word"]: r["count"] for r in TK.word_counts(docs).collect()}
    want_merges, _ = _python_bpe(wc, num_merges=40, min_freq=2)
    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got == want_merges
    assert len(got) > 20


def test_select_merge_batch_fuzz_pure_python():
    """600-corpus pure-python fuzz of the batched-merge safety rule against
    textbook sequential BPE — calls the REAL _select_merge_batch on head
    rows and replays its picks, so any weakening of the rule (dominance
    cut, interaction stop, collision truncation) fails here in seconds,
    without Spark."""
    import random

    def pair_counts(vocab):
        c = Counter()
        for sym, n in vocab.items():
            s = sym.split(" ")
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += n
        return c

    def apply(vocab, left, right):
        pat = re.compile(
            r"(?<!\S)" + re.escape(left) + " " + re.escape(right) + r"(?!\S)"
        )
        return {pat.sub(left + right, sym): n for sym, n in vocab.items()}

    def seq(wc, num_merges, min_freq=2):
        vocab = {" ".join(list(w) + [TK.END_OF_WORD]): n for w, n in wc.items()}
        merges = []
        for _ in range(num_merges):
            pc = pair_counts(vocab)
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if pc[best] < min_freq:
                break
            merges.append((best[0], best[1], pc[best]))
            vocab = apply(vocab, *best)
        return merges

    def batched(wc, num_merges, batch, min_freq=2):
        vocab = {" ".join(list(w) + [TK.END_OF_WORD]): n for w, n in wc.items()}
        merges = []
        while len(merges) < num_merges:
            b = min(batch, num_merges - len(merges))
            head_n = max(64, 4 * b) if b > 1 else 1
            pc = pair_counts(vocab)
            head = [
                {"left": p[0], "right": p[1], "freq": f}
                for p, f in sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:head_n]
            ]
            if not head or head[0]["freq"] < min_freq:
                break
            picks = TK._select_merge_batch(
                head, b, min_freq, exhaustive=len(head) < head_n
            )
            if len(picks) > 1:
                live = {s for sym in vocab for s in sym.split(" ")}
                for i, (left, right, _) in enumerate(picks):
                    if left + right in live:
                        picks = picks[:i] if i >= 1 else picks[:1]
                        break
            for left, right, freq in picks:
                merges.append((left, right, freq))
                vocab = apply(vocab, left, right)
        return merges

    rng = random.Random(7)
    for _ in range(600):
        wc: dict[str, int] = {}
        for _w in range(rng.randint(1, 25)):
            w = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
            wc[w] = wc.get(w, 0) + rng.randint(1, 9)
        nm, batch = rng.randint(1, 15), rng.choice([2, 3, 5, 8])
        assert batched(wc, nm, batch) == seq(wc, nm), (wc, nm, batch)
