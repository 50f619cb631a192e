"""Text-analysis function semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.functions import text as T


def one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col(F.col("text")).alias("v"))
        .head()
        .v
    )


def test_token_counts(spark):
    assert one(spark, "  The quick  brown fox ", T.token_count_ws) == 4
    # BPE-ish: words + punctuation symbols count separately
    assert one(spark, "don't stop, now!", T.token_count_bpe) == 7


def test_stopword_and_punct_ratio(spark):
    assert one(spark, "the cat and the dog", T.stopword_ratio) == 0.6
    assert one(spark, "ab..", T.punct_ratio) == 0.5
    assert one(spark, "clean text", T.punct_ratio) == 0.0


def test_lang_id(spark):
    assert one(spark, "the cat sat on a mat", T.lang_id) == "en"
    assert one(spark, "der hund und die katze ist", T.lang_id) == "de"
    assert one(spark, "xyzzy plugh", T.lang_id) == "und"
    # tie between en and de marker hits → earliest language in fold order
    assert one(spark, "the der", T.lang_id) == "en"


def test_fingerprint_order_insensitive(spark):
    a = one(spark, "alpha beta gamma", T.fingerprint_sorted_tokens)
    b = one(spark, "gamma alpha beta", T.fingerprint_sorted_tokens)
    assert a == b
    ra = one(spark, "alpha beta gamma", T.fingerprint_rolling)
    rb = one(spark, "gamma alpha beta", T.fingerprint_rolling)
    assert ra != rb  # rolling hash is order-sensitive
    assert 0 <= ra < 1_000_000_007


def test_quality_score_bounds(spark):
    for text in ("", "x", "the " * 200, "!!!! ???? ....", "a decent sentence"):
        v = one(spark, text, T.quality_score)
        assert 0.0 <= v <= 1.0


def test_dup_token_and_bigram_edges(spark):
    from cdc_practice_spark.functions import text as T
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "solo"), (4, "x y x y x")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            T.dup_token_fraction(F.col("text")).alias("dup"),
            T.bigram_array(F.col("text")).alias("bgs"),
        ).collect()
    }
    assert out[1].dup == 0.75          # 4 tokens, 1 distinct
    assert out[2].dup == 0.0
    assert out[3].bgs == []            # <2 tokens → no bigrams
    assert out[4].bgs == ["x y", "y x", "x y", "y x"]


def test_pii_redaction_semantics(spark):
    from cdc_practice_spark.functions import text as T
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "emergency 010-1234-5678 line"),
            (3, "server 10.0.255.3 down"),
            (4, "clean text only"),
        ],
        "doc_id long, text string",
    )
    e, p, i = T.pii_counts(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            T.redact_pii(F.col("text")).alias("red"),
            e.alias("ne"), p.alias("np"), i.alias("ni"),
        ).collect()
    }
    assert out[1].red == "mail me at <EMAIL> today" and out[1].ne == 1
    assert out[2].red == "emergency <PHONE> line" and out[2].np == 1
    assert out[3].red == "server <IP> down" and out[3].ni == 1
    assert out[4].red == "clean text only"
    assert (out[4].ne, out[4].np, out[4].ni) == (0, 0, 0)


def test_bpe_merges_match_pure_python_reference(spark, tmp_path):
    """bpe_train_merges (queries/text_queries.py) vs a from-scratch
    Sennrich-style BPE trainer on a tiny handcrafted corpus — greedy
    left-to-right merging, frequency-weighted pair counts, lexicographic
    tiebreak.  Validates the double-space literal-replace trick against
    an implementation that shares none of its machinery."""
    import collections

    from cdc_practice_spark.queries.text_queries import _BPE_STEPS, bpe_train_merges

    texts = [
        "the cat sat on the mat",
        "the rat saw the cat",
        "aaa aa aaa the",  # adjacency overlap: greedy must merge [aa][a]
    ]
    # pure-Python reference
    words = collections.Counter(
        w for t in texts for w in t.lower().split() if w.isalpha()
    )
    vocab = {w: list(w) for w in words}
    expect = []
    for step in range(_BPE_STEPS):
        pairs: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((step + 1, a, b, a + b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    # engine, over the same corpus staged as a documents table
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(path)
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_train_merges(spark, str(tmp_path)).orderBy("step").collect()
    ]
    assert got == expect


def _stage_documents(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source) → documents.parquet in tmp_path."""
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(path)
    return str(tmp_path)


def test_bpe_encode_matches_pure_python(spark, tmp_path):
    """bpe_encode_corpus vs a from-scratch encoder: train merges with the
    pure-Python reference (shared with the trainer test), apply them
    greedily to every word occurrence, compare per-source totals."""
    import collections

    from cdc_practice_spark.queries.text_queries import (
        _BPE_STEPS,
        bpe_encode_corpus,
    )

    texts = [
        ("the cat sat on the mat", "a"),
        ("the rat saw the cat", "a"),
        ("aaa aa aaa the mat", "b"),
    ]
    words = collections.Counter(
        w for t, _ in texts for w in t.lower().split() if w.isalpha()
    )
    vocab = {w: list(w) for w in words}
    for _ in range(_BPE_STEPS):
        pairs: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        (a, b), _c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    expect = {}
    for t, src in texts:
        ws = [w for w in t.lower().split() if w.isalpha()]
        e = expect.setdefault(src, [0, 0, 0])
        e[0] += len(ws)
        e[1] += sum(len(w) for w in ws)
        e[2] += sum(len(vocab[w]) for w in ws)

    sf_dir = _stage_documents(
        spark, tmp_path, [(i, t, "en", s) for i, (t, s) in enumerate(texts)]
    )
    got = {
        r.source: [r.n_words, r.n_chars, r.n_tokens_bpe]
        for r in bpe_encode_corpus(spark, sf_dir).collect()
    }
    assert got == expect


def test_quality_classifier_margin_pure_python(spark, tmp_path):
    """Hashed-bigram linear classifier vs a hashlib recompute — same md5
    bucket/weight derivation, integer margins."""
    import hashlib

    from cdc_practice_spark.queries.text_queries import quality_classifier_margin

    def weight(bigram: str) -> int:
        b = int(hashlib.md5(f"f:{bigram}".encode()).hexdigest()[:15], 16) % 4096
        return int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:15], 16) % 2001 - 1000

    texts = [
        ("the cat sat on the mat", "a"),
        ("one", "a"),  # no bigram → margin 0
        ("alpha beta gamma delta", "b"),
    ]
    expect = {}
    for t, src in texts:
        ts = [x for x in t.lower().split() if x != ""]
        m = sum(weight(f"{x} {y}") for x, y in zip(ts, ts[1:]))
        e = expect.setdefault(src, [0, 0, 0])
        e[0] += 1
        e[1] += 1 if m > 0 else 0
        e[2] += m
    sf_dir = _stage_documents(
        spark, tmp_path, [(i, t, "en", s) for i, (t, s) in enumerate(texts)]
    )
    got = {
        r.source: [r.n_docs, r.n_keep, r.margin_sum]
        for r in quality_classifier_margin(spark, sf_dir).collect()
    }
    assert got == expect


def test_dsir_importance_ranks_target_like_docs(spark, tmp_path):
    """DSIR weights vs a hashlib/math recompute on a tiny bilingual
    corpus; the en-looking doc must outrank the de-looking one."""
    import hashlib
    import math

    from cdc_practice_spark.queries.text_queries import dsir_importance_select

    texts = [
        (0, "the cat and the dog", "en", "s"),
        (1, "der hund und die katze", "de", "s"),
        (2, "the dog and the cat", "und", "s"),  # en-like words, unknown lang
        (3, "die katze und der hund", "und", "s"),  # de-like words
    ]

    def bucket(t: str) -> int:
        return int(hashlib.md5(f"d:{t}".encode()).hexdigest()[:15], 16) % 1024

    cnt_s: dict[int, int] = {}
    cnt_t: dict[int, int] = {}
    toks_of = {}
    for i, t, lang, _ in texts:
        ts = [x for x in t.lower().split() if x != ""]
        toks_of[i] = ts
        for x in ts:
            b = bucket(x)
            cnt_s[b] = cnt_s.get(b, 0) + 1
            if lang == "en":
                cnt_t[b] = cnt_t.get(b, 0) + 1
    s_tot = sum(cnt_s.values())
    t_tot = sum(cnt_t.values())
    w = {
        b: round(
            math.log(
                (cnt_t.get(b, 0) + 1) * (s_tot + 1024)
                / ((cnt_s[b] + 1) * (t_tot + 1024))
            )
            * 1000000
        )
        for b in cnt_s
    }
    expect = {i: sum(w[bucket(x)] for x in toks_of[i]) for i, *_ in texts}

    sf_dir = _stage_documents(spark, tmp_path, texts)
    rows = dsir_importance_select(spark, sf_dir).collect()
    got = {r.doc_id: r.weight_micro for r in rows}
    assert got == expect
    # the en-vocabulary doc outranks the de-vocabulary doc
    assert got[2] > got[3]


def test_unigram_lm_matches_pure_python_reference(spark, tmp_path):
    """unigram_lm_train (queries/text_queries.py) vs a from-scratch
    hard-EM unigram-LM trainer on a handcrafted corpus — substring
    seeding, fixed-point NLL costs, packed-int64 Viterbi with the
    (lower cost, shorter last piece) tiebreak, and per-iteration
    re-costing.  Validates the two engine folds against an
    implementation that shares none of their machinery."""
    import collections
    import math

    from cdc_practice_spark.queries.text_queries import (
        _ULM_ITERS,
        _ULM_K,
        _ULM_SEED_MULTI,
        unigram_lm_train,
    )

    texts = [
        "the cats sat on the mats",
        "the rats saw the cats",
        "inter intern internal international nation",
        "nation national nations the inter",
    ]
    words = collections.Counter(
        w for t in texts for w in t.lower().split() if w.isalpha()
    )

    def halfup(x):  # engine ROUND: half away from zero (costs are >= 0)
        return int(math.floor(x + 0.5))

    subcnt: collections.Counter = collections.Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for k in range(1, min(_ULM_K, len(w) - i) + 1):
                subcnt[w[i : i + k]] += f
    seed = {p: c for p, c in subcnt.items() if len(p) == 1}
    seed.update(
        dict(
            sorted(
                ((p, c) for p, c in subcnt.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[:_ULM_SEED_MULTI]
        )
    )
    total = sum(seed.values())
    costs = {p: halfup(-math.log(c / total) * 1e6) for p, c in seed.items()}
    INF = 1 << 40

    def viterbi(w):
        dp = [0]
        for i in range(1, len(w) + 1):
            dp.append(
                min(
                    ((dp[i - k] >> 3) + costs.get(w[i - k : i], INF)) * 8 + k
                    for k in range(1, min(_ULM_K, i) + 1)
                )
            )
        pieces, pos = [], len(w)
        while pos > 0:
            k = dp[pos] % 8
            pieces.append(w[pos - k : pos])
            pos -= k
        return pieces

    cnt: collections.Counter = collections.Counter()
    for _ in range(_ULM_ITERS):
        cnt = collections.Counter()
        for w, f in words.items():
            for p in viterbi(w):
                cnt[p] += f
        total = sum(cnt.values())
        costs = {p: halfup(-math.log(c / total) * 1e6) for p, c in cnt.items()}
    expect = sorted((p, c, costs[p]) for p, c in cnt.items())

    sf_dir = _stage_documents(
        spark, tmp_path, [(i, t, "en", "unit") for i, t in enumerate(texts)]
    )
    got = [
        (r["piece"], r["count"], r["cost"])
        for r in unigram_lm_train(spark, sf_dir).orderBy("piece").collect()
    ]
    assert got == expect
    # the trained vocab must actually use multi-char pieces (EM is
    # load-bearing, not a char fallback)
    assert any(len(p) > 1 for p, _, _ in got)


def test_unigram_lm_encode_matches_pure_python(spark, tmp_path):
    """unigram_lm_encode vs a from-scratch encoder: train with the
    pure-Python reference (shared with the trainer test), Viterbi-encode
    every occurrence under the frozen costs, aggregate per source."""
    import collections
    import math

    from cdc_practice_spark.queries.text_queries import (
        _ULM_ITERS,
        _ULM_K,
        _ULM_SEED_MULTI,
        unigram_lm_encode,
    )

    rows = [
        (0, "the cats sat on the mats", "en", "web"),
        (1, "the rats saw the cats", "en", "web"),
        (2, "inter intern internal international nation", "en", "code"),
        (3, "nation national nations the inter", "en", "code"),
    ]
    words = collections.Counter(
        w for _, t, _, _ in rows for w in t.lower().split() if w.isalpha()
    )

    def halfup(x):
        return int(math.floor(x + 0.5))

    subcnt: collections.Counter = collections.Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for k in range(1, min(_ULM_K, len(w) - i) + 1):
                subcnt[w[i : i + k]] += f
    seed = {p: c for p, c in subcnt.items() if len(p) == 1}
    seed.update(
        dict(
            sorted(
                ((p, c) for p, c in subcnt.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[:_ULM_SEED_MULTI]
        )
    )
    total = sum(seed.values())
    costs = {p: halfup(-math.log(c / total) * 1e6) for p, c in seed.items()}
    INF = 1 << 40

    def viterbi(w):
        dp = [0]
        for i in range(1, len(w) + 1):
            dp.append(
                min(
                    ((dp[i - k] >> 3) + costs.get(w[i - k : i], INF)) * 8 + k
                    for k in range(1, min(_ULM_K, i) + 1)
                )
            )
        pieces, pos = [], len(w)
        while pos > 0:
            k = dp[pos] % 8
            pieces.append(w[pos - k : pos])
            pos -= k
        return pieces

    for _ in range(_ULM_ITERS):
        cnt: collections.Counter = collections.Counter()
        for w, f in words.items():
            for p in viterbi(w):
                cnt[p] += f
        total = sum(cnt.values())
        costs = {p: halfup(-math.log(c / total) * 1e6) for p, c in cnt.items()}

    expect: dict = {}
    for _, t, _, src in rows:
        for w in t.lower().split():
            if not w.isalpha():
                continue
            nw, nc, nt = expect.get(src, (0, 0, 0))
            expect[src] = (nw + 1, nc + len(w), nt + len(viterbi(w)))

    sf_dir = _stage_documents(
        spark, tmp_path, [(i, t, lang, src) for i, t, lang, src in rows]
    )
    got = {
        r["source"]: (r["n_words"], r["n_chars"], r["n_tokens_unigram"])
        for r in unigram_lm_encode(spark, sf_dir).collect()
    }
    assert got == expect


def test_unigram_viterbi_fold_is_optimal_vs_bruteforce(spark):
    """The packed-int64 DP fold must pick a MINIMUM-total-cost
    segmentation among ALL segmentations with piece length <= K (missing
    pieces priced at INF), with the documented tiebreak — checked by
    exhaustive enumeration over short words under adversarial cost maps
    (a piece cheaper than its parts, a trap char, ties)."""
    import itertools

    from pyspark.sql import functions as F

    from cdc_practice_spark.queries.text_queries import (
        _ULM_INF,
        _ULM_K,
        _unigram_viterbi_pieces,
    )

    words = ["a", "ab", "abc", "abab", "ababa", "aaaaaa", "xaybz", "banana"]
    cost_maps = [
        {"a": 10, "b": 12, "ab": 15, "ba": 9, "aba": 40, "ban": 7, "n": 3},
        {"a": 5, "b": 5, "c": 5, "abc": 20, "bc": 4, "x": 1, "y": 1, "z": 1},
        {"a": 7, "ab": 14, "abab": 20, "b": 7},  # exact tie ab+ab vs abab
    ]

    def brute(w, costs):
        best = None
        for cuts in itertools.product(
            range(1, _ULM_K + 1), repeat=len(w)
        ):  # overshoot; filtered below
            pos, pieces, total = 0, [], 0
            for k in cuts:
                if pos >= len(w):
                    break
                k = min(k, len(w) - pos)
                pieces.append(w[pos : pos + k])
                total += costs.get(w[pos : pos + k], _ULM_INF)
                pos += k
            if pos != len(w):
                continue
            if best is None or total < best:
                best = total
        return best

    for costs in cost_maps:
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        dp, walk = _unigram_viterbi_pieces(costs)
        got = {
            r["w"]: list(r["ps"])
            for r in df.withColumn("dp", dp)
            .select("w", walk(F.col("dp")).alias("ps"))
            .collect()
        }
        for w in words:
            pieces = got[w]
            assert "".join(reversed(pieces)) == w or "".join(pieces) == w, (
                w,
                pieces,
            )
            total = sum(costs.get(p, _ULM_INF) for p in pieces)
            assert total == brute(w, costs), (w, pieces, total)


def test_unigram_lm_pruned_matches_pure_python_reference(spark, tmp_path):
    """unigram_lm_train_pruned vs a from-scratch implementation of the
    FULL Kudo pipeline — over-seed, EM, alternative-segmentation loss
    (self-excluded Viterbi per piece), loss-ranked prune keeping single
    chars unconditionally, renormalize, final EM pass.  Extends the r8
    parity test to the prune decision (VERDICT r8 ask #2)."""
    import collections
    import math

    from cdc_practice_spark.queries.text_queries import (
        _ULM_ITERS,
        _ULM_K,
        _ULM_PRUNE_KEEP,
        _ULM_PRUNE_SEED,
        unigram_lm_train_pruned,
    )

    texts = [
        "the cats sat on the mats",
        "the rats saw the cats",
        "inter intern internal international nation",
        "nation national nations the inter",
        "station stationary rationally rational ratio",
    ]
    words = collections.Counter(
        w for t in texts for w in t.lower().split() if w.isalpha()
    )

    def halfup(x):
        return int(math.floor(x + 0.5))

    subcnt: collections.Counter = collections.Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for k in range(1, min(_ULM_K, len(w) - i) + 1):
                subcnt[w[i : i + k]] += f
    seed = {p: c for p, c in subcnt.items() if len(p) == 1}
    seed.update(
        dict(
            sorted(
                ((p, c) for p, c in subcnt.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[:_ULM_PRUNE_SEED]
        )
    )
    total = sum(seed.values())
    costs = {p: halfup(-math.log(c / total) * 1e6) for p, c in seed.items()}
    INF = 1 << 40

    def viterbi_dp(w, costs, exclude_self=False):
        dp = [0]
        for i in range(1, len(w) + 1):
            cands = []
            for k in range(1, min(_ULM_K, i) + 1):
                piece = w[i - k : i]
                pc = INF if (exclude_self and piece == w) else costs.get(
                    piece, INF
                )
                cands.append(((dp[i - k] >> 3) + pc) * 8 + k)
            dp.append(min(cands))
        return dp

    def segment(w, costs):
        dp = viterbi_dp(w, costs)
        pieces, pos = [], len(w)
        while pos > 0:
            k = dp[pos] % 8
            pieces.append(w[pos - k : pos])
            pos -= k
        return pieces

    def em_step(costs):
        cnt: collections.Counter = collections.Counter()
        for w, f in words.items():
            for p in segment(w, costs):
                cnt[p] += f
        total = sum(cnt.values())
        return cnt, {
            p: halfup(-math.log(c / total) * 1e6) for p, c in cnt.items()
        }

    cnt: collections.Counter = collections.Counter()
    for _ in range(_ULM_ITERS):
        cnt, costs = em_step(costs)

    # prune: loss = count * (self-excluded alt cost - own cost)
    losses = []
    for p, c in cnt.items():
        if len(p) == 1:
            continue
        alt = viterbi_dp(p, costs, exclude_self=True)[len(p)] >> 3
        losses.append((-c * (alt - costs[p]), p))
    kept_multi = {p for _neg, p in sorted(losses)[:_ULM_PRUNE_KEEP]}
    survivors = {
        p: c for p, c in cnt.items() if len(p) == 1 or p in kept_multi
    }
    total = sum(survivors.values())
    costs = {
        p: halfup(-math.log(c / total) * 1e6) for p, c in survivors.items()
    }
    cnt, costs = em_step(costs)
    expect = sorted((p, c, costs[p]) for p, c in cnt.items())

    sf_dir = _stage_documents(
        spark, tmp_path, [(i, t, "en", "unit") for i, t in enumerate(texts)]
    )
    got = [
        (r["piece"], r["count"], r["cost"])
        for r in unigram_lm_train_pruned(spark, sf_dir)
        .orderBy("piece")
        .collect()
    ]
    assert got == expect
    # the prune is load-bearing: a larger seed converged to no more than
    # the target number of multi-char survivors
    n_multi = sum(1 for p, _, _ in got if len(p) > 1)
    assert 0 < n_multi <= _ULM_PRUNE_KEEP < _ULM_PRUNE_SEED


def test_hard_sigmoid_trainer_matches_pure_python(spark):
    """operators/classifier.py parity vs an independent pure-Python
    reimplementation of the integer-exact training loop on a tiny
    synthetic corpus — every weight after 3 iterations must match
    (the SQL-twin oracle proves Spark==DuckDB; this proves both match
    the algorithm as specified)."""
    import hashlib

    from cdc_practice_spark.operators.classifier import (
        bigram_ppm_features,
        train_hard_sigmoid_lr,
    )

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "lorem ipsum dolor sit amet consectetur"),
        (2, "the the the a a of of in in on"),
        (3, "zzz qqq xxx yyy www vvv"),
        (4, "a stitch in time saves nine says the tailor"),
        (5, "foo bar baz qux quux corge grault"),
    ]
    labels = {0: 1, 1: 0, 2: 1, 3: 0, 4: 1, 5: 0}

    def tdiv(a, b):  # truncation toward zero, as Spark div / DuckDB //
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    # pure-python features
    feats = {}
    for did, text in docs:
        ts = [t for t in text.lower().strip().split() if t]
        cnt = {}
        for a, b in zip(ts, ts[1:]):
            h = int(hashlib.md5(f"f:{a} {b}".encode()).hexdigest()[:15], 16) % 1024
            cnt[h] = cnt.get(h, 0) + 1
        tc = sum(cnt.values())
        feats[did] = {b: tdiv(c * 1000000, tc) for b, c in cnt.items()}

    n = len(docs)
    w = {}
    for it in range(3):
        if it == 0:
            err = {d: 500000 - labels[d] * 1000000 for d, _ in docs}
        else:
            err = {}
            for d, _ in docs:
                margin = tdiv(sum(w.get(b, 0) * x for b, x in feats[d].items()), 1000000)
                p = max(0, min(1000000, 500000 + tdiv(margin, 4)))
                err[d] = p - labels[d] * 1000000
        grad = {}
        for d, _ in docs:
            for b, x in feats[d].items():
                grad[b] = grad.get(b, 0) + err[d] * x
        for b, g in grad.items():
            w[b] = w.get(b, 0) - tdiv(tdiv(g, 1000000) * 16, n)

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    lab = spark.createDataFrame(
        [(d, y) for d, y in labels.items()], "doc_id long, y long"
    )
    bg = bigram_ppm_features(sdf)
    got = {
        r.b: r.w
        for r in train_hard_sigmoid_lr(bg, lab, n, n_iter=3).collect()
    }
    assert got == w
