"""Property tests: vectorized hashers vs straightforward scalar references."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kgray.dedup import MinHasher, SimHasher, _gram_hashes, _word_hashes
from kgray.textops import _FNV_PRIME, rolling_hash64

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    ),
    min_size=0,
    max_size=20,
)


def _ref_rolling(s: str) -> int:
    h = 0
    data = s.encode("utf-8")
    P = int(_FNV_PRIME)
    for i, b in enumerate(data):
        h = (h + b * pow(P, len(data) - 1 - i, 1 << 64)) % (1 << 64)
    return h


@settings(max_examples=50, deadline=None)
@given(texts_strategy)
def test_rolling_hash_matches_scalar_reference(texts):
    got = rolling_hash64(pa.array(texts, type=pa.string()))
    for s, h in zip(texts, got):
        assert int(h) == _ref_rolling(s)


@settings(max_examples=30, deadline=None)
@given(texts_strategy)
def test_word_hash_row_lengths(texts):
    _, lengths = _word_hashes(pa.array(texts, type=pa.string()))
    assert [int(x) for x in lengths] == [len(t.split()) for t in texts]


@settings(max_examples=30, deadline=None)
@given(texts_strategy, st.integers(min_value=1, max_value=4))
def test_gram_counts(texts, k):
    word_h, lengths = _word_hashes(pa.array(texts, type=pa.string()))
    _, n_grams = _gram_hashes(word_h, lengths, k)
    for t, g in zip(texts, n_grams):
        w = len(t.split())
        expect = max(w - k + 1, min(w, 1))
        assert int(g) == expect


def test_minhash_identical_texts_same_signature():
    mh = MinHasher(shingle_k=2)
    t = pa.array(["a b c d e", "a b c d e", "f g h i j"])
    sigs = mh.signatures(t)
    assert (sigs[0] == sigs[1]).all()
    assert not (sigs[0] == sigs[2]).all()


def test_simhash_column_permutation_invariance_of_rows():
    sh = SimHasher()
    a = pa.array(["x y z", "p q r", ""])
    b = pa.array(["p q r", "", "x y z"])
    ha = SimHasher.simhash_column(a)
    hb = SimHasher.simhash_column(b)
    assert ha[0] == hb[2] and ha[1] == hb[0] and ha[2] == hb[1] == 0


def test_lang_id_vectorized_matches_scalar_reference():
    """The vectorized LangId must reproduce the scalar set-intersection
    semantics exactly (distinct marker hits, sorted-language tiebreak,
    'und' on zero evidence)."""
    import pyarrow as pa

    from kgray.textops import LANG_MARKERS, LangId

    texts = [
        "the cat and the dog of is was",      # en, repeated markers count once
        "el la los es una",                   # es
        "der die das und ist",                # de
        "le la les est une",                  # fr
        "la la la",                           # tie es/fr on {'la'} -> 'es' (sorted first)
        "", "xyzzy plugh",                    # no evidence -> 'und'
        "the el",                             # 1-1 tie en/es -> 'en'
    ]
    batch = pa.table({"text": pa.array(texts, type=pa.string())})
    got = LangId()(batch)["lang_pred"].to_pylist()

    def scalar(text):
        words = set((text or "").lower().split())
        best, best_score = "und", 0
        for lang in sorted(LANG_MARKERS):
            ms = frozenset(LANG_MARKERS[lang])
            if not ms:
                continue
            score = len(words & ms)
            if score > best_score:
                best, best_score = lang, score
        return best

    assert got == [scalar(t) for t in texts]
    assert got[4] == "es" and got[5] == "und" and got[7] == "en"


def test_pair_jaccard_property_matches_scalar():
    """Property: the vectorized hashed-gram pair_jaccard equals the scalar
    string-gram reference on arbitrary word sequences (any k, any lengths,
    empties included)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgray.dedup import _jaccard, pair_jaccard

    word = st.sampled_from(["a", "b", "c", "dd", "eee", "f0"])
    text = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(text, text), min_size=1, max_size=8),
           st.integers(min_value=1, max_value=4))
    def check(pairs, k):
        a = pa.array([p[0] for p in pairs], type=pa.string())
        b = pa.array([p[1] for p in pairs], type=pa.string())
        got = pair_jaccard(a, b, k)
        expected = [_jaccard(x, y, k) for x, y in pairs]
        assert all(abs(g - e) < 1e-12 for g, e in zip(got, expected))

    check()


def test_mode_decomposition_property():
    """Property: the salted MODE decomposition is exact — for ANY split of
    the rows into slices, merge(concat(partial(slice_i))) equals the
    direct single-pass mode with the same tie-break (max count, then
    smallest value)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgray.relational import _mode_merge, _mode_partial

    row = st.tuples(st.sampled_from(["g1", "g2", "g3"]),
                    st.integers(min_value=0, max_value=5))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(row, min_size=1, max_size=40),
           st.lists(st.integers(min_value=0, max_value=3),
                    min_size=1, max_size=40))
    def check(rows, cut_salts):
        df = pd.DataFrame(rows, columns=["g", "v"])
        # arbitrary row->slice assignment (cycled to cover all rows)
        salts = [cut_salts[i % len(cut_salts)] for i in range(len(df))]
        parts = [
            _mode_partial(df[pd.Series(salts, index=df.index) == s], "g", "v")
            for s in sorted(set(salts))
        ]
        got = _mode_merge(pd.concat(parts, ignore_index=True), "g", "v")
        got = got.set_index("g").sort_index()

        direct = _mode_merge(_mode_partial(df, "g", "v"), "g", "v")
        direct = direct.set_index("g").sort_index()
        pd.testing.assert_frame_equal(got, direct)

    check()


# --- session-7 pure-kernel properties (no Ray session needed) ---

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=50),
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=50),
)
@settings(max_examples=50, deadline=None)
def test_zorder_key_deinterleaves(xs, ys):
    """z decodes back to (x, y) exactly — the interleave is a bijection."""
    import numpy as np

    from kgray.materialize import zorder_key

    n = min(len(xs), len(ys))
    x = np.array(xs[:n], dtype=np.int64)
    y = np.array(ys[:n], dtype=np.int64)
    z = zorder_key(x, y)
    xb = np.zeros(n, dtype=np.int64)
    yb = np.zeros(n, dtype=np.int64)
    for i in range(16):
        xb |= ((z >> (2 * i)) & 1) << i
        yb |= ((z >> (2 * i + 1)) & 1) << i
    assert (xb == x).all() and (yb == y).all()


@given(st.lists(st.integers(min_value=0, max_value=2**34), min_size=1, max_size=100))
@settings(max_examples=50, deadline=None)
def test_bloom_positions_stable_and_in_range(keys):
    """Positions are deterministic, in range, and identical to the scalar
    HUGEINT formula the SQL oracle uses."""
    import numpy as np

    from kgray.sketch import _BLOOM_MULTS, _bloom_positions

    k = np.array(keys, dtype=np.int64)
    pos = _bloom_positions(k, 1 << 20)
    assert pos.shape == (len(keys), 3)
    assert (pos < (1 << 20)).all()
    for row, key in zip(pos, keys):
        for j, a in enumerate(_BLOOM_MULTS):
            assert int(row[j]) == ((key % 2**32) * a) % 2**32 % (1 << 20)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
@settings(max_examples=50, deadline=None)
def test_rolling_hash_matches_scalar_polynomial(text):
    """The vectorized UTF-8-buffer hash equals the per-byte scalar
    polynomial (the definition the HUGEINT SQL mirror unrolls)."""
    import pyarrow as pa

    from kgray.textops import rolling_hash64

    got = int(rolling_hash64(pa.array([text]))[0])
    P = 1099511628211
    want = 0
    bs = text.encode()
    for i, byte in enumerate(bs):
        want = (want + byte * pow(P, len(bs) - 1 - i, 2**64)) % 2**64
    assert got == want


def test_bigram_lm_scores_hand_checked(ray_session):
    """Tiny corpus with known bigram counts: 'a b' appears twice, 'a c'
    once -> P(b|a)=2/3, P(c|a)=1/3 in ppm floors; docs with <2 words
    emit no row."""
    import ray.data as rd

    from kgray.textops import bigram_lm_scores

    rows = [
        {"doc_id": 0, "text": "a b"},          # one bigram: (a,b)
        {"doc_id": 1, "text": "a b"},          # same
        {"doc_id": 2, "text": "a c"},          # (a,c)
        {"doc_id": 3, "text": "solo"},         # no bigrams -> no row
    ]
    ds = rd.from_items(rows, override_num_blocks=3)
    out = {r["doc_id"]: r for r in bigram_lm_scores(ds).take_all()}
    assert set(out) == {0, 1, 2}
    # c(a,b)=2, c(a,.)=3 -> contrib floor(1e6*2/3)=666666
    assert out[0]["lm_score_ppm"] == 666_666 and out[0]["n_bigrams"] == 1
    assert out[1]["lm_score_ppm"] == 666_666
    # c(a,c)=1 -> floor(1e6/3)=333333
    assert out[2]["lm_score_ppm"] == 333_333

    # mean across a doc's bigrams floors AFTER summing contributions
    rows2 = rows[:3] + [{"doc_id": 9, "text": "a b a c"}]
    # doc 9 bigrams: (a,b) (b,a) (a,c); corpus: c(a,b)=3, c(b,a)=1, c(a,c)=2,
    # c(a,.)=5, c(b,.)=1
    out2 = {
        r["doc_id"]: r
        for r in bigram_lm_scores(
            rd.from_items(rows2, override_num_blocks=2)
        ).take_all()
    }
    want = ((1_000_000 * 3) // 5 + (1_000_000 * 1) // 1 + (1_000_000 * 2) // 5) // 3
    assert out2[9]["n_bigrams"] == 3
    assert out2[9]["lm_score_ppm"] == want


def test_boilerplate_turns_hand_checked(ray_session):
    """The canned text recurring in >= 5 convs flags as boilerplate; the
    per-conv ratio floors in ppm."""
    import ray.data as rd

    import __ray_entry__ as entry

    # build a fake transcripts_dataset via monkey-free direct call: use the
    # real query at sf0.001 and check invariants instead of hand counts
    res = entry.queries()["boilerplate_turns"]("/root/testdata/sf0.001")
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert (df["n_boiler"] <= df["n_turns"]).all()
    assert ((df["boiler_ppm"] >= 0) & (df["boiler_ppm"] <= 1_000_000)).all()
    assert (df["boiler_ppm"] == (1_000_000 * df["n_boiler"]) // df["n_turns"]).all()
    assert df["n_boiler"].sum() > 0  # the filler templates do recur


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1,
             max_size=300),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_codec_roundtrip_property(samples, channels, rate):
    """Any PCM16 signal (mono or stereo, any supported rate) survives
    encode -> decode bit-exactly, including extremes at the int16
    boundaries."""
    from kgray.multimodal import decode_wav, encode_wav

    arr = np.array(samples, dtype=np.int16)
    if channels == 2:
        arr = np.stack([arr, arr[::-1]], axis=1)
    out, got_rate = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    want = arr if arr.ndim == 2 else arr[:, None]
    assert out.shape == want.shape and (out == want).all()


def _ref_gopher(text: str) -> dict:
    words = [w for w in text.split(" ") if w]
    n = len(words)
    sum_len = sum(len(w) for w in words)
    n_alpha = sum(any(c.isascii() and c.isalpha() for c in w) for w in words)
    n_sym = sum(("#" in w) or ("..." in w) for w in words)
    n_stop = len({w for w in words if w in ("the", "a", "and", "of", "to")})
    return {
        "n_words": n,
        "wordcount_ok": int(10 <= n <= 100_000),
        "meanlen_ok": int(n > 0 and 3 * n <= sum_len <= 10 * n),
        "alpha_ok": int(5 * n_alpha >= 4 * n),
        "symbol_ok": int(10 * n_sym <= n),
        "stop_ok": int(n_stop >= 2),
    }


_gopher_word = st.sampled_from(
    ["the", "a", "and", "of", "to", "ab", "c#d", "...", "x12", "999",
     "supercalifragilistically", "", "cat", "doghouse"]
)
_gopher_doc = st.lists(_gopher_word, min_size=0, max_size=25).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(st.lists(_gopher_doc, min_size=1, max_size=12))
def test_gopher_gate_matches_scalar_reference(texts):
    from kgray.textops import gopher_gate_batch

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = gopher_gate_batch(t).to_pydict()
    for i, text in enumerate(texts):
        ref = _ref_gopher(text)
        for key, want in ref.items():
            assert out[key][i] == want, (key, text)
        want_keep = all(
            ref[k] for k in
            ("wordcount_ok", "meanlen_ok", "alpha_ok", "symbol_ok", "stop_ok")
        )
        assert out["keep"][i] == int(want_keep)


def _ref_dsir_scores(raw, target, num_buckets=64, scale=10**6):
    from kgray.textops import rolling_hash64 as rh

    def buckets(texts):
        toks = [w for t in texts for w in t.split(" ") if w]
        if not toks:
            return np.zeros(num_buckets, dtype=np.int64)
        h = rh(pa.array(toks, type=pa.string()))
        return np.bincount(
            (h % np.uint64(num_buckets)).astype(np.int64), minlength=num_buckets
        )

    ct, cr = buckets([t for _, t in target]), buckets([t for _, t in raw])
    nt, nr = ct.sum(), cr.sum()
    ratio = np.round(
        scale * (np.log((ct + 1.0) / (nt + num_buckets))
                 - np.log((cr + 1.0) / (nr + num_buckets)))
    ).astype(np.int64)
    scores = {}
    for i, t in raw:
        toks = [w for w in t.split(" ") if w]
        if not toks:
            continue
        h = rh(pa.array(toks, type=pa.string()))
        scores[i] = int(
            ratio[(h % np.uint64(num_buckets)).astype(np.int64)].sum()
        )
    return scores


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="abc ", max_size=20), min_size=1, max_size=10),
    st.lists(st.text(alphabet="abc ", max_size=20), min_size=1, max_size=4),
)
def test_dsir_select_matches_scalar_reference(ray_session, raw_texts, tgt_texts):
    import ray.data as rd

    from kgray.textops import dsir_select

    raw = list(enumerate(raw_texts))
    tgt = list(enumerate(tgt_texts))

    def tbl(rows):
        return pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], type=pa.int64()),
                "text": pa.array([t for _, t in rows]),
            }
        )

    got = dsir_select(
        rd.from_arrow(tbl(raw)), rd.from_arrow(tbl(tgt)),
        n_select=5, num_buckets=64,
    )
    ref = _ref_dsir_scores(raw, tgt)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["doc_id"].to_pylist(),
                    got["dsir_score"].to_pylist())) == want


def test_perplexity_buckets_hand_checked(ray_session):
    """Tercile buckets over the tiny corpus: docs 0/1 share the top score
    (tie -> same strictly-below rank -> same bucket), doc 2 ranks lowest;
    docs with <2 words never appear. Cuts are pure int comparisons on the
    ppm percentile."""
    import ray.data as rd

    from kgray.textops import perplexity_buckets

    rows = [
        {"doc_id": 0, "text": "a b"},      # lm 666666 (tie with doc 1)
        {"doc_id": 1, "text": "a b"},
        {"doc_id": 2, "text": "a c"},      # lm 333333 -> lowest
        {"doc_id": 3, "text": "solo"},     # no bigrams -> absent
    ]
    ds = rd.from_items(rows, override_num_blocks=3)
    out = {r["doc_id"]: r for r in perplexity_buckets(ds).take_all()}
    assert set(out) == {0, 1, 2}
    # n=3 scored docs: doc 2 has 0 strictly below -> pct 0 -> tail;
    # docs 0/1 tie with 1 strictly below -> pct floor(1e6/3)=333333 -> middle
    assert out[2]["pct_ppm"] == 0 and out[2]["bucket"] == "tail"
    for d in (0, 1):
        assert out[d]["pct_ppm"] == 333_333 and out[d]["bucket"] == "middle"

    # empty corpus: no rows, no crash
    empty = rd.from_items([{"doc_id": 1, "text": "one"}])
    assert perplexity_buckets(empty).take_all() == []


def test_apply_bpe_roundtrip_invariants(ray_session):
    """apply_bpe is the byte-identical twin of train_bpe's merge
    kernel: token counts equal a direct per-word reference encode;
    with zero merges every word costs len(word) symbols; more merges
    never increase any doc's count."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from kgray.textops import apply_bpe, train_bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
        "",
        "low newer",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(2)
    merges = train_bpe(ds, n_merges=6)
    pairs = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))

    def ref_encode(word, ps):
        syms = list(word)
        for a, b in ps:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return len(syms)

    got = {r["doc_id"]: (r["n_words"], r["n_subwords"])
           for r in apply_bpe(ds, merges).take_all()}
    # doc 3 is empty -> no row
    assert set(got) == {0, 1, 2, 4}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        if not words:
            continue
        expect = sum(ref_encode(w, pairs) for w in words)
        assert got[i] == (len(words), expect), (i, got[i], expect)

    # zero merges: every word costs its character count
    got0 = {r["doc_id"]: r["n_subwords"]
            for r in apply_bpe(ds, []).take_all()}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        if words:
            assert got0[i] == sum(len(w) for w in words)

    # monotone: more merges never increase a doc's token count
    prev = got0
    for k in (2, 4, 6):
        mk = pa.table({
            "left": merges["left"].slice(0, k),
            "right": merges["right"].slice(0, k),
        })
        cur = {r["doc_id"]: r["n_subwords"]
               for r in apply_bpe(ds, mk).take_all()}
        assert all(cur[d] <= prev[d] for d in cur)
        prev = cur
