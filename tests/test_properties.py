"""Property-based tests (SURVEY.md §5 item 4, hypothesis): text-function
parity with Python reference implementations over adversarial strings,
dedup idempotence / exact-dup recall over generated corpora.

Each example batches many generated strings into ONE DataFrame so a
property costs one Spark job, not |strings| jobs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions import text as T
from spark_ml_showcase_spark.operators import dedup

# printable ASCII incl. whitespace variety — the adversarial cases are
# leading/trailing tabs/newlines and punctuation-only strings
_texts = st.text(
    alphabet=st.sampled_from(
        list("abcdefgh XYZ.,!?:;()[]'\"-_0123456789\t\n")
    ),
    max_size=60,
)

_SETTINGS = dict(max_examples=5, deadline=None)


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=40))
def test_token_count_matches_python_split(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "t string")
    got = [r.n for r in df.select(T.whitespace_token_count("t").alias("n")).collect()]
    want = [len(s.split()) for s in strings]
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=40))
def test_punct_ratio_bounded(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "t string")
    rows = df.select(
        T.punct_ratio("t").alias("p"), T.quality_score("t").alias("q")
    ).collect()
    assert all(0.0 <= r.p <= 1.0 and 0.0 <= r.q <= 1.0 for r in rows)


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=40))
def test_shingle_count_formula(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "t string")
    got = [r.n for r in df.select(F.size(T.shingles("t", 3)).alias("n")).collect()]
    for s, n in zip(strings, got):
        toks = s.lower().split()
        distinct = {" ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))}
        assert n == len(distinct)


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=30))
def test_fingerprint_equality_iff_normalized_equal(spark, strings):
    import re

    df = spark.createDataFrame(list(enumerate(strings)), "i bigint, t string")
    rows = df.select("i", T.fingerprint("t").alias("f")).collect()
    fps = {r.i: r.f for r in rows}
    norm = {i: re.sub(r"\s+", " ", s.lower().strip()) for i, s in enumerate(strings)}
    for i in fps:
        for j in fps:
            if norm[i] == norm[j]:
                assert fps[i] == fps[j]
            else:
                assert fps[i] != fps[j]  # xxhash64 collision ~2^-64


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=2, max_size=30))
def test_exact_dedup_idempotent_and_complete(spark, strings):
    import re

    df = spark.createDataFrame(list(enumerate(strings)), "doc_id bigint, text string")
    out = dedup.exact_dedup(df, "text", "doc_id")
    n_norm = len({re.sub(r"\s+", " ", s.lower().strip()) for s in strings})
    assert out.count() == n_norm  # exactly one survivor per normalized text
    assert dedup.exact_dedup(out, "text", "doc_id").count() == n_norm


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=25))
def test_chunking_reconstructs_tokens(spark, strings):
    # de-overlapped chunk concatenation must reproduce the token stream
    # exactly, for any whitespace-adversarial input
    from spark_ml_showcase_spark.operators import chunking

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "doc_id bigint, text string"
    )
    out = chunking.chunk_documents(df, max_tokens=7, overlap=2)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, s in enumerate(strings):
        want = s.split()
        chunks = [c for _, c in sorted(by_doc.get(i, []))]
        if not want:
            assert chunks == []
            continue
        got = chunks[0].split()
        for c in chunks[1:]:
            got += c.split()[2:]  # drop the 2-token overlap
        assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edge_list):
    df = spark.createDataFrame(edge_list, "id_a bigint, id_b bigint")
    got = {
        r.id: r.comp for r in dedup.connected_components(df, max_iter=40).collect()
    }
    # python union-find reference
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=2, max_size=15))
def test_bigram_lm_matches_python_reference(spark, strings):
    """bigram_lm_scores == the brute-force Python LM on arbitrary
    corpora: same smoothing, same tokenization, 6-decimal equality."""
    import math
    from collections import Counter

    from spark_ml_showcase_spark.functions.text import py_tokens
    from spark_ml_showcase_spark.operators import lm_score

    texts = {i: s for i, s in enumerate(strings)}
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll_bits)
        for r in lm_score.bigram_lm_scores(df, k=0.5).collect()
    }
    toks = {d: py_tokens(t) for d, t in texts.items()}
    uc = Counter(w for ws in toks.values() for w in ws)
    bc = Counter(
        (ws[i], ws[i + 1]) for ws in toks.values() for i in range(len(ws) - 1)
    )
    v = len(uc)
    want = {}
    for d, ws in toks.items():
        bis = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        if not bis:
            continue
        s = sum(math.log((bc[b] + 0.5) / (uc[b[0]] + 0.5 * v)) for b in bis)
        want[d] = (len(bis), round(-s / (len(bis) * math.log(2)), 6))
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=15), st.integers(2, 4))
def test_boilerplate_fraction_matches_python_reference(spark, strings, min_docs):
    """boilerplate_fraction == brute-force Python span counting (3-gram
    spans, min_docs threshold) on arbitrary corpora."""
    from collections import Counter

    from spark_ml_showcase_spark.functions.text import py_tokens
    from spark_ml_showcase_spark.operators import boilerplate

    texts = {i: s for i, s in enumerate(strings)}
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_boiler_spans)
        for r in boilerplate.boilerplate_fraction(
            df, n=3, min_docs=min_docs
        ).collect()
    }
    spans = {
        d: {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        for d, ws in ((d, py_tokens(t)) for d, t in texts.items())
    }
    docfreq = Counter(g for gs in spans.values() for g in gs)
    want = {
        d: (len(gs), sum(1 for g in gs if docfreq[g] >= min_docs))
        for d, gs in spans.items()
        if gs
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # stratum
            st.integers(min_value=1, max_value=50),  # token count
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=300),  # budget
)
def test_token_budget_sample_matches_python_reference(spark, rows, budget):
    """token_budget_sample == a pure-Python reference: per stratum, sort
    by (md5(id) 16-hex prefix, id), take the maximal prefix whose
    inclusive token sum stays ≤ budget."""
    import hashlib

    from spark_ml_showcase_spark.operators import splits

    data = [(i, dom, toks) for i, (dom, toks) in enumerate(rows)]
    df = spark.createDataFrame(data, "id bigint, dom string, toks bigint")
    budgets = {"a": budget, "b": budget * 2}
    got = {
        (r.id, r.cum_tokens)
        for r in splits.token_budget_sample(df, "dom", "id", "toks", budgets).collect()
    }

    want = set()
    for dom, cap in budgets.items():
        members = sorted(
            (rid for rid, d, _ in data if d == dom),
            key=lambda rid: (hashlib.md5(str(rid).encode()).hexdigest()[:16], rid),
        )
        toks_of = {rid: t for rid, d, t in data if d == dom}
        cum = 0
        for rid in members:
            cum += toks_of[rid]
            if cum > cap:
                break
            want.add((rid, cum))
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=9),   # src w
    st.integers(min_value=1, max_value=9),   # src h
    st.integers(min_value=1, max_value=12),  # dst w
    st.integers(min_value=1, max_value=12),  # dst h
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
)
def test_resize_bmp_matches_numpy_reference(w, h, nw, nh, seed):
    """resize_bmp == numpy nearest-neighbor over arbitrary dims and
    pixel contents (hand-built multi-color BMPs, all stride residues)."""
    import struct

    import numpy as np

    from spark_ml_showcase_spark.operators import multimodal

    rng = np.random.RandomState(seed % (2**31))
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)  # BGR rows
    stride_pad = b"\x00" * ((4 - (3 * w) % 4) % 4)
    pixels = b"".join(img[y].tobytes() + stride_pad for y in range(h))
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    buf = header + info + pixels

    out = multimodal.resize_bmp(buf, nw, nh)
    # decode the output back into a numpy array
    (pix_off,) = struct.unpack_from("<I", out, 10)
    _, ow, oh = struct.unpack_from("<Iii", out, 14)
    assert (ow, oh) == (nw, nh)
    ostride = (3 * nw + 3) // 4 * 4
    got = np.stack(
        [
            np.frombuffer(
                out[pix_off + y * ostride : pix_off + y * ostride + 3 * nw],
                dtype=np.uint8,
            ).reshape(nw, 3)
            for y in range(nh)
        ]
    )
    ys = (np.arange(nh) * h) // nh
    xs = (np.arange(nw) * w) // nw
    want = img[np.ix_(ys, xs)]
    assert np.array_equal(got, want)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),   # id
            st.integers(min_value=0, max_value=5),    # cluster
            st.integers(min_value=-3, max_value=3),   # score
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_select_representatives_properties(spark, rows):
    """Invariants for keep-best selection on random clusterings: one rep
    per cluster, the rep is a member, its score is the cluster max, ties
    break to the smallest id, n_members is exact."""
    comps = spark.createDataFrame(
        [(i, c) for i, c, _ in rows], "id bigint, comp bigint"
    )
    scored = spark.createDataFrame(
        [(i, float(s)) for i, _, s in rows], "id bigint, score double"
    )
    reps = dedup.select_representatives(comps, scored).collect()
    by_cluster: dict[int, list[tuple[int, int]]] = {}
    for i, c, s in rows:
        by_cluster.setdefault(c, []).append((i, s))
    assert len(reps) == len(by_cluster)
    for r in reps:
        members = by_cluster[r.comp]
        best = max(s for _, s in members)
        want_id = min(i for i, s in members if s == best)
        assert (r.rep_id, r.rep_score, r.n_members) == (
            want_id,
            float(best),
            len(members),
        )


@settings(**_SETTINGS)
@given(
    st.lists(_texts, min_size=1, max_size=10),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=9),
)
def test_chunking_matches_python_reference_any_params(spark, strings, max_tokens, overlap):
    """The column-expression chunker equals a straightforward Python
    reference for ANY (max_tokens, overlap) — pins the boundary math
    (ceil window count, short final chunk, zero-token docs) beyond the
    fixed-parameter reconstruction test."""
    import math

    from spark_ml_showcase_spark.operators import chunking

    overlap = min(overlap, max_tokens - 1)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "doc_id bigint, text string"
    )
    got = {
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunking.chunk_documents(
            df, max_tokens=max_tokens, overlap=overlap
        ).collect()
    }
    want = set()
    stride = max_tokens - overlap
    for i, s in enumerate(strings):
        toks = s.split()
        if not toks:
            continue
        n_chunks = max(math.ceil((len(toks) - overlap) / stride), 1)
        for j in range(n_chunks):
            window = toks[j * stride : j * stride + max_tokens]
            want.add((i, j, " ".join(window), len(window)))
    assert got == want
