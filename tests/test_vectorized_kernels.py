"""Round-2 kernel vectorization: the batch kernels must produce
EXACTLY the values of the scalar reference kernels (they are the
user-visible outputs of simhash / fingerprints), and the batched
MinHash signature matrix must equal per-doc signatures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rdf2smw_ray.pipelines.dedup import (
    _perm_params,
    band_hashes,
    batch_signatures,
    minhash_signature,
    shingle_hashes,
    simhash_batch,
    simhash_text,
)
from rdf2smw_ray.pipelines.textstats import fingerprint_batch, fingerprint_text

TEXTS = [
    "",
    "one",
    "one two",
    "one two three",
    "one two three four",
    "one two three four five six seven eight nine ten",
    "the quick brown fox jumps over the lazy dog " * 8,
    "a a a a a a a a",  # heavy duplicates
    "word " * 3 + "tail",
    "\tweird   whitespace\n\nand punctuation!? yes.",
    "ünïcode tökens ünïcode tökens mixed ascii",
]


def _batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_simhash_batch_equals_scalar():
    got = simhash_batch(_batch(TEXTS))["simhash"].to_pylist()
    want = [simhash_text(t) for t in TEXTS]
    assert got == want


def test_fingerprint_batch_equals_scalar():
    got = fingerprint_batch(_batch(TEXTS))["fingerprint"].to_pylist()
    want = [fingerprint_text(t) for t in TEXTS]
    assert got == want


def test_fingerprint_batch_random_corpus():
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(0, 40)))
        for _ in range(200)
    ]
    got = fingerprint_batch(_batch(texts))["fingerprint"].to_pylist()
    want = [fingerprint_text(t) for t in texts]
    assert got == want


def test_batch_signatures_equal_per_doc():
    a, b = _perm_params(64)
    sigs = batch_signatures(TEXTS, a, b, k=5)
    for i, t in enumerate(TEXTS):
        want = minhash_signature(shingle_hashes(t, 5), a, b)
        assert np.array_equal(sigs[i], want), i


def test_vectorized_extractor_equals_scalar():
    from rdf2smw_ray.stages.extract_triples import PatternTripleExtractor

    ex = PatternTripleExtractor()
    pages = [
        (
            "http://x/1",
            'Alpha is a Widget.\nAlpha works with Beta.\n\n  Alpha has size 42.  \n'
            'Alpha is known as "Big Alpha".\nnoise line\n'
            "Widget is a subtype of Thing.\nGamma refers to Alpha.",
        ),
        ("http://x/2", ""),
        ("http://x/3", "only noise\nmore noise"),
        ("http://x/4", 'Class_Z is known as "Zed".\nDelta is a Gadget.'),
    ]
    ref = []
    for url, text in pages:
        ref.extend(ex.extract_page(url, text))
    ref = sorted(ref, key=lambda r: r[5])
    got_t = ex(
        pa.table({"url": [u for u, _ in pages], "text": [t for _, t in pages]})
    )
    cols = ("subj", "pred", "obj", "obj_kind", "obj_datatype", "seq", "src")
    got = sorted(
        zip(*[got_t[c].to_pylist() for c in cols]), key=lambda r: r[5]
    )
    assert [tuple(r) for r in got] == [
        (s, p, o, k, dt, q, u) for (s, p, o, k, dt, q, u) in ref
    ]


def test_band_hashes_discriminate():
    a, b = _perm_params(64)
    sigs = batch_signatures(TEXTS, a, b, k=5)
    bh = band_hashes(sigs, bands=16)
    assert bh.shape == (len(TEXTS), 16)
    # identical docs collide on every band; distinct docs on none
    s2 = batch_signatures([TEXTS[6], TEXTS[6], TEXTS[7]], a, b, k=5)
    b2 = band_hashes(s2, 16)
    assert np.array_equal(b2[0], b2[1])
    assert not np.array_equal(b2[0], b2[2])


def test_simhash_near_dup_matches_bruteforce():
    import ray.data as rd

    from rdf2smw_ray.pipelines.dedup import _popcount64, simhash_near_dup, simhash_text

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).split()
    texts = []
    for i in range(30):
        toks = list(base)
        for j in range(i % 4):  # 0-3 token perturbations
            toks[(7 * i + j) % len(toks)] = f"mut{i}_{j}"
        texts.append(" ".join(toks))
    texts += ["completely different content about engines " * 5] * 2
    docs = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))

    got_df = simhash_near_dup(docs, max_hamming=3).to_pandas()
    dup_col = next(c for c in got_df.columns if "dup_of" in c)
    got = {(int(a), int(b)) for a, b in zip(got_df["doc_id"], got_df[dup_col])}

    sigs = np.array([simhash_text(t) for t in texts], dtype=np.uint64)
    want = {}
    for i in range(len(texts)):
        for j in range(i):
            if int(_popcount64(np.array([sigs[i] ^ sigs[j]], dtype=np.uint64))[0]) <= 3:
                want.setdefault(i, j)  # min partner (j ascending)
    want_pairs = set(want.items())
    assert got == want_pairs
