"""Round-3 text ops: repetition stats, unigram-LM scoring,
benchmark decontamination — hand-computed expectations."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from rdf2smw_ray.pipelines.decontam import benchmark_ngrams, decontaminate
from rdf2smw_ray.pipelines.textstats import (
    quality_filter,
    repetition_stats,
    unigram_logprob,
)


def _ds(rows):
    return rd.from_arrow(pa.table(rows))


def test_repetition_stats_hand_computed(ray_session):
    out = (
        repetition_stats(
            _ds(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": [
                        "a a a b",          # top a=3/4; 2grams: aa,aa,ab → dup 2/3; uniq 2/4
                        "x y z",            # top 1/3; no dup 2grams; uniq 3/3
                        "p p p p",          # top 4/4; 2grams pp×3 dup 3/3; uniq 1/4
                    ],
                }
            )
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["top_token_frac"].tolist() == [0.75, round(1 / 3, 6), 1.0]
    assert out["dup_2gram_frac"].tolist() == [round(2 / 3, 6), 0.0, 1.0]
    assert out["unique_token_ratio"].tolist() == [0.5, 1.0, 0.25]


def test_unigram_logprob_hand_computed(ray_session):
    # corpus counts: a=3, b=1 → total 4
    out = (
        unigram_logprob(
            _ds(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": ["a a b", "a"],
                }
            )
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    la, lb = math.log(3 / 4), math.log(1 / 4)
    assert out["avg_logprob"].tolist() == [
        round((2 * la + lb) / 3, 6),
        round(la, 6),
    ]


def test_unigram_logprob_capped_vocab(ray_session):
    # corpus: a=3, b=2, c=1; total=6. max_vocab=2 keeps {a, b};
    # 'c' scores at the OOV floor ln(1/6).
    docs = _ds(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["a a b c", "a b"],
        }
    )
    la, lb, fl = math.log(3 / 6), math.log(2 / 6), math.log(1 / 6)
    capped = (
        unigram_logprob(docs, max_vocab=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert capped["avg_logprob"].tolist() == [
        round((2 * la + lb + fl) / 4, 6),
        round((la + lb) / 2, 6),
    ]
    # a cap at or above the true vocabulary is a no-op vs uncapped
    full = unigram_logprob(docs).to_pandas().sort_values("doc_id")
    wide = unigram_logprob(docs, max_vocab=10).to_pandas().sort_values("doc_id")
    assert full["avg_logprob"].tolist() == wide["avg_logprob"].tolist()


def test_decontaminate_flags_exact_overlaps_only(ray_session):
    docs = _ds(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "source": ["bench", "train", "train", "train"],
            "text": [
                "one two three four five six",
                "zz one two three four five yy",  # 1 shared 5-gram ("one two three four five")
                "one two three XX five six",      # no shared 5-gram
                "totally different words here now", # clean
            ],
        }
    )
    out = (
        decontaminate(docs, bench_source="bench", n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_hits"].tolist() == [1, 0, 0]
    assert out["contaminated"].tolist() == [True, False, False]


def test_decontaminate_distributed_equals_broadcast(ray_session):
    from rdf2smw_ray.pipelines.decontam import decontaminate_distributed

    docs = _ds(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "source": ["bench", "train", "train", "train"],
            "text": [
                "one two three four five six",
                "zz one two three four five yy one two three four five",
                "one two three XX five six",
                "totally different words here now",
            ],
        }
    )
    a = (
        decontaminate(docs, bench_source="bench", n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        decontaminate_distributed(docs, bench_source="bench", n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["n_hits"].tolist() == [2, 0, 0]  # doc 1 repeats the hit gram twice


def test_benchmark_ngrams_respects_doc_boundaries(ray_session):
    # two 3-token docs: no 5-gram may span the seam
    bench = _ds(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["a b c", "d e f"],
        }
    )
    assert benchmark_ngrams(bench, n=5) == frozenset()
    assert benchmark_ngrams(bench, n=3) == frozenset({"a b c", "d e f"})


def test_quality_filter_first_failing_rule(ray_session):
    def distinct(k):  # k distinct tokens, passes every rule on its own
        return " ".join(f"w{i}" for i in range(k))

    docs = _ds(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                distinct(30),                      # keep
                "a b c",                           # too_short (first rule wins)
                # 30 tokens, 'x' appears 6/30 = 0.2 > 0.125
                "x " * 6 + distinct(24),
                # 30 tokens, maxc 3/30 = 0.1 passes, but 'p q'×3 +
                # 'q p'×2 = 5 dup positions / 29 ≈ 0.172 > 0.12
                "p q " * 3 + distinct(24),
            ],
        }
    )
    out = (
        quality_filter(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["keep"].tolist() == [True, False, False, False]
    assert out["reject_reason"].tolist() == [
        "",
        "too_short",
        "repetitive_token",
        "repetitive_2gram",
    ]


def test_quality_filter_low_diversity(ray_session):
    # 26 tokens from a 7-word vocab: n=28? -> compute: 4 words ×7 = 28
    # tokens, nuniq/n = 7/28 = 0.25 < 0.35; top token 4/28 ≈ 0.143 >
    # 0.125 so make counts flat: 7 words ×4 = 28, top 4/28 = 0.1428 —
    # still > 0.125. Use 9 words ×3 = 27 tokens, top 3/27 = 0.111,
    # uniq 9/27 = 0.333 < 0.35; 2-grams: interleave so no adjacent
    # pair repeats more than allowed? Simpler: accept either
    # repetitive reason ordering by constructing dup-free sequence.
    words = [f"v{i}" for i in range(9)]
    # de Bruijn-ish: three distinct orderings → every adjacent pair unique
    seq = words + words[::2] + words[1::2] + list(reversed(words))
    seq = seq[:27]
    text = " ".join(seq)
    out = (
        quality_filter(
            _ds({"doc_id": pa.array([0], pa.int64()), "text": [text]})
        )
        .to_pandas()
    )
    assert out.loc[0, "keep"] == False  # noqa: E712
    assert out.loc[0, "reject_reason"] in ("low_diversity", "repetitive_2gram")


def test_pii_redact_hand_computed(ray_session):
    from rdf2smw_ray.pipelines.pii import pii_redact

    docs = _ds(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": [
                "mail a.b+c@sub.ex.org or x@y.io call 555-123-4567 ip 10.0.3.77 done",
                "no pii here 1234-5678 not-a-phone 1.2.3 not-an-ip",
            ],
        }
    )
    out = pii_redact(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_email"].tolist() == [2, 0]
    assert out["n_phone"].tolist() == [1, 0]
    assert out["n_ipv4"].tolist() == [1, 0]
    assert (
        out.loc[0, "redacted"]
        == "mail [EMAIL] or [EMAIL] call [PHONE] ip [IP] done"
    )
    assert out.loc[1, "redacted"] == docs.to_pandas()["text"][1]


def test_line_dedup_first_wins(ray_session):
    from rdf2smw_ray.pipelines.linededup import line_dedup_counts

    docs = _ds(
        {
            "doc_id": pa.array([5, 2, 9], pa.int64()),
            "text": [
                "A\nB\n\nC",      # doc 5: A,B,C (empty dropped)
                "B\nB\nX",        # doc 2: lowest doc wins B; dup B in-doc drops
                "X\nA\nZ",        # doc 9: X lost to doc 2, A lost to doc 5
            ],
        }
    )
    out = (
        line_dedup_counts(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 2 keeps B (first global), X; drops second B        -> 2/3
    # doc 5 keeps A, C; loses B to doc 2                      -> 2/3
    # doc 9 keeps Z only                                      -> 1/3
    assert out["doc_id"].tolist() == [2, 5, 9]
    assert out["n_lines"].tolist() == [3, 3, 3]
    assert out["n_kept"].tolist() == [2, 2, 1]
    assert out["n_dropped"].tolist() == [1, 1, 2]


def test_domain_stats_parses_and_dedups_paths(ray_session):
    from rdf2smw_ray.pipelines.weburl import domain_stats

    pages = _ds(
        {
            "url": [
                "https://a.org/x",
                "https://a.org/x?utm=1",   # same path, query stripped
                "https://a.org/y#frag",    # second path
                "http://b.net",            # empty path
            ],
            "warc_ts": pa.array([100, 300, 200, 50], pa.timestamp("us")),
        }
    )
    out = (
        domain_stats(pages).to_pandas().sort_values("domain").reset_index(drop=True)
    )
    assert out["domain"].tolist() == ["a.org", "b.net"]
    assert out["n_pages"].tolist() == [3, 1]
    assert out["n_paths"].tolist() == [2, 1]
    assert out["first_ts_us"].tolist() == [100, 50]
    assert out["last_ts_us"].tolist() == [300, 50]


def test_bm25_matches_naive_reference(ray_session):
    from rdf2smw_ray.pipelines.search import bm25_topk

    texts = [
        "data spark data table",
        "window spark window window scan",
        "table scan merge join",
        "data data data data",
        "spark",
    ]
    docs = _ds({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    terms = ["data", "spark", "window"]
    out = bm25_topk(docs, terms, k=3)

    # naive scalar BM25 (Lucene idf), k1=1.2 b=0.75
    toks = [t.split() for t in texts]
    N, avgdl = len(toks), sum(len(t) for t in toks) / len(toks)
    df = {w: sum(w in t for t in toks) for w in terms}
    exp = {}
    for i, t in enumerate(toks):
        s = 0.0
        for w in terms:
            c = t.count(w)
            if c and df[w]:
                idf = math.log((N - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
                s += idf * (c * 2.2) / (c + 1.2 * (1 - 0.75 + 0.75 * len(t) / avgdl))
        if s > 0:
            exp[i] = round(s, 6)
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert out["doc_id"].tolist() == [d for d, _ in top]
    assert out["score"].tolist() == [s for _, s in top]


def test_bm25_empty_and_no_hit(ray_session):
    from rdf2smw_ray.pipelines.search import bm25_topk

    docs = _ds({"doc_id": pa.array([0], pa.int64()), "text": ["nothing relevant"]})
    out = bm25_topk(docs, ["zzz"], k=5)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score"]


def test_funnel_steps_strict_ordering(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.windows import funnel_steps

    # user 1 completes view>click>purchase; user 2's click precedes its
    # view (no step 2); user 3 reaches click but its purchase came
    # before the click; user 4 never views.
    rows = [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "click"), (2, 2, "view"), (2, 3, "purchase"),
        (3, 1, "view"), (3, 2, "purchase"), (3, 3, "click"),
        (4, 1, "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([u * 10 + s for u, s, _ in rows], pa.int64()),
            "ts": pa.array(
                [1_600_000_000_000_000 + s * 1_000_000 for _, s, _ in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array([e for _, _, e in rows], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = funnel_steps(str(tmp_path))
    assert out["step"].tolist() == ["1_view", "2_click", "3_purchase"]
    assert out["n_users"].tolist() == [3, 2, 1]


def test_hopping_window_membership(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.windows import hopping_window_counts

    h = 3_600_000_000
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            # one event at 02:30, one at exactly 03:00
            "ts": pa.array([2 * h + h // 2, 3 * h], pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["a", "a"], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = hopping_window_counts(str(tmp_path))
    # event@02:30 -> windows [01:00,03:00) and [02:00,04:00)
    # event@03:00 -> windows [02:00,04:00) and [03:00,05:00)
    assert out["ws_us"].tolist() == [1 * h, 2 * h, 3 * h]
    assert out["n"].tolist() == [1, 2, 1]
    assert out["n"].sum() == 2 * 2  # each event in exactly size/hop windows


def test_line_dedup_rejects_monster_doc(ray_session):
    import pytest

    from rdf2smw_ray.pipelines.linededup import MAX_LINES_PER_DOC, line_dedup_counts

    docs = _ds(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": ["x\n" * MAX_LINES_PER_DOC],
        }
    )
    with pytest.raises(Exception, match="rank\\s+encoding|RayTaskError|lines"):
        line_dedup_counts(docs).to_pandas()


def test_repetition_stats_empty_doc(ray_session):
    out = (
        repetition_stats(
            _ds({"doc_id": pa.array([0, 1], pa.int64()), "text": ["", "a b"]})
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "top_token_frac"] == 0.0
    assert out.loc[1, "unique_token_ratio"] == 1.0
