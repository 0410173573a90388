"""Randomized batch property tests for the LLM-pipeline operators:
hundreds of random cases verified row-wise against plain-Python
references in ONE Spark job per parameter set (the per-example-session
cost of classic hypothesis doesn't fit Spark; the batch shape keeps
the coverage)."""

import numpy as np
import pytest


def _py_chunks(text, max_tokens, overlap):
    toks = [t for t in text.split() if t]
    stride = max_tokens - overlap
    if not toks:
        return [""]
    out, s = [], 0
    while True:
        out.append(" ".join(toks[s : s + max_tokens]))
        if s + max_tokens >= len(toks):
            break
        s += stride
    return out


@pytest.mark.parametrize("max_tokens,overlap", [(5, 0), (8, 3), (16, 15), (1, 0)])
def test_chunk_documents_random_corpus_matches_reference(spark, max_tokens, overlap):
    from trackintel_spark.scale import chunk_documents

    rng = np.random.RandomState(max_tokens * 100 + overlap)
    rows = []
    for i in range(200):
        n = int(rng.randint(0, 40))
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(docs, max_tokens=max_tokens, overlap=overlap).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["text"], r["n_chunks"]))
    for did, text in rows:
        expect = _py_chunks(text, max_tokens, overlap)
        chunks = sorted(got[did])
        assert [c[1] for c in chunks] == expect, (did, max_tokens, overlap)
        assert all(c[2] == len(expect) for c in chunks), did
        assert [c[0] for c in chunks] == list(range(len(expect)))


def _py_line_dedup(rows, min_count, min_chars, keep):
    from collections import defaultdict

    occ = defaultdict(list)  # trimmed line -> [(did, pos)]
    for did, text in rows:
        for pos, line in enumerate(text.split("\n")):
            t = line.strip()
            if len(t) >= min_chars:
                occ[t].append((did, pos))
    dup_lines = {t for t, v in occ.items() if len({d for d, _ in v}) >= min_count}
    firsts = {t: min(v) for t, v in occ.items()}
    out = {}
    for did, text in rows:
        kept = []
        removed = 0
        for pos, line in enumerate(text.split("\n")):
            t = line.strip()
            drop = (
                len(t) >= min_chars
                and t in dup_lines
                and (keep == "none" or firsts[t] != (did, pos))
            )
            if drop:
                removed += 1
            else:
                kept.append(line)
        out[did] = ("\n".join(kept), removed)
    return out


@pytest.mark.parametrize("keep,min_count", [("first", 2), ("none", 3)])
def test_line_dedup_random_corpus_matches_reference(spark, keep, min_count):
    from trackintel_spark.scale import line_dedup

    rng = np.random.RandomState(min_count * 7 + (keep == "none"))
    shared_pool = [f"shared boilerplate line number {i} padded out" for i in range(6)]
    rows = []
    for i in range(120):
        lines = []
        for _ in range(int(rng.randint(1, 7))):
            if rng.random_sample() < 0.4:
                lines.append(shared_pool[int(rng.randint(len(shared_pool)))])
            elif rng.random_sample() < 0.2:
                lines.append("tiny")  # under min_chars, always exempt
            else:
                lines.append(f"unique line {i}-{rng.randint(10**6)} with payload")
        rows.append((i, "\n".join(lines)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    expect = _py_line_dedup(rows, min_count, 10, keep)
    got = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in line_dedup(docs, min_count=min_count, min_chars=10, keep=keep).collect()
    }
    assert got == expect
