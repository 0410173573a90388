"""Decontamination + Gopher-style repetition signals.

Repetition thresholds follow Rae et al. 2021 (Gopher), appendix A1.1;
decontamination follows the n-gram-overlap hygiene pass of GPT-3's
appendix C. Both are verified against hand-computed expectations.
"""

import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale import decontaminate, ngram_overlap, repetition_signals


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog near the river bank"),
            (1, "completely novel content with no overlap whatsoever in any window"),
            (2, "the quick brown fox appears here too but with different continuation"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(100, "watch the quick brown fox jumps over the fence")],
        "doc_id long, text string",
    )


def test_ngram_overlap_counts(spark, corpus, bench_set):
    # shared 4-grams with doc 0: "the quick brown fox",
    # "quick brown fox jumps", "brown fox jumps over",
    # "fox jumps over the"; doc 2 shares only the first; doc 1 none.
    out = {r.doc_id: r for r in ngram_overlap(corpus, bench_set, n=4).collect()}
    assert set(out) == {0, 2}
    assert out[0].matched_shingles == 4
    assert out[2].matched_shingles == 1
    # doc 0 has 13 tokens -> 10 distinct 4-grams
    assert out[0].n_shingles == 10
    assert out[0].overlap_frac == pytest.approx(0.4)


def test_decontaminate_drop_and_audit(spark, corpus, bench_set):
    clean = decontaminate(corpus, bench_set, n=4)
    assert [r.doc_id for r in clean.collect()] == [1]
    assert clean.columns == corpus.columns  # original schema preserved

    audit = decontaminate(corpus, bench_set, n=4, keep_contaminated=True)
    rows = {r.doc_id: r for r in audit.collect()}
    assert rows[1].contaminated is False and rows[1].matched_shingles == 0
    assert rows[0].contaminated is True and rows[0].overlap_frac > 0

    # higher threshold keeps the single-ngram doc
    loose = decontaminate(corpus, bench_set, n=4, min_matches=2)
    assert sorted(r.doc_id for r in loose.collect()) == [1, 2]


def test_decontaminate_shared_ngram_repeated_in_doc(spark, bench_set):
    # a corpus doc repeating one contaminated n-gram counts it once per
    # DISTINCT shingle (shingles() dedups), not once per occurrence
    corpus = spark.createDataFrame(
        [(7, "the quick brown fox stop the quick brown fox stop")],
        "doc_id long, text string",
    )
    out = ngram_overlap(corpus, bench_set, n=4).collect()
    assert len(out) == 1
    assert out[0].matched_shingles == 1


def test_repetition_signals_clean_doc(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta\nepsilon zeta eta theta")],
        "doc_id long, text string",
    )
    r = repetition_signals(df).collect()[0]
    assert r.dup_line_frac == 0.0
    assert r.dup_line_char_frac == 0.0
    assert r.dup_para_frac == 0.0
    assert r.top_2gram_char_frac > 0  # some 2-gram is "most frequent"
    assert r.dup_5gram_char_frac == 0.0


def test_repetition_signals_duplicate_lines(spark):
    text = "spam line\nspam line\nspam line\nunique content here"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = repetition_signals(df).collect()[0]
    # 4 lines, 2 distinct -> dup fraction (4-2)/4
    assert r.dup_line_frac == pytest.approx(0.5)
    # chars in duplicated lines: 3 * len("spam line") = 27 over total chars
    assert r.dup_line_char_frac == pytest.approx(27 / len(text))


def test_repetition_signals_duplicate_paragraphs(spark):
    text = "para one body\n\npara one body\n\nfresh paragraph"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = repetition_signals(df).collect()[0]
    assert r.dup_para_frac == pytest.approx(1 / 3)
    assert r.dup_para_char_frac == pytest.approx(2 * 13 / len(text))


def test_repetition_signals_top_ngram(spark):
    # "ab cd" appears 3 times as a 2-gram; text length 17
    text = "ab cd ab cd ab cd"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = repetition_signals(df).collect()[0]
    # 2-grams: [ab cd, cd ab, ab cd, cd ab, ab cd] -> top run "ab cd" x3
    assert r.top_2gram_char_frac == pytest.approx(3 * 5 / 17)
    # every 5-gram is unique (only one 5-gram exists)
    assert r.dup_5gram_char_frac == 0.0


def test_repetition_signals_dup_ngrams(spark):
    # the 5-gram "a b c d e" occurs twice (positions 0 and 5)
    text = "a b c d e a b c d e"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = repetition_signals(df).collect()[0]
    # 5-grams: positions 0..5 -> 6 grams; "a b c d e" twice (2*9 chars),
    # the other four are distinct
    assert r.dup_5gram_char_frac == pytest.approx(2 * 9 / 19)


def test_repetition_signals_empty_and_null_safe(spark):
    df = spark.createDataFrame([(0, ""), (1, "one")], "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    for c in ("dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
              "dup_5gram_char_frac", "dup_10gram_char_frac"):
        assert rows[0][c] == 0.0
    assert rows[1].dup_line_frac == 0.0


def test_decontaminate_plan_broadcasts_benchmark(spark, corpus, bench_set):
    plan = decontaminate(corpus, bench_set, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_c4_filters(spark):
    from trackintel_spark.scale import c4_filters

    docs = spark.createDataFrame(
        [
            (0, "This is a good sentence.\nAnother fine line here!\nShort.\nno terminal punct\nAnd a third proper sentence?"),
            (1, "Lorem ipsum dolor sit amet. This has placeholder text. More words here."),
            (2, "function f() { return 1; } This is code. More prose here. And more."),
            (3, "One good sentence only remains here."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_filters(docs).collect()}
    # doc 0: "Short." dropped (<3 words), "no terminal punct" dropped
    assert out[0].clean_text.split("\n") == [
        "This is a good sentence.",
        "Another fine line here!",
        "And a third proper sentence?",
    ]
    assert out[0].c4_keep and out[0].n_sentences == 3
    assert out[1].has_lorem and not out[1].c4_keep
    assert out[2].has_brace and not out[2].c4_keep
    assert not out[3].c4_keep  # one sentence < min_sentences
    kept = c4_filters(docs, drop=True).collect()
    assert [r.doc_id for r in kept] == [0]
    assert kept[0].text.startswith("This is a good sentence.")


def test_detect_language_wide(spark):
    from trackintel_spark.scale import detect_language

    samples = {
        "it": "il problema che non posso risolvere per sono una persona",
        "pt": "o sistema de dados que não funciona uma vez para com eles",
        "nl": "de computer is het beste een van niet dat zijn ook hier",
        "pl": "nie wiem czy to jest tak ale jak może być inaczej",
        "sv": "och jag tror att det som är inte så bra med detta",
        "tr": "bir sorun var bu sistemde ve bunun için değil gibi daha çok",
        "id": "sistem yang baru dan cepat di sini itu dengan untuk tidak adalah",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(samples.values())], "doc_id long, text string"
    )
    got = {r.doc_id: r.lang_pred for r in detect_language(df).collect()}
    for i, lang in enumerate(samples):
        assert got[i] == lang, (lang, got[i])


def test_decontaminate_map_side_matches_batch(spark):
    """Zero-shuffle variant flags EXACTLY what the batch explode+join
    path flags, including overlap fractions."""
    from trackintel_spark.scale import (
        collect_benchmark_shingles,
        decontaminate,
        decontaminate_map_side,
    )

    bench_text = " ".join(f"q{i}" for i in range(15))
    rows = [
        (1, bench_text + " trailing extra words here"),      # contaminated
        (2, " ".join(f"q{i}" for i in range(5)) + " clean"), # shares <13-gram only
        (3, " ".join(f"c{i}" for i in range(20))),           # clean
        (4, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, bench_text)], "bench_id long, text string")

    batch = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=13, keep_contaminated=True).collect()
    }
    sh = collect_benchmark_shingles(bench, n=13)
    mapside = {
        r["doc_id"]: r
        for r in decontaminate_map_side(docs, sh, n=13, keep_contaminated=True).collect()
    }
    assert set(batch) == set(mapside)
    for did in batch:
        assert batch[did]["contaminated"] == mapside[did]["contaminated"], did
        assert batch[did]["matched_shingles"] == mapside[did]["matched_shingles"], did
        assert abs(batch[did]["overlap_frac"] - mapside[did]["overlap_frac"]) < 1e-12, did
    assert mapside[1]["contaminated"] and not mapside[3]["contaminated"]


def test_compression_ratio_separates_repetitive_text(spark):
    from trackintel_spark.scale import compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam " * 400),
            (2, "The committee reviewed seventeen distinct proposals during its "
                "quarterly session, weighing infrastructure costs against the "
                "projected enrollment growth across rural districts. Several "
                "members questioned whether the revised funding formula would "
                "disadvantage smaller municipalities with aging facilities."),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(docs).collect()}
    assert got[1] < 0.05          # pure repetition compresses away
    assert 0.2 < got[2] < 0.9     # prose doesn't
    assert got[3] is None and got[4] is None


def test_jsonl_roundtrip_and_corrupt_records(spark, tmp_path):
    import json
    import os

    from trackintel_spark.sources import read_documents_jsonl, write_documents_jsonl

    src = os.path.join(str(tmp_path), "in.jsonl")
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "meta": {"k": "v"}},
        {"doc_id": 2, "text": "bonjour", "unknown_key": 42},
    ]
    with open(src, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("{this is not json\n")

    df = read_documents_jsonl(spark, src)
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == {1, 2}
    assert got[1]["meta"] == {"k": "v"} and got[1]["lang"] == "en"
    assert got[2]["lang"] is None  # missing -> NULL; unknown key ignored
    # Spark disallows querying ONLY the corrupt column from a raw scan;
    # persist first (documented in read_documents_jsonl)
    audit = read_documents_jsonl(spark, src, keep_corrupt=True).persist()
    assert audit.filter("_corrupt_record is not null").count() == 1
    audit.unpersist()

    out_dir = os.path.join(str(tmp_path), "out")
    write_documents_jsonl(df, out_dir, num_shards=2)  # default gzip shards
    assert any(f.endswith(".gz") for f in os.listdir(out_dir))
    back = read_documents_jsonl(spark, out_dir)
    assert back.count() == 2
    assert {r["doc_id"] for r in back.collect()} == {1, 2}


def test_gopher_quality_filter_rules(spark):
    """Hand-computed Gopher rule cases (Rae et al. 2021 A1.1): each
    rule individually kills exactly one crafted document while the
    healthy document passes every rule at the published defaults."""
    from trackintel_spark.scale import gopher_quality_filter

    healthy = " ".join(
        ["the quick brown fox jumps over and rests with care that day to be of note"] * 5
    )
    docs = spark.createDataFrame(
        [
            (0, healthy),                                   # passes all
            (1, "the and of " * 5),                         # too few words (15 < 50)
            (2, " ".join(["ab"] * 60)),                     # mean word len 2 < 3
            (3, healthy + " " + "#" * 1 + " #### # # # # # # #"),  # symbols
            (4, "\n".join(["- " + healthy[:40]] * 10)),     # 100% bullet lines
            (5, " ".join(["12345"] * 60)),                  # no alphabetic words
            (6, " ".join(["zzz"] * 60)),                    # zero stop hits
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_filter(docs).collect()}
    assert out[0].gopher_keep is True
    assert out[0].n_words == 80 and out[0].stop_hits >= 2
    assert out[1].gopher_keep is False and out[1].n_words == 15
    assert out[2].gopher_keep is False and abs(out[2].mean_word_len - 2.0) < 1e-9
    assert out[3].gopher_keep is False and out[3].symbol_word_ratio > 0.1
    assert out[4].gopher_keep is False and out[4].bullet_line_frac == 1.0
    assert out[5].gopher_keep is False and out[5].alpha_word_frac == 0.0
    assert out[6].gopher_keep is False and out[6].stop_hits == 0

    kept = gopher_quality_filter(docs, drop=True).collect()
    assert [r.doc_id for r in kept] == [0]
    assert "gopher_keep" not in kept[0].asDict()

    # empty doc: no NULL leakage, keep=False
    empty = spark.createDataFrame([(9, "")], "doc_id long, text string")
    r = gopher_quality_filter(empty).collect()[0]
    assert r.gopher_keep is False
