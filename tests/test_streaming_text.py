"""The LLM text-scoring path is streaming-clean: quality, language id,
token counting, DSIR weighting and decontamination are stateless map
transformations (pure expressions / Arrow batches) plus stream-static
broadcast joins, so the SAME functions run unmodified under Structured
Streaming — the ingest-time filtering story for a live crawl."""

import pytest

import os
import time

from pyspark.sql import functions as F


def _write_chunks(spark, tmp_path, chunks):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(chunks):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        d = os.path.join(src, f"f{i}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        now = time.time() + i
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    return src


def _run(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_text_scoring_runs_under_streaming(spark, tmp_path):
    from trackintel_spark.scale import dsir_log_weights, fit_ngram_model
    from trackintel_spark.scale.text import detect_language, quality_score, token_count

    chunks = [
        [(1, "the quick brown fox jumps over the lazy dog today")],
        [(2, "el rapido zorro marron salta sobre el perro de la casa"),
         (3, "short")],
    ]
    src = _write_chunks(spark, tmp_path, chunks)

    # model fitted on a BATCH target (the static side), applied in-stream
    target = spark.createDataFrame(
        [("the quick brown fox likes the dog",)], "text string"
    )
    lp = fit_ngram_model(target, buckets=1024)
    # the raw model must be a PRE-FITTED static side too (fitting scans
    # the corpus — on a stream, fit on a batch sample instead)
    lp_raw = fit_ngram_model(
        spark.createDataFrame(sum(chunks, []), "doc_id long, text string"), buckets=1024
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    scored = dsir_log_weights(
        quality_score(detect_language(stream)).withColumn(
            "n_tok", token_count(F.col("text"))
        ),
        lp,
        raw_logprobs=lp_raw,
    )
    _run(scored, "t_text_stream")
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM t_text_stream").collect()}
    assert set(rows) == {1, 2, 3}

    # values identical to the batch path on the same data
    batch = dsir_log_weights(
        quality_score(
            detect_language(spark.createDataFrame(sum(chunks, []), "doc_id long, text string"))
        ).withColumn("n_tok", token_count(F.col("text"))),
        lp,
        raw_logprobs=lp_raw,
    )
    expect = {r["doc_id"]: r for r in batch.collect()}
    for did in rows:
        for c in ("quality", "lang_pred", "n_tok", "log_weight"):
            assert rows[did][c] == expect[did][c], (did, c)
    assert rows[1]["log_weight"] > rows[2]["log_weight"]  # on-target doc wins


def test_decontaminate_map_side_runs_under_streaming(spark, tmp_path):
    """The batch decontaminate is a streaming AGGREGATION (append mode
    rejects it); the map-side variant broadcasts the benchmark shingle
    set and filters the stream in flight with zero shuffle."""
    from trackintel_spark.scale import collect_benchmark_shingles, decontaminate_map_side

    leak = "the exact benchmark question text appears verbatim inside this training document here word for word today"
    chunks = [
        [(1, leak)],
        [(2, "completely original content about distributed query engines and shuffles today")],
    ]
    src = _write_chunks(spark, tmp_path, chunks)
    bench = spark.createDataFrame([(100, leak)], "bench_id long, text string")
    shingle_list = collect_benchmark_shingles(bench, n=13)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    clean = decontaminate_map_side(stream, shingle_list, n=13)
    _run(clean, "t_decon_stream")
    kept = [r["doc_id"] for r in spark.sql("SELECT * FROM t_decon_stream").collect()]
    assert kept == [2]


@pytest.mark.slow
def test_classifier_and_incremental_dedup_run_under_streaming(spark, tmp_path):
    """Ingest-time composition: a pre-trained quality classifier scores
    a document stream (model.transform is map-side, so it lifts to
    streaming unchanged), and arrivals are checked against a STATIC
    accepted-corpus digest index (stream-static left join). Both
    verdicts must equal the batch run on the same rows."""
    from trackintel_spark.scale import (
        build_exact_index,
        classifier_score,
        dedup_against_index,
        train_quality_classifier,
    )

    rows = [
        (1, "the tired engineer waited near the station before breakfast"),
        (2, "a dog ran across the quiet street during the storm"),
        (3, "station the near breakfast waited engineer tired the before"),
        (4, "the old train stopped at the station in the early morning"),
    ]
    chunks = [rows[:2], rows[2:]]
    src = _write_chunks(spark, tmp_path, chunks)

    batch = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_quality_classifier(batch.filter("doc_id != 3"), num_features=1 << 14)
    # history already contains doc 4's text verbatim
    index = build_exact_index(
        spark.createDataFrame([(90, rows[3][1])], "doc_id long, text string")
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = dedup_against_index(classifier_score(stream, model), index)
    _run(out.select("doc_id", "quality_prob", "dup_of", "is_new"), "cls_stream")

    got = {r.doc_id: r for r in spark.sql("SELECT * FROM cls_stream").collect()}
    want = {
        r.doc_id: r
        for r in dedup_against_index(classifier_score(batch, model), index).collect()
    }
    assert set(got) == set(want) == {1, 2, 3, 4}
    for k in got:
        assert got[k].quality_prob == want[k].quality_prob
        assert got[k].dup_of == want[k].dup_of and got[k].is_new == want[k].is_new
    assert got[4].dup_of == 90 and not got[4].is_new  # history dup caught in-stream
    assert got[1].is_new and got[2].is_new


def test_frozen_linear_score_and_lottery_run_under_streaming(spark, tmp_path):
    """The frozen-checkpoint scoring path (plan-literal weights, md5
    lottery) is pure map work, so it lifts to a document stream
    unchanged — stream rows must equal the batch run bit-for-bit."""
    from trackintel_spark.scale import linear_quality_score, pareto_keep, portable_uniform
    from trackintel_spark.scale.frozen_quality_model import (
        FROZEN_QUALITY_INTERCEPT,
        FROZEN_QUALITY_WEIGHTS,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "key agg row scan slow fast table value part hash merge batch line"),
        (2, "table table table table table table table table"),
        (3, "batch window spark order data column agg join small line customer"),
        (4, "x"),
    ]
    src = _write_chunks(spark, tmp_path, [rows[:2], rows[2:]])

    def scored(df):
        s = linear_quality_score(df, FROZEN_QUALITY_WEIGHTS, FROZEN_QUALITY_INTERCEPT)
        return s.select(
            "doc_id",
            "quality_prob",
            pareto_keep(
                F.col("quality_prob"), F.col("doc_id"),
                u=portable_uniform(F.col("doc_id"), seed=7),
            ).alias("keep"),
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    _run(scored(stream), "frozen_stream")
    got = {r.doc_id: (r.quality_prob, r.keep) for r in spark.sql("SELECT * FROM frozen_stream").collect()}
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    want = {r.doc_id: (r.quality_prob, r.keep) for r in scored(batch).collect()}
    assert got == want and set(got) == {1, 2, 3, 4}
