"""WebDataset-style TAR shard reader (sources/tar.py)."""

import io
import os
import tarfile

import numpy as np
from pyspark.sql import functions as F

from trackintel_spark.sources import read_tar_members, read_webdataset


def _tar_bytes(members, gz=False):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if gz else "w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def _write_shards(tmp_path):
    from trackintel_spark.scale.multimodal import encode_gif

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :, 2] = 250
    s0 = _tar_bytes(
        [
            ("000000.gif", encode_gif(img)),
            ("000000.txt", b"a blue square"),
            ("000000.json", b'{"w": 4}'),
            ("000001.txt", b"text-only sample"),
            ("dir/000002.seg.txt", b"nested, multi-dot ext"),
            ("dir/000002.txt", b"same key as the seg file"),
        ]
    )
    s1 = _tar_bytes([("000100.txt", b"second shard")], gz=True)
    p0 = os.path.join(str(tmp_path), "shard-000.tar")
    p1 = os.path.join(str(tmp_path), "shard-001.tar.gz")
    open(p0, "wb").write(s0)
    open(p1, "wb").write(s1)
    return img


def test_read_tar_members(spark, tmp_path):
    _write_shards(tmp_path)
    got = read_tar_members(spark, str(tmp_path)).collect()
    assert len(got) == 7
    by = {(r.key.split("/")[-1], r.ext): r for r in got}
    assert by[("000000", "txt")].payload == bytearray(b"a blue square")
    assert by[("000002", "seg.txt")].key == "dir/000002"  # first-dot split
    # extension prefilter
    only_txt = read_tar_members(spark, str(tmp_path), extensions=["txt"]).collect()
    assert {r.ext for r in only_txt} == {"txt"} and len(only_txt) == 4


def test_read_webdataset_groups_samples(spark, tmp_path):
    img = _write_shards(tmp_path)
    samples = {r.key: r for r in read_webdataset(spark, str(tmp_path)).collect()}
    assert len(samples) == 4
    s = samples["000000"]
    assert s.n_parts == 3 and set(s.parts.keys()) == {"gif", "txt", "json"}
    # the grouped payload feeds the multimodal kernels directly
    from trackintel_spark.scale.multimodal import decode_gif

    assert (decode_gif(bytes(s.parts["gif"])) == img).all()
    assert samples["dir/000002"].n_parts == 2


def test_webdataset_duplicate_members_last_wins(spark, tmp_path):
    # Real corpora contain duplicate tar entries (re-appended samples);
    # tar extraction semantics keep the LAST one. Must not throw under
    # spark.sql.mapKeyDedupPolicy=EXCEPTION.
    data = _tar_bytes(
        [
            ("d.txt", b"first version"),
            ("d.json", b"{}"),
            ("d.txt", b"second version wins"),
        ]
    )
    open(os.path.join(str(tmp_path), "dup.tar"), "wb").write(data)
    rows = read_webdataset(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert bytes(r.parts["txt"]) == b"second version wins"
    # n_parts counts the deduped winners — the same row set parts and
    # total_bytes describe — not raw tar entries.
    assert r.n_parts == 2
    assert r.n_parts == len(r.parts)
    assert r.total_bytes == len(b"second version wins") + len(b"{}")


def test_webdataset_to_image_features(spark, tmp_path):
    _write_shards(tmp_path)
    from trackintel_spark.scale.multimodal import image_features

    wds = read_webdataset(spark, str(tmp_path)).filter(F.col("parts")["gif"].isNotNull())
    df = wds.select(
        F.monotonically_increasing_id().alias("doc_id"), F.col("parts")["gif"].alias("payload")
    )
    feats = image_features(df).collect()
    assert len(feats) == 1 and feats[0].mean_b == 250.0


def test_corrupt_shard_keeps_good_members_and_shards(spark, tmp_path):
    """One corrupt shard in a directory must not fail the task: members
    parsed before the corruption survive, other shards are untouched."""
    good = _tar_bytes([("a/000001.txt", b"alpha"), ("a/000002.txt", b"beta")])
    bad = bytearray(_tar_bytes([("b/000001.txt", b"gamma"), ("b/000002.txt", b"delta")]))
    bad[600:1000] = b"\xff" * 400  # clobber the second member's header region
    open(os.path.join(str(tmp_path), "good.tar"), "wb").write(good)
    open(os.path.join(str(tmp_path), "bad.tar"), "wb").write(bytes(bad))
    open(os.path.join(str(tmp_path), "junk.tar"), "wb").write(b"not a tar at all")
    rows = read_tar_members(spark, str(tmp_path)).collect()
    keys = sorted(r.key for r in rows)
    assert "a/000001" in keys and "a/000002" in keys  # good shard complete
    assert len(keys) >= 2  # bad/junk shards degrade, never raise
