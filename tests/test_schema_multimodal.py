"""Chunk schema derivation, catalog DDL, multimodal plumbing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark import catalog as CAT
from auto_vectordb_spark.operators import multimodal as MM
from auto_vectordb_spark.schema import CHUNK_SCHEMA, derive_chunks


def test_derive_chunks_schema_and_hashes(spark):
    docs = spark.createDataFrame(
        [(7, "page text", "uploaded/a/b/file.pdf")], ["doc_id", "text", "source"]
    )
    out = derive_chunks(docs, timestamp="2024-06-01 00:00:00")
    assert [f.name for f in out.schema.fields] == [f.name for f in CHUNK_SCHEMA.fields]
    r = out.first()
    assert r["hashed_page_content"] == hashlib.md5(b"page text").hexdigest()
    assert r["filename"] == "file.pdf"
    assert (r["lv1_cat"], r["lv2_cat"], r["lv3_cat"], r["lv4_cat"]) == ("a", "b", "", "")
    assert r["page"] == "0"  # stringified int, reference fidelity
    # deterministic id: same input → same id
    r2 = derive_chunks(docs, timestamp="2024-06-01 00:00:00").first()
    assert r["id"] == r2["id"]


def test_derive_chunks_uuid_mode(spark):
    docs = spark.createDataFrame([(1, "t", "f.pdf")], ["doc_id", "text", "source"])
    a = derive_chunks(docs, deterministic_ids=False).first()["id"]
    b = derive_chunks(docs, deterministic_ids=False).first()["id"]
    assert a != b  # uuid4 semantics (reference parsing.py:119)
    assert len(a) == 36


def test_catalog_create_list_drop(spark):
    df = spark.range(3).withColumnRenamed("id", "x")
    CAT.drop_table(spark, "t_cat_test")
    CAT.create_table(spark, "t_cat_test", df)
    assert CAT.table_exists(spark, "t_cat_test")
    assert "t_cat_test" in CAT.list_tables(spark)
    assert spark.table("t_cat_test").count() == 3
    CAT.drop_table(spark, "t_cat_test")
    assert not CAT.table_exists(spark, "t_cat_test")


def test_catalog_rejects_bad_identifiers(spark):
    with pytest.raises(ValueError):
        CAT.drop_table(spark, "t; DROP TABLE x")  # reference defect §2.11 not inherited


def test_multimodal_feature_extraction(spark):
    media = spark.createDataFrame(
        [("m1", "image", bytearray(b"fakejpg")), ("m2", "audio", bytearray(b"fakewav"))],
        ["media_id", "modality", "content"],
    )
    rows = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert rows["m1"]["content_sha"] == hashlib.sha256(b"fakejpg").hexdigest()
    assert rows["m1"]["n_bytes"] == 7
    assert rows["m1"]["width"] is not None and rows["m1"]["duration_s"] is None
    assert rows["m2"]["duration_s"] is not None and rows["m2"]["width"] is None


def test_multimodal_unknown_modality_raises():
    with pytest.raises(NotImplementedError):
        MM._fake_decode("hologram", b"x")


def test_decoder_registry_override(spark):
    MM.DecoderRegistry.register("image", lambda content: {"width": 1, "height": 2})
    try:
        media = spark.createDataFrame(
            [("m1", "image", bytearray(b"z"))], ["media_id", "modality", "content"]
        )
        r = MM.extract_features(media).first()
        assert (r["width"], r["height"]) == (1, 2)
    finally:
        MM.DecoderRegistry._decoders.pop("image", None)


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [("v1", "video", bytearray(b"vid")), ("i1", "image", bytearray(b"img"))],
        ["media_id", "modality", "content"],
    )
    rows = MM.frame_sample_plan(media, every_n=24).collect()
    assert all(r["media_id"] == "v1" for r in rows)  # images don't expand
    assert len(rows) > 0
    assert len({r["frame_sha"] for r in rows}) == len(rows)  # per-frame content


def test_write_index_idempotent(spark, tmp_path):
    from auto_vectordb_spark.sources.files import write_index

    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], ["id", "v"])
    out = str(tmp_path / "idx")
    write_index(df, out, id_col="id")
    assert spark.read.parquet(out).count() == 2  # ES _id overwrite semantics


def test_resize_images_geometry(spark):
    from auto_vectordb_spark.operators.multimodal import (
        DecoderRegistry,
        resize_images,
    )

    DecoderRegistry.register("image", lambda b: {"width": 640, "height": 360})
    try:
        media = spark.createDataFrame(
            [("m1", "image", bytearray(b"px")), ("m2", "video", bytearray(b"vid"))],
            "media_id string, modality string, content binary",
        )
        rows = resize_images(media, max_side=224).collect()
        assert len(rows) == 1  # non-images dropped
        r = rows[0]
        assert (r["out_width"], r["out_height"]) == (224, 126)
        assert bytes(r["content"]) == b"px"
    finally:
        DecoderRegistry._decoders.pop("image", None)


def test_audio_window_boundaries(spark):
    from auto_vectordb_spark.operators.multimodal import (
        DecoderRegistry,
        audio_window_plan,
    )

    # 12.3 s clip, 10 s windows, 5 s stride -> [0,100) [50,123) [100,123)
    DecoderRegistry.register("audio", lambda b: {"duration_s": 12.3})
    try:
        media = spark.createDataFrame(
            [("a1", "audio", bytearray(b"pcm")), ("m2", "image", bytearray(b"px"))],
            "media_id string, modality string, content binary",
        )
        rows = sorted(
            audio_window_plan(media, window_ds=100, stride_ds=50).collect(),
            key=lambda r: r["window_idx"],
        )
        assert [(r["start_ds"], r["end_ds"]) for r in rows] == [
            (0, 100),
            (50, 123),
            (100, 123),
        ]
        assert all(r["media_id"] == "a1" for r in rows)  # non-audio dropped
        assert len({r["window_sha"] for r in rows}) == 3  # offset-salted hashes
    finally:
        DecoderRegistry._decoders.pop("audio", None)
