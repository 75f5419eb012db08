"""File sources/sinks (S3-S11): binaryFile scan, CSV null policy, idempotent index."""

from auto_vectordb_spark.sources import files as S


def test_scan_and_count_files(spark, tmp_path):
    (tmp_path / "a.txt").write_text("aa")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_text("bb")
    (tmp_path / "sub" / "c.bin").write_bytes(b"\x00")
    df = S.scan_files(spark, str(tmp_path), glob="*.txt")
    assert df.count() == 2  # recursive + glob filtered
    assert S.count_files(spark, str(tmp_path)) == 3
    row = df.orderBy("path").first()
    assert bytes(row["content"]) == b"aa"


def test_read_csv_null_policy(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("id,name\n1,alpha\n2,\n")
    df = S.read_csv(spark, str(p))
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {"1": "alpha", "2": ""}  # NaN -> '' (reference F9)


def test_write_index_idempotent_by_id(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], ["id", "v"])
    out = str(tmp_path / "idx")
    S.write_index(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 2  # duplicate id collapsed (ES _id overwrite)
    S.write_index(df, out)  # re-index: overwrite, still 2
    assert spark.read.parquet(out).count() == 2


def test_compact_table_reduces_files(spark, tmp_path):
    from auto_vectordb_spark.sources.files import compact_table

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    df = spark.range(10_000).withColumnRenamed("id", "v")
    df.repartition(50).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 50
    n_out = compact_table(spark, src, out, target_mb=128)
    assert n_out == 1  # 50 tiny files -> one right-sized file
    assert spark.read.parquet(out).count() == 10_000


def test_read_csv_bom_korean_quotes(spark, tmp_path):
    """FIXTURES §5 CSV micro-fixture: utf-8-sig BOM (postgres.py:151), missing
    values -> '' (postgres.py:152-154), Korean text, embedded comma/quotes."""
    from auto_vectordb_spark.sources.files import read_csv

    p = tmp_path / "bom.csv"
    p.write_bytes(
        b"\xef\xbb\xbf"
        + 'name,val\n\xed\x95\x9c\xea\xb8\x80,"a,b"\n,2\n"q""q",3\n'.encode("latin-1")
    )
    df = read_csv(spark, str(p))
    assert df.columns == ["name", "val"]  # BOM stripped from the header
    rows = {r["name"]: r["val"] for r in df.collect()}
    assert rows["한글"] == "a,b"  # quoted comma preserved
    assert rows[""] == "2"  # null -> '' policy
    assert rows['q"q'] == "3"  # escaped quote


def test_jsonl_roundtrip_nulls_and_partitions(spark, tmp_path):
    """JSONL sink/source: nulls, newlines/quotes/unicode survive the
    round-trip; partitioned export restores the partition column."""
    from auto_vectordb_spark.sources.files import read_jsonl, write_jsonl

    schema = "doc_id bigint, lang string, text string"
    df = spark.createDataFrame(
        [
            (0, "en", 'line1\nline2 "quoted" \\slash'),
            (1, "ko", "한글 텍스트"),
            (2, "en", None),
            (3, None, ""),
        ],
        schema,
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(df, path, compression=None, partition_by=["lang"])
    back = read_jsonl(spark, path, schema=schema)
    got = {r["doc_id"]: (r["lang"], r["text"]) for r in back.collect()}
    assert got == {
        0: ("en", 'line1\nline2 "quoted" \\slash'),
        1: ("ko", "한글 텍스트"),
        2: ("en", None),
        3: (None, ""),
    }


def test_orc_roundtrip_preserves_schema_and_values(spark, sf_dir, tmp_path):
    from auto_vectordb_spark.sources.files import read_orc, write_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dest = str(tmp_path / "docs_orc")
    write_orc(docs, dest, partition_by=["lang"])
    back = read_orc(spark, dest)
    assert set(back.columns) == set(docs.columns)
    assert back.count() == docs.count()
    a = sorted(tuple(r) for r in docs.select("doc_id", "n_chars").collect())
    b = sorted(tuple(r) for r in back.select("doc_id", "n_chars").collect())
    assert a == b


def test_orc_scan_pushes_partition_filter(spark, sf_dir, tmp_path):
    from auto_vectordb_spark.sources.files import read_orc, write_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dest = str(tmp_path / "docs_orc_p")
    write_orc(docs, dest, partition_by=["lang"])
    plan = (
        read_orc(spark, dest)
        .filter("lang = 'en'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partition pruning: the lang predicate must land in PartitionFilters
    assert "PartitionFilters" in plan and "lang" in plan


def test_read_jsonl_permissive_captures_corrupt_rows(spark, tmp_path):
    """A bad line must fail the ROW (land in _corrupt_record), not the job."""
    from auto_vectordb_spark.sources.files import read_jsonl

    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "good row"}\n'
        '{"doc_id": 2, "text": "also good"}\n'
        "{this is not json at all\n"
    )
    df = read_jsonl(
        spark,
        str(src),
        schema="doc_id long, text string, _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 2 and {r["doc_id"] for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]
