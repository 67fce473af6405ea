"""Compaction sink tests: file-count planning, content preservation,
and the no-shuffle plan property of the coalesce path."""

import tempfile

import pytest

from hdfe_spark.sources.compaction import compact_files, list_data_files


@pytest.fixture()
def fragmented(spark, sf_dir, tmp_path):
    """documents fixture splattered into 32 small files."""
    out = str(tmp_path / "frag")
    spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32).write.parquet(out)
    return out


def test_compact_files_binpacks(spark, fragmented, tmp_path):
    files = list_data_files(spark, fragmented)
    assert len(files) == 32
    total = sum(sz for _, sz in files)
    out = str(tmp_path / "compact")
    stats = compact_files(spark, fragmented, out, target_bytes=total // 4 + 1)
    assert stats["n_files_in"] == 32
    assert stats["n_out_planned"] == 4
    assert stats["n_files_out"] == 4


def test_compact_preserves_content(spark, fragmented, tmp_path):
    out = str(tmp_path / "compact2")
    compact_files(spark, fragmented, out, target_bytes=1 << 30)  # -> 1 file
    got = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    want = sorted(
        r.doc_id
        for r in spark.read.parquet(fragmented).select("doc_id").collect()
    )
    assert got == want
    assert len(list_data_files(spark, out)) == 1
