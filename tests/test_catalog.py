"""Catalog shim: snapshot append/read, lineage, time travel, overwrite."""

from bloom_filter_spark.sources.catalog import ParquetCatalog


def test_append_lineage_and_time_travel(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "cat"))
    t = cat.table("events_agg")
    df1 = spark.range(10).withColumnRenamed("id", "v")
    df2 = spark.range(10, 25).withColumnRenamed("id", "v")
    s1 = t.append(df1)
    s2 = t.append(df2)
    assert t.read(spark).count() == 25
    assert t.read(spark, snapshot_id=s1).count() == 10  # time travel
    snaps = t.snapshots()
    assert [s["snapshot_id"] for s in snaps] == [s1, s2]
    assert snaps[1]["parent_id"] == s1 and snaps[0]["parent_id"] is None
    meta = t.snapshots_df(spark).collect()
    assert meta[0].added_rows == 10 and meta[1].added_rows == 15


def test_overwrite_supersedes(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "cat2"))
    t = cat.table("state")
    s1 = t.append(spark.range(5))
    t.overwrite(spark.range(100, 103))
    assert t.read(spark).count() == 3
    assert t.read(spark, snapshot_id=s1).count() == 5  # history retained
    assert cat.list_tables() == ["state"]
