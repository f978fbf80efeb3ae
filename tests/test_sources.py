"""Source/sink surface tests (SURVEY §2.1 S2/S8): explicit-schema
round-trips, corrupt-record accounting, partitioned writes."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.plans import QUERIES
from rpa_etl_investing_spark.sources import (
    read_csv,
    scratch_dir,
    split_rejects,
    write_partitioned_parquet,
)


def test_csv_roundtrip_preserves_rows(spark, sf_dir):
    got = QUERIES["source_csv_roundtrip"].fn(spark, sf_dir)
    want = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_json_corrupt_rows_are_counted_not_dropped(spark, sf_dir):
    row = QUERIES["source_json_corrupt_metrics"].fn(spark, sf_dir).collect()[0]
    n_nation = tbl(spark, sf_dir, "nation").count()
    n_corrupt = (
        tbl(spark, sf_dir, "nation").filter(F.col("n_nationkey") % 5 == 0).count()
    )
    assert row.n_good == n_nation
    assert row.n_rejected == n_corrupt


def test_csv_malformed_cell_lands_in_corrupt_record(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\nnot_a_number,y\n2,z\n")
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    good, bad = split_rejects(read_csv(spark, p, schema))
    assert sorted(r.a for r in good.collect()) == [1, 2]
    assert bad.count() == 1


def test_partitioned_write_layout(spark, sf_dir):
    import os

    path = scratch_dir("test", "nation_by_region")
    write_partitioned_parquet(
        tbl(spark, sf_dir, "nation"), path, ["n_regionkey"]
    )
    dirs = {d for d in os.listdir(path) if d.startswith("n_regionkey=")}
    n_regions = tbl(spark, sf_dir, "nation").select("n_regionkey").distinct().count()
    assert len(dirs) == n_regions
    back = spark.read.parquet(path)
    assert back.count() == tbl(spark, sf_dir, "nation").count()


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    import os

    from rpa_etl_investing_spark.sources import compact_parquet

    path = str(tmp_path / "frag")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
    # fragmented layout: partitioned + many files per partition, like a
    # micro-batch append history
    li.repartition(6).write.partitionBy("l_returnflag").parquet(path)
    before = spark.read.parquet(path)
    n_rows = before.count()
    want_sum = before.agg(F.sum(F.col("l_orderkey"))).collect()[0][0]

    def count_files():
        return sum(
            1
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

    files_before = count_files()
    n_parts = compact_parquet(spark, path, target_files_per_partition=1)
    files_after = count_files()
    assert n_parts == 3  # one per l_returnflag value
    assert files_after == 3 < files_before
    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert after.agg(F.sum(F.col("l_orderkey"))).collect()[0][0] == want_sum
    assert set(after.columns) == {"l_orderkey", "l_returnflag", "l_quantity"}


def test_compaction_reduces_file_count_preserving_rows(spark, sf_dir):
    """source_compaction: the fragmented sink really has 64 part files,
    the compacted one at most 4, and no row is lost or altered."""
    import glob
    import os

    from rpa_etl_investing_spark.plans import QUERIES
    from rpa_etl_investing_spark.plans.source_queries import _sf_tag
    from rpa_etl_investing_spark.sources import scratch_dir

    QUERIES["source_compaction"].fn(spark, sf_dir).collect()
    tag = _sf_tag(sf_dir)
    frag = glob.glob(os.path.join(scratch_dir(tag, "orders_fragmented"), "part-*"))
    comp = glob.glob(os.path.join(scratch_dir(tag, "orders_compacted"), "part-*"))
    assert len(frag) == 64, len(frag)
    assert 1 <= len(comp) <= 4, len(comp)
    a = spark.read.parquet(os.path.dirname(frag[0]))
    b = spark.read.parquet(os.path.dirname(comp[0]))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dynamic_vs_static_partition_overwrite(spark, tmp_path):
    """The contrast that makes partitionOverwriteMode=dynamic the
    incremental-load primitive: overwriting with a batch that touches
    only partition k='a' must preserve k='b' under dynamic mode and
    truncate it under static mode."""
    base = str(tmp_path / "dyn")
    full = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], ["v", "k"]
    )
    patch = spark.createDataFrame([(9, "a")], ["v", "k"])
    full.write.partitionBy("k").mode("overwrite").parquet(base)
    # per-write option (not session conf) — the mode is scoped to the
    # one writer, so a concurrent overwrite on the same session can't
    # inherit it
    patch.write.option("partitionOverwriteMode", "dynamic").partitionBy(
        "k"
    ).mode("overwrite").parquet(base)
    got = {(r["v"], r["k"]) for r in spark.read.parquet(base).collect()}
    assert got == {(9, "a"), (3, "b"), (4, "b")}

    patch.write.option("partitionOverwriteMode", "static").partitionBy(
        "k"
    ).mode("overwrite").parquet(base)
    got = {(r["v"], r["k"]) for r in spark.read.parquet(base).collect()}
    assert got == {(9, "a")}


def test_zorder_files_tight_in_both_dimensions(spark, sf_dir, tmp_path):
    """The point of z-ordering: after repartitionByRange on the Morton
    key, EVERY file's min/max footprint is a narrow slice of BOTH
    dimensions, so parquet footer pruning works for filters on either
    column. A linear sort on l_partkey alone leaves l_suppkey spans at
    ~the full domain per file. Quantified: total (normalized) suppkey
    span across z-ordered files must be well under half the linear
    layout's."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from rpa_etl_investing_spark.sources.zorder import with_zvalue

    li = tbl(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    n_files = 16

    zdir = tmp_path / "zorder"
    with_zvalue(li, "l_partkey", "l_suppkey", bits=4).repartitionByRange(
        n_files, "zval"
    ).write.mode("overwrite").parquet(str(zdir))

    ldir = tmp_path / "linear"
    li.repartitionByRange(n_files, "l_partkey").write.mode("overwrite").parquet(
        str(ldir)
    )

    def span_sum(d, col):
        total = 0.0
        for f in Path(d).glob("*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            total += hi - lo
        return total

    supp_domain = li.agg(
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("d")
    ).collect()[0]["d"]
    z_supp = span_sum(zdir, "l_suppkey") / supp_domain
    lin_supp = span_sum(ldir, "l_suppkey") / supp_domain
    # linear-by-partkey leaves each file covering ~the whole suppkey
    # domain (sum ≈ n_files); z-order must cut that at least in half
    assert lin_supp > n_files * 0.8
    assert z_supp < lin_supp / 2
