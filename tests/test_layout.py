"""Physical-layout assertions: bucketed joins drop the exchange; salted
joins match the plain join exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from research_data_pipeline_spark.io.layout import n_exchanges, write_bucketed
from research_data_pipeline_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_exchange_free(warehouse, sf_dir):
    spark = warehouse
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
        ["o_orderkey"], n_buckets=8,
    )
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").count()
    plain = o.join(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).groupBy("o_orderstatus").count()
    # disable broadcast so both plans take the sort-merge path, making the
    # bucketing effect visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert n_exchanges(joined) < n_exchanges(plain)
        got = {r.o_orderstatus: r["count"] for r in joined.collect()}
        exp = {r.o_orderstatus: r["count"] for r in plain.collect()}
        assert got == exp
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").withColumnRenamed(
        "n_nationkey", "key"
    )
    big = o.withColumn("key", (F.col("o_custkey") % 25).cast("int"))
    plain = big.join(n, "key").groupBy("n_name").count()
    salted = salted_join(big, n, "key", n_salts=4).groupBy("n_name").count()
    got = {r.n_name: r["count"] for r in salted.collect()}
    exp = {r.n_name: r["count"] for r in plain.collect()}
    assert got == exp


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from research_data_pipeline_spark.io.layout import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(32).write.parquet(path)  # 32 tiny files
    import glob

    assert len(glob.glob(f"{path}/*.parquet")) == 32
    before = spark.read.parquet(path)
    rows, total = before.count(), before.agg(F.sum("v")).first()[0]

    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == 1
    after = spark.read.parquet(path)
    assert after.count() == rows
    assert after.agg(F.sum("v")).first()[0] == total


def test_compact_parquet_sorted_stats_become_selective(spark, tmp_path):
    from research_data_pipeline_spark.io.layout import compact_parquet

    path = str(tmp_path / "sorted")
    spark.range(0, 50_000).withColumn(
        "k", (F.col("id") * 7919) % 1000
    ).repartition(16).write.parquet(path)
    compact_parquet(spark, path, target_file_bytes=64 * 1024,
                    sort_within_by=["k"])
    # within every output file, k must be non-decreasing → row-group
    # min/max stats are disjoint and selective
    import pyarrow.parquet as pq
    import glob

    for f in glob.glob(f"{path}/*.parquet"):
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        assert ks == sorted(ks), f


def test_compact_parquet_orphan_tmp_is_an_error_not_a_noop(spark, tmp_path):
    """A crash between the old delete-then-rename steps left data only in
    __compact_tmp; rerunning must fail loudly, not silently return 0."""
    from research_data_pipeline_spark.io.layout import compact_parquet

    path = str(tmp_path / "crashed")
    spark.range(0, 100).write.parquet(path + "__compact_tmp")
    with pytest.raises(IOError, match="crashed mid-swap"):
        compact_parquet(spark, path)


def test_compact_parquet_swap_never_orphans_live_data(spark, tmp_path):
    """After a successful compact there is exactly one directory (the
    table path) and no parked/tmp siblings."""
    import glob
    from research_data_pipeline_spark.io.layout import compact_parquet

    path = str(tmp_path / "swap")
    spark.range(0, 1000).repartition(8).write.parquet(path)
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert not glob.glob(path + "__compact_*")
    assert spark.read.parquet(path).count() == 1000


def test_bucketed_authorship_makes_author_aggs_exchange_free(warehouse, sf_dir):
    """The star schema's hottest repeated shape — per-author aggregation
    over the fact-scale authorship table (dwh1-dwh3's base) — loses its
    Exchange entirely when authorship is written bucketed on author_id,
    and the measured shuffle drops to zero bytes."""
    from research_data_pipeline_spark.io.layout import shuffle_metrics
    from research_data_pipeline_spark.queries.dwh_star import star_tables

    spark = warehouse
    spark.sql("DROP TABLE IF EXISTS b_authorship")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    authorship = l.select(
        F.col("l_orderkey").alias("article_id"),
        F.col("l_suppkey").alias("author_id"),
    ).distinct()
    write_bucketed(authorship, "b_authorship", ["author_id"], n_buckets=8)
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plain_agg = authorship.groupBy("author_id").count()
        bucketed_agg = spark.table("b_authorship").groupBy("author_id").count()
        plain = shuffle_metrics(plain_agg)
        bucketed = shuffle_metrics(bucketed_agg)
        # same answer, zero shuffle on the bucketed side
        assert bucketed["bytes"] == 0 and bucketed["exchanges"] == 0
        assert plain["bytes"] > 0 and plain["exchanges"] >= 1
        assert sorted(map(tuple, plain_agg.collect())) == sorted(
            map(tuple, bucketed_agg.collect())
        )
        # end-to-end: the dwh author table built from the bucketed input
        # plans strictly fewer exchanges than from the raw scan
        author_plain, *_ = star_tables(spark, sf_dir)
        author_bucketed, *_ = star_tables(
            spark, sf_dir, authorship=spark.table("b_authorship")
        )
        assert n_exchanges(author_bucketed) < n_exchanges(author_plain)
        assert sorted(map(tuple, author_bucketed.collect())) == sorted(
            map(tuple, author_plain.collect())
        )
    finally:
        spark.conf.unset("spark.sql.adaptive.enabled")
        spark.sql("DROP TABLE IF EXISTS b_authorship")


def test_zorder_rejects_keys_wider_than_bigint(spark):
    """4×16 puts the top bit on the BIGINT sign bit and 5+ columns wrap
    shiftleft's mod-64 shift count — both silently corrupt the Morton
    order, so the key builder must fail loudly (advisor round-6)."""
    import pytest

    from research_data_pipeline_spark.io.layout import zorder_value

    with pytest.raises(ValueError, match="63 value bits"):
        zorder_value(["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="63 value bits"):
        zorder_value(["a", "b", "c", "d", "e"], bits=16)
    # 4 cols fit at bits<=15, 2 cols at the default 16
    zorder_value(["a", "b", "c", "d"], bits=15)
    zorder_value(["a", "b"], bits=16)


def test_zorder_prunes_row_groups_on_both_dimensions(spark, sf_dir, tmp_path):
    """The 100 TB clustering claim, judged by parquet footer stats: a
    Z-ordered layout lets a stats-aware scanner skip row groups for
    selective range predicates on EITHER interleaved column, while a
    single-column sort serves only its leading column."""
    from research_data_pipeline_spark.io.layout import (
        row_groups_pruned,
        write_zordered,
    )

    # sf0.01 (10k events): sf0.001's ~1k rows make only ~11 row groups at
    # the writer's 100-record floor — too coarse to observe pruning
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(
        e, zpath, ["user_id", "event_id"], bits=8, n_files=2,
        row_group_bytes=2048,
    )
    # baseline: clustered on event_id alone (the "sort by time" default)
    (
        e.repartitionByRange(2, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .option("parquet.block.size", "2048")
        .option("parquet.page.size", "1024")
        .parquet(spath)
    )

    u_kept, u_total = row_groups_pruned(zpath, "user_id", 10, 19)
    t_kept, t_total = row_groups_pruned(zpath, "event_id", 1000, 1999)
    assert u_total >= 8, "row groups too coarse to measure pruning"
    # Z-order: BOTH predicates skip most of the file
    assert u_kept / u_total <= 0.5, (u_kept, u_total)
    assert t_kept / t_total <= 0.5, (t_kept, t_total)

    su_kept, su_total = row_groups_pruned(spath, "user_id", 10, 19)
    st_kept, st_total = row_groups_pruned(spath, "event_id", 1000, 1999)
    # single-column sort: its own column prunes, the other reads ~all
    assert st_kept / st_total <= 0.5, (st_kept, st_total)
    assert su_kept / su_total >= 0.9, (su_kept, su_total)

    # layout is lossless: same rows come back under the predicate
    got = (
        spark.read.parquet(zpath)
        .where(F.col("user_id").between(10, 19))
        .count()
    )
    want = e.where(F.col("user_id").between(10, 19)).count()
    assert got == want


def test_hive_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """Directory-level pruning: a filter on the hive partition column
    must appear as a PartitionFilter on the scan (pruned BEFORE reading
    any file footer — the coarsest and cheapest skip a 100 TB lake has),
    and only the matching partition's files may be listed."""
    import os

    from research_data_pipeline_spark.io.layout import formatted_plan

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    dest = str(tmp_path / "by_type")
    e.write.mode("overwrite").partitionBy("event_type").parquet(dest)
    assert any(d.startswith("event_type=") for d in os.listdir(dest))

    q = spark.read.parquet(dest).where(F.col("event_type") == "click")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # correctness: pruned read equals the unpartitioned filter
    want = e.where(F.col("event_type") == "click").count()
    assert q.count() == want


def test_star_tables_prefers_bucketed_store_when_present(spark, sf_dir):
    """The r13 layout probe: star_tables flips to the durable bucketed
    authorship store once build_bucketed_authorship has run for the
    dataset — fewer exchanges, identical rows — re-registers the table
    into a fresh catalog from the sidecar, and stays on the raw path
    when no store exists (no implicit fact-scale write)."""
    from research_data_pipeline_spark.io import fs
    from research_data_pipeline_spark.io.layout import (
        _authorship_table_name,
        bucketed_authorship_path,
        build_bucketed_authorship,
        probe_bucketed_authorship,
    )
    from research_data_pipeline_spark.operators import decisions
    from research_data_pipeline_spark.queries.dwh_star import star_tables

    table = _authorship_table_name(sf_dir)
    # no store: probe is None, star_tables records the raw path
    assert probe_bucketed_authorship(spark, sf_dir) is None
    author_raw, *_ = star_tables(spark, sf_dir)
    assert decisions.LAST["star_authorship"]["path"] == "raw_scan"
    raw_rows = sorted(map(tuple, author_raw.collect()))

    try:
        build_bucketed_authorship(spark, sf_dir, n_buckets=8)
        author_b, *_ = star_tables(spark, sf_dir)
        assert decisions.LAST["star_authorship"]["path"] == "bucketed_store"
        assert sorted(map(tuple, author_b.collect())) == raw_rows
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            assert n_exchanges(author_b) < n_exchanges(author_raw)
        finally:
            spark.conf.unset("spark.sql.adaptive.enabled")

        # fresh-session catalog: drop the entry, keep the store on disk —
        # the probe re-registers from the _BUCKET_META sidecar
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        again = probe_bucketed_authorship(spark, sf_dir)
        assert again is not None
        author_c, *_ = star_tables(spark, sf_dir)
        assert decisions.LAST["star_authorship"]["path"] == "bucketed_store"
        assert sorted(map(tuple, author_c.collect())) == raw_rows
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            assert n_exchanges(author_c) < n_exchanges(author_raw)
        finally:
            spark.conf.unset("spark.sql.adaptive.enabled")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        fs.delete(spark, bucketed_authorship_path(sf_dir))


def test_bucketed_store_rebuild_survives_leftover_data_files(spark, sf_dir):
    """Crash-retry contract (r13 advisor, medium): saveAsTable into an
    external LOCATION refuses a non-empty directory, so a rebuild after
    a crash mid-write (data files present, no sidecar) — or any
    cross-session rebuild — must delete the whole store path first, not
    just the sidecar."""
    from research_data_pipeline_spark.io import fs
    from research_data_pipeline_spark.io.layout import (
        _authorship_table_name,
        bucketed_authorship_path,
        build_bucketed_authorship,
        probe_bucketed_authorship,
    )

    path = bucketed_authorship_path(sf_dir)
    table = _authorship_table_name(sf_dir)
    try:
        # simulate the crash window: data files on disk, NO sidecar, and
        # (cross-session) no catalog entry
        build_bucketed_authorship(spark, sf_dir, n_buckets=8)
        fs.delete(spark, f"{path}/_BUCKET_META")
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        assert probe_bucketed_authorship(spark, sf_dir) is None
        # the documented retry: must succeed, not die on non-empty CTAS
        build_bucketed_authorship(spark, sf_dir, n_buckets=8)
        assert probe_bucketed_authorship(spark, sf_dir) is not None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        fs.delete(spark, path)


def test_bucketed_store_probe_detects_in_place_regeneration(
    spark, sf_dir, tmp_path
):
    """Freshness contract (r13 advisor): the sidecar records a dataset
    fingerprint (bytes + newest mtime of lineitem); a dataset
    regenerated IN PLACE makes the probe report store-absent instead of
    silently serving stale authorship rows."""
    from research_data_pipeline_spark.io import fs
    from research_data_pipeline_spark.io.layout import (
        _authorship_table_name,
        bucketed_authorship_path,
        build_bucketed_authorship,
        probe_bucketed_authorship,
    )

    ds = str(tmp_path / "ds")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.parquet(
        f"{ds}/lineitem.parquet"
    )
    path = bucketed_authorship_path(ds)
    table = _authorship_table_name(ds)
    try:
        build_bucketed_authorship(spark, ds, n_buckets=4)
        assert probe_bucketed_authorship(spark, ds) is not None
        # regenerate the dataset in place (fewer rows -> new bytes)
        df = spark.read.parquet(f"{ds}/lineitem.parquet").limit(100)
        df.write.mode("overwrite").parquet(str(tmp_path / "regen"))
        spark.read.parquet(str(tmp_path / "regen")).write.mode(
            "overwrite"
        ).parquet(f"{ds}/lineitem.parquet")
        spark.sql(f"DROP TABLE IF EXISTS {table}")  # fresh-session view
        assert probe_bucketed_authorship(spark, ds) is None
        # explicit refresh re-validates
        build_bucketed_authorship(spark, ds, n_buckets=4)
        assert probe_bucketed_authorship(spark, ds) is not None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        fs.delete(spark, path)


def test_artifact_root_with_quote_fails_at_configuration_time(
    spark, monkeypatch
):
    """A quote in SPARK_GRAFT_ARTIFACT_DIR must fail loudly in
    _artifact_path, not as a broken CREATE TABLE at probe time."""
    import pytest as _pytest

    from research_data_pipeline_spark.io.layout import (
        bucketed_authorship_path,
    )

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", "/tmp/it's-a-trap")
    with _pytest.raises(ValueError, match="unsafe"):
        bucketed_authorship_path("/root/testdata/sf0.001")
