#!/usr/bin/env python
"""Deterministic scale-up generator: sfN tables derived from sf0.1.

TESTDATA.md's driver-generated dirs stop at sf0.1 (~600k lineitem rows).
The 100 TB posture argued from plan shape in the operator docstrings
needs at least one measured scaling point above bench scale, so this
script synthesizes a 10x (or Rx) dataset from the read-only sf0.1 input
WITHOUT touching /root/testdata: every table is replicated R times with
disjoint key ranges, giving a dataset whose per-query work should scale
~linearly in R for every registered query.

Replication is NOT naive row copying where that would distort workload
shape:

- ``documents.text``: each replica applies a *value-level* token mutation
  (token t -> t||'r<rep>' when xxhash64(t) % 3 < rename_thirds). The map
  is a bijection on token space, so within-replica token-set Jaccard is
  EXACTLY the original's (near-dup pair structure replicates linearly),
  while cross-replica Jaccard collapses below every dedup threshold —
  so MinHash/SimHash/n-gram EMITTED pair counts scale by R, not R².
  CANDIDATE mass needs the rename fraction scaled with R: pass
  ``--rename-thirds 2`` at R >= 100 (see _mutate_documents for the
  band-collision arithmetic the round-11 100x grid measured).
- ``embeddings.embedding``: each replica rotates the vector by ``rep``
  positions — norms (and hence cosine geometry within a replica) are
  preserved, directions across replicas decorrelate.
- Fact/dim keys shift by a replica stride larger than the source key
  range, so joins never collide across replicas and per-key group sizes
  (the skew profile) match the source exactly.

Usage:
    python scripts/make_scale_data.py [--mult 10] [--out .scale/sf1]
        [--src /root/testdata/sf0.1] [--docs-mult N] [--emb-mult N]

``--docs-mult`` / ``--emb-mult`` override the factor for documents /
embeddings only: the broadcast-guard demonstration needs >100k documents
(MAX_BROADCAST_SIGNATURES) and >200k vectors (MAX_BROADCAST_VECTORS),
which is 30x / 110x their sf0.1 sizes — see scripts/scale_demo.py.
Outputs land under the repo (gitignored), one dir per scale, written as
multi-file parquet so scans parallelize without the single-row-group
repartition gate.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# replica stride per key column: > the source key's max at sf0.1 so
# replica key ranges are disjoint (checked against the data at runtime)
STRIDES = {
    "l_orderkey": 1_000_000,
    "o_orderkey": 1_000_000,
    "l_partkey": 100_000,
    "p_partkey": 100_000,
    "l_suppkey": 10_000,
    "s_suppkey": 10_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 100_000,
}

# dimension tables small enough that replicating them would only distort
# broadcast-side sizes; copied verbatim (their keys are not replicated
# in any fact table either)
COPY_TABLES = ("region", "nation")


def _replicate(df: DataFrame, mult: int) -> DataFrame:
    reps = df.sparkSession.range(mult).select(F.col("id").alias("rep"))
    out = df.crossJoin(F.broadcast(reps))
    for c in df.columns:
        if c in STRIDES:
            out = out.withColumn(c, F.col(c) + F.col("rep") * STRIDES[c])
    return out


def _mutate_documents(df: DataFrame, rename_thirds: int = 1) -> DataFrame:
    # bijective per-replica token map: rep 0 is the untouched source
    # corpus; higher reps rename rename_thirds/3 of token TYPES
    # (value-hashed, not position-hashed, so every occurrence moves
    # together and token-set Jaccard within a replica is exactly the
    # source's).
    #
    # rename_thirds=1 (default, the 10x/30x grid) leaves cross-replica
    # Jaccard ~0.44 — realistic partial overlap, and fine while R is
    # small. It does NOT hold at R=100: the rename set is the SAME in
    # every replica, so a 4-row minhash band drawn entirely from
    # unmutated tokens ((2/3)^4 ≈ 20% per band, ~59% over 4 bands)
    # collides across ALL R copies of a source doc, and LSH candidate
    # mass grows as R² even though emitted pairs stay linear (j=0.44 is
    # below every threshold). Measured on the round-11 100x grid: ~15M
    # sub-threshold cross-replica candidates wedged the exact-Jaccard
    # verification join for 30+ min on 32 cores. rename_thirds=2 drops
    # cross-replica Jaccard to 0.2 (band-collision ~5%), restoring
    # linear candidate structure at R=100 while keeping real overlap.
    mutated = F.expr(
        "array_join(transform(split(text, ' '), t -> "
        f"CASE WHEN rep > 0 AND pmod(xxhash64(t), 3) < {int(rename_thirds)} "
        "THEN concat(t, 'r', CAST(rep AS STRING)) ELSE t END), ' ')"
    )
    return df.withColumn("text", mutated).withColumn(
        "n_chars", F.length("text").cast("int")
    )


def _mutate_embeddings(df: DataFrame) -> DataFrame:
    # rotate by rep positions: norm-preserving, cross-replica decorrelated
    dim = len(df.select("embedding").first()[0])
    rot = F.expr(
        f"CASE WHEN rep = 0 THEN embedding ELSE concat("
        f"slice(embedding, CAST(pmod(rep, {dim}) + 1 AS INT), "
        f"{dim} - CAST(pmod(rep, {dim}) AS INT)), "
        f"slice(embedding, 1, CAST(pmod(rep, {dim}) AS INT))) END"
    )
    return df.withColumn("embedding", rot)


def generate(
    spark: SparkSession,
    src: str,
    out: str,
    mult: int,
    docs_mult: int | None = None,
    emb_mult: int | None = None,
    rename_thirds: int = 1,
    only_tables: list[str] | None = None,
) -> None:
    per_table = {
        "documents": docs_mult or mult,
        "embeddings": emb_mult or mult,
    }
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    if only_tables:
        tables = [t for t in tables if t in only_tables]
    for name in tables:
        t0 = time.perf_counter()
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if name in COPY_TABLES:
            rep = df
        else:
            m = per_table.get(name, mult)
            for c in df.columns:
                if c in STRIDES:
                    hi = df.agg(F.max(c)).first()[0]
                    assert hi < STRIDES[c], (
                        f"{name}.{c} max {hi} >= stride {STRIDES[c]}"
                    )
            rep = _replicate(df, m)
            if name == "documents":
                rep = _mutate_documents(rep, rename_thirds)
            elif name == "embeddings":
                rep = _mutate_embeddings(rep)
            rep = rep.drop("rep")
        # multi-file output: scans parallelize natively, no gate needed
        n_parts = max(4, min(64, rep.rdd.getNumPartitions()))
        rep.repartition(n_parts).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(
            f"{name}: {n} rows in {time.perf_counter() - t0:.1f}s",
            flush=True,
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scale/sf1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--docs-mult", type=int, default=None)
    ap.add_argument("--emb-mult", type=int, default=None)
    ap.add_argument("--rename-thirds", type=int, default=1,
                    help="thirds of token types renamed per replica; use "
                    "2 at R>=100 so LSH candidate mass stays linear "
                    "(see _mutate_documents)")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset to (re)generate")
    args = ap.parse_args()

    # 0 silently disables token mutation (replicas become naive copies,
    # near-dup candidate mass scales R² and distorts the documented
    # workload shape); >=3 renames every token (cross-replica jaccard 0)
    if not 1 <= args.rename_thirds <= 2:
        ap.error(
            f"--rename-thirds must be 1 or 2, got {args.rename_thirds}"
        )
    only_tables = args.tables.split(",") if args.tables else None
    if only_tables:
        known = {
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        }
        unknown = [t for t in only_tables if t not in known]
        # a typo must not "succeed" generating nothing and leave a grid
        # directory with stale mixed-multiplier tables
        if unknown:
            ap.error(
                f"--tables has unknown name(s) {unknown}; "
                f"valid: {sorted(known)}"
            )

    from research_data_pipeline_spark.session import get_spark

    spark = get_spark(app="make-scale-data")
    os.makedirs(args.out, exist_ok=True)
    generate(
        spark, args.src, args.out, args.mult, args.docs_mult,
        args.emb_mult, args.rename_thirds, only_tables,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
