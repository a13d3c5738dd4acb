"""neo4j-admin bulk-import export round-trip (SURVEY S8 last mile).

Reference parity target: the batched UNWIND/MERGE loader
(/root/reference/dags/scripts/neo4j_queries.py:39-123). The export must
produce header files in neo4j-admin's documented dialect (:ID /
:START_ID / :END_ID / :LABEL / :TYPE, typed property columns), enforce
id uniqueness (the import aborts on duplicates), and round-trip the data
through headerless CSV unchanged.
"""

from __future__ import annotations

import glob

import pytest

from research_data_pipeline_spark.io.neo4j_export import export_neo4j_admin


def _read_lines(pattern: str) -> list[str]:
    lines: list[str] = []
    for p in sorted(glob.glob(pattern)):
        with open(p) as f:
            lines += [ln.rstrip("\n") for ln in f if ln.strip()]
    return lines


@pytest.fixture()
def graph(spark):
    # FIXTURES-shaped: Author/Article nodes, AUTHORED + COAUTHORS edges
    # (the reference's node/edge families, research_pipeline_dag.py:285-369)
    vertices = spark.createDataFrame(
        [
            ("a1", "Author", "Smith", 12),
            ("a2", "Author", "Müller", 3),
            ("p1", "Article", 'A "quoted" title, with comma', 2001),
            ("p2", "Article", "Short", 2003),
        ],
        "id string, label string, name string, n int",
    )
    edges = spark.createDataFrame(
        [
            ("a1", "p1", "AUTHORED", 1.0),
            ("a2", "p1", "AUTHORED", 1.0),
            ("a1", "p2", "AUTHORED", 1.0),
            ("a1", "a2", "COAUTHORS", 2.5),
            ("a1", "a2", "COAUTHORS", 2.5),  # exact dup → MERGE-idempotent
        ],
        "src string, dst string, rel string, weight double",
    )
    return vertices, edges


def test_headers_and_layout(spark, graph, tmp_path):
    vertices, edges = graph
    out = export_neo4j_admin(vertices, edges, str(tmp_path))
    assert out == {
        "nodes": ["Article", "Author"],
        "relationships": ["AUTHORED", "COAUTHORS"],
    }
    assert _read_lines(str(tmp_path / "nodes/Author/header.csv")) == [
        "id:ID,name,n:long,:LABEL"
    ]
    assert _read_lines(str(tmp_path / "relationships/COAUTHORS/header.csv")) == [
        ":START_ID,:END_ID,weight:double,:TYPE"
    ]
    cmd = "\n".join(_read_lines(str(tmp_path / "import_command.txt")))
    assert "neo4j-admin database import full" in cmd
    assert "--nodes=nodes/Author/header.csv" in cmd
    assert "--array-delimiter=';'" in cmd
    # document-style string props may carry embedded newlines, written
    # RFC-4180-quoted across lines — the command must opt into them
    assert "--multiline-fields=true" in cmd


def test_unsafe_label_rejected(spark, graph, tmp_path):
    vertices, edges = graph
    evil = vertices.unionByName(
        spark.createDataFrame(
            [("x1", "../escape", "Evil", 0)], vertices.schema
        )
    )
    with pytest.raises(ValueError, match="vertex label"):
        export_neo4j_admin(evil, edges, str(tmp_path), validate_refs=False)


def test_unsafe_rel_type_rejected(spark, graph, tmp_path):
    vertices, edges = graph
    bad = edges.unionByName(
        spark.createDataFrame(
            [("a1", "a2", "HAS SPACE", 1.0)], edges.schema
        )
    )
    with pytest.raises(ValueError, match="relationship type"):
        export_neo4j_admin(vertices, bad, str(tmp_path))


def test_data_roundtrip_headerless(spark, graph, tmp_path):
    vertices, edges = graph
    export_neo4j_admin(vertices, edges, str(tmp_path))
    # data files carry no header; reading them WITH the header schema
    # yields the original rows (incl. RFC-4180 quoted title)
    rows = _read_lines(str(tmp_path / "nodes/Article/data/part-*.csv"))
    assert len(rows) == 2
    assert any('"A ""quoted"" title, with comma"' in r for r in rows)
    assert all(r.endswith(",Article") for r in rows)
    authored = _read_lines(str(tmp_path / "relationships/AUTHORED/data/part-*.csv"))
    assert sorted(authored) == [
        "a1,p1,1.0,AUTHORED",
        "a1,p2,1.0,AUTHORED",
        "a2,p1,1.0,AUTHORED",
    ]
    # the exact-duplicate COAUTHORS edge collapsed (MERGE idempotency)
    co = _read_lines(str(tmp_path / "relationships/COAUTHORS/data/part-*.csv"))
    assert co == ["a1,a2,2.5,COAUTHORS"]


def test_duplicate_id_rejected(spark, graph, tmp_path):
    vertices, edges = graph
    clash = vertices.unionByName(
        spark.createDataFrame(
            [("a1", "Author", "Imposter", 99)], vertices.schema
        )
    )
    with pytest.raises(ValueError, match="duplicate id"):
        export_neo4j_admin(clash, edges, str(tmp_path))


def test_dangling_edge_rejected(spark, graph, tmp_path):
    vertices, edges = graph
    bad = edges.unionByName(
        edges.sparkSession.createDataFrame(
            [("a1", "ghost", "AUTHORED", 1.0)], edges.schema
        )
    )
    with pytest.raises(ValueError, match="missing vertex ids"):
        export_neo4j_admin(vertices, bad, str(tmp_path))


def test_array_property_uses_list_delimiter(spark, tmp_path):
    vertices = spark.createDataFrame(
        [("c1", "Category", ["cs.LG", "cs.AI"])],
        "id string, label string, doms array<string>",
    )
    edges = spark.createDataFrame(
        [], "src string, dst string, rel string"
    )
    export_neo4j_admin(vertices, edges, str(tmp_path), validate_refs=False)
    assert _read_lines(str(tmp_path / "nodes/Category/header.csv")) == [
        "id:ID,doms:string[],:LABEL"
    ]
    [row] = _read_lines(str(tmp_path / "nodes/Category/data/part-*.csv"))
    assert row == "c1,cs.LG;cs.AI,Category"


def test_export_integrity_roundtrip(spark, graph, tmp_path):
    """r09 verdict #6: replay the exported CSVs through the tolerant
    reader and assert counts + constraints match the SOURCE DataFrames
    — the serverless S8 closing loop."""
    from research_data_pipeline_spark.io.neo4j_export import (
        verify_neo4j_export,
    )

    vertices, edges = graph
    manifest = export_neo4j_admin(vertices, edges, str(tmp_path))
    got = verify_neo4j_export(spark, str(tmp_path), manifest)
    # node counts per label match the source exactly
    want_nodes = {
        r["label"]: r["n"]
        for r in vertices.groupBy("label").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert got["nodes"] == want_nodes
    # edge counts match the source after the documented MERGE-idempotent
    # full-row dedup (the fixture carries one exact-duplicate edge)
    want_rels = {
        r["rel"]: r["n"]
        for r in edges.dropDuplicates().groupBy("rel").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got["relationships"] == want_rels


def test_export_integrity_catches_corruption(spark, graph, tmp_path):
    """A hand-corrupted export must fail the replay check: (1) a
    duplicate node id appended to a data part file, (2) a dangling
    relationship endpoint."""
    import pytest

    from research_data_pipeline_spark.io.neo4j_export import (
        verify_neo4j_export,
    )

    import os

    def corrupt(pattern: str, line: str) -> None:
        [part] = glob.glob(pattern)
        with open(part, "a") as f:
            f.write(line)
        # drop Hadoop's local-FS checksum sidecar — a hand-edited
        # export has no CRCs, and a stale one masks the corruption
        # with a read error instead of the integrity failure
        crc = os.path.join(
            os.path.dirname(part), "." + os.path.basename(part) + ".crc"
        )
        if os.path.exists(crc):
            os.remove(crc)

    vertices, edges = graph
    manifest = export_neo4j_admin(vertices, edges, str(tmp_path))
    corrupt(
        str(tmp_path / "nodes/Author/data/part-*.csv"),
        "a1,DupSmith,7,Author\n",
    )
    with pytest.raises(ValueError, match="duplicate id"):
        verify_neo4j_export(spark, str(tmp_path), manifest)
    # restore, then corrupt an edge endpoint instead
    manifest = export_neo4j_admin(vertices, edges, str(tmp_path))
    corrupt(
        str(tmp_path / "relationships/AUTHORED/data/part-*.csv"),
        "ghost,p1,1.0,AUTHORED\n",
    )
    with pytest.raises(ValueError, match="missing node ids"):
        verify_neo4j_export(spark, str(tmp_path), manifest)
    # (3) a row with a MISSING trailing :LABEL column: the NULL-blind
    # `!=` used to pass it; eqNullSafe must flag it as a foreign label
    manifest = export_neo4j_admin(vertices, edges, str(tmp_path))
    corrupt(
        str(tmp_path / "nodes/Author/data/part-*.csv"),
        "a9x,NoLabel,3\n",
    )
    with pytest.raises(Exception, match="foreign :LABEL|FAILFAST|Malformed"):
        verify_neo4j_export(spark, str(tmp_path), manifest)
    # (4) a structurally malformed (truncated/garbage) line: the ingest
    # reader's DROPMALFORMED used to swallow it; the FAILFAST replay
    # must surface it as a verification failure
    manifest = export_neo4j_admin(vertices, edges, str(tmp_path))
    corrupt(
        str(tmp_path / "nodes/Author/data/part-*.csv"),
        '"unterminated,quote,row\n',
    )
    with pytest.raises(Exception):
        verify_neo4j_export(spark, str(tmp_path), manifest)
