"""Deployment-surface test: the north rule's "run via spark-submit
--py-files" contract, exercised END TO END with a REAL spark-submit
subprocess — not a unit test of the argument parser.

Isolation is the point: the subprocess runs with the repo stripped from
PYTHONPATH and a cwd outside the repo, so ``import otar3088_spark`` inside
jobs/kg_submit.py can only resolve through the ``--py-files`` zip built by
tools/make_pyfiles.py. If the packaging misses a module, this fails."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_is_table_routing():
    """Dotted identifiers route to the catalog; slashes, .parquet suffixes,
    and bare undotted names (natural relative dirs like `kg_out`) route to
    the filesystem."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "kg_submit", REPO / "jobs" / "kg_submit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._is_table("lake.kg")
    assert mod._is_table("lake.raw.transcripts")
    assert not mod._is_table("kg_out")
    assert not mod._is_table("data/transcripts.parquet")
    assert not mod._is_table("transcripts.parquet")
    assert not mod._is_table("/abs/dir")


def test_spark_submit_pyfiles_job(spark, transcripts_df, dictionary_df, tmp_path):
    import pyspark

    submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    assert submit.exists()

    # package the library exactly as a deployer would
    zip_path = tmp_path / "otar3088_spark.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_pyfiles.py"), str(zip_path)],
        check=True, cwd=str(REPO),
    )
    assert zip_path.exists()

    tin = tmp_path / "transcripts.parquet"
    din = tmp_path / "dictionary.parquet"
    transcripts_df.write.mode("overwrite").parquet(str(tin))
    dictionary_df.write.mode("overwrite").parquet(str(din))
    out = tmp_path / "kg_out"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    p = subprocess.run(
        [
            str(submit),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(REPO / "jobs" / "kg_submit.py"),
            "--transcripts", str(tin),
            "--dictionary", str(din),
            "--output", str(out),
            "--staging", str(tmp_path / "staging"),
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env,
    )
    assert p.returncode == 0, p.stderr[-4000:]

    metrics = json.loads(
        [l for l in p.stdout.splitlines() if l.startswith('{"job"')][-1]
    )
    assert metrics["counts"]["triples"] > 0
    assert metrics["counts"]["nodes"] > 0
    assert metrics["counts"]["edges"] > 0
    assert metrics["master"] == "local[4]"
    assert metrics["shuffle_partitions"] == "4"

    # the committed parquet is readable by an independent session and
    # carries the triple-table contract columns
    triples = spark.read.parquet(str(out / "triples"))
    assert {"subj", "pred", "obj", "conv_id", "turn_idx"} <= set(triples.columns)
    assert triples.count() == metrics["counts"]["triples"]
    edges = spark.read.parquet(str(out / "edges"))
    assert {"src", "rel", "dst"} <= set(edges.columns)
