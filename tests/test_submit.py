"""Contract launch-path smoke test (VERDICT r1 item 7): build
er_engine.zip and run the pipeline through `spark-submit --py-files` in a
subprocess — the exact invocation the contract names — asserting exit 0
and a sane cluster count at tiny scale.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_zip_contains_package_and_is_deterministic(tmp_path):
    from tools.package import build

    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    with open(z1, "rb") as a, open(z2, "rb") as b:
        assert a.read() == b.read(), "packaging must be byte-deterministic"
    import zipfile

    names = zipfile.ZipFile(z1).namelist()
    assert "dig_entity_resolution_spark/plans/pipeline.py" in names
    assert "dig_entity_resolution_spark/session.py" in names
    assert all(n.endswith(".py") for n in names)


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    from dig_entity_resolution_spark.synth import generate_corpus
    from tools.package import build

    paths = generate_corpus(
        str(tmp_path / "corpus"), n_clusters=5, cluster_size=3, n_singletons=20
    )
    zip_path = build(str(tmp_path / "er_engine.zip"))
    env = dict(os.environ)
    # force the submitted driver to resolve the package from the zip, not
    # from the repo checkout
    env["PYTHONPATH"] = ""
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "run_pipeline.py"),
            "--input",
            paths["pages"],
            "--warehouse",
            str(tmp_path / "wh"),
            "--run-id",
            "submit_smoke",
            "--labels",
            paths["labels"],
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),  # not the repo root — no accidental local import
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["run_id"] == "submit_smoke"
    assert report["counters"]["records"] == 35
    assert report["n_clusters"] == 25  # 5 planted clusters + 20 singletons
    assert report["eval"]["f1"] >= 0.99


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_curation_end_to_end(tmp_path):
    """run_curation.py through the same --py-files contract: documents in,
    packed chunks + per-stage counters out."""
    from tools.package import build

    zip_path = build(str(tmp_path / "er_engine.zip"))
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "run_curation.py"),
            "--input",
            "/root/testdata/sf0.001/documents.parquet",
            "--warehouse",
            str(tmp_path / "wh"),
            "--run-id",
            "cur_smoke",
            "--keep-ppl-buckets",
            "",  # LM gate off: keep the smoke fast and planted-free
            "--seq-len",
            "64",
            "--bpe-merges",
            "10",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["run_id"] == "cur_smoke"
    c = report["counters"]
    assert set(c) >= {"hygiene", "quality", "dedup", "decontam", "selected", "chunks"}
    assert c["hygiene"] == c["quality"]  # audit table is unfiltered
    assert c["dedup"] <= c["quality"]
    assert report["rows_out"] == c["chunks"] > 0


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_curation_incremental(tmp_path):
    """--deltas routes run_curation.py through IncrementalCuration: init
    on the input, one delta batch, per-batch change report."""
    import pyarrow.parquet as pq

    from tools.package import build

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pq.write_table(t.slice(0, 400), str(tmp_path / "init.parquet"))
    pq.write_table(t.slice(400), str(tmp_path / "delta.parquet"))
    zip_path = build(str(tmp_path / "er_engine.zip"))
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "run_curation.py"),
            "--input",
            str(tmp_path / "init.parquet"),
            "--deltas",
            str(tmp_path / "delta.parquet"),
            "--warehouse",
            str(tmp_path / "wh"),
            "--run-id",
            "incr_smoke",
            "--keep-ppl-buckets",
            "",
            "--seq-len",
            "64",
            "--bpe-merges",
            "10",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["mode"] == "incremental"
    assert report["init_chunks"] > 0
    (b,) = report["batches"]
    assert b["additions"] >= 0 and b["new_chunks"] >= 0
    assert report["live_chunks"] > 0
    # both batch namespaces checkpointed
    assert any(k.startswith("b0000_") for k in report["counters"])
    assert any(k.startswith("b0001_") for k in report["counters"])
