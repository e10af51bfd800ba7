"""End-to-end ``spark-submit --py-files`` deployment smoke test.

The north rule requires the build + query pipeline to run via
``spark-submit --py-files`` (reference deployment analogue:
TaxonomyCLI/Program.cs:31-93 — the CLI binary the reference operators
run).  This test proves the package is actually shippable that way:

* the package is zipped exactly as a deploy step would
  (``zip pkg.zip ds_discovery_opensearch_taxonomy_spark/``),
* ``cli.py`` is COPIED OUT of the repo and submitted from a scratch
  cwd with ``PYTHONPATH`` scrubbed, so the driver AND the Python
  workers can only resolve the package through ``--py-files`` —
  a bare ``sys.path`` leak from the repo checkout would not save it,
* one submit builds an index from a parquet corpus of the input_hint
  shape (repo, path, commit, lang, content); a second submit runs a
  query against the built index and must return exactly the matching
  docs.

Each submit is a fresh JVM, so this also re-checks that an index
written by one driver process is readable by another (manifest +
parquet only, no session state).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
PKG = "ds_discovery_opensearch_taxonomy_spark"

SPARK_SUBMIT = Path(os.path.dirname(__import__("pyspark").__file__)) / "bin" / "spark-submit"

DOCS = [
    ("r1", "a/zeppelin.py", "c1", "python", "the airship zeppelin flew over the sea"),
    ("r1", "a/balloon.py", "c2", "python", "a hot air balloon drifted over the sea"),
    ("r2", "b/zeppelin.go", "c3", "go", "zeppelin maintenance manual for ground crew"),
    ("r2", "b/submarine.go", "c4", "go", "submarine dives under the sea surface"),
]


def _make_pkg_zip(dest: Path) -> Path:
    zpath = dest / "pkg.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((REPO_ROOT / PKG).rglob("*")):
            if f.is_file() and f.suffix in (".py", ".json"):
                z.write(f, f.relative_to(REPO_ROOT))
    return zpath


def _submit(workdir: Path, zpath: Path, cli: Path, *args: str) -> str:
    env = dict(os.environ)
    # the ONLY route to the package must be --py-files
    env.pop("PYTHONPATH", None)
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    out = subprocess.run(
        [
            str(SPARK_SUBMIT),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(cli), "--cpus", "4", *args,
        ],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


@pytest.mark.skipif(not SPARK_SUBMIT.exists(), reason="no spark-submit in this pyspark install")
def test_build_and_search_via_spark_submit(tmp_path):
    if shutil.which("java") is None and not os.environ.get("JAVA_HOME"):
        pytest.skip("no JVM available")

    work = tmp_path / "deploy"
    work.mkdir()
    zpath = _make_pkg_zip(work)
    cli = work / "cli_entry.py"
    shutil.copyfile(REPO_ROOT / PKG / "cli.py", cli)

    corpus = work / "corpus.parquet"
    tbl = pa.table(
        {
            "repo": pa.array([d[0] for d in DOCS]),
            "path": pa.array([d[1] for d in DOCS]),
            "commit": pa.array([d[2] for d in DOCS]),
            "lang": pa.array([d[3] for d in DOCS]),
            "content": pa.array([d[4] for d in DOCS]),
        }
    )
    pq.write_table(tbl, corpus)

    idx = work / "index"
    built = _submit(
        work, zpath, cli,
        "build", "--corpus", str(corpus), "--index", str(idx), "--no-resume",
    )
    summary = json.loads(built.strip().splitlines()[-1])
    assert "staging" in summary["stages"] and "dictionary" in summary["stages"]
    assert (idx / "manifest.json").exists()

    # fresh JVM, fresh driver: only the on-disk index carries state over
    found = _submit(work, zpath, cli, "search", "--index", str(idx), "--query", "zeppelin")
    rows = [json.loads(ln) for ln in found.strip().splitlines() if ln.startswith("{")]
    assert len(rows) == 2  # docs c1 and c3 contain "zeppelin"
    assert all(r["score"] > 0 for r in rows)

    missing = _submit(work, zpath, cli, "search", "--index", str(idx), "--query", "dirigible")
    assert not [ln for ln in missing.strip().splitlines() if ln.startswith("{")]


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
