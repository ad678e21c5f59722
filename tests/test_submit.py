"""spark-submit --py-files packaging (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

The launch surface is exercised for real: the engine package is shipped
ONLY as a zip (--py-files), the launcher (submit.py) is copied to a
directory outside the repo, and spark-submit runs from there — so the
driver and every executor resolve ``engine.*`` from the zip exactly as a
real cluster would (PySpark adds only the app file's own directory and
the --py-files archives to sys.path, not the repo)."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="no spark-submit in this environment")
def test_spark_submit_pyfiles_build_and_search(tmp_path):
    zpath = tmp_path / "engine.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "engine")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    app_dir = tmp_path / "app"  # outside the repo: zip is the only source
    app_dir.mkdir()
    shutil.copy(os.path.join(REPO, "submit.py"), app_dir / "submit.py")
    idx_dir = tmp_path / "idx"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(zpath), str(app_dir / "submit.py"),
         "build", "--input", "synthetic", "--convs", "300",
         "--index-dir", str(idx_dir)],
        cwd=str(app_dir), env=env, capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_docs"] > 0 and out["turns_per_sec"] > 0
    # the produced index is a normal packed index: load + search in-proc
    from engine import query as Q
    from engine.build import load_index
    from engine.session import get_spark
    idx = load_index(get_spark("submit-check"), str(idx_dir))
    assert idx.n_docs == out["n_docs"]
    assert len(Q.search(idx, "hot0 rare3", k=5).collect()) == 5
