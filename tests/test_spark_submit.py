"""Cluster launch boundary: the package must run via
``spark-submit --py-files sparktiles.zip`` (reference deploy shape:
bin/generate-tiles is invoked inside the tools container; our
equivalent contract is a zip-shipped package driven by a thin script —
see cli.py docstring). The test zips ``sparktiles/``, runs a driver
from a neutral cwd with no PYTHONPATH, and checks the build output —
proving every import resolves from the shipped archive, not the repo
checkout, and that get_spark defers to the submitted --master."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DRIVER = """\
import json
from sparktiles.cli import main
from sparktiles.session import get_spark

main(["build-tiles", "--store", {store!r}, "--minzoom", "0",
      "--maxzoom", "2", "--mid-zoom", "1", "--synthetic-pages", "120"])
spark = get_spark()
print("MASTER=" + spark.sparkContext.master)
"""


def test_spark_submit_py_files(tmp_path):
    import pyspark

    submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    pkg_zip = tmp_path / "sparktiles.zip"
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "sparktiles").rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    store = tmp_path / "store"
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER.format(store=str(store)))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [str(submit), "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(pkg_zip), str(driver)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300)
    out = proc.stdout
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert '"tiles": 21' in out, out[-2000:]  # z0-z2 full universe
    # --master from spark-submit won, not the local[N] default
    assert "MASTER=local[4]" in out
    assert (store / "_manifest.json").exists()
