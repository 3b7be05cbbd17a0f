"""Deployment surface: spark-submit --py-files (north-rule requirement).

tools/submit.sh packages rabbittclust_spark into a zip and runs the full
CLI pipeline through spark-submit — the exact invocation a multi-executor
cluster uses (swap --master for yarn/k8s).  This test executes it for real
in its own JVM, so a packaging regression (missing module in the zip,
import that only works from the repo checkout) fails here and not on a
cluster.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    out_dir = str(tmp_path / "submit_out")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "submit.sh"),
         "/root/testdata/sf0.001/documents.parquet", out_dir, "local[4]"],
        capture_output=True, text=True, timeout=280,
        env={**os.environ, "PYSPARK_PYTHON": os.environ.get(
            "PYSPARK_PYTHON", "python3")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "assignments:" in proc.stdout
    # the submitted job wrote real stage tables
    assert os.path.exists(os.path.join(out_dir, "assignments"))
    assert os.path.exists(os.path.join(out_dir, "sketches", "_manifest.json"))
