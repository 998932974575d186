"""End-to-end `spark-submit --py-files` smoke on a real multi-executor
local-cluster — the north rule's shipping mode (reference run style:
``great_expectations/cli`` drives a context; here the job ships as a
zip exactly as a 1000-executor cluster would receive it).

Launches ``jobs/validate_transcripts.py`` under
``local-cluster[2,1,2048]`` (two SEPARATE executor JVMs with their own
python workers — not local[k] threads), package distributed via
``--py-files``, and asserts the emitted run JSON: grouped strategy
validates every synthesized day-partition and correctly reports
``success=false`` because the synthesizer PLANTS violations (duplicate
(conv_id, turn_idx), off-vocabulary roles, referential gaps).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT),
    reason="full Spark distribution (spark-submit) not available",
)


def _build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "great_expectations_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith((".py", ".json")):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))


def test_spark_submit_pyfiles_local_cluster(tmp_path):
    zip_path = str(tmp_path / "gx_spark_pkg.zip")
    _build_zip(zip_path)
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local-cluster[2,1,2048]",
        "--py-files", zip_path,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.executor.memory=1500m",
        "--conf", "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=1",
        os.path.join(REPO, "jobs", "validate_transcripts.py"),
        "--synthesize", "300",
        "--strategy", "grouped",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ]
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in stdout: {proc.stdout[-2000:]}"
    out = json.loads(lines[-1])
    assert out["strategy"] == "grouped"
    assert out["partitions_total"] >= 1
    assert out["rows"] > 0
    # the synthesizer plants violations on purpose — finding them IS the pass
    assert out["success"] is False
