#!/usr/bin/env python
"""End-to-end `spark-submit --py-files` deployment smoke (north_rule: the
pipeline must run via spark-submit --py-files on a cluster).

What it proves, from a cwd OUTSIDE the repo so `ditto_spark` can only come
from the shipped zip (the launcher script only puts its own parent dir on
sys.path):

1. packaging — `zip -r ditto_spark.zip ditto_spark` is complete: every
   driver- and executor-side import resolves from the archive;
2. launch — `scripts/run_pipeline.py` runs under spark-submit's session
   bootstrap (it adopts the launcher-created SparkSession instead of
   building its own);
3. resume — a second submit with the same --output/--run-id skips every
   stage (`resumed: true` across the board) and reproduces the identical
   entity/cluster counts from the committed checkpoints.

Usage:  python scripts/submit_smoke.py [n_base]   (default 400)

Exits non-zero with a diagnostic if any of the three properties fails.
On a real cluster the same invocation applies with --master yarn/k8s; this
script uses local[8] because the sandbox has no cluster manager.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(workdir: str, zip_path: str, ckpt: str, n_base: int) -> dict:
    cmd = [
        "spark-submit",
        "--master", "local[8]",
        "--py-files", zip_path,
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.sql.shuffle.partitions=16",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        os.path.join(workdir, "scripts", "run_pipeline.py"),
        "--synthetic", str(n_base),
        "--output", ckpt,
        "--run-id", "smoke1",
        "--tau", "0.5",
    ]
    proc = subprocess.run(
        cmd, cwd=workdir, capture_output=True, text=True, timeout=900
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:] + "\n")
        raise SystemExit(f"spark-submit failed rc={proc.returncode}")
    # the pipeline prints exactly one JSON summary line on stdout
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(proc.stdout[-4000:] + "\n")
    raise SystemExit("no JSON summary line in spark-submit output")


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    workdir = tempfile.mkdtemp(prefix="ditto_submit_")
    try:
        zip_path = os.path.join(workdir, "ditto_spark.zip")
        base = os.path.join(workdir, "pkg")
        shutil.copytree(
            os.path.join(REPO, "ditto_spark"),
            os.path.join(base, "ditto_spark"),
            ignore=shutil.ignore_patterns("__pycache__"),
        )
        shutil.make_archive(zip_path[:-4], "zip", base)
        os.makedirs(os.path.join(workdir, "scripts"))
        shutil.copy(
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            os.path.join(workdir, "scripts", "run_pipeline.py"),
        )
        ckpt = os.path.join(workdir, "ckpt")

        cold = _submit(workdir, zip_path, ckpt, n_base)
        assert cold["entities"] > 0 and cold["clusters"] > 0, cold
        assert all(not s["resumed"] for s in cold["stages"]), cold
        print(f"cold run OK: {json.dumps(cold)}")

        warm = _submit(workdir, zip_path, ckpt, n_base)
        assert all(s["resumed"] for s in warm["stages"]), warm
        assert (warm["entities"], warm["clusters"]) == (
            cold["entities"],
            cold["clusters"],
        ), (cold, warm)
        print(f"resume run OK: {json.dumps(warm)}")
        print(
            json.dumps(
                {
                    "metric": "spark_submit_pyfiles_smoke",
                    "ok": True,
                    "n_base": n_base,
                    "entities": cold["entities"],
                    "clusters": cold["clusters"],
                    "stages_resumed_on_rerun": len(warm["stages"]),
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
