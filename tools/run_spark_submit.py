"""Evidence run for the north rule's `spark-submit --py-files` contract.

Zips bloom_filter_spark/, then drives the two job entrypoints exactly the
way a cluster user would:

    spark-submit --py-files sketchlib.zip jobs/job_build.py  --input ... \
        --kind bloom --col tokens --checkpoint ... --sketch-id demo
    spark-submit --py-files sketchlib.zip jobs/job_probe.py  --checkpoint ...

and records both JSON outputs to BENCH/spark_submit_demo.json.  The zip is
the only artifact shipped (no repo PYTHONPATH leaks into the workers), so
a success here proves the package is self-contained under --py-files.

Usage: python tools/run_spark_submit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "sketchlib.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "bloom_filter_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bloom_filter_spark.sources.fixtures import ensure_fixtures, sf_name_of_dir
    fx = ensure_fixtures(sf_name_of_dir(sf_dir))
    tokens = os.path.join(fx, "tokens.parquet")

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")
    work = tempfile.mkdtemp(prefix="spark_submit_demo_")
    zpath = build_zip(work)
    ckpt = os.path.join(work, "ckpt")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_MASTER"] = "local[8]"
    env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "8"

    def run(script: str, *extra: str) -> dict:
        # run a COPY of the entrypoint from a neutral cwd: the entrypoints
        # prepend their own grandparent dir to sys.path (repo-checkout
        # convenience), so running the copy makes the --py-files zip the
        # only way the driver OR the workers can resolve the package
        script_copy = os.path.join(work, script)
        shutil.copyfile(os.path.join(REPO, "jobs", script), script_copy)
        cmd = [spark_submit, "--py-files", zpath, script_copy, *extra]
        p = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=work, env=env, timeout=900)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise SystemExit(f"{script} failed rc={p.returncode}")
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        return json.loads(line)

    build_out = run("job_build.py", "--input", tokens, "--kind", "bloom",
                    "--col", "tokens", "--n", "70000", "--p", "0.01",
                    "--checkpoint", ckpt, "--sketch-id", "demo_bloom")
    probe_out = run("job_probe.py", "--checkpoint", ckpt,
                    "--sketch-id", "demo_bloom", "--kind", "bloom",
                    "--probes", os.path.join(fx, "probes_present.parquet"),
                    "--col", "token")
    out = {"sf_dir": sf_dir, "zip": "sketchlib.zip (package only, no repo "
           "PYTHONPATH)", "build": build_out, "probe": probe_out}
    with open(os.path.join(REPO, "BENCH", "spark_submit_demo.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
