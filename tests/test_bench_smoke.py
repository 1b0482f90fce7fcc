"""bench.py is the driver's perf harness — a crash there forfeits the
round's BENCH record, so its CLI contract gets a real subprocess smoke:
one tiny query at sf0.001, plus the hardened edge cases (custom dir
name, BENCH_RUNS=0)."""

import json
import os
import subprocess
import sys


def _run_bench(env_extra, args):
    env = {**os.environ, **env_extra}
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py", *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_emits_one_json_line_for_named_query():
    res = _run_bench(
        {"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001", "BENCH_RUNS": "1"},
        ["x35_epoch_shuffle"],
    )
    assert res["n_queries"] == 1 and res["n_failed"] == 0
    assert res["sf"] == 0.001 and res["queries"]["x35_epoch_shuffle"] > 0


def test_bench_survives_custom_dir_name_and_zero_runs(tmp_path):
    # a non-sf-named dataset dir and BENCH_RUNS=0 must bench, not crash
    import shutil

    alias = tmp_path / "mydata"
    shutil.copytree("/root/testdata/sf0.001", alias)
    res = _run_bench(
        {"SPARK_GRAFT_SF_DIR": str(alias), "BENCH_RUNS": "0"},
        ["c1_projection"],
    )
    assert res["n_failed"] == 0 and res["sf"] == -1.0
    assert res["queries"]["c1_projection"] > 0
