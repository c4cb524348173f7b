"""bench.py must stay runnable and emit the driver contract.

The recorded bench artifact is the round's performance evidence; a
bench.py broken by an operator rename fails silently until the driver
runs it (the r04 lesson). This smoke test runs the REAL harness as a
subprocess at toy scale and validates the emitted JSON contract:
one line, required keys, the steal-gated attempt structure."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        BENCH_WEB_ROWS="3000",
        BENCH_MAX_ATTEMPTS="1",
        BENCH_STEAL_GATE="100",   # never retry at toy scale
        BENCH_RETRY_SLEEP="0",
        SPARK_DRIVER_MEMORY="4g",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout[-2000:]
    out = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf", "web_rows",
                "kept_rows", "docs_per_sec", "cpus", "steal_pct",
                "steal_gate_pct", "attempts", "chosen_attempt",
                "headline_steal_pct", "q2_control_seed", "q2_best",
                "q2_tolerance", "query_steal", "query_attempts"):
        assert key in out, key
    assert out["unit"] == "sec" and out["web_rows"] == 3000
    assert len(out["attempts"]) >= 1
    chosen = out["attempts"][out["chosen_attempt"]]
    assert chosen["docs_per_sec"] == out["docs_per_sec"]
    for a in out["attempts"]:
        for key in ("q1_filter_scrub_pipeline", "q2_pipeline_column_only",
                    "docs_per_sec", "kept_rows", "steal_pct"):
            assert key in a, key
    # every suite query ran and timed positive
    assert len(out["queries"]) >= 20
    assert all(v >= 0 for v in out["queries"].values())
    # VERDICT r05 item 1: every non-headline recorded timing carries its
    # own steal window in the artifact — no unprovable single-shots
    headline = {"q1_filter_scrub_pipeline", "q2_pipeline_column_only"}
    assert set(out["query_steal"]) == set(out["queries"]) - headline
    for a in out["attempts"]:
        assert "q2_ratio_vs_best" in a and "accepted" in a
