"""Regenerate the cross-stack end-task equivalence artifact.

Runs BOTH cross-stack system tests (TDNN family + deep Res2Net) with their
summary env hooks set, then merges the two summaries into one
``cross_stack_r{N}.json`` at the repo root so the driver/judge can track
end-task equivalence per round, like BENCH_r{N}/MULTICHIP_r{N}.

Usage: python scripts/cross_stack_report.py [round_number] [out.json]
Takes ~40 min on a 2-core host (two TF-CPU reference-system oracles).
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNS = [
    ("tdnn", "tests/test_cross_stack_system.py", "CROSS_STACK_SUMMARY"),
    ("res2net", "tests/test_cross_stack_res2net.py",
     "CROSS_STACK_SUMMARY_RES2NET"),
]


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(REPO, f"cross_stack_r{int(rnd):02d}.json"))
    merged = {}
    with tempfile.TemporaryDirectory() as td:
        for tag, test, env_key in RUNS:
            tmp = os.path.join(td, f"{tag}.json")
            env = dict(os.environ, **{env_key: tmp})
            res = subprocess.run(
                [sys.executable, "-m", "pytest", test, "-x", "-q"],
                cwd=REPO, env=env, timeout=5400,
            )
            if res.returncode != 0:
                merged[tag] = {"status": "FAILED",
                               "returncode": res.returncode}
            elif not os.path.exists(tmp):
                # pytest exited 0 without writing a summary: the gate was
                # SKIPPED (no reference repo / no TF on this host) -- an
                # environment gap, not a parity failure
                merged[tag] = {"status": "skipped"}
            else:
                merged[tag] = {"status": "ok", **json.load(open(tmp))}
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
        f.write("\n")
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
