"""Multi-process launcher for multi-host training.

Replaces the reference's mpirun wrapper (run_tf_train_local.sh:21-101:
hostfile + `mpirun -np N ... python3 tf_train_tdnn.py`) with
jax.distributed bootstrap:

    # all processes on this machine (e.g. one per TPU pod host):
    python -m voxsrc2020_speaker_verification_tpu.cli.launch \
        --num-processes 2 --coordinator localhost:12355 -- \
        --recipe res2net_vox2_dev_aug --data-root data --synthetic --max-steps 5

    # across machines, run with --process-offset i on machine i (the
    # coordinator address must point at process 0's machine).

Everything after `--` is forwarded to cli.train, plus the per-process
--coordinator/--process-id/--num-processes flags.  Output of process 0
streams through; other ranks log to launch_rank<i>.log.
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--num-processes", type=int, required=True,
                   help="total process count across all machines")
    p.add_argument("--local-processes", type=int, default=None,
                   help="processes to spawn here (default: all)")
    p.add_argument("--process-offset", type=int, default=0,
                   help="first process id on this machine")
    p.add_argument("--coordinator", default="localhost:12355")
    return p


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if "--" in argv:
        split = argv.index("--")
        own, fwd = argv[:split], argv[split + 1:]
    else:
        own, fwd = argv, []

    args = build_parser().parse_args(own)

    local = args.local_processes or args.num_processes
    procs = []
    for i in range(local):
        pid = args.process_offset + i
        cmd = [
            sys.executable, "-m",
            "voxsrc2020_speaker_verification_tpu.cli.train",
            "--coordinator", args.coordinator,
            "--process-id", str(pid),
            "--num-processes", str(args.num_processes),
            *fwd,
        ]
        if pid == 0:
            procs.append((pid, subprocess.Popen(cmd), None))
        else:
            log = open(f"launch_rank{pid}.log", "w")
            procs.append((pid, subprocess.Popen(cmd, stdout=log, stderr=log), log))

    rc = 0
    for pid, proc, log in procs:
        code = proc.wait()
        if log:
            log.close()
        if code != 0:
            print(f"rank {pid} exited with {code}", file=sys.stderr)
            rc = rc or code
    sys.exit(rc)


if __name__ == "__main__":
    main()
