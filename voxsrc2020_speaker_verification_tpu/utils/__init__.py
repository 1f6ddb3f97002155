import os

from . import datadir  # noqa: F401


def resolve_num_workers(requested=None, cores=None):
    """Default worker/thread count for host-side feeder pools: min(4, host
    cores), floor 1.  A fixed 4 on a 2-core host oversubscribes the XLA
    dispatch threads the jitted step runs on (measured rendezvous starvation,
    ROADMAP.md round 3); explicit values pass through untouched.

    `cores` honors cgroup/affinity limits via sched_getaffinity when the
    platform has it (a container pinned to 2 cores of a 64-core box must
    resolve 2, not 4), falling back to os.cpu_count().
    """
    if requested is not None:
        return requested
    if cores is None:
        try:
            cores = len(os.sched_getaffinity(0))
        except (AttributeError, OSError):
            cores = os.cpu_count() or 4
    return max(1, min(4, cores))
