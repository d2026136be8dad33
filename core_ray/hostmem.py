"""Host memory-path tuning.

On Firecracker-style VMs with lazily-faulted guest memory and transparent
huge pages set to ``[always]``, every first touch of a fresh 2MB huge page
stalls on the hypervisor: measured 11 MB/s first-touch fill vs 1269 MB/s with
THP disabled for the process (115x).  ``PR_SET_THP_DISABLE`` is process-local
and inherited across fork+exec, so calling :func:`disable_thp` in the driver
BEFORE ``ray.init`` propagates to the raylet and every worker it spawns.

This is a no-op on hosts where the prctl is unavailable; on bare metal with
properly backed huge pages it costs a little TLB reach, so it is only called
from the benchmark/test entry points, never from library import.
"""

from __future__ import annotations

import ctypes

PR_SET_THP_DISABLE = 41


def tune_allocator() -> None:
    """Keep glibc from mmap/munmap-cycling medium allocations.

    Every numpy/Arrow temporary over the default 128KB mmap threshold costs a
    fresh mmap (fault every page) + munmap (TLB shootdown IPIs to all cores)
    per use; with ~32 worker processes doing batch work concurrently this
    measurably collapses throughput.  Raising the thresholds makes freed
    blocks stay on the heap freelist for reuse.  Must run BEFORE ray.init so
    the raylet and all workers inherit the environment.
    """
    import os

    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(256 * 1024 * 1024))


def disable_thp() -> bool:
    """Disable transparent huge pages for this process tree. Returns True on
    success; silently False where unsupported (non-Linux, old kernels)."""
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        return libc.prctl(PR_SET_THP_DISABLE, 1, 0, 0, 0) == 0
    except Exception:
        return False
