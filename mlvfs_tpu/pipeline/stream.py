"""Host→device streaming with prefetch.

Implements the reference's documented-but-never-implemented ``--prefetch``
option (README.md:42, absent from the option table main.c:1853-1882) as a
real pipeline stage: a background thread gathers packed frames from the
memory-mapped chunks and stages them on the device while the previous batch
computes, so disk I/O, host decode (LZMA/LJ92), PCIe upload, and device
compute overlap.
"""

from __future__ import annotations

import concurrent.futures
import threading


class BatchPrefetcher:
    """Iterator over (indices, fetched) pairs with ``depth`` batches in flight.

    ``fetch(indices)`` runs on a background thread; it should end with an
    async device transfer (jax.device_put) so upload overlaps compute too.
    """

    def __init__(self, fetch, batches, depth: int = 2):
        self._fetch = fetch
        self._batches = list(batches)
        self._depth = max(1, depth)
        # one worker per in-flight batch: compressed-clip host decode
        # (LZMA / native LJ92, both GIL-releasing) parallelizes across
        # batches instead of serializing on a single prefetch thread
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=self._depth)
        self._futures = []
        self._lock = threading.Lock()

    def __iter__(self):
        inflight = []
        batches = self._batches
        for i, idx in enumerate(batches[: self._depth]):
            inflight.append(self._pool.submit(self._fetch, idx))
        try:
            for i, idx in enumerate(batches):
                fut = inflight.pop(0)
                nxt = i + self._depth
                if nxt < len(batches):
                    inflight.append(self._pool.submit(self._fetch, batches[nxt]))
                yield idx, fut.result()
        finally:
            for fut in inflight:
                fut.cancel()
            self._pool.shutdown(wait=False)


def enable_compile_cache():
    """Persistent XLA compile cache (compiles are expensive, esp. remotely)."""
    import os

    if os.environ.get("MLVFS_TPU_NO_CACHE") == "1":
        return
    import jax

    cache = os.environ.get(
        "MLVFS_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_enable_compilation_cache", True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
