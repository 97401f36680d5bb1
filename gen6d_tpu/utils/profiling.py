"""Tracing / profiling helpers (the aux subsystem the reference lacks —
SURVEY.md §5: only time.time() and tqdm there; here: jax.profiler traces and
simple wall-clock scopes).
"""
import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir='data/profile'):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall-clock scopes: Timer.scope('detect') -> report()."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def scope(self, name, sync=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        return {k: {'total_s': round(v, 4),
                    'mean_ms': round(1e3 * v / self.counts[k], 2),
                    'count': self.counts[k]}
                for k, v in sorted(self.totals.items())}
