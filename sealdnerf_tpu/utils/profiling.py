"""Tracing / profiling hooks (SURVEY.md §5).

The reference's observability is ad-hoc cuda-event timers around GUI steps
plus a wall-clock timer.json. Here:
- `profile_trace(logdir)`: context manager around jax.profiler.trace — gives
  full XLA execution traces viewable in TensorBoard/Perfetto (enable with
  --profile on any CLI).
- `StepTimer`: EMA step timer for the train loop (the GUI's ms/FPS overlay).
- `enable_nan_debugging()`: jax_debug_nans, the analog of the reference's
  commented-out torch.autograd.set_detect_anomaly (main_nerf.py:11).
"""

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging():
    import jax
    jax.config.update("jax_debug_nans", True)


class StepTimer:
    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ema_ms = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = (time.perf_counter() - self._t0) * 1000
        self.ema_ms = dt if self.ema_ms is None else \
            self.decay * self.ema_ms + (1 - self.decay) * dt
        return dt

    @property
    def fps(self) -> float:
        return 1000.0 / self.ema_ms if self.ema_ms else 0.0
