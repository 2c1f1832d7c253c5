"""Multi-host initialization + rank-zero gating + preemption handling.

The reference delegates multi-rank concerns to PyTorch-Lightning
(``rank_zero_only`` at train.py:88; NCCL under the strategies).  Here:

- ``maybe_initialize_distributed()`` — calls ``jax.distributed.initialize()``
  when a multi-host environment is detected (coordinator env vars / TPU pod);
  no-op on a single host.
- ``is_main_process()`` — rank-zero gate for logging/checkpoint writes.
- ``PreemptionGuard`` — SIGTERM/SIGINT turn into a flag the train loop polls,
  so a preempted TPU job checkpoints and exits cleanly instead of dying
  mid-step (SURVEY.md §5.3: the reference has no failure handling).
"""

from __future__ import annotations

import os
import signal
import threading

from ..utils.log import get_logger

logger = get_logger("distributed")

_initialized = False


def maybe_initialize_distributed() -> None:
    global _initialized
    if _initialized:
        return
    multi_host = any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if multi_host:
        import jax

        jax.distributed.initialize()
        logger.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
    _initialized = True


def is_main_process() -> bool:
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True


class PreemptionGuard:
    """Installs SIGTERM/SIGINT handlers that request a graceful stop."""

    def __init__(self, enabled: bool = True):
        self._stop = threading.Event()
        self._prev = {}
        if not enabled:
            return
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:  # not the main thread
                pass

    def _handler(self, signum, frame):
        logger.warning("signal %s received — will checkpoint and stop", signum)
        self._stop.set()
        prev = self._prev.get(signum)
        if signum == signal.SIGINT and callable(prev):
            # second Ctrl-C falls through to the default handler
            signal.signal(signal.SIGINT, prev)

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()
