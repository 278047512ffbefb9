"""Training stall watchdog: detect a wedged device op and hard-exit so a
supervisor can resume from the last completed-epoch checkpoint.

The reference has no analog — its failure story is "the interrupted epoch
is lost" (train.py:204-209 saves only at epoch end).  This subsystem
exists because the failure mode is real on relay-attached TPU hosts
(hit live in round 3, docs/DESIGN.md): a device op can block forever
inside the runtime, freezing the training process — host CPU time stops
accumulating — while it holds the run directory.  One such stall landed
inside a checkpoint save, which is why the crash-window rename-aside
guard in train/checkpoint.py exists.

No Python exception can interrupt a blocked runtime call and the JAX
client is poisoned after one, so in-process recovery is impossible by
design.  The watchdog therefore does the only safe thing: a daemon thread
watches a heartbeat the train loop touches once per step (plus eval and
checkpoint boundaries — any host-side freeze stops the beats), and when
the gap exceeds the timeout it logs loudly and hard-exits with
``STALL_EXIT_CODE`` so a fresh process can ``cli train --resume true``
(tools/train_supervised.sh is that loop).

Sizing the timeout: it must exceed the longest LEGITIMATE beat gap —
first-batch remote compiles and the first full-mAP eval compile both cost
minutes through the relay — so hardware runs use ~900-1800 s.  0 disables
the watchdog (the default; short CPU runs and tests never arm it).
"""

from __future__ import annotations

import os
import sys
import threading
import time

STALL_EXIT_CODE = 117  # distinct from OS/JAX codes; supervisors match it


class StallWatchdog:
    """Daemon-thread heartbeat monitor; ``beat()`` is lock-free (a single
    float store) so the train loop can call it every step for free."""

    def __init__(self, timeout_s: float, log=None, _exit=os._exit):
        """``log``: optional callable(msg) — e.g. a bound logger method."""
        if timeout_s <= 0:
            raise ValueError("use timeout_s > 0 (0 means: don't construct)")
        self.timeout_s = float(timeout_s)
        self._log = log
        self._exit = _exit
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def beat(self) -> None:
        self._last = time.monotonic()

    def start(self) -> "StallWatchdog":
        self._last = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, name="stall-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def _run(self) -> None:
        poll = min(self.timeout_s / 4.0, 30.0)
        while not self._stop.wait(poll):
            gap = time.monotonic() - self._last
            if gap > self.timeout_s:
                msg = (
                    f"stall watchdog: no training heartbeat for {gap:.0f}s "
                    f"(timeout {self.timeout_s:.0f}s) — a device op is "
                    f"likely wedged; exiting {STALL_EXIT_CODE} for a "
                    "supervised resume (cli train --resume true)"
                )
                if self._log is not None:
                    try:
                        self._log(msg)
                    except Exception:
                        pass
                print(msg, file=sys.stderr, flush=True)
                # os._exit: the main thread may be unrecoverably blocked
                # inside the runtime; normal interpreter shutdown (atexit,
                # buffered IO) could block behind it.
                self._exit(STALL_EXIT_CODE)
