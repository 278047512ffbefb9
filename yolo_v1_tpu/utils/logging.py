"""Logger factory — parity with the reference ``create_logger``
(`/root/reference/utils/utils.py:484-504`): INFO-level file handler at
``<base>/<name>.log`` plus DEBUG-level stream handler, timestamped.

Multi-process: only process 0 gets the FILE handler (every host writing
the same ``train.log`` on a shared filesystem interleaves corruptly);
other processes keep the stream handler, prefixed with their process
index so interleaved console output stays attributable.  Callers must
run ``jax.distributed.initialize`` (parallel/mesh.maybe_distributed_init)
BEFORE creating loggers — querying the process index initializes the JAX
backend, which must happen after distributed init.
"""

from __future__ import annotations

import logging
import os


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover - jax missing/uninitializable
        return 0


def create_logger(base_path: str, log_name: str = "train") -> logging.Logger:
    os.makedirs(base_path, exist_ok=True)
    rank = _process_index()
    logger = logging.getLogger(f"{base_path}/{log_name}")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False  # keep lines out of any root handler (no dupes)
    if logger.handlers:  # idempotent across repeat calls in one process
        return logger
    tag = "" if rank == 0 else f"[p{rank}] "
    fmt = logging.Formatter(
        f"%(asctime)s - {tag}%(name)s - %(levelname)s - %(message)s"
    )
    if rank == 0:  # run-dir writes are coordinator-only (multi-host safe)
        fh = logging.FileHandler(os.path.join(base_path, f"{log_name}.log"))
        fh.setLevel(logging.INFO)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    return logger
