"""Logger factory — parity with the reference ``create_logger``
(`/root/reference/utils/utils.py:484-504`): INFO-level file handler at
``<base>/<name>.log`` plus DEBUG-level stream handler, timestamped."""

from __future__ import annotations

import logging
import os


def create_logger(base_path: str, log_name: str = "train") -> logging.Logger:
    os.makedirs(base_path, exist_ok=True)
    logger = logging.getLogger(f"{base_path}/{log_name}")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False  # keep lines out of any root handler (no dupes)
    if logger.handlers:  # idempotent across repeat calls in one process
        return logger
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    fh = logging.FileHandler(os.path.join(base_path, f"{log_name}.log"))
    fh.setLevel(logging.INFO)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger
