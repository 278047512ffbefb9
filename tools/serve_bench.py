"""Load generator for the `cli serve` daemon: concurrent clients, latency
percentiles, and effective micro-batch size.

Usage:
  python tools/serve_bench.py <base_url> <image.jpg> [n_requests] [concurrency]

Reports wall throughput, per-request latency p50/p95, and the server-side
batching efficiency (requests / device batches, from /healthz counters
before and after — the micro-batching win over 1-request-per-program
serving).
"""

from __future__ import annotations

import json
import sys
import threading
import time
import urllib.request


def get(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def metrics(base: str) -> dict:
    """Parse the daemon's Prometheus text exposition into {name: float}."""
    with urllib.request.urlopen(base + "/metrics", timeout=60) as r:
        text = r.read().decode()
    return {
        k: float(v)
        for k, v in (
            line.split() for line in text.splitlines()
            if line and not line.startswith("#")
        )
    }


def main() -> None:
    base = sys.argv[1].rstrip("/")
    payload = open(sys.argv[2], "rb").read()
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    conc = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    health0 = get(base + "/healthz")
    m0 = metrics(base)
    latencies: list[float] = []
    lock = threading.Lock()
    errors: list[str] = []
    it = iter(range(n))

    def worker():
        while True:
            with lock:
                try:
                    next(it)
                except StopIteration:
                    return
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(base + "/predict", data=payload)
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read())
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(str(e))
                continue
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    health1 = get(base + "/healthz")

    m1 = metrics(base)
    latencies.sort()
    served = health1["served"] - health0["served"]
    batches = m1["yolo_device_batches_total"] - m0["yolo_device_batches_total"]
    out = {
        "requests_ok": len(latencies),
        "errors": len(errors),
        "wall_s": round(wall, 3),
        "req_per_sec": round(len(latencies) / wall, 1),
        "latency_p50_ms": round(latencies[len(latencies) // 2] * 1e3, 1),
        "latency_p95_ms": round(
            latencies[int(len(latencies) * 0.95) - 1] * 1e3, 1
        ),
        "server_batch": health1["batch"],
        "served_delta": served,
        "device_batches_delta": int(batches),
        "effective_batch_fill": round(served / max(batches, 1), 2),
        "device_call_ms_avg": round(
            m1["yolo_device_call_seconds_avg"] * 1e3, 2
        ),
    }
    print(json.dumps(out))
    if errors:
        print("first error:", errors[0], file=sys.stderr)


if __name__ == "__main__":
    main()
