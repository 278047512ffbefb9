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


def main() -> None:
    base = sys.argv[1].rstrip("/")
    payload = open(sys.argv[2], "rb").read()
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    conc = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    health0 = get(base + "/healthz")
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

    latencies.sort()
    served = health1["served"] - health0["served"]
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
    }
    print(json.dumps(out))
    if errors:
        print("first error:", errors[0], file=sys.stderr)


if __name__ == "__main__":
    main()
