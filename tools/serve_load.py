"""HTTP load driver for tools/serve.py — measured serving latency/throughput.

Replaces the ad-hoc round-4 measurement clients with a reusable tool.  It
POSTs a generated PNG to /upscale: first N sequential warm requests (after a
discarded cold one), then R rounds of C-way concurrent bursts, and prints one
JSON line per phase plus the server's /healthz dispatch percentiles.

Methodology notes (docs/serving.md): on a 1-core host the load generator
shares the core with the server, so concurrent figures are LOWER BOUNDS —
keep the client lean (bytes are encoded once and reused; responses are
drained, not decoded).  SIGSTOP every other CPU job before measuring.

Usage:
  python tools/serve_load.py --port 8200 --size 128x128 --warm 20 \
      --concurrency 8 --rounds 4
"""
import argparse
import io
import json
import statistics
import threading
import time
import urllib.request


def make_png(h, w, nc=1, seed=0):
    import numpy as np
    from PIL import Image
    rng = np.random.RandomState(seed)
    arr = (rng.rand(h, w, nc) * 255).astype("uint8")
    img = Image.fromarray(arr[..., 0] if nc == 1 else arr,
                          mode="L" if nc == 1 else "RGB")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def post(url, body, timeout=600):
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": "image/png"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        out = r.read()  # drain; do NOT decode (keeps the client lean)
    return time.perf_counter() - t0, len(out)


def healthz(base):
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        return json.loads(r.read())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--size", default="128x128", help="HxW of the LR input")
    ap.add_argument("--nc", type=int, default=1)
    ap.add_argument("--warm", type=int, default=20,
                    help="sequential warm requests (one cold discarded first)")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args(argv)

    h, w = (int(d) for d in args.size.split("x"))
    body = make_png(h, w, args.nc)
    base = f"http://{args.host}:{args.port}"
    url = base + "/upscale"

    cold, nbytes = post(url, body)
    print(json.dumps({"phase": "cold_first", "s": round(cold, 3),
                      "resp_bytes": nbytes}), flush=True)

    if args.warm > 0:
        seq = [post(url, body)[0] for _ in range(args.warm)]
        print(json.dumps({
            "phase": "warm_single", "n": args.warm,
            "median_ms": round(statistics.median(seq) * 1e3, 1),
            "min_ms": round(min(seq) * 1e3, 1),
            "max_ms": round(max(seq) * 1e3, 1)}), flush=True)

    rates = []  # per-round completed-requests/s (failed requests excluded)
    for r in range(args.rounds):
        results = [None] * args.concurrency

        def worker(i):
            try:
                results[i] = post(url, body)[0]
            except Exception as e:  # keep the burst alive; reported below
                results[i] = repr(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        ok = [t for t in results if isinstance(t, float)]
        rates.append(len(ok) / wall)
        print(json.dumps({
            "phase": "concurrent", "round": r, "c": args.concurrency,
            "wall_ms": round(wall * 1e3, 1),
            "req_per_s": round(len(ok) / wall, 1),
            "req_ms": [round(t * 1e3, 1) for t in ok],
            "errors": [t for t in results if not isinstance(t, float)],
        }), flush=True)

    if rates:
        # Steady state: round 0 can absorb lazy batch-program compiles, so
        # the summary reports medians both with and without it.
        warm_rates = rates[1:] or rates
        print(json.dumps({
            "phase": "concurrent_summary", "rounds": args.rounds,
            "c": args.concurrency,
            "median_req_per_s": round(statistics.median(rates), 1),
            "warm_median_req_per_s": round(
                statistics.median(warm_rates), 1)}), flush=True)

    hz = healthz(base)
    print(json.dumps({"phase": "healthz",
                      **{k: hz.get(k) for k in
                         ("requests", "batches", "errors",
                          "batch_ms_p50", "batch_ms_p95")}}), flush=True)


if __name__ == "__main__":
    main()
