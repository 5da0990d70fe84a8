"""Wire-level serving benchmark: JSON vs binary obs codec over HTTP.

    python benchmarks/serve_http_bench.py --model models/<run>.nn \
        --streams 64 --T 16 --iters 8

Spins up the stdlib HTTP front-end (serve_http.py) on an ephemeral local
port and drives /step_many with the same observation sequences encoded two
ways:

* JSON:   {"obs_seq": [...nested lists...]} — numbers as decimal text.
* binary: raw little-endian float32 body (Content-Type:
  application/octet-stream; explicit X-T header carries the step count).

Reports request bytes, end-to-end policy-steps/s, and the codec speedup.
Loopback HTTP removes network latency, so the measured difference is pure
encode/decode + byte-volume cost — a lower bound on the real-network win,
where the ~4x byte reduction also buys bandwidth.
"""
import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def post(url, data, headers):
    req = urllib.request.Request(url, data=data, headers=headers)
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--T", type=int, default=16,
                    help="steps per /step_many request")
    ap.add_argument("--iters", type=int, default=8,
                    help="timed requests per codec")
    a = ap.parse_args()

    from etmppo_tpu.serve_http import serve

    httpd = serve(a.model, streams=a.streams, port=0, greedy=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    with urllib.request.urlopen(base + "/info") as r:
        info = json.loads(r.read())
    obs_shape = tuple(info["observation_shape"])
    rng = np.random.default_rng(0)
    obs_seq = rng.random((a.T, a.streams) + obs_shape).astype(np.float32)
    steps_per_req = a.T * a.streams

    codecs = {
        "json": (json.dumps({"obs_seq": obs_seq.tolist()}).encode(),
                 {"Content-Type": "application/json"}),
        "binary": (obs_seq.astype("<f4").tobytes(),
                   {"Content-Type": "application/octet-stream",
                    "X-T": str(a.T)}),
    }
    results = {}
    for name, (body, headers) in codecs.items():
        post(base + "/reset",
             json.dumps({"streams": list(range(a.streams))}).encode(),
             {"Content-Type": "application/json"})  # warm reset
        # The episode budget bounds total steps; reset between requests.
        post(base + "/step_many", body, headers)  # warmup (compile)
        t_total = 0.0
        for _ in range(a.iters):
            post(base + "/reset", json.dumps(
                {"streams": list(range(a.streams))}).encode(),
                {"Content-Type": "application/json"})
            t0 = time.perf_counter()
            post(base + "/step_many", body, headers)
            t_total += time.perf_counter() - t0
        sps = a.iters * steps_per_req / t_total
        results[name] = {"request_bytes": len(body),
                         "policy_steps_per_second": round(sps, 1)}
        print(f"{name:6s}: {len(body) / 1e6:8.2f} MB/request   "
              f"{sps:10,.0f} policy-steps/s end-to-end")
    httpd.shutdown()
    speedup = (results["binary"]["policy_steps_per_second"]
               / results["json"]["policy_steps_per_second"])
    bytes_ratio = (results["json"]["request_bytes"]
                   / results["binary"]["request_bytes"])
    print(json.dumps({"metric": "serve_http_codec", "T": a.T,
                      "streams": a.streams, **results,
                      "binary_speedup": round(speedup, 2),
                      "json_bytes_over_binary": round(bytes_ratio, 2)}))


if __name__ == "__main__":
    main()


# The /step_many reset-between-requests pattern keeps every request inside
# the episode budget regardless of --T * --iters (exhausted streams would
# otherwise freeze silently and measure less work than claimed).
