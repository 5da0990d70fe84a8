"""Serving throughput: PolicyServer steps/s across M concurrent streams.

    python benchmarks/serve_bench.py --model models/<run>.nn --streams 64

Measures steady-state policy steps/s (one step = one action for every
stream) and per-stream latency.  Compare --streams 1 vs 64 to see dispatch
amortization; the per-step cost is dominated by dispatch latency until the
batch fills the MXU.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the timed loop "
                         "(inspect device timelines in TensorBoard)")
    ap.add_argument("--device", action="store_true",
                    help="device-throughput mode: enqueue steps via "
                         "step_device (no per-step host transfer) and sync "
                         "once — measures chip-side step cost, excluding "
                         "host/tunnel round-trip latency")
    ap.add_argument("--fused", type=int, default=0, metavar="T",
                    help="fused mode: run T-step chunks via "
                         "PolicyServer.step_many (ONE dispatch per chunk, "
                         "lax.scan inside) — measures true per-step chip "
                         "cost even over a high-latency device link")
    ap.add_argument("--resident", action="store_true",
                    help="with --device: pre-stage the obs batch on the "
                         "device once and reuse it, so the timed loop "
                         "excludes the per-step host->device obs transfer "
                         "too (isolates pure chip step cost; on a remote "
                         "tunnel the obs upload otherwise dominates — e.g. "
                         "64 streams x 84x84x3 f32 = 5.4 MB/step)")
    a = ap.parse_args()
    if a.resident and not (a.device or a.fused):
        raise SystemExit(
            "--resident only affects --device/--fused modes; in the default "
            "sync mode the timed loop still includes per-step host transfer, "
            "so the flag would silently measure the wrong thing. Add "
            "--device (or --fused T), or drop --resident.")

    import jax
    from etmppo_tpu.serve import PolicyServer

    server = PolicyServer(a.model, max_streams=a.streams, greedy=a.greedy)
    server.reset(range(a.streams))
    obs = np.random.default_rng(0).random(
        (a.streams,) + tuple(server.observation_shape)).astype(np.float32)

    server.step(obs)  # compile
    # Reset so the timed window exercises normal in-episode steps.
    server.reset(range(a.streams))

    profiler = None
    if a.profile:
        from jax import profiler as profiler
        profiler.start_trace(a.profile)

    if a.fused:
        import jax.numpy as jnp
        T = a.fused
        if T > server.max_episode_steps:
            raise SystemExit(f"--fused {T} exceeds the episode budget "
                             f"({server.max_episode_steps})")
        obs_seq = jnp.asarray(np.random.default_rng(1).random(
            (T, a.streams) + tuple(server.observation_shape), np.float32))
        if a.resident:
            obs_seq = jax.device_put(obs_seq)
            jax.block_until_ready(obs_seq)
        server.step_many(obs_seq)  # compile
        server.reset(range(a.streams))
        chunks = max(1, a.steps // T)
        t0 = time.perf_counter()
        last = None
        for _ in range(chunks):
            server.reset(range(a.streams))  # episode boundary per chunk
            last = server.step_many(obs_seq)
        jax.block_until_ready(last)
        elapsed = time.perf_counter() - t0
        n_steps = chunks * T
        print(f"backend={jax.default_backend()} streams={a.streams} "
              f"steps={n_steps} mode=fused (chunk T={T}"
              + (", device-resident obs)" if a.resident else ")"))
        print(f"policy steps/s (x{a.streams} streams): "
              f"{n_steps * a.streams / elapsed:,.0f}")
        print(f"device time per batched step: {elapsed / n_steps * 1e3:.3f} ms")
        if profiler is not None:
            profiler.stop_trace()
            print(f"profiler trace written to {a.profile}")
        return
    if a.device:
        # All steps enqueue asynchronously; one sync at the end.  Wall time /
        # steps then approximates the per-step DEVICE cost (dispatch and any
        # host<->device RTT overlap with compute), vs the sync-path number
        # below which includes a full round trip per step.
        if a.resident:
            obs = jax.device_put(jax.numpy.asarray(obs))
            jax.block_until_ready(obs)
        t_host, last = 0, None
        t0 = time.perf_counter()
        for _ in range(a.steps):
            last = server.step_device(obs)
            t_host += 1
            if t_host >= server.max_episode_steps:
                server.reset(range(a.streams))  # included: part of serving
                t_host = 0
        import jax as _jax
        _jax.block_until_ready(last)
        elapsed = time.perf_counter() - t0
        per_step_ms = elapsed / a.steps * 1e3
        print(f"backend={jax.default_backend()} streams={a.streams} "
              f"steps={a.steps} mode=device-throughput"
              + (" (device-resident obs)" if a.resident else ""))
        print(f"policy steps/s (x{a.streams} streams): "
              f"{a.steps * a.streams / elapsed:,.0f}")
        print(f"device time per batched step: {per_step_ms:.2f} ms")
        if profiler is not None:
            profiler.stop_trace()
            print(f"profiler trace written to {a.profile}")
        return
    # Streams advance in lockstep, so the episode boundary can be tracked
    # with a host-side counter — no per-iteration device->host read of
    # server.steps inside the timed loop.  Resets are excluded from the
    # timing (pure step cost); their count is reported alongside.
    t_host = 0
    n_resets = 0
    reset_s = 0.0
    elapsed = 0.0
    for _ in range(a.steps):
        t0 = time.perf_counter()
        actions, values = server.step(obs)
        elapsed += time.perf_counter() - t0
        t_host += 1
        if t_host >= server.max_episode_steps:
            r0 = time.perf_counter()
            server.reset(range(a.streams))
            reset_s += time.perf_counter() - r0
            t_host = 0
            n_resets += 1
    per_step_ms = elapsed / a.steps * 1e3
    if profiler is not None:
        profiler.stop_trace()
        print(f"profiler trace written to {a.profile}")
    print(f"backend={jax.default_backend()} streams={a.streams} "
          f"steps={a.steps}")
    print(f"policy steps/s (x{a.streams} streams): "
          f"{a.steps * a.streams / elapsed:,.0f}")
    print(f"latency per batched step: {per_step_ms:.2f} ms")
    if n_resets:
        print(f"episode resets: {n_resets} (excluded from timing, "
              f"{reset_s / n_resets * 1e3:.2f} ms each)")


if __name__ == "__main__":
    main()
