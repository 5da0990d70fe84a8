"""Minimal HTTP front-end for PolicyServer: production serving over JSON.

No reference equivalent (the reference has no serving surface at all); this
completes the deployment story around ``PolicyServer`` (serve.py): one
process owns the device and the per-stream KV caches, remote clients drive
episodes over HTTP.

    python -m etmppo_tpu.serve_http --model models/run.nn --streams 64 --port 8765

API (JSON over POST, stdlib-only on both sides):

* ``POST /reset``  body ``{"streams": [0, 3, ...]}`` -> ``{"ok": true}``
  Resets those streams to fresh episodes (zero episodic memory).
* ``POST /step``   body ``{"obs": [[...], ...], "active": [true, ...]?}``
  ``obs`` is the full (streams, *obs_shape) batch as nested lists (rows of
  inactive streams may hold anything).  -> ``{"actions": [[...], ...],
  "values": [...], "steps": [...]}``.
* ``POST /step_many`` body ``{"obs_seq": [[[...], ...], ...],
  "active": [true, ...]?}`` — ``obs_seq`` is (T, streams, *obs_shape): T
  policy steps fused into ONE device program (``PolicyServer.step_many``'s
  scan), so per-step dispatch latency is amortized T-fold.  ->
  ``{"actions": [[[...], ...], ...], "values": [[...], ...],
  "steps": [...]}`` with actions (T, streams, branches) and values
  (T, streams).  Exhausted streams freeze instead of raising (step_device
  semantics).
* ``GET /info`` -> model/env metadata (obs shape, action branches, stream
  count, episode budget) so clients can self-configure.

Wire bandwidth is the real ceiling for image observations: one 84x84x3
float32 obs is ~85 KB as JSON-encoded numbers (several x the binary size),
so 256 streams x 1 step is ~21 MB binary / ~80+ MB JSON per /step request —
/step_many multiplies that by T.  The fused scan's measured 133k
policy-steps/s is a device-side number; over the wire the transport
dominates for image envs (vector-obs envs are fine).  For image serving use
the BINARY obs codec: POST the same routes with
``Content-Type: application/octet-stream`` and a raw little-endian float32
body — (streams, *obs_shape) for /step, (T, streams, *obs_shape) for
/step_many with a REQUIRED ``X-T`` header carrying T (the byte count must
equal T * streams * prod(obs_shape) * 4; a mismatch is a 400, never a silent
reshape).  An optional ``X-Streams`` header is validated against the
server's stream count.  The optional ``X-Active`` header carries the active
mask as comma-separated 0/1 tokens (strictly 0 or 1).  Responses stay JSON
(actions/values are small).  This removes JSON float encoding (~4x fewer
bytes, no number parsing) — the remaining cost is the raw obs bytes, which
is the floor any remote-obs design pays.

The device work runs on the single server thread that owns the JAX arrays
(requests serialize; batching across streams, not across requests, is the
throughput mechanism — submit all streams' observations in one /step).
"""
from __future__ import annotations

import argparse
import json
import sys
import traceback
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def make_handler(server_obj):
    class Handler(BaseHTTPRequestHandler):
        policy = server_obj
        # Per-request socket timeout: without it, one client that connects
        # and stalls (or half-sends a body) wedges the single-threaded
        # serving loop for everyone.  BaseHTTPRequestHandler honors this on
        # the connection socket.
        timeout = 30.0

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path != "/info":
                return self._send(404, {"error": "unknown path"})
            p = self.policy
            self._send(200, {
                "observation_shape": list(p.observation_shape),
                "action_branches": list(p.action_branches),
                "max_streams": p.max_streams,
                "max_episode_steps": p.max_episode_steps,
                "greedy": p.greedy,
            })

        def _binary_request(self, body: bytes):
            """Decode a raw float32 LE obs body into the equivalent JSON-dict
            request.  /step expects exactly (streams, *obs_shape) bytes;
            /step_many requires an explicit X-T header and exactly
            T * streams * prod(obs_shape) values — a byte count that merely
            happens to be a frame multiple is rejected, never silently
            reshaped into a scrambled stream/time layout."""
            p = self.policy
            streams_hdr = self.headers.get("X-Streams")
            if streams_hdr is not None and streams_hdr.strip() != str(p.max_streams):
                raise ValueError(
                    f"X-Streams={streams_hdr.strip()} does not match the "
                    f"server's {p.max_streams} streams (see /info)")
            frame = int(p.max_streams * np.prod(p.observation_shape, dtype=np.int64))
            n = len(body) // 4
            if len(body) % 4 or n == 0 or n % frame:
                raise ValueError(
                    f"binary body must be k * {frame} float32 values "
                    f"({p.max_streams} streams x obs {tuple(p.observation_shape)}), "
                    f"got {len(body)} bytes")
            flat = np.frombuffer(body, dtype="<f4")
            req = {}
            if self.path == "/step":
                if n != frame:
                    raise ValueError(
                        f"/step binary body must be exactly {frame} float32 "
                        f"values, got {n} (use /step_many for T-step bodies)")
                req["obs"] = flat.reshape(
                    (p.max_streams,) + tuple(p.observation_shape))
            else:
                t_hdr = self.headers.get("X-T")
                if t_hdr is None:
                    raise ValueError(
                        "binary /step_many requires an X-T header carrying "
                        "the step count T (refusing to infer the time/stream "
                        "layout from the byte count alone)")
                try:
                    t = int(t_hdr)
                except ValueError:
                    raise ValueError(f"X-T must be an integer, got {t_hdr!r}")
                if t <= 0 or t * frame != n:
                    raise ValueError(
                        f"X-T={t} implies {t * frame} float32 values "
                        f"({p.max_streams} streams x obs "
                        f"{tuple(p.observation_shape)}), got {n}")
                req["obs_seq"] = flat.reshape(
                    (t, p.max_streams) + tuple(p.observation_shape))
            active_hdr = self.headers.get("X-Active")
            if active_hdr is not None:
                tokens = [v.strip() for v in active_hdr.split(",")]
                if any(tok not in ("0", "1") for tok in tokens):
                    raise ValueError(
                        "X-Active must be comma-separated 0/1 tokens, got "
                        f"{active_hdr!r}")
                req["active"] = [tok == "1" for tok in tokens]
            return req

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if ctype == "application/octet-stream":
                    req = self._binary_request(body)
                else:
                    req = json.loads(body or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._send(400, {"error": f"bad request body: {e}"})
            if not isinstance(req, dict):
                return self._send(400, {
                    "error": f"request body must be a JSON object, "
                             f"got {type(req).__name__}"})
            try:
                if self.path == "/reset":
                    self.policy.reset(req.get("streams", []))
                    return self._send(200, {"ok": True})
                if self.path == "/step":
                    obs = np.asarray(req["obs"], np.float32)
                    active = req.get("active")
                    if active is not None:
                        active = np.asarray(active, bool)
                    actions, values = self.policy.step(obs, active=active)
                    return self._send(200, {
                        "actions": actions.tolist(),
                        "values": values.tolist(),
                        "steps": self.policy.steps.tolist(),
                    })
                if self.path == "/step_many":
                    obs_seq = np.asarray(req["obs_seq"], np.float32)
                    active = req.get("active")
                    if active is not None:
                        active = np.asarray(active, bool)
                    actions, values = self.policy.step_many(
                        obs_seq, active=active)
                    return self._send(200, {
                        "actions": np.asarray(actions).tolist(),
                        "values": np.asarray(values).tolist(),
                        "steps": self.policy.steps.tolist(),
                    })
                return self._send(404, {"error": "unknown path"})
            except (ValueError, KeyError, TypeError) as e:
                # PolicyServer validation errors (shape, exhausted streams,
                # bad ids) and malformed field types (e.g. {"obs": null})
                # come back as 400s with the message intact instead of a
                # dropped connection + server traceback.
                return self._send(400, {"error": str(e)})
            except AttributeError:
                # An AttributeError out of PolicyServer is almost always a
                # server-side bug, not bad input: log the traceback and
                # report it as a 500 rather than mislabeling it 400.
                traceback.print_exc(file=sys.stderr)
                return self._send(500, {"error": "internal server error"})

    return Handler


def serve(model_path: str, streams: int, port: int, greedy: bool = False,
          host: str = "127.0.0.1"):
    """Build the PolicyServer and return a ready (unstarted) HTTPServer.

    Separated from main() so tests can drive it on an ephemeral port.
    """
    from .serve import PolicyServer
    policy = PolicyServer(model_path, max_streams=streams, greedy=greedy)
    policy.reset(range(streams))
    return HTTPServer((host, port), make_handler(policy))


def main(argv=None):
    ap = argparse.ArgumentParser(description="HTTP policy serving")
    ap.add_argument("--model", required=True)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--greedy", action="store_true")
    a = ap.parse_args(argv)
    httpd = serve(a.model, a.streams, a.port, greedy=a.greedy, host=a.host)
    print(f"serving {a.model} on http://{a.host}:{httpd.server_address[1]} "
          f"({a.streams} streams)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
