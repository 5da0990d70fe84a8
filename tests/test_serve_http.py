"""HTTP serving front-end (etmppo_tpu/serve_http.py): the JSON API must
drive the same PolicyServer policy (reference has no serving surface)."""
import dataclasses
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from etmppo_tpu.config import load_config
from etmppo_tpu.envs.factory import create_env
from etmppo_tpu.models.actor_critic import ActorCriticModel
from etmppo_tpu.serve import PolicyServer
from etmppo_tpu.serve_http import serve
from etmppo_tpu.training.checkpoint import save_model


@pytest.fixture(scope="module")
def http_env(tmp_path_factory):
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(
        cfg, hidden_layer_size=16,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=6))
    env = create_env(cfg.environment)
    model = ActorCriticModel(
        config=cfg, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("serve_http") / "tiny.nn")
    save_model(path, params, cfg)

    httpd = serve(path, streams=3, port=0, greedy=True)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, path, env
    httpd.shutdown()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_info_and_step_matches_local_policy(http_env):
    base, model_path, env = http_env
    with urllib.request.urlopen(base + "/info") as r:
        info = json.loads(r.read())
    assert info["max_streams"] == 3
    assert tuple(info["observation_shape"]) == tuple(env.observation_shape)

    # Same model served locally must agree step-for-step (greedy).
    local = PolicyServer(model_path, max_streams=3, greedy=True, seed=0)
    local.reset(range(3))
    rng = np.random.default_rng(5)
    status, _ = _post(base, "/reset", {"streams": [0, 1, 2]})
    assert status == 200
    for _ in range(4):
        obs = rng.normal(size=(3,) + tuple(env.observation_shape)
                         ).astype(np.float32)
        status, resp = _post(base, "/step", {"obs": obs.tolist()})
        assert status == 200
        a_local, v_local = local.step(obs)
        np.testing.assert_array_equal(np.asarray(resp["actions"]), a_local)
        np.testing.assert_allclose(np.asarray(resp["values"]), v_local,
                                   atol=1e-5)
    assert resp["steps"] == [4, 4, 4]


def test_http_validation_errors(http_env):
    base, _, env = http_env
    status, resp = _post(base, "/reset", {"streams": [99]})
    assert status == 400 and "out of range" in resp["error"]
    status, resp = _post(base, "/step", {"obs": [[0.0]]})
    assert status == 400
    status, resp = _post(base, "/nope", {})
    assert status == 404


def test_http_malformed_bodies_return_400(http_env):
    """Non-dict JSON and wrong-typed fields must be clean 400s, not dropped
    connections with a server-side traceback (ADVICE round 3)."""
    base, _, env = http_env
    status, resp = _post(base, "/step", [1, 2])          # non-dict body
    assert status == 400 and "JSON object" in resp["error"]
    status, resp = _post(base, "/step", {"obs": None})   # wrong-typed field
    assert status == 400
    status, resp = _post(base, "/step_many", {"obs_seq": "nope"})
    assert status == 400


def _post_binary(base, path, body: bytes, active=None, t=None):
    headers = {"Content-Type": "application/octet-stream"}
    if active is not None:
        headers["X-Active"] = ",".join("1" if a else "0" for a in active)
    if t is not None:
        headers["X-T"] = str(t)
    req = urllib.request.Request(base + path, data=body, headers=headers)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_binary_obs_codec_matches_json(http_env):
    """Raw float32 bodies (the image-serving wire format) must produce the
    identical policy outputs as the JSON encoding of the same obs."""
    base, model_path, env = http_env
    rng = np.random.default_rng(21)
    shape = (3,) + tuple(env.observation_shape)

    _post(base, "/reset", {"streams": [0, 1, 2]})
    obs = rng.normal(size=shape).astype(np.float32)
    status, via_json = _post(base, "/step", {"obs": obs.tolist()})
    assert status == 200
    _post(base, "/reset", {"streams": [0, 1, 2]})
    status, via_bin = _post_binary(base, "/step", obs.astype("<f4").tobytes())
    assert status == 200
    assert via_bin["actions"] == via_json["actions"]
    np.testing.assert_allclose(via_bin["values"], via_json["values"],
                               atol=1e-6)

    # /step_many with an explicit X-T header + X-Active header.
    _post(base, "/reset", {"streams": [0, 1, 2]})
    obs_seq = rng.normal(size=(4,) + shape).astype(np.float32)
    status, many_json = _post(base, "/step_many",
                              {"obs_seq": obs_seq.tolist(),
                               "active": [True, True, False]})
    assert status == 200
    _post(base, "/reset", {"streams": [0, 1, 2]})
    status, many_bin = _post_binary(base, "/step_many",
                                    obs_seq.astype("<f4").tobytes(),
                                    active=[True, True, False], t=4)
    assert status == 200
    assert many_bin["actions"] == many_json["actions"]
    assert many_bin["steps"] == many_json["steps"] == [4, 4, 0]

    # Malformed binary bodies are clean 400s.
    status, resp = _post_binary(base, "/step", b"\x00" * 7)
    assert status == 400 and "float32" in resp["error"]
    status, resp = _post_binary(base, "/step",
                                obs_seq.astype("<f4").tobytes())
    assert status == 400 and "/step_many" in resp["error"]
    # Binary /step_many without X-T is refused (no layout inference), and a
    # mismatched X-T is a 400, not a silent reshape (ADVICE round 4).
    status, resp = _post_binary(base, "/step_many",
                                obs_seq.astype("<f4").tobytes())
    assert status == 400 and "X-T" in resp["error"]
    status, resp = _post_binary(base, "/step_many",
                                obs_seq.astype("<f4").tobytes(), t=2)
    assert status == 400 and "X-T=2" in resp["error"]
    # Non-0/1 X-Active tokens are rejected, not treated as truthy.
    req = urllib.request.Request(
        base + "/step_many", data=obs_seq.astype("<f4").tobytes(),
        headers={"Content-Type": "application/octet-stream", "X-T": "4",
                 "X-Active": "1,True,0"})
    try:
        with urllib.request.urlopen(req) as r:
            status, resp = r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        status, resp = e.code, json.loads(e.read())
    assert status == 400 and "X-Active" in resp["error"]


def test_http_step_many_matches_local_scan(http_env):
    """/step_many must reproduce PolicyServer.step_many (the fused T-step
    scan) exactly — the 133k steps/s path reachable over the wire."""
    base, model_path, env = http_env
    local = PolicyServer(model_path, max_streams=3, greedy=True, seed=0)
    local.reset(range(3))
    status, _ = _post(base, "/reset", {"streams": [0, 1, 2]})
    assert status == 200
    rng = np.random.default_rng(11)
    T = 5
    obs_seq = rng.normal(size=(T, 3) + tuple(env.observation_shape)
                         ).astype(np.float32)
    status, resp = _post(base, "/step_many", {"obs_seq": obs_seq.tolist()})
    assert status == 200
    a_local, v_local = local.step_many(obs_seq)
    np.testing.assert_array_equal(np.asarray(resp["actions"]),
                                  np.asarray(a_local))
    np.testing.assert_allclose(np.asarray(resp["values"]),
                               np.asarray(v_local), atol=1e-5)
    assert resp["steps"] == [T, T, T]
    # Bad shape comes back as a 400 with the server's clear message.
    status, resp = _post(base, "/step_many",
                         {"obs_seq": obs_seq[:, :2].tolist()})
    assert status == 400 and "obs_seq must be" in resp["error"]
