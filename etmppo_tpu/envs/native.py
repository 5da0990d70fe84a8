"""ctypes wrapper for the native (C++) batched environment engine.

Presents the same vectorized API as envs/host.py's HostEnvBatch
(``reset_all`` / ``step`` with auto-reset + per-episode info), so the host
rollout driver can use it unchanged — but env stepping happens in a native
thread pool without interpreter/GIL overhead (native/env_batch.cpp).

The shared library is built on demand with g++ (cached next to the source).
Environment types: ``CartPole-native``, ``CartPoleMasked-native``,
``PocMemoryEnv-native``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, os.pardir, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libetmppo_envs.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "env_batch.cpp")

ENV_TYPE_IDS = {
    "CartPole-native": 0,
    "CartPoleMasked-native": 1,
    "PocMemoryEnv-native": 2,
}


def build_native_library(force: bool = False) -> str:
    """Compiles native/env_batch.cpp with g++ if needed; returns the .so path."""
    if (not force and os.path.exists(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH)):
        return _SO_PATH
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC_PATH, "-o", _SO_PATH]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO_PATH


def _load_library() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_native_library())
    lib.etmppo_create.restype = ctypes.c_void_p
    lib.etmppo_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                  ctypes.c_uint64, ctypes.c_int]
    lib.etmppo_destroy.argtypes = [ctypes.c_void_p]
    lib.etmppo_spec.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int)] * 3
    lib.etmppo_reset_all.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float)]
    lib.etmppo_step.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)]
    lib.etmppo_info_fields.restype = ctypes.c_int
    return lib


class NativeEnvBatch:
    """HostEnvBatch-compatible native environment batch."""

    info_keys = ("reward", "length", "success")

    def __init__(self, env_type: str, seed: int = 0,
                 n_threads: Optional[int] = None):
        if env_type not in ENV_TYPE_IDS:
            raise ValueError(
                f"unknown native env type {env_type!r}; "
                f"available: {sorted(ENV_TYPE_IDS)}")
        self._lib = _load_library()
        self._type_id = ENV_TYPE_IDS[env_type]
        self._seed = seed
        self._n_threads = n_threads or (os.cpu_count() or 1)
        self._handle = None
        self._n_envs = 0
        # probe spec with a 1-env instance
        handle = self._lib.etmppo_create(self._type_id, 1, seed,
                                         1)
        obs_dim = ctypes.c_int()
        n_actions = ctypes.c_int()
        max_steps = ctypes.c_int()
        self._lib.etmppo_spec(handle, ctypes.byref(obs_dim),
                              ctypes.byref(n_actions), ctypes.byref(max_steps))
        self._lib.etmppo_destroy(handle)
        self.observation_shape: Tuple[int, ...] = (obs_dim.value,)
        self.action_branches: Tuple[int, ...] = (n_actions.value,)
        self.max_episode_steps = max_steps.value
        self._info_fields = self._lib.etmppo_info_fields()

    def start(self, n_envs: int) -> None:
        self._n_envs = n_envs
        self._handle = self._lib.etmppo_create(
            self._type_id, n_envs, self._seed, self._n_threads)
        d = self.observation_shape[0]
        self._obs = np.empty((n_envs, d), np.float32)
        self._rewards = np.empty(n_envs, np.float32)
        self._dones = np.empty(n_envs, np.uint8)
        self._infos = np.empty((n_envs, self._info_fields), np.float32)

    def _ptr(self, arr, ctype):
        return arr.ctypes.data_as(ctypes.POINTER(ctype))

    def reset_all(self) -> np.ndarray:
        self._lib.etmppo_reset_all(
            self._handle, self._ptr(self._obs, ctypes.c_float))
        return self._obs.copy()

    def step(self, actions: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                        List[Optional[Dict]]]:
        acts = np.ascontiguousarray(
            np.asarray(actions).reshape(self._n_envs, -1)[:, 0], np.int32)
        self._lib.etmppo_step(
            self._handle, self._ptr(acts, ctypes.c_int32),
            self._ptr(self._obs, ctypes.c_float),
            self._ptr(self._rewards, ctypes.c_float),
            self._ptr(self._dones, ctypes.c_uint8),
            self._ptr(self._infos, ctypes.c_float))
        infos: List[Optional[Dict]] = []
        for i in range(self._n_envs):
            if self._infos[i, 0] > 0:
                infos.append({"reward": float(self._infos[i, 1]),
                              "length": float(self._infos[i, 2]),
                              "success": float(self._infos[i, 3])})
            else:
                infos.append(None)
        return (self._obs.copy(), self._rewards.copy(),
                self._dones.astype(bool), infos)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.etmppo_destroy(self._handle)
            self._handle = None
