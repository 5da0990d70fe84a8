"""Window mask / index tables and the tape-reconstruction index math."""
import numpy as np

import jax.numpy as jnp

from etmppo_tpu.ops.memory_index import (
    build_memory_indices, build_memory_mask, compute_window_sources)
import reference_oracle as oracle


def test_mask_table_matches_reference():
    # trainer.py:78 example with memory_length = 6
    mask = build_memory_mask(6)
    expected = np.array([
        [0, 0, 0, 0, 0, 0],
        [1, 0, 0, 0, 0, 0],
        [1, 1, 0, 0, 0, 0],
        [1, 1, 1, 0, 0, 0],
        [1, 1, 1, 1, 0, 0],
        [1, 1, 1, 1, 1, 0]], dtype=bool)
    np.testing.assert_array_equal(mask, expected)
    assert not mask[0].any()  # row 0 fully masked -> uniform attention quirk


def test_index_table_matches_reference():
    # trainer.py:91-99 example: memory_length 4, max_episode_length 7
    table = build_memory_indices(7, 4)
    expected = np.array([
        [0, 1, 2, 3],
        [0, 1, 2, 3],
        [0, 1, 2, 3],
        [0, 1, 2, 3],
        [1, 2, 3, 4],
        [2, 3, 4, 5],
        [3, 4, 5, 6]])
    np.testing.assert_array_equal(table, expected)
    np.testing.assert_array_equal(table, oracle.build_memory_indices(7, 4))


def test_window_sources_single_episode_no_dones():
    max_ep, L, T = 8, 4, 5
    table = jnp.asarray(build_memory_indices(max_ep, L))
    # one worker, carried-in episode at step e0=2
    e = jnp.asarray([[2, 3, 4, 5, 6]], jnp.int32)
    dones = jnp.zeros((1, T), bool)
    src = compute_window_sources(e, dones, table, max_ep)
    # sample t=0 (e=2): window slots [0,1,2,3]; slots 0,1 pre-rollout (snapshot),
    # slot 2 = tape[0] (this step's write), slot 3 = future tape[1]
    np.testing.assert_array_equal(np.asarray(src.slot[0, 0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(
        np.asarray(src.flat_index[0, 0]), [0, 1, max_ep + 0, max_ep + 1])
    assert np.asarray(src.valid[0, 0]).all()
    # sample t=3 (e=5): sliding window [2,3,4,5] -> tape steps [0,1,2,3]
    np.testing.assert_array_equal(np.asarray(src.slot[0, 3]), [2, 3, 4, 5])
    np.testing.assert_array_equal(
        np.asarray(src.flat_index[0, 3]), max_ep + np.array([0, 1, 2, 3]))


def test_window_sources_future_slots_invalid_after_done():
    max_ep, L, T = 8, 4, 6
    table = jnp.asarray(build_memory_indices(max_ep, L))
    # episode ends at t=2 (done), new episode from t=3
    e = jnp.asarray([[0, 1, 2, 0, 1, 2]], jnp.int32)
    dones = jnp.asarray([[0, 0, 1, 0, 0, 0]], bool)
    src = compute_window_sources(e, dones, table, max_ep)
    # sample t=0 (e=0): window [0,1,2,3] -> tape [0,1,2,3]; but episode's last
    # write is at t=2, so slot 3 (tape step 3) is beyond the episode -> PE
    np.testing.assert_array_equal(
        np.asarray(src.valid[0, 0]), [True, True, True, False])
    assert int(src.flat_index[0, 0, 3]) == max_ep + T + 3
    # sample t=3 (e=0, new episode): window [0,1,2,3] -> tape [3,4,5,6];
    # tape step 6 is beyond the rollout -> PE region at slot 3
    np.testing.assert_array_equal(
        np.asarray(src.flat_index[0, 3])[:3], max_ep + np.array([3, 4, 5]))
    assert int(src.flat_index[0, 3, 3]) == max_ep + T + 3
    np.testing.assert_array_equal(
        np.asarray(src.valid[0, 3]), [True, True, True, False])


import pytest


@pytest.mark.parametrize("fuzz_seed,W,T,max_ep,L", [
    (0, 3, 24, 10, 4), (1, 2, 40, 8, 8), (2, 5, 16, 12, 3),
    (3, 1, 64, 6, 6), (4, 4, 30, 20, 7)])
def test_window_sources_against_reference_simulation(rng, fuzz_seed, W, T,
                                                     max_ep, L):
    """Drives random episode traces through the reference's list/clone
    bookkeeping (oracle) and asserts identical reconstructed windows."""
    import jax
    np_rng = np.random.default_rng(fuzz_seed)
    blocks, D = 2, 5

    # Random episode structure: episodes end with prob 0.2 each step.
    e = np.zeros((W, T), np.int64)
    dones = np.zeros((W, T), bool)
    cur = np_rng.integers(0, max_ep - 1, W)  # carried-in episode steps
    for t in range(T):
        for w in range(W):
            e[w, t] = cur[w]
            done = (np_rng.random() < 0.2) or (cur[w] >= max_ep - 1)
            dones[w, t] = done
            cur[w] = 0 if done else cur[w] + 1

    tape = np_rng.normal(size=(W, T, blocks, D)).astype(np.float32)
    snapshot = np.zeros((W, max_ep, blocks, D), np.float32)
    for w in range(W):
        snapshot[w, :e[w, 0]] = np_rng.normal(size=(e[w, 0], blocks, D))

    sim = oracle.ReferenceMemorySim(W, T, max_ep, blocks, D, L, snapshot)
    sim.run(e, dones, tape)

    table = jnp.asarray(build_memory_indices(max_ep, L))
    src = compute_window_sources(
        jnp.asarray(e, jnp.int32), jnp.asarray(dones), table, max_ep)
    # PE region holds zero content -> a plain gather reproduces the
    # reference's zeros at never-written slots.
    combined = np.concatenate([snapshot, tape, np.zeros_like(snapshot)], axis=1)

    flat_index = np.asarray(src.flat_index)
    for w in range(W):
        for t in range(T):
            window = combined[w, flat_index[w, t]]
            expected = sim.window(w, t, e)
            np.testing.assert_allclose(
                window, expected, rtol=0, atol=0,
                err_msg=f"worker {w} step {t} (e={e[w, t]}, done={dones[w, t]})")


@pytest.mark.parametrize("fuzz_seed,W,T,max_ep,L", [
    (5, 3, 30, 12, 5), (6, 2, 50, 9, 9), (7, 4, 20, 16, 4), (8, 1, 40, 6, 5)])
def test_timeline_sources_match_flat_index_windows(fuzz_seed, W, T, max_ep, L):
    """Timeline (contiguous-run) addressing must reconstruct the same windows
    as the general flat-index gather, on random episode traces."""
    import jax
    from etmppo_tpu.ops.memory_index import (build_timeline,
                                             compute_timeline_sources)
    np_rng = np.random.default_rng(fuzz_seed)
    blocks, D = 2, 4

    e = np.zeros((W, T), np.int64)
    dones = np.zeros((W, T), bool)
    cur = np_rng.integers(0, max_ep - 1, W)
    for t in range(T):
        for w in range(W):
            e[w, t] = cur[w]
            done = (np_rng.random() < 0.25) or (cur[w] >= max_ep - 1)
            dones[w, t] = done
            cur[w] = 0 if done else cur[w] + 1

    tape = np_rng.normal(size=(W, T, blocks, D)).astype(np.float32)
    snapshot = np.zeros((W, max_ep, blocks, D), np.float32)
    for w in range(W):
        snapshot[w, :e[w, 0]] = np_rng.normal(size=(e[w, 0], blocks, D))
    pe_region = np.zeros((W, max_ep, blocks, D), np.float32)

    table = jnp.asarray(build_memory_indices(max_ep, L))
    ej = jnp.asarray(e, jnp.int32)
    dj = jnp.asarray(dones)
    flat_src = compute_window_sources(ej, dj, table, max_ep)
    combined = np.concatenate([snapshot, tape, pe_region], axis=1)
    flat_index = np.asarray(flat_src.flat_index)

    tl_src = compute_timeline_sources(ej, dj, table, L)
    timeline = np.asarray(build_timeline(
        jnp.asarray(snapshot), jnp.asarray(tape), ej[:, 0], pad=L))
    assert timeline.shape[1] == max_ep + T + L
    start = np.asarray(tl_src.start)
    n_valid = np.asarray(tl_src.n_valid)
    s_lo = np.asarray(tl_src.s_lo)

    for w in range(W):
        for t in range(T):
            expected = combined[w, flat_index[w, t]]
            run = timeline[w, start[w, t]:start[w, t] + L]
            n = n_valid[w, t]
            window = np.where(
                (np.arange(L) < n)[:, None, None], run, 0.0)
            np.testing.assert_allclose(
                window, expected, atol=0,
                err_msg=f"w={w} t={t} e={e[w, t]} n={n} start={start[w, t]}")
