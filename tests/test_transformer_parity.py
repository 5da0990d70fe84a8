"""Model forward-pass parity vs the NumPy oracle (reference formulas).

Covers every config variant: layer_norm in {"", "pre", "post"}, gtrxl on/off,
positional_encoding in {"", "relative", "learned"}, multi-head. Also asserts
the stop-gradient memory semantics (K/V receive no gradient, SURVEY.md §3.2
item 4).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.config import TransformerConfig
from etmppo_tpu.models.transformer import Transformer, sinusoidal_position_table
import reference_oracle as oracle


def _oracle_params(params, cfg: TransformerConfig):
    """Converts flax Transformer params into the oracle's dict layout."""
    p = params["params"]
    out = {
        "embed_kernel": np.asarray(p["linear_embedding"]["kernel"]),
        "embed_bias": np.asarray(p["linear_embedding"]["bias"]),
    }
    if "pos_embedding" in p:
        out["pos_embedding"] = np.asarray(p["pos_embedding"])
    for i in range(cfg.num_blocks):
        b = p[f"block_{i}"]
        bp = {
            "attention": {
                "Wv": np.asarray(b["attention"]["values"]["kernel"]),
                "Wk": np.asarray(b["attention"]["keys"]["kernel"]),
                "Wq": np.asarray(b["attention"]["queries"]["kernel"]),
                "Wo": np.asarray(b["attention"]["fc_out"]["kernel"]),
                "bo": np.asarray(b["attention"]["fc_out"]["bias"]),
            },
            "fc_kernel": np.asarray(b["fc"]["kernel"]),
            "fc_bias": np.asarray(b["fc"]["bias"]),
        }
        for norm in ("norm1", "norm2", "norm_kv"):
            if norm in b:
                bp[f"{norm}_scale"] = np.asarray(b[norm]["scale"])
                bp[f"{norm}_bias"] = np.asarray(b[norm]["bias"])
        for gate in ("gate1", "gate2"):
            if gate in b:
                bp[gate] = {
                    k: np.asarray(b[gate][k])
                    for k in ("Wr", "Ur", "Wz", "Uz", "Wg", "Ug")}
                bp[gate]["bg"] = np.asarray(b[gate]["bg"])
        out[f"block_{i}"] = bp
    return out


def _run_case(layer_norm, gtrxl, positional_encoding, num_heads=2, seed=0):
    cfg = TransformerConfig(
        num_blocks=2, embed_dim=16, num_heads=num_heads, memory_length=6,
        positional_encoding=positional_encoding, layer_norm=layer_norm,
        gtrxl=gtrxl, gtrxl_bias=0.5 if gtrxl else 0.0)
    max_ep = 12
    model = Transformer(cfg, max_ep)

    np_rng = np.random.default_rng(seed)
    B, L = 4, cfg.memory_length
    h = np_rng.normal(size=(B, 10)).astype(np.float32)
    memories = np_rng.normal(
        size=(B, L, cfg.num_blocks, cfg.embed_dim)).astype(np.float32)
    # include an all-masked row (episode step 0 quirk) and a partial mask
    mask = np.ones((B, L), bool)
    mask[0, :] = False
    mask[1, 3:] = False
    indices = np_rng.integers(0, max_ep, size=(B, L))

    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(h),
                        jnp.asarray(memories), jnp.asarray(mask),
                        jnp.asarray(indices))
    with jax.default_matmul_precision("highest"):
        h_out, new_mem = model.apply(
            params, jnp.asarray(h), jnp.asarray(memories), jnp.asarray(mask),
            jnp.asarray(indices))

    ocfg = dict(embed_dim=cfg.embed_dim, num_heads=cfg.num_heads,
                num_blocks=cfg.num_blocks, layer_norm=layer_norm, gtrxl=gtrxl,
                positional_encoding=positional_encoding)
    expected_h, expected_mem = oracle.transformer_forward(
        h, memories, mask, indices, _oracle_params(params, cfg), ocfg, max_ep)

    np.testing.assert_allclose(
        np.asarray(h_out), expected_h, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_mem), expected_mem, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("layer_norm", ["", "pre", "post"])
@pytest.mark.parametrize("gtrxl", [False, True])
def test_block_variants(layer_norm, gtrxl):
    _run_case(layer_norm, gtrxl, "")


@pytest.mark.parametrize("positional_encoding", ["relative", "learned"])
def test_positional_encodings(positional_encoding):
    _run_case("pre", False, positional_encoding)


def test_single_head():
    _run_case("pre", True, "", num_heads=1)


def test_sinusoidal_table_reversed_positions():
    table = sinusoidal_position_table(8, 4)
    expected = oracle.sinusoidal_position_table(8, 4)
    np.testing.assert_allclose(table, expected, rtol=1e-6)
    # row 0 encodes the LARGEST position (reverse enumeration quirk)
    assert table[0, 0] == pytest.approx(np.sin(7.0))
    assert table[-1, 0] == pytest.approx(0.0)


def test_memory_receives_no_gradient():
    """K/V are frozen rollout activations: d(output)/d(memories) == 0 must NOT
    hold (attention reads memory), but the returned new-memory items must be
    stop-gradient (no gradient flows back into params through them)."""
    cfg = TransformerConfig(num_blocks=2, embed_dim=8, num_heads=2,
                            memory_length=4, layer_norm="pre")
    model = Transformer(cfg, 8)
    np_rng = np.random.default_rng(0)
    h = jnp.asarray(np_rng.normal(size=(2, 8)).astype(np.float32))
    memories = jnp.asarray(
        np_rng.normal(size=(2, 4, 2, 8)).astype(np.float32))
    mask = jnp.ones((2, 4), bool)
    indices = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), h, memories, mask, indices)

    def mem_sum(params):
        _, new_mem = model.apply(params, h, memories, mask, indices)
        return jnp.sum(new_mem)

    grads = jax.grad(mem_sum)(params)
    total = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
    assert float(total) == 0.0  # memory outputs are fully detached
