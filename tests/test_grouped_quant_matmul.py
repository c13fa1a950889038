"""Grouped fused-dequant matmul (ops/pallas/grouped_quant_matmul.py):
kernel parity vs the dense dequant reference, the boundary-padded group
layout, the u4 plain-halves -> TILE-128 repack, and the moe_block grouped
path vs the ragged/dense fallback. All interpret-mode (CPU CI); the TPU
lowering is covered by tools/tpu_compile_gate.py --grouped-moe."""

import os

import numpy as np
import pytest


def _quant_expert_stack(rng, L, E, K, N, bits, gs):
    from dashinfer_tpu.loader.quantize import _quantize_stacked
    w = rng.standard_normal((L * E, K, N), dtype=np.float32) * 0.3
    leaf = _quantize_stacked(w, bits, gs)
    return {k: v.reshape((L, E) + v.shape[1:]) for k, v in leaf.items()}


def _dense_stack(leaf_le):
    """[E,...] leaf -> dense [E, K, N] f32 via the XLA reference unpack."""
    import jax.numpy as jnp
    from dashinfer_tpu.ops.moe import _expert_stack
    return np.asarray(_expert_stack(leaf_le, jnp.float32))


def test_group_layout_tiles_single_expert():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.pallas.grouped_quant_matmul import \
        build_group_layout
    rng = np.random.RandomState(0)
    T, k, E, TM = 37, 4, 6, 8
    topk_i = jnp.asarray(rng.randint(0, E, size=(T, k)), jnp.int32)
    order, sorted_token, pos, tile_expert = build_group_layout(topk_i, E, TM)
    Mcap = int(tile_expert.shape[0]) * TM
    assert Mcap >= T * k
    # every row lands in a tile owned by its expert; no position collides
    flat_e = np.asarray(topk_i).reshape(-1)[np.asarray(order)]
    posn = np.asarray(pos)
    assert len(set(posn.tolist())) == T * k
    te = np.asarray(tile_expert)
    for i in range(T * k):
        assert te[posn[i] // TM] == flat_e[i]


@pytest.mark.parametrize("bits,N,gs", [
    (4, 512, 64),     # u4 TILE-128 direct
    (8, 384, 64),     # int8, N % 128 only
    (8, 256, 0),      # per-channel groups
])
def test_grouped_kernel_matches_dense(bits, N, gs):
    import jax.numpy as jnp
    from dashinfer_tpu.ops.pallas.grouped_quant_matmul import (
        build_group_layout, grouped_quant_matmul, supports_grouped)
    rng = np.random.default_rng(1)
    E, K, TM = 5, 128, 8
    leaf = {k: jnp.asarray(v[0]) for k, v in
            _quant_expert_stack(rng, 1, E, K, N, bits, gs or K).items()}
    assert supports_grouped(leaf)
    T, ktop = 23, 2
    topk_i = jnp.asarray(rng.integers(0, E, size=(T, ktop)), jnp.int32)
    x = jnp.asarray(rng.standard_normal((T, K), dtype=np.float32) * 0.5,
                    jnp.float32)
    order, sorted_token, pos, tile_expert = build_group_layout(
        topk_i, E, TM)
    Mcap = int(tile_expert.shape[0]) * TM
    xs = jnp.zeros((Mcap, K), x.dtype).at[pos].set(x[sorted_token])
    out = grouped_quant_matmul(xs, tile_expert, leaf, out_dtype=jnp.float32,
                               interpret=True)
    rows = np.asarray(out)[np.asarray(pos)]
    dense = _dense_stack(leaf)                                 # [E, K, N]
    flat_e = np.asarray(topk_i).reshape(-1)[np.asarray(order)]
    xref = np.asarray(x)[np.asarray(sorted_token)]
    ref = np.einsum("mk,mkn->mn", xref,
                    dense[flat_e])                             # [T*k, N]
    np.testing.assert_allclose(rows, ref, rtol=2e-2, atol=2e-2)


def test_repack_u4_tile128_roundtrip():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.moe import _expert_stack
    from dashinfer_tpu.ops.pallas.grouped_quant_matmul import \
        repack_expert_u4_tile128
    rng = np.random.default_rng(2)
    L, E, K, N = 2, 3, 64, 192          # N % 256 != 0 -> plain halves
    leaf = _quant_expert_stack(rng, L, E, K, N, 4, 64)
    g = repack_expert_u4_tile128(leaf, N)
    assert g["w_qg"].shape == (L, E, K, 128)        # Np = 256 packed to 128
    for l in range(L):
        raw = np.asarray(_expert_stack(
            {k: jnp.asarray(v[l]) for k, v in leaf.items()}, jnp.float32))
        rep = np.asarray(_expert_stack(
            {"w_q": jnp.asarray(g["w_qg"][l]),
             "scale": jnp.asarray(g["scale_g"][l]),
             "zero": jnp.asarray(g["zero_g"][l])}, jnp.float32))
        np.testing.assert_allclose(rep[:, :, :N], raw, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(rep[:, :, N:], 0.0, atol=1e-6)


def test_moe_block_grouped_matches_fallback():
    import jax.numpy as jnp
    from dashinfer_tpu.config import ModelConfig, MoEConfig
    from dashinfer_tpu.ops import moe as moe_mod
    from dashinfer_tpu.ops.pallas.grouped_quant_matmul import \
        prepare_grouped_experts
    rng = np.random.default_rng(3)
    E, K, Im = 4, 128, 192              # Im % 256 != 0 -> needs repack
    cfg = ModelConfig(arch="qwen2_moe", vocab_size=128, hidden_size=K,
                      intermediate_size=Im, num_layers=1, num_heads=2,
                      num_kv_heads=1, head_dim=64,
                      moe=MoEConfig(num_experts=E, num_experts_per_tok=2,
                                    moe_intermediate_size=Im,
                                    shared_expert_intermediate_size=0,
                                    norm_topk_prob=True))
    gate = _quant_expert_stack(rng, 1, E, K, Im, 4, 64)
    up = _quant_expert_stack(rng, 1, E, K, Im, 4, 64)
    down = _quant_expert_stack(rng, 1, E, Im, K, 4, 64)
    params = {"layers": {"experts": {
        "gate_proj": gate, "up_proj": up, "down_proj": down}}}
    params = prepare_grouped_experts(params, cfg)
    ex = params["layers"]["experts"]
    # every projection here has N % 256 != 0 -> all repacked
    assert all("w_qg" in ex[n]
               for n in ("gate_proj", "up_proj", "down_proj"))
    lp = {"router": {"w": jnp.asarray(
        rng.standard_normal((K, E), dtype=np.float32) * 0.1)},
        "experts": {n: {k: jnp.asarray(v[0]) for k, v in ex[n].items()}
                    for n in ("gate_proj", "up_proj", "down_proj")}}
    # bf16 activations: the kernel's MXU dots run on bf16 inputs (like the
    # TPU ragged path); a float32 CPU reference would differ by input
    # rounding alone, so compare at matching precision
    x = jnp.asarray(rng.standard_normal((9, K), dtype=np.float32) * 0.5,
                    jnp.bfloat16)
    old = os.environ.get("DI_MOE_GROUPED")
    try:
        os.environ["DI_MOE_GROUPED"] = "0"
        ref = np.asarray(moe_mod.moe_block(cfg, x, lp), np.float32)
        os.environ["DI_MOE_GROUPED"] = "1"
        got = np.asarray(moe_mod.moe_block(cfg, x, lp), np.float32)
    finally:
        if old is None:
            os.environ.pop("DI_MOE_GROUPED", None)
        else:
            os.environ["DI_MOE_GROUPED"] = old
    np.testing.assert_allclose(got, ref, rtol=8e-2, atol=8e-2)
