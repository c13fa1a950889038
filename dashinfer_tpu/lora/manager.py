"""Multi-LoRA adapter serving.

Reference: `LoraManager` (csrc/runtime/weight/weight_manager_lora.h:11) — a
per-rank pool of <= lora_max_num adapters with rank <= lora_max_rank, loaded/
unloaded by name (allspark.h:625-627), selected per request via
GenerateConfig.lora_name, executed by SGMV segmented batch matmuls
(sgmv_lora_op_gpu.cpp) inside a GemmLoraCapsule micro-graph (SURVEY.md §8.10).

TPU design: the pool IS the device layout — all adapters live stacked in
fixed-shape arrays `[L, max_num, in, r_max]` / `[L, max_num, r_max, out]`
(layer-leading for the layer scan, rank-padded with zeros), so loading an
adapter is a functional slot update
and NO recompilation happens when adapters come and go (the reference's
"fake lora" warmup exists to pin this memory; here the shapes are static by
construction). Batched decode applies all adapters via a one-hot combine —
the MXU-native equivalent of SGMV's segmented gather:

    h[b, n, r] = sum_i x[b, i] A[n, l, i, r]        (tiny: r <= max_rank)
    y[b, o]   += sum_n onehot[b, n] * sum_r h[b, n, r] B[n, l, r, o]
"""

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dashinfer_tpu.config import ModelConfig, RuntimeConfig
from dashinfer_tpu.utils import get_logger

logger = get_logger("lora")

# target module name -> (in_dim_fn, out_dim_fn)
TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
           "down_proj")


def _dims(cfg: ModelConfig, target: str):
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hid, inter = cfg.hidden_size, cfg.intermediate_size
    return {
        "q_proj": (hid, H * D), "k_proj": (hid, KH * D),
        "v_proj": (hid, KH * D), "o_proj": (H * D, hid),
        "gate_proj": (hid, inter), "up_proj": (hid, inter),
        "down_proj": (inter, hid),
    }[target]


class LoraManager:
    def __init__(self, cfg: ModelConfig, rt: RuntimeConfig,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.max_num = rt.lora_max_num
        self.max_rank = rt.lora_max_rank
        self.dtype = dtype
        self.names: List[Optional[str]] = [None] * self.max_num
        self.pool = self._empty_pool()
        self._mega_view = None     # built lazily per plan; reset on load/unload

    def _empty_pool(self) -> Dict:
        L, N, R = self.cfg.num_layers, self.max_num, self.max_rank
        pool = {"A": {}, "B": {}, "scale": jnp.zeros((N,), jnp.float32)}
        for t in TARGETS:
            i, o = _dims(self.cfg, t)
            pool["A"][t] = jnp.zeros((L, N, i, R), self.dtype)
            pool["B"][t] = jnp.zeros((L, N, R, o), self.dtype)
        return pool

    # -- load/unload (reference LoadLoraByName/UnloadLoraByName) -------------
    def load(self, name: str, adapter_path_or_tensors, alpha: float = None,
             rank: int = None) -> int:
        if name in self.names:
            raise ValueError(f"lora '{name}' already loaded")  # reference
            # requires unload before replace (tainted-name tracking)
        try:
            slot = self.names.index(None)
        except ValueError:
            raise RuntimeError(
                f"lora pool full ({self.max_num}); unload one first")

        if isinstance(adapter_path_or_tensors, (str, os.PathLike)):
            tensors, alpha, rank = self._read_peft(str(adapter_path_or_tensors))
        else:
            tensors = adapter_path_or_tensors
            assert alpha is not None and rank is not None
        if rank > self.max_rank:
            raise ValueError(f"lora rank {rank} > lora_max_rank {self.max_rank}")

        L, R = self.cfg.num_layers, self.max_rank
        for t in TARGETS:
            i, o = _dims(self.cfg, t)
            A = np.zeros((L, i, R), np.float32)
            B = np.zeros((L, R, o), np.float32)
            for l in range(L):
                a_t = tensors.get((l, t, "A"))
                b_t = tensors.get((l, t, "B"))
                if a_t is None:
                    continue
                r = a_t.shape[0]  # peft layout: lora_A [r, in], lora_B [out, r]
                A[l, :, :r] = np.asarray(a_t, np.float32).T
                B[l, :r, :] = np.asarray(b_t, np.float32).T
            self.pool["A"][t] = self.pool["A"][t].at[:, slot].set(
                jnp.asarray(A, self.dtype))
            self.pool["B"][t] = self.pool["B"][t].at[:, slot].set(
                jnp.asarray(B, self.dtype))
        self.pool["scale"] = self.pool["scale"].at[slot].set(alpha / rank)
        self._mega_view = None
        self.names[slot] = name
        logger.info("loaded lora '%s' (rank %d, alpha %.1f) into slot %d",
                    name, rank, alpha, slot)
        return slot

    def unload(self, name: str) -> bool:
        if name not in self.names:
            return False
        slot = self.names.index(name)
        self.names[slot] = None
        for t in TARGETS:
            self.pool["A"][t] = self.pool["A"][t].at[:, slot].set(0.0)
            self.pool["B"][t] = self.pool["B"][t].at[:, slot].set(0.0)
        self.pool["scale"] = self.pool["scale"].at[slot].set(0.0)
        self._mega_view = None
        return True

    def pool_for_mega(self, plan) -> Dict:
        """The pool plus its dense rank-lane view for the megakernel's
        in-kernel LoRA epilogue."""
        if self._mega_view is None:
            self._mega_view = self.build_mega_view(plan)
        return dict(self.pool, mega=self._mega_view)

    def build_mega_view(self, plan) -> Dict:
        """Dense rank-lane views of the adapter pool for the decode
        megakernel's LoRA epilogue (build_decode_megakernel lora_nr;
        reference SGMV batched adapter matmuls, sgmv_lora_op_gpu.cpp).

        Per stream: A [L, K, NRp] (lane n*R+r = adapter slot n, rank r)
        and B [L, NRp, Np] with the adapter scale FOLDED into B rows —
        one [B, K] @ [K, NRp] MXU dot projects into the pooled rank space,
        the per-request mask zeroes non-selected slots, and per-chunk
        [B, NRp] @ [NRp, cols] dots add the delta alongside the base
        stream. The fused qkv view stacks q/k/v as three NRp-wide rank
        blocks (cols t*NRp + n*R + r) with block-structured B rows."""
        cfg = self.cfg
        L, N, R = cfg.num_layers, self.max_num, self.max_rank
        nr = N * R
        NRp = -(-nr // 128) * 128
        dt = self.dtype
        HD = cfg.num_heads * cfg.head_dim
        KHD = cfg.num_kv_heads * cfg.head_dim
        scale = self.pool["scale"]

        def a_flat(t):
            A = self.pool["A"][t]                    # [L, N, in, R]
            return jnp.transpose(A, (0, 2, 1, 3)).reshape(
                L, A.shape[2], nr).astype(dt)

        def b_flat(t):
            Bp = self.pool["B"][t]                   # [L, N, R, out]
            return (Bp.astype(jnp.float32) *
                    scale[None, :, None, None]).reshape(
                L, nr, Bp.shape[3]).astype(dt)

        def a_view(t, Kp):
            f = a_flat(t)
            out = jnp.zeros((L, Kp, NRp), dt)
            return out.at[:, :f.shape[1], :nr].set(f)

        def b_view(t, Np):
            f = b_flat(t)
            out = jnp.zeros((L, NRp, Np), dt)
            return out.at[:, :nr, :f.shape[2]].set(f)

        view = {}
        # fused qkv: A cols [q | k | v] blocks of NRp; B rows block-diag
        la3 = jnp.zeros((L, cfg.hidden_size, 3 * NRp), dt)
        lb3 = jnp.zeros((L, 3 * NRp, plan.qkv.Np), dt)
        for ti, (t, c0, cw) in enumerate((("q_proj", 0, HD),
                                          ("k_proj", HD, KHD),
                                          ("v_proj", HD + KHD, KHD))):
            la3 = la3.at[:, :, ti * NRp:ti * NRp + nr].set(a_flat(t))
            lb3 = lb3.at[:, ti * NRp:ti * NRp + nr, c0:c0 + cw].set(
                b_flat(t))
        view["la_qkv"] = la3
        view["lb_qkv"] = lb3
        view["la_o"] = a_view("o_proj", HD)
        view["lb_o"] = b_view("o_proj", plan.o.Np)
        view["la_g"] = a_view("gate_proj", cfg.hidden_size)
        view["lb_g"] = b_view("gate_proj", plan.pg.Np)
        view["la_u"] = a_view("up_proj", cfg.hidden_size)
        view["lb_u"] = b_view("up_proj", plan.pu.Np)
        view["la_d"] = a_view("down_proj", plan.pd.Kp)
        view["lb_d"] = b_view("down_proj", cfg.hidden_size)
        return view

    def index_of(self, name: Optional[str]) -> int:
        if name is None:
            return -1
        if name not in self.names:
            raise KeyError(f"lora '{name}' not loaded")
        return self.names.index(name)

    # -- HF PEFT checkpoint ingestion -----------------------------------------
    def _read_peft(self, path: str):
        """Read adapter_model.safetensors + adapter_config.json."""
        cfg_file = os.path.join(path, "adapter_config.json")
        with open(cfg_file) as f:
            acfg = json.load(f)
        alpha = float(acfg.get("lora_alpha", 16))
        rank = int(acfg.get("r", 8))
        import glob
        files = (glob.glob(os.path.join(path, "adapter_model.safetensors")) or
                 glob.glob(os.path.join(path, "adapter_model.bin")))
        if not files:
            raise FileNotFoundError(f"no adapter weights under {path}")
        if files[0].endswith(".safetensors"):
            from safetensors import safe_open
            raw = {}
            with safe_open(files[0], framework="pt") as f:
                for k in f.keys():
                    raw[k] = f.get_tensor(k).float().numpy()
        else:
            import torch
            raw = {k: v.float().numpy()
                   for k, v in torch.load(files[0], map_location="cpu").items()}
        tensors = {}
        for k, v in raw.items():
            # e.g. base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight
            parts = k.split(".")
            if "layers" not in parts:
                continue
            l = int(parts[parts.index("layers") + 1])
            target = next((t for t in TARGETS if t in parts), None)
            if target is None:
                continue
            ab = "A" if "lora_A" in parts else "B"
            tensors[(l, target, ab)] = v
        return tensors, alpha, rank


def apply_lora_batch(x: jnp.ndarray, A_l: jnp.ndarray, B_l: jnp.ndarray,
                     scale: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Batched multi-adapter delta for decode (SGMV equivalent,
    sgmv_lora_op_gpu.cpp).

    x: [B, in]; A_l: [N, in, R]; B_l: [N, R, out]; scale: [N];
    onehot: [B, N] (all-zero row = no adapter). Returns [B, out].

    Two regimes (decode is bandwidth-bound, so pick by bytes moved):
    - N <= B: the dense one-hot contraction reads the whole pool ONCE
      (N * (in*R + R*out) bytes) and lets the MXU do the N-way reduction.
    - N > B (large pools, reference lora_max_num scale): per-slot GATHER
      of each row's adapter — O(B) adapter reads instead of O(N) pool
      reads, and O(B*(in*R + R*out)) FLOPs instead of O(B*N*...)."""
    B = x.shape[0]
    N = A_l.shape[0]
    if N <= B:
        h = jnp.einsum("bi,nir->bnr", x.astype(jnp.float32),
                       A_l.astype(jnp.float32))
        h = h * (onehot * scale[None, :])[..., None]
        y = jnp.einsum("bnr,nro->bo", h, B_l.astype(jnp.float32))
        return y.astype(x.dtype)
    idx = jnp.argmax(onehot, axis=1)                      # [B]
    has = jnp.any(onehot > 0, axis=1)                     # [B]
    A = A_l[idx].astype(jnp.float32)                      # [B, in, R]
    Bm = B_l[idx].astype(jnp.float32)                     # [B, R, out]
    s = jnp.where(has, scale[idx], 0.0)                   # [B]
    h = jnp.einsum("bi,bir->br", x.astype(jnp.float32), A) * s[:, None]
    y = jnp.einsum("br,bro->bo", h, Bm)
    return y.astype(x.dtype)


def apply_lora_single(x: jnp.ndarray, A_l: jnp.ndarray, B_l: jnp.ndarray,
                      scale: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Single-adapter delta for prefill. x: [T, in]; idx scalar (-1 = none)."""
    safe = jnp.maximum(idx, 0)
    A = A_l[safe]                                  # [in, R]
    B = B_l[safe]                                  # [R, out]
    s = jnp.where(idx >= 0, scale[safe], 0.0)
    h = jnp.dot(x.astype(jnp.float32), A.astype(jnp.float32)) * s
    return jnp.dot(h, B.astype(jnp.float32)).astype(x.dtype)
