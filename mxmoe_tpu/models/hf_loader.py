"""HF checkpoint -> mxmoe_tpu param pytree conversion.

Counterpart of the reference's model loading layer (``moe_utils.py:281-316``
``load_hf_model`` + the weight-name maps at ``moe_utils.py:181-207``), but
producing a stacked functional pytree instead of a live torch module.

Two entry points:
  * :func:`params_from_state_dict` — any mapping name->numpy array (used by
    parity tests against a live ``transformers`` model, and by
    :func:`params_from_safetensors`).
  * :func:`params_from_safetensors` — stream tensors from ``*.safetensors``
    shards on disk (zero-egress friendly; no torch needed).

Name schema handled (qwen2_moe / mixtral):
  model.layers.{i}.self_attn.{q,k,v,o}_proj.weight[.bias]
  model.layers.{i}.{input,post_attention}_layernorm.weight
  qwen2_moe: model.layers.{i}.mlp.gate.weight (router)
             model.layers.{i}.mlp.experts.{e}.{gate,up,down}_proj.weight
             model.layers.{i}.mlp.shared_expert.{gate,up,down}_proj.weight
             model.layers.{i}.mlp.shared_expert_gate.weight
  mixtral:   model.layers.{i}.block_sparse_moe.gate.weight
             model.layers.{i}.block_sparse_moe.experts.{e}.w{1,2,3}.weight
             (w1=gate, w3=up, w2=down — reference MOE_WEIGHT_NAME_MAP,
              ``moe_utils.py:196-207``)
"""

from __future__ import annotations

import glob
import os
from typing import Mapping

import numpy as np
import jax.numpy as jnp

from .configs import MoEConfig


def _stack(arrs) -> np.ndarray:
    return np.stack([np.asarray(a) for a in arrs])


def params_from_state_dict(
    sd: Mapping[str, np.ndarray],
    cfg: MoEConfig,
    dtype=jnp.float32,
) -> dict:
    """Convert an HF state-dict (numpy values, HF [out, in] layout) into the
    stacked [in, out] pytree used by :mod:`mxmoe_tpu.models.model`."""

    get = lambda name: np.asarray(sd[name])

    if cfg.model_type == "deepseek_v2":
        return _ds2_params_from_state_dict(sd, cfg, dtype)

    if cfg.model_type == "mixtral":
        moe_prefix = "block_sparse_moe"
        expert_names = {"gate": "w1", "up": "w3", "down": "w2"}
    else:
        moe_prefix = "mlp"
        expert_names = {"gate": "gate_proj", "up": "up_proj", "down": "down_proj"}

    L, E = cfg.num_layers, cfg.num_experts
    layers: dict[str, list] = {k: [] for k in (
        "wq", "wk", "wv", "wo", "input_norm", "post_attn_norm",
        "router", "expert_gate_up", "expert_down",
    )}
    if cfg.attention_bias:
        layers.update({"bq": [], "bk": [], "bv": []})
    if cfg.shared_expert_intermediate_size > 0:
        layers.update({"shared_gate_up": [], "shared_down": []})
        if cfg.has_shared_expert_gate:
            layers["shared_gate"] = []

    for i in range(L):
        p = f"model.layers.{i}"
        layers["wq"].append(get(f"{p}.self_attn.q_proj.weight").T)
        layers["wk"].append(get(f"{p}.self_attn.k_proj.weight").T)
        layers["wv"].append(get(f"{p}.self_attn.v_proj.weight").T)
        layers["wo"].append(get(f"{p}.self_attn.o_proj.weight").T)
        if cfg.attention_bias:
            layers["bq"].append(get(f"{p}.self_attn.q_proj.bias"))
            layers["bk"].append(get(f"{p}.self_attn.k_proj.bias"))
            layers["bv"].append(get(f"{p}.self_attn.v_proj.bias"))
        layers["input_norm"].append(get(f"{p}.input_layernorm.weight"))
        layers["post_attn_norm"].append(get(f"{p}.post_attention_layernorm.weight"))
        layers["router"].append(get(f"{p}.{moe_prefix}.gate.weight").T)

        gate_up = []
        down = []
        for e in range(E):
            ep = f"{p}.{moe_prefix}.experts.{e}"
            g = get(f"{ep}.{expert_names['gate']}.weight").T  # [H, N]
            u = get(f"{ep}.{expert_names['up']}.weight").T
            gate_up.append(np.concatenate([g, u], axis=1))    # [H, 2N]
            down.append(get(f"{ep}.{expert_names['down']}.weight").T)  # [N, H]
        layers["expert_gate_up"].append(_stack(gate_up))
        layers["expert_down"].append(_stack(down))

        if cfg.shared_expert_intermediate_size > 0:
            sp = f"{p}.mlp.shared_expert"
            g = get(f"{sp}.gate_proj.weight").T
            u = get(f"{sp}.up_proj.weight").T
            layers["shared_gate_up"].append(np.concatenate([g, u], axis=1))
            layers["shared_down"].append(get(f"{sp}.down_proj.weight").T)
            if cfg.has_shared_expert_gate:
                layers["shared_gate"].append(get(f"{p}.mlp.shared_expert_gate.weight").T)

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
    }
    # convert biggest keys first and FREE each staging list as it goes:
    # keeping every np staging list alive while the jnp copies accumulate
    # peaked ~95 GB on the 24-layer runbook (trace stage hit 116 GB);
    # this bounds the crossover at ~(staged + converted) instead
    out_layers: dict = {}
    for k in sorted(layers, key=lambda k: -sum(a.nbytes
                                               for a in layers[k])):
        out_layers[k] = jnp.asarray(_stack(layers[k]), dtype)
        layers[k] = None
    params["layers"] = out_layers
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = params["embed"].T
    else:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def _ds2_params_from_state_dict(sd, cfg: MoEConfig, dtype) -> dict:
    """DeepSeek-V2(-Lite) name schema (HF ``modeling_deepseek_v2``):
    self_attn.{q_proj,kv_a_proj_with_mqa,kv_a_layernorm,kv_b_proj,o_proj};
    layer<first_k_dense: mlp.{gate,up,down}_proj (dense);
    else mlp.gate (router), mlp.experts.{e}.*, mlp.shared_experts.*."""
    get = lambda name: np.asarray(sd[name])
    L, E, D = cfg.num_layers, cfg.num_experts, cfg.first_dense_layers

    def attn(i):
        p = f"model.layers.{i}.self_attn"
        return {
            "wq": get(f"{p}.q_proj.weight").T,
            "kv_a": get(f"{p}.kv_a_proj_with_mqa.weight").T,
            "kv_a_norm": get(f"{p}.kv_a_layernorm.weight"),
            "kv_b": get(f"{p}.kv_b_proj.weight").T,
            "wo": get(f"{p}.o_proj.weight").T,
        }

    def norms(i):
        p = f"model.layers.{i}"
        return {
            "input_norm": get(f"{p}.input_layernorm.weight"),
            "post_attn_norm": get(f"{p}.post_attention_layernorm.weight"),
        }

    dense = {k: [] for k in ("wq", "kv_a", "kv_a_norm", "kv_b", "wo",
                             "input_norm", "post_attn_norm", "mlp_gate_up", "mlp_down")}
    for i in range(D):
        row = {**attn(i), **norms(i)}
        p = f"model.layers.{i}.mlp"
        g = get(f"{p}.gate_proj.weight").T
        u = get(f"{p}.up_proj.weight").T
        row["mlp_gate_up"] = np.concatenate([g, u], axis=1)
        row["mlp_down"] = get(f"{p}.down_proj.weight").T
        for k in dense:
            dense[k].append(row[k])

    moe = {k: [] for k in ("wq", "kv_a", "kv_a_norm", "kv_b", "wo",
                           "input_norm", "post_attn_norm", "router",
                           "expert_gate_up", "expert_down",
                           "shared_gate_up", "shared_down")}
    for i in range(D, L):
        row = {**attn(i), **norms(i)}
        p = f"model.layers.{i}.mlp"
        row["router"] = get(f"{p}.gate.weight").T
        gate_up, down = [], []
        for e in range(E):
            ep = f"{p}.experts.{e}"
            g = get(f"{ep}.gate_proj.weight").T
            u = get(f"{ep}.up_proj.weight").T
            gate_up.append(np.concatenate([g, u], axis=1))
            down.append(get(f"{ep}.down_proj.weight").T)
        row["expert_gate_up"] = _stack(gate_up)
        row["expert_down"] = _stack(down)
        sg = get(f"{p}.shared_experts.gate_proj.weight").T
        su = get(f"{p}.shared_experts.up_proj.weight").T
        row["shared_gate_up"] = np.concatenate([sg, su], axis=1)
        row["shared_down"] = get(f"{p}.shared_experts.down_proj.weight").T
        for k in moe:
            moe[k].append(row[k])

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": {k: jnp.asarray(_stack(v), dtype) for k, v in moe.items()},
        "dense_layers": {k: jnp.asarray(_stack(v), dtype) for k, v in dense.items()},
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
    }
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = params["embed"].T
    else:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def params_from_torch_model(torch_model, cfg: MoEConfig, dtype=jnp.float32) -> dict:
    """Parity-test helper: live transformers model -> pytree."""
    sd = {k: v.detach().to("cpu").float().numpy() for k, v in torch_model.state_dict().items()}
    return params_from_state_dict(sd, cfg, dtype)


def params_from_safetensors(ckpt_dir: str, cfg: MoEConfig, dtype=jnp.bfloat16) -> dict:
    """Load from a directory of ``*.safetensors`` shards."""
    from safetensors import safe_open  # lazy; available via transformers dep

    files = sorted(glob.glob(os.path.join(ckpt_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors shards under {ckpt_dir}")
    sd: dict[str, np.ndarray] = {}

    class _LazySD(Mapping):
        def __init__(self, files):
            self.index = {}
            self.handles = []
            for fp in files:
                h = safe_open(fp, framework="numpy")
                self.handles.append(h)
                for key in h.keys():
                    self.index[key] = h

        def __getitem__(self, k):
            return self.index[k].get_tensor(k)

        def __iter__(self):
            return iter(self.index)

        def __len__(self):
            return len(self.index)

        def __contains__(self, k):
            return k in self.index

    return params_from_state_dict(_LazySD(files), cfg, dtype)
