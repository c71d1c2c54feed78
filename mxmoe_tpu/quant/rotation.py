"""QuaRot-style rotation as pure weight-space pytree transforms.

Reference: ``mxmoe/quant/rotation.py`` — fuse RMSNorm scales into adjacent
linears (``fuse_layer_norms``, :157-231), then multiply every hidden-space
in/out projection by a random orthogonal Hadamard Q
(``ModelRotator.rotate_model``, :435-469), plus an optional *online*
Hadamard on down_proj inputs (``online_had_down_proj``, :403-421).

Here the model is a functional pytree, so both steps are pure functions
params -> params with an exact invariance property (rotated model ==
original model in exact arithmetic), which tests/test_rotation.py checks.

Layout notes ([in, out] weights, y = x @ W):
  hidden-consuming linears (wq/wk/wv, router, expert/shared gate_up,
  shared_gate, lm_head):  W' = Qᵀ W
  hidden-producing linears (wo, expert/shared down): W' = W Q
  embedding: E' = E Q
  RMSNorm with unit weight commutes with orthogonal Q (norm-preserving),
  so norms must be fused first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import MoEConfig
from .hadamard import random_hadamard_matrix, matmul_hadU


# Hidden-consuming linears ([.., H, out]; GQA uses wq/wk/wv, MLA uses
# wq/kv_a — kv_b consumes the latent, not the hidden, so it is untouched).
_HIDDEN_IN = ("wq", "wk", "wv", "kv_a", "router", "shared_gate")
_HIDDEN_IN_STACKED = ("expert_gate_up",)                     # [L, E, H, out]
_HIDDEN_OUT = ("wo", "shared_down", "mlp_down")              # [.., in, H]
_HIDDEN_OUT_STACKED = ("expert_down",)                       # [L, E, in, H]


def _fuse_layer_stack(layers: dict) -> dict:
    """Fold input_norm/post_attn_norm of one stacked layer subtree into its
    hidden-consuming linears; set the norms to 1."""
    layers = dict(layers)
    g_in = layers["input_norm"]                  # [L, H]
    g_post = layers["post_attn_norm"]            # [L, H]

    def scale_rows(w, g):
        # w [L, H, out] (or [L, E, H, out]): scale the H (input) axis
        if w.ndim == 3:
            return w * g[:, :, None]
        return w * g[:, None, :, None]

    for name in ("wq", "wk", "wv", "kv_a"):
        if name in layers:
            layers[name] = scale_rows(layers[name], g_in)
    for name in ("router", "expert_gate_up", "shared_gate_up", "shared_gate",
                 "mlp_gate_up"):
        if name in layers:
            layers[name] = scale_rows(layers[name], g_post)

    layers["input_norm"] = jnp.ones_like(g_in)
    layers["post_attn_norm"] = jnp.ones_like(g_post)
    return layers


def fuse_layer_norms(params: dict) -> dict:
    """Fold RMSNorm scale vectors into the following linears; set norms to 1.

    input_norm -> wq/wk/wv (GQA) or wq/kv_a (MLA); post_attn_norm ->
    router, gate_up (experts + shared + dense-MLP), shared_gate;
    final_norm -> lm_head. Handles ds2's ``dense_layers`` subtree too.
    (Reference ``fuse_ln_linear``, rotation.py:132-155.)
    """
    out = dict(params)
    out["layers"] = _fuse_layer_stack(params["layers"])
    if "dense_layers" in params:
        out["dense_layers"] = _fuse_layer_stack(params["dense_layers"])
    out["lm_head"] = params["lm_head"] * params["final_norm"][:, None]
    out["final_norm"] = jnp.ones_like(params["final_norm"])
    return out


def _rotate_layer_stack(layers: dict, q: jax.Array) -> dict:
    layers = dict(layers)
    for name in _HIDDEN_IN + ("shared_gate_up", "mlp_gate_up"):
        if name in layers:
            layers[name] = jnp.einsum("hk,lhd->lkd", q, layers[name])
    for name in _HIDDEN_IN_STACKED:
        if name in layers:
            layers[name] = jnp.einsum("hk,lehd->lekd", q, layers[name])
    for name in _HIDDEN_OUT:
        if name in layers:
            layers[name] = jnp.einsum("lih,hk->lik", layers[name], q)
    for name in _HIDDEN_OUT_STACKED:
        if name in layers:
            layers[name] = jnp.einsum("leih,hk->leik", layers[name], q)
    return layers


def rotate_model(params: dict, q: jax.Array) -> dict:
    """Apply hidden-space rotation Q to a norm-fused param pytree.

    W' = Qᵀ W for hidden-consuming linears (contract Q's first axis with
    the H input axis), W' = W Q for hidden-producing ones, E' = E Q.
    """
    out = dict(params)
    out["layers"] = _rotate_layer_stack(params["layers"], q)
    if "dense_layers" in params:
        out["dense_layers"] = _rotate_layer_stack(params["dense_layers"], q)
    out["embed"] = params["embed"] @ q
    out["lm_head"] = jnp.einsum("hk,hv->kv", q, params["lm_head"])
    return out


def rotate_model_hadamard(
    params: dict, cfg: MoEConfig, key: jax.Array | None = None
) -> dict:
    """fuse_layer_norms + random-Hadamard R1 rotation (reference
    ``ModelRotator.rotate_model``)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    fused = fuse_layer_norms(params)
    q = random_hadamard_matrix(cfg.hidden_size, key, dtype=jnp.float32)
    return rotate_model(fused, q)


def _fuse_rotate_one_layer(lp: dict, q: jax.Array) -> dict:
    """fuse_layer_norms + Q rotation of ONE (unstacked) layer, computed in
    f32 via the stack transforms on a length-1 stack; each leaf is cast
    back to its input dtype (the reference rotates in fp64 and stores
    back into the model dtype, rotation.py:100-130)."""
    lp1 = {k: v[None].astype(jnp.float32) for k, v in lp.items()}
    rot = _rotate_layer_stack(_fuse_layer_stack(lp1), q)
    return {k: rot[k][0].astype(lp[k].dtype) for k in lp}


def rotate_model_hadamard_host(
    params: dict, cfg: MoEConfig, key: jax.Array | None = None
) -> dict:
    """Host-staged fuse+R1 rotation for NUMPY pytrees, one layer at a time.

    Same math as :func:`rotate_model_hadamard`, but peak memory is the
    pytree plus ONE f32 layer of temporaries instead of a full f32 copy of
    the model (~58 GB at 24-layer qwen2_moe widths — the staged-calibration
    host path). Layer-stack leaves are overwritten IN PLACE (numpy,
    writable); embed/lm_head/final_norm are replaced. All compute runs on
    the host CPU backend regardless of the default backend.
    """
    for k, v in params["layers"].items():
        assert isinstance(v, np.ndarray), f"host rotation needs numpy leaves ({k})"
    out = dict(params)
    with jax.default_device(jax.devices("cpu")[0]):
        key = key if key is not None else jax.random.PRNGKey(0)
        q = random_hadamard_matrix(cfg.hidden_size, key, dtype=jnp.float32)
        step = jax.jit(_fuse_rotate_one_layer)
        for sub in ("layers", "dense_layers"):
            if sub not in params:
                continue
            stack = params[sub]
            num = stack["input_norm"].shape[0]
            for l in range(num):
                new = step({k: v[l] for k, v in stack.items()}, q)
                for k, v in new.items():
                    stack[k][l] = np.asarray(v)
        # lm_head first: it may be a transposed view of embed
        lm = np.asarray(params["lm_head"])
        fn = np.asarray(params["final_norm"])
        new_lm = jnp.einsum(
            "hk,hv->kv", q,
            jnp.asarray(lm, jnp.float32) * jnp.asarray(fn, jnp.float32)[:, None])
        out["lm_head"] = np.asarray(new_lm.astype(lm.dtype))
        emb = np.asarray(params["embed"])
        out["embed"] = np.asarray(
            (jnp.asarray(emb, jnp.float32) @ q).astype(emb.dtype))
        out["final_norm"] = np.ones_like(fn)
    return out


def online_hadamard_down(h: jax.Array) -> jax.Array:
    """Online Hadamard on down_proj input (reference R4,
    ``rotation.py:403-421``): h @ H_N / sqrt(N) via FWHT — call with
    down weights pre-rotated by :func:`rotate_down_weights`."""
    return matmul_hadU(h)


def rotate_down_weights(down: jax.Array) -> jax.Array:
    """Pre-rotate down-proj weights [.., N, H] for the online Hadamard:
    W' = Hᵀ W so that (h H) @ W' == h @ W."""
    from .hadamard import hadamard_matrix

    n = down.shape[-2]
    h = hadamard_matrix(n, dtype=jnp.float32)
    if down.ndim == 4:
        return jnp.einsum("nm,lenh->lemh", h.T, down)
    return jnp.einsum("nm,lnh->lmh", h.T, down)
