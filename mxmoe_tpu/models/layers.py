"""Functional transformer building blocks (RMSNorm, RoPE, GQA attention,
MoE FFN) for the supported decoder families.

Everything is a pure function of (params, inputs): quantization, rotation
and calibration become pytree transforms instead of module surgery + hooks
(the reference's approach, ``quant.py:126-131``, ``rotation.py:435-469``).

Weight layout convention: all matmul weights are stored **[in, out]** so a
projection is ``x @ w`` (HF checkpoints hold [out, in]; the loader
transposes). MoE expert weights are stacked [E, in, out] and gate/up are
fused into one [E, H, 2N] operand — the same fused gate_up GEMM the
reference benchmarks (``gen_workload.py:95``: shapes [M, 2N, K]).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .configs import MoEConfig
from ..ops.dispatch import route_topk, make_dispatch, gather_tokens, combine_tokens
from ..ops import gmm as gmm_ops


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dt) * weight


def rope_frequencies(head_dim: int, theta: float, positions: jax.Array) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables [S, head_dim] in the HF half-rotation convention."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [S, hd/2]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, nH, hd]; cos/sin: [S, hd] (HF rotate_half convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return x * c + rotated * s


def attention(
    q: jax.Array,       # [B, S, nH, hd]
    k: jax.Array,       # [B, S, nKV, hd]
    v: jax.Array,       # [B, S, nKV, hd]
    causal: bool = True,
    backend: str = "xla",
    ring_fn=None,
) -> jax.Array:
    """GQA attention; keys/values broadcast across query groups.

    backend 'xla': einsum softmax (materializes S×S scores — fine for
    short calibration windows). 'flash': JAX's Pallas TPU flash-attention
    kernel (O(S) memory, long-sequence ppl eval / prefill); requires S a
    multiple of the kernel block and a TPU backend. 'ring': sequence-
    parallel ring attention over a device mesh (context parallelism for
    prefill beyond one chip's sequence budget) — ``ring_fn`` is the
    shard_map-wrapped kernel from
    ``parallel.ring_attention.make_ring_attention_fn`` (carried on
    ``MoEImpl.ring_attn``; built by ``parallel.sharded.
    make_sp_prefill_forward``).
    """
    b, s, n_h, hd = q.shape
    n_kv = k.shape[2]
    groups = n_h // n_kv

    if backend == "ring":
        assert ring_fn is not None, (
            "attn_backend='ring' needs MoEImpl.ring_attn (build the "
            "forward with parallel.sharded.make_sp_prefill_forward)")
        assert causal, "ring attention is causal-only"
        return ring_fn(q, k, v)

    if backend == "flash" and causal and jax.default_backend() == "tpu":
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        kr = jnp.repeat(k, groups, axis=2) if groups > 1 else k
        vr = jnp.repeat(v, groups, axis=2) if groups > 1 else v
        out = fa.flash_attention(
            q.transpose(0, 2, 1, 3), kr.transpose(0, 2, 1, 3),
            vr.transpose(0, 2, 1, 3),
            causal=True, sm_scale=1.0 / float(hd) ** 0.5,
        )
        return out.transpose(0, 2, 1, 3)

    qg = q.reshape(b, s, n_kv, groups, hd)
    scores = jnp.einsum("bsngh,btnh->bngst", qg, k).astype(jnp.float32)
    scores = scores / jnp.sqrt(float(hd))
    if causal:
        t = k.shape[1]
        mask = jnp.tril(jnp.ones((s, t), dtype=bool), k=t - s)
        scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bngst,btnh->bsngh", probs, v)
    return out.reshape(b, s, n_h, hd)


_DECODE_ATTN_MODEL = ...   # Ellipsis = not loaded yet (None = no file)


def _decode_attn_model():
    """perf/decode_attn_model.json, loaded once (override path with
    MXMOE_DECODE_ATTN_MODEL; empty value disables the table)."""
    global _DECODE_ATTN_MODEL
    if _DECODE_ATTN_MODEL is ...:
        import json
        import os

        path = os.environ.get("MXMOE_DECODE_ATTN_MODEL")
        if path is None:
            path = os.path.join(
                os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))),
                "perf", "decode_attn_model.json")
        try:
            with open(path) as f:
                _DECODE_ATTN_MODEL = json.load(f)
        except (OSError, ValueError):
            _DECODE_ATTN_MODEL = None
    return _DECODE_ATTN_MODEL


def _decode_attn_key(cfg: MoEConfig) -> str:
    """Attention-shape key into the decode-attn cost table (must match
    tools/tpu_decode_attn_fit.py CONFIGS)."""
    if cfg.attention_type == "mla":
        dk = -(-(cfg.qk_nope_head_dim + cfg.qk_rope_head_dim) // 128) * 128
        return f"mla:nh{cfg.num_heads}:dk{dk}:dv{cfg.v_head_dim}"
    return f"gqa:nh{cfg.num_heads}:nkv{cfg.num_kv_heads}:hd{cfg.head_dim}"


@dataclasses.dataclass(frozen=True)
class MoEImpl:
    """How the expert FFN is executed.

    kind:
      'dense'  — every expert runs on every token (einsum, tiny tests only)
      'ragged' — sort + grouped matmul (jax.lax.ragged_dot or Pallas gmm)

    quant: a QLinearConfig scheme for the routed expert linears. When set
    (and the layer params carry quantized weights, see
    :func:`mxmoe_tpu.quant.qparams.quantize_model_experts_uniform`), the
    expert FFN runs through the quantized Pallas grouped matmuls with
    dynamic per-token activation quant. Attention, router and shared expert
    stay high-precision — same scope as the reference (expert linears only,
    ``quant.py:319-359``).
    interpret: run Pallas kernels in interpreter mode (CPU tests).
    """

    kind: str = "ragged"
    gmm_backend: str = "ragged_dot"  # 'ragged_dot' | 'pallas'
    quant: object | None = None      # QLinearConfig
    interpret: bool = False
    online_had: bool = False         # online Hadamard on down-proj inputs
                                     # (QuaRot R4; down weights must be
                                     # pre-rotated, rotation.rotate_down_weights)
    attn_backend: str = "xla"        # 'xla' | 'flash' (Pallas TPU kernel)
    dispatch_align: int | None = None  # pad each expert's rows to this
                                     # multiple (= kernel bm): tiles never
                                     # straddle experts (see make_dispatch)
    decode_attn: str = "auto"        # cached single-step attention:
                                     # 'fused' (Pallas decode kernel) |
                                     # 'xla' | 'auto' (fused on TPU)
    mixed_weight_only: bool = False  # mixed layers contain a16 weight-only
                                     # experts: route through the one-launch
                                     # gmm_mixed_wo_wxa (measured faster
                                     # than bucketed at every M —
                                     # bench/fused_ab.py, PERF.md)
    fused_ffn: object = False        # whole expert FFN (gate_up -> SwiGLU
                                     # -> requant -> down) in ONE Pallas
                                     # launch (gmm_ffn_w8a8 /
                                     # gmm_ffn_mixed_packed). True forces
                                     # it; "auto" fuses only in the decode
                                     # regime (<=2048 routed rows) with an
                                     # implied 32-row aligned dispatch.
                                     # Sym per-channel domain; other
                                     # schemes fall through to 2-launch
    pallas_quant: bool = True        # single-pass Pallas act quant
                                     # (ops/act_quant.py): XLA's lowering
                                     # reads activations twice; measured
                                     # 0.8 ms/step on the headline workload
                                     # (PERF.md). Bitwise-identical codes.
    ep_moe: object = None            # multi-chip routed MoE block
                                     # ((x [B,S,H], lp, cfg) -> y, built by
                                     # parallel.ep.make_ep_moe_block): the
                                     # cached decode/forward paths run the
                                     # EP all-to-all inside the step when
                                     # set (serving over a device mesh)
    stack_weights: object = None     # decode weight-stack layout: None =
                                     # auto (stack iff NOT interpret: the
                                     # loop-constant stack removes the
                                     # per-step slice copy on TPU, but the
                                     # Pallas INTERPRETER pays O(full
                                     # operand) per call — a 26-layer
                                     # stack measured 16.2 s/call vs
                                     # 0.66 s for one layer on CPU);
                                     # True/False force it (tests)
    ring_attn: object = None         # shard_map ring-attention callable
                                     # ((q,k,v) -> out) for
                                     # attn_backend="ring" (sequence-
                                     # parallel prefill; built by
                                     # parallel.sharded.
                                     # make_sp_prefill_forward)

    def use_fused_decode(self, s_max: int | None = None,
                         cfg: "MoEConfig | None" = None,
                         batch: int | None = None) -> bool:
        """auto: pick the MEASURED winner for this family's attention
        shape at this (S_max, batch) — perf/decode_attn_model.json holds
        per-(config, batch) a + b*S_max fits for both paths from
        tools/tpu_decode_attn_fit.py. Round-4 weak #6: the single 2048
        constant was measured at one (B, n_kv, head_dim) point; the
        fused kernel's grid dispatches scale with B, so the crossover is
        batch-dependent (B=8 crossovers sit at ~650-1300, B=32 much
        higher). Nearest measured batch wins; families without a fit
        keep the original heuristic (crossover ~2048)."""
        if self.decode_attn == "auto":
            on_tpu = self.interpret or jax.default_backend() == "tpu"
            if not on_tpu:
                return False
            if cfg is not None and s_max is not None:
                grp = (_decode_attn_model() or {}).get(_decode_attn_key(cfg))
                if grp:
                    bs = sorted(int(k[1:]) for k in grp)
                    bsel = (min(bs, key=lambda b: abs(b - batch))
                            if batch is not None else bs[0])
                    ent = grp[f"b{bsel}"]
                    t_x = ent["xla"][0] + ent["xla"][1] * s_max
                    t_f = ent["fused"][0] + ent["fused"][1] * s_max
                    return t_f <= t_x
            return s_max is None or s_max >= 2048
        return self.decode_attn == "fused"


def silu_mul(gate_up: jax.Array) -> jax.Array:
    """Fused SwiGLU activation on a [.., 2N] gate_up projection."""
    n = gate_up.shape[-1] // 2
    gate, up = gate_up[..., :n], gate_up[..., n:]
    return jax.nn.silu(gate) * up


def moe_ffn_dense(x2d: jax.Array, layer_params: dict, cfg: MoEConfig) -> jax.Array:
    """Reference-fidelity O(E) dense MoE execution (test oracle)."""
    logits = x2d @ layer_params["router"]
    routing = route_topk(logits, cfg.top_k, cfg.norm_topk_prob, cfg.routed_scaling_factor)
    gate_up = layer_params["expert_gate_up"]  # [E, H, 2N]
    down = layer_params["expert_down"]        # [E, N, H]
    h = jnp.einsum("th,ehn->etn", x2d, gate_up)
    h = silu_mul(h)
    out_all = jnp.einsum("etn,enh->eth", h, down)  # [E, T, H]
    one_hot = jax.nn.one_hot(routing.expert_ids, cfg.num_experts, dtype=x2d.dtype)  # [T,k,E]
    w = (routing.weights.astype(x2d.dtype)[..., None] * one_hot).sum(1)  # [T, E]
    return jnp.einsum("eth,te->th", out_all, w)


def _act_fq_per_row(x: jax.Array, bits_per_row: jax.Array) -> jax.Array:
    """Per-token symmetric fake-quant with a per-row bitwidth (16 = off).

    Vectorized analog of the reference's per-linear act-quant hooks
    (``quant.py:126-131``) for mixed-precision eval: each expert's rows get
    that expert's activation width.
    """
    upper = jnp.exp2(bits_per_row.astype(jnp.float32) - 1.0) - 1.0   # [M]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-10) / upper
    q = jnp.round(x.astype(jnp.float32) / scale[:, None]) * scale[:, None]
    keep = (bits_per_row >= 16)[:, None]
    return jnp.where(keep, x.astype(jnp.float32), q).astype(x.dtype)


def _act_fq_per_row_flex(x: jax.Array, bits_per_row: jax.Array,
                         row_gsize: jax.Array, gsize: int) -> jax.Array:
    """FLEX fake-quant: per-row bitwidth AND per-row grouping (rows of
    grouped-act experts quantize per k-group of ``gsize``; others
    per-token). Dequantizes exactly the codes·scales the REAL flex path
    computes (``qparams.quantize_act_rows_flex``), so flex real-vs-fake
    ppl comparisons see identical activation transforms. 16-bit rows pass
    through."""
    from ..quant.qparams import quantize_act_rows_flex

    q, scale = quantize_act_rows_flex(x, bits_per_row, row_gsize, gsize)
    m, k = x.shape
    deq = (q.astype(jnp.float32).reshape(m, k // gsize, gsize)
           * scale[..., None]).reshape(m, k)
    keep = (bits_per_row >= 16)[:, None]
    return jnp.where(keep, x.astype(jnp.float32), deq).astype(x.dtype)


def moe_ffn_ragged(
    x2d: jax.Array,
    layer_params: dict,
    cfg: MoEConfig,
    impl: MoEImpl,
) -> jax.Array:
    """Production path: sort tokens by expert, two grouped matmuls, combine.

    When the layer params carry ``act_bits_gateup``/``act_bits_down`` [E]
    arrays (mixed fake-quant eval, see quant/quantizer.py), activations are
    fake-quantized per expert row group before each grouped matmul.
    """
    logits = x2d @ layer_params["router"]
    routing = route_topk(logits, cfg.top_k, cfg.norm_topk_prob, cfg.routed_scaling_factor)
    disp = make_dispatch(routing, cfg.num_experts, align=impl.dispatch_align)
    xs = gather_tokens(x2d, disp)                                   # [T*k, H]
    mixed_act = "act_bits_gateup" in layer_params

    def _fq(acts, bits_key, ag_key):
        row_bits = jnp.take(layer_params[bits_key], row_expert)
        ag = layer_params.get(ag_key)      # [E, G] per-expert a_gsize or None
        if ag is None:
            return _act_fq_per_row(acts, row_bits)
        return _act_fq_per_row_flex(
            acts, row_bits, jnp.take(ag[:, 0], row_expert),
            acts.shape[-1] // ag.shape[-1])

    if mixed_act:
        row_expert = jnp.repeat(
            jnp.arange(cfg.num_experts, dtype=jnp.int32), disp.group_sizes,
            total_repeat_length=xs.shape[0],
        )
        xs = _fq(xs, "act_bits_gateup", "act_gsize_gateup")
    h = gmm_ops.gmm(xs, layer_params["expert_gate_up"], disp.group_sizes,
                    backend=impl.gmm_backend)                       # [T*k, 2N]
    h = silu_mul(h)
    if impl.online_had:
        from ..quant.hadamard import matmul_hadU

        h = matmul_hadU(h)
    if mixed_act:
        h = _fq(h, "act_bits_down", "act_gsize_down")
    out = gmm_ops.gmm(h, layer_params["expert_down"], disp.group_sizes,
                      backend=impl.gmm_backend)                     # [T*k, H]
    return combine_tokens(out, disp, x2d.shape[0])


_EXPERT_STACK_KEYS = tuple(
    p + s for p in ("expert_gate_up", "expert_down")
    for s in ("_qcat", "_q", "_q_packed", "_sc", "_zp"))


def split_expert_stack(layers: dict, flatten: bool = True) -> tuple[dict, dict]:
    """Partition stacked layer params into scan-xs (small, per-layer) and
    the expert-weight STACK: flattened ``[L*E, ...]`` (``[L*R, N]`` for the
    ragged packed buffer) views passed as loop CONSTANTS and indexed
    in-kernel via globalized metadata (``ops.pallas_gmm._globalize_meta``).

    Why: XLA cannot fuse a scan iteration's dynamic-slice into a Pallas
    custom-call operand, so carrying expert weights as scan-xs materializes
    a full copy of every layer's quantized weights EVERY decode step —
    measured +0.52 ms per launch on a 173 MB operand while the kernel
    itself runs at the weight-traffic bound (tools/tpu_scan_slice_ab.py).
    The reshape here is layout-free; only tiny metadata varies per layer.

    ``flatten=False`` keeps stack arrays at their full ``[L, E, ...]``
    shape (the EP serving path: expert dim 1 must stay a shardable axis —
    shards flatten locally inside the shard_map, parallel.ep).
    """
    xs, stack = {}, {}
    for k, v in layers.items():
        if k in _EXPERT_STACK_KEYS:
            stack[k] = v.reshape((-1,) + v.shape[2:]) if flatten else v
        else:
            xs[k] = v
    if stack and not flatten:
        stack["_num_layers"] = next(iter(stack.values())).shape[0]
        return xs, stack
    if stack:
        # one-launch wo+w×a needs per-group a16 flags at GLOBAL group ids
        for bits_key, fk in (("act_bits_gateup", "flags16_gateup"),
                             ("act_bits_down", "flags16_down")):
            if bits_key in layers:
                stack[fk] = (layers[bits_key] >= 16).astype(
                    jnp.int32).reshape(-1)
        if "act_bits_down" in layers:
            # fused-FFN in-kernel requant bits at GLOBAL group ids
            stack["abits8_down"] = jnp.minimum(
                layers["act_bits_down"], 8).astype(jnp.int32).reshape(-1)
        stack["_num_layers"] = next(iter(layers.values())).shape[0]
    return xs, stack


def moe_ffn_ragged_quant(
    x2d: jax.Array,
    layer_params: dict,
    cfg: MoEConfig,
    impl: MoEImpl,
) -> jax.Array:
    """Real-quantized expert FFN: per-token act quant + quantized gmm.

    Scheme selection (impl.quant):
      a_bits < 16  -> int8×int8 MXU kernel with s_a·s_b epilogue (w8a8-class;
                      w4 codes ride the same int8 path until int4-native
                      storage lands)
      a_bits >= 16 -> weight-only kernel (bf16 MXU, in-kernel dequant)

    When ``layer_params`` carries ``_expert_stack``/``_layer_index`` (set
    by the forwards' layer scans, see :func:`split_expert_stack`), weight
    operands come from the flattened all-layer stack and the kernels get
    ``group_base``/``num_total_groups`` instead of per-layer slices.
    """
    from ..quant.qparams import (quantize_act_rtn, quantize_act_per_row_bits,
                                 quantize_act_rows_flex)
    from ..ops import pallas_gmm
    from ..ops import act_quant

    qcfg = impl.quant
    stack = layer_params.get("_expert_stack") or {}
    if stack:
        n_layers = stack["_num_layers"]
        n_groups_total = n_layers * cfg.num_experts
        g_base = (jnp.asarray(layer_params["_layer_index"], jnp.int32)
                  * cfg.num_experts)
        gkw = {"group_base": g_base, "num_total_groups": n_groups_total}
    else:
        gkw = {}

    def _w(key):
        """Weight-side param: the flattened all-layer stack when present."""
        return stack[key] if key in stack else layer_params.get(key)

    def _has(key):
        return key in stack or key in layer_params

    def _aquant_rows(acts, row_bits):
        """Per-row-bits act quant; single-pass Pallas kernel when enabled
        (bitwise-identical to the XLA path — tests/test_act_quant.py)."""
        if impl.pallas_quant:
            return act_quant.quantize_rows(acts, row_bits,
                                           interpret=impl.interpret)
        return quantize_act_per_row_bits(acts, row_bits)

    def _aquant_uniform(acts):
        # a_bits <= 8 guard: quantize_rows clips bits>=16 to 8 while the XLA
        # fallback does not — keep an a16 scheme from ever silently taking
        # the clipped Pallas path if a future call site drops the outer gate
        if impl.pallas_quant and qcfg.a_sym and qcfg.a_bits <= 8:
            return act_quant.quantize_rows_uniform(
                acts, int(qcfg.a_bits), interpret=impl.interpret)
        return quantize_act_rtn(acts, qcfg)
    logits = x2d @ layer_params["router"]
    routing = route_topk(logits, cfg.top_k, cfg.norm_topk_prob, cfg.routed_scaling_factor)
    # fused_ffn "auto": fuse only in the DECODE regime (few rows) — at
    # prefill M the 2-launch path's big m-tiles beat the fused kernel's
    # aligned 32-row tiles, mirroring decode_attn=auto's shape gate
    rows_est = x2d.shape[0] * cfg.top_k
    fuse_req = (impl.fused_ffn is True
                or (impl.fused_ffn == "auto" and rows_est <= 2048))
    align = impl.dispatch_align or (32 if fuse_req else None)
    disp = make_dispatch(routing, cfg.num_experts, align=align)
    xs = gather_tokens(x2d, disp)                                   # [T*k, H]
    mixed = "act_bits_gateup" in layer_params and (
        _has("expert_gate_up_q")
        or _has("expert_gate_up_q_packed")
        or _has("expert_gate_up_qcat"))
    if mixed:
        row_expert = jnp.repeat(
            jnp.arange(cfg.num_experts, dtype=jnp.int32), disp.group_sizes,
            total_repeat_length=xs.shape[0],
        )

    # fused whole-FFN eligibility: per-channel SYM families only. BOTH
    # act_gsize keys must be absent (a flex DOWN family alone would slip
    # a grouped/asym scheme into the per-channel kernel — advisor round-4
    # medium: its down-scale BlockSpec reads group 0 and drops zp). zp
    # arrays may exist but are all-zero in this domain (qparams emits
    # zeros for sym; asym/grouped families always carry act_gsize_*).
    fused_ok = (
        fuse_req and align and not impl.online_had
        and not impl.mixed_weight_only
        and "act_gsize_gateup" not in layer_params
        and "act_gsize_down" not in layer_params
        and (mixed or (qcfg is not None and not isinstance(qcfg, str)
                       and qcfg.a_bits <= 8
                       and qcfg.w_sym and qcfg.w_gsize == -1)))

    def _fused_act_quant():
        if mixed:
            row_bits = jnp.take(layer_params["act_bits_gateup"], row_expert)
            aq, asc = _aquant_rows(xs, row_bits)
            abits = (stack["abits8_down"] if "abits8_down" in stack else
                     jnp.minimum(layer_params["act_bits_down"],
                                 8).astype(jnp.int32))
        else:
            aq, asc = _aquant_uniform(xs)
            abits = jnp.full((_w("expert_down_q").shape[0],),
                             min(int(qcfg.a_bits), 8), jnp.int32)
        return aq, asc, abits

    if fused_ok and _has("expert_gate_up_q") and _has("expert_down_q"):
        # ONE launch for the whole expert FFN (gmm_ffn_w8a8): the aligned
        # dispatch guarantees every m-tile is owned by one expert, which
        # the kernel's m-tile-outer schedule requires
        aq, asc, abits = _fused_act_quant()
        out = pallas_gmm.gmm_ffn_w8a8(
            aq, asc, _w("expert_gate_up_q"), _w("expert_gate_up_sc"),
            _w("expert_down_q"), _w("expert_down_sc"), disp.group_sizes,
            act_bits_down=abits, bm=align,
            out_dtype=x2d.dtype, interpret=impl.interpret, **gkw)
        return combine_tokens(out, disp, x2d.shape[0])

    if (fused_ok and mixed and _has("expert_gate_up_qcat")
            and _has("expert_down_qcat")):
        # fused FFN over the PACKED ragged layout — the storage serving
        # decode actually uses (convert --pack-int4 artifacts): one launch
        # for gate_up -> SwiGLU -> requant -> down with w<=4 experts
        # streaming half their weight bytes (gmm_ffn_mixed_packed)
        aq, asc, abits = _fused_act_quant()
        gu_cat, d_cat = _w("expert_gate_up_qcat"), _w("expert_down_qcat")

        def _blkg(prefix, qcat_rows, kdim):
            blk = layer_params[f"{prefix}_blk"]
            if stack:
                units = qcat_rows // n_layers // (kdim // 2)
                blk = blk + (jnp.asarray(layer_params["_layer_index"],
                                         jnp.int32) * units)
            return blk

        out = pallas_gmm.gmm_ffn_mixed_packed(
            aq, asc,
            gu_cat, _w("expert_gate_up_sc"),
            layer_params["expert_gate_up_pf"],
            _blkg("expert_gate_up", gu_cat.shape[0], xs.shape[-1]),
            d_cat, _w("expert_down_sc"),
            layer_params["expert_down_pf"],
            _blkg("expert_down", d_cat.shape[0], gu_cat.shape[-1] // 2),
            disp.group_sizes, act_bits_down=abits, bm=align,
            out_dtype=x2d.dtype, interpret=impl.interpret, **gkw)
        return combine_tokens(out, disp, x2d.shape[0])

    def qgemm(acts, prefix):
        sc = _w(f"{prefix}_sc")
        # decode-scale M: with bm=128+ every boundary tile recomputes its
        # full row block once per straddling expert (~all 60 at 2 rows
        # each) — 4x the MXU work of bm=32, which stays hidden under the
        # weight DMA (the 686 GB/s decode micro used 32-row tiles). Large
        # M keeps big tiles for MXU efficiency.
        bm = 32 if acts.shape[0] <= 256 else 256
        k = acts.shape[-1]
        bits_key = ("act_bits_gateup" if prefix == "expert_gate_up"
                    else "act_bits_down")
        ag_key = ("act_gsize_gateup" if prefix == "expert_gate_up"
                  else "act_gsize_down")
        def _blk_global(qcat_rows):
            """Ragged-buffer block starts, layer-global when stacked."""
            blk = layer_params[f"{prefix}_blk"]
            if stack:
                units = qcat_rows // n_layers // (k // 2)
                blk = blk + (jnp.asarray(layer_params["_layer_index"],
                                         jnp.int32) * units)
            return blk

        def _flags16():
            fk = ("flags16_gateup" if prefix == "expert_gate_up"
                  else "flags16_down")
            if fk in stack:
                return stack[fk]          # [L*E] at global group ids
            return (layer_params[bits_key] >= 16).astype(jnp.int32)

        if mixed and ag_key in layer_params:
            # FLEX mixed: this family's scheme set contains grouped and/or
            # asymmetric schemes — per-expert (bits, gsize, sym) are ALL
            # data: act codes+scales [M, G] from the per-row flex quant,
            # weight scales/zp [E, G, N] (per-channel experts replicated),
            # one launch (reference fused-kernel scheme domain,
            # compose_kernel.py:47-57 / hz_fused.cuh instance _89)
            gdim = sc.shape[-2]
            gsz_min = k // gdim
            ag = layer_params[ag_key]                      # [E, G]
            row_bits = jnp.take(layer_params[bits_key], row_expert)
            row_ag = jnp.take(ag[:, 0], row_expert)
            aq, asc = quantize_act_rows_flex(acts, row_bits, row_ag, gsz_min)
            zp = _w(f"{prefix}_zp")
            n_out = sc.shape[-1]
            bn = min(n_out, max(512, ((3 * 1024 * 1024) // max(k, 1)) // 128 * 128))
            if _has(f"{prefix}_qcat"):
                qcat = _w(f"{prefix}_qcat")
                return pallas_gmm.gmm_mixed_packed(
                    aq, asc, qcat, sc,
                    disp.group_sizes, layer_params[f"{prefix}_pf"],
                    _blk_global(qcat.shape[0]), bm=bm, bn=bn, rhs_zp=zp,
                    out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
                )
            wq = _w(f"{prefix}_q")
            if impl.mixed_weight_only:
                return pallas_gmm.gmm_mixed_wo_wxa(
                    acts, aq, asc, wq, sc, _flags16(), disp.group_sizes,
                    bm=bm, bn=bn, rhs_zp=zp, out_dtype=acts.dtype,
                    interpret=impl.interpret, **gkw,
                )
            return pallas_gmm.gmm_w8a8_grouped(
                aq, asc, wq, sc, disp.group_sizes, gsize=gsz_min, bm=bm, bn=bn,
                rhs_zp=zp, out_dtype=acts.dtype, interpret=impl.interpret,
                **gkw,
            )
        if _has(f"{prefix}_qcat"):
            # mixed schemes with PACKED w<=4 storage: one launch over the
            # ragged weight buffer (w4 experts stream half the bytes);
            # bitwise-identical to the int8-stored one-launch path
            # (quantize_model_experts_mixed(pack_w4=True))
            row_bits = jnp.take(layer_params[bits_key], row_expert)
            aq, asc = _aquant_rows(acts, row_bits)
            n_out = sc.shape[-1]
            bn = min(n_out, max(512, ((3 * 1024 * 1024) // max(k, 1)) // 128 * 128))
            qcat = _w(f"{prefix}_qcat")
            return pallas_gmm.gmm_mixed_packed(
                aq, asc, qcat, sc,
                disp.group_sizes, layer_params[f"{prefix}_pf"],
                _blk_global(qcat.shape[0]), bm=bm, bn=bn,
                out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
            )
        if _has(f"{prefix}_q_packed"):
            # nibble-packed w4 weights (convert --pack-int4): half the HBM
            wqp = _w(f"{prefix}_q_packed")
            n_out = wqp.shape[-1]
            bn = min(n_out, max(512, ((3 * 1024 * 1024) // max(k, 1)) // 128 * 128))
            if not mixed and qcfg.a_bits >= 16:
                # w4a16: bf16 acts against packed weights (in-kernel dequant)
                zp_p = _w(f"{prefix}_zp")
                if zp_p is None:
                    zp_p = jnp.zeros_like(sc)
                return pallas_gmm.gmm_weight_only_packed(
                    acts, wqp, sc, zp_p, disp.group_sizes,
                    gsize=qcfg.w_gsize, bm=bm, bn=bn,
                    out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
                )
            aq, asc = _aquant_uniform(acts) if not mixed else (None, None)
            if mixed:
                row_bits = jnp.take(layer_params[bits_key], row_expert)
                aq, asc = _aquant_rows(acts, row_bits)
            return pallas_gmm.gmm_w4a8_packed(
                aq, asc, wqp, sc, disp.group_sizes, bm=bm, bn=bn,
                out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
            )
        wq = _w(f"{prefix}_q")
        zp = _w(f"{prefix}_zp")
        n_out = wq.shape[-1]
        # wide n-tiles cut lhs refetch and (for tiny decode M) make each
        # expert's weights stream exactly once; cap the K x bn VMEM block
        # and keep bn lane-aligned
        bn = min(n_out, max(512, ((3 * 1024 * 1024) // max(k, 1)) // 128 * 128))
        if mixed:
            # per-expert mixed schemes in one int8 launch: bitwidths are
            # data (per-expert scales, per-row act clip ranges)
            row_bits = jnp.take(layer_params[bits_key], row_expert)
            aq, asc = _aquant_rows(acts, row_bits)
            if impl.mixed_weight_only:
                # layer mixes a16 weight-only experts with w×a ones: the
                # fused launch keeps a16 rows at full act precision
                # (bf16 dot on dequantized weights) while w×a experts run
                # the int8 MXU — one launch beats bucketed at every M
                # (bench/fused_ab.py; reference hz_fused.cuh:14-127)
                return pallas_gmm.gmm_mixed_wo_wxa(
                    acts, aq, asc, wq, sc, _flags16(), disp.group_sizes,
                    bm=bm, bn=bn, out_dtype=acts.dtype, interpret=impl.interpret,
                    **gkw,
                )
            return pallas_gmm.gmm_w8a8(
                aq, asc, wq, sc, disp.group_sizes, bm=bm, bn=bn,
                out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
            )
        gsz = k if qcfg.w_gsize == -1 else qcfg.w_gsize
        if qcfg.a_bits < 16:
            if qcfg.w_gsize != -1:
                # g128-class w×a: per-(token, k-group) act scales feeding the
                # Atom-style grouped-rescale kernel (same group size both
                # sides, as in the reference's w4a4_g128)
                from ..quant.qparams import quantize_act_grouped

                aq, asc = quantize_act_grouped(acts, int(qcfg.a_bits), gsz)
                main = pallas_gmm.gmm_w8a8_grouped(
                    aq, asc, wq, sc, disp.group_sizes, gsize=gsz, bm=bm, bn=bn,
                    out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
                )
                if qcfg.w_sym:
                    return main
                # grouped ASYM: w = q·s_g + zp_g per k-group, so
                #   out = Σ_g as_g·s_g (aq·q)  [the kernel above]
                #       + Σ_g (as_g · Σ_{k∈g} aq) · zp_g[g, :]
                # — the zp term contracts only over the G = K/gsz axis, a
                # tiny f32 ragged dot outside the kernel (vs the reference
                # folding zp into the CUDA mainloop, cta_gemm.cuh asym)
                m_rows = aq.shape[0]
                rows = (aq.astype(jnp.float32)
                        .reshape(m_rows, k // gsz, gsz).sum(-1) * asc)
                zp_l = zp
                if stack:   # zp rides the stack: take this layer's slice
                    zp_l = jax.lax.dynamic_slice_in_dim(
                        zp, g_base, cfg.num_experts, axis=0)
                corr = jax.lax.ragged_dot(
                    rows, zp_l.astype(jnp.float32),
                    disp.group_sizes, preferred_element_type=jnp.float32)
                return (main.astype(jnp.float32) + corr).astype(acts.dtype)
            aq, asc = _aquant_uniform(acts)
            if not qcfg.w_sym:
                return pallas_gmm.gmm_w8a8_asym(
                    aq, asc, wq, sc, zp, disp.group_sizes, bm=bm, bn=bn,
                    out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
                )
            return pallas_gmm.gmm_w8a8(
                aq, asc, wq, sc, disp.group_sizes, bm=bm, bn=bn,
                out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
            )
        return pallas_gmm.gmm_weight_only(
            acts, wq, sc, zp, disp.group_sizes, gsize=gsz, bm=bm, bn=bn,
            out_dtype=acts.dtype, interpret=impl.interpret, **gkw,
        )

    h = qgemm(xs, "expert_gate_up")                                  # [T*k, 2N]
    h = silu_mul(h)
    if impl.online_had:
        from ..quant.hadamard import matmul_hadU

        h = matmul_hadU(h)
    out = qgemm(h, "expert_down")                                    # [T*k, H]
    return combine_tokens(out, disp, x2d.shape[0])


def shared_expert_ffn(x2d: jax.Array, layer_params: dict, cfg: MoEConfig,
                      interpret: bool | None = None) -> jax.Array:
    if interpret is None:
        # callers that predate the Pallas shared branches (calibrate,
        # hybrid sharded forward) get the backend-appropriate default
        interpret = jax.default_backend() == "cpu"
    if "shared_gate_up_q" in layer_params:
        # REAL-quantized shared expert (quantize_model_experts_mixed) —
        # the reference's shared expert is one more problem row in the
        # fused launch (gen_workload.py:93-103), so every integer scheme
        # stores codes for real here too (round-4 verdict missing #5):
        #   per-channel sym w×a  -> int8 K-split MXU dots (proven fastest
        #                           for this dense tall-narrow shape)
        #   grouped / asym  w×a  -> E=1 grouped Pallas launch (same
        #                           kernel class as routed flex experts)
        #   a16 weight-only      -> E=1 weight-only launch (shared_wo
        #                           key marks the wo domain statically)
        from ..ops import pallas_gmm
        from ..ops.gmm import int8_dot_ksplit
        from ..quant.qparams import (quantize_act_per_row_bits,
                                     quantize_act_rows_flex)

        t = x2d.shape[0]
        bits = layer_params["act_bits_shared"]          # [2]
        sc_g = layer_params["shared_gate_up_sc"]
        grouped = (sc_g.shape[-2] > 1
                   or "shared_gate_up_zp" in layer_params
                   or "shared_down_zp" in layer_params)
        one_group = jnp.full((1,), t, jnp.int32)

        def qdot(acts, name, b):
            aq, asc = quantize_act_per_row_bits(
                acts, jnp.full((t,), b, jnp.float32))
            acc = int8_dot_ksplit(aq, layer_params[f"{name}_q"])
            return (acc.astype(jnp.float32) * asc
                    * layer_params[f"{name}_sc"]).astype(x2d.dtype)

        def qdot_grouped(acts, name, b):
            sc = layer_params[f"{name}_sc"]             # [G, N]
            zp = layer_params.get(f"{name}_zp")
            gsize = acts.shape[-1] // sc.shape[-2]
            # act quant stays PER-TOKEN (row_gsize -1; scales replicate
            # across G) — the fake shared protocol quantizes per token,
            # and real-vs-fake ppl must compare the same act transform
            aq, asc = quantize_act_rows_flex(
                acts, jnp.full((t,), b, jnp.float32),
                jnp.full((t,), -1.0, jnp.float32), gsize)
            return pallas_gmm.gmm_w8a8_grouped(
                aq, asc, layer_params[f"{name}_q"][None], sc[None],
                one_group, gsize=gsize,
                rhs_zp=None if zp is None else zp[None],
                out_dtype=x2d.dtype, interpret=interpret)

        def qdot_wo(acts, name):
            sc = layer_params[f"{name}_sc"]
            zp = layer_params.get(f"{name}_zp")
            if zp is None:
                zp = jnp.zeros_like(sc)
            gsize = acts.shape[-1] // sc.shape[-2]
            return pallas_gmm.gmm_weight_only(
                acts, layer_params[f"{name}_q"][None], sc[None], zp[None],
                one_group, gsize=gsize, out_dtype=x2d.dtype,
                interpret=interpret)

        if "shared_wo" in layer_params:
            h = silu_mul(qdot_wo(x2d, "shared_gate_up"))
            out = qdot_wo(h, "shared_down")
        elif grouped:
            h = silu_mul(qdot_grouped(x2d, "shared_gate_up", bits[0]))
            out = qdot_grouped(h, "shared_down", bits[1])
        else:
            h = silu_mul(qdot(x2d, "shared_gate_up", bits[0]))
            out = qdot(h, "shared_down", bits[1])
    else:
        x_in = x2d
        if "act_bits_shared" in layer_params:
            bits = layer_params["act_bits_shared"]  # [2] (gate_up, down input)
            x_in = _act_fq_per_row(x2d, jnp.full((x2d.shape[0],), bits[0]))
        h = silu_mul(x_in @ layer_params["shared_gate_up"])
        if "act_bits_shared" in layer_params:
            h = _act_fq_per_row(h, jnp.full((h.shape[0],), bits[1]))
        out = h @ layer_params["shared_down"]
    if cfg.has_shared_expert_gate:
        gate = jax.nn.sigmoid(x2d @ layer_params["shared_gate"])  # [T, 1]
        out = out * gate.astype(out.dtype)
    return out


def moe_block(
    x: jax.Array,                # [B, S, H]
    layer_params: dict,
    cfg: MoEConfig,
    impl: MoEImpl = MoEImpl(),
) -> jax.Array:
    b, s, h = x.shape
    x2d = x.reshape(-1, h)
    qkeys = ("expert_gate_up_q", "expert_gate_up_q_packed",
             "expert_gate_up_qcat")
    estack = layer_params.get("_expert_stack") or {}
    if impl.kind == "dense":
        y = moe_ffn_dense(x2d, layer_params, cfg)
    elif impl.quant is not None and any(
            k in layer_params or k in estack for k in qkeys):
        y = moe_ffn_ragged_quant(x2d, layer_params, cfg, impl)
    else:
        y = moe_ffn_ragged(x2d, layer_params, cfg, impl)
    if cfg.shared_expert_intermediate_size > 0:
        y = y + shared_expert_ffn(x2d, layer_params, cfg,
                                   interpret=impl.interpret)
    return y.reshape(b, s, h)


def rope_frequencies_interleaved(
    rope_dim: int, theta: float, positions: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """cos/sin [S, rope_dim/2] for the interleaved (complex) convention
    used by DeepSeek-V2 MLA (HF ``apply_rotary_emb`` with view_as_complex)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rope_dim, 2, dtype=jnp.float32) / rope_dim))
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, S, nH, d] rotated pairwise: (x[2i], x[2i+1]) as complex.

    cos/sin [S, d/2].
    """
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[None, :, None, :].astype(jnp.float32)
    s = sin[None, :, None, :].astype(jnp.float32)
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    out = jnp.stack([xf1 * c - xf2 * s, xf1 * s + xf2 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def mla_attention_block(
    x: jax.Array,               # [B, S, H]
    layer_params: dict,
    cfg: MoEConfig,
    cos: jax.Array,             # [S, rope_dim/2] interleaved tables
    sin: jax.Array,
) -> jax.Array:
    """Multi-head Latent Attention (DeepSeek-V2, q_lora_rank=None variant).

    HF semantics (``modeling_deepseek_v2.py``, DeepseekV2Attention.forward):
    q = x W_q split (nope, rope); compressed kv = x W_kva split
    (c_kv -> RMSNorm -> W_kvb -> (k_nope, v), k_rope shared across heads);
    interleaved RoPE on the rope parts; scale = qk_head_dim^-1/2.
    """
    b, s, _ = x.shape
    n_h = cfg.num_heads
    d_nope, d_rope, d_v = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    d_qk = d_nope + d_rope

    q = (x @ layer_params["wq"]).reshape(b, s, n_h, d_qk)
    q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]

    ckv = x @ layer_params["kv_a"]                      # [B, S, lora + rope]
    c_kv, k_pe = ckv[..., : cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
    c_kv = rms_norm(c_kv, layer_params["kv_a_norm"], cfg.rms_norm_eps)
    kv = (c_kv @ layer_params["kv_b"]).reshape(b, s, n_h, d_nope + d_v)
    k_nope, v = kv[..., :d_nope], kv[..., d_nope:]

    q_pe = apply_rope_interleaved(q_pe, cos, sin)
    k_pe = apply_rope_interleaved(k_pe[:, :, None, :], cos, sin)   # [B,S,1,dr]
    k_pe = jnp.broadcast_to(k_pe, (b, s, n_h, d_rope))

    q_full = jnp.concatenate([q_nope, q_pe], axis=-1)
    k_full = jnp.concatenate([k_nope, k_pe], axis=-1)

    scores = jnp.einsum("bsnd,btnd->bnst", q_full, k_full).astype(jnp.float32)
    scores = scores / jnp.sqrt(float(d_qk))
    mask = jnp.tril(jnp.ones((s, s), dtype=bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnst,btnd->bsnd", probs, v)
    return out.reshape(b, s, n_h * d_v) @ layer_params["wo"]


def dense_mlp_block(x: jax.Array, layer_params: dict, cfg: MoEConfig) -> jax.Array:
    """Plain SwiGLU MLP for ds2's first dense layer(s).

    Honors the dense pseudo-expert's activation widths (``act_bits_dense``
    [2] = gate_up input / down input) when the quantizer assigned the layer
    a scheme (qconfig key ``dense-<i>``)."""
    b, s, h = x.shape
    x2d = x.reshape(-1, h)
    x_in = x2d
    fq = "act_bits_dense" in layer_params
    if fq:
        bits = layer_params["act_bits_dense"]
        x_in = _act_fq_per_row(x2d, jnp.full((x2d.shape[0],), bits[0]))
    hmid = silu_mul(x_in @ layer_params["mlp_gate_up"])
    if fq:
        hmid = _act_fq_per_row(hmid, jnp.full((hmid.shape[0],), bits[1]))
    y = hmid @ layer_params["mlp_down"]
    return y.reshape(b, s, h)


def attention_block(
    x: jax.Array,               # [B, S, H]
    layer_params: dict,
    cfg: MoEConfig,
    cos: jax.Array,
    sin: jax.Array,
    attn_backend: str = "xla",
    ring_fn=None,
) -> jax.Array:
    b, s, _ = x.shape
    q = x @ layer_params["wq"]
    k = x @ layer_params["wk"]
    v = x @ layer_params["wv"]
    if cfg.attention_bias:
        q = q + layer_params["bq"]
        k = k + layer_params["bk"]
        v = v + layer_params["bv"]
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    out = attention(q, k, v, causal=True, backend=attn_backend,
                    ring_fn=ring_fn)
    return out.reshape(b, s, -1) @ layer_params["wo"]



def make_rope_tables(cfg: MoEConfig, positions: jax.Array):
    """cos/sin tables matching the model family's rope convention."""
    if cfg.attention_type == "mla":
        return rope_frequencies_interleaved(
            cfg.qk_rope_head_dim, cfg.rope_theta, positions
        )
    return rope_frequencies(cfg.head_dim, cfg.rope_theta, positions)


def attention_dispatch(x, layer_params, cfg, cos, sin, attn_backend="xla"):
    """GQA or MLA attention per the config."""
    if cfg.attention_type == "mla":
        return mla_attention_block(x, layer_params, cfg, cos, sin)
    return attention_block(x, layer_params, cfg, cos, sin, attn_backend=attn_backend)

def decoder_layer(
    x: jax.Array,
    layer_params: dict,
    cfg: MoEConfig,
    cos: jax.Array,
    sin: jax.Array,
    impl: MoEImpl = MoEImpl(),
    dense_mlp: bool = False,
) -> jax.Array:
    if cfg.attention_type == "mla":
        h_attn = mla_attention_block(
            rms_norm(x, layer_params["input_norm"], cfg.rms_norm_eps),
            layer_params, cfg, cos, sin,
        )
    else:
        h_attn = attention_block(
            rms_norm(x, layer_params["input_norm"], cfg.rms_norm_eps),
            layer_params, cfg, cos, sin, attn_backend=impl.attn_backend,
            ring_fn=impl.ring_attn,
        )
    h = x + h_attn
    norm_h = rms_norm(h, layer_params["post_attn_norm"], cfg.rms_norm_eps)
    if dense_mlp:
        return h + dense_mlp_block(norm_h, layer_params, cfg)
    return h + moe_block(norm_h, layer_params, cfg, impl)
