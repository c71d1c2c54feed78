"""Bitwidth-allocation MILP: budget feasibility, monotonicity, tying."""

import json

import numpy as np
import pytest

from mxmoe_tpu.solver import (
    solve_layer, solve_model, solve_model_level, AnalyticPerfModel,
)
from mxmoe_tpu.solver.bits_solver import LayerProblem, build_layer_problems
from mxmoe_tpu.quant.schemes import strategy_bits, LINEAR_NAMES

SCHEMES = ["w4a4_g-1_sym", "w8a8_g-1_sym"]


def _toy_problem(e=6, seed=0):
    rng = np.random.default_rng(seed)
    # w4 loss > w8 loss per block; heterogeneous across experts
    base = rng.uniform(0.5, 3.0, size=(e, 3))
    losses = {
        "w4a4_g-1_sym": base * rng.uniform(3.0, 8.0, size=(e, 3)),
        "w8a8_g-1_sym": base,
    }
    ms = rng.integers(100, 800, size=e)
    ns = np.full(e, 2816)
    return LayerProblem(losses=losses, ms=ms, ns=ns, k=2048, sizes=np.ones(e))


def _avg_bits(problem, assignment):
    tot, acc = 0.0, 0.0
    for e, qm in assignment.items():
        for b in LINEAR_NAMES:
            acc += strategy_bits(qm[b])[0] * problem.sizes[e]
            tot += problem.sizes[e]
    return acc / tot


def test_budget_respected_and_tying():
    p = _toy_problem()
    for target in (4.0, 5.0, 6.0, 8.0):
        res = solve_layer(p, SCHEMES, wbits_target=target, r=1.0)
        assert _avg_bits(p, res.assignment) <= target + 1e-9
        for e, qm in res.assignment.items():
            assert qm["gate"] == qm["up"]


def test_loss_monotone_in_budget():
    p = _toy_problem()
    losses = [
        solve_layer(p, SCHEMES, wbits_target=t, r=1.0).loss
        for t in (4.0, 5.0, 6.0, 8.0)
    ]
    assert all(a >= b - 1e-9 for a, b in zip(losses, losses[1:]))
    # full budget -> all w8
    res = solve_layer(p, SCHEMES, wbits_target=8.0, r=1.0)
    assert all(
        qm[b] == "w8a8_g-1_sym" for qm in res.assignment.values() for b in LINEAR_NAMES
    )


def test_r_tradeoff_moves_along_pareto():
    p = _toy_problem(seed=3)
    # make w4 distinctly faster via the analytic model (it already is)
    perf = AnalyticPerfModel(k=2048)
    r_loss = solve_layer(p, SCHEMES, 5.0, r=1.0, perf=perf)
    r_time = solve_layer(p, SCHEMES, 5.0, r=0.0, perf=perf)
    r_mix = solve_layer(p, SCHEMES, 5.0, r=0.5, perf=perf)
    assert r_time.time_ms <= r_loss.time_ms + 1e-12
    assert r_loss.loss <= r_time.loss + 1e-12
    assert r_loss.loss - 1e-9 <= r_mix.loss <= r_time.loss + 1e-9
    assert r_time.time_ms - 1e-9 <= r_mix.time_ms <= r_loss.time_ms + 1e-9


def _fake_trace(e=4, layers=2, n=32, k=64, topk=2, shared=1):
    trace = {
        "topk": topk, "NK": [n, k], "num_layers": layers,
        "num_tokens": 1024, "num_samples": 2, "num_shared_experts": shared,
    }
    rng = np.random.default_rng(0)
    for l in range(layers):
        freq = rng.integers(50, 400, size=e)
        trace[f"layer-{l}"] = {
            "access_freq": freq.tolist(),
            "weights_sum": (freq * 0.3).tolist(),
            "percentile_stats": {},
        }
    return trace


def _fake_losses(e=4, layers=2, shared=1):
    rng = np.random.default_rng(1)
    out = {}
    for si, s in enumerate(SCHEMES):
        mult = 5.0 if "w4" in s else 1.0
        out[s] = {
            str(l): {
                str(ei): (rng.uniform(0.5, 2.0, 3) * mult).tolist()
                for ei in range(e + shared)
            }
            for l in range(layers)
        }
    return out


def test_solve_model_exports_reference_schema(tmp_path):
    trace = _fake_trace()
    losses = _fake_losses()
    qcfg, tiles = solve_model(losses, trace, batch=512, num_layers=2, wbits_target=6.0, r=0.5)
    assert set(qcfg.layers.keys()) == {"0", "1"}
    # 4 routed + 1 shared expert rows
    assert set(qcfg.layers["0"].experts.keys()) == {"0", "1", "2", "3", "4"}
    assert qcfg.lt is not None and len(qcfg.lt) == 2

    from mxmoe_tpu.solver.bits_solver import export_qconfig

    path = str(tmp_path / "qcfg.json")
    export_qconfig(qcfg, tiles, path)
    loaded = json.load(open(path))
    assert "LT" in loaded and "experts" in loaded["0"]
    # round-trip through our config model
    from mxmoe_tpu.quant.schemes import QModelConfig

    rt = QModelConfig.from_dict(loaded)
    assert rt.layers["0"].experts["0"].gate.w_bits in (4, 8)
    assert json.load(open(path.replace(".json", "_tile_cfg.json")))


def test_solve_model_level_global_budget():
    trace = _fake_trace()
    losses = _fake_losses()
    qcfg = solve_model_level(losses, trace, batch=512, num_layers=2, wbits_target=5.0)
    problems = build_layer_problems(losses, trace, 512, 2)
    acc = tot = 0.0
    for l, p in enumerate(problems):
        for e in range(p.ms.shape[0]):
            qm = qcfg.layers[str(l)].experts[str(e)].qmap()
            for b in LINEAR_NAMES:
                acc += qm[b].effective_wbits() * p.sizes[e]
                tot += p.sizes[e]
    assert acc / tot <= 5.0 + 1e-9
