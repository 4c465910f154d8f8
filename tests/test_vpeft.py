"""vPEFT placement compiler (VERDICT r1 row 50): graph build, constraints,
three solver families, plan round-trip, per-target-rank LoRA application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_master_tpu.peft.vpeft import (
    ComputationGraphBuilder,
    DifferentiableOptimizationSolver,
    GreedyRankAllocator,
    MIPRelaxationSolver,
    PlacementPlan,
    default_registry,
    sensitivity_probe,
    solve_placement,
)


def _params():
    """Synthetic param tree with conv/linear/depthwise/norm/moe-bank leaves."""
    k = jax.random.PRNGKey(0)
    conv = lambda kh, ci, co: jax.random.normal(k, (kh, kh, ci, co)) * 0.02
    return {
        "model": {
            "0": {"conv": {"w": conv(3, 3, 32)}},
            "1": {"cv1": {"w": conv(1, 32, 64)}, "bn": {"scale": jnp.ones(64), "w": jnp.ones(64)}},
            "2": {"dw": {"w": conv(3, 1, 64)}},  # depthwise: never targetable
            "12": {"attn": {"qkv": {"w": jax.random.normal(k, (64, 192)) * 0.02}}},
            "22": {"head": {"dfl": {"w": conv(1, 16, 1)}}},  # protected
            "5": {"experts": {
                "0": {"conv": {"w": conv(1, 64, 64)}},
                "1": {"conv": {"w": conv(1, 64, 64)}},
            }},
        }
    }


def test_graph_build_classifies_ops_and_roles():
    g = ComputationGraphBuilder.build(_params())
    by_name = {n.name: n for n in g.nodes}
    assert by_name["model.1.cv1.w"].op_type == "conv1x1"
    assert by_name["model.2.dw.w"].op_type == "depthwise"
    assert by_name["model.12.attn.qkv.w"].op_type == "linear"
    assert by_name["model.5.experts.0.conv.w"].expert_group == "model.5.experts"
    assert by_name["model.0.conv.w"].role == "backbone"
    assert by_name["model.12.attn.qkv.w"].role == "neck"


@pytest.mark.parametrize("solver_cls", [GreedyRankAllocator, DifferentiableOptimizationSolver, MIPRelaxationSolver])
def test_solvers_respect_budget_and_constraints(solver_cls):
    g = ComputationGraphBuilder.build(_params())
    budget = 6000
    reg = default_registry(budget)
    kwargs = {"steps": 120} if solver_cls is DifferentiableOptimizationSolver else {}
    d = solver_cls(**kwargs).solve(g, budget, "lora", reg)
    assert d.budget_used <= budget
    assert d.status in ("ACCEPT", "ADAPT")
    names = set(d.target_modules)
    assert "model.2.dw.w" not in names           # operator constraint
    assert "model.22.head.dfl.w" not in names     # semantic protection
    # MoE consistency: both experts or neither, same rank
    e0, e1 = "model.5.experts.0.conv.w", "model.5.experts.1.conv.w"
    assert (e0 in names) == (e1 in names)
    if e0 in names:
        idx = {n.name: i for i, n in enumerate(g.nodes)}
        assert d.ranks[idx[e0]] == d.ranks[idx[e1]]
    # every placed rank is feasible
    for i in range(g.n_nodes):
        if d.placement[i] > 0.5:
            assert reg.is_rank_feasible(g, i, "lora", int(d.ranks[i]))


def test_refuse_when_nothing_feasible():
    g = ComputationGraphBuilder.build({"m": {"dw": {"w": jnp.zeros((3, 3, 1, 8))}}})
    d = GreedyRankAllocator().solve(g, 10_000, "lora", default_registry(10_000))
    assert d.status == "REFUSE" and not d.target_modules


def test_plan_roundtrip_and_apply(tmp_path):
    params = _params()
    d, plan = solve_placement(params, budget=8000, solver="greedy")
    assert plan.targets and plan.budget_used == d.budget_used
    path = str(tmp_path / "plan.json")
    plan.save(path)
    plan2 = PlacementPlan.load(path)
    assert [t.name for t in plan2.targets] == [t.name for t in plan.targets]

    adapters = plan2.apply(params)
    for t in plan2.targets:
        assert adapters[t.name]["A"].shape[-1] == t.rank
        assert adapters[t.name]["B"].shape[0] == t.rank

    # per-target scales merge without shape errors and B=0 => identity
    from yolo_master_tpu.peft.lora import merge_lora, scale_map

    scales = scale_map(adapters, alpha_map={t.name: t.alpha for t in plan2.targets})
    merged = merge_lora(params, adapters, scales, train=False)
    chex_leaf = merged["model"]["1"]["cv1"]["w"]
    assert np.allclose(np.asarray(chex_leaf), np.asarray(params["model"]["1"]["cv1"]["w"]))


def test_sensitivity_probe_reweights_utilities():
    params = {"a": {"w": jnp.ones((32, 32))}, "b": {"w": jnp.ones((32, 32))}}

    def loss(p):
        return jnp.sum(p["a"]["w"] ** 2) * 10.0 + jnp.sum(p["b"]["w"]) * 0.0

    s = sensitivity_probe(loss, params)
    assert s["a.w"] > s["b.w"]
    g = ComputationGraphBuilder.build(params, sensitivity=s)
    by = {n.name: n for n in g.nodes}
    assert by["a.w"].sensitivity > by["b.w"].sensitivity
