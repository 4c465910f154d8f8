"""V-PEFT: constraint-aware adapter-placement compiler.

Reference: ultralytics/vpeft/ (graph.py, constraints.py, policy.py, solver.py,
placement_plan.py — 4,455 LoC). Same capability surface — build a computation
graph over adapter-targetable weights, register hard/soft constraints, solve
for a (placement, rank) assignment under a trainable-parameter budget with
three solver families, emit a serializable PlacementPlan — re-designed for
the functional JAX param tree:

  * the graph is built directly from the params pytree (shapes classify the
    op; paths carry the semantic role), not from torch module reflection;
  * the differentiable solver optimizes placement logits + rank simplexes
    with ``jax.grad`` + optax adam — the relaxation itself runs jitted;
  * the MIP solver uses scipy.optimize.milp on the exact 0/1 assignment,
    falling back to the greedy allocator when scipy's MILP is unavailable;
  * MoE expert banks are consistency-grouped by path, so every expert in a
    bank receives the same (placement, rank) — the reference's
    MoEConsistencyConstraint (constraints.py:474).

The emitted plan applies through :mod:`..peft.lora` (per-target ranks).
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass, field, asdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOGGER
from .lora import _iter_weight_paths

RANK_SET = (2, 4, 8, 16, 32, 64)

# semantic marginal-utility priors (reference policy.py SEMANTIC_UTILITY)
SEMANTIC_UTILITY = {
    "backbone": 0.6,
    "neck": 1.0,
    "head": 0.8,
    "expert": 0.9,
    "router": 0.3,
    "text": 0.7,
    "other": 0.5,
}

_ROLE_PATTERNS = (
    ("router", re.compile(r"rout|gate|gating")),
    ("expert", re.compile(r"expert")),
    ("text", re.compile(r"text|clip|token")),
    ("head", re.compile(r"head|detect|segment|pose|obb|classify|cv[23]\.")),
)


def _utility_per_rank(rank: float, rank_max: int = 64) -> float:
    """f(r) = log2(r)/log2(r_max) — diminishing returns in rank
    (reference solver.py:38)."""
    if rank <= 0:
        return 0.0
    return math.log2(rank) / math.log2(rank_max)


# ---------------------------------------------------------------------------
# Graph (reference graph.py:83-320)
# ---------------------------------------------------------------------------

@dataclass
class NodeInfo:
    """Adapter-targetable weight leaf (reference constraints.py:39 NodeInfo +
    graph.py NodeAttributes, collapsed — the pytree leaf is the node)."""

    name: str                    # dotted params path
    op_type: str                 # conv1x1 | conv | depthwise | linear | other
    fan_in: int
    fan_out: int
    n_params: int
    depth: float = 0.0           # normalized [0, 1] position in the tree walk
    role: str = "other"          # backbone|neck|head|expert|router|text|other
    expert_group: Optional[str] = None  # MoE bank id (consistency group)
    sensitivity: float = 1.0     # grad-probe multiplier (1 = uninformed)


class ComputationGraph:
    """Node list + adapter cost model (reference graph.py:212)."""

    def __init__(self, nodes: List[NodeInfo]):
        self.nodes = nodes

    @property
    def n_nodes(self) -> int:
        return len(self.nodes)

    def estimate_params(self, i: int, rank: int, variant: str = "lora") -> int:
        """Adapter parameter cost (reference graph.py:53): lora/molora =
        r*(fan_in+fan_out); dora adds a fan_out magnitude vector."""
        if rank <= 0:
            return 0
        n = self.nodes[i]
        base = rank * (n.fan_in + n.fan_out)
        if variant == "dora":
            base += n.fan_out
        return base

    def utility(self, i: int, rank: float, rank_max: int = 64) -> float:
        n = self.nodes[i]
        return n.sensitivity * SEMANTIC_UTILITY.get(n.role, 0.5) * _utility_per_rank(rank, rank_max)

    def utilities(self, ranks: Sequence[float]) -> np.ndarray:
        return np.array([self.utility(i, float(r)) for i, r in enumerate(ranks)], np.float64)


class ComputationGraphBuilder:
    """Builds the graph from a functional params tree (reference
    graph.py:320 builds from torch named_modules; here shapes ARE the ops)."""

    @staticmethod
    def _classify(leaf) -> Optional[Tuple[str, int, int]]:
        shape = getattr(leaf, "shape", ())
        if getattr(leaf, "ndim", 0) == 4:  # HWIO conv kernel
            kh, kw, ci, co = shape
            if ci == 1:
                return ("depthwise", kh * kw, co)
            kind = "conv1x1" if kh == kw == 1 else "conv"
            return (kind, kh * kw * ci, co)
        if getattr(leaf, "ndim", 0) == 2:  # linear [in, out]
            return ("linear", shape[0], shape[1])
        return None

    @staticmethod
    def _role(dotted: str) -> str:
        for role, pat in _ROLE_PATTERNS:
            if pat.search(dotted):
                return role
        # backbone = early model indices, neck = later (reference infers from
        # module position); model.N. prefixes carry the layer index
        m = re.match(r"(?:model\.)?(\d+)\.", dotted)
        if m:
            return "backbone" if int(m.group(1)) <= 9 else "neck"
        return "other"

    @staticmethod
    def _expert_group(dotted: str) -> Optional[str]:
        m = re.match(r"(.*experts)\.(\d+)\.", dotted)
        return m.group(1) if m else None

    @classmethod
    def build(cls, params, sensitivity: Optional[Dict[str, float]] = None) -> ComputationGraph:
        nodes: List[NodeInfo] = []
        entries = [(p, l) for p, l in _iter_weight_paths(params) if p and p[-1] == "w"]
        n_total = max(len(entries), 1)
        for idx, (path, leaf) in enumerate(entries):
            spec = cls._classify(leaf)
            if spec is None:
                continue
            op, fi, fo = spec
            dotted = ".".join(path)
            nodes.append(NodeInfo(
                name=dotted, op_type=op, fan_in=fi, fan_out=fo,
                n_params=int(np.prod(leaf.shape)), depth=idx / n_total,
                role=cls._role(dotted), expert_group=cls._expert_group(dotted),
                sensitivity=float((sensitivity or {}).get(dotted, 1.0)),
            ))
        return ComputationGraph(nodes)


def sensitivity_probe(loss_fn, params, *args) -> Dict[str, float]:
    """Per-leaf sensitivity = ||g||/(||w||+eps) from one grad evaluation
    (reference utils/lora/sensitivity analysis). ``loss_fn(params, *args)``
    must be differentiable; returns a dotted-path -> score map normalized to
    mean 1 over targetable leaves."""
    grads = jax.grad(loss_fn)(params, *args)
    scores = {}
    gleaves = {".".join(p): l for p, l in _iter_weight_paths(grads)}
    for path, w in _iter_weight_paths(params):
        dotted = ".".join(path)
        g = gleaves.get(dotted)
        if g is None or getattr(w, "ndim", 0) < 2:
            continue
        scores[dotted] = float(jnp.linalg.norm(g.reshape(-1)) / (jnp.linalg.norm(w.reshape(-1)) + 1e-9))
    mean = np.mean(list(scores.values())) if scores else 1.0
    return {k: v / max(mean, 1e-12) for k, v in scores.items()}


# ---------------------------------------------------------------------------
# Constraints (reference constraints.py:161-620)
# ---------------------------------------------------------------------------

class Constraint:
    """Hard feasibility test per (node, variant, rank); soft penalty optional."""

    def is_rank_feasible(self, graph: ComputationGraph, i: int, variant: str, rank: int) -> bool:
        return True

    def reason(self) -> str:
        return type(self).__name__


class OperatorCompatibilityConstraint(Constraint):
    """Adapter variants attach only to matmul-shaped ops
    (constraints.py:188): depthwise and norms are never targetable."""

    ALLOWED = {
        "lora": {"conv1x1", "conv", "linear"},
        "dora": {"conv1x1", "conv", "linear"},
        "molora": {"conv1x1", "linear"},
    }

    def is_rank_feasible(self, graph, i, variant, rank):
        return graph.nodes[i].op_type in self.ALLOWED.get(variant, {"conv1x1", "linear"})


class SemanticProtectionConstraint(Constraint):
    """Protect decode-critical leaves (constraints.py:243): DFL projection,
    final box/cls convs, BN stats — adapter drift there destabilizes decode."""

    def __init__(self, protected_patterns: Sequence[str] = ("dfl", "one2one")):
        self.patterns = tuple(protected_patterns)

    def is_rank_feasible(self, graph, i, variant, rank):
        name = graph.nodes[i].name
        return not any(p in name for p in self.patterns)


class CandidateTargetConstraint(Constraint):
    """Explicit target whitelist (constraints.py:303)."""

    def __init__(self, include: Sequence[str]):
        self.include = tuple(include)

    def is_rank_feasible(self, graph, i, variant, rank):
        if not self.include:
            return True
        return any(h in graph.nodes[i].name for h in self.include)


class DivisibilityConstraint(Constraint):
    """rank <= min(fan_in, fan_out) and rank % divisor == 0
    (constraints.py:547)."""

    def __init__(self, divisor: int = 1):
        self.divisor = max(divisor, 1)

    def is_rank_feasible(self, graph, i, variant, rank):
        n = graph.nodes[i]
        return rank <= min(n.fan_in, n.fan_out) and rank % self.divisor == 0


class DeploymentCompatibilityConstraint(Constraint):
    """Only merge-foldable variants when deploying to fused export formats
    (constraints.py:383) — all of lora/dora fold; molora (routed) does not."""

    FOLDABLE = {"lora", "dora"}

    def __init__(self, deploy: bool = False):
        self.deploy = deploy

    def is_rank_feasible(self, graph, i, variant, rank):
        return (not self.deploy) or variant in self.FOLDABLE


class MoEConsistencyConstraint(Constraint):
    """All experts of one bank share (placement, rank) (constraints.py:474).
    Feasibility is per-node trivially true; enforcement happens in
    :meth:`ConstraintRegistry.project` via group unification."""

    def groups(self, graph: ComputationGraph) -> Dict[str, List[int]]:
        g: Dict[str, List[int]] = {}
        for i, n in enumerate(graph.nodes):
            if n.expert_group:
                g.setdefault(n.expert_group, []).append(i)
        return g


class BudgetConstraint(Constraint):
    """Hard cap on total adapter params (constraints.py:318)."""

    def __init__(self, budget: int):
        self.budget = int(budget)

    def total(self, graph, placement, ranks, variant) -> int:
        return int(sum(
            graph.estimate_params(i, int(ranks[i]), variant)
            for i in range(graph.n_nodes) if placement[i] > 0.5
        ))


class ConstraintRegistry:
    """Composition of hard constraints (reference constraints.py:579)."""

    def __init__(self, constraints: Optional[Sequence[Constraint]] = None):
        self.constraints: List[Constraint] = list(constraints or [])

    def add(self, c: Constraint) -> "ConstraintRegistry":
        self.constraints.append(c)
        return self

    def is_rank_feasible(self, graph, i, variant, rank) -> bool:
        return all(c.is_rank_feasible(graph, i, variant, rank) for c in self.constraints)

    def feasible_ranks(self, graph, i, variant, rank_set=RANK_SET) -> List[int]:
        return [r for r in rank_set if self.is_rank_feasible(graph, i, variant, r)]

    def project(self, graph, placement: np.ndarray, ranks: np.ndarray, variant: str,
                rank_set=RANK_SET) -> Tuple[np.ndarray, np.ndarray]:
        """Snap a candidate solution onto the feasible set (reference
        solver.py:50 _project_discrete_solution + MoE group unification)."""
        placement = placement.copy()
        ranks = ranks.copy()
        for i in range(graph.n_nodes):
            if placement[i] <= 0.5:
                ranks[i] = 0
                continue
            feas = self.feasible_ranks(graph, i, variant, rank_set)
            if not feas:
                placement[i], ranks[i] = 0.0, 0
            elif int(ranks[i]) not in feas:
                cur = int(ranks[i])
                ranks[i] = min(feas, key=lambda r: (abs(r - cur), r))
        # MoE consistency: unify each expert bank on its minimum placed rank
        for c in self.constraints:
            if isinstance(c, MoEConsistencyConstraint):
                for _, idxs in c.groups(graph).items():
                    placed = [i for i in idxs if placement[i] > 0.5]
                    if len(placed) != len(idxs):  # any dropped -> drop all
                        for i in idxs:
                            placement[i], ranks[i] = 0.0, 0
                    elif placed:
                        r = min(int(ranks[i]) for i in placed)
                        for i in idxs:
                            ranks[i] = r
        return placement, ranks


def default_registry(budget: int, variant: str = "lora", deploy: bool = False,
                     include: Sequence[str] = ()) -> ConstraintRegistry:
    reg = ConstraintRegistry([
        OperatorCompatibilityConstraint(),
        SemanticProtectionConstraint(),
        DivisibilityConstraint(),
        MoEConsistencyConstraint(),
        DeploymentCompatibilityConstraint(deploy),
        BudgetConstraint(budget),
    ])
    if include:
        reg.add(CandidateTargetConstraint(include))
    return reg


# ---------------------------------------------------------------------------
# Decision + plan (reference solver.py:127, placement_plan.py)
# ---------------------------------------------------------------------------

@dataclass
class PlacementDecision:
    status: str                  # ACCEPT | ADAPT | REFUSE
    placement: np.ndarray        # [N] 0/1
    ranks: np.ndarray            # [N] int
    variant: str
    budget_used: int
    budget_remaining: int
    target_modules: List[str]
    reason: str
    utility: float


@dataclass
class PlacementTarget:
    name: str
    rank: int
    variant: str = "lora"
    alpha: float = 16.0


@dataclass
class PlacementPlan:
    """Serializable plan; applies through peft.lora per-target ranks."""

    targets: List[PlacementTarget] = field(default_factory=list)
    variant: str = "lora"
    budget: int = 0
    budget_used: int = 0

    def to_json(self) -> str:
        return json.dumps({"variant": self.variant, "budget": self.budget,
                           "budget_used": self.budget_used,
                           "targets": [asdict(t) for t in self.targets]}, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "PlacementPlan":
        d = json.loads(s)
        return cls(targets=[PlacementTarget(**t) for t in d["targets"]],
                   variant=d["variant"], budget=d["budget"], budget_used=d["budget_used"])

    def save(self, path: str) -> str:
        with open(path, "w") as f:
            f.write(self.to_json())
        return path

    @classmethod
    def load(cls, path: str) -> "PlacementPlan":
        with open(path) as f:
            return cls.from_json(f.read())

    def apply(self, params, seed: int = 0):
        """Materialize the adapter tree with per-target ranks."""
        from .lora import LoRAConfig, init_lora

        rank_map = {t.name: t.rank for t in self.targets}
        alpha_map = {t.name: t.alpha for t in self.targets}
        cfg = LoRAConfig(r=max(rank_map.values(), default=8), seed=seed)
        return init_lora(params, cfg, targets=list(rank_map), rank_map=rank_map,
                         alpha_map=alpha_map)


def decision_to_plan(graph: ComputationGraph, d: PlacementDecision, budget: int,
                     alpha_per_rank: float = 2.0) -> PlacementPlan:
    targets = [
        PlacementTarget(name=graph.nodes[i].name, rank=int(d.ranks[i]), variant=d.variant,
                        alpha=alpha_per_rank * int(d.ranks[i]))
        for i in range(graph.n_nodes) if d.placement[i] > 0.5 and d.ranks[i] > 0
    ]
    return PlacementPlan(targets=targets, variant=d.variant, budget=budget,
                         budget_used=d.budget_used)


# ---------------------------------------------------------------------------
# Solvers (reference solver.py:195-1008)
# ---------------------------------------------------------------------------

def _finalize(graph, placement, ranks, variant, budget, reg: ConstraintRegistry,
              requested_any: bool) -> PlacementDecision:
    placement, ranks = reg.project(graph, placement, ranks, variant)
    # budget repair: drop lowest utility-density nodes (solver.py:82)
    utils = graph.utilities(ranks)
    while True:
        used = sum(graph.estimate_params(i, int(ranks[i]), variant)
                   for i in range(graph.n_nodes) if placement[i] > 0.5)
        if used <= budget:
            break
        placed = [i for i in range(graph.n_nodes) if placement[i] > 0.5 and ranks[i] > 0]
        if not placed:
            break
        drop = min(placed, key=lambda i: (
            utils[i] / max(graph.estimate_params(i, int(ranks[i]), variant), 1), utils[i], i))
        placement[drop], ranks[drop] = 0.0, 0
    used = sum(graph.estimate_params(i, int(ranks[i]), variant)
               for i in range(graph.n_nodes) if placement[i] > 0.5)
    names = [graph.nodes[i].name for i in range(graph.n_nodes) if placement[i] > 0.5]
    total_u = float(sum(graph.utility(i, int(ranks[i])) for i in range(graph.n_nodes)
                        if placement[i] > 0.5))
    if not names:
        status, reason = "REFUSE", ("no feasible targets under the constraint set"
                                    if requested_any else "empty candidate set")
    elif used < budget * 0.5:
        status, reason = "ADAPT", f"constraints bound before budget ({used}/{budget})"
    else:
        status, reason = "ACCEPT", "solved within budget"
    return PlacementDecision(status=status, placement=placement, ranks=ranks, variant=variant,
                             budget_used=used, budget_remaining=budget - used,
                             target_modules=names, reason=reason, utility=total_u)


class ConstraintSolver:
    """Base (reference solver.py:165)."""

    def solve(self, graph: ComputationGraph, budget: int, variant: str,
              constraints: ConstraintRegistry) -> PlacementDecision:
        raise NotImplementedError


class GreedyRankAllocator(ConstraintSolver):
    """Marginal-utility-per-parameter greedy with rank escalation — the
    block-coordinate AO core (reference solver.py:195 AlternatingOptimization
    + policy.py:436 GreedyRankAllocator, fused: placement IS rank>0)."""

    def __init__(self, rank_set=RANK_SET):
        self.rank_set = tuple(sorted(rank_set))

    def solve(self, graph, budget, variant, constraints):
        N = graph.n_nodes
        ranks = np.zeros(N, np.int64)
        feas = [constraints.feasible_ranks(graph, i, variant, self.rank_set) for i in range(N)]
        import heapq

        heap = []
        for i in range(N):
            if feas[i]:
                r = feas[i][0]
                du = graph.utility(i, r)
                dp = graph.estimate_params(i, r, variant)
                heapq.heappush(heap, (-du / max(dp, 1), i, r))
        used = 0
        while heap:
            negd, i, r = heapq.heappop(heap)
            cost_now = graph.estimate_params(i, int(ranks[i]), variant)
            cost_new = graph.estimate_params(i, r, variant)
            if used - cost_now + cost_new > budget:
                continue
            used += cost_new - cost_now
            ranks[i] = r
            nxt = [x for x in feas[i] if x > r]
            if nxt:
                r2 = nxt[0]
                du = graph.utility(i, r2) - graph.utility(i, r)
                dp = graph.estimate_params(i, r2, variant) - cost_new
                heapq.heappush(heap, (-du / max(dp, 1), i, r2))
        placement = (ranks > 0).astype(np.float64)
        return _finalize(graph, placement, ranks, variant, budget, constraints, N > 0)


# keep the reference's public alias
AlternatingOptimizationSolver = GreedyRankAllocator


class DifferentiableOptimizationSolver(ConstraintSolver):
    """Continuous relaxation optimized with jax.grad + optax adam
    (reference solver.py:447 used torch autograd). Placement = sigmoid(logit),
    rank = softmax simplex over RANK_SET; budget enters as a softplus penalty;
    the discrete solution is projected + budget-repaired at the end."""

    def __init__(self, rank_set=RANK_SET, steps: int = 300, lr: float = 0.05,
                 penalty: float = 10.0, seed: int = 0):
        self.rank_set = tuple(sorted(rank_set))
        self.steps, self.lr, self.penalty, self.seed = steps, lr, penalty, seed

    def solve(self, graph, budget, variant, constraints):
        import optax

        N, K = graph.n_nodes, len(self.rank_set)
        ranks_arr = jnp.asarray(self.rank_set, jnp.float32)
        # per-(node, rank) static data
        feas = np.zeros((N, K), np.float32)
        util = np.zeros((N, K), np.float32)
        cost = np.zeros((N, K), np.float32)
        for i in range(N):
            for k, r in enumerate(self.rank_set):
                if constraints.is_rank_feasible(graph, i, variant, r):
                    feas[i, k] = 1.0
                    util[i, k] = graph.utility(i, r)
                    cost[i, k] = graph.estimate_params(i, r, variant)
        feas_j, util_j, cost_j = jnp.asarray(feas), jnp.asarray(util), jnp.asarray(cost)
        any_feasible = feas.any(1)

        def objective(theta):
            p = jax.nn.sigmoid(theta["placement"])               # [N]
            q = jax.nn.softmax(theta["rank"] + jnp.log(feas_j + 1e-9), -1)  # [N,K] masked
            exp_util = jnp.sum(p * jnp.sum(q * util_j, -1))
            exp_cost = jnp.sum(p * jnp.sum(q * cost_j, -1))
            over = (exp_cost - budget) / max(budget, 1)
            return -(exp_util - self.penalty * jax.nn.softplus(10.0 * over) / 10.0)

        key = jax.random.PRNGKey(self.seed)
        theta = {
            "placement": 0.01 * jax.random.normal(key, (N,)),
            "rank": jnp.zeros((N, K)),
        }
        opt = optax.adam(self.lr)
        state = opt.init(theta)

        @jax.jit
        def step(theta, state):
            g = jax.grad(objective)(theta)
            updates, state = opt.update(g, state)
            return optax.apply_updates(theta, updates), state

        for _ in range(self.steps):
            theta, state = step(theta, state)

        p = np.asarray(jax.nn.sigmoid(theta["placement"]))
        q = np.asarray(jax.nn.softmax(theta["rank"] + jnp.log(feas_j + 1e-9), -1))
        placement = ((p > 0.5) & any_feasible).astype(np.float64)
        ranks = np.array([self.rank_set[int(q[i].argmax())] if placement[i] else 0
                          for i in range(N)], np.int64)
        return _finalize(graph, placement, ranks, variant, budget, constraints, N > 0)


class MIPRelaxationSolver(ConstraintSolver):
    """Exact 0/1 assignment via scipy.optimize.milp (reference solver.py:751
    relaxed a torch LP; scipy solves the true MILP directly). Falls back to
    the greedy allocator when milp is unavailable."""

    def __init__(self, rank_set=RANK_SET):
        self.rank_set = tuple(sorted(rank_set))

    def solve(self, graph, budget, variant, constraints):
        try:
            from scipy.optimize import LinearConstraint, milp
        except ImportError:
            LOGGER.warning("scipy.optimize.milp unavailable; falling back to greedy")
            return GreedyRankAllocator(self.rank_set).solve(graph, budget, variant, constraints)

        N, K = graph.n_nodes, len(self.rank_set)
        pairs = []  # (i, k) feasible assignment variables
        for i in range(N):
            for k, r in enumerate(self.rank_set):
                if constraints.is_rank_feasible(graph, i, variant, r):
                    pairs.append((i, k))
        if not pairs:
            return _finalize(graph, np.zeros(N), np.zeros(N, np.int64), variant,
                             budget, constraints, N > 0)
        V = len(pairs)
        c = -np.array([graph.utility(i, self.rank_set[k]) for i, k in pairs])
        costs = np.array([graph.estimate_params(i, self.rank_set[k], variant) for i, k in pairs], np.float64)
        # budget row + one-rank-per-node rows
        rows = [costs]
        lb, ub = [0.0], [float(budget)]
        for i in range(N):
            row = np.array([1.0 if pi == i else 0.0 for pi, _ in pairs])
            if row.any():
                rows.append(row)
                lb.append(0.0)
                ub.append(1.0)
        res = milp(c=c, constraints=LinearConstraint(np.stack(rows), lb, ub),
                   integrality=np.ones(V), bounds=None)
        x = (res.x > 0.5) if res.x is not None else np.zeros(V, bool)
        placement = np.zeros(N)
        ranks = np.zeros(N, np.int64)
        for v, (i, k) in enumerate(pairs):
            if x[v]:
                placement[i] = 1.0
                ranks[i] = self.rank_set[k]
        return _finalize(graph, placement, ranks, variant, budget, constraints, N > 0)


SOLVERS = {
    "greedy": GreedyRankAllocator,
    "ao": AlternatingOptimizationSolver,
    "differentiable": DifferentiableOptimizationSolver,
    "mip": MIPRelaxationSolver,
}


def solve_placement(params, budget: int, variant: str = "lora", solver: str = "greedy",
                    deploy: bool = False, include: Sequence[str] = (),
                    sensitivity: Optional[Dict[str, float]] = None) -> Tuple[PlacementDecision, PlacementPlan]:
    """One-call facade: params tree -> (decision, plan)."""
    graph = ComputationGraphBuilder.build(params, sensitivity=sensitivity)
    reg = default_registry(budget, variant, deploy=deploy, include=include)
    decision = SOLVERS[solver]().solve(graph, budget, variant, reg)
    plan = decision_to_plan(graph, decision, budget)
    LOGGER.info(f"vPEFT[{solver}]: {decision.status} — {len(plan.targets)} targets, "
                f"{decision.budget_used}/{budget} params, U={decision.utility:.3f}")
    return decision, plan
