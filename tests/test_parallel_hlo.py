"""Compiled-HLO structure checks for expert and pipeline parallelism — the
EP/PP companions of test_tp_hlo.py's TP accounting (SURVEY.md §5 distributed
communication): the claims in parallel/moe.py and parallel/pipeline.py about
WHERE the bytes move are asserted from the compiled program text, not prose.

* EP: the stacked (E, K, N) expert weights are NEVER gathered — tokens move
  (dispatch/combine collectives on activations), weights stay put; and the
  collective structure does not grow with the expert-axis degree.
* PP: the only cross-stage traffic is the ppermute ring shift
  (collective-permute ops, forward + transposed backward); the stage-stacked
  block slabs are never all-gathered.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jaxlsq.models import QuantMoE, QuantTransformerLM, default_qconfig
from jaxlsq.parallel import (
    create_pipeline_state,
    create_train_state,
    make_pipeline_train_step,
    make_train_step,
    pipeline_mesh,
)
from jaxlsq.parallel.moe import moe_sharding

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")

COLLECTIVE_RE = re.compile(
    r"=\s*\S+\s+(all-gather|all-reduce|reduce-scatter|all-to-all|"
    r"collective-permute)\(")

D, H, E = 8, 12, 4


def _collectives(text: str):
    return [m.group(1) for m in COLLECTIVE_RE.finditer(text)]


def _moe_compiled(ep: int):
    qc = default_qconfig(8, 8, per_channel_weights=True, init_batches=1)
    moe = QuantMoE(hidden=H, num_experts=E, qconfig=qc,
                   capacity_factor=float(E))
    tx = optax.sgd(1e-2)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(16, D).astype(np.float32))
    batch = {"input": x,
             "label": jnp.asarray(r.randn(16, D).astype(np.float32))}
    devs = np.asarray(jax.devices()[: 2 * ep]).reshape(2, ep)
    mesh = Mesh(devs, axis_names=("data", "expert"))
    state = create_train_state(moe, tx, x)
    sh = moe_sharding(mesh, state, num_experts=E, axis="expert")
    state = jax.tree.map(jax.device_put, state, sh)
    batch = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(
            mesh, P("data", *([None] * (a.ndim - 1))))), batch)

    def loss_fn(out, b):
        return jnp.mean((out - b["label"]) ** 2)

    step = make_train_step(moe, tx, loss_fn=loss_fn, mesh=mesh,
                           donate=False, state_sharding=sh)
    return step.lower(state, batch).compile()


@pytest.mark.parametrize("ep", [2, 4])
def test_ep_expert_weights_never_gathered(ep):
    """No collective in the EP train step moves a FULL expert stack: the
    (E, D, H)/(E, H, D) kernels (and their (E,)-stacked grads) stay sharded;
    only token/activation tensors ride the collectives."""
    compiled = _moe_compiled(ep)
    text = compiled.as_text()
    full_stacks = (f"f32[{E},{D},{H}]", f"f32[{E},{H},{D}]")
    for line in text.splitlines():
        if COLLECTIVE_RE.search(line) and "all-gather" in line:
            got = line.split("=", 1)[0]  # result shape is left of '='
            for s in full_stacks:
                assert s not in got, f"expert stack gathered: {line.strip()}"
    assert len(_collectives(text)) > 0  # DP grad reduction at minimum


def test_ep_collective_count_constant_in_degree():
    counts = {ep: len(_collectives(_moe_compiled(ep).as_text()))
              for ep in (2, 4)}
    assert len(set(counts.values())) == 1, counts


def test_pp_ring_shift_is_the_only_cross_stage_traffic():
    """The pipeline step's HLO contains collective-permutes (the forward
    ring shift and its transposed backward shift) and NEVER all-gathers a
    stage-stacked block slab."""
    model = QuantTransformerLM(vocab=32, dim=16, depth=4, num_heads=4,
                               qconfig=default_qconfig(8, 8, init_batches=1),
                               max_len=8)
    tx = optax.sgd(1e-2)
    mesh = pipeline_mesh(stage=4, data=2)
    r = np.random.RandomState(0)
    toks = jnp.asarray(r.randint(0, 32, size=(8, 8)))
    state = create_pipeline_state(model, tx, mesh, toks[:2])
    step = make_pipeline_train_step(model, tx, mesh, num_microbatches=2,
                                    donate=False)
    compiled = step.lower(state, {"input": toks, "label": toks}).compile()
    text = compiled.as_text()
    colls = _collectives(text)
    assert "collective-permute" in colls, colls
    # stage slabs (leading dim 4 = stages) never move: no all-gather result
    # carries the full stacked qkv/mlp kernels
    for shape in ("f32[4,1,16,48]", "f32[4,1,16,64]", "f32[4,1,64,16]",
                  "f32[4,1,16,16]"):
        for line in text.splitlines():
            if "all-gather" in line and COLLECTIVE_RE.search(line):
                got = line.split("=", 1)[0]
                assert shape not in got, \
                    f"stage slab gathered: {line.strip()}"
