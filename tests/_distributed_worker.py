"""Worker for the two-process distributed DP test (run by test_distributed.py).

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent); the
two processes form one 8-device global mesh via jax.distributed.initialize
(driven through jaxlsq's ``initialize_distributed``), build a global
data-parallel batch with ``jax.make_array_from_process_local_data``, and run
jitted QAT train steps.  Prints one JSON line the parent asserts on.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from jaxlsq.models import QuantMLP, default_qconfig
from jaxlsq.parallel import (create_train_state, data_sharding,
                             initialize_distributed, make_mesh,
                             make_train_step, replicated)


def main():
    pid, pcount = initialize_distributed()
    assert pcount == 2, f"expected 2 processes, got {pcount}"
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    mesh = make_mesh(data=8, model=1)
    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantMLP(features=(32, 10), qconfig=qc)
    tx = optax.sgd(1e-2)

    GLOBAL_B = 32
    rng = np.random.default_rng(0)  # same seed everywhere: deterministic data
    x_global = rng.standard_normal((GLOBAL_B, 16)).astype(np.float32)
    y_global = rng.integers(0, 10, GLOBAL_B).astype(np.int32)

    # Each process contributes its slice of the global batch.
    def to_global(arr):
        sh = data_sharding(mesh, arr.ndim)
        local = arr[pid * (GLOBAL_B // 2):(pid + 1) * (GLOBAL_B // 2)]
        return jax.make_array_from_process_local_data(sh, local,
                                                      arr.shape)

    state = create_train_state(model, tx, jnp.asarray(x_global[:4]))
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx, mesh=mesh, donate=False)

    losses = []
    for _ in range(3):
        batch = {"input": to_global(x_global), "label": to_global(y_global)}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))

    # ---- TP serving leg ACROSS PROCESSES: convert the trained state and
    # run the packed serving forward with the 'model' axis spanning both
    # hosts (column-parallel weights live half on each process) — the
    # multi-host serving path docs/scaling.md claims.
    import dataclasses

    from jaxlsq.parallel import make_mesh as _mm
    from jaxlsq.serve import convert, shard_converted

    tp_mesh = make_mesh(data=1, model=8)
    variables = {**state.params, **state.model_state}
    host_vars = jax.tree.map(np.asarray, variables)  # replicated → complete
    sv = convert(host_vars, qc)
    sm = QuantMLP(features=(32, 10),
                  qconfig=qc.for_serving("static", "xla"))
    x_eval = x_global[:8]
    # process-local unsharded reference (identical on both processes)
    want = np.asarray(sm.apply(sv, jnp.asarray(x_eval), training=False))

    sv_tp = shard_converted(sv, tp_mesh)
    x_tp = jax.device_put(jnp.asarray(x_eval), replicated(tp_mesh))
    with tp_mesh:
        out = jax.jit(lambda v, a: sm.apply(v, a, training=False),
                      out_shardings=replicated(tp_mesh))(sv_tp, x_tp)
    got = np.asarray(out)  # fully replicated → complete local copy
    tp_max_err = float(np.max(np.abs(got - want)))

    # scale qparams must be identical across processes (replicated state)
    qp = jax.tree.leaves(state.params["qparams"])[0]
    print(json.dumps({"pid": pid, "pcount": pcount,
                      "losses": [round(l, 6) for l in losses],
                      "qp0": round(float(np.asarray(qp).ravel()[0]), 6),
                      "tp_max_err": tp_max_err,
                      "tp_out0": round(float(got.ravel()[0]), 6)}),
          flush=True)


if __name__ == "__main__":
    main()
