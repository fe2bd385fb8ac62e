"""Native prefetching shard loader (jaxlsq/native/loader.cpp via ctypes):
coverage, determinism, worker-count invariance, and ring correctness under
concurrency."""

import numpy as np
import pytest

from jaxlsq.native.loader import NativeShardLoader, is_available

pytestmark = pytest.mark.skipif(not is_available(),
                                reason="native loader toolchain unavailable")


@pytest.fixture
def shards(tmp_path):
    """3 shards of distinct rows: x rows carry their global id in x[:, 0]."""
    rng = np.random.default_rng(0)
    paths, gid = [], 0
    for i, rows in enumerate((40, 25, 31)):
        x = rng.standard_normal((rows, 4, 3)).astype(np.float32)
        x[:, 0, 0] = np.arange(gid, gid + rows)
        y = np.arange(gid, gid + rows).astype(np.int32)
        gid += rows
        xp, yp = str(tmp_path / f"x{i}.npy"), str(tmp_path / f"y{i}.npy")
        np.save(xp, x)
        np.save(yp, y)
        paths.append((xp, yp))
    return paths, gid


def _epoch_ids(loader):
    ids = []
    for _ in range(loader.batches_per_epoch):
        x, y = loader.next()
        assert x.shape == loader.x_shape and y.shape == loader.y_shape
        np.testing.assert_array_equal(x[:, 0, 0].astype(np.int32), y)
        ids.extend(y.tolist())
    return ids


def test_epoch_covers_dataset_no_repeats(shards):
    paths, n = shards
    with NativeShardLoader(paths, batch=8, seed=7, workers=3) as ld:
        assert ld.num_examples == n
        ids = _epoch_ids(ld)
    # within one epoch every row appears at most once (drop-remainder)
    assert len(ids) == len(set(ids)) == ld.batches_per_epoch * 8
    assert set(ids) <= set(range(n))


def test_deterministic_and_worker_invariant(shards):
    paths, _ = shards

    def run(workers, prefetch):
        with NativeShardLoader(paths, batch=8, seed=13, workers=workers,
                               prefetch=prefetch) as ld:
            return [ld.next()[1].tolist() for _ in range(30)]  # > 2 epochs

    a = run(1, 2)
    b = run(4, 8)
    assert a == b  # batch k is identical regardless of concurrency


def test_epochs_reshuffle(shards):
    paths, _ = shards
    with NativeShardLoader(paths, batch=8, seed=3, workers=2) as ld:
        e1 = _epoch_ids(ld)
        e2 = _epoch_ids(ld)
    assert e1 != e2              # different order
    # (sets can differ slightly because drop-remainder rows differ per epoch)
    assert len(set(e1) & set(e2)) > len(e1) // 2


def test_unlabeled_and_errors(tmp_path, shards):
    paths, _ = shards
    with NativeShardLoader([p[0] for p in paths], batch=4) as ld:
        x = ld.next()
        assert x.shape == (4, 4, 3)
    with pytest.raises(RuntimeError, match="smaller than one batch"):
        NativeShardLoader(paths, batch=1000)
    bad = tmp_path / "bad.npy"
    bad.write_bytes(b"not an npy")
    with pytest.raises((RuntimeError, ValueError)):  # numpy header parse or native
        NativeShardLoader([str(bad)], batch=1)


def test_feeds_qat_step(shards):
    """End-to-end: the native loader feeds the jitted QAT train step."""
    import jax.numpy as jnp
    import optax

    from jaxlsq.models import QuantMLP, default_qconfig
    from jaxlsq.parallel import create_train_state, make_train_step

    paths, _ = shards
    qc = default_qconfig(8, 8, init_batches=1)
    model = QuantMLP(features=(8, 4), qconfig=qc)
    tx = optax.sgd(1e-2)
    with NativeShardLoader(paths, batch=8, seed=0, workers=2) as ld:
        x0, _ = ld.next()
        state = create_train_state(model, tx,
                                   jnp.asarray(x0.reshape(8, -1)))
        step = make_train_step(model, tx)
        for _ in range(3):
            x, y = ld.next()
            state, metrics = step(state, {
                "input": jnp.asarray(x.reshape(8, -1)),
                "label": jnp.asarray(y % 4)})
    assert np.isfinite(float(metrics["loss"]))


def test_use_after_close_raises(shards):
    """ADVICE r2: next()/delivered after close() must raise a Python error,
    not pass a NULL handle into the C library (which segfaulted)."""
    paths, _ = shards
    ld = NativeShardLoader(paths, batch=8, seed=0, workers=1)
    ld.next()
    ld.close()
    with pytest.raises(RuntimeError, match="closed"):
        ld.next()
    with pytest.raises(RuntimeError, match="closed"):
        _ = ld.delivered
    ld.close()  # idempotent


def test_corrupt_header_length_rejected(tmp_path):
    """ADVICE r2: a header length field exceeding the file size must be
    rejected up front (previously the size_t payload subtraction underflowed
    and the truncation check could pass on corrupt files)."""
    import struct

    bad = tmp_path / "hdr.npy"
    # valid magic + version 1, but declared header length 0xFFFF >> file size
    bad.write_bytes(b"\x93NUMPY\x01\x00" + struct.pack("<H", 0xFFFF)
                    + b"{'descr': '<f4'}")
    with pytest.raises((RuntimeError, ValueError)):
        NativeShardLoader([str(bad)], batch=1)
