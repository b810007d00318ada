"""Native replay-buffer runtime tests (C++ mmap store + threaded gather)."""

import numpy as np
import pytest

from neurallaplacecontrol_tpu import runtime


@pytest.fixture(scope="module")
def lib():
    lib = runtime.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def _arrays(n=1000):
    rng = np.random.default_rng(0)
    s0 = rng.normal(size=(n, 3)).astype(np.float32)
    a0 = rng.normal(size=(n, 4, 1)).astype(np.float32)
    sn = rng.normal(size=(n, 3)).astype(np.float32)
    ts = rng.exponential(0.05, size=(n, 1)).astype(np.float32)
    return s0, a0, sn, ts


def test_roundtrip_zero_copy(lib, tmp_path):
    s0, a0, sn, ts = _arrays()
    path = tmp_path / "buf.rbuf"
    assert runtime.write_buffer(path, s0, a0, sn, ts)
    rb = runtime.open_buffer(
        path, {"s0": (3,), "a0": (4, 1), "sn": (3,), "ts": (1,)}
    )
    assert rb.n == 1000
    np.testing.assert_array_equal(rb.arrays["s0"], s0)
    np.testing.assert_array_equal(rb.arrays["a0"], a0)
    np.testing.assert_array_equal(rb.arrays["ts"], ts)
    rb.close()


@pytest.mark.parametrize("threads", [1, 8])
def test_gather_matches_numpy(lib, tmp_path, threads):
    s0, a0, sn, ts = _arrays(5000)
    path = tmp_path / "buf.rbuf"
    runtime.write_buffer(path, s0, a0, sn, ts)
    rb = runtime.open_buffer(
        path, {"s0": (3,), "a0": (4, 1), "sn": (3,), "ts": (1,)}
    )
    rng = np.random.default_rng(1)
    idx = rng.permutation(5000)[:4999]
    got = rb.gather("a0", idx, n_threads=threads)
    np.testing.assert_array_equal(got, a0[idx])
    rb.close()


def test_replay_module_uses_native_path(lib, tmp_path):
    import jax.numpy as jnp

    from neurallaplacecontrol_tpu.data import load_replay_buffer, save_replay_buffer

    s0, a0, sn, ts = _arrays(64)
    path = tmp_path / "rb.npz"
    save_replay_buffer(path, s0, a0, sn, ts)
    assert (tmp_path / "rb.rbuf").exists()  # native sibling written
    s0b, a0b, snb, tsb = load_replay_buffer(path)
    np.testing.assert_allclose(np.asarray(s0b), s0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a0b), a0, rtol=1e-6)


def test_open_rejects_garbage(lib, tmp_path):
    bad = tmp_path / "junk.rbuf"
    bad.write_bytes(b"not a replay buffer at all........")
    with pytest.raises(IOError):
        runtime.open_buffer(bad, {"s0": (3,), "a0": (4, 1), "sn": (3,), "ts": (1,)})


def test_gather_rejects_out_of_range(lib, tmp_path):
    """Out-of-range gather indices must raise, not fill garbage rows."""
    import jax.numpy as jnp
    import pytest

    from neurallaplacecontrol_tpu import runtime
    from neurallaplacecontrol_tpu.data.replay import _rbuf_path, save_replay_buffer

    path = str(tmp_path / "b.npz")
    save_replay_buffer(
        path,
        jnp.ones((6, 3), jnp.float32), jnp.ones((6, 4, 1), jnp.float32),
        jnp.ones((6, 3), jnp.float32), jnp.ones((6, 1), jnp.float32),
    )
    rb = runtime.open_buffer(_rbuf_path(path), {"s0": (3,), "a0": (4, 1), "sn": (3,), "ts": (1,)})
    with pytest.raises(RuntimeError):
        rb.gather("s0", np.asarray([0, 99], np.int64))
    rb.close()


def test_truncated_rbuf_rejected(lib, tmp_path):
    """A truncated .rbuf (crash mid-write) must fail to open and fall back
    to the intact .npz instead of SIGBUSing later."""
    import jax.numpy as jnp

    from neurallaplacecontrol_tpu.data.replay import (
        _rbuf_path,
        load_replay_buffer,
        save_replay_buffer,
    )

    path = str(tmp_path / "t.npz")
    save_replay_buffer(
        path,
        jnp.full((8, 3), 5.0, jnp.float32), jnp.ones((8, 4, 1), jnp.float32),
        jnp.ones((8, 3), jnp.float32), jnp.ones((8, 1), jnp.float32),
    )
    rb_path = _rbuf_path(path)
    data = open(rb_path, "rb").read()
    open(rb_path, "wb").write(data[: len(data) // 2])  # truncate payload
    s0, _, _, _ = load_replay_buffer(path)  # falls back to npz
    np.testing.assert_allclose(np.asarray(s0), 5.0)
