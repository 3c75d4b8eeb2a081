import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssdf_tpu.utils.math import (
    exp_lr_schedule,
    normalize,
    num_sh_bases,
    quat_to_rotmat,
    random_quat,
    rotation_6d_to_matrix,
    rotmat_to_quat,
)


def test_quat_rotmat_roundtrip():
    key = jax.random.PRNGKey(0)
    q = random_quat(key, 64)
    R = quat_to_rotmat(q)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    q2 = rotmat_to_quat(R)
    R2 = quat_to_rotmat(q2)
    np.testing.assert_allclose(R, R2, atol=1e-4)


def test_rotmat_to_quat_identity():
    q = rotmat_to_quat(jnp.eye(3)[None])
    np.testing.assert_allclose(q, [[1, 0, 0, 0]], atol=1e-6)


def test_rotation_6d():
    d6 = jnp.array([[1.0, 0, 0, 0, 1.0, 0]])
    R = rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    # arbitrary input still orthonormal
    d6 = jax.random.normal(jax.random.PRNGKey(1), (32, 6))
    R = rotation_6d_to_matrix(d6)
    eye = jnp.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)


def test_exp_lr_schedule_endpoints():
    assert np.isclose(exp_lr_schedule(0.0, 1e-2, 1e-4), 1e-2)
    assert np.isclose(exp_lr_schedule(1.0, 1e-2, 1e-4), 1e-4)
    assert np.isclose(exp_lr_schedule(0.5, 1e-2, 1e-4), 1e-3)


def test_num_sh_bases():
    assert [num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]


def test_normalize():
    v = jnp.array([[3.0, 4.0, 0.0]])
    np.testing.assert_allclose(normalize(v), [[0.6, 0.8, 0.0]], atol=1e-6)


def test_progress_bar_plain_and_tty_modes():
    """tqdm.hpp analog: iterates transparently, renders rate/ETA lines."""
    import io

    from gssdf_tpu.utils.progress import ProgressBar, trange

    buf = io.StringIO()  # non-TTY: sparse plain lines
    out = list(ProgressBar(range(25), prefix="T", stream=buf))
    assert out == list(range(25))
    text = buf.getvalue()
    assert "T" in text and "25/25" in text and text.count("\n") <= 15

    class Tty(io.StringIO):
        def isatty(self):
            return True

    buf = Tty()
    assert list(trange(5, prefix="x", stream=buf, min_interval=0.0)) == [
        0, 1, 2, 3, 4,
    ]
    assert "\r" in buf.getvalue() and "5/5" in buf.getvalue()

    # unknown-length iterables still work
    gen = (i for i in range(7))
    assert len(list(ProgressBar(gen, stream=io.StringIO()))) == 7
