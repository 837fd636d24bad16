"""Closed-form sym3 eigensolver tests vs numpy.linalg.eigh and
roundtrip identities."""

import numpy as np
import pytest

import jax.numpy as jnp

from visfd_tpu.linalg import (
    EigenOrder,
    diagonalize_sym3,
    diagonalize_flat_sym3,
    undiagonalize_flat_sym3,
    flat_to_full,
    full_to_flat,
    matrix_to_shoemake,
    shoemake_to_matrix,
)
from visfd_tpu.linalg.sym3 import (
    matrix_to_quaternion,
    quaternion_to_matrix,
    flat_eigenvectors,
)


def random_sym(rng, n):
    a = rng.normal(size=(n, 3, 3))
    return ((a + np.swapaxes(a, -1, -2)) / 2).astype(np.float32)


def test_eigenvalues_match_numpy(rng):
    m = random_sym(rng, 500)
    vals, vects = diagonalize_sym3(jnp.asarray(m))
    want = np.linalg.eigvalsh(m.astype(np.float64))
    np.testing.assert_allclose(np.asarray(vals), want, rtol=2e-4, atol=2e-5)


def test_eigenvector_property(rng):
    m = random_sym(rng, 300)
    vals, vects = diagonalize_sym3(jnp.asarray(m))
    vals, vects = np.asarray(vals), np.asarray(vects)
    # M v_i = lambda_i v_i  (rows are eigenvectors)
    mv = np.einsum("nij,nkj->nki", m, vects)
    lv = vals[..., None] * vects
    np.testing.assert_allclose(mv, lv, atol=5e-4)
    # orthonormality
    gram = np.einsum("nki,nli->nkl", vects, vects)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape),
                               atol=5e-4)


def test_degenerate_matrices():
    mats = np.stack([
        np.eye(3),                       # fully degenerate
        np.diag([2.0, 2.0, 5.0]),        # pairwise degenerate
        np.diag([5.0, 2.0, 2.0]),
        np.zeros((3, 3)),
        np.diag([1.0, 1.0 + 1e-8, 1.0 - 1e-8]),
    ]).astype(np.float32)
    vals, vects = diagonalize_sym3(jnp.asarray(mats))
    vals, vects = np.asarray(vals), np.asarray(vects)
    assert np.isfinite(vals).all() and np.isfinite(vects).all()
    mv = np.einsum("nij,nkj->nki", mats, vects)
    lv = vals[..., None] * vects
    np.testing.assert_allclose(mv, lv, atol=1e-5)


@pytest.mark.parametrize("order,check", [
    (EigenOrder.INCREASING, lambda v: (np.diff(v, axis=-1) >= 0).all()),
    (EigenOrder.DECREASING,
     lambda v: (v[:, 0] >= v[:, 2]).all()),
    (EigenOrder.INCREASING_ABS,
     lambda v: (np.abs(v[:, 0]) <= np.abs(v[:, 2])).all()),
    (EigenOrder.DECREASING_ABS,
     lambda v: (np.abs(v[:, 0]) >= np.abs(v[:, 2])).all()),
])
def test_orderings(rng, order, check):
    m = random_sym(rng, 200)
    vals, _ = diagonalize_sym3(jnp.asarray(m), order=order)
    assert check(np.asarray(vals))


def test_flat_roundtrip(rng):
    m = random_sym(rng, 200)
    flat = full_to_flat(jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(flat_to_full(flat)), m, atol=1e-7)
    diag = diagonalize_flat_sym3(flat)
    rebuilt = undiagonalize_flat_sym3(diag)
    np.testing.assert_allclose(np.asarray(rebuilt), np.asarray(flat),
                               atol=2e-3)


def test_shoemake_quaternion_roundtrip(rng):
    # random rotations via QR
    a = rng.normal(size=(100, 3, 3))
    q, _ = np.linalg.qr(a)
    det = np.linalg.det(q)
    q = q * np.sign(det)[..., None, None]  # ensure det +1
    q = q.astype(np.float32)
    quat = matrix_to_quaternion(jnp.asarray(q))
    back = quaternion_to_matrix(quat)
    np.testing.assert_allclose(np.asarray(back), q, atol=2e-3)
    sm = matrix_to_shoemake(jnp.asarray(q))
    back2 = shoemake_to_matrix(sm)
    np.testing.assert_allclose(np.asarray(back2), q, atol=2e-3)


def test_flat_eigenvectors_unpack(rng):
    m = random_sym(rng, 50)
    diag = diagonalize_flat_sym3(full_to_flat(jnp.asarray(m)))
    vals, vects = flat_eigenvectors(diag)
    vals, vects = np.asarray(vals), np.asarray(vects)
    mv = np.einsum("nij,nkj->nki", m, vects)
    lv = vals[..., None] * vects
    np.testing.assert_allclose(mv, lv, atol=5e-3)


def test_principal_sym3_matches_full_solver():
    import jax
    import jax.numpy as jnp
    from visfd_tpu.linalg import sym3

    rng = np.random.default_rng(42)
    m6 = rng.normal(size=(3000, 6)).astype(np.float32)
    mat = sym3.flat_to_full(jnp.asarray(m6))
    for order in (sym3.EigenOrder.DECREASING, sym3.EigenOrder.INCREASING):
        ev_f, vec_f = sym3.diagonalize_sym3(mat, order=order)
        ev_p, v1 = sym3.principal_sym3(mat, order=order)
        np.testing.assert_allclose(np.asarray(ev_f), np.asarray(ev_p),
                                   atol=2e-5, rtol=1e-5)
        dots = np.abs(np.einsum("nd,nd->n",
                                np.asarray(vec_f)[:, 0, :], np.asarray(v1)))
        assert dots.min() > 0.9999
