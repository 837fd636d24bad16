"""Parity tests for the fused Pallas eigen kernels
(``ops/eigen_pallas.py``) against the XLA formulation
(``features/hessian.py`` + ``linalg/sym3.py``), in interpret mode on
CPU.  Real-TPU numbers/parity are re-measured by tools/perf_report.py.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from visfd_tpu.features import hessian as FH
from visfd_tpu.linalg import sym3
from visfd_tpu.ops.eigen_pallas import (_atan2_nonneg,
                                        hessian_principal_pallas,
                                        sym3_score_pallas)


@pytest.fixture(scope="module")
def blur():
    rng = np.random.default_rng(0)
    return rng.normal(size=(12, 20, 33)).astype(np.float32)


@pytest.fixture(scope="module")
def ref_principal(blur):
    sigma = 2.0
    hess = FH.hessian_fd(jnp.asarray(blur)) * (sigma * sigma)
    eivals, ev1 = sym3.principal_sym3(sym3.flat_to_full(hess),
                                      order=sym3.EigenOrder.DECREASING)
    return np.asarray(eivals), np.asarray(ev1)


def test_atan2_nonneg_matches_libm():
    rng = np.random.default_rng(3)
    y = np.abs(rng.normal(size=(64, 128))).astype(np.float32)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    y[0, :4] = 0.0
    x[0, :2] = 0.0        # includes the (0, 0) corner
    got = np.asarray(_atan2_nonneg(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-7)


def test_hessian_principal_score_parity(blur, ref_principal):
    eivals, _ = ref_principal
    l1, l2 = eivals[..., 0], eivals[..., 1]
    ref = (l1 * l1 - l2 * l2) ** 2
    score, _ = hessian_principal_pallas(jnp.asarray(blur), 2.0,
                                        decreasing=True, formula="planar",
                                        want_v=False, interpret=True)
    np.testing.assert_allclose(np.asarray(score), ref, rtol=1e-5,
                               atol=np.abs(ref).max() * 1e-6)


def test_hessian_principal_vals_parity(blur, ref_principal):
    eivals, _ = ref_principal
    vals, _ = hessian_principal_pallas(jnp.asarray(blur), 2.0,
                                       decreasing=True, formula="vals",
                                       want_v=False, interpret=True)
    vals = np.moveaxis(np.asarray(vals), 0, -1)
    np.testing.assert_allclose(vals, eivals, rtol=1e-4,
                               atol=np.abs(eivals).max() * 1e-5)


def test_hessian_principal_vector_parity(blur, ref_principal):
    eivals, ev1 = ref_principal
    _, v = hessian_principal_pallas(jnp.asarray(blur), 2.0,
                                    decreasing=True, formula="planar",
                                    want_v=True, interpret=True)
    v = np.moveaxis(np.asarray(v), 0, -1)
    # sign-invariant (every consumer is quadratic or |dot|-based);
    # compare where the principal eigenvalue is well separated
    gap = eivals[..., 0] - eivals[..., 1]
    well = np.abs(gap) > 1e-3 * np.abs(eivals).max()
    assert well.mean() > 0.99
    dot = np.abs((v * ev1).sum(-1))
    assert dot[well].min() > 1 - 1e-4


def test_hessian_principal_edge_clamp(blur):
    """Face/corner voxels replicate the nearest-interior stencil
    (visfd_utils.hpp:592-610) exactly like the XLA _edge_clamp."""
    sigma = 1.5
    hess = FH.hessian_fd(jnp.asarray(blur)) * (sigma * sigma)
    eivals, _ = sym3.principal_sym3(sym3.flat_to_full(hess),
                                    order=sym3.EigenOrder.DECREASING)
    e = np.asarray(eivals)
    ref = (e[..., 0] ** 2 - e[..., 1] ** 2) ** 2
    score, _ = hessian_principal_pallas(jnp.asarray(blur), sigma,
                                        decreasing=True, formula="planar",
                                        want_v=False, interpret=True)
    s = np.asarray(score)
    atol = np.abs(ref).max() * 1e-6
    for face in [np.s_[0, :, :], np.s_[-1, :, :], np.s_[:, 0, :],
                 np.s_[:, -1, :], np.s_[:, :, 0], np.s_[:, :, -1]]:
        np.testing.assert_allclose(s[face], ref[face], rtol=1e-5,
                                   atol=atol)
    # corners compose all three clamps
    np.testing.assert_allclose(s[0, 0, 0], ref[0, 0, 0], rtol=1e-5,
                               atol=atol)
    np.testing.assert_allclose(s[-1, -1, -1], ref[-1, -1, -1],
                               rtol=1e-5, atol=atol)


def test_hessian_principal_increasing_linear(blur):
    sigma = 2.0
    hess = FH.hessian_fd(jnp.asarray(blur)) * (sigma * sigma)
    ei, _ = sym3.principal_sym3(sym3.flat_to_full(hess),
                                order=sym3.EigenOrder.INCREASING)
    li = np.asarray(ei)
    ref = li[..., 0] * li[..., 1] - li[..., 2] ** 2
    got, _ = hessian_principal_pallas(jnp.asarray(blur), sigma,
                                      decreasing=False, formula="linear",
                                      want_v=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                               atol=np.abs(ref).max() * 1e-5)


def test_sym3_score_stick_parity():
    rng = np.random.default_rng(7)
    t6 = rng.normal(size=(9, 17, 40, 6)).astype(np.float32)
    vv, _ = sym3.diagonalize_sym3(sym3.flat_to_full(jnp.asarray(t6)),
                                  order=sym3.EigenOrder.DECREASING,
                                  want_vects=False)
    ref = np.asarray(vv[..., 0] - vv[..., 1])
    got, _ = sym3_score_pallas(jnp.asarray(np.moveaxis(t6, -1, 0)),
                               decreasing=True, formula="stick",
                               want_v=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                               atol=np.abs(ref).max() * 1e-5)


def test_sym3_score_vector_parity():
    rng = np.random.default_rng(8)
    t6 = rng.normal(size=(8, 15, 30, 6)).astype(np.float32)
    vv, _ = sym3.diagonalize_sym3(sym3.flat_to_full(jnp.asarray(t6)),
                                  order=sym3.EigenOrder.DECREASING,
                                  want_vects=False)
    _, vref = sym3.principal_sym3(sym3.flat_to_full(jnp.asarray(t6)),
                                  order=sym3.EigenOrder.DECREASING)
    _, v = sym3_score_pallas(jnp.asarray(np.moveaxis(t6, -1, 0)),
                             decreasing=True, formula="planar",
                             want_v=True, interpret=True)
    v = np.moveaxis(np.asarray(v), 0, -1)
    vvn = np.asarray(vv)
    well = np.abs(vvn[..., 0] - vvn[..., 1]) > 1e-3 * np.abs(vvn).max()
    dot = np.abs((v * np.asarray(vref)).sum(-1))
    assert dot[well].min() > 1 - 1e-4


def test_fused_pipeline_parity_interpret():
    """blur -> fused eigen -> channel-major TV -> fused stick score
    matches the all-XLA pipeline end to end (the bench hot path)."""
    from visfd_tpu.ops.tv_pallas import tv_dense_stick_pallas
    from visfd_tpu.features import tv as TV
    rng = np.random.default_rng(11)
    x = rng.normal(size=(10, 16, 35)).astype(np.float32)
    sigma, tv_sigma = 2.0, 1.5
    hess = FH.hessian_fd(jnp.asarray(x)) * (sigma * sigma)
    eivals, ev1 = sym3.principal_sym3(sym3.flat_to_full(hess),
                                      order=sym3.EigenOrder.DECREASING)
    l1, l2 = np.asarray(eivals[..., 0]), np.asarray(eivals[..., 1])
    sal_ref = jnp.asarray((l1 * l1 - l2 * l2) ** 2)
    vote_ref = TV.tv_dense_stick(sal_ref, ev1, tv_sigma, exponent=4,
                                 truncate_ratio=float(np.sqrt(2.0)),
                                 normalize=False, use_pallas=False)
    vv, _ = sym3.diagonalize_sym3(sym3.flat_to_full(vote_ref),
                                  order=sym3.EigenOrder.DECREASING,
                                  want_vects=False)
    ref = np.asarray(vv[..., 0] - vv[..., 1])

    sal, v = hessian_principal_pallas(jnp.asarray(x), sigma,
                                      decreasing=True, formula="planar",
                                      want_v=True, interpret=True)
    vote, _ = tv_dense_stick_pallas(sal, v, tv_sigma, exponent=4,
                                    truncate_ratio=float(np.sqrt(2.0)),
                                    channel_major=True, interpret=True)
    got, _ = sym3_score_pallas(vote, decreasing=True, formula="stick",
                               want_v=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4,
                               atol=np.abs(ref).max() * 2e-5)
