"""Multi-device parity: sharded blob ladder, sharded plateau extrema,
and cross-device reductions must reproduce the single-device results
bit-exactly on a forced 8-device CPU mesh (SURVEY 4 last bullet)."""

import numpy as np
import pytest

from visfd_tpu.io import read_mrc
from visfd_tpu.features import blob as B
from visfd_tpu.segment.extrema import find_extrema
from visfd_tpu.parallel.mesh import make_mesh
from visfd_tpu.parallel import reduce as R
from visfd_tpu.parallel.sharded_features import (
    sharded_blob_dog, find_extrema_sharded)

FIX = "/root/reference/tests/test_blob_detect.rec"
MASKF = "/root/reference/tests/test_blob_detect_mask.rec"

SIGMAS = [d / (2 * np.sqrt(3)) for d in (5.0, 6.0, 7.2, 8.6, 10.4)]
BLOB_KW = dict(minima_threshold=0.5, maxima_threshold=0.5,
               use_threshold_ratios=True)


@pytest.fixture(scope="module")
def img(reference_fixture_dir):
    return read_mrc(FIX).data


@pytest.fixture(scope="module")
def maskimg(reference_fixture_dir):
    return read_mrc(MASKF).data


def _blobs_equal(a, b):
    return (len(a) == len(b)
            and np.array_equal(a.crds, b.crds)
            and np.array_equal(a.diameters, b.diameters)
            and np.array_equal(a.scores, b.scores))


@pytest.mark.parametrize("n_devices", [1, 8])
def test_sharded_blob_bit_identical(img, n_devices):
    ref_min, ref_max = B.blob_dog(img, SIGMAS, **BLOB_KW)
    smin, smax = sharded_blob_dog(img, SIGMAS, make_mesh(n_devices),
                                  **BLOB_KW)
    assert _blobs_equal(smin, ref_min)
    assert _blobs_equal(smax, ref_max)


def test_sharded_blob_masked(img, maskimg):
    ref_min, ref_max = B.blob_dog(img, SIGMAS, mask=maskimg, **BLOB_KW)
    smin, smax = sharded_blob_dog(img, SIGMAS, make_mesh(8),
                                  mask=maskimg, **BLOB_KW)
    assert _blobs_equal(smin, ref_min)
    assert _blobs_equal(smax, ref_max)


@pytest.mark.parametrize("conn,quantize,use_mask", [
    (3, False, False),
    (3, False, True),
    (1, True, False),   # quantized -> multi-voxel plateaus
    (2, True, True),
])
def test_sharded_extrema_identical(img, maskimg, conn, quantize, use_mask):
    x = np.round(img / 8).astype(np.float32) if quantize else img
    m = maskimg if use_mask else None
    ref = find_extrema(x, mask=m, connectivity=conn)
    got = find_extrema_sharded(x, make_mesh(8), mask=m, connectivity=conn)
    np.testing.assert_array_equal(ref.minima_indices, got.minima_indices)
    np.testing.assert_array_equal(ref.maxima_indices, got.maxima_indices)
    np.testing.assert_array_equal(ref.minima_scores, got.minima_scores)
    np.testing.assert_array_equal(ref.maxima_scores, got.maxima_scores)
    np.testing.assert_array_equal(ref.minima_nvoxels, got.minima_nvoxels)
    np.testing.assert_array_equal(ref.maxima_nvoxels, got.maxima_nvoxels)
    np.testing.assert_array_equal(ref.label_image, got.label_image)


def test_global_min_max_mean(rng):
    x = (rng.normal(size=(22, 32, 27)) * 37.5).astype(np.float32)
    m = (rng.random(x.shape) > 0.3).astype(np.float32)
    mesh = make_mesh(8)
    vmin, vmax, vmean = R.global_min_max_mean(x, mesh, m)
    vals = x[m != 0]
    assert vmin == vals.min()
    assert vmax == vals.max()
    assert np.isclose(vmean, vals.mean(), rtol=1e-5)


@pytest.mark.parametrize("fraction", [0.0, 0.05, 0.5, 0.999, 1.0])
def test_fraction_threshold_exact(rng, fraction):
    """The -tv-best distributed quantile is bit-identical to the
    reference's full descending sort (handlers.cpp:1753-1797)."""
    x = (rng.normal(size=(22, 32, 27)) * 37.5).astype(np.float32)
    m = (rng.random(x.shape) > 0.3).astype(np.float32)
    mesh = make_mesh(8)
    vals = np.sort(x[m != 0])[::-1]
    k = min(int(np.floor(len(vals) * fraction)), len(vals) - 1)
    thr = R.fraction_threshold(x, fraction, mesh, m)
    assert thr == vals[k]


def test_kth_largest_duplicates_and_mesh_sizes(rng):
    x = np.round(rng.normal(size=(16, 16, 16)) * 5).astype(np.float32)
    sv = np.sort(x.reshape(-1))[::-1]
    for nd in (1, 2, 8):
        got = float(R.kth_largest(x, 1234, make_mesh(nd)))
        assert got == sv[1234]
