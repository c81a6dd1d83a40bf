"""Parity tests: specenh.ops.svd vs the float64 NumPy recipes of
denoising_by_svd.ipynb cell 1 (via specenh.bench.reference_cpu)."""

import numpy as np
import pytest

import jax.numpy as jnp

from specenh.bench import reference_cpu as ref
from specenh.ops import svd
from specenh.utils.metrics import ssim


def _lowrank_plus_noise(seed=0, shape=(256, 500), rank=6, noise=0.1):
    rng = np.random.default_rng(seed)
    m = np.zeros(shape)
    for i in range(rank):
        m += np.outer(rng.standard_normal(shape[0]), rng.standard_normal(shape[1])) * (
            4.0 / (i + 1)
        )
    return m + noise * rng.standard_normal(shape)


@pytest.fixture(scope="module")
def mat():
    return _lowrank_plus_noise()


def test_omega_cubic():
    for beta in [0.1, 0.25, 256 / 3905, 1.0]:
        want = 0.56 * beta**3 - 0.95 * beta**2 + 1.82 * beta + 1.43
        np.testing.assert_allclose(float(svd.omega(beta)), want, rtol=1e-6)


def test_gavish_donoho_count(mat):
    s64 = np.linalg.svd(mat, compute_uv=False)
    beta = min(mat.shape) / max(mat.shape)
    t_star = (0.56 * beta**3 - 0.95 * beta**2 + 1.82 * beta + 1.43) * np.median(s64)
    want = int((s64 > t_star).sum())
    got = int(svd.gavish_donoho_count(jnp.asarray(s64, jnp.float32), mat.shape))
    assert got == want


def test_top_k_svd_accuracy(mat):
    u, s, vh = svd.top_k_svd(jnp.asarray(mat, jnp.float32), 16)
    s64 = np.linalg.svd(mat, compute_uv=False)
    # signal components (well-separated): tight; noise components (dense
    # spectrum, slow subspace convergence): loose
    np.testing.assert_allclose(np.asarray(s)[:6], s64[:6], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s)[6:8], s64[6:8], rtol=5e-2)
    # signal-subspace (rank-6) reconstruction matches the fp64 optimum
    u64, s64f, v64 = np.linalg.svd(mat, full_matrices=False)
    r6 = np.asarray(u)[:, :6] @ np.diag(np.asarray(s)[:6]) @ np.asarray(vh)[:6]
    best6 = u64[:, :6] @ np.diag(s64f[:6]) @ v64[:6]
    assert np.abs(r6 - best6).max() / np.abs(mat).max() < 1e-3
    # rank-8 reconstruction achieves near-optimal Eckart-Young error even
    # though individual noise components are not unique
    r8 = np.asarray(u)[:, :8] @ np.diag(np.asarray(s)[:8]) @ np.asarray(vh)[:8]
    err8 = np.linalg.norm(mat - r8)
    best_err8 = np.linalg.norm(s64[8:])
    assert err8 < best_err8 * 1.001


def test_denoise_default_drops_top1(mat):
    want = ref.svd_denoise_ref(mat)
    got = np.asarray(svd.denoise_signal(jnp.asarray(mat, jnp.float32)))
    assert np.abs(got - want).max() / np.abs(mat).max() < 1e-4


def test_denoise_explicit_band(mat):
    want = ref.svd_denoise_ref(mat, start=2, stop=5)
    got = np.asarray(svd.denoise_signal(jnp.asarray(mat, jnp.float32), start=2, stop=5))
    assert np.abs(got - want).max() / np.abs(mat).max() < 1e-3


def test_denoise_clamps_bad_bounds(mat):
    want = ref.svd_denoise_ref(mat, start=-5, stop=10_000)
    got = np.asarray(
        svd.denoise_signal(jnp.asarray(mat, jnp.float32), start=-5, stop=10_000)
    )
    assert np.abs(got - want).max() / np.abs(mat).max() < 1e-4


def test_denoise_optimal(mat):
    want = ref.svd_denoise_ref(mat, use_optimal=True)
    got = np.asarray(svd.denoise_signal(jnp.asarray(mat, jnp.float32), use_optimal=True))
    # band edge sits in the noise spectrum: compare by SSIM + loose max
    rw = (want - want.min()) / (want.max() - want.min())
    rg = (got - got.min()) / (got.max() - got.min())
    assert ssim(rg, rw) > 0.995
    assert np.abs(got - want).max() / np.abs(mat).max() < 5e-3


def test_compute_signal(mat):
    want = ref.svd_compute_signal_ref(mat)
    got = np.asarray(svd.compute_signal(jnp.asarray(mat, jnp.float32)))
    rw = (want - want.min()) / (want.max() - want.min())
    rg = (got - got.min()) / (got.max() - got.min())
    assert ssim(rg, rw) > 0.995


def test_compute_signal_band_beyond_kmax():
    """Heavily structured spectrum: 2*num_sing exceeds the K_MAX subspace,
    so the auto path must fall back to the full decomposition instead of a
    silent rank-K_MAX truncation."""
    rng = np.random.default_rng(17)
    n_sig = svd.K_MAX  # num_sing ~ 64 -> band 1..128 > K_MAX
    qm, _ = np.linalg.qr(rng.standard_normal((160, 160)))
    qn, _ = np.linalg.qr(rng.standard_normal((220, 220)))
    # distinct values: a degenerate spectrum would make "component 0"
    # basis-arbitrary and the comparison meaningless
    s = np.concatenate(
        [np.linspace(80.0, 30.0, n_sig), np.full(160 - n_sig, 0.01)]
    )
    m = (qm * s) @ qn[:, :160].T  # (160, 220), 64 dominant components
    want = ref.svd_compute_signal_ref(m)
    got = np.asarray(svd.compute_signal(jnp.asarray(m, jnp.float32)))
    assert np.abs(got - want).max() / np.abs(m).max() < 5e-3
    # tall matrix exercises the m > n Gram branch of the fallback
    wantT = ref.svd_compute_signal_ref(m.T)
    gotT = np.asarray(svd.compute_signal(jnp.asarray(m.T, jnp.float32)))
    assert np.abs(gotT - wantT).max() / np.abs(m).max() < 5e-3


def test_deflate_top1_matches_default(mat):
    want = ref.svd_denoise_ref(mat)
    got = np.asarray(svd.deflate_top1(jnp.asarray(mat, jnp.float32)))
    assert np.abs(got - want).max() / np.abs(mat).max() < 1e-4


def test_batched_denoise(mat):
    stack = np.stack([mat, mat[::-1]])
    got = np.asarray(svd.denoise_signal(jnp.asarray(stack, jnp.float32)))
    for i in range(2):
        want = ref.svd_denoise_ref(stack[i])
        assert np.abs(got[i] - want).max() / np.abs(mat).max() < 1e-4


def test_denoise_on_real_spectrogram(small_spec):
    """The actual reference use: denoiseSignal(spectrogram) in
    denoising_by_svd.ipynb cell 2."""
    want = ref.svd_denoise_ref(np.asarray(small_spec, np.float64))
    got = np.asarray(svd.denoise_signal(jnp.asarray(small_spec, jnp.float32)))
    assert np.abs(got - want).max() < 1e-3
    rw = (want - want.min()) / (want.max() - want.min())
    rg = (got - got.min()) / (got.max() - got.min())
    assert ssim(rg, rw) > 0.99


def test_use_optimal_zero_count_negative_slice_quirk():
    """When the Gavish-Donoho count is 0, the reference's stop = -1 hits
    Python negative slicing and keeps all but the LAST component."""
    rng = np.random.default_rng(11)
    # orthogonal-ish matrix: flat singular spectrum => num_sing == 0
    q, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    m = q + 0.01 * rng.standard_normal((64, 64))
    s64 = np.linalg.svd(m, compute_uv=False)
    beta = 1.0
    t_star = (0.56 - 0.95 + 1.82 + 1.43) * np.median(s64)
    assert (s64 > t_star).sum() == 0  # precondition
    want = ref.svd_denoise_ref(m, use_optimal=True)
    got = np.asarray(svd.denoise_signal(jnp.asarray(m, jnp.float32), use_optimal=True))
    assert np.abs(want).max() > 0.2  # reference keeps rank n-1, not zeros
    assert np.abs(got - want).max() / np.abs(m).max() < 5e-2


def test_use_optimal_zero_count_beyond_kmax():
    """Same wrap-around quirk on a matrix whose n_min - 1 exceeds the
    K_MAX subspace: the auto path must fall back to the full decomposition
    (lax.cond) instead of silently returning a rank-K_MAX truncation."""
    rng = np.random.default_rng(5)
    n = svd.K_MAX * 2  # n_min - 1 = 127 > K_MAX = 64
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    m = q + 0.01 * rng.standard_normal((n, n))
    s_all = np.linalg.svd(m, compute_uv=False)
    t_star = (0.56 - 0.95 + 1.82 + 1.43) * np.median(s_all)
    assert (s_all > t_star).sum() == 0  # precondition: num_sing == 0
    want = ref.svd_denoise_ref(m, use_optimal=True)
    got = np.asarray(svd.denoise_signal(jnp.asarray(m, jnp.float32), use_optimal=True))
    assert np.abs(got - want).max() / np.abs(m).max() < 5e-2
