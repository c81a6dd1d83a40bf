"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual devices — the standard JAX
fake-multi-device harness (SURVEY.md section 4) — so sharding/collective
tests exercise real SPMD partitioning without TPU hardware, and golden
comparisons vs SciPy/OpenCV are deterministic.
"""

import os

# keep unit-test compiles out of the persistent compile cache
os.environ.setdefault("SPECENH_NO_COMPILE_CACHE", "1")

# NOTE: the JAX_PLATFORMS env var is IGNORED by this machine's 'axon' TPU
# plugin — jax.config.update('jax_platforms', ...) is the reliable override.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from specenh.config import SpecParams  # noqa: E402


@pytest.fixture(scope="session")
def spec_params():
    return SpecParams()


@pytest.fixture(scope="session")
def small_spec_params():
    """Reduced workload for CPU-speed tests: 0.2 s shot -> 256 x 389 spec."""
    return SpecParams(cut_shot=0.2)


def synth_trace(sp: SpecParams, seed: int = 0, n_channels: int | None = None):
    """Synthetic ECE-like trace(s): chirp + fixed tone + noise.  A known
    spectral line that must survive enhancement (SURVEY.md section 4)."""
    rng = np.random.default_rng(seed)
    n = sp.n_samples
    t = np.arange(n) / sp.fs
    def one(k):
        return (
            np.sin(2 * np.pi * (5e4 + 2e4 * t) * t + k)
            + 0.3 * np.sin(2 * np.pi * 1.2e5 * t)
            + 0.5 * rng.standard_normal(n)
        )
    if n_channels is None:
        return one(0).astype(np.float32)
    return np.stack([one(k) for k in range(n_channels)]).astype(np.float32)


@pytest.fixture(scope="session")
def trace(spec_params):
    return synth_trace(spec_params)


@pytest.fixture(scope="session")
def small_trace(small_spec_params):
    return synth_trace(small_spec_params)


@pytest.fixture(scope="session")
def small_spec(small_spec_params, small_trace):
    from specenh.bench.reference_cpu import spectrogram_ref

    s, f, t = spectrogram_ref(small_trace, small_spec_params)
    return s


# ---------------------------------------------------------------------------
# `pytest -m smoke`: one fast representative test per subsystem (< ~2 min on
# a multi-core host), so correctness iteration on slow hosts does not cost
# the full suite.  Central list, applied at collection — the tests
# themselves stay unmarked.
# ---------------------------------------------------------------------------

SMOKE_TESTS = {
    "tests/test_stft.py::test_psd_matches_scipy[linear]",
    "tests/test_enhance.py::test_full_pipeline_parity",
    "tests/test_svd.py::test_denoise_default_drops_top1",
    "tests/test_tiles.py::test_patch_matches_reference_ordering",
    "tests/test_io.py::test_store_schema_matches_reference",
    "tests/test_crosspower.py::test_ae_co2_contract",
    "tests/test_models.py::test_fit_history_and_determinism",
    "tests/test_fused_ae.py::test_polyphase_matches_flax[shape0]",
    "tests/test_parity_turn.py::test_specs_to_x16_2d_exact[1-6]",
    "tests/test_ae_kernel.py::test_kernel_f32_exact",
    "tests/test_ae_train_kernel.py::test_grad_parity_f32",
    "tests/test_ae3_kernel.py::test_kernel3_f32_exact",
    "tests/test_ae3_train_kernel.py::test_grad_parity_f32",
    "tests/test_parallel.py::test_dp_step_matches_single_device",
    "tests/test_train_stream.py::test_fit_streaming_chunked_trains",
    "tests/test_sweep.py::test_sweep_trains_and_selects_best",
    "tests/test_serve.py::test_serve_processes_backlog_and_is_idempotent",
    "tests/test_native.py::test_native_read_matches_python",
    "tests/test_utils.py::test_host_shard_partitions",
    "tests/test_viz_and_grain.py::test_val_loss_artifacts",
    "tests/test_e2e.py::test_train_from_raw_split_semantics[tile-5-2]",
}


def pytest_collection_modifyitems(config, items):
    # nodeids are rootdir-relative: running from inside tests/ (or any
    # rootdir other than the repo root) would never match the hard-coded
    # "tests/..." prefixes — compare on basename::testid instead
    smoke = {s.split("/")[-1] for s in SMOKE_TESTS}
    for item in items:
        parts = item.nodeid.split("::", 1)
        key = os.path.basename(parts[0])
        if len(parts) > 1:
            key += "::" + parts[1]
        if key in smoke:
            item.add_marker(pytest.mark.smoke)
