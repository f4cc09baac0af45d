"""FFT-integrity utilities (muse_tpu/utils/fft_check.py)."""

import pytest

from muse_tpu.utils.fft_check import (fused_fft_ok, safe_lane_count,
                                      validate_fft_lanes)


def test_safe_lane_count_is_odd():
    assert safe_lane_count(16) == 17
    assert safe_lane_count(17) == 17
    assert safe_lane_count(128) == 129
    assert safe_lane_count(1) == 1


def test_safe_lane_count_mesh_rule():
    """Per-device shards must be odd under a mesh — the family that is
    broken on the measured TPU backend is exactly even per-device widths
    (e.g. 128/8 = 16)."""
    for b in (1, 7, 8, 16, 100, 128):
        for shards in (1, 2, 4, 8):
            w = safe_lane_count(b, shards)
            assert w >= b
            assert w % shards == 0
            assert (w // shards) % 2 == 1


def test_fused_fft_ok_on_cpu():
    """The CPU backend has no such bug; the checker must report OK (and
    on TPU this same call is how a platform is validated)."""
    assert fused_fft_ok(64, 16)
    assert fused_fft_ok(64, 17)


def test_validate_fft_lanes_passes_on_cpu():
    validate_fft_lanes(64, 17, 1)
    validate_fft_lanes(64, 24, 8)


def test_validate_fft_lanes_raises_on_broken_family(monkeypatch):
    """Simulate a backend where the chosen width is broken: the solvers'
    guard must fail loudly (silent miscompiles biased θ̂ by ~50σ)."""
    import muse_tpu.utils.fft_check as fc
    monkeypatch.setattr(fc, "fused_fft_ok", lambda n, b: b % 2 == 1)
    fc.validate_fft_lanes(64, 17, 1)          # odd per-device: ok
    with pytest.raises(RuntimeError, match="self-check FAILED"):
        fc.validate_fft_lanes(64, 16, 1)


def test_h_fd_pads_to_odd_per_device_width():
    """The h_fd-internal flattened sims·nθ·stencil batch must follow the
    same mesh-aware odd-per-device rule as every other lane padding
    (VERDICT r2 weak #3): nsims=4, nθ=1, stencil=2 → M=8, which on an
    8-device mesh must pad to 8 shards × odd, not to the odd TOTAL 9."""
    M = 4 * 1 * 2
    assert safe_lane_count(M, 1) == 9          # single device: odd total
    w = safe_lane_count(M, 8)
    assert w % 8 == 0 and (w // 8) % 2 == 1    # mesh: odd per device
