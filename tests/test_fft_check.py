"""FFT-integrity utilities (muse_tpu/utils/fft_check.py)."""

from muse_tpu.utils.fft_check import fused_fft_ok, safe_lane_count


def test_safe_lane_count_is_odd():
    assert safe_lane_count(16) == 17
    assert safe_lane_count(17) == 17
    assert safe_lane_count(128) == 129
    assert safe_lane_count(1) == 1


def test_fused_fft_ok_on_cpu():
    """The CPU backend has no such bug; the checker must report OK (and
    on TPU this same call is how a platform is validated)."""
    assert fused_fft_ok(64, 16)
    assert fused_fft_ok(64, 17)
