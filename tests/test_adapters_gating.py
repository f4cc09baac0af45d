"""Adapter import-gating (the Requires.@require analog,
src/MuseInference.jl:38-57): without numpyro installed the adapter module
imports cleanly and raises a helpful ImportError on use."""

import pytest


def test_numpyro_adapter_import_gated():
    from muse_tpu.adapters import numpyro_adapter as na
    if na.HAVE_NUMPYRO:
        pytest.skip("numpyro installed; gating path not applicable")
    with pytest.raises(ImportError, match="PPLMuseProblem"):
        na.NumpyroMuseProblem(lambda: None, observed={})
