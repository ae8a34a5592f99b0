"""Pallas switching-scan kernel vs the lax.scan reference (interpret mode
on CPU; the real-TPU path is exercised by benchmarks/suite.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from zorak_tpu.kernels.pallas_scan import switching_onepole_pallas
from zorak_tpu.models import dspkit as K


class TestPallasSwitchingScan:
    def test_matches_lax_scan(self):
        x = np.random.RandomState(0).randn(2, 3000).astype(np.float32)
        up, dn = 0.6, 0.995
        ref = np.asarray(K.switching_onepole(jnp.asarray(x, jnp.float32),
                                             up, dn))
        got = np.asarray(switching_onepole_pallas(jnp.asarray(x), up, dn,
                                                  interpret=True))
        assert np.abs(ref - got).max() < 1e-5

    def test_single_lane(self):
        x = np.abs(np.random.RandomState(1).randn(500)).astype(np.float32)
        ref = np.asarray(K.switching_onepole(jnp.asarray(x, jnp.float32),
                                             0.5, 0.99))
        got = np.asarray(switching_onepole_pallas(jnp.asarray(x), 0.5, 0.99,
                                                  interpret=True))
        assert np.abs(ref - got).max() < 1e-5

    def test_chunk_boundary_carry(self):
        # T not a multiple of the chunk: carry must survive grid steps
        x = np.random.RandomState(2).randn(2500).astype(np.float32)
        ref = np.asarray(K.switching_onepole(jnp.asarray(x, jnp.float32),
                                             0.7, 0.98))
        got = np.asarray(switching_onepole_pallas(jnp.asarray(x), 0.7, 0.98,
                                                  interpret=True))
        assert np.abs(ref - got).max() < 1e-5
