"""STFT + convolution kernels: numerical correctness vs numpy references."""
import numpy as np
import pytest

import jax.numpy as jnp

from zorak_tpu.kernels import fir_conv, istft, partitioned_convolve, stft
from zorak_tpu.kernels.stft import spectral_gate, stft_process


class TestStft:
    def test_roundtrip_identity(self):
        x = np.random.RandomState(0).randn(10000)
        spec, meta = stft(jnp.asarray(x), size=1024, hop=256)
        y = np.asarray(istft(spec, meta))
        assert np.abs(y[1024:-1024] - x[1024:-1024]).max() < 2e-5

    def test_process_passthrough(self):
        x = np.random.RandomState(1).randn(6000)
        y = np.asarray(stft_process(jnp.asarray(x), lambda s: s, size=512))
        assert np.abs(y[512:-512] - x[512:-512]).max() < 2e-5

    def test_spectral_gate_denoises(self):
        rng = np.random.RandomState(2)
        n = 48000
        t = np.arange(n) / 48000.0
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)
        noise = rng.randn(n) * 0.01
        y = np.asarray(spectral_gate(jnp.asarray(tone + noise), size=2048))
        mid = slice(4096, -4096)
        err_before = np.abs((tone + noise) - tone)[mid].std()
        err_after = np.abs(y[mid] - tone[mid]).std()
        assert err_after < err_before * 0.7
        # the tone survives
        assert np.corrcoef(y[mid], tone[mid])[0, 1] > 0.99


class TestConvolution:
    def test_fir_matches_numpy(self):
        x = np.random.RandomState(3).randn(3000)
        taps = np.random.RandomState(4).randn(64)
        y = np.asarray(fir_conv(jnp.asarray(x), jnp.asarray(taps)))
        ref = np.convolve(x, taps)[:3000]
        assert np.abs(y - ref).max() < 1e-9

    @pytest.mark.parametrize("klen", [100, 2048, 10000])
    def test_partitioned_matches_numpy(self, klen):
        x = np.random.RandomState(5).randn(20000)
        ir = np.random.RandomState(6).randn(klen) * np.exp(
            -np.arange(klen) / (klen / 4))
        y = np.asarray(partitioned_convolve(jnp.asarray(x), jnp.asarray(ir),
                                            part_size=1024))
        ref = np.convolve(x, ir)[:20000]
        assert np.abs(y - ref).max() < 2e-5 * max(1.0, np.abs(ref).max())

    def test_partitioned_short_input(self):
        x = np.random.RandomState(7).randn(700)
        ir = np.random.RandomState(8).randn(300)
        y = np.asarray(partitioned_convolve(jnp.asarray(x), jnp.asarray(ir),
                                            part_size=256))
        ref = np.convolve(x, ir)[:700]
        assert np.abs(y - ref).max() < 2e-5 * max(1.0, np.abs(ref).max())
