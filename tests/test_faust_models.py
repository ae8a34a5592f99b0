"""Faust-family JAX modules: analytic/structural correctness checks.

No Faust compiler exists in this environment, so these tests verify the
DSP math directly: gain laws, latency alignment, neutral-setting
transparency, detector behavior, and determinism.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from zorak_tpu.models import FAUST_MODULES, get_faust_module
from zorak_tpu.models import dspkit as K

SR = 48000.0


def noise(ch, n, seed=0, scale=0.25):
    return np.random.RandomState(seed).randn(ch, n) * scale


class TestDspKit:
    def test_onepole_matches_sequential(self):
        x = np.random.RandomState(1).randn(400)
        pole = 0.98
        y = np.asarray(K.onepole(jnp.asarray(x), pole))
        z = 0.0
        ref = np.empty_like(x)
        for i, xi in enumerate(x):
            z = (1 - pole) * xi + pole * z
            ref[i] = z
        assert np.abs(y - ref).max() < 1e-12

    def test_max_follower_matches_sequential(self):
        x = np.abs(np.random.RandomState(2).randn(400))
        rel = 0.95
        y = np.asarray(K.max_follower(jnp.asarray(x), rel))
        z = 0.0
        ref = np.empty_like(x)
        for i, xi in enumerate(x):
            z = max(xi, rel * z)
            ref[i] = z
        assert np.abs(y - ref).max() < 1e-12

    def test_switching_onepole_matches_sequential(self):
        x = np.random.RandomState(3).randn(300)
        up, dn = 0.7, 0.99
        y = np.asarray(K.switching_onepole(jnp.asarray(x), up, dn))
        z = 0.0
        ref = np.empty_like(x)
        for i, xi in enumerate(x):
            pole = up if xi > z else dn
            z = xi + (z - xi) * pole
            ref[i] = z
        assert np.abs(y - ref).max() < 1e-12

    def test_biquad_matches_sequential(self):
        b0, b1, b2, a1, a2 = [float(c) for c in
                              K.rbj_coeffs("lp", 2000.0, 0.707, SR)]
        x = np.random.RandomState(4).randn(500)
        y = np.asarray(K.biquad_tf2(jnp.asarray(x), b0, b1, b2, a1, a2))
        s1 = s2 = 0.0
        ref = np.empty_like(x)
        for i, xi in enumerate(x):
            yi = b0 * xi + s1
            s1 = b1 * xi - a1 * yi + s2
            s2 = b2 * xi - a2 * yi
            ref[i] = yi
        assert np.abs(y - ref).max() < 1e-9

    def test_fir_causal(self):
        x = np.zeros(64)
        x[10] = 1.0
        taps = np.array([0.5, 0.25, 0.125])
        y = np.asarray(K.fir(jnp.asarray(x), taps))
        assert y[10] == 0.5 and y[11] == 0.25 and y[12] == 0.125
        assert np.all(y[:10] == 0)

    def test_gaussian_kernel_normalized(self):
        taps = np.asarray(K.gaussian_fir_taps(24.0, 128))
        assert abs(taps.sum() - 1.0) < 1e-12
        assert taps[128] == taps.max()
        assert np.allclose(taps, taps[::-1])

    def test_lcg_noise_range_and_determinism(self):
        a = np.asarray(K.lcg_noise(1000, seed=7))
        b = np.asarray(K.lcg_noise(1000, seed=7))
        assert np.array_equal(a, b)
        assert np.all(np.abs(a) <= 1.0)
        assert a.std() > 0.3


class TestGTS:
    def test_neutral_settings_are_transparent(self):
        m = get_faust_module("GTS")
        x = jnp.asarray(noise(2, 4000))
        v = m.values()  # 0 dB attack/sustain, mix 1 -> shaped == aligned
        y = np.asarray(m.render(x, v, SR))
        aligned = np.asarray(K.delay(x, 128))
        assert np.abs(y - aligned).max() < 1e-9

    def test_attack_boost_sharpens_transient(self):
        m = get_faust_module("GTS")
        x = np.zeros((2, 4000))
        x[:, 1000] = 1.0
        y = np.asarray(m.render(jnp.asarray(x), m.values({"attack_db": 12.0}), SR))
        base = np.asarray(m.render(jnp.asarray(x), m.values(), SR))
        assert np.abs(y[:, 1128]).max() > np.abs(base[:, 1128]).max()

    def test_latency_metadata(self):
        assert get_faust_module("GTS").latency_frames == 128


class TestModTilt:
    def test_zero_tilt_near_transparent_steady_state(self):
        m = get_faust_module("ModTilt")
        x = jnp.asarray(noise(2, 48000, seed=5))
        y = np.asarray(m.render(x, m.values({"tilt_db": 0.0}), SR))
        # with tilt 0 the ratio path is identity up to trim; output finite
        # and close to input after the detector settles
        assert np.all(np.isfinite(y))
        tail = slice(24000, None)
        num = np.abs(y[:, tail] - np.asarray(x)[:, tail]).mean()
        den = np.abs(np.asarray(x)[:, tail]).mean()
        assert num / den < 0.2

    def test_tilt_changes_output(self):
        m = get_faust_module("ModTilt")
        x = jnp.asarray(noise(2, 24000, seed=6))
        y0 = np.asarray(m.render(x, m.values({"tilt_db": 0.0}), SR))
        y1 = np.asarray(m.render(x, m.values({"tilt_db": 3.0}), SR))
        assert not np.allclose(y0, y1)


class TestRED:
    def test_pass_through_channels(self):
        m = get_faust_module("RED")
        x = jnp.asarray(noise(6, 8000, seed=7))
        y = np.asarray(m.render(x, m.values(), SR))
        assert np.array_equal(y[2], np.asarray(x)[2])
        assert np.array_equal(y[4], np.asarray(x)[4])

    def test_ducks_wet_when_wet_louder_than_ref(self):
        m = get_faust_module("RED")
        n = 48000
        x = np.zeros((6, n))
        x[0] = x[1] = noise(1, n, seed=8, scale=0.5)[0]   # loud wet
        x[4] = x[5] = noise(1, n, seed=9, scale=0.005)[0]  # quiet ref
        y = np.asarray(m.render(jnp.asarray(x), m.values({"sens_pct": 90.0}), SR))
        tail = slice(24000, None)
        assert np.abs(y[0, tail]).mean() < np.abs(x[0, tail]).mean() * 0.9

    def test_no_duck_when_ref_loud(self):
        m = get_faust_module("RED")
        n = 24000
        x = np.zeros((6, n))
        x[0] = x[1] = noise(1, n, seed=10, scale=0.02)[0]
        x[4] = x[5] = noise(1, n, seed=11, scale=0.5)[0]
        y = np.asarray(m.render(jnp.asarray(x), m.values(), SR))
        tail = slice(12000, None)
        ratio = np.abs(y[0, tail]).mean() / np.abs(x[0, tail]).mean()
        assert ratio > 0.95


class TestClickBeGone:
    def test_click_is_attenuated(self):
        m = get_faust_module("ClickBeGoneSG")
        n = 9600
        rng = np.random.RandomState(12)
        base = np.cumsum(rng.randn(n)) * 0.001  # smooth-ish signal
        x = np.stack([base, base])
        xc = x.copy()
        xc[:, 5000] += 0.9  # needle click
        v = m.values({"amount": 100.0, "sensitivity": 90.0})
        y_click = np.asarray(m.render(jnp.asarray(xc), v, SR))
        # output at the click position (delayed by 15) is closer to the
        # clean signal than the clicked input was
        pos = 5015
        clean_val = base[5000]
        assert abs(y_click[0, pos] - clean_val) < 0.5 * abs(xc[0, 5000] - clean_val)

    def test_monitor_delta(self):
        m = get_faust_module("ClickBeGoneSG")
        x = jnp.asarray(noise(2, 4000, seed=13))
        y_out = np.asarray(m.render(x, m.values(), SR))
        y_delta = np.asarray(m.render(x, m.values({"monitor": 1.0}), SR))
        aligned = np.asarray(K.delay(x, 15))
        assert np.abs((y_out - aligned) - y_delta).max() < 1e-12


class TestVAR:
    def test_finite_and_adds_hf_on_bright_signal(self):
        m = get_faust_module("VAR")
        n = 24000
        t = np.arange(n) / SR
        bright = 0.2 * np.sin(2 * np.pi * 9500 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
        x = np.stack([bright, bright])
        y = np.asarray(m.render(jnp.asarray(x), m.values({"air_amount": 100.0}), SR))
        assert np.all(np.isfinite(y))
        assert not np.allclose(y, x)

    def test_amount_zero_is_transparent(self):
        m = get_faust_module("VAR")
        x = jnp.asarray(noise(2, 8000, seed=14))
        y = np.asarray(m.render(x, m.values({"air_amount": 0.0}), SR))
        assert np.abs(y - np.asarray(x)).max() < 1e-9


class TestRegistry:
    def test_all_five_present(self):
        assert set(FAUST_MODULES) == {"GTS", "ModTilt", "RED", "ClickBeGoneSG", "VAR"}

    def test_matches_catalog_slugs(self, reference_root):
        from zorak_tpu.catalog import discover
        specs = discover(reference_root)
        faust_slugs = {s.slug for s in specs if s.plugin_type == "faust"}
        assert faust_slugs == set(FAUST_MODULES)
