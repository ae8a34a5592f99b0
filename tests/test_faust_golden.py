"""Faust five vs their sequential NumPy goldens.

The goldens (models/faust_golden.py) transcribe the reference .dsp block
diagrams sample-by-sample; the JAX modules must null against them at the
audio epsilon (1e-5, f32-rounded), in default AND perturbed parameter
configurations — the stand-in for the reference's compiled-Faust oracle
(ref: src/FaustJuceProcessor.cpp:462-481).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from zorak_tpu.models import get_faust_module
from zorak_tpu.models.faust_golden import GOLDENS
from zorak_tpu.verify.nulltest import compare_audio

SR = 48000.0
T = 2500


def _input_for(mod, seed=7):
    rs = np.random.RandomState(seed)
    x = rs.randn(mod.n_in, T) * 0.25
    if mod.slug == "RED":
        # wet tail in 1/2, dry reference in 5/6 with silence gaps so the
        # dryA/offA switching paths all exercise
        x[4:] *= (np.arange(T) % 1200 < 700)
        x[:2] *= 0.5
    if mod.slug == "ClickBeGoneSG":
        # needle clicks on top of quiet texture
        x *= 0.05
        for pos in (400, 1100, 1900):
            x[:, pos] += 0.9
    return x


def _perturbed(mod):
    vals = {}
    for p in mod.params:
        v = p.lo + 0.37 * (p.hi - p.lo)
        if p.step >= 1.0:
            v = round(v)
        vals[p.name] = min(p.hi, max(p.lo, v))
    return vals


@pytest.mark.parametrize("slug", sorted(GOLDENS))
def test_faust_null_defaults(slug):
    mod = get_faust_module(slug)
    x = _input_for(mod)
    v = mod.values()
    y_jax = np.asarray(mod.render(jnp.asarray(x), v, SR))
    y_gold = GOLDENS[slug](x, v, SR)
    rep = compare_audio(y_gold, y_jax)
    assert rep.audio_passed, f"{slug}: {rep.summary()}"


@pytest.mark.parametrize("slug", sorted(GOLDENS))
def test_faust_null_perturbed(slug):
    mod = get_faust_module(slug)
    x = _input_for(mod, seed=11)
    v = mod.values(_perturbed(mod))
    y_jax = np.asarray(mod.render(jnp.asarray(x), v, SR))
    y_gold = GOLDENS[slug](x, v, SR)
    rep = compare_audio(y_gold, y_jax)
    assert rep.audio_passed, f"{slug}: {rep.summary()}"
