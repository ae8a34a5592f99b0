"""Device-section executor (devgen) parity vs the golden shadow.

Every @block construct the fused block/sample pipeline supports must
produce the same vars/mem state as the host golden executor after N
blocks (same contract as the vector-engine null tests)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zorak_tpu.ir.program import compile_plugin_source
from zorak_tpu.lowering.devgen import (DeviceSection, DevgenError,
                                       section_dynamic_keys)
from zorak_tpu.shadow import compile_shadow
from zorak_tpu.verify import make_initialized_shadow


def run_both(src, n_blocks=3, mem_size=1 << 16, B=512):
    prog = compile_plugin_source(src)
    snap = make_initialized_shadow(prog, 48000.0).state
    dyn = section_dynamic_keys(prog, ("block", "sample"))
    dev = DeviceSection(prog, snap, "block", dyn, mem_size,
                        consts={"samplesblock": float(B)})
    v = jnp.asarray(dev.initial_vars())
    m = jnp.asarray(dev.initial_mem())
    step = jax.jit(dev.step)
    plug = compile_shadow(prog)
    plug.state = snap.clone()
    plug.state.samplesblock = float(B)
    for _ in range(n_blocks):
        v, m = step(v, m)
        plug.run_block()
    return dev, np.asarray(v), np.asarray(m), plug.state


def assert_parity(dev, v, m, st):
    mem_size = m.shape[0]
    for key, slot in dev.slots.items():
        if key[0] != "var":
            continue
        g = st.V.get(key[1], 0.0)
        d = float(v[slot])
        ok = abs(g - d) <= 1e-9 + 1e-9 * abs(g) or (np.isnan(g)
                                                    and np.isnan(d))
        assert ok, (key, g, d)
    mg = np.zeros(mem_size)
    n = min(len(st.mem), mem_size)
    mg[:n] = st.mem[:n]
    assert np.abs(mg - m).max() <= 1e-9


def test_math_and_state():
    assert_parity(*run_both("""
@init
a = 1; t = 0;
@block
t += samplesblock;
a = a * 0.9 + 0.1;
b = sin(a) + max(t, 3) + (t > 1000 ? 7 : 2);
"""))


def test_loops_and_mem():
    assert_parity(*run_both("""
@init
base = 100;
@block
i = 0;
loop(37, base[i] = i*2 + k; i += 1;);
k += 1;
acc = 0; j = 0;
while(j < 37) ( acc += base[j]; j += 2; );
"""))


def test_branches_and_instance_fns():
    assert_parity(*run_both("""
@init
function env(x) instance(z) ( z = z*0.5 + x; z );
@block
m1.env(cnt); m2.env(cnt*2);
cnt += 1;
cnt > 2 ? ( flip = !flip; memset(50, cnt, 20); ) : ( other = cnt/3; );
"""))


def test_fft_roundtrip():
    assert_parity(*run_both("""
@init
FS = 1024; buf = 4096;
i = 0; loop(2*FS, buf[i] = 0; i += 1;);
buf[6] = 1; buf[33] = 0.5;
@block
fft(buf, FS);
fft_permute(buf, FS);
g = buf[9];
fft_ipermute(buf, FS);
ifft(buf, FS);
i = 0; loop(2*FS, buf[i] = buf[i] / FS; i += 1;);
""", n_blocks=2))


def test_fft_real_roundtrip():
    assert_parity(*run_both("""
@init
N = 512; buf = 8192;
i = 0; loop(N, buf[i] = sin(i*0.1) + 0.2*i/N; i += 1;);
@block
fft_real(buf, N);
fft_permute(buf, N/2);
q = buf[3];
fft_ipermute(buf, N/2);
ifft_real(buf, N);
i = 0; loop(N, buf[i] = buf[i] * 0.5 / N; i += 1;);
""", n_blocks=2))


def test_convolve_c():
    assert_parity(*run_both("""
@init
N = 64; a = 1000; b = 2000;
i = 0; loop(2*N, a[i] = sin(i*.3); b[i] = cos(i*.2); i += 1;);
@block
convolve_c(a, b, N);
chk = a[5] + a[77];
""", n_blocks=1, mem_size=1 << 14))


def test_forbidden_builtins_raise():
    # midisend is staged now; rand() remains host-only
    prog = compile_plugin_source("@block\nx = rand(4);\n")
    snap = make_initialized_shadow(prog, 48000.0).state
    with pytest.raises(DevgenError):
        DeviceSection(prog, snap, "block",
                      section_dynamic_keys(prog, ("block",)), 1 << 12)


class TestElementwiseVectorization:
    """Unit-step elementwise loops (addbuf/overlap-add shape) vectorize to
    slices; static-predicate whiles unroll at trace time and the static
    overlay survives loops that never write a slot."""

    def test_addbuf_shape_matches_golden(self):
        src = """@init
A = 0; B = 256; N = 128;
i = 0;
while (i < N) ( A[i] = i * 0.5; B[i] = 1 + i; i += 1; );
@block
i = 0;
while (i < N) ( A[i] += B[i] * 0.25; i += 1; );
k = i;
@sample
spl0 = spl0;
"""
        prog = compile_plugin_source(src)
        sh = make_initialized_shadow(prog)
        dyn = section_dynamic_keys(prog, ("block", "sample"))
        dev = DeviceSection(prog, sh.state, "block", dyn, 1 << 12,
                            consts={"samplesblock": 64.0})
        import jax.numpy as jnp
        v, m = dev.step(jnp.asarray(dev.initial_vars()),
                        jnp.asarray(dev.initial_mem()))
        m = np.asarray(m)
        i = np.arange(128)
        assert np.allclose(m[:128], i * 0.5 + (1 + i) * 0.25)
        assert float(v[dev.slots[("var", "k")]]) == 128.0

    def test_two_buffer_overlap_add(self):
        # the hop epilogue shape: wet[i] = ov[i] + acc[i]*sc; ov[i] = acc[i+P]*sc
        src = """@init
ACC = 0; OV = 512; WET = 768; P = 200;
i = 0;
while (i < 2*P) ( ACC[i] = i + 1; i += 1; );
i = 0;
while (i < P) ( OV[i] = 1000 + i; i += 1; );
@block
sc = 0.5;
i = 0;
while (i < P) (
  WET[i] = OV[i] + ACC[i] * sc;
  OV[i] = ACC[i + P] * sc;
  i += 1;
);
@sample
spl0 = spl0;
"""
        prog = compile_plugin_source(src)
        sh = make_initialized_shadow(prog)
        dyn = section_dynamic_keys(prog, ("block", "sample"))
        dev = DeviceSection(prog, sh.state, "block", dyn, 1 << 11,
                            consts={"samplesblock": 64.0})
        import jax.numpy as jnp
        _, m = dev.step(jnp.asarray(dev.initial_vars()),
                        jnp.asarray(dev.initial_mem()))
        m = np.asarray(m)
        i = np.arange(200)
        assert np.allclose(m[768:968], (1000 + i) + (i + 1) * 0.5)
        assert np.allclose(m[512:712], (i + 200 + 1) * 0.5)

    def test_cross_iteration_recurrence_not_vectorized(self):
        # y[i] = y[i-1] + x[i]: must still match the golden (falls back)
        src = """@init
X = 0; Y = 300; N = 64;
i = 0;
while (i < N) ( X[i] = i; i += 1; );
Y[0] = 0;
@block
i = 1;
while (i < N) ( Y[i] = Y[i - 1] + X[i]; i += 1; );
@sample
spl0 = spl0;
"""
        prog = compile_plugin_source(src)
        sh = make_initialized_shadow(prog)
        dyn = section_dynamic_keys(prog, ("block", "sample"))
        dev = DeviceSection(prog, sh.state, "block", dyn, 1 << 10,
                            consts={"samplesblock": 64.0})
        import jax.numpy as jnp
        _, m = dev.step(jnp.asarray(dev.initial_vars()),
                        jnp.asarray(dev.initial_mem()))
        m = np.asarray(m)
        assert np.allclose(m[300:364], np.cumsum(np.arange(64)))

    def test_static_while_unroll_keeps_handle_static(self):
        # a slot consulted after a loop that never writes it stays static
        # (the PsychoConvolver file_close(h)-after-resample shape)
        src = """@init
T = 0;
@block
h = 3;
n = 100;
i = 0;
while (i < n) ( T[i] = spl_probe + i; i += 1; );
hh = h * 2;
@sample
spl_probe = spl0;
spl0 = spl0;
"""
        prog = compile_plugin_source(src)
        sh = make_initialized_shadow(prog)
        dyn = section_dynamic_keys(prog, ("block", "sample"))
        dev = DeviceSection(prog, sh.state, "block", dyn, 1 << 10,
                            consts={"samplesblock": 64.0})
        import jax.numpy as jnp
        v, _ = dev.step(jnp.asarray(dev.initial_vars()),
                        jnp.asarray(dev.initial_mem()))
        assert float(v[dev.slots[("var", "hh")]]) == 6.0
