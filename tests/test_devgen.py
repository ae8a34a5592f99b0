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
    # compare the plugin heap region only: the device vector carries
    # layout tails (gmem / midi-out / rand pool / the DUS trash cell)
    mem_size = dev.mem_size
    m = np.asarray(m)[:mem_size]
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


class TestPredicatedBranches:
    """If-conversion: traced branch arms run speculatively with
    predicate-masked heap writes (one scatter per write, no whole-heap
    merges).  Parity vs the golden is the contract; these cases pin the
    hazards predication introduces (garbage addresses / loop trips /
    while predicates in untaken arms, bulk ops under a predicate)."""

    def _both(self, body, n_blocks=4):
        return run_both("@init\nctr = 0;\n@block\nctr += 1;\n" + body)

    def test_traced_mem_writes_both_arms(self):
        assert_parity(*self._both("""
odd = ctr % 2;
odd ? (mem[10 + ctr] = ctr; tag = 1;)
    : (mem[40 + ctr] = -ctr; tag = 2;);
"""))

    def test_nested_branches(self):
        assert_parity(*self._both("""
a = ctr % 2; b = ctr % 3;
a ? (
  b ? mem[ctr] = 7 : (mem[ctr] = 9; u = ctr;);
  v = u + 1;
) : (
  b ? (w = w + 1; mem[100] = w;);
);
"""))

    def test_untaken_arm_garbage_address(self):
        # the untaken arm computes a wild address; the masked write must
        # drop it (index redirected out of bounds), leaving mem intact
        assert_parity(*self._both("""
neg = -(ctr % 2);
neg ? (j = neg * 987654321; j[0] = 5;) : (mem[3] = ctr;);
check = mem[3];
"""))

    def test_bulk_ops_under_predicate(self):
        assert_parity(*self._both("""
src = 200; dst = 300;
i = 0; loop(16, src[i] = ctr * 10 + i; i += 1;);
(ctr % 2) ? (
  memcpy(dst, src, 16);
  memset(400, ctr, 8);
);
probe = mem[300] + mem[407];
"""))

    def test_while_loop_in_untaken_arm(self):
        # while() inside an arm: the loop predicate must be masked by the
        # branch predicate or an untaken arm's garbage state spins forever
        assert_parity(*self._both("""
go = ctr % 2;
go ? (
  n = ctr * 3; i = 0; acc = 0;
  while (i < n) ( acc += i; i += 1; );
  mem[50] = acc;
) : (
  mem[60] = ctr;
);
"""))

    def test_dynamic_loop_in_arm(self):
        assert_parity(*self._both("""
k = ctr % 3;
k ? (
  i = 0;
  loop(k * 5, mem[70 + i] = i + ctr; i += 1;);
);
"""))

    def test_fft_under_predicate(self):
        assert_parity(*self._both("""
buf = 512;
i = 0; loop(64, buf[i] = sin(i * 0.3 + ctr); i += 1;);
(ctr % 2) ? (
  fft_real(buf, 64);
  fft_ipermute(buf, 32);
);
probe = mem[512] + mem[513];
"""))

    def test_value_of_branch_expression(self):
        assert_parity(*self._both("""
x = (ctr % 2) ? (mem[5] = ctr; ctr * 2.0) : (ctr - 1.0);
y = x + mem[5];
"""))

    def test_logical_ops_with_assigning_rhs(self):
        assert_parity(*self._both("""
a = (ctr % 2) && (t1 = ctr; mem[80] = t1; 1);
b = (ctr % 2) || (t2 = ctr * 3; mem[81] = t2; 0);
s = t1 + t2 + mem[80] + mem[81];
"""))
