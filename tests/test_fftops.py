"""FFT builtin tests, including bit-level comparison against a WDL oracle
compiled on the fly from the reference's vendored fft.c (skipped if the
reference checkout or toolchain is unavailable)."""
import ctypes
import subprocess
from pathlib import Path

import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.runtime import fftops
from zorak_tpu.shadow import compile_shadow

ORACLE_SRC = Path("/root/reference/src/WDL/fft.c")
ORACLE_SO = Path("/tmp/wdl_oracle/wdlfft.so")


@pytest.fixture(scope="session")
def wdl():
    if not ORACLE_SRC.exists():
        pytest.skip("reference WDL not available")
    if not ORACLE_SO.exists():
        ORACLE_SO.parent.mkdir(parents=True, exist_ok=True)
        r = subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared", "-DWDL_FFT_REALSIZE=8",
             "-o", str(ORACLE_SO), "-x", "c", str(ORACLE_SRC)],
            capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[:200]}")
    lib = ctypes.CDLL(str(ORACLE_SO))
    lib.WDL_fft_init()
    lib.WDL_fft_permute_tab.restype = ctypes.POINTER(ctypes.c_int)
    return lib


def oracle_perm(lib, n):
    p = lib.WDL_fft_permute_tab(n)
    return np.array([p[i] for i in range(n)])


def oracle_fft(lib, x, inverse):
    c = np.ascontiguousarray(
        np.stack([x.real, x.imag], -1).reshape(-1), dtype=np.float64)
    lib.WDL_fft(c.ctypes.data_as(ctypes.c_void_p), len(x), inverse)
    pairs = c.reshape(-1, 2)
    return pairs[:, 0] + 1j * pairs[:, 1]


def oracle_real_fft(lib, x, inverse):
    c = np.ascontiguousarray(x, dtype=np.float64).copy()
    lib.WDL_real_fft(c.ctypes.data_as(ctypes.c_void_p), len(x), inverse)
    return c


class TestAgainstOracle:
    @pytest.mark.parametrize("n", [16, 64, 256, 1024, 4096])
    def test_perm_tables(self, wdl, n):
        assert np.array_equal(fftops.perm_table(n), oracle_perm(wdl, n))

    @pytest.mark.parametrize("n", [16, 128, 2048])
    def test_complex_fft_matches(self, wdl, n):
        rng = np.random.RandomState(n)
        x = rng.randn(n) + 1j * rng.randn(n)
        want = oracle_fft(wdl, x, 0)
        spec = np.fft.fft(x)
        got = np.empty(n, dtype=np.complex128)
        got[fftops.perm_table(n)] = spec
        assert np.abs(got - want).max() < 1e-9 * max(1.0, np.abs(want).max())

    @pytest.mark.parametrize("n", [16, 128, 2048])
    def test_complex_ifft_matches(self, wdl, n):
        rng = np.random.RandomState(n + 1)
        X = rng.randn(n) + 1j * rng.randn(n)
        want = oracle_fft(wdl, X, 1)
        spec = X[fftops.perm_table(n)]
        got = np.fft.ifft(spec) * n
        assert np.abs(got - want).max() < 1e-9 * max(1.0, np.abs(want).max())

    @pytest.mark.parametrize("n", [16, 256, 1024])
    def test_real_fft_matches(self, wdl, n):
        rng = np.random.RandomState(n + 2)
        x = rng.randn(n)
        want = oracle_real_fft(wdl, x, 0)
        half = n // 2
        R = np.fft.rfft(x) * 2.0
        nat = np.empty(half, dtype=np.complex128)
        nat[0] = complex(R[0].real, R[half].real)
        nat[1:] = R[1:half]
        got = np.empty(half, dtype=np.complex128)
        got[fftops.perm_table(half)] = nat
        inter = np.stack([got.real, got.imag], -1).reshape(-1)
        assert np.abs(inter - want).max() < 1e-9 * max(1.0, np.abs(want).max())

    @pytest.mark.parametrize("n", [16, 256, 1024])
    def test_real_ifft_matches(self, wdl, n):
        rng = np.random.RandomState(n + 3)
        packed = rng.randn(n)
        want = oracle_real_fft(wdl, packed.copy(), 1)
        half = n // 2
        pairs = packed.reshape(-1, 2)
        wdl_bins = pairs[:, 0] + 1j * pairs[:, 1]
        nat = wdl_bins[fftops.perm_table(half)]
        R = np.empty(half + 1, dtype=np.complex128)
        R[0] = nat[0].real / 2.0
        R[half] = nat[0].imag / 2.0
        R[1:half] = nat[1:] / 2.0
        got = np.fft.irfft(R, n) * (2.0 * n)
        assert np.abs(got - want).max() < 1e-8 * max(1.0, np.abs(want).max())


class TestInShadow:
    def run(self, src):
        p = compile_shadow(compile_plugin_source(src))
        p.run_init()
        return p

    def test_fft_roundtrip_scaled(self):
        src = ("@init\n"
               "n = 64;\n"
               "i = 0; loop(n, mem[2*i] = sin(i*0.37); mem[2*i+1] = 0; i += 1;);\n"
               "fft(0, n);\nifft(0, n);\n"
               "err = 0; i = 0;\n"
               "loop(n, err = max(err, abs(mem[2*i]/n - sin(i*0.37))); i += 1;);\n")
        p = self.run(src)
        assert p.state.V["err"] < 1e-12

    def test_fft_permute_roundtrip(self):
        src = ("@init\n"
               "n = 32;\n"
               "i = 0; loop(2*n, mem[i] = i*0.01; i += 1;);\n"
               "memcpy(1000, 0, 2*n);\n"
               "fft_permute(0, n);\nfft_ipermute(0, n);\n"
               "err = 0; i = 0;\n"
               "loop(2*n, err = max(err, abs(mem[i] - mem[1000+i])); i += 1;);\n")
        p = self.run(src)
        assert p.state.V["err"] == 0.0

    def test_convolution_identity_complex(self):
        # convolving with a unit-impulse IR must reproduce the signal
        # (complex fft of a delta is all-ones, so convolve_c is identity)
        src = ("@init\n"
               "n = 64;\n"
               "sig = 0; ir = 4096;\n"
               "i = 0; loop(n, sig[2*i] = cos(i*0.21); sig[2*i+1] = 0; i += 1;);\n"
               "ir[0] = 1; ir[1] = 0;\n"  # complex delta
               "fft(sig, n);\n"
               "fft(ir, n);\n"
               "convolve_c(sig, ir, n);\n"
               "ifft(sig, n);\n"
               "err = 0; i = 0;\n"
               "loop(n, err = max(err, abs(sig[2*i]/n - cos(i*0.21))); i += 1;);\n")
        p = self.run(src)
        assert p.state.V["err"] < 1e-10

    def test_real_fft_convolve_matches_reference_quirk(self):
        # fft_real packs (DC, Nyq) into bin 0; convolve_c multiplies it as a
        # complex pair (same as the reference runtime + EEL2 — no special
        # case, ref: src/JSFXJuceProcessor.cpp:1341-1385, WDL eel_fft.h).
        n = 64
        half = n // 2
        rng = np.random.RandomState(5)
        sig = rng.randn(half)
        ir = np.zeros(half)
        ir[0] = 1.0

        src = ("@init\nn = 64;\nsig = 0; ir = 4096;\n"
               + "".join(f"sig[{i}] = {float(v)!r};\n" for i, v in enumerate(sig))
               + "ir[0] = 1;\n"
               "fft_real(sig, n);\nfft_real(ir, n);\n"
               "convolve_c(sig, ir, n/2);\n"
               "ifft_real(sig, n);\n")
        p = self.run(src)
        got = np.array([p.state.mem[i] for i in range(half)])

        # numpy emulation of the same quirky pipeline
        def packed(x):
            R = np.fft.rfft(x, n) * 2.0
            b = np.empty(half, np.complex128)
            b[0] = complex(R[0].real, R[half].real)
            b[1:] = R[1:half]
            return b

        prod = packed(sig) * packed(ir)
        R = np.empty(half + 1, np.complex128)
        R[0] = prod[0].real / 2.0
        R[half] = prod[0].imag / 2.0
        R[1:half] = prod[1:] / 2.0
        want = np.fft.irfft(R, n) * (2.0 * n)
        assert np.abs(got - want[:half]).max() < 1e-9

    def test_invalid_sizes_are_noops(self):
        src = ("@init\nmem[0] = 5;\nfft(0, 12);\nfft(0, 65536);\na = mem[0];\n")
        p = self.run(src)
        assert p.state.V["a"] == 5.0
