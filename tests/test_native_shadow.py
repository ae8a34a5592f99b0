"""Native (C-compiled) golden executor: must agree bit-for-bit with the
Python shadow — two independent implementations of the same numeric
contract, plus it is the fast path for long golden renders."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.shadow import compile_native_shadow, compile_shadow
from zorak_tpu.verify import apply_slider_state


def both(src_or_prog, srate=48000.0):
    prog = (src_or_prog if not isinstance(src_or_prog, str)
            else compile_plugin_source(src_or_prog))
    a = compile_shadow(prog)
    b = compile_native_shadow(prog)
    for p in (a, b):
        p.state.srate = srate
        apply_slider_state(p.state, prog)
        p.run_init()
        p.run_slider()
    return prog, a, b


def check_state_equal(a, b, where=""):
    for name, va in a.state.V.items():
        vb = b.state.V[name]
        if va != vb and not (va != va and vb != vb):
            raise AssertionError(f"{where}: var {name}: py={va!r} c={vb!r}")
    for i in range(64):
        if a.state.spl[i] != b.state.spl[i]:
            raise AssertionError(f"{where}: spl{i} differs")
        if a.state.sliders[i] != b.state.sliders[i]:
            raise AssertionError(f"{where}: slider{i+1} differs")


class TestSemanticsParity:
    CASES = [
        "@init\na = 7.9|0; b = -7.9|0; c = 1<<33; d = -8>>1; e = 7%3; f = -7%3;\n",
        "@init\na = 2^10; b = 1/0; c = 0/0; d = (-8)^(1/3); e = log(0);\n",
        "@init\nx=0; v = loop(5, x += 2); y = 0 ? 9; z = (1 && 0) || 3;\n",
        "@init\nbuf=100; buf[5]=42; a=mem[105]; mem[-3]=7; b=mem[0]; c=buf[4.999999];\n",
        "@init\nmemset(10, 3.5, 4); memcpy(20, 10, 4); s = mem[20]+mem[23]+mem[24];\n",
        "@init\na = rand(1); b = rand(1); c = rand(100);\n",
        "@init\ny = invsqrt(4); z = invsqrt(0.3);\n",
        "@init\nfunction f(x) local(n) ( n += x; n );\na = f(2); b = f(3);\n",
        "@init\nfunction lp(x) instance(z) ( z = 0.9*z + 0.1*x; z );\n"
        "a = u.lp(1); b = v.lp(2); c = u.lp(1);\n",
        "@init\ni=0; while(i < 10) ( i += 3; );\nq = (1; 2; 3);\n",
        "@init\nslider(3) = 0.5; x = slider(3); spl(2) = 0.25; z = spl(2);\n",
        '@init\nh = "hello"; n = strlen(h); c = str_getchar(h, 1);\n',
        "@init\nsliderchange(slider2); slider_show(slider1, 0);\n"
        "v = slider_show(slider1);\n",
        "@init\nn = 64; i = 0;\nloop(n, mem[2*i] = sin(i*0.37); mem[2*i+1]=0; i+=1;);\n"
        "fft(0, n); fft_permute(0, n); fft_ipermute(0, n); ifft(0, n);\n"
        "chk = mem[10];\n",
    ]

    @pytest.mark.parametrize("idx", range(len(CASES)))
    def test_case(self, idx):
        src = self.CASES[idx]
        _, a, b = both(src)
        check_state_equal(a, b, f"case {idx}")


class TestProcessParity:
    def test_gain_and_block(self):
        src = ("@slider\ng = slider1;\n@block\nn = samplesblock;\n"
               "@sample\nspl0 = spl0*g + 0.001*n;\nspl1 *= g;\n")
        prog, a, b = both(src)
        a.state.sliders[0] = b.state.sliders[0] = 0.5
        a.run_slider()
        b.run_slider()
        x = np.random.RandomState(0).randn(2, 256).astype(np.float32)
        ya = np.zeros_like(x)
        yb = np.zeros_like(x)
        a.process_block(x, ya)
        b.process_block(x, yb)
        assert np.array_equal(ya, yb)
        check_state_equal(a, b, "gain")

    CATALOG = [
        "Spatialization/DDT/src/DDT.jsfx",
        "Dynamics/ATTACK/src/ATTACK.jsfx",
        "Dynamics/EasyExpander/src/EasyExpander.jsfx",
        "Ambience/ADS/src/ADS.jsfx",
        "Spectral/ERBTilt/src/ERB Tilt.jsfx",
        "Spectral/SpectralStabilizer/src/Spectral Stabilizer.jsfx",
        "Spatialization/DPT/src/DPT.jsfx",
        "Spatialization/Roomalizer/src/Roomalizer.jsfx",
        "Spectral/BedRock/src/BedRock.jsfx",
    ]

    @pytest.mark.parametrize("rel", CATALOG)
    def test_catalog_bit_exact(self, reference_plugins, rel):
        prog = load_plugin_file(reference_plugins / rel)
        _, a, b = both(prog)
        ch = prog.io_channels["process"]
        n = 512
        x = (np.random.RandomState(3).randn(ch, n) * 0.25).astype(np.float32)
        ya = np.zeros_like(x)
        yb = np.zeros_like(x)
        for s in range(0, n, 128):
            a.process_block(x[:, s:s + 128], ya[:, s:s + 128])
            b.process_block(x[:, s:s + 128], yb[:, s:s + 128])
        assert np.array_equal(ya, yb), rel
        check_state_equal(a, b, rel)

    def test_native_is_fast(self, reference_plugins):
        import time
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        b = compile_native_shadow(prog)
        b.state.srate = 48000.0
        apply_slider_state(b.state, prog)
        b.run_init()
        b.run_slider()
        n = 48000
        x = (np.random.RandomState(1).randn(2, n) * 0.25).astype(np.float32)
        y = np.zeros_like(x)
        t0 = time.perf_counter()
        b.process_block(x, y)
        dt = time.perf_counter() - t0
        # 1s of audio through the native golden in well under a second
        assert dt < 1.0, f"native shadow too slow: {dt:.2f}s"
