"""@gfx interpreter: DrawCmd recording, state sync, catalog smoke."""
import numpy as np
import pytest

from zorak_tpu.gfx import DrawCmd, GfxSession, GfxVM
from zorak_tpu.ir.program import compile_plugin_source
from zorak_tpu.verify import make_initialized_shadow


def test_records_draw_commands_with_color():
    src = """
@init
x = 0;
@gfx 400 300
gfx_set(1, 0.5, 0.25, 0.8);
gfx_rect(10, 20, 100, 50);
gfx_x = 5; gfx_y = 6;
gfx_lineto(50, 60);
"""
    vm = GfxVM(compile_plugin_source(src))
    cmds = vm.run_frame()
    assert [c.op for c in cmds] == ["rect", "line"]
    assert cmds[0].args[:4] == (10.0, 20.0, 100.0, 50.0)
    assert cmds[0].color == (1.0, 0.5, 0.25, 0.8)
    assert cmds[1].args == (5.0, 6.0, 50.0, 60.0, 1.0)
    # lineto advanced the pen
    assert vm.state.V["gfx_x"] == 50.0 and vm.state.V["gfx_y"] == 60.0
    assert vm.width == 400.0 and vm.height == 300.0


def test_text_measure_and_draw():
    src = """
@gfx
gfx_x = 10; gfx_y = 4;
gfx_measurestr("hello", tw, th);
gfx_drawstr("hello");
after_x = gfx_x;
"""
    vm = GfxVM(compile_plugin_source(src))
    cmds = vm.run_frame()
    assert cmds[0].op == "drawstr" and cmds[0].text == "hello"
    from zorak_tpu.gfx.interpreter import text_width

    # proportional per-glyph advance at the default font size (the
    # reference measures real JUCE font metrics; flat monospace was the
    # round-1 estimate)
    expect = text_width("hello", vm.state.V.get("gfx_texth", 10.0) or 10.0)
    assert vm.state.V["tw"] == pytest.approx(expect)
    assert vm.state.V["after_x"] == pytest.approx(10.0 + expect)


def test_mouse_and_frames_are_stateful():
    src = """
@gfx
mouse_cap ? clicks += 1;
gfx_circle(mouse_x, mouse_y, 5, 1);
"""
    vm = GfxVM(compile_plugin_source(src))
    vm.run_frame(mouse=(10, 11, 0))
    vm.run_frame(mouse=(12, 13, 1))
    cmds = vm.run_frame(mouse=(14, 15, 1))
    assert vm.state.V["clicks"] == 2.0
    assert cmds[0].args[:2] == (14.0, 15.0)


def test_session_var_sync_both_directions():
    src = """
@slider
gain = slider1;
@sample
meter = max(meter, abs(spl0 * gain));
spl0 = spl0 * ui_gain;
@gfx
gfx_rect(0, 0, meter * 100, 10);
ui_gain = 0.5;
"""
    prog = compile_plugin_source(src)
    st = make_initialized_shadow(prog).state
    st.V["meter"] = 0.75
    sess = GfxSession(prog)
    assert "meter" in sess.to_gfx
    assert "ui_gain" in sess.from_gfx
    cmds, writes = sess.frame(st)
    assert cmds[0].args[2] == 75.0  # meter flowed DSP -> UI
    assert writes == {"ui_gain": 0.5}
    sess.apply_writes(st, writes)
    assert st.V["ui_gain"] == 0.5


def test_virtual_clock_deterministic():
    src = "@gfx\nt1 = time_precise();\ntime(t2);\n"
    vm = GfxVM(compile_plugin_source(src))
    vm.state.host.time_seconds = 12.5
    vm.run_frame()
    assert vm.state.V["t1"] == 12.5
    assert vm.state.V["t2"] == 12.5


def test_catalog_gfx_smoke():
    from zorak_tpu.catalog import discover

    try:
        specs = [s for s in discover("/root/reference")
                 if s.plugin_type == "jsfx"]
    except Exception:
        pytest.skip("reference catalog unavailable")
    rendered = 0
    nonempty = 0
    for spec in specs:
        prog = spec.load_program()
        if "gfx" not in prog.raw_sections:
            continue
        st = make_initialized_shadow(prog, 48000.0).state
        sess = GfxSession(prog)
        cmds, _writes = sess.frame(st)
        rendered += 1
        nonempty += bool(cmds)
    assert rendered >= 20
    assert nonempty >= rendered * 3 // 4
