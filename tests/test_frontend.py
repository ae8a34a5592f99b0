"""Frontend tests: lexer/parser/sections/directives against real catalog sources."""
import pathlib

import pytest

from zorak_tpu.frontend import (
    Lexer, Parser, parse_section, split_sections, preprocess_imports,
    parse_slider_decls, parse_pin_decls, parse_options, memtop_slots,
)
from zorak_tpu.frontend.astnodes import (
    Asn, Bin, Block, Cond, Const, IfStmt, LoopExpr, Mem, Name, CallExpr, Un,
)
from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.ir.analyses import SectionLegalityError


def toks(text):
    lx = Lexer(text)
    out = []
    while True:
        t = lx.next_token()
        if t.kind == "eof":
            break
        out.append((t.kind, t.text))
    return out


class TestLexer:
    def test_dotted_identifier_is_one_token(self):
        assert toks("u.next_bank") == [("ident", "u.next_bank")]

    def test_dollar_and_hash_idents(self):
        assert toks("$pi #str $x7f") == [
            ("ident", "$pi"), ("ident", "#str"), ("ident", "$x7f")]

    def test_two_char_ops(self):
        assert [t for _, t in toks("a+=1<<2&&b")] == ["a", "+=", "1", "<<", "2", "&&", "b"]

    def test_comments_and_newlines(self):
        out = toks("a=1 // c\n/* x\ny */ b=2")
        assert ("newline", "\n") in out
        assert ("ident", "b") in out

    def test_string_escapes(self):
        assert toks(r'"a\n\x41b"') == [("string", "a\nAb")]


class TestParser:
    def test_precedence_pow_over_mul(self):
        (e,) = parse_section("a = 2*3^2")
        assert isinstance(e, Asn)
        assert isinstance(e.value, Bin) and e.value.op == "*"
        assert isinstance(e.value.rhs, Bin) and e.value.rhs.op == "^"

    def test_or_binds_loosest(self):
        (e,) = parse_section("x = a == 1 | b == 2")
        # '|' has lower precedence than '=='
        assert isinstance(e.value, Bin) and e.value.op == "|"

    def test_ternary_implicit_else(self):
        (e,) = parse_section("y = c ? 5")
        assert isinstance(e.value, Cond)
        assert isinstance(e.value.other, Const) and e.value.other.value == 0.0

    def test_multiline_continuation_on_infix(self):
        prog = parse_section("x = a\n  || b\ny = 2")
        assert len(prog) == 2
        assert isinstance(prog[0].value, Bin) and prog[0].value.op == "||"

    def test_newline_before_minus_splits_statements(self):
        prog = parse_section("x = a\n-b")
        assert len(prog) == 2
        assert isinstance(prog[1], Un)

    def test_multiline_ternary(self):
        prog = parse_section("z = cond\n ? 1\n : 2")
        assert len(prog) == 1
        assert isinstance(prog[0].value, Cond)

    def test_loop_multistatement_body(self):
        (e,) = parse_section("loop(8, a += 1; b = a*2;)")
        assert isinstance(e, LoopExpr)
        assert isinstance(e.body, Block) and len(e.body.items) == 2

    def test_empty_brackets_index_zero(self):
        (e,) = parse_section("v = buf[]")
        assert isinstance(e.value, Mem)
        assert isinstance(e.value.index, Const) and e.value.index.value == 0.0

    def test_sequence_value(self):
        (e,) = parse_section("q = (a=1; b=2; a+b)")
        assert isinstance(e.value, Block) and len(e.value.items) == 3

    def test_function_def_with_quals(self):
        prog = parse_section(
            "function onepole(x) local(y) instance(z1 z2) global() ( z1 = x; z1 );")
        fd = prog[0]
        assert fd.name == "onepole" and fd.params == ["x"]
        assert fd.local_names == ["y"] and fd.instance_names == ["z1", "z2"]

    def test_if_else_statement(self):
        prog = parse_section("if (a > 0)\n  b = 1;\nelse\n  b = 2;")
        assert len(prog) == 1 and isinstance(prog[0], IfStmt)

    def test_assign_to_dynamic_slider(self):
        (e,) = parse_section("slider(3) = 0.5")
        assert isinstance(e, Asn) and isinstance(e.target, CallExpr)

    def test_invalid_assign_target(self):
        with pytest.raises(SyntaxError):
            parse_section("1 + 2 = 3")


class TestSections:
    SRC = "desc:demo\nslider1:0.5<0,1,0.01>Gain\n@init\nx=0;\n@sample\nspl0 = spl0*slider1;\n@init\ny=1;\n"

    def test_split_and_append_repeat(self):
        secs = split_sections(self.SRC)
        assert "init" in secs and "sample" in secs
        assert "x=0" in secs["init"][0] and "y=1" in secs["init"][0]

    def test_line_numbers(self):
        secs = split_sections(self.SRC)
        assert secs["init"][1] == 4

    def test_imports(self, tmp_path):
        lib = tmp_path / "lib.jsfx-inc"
        lib.write_text("@init\nhelper = 42;\n")
        main = tmp_path / "main.jsfx"
        main.write_text('import "lib.jsfx-inc"\n@init\nx = helper;\n@sample\nspl0=x;\n')
        merged = preprocess_imports(main.read_text(), main)
        secs = split_sections(merged)
        assert "helper = 42" in secs["init"][0]
        assert "x = helper" in secs["init"][0]

    def test_cyclic_import_rejected(self, tmp_path):
        a = tmp_path / "a.jsfx"
        b = tmp_path / "b.jsfx"
        a.write_text('import "b.jsfx"\n@init\n')
        b.write_text('import "a.jsfx"\n@init\n')
        with pytest.raises(ValueError):
            preprocess_imports(a.read_text(), a)


class TestDirectives:
    def test_slider_shapes_and_choices(self):
        decls, _ = parse_slider_decls(
            "slider1:30<0,100,1:sqr>Distance\n"
            "slider5:2<0,4,1{Eco,Moderate,High,Very High,Extreme}>Quality\n"
            "slider7:0<-12,12,0.1:log>Output (dB)\n"
            "slider9:th=-40<-80,0,0.1>-Hidden Threshold\n")
        by_idx = {d.index0: d for d in decls}
        assert by_idx[0].shape == "sqr" and by_idx[0].default == 30
        assert by_idx[4].is_choice and len(by_idx[4].choices) == 5
        assert by_idx[6].shape == "log" and by_idx[6].lo == -12
        assert by_idx[8].hidden and by_idx[8].var_name == "th"

    def test_string_slider(self):
        decls, _ = parse_slider_decls('slider3:#bus_name="main"<string>Bus Name\n')
        assert decls[0].is_string and decls[0].string_default == "main"

    def test_pins(self):
        pins = parse_pin_decls("in_pin:left\nin_pin:right\nout_pin:none\n")
        assert pins == {"inputs": 2, "outputs": 0}

    def test_options_maxmem(self):
        opts = parse_options("options: maxmem=32000000 ownership=hybrid\n")
        assert memtop_slots(opts) == 32_000_000
        assert opts["ownership"] == "hybrid"


class TestAnalyses:
    def test_msg_send_outside_block_fails(self):
        src = "@sample\nmsg_send(\"ch\", 1, 2, 3, 4, 5);\n"
        with pytest.raises(SectionLegalityError, match=r"msg_send\(\) is only valid in @block"):
            compile_plugin_source(src)

    def test_gmem_put_outside_block_fails(self):
        src = "@sample\ngmem_put(0, 1, 2);\n"
        with pytest.raises(SectionLegalityError, match=r"gmem_put\(\) is only valid in @block"):
            compile_plugin_source(src)

    def test_sample_export_outside_block_fails(self):
        src = "@sample\nsample_export_mem(0, 0, 16);\n"
        with pytest.raises(SectionLegalityError,
                           match=r"sample_export_mem\(\) is only valid in @block"):
            compile_plugin_source(src)

    def test_comm_and_io_caps(self):
        src = ('@block\nmsg_send("bus", 1, 0, 0, 0, 0);\ngmem[3] = 7;\n'
               "@sample\nspl0 = spl1; spl3 = 0.5;\n")
        prog = compile_plugin_source(src)
        assert prog.comm["uses_msg"] and prog.comm["uses_gmem"]
        assert prog.comm["channels_static"] == ["bus"]
        assert prog.io_channels["inputs"] == 2
        assert prog.io_channels["outputs"] == 4

    def test_midi_kind_inference(self):
        src = "@block\nwhile (midirecv(ofs, m1, m2, m3)) ( midisend(ofs, m1, m2, m3); );\n"
        prog = compile_plugin_source(src)
        assert prog.plugin_kind == "midi_effect"
        assert prog.midi["uses_midi"]


class TestCatalogParses:
    """Every JSFX source in the reference catalog must compile through the frontend."""

    def test_parse_all_reference_jsfx(self, reference_plugins):
        files = sorted(reference_plugins.rglob("*.jsfx"))
        assert len(files) >= 26
        failures = []
        for f in files:
            try:
                prog = load_plugin_file(f)
                assert prog.io_channels["process"] >= 1
            except Exception as exc:  # noqa: BLE001
                failures.append((f.name, repr(exc)[:200]))
        assert not failures, failures

    def test_parse_reference_test_scripts(self, reference_root):
        ok_files = [p for p in sorted((reference_root / "tests").rglob("*.jsfx"))
                    if not p.name.startswith("invalid_")]
        failures = []
        for f in ok_files:
            try:
                load_plugin_file(f)
            except Exception as exc:  # noqa: BLE001
                failures.append((f.name, repr(exc)[:200]))
        assert not failures, failures

    def test_negative_scripts_fail_with_diagnostics(self, reference_root):
        neg = sorted((reference_root / "tests").rglob("invalid_*.jsfx"))
        assert neg, "expected negative test scripts in reference"
        for f in neg:
            with pytest.raises(SectionLegalityError, match="is only valid in"):
                load_plugin_file(f)

    def test_ddt_capabilities(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        assert prog.plugin_kind == "audio_effect"
        assert prog.io_channels["process"] == 2
        assert prog.has_sample_section
        assert len(prog.slider_decls) == 9
        assert not prog.comm["uses_comm"]
