"""Markdown help surface: terminal renderer + CLI `help` command
(ref: src/PluginMarkdownHelp.h — the editor's '?' README panel)."""
import io
import sys

from zorak_tpu.utils.mdtext import NO_README_FALLBACK, render_markdown


def test_render_headings_and_inline():
    out = render_markdown(
        "# Title\n\nSome **bold** and `code` and *em*.\n", ansi=False)
    assert "Title\n=====" in out
    assert "Some bold and code and em." in out


def test_render_lists_code_quote_rule():
    md = ("- one\n- two with a much longer line that should wrap when the "
          "width is small enough to force it\n\n"
          "```\nraw code line\n```\n\n> quoted\n\n---\n")
    out = render_markdown(md, width=40, ansi=False)
    assert "• one" in out
    assert "    raw code line" in out
    assert "| quoted" in out
    assert "---" in out or "-" * 40 in out


def test_render_links():
    out = render_markdown("[docs](https://x.test/a)", ansi=False)
    assert "docs <https://x.test/a>" in out


def test_ansi_styles_applied():
    out = render_markdown("**b**", ansi=True)
    assert "\x1b[1m" in out and "\x1b[0m" in out


def test_cli_help_renders_readme(reference_root):
    from zorak_tpu.cli.main import main

    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = main(["help", "--catalog", str(reference_root),
                   "--only", "DDT", "--plain"])
    finally:
        sys.stdout = old
    text = buf.getvalue()
    assert rc == 0
    assert "DDT" in text
    # generated controls reference rides below the README
    assert "slider1" in text


def test_cli_help_fallback_matches_reference():
    # exact fallback copy from the reference panel
    # (ref: src/PluginMarkdownHelp.h:40-41)
    assert "No embedded `README.md` was found" in NO_README_FALLBACK
