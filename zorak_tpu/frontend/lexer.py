"""EEL2/JSFX tokenizer.

Token rules follow the dialect accepted by the reference AOT compiler
(ref: dsp_jsfx_aot.py:91-255):

* newlines are significant (returned as NEWLINE tokens; the parser decides
  when they separate statements vs. continue an expression),
* identifiers may contain '$', '#', and dots (u.next_bank is ONE token),
* numbers are decimal with optional fraction/exponent (hex goes via $x..),
* both '//' and '/* */' comments,
* single- or double-quoted strings with C-style escapes,
* two-char operators including the compound assigns and shifts.
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Tuple


class LexError(SyntaxError):
    pass


# token kinds
NUMBER = "number"
IDENT = "ident"
KEYWORD = "keyword"
OP = "op"
PUNCT = "punct"
SEMI = "semi"
NEWLINE = "newline"
STRING = "string"
EOF = "eof"

_KEYWORDS = frozenset({"if", "else", "while"})

_TWO_CHAR = frozenset({
    "==", "!=", "<=", ">=",
    "+=", "-=", "*=", "/=", "%=", "^=", "|=", "&=", "~=",
    "&&", "||", "<<", ">>",
})

_OP_CHARS = frozenset("+-*/=<>&|!?:%~^")
_PUNCT_CHARS = frozenset("()[]{},")

_NUM_RE = re.compile(r"[0-9]+(?:\.[0-9]*)?(?:[eE][+-]?[0-9]+)?|\.[0-9]+(?:[eE][+-]?[0-9]+)?")
_IDENT_RE = re.compile(r"[#$A-Za-z_][#$A-Za-z0-9_]*(?:\.[#$A-Za-z_][#$A-Za-z0-9_]*)*")
_HEXDIGIT_RE = re.compile(r"[0-9A-Fa-f]")


@dataclass(frozen=True)
class Token:
    kind: str
    text: str
    pos: Tuple[int, int]  # (line, col)


class Lexer:
    def __init__(self, text: str, first_line: int = 1):
        self._text = text
        self._n = len(text)
        self._i = 0
        self._line = first_line
        self._col = 1

    # -- low-level cursor ---------------------------------------------------

    def _at(self, ahead: int = 0) -> str:
        j = self._i + ahead
        return self._text[j] if j < self._n else "\0"

    def _step(self, count: int = 1) -> None:
        for _ in range(count):
            if self._i >= self._n:
                return
            if self._text[self._i] == "\n":
                self._line += 1
                self._col = 1
            else:
                self._col += 1
            self._i += 1

    def _here(self) -> Tuple[int, int]:
        return (self._line, self._col)

    # -- scanning -----------------------------------------------------------

    def next_token(self) -> Token:
        while True:
            if self._i >= self._n:
                return Token(EOF, "", self._here())

            ch = self._at()

            if ch in " \t\r":
                self._step()
                continue

            if ch == "\n":
                pos = self._here()
                self._step()
                return Token(NEWLINE, "\n", pos)

            if ch == "/" and self._at(1) == "/":
                while self._at() not in ("\n", "\0"):
                    self._step()
                continue

            if ch == "/" and self._at(1) == "*":
                self._step(2)
                while True:
                    if self._at() == "\0":
                        raise LexError("unterminated block comment")
                    if self._at() == "*" and self._at(1) == "/":
                        self._step(2)
                        break
                    self._step()
                continue

            pos = self._here()

            pair = ch + self._at(1)
            if pair in _TWO_CHAR:
                self._step(2)
                return Token(OP, pair, pos)

            if ch.isdigit() or (ch == "." and self._at(1).isdigit()):
                m = _NUM_RE.match(self._text, self._i)
                assert m is not None
                lit = m.group(0)
                self._step(len(lit))
                return Token(NUMBER, lit, pos)

            if ch.isalpha() or ch in "_$#":
                m = _IDENT_RE.match(self._text, self._i)
                assert m is not None
                word = m.group(0)
                self._step(len(word))
                kind = KEYWORD if word in _KEYWORDS else IDENT
                return Token(kind, word, pos)

            if ch in ('"', "'"):
                return self._scan_string(ch, pos)

            if ch == ";":
                self._step()
                return Token(SEMI, ";", pos)

            if ch in _PUNCT_CHARS:
                self._step()
                return Token(PUNCT, ch, pos)

            if ch in _OP_CHARS:
                self._step()
                return Token(OP, ch, pos)

            raise LexError(f"unexpected character {ch!r} at {pos[0]}:{pos[1]}")

    def _scan_string(self, quote: str, pos: Tuple[int, int]) -> Token:
        self._step()  # opening quote
        parts = []
        while True:
            ch = self._at()
            if ch == "\0":
                raise LexError(f"unterminated string literal at {pos[0]}:{pos[1]}")
            if ch in ("\n", "\r"):
                raise LexError(f"newline inside string literal at {pos[0]}:{pos[1]}")
            if ch == quote:
                self._step()
                break
            if ch == "\\":
                self._step()
                esc = self._at()
                if esc == "\0":
                    raise LexError("unterminated string escape")
                self._step()
                if esc == "n":
                    parts.append("\n")
                elif esc == "r":
                    parts.append("\r")
                elif esc == "t":
                    parts.append("\t")
                elif esc == quote:
                    parts.append(quote)
                elif esc == "\\":
                    parts.append("\\")
                elif esc in ("x", "X"):
                    h1, h2 = self._at(), self._at(1)
                    if _HEXDIGIT_RE.fullmatch(h1) and _HEXDIGIT_RE.fullmatch(h2):
                        parts.append(chr(int(h1 + h2, 16)))
                        self._step(2)
                    else:
                        parts.append(esc)
                elif esc == "0":
                    parts.append("\0")
                else:
                    # unknown escape: keep the character as-is
                    parts.append(esc)
                continue
            parts.append(ch)
            self._step()
        return Token(STRING, "".join(parts), pos)
