"""Engine host services: file slots + sample pool (+ comm via InstanceComm).

Offline analogs of the reference's async host services:

* File slots (ref: src/JSFXJuceProcessor.cpp:2559-2649, 8164): per-slot
  decoded audio as interleaved doubles with the legacy file_* cursor API
  (file_open/file_riff/file_var/file_mem/file_avail/...), multi-file
  slots with file_multi_count/select.  The offline engine loads slots
  synchronously before @init — the reference's atomic pending->active
  promotion exists to keep a realtime thread waitless, which an offline
  render does not need.
* Sample pool (ref: src/DspJsfxSamplePool.{h,cpp}): immutable generations
  of packed float32 banks with peak/rms/preview metadata; read/readInterp/
  read2 semantics matched to the reference (llround framing, channel
  clamp, zero out-of-range, read2's hard sample-boundary rule).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..comm import CommWorld, InstanceComm

SAMPLE_POOL_EMPTY = 0
SAMPLE_POOL_SCANNING = 1
SAMPLE_POOL_LOADING = 2
SAMPLE_POOL_READY = 3
SAMPLE_POOL_PARTIAL = 4
SAMPLE_POOL_FAILED = 5

PREVIEW_BIN_FRAMES = 1024


@dataclass
class LoadedAudio:
    audio: np.ndarray          # [channels, frames] float64
    srate: float
    name: str = ""
    path: str = ""             # source path when loaded from disk (persisted
                               # in save_state, ref: JSFXJuceProcessor.cpp:3784)

    @property
    def frames(self) -> int:
        return self.audio.shape[1]

    @property
    def channels(self) -> int:
        return self.audio.shape[0]


@dataclass
class _OpenFile:
    slot: int
    files: List[LoadedAudio]
    selected: int = 0
    cursor: int = 0            # interleaved value cursor

    @property
    def current(self) -> Optional[LoadedAudio]:
        if 0 <= self.selected < len(self.files):
            return self.files[self.selected]
        return None


class FileSlotService:
    """Slot index -> list of decoded files (singular slots have one)."""

    def __init__(self) -> None:
        self.slots: Dict[int, List[LoadedAudio]] = {}
        self.open_handles: Dict[int, _OpenFile] = {}
        # handles are 1-based and reused LIFO (0 is reserved for
        # @serialize in REAPER JSFX; ref: JSFXJuceProcessor.cpp:4971-4989)
        self._next_handle = 1
        self._free_handles: List[int] = []

    def load_slot(self, index: int, source, srate: Optional[float] = None,
                  name: str = "") -> None:
        if isinstance(source, (str, Path)):
            from . import wavio

            audio, rate = wavio.read_wav(source)
            entry = LoadedAudio(np.asarray(audio, np.float64), float(rate),
                                name or Path(source).name, str(source))
        else:
            entry = LoadedAudio(np.asarray(source, np.float64),
                                float(srate or 48000.0), name)
        self.slots.setdefault(int(index), []).append(entry)

    def clear_slot(self, index: int) -> None:
        self.slots.pop(int(index), None)

    # -- legacy cursor API ---------------------------------------------------

    def open(self, slot: float) -> float:
        try:
            s = int(slot + 1.0e-5)
        except (ValueError, OverflowError):
            return -1.0
        files = self.slots.get(s)
        if not files:
            return -1.0
        if self._free_handles:
            h = self._free_handles.pop()
        else:
            h = self._next_handle
            self._next_handle += 1
        self.open_handles[h] = _OpenFile(s, files)
        return float(h)

    def _h(self, handle: float) -> Optional[_OpenFile]:
        try:
            return self.open_handles.get(int(handle))
        except (ValueError, OverflowError):
            return None

    def close(self, handle: float) -> float:
        try:
            h = int(handle)
        except (ValueError, OverflowError):
            return 0.0
        if self.open_handles.pop(h, None) is not None:
            self._free_handles.append(h)
        return 0.0

    def avail(self, handle: float) -> float:
        h = self._h(handle)
        if h is None or h.current is None:
            return 0.0
        total = h.current.frames * h.current.channels
        return float(max(0, total - h.cursor))

    def rewind(self, handle: float) -> float:
        h = self._h(handle)
        if h is not None:
            h.cursor = 0
        return 0.0

    def seek(self, handle: float, pos: float) -> float:
        h = self._h(handle)
        if h is not None:
            try:
                h.cursor = max(0, int(pos))
            except (ValueError, OverflowError):
                pass
        return 0.0

    def riff(self, handle: float) -> Optional[Tuple[float, float]]:
        h = self._h(handle)
        if h is None or h.current is None:
            return None
        return (float(h.current.channels), float(h.current.srate))

    def var_read(self, handle: float) -> Optional[Tuple[float, float]]:
        h = self._h(handle)
        if h is None or h.current is None:
            return None
        cur = h.current
        inter = cur.audio.T.reshape(-1)
        if h.cursor >= len(inter):
            return (0.0, 0.0)
        v = float(inter[h.cursor])
        h.cursor += 1
        return (1.0, v)

    def mem_read(self, st, handle: float, offset: float, length: float) -> float:
        h = self._h(handle)
        if h is None or h.current is None:
            return 0.0
        try:
            dst = max(0, int(offset + 1e-5))
            n = max(0, int(length))
        except (ValueError, OverflowError):
            return 0.0
        inter = h.current.audio.T.reshape(-1)
        n = min(n, max(0, len(inter) - h.cursor))
        if n:
            st.mem_ensure(dst + n)
            st.mem[dst:dst + n] = inter[h.cursor:h.cursor + n]
            h.cursor += n
        return float(n)

    def multi_count(self, handle: float) -> float:
        h = self._h(handle)
        return float(len(h.files)) if h is not None else 0.0

    def multi_select(self, handle: float, index: float) -> float:
        h = self._h(handle)
        if h is None:
            return 0.0
        try:
            i = int(index)
        except (ValueError, OverflowError):
            return 0.0
        if 0 <= i < len(h.files):
            h.selected = i
            h.cursor = 0
            return 1.0
        return 0.0


@dataclass
class PoolEntry:
    sample_id: int
    data: np.ndarray             # packed [frames, channels] float32
    srate: float
    name: str
    peak: float
    rms: float
    preview: np.ndarray          # [bins, 3] min/max/rms


@dataclass
class PoolGeneration:
    number: int
    entries: Dict[int, PoolEntry] = field(default_factory=dict)
    order: List[int] = field(default_factory=list)

    def ram_mb(self) -> float:
        return sum(e.data.nbytes for e in self.entries.values()) / (1024.0 ** 2)


class SamplePoolService:
    """Synchronous offline equivalent of the async generation pipeline."""

    def __init__(self) -> None:
        self.mode = 0
        self.budget_mb = 0.0
        self.state = SAMPLE_POOL_EMPTY
        self.generation: Optional[PoolGeneration] = None
        self.gen_counter = 0
        self.failed = 0
        self.source_slot: Optional[int] = None

    def commit_sources(self, sources: Sequence[LoadedAudio]) -> None:
        self.gen_counter += 1
        gen = PoolGeneration(self.gen_counter)
        for i, src in enumerate(sources):
            sid = i + 1
            data = np.ascontiguousarray(src.audio.T, dtype=np.float32)
            frames = data.shape[0]
            bins = max(1, (frames + PREVIEW_BIN_FRAMES - 1) // PREVIEW_BIN_FRAMES)
            preview = np.zeros((bins, 3))
            mono = data.mean(axis=1) if data.size else np.zeros(0, np.float32)
            for b in range(bins):
                seg = mono[b * PREVIEW_BIN_FRAMES:(b + 1) * PREVIEW_BIN_FRAMES]
                if len(seg):
                    preview[b] = (float(seg.min()), float(seg.max()),
                                  float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))))
            gen.entries[sid] = PoolEntry(
                sample_id=sid, data=data, srate=src.srate, name=src.name,
                peak=float(np.abs(data).max(initial=0.0)),
                rms=float(np.sqrt(np.mean(data.astype(np.float64) ** 2)))
                if data.size else 0.0,
                preview=preview)
            gen.order.append(sid)
        self.generation = gen
        self.state = SAMPLE_POOL_READY if gen.entries else SAMPLE_POOL_EMPTY

    # -- queries -------------------------------------------------------------

    def _entry(self, sample_id: float) -> Optional[PoolEntry]:
        gen = self.generation
        if gen is None:
            return None
        try:
            return gen.entries.get(int(sample_id))
        except (ValueError, OverflowError):
            return None

    def sample_id_at(self, index: float) -> float:
        gen = self.generation
        if gen is None:
            return 0.0
        try:
            i = int(index)
        except (ValueError, OverflowError):
            return 0.0
        return float(gen.order[i]) if 0 <= i < len(gen.order) else 0.0

    def read(self, sample_id: float, channel: float, frame: float) -> float:
        e = self._entry(sample_id)
        if e is None or e.data.shape[0] == 0 or e.data.shape[1] == 0:
            return 0.0
        if not math.isfinite(frame):
            frame = 0.0
        f = int(round(frame))  # llround semantics
        if f < 0 or f >= e.data.shape[0]:
            return 0.0
        try:
            c = int(channel)
        except (ValueError, OverflowError):
            c = 0
        c = min(max(c, 0), e.data.shape[1] - 1)
        return float(e.data[f, c])

    def read_interp(self, sample_id: float, channel: float, phase: float) -> float:
        if not math.isfinite(phase):
            phase = 0.0
        base = math.floor(phase)
        frac = phase - base
        x0 = self.read(sample_id, channel, base)
        x1 = self.read(sample_id, channel, base + 1.0)
        return x0 + (x1 - x0) * frac

    def read2(self, sample_id: float, phase: float, interp: bool):
        e = self._entry(sample_id)
        if e is None or e.data.shape[0] == 0 or e.data.shape[1] == 0:
            return None
        # hard sample-boundary rule (ref: DspJsfxSamplePool.cpp:412-440)
        if not math.isfinite(phase) or phase < 0.0 or phase > float(e.data.shape[0] - 1):
            return None
        rd = self.read_interp if interp else self.read
        l = rd(sample_id, 0.0, phase)
        r = rd(sample_id, 1.0, phase) if e.data.shape[1] >= 2 else l
        return (l, r)

    def preview_bins(self, sample_id: float) -> float:
        e = self._entry(sample_id)
        return float(len(e.preview)) if e is not None else 0.0

    def preview_read(self, sample_id: float, bin_idx: float):
        e = self._entry(sample_id)
        if e is None:
            return None
        try:
            b = int(bin_idx)
        except (ValueError, OverflowError):
            return None
        if 0 <= b < len(e.preview):
            return tuple(float(v) for v in e.preview[b])
        return None


class EngineHost(InstanceComm):
    """Full host: comm + gmem (InstanceComm) + file slots + sample pool."""

    def __init__(self, world: Optional[CommWorld] = None, name: str = ""):
        super().__init__(world or CommWorld(), name=name)
        self.files = FileSlotService()
        self.pool = SamplePoolService()
        self.track_name_text = ""

    # -- sample pool dispatch (names from the AOT surface) --------------------

    def sample_pool_call(self, st, fn: str, args: List[float]) -> float:
        p = self.pool
        if fn == "sample_pool_from_slot":
            slot = int(args[0]) if args else 0
            files = self.files.slots.get(slot, [])
            p.source_slot = slot
            p.commit_sources(files)
            return 1.0 if files else 0.0
        if fn == "sample_pool_set_mode":
            p.mode = int(args[1]) if len(args) > 1 else int(args[0])
            return 1.0
        if fn == "sample_pool_set_budget_mb":
            p.budget_mb = float(args[-1]) if args else 0.0
            return 1.0
        if fn == "sample_pool_commit":
            if p.source_slot is not None:
                p.commit_sources(self.files.slots.get(p.source_slot, []))
            return 1.0
        if fn == "sample_pool_state":
            return float(p.state)
        if fn == "sample_pool_selected":
            return float(len(p.generation.order) if p.generation else 0)
        if fn == "sample_pool_loaded":
            return float(len(p.generation.entries) if p.generation else 0)
        if fn == "sample_pool_failed":
            return float(p.failed)
        if fn == "sample_pool_ram_mb":
            return p.generation.ram_mb() if p.generation else 0.0
        if fn == "sample_pool_generation":
            return float(p.generation.number if p.generation else 0)
        if fn == "sample_get":
            return p.sample_id_at(args[1] if len(args) > 1 else 0.0)
        if fn == "sample_len":
            e = p._entry(args[1] if len(args) > 1 else 0.0)
            return float(e.data.shape[0]) if e else 0.0
        if fn == "sample_channels":
            e = p._entry(args[1] if len(args) > 1 else 0.0)
            return float(e.data.shape[1]) if e else 0.0
        if fn == "sample_srate":
            e = p._entry(args[1] if len(args) > 1 else 0.0)
            return float(e.srate) if e else 0.0
        if fn == "sample_peak":
            e = p._entry(args[1] if len(args) > 1 else 0.0)
            return e.peak if e else 0.0
        if fn == "sample_rms":
            e = p._entry(args[1] if len(args) > 1 else 0.0)
            return e.rms if e else 0.0
        if fn == "sample_preview_bins":
            return p.preview_bins(args[1] if len(args) > 1 else 0.0)
        if fn == "sample_read":
            return p.read(args[1], args[2], args[3]) if len(args) >= 4 else 0.0
        if fn == "sample_read_interp":
            return p.read_interp(args[1], args[2], args[3]) if len(args) >= 4 else 0.0
        if fn in ("sample_export_mem", "sample_export_mem2"):
            return self._export_mem(st, args, stereo=fn.endswith("2"))
        return 0.0

    def sample_read2(self, st, pool, sid, phase, interp: bool):
        return self.pool.read2(sid, phase, interp)

    def sample_preview_read(self, st, pool, sid, bin_idx):
        return self.pool.preview_read(sid, bin_idx)

    def sample_name(self, st, index, out_lv_write, maxlen) -> float:
        e = self.pool._entry(index)
        return 1.0 if e is not None else 0.0

    def _export_mem(self, st, args: List[float], stereo: bool) -> float:
        # sample_export_mem(pool, id, mem_dst, start_frame, count)
        if len(args) < 5:
            return 0.0
        sid, dst, start, count = args[1], args[2], args[3], args[4]
        e = self.pool._entry(sid)
        if e is None:
            return 0.0
        try:
            d = max(0, int(dst + 1e-5))
            s = max(0, int(start))
            n = max(0, int(count))
        except (ValueError, OverflowError):
            return 0.0
        n = min(n, max(0, e.data.shape[0] - s))
        if n <= 0:
            return 0.0
        if stereo and e.data.shape[1] >= 2:
            st.mem_ensure(d + 2 * n)
            st.mem[d:d + 2 * n] = e.data[s:s + n, :2].reshape(-1).astype(np.float64)
        else:
            st.mem_ensure(d + n)
            st.mem[d:d + n] = e.data[s:s + n, 0].astype(np.float64)
        return float(n)

    # -- legacy file API ------------------------------------------------------

    def file_call(self, st, fn: str, args: List[float]) -> float:
        f = self.files
        if fn in ("file_open", "file_open_multi"):
            return f.open(args[0] if args else -1.0)
        if fn == "file_close":
            return f.close(args[0])
        if fn == "file_rewind":
            return f.rewind(args[0])
        if fn == "file_seek":
            return f.seek(args[0], args[1])
        if fn == "file_avail":
            return f.avail(args[0])
        if fn == "file_text":
            return 0.0
        if fn == "file_mem":
            return f.mem_read(st, args[0], args[1], args[2])
        if fn == "file_multi_count":
            return f.multi_count(args[0])
        if fn == "file_multi_select":
            return f.multi_select(args[0], args[1])
        return 0.0

    def file_var_read(self, st, handle, *rest):
        return self.files.var_read(handle)

    def file_riff_read(self, st, handle, *rest):
        return self.files.riff(handle)

    # -- track names ----------------------------------------------------------

    def track_name(self, st):
        if not self.track_name_text:
            return (0.0, 0.0)
        return (1.0, self._intern(st, self.track_name_text))

    def track_name_available(self, st) -> float:
        return 1.0 if self.track_name_text else 0.0
