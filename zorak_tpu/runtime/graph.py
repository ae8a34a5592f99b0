"""Multi-instance render graph: colocated plugin instances exchanging
messages/gmem block-synchronously, the offline analog of multiple plugin
instances in one DAW session (ref: docs/DSP-JSFX-Communication.md).

Processing order per block mirrors the host: for each instance —
begin_block (materialize inbox), process_block (@block + samples),
end_block (flush outbox).  Messages sent in block k become visible to
every instance at block k+1 (and to instances later in the processing
order never earlier than their own begin_block, exactly like the
shared-memory ring's block-resolved visibility).

Device mode (prefer="auto"/"tpu"): the TPU-native decomposition of the
same schedule.  Control runs on the host in LOCKSTEP — each vectorizable
node's @block/@slider interprets one block at a time through its golden
executor against the SHARED CommWorld, interleaved with the other nodes
in host processing order, so every message/gmem exchange happens exactly
as in the all-shadow graph (ref DspJsfxMessageBus.cpp:529,609) — while
the sample-rate compute of every vector node rides the device kernels
with the assembled control matrices (audio never flows between nodes, so
the device renders are independent dispatches).  Nodes the vectorizer
rejects run their full shadow inline in the same lockstep.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..comm import CommWorld, InstanceComm
from ..ir.program import PluginProgram
from ..shadow import compile_shadow


def _comm_touch(program: PluginProgram) -> "tuple[bool, bool]":
    """(touches_msg, touches_gmem) over the DSP sections
    (slider/block/sample): msg_*/comm builtins vs the gmem segment.
    @init-time joins/attaches already ran on the host before kernels
    build, so they don't count.  The distinction matters on the device
    path: gmem maps natively into the device heap (devgen) and a graph
    can thread it block-synchronously through a joint scan
    (lockstep_gmem_run), while msg ring traffic only folds in the solo
    regime — msg-touching coupled nodes keep the shadow."""
    from ..frontend.astnodes import CallExpr, Mem, Name, walk
    from ..lowering.devgen import DeviceSection

    seen: set = set()
    hit = [False, False]

    def scan(nodes) -> None:
        for root in nodes:
            for n in walk(root):
                if isinstance(n, Mem) and isinstance(n.base, Name) \
                        and n.base.ident == "gmem":
                    hit[1] = True
                if isinstance(n, CallExpr):
                    if n.func in DeviceSection._COMM_FNS:
                        hit[0] = True
                    elif n.func in DeviceSection._GMEM_FNS:
                        hit[1] = True
                    elif n.func in program.fn_defs and n.func not in seen:
                        seen.add(n.func)
                        scan([program.fn_defs[n.func].body])

    for s in ("slider", "block", "sample"):
        scan(program.sections.get(s) or [])
    return hit[0], hit[1]


@dataclass
class GraphNode:
    name: str
    program: PluginProgram
    sliders: Dict[int, float] = field(default_factory=dict)
    input_key: Optional[str] = None     # which named input feeds this node


class RenderGraph:
    def __init__(self, srate: float = 48000.0, block_size: int = 512,
                 prefer: str = "shadow"):
        self.srate = float(srate)
        self.block_size = int(block_size)
        self.prefer = prefer
        self.world = CommWorld()
        self.nodes: List[GraphNode] = []
        self.plugins = []
        self.hosts: List[InstanceComm] = []
        self.kernels: List[Optional[object]] = []
        self.node_engines: List[str] = []
        self.spec_errors: Dict[str, str] = {}
        self._lockstep_fns: Dict[object, object] = {}

    def add(self, name: str, program: PluginProgram,
            sliders: Optional[Dict[int, float]] = None,
            input_key: Optional[str] = None,
            string_sliders: Optional[Dict[int, str]] = None) -> InstanceComm:
        node = GraphNode(name, program, dict(sliders or {}), input_key)
        host = InstanceComm(self.world, name=name)
        plug = compile_shadow(program, host=host)
        plug.state.srate = self.srate
        from ..verify.nulltest import apply_slider_state
        apply_slider_state(plug.state, program, node.sliders, string_sliders)
        self.nodes.append(node)
        self.plugins.append(plug)
        self.hosts.append(host)
        self.kernels.append(None)
        self.node_engines.append("cpu-shadow")
        return host

    def init_all(self) -> None:
        for plug in self.plugins:
            plug.run_init()
            plug.run_slider()
        if self.prefer in ("auto", "tpu"):
            self._build_kernels()

    def _build_kernels(self) -> None:
        """Specialize every vectorizable node against its post-init state.

        Built AFTER init_all: @init already joined buses / attached gmem
        against the shared world in node order, so instance ids and
        segment layouts match the all-shadow graph.  The specializer's
        @block probes run on CLONED states and never call end_block, so
        probe-time msg sends stay in the instance outbox — cleared here
        to keep the ring pristine for the render."""
        from ..lowering import SpecializeError, specialize_sample_kernel

        # jitted joint-scan closures capture kernel objects; a rebuild
        # must not reuse closures over the previous build's kernels
        self._lockstep_fns.clear()
        for i, (node, plug, host) in enumerate(
                zip(self.nodes, self.plugins, self.hosts)):
            nch = max(1, node.program.io_channels["process"])
            try:
                kern = specialize_sample_kernel(
                    node.program, plug.state, nch,
                    block_size=self.block_size)
                msg_t, gmem_t = _comm_touch(node.program)
                if kern.coupled and msg_t:
                    # a device @block that reads or writes the message
                    # ring would need its msg traffic staged per block in
                    # lockstep with the other nodes; such nodes keep the
                    # shadow (gmem, by contrast, threads natively — below)
                    raise SpecializeError(
                        "coupled @block touching the bus: graph lockstep "
                        "needs the host-trajectory (uncoupled) form")
                # comm-free coupled nodes are graph-legal: their control
                # neither reads nor writes the shared world, so the fused
                # device pipeline renders them independently while their
                # begin/end block bookkeeping stays in lockstep (ref:
                # DspJsfxMessageBus.cpp:529,609 — the reference bus
                # connects native instances of every plugin).  Coupled
                # nodes touching a SHARED gmem segment join the joint
                # gmem-lockstep scan (one XLA program threading the
                # segment through every member in node order) — resolved
                # group-wise after this loop.
                if kern.coupled and gmem_t \
                        and not kern._devblock.uses_gmem:
                    # gmem touched outside the device @block (e.g. a
                    # vectorized @sample region) cannot be threaded
                    # block-synchronously — keep the shadow, honestly
                    raise SpecializeError(
                        "coupled node touches gmem outside the device "
                        "@block: joint lockstep scan cannot thread it")
                self.kernels[i] = kern
                if kern.coupled and gmem_t \
                        and host.attached_gmem is not None:
                    self.node_engines[i] = "tpu-lockstep"
                else:
                    self.node_engines[i] = "tpu-vector"
            except SpecializeError as exc:
                self.spec_errors[node.name] = str(exc)
            # DROP (not flush) any probe-time sends buffered in the outbox
            host.outbox.clear()
        self._resolve_gmem_groups()

    def _resolve_gmem_groups(self) -> None:
        """Demote gmem-lockstep candidates whose segment is also touched
        (in DSP sections) by any node OUTSIDE the joint scan — a host-
        path node interleaves its gmem reads/writes per block in phase 1
        while the joint scan replays all blocks in phase 2, so sharing a
        segment across the two schedules would break the all-shadow
        ordering.  Per-segment: either every section-level toucher is in
        the scan, or none rides the device for that segment."""
        from ..lowering import SpecializeError

        seg_touchers: Dict[int, List[int]] = {}
        seg_outside: Dict[int, bool] = {}
        for i, (node, host) in enumerate(zip(self.nodes, self.hosts)):
            seg = host.attached_gmem
            if seg is None:
                continue
            _msg, gmem_t = _comm_touch(node.program)
            if not gmem_t:
                continue
            sid = id(seg)
            if self.node_engines[i] == "tpu-lockstep":
                seg_touchers.setdefault(sid, []).append(i)
            else:
                seg_outside[sid] = True
        for sid, members in seg_touchers.items():
            if seg_outside.get(sid):
                for i in members:
                    self.kernels[i] = None
                    self.node_engines[i] = "cpu-shadow"
                    self.spec_errors[self.nodes[i].name] = (
                        "shared gmem segment also touched by a host-path "
                        "node: joint lockstep scan cannot include it")

    # -- render ----------------------------------------------------------------

    def _node_input(self, node, ch: int, inputs, start: int, stop: int
                    ) -> np.ndarray:
        src = inputs.get(node.input_key or node.name)
        x = np.zeros((ch, stop - start), dtype=np.float32)
        if src is not None:
            c = min(ch, src.shape[0])
            seg = src[:c, start:stop]
            x[:c, : seg.shape[1]] = seg
        return x

    def run(self, inputs: Dict[str, np.ndarray], total: Optional[int] = None
            ) -> Dict[str, np.ndarray]:
        """inputs: name -> float32 [ch, samples]; returns per-node outputs."""
        if total is None:
            total = max((a.shape[1] for a in inputs.values()), default=0)
        if any(k is not None for k in self.kernels):
            return self._run_device(inputs, total)
        return self._run_shadow(inputs, total)

    def _run_shadow(self, inputs, total: int) -> Dict[str, np.ndarray]:
        outs: Dict[str, np.ndarray] = {}
        chans: Dict[str, int] = {}
        for node, plug in zip(self.nodes, self.plugins):
            ch = max(1, node.program.io_channels["process"])
            chans[node.name] = ch
            outs[node.name] = np.zeros((ch, total), dtype=np.float32)

        bs = self.block_size
        for start in range(0, total, bs):
            stop = min(start + bs, total)
            for node, plug, host in zip(self.nodes, self.plugins, self.hosts):
                x = self._node_input(node, chans[node.name], inputs,
                                     start, stop)
                host.begin_block(plug.state)
                plug.process_block(x, outs[node.name][:, start:stop])
                host.end_block(plug.state)
        return outs

    def _run_device(self, inputs, total: int) -> Dict[str, np.ndarray]:
        """Lockstep host control pass + per-node device sample renders."""
        outs: Dict[str, np.ndarray] = {}
        chans: Dict[str, int] = {}
        for node, plug in zip(self.nodes, self.plugins):
            ch = max(1, node.program.io_channels["process"])
            chans[node.name] = ch
            outs[node.name] = np.zeros((ch, total), dtype=np.float32)

        bs = self.block_size
        steppers = [kern.trajectory_stepper()
                    if kern is not None and not kern.coupled else None
                    for kern in self.kernels]
        # phase 1: lockstep control — identical begin/step/end order to
        # the all-shadow loop, so the bus ring and gmem segments evolve
        # identically; shadow-fallback nodes render their audio inline.
        # Coupled device nodes run their @block ON DEVICE in phase 2 —
        # they are comm-free by construction (_build_kernels), so only
        # their begin/end bookkeeping participates here, keeping ring
        # cursors and drop accounting identical to the all-shadow graph.
        for start in range(0, total, bs):
            stop = min(start + bs, total)
            for node, plug, host, kern, stp in zip(
                    self.nodes, self.plugins, self.hosts, self.kernels,
                    steppers):
                if stp is not None:
                    host.begin_block(stp.state)
                    stp.step(stop - start)
                    host.end_block(stp.state)
                elif kern is not None:       # coupled device node
                    host.begin_block(plug.state)
                    host.end_block(plug.state)
                else:
                    x = self._node_input(node, chans[node.name], inputs,
                                         start, stop)
                    host.begin_block(plug.state)
                    plug.process_block(x, outs[node.name][:, start:stop])
                    host.end_block(plug.state)
        # phase 2: device sample renders (no inter-node audio routing —
        # every vector node dispatches independently)
        for i, (node, plug, kern, stp) in enumerate(
                zip(self.nodes, self.plugins, self.kernels, steppers)):
            if kern is None or self.node_engines[i] == "tpu-lockstep":
                continue
            x = self._node_input(node, chans[node.name], inputs, 0, total)
            if stp is not None:
                y, carry = kern.render(x, ctrl=stp.finish())
            else:
                y, carry = kern.render(x)    # fused device @block
            outs[node.name][:, :] = y
            kern.writeback(carry, plug.state)
        self._run_gmem_lockstep(inputs, total, outs, chans)
        return outs

    def _run_gmem_lockstep(self, inputs, total: int, outs, chans) -> None:
        """Joint fused scan for the gmem-coupled device nodes: every
        member's device @block + sample segment steps inside ONE
        lax.scan in host processing order, threading the shared
        segment(s) — sequential same-block gmem visibility, exactly the
        all-shadow graph (see lockstep_gmem_run)."""
        lock = [i for i, e in enumerate(self.node_engines)
                if e == "tpu-lockstep"]
        if not lock:
            return
        import jax

        from ..lowering.specialize import lockstep_gmem_run

        kerns = [self.kernels[i] for i in lock]
        seg_objs: List[object] = []
        seg_ids: List[int] = []
        for i in lock:
            seg = self.hosts[i].attached_gmem
            if seg not in seg_objs:
                seg_objs.append(seg)
            seg_ids.append(seg_objs.index(seg))
        key = (tuple(lock), tuple(seg_ids), total)
        fn = self._lockstep_fns.get(key)
        if fn is None:
            fn = jax.jit(lockstep_gmem_run(kerns, seg_ids, total))
            self._lockstep_fns[key] = fn
        xs = []
        rands = []
        mevs = []
        mns = []
        carries = []
        for j, i in enumerate(lock):
            node, kern = self.nodes[i], kerns[j]
            xs.append(self._node_input(node, chans[node.name], inputs,
                                       0, total))
            rands.append(kern._rand_streams(total, reset=True))
            if kern._devblock.uses_midi_in:
                mev, mn = kern._midi_planes(None, total)
            else:
                rows = -(-total // kern.B) if total else 0
                mev = np.zeros((rows, 1, 4))
                mn = np.zeros((rows,))
            mevs.append(mev)
            mns.append(mn)
            carries.append(kern.initial_carry())
        g0 = tuple(np.asarray(s.cells, dtype=np.float64).copy()
                   for s in seg_objs)
        ys, fcarries, gfin, mos = fn(tuple(carries), tuple(xs),
                                     tuple(rands), tuple(mevs),
                                     tuple(mns), g0)
        for j, i in enumerate(lock):
            node, plug, kern = self.nodes[i], self.plugins[i], kerns[j]
            outs[node.name][:, :] = np.asarray(ys[j])
            # the joint scan owns the shared segment; per-node tails are
            # stale (they miss later nodes' same-block writes)
            kern.writeback(fcarries[j], plug.state, sync_gmem=False)
            if mos[j] is not None:
                kern.last_midi_out = kern._decode_midi_out(
                    np.asarray(mos[j]))
        for seg, gf in zip(seg_objs, gfin):
            gnp = np.asarray(gf, dtype=np.float64)
            old = np.asarray(seg.cells, dtype=np.float64)
            n = min(len(old), len(gnp))
            changed = np.nonzero(old[:n] != gnp[:n])[0]
            seg.cells[:n] = gnp[:n]
            if changed.size:
                # COARSE attribution: the joint scan collapses all blocks
                # into one device render, so the per-writer-per-block
                # page_seq cadence of the all-shadow schedule is not
                # recoverable post-hoc.  Bump once per member in node
                # order over the changed span — page_writer ends as the
                # LAST lockstep member (the schedule's final writer) and
                # page_seq advances once per member instead of once per
                # member per block.  Host-side change detection (seq
                # monotonicity) stays sound; exact seq values differ.
                for i in lock:
                    seg.bump(int(changed.min()), int(changed.max()),
                             getattr(self.hosts[i], "instance_id_int", 0))
