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


def _sections_touch_comm(program: PluginProgram) -> bool:
    """True when any DSP section (slider/block/sample) reads or writes the
    shared world: msg_*/comm builtins or the gmem segment.  @init-time
    joins/attaches already ran on the host before kernels build, so they
    don't count."""
    from ..frontend.astnodes import CallExpr, Mem, Name, walk
    from ..lowering.devgen import DeviceSection

    fns = DeviceSection._COMM_FNS | DeviceSection._GMEM_FNS
    seen: set = set()

    def scan(nodes) -> bool:
        for root in nodes:
            for n in walk(root):
                if isinstance(n, Mem) and isinstance(n.base, Name) \
                        and n.base.ident == "gmem":
                    return True
                if isinstance(n, CallExpr):
                    if n.func in fns:
                        return True
                    if n.func in program.fn_defs and n.func not in seen:
                        seen.add(n.func)
                        if scan([program.fn_defs[n.func].body]):
                            return True
        return False

    return any(scan(program.sections.get(s) or [])
               for s in ("slider", "block", "sample"))


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

        for i, (node, plug, host) in enumerate(
                zip(self.nodes, self.plugins, self.hosts)):
            nch = max(1, node.program.io_channels["process"])
            try:
                kern = specialize_sample_kernel(
                    node.program, plug.state, nch,
                    block_size=self.block_size)
                if kern.coupled and _sections_touch_comm(node.program):
                    # a device @block that reads or writes the bus would
                    # need its comm traffic staged per block in lockstep
                    # with the other nodes; such nodes keep the shadow
                    raise SpecializeError(
                        "coupled @block touching the bus: graph lockstep "
                        "needs the host-trajectory (uncoupled) form")
                # comm-free coupled nodes are graph-legal: their control
                # neither reads nor writes the shared world, so the fused
                # device pipeline renders them independently while their
                # begin/end block bookkeeping stays in lockstep (ref:
                # DspJsfxMessageBus.cpp:529,609 — the reference bus
                # connects native instances of every plugin)
                self.kernels[i] = kern
                self.node_engines[i] = "tpu-vector"
            except SpecializeError as exc:
                self.spec_errors[node.name] = str(exc)
            # DROP (not flush) any probe-time sends buffered in the outbox
            host.outbox.clear()

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
            if kern is None:
                continue
            x = self._node_input(node, chans[node.name], inputs, 0, total)
            if stp is not None:
                y, carry = kern.render(x, ctrl=stp.finish())
            else:
                y, carry = kern.render(x)    # fused device @block
            outs[node.name][:, :] = y
            kern.writeback(carry, plug.state)
        return outs
