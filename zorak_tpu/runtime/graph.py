"""Multi-instance render graph: colocated plugin instances exchanging
messages/gmem block-synchronously, the offline analog of multiple plugin
instances in one DAW session (ref: docs/DSP-JSFX-Communication.md).

Processing order per block mirrors the host: for each instance —
begin_block (materialize inbox), process_block (@block + samples),
end_block (flush outbox).  Messages sent in block k become visible to
every instance at block k+1 (and to instances later in the processing
order never earlier than their own begin_block, exactly like the
shared-memory ring's block-resolved visibility).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..comm import CommWorld, InstanceComm
from ..ir.program import PluginProgram
from ..shadow import compile_shadow


@dataclass
class GraphNode:
    name: str
    program: PluginProgram
    sliders: Dict[int, float] = field(default_factory=dict)
    input_key: Optional[str] = None     # which named input feeds this node


class RenderGraph:
    def __init__(self, srate: float = 48000.0, block_size: int = 512):
        self.srate = float(srate)
        self.block_size = int(block_size)
        self.world = CommWorld()
        self.nodes: List[GraphNode] = []
        self.plugins = []
        self.hosts: List[InstanceComm] = []

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
        return host

    def init_all(self) -> None:
        for plug in self.plugins:
            plug.run_init()
            plug.run_slider()

    def run(self, inputs: Dict[str, np.ndarray], total: Optional[int] = None
            ) -> Dict[str, np.ndarray]:
        """inputs: name -> float32 [ch, samples]; returns per-node outputs."""
        if total is None:
            total = max((a.shape[1] for a in inputs.values()), default=0)
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
                ch = chans[node.name]
                src = inputs.get(node.input_key or node.name)
                if src is None:
                    x = np.zeros((ch, stop - start), dtype=np.float32)
                else:
                    x = np.zeros((ch, stop - start), dtype=np.float32)
                    c = min(ch, src.shape[0])
                    seg = src[:c, start:stop]
                    x[:c, : seg.shape[1]] = seg
                host.begin_block(plug.state)
                plug.process_block(x, outs[node.name][:, start:stop])
                host.end_block(plug.state)
        return outs
