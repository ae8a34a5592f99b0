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


def _msg_in_section(program: PluginProgram, section: str) -> bool:
    """Does `section` (or a function it calls) touch the message bus?"""
    from ..frontend.astnodes import CallExpr, walk
    from ..lowering.devgen import DeviceSection

    seen: set = set()
    hit = [False]

    def scan(nodes) -> None:
        for root in nodes:
            for n in walk(root):
                if isinstance(n, CallExpr):
                    if n.func in DeviceSection._COMM_FNS:
                        hit[0] = True
                    elif n.func in program.fn_defs and n.func not in seen:
                        seen.add(n.func)
                        scan([program.fn_defs[n.func].body])
    scan(program.sections.get(section) or [])
    return hit[0]


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
                    # device @block bus traffic rides the joint lockstep
                    # scan via staged ring planes (VERDICT r4 #5) —
                    # provided the kernel baked the msg staging regions
                    # (devgen MsgConfig) and the bus is only touched at
                    # block rate (planes stage at begin-block points)
                    if _msg_in_section(node.program, "sample"):
                        raise SpecializeError(
                            "coupled node touches the bus in @sample: "
                            "lockstep stages msg planes at block rate "
                            "only")
                    if getattr(kern._devblock, "msg_out_cells", 0) == 0:
                        raise SpecializeError(
                            "coupled @block touching the bus: kernel "
                            "built without device msg staging")
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
                if kern.coupled and (msg_t or (
                        gmem_t and host.attached_gmem is not None)):
                    self.node_engines[i] = "tpu-lockstep"
                else:
                    self.node_engines[i] = "tpu-vector"
            except SpecializeError as exc:
                self.spec_errors[node.name] = str(exc)
            # DROP (not flush) any probe-time sends buffered in the outbox
            host.outbox.clear()
        # group resolution to a fixpoint: a gmem demote can strand a msg
        # group (the demoted node's bus traffic now runs host-side) and
        # vice versa, so alternate the passes until neither demotes
        while True:
            c1 = self._resolve_gmem_groups()
            c2 = self._resolve_msg_groups()
            if not (c1 or c2):
                break

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
        changed = False
        for sid, members in seg_touchers.items():
            if seg_outside.get(sid):
                for i in members:
                    self.kernels[i] = None
                    self.node_engines[i] = "cpu-shadow"
                    self.spec_errors[self.nodes[i].name] = (
                        "shared gmem segment also touched by a host-path "
                        "node: joint lockstep scan cannot include it")
                    changed = True
        return changed

    def _resolve_msg_groups(self) -> bool:
        """Per comm DOMAIN: either every msg-touching node (DSP sections)
        rides the joint lockstep scan, or none does — a host-path node's
        sends/receives interleave with phase 1 while the scan replays all
        blocks in phase 2, which would break block-resolved delivery
        ordering (ref: src/DspJsfxMessageBus.cpp:529,609)."""
        dom_members: Dict[int, List[int]] = {}
        dom_outside: Dict[int, bool] = {}
        for i, (node, host) in enumerate(zip(self.nodes, self.hosts)):
            msg_t, _gm = _comm_touch(node.program)
            if not msg_t:
                continue
            did = id(host.domain)
            kern = self.kernels[i]
            if self.node_engines[i] == "tpu-lockstep" \
                    and kern is not None \
                    and getattr(kern._devblock, "msg_out_cells", 0) > 0:
                dom_members.setdefault(did, []).append(i)
            else:
                dom_outside[did] = True
        changed = False
        for did, members in dom_members.items():
            if dom_outside.get(did):
                for i in members:
                    self.kernels[i] = None
                    self.node_engines[i] = "cpu-shadow"
                    self.spec_errors[self.nodes[i].name] = (
                        "message bus also touched by a host-path node: "
                        "joint lockstep scan cannot include it")
                    changed = True
        # the joint scan threads ONE ring window: keep the first live
        # domain (node order), demote the rest honestly
        live = [d for d, m in dom_members.items() if not dom_outside.get(d)]
        for did in live[1:]:
            for i in dom_members[did]:
                self.kernels[i] = None
                self.node_engines[i] = "cpu-shadow"
                self.spec_errors[self.nodes[i].name] = (
                    "second comm domain with device msg members: the "
                    "joint scan threads one ring window per render")
                changed = True
        return changed

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
        msg_lock = [self.node_engines[i] == "tpu-lockstep"
                    and self.kernels[i] is not None
                    and getattr(self.kernels[i]._devblock,
                                "msg_out_cells", 0) > 0
                    for i in range(len(self.nodes))]
        for start in range(0, total, bs):
            stop = min(start + bs, total)
            for ni, (node, plug, host, kern, stp) in enumerate(zip(
                    self.nodes, self.plugins, self.hosts, self.kernels,
                    steppers)):
                if stp is not None:
                    host.begin_block(stp.state)
                    stp.step(stop - start)
                    host.end_block(stp.state)
                elif kern is not None:       # coupled device node
                    if msg_lock[ni]:
                        # the joint scan owns this member's ring
                        # interaction (materialize + publish + cursor);
                        # a phase-1 begin_block would consume the
                        # pending ring entries the scan is staged with
                        continue
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

        from ..lowering.devgen import MSG_OUT_CAP
        from ..lowering.specialize import lockstep_gmem_run

        kerns = [self.kernels[i] for i in lock]
        seg_objs: List[object] = []
        seg_ids: List[int] = []
        for i in lock:
            seg = self.hosts[i].attached_gmem
            _msg_t, gmem_t = _comm_touch(self.nodes[i].program)
            if seg is None or not gmem_t:
                seg_ids.append(-1)
                continue
            if seg not in seg_objs:
                seg_objs.append(seg)
            seg_ids.append(seg_objs.index(seg))

        # message-ring staging (VERDICT r4 #5): members whose kernels
        # baked msg regions thread one ring window through the scan
        msg_members = [j for j, k in enumerate(kerns)
                       if getattr(k._devblock, "msg_out_cells", 0) > 0]
        msg = m0 = None
        dom = None
        if msg_members:
            from types import SimpleNamespace

            from ..comm.bus import KIND_SCALAR, Message

            dom = self.hosts[lock[msg_members[0]]].domain
            reg = getattr(self.world, "msg_chan_ids", None)
            if reg is None:
                reg = self.world.msg_chan_ids = {}

            def intern(name: str) -> int:
                got = reg.get(name)
                if got is None:
                    got = len(reg)
                    reg[name] = got
                return got

            init: List[Message] = []
            for m in dom.ring:
                if m.kind != KIND_SCALAR:
                    raise RuntimeError(
                        "buffer message pending in a device-lockstep "
                        "domain: render via prefer='shadow'")
                intern(m.channel)
                init.append(m)
            for j in msg_members:
                for ch in self.hosts[lock[j]].subscriptions:
                    intern(ch)
            nc = max(1, len(reg))
            W = 2 * len(msg_members) * MSG_OUT_CAP + len(init)
            my_ids = [float(self.hosts[lock[j]].instance_id_value)
                      if j in msg_members else 0.0
                      for j in range(len(kerns))]
            sub_masks = np.zeros((len(kerns), nc), dtype=bool)
            for j in msg_members:
                for ch in self.hosts[lock[j]].subscriptions:
                    sub_masks[j, reg[ch]] = True
            msg = SimpleNamespace(W=W, nc=nc, my_ids=my_ids,
                                  sub_masks=sub_masks)
            marr0 = np.zeros((W, 9), dtype=np.float64)
            for g, m in enumerate(init):
                marr0[g] = [float(m.sender),
                            1.0 if m.dest is None else 0.0,
                            0.0 if m.dest is None else float(m.dest),
                            float(reg[m.channel]), m.tag,
                            m.scalars[0], m.scalars[1],
                            m.scalars[2], m.scalars[3]]
            seqs = [m.seq for m in init]
            mc0 = []
            for j in msg_members:
                cur = self.hosts[lock[j]].cursor
                mc0.append(sum(1 for s in seqs if s <= cur))
            m0 = (marr0, np.int32(len(init)),
                  np.asarray(mc0, dtype=np.int32))

        key = (tuple(lock), tuple(seg_ids), total,
               None if msg is None else
               (msg.W, msg.nc, tuple(msg.my_ids),
                msg.sub_masks.tobytes()))
        fn = self._lockstep_fns.get(key)
        if fn is None:
            fn = jax.jit(lockstep_gmem_run(kerns, seg_ids, total,
                                           msg=msg))
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
        ys, fcarries, gfin, mos, msg_fin = fn(
            tuple(carries), tuple(xs), tuple(rands), tuple(mevs),
            tuple(mns), g0, m0)
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
        if msg is not None and msg_fin is not None:
            self._msg_lockstep_writeback(dom, lock, kerns, msg_members,
                                         fcarries, msg_fin)

    def _msg_lockstep_writeback(self, dom, lock, kerns, msg_members,
                                fcarries, msg_fin) -> None:
        """Post-render ring reconciliation: refuse capacity overflows
        (the shadow ring/inbox never drop at these scales — an overflow
        would be a silent semantic deviation), then replay the final
        window into the host ring with fresh seqs and advance member
        cursors, so subsequent renders (and host-side inspection) see
        the block-accurate end state."""
        from ..comm.bus import KIND_SCALAR, Message

        marr, mn, mc, ovf = msg_fin
        if float(ovf) > 0.0:
            raise RuntimeError(
                "device msg lockstep: ring window overflow "
                f"({float(ovf):.0f} entries) — raise MSG_OUT_CAP/window")
        for j in msg_members:
            dev = kerns[j]._devblock
            drops = float(np.asarray(
                fcarries[j][2])[dev.msg_in_base])
            if drops > 0.0:
                raise RuntimeError(
                    f"device msg lockstep: node {self.nodes[lock[j]].name}"
                    f" dropped {drops:.0f} staged messages — raise "
                    "MSG_QUEUE_CAP/MSG_OUT_CAP")
        reg = getattr(self.world, "msg_chan_ids", {})
        names = {cid: name for name, cid in reg.items()}
        marr = np.asarray(marr, dtype=np.float64)
        n = int(mn)
        dom.ring.clear()
        new_seqs = []
        for g in range(n):
            row = marr[g]
            seq = next(dom.next_seq)
            new_seqs.append(seq)
            dom.ring.append(Message(
                seq=seq, sender=int(row[0]),
                dest=None if row[1] > 0.5 else int(row[2]),
                channel=names.get(int(row[3]), repr(float(row[3]))),
                tag=float(row[4]), kind=KIND_SCALAR,
                scalars=(float(row[5]), float(row[6]),
                         float(row[7]), float(row[8]))))
        mc_np = np.asarray(mc)
        for pos, j in enumerate(msg_members):
            c = int(mc_np[pos])
            host = self.hosts[lock[j]]
            host.cursor = new_seqs[c - 1] if c > 0 else (
                new_seqs[0] - 1 if new_seqs else host.cursor)
