"""Message-bus traffic between COUPLED device nodes rides the joint
lockstep scan (VERDICT r4 #5): each member's @block sends land in a heap
OUT table the scan publishes to a threaded ring window, and matched
entries stage into per-channel heap FIFO queues at the member's
begin-block point — block-resolved delivery identical to the all-shadow
graph (ref: src/DspJsfxMessageBus.cpp:529,609 block-synchronous
enqueue/materialize; docs/DSP-JSFX-Communication.md)."""
import numpy as np

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.runtime.graph import RenderGraph

# coupled (@block reads @sample-written acc) + bus-coupled: each member
# broadcasts its block meter and gains against the peer's last meter.
# Delivery order is the discriminator: node b (later in host order) sees
# node a's block-k message IN block k, node a sees b's in block k+1.
MSG_SRC = """\
@init
msg_subscribe("meter");
peer = 0;
nrecv = 0;
@block
avg = acc / max(samplesblock, 1);
msg_send("meter", 7, avg, instance_id(), 0, 0);
rx = msg_recv("meter", src, tg, pa, pb, pc, pd);
rx ? ( peer = pa; psrc = src; nrecv += 1; );
navail = msg_avail("meter");
g = 1 / (1 + 4 * peer);
acc = 0;
@sample
acc += abs(spl0);
spl0 = spl0 * g;
spl1 = spl1 * g;
"""

STATE_VARS = ("g", "peer", "psrc", "nrecv", "navail", "avg", "acc", "rx")


def _run_pair(prefer, n, renders=1, src=MSG_SRC):
    prog = compile_plugin_source(src)
    g = RenderGraph(block_size=64, prefer=prefer)
    g.add("a", prog)
    g.add("b", prog)
    g.init_all()
    rng = np.random.RandomState(11)
    outs = None
    for _ in range(renders):
        x = (rng.randn(2, n) * 0.4).astype(np.float32)
        outs = g.run({"a": x, "b": x})
    return g, outs


class TestMsgLockstep:
    def test_msg_coupled_pair_joint_lockstep_scan(self):
        n = 64 * 6 + 17          # exercise the remainder step too
        gs, outs_s = _run_pair("shadow", n)
        gd, outs_d = _run_pair("auto", n)
        assert gd.node_engines == ["tpu-lockstep", "tpu-lockstep"], \
            (gd.node_engines, gd.spec_errors)
        for name in ("a", "b"):
            assert np.array_equal(outs_s[name], outs_d[name]), name
        assert np.abs(outs_d["a"]).max() > 0.0
        # message-for-message: receive counts/payloads evolved exactly as
        # the all-shadow schedule (b hears a same-block, a one block late)
        for i in range(2):
            vs = gs.plugins[i].state.V
            vd = gd.plugins[i].state.V
            for k in STATE_VARS:
                assert abs(vs.get(k, 0.0) - vd.get(k, 0.0)) <= 1e-12, \
                    (i, k, vs.get(k), vd.get(k))
        # 7 blocks: b received 7 (same-block), a received 6 (one late)
        assert gd.plugins[1].state.V["nrecv"] == 7.0
        assert gd.plugins[0].state.V["nrecv"] == 6.0
        # ring writeback: the final window replayed into the host ring
        # with cursors caught up (begin_block would deliver only what the
        # shadow's would)
        dom_s = gs.hosts[0].domain
        dom_d = gd.hosts[0].domain
        tail_s = [(m.sender, m.channel, m.tag, m.scalars)
                  for m in list(dom_s.ring)[-2:]]
        tail_d = [(m.sender, m.channel, m.tag, m.scalars)
                  for m in list(dom_d.ring)[-2:]]
        assert tail_s == tail_d

    def test_msg_lockstep_resumes_across_renders(self):
        # undelivered window entries + cursors must carry across run()
        # calls (a's pending block-late message is the carrier)
        n = 64 * 3
        gs, _ = _run_pair("shadow", n, renders=2)
        gd, _ = _run_pair("auto", n, renders=2)
        assert gd.node_engines == ["tpu-lockstep", "tpu-lockstep"], \
            gd.spec_errors
        for i in range(2):
            vs = gs.plugins[i].state.V
            vd = gd.plugins[i].state.V
            for k in ("nrecv", "peer", "psrc"):
                assert abs(vs.get(k, 0.0) - vd.get(k, 0.0)) <= 1e-12, \
                    (i, k, vs.get(k), vd.get(k))

    def test_msg_sendto_direct(self):
        # direct sends by instance id (and: a broadcast is NOT delivered
        # to its sender even when subscribed)
        src = MSG_SRC.replace(
            'msg_send("meter", 7, avg, instance_id(), 0, 0);',
            'tgt = instance_id() == 1 ? 2 : 1;\n'
            'msg_sendto(tgt, "meter", 9, avg, instance_id(), 0, 0);')
        n = 64 * 4
        gs, outs_s = _run_pair("shadow", n, src=src)
        gd, outs_d = _run_pair("auto", n, src=src)
        assert gd.node_engines == ["tpu-lockstep", "tpu-lockstep"], \
            gd.spec_errors
        for name in ("a", "b"):
            assert np.array_equal(outs_s[name], outs_d[name]), name
        for i in range(2):
            vs = gs.plugins[i].state.V
            vd = gd.plugins[i].state.V
            for k in STATE_VARS:
                assert abs(vs.get(k, 0.0) - vd.get(k, 0.0)) <= 1e-12, \
                    (i, k, vs.get(k), vd.get(k))

    def test_msg_host_path_node_demotes(self):
        # an UNCOUPLED node on the same channel runs its bus traffic on
        # the host in phase 1 — the coupled members must not ride a scan
        # that would reorder delivery; all fall back, outputs still match
        uncoupled = compile_plugin_source(
            "@init\nmsg_subscribe(\"meter\");\n"
            "@block\nwhile (msg_recv(\"meter\", s, t, a, b, c, d)) "
            "( heard += 1; );\n"
            "@sample\nspl0 = spl0 * 0.5;\nspl1 = spl1 * 0.5;\n")
        n = 64 * 3
        res = {}
        for prefer in ("shadow", "auto"):
            prog = compile_plugin_source(MSG_SRC)
            g = RenderGraph(block_size=64, prefer=prefer)
            g.add("a", prog)
            g.add("w", uncoupled)
            g.init_all()
            rng = np.random.RandomState(13)
            x = (rng.randn(2, n) * 0.3).astype(np.float32)
            res[prefer] = (g, g.run({"a": x, "w": x}))
        gd = res["auto"][0]
        assert gd.node_engines[0] == "cpu-shadow", \
            (gd.node_engines, gd.spec_errors)
        assert "host-path" in gd.spec_errors.get("a", "")
        for name in ("a", "w"):
            assert np.array_equal(res["shadow"][1][name],
                                  res["auto"][1][name]), name
        hs = res["shadow"][0].plugins[1].state.V.get("heard", 0.0)
        hd = res["auto"][0].plugins[1].state.V.get("heard", 0.0)
        assert hs == hd and hs > 0.0

    def test_solo_msg_member_rides_lockstep(self):
        # a lone coupled sender broadcasts to nobody: window compacts
        # every block, no overflow, output matches the shadow
        src = """\
@init
x = 0;
@block
avg = acc / max(samplesblock, 1);
msg_send("tap", 1, avg, 0, 0, 0);
g = 1 / (1 + avg);
acc = 0;
@sample
acc += abs(spl0);
spl0 = spl0 * g;
spl1 = spl1 * g;
"""
        prog = compile_plugin_source(src)
        res = {}
        n = 64 * 5
        for prefer in ("shadow", "auto"):
            g = RenderGraph(block_size=64, prefer=prefer)
            g.add("solo", prog)
            g.init_all()
            rng = np.random.RandomState(7)
            x = (rng.randn(2, n) * 0.3).astype(np.float32)
            res[prefer] = (g, g.run({"solo": x}))
        gd = res["auto"][0]
        assert gd.node_engines == ["tpu-lockstep"], \
            (gd.node_engines, gd.spec_errors)
        assert np.array_equal(res["shadow"][1]["solo"],
                              res["auto"][1]["solo"])
