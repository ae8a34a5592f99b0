"""Comm layer: message bus + gmem with block-synchronous semantics,
driven through real JSFX plugin instances (the in-process analog of the
reference's ipc_probe two-instance smoke test)."""
import numpy as np
import pytest

from zorak_tpu.comm import CommWorld, InstanceComm, RING_CAPACITY
from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.runtime.graph import RenderGraph

SENDER_SRC = """\
slider1:#bus="probe"<string>Bus Name
@init
comm_join(#bus);
msg_subscribe("ctl");
gmem_attach(#bus);
seq = 0;
@block
seq += 1;
msg_send("ctl", 42, seq, seq*2, 0, 0);
gmem[5] = seq;
peers = msg_peer_count("ctl", 1);
@sample
spl0 = spl0;
"""

RECEIVER_SRC = """\
slider1:#bus="probe"<string>Bus Name
@init
comm_join(#bus);
msg_subscribe("ctl");
gmem_attach(#bus);
rx_count = 0; rx_seq = 0; rx_tag = 0; last_b = 0;
@block
while (msg_recv("ctl", src, tag, a, b, c, d)) (
  rx_count += 1;
  rx_seq = a;
  rx_tag = tag;
  last_b = b;
  sender_id = src;
);
g5 = gmem[5];
dropped = msg_dropped("ctl");
@sample
spl0 = spl0;
"""


class TestBusDirect:
    def test_block_synchronous_delivery(self):
        g = RenderGraph(block_size=64)
        tx = g.add("tx", compile_plugin_source(SENDER_SRC))
        g.add("rx", compile_plugin_source(RECEIVER_SRC))
        g.init_all()
        x = np.zeros((1, 64 * 4), dtype=np.float32)
        g.run({"tx": x, "rx": x})
        rx_state = g.plugins[1].state
        tx_state = g.plugins[0].state
        # after 4 blocks the sender emitted 4 messages; the rx node runs
        # after tx in the schedule, so each block's message is already in
        # the ring when rx materializes its inbox (block-resolved
        # visibility: sends become visible at the receiver's next inbox
        # materialization after the sender's flush)
        assert tx_state.V["seq"] == 4.0
        assert rx_state.V["rx_count"] == 4.0
        assert rx_state.V["rx_seq"] == 4.0
        assert rx_state.V["rx_tag"] == 42.0
        assert rx_state.V["last_b"] == 8.0
        assert rx_state.V["sender_id"] == tx.instance_id_value

    def test_gmem_shared_and_peers(self):
        g = RenderGraph(block_size=32)
        g.add("tx", compile_plugin_source(SENDER_SRC))
        g.add("rx", compile_plugin_source(RECEIVER_SRC))
        g.init_all()
        x = np.zeros((1, 32 * 3), dtype=np.float32)
        g.run({"tx": x, "rx": x})
        rx_state = g.plugins[1].state
        tx_state = g.plugins[0].state
        # gmem[5] written by sender earlier in the same block IS visible
        # (shared random-access state, not block-latched)
        assert rx_state.V["g5"] == 3.0
        assert tx_state.V["peers"] == 1.0  # rx subscribes, no-self
        assert rx_state.V["dropped"] == 0.0

    def test_different_bus_isolated(self):
        g = RenderGraph(block_size=32)
        g.add("tx", compile_plugin_source(SENDER_SRC))
        g.add("rx", compile_plugin_source(RECEIVER_SRC), sliders={})
        # move receiver to another bus by changing its string slider default
        other = compile_plugin_source(RECEIVER_SRC.replace('"probe"', '"other"'))
        g2 = RenderGraph(block_size=32)
        g2.add("tx", compile_plugin_source(SENDER_SRC))
        g2.add("rx", other)
        g2.init_all()
        x = np.zeros((1, 96), dtype=np.float32)
        g2.run({"tx": x, "rx": x})
        assert g2.plugins[1].state.V["rx_count"] == 0.0

    def test_sendto_direct(self):
        src_tx = ("@init\ncomm_join(\"d\");\n"
                  "@block\ntarget > 0 ? msg_sendto(target, \"x\", 7, 1, 2, 3, 4);\n")
        src_rx = ("@init\ncomm_join(\"d\");\nmsg_subscribe(\"x\");\n"
                  "@block\nwhile (msg_recv(\"x\", s, t, a, b, c, d)) ( got = t; );\n")
        g = RenderGraph(block_size=16)
        g.add("tx", compile_plugin_source(src_tx))
        rx_host = g.add("rx", compile_plugin_source(src_rx))
        g.init_all()
        g.plugins[0].state.V["target"] = rx_host.instance_id_value
        x = np.zeros((1, 48), dtype=np.float32)
        g.run({"tx": x, "rx": x})
        assert g.plugins[1].state.V["got"] == 7.0

    def test_buffer_messages(self):
        src_tx = ("@init\ncomm_join(\"d\");\nbuf = 100;\n"
                  "i = 0; loop(8, buf[i] = 10 + i; i += 1;);\n"
                  "@block\nmsg_send_buf(\"data\", 3, buf, 8);\n")
        src_rx = ("@init\ncomm_join(\"d\");\nmsg_subscribe(\"data\");\nrb = 500;\n"
                  "@block\n"
                  "k = msg_kind(\"data\");\n"
                  "n = msg_recv_buf(\"data\", s, t, rb, 64);\n"
                  "n > 0 ? ( got_n = n; got_first = rb[0]; got_last = rb[7]; got_kind = k; );\n")
        g = RenderGraph(block_size=16)
        g.add("tx", compile_plugin_source(src_tx))
        g.add("rx", compile_plugin_source(src_rx))
        g.init_all()
        x = np.zeros((1, 48), dtype=np.float32)
        g.run({"tx": x, "rx": x})
        rx = g.plugins[1].state
        assert rx.V["got_n"] == 8.0
        assert rx.V["got_first"] == 10.0 and rx.V["got_last"] == 17.0
        assert rx.V["got_kind"] == 2.0

    def test_ring_overflow_drop_accounting(self):
        world = CommWorld()
        a = InstanceComm(world)
        b = InstanceComm(world)

        class FakeState:
            strings_by_handle = {1 << 40: "ch"}
            handles_by_string = {"ch": 1 << 40}

            def string_for_handle(self, h):
                return self.strings_by_handle.get(int(h))

        st = FakeState()
        b.msg_subscribe(st, float(1 << 40))
        for i in range(RING_CAPACITY + 100):
            a.msg_send(st, float(1 << 40), 1.0, float(i), 0, 0, 0)
        a.end_block()
        b.begin_block()
        assert b.dropped.get("ch", 0) == 100
        assert b.msg_avail(st, float(1 << 40)) == float(RING_CAPACITY)

    def test_peer_name_uid(self):
        src_a = ('@init\ncomm_join("d");\ninstance_set_name("alpha");\n'
                 'msg_subscribe("c");\n')
        src_b = ('@init\ncomm_join("d");\nmsg_subscribe("c");\n'
                 "@block\n"
                 'pid = msg_peer_id("c", 1, 0);\n'
                 "pid > 0 ? (\n"
                 "  ok_name = msg_peer_name(pid, #pname);\n"
                 "  ok_uid = msg_peer_uid(pid, #puid);\n"
                 "  nlen = strlen(#pname);\n"
                 "  alive = msg_peer_alive(pid);\n"
                 ");\n")
        g = RenderGraph(block_size=16)
        g.add("a", compile_plugin_source(src_a))
        g.add("b", compile_plugin_source(src_b))
        g.init_all()
        x = np.zeros((1, 16), dtype=np.float32)
        g.run({"a": x, "b": x})
        st = g.plugins[1].state
        assert st.V["ok_name"] == 1.0 and st.V["ok_uid"] == 1.0
        assert st.V["nlen"] == 5.0  # "alpha"
        assert st.V["alive"] == 1.0

    def test_reference_ipc_probe_compiles_and_runs(self, reference_root):
        from zorak_tpu.ir import load_plugin_file
        probe = reference_root / "tests/dsp-jsfx-comm/ipc_probe.jsfx"
        prog = load_plugin_file(probe)
        g = RenderGraph(block_size=64)
        g.add("p1", prog, sliders={1: 1.0})  # role sender (slider2)
        g.add("p2", prog, sliders={1: 2.0})  # role receiver
        g.init_all()
        x = np.zeros((2, 64 * 8), dtype=np.float32)
        outs = g.run({"p1": x, "p2": x})
        for y in outs.values():
            assert np.all(np.isfinite(y))
