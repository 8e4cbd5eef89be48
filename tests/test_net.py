import asyncio

import numpy as np
import pytest

from garden_tpu.net.protocol import (
    FrameDecoder,
    NetRigidbody,
    StreamInput,
    StreamOutput,
    decode_body_snapshot,
    encode_body_snapshot,
    frame_message,
)
from garden_tpu.net.transport import StreamClient, StreamServer


def test_stream_roundtrip():
    out = StreamOutput()
    out.write_u8(7)
    out.write_u32(123456)
    out.write_f32(3.25)
    out.write_vec3((1.0, 2.0, 3.0))
    out.write_quat((0.0, 0.0, 0.0, 1.0))
    out.write_string("héllo")
    inp = StreamInput(out.data())
    assert inp.read_u8() == 7
    assert inp.read_u32() == 123456
    assert inp.read_f32() == 3.25
    assert inp.read_vec3() == (1.0, 2.0, 3.0)
    assert inp.read_quat() == (0.0, 0.0, 0.0, 1.0)
    assert inp.read_string() == "héllo"
    assert inp.remaining() == 0


def test_frame_decoder_partial_chunks():
    msg1 = frame_message("p", b"payload-one")
    msg2 = frame_message("c", b"x")
    stream = msg1 + msg2
    dec = FrameDecoder()
    got = []
    # feed byte by byte (worst-case fragmentation)
    for i in range(len(stream)):
        got.extend(dec.feed(stream[i:i + 1]))
    assert got == [("p", b"payload-one"), ("c", b"x")]


def test_body_snapshot_roundtrip():
    bodies = [
        NetRigidbody(uid=i, position=(i, 2.0, 3.0),
                     rotation=(0, 0, 0, 1),
                     linear_velocity=(0.1, 0.2, 0.3),
                     angular_velocity=(0, 0, 0))
        for i in range(5)
    ]
    decoded = decode_body_snapshot(encode_body_snapshot(bodies))
    assert len(decoded) == 5
    assert decoded[3].uid == 3
    np.testing.assert_allclose(decoded[3].position, (3.0, 2.0, 3.0))


def test_client_server_echo():
    async def run():
        server = StreamServer()
        received = []

        def on_ping(session, t, payload):
            received.append(payload)
            session.send("o", payload[::-1])

        server.register("p", on_ping)
        await server.start()

        client = StreamClient()
        replies = []
        client.register("o", lambda s, t, p: replies.append(p))
        await client.connect("127.0.0.1", server.port)
        client.send("p", b"abc")
        await client.writer.drain()
        for _ in range(20):
            await client.poll()
            if replies:
                break
        await client.close()
        await server.stop()
        assert received == [b"abc"]
        assert replies == [b"cba"]

    asyncio.run(run())


def test_udp_datagram_endpoint():
    """UDP datagram path (nets datagram sends, network/client.hpp:33):
    one datagram = one typed message, unreliable transport contract."""
    import asyncio
    from garden_tpu.net.transport import DatagramEndpoint

    async def run():
        server = DatagramEndpoint()
        got = []
        server.register("s", lambda addr, t, p: got.append((t, p)))
        addr = await server.bind()
        client = DatagramEndpoint()
        await client.bind()
        client.send_to(addr, "s", b"\x01\x02\x03")
        client.send_to(addr, "s", b"hello")
        for _ in range(100):
            if len(got) == 2:
                break
            await asyncio.sleep(0.01)
        client.close()
        server.close()
        return got

    got = asyncio.run(run())
    assert got == [("s", b"\x01\x02\x03"), ("s", b"hello")]
