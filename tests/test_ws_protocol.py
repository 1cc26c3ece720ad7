"""RFC 6455 conformance tests for the in-house WebSocket layer.

The reference leans on Starlette/FastAPI for WS handling and tests the
endpoint behaviors; this build carries its own frame layer
(server/ws_protocol.py), so the protocol itself needs conformance pins:
handshake accept-key (RFC 6455 §1.3 vector), length encodings,
masking, fragmentation with interleaved control frames, close handshake,
and the oversized-frame guard.
"""

import asyncio
import struct

import pytest

from keisei_tpu.server.ws_protocol import (
    OP_CLOSE,
    OP_CONT,
    OP_PING,
    OP_PONG,
    OP_TEXT,
    WebSocket,
    WebSocketClosed,
    accept_key,
    encode_frame,
    handshake_response,
)


class FakeWriter:
    def __init__(self):
        self.sent = bytearray()
        self.closed = False

    def write(self, data: bytes) -> None:
        self.sent += data

    async def drain(self) -> None:
        pass

    def close(self) -> None:
        self.closed = True


def mask_frame(opcode: int, payload: bytes, fin: bool = True,
               mask: bytes = b"\x01\x02\x03\x04") -> bytes:
    """Client-style masked frame."""
    head = bytes([(0x80 if fin else 0) | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([0x80 | n])
    elif n < 65536:
        head += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        head += bytes([0x80 | 127]) + struct.pack(">Q", n)
    body = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    return head + mask + body


def make_ws(data: bytes, **kw):
    """Build inside a running loop (StreamReader binds the current loop)."""
    reader = asyncio.StreamReader()
    reader.feed_data(data)
    reader.feed_eof()
    writer = FakeWriter()
    return WebSocket(reader, writer, **kw), writer


def recv_msg(data: bytes, **kw):
    """One recv() against fed bytes; returns (opcode, payload, writer)."""
    async def go():
        ws, writer = make_ws(data, **kw)
        op, payload = await ws.recv()
        return op, payload, writer

    return asyncio.run(go())


class TestHandshake:
    def test_rfc6455_accept_key_vector(self):
        # RFC 6455 §1.3 worked example
        assert (accept_key("dGhlIHNhbXBsZSBub25jZQ==")
                == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")

    def test_valid_upgrade(self):
        resp = handshake_response({
            "upgrade": "websocket",
            "sec-websocket-key": "dGhlIHNhbXBsZSBub25jZQ==",
        })
        assert resp is not None
        text = resp.decode()
        assert text.startswith("HTTP/1.1 101")
        assert "Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo=" in text

    def test_missing_key_rejected(self):
        assert handshake_response({"upgrade": "websocket"}) is None

    def test_non_websocket_upgrade_rejected(self):
        assert handshake_response({
            "upgrade": "h2c", "sec-websocket-key": "x",
        }) is None


class TestFrameEncoding:
    def test_short_length(self):
        f = encode_frame(OP_TEXT, b"hi")
        assert f == b"\x81\x02hi"

    def test_medium_length_uses_16bit(self):
        payload = b"x" * 200
        f = encode_frame(OP_TEXT, payload)
        assert f[1] == 126
        assert struct.unpack(">H", f[2:4])[0] == 200
        assert f[4:] == payload

    def test_long_length_uses_64bit(self):
        payload = b"x" * 70000
        f = encode_frame(OP_TEXT, payload)
        assert f[1] == 127
        assert struct.unpack(">Q", f[2:10])[0] == 70000

    def test_fin_bit(self):
        assert encode_frame(OP_TEXT, b"a", fin=False)[0] == OP_TEXT
        assert encode_frame(OP_TEXT, b"a", fin=True)[0] == 0x80 | OP_TEXT


class TestRecv:
    def test_masked_text_frame_unmasked(self):
        op, payload, _ = recv_msg(mask_frame(OP_TEXT, b"hello"))
        assert (op, payload) == (OP_TEXT, b"hello")

    def test_unmasked_server_style_frame(self):
        # tolerated (tooling convenience); payload passes through unmasked
        op, payload, _ = recv_msg(encode_frame(OP_TEXT, b"plain"))
        assert (op, payload) == (OP_TEXT, b"plain")

    def test_fragmented_message_reassembled(self):
        data = (mask_frame(OP_TEXT, b"he", fin=False)
                + mask_frame(OP_CONT, b"ll", fin=False)
                + mask_frame(OP_CONT, b"o", fin=True))
        op, payload, _ = recv_msg(data)
        assert (op, payload) == (OP_TEXT, b"hello")

    def test_ping_interleaved_in_fragments_gets_ponged(self):
        data = (mask_frame(OP_TEXT, b"ab", fin=False)
                + mask_frame(OP_PING, b"k33p", fin=True)
                + mask_frame(OP_CONT, b"cd", fin=True))
        _, payload, writer = recv_msg(data)
        assert payload == b"abcd"
        # pong carries the ping payload back (RFC 6455 §5.5.3)
        assert bytes(writer.sent) == encode_frame(OP_PONG, b"k33p")

    def test_pong_frames_ignored(self):
        data = mask_frame(OP_PONG, b"x") + mask_frame(OP_TEXT, b"next")
        _, payload, _ = recv_msg(data)
        assert payload == b"next"

    def test_16bit_length_roundtrip(self):
        payload = bytes(range(256)) * 8  # 2048 bytes
        _, got, _ = recv_msg(mask_frame(OP_TEXT, payload))
        assert got == payload

    def test_close_frame_echoes_code_and_raises(self):
        code = struct.pack(">H", 1001)

        async def go():
            ws, writer = make_ws(mask_frame(OP_CLOSE, code + b"bye"))
            with pytest.raises(WebSocketClosed):
                await ws.recv()
            return ws, writer

        ws, writer = asyncio.run(go())
        assert ws.closed
        # close echo carries the 2-byte code only
        assert bytes(writer.sent) == encode_frame(OP_CLOSE, code)

    def test_unexpected_continuation_rejected(self):
        with pytest.raises(WebSocketClosed):
            recv_msg(mask_frame(OP_CONT, b"orphan"))

    def test_oversized_declared_length_rejected_before_buffering(self):
        # header declares 2 MB; only the header is ever fed — recv must
        # fail on the declaration, not wait for the body
        async def go():
            head = (bytes([0x80 | OP_TEXT, 0x80 | 127])
                    + struct.pack(">Q", 2 << 20))
            reader = asyncio.StreamReader()
            reader.feed_data(head + b"\x01\x02\x03\x04")
            ws = WebSocket(reader, FakeWriter())
            await ws.recv()

        with pytest.raises(ConnectionError, match="exceeds max_frame_bytes"):
            asyncio.run(go())

    def test_cumulative_fragment_overflow_rejected(self):
        """Each fragment under the cap but the total over it must still be
        rejected (memory exhaustion via fragmentation)."""
        chunk = b"x" * 600
        data = (mask_frame(OP_TEXT, chunk, fin=False)
                + mask_frame(OP_CONT, chunk, fin=True))
        with pytest.raises(ConnectionError, match="exceeds max_frame_bytes"):
            recv_msg(data, max_frame_bytes=1000)

    def test_send_after_close_raises(self):
        async def go():
            ws, _ = make_ws(b"")
            await ws.close()
            with pytest.raises(WebSocketClosed):
                await ws.send_text("late")

        asyncio.run(go())

    def test_close_idempotent(self):
        async def go():
            ws, writer = make_ws(b"")
            await ws.close(code=1000)
            await ws.close(code=1000)
            return writer

        writer = asyncio.run(go())
        assert bytes(writer.sent) == encode_frame(
            OP_CLOSE, struct.pack(">H", 1000))


class TestBrokenTransport:
    """Error-path wrappers: a dying TCP connection must surface as
    WebSocketClosed (and flip `closed`), never as a raw ConnectionError
    that would crash the per-client server task."""

    def test_send_on_broken_pipe_raises_websocketclosed(self):
        class BrokenWriter(FakeWriter):
            def write(self, data):
                raise ConnectionResetError("peer vanished")

        async def go():
            reader = asyncio.StreamReader()
            ws = WebSocket(reader, BrokenWriter())
            with pytest.raises(WebSocketClosed):
                await ws.send_text("hi")
            assert ws.closed
            # later sends fail fast without touching the transport
            with pytest.raises(WebSocketClosed):
                await ws.send_json({"a": 1})

        asyncio.run(go())

    def test_read_truncated_mid_frame_raises_websocketclosed(self):
        # declared 16-bit length of 500 but the socket dies after 3 bytes
        data = mask_frame(OP_TEXT, b"x" * 500)[: 4 + 2 + 3]

        async def go():
            ws, _ = make_ws(data)
            with pytest.raises(WebSocketClosed):
                await ws.recv()
            assert ws.closed

        asyncio.run(go())

    def test_close_tolerates_dead_transport(self):
        class BrokenWriter(FakeWriter):
            def write(self, data):
                raise ConnectionResetError("gone")

            def close(self):
                raise RuntimeError("already closed")

        async def go():
            reader = asyncio.StreamReader()
            ws = WebSocket(reader, BrokenWriter())
            await ws.close(code=1001)  # must not raise

        asyncio.run(go())


class TestClientHandshakeFailure:
    def test_non_101_response_raises(self):
        from keisei_tpu.server.ws_protocol import (WebSocketClientError,
                                                   client_connect)

        async def go():
            async def handler(reader, writer):
                await reader.readline()
                writer.write(b"HTTP/1.1 403 Forbidden\r\n\r\n")
                await writer.drain()
                writer.close()

            srv = await asyncio.start_server(handler, "127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            with pytest.raises(WebSocketClientError, match="handshake"):
                await client_connect("127.0.0.1", port, "/ws")
            srv.close()
            await srv.wait_closed()

        asyncio.run(go())
