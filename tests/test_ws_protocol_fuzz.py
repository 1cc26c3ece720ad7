"""WS protocol fuzz/hardening: the server-side frame layer must never hang
or crash on hostile bytes (round-3 VERDICT weak #5).

Covers: fragmented text reassembly, control frames interleaved inside a
fragmented message, data frames interleaved into an unfinished message
(RFC 6455 5.4 violation), oversized declared lengths (single and
cumulative — rejected BEFORE buffering), abrupt EOF at every protocol
stage, reserved opcodes, orphan continuations, masked payload decode, the
close handshake, and a randomized garbage-byte sweep under a hard timeout.

Tested limits (documenting ws_protocol.py:8-10): no permessage-deflate; a
fragmented message is reassembled up to max_frame_bytes total.
"""

import asyncio
import struct

import numpy as np
import pytest

from keisei_tpu.server.ws_protocol import (
    OP_BINARY,
    OP_CLOSE,
    OP_CONT,
    OP_PING,
    OP_PONG,
    OP_TEXT,
    WebSocket,
    WebSocketClosed,
    encode_frame,
)


class FakeWriter:
    """Captures written bytes; quacks like asyncio.StreamWriter."""

    def __init__(self):
        self.sent = b""
        self.closed = False

    def write(self, data: bytes) -> None:
        self.sent += data

    async def drain(self) -> None:
        pass

    def close(self) -> None:
        self.closed = True


def drive(data: bytes, eof: bool = True, max_frame_bytes: int = 1 << 20,
          timeout: float = 5.0, nrecv: int = 1):
    """Feed `data` to a server WebSocket inside one event loop and recv
    `nrecv` times under a hard timeout (a hang IS the failure under test).
    Returns (messages, exception_or_None, ws, writer)."""

    async def go():
        reader = asyncio.StreamReader()
        reader.feed_data(data)
        if eof:
            reader.feed_eof()
        writer = FakeWriter()
        ws = WebSocket(reader, writer, max_frame_bytes=max_frame_bytes)
        results, exc = [], None
        try:
            for _ in range(nrecv):
                results.append(await asyncio.wait_for(ws.recv(), timeout))
        except (WebSocketClosed, ConnectionError) as e:
            exc = e
        return results, exc, ws, writer

    return asyncio.run(go())


def masked_frame(opcode: int, payload: bytes, fin: bool = True,
                 mask: bytes = b"\x01\x02\x03\x04") -> bytes:
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


class TestReassembly:
    def test_fragmented_text_reassembled(self):
        data = (encode_frame(OP_TEXT, b"hel", fin=False)
                + encode_frame(OP_CONT, b"lo ", fin=False)
                + encode_frame(OP_CONT, b"world", fin=True))
        msgs, exc, _, _ = drive(data)
        assert exc is None and msgs == [(OP_TEXT, b"hello world")]

    def test_ping_interleaved_in_fragmentation_gets_pong(self):
        data = (encode_frame(OP_TEXT, b"ab", fin=False)
                + encode_frame(OP_PING, b"hb")
                + encode_frame(OP_CONT, b"cd", fin=True))
        msgs, exc, _, writer = drive(data)
        assert exc is None and msgs[0][1] == b"abcd"
        assert encode_frame(OP_PONG, b"hb") in writer.sent

    def test_pong_interleaved_is_ignored(self):
        data = (encode_frame(OP_BINARY, b"\x01", fin=False)
                + encode_frame(OP_PONG, b"x")
                + encode_frame(OP_CONT, b"\x02", fin=True))
        msgs, exc, _, _ = drive(data)
        assert exc is None and msgs == [(OP_BINARY, b"\x01\x02")]

    def test_zero_length_text(self):
        msgs, exc, _, _ = drive(encode_frame(OP_TEXT, b""))
        assert exc is None and msgs == [(OP_TEXT, b"")]

    def test_extended_lengths_16_and_64_bit(self):
        p16 = b"a" * 300            # needs the 126 / 16-bit length form
        p64 = b"b" * 70_000         # needs the 127 / 64-bit length form
        msgs, exc, _, _ = drive(
            encode_frame(OP_TEXT, p16) + encode_frame(OP_TEXT, p64), nrecv=2)
        assert exc is None and msgs == [(OP_TEXT, p16), (OP_TEXT, p64)]

    def test_masked_client_frame_decoded(self):
        payload = bytes(range(37))
        msgs, exc, _, _ = drive(masked_frame(OP_TEXT, payload))
        assert exc is None and msgs == [(OP_TEXT, payload)]


class TestProtocolViolations:
    def test_data_frame_interleaved_into_unfinished_message(self):
        # RFC 6455 5.4: TEXT while a fragmented message is open must fail,
        # not silently drop the half-built message
        data = (encode_frame(OP_TEXT, b"ab", fin=False)
                + encode_frame(OP_TEXT, b"cd", fin=True))
        msgs, exc, ws, _ = drive(data)
        assert isinstance(exc, WebSocketClosed) and ws.closed

    def test_orphan_continuation_rejected(self):
        _, exc, _, _ = drive(encode_frame(OP_CONT, b"zz", fin=True))
        assert isinstance(exc, WebSocketClosed)

    @pytest.mark.parametrize("opcode", [0x3, 0x7, 0xB, 0xF])
    def test_reserved_opcodes_rejected(self, opcode):
        _, exc, _, _ = drive(encode_frame(opcode, b"x"))
        assert isinstance(exc, WebSocketClosed)

    def test_close_frame_echoed_and_raises(self):
        _, exc, ws, writer = drive(
            encode_frame(OP_CLOSE, struct.pack(">H", 1000)))
        assert isinstance(exc, WebSocketClosed) and ws.closed
        assert writer.sent.startswith(bytes([0x80 | OP_CLOSE]))


class TestOversized:
    def test_oversized_declared_length_fails_before_buffering(self):
        # header declares 1 TiB; only the 10-byte header is ever fed, so the
        # reject must happen without awaiting the payload (no hang, no alloc)
        head = bytes([0x80 | OP_TEXT, 127]) + struct.pack(">Q", 1 << 40)
        _, exc, ws, _ = drive(head, eof=False, timeout=2.0)
        assert isinstance(exc, ConnectionError) and ws.closed

    def test_cumulative_fragmented_overflow_rejected(self):
        # each fragment is under the cap; their sum is not
        _, exc, _, _ = drive(
            encode_frame(OP_TEXT, b"a" * 60, fin=False)
            + encode_frame(OP_CONT, b"b" * 60, fin=True),
            max_frame_bytes=100,
        )
        assert isinstance(exc, ConnectionError)

    def test_single_frame_over_cap_rejected(self):
        _, exc, _, _ = drive(encode_frame(OP_TEXT, b"a" * 101),
                             max_frame_bytes=100)
        assert isinstance(exc, ConnectionError)


class TestAbruptClose:
    @pytest.mark.parametrize("cut", [
        b"",                                          # EOF before any byte
        bytes([0x80 | OP_TEXT]),                      # mid 2-byte header
        bytes([0x80 | OP_TEXT, 126, 0x01]),           # mid extended length
        bytes([0x80 | OP_TEXT, 0x80 | 5, 0x01, 0x02]),  # mid mask key
        encode_frame(OP_TEXT, b"abcde")[:4],          # mid payload
        encode_frame(OP_TEXT, b"ab", fin=False),      # EOF mid fragmentation
    ])
    def test_eof_at_every_stage_raises_closed(self, cut):
        _, exc, ws, _ = drive(cut)
        assert isinstance(exc, WebSocketClosed) and ws.closed

    def test_send_after_close_raises(self):
        async def go():
            reader = asyncio.StreamReader()
            reader.feed_eof()
            ws = WebSocket(reader, FakeWriter())
            ws.closed = True
            with pytest.raises(WebSocketClosed):
                await ws.send_text("x")

        asyncio.run(go())


class TestGarbageFuzz:
    def test_random_bytes_never_hang(self):
        # 200 random byte blobs: recv must terminate (message or exception)
        # within the timeout on every one — hanging is the only failure
        rng = np.random.default_rng(0xF02)
        outcomes = {"msg": 0, "err": 0}
        for _ in range(200):
            blob = rng.bytes(int(rng.integers(0, 64)))
            msgs, exc, _, _ = drive(blob, timeout=2.0)
            outcomes["err" if exc is not None else "msg"] += 1
        # overwhelmingly errors; a rare blob can form a valid tiny frame
        assert outcomes["err"] > 150
        assert outcomes["msg"] + outcomes["err"] == 200

    def test_flipped_bits_on_valid_stream_never_hang(self):
        base = (encode_frame(OP_TEXT, b"hello", fin=False)
                + encode_frame(OP_PING, b"p")
                + encode_frame(OP_CONT, b" world", fin=True))
        rng = np.random.default_rng(7)
        for _ in range(200):
            blob = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                blob[int(rng.integers(len(blob)))] ^= 1 << int(rng.integers(8))
            drive(bytes(blob), timeout=2.0)  # must terminate either way
