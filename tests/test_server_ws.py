"""WebSocket log streaming: raw RFC6455 client handshake + frame read
against the in-process server (reference WS /ws/predict/{name})."""

import base64
import os
import socket
import struct
import threading
import time

import pytest


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer
    from server.joligen_api import Handler, log_paths
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address, log_paths
    srv.shutdown()


class _Buffered:
    """Byte-stream reader that tolerates frames arriving with the headers."""

    def __init__(self, sock, initial=b""):
        self.sock = sock
        self.buf = initial

    def read(self, n):
        while len(self.buf) < n:
            chunk = self.sock.recv(4096)
            assert chunk, "connection closed early"
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out


def _read_ws_frame(r):
    hdr = r.read(2)
    ln = hdr[1] & 0x7F
    if ln == 126:
        ln = struct.unpack(">H", r.read(2))[0]
    elif ln == 127:
        ln = struct.unpack(">Q", r.read(8))[0]
    return r.read(ln).decode()


def test_ws_log_stream(server, tmp_path):
    (host, port), log_paths = server
    log = tmp_path / "job.log"
    log.write_text("line one\nline two\n")
    log_paths["wsjob"] = str(log)

    sock = socket.create_connection((host, port), timeout=10)
    key = base64.b64encode(os.urandom(16)).decode()
    req = (f"GET /ws/predict/wsjob HTTP/1.1\r\nHost: {host}\r\n"
           f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
           f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n")
    sock.sendall(req.encode())
    # response headers (frames may already trail in the same packet)
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += sock.recv(1024)
    head, rest = resp.split(b"\r\n\r\n", 1)
    head = head.decode()
    assert "101" in head.splitlines()[0]
    assert "Sec-WebSocket-Accept" in head

    r = _Buffered(sock, rest)
    lines = [_read_ws_frame(r), _read_ws_frame(r)]
    assert lines == ["line one", "line two"]

    # appended lines stream too
    with open(log, "a") as f:
        f.write("line three\n")
    assert _read_ws_frame(r) == "line three"
    sock.close()
