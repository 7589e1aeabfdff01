"""Asyncio event-loop HTTP frontend.

The reference serves from Drogon's epoll event loop
(src/server/server_lib.cpp:48-53); round 2's stdlib ThreadingHTTPServer
(one OS thread per connection, GIL-serialized header parsing in Python
object soup) measured 23 q/s against a 15.8K q/s device pipeline. This
frontend is the event-loop equivalent: one asyncio loop owns every socket,
parses HTTP/1.1 with two bytes.find calls on a memoryview, and hands
complete (method, path, headers, body) requests to the shared Dispatcher
(serve/handlers.py). Engine calls run on a thread pool — with the
cross-request batcher interposed they just park on a Future while the
batch worker drives the device, so the pool threads cost nothing but a
parked stack.

The C++ epoll frontend (native/pfh_http.cpp via serve/native_server.py)
moves the byte-shuffling off the GIL entirely; this pure-python loop is
the portable middle tier and the fallback when the native build is
unavailable.
"""

from __future__ import annotations

import asyncio
import logging
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

from prefhetch_tpu.serve.handlers import Dispatcher

logger = logging.getLogger("prefhetch.serve")

_MAX_BODY = 1 << 30
_STATUS_LINE = {
    200: b"HTTP/1.1 200 OK\r\n",
    400: b"HTTP/1.1 400 Bad Request\r\n",
    404: b"HTTP/1.1 404 Not Found\r\n",
    405: b"HTTP/1.1 405 Method Not Allowed\r\n",
    409: b"HTTP/1.1 409 Conflict\r\n",
    500: b"HTTP/1.1 500 Internal Server Error\r\n",
}


class AioHTTPServer:
    """Minimal HTTP/1.1 keep-alive server on asyncio streams."""

    def __init__(
        self,
        engine,
        host: str = "0.0.0.0",
        port: int = 8080,
        executor_workers: int = 64,
    ) -> None:
        self.dispatcher = Dispatcher(engine)
        self.host = host
        self.port = port
        # engine calls block (device dispatch or batcher future); park them
        # on a pool so the event loop keeps draining sockets
        self._pool = ThreadPoolExecutor(max_workers=executor_workers)
        self._server: Optional[asyncio.AbstractServer] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._thread: Optional[threading.Thread] = None

    # -- connection handling --------------------------------------------
    async def _handle_conn(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        try:
            while True:
                try:
                    head = await reader.readuntil(b"\r\n\r\n")
                except (asyncio.IncompleteReadError, ConnectionError):
                    break
                except asyncio.LimitOverrunError:
                    break
                try:
                    method, path, headers = self._parse_head(head)
                except ValueError:
                    writer.write(
                        _STATUS_LINE[400] + b"Content-Length: 0\r\n\r\n"
                    )
                    await writer.drain()
                    break
                length = int(headers.get("content-length", 0))
                if length > _MAX_BODY:
                    break
                body = await reader.readexactly(length) if length else b""
                loop = asyncio.get_running_loop()
                status, ctype, payload = await loop.run_in_executor(
                    self._pool, self.dispatcher.handle,
                    method, path, headers, body,
                )
                status_line = _STATUS_LINE.get(
                    status, f"HTTP/1.1 {status} X\r\n".encode()
                )
                writer.write(
                    status_line
                    + b"Content-Type: " + ctype.encode()
                    + b"\r\nContent-Length: " + str(len(payload)).encode()
                    + b"\r\n\r\n"
                )
                writer.write(payload)
                await writer.drain()
                if headers.get("connection", "").lower() == "close":
                    break
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except (ConnectionError, OSError):
                pass

    @staticmethod
    def _parse_head(head: bytes):
        # request line
        eol = head.find(b"\r\n")
        if eol < 0:
            raise ValueError("bad request line")
        parts = head[:eol].split(b" ")
        if len(parts) != 3:
            raise ValueError("bad request line")
        method = parts[0].decode("latin1")
        path = parts[1].decode("latin1")
        if "?" in path:
            path = path.split("?", 1)[0]
        headers = {}
        for line in head[eol + 2 : -4].split(b"\r\n"):
            c = line.find(b":")
            if c > 0:
                headers[line[:c].decode("latin1").strip().lower()] = (
                    line[c + 1 :].decode("latin1").strip()
                )
        return method, path, headers

    # -- lifecycle -------------------------------------------------------
    async def _start(self) -> None:
        self._server = await asyncio.start_server(
            self._handle_conn, self.host, self.port,
            backlog=256, limit=1 << 20,
        )

    def run_forever(self) -> None:
        """Blocking serve (reference: drogon::app().run())."""
        asyncio.run(self._run())

    async def _run(self) -> None:
        await self._start()
        async with self._server:
            await self._server.serve_forever()

    def start_background(self) -> None:
        """Run the loop on a daemon thread (tests / bench)."""
        started = threading.Event()

        def _thread_main() -> None:
            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)
            self._loop.run_until_complete(self._start())
            started.set()
            try:
                self._loop.run_forever()
            finally:
                self._loop.close()

        self._thread = threading.Thread(target=_thread_main, daemon=True)
        self._thread.start()
        if not started.wait(timeout=30):
            raise RuntimeError("asyncio server failed to start")

    def shutdown(self) -> None:
        if self._loop is not None:

            def _stop() -> None:
                if self._server is not None:
                    self._server.close()
                self._loop.stop()

            self._loop.call_soon_threadsafe(_stop)
            if self._thread is not None:
                self._thread.join(timeout=10)
        self._pool.shutdown(wait=False)


def serve_forever_aio(
    engine,
    host: str = "0.0.0.0",
    port: int = 8080,
    background: bool = False,
    batching: bool = False,
    max_batch: int = 64,
    max_wait_ms: float = 8.0,
    grace_ms: float | None = None,
) -> Optional[AioHTTPServer]:
    """Asyncio twin of serve/http_server.serve_forever."""
    if batching:
        from prefhetch_tpu.serve.http_server import wrap_batching

        engine = wrap_batching(engine, max_batch, max_wait_ms, grace_ms)
    srv = AioHTTPServer(engine, host, port)
    logger.info("Asyncio server listening on %s:%d", host, port)
    if background:
        srv.start_background()
        return srv
    srv.run_forever()
    return None
