"""Minimal stdlib-only FTP server for transport tests (the container
has no pyftpdlib). Supports exactly the command subset ftplib uses for
passive-mode get/put/list: USER/PASS/TYPE/PASV/RETR/STOR/NLST/QUIT.
Single root directory, no subdirectories, no auth checking — a test
double, not a server."""

from __future__ import annotations

import os
import socket
import threading


class StubFtpServer:
    def __init__(self, root: str) -> None:
        self.root = root
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(5)
        self.port = self.sock.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def __enter__(self) -> "StubFtpServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass

    def _serve(self) -> None:
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                break
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn: socket.socket) -> None:
        rfile = conn.makefile("rb")

        def send(line: str) -> None:
            conn.sendall((line + "\r\n").encode())

        def accept_data(listener: socket.socket) -> socket.socket:
            d, _ = listener.accept()
            return d

        send("220 stub ready")
        listener: socket.socket | None = None
        try:
            while True:
                raw = rfile.readline()
                if not raw:
                    break
                cmd, _, arg = raw.decode().strip().partition(" ")
                cmd = cmd.upper()
                if cmd == "USER":
                    send("331 need password")
                elif cmd == "PASS":
                    send("230 logged in")
                elif cmd == "TYPE":
                    send("200 type set")
                elif cmd == "PASV":
                    listener = socket.socket()
                    listener.bind(("127.0.0.1", 0))
                    listener.listen(1)
                    p = listener.getsockname()[1]
                    send(f"227 Entering Passive Mode (127,0,0,1,{p >> 8},{p & 255})")
                elif cmd == "RETR":
                    path = os.path.join(self.root, os.path.basename(arg))
                    if not os.path.exists(path) or listener is None:
                        send("550 not found")
                        continue
                    send("150 opening data connection")
                    d = accept_data(listener)
                    with open(path, "rb") as fh:
                        d.sendall(fh.read())
                    d.close()
                    listener.close()
                    listener = None
                    send("226 transfer complete")
                elif cmd == "STOR":
                    if listener is None:
                        send("425 no data connection")
                        continue
                    send("150 opening data connection")
                    d = accept_data(listener)
                    chunks = []
                    while True:
                        chunk = d.recv(65536)
                        if not chunk:
                            break
                        chunks.append(chunk)
                    d.close()
                    listener.close()
                    listener = None
                    with open(
                        os.path.join(self.root, os.path.basename(arg)), "wb"
                    ) as fh:
                        fh.write(b"".join(chunks))
                    send("226 transfer complete")
                elif cmd == "NLST":
                    if listener is None:
                        send("425 no data connection")
                        continue
                    send("150 list follows")
                    d = accept_data(listener)
                    names = "\r\n".join(sorted(os.listdir(self.root)))
                    d.sendall((names + "\r\n").encode())
                    d.close()
                    listener.close()
                    listener = None
                    send("226 list done")
                elif cmd == "QUIT":
                    send("221 bye")
                    break
                else:
                    send("502 not implemented")
        finally:
            conn.close()
