"""fsiesta master-side protocol: drive a Siesta server process.

The reference reaches Siesta through an f2py-compiled Fortran bridge
(pysiesta/siesta.f90:21-108 — pysiestaforce/pysiestalaunch/pysiestaquit
wrapping Siesta's ``fsiesta`` client module) and the driver methods
siestadriver.py:117-155 (newx/absforce/initforce/force). Here the
master side of the fsiesta wire protocol is implemented directly in
Python — no Fortran, no f2py — with both transports the reference's
Makefile builds (pysiesta/Makefile:6-10 sockets objs, :48-56 pipes
variant):

* ``socket``: the master LISTENS on Master.port (the fdf carries
  ``Master.interface socket / Master.address / Master.port``,
  siestadriver.py:70-75) and Siesta connects in.
* ``pipe``: two named FIFOs ``<label>.coords`` (master -> siesta) and
  ``<label>.forces`` (siesta -> master).

Wire grammar (ASCII lines, whitespace-separated reals; this mirrors
Siesta's fsiesta_pipes/fsiesta_sockets exchange — units travel with
every coords message, forces come back with energy and stress):

    master -> siesta                 siesta -> master
    ----------------                 ----------------
    begin_coords                     begin_forces
    <xunit> <eunit>                  <energy>
    <cell column 1: 3 reals>         <stress row 1: 3 reals>
    <cell column 2>                  <stress row 2>
    <cell column 3>                  <stress row 3>
    <na>                             <na>
    <na position lines, 3 reals>     <na force lines, 3 reals>
    end_coords                       end_forces

    quit                             quitting

Real Siesta is PATH-gated in this environment; the grammar is
round-trip-tested against the in-repo ``MockFsiestaServer`` (same
grammar, arbitrary Python force callable), which is also how unit tests
exercise SiestaDriver end-to-end.
"""

from __future__ import annotations

import os
import socket
import threading
from typing import Callable, Optional

import numpy as np


# ---------------------------------------------------------------------------
# line-oriented transports
# ---------------------------------------------------------------------------
class _SocketTransport:
    """Master side: listen, accept one Siesta connection, talk lines."""

    def __init__(self, host="127.0.0.1", port=10001, timeout=60.0):
        self._srv = socket.socket()
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self._srv.settimeout(timeout)
        self.port = self._srv.getsockname()[1]
        self._conn = None
        self._buf = b""

    def accept(self):
        self._conn, _ = self._srv.accept()
        return self

    def send_line(self, line: str):
        self._conn.sendall((line + "\n").encode())

    def recv_line(self) -> str:
        while b"\n" not in self._buf:
            chunk = self._conn.recv(4096)
            if not chunk:
                raise ConnectionError("siesta closed the socket")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\n", 1)
        return line.decode().strip()

    def close(self):
        for s in (self._conn, self._srv):
            try:
                if s is not None:
                    s.close()
            except OSError:
                pass
        self._conn = self._srv = None


class _PipeTransport:
    """Master side of the FIFO pair <label>.coords / <label>.forces."""

    def __init__(self, label: str, create=True):
        self.cpath = label + ".coords"
        self.fpath = label + ".forces"
        if create:
            for p in (self.cpath, self.fpath):
                if not os.path.exists(p):
                    os.mkfifo(p)
        self._c = self._f = None

    def accept(self):
        # FIFO open order pairs with the siesta side (coords reader
        # first, forces writer second): our coords WRITER unblocks its
        # reader, then its forces writer unblocks our reader
        self._c = open(self.cpath, "w")
        self._f = open(self.fpath, "r")
        return self

    def send_line(self, line: str):
        self._c.write(line + "\n")
        self._c.flush()

    def recv_line(self) -> str:
        line = self._f.readline()
        if line == "":
            raise ConnectionError("siesta closed the forces pipe")
        return line.strip()

    def close(self):
        for h in (self._c, self._f):
            try:
                if h is not None:
                    h.close()
            except OSError:
                pass
        for p in (self.cpath, self.fpath):
            try:
                os.unlink(p)
            except OSError:
                pass
        self._c = self._f = None


def _fmt3(v) -> str:
    return "%24.15E %24.15E %24.15E" % tuple(v)


def _read3(line: str) -> np.ndarray:
    return np.array([float(x) for x in line.split()], dtype=float)


class FsiestaClient:
    """The pysiesta surface (siesta.f90:21-108) over a live transport.

    ``forces(xa, cell)`` is pysiestaforce: send coordinates, receive
    (energy, forces); arrays are flat 3*na as in the f90 reshaping
    (siesta.f90:21-41). ``quit()`` is pysiestaquit.
    """

    def __init__(self, label, interface="socket", host="127.0.0.1",
                 port=10001, xunit="Ang", eunit="eV", timeout=60.0):
        self.label = label
        self.xunit, self.eunit = xunit, eunit
        if interface == "socket":
            self.transport = _SocketTransport(host, port, timeout)
        elif interface == "pipe":
            self.transport = _PipeTransport(label)
        else:
            raise ValueError(f"unknown fsiesta interface {interface!r}")
        self._live = False

    @property
    def port(self):
        return getattr(self.transport, "port", None)

    def connect(self):
        """Block until the Siesta process attaches (accept/open FIFOs)."""
        self.transport.accept()
        self._live = True
        return self

    def units(self, xunit: str, eunit: str):
        """pysiestaunits (siesta.f90:95-108): set the labels sent with
        every coords message."""
        self.xunit, self.eunit = xunit, eunit

    def forces(self, xa, cell=None):
        """pysiestaforce (siesta.f90:21-62): one force evaluation."""
        if not self._live:
            raise RuntimeError("FsiestaClient not connected; call "
                               "connect() after launching siesta")
        xa = np.asarray(xa, dtype=float).reshape(-1)
        na = len(xa) // 3
        cell = np.zeros((3, 3)) if cell is None \
            else np.asarray(cell, dtype=float).reshape(3, 3)
        t = self.transport
        t.send_line("begin_coords")
        t.send_line(f"{self.xunit} {self.eunit}")
        for i in range(3):
            t.send_line(_fmt3(cell[i]))
        t.send_line(str(na))
        for i in range(na):
            t.send_line(_fmt3(xa[3 * i:3 * i + 3]))
        t.send_line("end_coords")

        head = t.recv_line()
        if head != "begin_forces":
            raise ValueError(f"fsiesta protocol error: expected "
                             f"begin_forces, got {head!r}")
        energy = float(t.recv_line())
        stress = np.stack([_read3(t.recv_line()) for _ in range(3)])
        na_r = int(t.recv_line())
        if na_r != na:
            raise ValueError(f"fsiesta protocol error: sent {na} atoms, "
                             f"server answered {na_r}")
        fa = np.concatenate([_read3(t.recv_line()) for _ in range(na)])
        tail = t.recv_line()
        if tail != "end_forces":
            raise ValueError(f"fsiesta protocol error: expected "
                             f"end_forces, got {tail!r}")
        self.stress = stress
        return energy, fa

    def quit(self):
        """pysiestaquit (siesta.f90:82-93): quit/quitting handshake."""
        if not self._live:
            return
        try:
            self.transport.send_line("quit")
            reply = self.transport.recv_line()
            if reply != "quitting":
                raise ValueError(f"fsiesta protocol error: expected "
                                 f"quitting, got {reply!r}")
        finally:
            self._live = False
            self.transport.close()


# ---------------------------------------------------------------------------
# in-repo mock server (tests; stands in for the Siesta process)
# ---------------------------------------------------------------------------
class MockFsiestaServer:
    """Speaks the Siesta side of the fsiesta grammar with a Python force
    callable ``fn(xa_flat, cell) -> (energy, forces_flat, stress)``.

    socket mode connects OUT to the master's port (as Siesta does when
    the fdf names Master.address/port); pipe mode opens the FIFO pair.
    Runs in a daemon thread: ``start()`` then drive the client.
    """

    def __init__(self, fn: Callable, interface="socket",
                 host="127.0.0.1", port=10001, label="mock"):
        self.fn = fn
        self.interface = interface
        self.host, self.port = host, port
        self.label = label
        self.thread: Optional[threading.Thread] = None
        self.error: Optional[BaseException] = None

    def start(self):
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()
        return self

    def _serve(self):
        try:
            if self.interface == "socket":
                conn = socket.create_connection((self.host, self.port),
                                                timeout=30.0)
                rfile = conn.makefile("r")
                send = lambda s: conn.sendall((s + "\n").encode())
                recv = lambda: rfile.readline().strip()
            else:
                # siesta side: read .coords, write .forces; open reader
                # first (mirrors _PipeTransport.accept ordering)
                cfile = open(self.label + ".coords", "r")
                ffile = open(self.label + ".forces", "w")
                send = lambda s: (ffile.write(s + "\n"), ffile.flush())
                recv = lambda: cfile.readline().strip()
            while True:
                line = recv()
                if line == "" or line == "quit":
                    send("quitting")
                    break
                if line != "begin_coords":
                    raise ValueError(f"mock server: unexpected {line!r}")
                recv()  # units line
                cell = np.stack([_read3(recv()) for _ in range(3)])
                na = int(recv())
                xa = np.concatenate([_read3(recv()) for _ in range(na)])
                if recv() != "end_coords":
                    raise ValueError("mock server: missing end_coords")
                energy, forces, stress = self.fn(xa, cell)
                send("begin_forces")
                send("%24.15E" % energy)
                for i in range(3):
                    send(_fmt3(np.asarray(stress)[i]))
                send(str(na))
                forces = np.asarray(forces, dtype=float).reshape(-1)
                for i in range(na):
                    send(_fmt3(forces[3 * i:3 * i + 3]))
                send("end_forces")
        except BaseException as e:  # surfaced by tests via .error
            self.error = e

    def join(self, timeout=10.0):
        if self.thread is not None:
            self.thread.join(timeout)
        if self.error is not None:
            raise self.error
