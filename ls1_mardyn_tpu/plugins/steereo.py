"""Live steering: a TCP line-protocol control server.

The role of the reference's optional Steereo integration
(/root/reference/src/utils/SteereoIntegration.cpp +
src/steereoCommands/: live steering/visualization sockets with
couplingCommand, sendCouplingMDCommand, snapshotCommand) rebuilt as a
plain plugin: a daemon thread accepts connections on a local TCP port;
commands queue up and are applied at step boundaries (the end_step
hook), which is the only safe point to touch host-side simulation
state between jitted steps.

Protocol (one command per line, replies terminated by a newline):
  status                   -> "step=<k> time=<t> T=<T> Upot=<U> p=<p>"
  pause                    -> the run loop blocks until `resume`
  resume
  checkpoint <path>        -> write an ASCII checkpoint
  set-temperature <T>      -> retarget the NVT thermostat (re-jits the
                              step; the Steereo couplingCommand analogue)
  stop                     -> finish the run after the current step
"""

from __future__ import annotations

import queue
import socket
import threading
import time

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory
from ls1_mardyn_tpu.utils.logger import global_log


@PluginFactory.register("SteereoControl")
class SteereoControl(PluginBase):
    def __init__(self, params=None):
        super().__init__(params)
        self.port = int(float(self.params.get("port", 44445)))
        self._cmds: "queue.Queue[tuple]" = queue.Queue()
        self._server = None
        self._thread = None
        self._paused = False
        self._stop = False
        self._last_status = ""

    # -- socket plumbing --------------------------------------------------
    def init(self, sim):
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", self.port))
        self.port = srv.getsockname()[1]  # resolve port 0 -> ephemeral
        srv.listen(4)
        self._server = srv
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        global_log.info("SteereoControl listening on 127.0.0.1:%d", self.port)

    def _serve(self):
        while True:
            try:
                conn, _addr = self._server.accept()
            except OSError:
                return  # server closed
            threading.Thread(
                target=self._client, args=(conn,), daemon=True
            ).start()

    def _client(self, conn):
        with conn:
            buf = b""
            while True:
                try:
                    chunk = conn.recv(1024)
                except OSError:
                    return
                if not chunk:
                    return
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    reply = self._dispatch(line.decode().strip())
                    try:
                        conn.sendall((reply + "\n").encode())
                    except OSError:
                        return

    def _dispatch(self, line: str) -> str:
        parts = line.split()
        if not parts:
            return "ERR empty"
        cmd = parts[0].lower()
        if cmd == "status":
            return self._last_status or "status pending"
        if cmd in ("pause", "resume", "stop"):
            self._cmds.put((cmd,))
            return "OK"
        if cmd == "checkpoint" and len(parts) == 2:
            self._cmds.put(("checkpoint", parts[1]))
            return "OK"
        if cmd == "set-temperature" and len(parts) == 2:
            try:
                self._cmds.put(("set_t", float(parts[1])))
            except ValueError:
                return "ERR bad value"
            return "OK"
        return "ERR unknown command"

    # -- step-boundary application ---------------------------------------
    def end_step(self, sim, step: int):
        gv = sim.last_globals
        if gv is not None:
            self._last_status = (
                "step=%d time=%g T=%g Upot=%g p=%g"
                % (step, sim.time, float(gv.temperature), float(gv.upot),
                   float(gv.pressure))
            )
        while True:
            try:
                cmd = self._cmds.get_nowait()
            except queue.Empty:
                break
            self._apply(sim, cmd)
        while self._paused and not self._stop:
            time.sleep(0.05)
            try:
                self._apply(sim, self._cmds.get_nowait())
            except queue.Empty:
                pass
        if self._stop:
            # finish after this step (one-shot: a later run() on the
            # same simulation starts fresh)
            self._stop = False
            self._paused = False
            sim.run_abort = True

    def _apply(self, sim, cmd):
        import dataclasses

        if cmd[0] == "pause":
            self._paused = True
            global_log.info("SteereoControl: paused")
        elif cmd[0] == "resume":
            self._paused = False
            global_log.info("SteereoControl: resumed")
        elif cmd[0] == "stop":
            self._stop = True
        elif cmd[0] == "checkpoint":
            sim.write_checkpoint(cmd[1])
        elif cmd[0] == "set_t":
            # both drivers (single-chip and --parallel) expose this;
            # it re-jits/rebuilds the step with the new target
            sim.retarget_temperature(float(cmd[1]))
            global_log.info(
                "SteereoControl: thermostat retargeted to T=%g", cmd[1]
            )

    def finish(self, sim):
        if self._server is not None:
            try:
                self._server.close()
            except OSError:
                pass
