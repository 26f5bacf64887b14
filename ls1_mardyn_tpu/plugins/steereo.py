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

Reference command-set parity (src/steereoCommands/):
  estimate-remaining-time  -> "step=<k> total=<N> elapsed=<s>
                              remaining=<s>"; the linear extrapolation
                              of estimateRemainingTimeCommand.cpp:16-31
  get-snapshot [v] [f] [v2]
                           -> "SNAPSHOT n=<N> comps=<K> box=<lx> <ly>
                              <lz> fields=<csv> b64=<payload>" with a
                              base64 little-endian float32 [n, factor]
                              block; field set and the leading
                              box-extent header mirror
                              snapshotCommand.cpp:78-131 (factor =
                              3 + sendVelocity + sendForces + sendV2)
  get-megamol-snapshot [colour=component|force|velocity]
                           -> "MMSNAPSHOT n=<N> comps=<K> min=<m>
                              max=<M> b64=<payload>"; per-component
                              position streams + the colouring value
                              channel of megaMolSnapshotCommand.cpp:
                              100-140 (colouringVal 1/2/3)
  send-coupling <x|y|z> <lo|hi> <width>
                           -> "COUPLING n=<c> b64=<payload>": molecules
                              inside the outflow border slab are
                              REMOVED from the simulation (slot
                              invalidated) and streamed as float64
                              [c, 7] = mass,x,y,z,vx,vy,vz — the
                              transfer format of
                              sendCouplingMDCommand.cpp:34-77
  recv-coupling <targetEnergy> <maxDist> <b64 payload>
                           -> "OK inserted=<k> queued=<m>": each
                              received molecule (same [c,7] format) is
                              inserted at the first jittered position
                              within maxDist whose probe energy is
                              below targetEnergy (the usher-style
                              insertParticle loop of
                              receiveCouplingMDCommand.cpp:40-60);
                              failures stay queued and are retried at
                              the next step boundary
"""

from __future__ import annotations

import base64
import queue
import socket
import threading
import time

import numpy as np

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
        self._estimate = ""
        self._snap = None  # (r, v, F, cid, box, ncomp) numpy snapshot
        self._recv_queue = []  # pending coupling insertions

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
        if cmd == "estimate-remaining-time":
            return self._estimate or "estimate pending"
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
        # snapshot / coupling commands run synchronously against the
        # last step-boundary state snapshot (self._mol_np): the steering
        # thread must not touch live device state mid-step
        if cmd == "get-snapshot":
            return self._cmd_snapshot(set(p.lower() for p in parts[1:]))
        if cmd == "get-megamol-snapshot":
            colour = "component"
            for p in parts[1:]:
                if p.startswith("colour="):
                    colour = p.split("=", 1)[1]
            return self._cmd_megamol(colour)
        if cmd == "send-coupling" and len(parts) == 4:
            try:
                dim = {"x": 0, "y": 1, "z": 2}[parts[1].lower()]
                hi = {"lo": False, "hi": True}[parts[2].lower()]
                width = float(parts[3])
            except (KeyError, ValueError):
                return "ERR bad arguments"
            q = queue.Queue()
            self._cmds.put(("send_coupling", dim, hi, width, q))
            return q.get()
        if cmd == "recv-coupling" and len(parts) == 4:
            try:
                te = float(parts[1])
                md = float(parts[2])
                pay = np.frombuffer(
                    base64.b64decode(parts[3]), np.float64
                ).reshape(-1, 7).copy()
            except (ValueError, TypeError):
                return "ERR bad payload"
            q = queue.Queue()
            self._cmds.put(("recv_coupling", te, md, pay, q))
            return q.get()
        return "ERR unknown command"

    # -- snapshot commands (read the last step-boundary snapshot) ------

    def _cmd_snapshot(self, flags) -> str:
        snap = self._snap
        if snap is None:
            return "ERR no snapshot yet"
        r, v, F, cid, box, ncomp = snap
        cols = [r.astype(np.float32)]
        fields = ["x", "y", "z"]
        if "v" in flags:
            cols.append(v.astype(np.float32))
            fields += ["vx", "vy", "vz"]
        if "f" in flags:
            if F is None:
                return "ERR forces unavailable"
            cols.append(F.astype(np.float32))
            fields += ["fx", "fy", "fz"]
        if "v2" in flags:
            cols.append(
                np.sum(v * v, axis=1, keepdims=True).astype(np.float32)
            )
            fields.append("v2")
        payload = np.concatenate(cols, axis=1)
        return (
            "SNAPSHOT n=%d comps=%d box=%g %g %g fields=%s b64=%s"
            % (len(r), ncomp, box[0], box[1], box[2], ",".join(fields),
               base64.b64encode(payload.tobytes()).decode())
        )

    def _cmd_megamol(self, colour: str) -> str:
        snap = self._snap
        if snap is None:
            return "ERR no snapshot yet"
        r, v, F, cid, box, ncomp = snap
        # per-component position streams (megaMolSnapshotCommand
        # gathers each component's molecules contiguously)
        order = np.argsort(cid, kind="stable")
        pos = r[order].astype(np.float32)
        if colour == "force":
            if F is None:
                return "ERR forces unavailable"
            col = np.sqrt(np.sum(F * F, axis=1))[order]
        elif colour == "velocity":
            col = np.sqrt(np.sum(v * v, axis=1))[order]
        else:
            col = cid[order].astype(np.float64)
        lo = float(col.min()) if len(col) else 0.0
        hi = float(col.max()) if len(col) else 0.0
        payload = np.concatenate(
            [pos, col[:, None].astype(np.float32)], axis=1
        )
        return (
            "MMSNAPSHOT n=%d comps=%d min=%g max=%g b64=%s"
            % (len(r), ncomp, lo, hi,
               base64.b64encode(payload.tobytes()).decode())
        )

    # -- step-boundary application ---------------------------------------
    def end_step(self, sim, step: int):
        gv = sim.last_globals
        if gv is not None:
            self._last_status = (
                "step=%d time=%g T=%g Upot=%g p=%g"
                % (step, sim.time, float(gv.temperature), float(gv.upot),
                   float(gv.pressure))
            )
        self._update_estimate(sim, step)
        self._update_snapshot(sim)
        if self._recv_queue:
            self._retry_recv_queue(sim)
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

    def _update_estimate(self, sim, step: int):
        """estimateRemainingTimeCommand.cpp:16-31: remaining =
        (total/current)*elapsed - elapsed on the SIMULATION_LOOP
        timer."""
        try:
            t = sim.timers["SIMULATION_LOOP"]
            elapsed = t.elapsed + (
                (time.perf_counter() - t._t0) if t._t0 is not None
                else 0.0
            )
            total = int(
                getattr(sim, "total_steps", 0)
                or getattr(sim.config, "steps", 0) or 0
            )
        except (KeyError, AttributeError):
            return
        if step > 0 and total:
            est = (total / step) * elapsed - elapsed
            self._estimate = (
                "step=%d total=%d elapsed=%.3f remaining=%.3f"
                % (step, total, elapsed, max(est, 0.0))
            )

    def _update_snapshot(self, sim):
        import numpy as _np

        mol = sim.engine.mol
        valid = _np.asarray(mol.valid)
        F = sim.forces_array() if hasattr(sim, "forces_array") else None
        self._snap = (
            _np.asarray(mol.r)[valid],
            _np.asarray(mol.v)[valid],
            None if F is None else _np.asarray(F)[valid],
            _np.asarray(mol.cid)[valid],
            [float(b) for b in _np.asarray(sim.box)],
            len(sim.table.components),
        )

    # -- coupling (MD<->MD transfer, sendCouplingMDCommand format) ------

    def _masses(self, sim):
        import numpy as _np

        return _np.array([c.mass for c in sim.table.components])

    def _send_coupling(self, sim, dim, hi, width, q):
        import dataclasses

        import jax.numpy as jnp
        import numpy as _np

        mol = sim.engine.mol
        valid = _np.asarray(mol.valid)
        r = _np.asarray(mol.r)
        box = _np.asarray(sim.box)
        sel = valid & (
            (r[:, dim] >= box[dim] - width) if hi else (r[:, dim] < width)
        )
        idx = _np.nonzero(sel)[0]
        v = _np.asarray(mol.v)[idx]
        cid = _np.asarray(mol.cid)[idx]
        mass = self._masses(sim)[cid]
        payload = _np.concatenate(
            [mass[:, None], r[idx], v], axis=1
        ).astype(_np.float64)
        # outflow: invalidate the transferred slots
        # (sendCouplingMDCommand::executeProcessing removes them from
        # the container)
        new_valid = _np.array(valid)
        new_valid[idx] = False
        sim.engine.mol = dataclasses.replace(
            mol, valid=jnp.asarray(new_valid)
        )
        global_log.info(
            "SteereoControl: coupling outflow of %d molecules "
            "(dim=%d %s width=%g)", len(idx), dim,
            "hi" if hi else "lo", width,
        )
        q.put("COUPLING n=%d b64=%s" % (
            len(idx), base64.b64encode(payload.tobytes()).decode()
        ))

    def _recv_coupling(self, sim, target_energy, max_dist, payload, q):
        inserted, queued = self._insert_batch(
            sim, target_energy, max_dist, payload
        )
        q.put("OK inserted=%d queued=%d" % (inserted, queued))

    def _retry_recv_queue(self, sim):
        pending = self._recv_queue
        self._recv_queue = []
        for te, md, row in pending:
            import numpy as _np

            self._insert_batch(sim, te, md, _np.asarray([row]))

    def _insert_batch(self, sim, target_energy, max_dist, payload):
        """usher-style insertion (receiveCouplingMDCommand
        insertParticle): jittered trials near the requested position
        until the probe energy clears targetEnergy."""
        import dataclasses

        import jax.numpy as jnp
        import numpy as _np

        from ls1_mardyn_tpu.ensemble.grand_canonical import (
            single_molecule_energy,
        )

        mol = sim.engine.mol
        box = _np.asarray(sim.box)
        rng = _np.random.default_rng(
            int(self.params.get("seed", 4242)) + len(payload)
        )
        # eager jax dispatch is ~20 ms/op; the 10 trial probes per
        # molecule run as ONE jitted vmap (shapes are capacity-static,
        # so this compiles once per scene)
        probe = getattr(self, "_probe_jit", None)
        if probe is None:
            import jax

            probe = jax.jit(
                jax.vmap(
                    single_molecule_energy,
                    in_axes=(None, None, None, 0, None, None, None),
                )
            )
            self._probe_jit = probe
        dt = mol.r.dtype
        q4 = jnp.asarray([1.0, 0.0, 0.0, 0.0], dt)
        box_j = jnp.asarray(box, dt)
        cid0 = jnp.asarray(0, jnp.int32)
        excl = jnp.asarray(-1, jnp.int32)
        inserted = 0
        for row in payload:
            pos0 = _np.minimum(_np.maximum(row[1:4], 0.0), box * (1 - 1e-7))
            vel = row[4:7]
            free = _np.nonzero(~_np.asarray(mol.valid))[0]
            if not len(free):
                self._recv_queue.append((target_energy, max_dist, row))
                continue
            slot = int(free[0])
            jit3 = rng.uniform(-max_dist, max_dist, (10, 3))
            jit3[0] = 0.0  # first trial: the requested position
            cands = (pos0[None, :] + jit3) % box
            us = _np.asarray(
                probe(mol, sim.pp, box_j, jnp.asarray(cands, dt), q4,
                      cid0, excl)
            )
            hits = _np.nonzero(us <= target_energy)[0]
            if not len(hits):
                self._recv_queue.append((target_energy, max_dist, row))
                continue
            pos = cands[int(hits[0])]
            mol = dataclasses.replace(
                mol,
                r=mol.r.at[slot].set(jnp.asarray(pos)),
                v=mol.v.at[slot].set(jnp.asarray(vel)),
                q=mol.q.at[slot].set(
                    jnp.asarray([1.0, 0.0, 0.0, 0.0])
                ),
                L=mol.L.at[slot].set(jnp.zeros(3)),
                cid=mol.cid.at[slot].set(0),
                valid=mol.valid.at[slot].set(True),
            )
            inserted += 1
        sim.engine.mol = mol
        if inserted:
            global_log.info(
                "SteereoControl: coupling inflow inserted %d molecules",
                inserted,
            )
        return inserted, len(self._recv_queue)

    def _apply(self, sim, cmd):
        import dataclasses

        if cmd[0] == "send_coupling":
            self._send_coupling(sim, cmd[1], cmd[2], cmd[3], cmd[4])
        elif cmd[0] == "recv_coupling":
            self._recv_coupling(sim, cmd[1], cmd[2], cmd[3], cmd[4])
        elif cmd[0] == "pause":
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
