"""Live steering socket (the Steereo integration analogue,
src/utils/SteereoIntegration.cpp + src/steereoCommands/)."""

import os
import socket
import threading
import time

import numpy as np
import jax.numpy as jnp

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _cfg(port):
    n, rho, T = 216, 0.6, 1.0
    L = (n / rho) ** (1 / 3)
    return XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        plugins=[PluginSpec("SteereoControl", {"port": str(port)})],
    )


def _send(port, line, tries=50, timeout=2):
    """tries retries CONNECTION failures only; a command that was
    delivered must not be re-sent on a slow reply (a duplicated
    recv-coupling would double-insert), so the reply wait gets its own
    generous timeout."""
    for _ in range(tries):
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=2)
        except OSError:
            time.sleep(0.05)
            continue
        with s:
            s.settimeout(timeout)
            s.sendall((line + "\n").encode())
            return s.makefile().readline().strip()
    raise RuntimeError("could not reach steering port")


def test_steering_status_checkpoint_stop(tmp_path):
    os.chdir(tmp_path)
    sim = MDSimulation(_cfg(0), dtype=jnp.float64)
    plug = sim._plugins[-1]
    port = plug.port
    assert port > 0

    results = {}

    def steer():
        results["ck"] = _send(port, "checkpoint steered.restart.dat")
        # wait for the first completed step to publish a status (the
        # jit compile bounds the latency), then stop the run
        for _ in range(1000):
            st = _send(port, "status")
            if st.startswith("step="):
                results["status"] = st
                break
            time.sleep(0.03)
        results["stop"] = _send(port, "stop")

    t = threading.Thread(target=steer)
    t.start()
    gv = sim.run(steps=100000, print_every=0)
    t.join(timeout=30)
    assert results.get("ck") == "OK"
    assert results.get("stop") == "OK"
    assert "step=" in results.get("status", "")
    assert sim.step < 100000  # stop command ended the run early
    assert os.path.exists("steered.restart.dat")
    assert np.isfinite(float(gv.upot))


def test_steering_retarget_thermostat(tmp_path):
    os.chdir(tmp_path)
    sim = MDSimulation(_cfg(0), dtype=jnp.float64)
    plug = sim._plugins[-1]
    # the server is up from plugin init; queue commands before the run
    # (they apply at the first step boundary)
    assert _send(plug.port, "set-temperature 0.5") == "OK"
    assert _send(plug.port, "bogus").startswith("ERR")
    sim.run(steps=3, print_every=0)
    assert float(sim.engine.config.target_temperature) == 0.5


def test_steering_command_set(tmp_path):
    """Reference command-set parity: estimate-remaining-time,
    get-snapshot, get-megamol-snapshot, send-/recv-coupling
    (src/steereoCommands/)."""
    import base64

    os.chdir(tmp_path)
    sim = MDSimulation(_cfg(0), dtype=jnp.float64)
    plug = sim._plugins[-1]
    port = plug.port
    results = {}

    def steer():
        # wait for the first step boundary to publish state
        for _ in range(1000):
            st = _send(port, "status")
            if st.startswith("step="):
                break
            time.sleep(0.03)
        results["ert"] = _send(port, "estimate-remaining-time")
        results["snap"] = _send(port, "get-snapshot v")
        results["mm"] = _send(port, "get-megamol-snapshot colour=velocity")
        results["out"] = _send(port, "send-coupling z hi 1.0", timeout=120)
        # re-insert the transferred molecules with a permissive energy
        payload = results["out"].split("b64=", 1)[1]
        results["in"] = _send(
            port, "recv-coupling 1e6 0.5 " + payload, timeout=300
        )
        results["stop"] = _send(port, "stop")

    t = threading.Thread(target=steer)
    t.start()
    sim.run(steps=100000, print_every=0)
    t.join(timeout=180)
    assert not t.is_alive()

    # estimate: linear extrapolation fields present
    assert "remaining=" in results["ert"] and "elapsed=" in results["ert"]

    # snapshot: [n, 6] float32 (xyz + vxyz), finite, inside the box
    head, b64 = results["snap"].split("b64=", 1)
    n = int(head.split("n=")[1].split()[0])
    arr = np.frombuffer(base64.b64decode(b64), np.float32).reshape(n, 6)
    assert n > 0 and np.isfinite(arr).all()
    L = float(_cfg(0).box[0])
    assert (arr[:, :3] >= -1e-3).all() and (arr[:, :3] <= L + 1e-3).all()

    # megamol: [n, 4] with the colour channel = |v|
    headm, b64m = results["mm"].split("b64=", 1)
    nm = int(headm.split("n=")[1].split()[0])
    mm = np.frombuffer(base64.b64decode(b64m), np.float32).reshape(nm, 4)
    assert nm == n
    assert "min=" in headm and "max=" in headm
    assert (mm[:, 3] >= 0).all()

    # coupling roundtrip: molecules removed then re-inserted
    nout = int(results["out"].split("n=")[1].split()[0])
    assert nout > 0
    pay = np.frombuffer(
        base64.b64decode(results["out"].split("b64=", 1)[1]), np.float64
    ).reshape(nout, 7)
    assert (pay[:, 1:4] >= 0).all()  # positions
    assert (pay[:, 0] > 0).all()  # masses
    ins = results["in"]
    assert ins.startswith("OK inserted=")
    inserted = int(ins.split("inserted=")[1].split()[0])
    queued = int(ins.split("queued=")[1].split()[0])
    assert inserted + queued == nout
    assert inserted > 0
