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


def _send(port, line, tries=50):
    for _ in range(tries):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2) as s:
                s.sendall((line + "\n").encode())
                return s.makefile().readline().strip()
        except OSError:
            time.sleep(0.05)
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
