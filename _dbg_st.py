import jax
jax.config.update("jax_platforms","cpu")
jax.config.update("jax_enable_x64",True)
import jax.numpy as jnp, numpy as np
from ls1_mardyn_tpu.driver import MDSimulation
cfg_path = "/root/reference/examples/surface-tension_LRC/2CLJ/vle/T0-979/run01/config.xml"
sim = MDSimulation.from_xml(cfg_path, dtype=jnp.float64, force_mode="cells")
mol = sim.engine.mol
print("N:", int(np.asarray(mol.valid).sum()), "box:", sim.box, "T target:", sim.config.temperature)
print("r range:", np.asarray(mol.r).min(0), np.asarray(mol.r).max(0))
F, M, u, vir = sim.planar_lrc.forces_torques(mol) if sim.planar_lrc else (0,0,0,0)
print("planar u:", float(u), "F finite:", bool(np.isfinite(np.asarray(F)).all()))
sim.engine.prepare_start()
print("upot:", float(sim.engine.macro.upot))
