"""MultiObjectGenerator / GridFiller / objects / velocity assigners
(src/io/ObjectGenerator.h:22 + src/utils/generator/)."""

import numpy as np

from ls1_mardyn_tpu.io.generators import grid_filler, multi_object
from ls1_mardyn_tpu.models.components import Component


def _comp():
    c = Component(cid=0)
    c.add_ljcenter(0, 0, 0, 1.0, 1.0, 1.0)
    return c


def test_grid_filler_fcc_density():
    filler = {
        "lattice": {"system": "cubic", "centering": "face"},
        "basis": {"site": {"componentid": "1",
                           "coordinate": {"x": .5, "y": .5, "z": .5}}},
        "latticeOccupancy": "1",
        "density": "0.7",
    }
    obj = {"type": "Cuboid",
           "lower": {"x": 0, "y": 0, "z": 0},
           "upper": {"x": 20, "y": 20, "z": 20}}
    r, cid = grid_filler(filler, obj, [20.0, 20.0, 20.0])
    rho = len(r) / 20.0**3
    assert abs(rho - 0.7) / 0.7 < 0.1  # lattice-rounding tolerance
    assert (cid == 0).all()
    assert (r >= 0).all() and (r < 20).all()


def test_sphere_and_union_objects():
    filler = {
        "lattice": {"centering": "primitive"},
        "basis": {"site": {"componentid": "1"}},
        "density": "1.0",
    }
    obj = {"type": "Sphere",
           "center": {"x": 10, "y": 10, "z": 10}, "radius": "5"}
    r, _ = grid_filler(filler, obj, [20.0, 20.0, 20.0])
    assert (((r - 10) ** 2).sum(1) <= 25 + 1e-9).all()
    vol_frac = len(r) / (20.0**3)
    sphere_frac = (4 / 3 * np.pi * 125) / 20.0**3
    assert abs(vol_frac - sphere_frac) < 0.02

    union = {"type": "ObjectUnion", "object": [
        {"type": "Cuboid", "lower": {"x": 0, "y": 0, "z": 0},
         "upper": {"x": 5, "y": 20, "z": 20}},
        {"type": "Cuboid", "lower": {"x": 15, "y": 0, "z": 0},
         "upper": {"x": 20, "y": 20, "z": 20}},
    ]}
    r2, _ = grid_filler(filler, union, [20.0, 20.0, 20.0])
    assert ((r2[:, 0] < 5) | (r2[:, 0] >= 15)).all()


def test_multi_object_velocity_assigners():
    og = [
        {
            "filler": {"lattice": {"centering": "face"},
                       "basis": {"site": {"componentid": "1"}},
                       "density": "0.6"},
            "object": {"type": "Cuboid",
                       "lower": {"x": 0, "y": 0, "z": 0},
                       "upper": {"x": 10, "y": 10, "z": 10}},
            "velocityAssigner": {"type": "EqualVelocityDistribution"},
        },
        {
            "filler": {"lattice": {"centering": "primitive"},
                       "basis": {"site": {"componentid": "1"}},
                       "density": "0.05"},
            "object": {"type": "Cuboid",
                       "lower": {"x": 0, "y": 10, "z": 0},
                       "upper": {"x": 10, "y": 20, "z": 10}},
            "velocityAssigner": {"type": "MaxwellVelocityDistribution"},
        },
    ]
    T = 1.3
    data = multi_object(og, [10.0, 20.0, 10.0], T, [_comp()], seed=3)
    r, v = data.r, data.v
    lower = r[:, 1] < 10
    # equal-speed assigner: all particles in the liquid block share the
    # speed sqrt(3T/m) (up to the momentum-zeroing shift)
    sp = np.linalg.norm(v[lower], axis=1)
    assert sp.std() / sp.mean() < 0.2
    assert abs((sp.mean() ** 2) / (3 * T) - 1.0) < 0.2
    # Maxwell vapor: temperature ~ T
    vv = v[~lower]
    assert abs((vv**2).sum() / (3 * len(vv) * T) - 1.0) < 0.1
    # densities per block
    assert abs(lower.sum() / 1000.0 - 0.6) < 0.1
    assert abs((~lower).sum() / 1000.0 - 0.05) < 0.03


def test_replica_filler_tiles_binary_checkpoint(tmp_path):
    """ReplicaFiller: tile an equilibrated cell over an object region
    (the surface-tension example's vapor/liquid sandwich construction)."""
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
    from ls1_mardyn_tpu.io.binary_io import write_binary_checkpoint
    from ls1_mardyn_tpu.io.generators import multi_object

    comp = _comp()
    rng = np.random.default_rng(2)
    n = 64
    cell_box = np.array([5.0, 5.0, 5.0])
    data = PhaseSpaceData(
        components=[comp], mixing_xi=np.ones((1, 1)),
        mixing_eta=np.ones((1, 1)), eps_rf=1e10, box=cell_box,
        temperature=1.0, current_time=0.0,
        mid=np.arange(1, n + 1, dtype=np.int64),
        cid=np.zeros(n, np.int32),
        r=rng.uniform(0, 5, (n, 3)),
        v=rng.normal(0, 1, (n, 3)),
        q=np.tile([1.0, 0, 0, 0], (n, 1)),
        L=np.zeros((n, 3)),
    )
    dat = str(tmp_path / "cell.dat")
    write_binary_checkpoint(dat, dat + ".header.xml", data)

    og = [{
        "filler": {"type": "ReplicaFiller",
                   "input": {"type": "BinaryReader",
                             "header": dat + ".header.xml", "data": dat}},
        "object": {"type": "Cuboid",
                   "lower": {"x": 0, "y": 5, "z": 0},
                   "upper": {"x": 10, "y": 15, "z": 10}},
    }]
    out = multi_object(og, [10.0, 20.0, 10.0], 1.0, [comp])
    # the object region is 10x10x10 = 8 cells of the 5^3 input
    assert len(out.r) == 8 * n
    assert (out.r[:, 1] >= 5).all() and (out.r[:, 1] < 15).all()
    # velocities/orientations carried over from the input cell
    assert np.abs(out.v).max() > 0
    assert len(set(out.mid.tolist())) == len(out.mid)
