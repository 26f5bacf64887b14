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
