"""VTK visualization writers.

The role of the reference's libxsd-generated VTK output
(/root/reference/src/io/vtk/VTKMoleculeWriter.{h,cpp} and
VTKGridWriter.{h,cpp}): molecule snapshots and the linked-cell grid as
VTK XML files loadable by ParaView/VisIt.  We emit the standard ascii
.vtu (UnstructuredGrid) format directly -- no schema library needed,
the format is plain XML.
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _data_array(f, name, data, n_comp=1, fmt="%.10g"):
    data = np.asarray(data)
    dtype = "Int64" if np.issubdtype(data.dtype, np.integer) else "Float64"
    f.write(
        f'        <DataArray type="{dtype}" Name="{name}" '
        f'NumberOfComponents="{n_comp}" format="ascii">\n'
    )
    flat = data.reshape(-1)
    f.write("          " + " ".join(fmt % v for v in flat) + "\n")
    f.write("        </DataArray>\n")


@PluginFactory.register("VTKMoleculeWriter")
class VTKMoleculeWriter(PluginBase):
    """Per-frame molecule cloud as .vtu vertices with point data
    (id, component, velocity, force) -- VTKMoleculeWriter.cpp's
    plotMolecule fields."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)[valid]
        v = np.asarray(mol.v)[valid]
        cid = np.asarray(mol.cid)[valid]
        mid = np.asarray(mol.mid)[valid]
        F = sim.forces_array()
        F = np.asarray(F)[valid] if F is not None else np.zeros_like(r)
        n = len(r)
        fname = f"{self.output_prefix}_{step}.vtu"
        with open(fname, "w") as f:
            f.write('<?xml version="1.0"?>\n')
            f.write(
                '<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n'
            )
            f.write("  <UnstructuredGrid>\n")
            f.write(f'    <Piece NumberOfPoints="{n}" NumberOfCells="{n}">\n')
            f.write("      <Points>\n")
            _data_array(f, "Points", r, 3)
            f.write("      </Points>\n")
            f.write("      <PointData>\n")
            _data_array(f, "id", mid.astype(np.int64))
            _data_array(f, "component", cid.astype(np.int64))
            _data_array(f, "velocity", v, 3)
            _data_array(f, "force", F, 3)
            f.write("      </PointData>\n")
            f.write("      <Cells>\n")
            _data_array(
                f, "connectivity", np.arange(n, dtype=np.int64), fmt="%d"
            )
            _data_array(
                f, "offsets", np.arange(1, n + 1, dtype=np.int64), fmt="%d"
            )
            _data_array(f, "types", np.full(n, 1, dtype=np.int64), fmt="%d")
            f.write("      </Cells>\n")
            f.write("    </Piece>\n")
            f.write("  </UnstructuredGrid>\n")
            f.write("</VTKFile>\n")


@PluginFactory.register("VTKGridWriter")
class VTKGridWriter(PluginBase):
    """The linked-cell grid as hexahedral VTK cells with per-cell
    molecule counts (VTKGridWriter.cpp's numberOfMolecules cell data)."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        from ls1_mardyn_tpu.ops.cells import bin_particles

        spec = sim.engine.spec
        mol = sim.molecules()
        bins = bin_particles(mol.r, mol.valid, spec)
        counts = np.asarray(bins.counts)  # z-major linear ids
        nx, ny, nz = spec.dims
        clx = spec.box[0] / nx
        cly = spec.box[1] / ny
        # z vertex positions honor non-uniform rows (adaptive z edges)
        if spec.z_edges is not None:
            zpos = np.asarray(spec.z_edges)
        else:
            zpos = np.arange(nz + 1) * (spec.box[2] / nz)
        # vertex lattice (nx+1, ny+1, nz+1)
        vx, vy, vz = nx + 1, ny + 1, nz + 1
        zz, yy, xx = np.meshgrid(
            np.arange(vz), np.arange(vy), np.arange(vx), indexing="ij"
        )
        pts = np.stack(
            [xx * clx, yy * cly, zpos[zz]], -1
        ).reshape(-1, 3)

        def vid(ix, iy, iz):
            return (iz * vy + iy) * vx + ix

        conn = []
        for cz in range(nz):
            for cy in range(ny):
                for cx in range(nx):
                    conn.append(
                        [
                            vid(cx, cy, cz),
                            vid(cx + 1, cy, cz),
                            vid(cx + 1, cy + 1, cz),
                            vid(cx, cy + 1, cz),
                            vid(cx, cy, cz + 1),
                            vid(cx + 1, cy, cz + 1),
                            vid(cx + 1, cy + 1, cz + 1),
                            vid(cx, cy + 1, cz + 1),
                        ]
                    )
        conn = np.asarray(conn, np.int64)
        ncell = spec.n_cells
        fname = f"{self.output_prefix}_grid_{step}.vtu"
        with open(fname, "w") as f:
            f.write('<?xml version="1.0"?>\n')
            f.write(
                '<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n'
            )
            f.write("  <UnstructuredGrid>\n")
            f.write(
                f'    <Piece NumberOfPoints="{len(pts)}" '
                f'NumberOfCells="{ncell}">\n'
            )
            f.write("      <Points>\n")
            _data_array(f, "Points", pts, 3)
            f.write("      </Points>\n")
            f.write("      <CellData>\n")
            _data_array(f, "numberOfMolecules", counts.astype(np.int64), fmt="%d")
            f.write("      </CellData>\n")
            f.write("      <Cells>\n")
            _data_array(f, "connectivity", conn, fmt="%d")
            _data_array(
                f,
                "offsets",
                (np.arange(1, ncell + 1) * 8).astype(np.int64),
                fmt="%d",
            )
            _data_array(f, "types", np.full(ncell, 12, np.int64), fmt="%d")
            f.write("      </Cells>\n")
            f.write("    </Piece>\n")
            f.write("  </UnstructuredGrid>\n")
            f.write("</VTKFile>\n")


@PluginFactory.register("MmspdWriter")
class MmspdWriter(PluginBase):
    """MegaMol simple particle data text format
    (src/io/MmspdWriter.cpp:65-140): UTF-8 BOM + 'MMSPDu 1.0', a header
    line '1 0 0 0 Lx Ly Lz frames ntypes 0', one sphere-type line per
    component, then '> N' + 'cid x y z' records per frame."""

    _palette = [
        (255, 0, 0),
        (0, 102, 0),
        (0, 255, 255),
        (150, 0, 150),
        (100, 100, 100),
    ]

    def __init__(self, params=None):
        super().__init__(params)
        self._fname = None

    def init(self, sim):
        self._fname = f"{self.output_prefix}.mmspd"
        box = sim.box
        comps = sim.table.components
        ncomp = len(comps)
        frames = getattr(sim.config, "steps", 0) // self.write_frequency + 1
        with open(self._fname, "wb") as f:
            f.write(b"\xef\xbb\xbf")
            f.write(b"MMSPDu 1.0\n")
            f.write(
                f"1 0 0 0 {box[0]} {box[1]} {box[2]} "
                f"{frames} {ncomp} 0\n".encode()
            )
            for i, comp in enumerate(comps):
                cr, cg, cb = self._palette[i % len(self._palette)]
                sigma = comp.ljcenters[0].sigma if comp.ljcenters else 1.0
                f.write(
                    f"s 4 3 cr b {cr} cg b {cg} cb b {cb} r f "
                    f"{0.7 * sigma:.4g} x f y f z f\n".encode()
                )

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)[valid]
        cid = np.asarray(mol.cid)[valid]
        with open(self._fname, "a") as f:
            f.write(f"> {len(r)}\n")
            for i in range(len(r)):
                f.write(f"{int(cid[i])} {r[i,0]:.6g} {r[i,1]:.6g} {r[i,2]:.6g}\n")
