"""MMPLD (MegaMol particle list) trajectory writer.

Byte-level parity with the reference's MmpldWriter v100
(/root/reference/src/io/MmpldWriter.cpp:177-298, 485-580):

  header: magic 'MMPLD\\0' | u16 version | u32 num_frames
          | bbox 6*f32 | clipbox 6*f32 | seek table (num_frames+1) u64
  frame:  u32 num_lists
          per list: u8 vertex_type(1=FLOAT_XYZ) | u8 color_type
                    | f32 global_radius | u32 rgba | u64 count
                    | count * stride f32

Sphere modes (MmpldWriter.h:141-173):

- ``spheretype="simple"`` (MmpldWriterSimpleSphere): one particle list
  per COMPONENT at molecule centers-of-mass.
- ``spheretype="multi"`` (MmpldWriterMultiSphere): one particle list
  per LJ SITE across all components (site types numbered by the
  per-component site offset, MmpldWriter.cpp:552-580); positions are
  the ABSOLUTE site positions, i.e. COM + quaternion-rotated body
  offsets (ljcenter_d_abs).

Per-sphere-type radius/color come from ``<spheres><site>`` params
(radius + color/r,g,b,alpha, MmpldWriter.cpp:102-132) or the
reference's 6-color default cycle (MmpldWriter.cpp:356-374).
``ctype=3`` (MMPLD_COLOR_FLOAT_RGB) appends the molecule velocity as
the float color triplet — the reference's "color hack"
(MmpldWriter.cpp:546-547).

Frames are buffered and the file is emitted at finish (the reference
instead preallocates the seek table and patches it with MPI-IO;
single-writer buffering is equivalent)."""

from __future__ import annotations

import struct

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory

# ISD_USE_DEFAULT palette (MmpldWriter.cpp:362-373), rgba byte order
_DEFAULT_RGBA = [
    (255, 0, 0, 255),
    (0, 205, 255, 255),
    (255, 0, 255, 255),
    (0, 155, 0, 255),
    (105, 0, 205, 255),
    (255, 125, 0, 255),
]


@PluginFactory.register("MmpldWriter")
class MmpldWriter(PluginBase):
    def __init__(self, params=None):
        super().__init__(params)
        wc = self.params.get("writecontrol", {})
        if isinstance(wc, dict):
            self.write_frequency = int(float(wc.get("writefrequency",
                                                    self.write_frequency)))
            self.start = int(float(wc.get("start", 0)))
            self.stop = int(float(wc.get("stop", 2 ** 62)))
        else:
            self.start, self.stop = 0, 2 ** 62
        self.radius = float(self.params.get("radius", 0.5))
        self.spheretype = str(
            self.params.get("spheretype", "simple")
        ).lower()
        self.ctype = int(float(self.params.get("ctype", 0)))
        # <spheres><site><radius>..<color><r>..: per-sphere-type
        # radius/rgba overrides
        self._site_radius = []
        self._site_rgba = []
        spheres = self.params.get("spheres")
        if isinstance(spheres, dict):
            sites = spheres.get("site", [])
            if isinstance(sites, dict):
                sites = [sites]
            for s in sites:
                self._site_radius.append(float(s.get("radius", 0.5)))
                col = s.get("color", {})
                if not isinstance(col, dict):
                    col = {}
                self._site_rgba.append(tuple(
                    int(float(col.get(k, d)))
                    for k, d in (("r", 128), ("g", 128), ("b", 128),
                                 ("alpha", 255))
                ))

    def _type_params(self, i):
        """(radius, packed rgba u32) for sphere type i: XML overrides,
        then the reference's default cycle."""
        if i < len(self._site_radius):
            r, g, b, a = self._site_rgba[i]
            radius = self._site_radius[i]
        else:
            r, g, b, a = _DEFAULT_RGBA[i % len(_DEFAULT_RGBA)]
            radius = self.radius
        return radius, (a << 24) | (b << 16) | (g << 8) | r

    def init(self, sim):
        self._frames = []
        self._K = sim.table.K
        comps = sim.table.components
        if self.spheretype == "multi":
            # sphere type = per-component LJ site offset + site index
            # (MmpldWriter.cpp:161-170)
            self._sites_per_comp = [len(c.ljcenters) for c in comps]
            self._site_offset = np.cumsum(
                [0] + self._sites_per_comp[:-1]
            ).astype(int)
            self._n_types = int(sum(self._sites_per_comp))
            # body-frame site coordinates, per component
            self._site_body = [
                np.array([s.r for s in c.ljcenters],
                         np.float64).reshape(-1, 3)
                for c in comps
            ]
        else:
            self._n_types = self._K

    def _site_positions(self, mol, valid):
        """Absolute LJ-site positions per sphere type (multi mode):
        COM + R(q) @ body offset (ljcenter_d_abs,
        MmpldWriter.cpp:572)."""
        import jax.numpy as jnp

        from ls1_mardyn_tpu.models.quaternion import qrotate

        r = np.asarray(mol.r)[valid]
        q = np.asarray(mol.q)[valid]
        cid = np.asarray(mol.cid)[valid]
        v = np.asarray(mol.v)[valid]
        out = []
        for k in range(self._K):
            m = cid == k
            rk, qk, vk = r[m], q[m], v[m]
            for si in range(self._sites_per_comp[k]):
                d = self._site_body[k][si]
                if np.any(d):
                    pos = rk + np.asarray(
                        qrotate(jnp.asarray(qk),
                                jnp.asarray(np.tile(d, (len(qk), 1))))
                    )
                else:
                    pos = rk
                out.append((pos.astype("<f4"), vk.astype("<f4")))
        return out

    def end_step(self, sim, step):
        if step < self.start or step > self.stop:
            return
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        if self.spheretype == "multi":
            lists = [
                np.ascontiguousarray(
                    np.concatenate([p, v], axis=1) if self.ctype == 3
                    else p
                )
                for p, v in self._site_positions(mol, valid)
            ]
        else:
            r = np.asarray(mol.r)[valid].astype("<f4")
            vv = np.asarray(mol.v)[valid].astype("<f4")
            cid = np.asarray(mol.cid)[valid]
            lists = []
            for k in range(self._K):
                m = cid == k
                arr = (np.concatenate([r[m], vv[m]], axis=1)
                       if self.ctype == 3 else r[m])
                lists.append(np.ascontiguousarray(arr))
        self._frames.append(lists)

    def finish(self, sim):
        if not self._frames:
            return
        path = f"{self.output_prefix}.mmpld"
        nf = len(self._frames)
        header = b"MMPLD\x00" + struct.pack("<HI", 100, nf)
        box = np.asarray(sim.box, np.float32)
        header += struct.pack("<3f", 0, 0, 0) + struct.pack("<3f", *box)
        lo = -self.radius
        header += struct.pack("<3f", lo, lo, lo) + struct.pack(
            "<3f", *(box + self.radius)
        )
        # seek table
        frames_blob = []
        offsets = []
        pos = len(header) + (nf + 1) * 8
        for lists in self._frames:
            offsets.append(pos)
            blob = struct.pack("<I", len(lists))
            for i, arr in enumerate(lists):
                radius, rgba = self._type_params(i)
                blob += struct.pack("<BB", 1, self.ctype)
                blob += struct.pack("<f", radius)
                blob += struct.pack("<I", rgba)
                blob += struct.pack("<Q", len(arr))
                blob += arr.tobytes()
            frames_blob.append(blob)
            pos += len(blob)
        offsets.append(pos)  # EOF entry
        with open(path, "wb") as f:
            f.write(header)
            f.write(struct.pack(f"<{nf + 1}Q", *offsets))
            for blob in frames_blob:
                f.write(blob)
