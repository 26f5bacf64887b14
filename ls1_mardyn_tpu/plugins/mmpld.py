"""MMPLD (MegaMol particle list) trajectory writer.

Byte-level parity with the reference's MmpldWriter v100 simple-sphere
mode (/root/reference/src/io/MmpldWriter.cpp:177-298, 485-530):

  header: magic 'MMPLD\\0' | u16 version | u32 num_frames
          | bbox 6*f32 | clipbox 6*f32 | seek table (num_frames+1) u64
  frame:  u32 num_lists
          per list: u8 vertex_type(1=FLOAT_XYZ) | u8 color_type(0)
                    | f32 global_radius | u32 rgba | u64 count
                    | count * 3 f32 positions

One particle list per component.  Frames are buffered and the file is
emitted at finish (the reference instead preallocates the seek table
and patches it with MPI-IO; single-writer buffering is equivalent)."""

from __future__ import annotations

import struct

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


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

    def init(self, sim):
        self._frames = []
        self._K = sim.table.K

    def end_step(self, sim, step):
        if step < self.start or step > self.stop:
            return
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)[valid].astype("<f4")
        cid = np.asarray(mol.cid)[valid]
        lists = []
        for k in range(self._K):
            lists.append(np.ascontiguousarray(r[cid == k]))
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
            for arr in lists:
                blob += struct.pack("<BB", 1, 0)  # FLOAT_XYZ, COLOR_NONE
                blob += struct.pack("<f", self.radius)
                blob += struct.pack("<I", 0xFF808080)  # rgba
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
