"""Transparent output compression for writers.

The role of /root/reference/src/plugins/compression.{h,cpp} (lz4/gzip
stream wrappers selected by a 'compression' tag): here a single
open_compressed() that picks the codec from the requested extension.
gzip/bz2/xz come from the standard library; lz4 is gated (not baked
into this image) and raises a clear error if requested.
"""

from __future__ import annotations

import bz2
import gzip
import lzma


def open_compressed(path: str, mode: str = "wt", compression: str = "auto"):
    """Open `path` with the codec named by `compression` ('none',
    'gzip', 'bz2', 'xz', 'lz4') or inferred from the extension when
    'auto'.  Returns a file object usable like open()'s."""
    if compression == "auto":
        if path.endswith(".gz"):
            compression = "gzip"
        elif path.endswith(".bz2"):
            compression = "bz2"
        elif path.endswith(".xz"):
            compression = "xz"
        elif path.endswith(".lz4"):
            compression = "lz4"
        else:
            compression = "none"
    if compression == "none":
        return open(path, mode)
    if compression == "gzip":
        return gzip.open(path, mode)
    if compression == "bz2":
        return bz2.open(path, mode)
    if compression == "xz":
        return lzma.open(path, mode)
    if compression == "lz4":
        try:
            import lz4.frame  # not in this image; gated
        except ImportError as e:
            raise RuntimeError(
                "lz4 compression requested but the lz4 package is not "
                "available; use gzip/bz2/xz"
            ) from e
        return lz4.frame.open(path, mode)
    raise ValueError(f"unknown compression '{compression}'")
