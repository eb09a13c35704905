"""Compressed (Gadget N-body snapshot) particle format.

Layout (reference src/Gadget/BufVector3D.c:111-136,
include/Gadget/GadgetHeader.h:4-27): int32 pad, 256-byte header, two
int32 pads, then npart[1] x uint16[3] quantized displacements. Decoding
(reference BufVector3D.c:168-201, GadgetHeader.c:7-24, GadId.c:38-74):

    cell_interval = BoxSize / cbrt(npartTotal)
    unitsep[d]    = (disp_max[d] - disp_min[d]) / 2^pos_bits
    grid (ix,iy,iz) = id2pos(sequential particle id)   # tiled id system
    pos[d] = cell_interval * grid[d] + disp_min[d] + unitsep[d] * q[d]

All decode math is vectorized float32 (matching the reference's float
arithmetic); the id->grid mapping is the GadId tiled scheme with tile
edge ``idsep`` (ids advance z-fastest within a tile of idsep^3 cells,
tiles advance z-fastest across the grid).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_HEADER_BYTES = 256
# struct GadgetHeader (reference include/Gadget/GadgetHeader.h:4-27):
# int npart[6]; double mass[6]; double time; double redshift;
# int flag_sfr; int flag_feedback; int npartTotal[6]; int flag_cooling;
# int num_files; double BoxSize; ... then disp_min[3], disp_max[3] floats,
# int pos_bits; long id_start, id_end; (layout per the reference header)
_HEAD_FMT = "<6i 6d d d i i 6i i i d 3f 3f i q q"


@dataclass
class GadgetHeader:
    npart: tuple
    box_size: float
    disp_min: np.ndarray
    disp_max: np.ndarray
    pos_bits: int
    id_start: int
    id_end: int
    npart_total: int

    @property
    def cell_interval(self) -> np.float32:
        return np.float32(self.box_size / round(self.npart_total ** (1.0 / 3.0)))

    @property
    def unitsep(self) -> np.ndarray:
        return (
            (self.disp_max - self.disp_min) / np.float32(2**self.pos_bits)
        ).astype(np.float32)


def pack_header(h: GadgetHeader) -> bytes:
    base = struct.pack(
        _HEAD_FMT,
        *h.npart,
        *([0.0] * 6),
        0.0,
        0.0,
        0,
        0,
        *( [h.npart_total] + [0] * 5 ),
        0,
        1,
        h.box_size,
        *h.disp_min.astype(np.float32),
        *h.disp_max.astype(np.float32),
        h.pos_bits,
        h.id_start,
        h.id_end,
    )
    return base.ljust(_HEADER_BYTES, b"\0")


def unpack_header(raw: bytes) -> GadgetHeader:
    vals = struct.unpack_from(_HEAD_FMT, raw)
    # field offsets in _HEAD_FMT: npart 0-5, mass 6-11, time 12, redshift 13,
    # flag_sfr 14, flag_feedback 15, npartTotal 16-21, flag_cooling 22,
    # num_files 23, BoxSize 24, disp_min 25-27, disp_max 28-30, pos_bits 31,
    # id_start 32, id_end 33
    npart = vals[0:6]
    box_size = vals[24]
    disp_min = np.array(vals[25:28], dtype=np.float32)
    disp_max = np.array(vals[28:31], dtype=np.float32)
    pos_bits = vals[31]
    id_start, id_end = vals[32], vals[33]
    npart_total = vals[16]
    return GadgetHeader(npart, box_size, disp_min, disp_max, pos_bits, id_start, id_end, npart_total)


def write_gadget_file(path: str, hdr: GadgetHeader, quantized: np.ndarray) -> str:
    """pad + header + pad,pad + uint16[3] records (reference layout)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<i", _HEADER_BYTES))
        f.write(pack_header(hdr))
        f.write(struct.pack("<ii", _HEADER_BYTES, len(quantized) * 6))
        np.ascontiguousarray(quantized, dtype=np.uint16).tofile(f)
    return path


def id2pos(ids: np.ndarray, ngrid: int, idsep: int) -> np.ndarray:
    """Vectorized GadId id->(ix,iy,iz) (reference src/Gadget/GadId.c:38-54).

    Ids are tiled: within a tile of idsep^3 cells ids advance z-fastest;
    tiles advance z-fastest across the ngrid/idsep tile grid."""
    ids = np.asarray(ids, dtype=np.int64)
    tile_cells = idsep**3
    ntiles = ngrid // idsep
    tile = ids // tile_cells
    local = ids % tile_cells
    tz = tile % ntiles
    ty = (tile // ntiles) % ntiles
    tx = tile // (ntiles * ntiles)
    lz = local % idsep
    ly = (local // idsep) % idsep
    lx = local // (idsep * idsep)
    return np.stack([tx * idsep + lx, ty * idsep + ly, tz * idsep + lz], axis=1)


def decode_quantized(
    quantized: np.ndarray, ids: np.ndarray, hdr: GadgetHeader, idsep: int = 8
) -> np.ndarray:
    """uint16[,3] + sequential ids -> float32[,3] positions (vectorized
    twin of decodeCompressedParticle, reference BufVector3D.c:168-201)."""
    ngrid = round(hdr.npart_total ** (1.0 / 3.0))
    grid = id2pos(ids, ngrid, idsep).astype(np.float32)
    ci = hdr.cell_interval
    us = hdr.unitsep
    q = quantized.astype(np.float32)
    return ci * grid + hdr.disp_min[None, :] + us[None, :] * q


def read_gadget_bytes(blob: bytes, idsep: int = 8) -> pa.Table:
    """One compressed file -> particle rows (S3 + S4)."""
    off = 0
    (pad,) = struct.unpack_from("<i", blob, off)
    off += 4
    hdr = unpack_header(blob[off : off + _HEADER_BYTES])
    off += _HEADER_BYTES
    off += 8  # two pads
    n = hdr.npart[1]
    q = np.frombuffer(blob, dtype=np.uint16, count=3 * n, offset=off).reshape(-1, 3)
    ids = np.arange(hdr.id_start, hdr.id_start + n, dtype=np.int64)
    pos = decode_quantized(q, ids, hdr, idsep)
    return pa.table(
        {
            "particle_id": ids,
            "x": pos[:, 0],
            "y": pos[:, 1],
            "z": pos[:, 2],
        }
    )


def read_compressed_particles(paths: "str | list[str]", idsep: int = 8):
    """Dataset over compressed Gadget files: read_binary_files + per-file
    vectorized decode in map_batches."""
    import ray

    ds = ray.data.read_binary_files(paths)

    def decode(batch: dict) -> pa.Table:
        return pa.concat_tables([read_gadget_bytes(b, idsep) for b in batch["bytes"]])

    return ds.map_batches(decode, batch_format="numpy")
