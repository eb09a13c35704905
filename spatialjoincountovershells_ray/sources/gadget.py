"""Compressed (Gadget N-body snapshot) particle format.

Layout (reference src/Gadget/BufVector3D.c:111-136,
include/Gadget/GadgetHeader.h:4-27): int32 pad, 256-byte header, two
int32 pads, then npart[1] x uint16[3] quantized displacements. The
header struct is mirrored field-for-field (the C struct has no implicit
padding; offsets verified against gcc x86-64 layout):

    int npart[6]; double mass[6]; double time; double redshift;
    int flag_sfr; int flag_feedback; int npartTotal[6];
    int flag_cooling; int num_files; double BoxSize; double Omega0;
    double OmegaLambda; double HubbleParam; int flag_stellarage;
    int flag_metals; int hashsize; float disp_min; float disp_max;
    int pos_bits; long long id_start; long long id_end; char fill[56];

Decode params (reference GadgetHeader.c:7-24):

    npart_total   = npartTotal[1] + (npartTotal[2] << 32)
    at1d          = (int)pow(npart_total + 0.5, 1/3.)
    cell_interval = (float)(BoxSize / at1d)
    unitsep       = (disp_max - disp_min) / 2^pos_bits      # double
    id            = record_index + id_start                 # 1-based ids

Per particle (reference BufVector3D.c:168-201 decodeCompressedParticle,
non-AVX path — float32 cell term, float64 displacement term, final
float32 store):

    (ix,iy,iz) = id2pos(id)        # GadId tiled scheme, uses id-1
    pos[d] = (float)(cell_interval*grid[d] + disp_min + unitsep*q[d])

The id->grid mapping (reference src/Gadget/GadId.c:38-74) splits id-1
into a tile index (Nt1D = ntile per axis, x-major / z-fastest) and a
within-tile index (Ng1D = at1d/ntile per axis, x-major / z-fastest);
every reference caller uses ntile = 1 (src/astr_rcount/main.c:688).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_HEADER_BYTES = 256
_HEAD_FMT = "<6i6dddii6iiiddddiiiffiqq56s"
assert struct.calcsize(_HEAD_FMT) == _HEADER_BYTES


@dataclass
class GadgetHeader:
    npart: tuple
    box_size: float
    disp_min: float
    disp_max: float
    pos_bits: int
    id_start: int
    id_end: int
    npart_total6: tuple  # the raw int npartTotal[6]; [1]=low32, [2]=high32
    mass: tuple = (0.0,) * 6
    time: float = 0.0
    redshift: float = 0.0
    flag_sfr: int = 0
    flag_feedback: int = 0
    flag_cooling: int = 0
    num_files: int = 1
    omega0: float = 0.0
    omega_lambda: float = 0.0
    hubble_param: float = 0.0
    flag_stellarage: int = 0
    flag_metals: int = 0
    hashsize: int = 0
    fill: bytes = b""

    @classmethod
    def create(
        cls,
        npart1: int,
        npart_total: int,
        box_size: float,
        disp_min: float,
        disp_max: float,
        pos_bits: int,
        id_start: int = 1,
    ) -> "GadgetHeader":
        """Convenience constructor: 64-bit total split into the two
        32-bit npartTotal words the reference reads (GadgetHeader.c:12).
        Words are signed C ints; totals whose low word has bit 31 set
        round-trip exactly as the reference would read them (with sign
        extension) — callers should stick to totals that avoid it, as
        real snapshots do."""
        lo = npart_total & 0xFFFFFFFF
        if lo >= 1 << 31:
            lo -= 1 << 32
        return cls(
            npart=(0, npart1, 0, 0, 0, 0),
            box_size=box_size,
            disp_min=float(disp_min),
            disp_max=float(disp_max),
            pos_bits=pos_bits,
            id_start=id_start,
            id_end=id_start + npart1 - 1,
            npart_total6=(0, lo, npart_total >> 32, 0, 0, 0),
        )

    @property
    def npart_total(self) -> int:
        # reference GadgetHeader.c:12 — npartTotal[1] + (npartTotal[2] << 32)
        return int(self.npart_total6[1]) + (int(self.npart_total6[2]) << 32)

    @property
    def nparticles_at1d(self) -> int:
        # reference GadgetHeader.c:14 — C truncation of pow(total+0.5, 1/3.)
        return int((float(self.npart_total) + 0.5) ** (1.0 / 3.0))

    @property
    def cell_interval(self) -> np.float32:
        return np.float32(self.box_size / float(self.nparticles_at1d))

    @property
    def unitsep(self) -> float:
        # double in the reference (GadgetDecodeParams.unitsep)
        return (float(self.disp_max) - float(self.disp_min)) / float(2**self.pos_bits)


def pack_header(h: GadgetHeader) -> bytes:
    return struct.pack(
        _HEAD_FMT,
        *h.npart,
        *h.mass,
        h.time,
        h.redshift,
        h.flag_sfr,
        h.flag_feedback,
        *h.npart_total6,
        h.flag_cooling,
        h.num_files,
        h.box_size,
        h.omega0,
        h.omega_lambda,
        h.hubble_param,
        h.flag_stellarage,
        h.flag_metals,
        h.hashsize,
        h.disp_min,
        h.disp_max,
        h.pos_bits,
        h.id_start,
        h.id_end,
        h.fill.ljust(56, b"\0"),
    )


def unpack_header(raw: bytes) -> GadgetHeader:
    v = struct.unpack_from(_HEAD_FMT, raw)
    return GadgetHeader(
        npart=v[0:6],
        mass=v[6:12],
        time=v[12],
        redshift=v[13],
        flag_sfr=v[14],
        flag_feedback=v[15],
        npart_total6=v[16:22],
        flag_cooling=v[22],
        num_files=v[23],
        box_size=v[24],
        omega0=v[25],
        omega_lambda=v[26],
        hubble_param=v[27],
        flag_stellarage=v[28],
        flag_metals=v[29],
        hashsize=v[30],
        disp_min=v[31],
        disp_max=v[32],
        pos_bits=v[33],
        id_start=v[34],
        id_end=v[35],
        fill=v[36],
    )


def write_gadget_file(path: str, hdr: GadgetHeader, quantized: np.ndarray) -> str:
    """pad + header + pad,pad + uint16[3] records (reference layout,
    BufVector3D.c:96-136: one pad skipped before the header, two after)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<i", _HEADER_BYTES))
        f.write(pack_header(hdr))
        f.write(struct.pack("<ii", _HEADER_BYTES, len(quantized) * 6))
        np.ascontiguousarray(quantized, dtype=np.uint16).tofile(f)
    return path


def id2pos(ids: np.ndarray, ng1d: int, ntile: int = 1) -> np.ndarray:
    """Vectorized GadId id->(ix,iy,iz) (reference src/Gadget/GadId.c:38-74).

    ids are 1-based (IDall2IDpartGadId subtracts 1, GadId.c:79-84).
    id-1 splits into tile index IDt (x-major over an ntile^3 tile grid)
    and within-tile index IDg (x-major over an ng1d^3 cell grid); grid
    position per axis = tile_index * ng1d + cell_index.
    """
    ids0 = np.asarray(ids, dtype=np.int64) - 1
    ng2d = np.int64(ng1d) * np.int64(ng1d)
    ng3d = ng2d * np.int64(ng1d)
    idt = ids0 // ng3d
    idg = ids0 - idt * ng3d
    tx = idt // (ntile * ntile)
    ty = (idt - tx * ntile * ntile) // ntile
    tz = idt - tx * ntile * ntile - ty * ntile
    gx = idg // ng2d
    gy = (idg - gx * ng2d) // ng1d
    gz = idg - gx * ng2d - gy * np.int64(ng1d)
    return np.stack(
        [tx * ng1d + gx, ty * ng1d + gy, tz * ng1d + gz], axis=1
    )


def pos2id(grid: np.ndarray, ng1d: int, ntile: int = 1) -> np.ndarray:
    """Inverse of :func:`id2pos` (reference pos2idGadId, GadId.c:57-74);
    returns 1-based ids."""
    g = np.asarray(grid, dtype=np.int64)
    t = g // ng1d
    c = g - t * ng1d
    ng2d = np.int64(ng1d) * np.int64(ng1d)
    idt = (t[:, 0] * ntile + t[:, 1]) * ntile + t[:, 2]
    idg = c[:, 0] * ng2d + c[:, 1] * np.int64(ng1d) + c[:, 2]
    return idg + 1 + idt * ng2d * np.int64(ng1d)


def decode_quantized(
    quantized: np.ndarray, ids: np.ndarray, hdr: GadgetHeader, ntile: int = 1
) -> np.ndarray:
    """uint16[,3] + 1-based decode ids -> float32[,3] positions.

    Vectorized twin of decodeCompressedParticle (reference
    BufVector3D.c:168-201, non-AVX path): the cell term
    ``cell_interval*grid + disp_min`` evaluates in float32, the
    displacement term ``unitsep*q`` in float64 (unitsep is a double),
    their sum rounds once to float32 on store — mirrored operation for
    operation so the bit pattern matches the C output.
    """
    at1d = hdr.nparticles_at1d
    grid = id2pos(ids, at1d // ntile, ntile)
    cell_term = hdr.cell_interval * grid.astype(np.float32) + np.float32(hdr.disp_min)
    disp_term = hdr.unitsep * quantized.astype(np.float64)
    return (cell_term.astype(np.float64) + disp_term).astype(np.float32)


def read_gadget_bytes(blob: bytes, ntile: int = 1) -> pa.Table:
    """One compressed file -> particle rows (S3 + S4). particle_id is the
    snapshot's global 1-based decode id (record index + header id_start,
    reference astr_rcount/main.c:702)."""
    off = 4  # leading pad
    hdr = unpack_header(blob[off : off + _HEADER_BYTES])
    off += _HEADER_BYTES + 8  # header + two pads
    n = hdr.npart[1]
    q = np.frombuffer(blob, dtype=np.uint16, count=3 * n, offset=off).reshape(-1, 3)
    ids = np.arange(hdr.id_start, hdr.id_start + n, dtype=np.int64)
    pos = decode_quantized(q, ids, hdr, ntile)
    return pa.table(
        {
            "particle_id": ids,
            "x": pos[:, 0],
            "y": pos[:, 1],
            "z": pos[:, 2],
        }
    )


def read_compressed_particles(paths: "str | list[str]", ntile: int = 1):
    """Dataset over compressed Gadget files: read_binary_files + per-file
    vectorized decode in map_batches."""
    import ray

    ds = ray.data.read_binary_files(paths)

    def decode(batch: dict) -> pa.Table:
        return pa.concat_tables([read_gadget_bytes(b, ntile) for b in batch["bytes"]])

    return ds.map_batches(decode, batch_format="numpy")
