"""Sinks: partitioned parquet results and the reference's text rendering.

The canonical result sink is partitioned parquet (resumable; see
state.checkpoint). ``render_reference_text`` reproduces the reference's
stdout layout (reference src/astr_rcount/main.c:371-442): per halo an
``id <id>`` line and one ``  [lo ~ hi]: count`` line per shell, then a
``Total`` block.

The reference's Total block has an aliasing quirk: the accumulator IS
halo 0's row, so the printed grand total double-counts halo 0 (and halo
0's stored row is doubled in place) — SURVEY.md §1.3. We compute a true
total by default; ``quirk_compatible=True`` reproduces the reference's
numbers exactly for conformance diffs.
"""

from __future__ import annotations

import numpy as np

from spatialjoincountovershells_ray.config import RadiusLadder


def render_reference_text(
    halo_ids: np.ndarray,
    counts: np.ndarray,
    ladder: RadiusLadder,
    quirk_compatible: bool = False,
) -> str:
    """counts: [nhalos, nrads] (halo-file order). Returns the full text."""
    radii = ladder.radii
    lines: list[str] = []

    def shell_lines(row) -> None:
        for i in range(ladder.nrads):
            lo = 0.0 if i == 0 else float(radii[i - 1])
            lines.append(f"  [{lo:f} ~ {float(radii[i]):f}]: {int(row[i])}")

    total = counts.astype(np.int64).sum(axis=0)
    if quirk_compatible and len(counts):
        # total aliases halo 0's row: grand total = sum + halo0 (main.c:400-437)
        total = total + counts[0].astype(np.int64)
    for hid, row in zip(halo_ids, counts):
        lines.append(f"id {int(hid)}")
        shell_lines(row)
    lines.append("Total")
    shell_lines(total)
    return "\n".join(lines) + "\n"


def write_result_text(path: str, halo_ids, counts, ladder, quirk_compatible=False) -> str:
    with open(path, "w") as f:
        f.write(render_reference_text(halo_ids, counts, ladder, quirk_compatible))
    return path
