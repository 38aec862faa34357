"""Hilbert-curve lookup tables for S2 cell id encode/decode.

Semantics follow the reference library's table construction
(/root/reference/src/main/kotlin/dilivia/s2/coords/LookupCellTables.kt:43-78
and dilivia/s2/coords/S2Coords.kt:115-157), which itself ports Google's
public C++ S2 library.  Tables are rebuilt here from first principles:
4 bits of (i,j) per step ("iiiijjjjoo" key -> "ppppppppoo" value).
"""

from __future__ import annotations

import numpy as np

K_LOOKUP_BITS = 4
SWAP_MASK = 0x01
INVERT_MASK = 0x02

# kIJtoPos[orientation][ij] -> pos  (S2Coords.kt:120-131)
IJ_TO_POS = (
    (0, 1, 3, 2),  # canonical
    (0, 3, 1, 2),  # axes swapped
    (2, 3, 1, 0),  # bits inverted
    (2, 1, 3, 0),  # swapped & inverted
)

# kPosToIJ[orientation][pos] -> ij  (S2Coords.kt:133-145)
POS_TO_IJ = (
    (0, 1, 3, 2),
    (0, 2, 3, 1),
    (3, 2, 0, 1),
    (3, 1, 0, 2),
)

# kPosToOrientation[pos] -> orientation XOR modifier (S2Coords.kt:147-157)
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)


def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    size = 1 << (2 * K_LOOKUP_BITS + 2)
    lookup_pos = np.zeros(size, dtype=np.uint32)
    lookup_ij = np.zeros(size, dtype=np.uint32)

    def init_cell(level: int, i: int, j: int, orig_orientation: int,
                  pos: int, orientation: int) -> None:
        if level == K_LOOKUP_BITS:
            ij = (i << K_LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        for sub_pos in range(4):
            ij = POS_TO_IJ[orientation][sub_pos]
            init_cell(level, i + (ij >> 1), j + (ij & 1), orig_orientation,
                      pos + sub_pos, orientation ^ POS_TO_ORIENTATION[sub_pos])

    for orientation in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        init_cell(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_tables()
