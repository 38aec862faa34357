"""S2PaddedCell (dilivia/s2/S2PaddedCell.kt): a cell whose (u,v) bound
is expanded by a padding margin, with incremental child construction
and the shrink-to-fit used by recursive-subdivision algorithms to skip
levels where only one child intersects a query rectangle.

On this substrate it backs the recursive index-construction tests; the
distributed paths use per-edge coverings + cell-keyed joins instead of
recursive subdivision, but the (i,j)/orientation/entry-exit plumbing is
shared with the cell-id kernel and is pinned by the reference suite."""

from __future__ import annotations

import numpy as np

from . import cellid as ck
from .tables import IJ_TO_POS, INVERT_MASK, POS_TO_IJ, SWAP_MASK
from .tables import POS_TO_ORIENTATION

DBL_EPS = 2.220446049250313e-16
MAX_LEVEL = 30


def _si_ti_to_uv(si_ti: int) -> float:
    return ck.sc_st_to_uv((1.0 / float(ck.MAX_SI_TI)) * si_ti)


class PaddedCell:
    """bound/middle are ((u_lo, u_hi), (v_lo, v_hi)) tuples."""

    def __init__(self, cid: int | None = None, padding: float = 0.0,
                 _child_of: "PaddedCell | None" = None,
                 _i: int = 0, _j: int = 0):
        if _child_of is not None:
            parent = _child_of
            self.padding = parent.padding
            self.level = parent.level + 1
            pos = IJ_TO_POS[parent.orientation][2 * _i + _j]
            self.id = ck.sc_child(parent.id, pos)
            ij_size = int(ck.get_size_ij(self.level))
            self.ij_lo = [parent.ij_lo[0] + _i * ij_size,
                          parent.ij_lo[1] + _j * ij_size]
            self.orientation = parent.orientation ^ POS_TO_ORIENTATION[pos]
            # one corner from the parent bound, the diagonally opposite
            # corner from the parent middle
            m = parent.middle()
            b = [list(parent.bound[0]), list(parent.bound[1])]
            b[0][1 - _i] = m[0][1 - _i]
            b[1][1 - _j] = m[1][1 - _j]
            self.bound = (tuple(b[0]), tuple(b[1]))
            self._middle = None
            return
        assert cid is not None
        self.id = int(cid)
        self.padding = float(padding)
        self._middle = None
        if ck.sc_level(self.id) == 0:
            limit = 1.0 + self.padding
            self.bound = ((-limit, limit), (-limit, limit))
            self._middle = ((-self.padding, self.padding),
                            (-self.padding, self.padding))
            self.ij_lo = [0, 0]
            self.orientation = (self.id >> 61) & 1
            self.level = 0
        else:
            face, i, j = ck.sc_to_face_ij(self.id)
            # orientation via the array kernel (E6 decode)
            _f, _i, _j, orient = ck.to_face_ij_orientation(
                np.array([self.id], dtype=np.uint64),
                compute_orientation=True)
            self.level = ck.sc_level(self.id)
            u_lo, u_hi, v_lo, v_hi = ck.sc_bound_uv(self.id)
            p = self.padding
            self.bound = ((u_lo - p, u_hi + p), (v_lo - p, v_hi + p))
            self.orientation = int(orient[0])
            ij_size = int(ck.get_size_ij(self.level))
            self.ij_lo = [i & -ij_size, j & -ij_size]

    def child(self, i: int, j: int) -> "PaddedCell":
        return PaddedCell(_child_of=self, _i=i, _j=j)

    def middle(self):
        if self._middle is None:
            ij_size = int(ck.get_size_ij(self.level))
            u = _si_ti_to_uv(2 * self.ij_lo[0] + ij_size)
            v = _si_ti_to_uv(2 * self.ij_lo[1] + ij_size)
            p = self.padding
            self._middle = ((u - p, u + p), (v - p, v + p))
        return self._middle

    def get_child_ij(self, pos: int) -> tuple[int, int]:
        ij = POS_TO_IJ[self.orientation][pos]
        return ij >> 1, ij & 1

    def get_center(self) -> np.ndarray:
        ij_size = int(ck.get_size_ij(self.level))
        si = 2 * self.ij_lo[0] + ij_size
        ti = 2 * self.ij_lo[1] + ij_size
        x, y, z = ck.sc_face_si_ti_to_xyz(self.id >> 61, si, ti)
        n = float(np.sqrt(x * x + y * y + z * z))
        return np.array([x / n, y / n, z / n])

    def get_entry_vertex(self) -> np.ndarray:
        """Vertex where the space-filling curve enters this cell."""
        i, j = self.ij_lo
        if self.orientation & INVERT_MASK:
            ij_size = int(ck.get_size_ij(self.level))
            i += ij_size
            j += ij_size
        x, y, z = ck.sc_face_si_ti_to_xyz(self.id >> 61, 2 * i, 2 * j)
        n = float(np.sqrt(x * x + y * y + z * z))
        return np.array([x / n, y / n, z / n])

    def get_exit_vertex(self) -> np.ndarray:
        """Vertex where the space-filling curve exits this cell."""
        i, j = self.ij_lo
        ij_size = int(ck.get_size_ij(self.level))
        if self.orientation in (0, SWAP_MASK + INVERT_MASK):
            i += ij_size
        else:
            j += ij_size
        x, y, z = ck.sc_face_si_ti_to_xyz(self.id >> 61, 2 * i, 2 * j)
        n = float(np.sqrt(x * x + y * y + z * z))
        return np.array([x / n, y / n, z / n])

    def shrink_to_fit(self, rect) -> int:
        """Smallest cell containing all descendants whose padded bounds
        intersect rect (S2PaddedCell.kt:149-190)."""
        ij_size = int(ck.get_size_ij(self.level))
        if self.level == 0:
            if rect[0][0] <= 0.0 <= rect[0][1] or \
                    rect[1][0] <= 0.0 <= rect[1][1]:
                return self.id
        else:
            u_mid = _si_ti_to_uv(2 * self.ij_lo[0] + ij_size)
            v_mid = _si_ti_to_uv(2 * self.ij_lo[1] + ij_size)
            if rect[0][0] <= u_mid <= rect[0][1] or \
                    rect[1][0] <= v_mid <= rect[1][1]:
                return self.id
        pad = self.padding + 1.5 * DBL_EPS
        padded = ((rect[0][0] - pad, rect[0][1] + pad),
                  (rect[1][0] - pad, rect[1][1] + pad))
        ij_min = [0, 0]
        ij_xor = [0, 0]
        for d in range(2):
            lo = ck.sc_st_to_ij(ck.sc_uv_to_st(padded[d][0]))
            hi = ck.sc_st_to_ij(ck.sc_uv_to_st(padded[d][1]))
            ij_min[d] = max(self.ij_lo[d], lo)
            ij_max = min(self.ij_lo[d] + ij_size - 1, hi)
            ij_xor[d] = ij_min[d] ^ ij_max
        level_msb = ((ij_xor[0] | ij_xor[1]) << 1) + 1
        level = MAX_LEVEL - (level_msb.bit_length() - 1)
        if level <= self.level:
            return self.id
        return ck.sc_parent(
            ck.sc_from_face_ij(self.id >> 61, ij_min[0], ij_min[1]),
            level)
